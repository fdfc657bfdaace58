package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join with bucket binning — the temporal join Spark has
  * no native operator for (q58's range join is point-in-interval; this is
  * interval×interval). The naive plan is a per-key theta join (quadratic in
  * rows per key); the binned plan replicates each interval to the fixed-size
  * time buckets it spans and equi-joins on (keys, bucket), so candidate
  * pairs are bounded by co-bucketed intervals only. A pair sharing several
  * buckets is counted ONCE — at the bucket containing the later start —
  * instead of deduplicating post hoc (no distinct, no extra shuffle).
  *
  * 100 TB shape: ONE equi-join shuffle keyed by (keys, bucket); replication
  * factor = interval length / bucketSeconds (pick the bucket near the
  * median interval length — sessions spanning few buckets replicate a
  * handful of times). Skewed hot buckets fall under the same salting/cap
  * tooling as every other equi-join (`ops.Skew`).
  */
object Intervals {

  /** Join rows of `a` and `b` (sharing `keys`) whose [start, end] intervals
    * overlap (inclusive ends: touching intervals match). `b`'s interval
    * columns must be pre-renamed to avoid clashes. Emits all columns of
    * both inputs plus `overlap_seconds`. */
  def overlapJoin(a: DataFrame, b: DataFrame, keys: Seq[String],
                  aStart: String, aEnd: String, bStart: String, bEnd: String,
                  bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val S = bucketSeconds.toDouble
    def secs(c: String) = col(c).cast("long")
    val ar = a
      .withColumn("_bk", explode(sequence(
        floor(secs(aStart) / S).cast("long"), floor(secs(aEnd) / S).cast("long"))))
    val br = b
      .withColumn("_bk", explode(sequence(
        floor(secs(bStart) / S).cast("long"), floor(secs(bEnd) / S).cast("long"))))
    val overlap = secs(aStart) <= secs(bEnd) && secs(bStart) <= secs(aEnd)
    // count each pair exactly once: at the bucket of the later start
    val dedup = col("_bk") ===
      floor(greatest(secs(aStart), secs(bStart)) / S).cast("long")
    ar.join(br, keys :+ "_bk")
      .filter(overlap && dedup)
      .drop("_bk")
      .withColumn("overlap_seconds",
        least(secs(aEnd), secs(bEnd)) - greatest(secs(aStart), secs(bStart)))
  }
}
