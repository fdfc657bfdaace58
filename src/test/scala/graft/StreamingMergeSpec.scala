package graft

import graft.ops.Merge
import graft.streaming.StreamingMerge
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Streaming CDC apply: micro-batches merge into the persisted snapshot,
  * the result equals the batch-composed Merge.upsert, and re-applying a
  * batch restates the snapshot (apply∘apply = apply). */
class StreamingMergeSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("status", StringType),
    StructField("price", DoubleType), StructField("_op", StringType),
    StructField("_v", LongType)))

  private def snap(path: String): Map[Long, (String, Double)] =
    graft.streaming.StreamingMerge.readSnapshot(spark, path)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap

  test("micro-batches merge into the snapshot; replay is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("graft_smerge").toString
    val in = s"$dir/in"; val snapDir = s"$dir/snap"; val chk = s"$dir/chk"

    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "status", "price")
    StreamingMerge.init(base, snapDir)

    // batch A: update 1, delete 2
    val batchA = Seq((1L, "a1", 11.0, "U", 1L), (2L, "b", 20.0, "D", 1L))
      .toDF("k", "status", "price", "_op", "_v")
    batchA.write.parquet(in)
    StreamingMerge.upsertSink(
      spark.readStream.schema(schema).parquet(in),
      snapDir, "k", "_v", "_op", chk).start().awaitTermination()
    assert(snap(snapDir) == Map(1L -> ("a1", 11.0), 3L -> ("c", 30.0)))

    // batch B: insert 4, later update of 1
    val batchB = Seq((4L, "d", 40.0, "I", 2L), (1L, "a2", 12.0, "U", 2L))
      .toDF("k", "status", "price", "_op", "_v")
    batchB.write.mode("append").parquet(in)
    StreamingMerge.upsertSink(
      spark.readStream.schema(schema).parquet(in),
      snapDir, "k", "_v", "_op", chk).start().awaitTermination()
    val want = Map(1L -> ("a2", 12.0), 3L -> ("c", 30.0), 4L -> ("d", 40.0))
    assert(snap(snapDir) == want)

    // equals the batch-composed form
    val composed = Merge.upsert(Merge.upsert(base, batchA, "k", "_v", "_op"),
      batchB, "k", "_v", "_op")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(composed == want)

    // replay: re-applying batch B onto the post-apply snapshot changes
    // nothing — the exact failure mode Structured Streaming retries cover
    // (the LAST batch re-runs after a crash before checkpoint commit)
    StreamingMerge.applyBatch(spark, batchB, snapDir, "k", "_v", "_op")
    assert(snap(snapDir) == want)
    // boundary of the contract: replaying an OLDER batch regresses keys it
    // touched (snapshot rows ride at version 0, so old changes outrank
    // them). Structured Streaming never does this — it replays only the
    // last uncommitted batch — but a manual applyBatch caller must not.
    StreamingMerge.applyBatch(spark, batchA, snapDir, "k", "_v", "_op")
    assert(snap(snapDir) == Map(1L -> ("a1", 11.0), 3L -> ("c", 30.0),
      4L -> ("d", 40.0)))
  }
}
