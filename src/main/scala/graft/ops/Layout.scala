package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout helpers for scan efficiency at rest: Z-order (Morton)
  * clustering so parquet min/max statistics prune on MULTIPLE dimensions at
  * once.
  *
  * A single-column sort gives perfect pruning on that column and none on any
  * other; interleaving the bits of two bucketized keys gives both columns
  * compact per-file ranges (each file covers a small square of the key
  * space, not a thin stripe). This is the standard lakehouse OPTIMIZE
  * ZORDER technique; at 100 TB it turns "scan everything" into "open the
  * few files whose [min,max] intersect the predicate" for either dimension.
  *
  * The z-value is a pure codegen'd bit-interleave expression — portable,
  * deterministic, oracle-checkable.
  */
object Layout {

  /** Rescale `c` into an unsigned `bits`-bit bucket id given its [lo, hi]
    * domain (values outside clamp to the edge buckets). Equal-width buckets
    * are the right default for z-ordering; use quantile buckets upstream if
    * the domain is heavily skewed. */
  def bucketize(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val n = (1L << bits) - 1
    val scaled = floor((c.cast("double") - lo) / (hi - lo) * (n + 1))
    least(greatest(scaled, lit(0.0)), lit(n.toDouble)).cast("long")
  }

  /** Morton code: interleave the low `bits` bits of `a` (even positions)
    * and `b` (odd positions). 2·bits output bits; bits ≤ 31. */
  def zValue2(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      (shiftright(a, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)))
        .plus(shiftright(b, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)
  }

  /** The same Morton code as DuckDB-compatible SQL text (for oracles). */
  def zValue2Sql(a: String, b: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"((($a >> $i) & 1) * ${1L << (2 * i)} + (($b >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString(" + ")

  /** Cluster `df` by the z-value of two bucketized columns: range-partition
    * on z (so each output file owns a compact z-interval ≈ a square of key
    * space), sort within partitions, drop the helper column. Write the
    * result with any sink; parquet footer min/max on BOTH source columns
    * will be tight per file. */
  def zOrder(df: DataFrame, a: Column, aLo: Double, aHi: Double,
             b: Column, bLo: Double, bHi: Double,
             partitions: Int, bits: Int = 16): DataFrame = {
    val z = zValue2(bucketize(a, aLo, aHi, bits), bucketize(b, bLo, bHi, bits), bits)
    df.withColumn("_z", z)
      .repartitionByRange(partitions, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }

  /** N-dimensional Morton code: interleave the low `bits` bits of each
    * column round-robin (column i owns output bit positions i, i+n,
    * i+2n, …). `zValue2` is the n=2 special case; n·bits ≤ 63. Same
    * portable integer bit ops, so an oracle can recompute it. */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.length
    require(n >= 2, "zValueN needs at least 2 columns")
    require(bits >= 1 && n * bits <= 63, s"n*bits must fit a long, got $n×$bits")
    (0 until bits).flatMap { i =>
      cols.zipWithIndex.map { case (c, j) =>
        shiftright(c, i).bitwiseAND(lit(1L)) * lit(1L << (n * i + j))
      }
    }.reduce(_ + _)
  }

  /** Compaction writer — the consumer of q140's small-file report: rewrite
    * a fragmented dataset as `partitions` sorted ranges with at most
    * `maxRecordsPerFile` rows per file. Range partitioning + in-partition
    * sort gives every output file a tight, non-overlapping `sortCols`
    * min/max footer (scan pruning), and the record cap keeps files
    * splittable and row-group-sized instead of one giant file per
    * partition. At 100 TB this is the nightly OPTIMIZE: one shuffle
    * (the range exchange), no driver involvement. */
  def compactWrite(df: DataFrame, path: String, sortCols: Seq[Column],
                   partitions: Int, maxRecordsPerFile: Long): Unit =
    df.repartitionByRange(partitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
}
