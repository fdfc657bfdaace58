package graft

import graft.ops.Layout
import org.apache.spark.sql.functions._

/** Z-order layout: the Morton code is correct bit-interleaving, and
  * z-clustered partitions have compact ranges on BOTH dimensions — the
  * property that makes parquet min/max stats prune either predicate,
  * where a single-column sort prunes only its own column. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue2 interleaves bits (a even positions, b odd)") {
    val r = Seq((3L, 1L), (0L, 0L), (5L, 2L), (65535L, 0L))
      .toDF("a", "b")
      .select(Layout.zValue2(col("a"), col("b"), 16).as("z"))
      .collect().map(_.getLong(0))
    assert(r(0) == 7L)      // a=0b11 → bits 0,2; b=0b1 → bit 1 → 0b111
    assert(r(1) == 0L)
    assert(r(2) == 0b011001L) // a=0b101 → bits 0,4; b=0b10 → bit 3
    assert(r(3) == 0x55555555L) // all even bits set
  }

  test("bucketize clamps to the domain edges") {
    val r = Seq(-5.0, 0.0, 50.0, 100.0, 999.0).toDF("x")
      .select(Layout.bucketize(col("x"), 0.0, 100.0, 4).as("b"))
      .collect().map(_.getLong(0))
    assert(r(0) == 0L && r(1) == 0L && r(2) == 8L && r(3) == 15L && r(4) == 15L)
  }

  test("z-ordered partitions are compact in BOTH dims; x-sort is not") {
    val grid = spark.range(64).select(col("id").as("x"))
      .crossJoin(spark.range(64).select(col("id").as("y")))
    def ranges(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val r = df.withColumn("p", spark_partition_id())
        .groupBy("p")
        .agg((max("x") - min("x")).as("rx"), (max("y") - min("y")).as("ry"))
        .agg(avg("rx"), avg("ry")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    val (zx, zy) = ranges(
      Layout.zOrder(grid, col("x"), 0, 64, col("y"), 0, 64, 16, 6))
    val (sx, sy) = ranges(
      grid.repartitionByRange(16, col("x")).sortWithinPartitions("x"))
    // x-sorted: x tight but y spans the whole domain in every partition
    assert(sx < 8 && sy > 55)
    // z-ordered: BOTH dims compact (ideal 16-cell square → range 15)
    assert(zx < 32 && zy < 32)
  }

  test("zValueN: n=2 equals zValue2; n=3 interleaves round-robin") {
    val df = Seq((3L, 1L, 2L)).toDF("a", "b", "c")
    val two = df.select(Layout.zValue2(col("a"), col("b"), 8).as("z2"),
      Layout.zValueN(Seq(col("a"), col("b")), 8).as("zn")).head()
    assert(two.getLong(0) == two.getLong(1))
    // a=0b11 → bits 0,3; b=0b1 → bit 1; c=0b10 → bit 5: 0b101011 = 43
    val three = df.select(
      Layout.zValueN(Seq(col("a"), col("b"), col("c")), 4).as("z")).head()
    assert(three.getLong(0) == 43L)
  }

  test("compactWrite: record cap per file, non-overlapping sort ranges, " +
       "nothing lost") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_spec")
    val path = dir.toString + "/out"
    val src = spark.range(0, 5000).select(col("id"), (col("id") % 11).as("k"))
    Layout.compactWrite(src, path, Seq(col("id")), partitions = 4,
      maxRecordsPerFile = 500L)
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
    // 5000 rows / cap 500 → at least 10 files; 4 range partitions → ≤ 16
    assert(files.length >= 10 && files.length <= 16, s"${files.length} files")
    val perFile = files.map { f =>
      val d = spark.read.parquet(f)
      val r = d.agg(count(lit(1)), min("id"), max("id")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    assert(perFile.forall(_._1 <= 500L), "record cap violated")
    // sorted id ranges must tile without overlap: sort by min, check chain
    val ordered = perFile.sortBy(_._2)
    assert(ordered.sliding(2).forall {
      case Array((_, _, hi), (_, lo, _)) => hi < lo
      case _ => true
    }, "file id ranges overlap")
    // round-trip completeness
    assert(spark.read.parquet(path).count() == 5000L)
  }
}
