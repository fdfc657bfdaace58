package graft

import graft.ops.Stats
import graft.streaming.StreamingSketch
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming sketch maintenance: the merged increments must equal the
  * from-scratch sketch counter-for-counter (count-min is additive), the
  * maintained sketch must answer lookups exactly like the batch build,
  * and restatement must not inflate counters. */
class StreamingSketchSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("n", LongType)))

  test("drained stream sketch ≡ from-scratch; lookups from the maintained " +
       "sketch match; restatement is idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ssk").toString
    val in = s"$dir/in"; val sk = s"$dir/sketch"; val chk = s"$dir/chk"

    val base = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("k", "n")
    val batchA = Seq(("a", 4L), ("c", 5L), ("c", 6L)).toDF("k", "n")
    val batchB = Seq(("b", 7L), ("d", 8L), ("a", 9L)).toDF("k", "n")
    StreamingSketch.writeBaseSketch(base, "k", sk)

    batchA.write.parquet(in)
    StreamingSketch.sketchSink(spark.readStream.schema(schema).parquet(in),
      "k", sk, chk).start().awaitTermination()
    batchB.write.mode("append").parquet(in)
    StreamingSketch.sketchSink(spark.readStream.schema(schema).parquet(in),
      "k", sk, chk).start().awaitTermination()

    val all = base.unionByName(batchA).unionByName(batchB)
    def cset(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val merged = StreamingSketch.readMergedSketch(spark, sk)
    assert(cset(merged) == cset(Stats.countMinSketch(all, "k")),
      "streamed counters must equal the from-scratch sketch")

    // lookups from the maintained sketch ≡ the batch-built estimates,
    // and on this collision-free cardinality they are the exact counts
    val est = Stats.cmLookup(merged,
        all.select(col("k").cast("string").as("key")).distinct())
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == Map("a" -> 4L, "b" -> 2L, "c" -> 2L, "d" -> 1L))

    // a NEVER-ingested key hashes to buckets the maintained sketch has no
    // counter rows for — its estimate is 0 (min with absent-as-zero), not
    // a row that vanishes or an overestimate from the few hit buckets
    val cold = Stats.cmLookup(merged,
        Seq("zzz-never-seen").toDF("key"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cold == Map("zzz-never-seen" -> 0L),
      "absent buckets must count as zero in the count-min min")

    // restating batch 0 (same content, same partition) must not duplicate
    val before = cset(merged)
    Stats.countMinSketch(batchA, "k")
      .write.mode("overwrite").parquet(s"$sk/increments/batch=0")
    assert(cset(StreamingSketch.readMergedSketch(spark, sk)) == before,
      "restated increment must restate, not duplicate")

    // compaction folds the increments into the base counter-for-counter:
    // identical merged sketch, identical lookups, no live increments
    assert(StreamingSketch.compactSketch(spark, sk) == 2)
    assert(graft.streaming.Compaction.incrementCount(spark, sk) == 0,
      "no LIVE increment may remain (folded dirs stay one grace round)")
    assert(cset(StreamingSketch.readMergedSketch(spark, sk)) == before,
      "compaction must not change a counter")
    assert(StreamingSketch.compactSketch(spark, sk) == 0)
  }

  test("maintained DDSketch ≡ from-scratch buckets AND identical q308 " +
       "quantile reads; restatement idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sdd").toString
    val in = s"$dir/in"; val sk = s"$dir/sketch"; val chk = s"$dir/chk"
    val vschema = StructType(Seq(
      StructField("grp", StringType), StructField("v", DoubleType)))

    def mk(rows: Seq[(String, Double)]) = rows.toDF("grp", "v")
    val base = mk(Seq(("a", 1.5), ("a", 220.0), ("b", 33.3), ("a", 7.0)))
    val batchA = mk(Seq(("a", 0.9), ("b", 4100.0), ("b", 33.3),
      ("c", 12.25), ("a", -3.0))) // non-positive values drop in BOTH paths
    val batchB = mk(Seq(("c", 555.5), ("a", 220.0), ("b", 0.01)))
    StreamingSketch.writeBaseDdSketch(base, "v", Seq("grp"), sk)

    batchA.write.parquet(in)
    StreamingSketch.ddSketchSink(
      spark.readStream.schema(vschema).parquet(in),
      "v", Seq("grp"), sk, chk).start().awaitTermination()
    batchB.write.mode("append").parquet(in)
    StreamingSketch.ddSketchSink(
      spark.readStream.schema(vschema).parquet(in),
      "v", Seq("grp"), sk, chk).start().awaitTermination()

    val all = base.unionByName(batchA).unionByName(batchB)
    def bset(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val merged = StreamingSketch.readMergedDdSketch(spark, sk, Seq("grp"))
    assert(bset(merged) ==
      bset(Stats.ddSketchBuckets(all, "v", Seq("grp"))),
      "maintained buckets must equal the from-scratch sketch")

    // the q308 read path over the MAINTAINED sketch ≡ the one-shot batch
    // ddSketch over everything ingested — bit-identical rows
    val viaStream = Stats.ddSketchRead(merged, Seq("grp"))
    val oneShot = Stats.ddSketch(all, "v", Seq("grp"))
    assert(viaStream.exceptAll(oneShot).isEmpty &&
      oneShot.exceptAll(viaStream).isEmpty,
      "quantile reads must match the batch build exactly")

    // restating batch 0 must not inflate any counter
    val before = bset(merged)
    Stats.ddSketchBuckets(batchA, "v", Seq("grp"))
      .write.mode("overwrite").parquet(s"$sk/increments/batch=0")
    assert(bset(StreamingSketch.readMergedDdSketch(spark, sk, Seq("grp")))
      == before, "restated increment must restate, not duplicate")

    // compaction: identical merged buckets AND identical quantile reads
    // from the folded base; increments gone. Fresh plan — viaStream's
    // captured file index predates the restatement overwrite above.
    val preRead = Stats.ddSketchRead(
      StreamingSketch.readMergedDdSketch(spark, sk, Seq("grp")),
      Seq("grp")).collect().toSet
    assert(StreamingSketch.compactDdSketch(spark, sk, Seq("grp")) == 2)
    assert(bset(StreamingSketch.readMergedDdSketch(spark, sk, Seq("grp")))
      == before, "compaction must not change a bucket")
    assert(Stats.ddSketchRead(
        StreamingSketch.readMergedDdSketch(spark, sk, Seq("grp")),
        Seq("grp")).collect().toSet == preRead)
    assert(StreamingSketch.compactDdSketch(spark, sk, Seq("grp")) == 0)
  }
}
