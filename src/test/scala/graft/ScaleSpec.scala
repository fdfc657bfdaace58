package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._

/** Scale-path mechanics verified at small SF: salted aggregation/join
  * equivalence, and bucketed tables eliminating the join shuffle. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val skewed = {
    // one hot key carrying 90% of rows
    val hot = (1 to 9000).map(i => ("HOT", i.toLong, i * 1.0))
    val rest = (1 to 1000).map(i => (s"k${i % 50}", i.toLong, i * 2.0))
    (hot ++ rest).toDF("k", "id", "v")
  }

  test("saltedAggregate equals plain aggregate") {
    val plain = skewed.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
    val salted = Skew.saltedAggregate(skewed, Seq("k"), salt = 8,
      partials = Seq((sum(col("v")), "s"), (count(lit(1)), "n")),
      merges = Seq(((c: String) => sum(col(c)), "s"), ((c: String) => sum(col(c)), "n")))
    val diff = plain.as("a").join(salted.as("b"), "k")
      .filter(abs(col("a.s") - col("b.s")) > 1e-6 || col("a.n") =!= col("b.n"))
    assert(diff.count() == 0)
    assert(plain.count() == salted.count())
  }

  test("saltedJoin equals plain join") {
    val dim = Seq(("HOT", "hot-dim"), ("k1", "d1"), ("k2", "d2")).toDF("k", "label")
    val plain = skewed.join(dim, Seq("k")).groupBy("k", "label").count()
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), salt = 4)
      .groupBy("k", "label").count()
    val a = plain.orderBy("k").collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val b = salted.orderBy("k").collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(a.sameElements(b))
  }

  test("hotKeys surfaces the skew") {
    val top = Skew.hotKeys(skewed, Seq("k"), 3).collect()
    assert(top.head.getString(0) == "HOT" && top.head.getDouble(2) > 0.85)
  }

  test("partitionBy sink enables partition pruning on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString + "/t"
    skewed.write.partitionBy("k").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("k") === "HOT")
    val scan = pruned.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("FileScan")).getOrElse("")
    // the symbol predicate lands in PartitionFilters, not a post-scan Filter
    assert(scan.contains("PartitionFilters: [isnotnull(k"), scan)
    assert(pruned.count() == 9000)
  }

  test("multimodal metadata queries prune the binary content column at " +
       "the scan") {
    // the 100 TB contract of the asset table: bytes stay columnar in
    // parquet, and a metadata-only query (dimensions, sizes) must read
    // ONLY the metadata columns — a scan that drags the binary payload
    // for a stats query is wrong at any scale
    val dir = java.nio.file.Files.createTempDirectory("graft_mm").toString + "/a"
    val docs = (1 to 50).map(i => (i.toLong, "payload " * i)).toDF("doc_id", "text")
    graft.multimodal.Multimodal.packAssets(docs, "doc_id", "text")
      .write.parquet(dir)
    val stats = spark.read.parquet(dir)
      .filter(col("media_type") === "image")
      .groupBy("media_type")
      .agg(sum(col("meta.n_bytes")).as("bytes"), count(lit(1)).as("n"))
    val scan = stats.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("FileScan")).getOrElse("")
    assert(scan.contains("media_type") && scan.contains("meta"), scan)
    assert(!scan.contains("content"), s"content column not pruned: $scan")
    assert(stats.count() == 1)
  }

  test("bucketed tables join without a shuffle exchange") {
    // warehouse dir is a temp dir set at session build (static conf)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")
    val o = Tables.orders(spark, "/root/testdata/sf0.001")
    val l = Tables.lineitem(spark, "/root/testdata/sf0.001")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    l.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lines")
    // force the shuffle-join path (at sf0.001 Spark would broadcast, which
    // sidesteps buckets entirely); co-bucketing must then eliminate the
    // shuffle exchange on both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders").join(spark.table("b_lines"),
        col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        plan.split("\n").take(12).mkString("\n"))
      assert(plan.contains("SortMergeJoin"), plan.split("\n").take(4).mkString("\n"))
      assert(joined.count() > 0)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
