package graft

import graft.ops.{Skew, Stats}
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

  test("topShare: no single task absorbs a whole group (2-group input)") {
    // few-group order statistics are the classic single-reducer trap: a
    // Window.partitionBy(keys) cumulative over raw rows gives parallelism
    // = |groups|, so with 2 groups one task sorts ~half the table at ANY
    // scale. The binned-prefix rework must (a) reproduce the naive result
    // exactly and (b) spread shuffle reads across tasks.
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
      SparkListenerJobStart, SparkListenerTaskEnd}
    import org.apache.spark.sql.expressions.Window
    val n = 40000
    val df = spark.range(n).select(
        (col("id") % 2).cast("string").as("g"), col("id"),
        ((col("id") * 2654435761L) % 100003).cast("double").as("v"))
      .cache()
    df.count()

    // (a) exact equivalence with the naive single-window formulation
    val wOrd = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("g"))
    val cum = sum(col("v").cast("decimal(28,10)")).over(wOrd)
    val tot = sum(col("v").cast("decimal(28,10)")).over(wAll)
    val naive = df
      .withColumn("_b", (cum.cast("double") - col("v")) / tot.cast("double"))
      .withColumn("cum_share",
        round(cum.cast("double") / tot.cast("double"), 6))
      .filter(col("_b") < 0.5).drop("_b")
    val fast = Stats.topShare(df, "v", Seq("g"), Seq(col("id")), 0.5)
    assert(fast.count() == naive.count())
    assert(fast.select("g", "id", "v", "cum_share")
      .exceptAll(naive.select("g", "id", "v", "cum_share")).isEmpty)

    // (b) max per-task shuffle read bounded well below a group's row count.
    // Tasks are attributed via this test's job group so concurrent jobs
    // from other suites can't pollute the measurement.
    val group = "scalespec-topshare"
    val stages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val maxRec = new java.util.concurrent.atomic.AtomicLong(0)
    val started = new java.util.concurrent.atomic.AtomicInteger(0)
    val ended = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        if (Option(j.properties.getProperty("spark.jobGroup.id"))
            .contains(group)) {
          started.incrementAndGet()
          j.stageIds.foreach(stages.add(_))
        }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        ended.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (stages.contains(t.stageId) && t.taskMetrics != null)
          maxRec.updateAndGet(c =>
            math.max(c, t.taskMetrics.shuffleReadMetrics.recordsRead))
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // AQE coalesces these tiny test-scale shuffles into ONE partition,
      // which would mask the hash spread being asserted; at real scale the
      // advisory size keeps many partitions. Shape, not AQE, is under test.
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.sparkContext.setJobGroup(group, "topShare scale shape")
      Stats.topShare(df, "v", Seq("g"), Seq(col("id")), 0.5)
        .write.mode("overwrite").format("noop").save()
      spark.sparkContext.clearJobGroup()
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (started.get() == 0 && System.nanoTime() < deadline)
        Thread.sleep(50)
      Thread.sleep(500) // let trailing task-end events drain
      // naive shape: one task reads ~n/2 rows; reworked: ≤ ~n/4 with
      // 4 shuffle partitions, plus hash slack
      assert(maxRec.get() > 0, "listener captured no shuffle reads")
      assert(maxRec.get() < n * 0.35,
        s"a single task read ${maxRec.get()} of $n rows — " +
          "few-group window shape has regressed")
    } finally {
      spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
      spark.sparkContext.removeSparkListener(listener)
      df.unpersist()
    }
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
