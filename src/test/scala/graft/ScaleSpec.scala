package graft

import graft.ops.{Skew, Stats}
import org.apache.spark.sql.functions._

/** Scale-path mechanics verified at small SF: salted aggregation/join
  * equivalence, and bucketed tables eliminating the join shuffle. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  /** Max shuffle-read records of any single task of the jobs `run` starts
    * (attributed via a job group, so concurrent suites can't pollute the
    * measurement). AQE partition coalescing is disabled inside — these
    * test-scale shuffles would coalesce to ONE partition and mask the
    * hash spread being asserted; shape, not AQE, is under test. */
  private def maxTaskShuffleRead(jobGroup: String)(run: => Unit): Long = {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
      SparkListenerTaskEnd}
    val stages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val maxRec = new java.util.concurrent.atomic.AtomicLong(0)
    val started = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        if (Option(j.properties.getProperty("spark.jobGroup.id"))
            .contains(jobGroup)) {
          started.incrementAndGet()
          j.stageIds.foreach(stages.add(_))
        }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (stages.contains(t.stageId) && t.taskMetrics != null)
          maxRec.updateAndGet(c =>
            math.max(c, t.taskMetrics.shuffleReadMetrics.recordsRead))
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.sparkContext.setJobGroup(jobGroup, jobGroup)
      run
      spark.sparkContext.clearJobGroup()
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (started.get() == 0 && System.nanoTime() < deadline)
        Thread.sleep(50)
      Thread.sleep(500) // let trailing task-end events drain
      assert(maxRec.get() > 0,
        s"$jobGroup: listener captured no shuffle reads")
      maxRec.get()
    } finally {
      spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
      spark.sparkContext.removeSparkListener(listener)
    }
  }

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

    // (b) max per-task shuffle read bounded well below a group's row count:
    // naive shape has one task reading ~n/2 rows; reworked ≤ ~n/4 with
    // 4 shuffle partitions, plus hash slack
    try {
      val maxRec = maxTaskShuffleRead("scalespec-topshare") {
        Stats.topShare(df, "v", Seq("g"), Seq(col("id")), 0.5)
          .write.mode("overwrite").format("noop").save()
      }
      assert(maxRec < n * 0.35,
        s"a single task read $maxRec of $n rows — " +
          "few-group window shape has regressed")
    } finally df.unpersist()
  }

  test("order-statistics family: no single task absorbs a whole group " +
       "(mannWhitney / ksTest / quantileNormalize / tailRisk / heapsFit)") {
    // the round-8 binnedPrefix migration closed topShare et al.; these five
    // shared the same trap (raw-row or distinct-value ordered windows with
    // |groups| <= 2 → single-task sorts of half the table at any scale).
    // Each must keep its max per-task shuffle read well below group size.
    val n = 40000
    val df = spark.range(n).select(
        (col("id") % 2).cast("string").as("g"),
        when(col("id") % 2 === 0, "view").otherwise("purchase").as("lbl"),
        col("id"),
        ((col("id") * 2654435761L) % 100003).cast("double").as("v"))
      .cache()
    df.count()
    try {
      val bound = (n * 0.35).toLong
      val mMw = maxTaskShuffleRead("scalespec-mw") {
        Stats.mannWhitney(df, "v", "lbl", "view", "purchase")
          .write.mode("overwrite").format("noop").save()
      }
      assert(mMw < bound, s"mannWhitney: one task read $mMw of $n rows")
      val mKs = maxTaskShuffleRead("scalespec-ks") {
        Stats.ksTest(df, "v", "lbl", "view", "purchase")
          .write.mode("overwrite").format("noop").save()
      }
      assert(mKs < bound, s"ksTest: one task read $mKs of $n rows")
      val mQn = maxTaskShuffleRead("scalespec-qn") {
        Stats.quantileNormalize(df, "v", "g", Seq(col("id")), nQ = 10)
          .write.mode("overwrite").format("noop").save()
      }
      assert(mQn < bound, s"quantileNormalize: one task read $mQn of $n rows")
      val mTr = maxTaskShuffleRead("scalespec-tr") {
        Stats.tailRisk(df, "v", Seq("g"), "id", alpha = 0.05)
          .write.mode("overwrite").format("noop").save()
      }
      assert(mTr < bound, s"tailRisk: one task read $mTr of $n rows")
      val mSp = maxTaskShuffleRead("scalespec-sp") {
        Stats.spearman(df.withColumn("v2",
            (col("id") * 48271L % 99991L).cast("double")),
          "v", "v2", Seq("g"))
          .write.mode("overwrite").format("noop").save()
      }
      assert(mSp < bound, s"spearman: one task read $mSp of $n rows")
      val mHill = maxTaskShuffleRead("scalespec-hill") {
        Stats.hillEstimator(df.withColumn("v",
            abs(col("v")) + lit(1.0)), "v", Seq("g"), k = 50)
          .write.mode("overwrite").format("noop").save()
      }
      assert(mHill < bound, s"hillEstimator: one task read $mHill of $n rows")
      val mKmv = maxTaskShuffleRead("scalespec-kmv") {
        Stats.kmvSketch(df, "id", Seq("g"), k = 64)
          .write.mode("overwrite").format("noop").save()
      }
      assert(mKmv < bound, s"kmvSketch: one task read $mKmv of $n rows")
      val docs = df.select(col("g").as("source"), col("id").as("doc_id"),
        concat(lit("tok"), (col("id") % 97).cast("string")).as("text"))
      val mTb = maxTaskShuffleRead("scalespec-tb") {
        graft.text.Mix.tokenBudget(docs, "doc_id", "source", "text",
            budget = 1000000L)
          .write.mode("overwrite").format("noop").save()
      }
      assert(mTb < bound, s"tokenBudget: one task read $mTb of $n rows")
      val mWs = maxTaskShuffleRead("scalespec-ws") {
        graft.text.Mix.weightedSample(docs.withColumn("w", lit(2.0)),
            "doc_id", "w", "source", n = 50)
          .write.mode("overwrite").format("noop").save()
      }
      assert(mWs < bound, s"weightedSample: one task read $mWs of $n rows")
    } finally df.unpersist()

    // heapsFit: cumulative vocabulary growth over the doc-id axis — the
    // doc frame is corpus-sized, so the prefix must spread too
    val nd = 20000
    val docs = spark.range(nd).select(col("id").as("doc_id"),
        concat(lit("tok"), (col("id") % 97).cast("string"), lit(" w"),
          (col("id") % 53).cast("string")).as("text"))
      .cache()
    docs.count()
    try {
      val mHf = maxTaskShuffleRead("scalespec-heaps") {
        graft.text.TextOps.heapsFit(docs, "doc_id", "text")
          .write.mode("overwrite").format("noop").save()
      }
      assert(mHf < (nd * 0.35).toLong,
        s"heapsFit: one task read $mHf of $nd docs")
    } finally docs.unpersist()
  }

  test("bootstrapCi: the reps fan-out is map-side combined — shuffle is " +
       "groups x reps records, never the exploded row count") {
    val n = 40000
    val df = spark.range(n).select(
        (col("id") % 2).cast("string").as("g"), col("id"),
        ((col("id") * 2654435761L) % 100003).cast("double").as("v"))
      .cache()
    df.count()
    try {
      val maxRec = maxTaskShuffleRead("scalespec-bootstrap") {
        Stats.bootstrapCi(df, "id", "v", Seq("g"), reps = 64)
          .write.mode("overwrite").format("noop").save()
      }
      // the fan-out is n·64 = 2.56M rows; after partial aggregation the
      // whole shuffle carries ≤ maps·groups·reps records (plus the tiny
      // CI/rank stages) — orders of magnitude under the row fan-out
      assert(maxRec < 50000,
        s"bootstrapCi: one task read $maxRec shuffle records — the " +
          "reps fan-out is reaching the shuffle unreduced")
    } finally df.unpersist()
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

  test("knnBrute / quantTopK: no single task ranks the whole corpus for " +
       "one query (extremeK-routed top-k) and both match the naive window") {
    // few queries over a big corpus is the eval-harness trap: a raw
    // row_number window partitioned by q_id hands ONE task the entire
    // corpus per query at any scale. The extremeK rework must (a) keep
    // the exact (q_id, vec_id, rank) result and (b) bound every task's
    // shuffle read far below corpus size.
    import org.apache.spark.sql.expressions.Window
    import graft.sim.Similarity
    val n = 20000
    val corpus = spark.range(n).select(col("id"),
        expr("transform(sequence(0, 7), j -> " +
          "cast(pmod(id * (j * 2654435761L + 97) + j * j, 1000) " +
          "AS DOUBLE) / 1000.0)").as("emb"))
      .repartition(8).cache()
    corpus.count()
    val queries = corpus.filter(col("id") < 2)

    // (a) exact equivalence with the naive rank-window formulation
    val naiveB = {
      val c = corpus.select(col("id").as("vec_id"),
        Similarity.asDouble("emb").as("v"))
      val q = queries.select(col("id").as("q_id"),
        Similarity.asDouble("emb").as("qv"))
      val w = Window.partitionBy("q_id")
        .orderBy(col("sim").desc, col("vec_id").asc)
      c.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("q_id"))
        .withColumn("sim",
          round(Similarity.cosineNative(spark, "qv", "v"), 6))
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= 10)
        .select("q_id", "vec_id", "sim", "rank")
    }
    val fastB = Similarity.knnBrute(corpus, queries, "id", "emb", 10)
    assert(fastB.count() == 20)
    assert(fastB.exceptAll(naiveB).isEmpty && naiveB.exceptAll(fastB).isEmpty)

    // (b) per-task shuffle-read bound: naive shape reads ~n rows in one
    // task; the binned selection spreads stats/bin-count shuffles and
    // final-sorts only ~k + n/bins rows per query
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try {
      val recB = maxTaskShuffleRead("scalespec-knnbrute") {
        Similarity.knnBrute(corpus, queries, "id", "emb", 10)
          .write.mode("overwrite").format("noop").save()
      }
      assert(recB < n * 0.35,
        s"knnBrute: a single task read $recB of $n corpus rows")
      val recQ = maxTaskShuffleRead("scalespec-quanttopk") {
        Similarity.quantTopK(corpus, queries, "id", "emb", 10)
          .write.mode("overwrite").format("noop").save()
      }
      assert(recQ < n * 0.35,
        s"quantTopK: a single task read $recQ of $n corpus rows")
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      corpus.unpersist()
    }
  }

  test("labelPropagation: a celebrity hub's candidate set never lands on " +
       "one task (max_by partial aggregate, not a rank window)") {
    // star graph: round 1 gives the hub a degree-sized all-distinct
    // candidate set — the exact shape where a per-node row_number window
    // sorts 10^8 rows in one task on a real interaction graph. The
    // max_by rework map-side-combines the hub's rows before the shuffle.
    val n = 100000
    val edges = spark.range(1, n + 1)
      .select(lit(0L).as("s"), col("id").as("t"))
      .repartition(8).cache()
    edges.count()
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try {
      val rec = maxTaskShuffleRead("scalespec-lpa") {
        graft.analytics.Graph.labelPropagation(edges, "s", "t", rounds = 1)
          .write.mode("overwrite").format("noop").save()
      }
      assert(rec < n / 3,
        s"labelPropagation: a single task read $rec of $n hub-candidate rows")
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      edges.unpersist()
    }
  }

  test("annPq: the ADC scan never sorts the whole code table in one task " +
       "(ascending extremeK) and matches the naive window") {
    // PQ search scans EVERY code row per query; with few queries a raw
    // row_number partition is the entire corpus ranked by one task. The
    // ascending binned selection must keep the exact (rank, adist) result.
    import org.apache.spark.sql.expressions.Window
    import graft.sim.Similarity
    val n = 20000
    val m = 4; val ksub = 16; val dsub = 2
    // synthetic frozen codebooks — training is irrelevant to the scan shape
    val codebooks: Array[Array[Array[Double]]] = Array.tabulate(m, ksub, dsub) {
      (s, c, i) => (s * 31 + c * 7 + i).toDouble / 10.0
    }
    val codes = spark.range(n).select(col("id").as("vec_id"),
        expr(s"transform(sequence(0, ${m - 1}), s -> " +
          s"cast(pmod(vec_id * (s * 2654435761L + 13) + s, $ksub) AS INT))")
          .as("codes"))
      .repartition(8).cache()
    codes.count()
    val queries = spark.range(2).select(col("id"),
      expr("transform(sequence(0, 7), j -> " +
        "cast(id * 8 + j AS DOUBLE) / 10.0)").as("emb"))

    val fast = Similarity.annPq(codes, codebooks, queries, "id", "emb", 10)
    val naive = {
      val cb: Seq[Seq[Seq[Double]]] =
        codebooks.toSeq.map(_.toSeq.map(_.toSeq))
      val q = queries.select(col("id").as("q_id"),
        Similarity.asDouble("emb").as("qv"))
      val w = Window.partitionBy("q_id")
        .orderBy(col("adist").asc, col("vec_id").asc)
      codes.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .withColumn("_cb", typedlit(cb))
        .withColumn("adist", round(expr(
          s"""aggregate(sequence(0, ${m - 1}), CAST(0 AS DOUBLE), (a, s) ->
             |  a + aggregate(sequence(1, $dsub), CAST(0 AS DOUBLE), (a2, i) ->
             |    a2 + (element_at(qv, s * $dsub + i)
             |        - element_at(element_at(element_at(_cb, s + 1), element_at(codes, s + 1) + 1), i))
             |      * (element_at(qv, s * $dsub + i)
             |        - element_at(element_at(element_at(_cb, s + 1), element_at(codes, s + 1) + 1), i))))""".stripMargin), 6))
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= 10)
        .select("q_id", "vec_id", "adist", "rank")
    }
    assert(fast.count() == 20)
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try {
      val rec = maxTaskShuffleRead("scalespec-annpq") {
        Similarity.annPq(codes, codebooks, queries, "id", "emb", 10)
          .write.mode("overwrite").format("noop").save()
      }
      assert(rec < n * 0.35,
        s"annPq: a single task read $rec of $n code rows")
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      codes.unpersist()
    }
  }

  test("annIvfStored / annLsh: a hot cell/bucket never lands on one task " +
       "(extremeK-routed top-k) and both match the naive window") {
    // skewed fixture: 90% of the corpus sits in ONE cell and the query
    // routes to it — the pruned families' residual straggler: a per-query
    // rank window sorts the whole hot cell in a single task.
    import org.apache.spark.sql.expressions.Window
    import graft.sim.Similarity
    val n = 20000
    val corpus = spark.range(n).select(col("id"),
        expr("transform(sequence(0, 7), j -> " +
          "cast(pmod(id * (j * 2654435761L + 97) + j * j, 1000) " +
          "AS DOUBLE) / 1000.0)").as("emb"),
        // 90% hot cell 0, the rest spread over 9 cold cells
        when(col("id") % 10 < 9, lit(0L))
          .otherwise(pmod(col("id"), lit(9)) + 1).as("cell"))
      .repartition(8).cache()
    corpus.count()
    val queries = corpus.filter(col("id") === 10) // id%10==0 → hot cell
    val assigned = corpus.select(col("id").as("vec_id"),
      Similarity.asDouble("emb").as("v"), col("cell"))
    val centroids = Similarity.ivfCentroids(
      corpus.select(col("cell"), col("emb")), "cell", "emb")

    val fast = Similarity.annIvfStored(assigned, centroids, queries,
      "id", "emb", 10, nProbe = 1)
    val naive = {
      graft.expressions.CosineSimilarity.register(spark)
      val q = queries.select(col("id").as("q_id"),
        Similarity.asDouble("emb").as("qv"))
      val routed = q.crossJoin(broadcast(centroids))
        .withColumn("csim", round(expr("graft_cosine(qv, cv)"), 6))
        .withColumn("rn", row_number().over(Window.partitionBy("q_id")
          .orderBy(col("csim").desc, col("cid").asc)))
        .filter(col("rn") <= 1).select("q_id", "qv", "cid")
      val w = Window.partitionBy("q_id")
        .orderBy(col("sim").desc, col("vec_id").asc)
      assigned.select(col("vec_id"), col("cell").as("cid"), col("v"))
        .join(broadcast(routed), Seq("cid"))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("sim", round(expr("graft_cosine(qv, v)"), 6))
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= 10)
        .select("q_id", "vec_id", "sim", "rank")
    }
    assert(fast.count() == 10)
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try {
      val recI = maxTaskShuffleRead("scalespec-annivf") {
        Similarity.annIvfStored(assigned, centroids, queries,
            "id", "emb", 10, nProbe = 1)
          .write.mode("overwrite").format("noop").save()
      }
      assert(recI < n * 0.35,
        s"annIvfStored: a single task read $recI of the $n-row hot cell")
      val recL = maxTaskShuffleRead("scalespec-annlsh") {
        Similarity.annLsh(corpus, queries, "id", "emb", 10,
            nPlanes = 2, dim = 8)
          .write.mode("overwrite").format("noop").save()
      }
      assert(recL < n * 0.35,
        s"annLsh: a single task read $recL of $n bucket rows")
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      corpus.unpersist()
    }
  }

  test("annJoin: a hot cell never lands a per-query sort on one task " +
       "(extremeK-routed top-k) and matches the naive window") {
    // corpus-wide join shape: EVERY vector is a query, and with 90% of
    // the corpus in one hot cell each hot vector's candidate set is the
    // whole hot cell — a raw rank window repeats a |cell|-row single-task
    // sort per probing vector; extremeK's passes spread the scored frame
    // and the final sort sees ~k + |cell|/bins rows per query.
    import org.apache.spark.sql.expressions.Window
    import graft.sim.Similarity
    val n = 2000
    val hot = (n * 9) / 10
    val corpus = spark.range(n).select(col("id"),
        expr("transform(sequence(0, 7), j -> " +
          "cast(pmod(id * (j * 2654435761L + 97) + j * j, 1000) " +
          "AS DOUBLE) / 1000.0)").as("emb"),
        when(col("id") % 10 < 9, lit(0L))
          .otherwise(pmod(col("id"), lit(9)) + 1).as("cell"))
      .repartition(8).cache()
    corpus.count()
    val fast = Similarity.annJoin(corpus, "id", "emb", "cell",
      k = 5, nProbe = 1)
    val naive = {
      graft.expressions.CosineSimilarity.register(spark)
      val base = corpus.select(col("id").as("vec_id"), col("cell").as("cid"),
        Similarity.asDouble("emb").as("v"))
      val centroids = Similarity.ivfCentroids(base, "cid", "v")
      val routed = base.select(col("vec_id").as("q_id"), col("v").as("qv"))
        .crossJoin(broadcast(centroids))
        .withColumn("csim", round(expr("graft_cosine(qv, cv)"), 6))
        .withColumn("rn", row_number().over(Window.partitionBy("q_id")
          .orderBy(col("csim").desc, col("cid").asc)))
        .filter(col("rn") <= 1).select("q_id", "qv", "cid")
      val w = Window.partitionBy("q_id")
        .orderBy(col("sim").desc, col("vec_id").asc)
      base.join(routed, Seq("cid"))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("sim", round(expr("graft_cosine(qv, v)"), 6))
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
        .select("q_id", "vec_id", "sim", "rank")
    }
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty,
      "annJoin must match the per-query rank window row-for-row")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try {
      val rec = maxTaskShuffleRead("scalespec-annjoin") {
        Similarity.annJoin(corpus, "id", "emb", "cell", k = 5, nProbe = 1)
          .write.mode("overwrite").format("noop").save()
      }
      // naive shape: hot² candidate rows hash-spread over 32 tasks puts
      // ~hot²/32 ≈ 56·hot rows in one sorting task; the binned selection
      // must stay an order of magnitude below that
      assert(rec < hot * 10L,
        s"annJoin: a single task read $rec rows (hot cell = $hot)")
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      corpus.unpersist()
    }
  }
}
