package graft

import graft.streaming.{Compaction, StreamingSketch}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** The maintained-artifact fold/swap protocol under crashes and replays:
  * every interrupted-swap state must converge to a readable artifact with
  * the ORIGINAL or the NEW content (never neither, never a mix), a batch
  * replayed after its increment was folded must not double-count (sink
  * guard + read-time watermark prune + fold-time stale drop), and the
  * compaction triggers must be no-ops below threshold. */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def fs = new Path("/tmp")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Hand-built count-min-shaped artifact: one (j, bucket, c) counter. */
  private def writeCounter(path: String, c: Long): Unit =
    Seq((0, 0, c)).toDF("j", "bucket", "c")
      .coalesce(1).write.mode("overwrite").parquet(path)

  private def readTotal(root: String): Long =
    StreamingSketch.readMergedSketch(spark, root)
      .agg(sum("c")).head().getLong(0)

  test("foldIncrements: watermark makes replay-after-fold single-count " +
       "(reader prunes, next fold drops), and the trigger gates on count") {
    val sk = tmp("graft_cmp_wm")
    writeCounter(s"$sk/base", 10)
    writeCounter(s"$sk/increments/batch=0", 1)
    writeCounter(s"$sk/increments/batch=1", 2)
    assert(readTotal(sk) == 13)

    // trigger below threshold: untouched
    assert(StreamingSketch.compactSketchIfNeeded(spark, sk, 5) == 0)
    assert(fs.exists(new Path(s"$sk/increments/batch=0")))
    assert(readTotal(sk) == 13)

    // trigger above threshold: folds, stamps the watermark. The folded
    // increments are RETAINED (grace): the legacy base is still an
    // in-grace snapshot with watermark -1, and a reader holding it needs
    // them — readers of the new generation prune them by partition column
    assert(StreamingSketch.compactSketchIfNeeded(spark, sk, 1) == 2)
    assert(fs.exists(new Path(s"$sk/increments/batch=0")),
      "folded increments stay on disk while an in-grace snapshot needs them")
    assert(readTotal(sk) == 13)
    assert(Compaction.foldedWatermark(spark, sk) == 1)
    assert(Compaction.isFolded(spark, sk, 1) &&
      !Compaction.isFolded(spark, sk, 2))
    // ... and the trigger no longer counts them (no fold-loop)
    assert(Compaction.incrementCount(spark, sk) == 0)

    // a replayed batch re-lands its folded increment: the reader must
    // prune it (no double count) and the next fold must not refold it
    writeCounter(s"$sk/increments/batch=1", 2)
    assert(readTotal(sk) == 13,
      "read-time watermark prune must ignore a replayed folded increment")
    assert(StreamingSketch.compactSketch(spark, sk) == 0,
      "a stale increment must be dropped or retained-pruned, not refolded")
    assert(readTotal(sk) == 13)

    // later batches keep flowing: ids above the watermark fold normally;
    // committing the SECOND versioned generation pushes the legacy layout
    // out of grace, so the first fold's increments (batch ids <= the
    // oldest surviving generation's watermark) are reaped now
    writeCounter(s"$sk/increments/batch=2", 5)
    assert(readTotal(sk) == 18)
    assert(StreamingSketch.compactSketch(spark, sk) == 1)
    assert(readTotal(sk) == 18)
    assert(Compaction.foldedWatermark(spark, sk) == 2)
    assert(!fs.exists(new Path(s"$sk/increments/batch=0")) &&
      !fs.exists(new Path(s"$sk/increments/batch=1")),
      "increments below every in-grace watermark are reaped")
    assert(fs.exists(new Path(s"$sk/increments/batch=2")),
      "the just-folded increment survives its own grace round")
    assert(!fs.exists(new Path(s"$sk/base")),
      "the legacy base is GC'd once two versioned generations supersede it")
  }

  test("foldIncrements: every interrupted-swap state converges — torn " +
       "write-aside, mid-swap (base missing), post-swap (old leftover)") {
    // state A: crash during the base_compact write (torn dir) — the fold
    // must discard it and refold from the intact base + increments
    val a = tmp("graft_cmp_a")
    writeCounter(s"$a/base", 10)
    writeCounter(s"$a/increments/batch=0", 4)
    fs.mkdirs(new Path(s"$a/base_compact"))
    fs.create(new Path(s"$a/base_compact/part-torn.parquet"), true).close()
    assert(StreamingSketch.compactSketch(spark, a) == 1)
    assert(readTotal(a) == 14)
    assert(!fs.exists(new Path(s"$a/base_compact")) &&
      !fs.exists(new Path(s"$a/base_old")))

    // state B: crash BETWEEN rename(base -> base_old) and
    // rename(base_compact -> base): base absent, base_old is the only
    // copy, a complete-looking base_compact is on disk. Recovery must
    // restore base_old (NOT fold increments into an empty base, NOT
    // delete the only copy) and discard the write-aside; the refold then
    // produces the right value.
    val b = tmp("graft_cmp_b")
    writeCounter(s"$b/base", 10)
    writeCounter(s"$b/increments/batch=0", 4)
    writeCounter(s"$b/base_compact", 99) // plausible but must be discarded
    assert(fs.rename(new Path(s"$b/base"), new Path(s"$b/base_old")))
    assert(StreamingSketch.compactSketch(spark, b) == 1)
    assert(readTotal(b) == 14,
      "mid-swap recovery must restore the original base before refolding")
    assert(!fs.exists(new Path(s"$b/base_compact")) &&
      !fs.exists(new Path(s"$b/base_old")))

    // state C: crash AFTER the promote (new base live, watermark stamped)
    // but before base_old / increment deletes — the old copy must be
    // dropped and the still-present folded increment must not double-count
    val c = tmp("graft_cmp_c")
    writeCounter(s"$c/base", 10)
    writeCounter(s"$c/increments/batch=0", 4)
    assert(StreamingSketch.compactSketch(spark, c) == 1) // base = 14, wm = 0
    writeCounter(s"$c/base_old", 10)                     // legacy-debris copy
    writeCounter(s"$c/increments/batch=0", 4)            // re-landed increment
    assert(readTotal(c) == 14, "watermark prune covers the re-landed increment")
    assert(StreamingSketch.compactSketch(spark, c) == 0)
    assert(readTotal(c) == 14)
    assert(!fs.exists(new Path(s"$c/base_old")),
      "legacy swap debris is converged on the next maintenance entry")
    // the re-landed folded increment is retained while the legacy base is
    // in grace, and reaped once a second generation pushes it out
    assert(fs.exists(new Path(s"$c/increments/batch=0")))
    writeCounter(s"$c/increments/batch=1", 3)
    assert(StreamingSketch.compactSketch(spark, c) == 1)
    assert(readTotal(c) == 17)
    assert(!fs.exists(new Path(s"$c/increments/batch=0")),
      "out-of-grace increments are reaped by the next fold")
  }

  test("promote: multi-directory swap is all-or-nothing across crashes") {
    def mk(root: String, name: String, tag: String): Unit = {
      fs.mkdirs(new Path(s"$root/$name"))
      fs.create(new Path(s"$root/$name/$tag"), true).close()
    }
    def tagOf(root: String, name: String): String =
      fs.listStatus(new Path(s"$root/$name")).map(_.getPath.getName).min

    def resolvedTag(root: String, name: String): String = {
      val d = Compaction.resolve(spark, root, name).get
      fs.listStatus(new Path(d)).map(_.getPath.getName).min
    }

    // clean promote: both names flip TOGETHER in one pointer commit; the
    // superseded legacy dirs stay readable for one grace round
    val p = tmp("graft_promote")
    mk(p, "x", "vOLD"); mk(p, "y", "vOLD")
    mk(p, "x_new", "vNEW"); mk(p, "y_new", "vNEW")
    Compaction.promote(spark, p, Seq("x", "y"))
    assert(resolvedTag(p, "x") == "vNEW" && resolvedTag(p, "y") == "vNEW")
    assert(!fs.exists(new Path(s"$p/x_new")) &&
      !fs.exists(new Path(s"$p/_promote_pending")),
      "no payload/marker debris may survive a promote")
    assert(tagOf(p, "x") == "vOLD",
      "the previous generation stays readable through the grace period")
    // a second promote pushes the legacy generation out of grace; the
    // FIRST versioned generation is still referenced by the previous
    // pointer, so it survives this round
    val gen1x = Compaction.resolve(spark, p, "x").get
    mk(p, "x_new", "vNEW2"); mk(p, "y_new", "vNEW2")
    Compaction.promote(spark, p, Seq("x", "y"))
    assert(resolvedTag(p, "x") == "vNEW2" && resolvedTag(p, "y") == "vNEW2")
    assert(!fs.exists(new Path(s"$p/x")) && !fs.exists(new Path(s"$p/y")),
      "out-of-grace legacy dirs are reaped")
    assert(fs.exists(new Path(gen1x)),
      "the previous versioned generation stays in grace")
    // a third promote pushes generation 1 out of grace
    mk(p, "x_new", "vNEW3"); mk(p, "y_new", "vNEW3")
    Compaction.promote(spark, p, Seq("x", "y"))
    assert(resolvedTag(p, "x") == "vNEW3")
    assert(!fs.exists(new Path(gen1x)),
      "out-of-grace versioned generations are reaped")

    // pre-commit crash: _new dirs exist, no marker — recovery ROLLS BACK
    val q = tmp("graft_promote_pre")
    mk(q, "x", "vOLD"); mk(q, "x_new", "vNEW")
    Compaction.recoverPromote(spark, q)
    assert(tagOf(q, "x") == "vOLD")
    assert(!fs.exists(new Path(s"$q/x_new")))

    // post-commit crash mid-swap: marker present, x already flipped
    // (x_old left), y not yet — recovery ROLLS FORWARD both
    val r = tmp("graft_promote_post")
    mk(r, "x", "vNEW"); mk(r, "x_old", "vOLD")
    mk(r, "y", "vOLD"); mk(r, "y_new", "vNEW")
    val out = fs.create(new Path(s"$r/_promote_pending"), false)
    out.write("x\ny".getBytes("UTF-8")); out.close()
    Compaction.recoverPromote(spark, r)
    assert(tagOf(r, "x") == "vNEW" && tagOf(r, "y") == "vNEW")
    assert(fs.listStatus(new Path(r)).map(_.getPath.getName).toSet ==
      Set("x", "y"))

    // a fold-protocol leftover (base_old as the ONLY copy) must NOT be
    // touched by promote recovery — it belongs to recover()
    val s2 = tmp("graft_promote_fold")
    mk(s2, "base_old", "vOLD")
    Compaction.recoverPromote(spark, s2)
    assert(fs.exists(new Path(s"$s2/base_old")),
      "promote recovery must not delete the fold protocol's only copy")
  }

  test("sink-side replay guards: appendBatch / appendSignatureIndex drop " +
       "a batch at or below the folded watermark") {
    import graft.text.{Dedup, LexIndex}
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "eta theta iota kappa lambda mu"),
      (3L, "nu xi omicron pi rho sigma")).toDF("doc_id", "text")

    // lexical index: fold batch 0, then replay it — nothing may re-land
    val lex = tmp("graft_cmp_lex")
    LexIndex.writeIndex(docs.filter(col("doc_id") === 1), "doc_id", "text",
      s"$lex/idx", nBuckets = 4)
    LexIndex.appendBatch(docs.filter(col("doc_id") === 2), "doc_id", "text",
      s"$lex/idx", 0L)
    val (pf, df) = LexIndex.compactIndex(spark, s"$lex/idx")
    assert(pf == 1 && df == 1)
    def listing(d: String): Set[String] =
      if (!fs.exists(new Path(d))) Set.empty
      else fs.listStatus(new Path(d)).map(_.getPath.getName).toSet
    val before = (listing(s"$lex/idx/postings/increments"),
      listing(s"$lex/idx/doclens/increments"))
    LexIndex.appendBatch(docs.filter(col("doc_id") === 2), "doc_id", "text",
      s"$lex/idx", 0L)
    assert((listing(s"$lex/idx/postings/increments"),
      listing(s"$lex/idx/doclens/increments")) == before,
      "a replayed folded batch must not re-land its increments")
    assert(LexIndex.readDocLens(spark, s"$lex/idx").count() == 2)

    // signature index: same contract on the bands layout
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text")
    val ded = tmp("graft_cmp_ded")
    Dedup.writeSignatureIndex(sig.filter(col("doc_id") === 1), "doc_id",
      s"$ded/idx", nBuckets = 4)
    val bandCount = (p: String) =>
      Dedup.readSignatureIndex(spark, p).bands.count()
    Dedup.appendSignatureIndex(sig.filter(col("doc_id") === 2), "doc_id",
      s"$ded/idx", 0L)
    val n = bandCount(s"$ded/idx")
    assert(Dedup.compactSignatureIndex(spark, s"$ded/idx") == 1)
    assert(bandCount(s"$ded/idx") == n)
    val beforeBands = fs.listStatus(new Path(s"$ded/idx/increments"))
      .map(_.getPath.getName).toSet
    Dedup.appendSignatureIndex(sig.filter(col("doc_id") === 2), "doc_id",
      s"$ded/idx", 0L)
    assert(fs.listStatus(new Path(s"$ded/idx/increments"))
      .map(_.getPath.getName).toSet == beforeBands,
      "a replayed folded batch must not re-land its band rows")
    assert(bandCount(s"$ded/idx") == n)
    // the trigger: no-op below, folds above
    Dedup.appendSignatureIndex(sig.filter(col("doc_id") === 3), "doc_id",
      s"$ded/idx", 1L)
    assert(Dedup.compactSignatureIndexIfNeeded(spark, s"$ded/idx", 5) == 0)
    assert(fs.exists(new Path(s"$ded/idx/increments")))
    assert(Dedup.compactSignatureIndexIfNeeded(spark, s"$ded/idx", 0) == 1)
    assert(bandCount(s"$ded/idx") > n)
  }

  test("LexIndex compaction rejects a doc_id ingested in two batches") {
    import graft.text.LexIndex
    val lex = tmp("graft_cmp_dup")
    val d1 = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    LexIndex.writeIndex(d1, "doc_id", "text", s"$lex/idx", nBuckets = 4)
    // the SAME doc re-ingested under a NEW batch id (re-crawl) — split tf
    // fragments and doubled doclens rows would silently skew BM25
    LexIndex.appendBatch(d1, "doc_id", "text", s"$lex/idx", 0L)
    val e = intercept[IllegalArgumentException] {
      LexIndex.compactIndex(spark, s"$lex/idx")
    }
    assert(e.getMessage.contains("duplicate doc_id"))
  }

  test("write lease: a held lease makes a second maintenance op fail " +
       "fast with the index intact; a stale lease is broken after TTL") {
    val sk = tmp("graft_cmp_lease")
    writeCounter(s"$sk/base", 10)
    writeCounter(s"$sk/increments/batch=0", 1)
    // a concurrent writer holds the lease (what a racing fold would have
    // created): this op must refuse, not race the pointer commit
    val lease = new Path(s"$sk/_lease")
    val out = fs.create(lease, false)
    out.write("otherhost:12345".getBytes("UTF-8")); out.close()
    val err = intercept[IllegalStateException] {
      StreamingSketch.compactSketch(spark, sk)
    }
    assert(err.getMessage.contains("lease") &&
      err.getMessage.contains("otherhost:12345"), err.getMessage)
    // refused cleanly: nothing folded, reads intact, lease untouched
    assert(Compaction.foldedWatermark(spark, sk) == -1L)
    assert(readTotal(sk) == 11)
    assert(fs.exists(lease))

    // a CRASHED writer's lease (older than the TTL) is broken and the op
    // proceeds
    spark.conf.set("spark.graft.leaseTtlMinutes", "0")
    try {
      assert(StreamingSketch.compactSketch(spark, sk) == 1)
      assert(readTotal(sk) == 11)
      assert(!fs.exists(lease), "the lease is released on completion")
    } finally spark.conf.unset("spark.graft.leaseTtlMinutes")
  }

  test("GC age floor: with a wall-clock grace every superseded " +
       "generation, pointer and folded increment survives rapid-fire " +
       "folds, so a long reader planned before the first fold still " +
       "executes against complete files") {
    val sk = tmp("graft_cmp_grace")
    writeCounter(s"$sk/base", 10)
    writeCounter(s"$sk/increments/batch=0", 1)
    spark.conf.set("spark.graft.gcGraceMinutes", "30")
    try {
      assert(StreamingSketch.compactSketch(spark, sk) == 1)
      // a long analytical reader resolves THIS snapshot (generation 1)
      // and keeps executing while maintenance continues
      val oldBase = Compaction.resolve(spark, sk, "base").get
      val planned = spark.read.parquet(oldBase)
      // two more rapid folds — under generation counting alone these
      // would reap generation 1 and batch=0/1
      writeCounter(s"$sk/increments/batch=1", 2)
      assert(StreamingSketch.compactSketch(spark, sk) == 1)
      writeCounter(s"$sk/increments/batch=2", 5)
      assert(StreamingSketch.compactSketch(spark, sk) == 1)
      assert(readTotal(sk) == 18)
      // the floor kept every superseded artifact the reader could hold
      assert(fs.exists(new Path(oldBase)),
        "in-grace superseded generation survives two later folds")
      assert(fs.exists(new Path(s"$sk/increments/batch=0")) &&
        fs.exists(new Path(s"$sk/increments/batch=1")),
        "in-grace folded increments survive")
      assert(planned.agg(sum("c")).head().getLong(0) == 11,
        "the reader planned before the folds still executes")
    } finally spark.conf.set("spark.graft.gcGraceMinutes", "0")
    // back under generation counting: the next op reaps what aged out
    writeCounter(s"$sk/increments/batch=3", 3)
    assert(StreamingSketch.compactSketch(spark, sk) == 1)
    assert(!fs.exists(new Path(s"$sk/increments/batch=0")),
      "with the floor off, out-of-grace increments are reaped again")
  }
}
