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

    // trigger above threshold: folds, stamps the watermark
    assert(StreamingSketch.compactSketchIfNeeded(spark, sk, 1) == 2)
    assert(!fs.exists(new Path(s"$sk/increments")))
    assert(readTotal(sk) == 13)
    assert(Compaction.foldedWatermark(spark, sk) == 1)
    assert(Compaction.isFolded(spark, sk, 1) &&
      !Compaction.isFolded(spark, sk, 2))

    // a replayed batch re-lands its folded increment: the reader must
    // prune it (no double count) and the next fold must DROP it unfolded
    writeCounter(s"$sk/increments/batch=1", 2)
    assert(readTotal(sk) == 13,
      "read-time watermark prune must ignore a replayed folded increment")
    assert(StreamingSketch.compactSketch(spark, sk) == 0,
      "a stale increment must be dropped, not refolded")
    assert(!fs.exists(new Path(s"$sk/increments")))
    assert(readTotal(sk) == 13)

    // later batches keep flowing: ids above the watermark fold normally
    writeCounter(s"$sk/increments/batch=2", 5)
    assert(readTotal(sk) == 18)
    assert(StreamingSketch.compactSketch(spark, sk) == 1)
    assert(readTotal(sk) == 18)
    assert(Compaction.foldedWatermark(spark, sk) == 2)
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
    writeCounter(s"$c/base_old", 10)                     // leftover old copy
    writeCounter(s"$c/increments/batch=0", 4)            // undeleted increment
    assert(readTotal(c) == 14, "watermark prune covers the undeleted increment")
    assert(StreamingSketch.compactSketch(spark, c) == 0)
    assert(readTotal(c) == 14)
    assert(!fs.exists(new Path(s"$c/base_old")) &&
      !fs.exists(new Path(s"$c/increments")))
  }

  test("promote: multi-directory swap is all-or-nothing across crashes") {
    def mk(root: String, name: String, tag: String): Unit = {
      fs.mkdirs(new Path(s"$root/$name"))
      fs.create(new Path(s"$root/$name/$tag"), true).close()
    }
    def tagOf(root: String, name: String): String =
      fs.listStatus(new Path(s"$root/$name")).map(_.getPath.getName).min

    // clean promote: both flip, no debris
    val p = tmp("graft_promote")
    mk(p, "x", "vOLD"); mk(p, "y", "vOLD")
    mk(p, "x_new", "vNEW"); mk(p, "y_new", "vNEW")
    Compaction.promote(spark, p, Seq("x", "y"))
    assert(tagOf(p, "x") == "vNEW" && tagOf(p, "y") == "vNEW")
    assert(fs.listStatus(new Path(p)).map(_.getPath.getName).toSet ==
      Set("x", "y"), "no marker/_old/_new debris may survive a promote")

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
    LexIndex.appendBatch(docs.filter(col("doc_id") === 2), "doc_id", "text",
      s"$lex/idx", 0L)
    assert(!fs.exists(new Path(s"$lex/idx/postings/increments")) &&
      !fs.exists(new Path(s"$lex/idx/doclens/increments")),
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
    Dedup.appendSignatureIndex(sig.filter(col("doc_id") === 2), "doc_id",
      s"$ded/idx", 0L)
    assert(!fs.exists(new Path(s"$ded/idx/increments")),
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
}
