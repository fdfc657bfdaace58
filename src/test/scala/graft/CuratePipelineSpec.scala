package graft

import graft.text.CuratePipeline
import org.apache.spark.sql.functions._

/** End-to-end curation DAG on a crafted corpus: every stage drops exactly
  * the planted offender and the audit trail records each cut. */
class CuratePipelineSpec extends SparkSpec {
  import spark.implicits._

  private val good =
    "the quick brown fox jumps over the lazy dog while the cat sleeps near the warm fire " +
      "and the birds sing in the tall green trees above the quiet garden path"
  private val good2 =
    "a long and patient description of the orchard with its rainfall schedules and the " +
      "rotation of the soil that farmers keep in their heads for a whole lifetime of work"
  private val evalText =
    "the benchmark asks about the rotation of the soil that farmers keep in their heads " +
      "and expects a short factual answer about it"

  test("each stage drops exactly the planted offender; packing is contiguous") {
    val docs = Seq(
      (1L, good, "s0"),                               // survives everything
      (2L, "short junk", "s0"),                       // quality: too_short
      (3L, good, "s0"),                               // exact dup of 1
      (4L, good.replace("quiet", "silent"), "s0"),    // near dup of 1
      (5L, good2, "s1"),                              // contaminated vs eval
      (6L, ("unique tokens for a perfectly fine document about astronomy and the " +
        "slow drift of the stars across a clear night sky in early winter"), "s1"))
      .toDF("doc_id", "text", "source")
    val evalSet = Seq((100L, evalText)).toDF("doc_id", "text")

    val r = CuratePipeline.run(docs, evalSet, nearDupAt = 0.5,
      contamAt = 0.2, seqLen = 16L)
    val audit = r.audit.toMap
    assert(r.audit.map(_._1) == Seq("raw", "quality_filter", "exact_dedup",
      "near_dedup", "decontaminate", "train_split", "packed"))
    assert(audit("raw") == 6L)
    assert(audit("quality_filter") == 5L)   // doc 2 dropped
    assert(audit("exact_dedup") == 4L)      // doc 3 dropped (1 is canonical)
    assert(audit("near_dedup") == 3L)       // doc 4 dropped (cluster rep = 1)
    assert(audit("decontaminate") == 2L)    // doc 5 dropped (eval overlap)
    assert(audit("train_split") <= 2L)
    assert(audit("packed") == audit("train_split"))

    val packed = r.packed.collect()
    val ids = packed.map(_.getLong(0)).toSet
    assert(ids.subsetOf(Set(1L, 6L)))
    // per-source streams start at 0 and bin math holds
    packed.foreach { row =>
      val (n, off, first, last) =
        (row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5))
      assert(first == off / 16 && last == (off + n - 1) / 16)
    }

    // determinism: a second run over the same corpus is identical
    val r2 = CuratePipeline.run(docs, evalSet, nearDupAt = 0.5,
      contamAt = 0.2, seqLen = 16L)
    assert(r2.audit == r.audit)
    assert(r2.packed.collect().map(_.toString).sorted
      .sameElements(packed.map(_.toString).sorted))
  }

  test("CurationDemo: the soft-dedup/calibrated/cluster-split composition " +
       "survives end-to-end to packed train spans") {
    val out = graft.examples.CurationDemo.run(spark, "/root/testdata/sf0.001")
    assert(out.count() > 0, "curation chain filtered everything out")
    assert(out.filter(col("first_bin") > col("last_bin")).count() == 0)
  }

  test("CurationDemo multimodal leg: decode → cosine pairs → clusters " +
       "keeps one representative per injected near-dup group") {
    val kept = graft.examples.CurationDemo.runMultimodal(spark)
    // 12 groups of 4 brightness-shifted members → exactly the 12 group
    // minima survive
    val ids = kept.select("asset_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == (0 until 12).map(g => (g * 4).toLong))
  }

  test("CurationDemo serving leg: build + append + fold + drift check + " +
       "hybrid eval run entirely off the stored indexes") {
    val m = graft.examples.CurationDemo
      .runIndexLifecycle(spark, "/root/testdata/sf0.001")
      .collect()
    assert(m.length == 10, s"one metrics row per query: ${m.length}")
    val macroRecall = m.head.getDouble(m.head.fieldIndex("macro_recall"))
    assert(macroRecall > 0.0 && macroRecall <= 1.0, s"macro $macroRecall")
  }
}
