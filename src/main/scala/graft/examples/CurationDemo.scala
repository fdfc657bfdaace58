package graft.examples

import graft.Tables
import graft.multimodal.Multimodal
import graft.ops.Stats
import graft.sim.Similarity
import graft.text.{Curate, Dedup, LexIndex, Mix, Retrieval, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-data curation consumer: the LLM-pipeline
  * counterpart of [[PipelineDemo]] — one program running the full
  * curation chain a 100 TB corpus goes through, over the driver's
  * `documents` table:
  *
  *   quality filter → exact dedup → MinHash/LSH near-dup clusters →
  *   soft-dedup weights → decontaminate vs an eval set →
  *   quantile-normalized quality threshold → leakage-free cluster split →
  *   sequence packing
  *
  * plus the multimodal leg ([[runMultimodal]]): image assets → real
  * raster decode → feature vectors → the SAME cosine-pair + clustering
  * dedup stack, keeping one representative per near-duplicate group.
  *
  * Every stage is the same operator the oracle-checked catalog uses; this
  * file exists so a library consumer can read ONE composition top to
  * bottom. Run:
  *   sbt "runMain graft.examples.CurationDemo"
  */
object CurationDemo {

  /** The composition, returned as the final packed frame (the spec smoke:
    * rows > 0 and no train/test cluster leakage). */
  def run(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)

    // 1. per-row quality rules (C4/Gopher-style): keep + reasons
    val filtered = docs.join(
        Curate.filterPipeline(docs, "doc_id", "text")
          .filter(col("keep") === 1).select("doc_id"),
        Seq("doc_id"), "left_semi")
      .select("doc_id", "source", "text")
    println(s"[curate] after quality filter: ${filtered.count()}")

    // 2. exact dedup (digest groups, min-id canonical survives)
    val exact = filtered.join(
      Dedup.exactGroups(filtered, "doc_id", "text")
        .select(col("canonical_id").as("doc_id")),
      Seq("doc_id"), "left_semi")
    println(s"[curate] after exact dedup: ${exact.count()}")

    // 3. near-dup clusters → soft-dedup sampling (down-weight, don't drop)
    val pairs = Dedup.minhashCandidates(
      Dedup.minhashSignatures(exact, "doc_id", "text"), "doc_id")
      .filter(col("est_jaccard") >= 0.5)
    val clusters = Dedup.dedupClusters(exact, pairs, "doc_id")
    val weighted = Dedup.softDedupWeights(clusters, "doc_id")
    val sampled = weighted.filter(col("sampled") === 1)
      .select("doc_id", "cluster_id")
      .join(exact, "doc_id")
    println(s"[curate] after soft dedup: ${sampled.count()}")

    // 4. decontamination against a (stand-in) eval set: flag docs sharing
    //    8-gram spans with the lowest-id docs, drop flagged
    val eval = exact.orderBy("doc_id").limit(20).select("doc_id", "text")
    val decon = Curate.contamination(sampled, eval, "doc_id", "text",
        n = 8, flagAt = 0.2)
      .filter(col("contaminated") === 0)
      .select("doc_id")
      .join(sampled, "doc_id")
    println(s"[curate] after decontamination: ${decon.count()}")

    // 5. quality score, rank-calibrated per source, thresholded at each
    //    source's median (keep the better half of EVERY source)
    val scored = TextOps.qualityScore(decon, "text")
    val calibrated = Stats.quantileNormalize(scored, "quality_score",
      "source", Seq(col("doc_id")))
    val kept = calibrated.filter(col("src_rank") >= 0.5)
      .select("doc_id", "cluster_id", "source", "text")
    println(s"[curate] after calibrated threshold: ${kept.count()}")

    // 6. leakage-free split: assignment keyed on the near-dup cluster
    val split = Mix.splitAssign(kept, "cluster_id")
    // 7. pack the train split into fixed-length sequences
    val packed = Mix.packSequences(split.filter(col("split") === "train"),
      "doc_id", "source", "text", seqLen = 256L)
    println(s"[curate] packed train doc spans: ${packed.count()}")
    packed
  }

  /** The multimodal leg: a media-asset frame (here: generated gradient
    * PNGs with injected near-duplicate groups) flows through real raster
    * decode into the text stack's similarity + clustering operators —
    * multimodal content is a first-class dedup citizen, not a silo.
    * Returns the kept (representative) assets. */
  def runMultimodal(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val assets = (0 until 12).flatMap(g => (0 until 4).map(m =>
        ((g * 4 + m).toLong, Multimodal.gradPngBytes(g, m))))
      .toDF("asset_id", "content")
      .repartition(8, col("asset_id"))
    // 1. decode: per-channel pixel statistics from the actual raster
    //    (persisted — the frame feeds both self-join sides and the
    //    cluster vertex set; re-decoding rasters per consumer is the
    //    thing to avoid at corpus scale)
    val feats = Multimodal.imageFeatures(assets)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // 2. near-dup pairs: LSH-bucketed exact-cosine filter on the features
    val pairs = Similarity.cosineNearDupPairs(feats, "asset_id", "features",
      minSim = 0.9995, nPlanes = 4, dim = 6)
    // 3. connected components → keep one representative per group
    val clusters = Dedup.dedupClusters(feats.select("asset_id"), pairs,
      "asset_id")
    val kept = clusters.filter(col("keep") === 1).select("asset_id")
      .join(assets, "asset_id")
    println(s"[curate] image assets kept: ${kept.count()} of ${assets.count()}")
    kept
  }

  /** The SERVING leg: the curated corpus becomes maintained on-disk
    * retrieval state, operated the way a deployment would copy it. A
    * term-bucketed lexical index and a cell-partitioned vector index are
    * built over the prior snapshot; the new shard arrives as a STREAM
    * (an AvailableNow run through [[graft.streaming.StreamingLex]]'s
    * foreachBatch sink, so retries restate and folded batches are dropped
    * by the watermark guard); the maintenance TRIGGERS decide what runs —
    * `compactIndexIfNeeded` folds the lexical increments once they exceed
    * the threshold, `reclusterIvfIndexIfDrifted` rebuilds the vector
    * quantizer only on a drift breach; a TAKEDOWN stream tombstones
    * opted-out ids on both axes (logically immediate, physically erased
    * by the very same fold/recluster maintenance); and the hybrid stack
    * is evaluated
    * entirely off the stored artifacts, twice: the BM25→rerank eval and
    * the fused BM25+ANN RRF serving query. Returns the fused-serving
    * metrics frame. */
  def runIndexLifecycle(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val e = Tables.embeddings(spark, dir)
    val root = java.nio.file.Files
      .createTempDirectory("graft_demo_idx").toString

    // lexical: base over the prior snapshot; the delta STREAMS in through
    // the foreachBatch sink (idempotent batch=<id> increments), and the
    // compaction trigger folds once the increment count crosses the
    // threshold — the call a deployment makes after every stream run
    LexIndex.writeIndex(docs.filter(col("doc_id") % 5 =!= 4),
      "doc_id", "text", s"$root/lex")
    docs.filter(col("doc_id") % 5 === 4).write.parquet(s"$root/delta")
    graft.streaming.StreamingLex.lexSink(
        spark.readStream.schema(docs.schema).parquet(s"$root/delta"),
        "doc_id", "text", s"$root/lex", s"$root/chk")
      .start().awaitTermination()
    // takedown: opted-out doc_ids arrive as a DELETE stream — tombstone
    // increments make them logically gone from the next read; the trigger
    // fold below physically erases their rows from the rewritten base,
    // and the tombstones stay terminal (a re-crawl can't resurrect them)
    docs.filter(col("doc_id") % 31 === 7).select("doc_id")
      .write.parquet(s"$root/takedown")
    graft.streaming.StreamingLex.tombstoneSink(
        spark.readStream
          .schema(docs.select("doc_id").schema).parquet(s"$root/takedown"),
        s"$root/lex", s"$root/chkdel")
      .start().awaitTermination()
    val (pFolded, dFolded) =
      LexIndex.compactIndexIfNeeded(spark, s"$root/lex", maxIncrements = 0)
    println(s"[curate] lexical increments folded (trigger): " +
      s"postings=$pFolded doclens=$dFolded")

    // vector: frozen-centroid append, then the drift-triggered recluster;
    // the takedown's vec_ids tombstone the vector index the same way —
    // physically erased by the recluster when drift breaches, or by the
    // explicit vacuum fallback below when it doesn't
    val cents = Similarity.ivfCentroids(
      e.filter(col("vec_id") % 5 =!= 4), "label", "embedding")
    Similarity.writeIvfIndex(
      Similarity.ivfAssign(e.filter(col("vec_id") % 5 =!= 4), "vec_id",
        "embedding", cents), cents, s"$root/vec")
    Similarity.appendIvfBatch(e.filter(col("vec_id") % 5 === 4),
      "vec_id", "embedding", s"$root/vec")
    Similarity.deleteFromIvfIndex(
      e.filter(col("vec_id") % 31 === 7).select("vec_id"), s"$root/vec",
      batchId = 0L)
    val reclustered = Similarity.reclusterIvfIndexIfDrifted(spark,
      s"$root/vec", maxDrift = 0.01)
    println(s"[curate] vector quantizer reclustered after append: " +
      s"$reclustered")
    // no drift breach → the takedown's rows are still physically in the
    // posting lists; the vacuum rewrite finishes the erasure either way
    if (!reclustered) Similarity.vacuumIvfIndex(spark, s"$root/vec")

    // both serving-time evals run off the maintained state only
    val qs = e.filter(col("vec_id") < 10)
    val terms = Seq("join", "hash", "filter", "stream")
    val rerank = Retrieval.rerankEvalIndexed(spark, s"$root/lex", terms,
      Similarity.readIvfIndex(spark, s"$root/vec")._1
        .select("vec_id", "v"),
      qs, "vec_id", "embedding", nCand = 50, k = 5)
    println("[curate] BM25->rerank macro metrics: " +
      rerank.select("macro_recall", "macro_mrr", "macro_ndcg").head())
    val fused = Retrieval.hybridRrfIndexed(spark, s"$root/lex",
      s"$root/vec", terms, qs, "vec_id", "embedding",
      nLex = 50, nProbe = 2, k = 5)
    println("[curate] fused RRF serving macro metrics: " +
      fused.select("macro_recall", "macro_mrr", "macro_ndcg").head())
    fused
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val packed = run(spark, dir)
    packed.show(5, truncate = false)
    runMultimodal(spark).select("asset_id").show(5)
    runIndexLifecycle(spark, dir)
      .select("q_id", "recall", "mrr", "ndcg").show(5)
    spark.stop()
  }
}
