package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus retrieval scoring: Okapi BM25 (Robertson & Spärck Jones; the
  * Lucene `+1` idf smoothing so idf stays positive at df > N/2) for a fixed
  * query-term set — the ranking half of a retrieval/decontamination stack,
  * next to `Curate.contamination`'s n-gram overlap half.
  *
  * Scale shape: the query-term set is a literal broadcast; the corpus scan
  * produces (doc, term, tf) only for matching terms (explode-then-filter,
  * map-side combined), so shuffled bytes ∝ matches, not corpus. Corpus
  * stats (N, avgdl) are one scalar row broadcast-crossed in; per-term df is
  * a |terms|-row aggregate broadcast back onto the match frame. ONE real
  * shuffle keyed by doc id.
  *
  * Determinism: tf/df/N/dl are exact longs; avgdl is an exact decimal
  * average cast to double; per-term partial scores are computed in double
  * with one fixed formula, then cast to DECIMAL for the per-doc sum so
  * accumulation order can't wiggle the low bits across engines.
  */
object Retrieval {

  /** BM25 score per document containing ≥1 query term: (id, n_terms
    * matched, bm25 rounded to 6dp). `k1`/`b` defaults sit in the standard
    * ranges AND are exactly representable in binary (1.25, 0.75), so every
    * constant subexpression (k1+1, 1−b, b·dl) is bit-identical whether an
    * engine parses the literal as DECIMAL or DOUBLE. */
  def bm25(df: DataFrame, id: String, text: String, terms: Seq[String],
           k1: Double = 1.25, b: Double = 0.75): DataFrame = {
    val toks = df.select(col(id),
      TextOps.tokens(TextOps.normalize(col(text))).as("_w"))
      .withColumn("dl", size(col("_w")).cast("long"))

    // corpus stats: one row, broadcast
    val stats = toks.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl").cast("decimal(28,6)")).cast("double") / count(lit(1)))
        .as("avgdl"))

    // per-(doc, term) tf over the query terms only
    val tf = toks
      .select(col(id), col("dl"), explode(col("_w")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col(id), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))

    bm25Score(tf, id, stats, k1, b)
  }

  /** The BM25 scoring tail over a prepared (id, dl, term, tf) match frame
    * and a 1-row (n_docs, avgdl) stats frame — shared verbatim by [[bm25]]
    * (from-scratch) and [[LexIndex.bm25Indexed]] (stored postings), so the
    * two paths are value-identical by construction. */
  private[text] def bm25Score(tf: DataFrame, id: String, stats: DataFrame,
                              k1: Double, b: Double): DataFrame = {
    // per-term document frequency (|terms| rows, broadcast back)
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))

    val scored = tf
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("part",
        (col("idf") * (col("tf") * (k1 + 1)) /
          (col("tf") + (col("dl") * b / col("avgdl") + (1 - b)) * k1))
          .cast("decimal(28,12)"))

    scored.groupBy(col(id))
      .agg(count(lit(1)).as("n_terms"),
        round(sum(col("part")).cast("double"), 6).as("bm25"))
  }

  /** Top-`k` terms per document by smoothed tf-idf
    * (idf = ln((1+N)/(1+df)) + 1, the sklearn smoothing — never zero, so
    * ties break on the term, deterministically). The df aggregate is
    * vocab-bounded (map-side combined, bytes ∝ |vocab|); the per-doc top-k
    * is one row_number window over the (doc, term) frame. Exact doubles:
    * tf/df/N are longs, the product is one double expression — identical
    * cross-engine, so ordering ties agree too. */
  /** Inverted index with gap-encoded posting lists — the storage layout
    * every retrieval engine (Lucene, Tantivy) uses: per term, the SORTED
    * doc-id list is stored as first-id + successive deltas, which are
    * small, non-negative, and compress ~10× better than raw 64-bit ids
    * under varint/PFOR (Zukowski et al., ICDE'06). Here the gaps live in a
    * parquet array column — parquet's own bit-packing gets the same win.
    *
    * `maxDf` caps posting length: stop-word terms appearing in more than
    * `maxDf` docs are DROPPED (they score ~0 under idf anyway), which also
    * bounds the per-term collect_list — no group ever materialises more
    * than `maxDf` ids, so the build is one explode + one bounded
    * aggregation at any corpus size. `minDf` prunes hapax noise.
    *
    * Emits (term, df_docs, first_id, last_id, max_gap, gaps) with the
    * self-checking invariant first_id + Σ gaps[2..] = last_id (gaps[1] IS
    * first_id). Decode = running prefix sum; RetrievalSpec round-trips it. */
  def invertedIndex(df: DataFrame, id: String, text: String,
                    minDf: Int = 2, maxDf: Int = 10000): DataFrame =
    df.select(col(id).cast("long").as("_doc"),
        explode(TextOps.tokens(lower(col(text)))).as("term"))
      .filter(length(col("term")) > 0)
      .distinct()
      .groupBy(col("term"))
      .agg(array_sort(collect_list(col("_doc"))).as("_ids"),
        count(lit(1)).as("df_docs"))
      .filter(col("df_docs") >= minDf && col("df_docs") <= maxDf)
      .select(col("term"), col("df_docs"),
        expr("element_at(_ids, 1)").as("first_id"),
        expr("element_at(_ids, -1)").as("last_id"),
        expr("""CASE WHEN size(_ids) = 1 THEN 0 ELSE
                aggregate(sequence(2, size(_ids)), CAST(0 AS BIGINT),
                  (m, i) -> greatest(m, element_at(_ids, i) -
                                        element_at(_ids, i - 1))) END""")
          .as("max_gap"),
        expr("""transform(sequence(1, size(_ids)), i ->
                  CASE WHEN i = 1 THEN element_at(_ids, 1)
                       ELSE element_at(_ids, i) - element_at(_ids, i - 1)
                  END)""").as("gaps"))

  def tfIdfTopK(df: DataFrame, id: String, text: String, k: Int = 5): DataFrame = {
    val tf = df.select(col(id),
      explode(TextOps.tokens(TextOps.normalize(col(text)))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col(id), col("term")).agg(count(lit(1)).as("tf"))

    val nDocs = df.select(col(id)).agg(count(lit(1)).as("n_docs"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))

    val scored = tf.join(dfreq, "term").crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        col("tf") * (log((col("n_docs") + 1.0) / (col("df") + 1.0)) + 1.0))

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(id))
      .orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(id), col("rank"), col("term"), col("tf"),
        round(col("tfidf"), 6).as("tfidf"))
  }

  /** Two-stage retrieval evaluated end to end — the hybrid-stack quality
    * readout of a stored vector index: [[bm25]] picks the `nCand` lexical
    * candidates (global top-N by (bm25 desc, id asc) — a bounded
    * TakeOrdered, never a sort of the corpus), ONLY those candidates'
    * stored vectors are fetched (candidate-sized join against the
    * index's posting lists) and exact-cosine reranked per query, and the
    * reranked top-k is scored against the exhaustive-cosine truth with
    * [[graft.sim.Similarity.rankingMetrics]]. The cross-encoder recipe:
    * cheap recall stage over text, expensive exact scoring on the
    * shortlist only — so the eval says what the INDEX + candidate stage
    * lose, not what the scorer loses.
    *
    * Scale shape: one corpus text scan (bm25), one candidate-sized vector
    * fetch, |q|·nCand rerank rows (parameter-bounded window), one
    * extremeK-routed brute pass for the truth, metric joins on
    * k-per-query frames. Deterministic end to end (rounded sims/scores,
    * id ties) — the q320 oracle replays every stage. */
  def rerankEval(docs: DataFrame, id: String, text: String,
                 terms: Seq[String], vectors: DataFrame,
                 queries: DataFrame, qid: String, emb: String,
                 nCand: Int, k: Int): DataFrame =
    rerankFrom(
      bm25(docs, id, text, terms)
        .orderBy(col("bm25").desc, col(id).asc).limit(nCand)
        .select(col(id).as("vec_id")),
      vectors, queries, qid, emb, k)

  /** [[rerankEval]] with BOTH stages on STORED artifacts: the lexical
    * candidates come from a [[LexIndex]] directory (bucket-pruned probe)
    * and the vectors from the caller's stored posting lists — the whole
    * hybrid stack evaluated without touching raw text or re-deriving an
    * index. Value-identical to [[rerankEval]] over everything the lexical
    * index ingested ([[LexIndex.bm25Indexed]]'s contract), so the q324
    * oracle is q320's, shared. */
  def rerankEvalIndexed(spark: org.apache.spark.sql.SparkSession,
                        lexDir: String, terms: Seq[String],
                        vectors: DataFrame, queries: DataFrame,
                        qid: String, emb: String, nCand: Int,
                        k: Int): DataFrame =
    rerankFrom(
      LexIndex.bm25Indexed(spark, lexDir, terms)
        .orderBy(col("bm25").desc, col("doc_id").asc).limit(nCand)
        .select(col("doc_id").as("vec_id")),
      vectors, queries, qid, emb, k)

  /** The standard HYBRID-SEARCH SERVING query, entirely off STORED
    * artifacts, with its quality readout: a BM25 ranking probed from the
    * lexical index (bucket-pruned scan) and an ANN ranking probed from
    * the stored IVF index (cell-pruned scan) are fused by reciprocal-rank
    * fusion ([[graft.sim.Similarity.rrfFuse]] — DECIMAL(28,12) terms, so
    * the fused scores are partition-order-independent), and the fused
    * top-k scores against the exhaustive cosine truth via
    * [[graft.sim.Similarity.rankingMetrics]].
    *
    * The lexical leg is ONE global ranking (the term set is the lexical
    * query — [[rerankEval]]'s model): top `nLex` docs by (bm25 desc, id),
    * ranked once over the nLex-row TakeOrdered result (a parameter-sized
    * single-partition window, never corpus-sized), then viewed per query
    * with the query's own doc dropped — global ranks are KEPT (a skipped
    * rank, not a re-densified one), and the oracle replays that choice.
    * The vector leg is per-query [[graft.sim.Similarity.annIvfIndexed]].
    *
    * Scale shape: bucket-pruned postings probe + cell-pruned vector probe
    * (both parameter-bounded), RRF on two k-per-query frames, brute truth
    * over the posting lists for the few eval queries. */
  def hybridRrfIndexed(spark: org.apache.spark.sql.SparkSession,
                       lexDir: String, vecDir: String, terms: Seq[String],
                       queries: DataFrame, qid: String, emb: String,
                       nLex: Int, nProbe: Int, k: Int,
                       k0: Int = 60): DataFrame = {
    val (post, cents) = graft.sim.Similarity.readIvfIndex(spark, vecDir)
    hybridRrfStored(spark, lexDir, post.select("vec_id", "v", "cell"),
      cents, terms, queries, qid, emb, nLex, nProbe, k, k0)
  }

  /** [[hybridRrfIndexed]] with the vector store supplied as frames — the
    * same fused serving query over any stored layout's posting lists
    * (e.g. [[graft.streaming.StreamingAnn.readPostings]]'s
    * base ∪ live increments, the q329 lifecycle end-state). */
  def hybridRrfStored(spark: org.apache.spark.sql.SparkSession,
                      lexDir: String, post: DataFrame, cents: DataFrame,
                      terms: Seq[String], queries: DataFrame, qid: String,
                      emb: String, nLex: Int, nProbe: Int, k: Int,
                      k0: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.sim.Similarity
    val lexRanked = LexIndex.bm25Indexed(spark, lexDir, terms)
      .orderBy(col("bm25").desc, col("doc_id").asc).limit(nLex)
      .select(col("doc_id").as("vec_id"), col("bm25"))
      // nLex rows by construction — the unpartitioned window is bounded
      .withColumn("rank", row_number().over(
        Window.orderBy(col("bm25").desc, col("vec_id").asc)))
    val lexPerQuery = queries.select(col(qid).as("q_id"))
      .crossJoin(broadcast(lexRanked))
      .filter(col("vec_id") =!= col("q_id"))
      .select("q_id", "vec_id", "rank")
    val annRank = Similarity.annIvfPruned(post, cents, queries, qid,
        emb, k, nProbe)
      .select("q_id", "vec_id", "rank")
    val fused = Similarity.rrfFuse(Seq(lexPerQuery, annRank), k0, k)
      .select("q_id", "vec_id", "rank")
    val truth = Similarity.knnBrute(
      post.select(col("vec_id"), col("v").as(emb)),
      queries.select(col(qid).as("vec_id"), col(emb)), "vec_id", emb, k)
    Similarity.rankingMetrics(fused, truth, k)
  }

  /** TENANT-FILTERED fused serving — the search-within-a-tenant arm of
    * the stored hybrid stack, completing the composed tier after every
    * single tier gained one (lexical [[LexIndex.bm25IndexedFiltered]],
    * IVF/PQ/graph/streaming-layout `searchFiltered`). Both legs, the
    * fusion AND the exhaustive truth run over the tenant's corpus alone:
    * the BM25 leg restricts postings and corpus statistics (`docPred`
    * over doc_id), the IVF leg applies `vecPred` inside the probed
    * posting lists (candidates only — routing stays on the full frozen
    * centroids, the q337/q352 contract), and the metrics are scored
    * against brute-force truth over the surviving vectors, so a tenant's
    * recall is measured against what that tenant could possibly see.
    * Two predicates because the two legs are differently keyed — the
    * [[graft.streaming.Takedown.land]] doc-side/vec-side shape. */
  def hybridRrfIndexedFiltered(spark: org.apache.spark.sql.SparkSession,
                               lexDir: String, vecDir: String,
                               terms: Seq[String], queries: DataFrame,
                               qid: String, emb: String,
                               docPred: org.apache.spark.sql.Column,
                               vecPred: org.apache.spark.sql.Column,
                               nLex: Int, nProbe: Int, k: Int,
                               k0: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.sim.Similarity
    val (post, cents) = Similarity.readIvfIndex(spark, vecDir)
    // the surviving vectors feed the ANN leg AND the truth — cut once
    val fpost = Similarity.cut(post.filter(vecPred), eager = false)
    val lexRanked = LexIndex.bm25IndexedFiltered(spark, lexDir, terms,
        docPred)
      .orderBy(col("bm25").desc, col("doc_id").asc).limit(nLex)
      .select(col("doc_id").as("vec_id"), col("bm25"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("bm25").desc, col("vec_id").asc)))
    val lexPerQuery = queries.select(col(qid).as("q_id"))
      .crossJoin(broadcast(lexRanked))
      .filter(col("vec_id") =!= col("q_id"))
      .select("q_id", "vec_id", "rank")
    val annRank = Similarity.annIvfPruned(fpost, cents, queries, qid,
        emb, k, nProbe)
      .select("q_id", "vec_id", "rank")
    val fused = Similarity.rrfFuse(Seq(lexPerQuery, annRank), k0, k)
      .select("q_id", "vec_id", "rank")
    val truth = Similarity.knnBrute(
      fpost.select(col("vec_id"), col("v").as(emb)),
      queries.select(col(qid).as("vec_id"), col(emb)), "vec_id", emb, k)
    Similarity.rankingMetrics(fused, truth, k)
  }

  /** The shared rerank + metrics tail: exact-cosine rerank of a bounded
    * candidate id set against the stored vectors (nCand-bounded shortlist
    * window — the adjudicated annPqRerank shape, never corpus-sized),
    * scored against the extremeK-routed exhaustive truth. */
  private def rerankFrom(cand: DataFrame, vectors: DataFrame,
                         queries: DataFrame, qid: String, emb: String,
                         k: Int): DataFrame = {
    val spark = vectors.sparkSession
    graft.expressions.CosineSimilarity.register(spark)
    val q = queries.select(col(qid).as("q_id"),
      graft.sim.Similarity.asDouble(emb).as("qv"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("q_id")
      .orderBy(col("sim").desc, col("vec_id").asc)
    val res = cand.join(vectors.select(col("vec_id"), col("v")), "vec_id")
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim", round(expr("graft_cosine(qv, v)"), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "vec_id", "rank")
    val truth = graft.sim.Similarity.knnBrute(
      vectors.select(col("vec_id"), col("v").as(emb)),
      queries.select(col(qid).as("vec_id"), col(emb)),
      "vec_id", emb, k)
    graft.sim.Similarity.rankingMetrics(res, truth, k)
  }
}
