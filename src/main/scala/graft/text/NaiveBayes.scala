package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classifier — the curation pipeline's
  * trained filter (provenance/domain prediction, or quality-by-similarity
  * scoring against a trusted corpus, the role fastText classifiers play in
  * most LLM data pipelines). Chosen over gradient-trained models
  * deliberately: the sufficient statistics are INTEGER token counts, so
  * training is two map-side-combined aggregates, the model is exactly
  * reproducible under any partitioning (the repo's determinism gate), and
  * scoring is value-checkable cross-engine — none of which holds for an
  * LBFGS fit whose tree-aggregation order perturbs low bits.
  *
  * Model: P(c|d) ∝ P(c)·Π P(w|c)^n(d,w) with Laplace smoothing
  * P(w|c) = (cnt(w,c)+1)/(tokens(c)+V), V = training vocabulary size;
  * tokens absent from the training vocabulary entirely contribute the
  * same 1/(tokens(c)+V) floor. Each per-(doc, class, token) log term
  * quantizes to DECIMAL(28,12) before the sum, so document scores are
  * partition-order-independent; the class prior joins in after the sum.
  * Prediction = argmax class with ties broken by label order.
  *
  * Scale shape: the likelihood/prior tables are vocabulary- and
  * class-sized (broadcast candidates). Only IN-VOCABULARY (doc, token)
  * pairs fan out by |classes|; out-of-vocabulary tokens collapse to a
  * CLOSED FORM first — a token with count n contributes the per-class
  * floor term n·ln(1/(toks_c+V)) regardless of which token it is, so OOV
  * mass reduces to the per-doc histogram of OOV token multiplicities
  * (≪ tokens, typically a handful of distinct n per doc) × |classes|.
  * The histogram route keeps the sum BIT-IDENTICAL to the per-token form:
  * k tokens sharing multiplicity n contribute k · dec₁₂(n·ln floor_c) —
  * exactly the sum of k copies of the same quantized decimal, which is
  * what the per-token oracle computes. Nothing is ever corpus × corpus.
  *
  * NULL/empty robustness: NULL text coalesces to the empty token list on
  * BOTH sides. A score doc with no tokens still gets a prediction — all
  * likelihood sums are zero, so it falls to the class-prior argmax. A
  * training class whose documents are all empty still appears in
  * classStats (derived from the PRIOR frame, toks = 0) and is predictable
  * via its smoothing floor. Output: (id, pred_label, logp). */
object NaiveBayes {

  /** Argmax prediction per doc: [[scoreAll]] + one |classes|-row window.
    * Output: (id, pred_label, logp). */
  def trainScore(train: DataFrame, score: DataFrame, id: String,
                 label: String, text: String): DataFrame = {
    val sa = scoreAll(train, score, id, label, text)
    val w = Window.partitionBy(col(id))
      .orderBy(col("logp").desc, col("label").asc)
    sa.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .select(col(id), col("label").as("pred_label"), col("logp"))
  }

  /** The full per-(doc, class) posterior log-scores — what [[trainScore]]
    * argmaxes over, exposed so calibration/posterior consumers (q282) can
    * see the whole distribution. Output: (id, label, logp@6dp). */
  def scoreAll(train: DataFrame, score: DataFrame, id: String,
               label: String, text: String): DataFrame = {
    val Dec = "decimal(28,12)"
    // NULL text → empty token list (split of "" yields [""] — drop it), so
    // null/blank docs are TOKEN-LESS rather than silently absent; on
    // corpora with no blank docs this is the identity
    def toks(c: org.apache.spark.sql.Column) = {
      val arr = TextOps.tokens(coalesce(c, lit("")))
      explode(filter(arr, t => length(t) > 0))
    }
    val ttoks = train.select(col(label).as("_c"), toks(col(text)).as("w"))
    // cvc feeds classStats, the vocabulary (×3), and the scoring join;
    // stoks feeds the in-vocab/OOV split and the empty-doc anti-join —
    // persist both so the explode+count runs once per side (vocabulary-/
    // doc-token-sized entries, freed by the ContextCleaner)
    val cvc = ttoks.groupBy("_c", "w").agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // class token totals seeded from the PRIOR classes (not from cvc), so
    // an all-empty-text class keeps a floor-only likelihood row
    val priors0 = train.groupBy(col(label).as("_c"))
      .agg(count(lit(1)).as("nd"))
    val classStats = priors0.select("_c")
      .join(cvc.groupBy("_c").agg(sum("cnt").as("toks")), Seq("_c"), "left")
      .na.fill(0L, Seq("toks"))
      .crossJoin(broadcast(cvc.select("w").distinct()
        .agg(count(lit(1)).as("v"))))
    val priors = priors0
      .crossJoin(broadcast(train.agg(count(lit(1)).as("ndtot"))))
      .withColumn("_lprior",
        log(col("nd").cast("double") / col("ndtot").cast("double")))
      .select("_c", "_lprior")
    val stoks = score
      .select(col(id), toks(col(text)).as("w"))
      .groupBy(col(id), col("w")).agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vocab = cvc.select("w").distinct()
    // in-vocabulary terms: fan by |classes|, left-join the class counts
    // (a vocab token can still be unseen in a PARTICULAR class → floor)
    val inTerms = stoks.join(vocab, Seq("w"), "left_semi")
      .crossJoin(broadcast(classStats))
      .join(cvc, Seq("_c", "w"), "left")
      .withColumn("_lp",
        (col("n") * log((coalesce(col("cnt"), lit(0L)) + 1).cast("double") /
          (col("toks") + col("v")).cast("double"))).cast(Dec))
    // widen both partial sums to one decimal type (exact) so the
    // full-outer merge and the empty-doc union line up schema-wise
    val SDec = "decimal(38,12)"
    val inScore = inTerms.groupBy(col(id), col("_c"))
      .agg(sum("_lp").cast(SDec).as("_slp_in"))
    // OOV closed form: per-doc histogram of OOV token multiplicities,
    // k · dec₁₂(n·ln(1/(toks_c+V))) — bit-identical to summing the k
    // per-token quantized terms, with |docs|·|distinct n|·|classes| rows
    // instead of |OOV tokens|·|classes|
    val oovHist = stoks.join(vocab, Seq("w"), "left_anti")
      .groupBy(col(id), col("n")).agg(count(lit(1)).as("k"))
    val oovScore = oovHist.crossJoin(broadcast(classStats))
      .withColumn("_lp",
        col("k") * (col("n") * log(lit(1L).cast("double") /
          (col("toks") + col("v")).cast("double"))).cast(Dec))
      .groupBy(col(id), col("_c")).agg(sum("_lp").cast(SDec).as("_slp_oov"))
    // token-less docs (empty/NULL text): prior-only rows for every class
    val emptyDocs = score.select(col(id)).distinct()
      .join(stoks.select(col(id)).distinct(), Seq(id), "left_anti")
      .crossJoin(broadcast(classStats.select("_c")))
    val scored = inScore
      .join(oovScore, Seq(id, "_c"), "full_outer")
      .unionByName(emptyDocs
        .withColumn("_slp_in", lit(null).cast(SDec))
        .withColumn("_slp_oov", lit(null).cast(SDec)))
      .withColumn("_slp",
        coalesce(col("_slp_in"), lit(0).cast(SDec)) +
          coalesce(col("_slp_oov"), lit(0).cast(SDec)))
      .join(broadcast(priors), "_c")
      .withColumn("logp",
        round(col("_slp").cast("double") + col("_lprior"), 6))
    scored.select(col(id), col("_c").as("label"), col("logp"))
  }

  /** Softmax posteriors from [[scoreAll]]'s log-scores: per doc,
    * p(c) = exp(logp_c − max) / Σ exp(logp − max) — the max-shifted form
    * (no overflow), with each exp term quantized to DECIMAL(28,12) before
    * the per-doc normalizer sum so the probabilities are partition-order-
    * independent and oracle-exact. Windows ride |classes|-row partitions.
    * Output: (id, label, p@6dp). */
  def posteriors(scoredAll: DataFrame, id: String): DataFrame = {
    val wd = Window.partitionBy(col(id))
    scoredAll
      .withColumn("_m", max(col("logp")).over(wd))
      .withColumn("_e", exp(col("logp") - col("_m")).cast("decimal(28,12)"))
      .withColumn("_z", sum(col("_e")).over(wd))
      .select(col(id), col("label"),
        round(col("_e").cast("double") / col("_z").cast("double"), 6).as("p"))
  }
}
