package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-gram language-model quality scoring — the CCNet recipe (Wenzek et al.,
  * LREC'20): score every document's perplexity under a small LM trained on
  * a trusted corpus and filter/bucket on it. The reference pipeline has no
  * LM scorer; this is the training-data-curation extension, kept fully
  * relational so a 100 TB corpus trains and scores as two scan-shaped
  * passes (CCNet itself uses a KenLM 5-gram; the bigram here exercises the
  * identical plan shape — higher orders change the group key, not the
  * dataflow).
  *
  * Model: interpolated Kneser–Ney bigram (Kneser & Ney '95; Chen & Goodman
  * '99 eq. 4.26) with absolute discount d:
  *
  *   P(w|v) = max(c(vw) − d, 0)/c(v) + d·N₁₊(v·)/c(v) · Pcont(w)
  *   Pcont(w) = N₁₊(·w) / N₁₊(··)
  *
  * which sums to exactly 1 over the vocabulary for every seen context v —
  * the normalization property the spec asserts. Out-of-model cases are
  * floored deterministically (documented, engine-portable):
  * unseen context v → P = Pcont(w); unseen word w → Pcont is replaced by
  * 1/(N₁₊(··) + 1) (one pseudo-observation of continuation mass).
  *
  * Scale shape: training is one bigram explode + four map-side-combined
  * aggregates (shuffle ∝ vocabulary and bigram-type counts, never corpus
  * bytes); scoring joins each document's bigram positions against the
  * bigram/context/continuation tables — all vocabulary-sized, broadcast
  * under AQE when they fit (the 1-row total always broadcasts). Per-doc
  * aggregation quantizes each position's −ln P to DECIMAL(28,12) BEFORE
  * summing, so document log-loss is independent of partition layout and
  * hash-matchable cross-engine. Emits (id, n_bigrams, avg_logloss,
  * perplexity), both rounded at 6 dp; docs with < 2 tokens are dropped
  * (no bigram evidence). */
object NgramLm {

  /** Per-doc bigram positions: (id, v, w) — array-sliced zip, no window. */
  private def bigrams(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id), TextOps.tokens(col(text)).as("_w"))
      .filter(size(col("_w")) >= 2)
      .select(col(id),
        explode(expr(
          "arrays_zip(slice(_w, 1, size(_w) - 1), slice(_w, 2, size(_w) - 1))"))
          .as("_bg"))
      .select(col(id), col("_bg.0").as("v"), col("_bg.1").as("w"))

  /** The LM's SUFFICIENT STATISTIC: the bigram type-count table (v, w,
    * cvw). Everything Kneser–Ney needs — context totals c(v), the
    * continuation counts N₁₊(v·)/N₁₊(·w)/N₁₊(··) — derives from this one
    * vocabulary-shaped frame, which is why it is the right STORED INDEX
    * for an incrementally-maintained LM: raw counts are purely ADDITIVE
    * across batches (unlike the continuation counts themselves, which are
    * distinct-context cardinalities and do NOT add), so maintenance is
    * union + sum, the [[kneserNeyMergeCounts]] contract. */
  def kneserNeyCounts(train: DataFrame, id: String, text: String): DataFrame =
    bigrams(train, id, text).groupBy("v", "w").agg(count(lit(1)).as("cvw"))

  /** Fold a new batch's counts into a stored count table:
    * counts(A ∪ B) = counts(A) ⊕ counts(B) exactly (integer sums), so
    * incremental ≡ from-scratch — hash-verified by q259, whose oracle is
    * the full-corpus q248 SQL verbatim. Associative and commutative;
    * shuffle is bigram-TYPE-sized, never corpus bytes (the
    * incremental-dedup contract applied to LM state). */
  def kneserNeyMergeCounts(stored: DataFrame, delta: DataFrame): DataFrame =
    stored.select("v", "w", "cvw").unionByName(delta.select("v", "w", "cvw"))
      .groupBy("v", "w").agg(sum("cvw").as("cvw"))

  /** Train on `train`, score every doc of `score`. `d` is the absolute
    * discount (the KN standard 0.75 default). */
  def kneserNeyScore(train: DataFrame, score: DataFrame, id: String,
                     text: String, d: Double = 0.75): DataFrame =
    kneserNeyScoreFromCounts(kneserNeyCounts(train, id, text), score, id,
      text, d)

  /** Score from a (possibly incrementally-maintained) count table — the
    * derived KN tables are recomputed from it per scoring run
    * (vocabulary-shaped aggregates, the cheap part). */
  def kneserNeyScoreFromCounts(cvw: DataFrame, score: DataFrame, id: String,
                               text: String, d: Double = 0.75): DataFrame = {
    val ctx = cvw.groupBy("v").agg(sum("cvw").as("cv"),
      count(lit(1)).as("n1p_v"))             // N₁₊(v·): distinct w per v
    val cont = cvw.groupBy("w").agg(count(lit(1)).as("n1p_w")) // N₁₊(·w)
    val tot = cvw.agg(count(lit(1)).as("n1p")) // N₁₊(··): bigram types
    val sb = bigrams(score, id, text)
    val scored = sb
      .join(cvw, Seq("v", "w"), "left")
      .join(ctx, Seq("v"), "left")
      .join(cont, Seq("w"), "left")
      .crossJoin(broadcast(tot))
      // every double step below is a per-row scalar computed identically in
      // the oracle engine; only the quantized-decimal sum crosses rows
      .withColumn("_pcont",
        coalesce(col("n1p_w").cast("double") / col("n1p").cast("double"),
          lit(1.0) / (col("n1p").cast("double") + 1.0)))
      .withColumn("_p",
        when(col("cv").isNull, col("_pcont")) // unseen context
          .otherwise(
            greatest(coalesce(col("cvw").cast("double"), lit(0.0)) - d, lit(0.0))
              / col("cv").cast("double") +
              lit(d) * col("n1p_v").cast("double") / col("cv").cast("double")
              * col("_pcont")))
      .withColumn("_nll", (-log(col("_p"))).cast("decimal(28,12)"))
    scored.groupBy(col(id))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("_nll")).as("_snll"))
      .withColumn("avg_logloss",
        round(col("_snll").cast("double") / col("n_bigrams"), 6))
      .withColumn("perplexity",
        round(exp(col("_snll").cast("double") / col("n_bigrams")), 6))
      .drop("_snll")
  }
}
