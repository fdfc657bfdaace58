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
  * class-sized (broadcast candidates); scoring fans each distinct
  * (doc, token) pair out by |classes| — bounded fan-out, one hash
  * aggregate back to (doc, class), one |classes|-deep argmax window per
  * doc. Nothing is ever corpus × corpus. Output: (id, pred_label, logp). */
object NaiveBayes {

  def trainScore(train: DataFrame, score: DataFrame, id: String,
                 label: String, text: String): DataFrame = {
    val ttoks = train
      .select(col(label).as("_c"), explode(TextOps.tokens(col(text))).as("w"))
    val cvc = ttoks.groupBy("_c", "w").agg(count(lit(1)).as("cnt"))
    val classStats = cvc.groupBy("_c").agg(sum("cnt").as("toks"))
      .crossJoin(broadcast(cvc.select("w").distinct()
        .agg(count(lit(1)).as("v"))))
    val priors = train.groupBy(col(label).as("_c")).agg(count(lit(1)).as("nd"))
      .crossJoin(broadcast(train.agg(count(lit(1)).as("ndtot"))))
      .withColumn("_lprior",
        log(col("nd").cast("double") / col("ndtot").cast("double")))
      .select("_c", "_lprior")
    val stoks = score
      .select(col(id), explode(TextOps.tokens(col(text))).as("w"))
      .groupBy(col(id), col("w")).agg(count(lit(1)).as("n"))
    val terms = stoks.crossJoin(broadcast(classStats))
      .join(cvc, Seq("_c", "w"), "left")
      .withColumn("_lp",
        (col("n") * log((coalesce(col("cnt"), lit(0L)) + 1).cast("double") /
          (col("toks") + col("v")).cast("double"))).cast("decimal(28,12)"))
    val scored = terms.groupBy(col(id), col("_c"))
      .agg(sum("_lp").as("_slp"))
      .join(broadcast(priors), "_c")
      .withColumn("logp",
        round(col("_slp").cast("double") + col("_lprior"), 6))
    val w = Window.partitionBy(col(id))
      .orderBy(col("logp").desc, col("_c").asc)
    scored.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .select(col(id), col("_c").as("pred_label"), col("logp"))
  }
}
