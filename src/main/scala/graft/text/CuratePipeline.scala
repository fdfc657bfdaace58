package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The full training-data curation DAG, composed from the library's
  * operators: quality filter → exact dedup → MinHash/LSH near-dedup →
  * benchmark decontamination → split assignment → sequence packing.
  *
  * Every stage is the already-verified operator (each has its own
  * oracle-checked query); this object is the composition a pipeline user
  * actually runs, plus a per-stage row-count audit so a production run can
  * log exactly where documents were dropped. All stages are deterministic
  * (salted hashes, not rand()), so a re-run over the same corpus emits the
  * same training set bit-for-bit.
  */
object CuratePipeline {

  /** Curation result: the packed training set and the per-stage audit
    * (stage name → surviving row count, in pipeline order). */
  final case class Result(packed: DataFrame, audit: Seq[(String, Long)])

  /** Run the DAG over `docs` against `evalSet` (benchmark/eval documents
    * that must not leak into training). Column params name the id, text,
    * and source/stratum columns. Stages:
    *
    *  1. `Curate.filterPipeline` — drop junk (too short/long, repetitive,
    *     wrong token shape, no stopwords)
    *  2. `Dedup.exactGroups` — keep one doc per exact text group
    *  3. `Dedup.minhashSignatures` → `minhashCandidates` (est ≥
    *     `nearDupAt`) → `dedupClusters` — keep each near-dup cluster's
    *     representative
    *  4. `Curate.contamination` — drop docs whose eval n-gram overlap
    *     reaches `contamAt`
    *  5. `Mix.splitAssign` — deterministic train/val/test
    *  6. `Mix.packSequences` (train split only) — concat-and-split at
    *     `seqLen` token boundaries
    */
  def run(docs: DataFrame, evalSet: DataFrame,
          id: String = "doc_id", text: String = "text",
          source: String = "source",
          nearDupAt: Double = 0.5, contamAt: Double = 0.2,
          seqLen: Long = 2048L): Result = {

    val audit = Seq.newBuilder[(String, Long)]
    audit += ("raw" -> docs.count())

    val quality = Curate.filterPipeline(docs, id, text)
      .filter(col("keep") === 1).select(id)
    val kept = docs.join(quality, Seq(id), "left_semi")
    audit += ("quality_filter" -> kept.count())

    val canon = Dedup.exactGroups(kept, id, text)
      .select(col("canonical_id").as(id))
    val exact = kept.join(canon, Seq(id), "left_semi")
    audit += ("exact_dedup" -> exact.count())

    val pairs = Dedup.minhashCandidates(
      Dedup.minhashSignatures(exact, id, text), id)
      .filter(col("est_jaccard") >= nearDupAt)
    val reps = Dedup.dedupClusters(exact, pairs, id)
      .filter(col("keep") === 1).select(id)
    val near = exact.join(reps, Seq(id), "left_semi")
    audit += ("near_dedup" -> near.count())

    // left join: docs too short to shingle have no contamination signal and
    // pass through (the quality filter already floors token counts)
    val contam = Curate.contamination(near, evalSet, id, text, 3, contamAt)
      .filter(col("contaminated") === 1).select(id)
    val cleanDocs = near.join(contam, Seq(id), "left_anti")
    audit += ("decontaminate" -> cleanDocs.count())

    val split = Mix.splitAssign(cleanDocs, id)
    val train = split.filter(col("split") === "train")
    audit += ("train_split" -> train.count())

    val packed = Mix.packSequences(train, id, source, text, seqLen)
    audit += ("packed" -> packed.count())

    Result(packed, audit.result())
  }
}
