package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (Sennrich et al. ACL'16): learn the
  * top-`nMerges` merge rules from the corpus's weighted word vocabulary.
  *
  * The trainer state is the vocab frame (word frequency + current symbol
  * sequence), NOT token occurrences — Zipf-bounded, so each round is a small
  * distributed job regardless of corpus size. Per round: explode adjacent
  * symbol pairs weighted by word frequency → pick the global argmax (a
  * driver-side top-1, deterministic tie-break on count desc then pair asc) →
  * rewrite every word's symbol sequence with a greedy left-to-right fold of
  * the new merge (the standard BPE application order). The vocab frame is
  * `localCheckpoint`ed per round like `Dedup.dedupClusters` — un-truncated
  * lineage would double per round and stall Catalyst analysis long before
  * data volume matters.
  *
  * Not SQL-expressible (iterative argmax loop), so verified by spec goldens
  * (BpeSpec hand-computes the merge order) rather than the DuckDB oracle —
  * the same verification shape as Granger/GBT (q42/q43). */
object Bpe {

  /** One learned merge: rank order, the two symbols joined, and the pair's
    * weighted count at the time it was picked. */
  final case class MergeRule(rank: Int, left: String, right: String, count: Long)

  /** Build the initial vocab frame: (word, wf, syms = characters). */
  private[text] def initVocab(df: DataFrame, text: String): DataFrame =
    df.select(explode(TextOps.tokens(TextOps.normalize(col(text)))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("wf"))
      .withColumn("syms", expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"))

  /** Weighted adjacent-pair counts over the current symbol sequences. */
  private[text] def pairCounts(vocab: DataFrame): DataFrame =
    vocab.filter(size(col("syms")) >= 2)
      .select(col("wf"), explode(expr(
        "transform(sequence(1, size(syms) - 1), " +
          "i -> struct(element_at(syms, i) AS l, element_at(syms, i + 1) AS r))"))
        .as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("wf")).as("pair_count"))

  /** Greedy left-to-right application of one merge to every symbol array. */
  private[text] def applyMerge(vocab: DataFrame, l: String, r: String): DataFrame = {
    val lq = l.replace("'", "\\'"); val rq = r.replace("'", "\\'")
    vocab.withColumn("syms", expr(
      s"""aggregate(syms, CAST(array() AS ARRAY<STRING>), (acc, s) ->
         |  CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '$lq' AND s = '$rq'
         |       THEN concat(slice(acc, 1, size(acc) - 1), array('$lq$rq'))
         |       ELSE concat(acc, array(s)) END)""".stripMargin))
  }

  /** Learn `nMerges` merge rules. Stops early when no pair repeats (every
    * word fully merged or count 1 ties exhausted — still deterministic). */
  def train(df: DataFrame, text: String, nMerges: Int): Seq[MergeRule] = {
    var vocab = initVocab(df, text).localCheckpoint(true)
    val rules = Seq.newBuilder[MergeRule]
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      val top = pairCounts(vocab)
        .orderBy(col("pair_count").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        rules += MergeRule(rank, l, r, c)
        val next = applyMerge(vocab, l, r).localCheckpoint(true)
        vocab.unpersist(blocking = false)
        vocab = next
        rank += 1
      }
    }
    vocab.unpersist(blocking = false)
    rules.result()
  }

  /** Segment each doc's words with a learned merge table (rules applied in
    * rank order — the standard encode step). Output: (id, word, syms). */
  def segment(df: DataFrame, id: String, text: String,
              rules: Seq[MergeRule]): DataFrame = {
    val words = df.select(col(id),
      explode(TextOps.tokens(TextOps.normalize(col(text)))).as("word"))
      .filter(length(col("word")) > 0)
      .withColumn("syms", expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
    rules.sortBy(_.rank).foldLeft(words)((d, m) => applyMerge(d, m.left, m.right))
  }
}
