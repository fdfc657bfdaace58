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
    * word fully merged or count 1 ties exhausted — still deterministic).
    *
    * Merges are learned in BATCHES of up to `batchK` per distributed round
    * (classic batched-BPE), which removes the O(vocab) sequential-jobs
    * ceiling: a 32k-vocab train is ~vocab/batchK rounds, not 32k jobs. The
    * batch is ONLY taken where it is provably identical to one-at-a-time
    * training — a prefix c₁..cⱼ of the snapshot's (count desc, l, r) order
    * such that:
    *   1. batch members are pairwise symbol-disjoint (so each cᵢ's count at
    *      its sequential turn equals its snapshot count),
    *   2. every merged symbol l+r is FRESH — not an existing vocab symbol
    *      and not another batch member's symbol or concat (no string
    *      conflation, so untouched pair counts can't change),
    *   3. no self-pair (l = r) except as the batch head (a self-merge can
    *      create a (ll, ll) pair whose count isn't bounded by neighbouring
    *      snapshot pairs),
    *   4. for j ≥ 2, count(cⱼ) is STRICTLY greater than the best non-batch
    *      pair's count: any pair a merge creates needs a pre-existing
    *      neighbouring adjacency of one of the merged symbols, so its count
    *      is ≤ that best non-batch count — the strict gap keeps every new
    *      pair ranked below every remaining batch member at its turn.
    * The first violation ends the batch (a prefix is required: skipping a
    * rejected candidate would reorder against sequential training, which
    * re-ranks after every merge). Worst case the batch is 1 = exactly the
    * sequential round. BpeSpec pins batched ≡ sequential on fixtures. */
  def train(df: DataFrame, text: String, nMerges: Int,
            batchK: Int = 16): Seq[MergeRule] = {
    var vocab = initVocab(df, text).localCheckpoint(true)
    // alphabet for the freshness check (condition 2), maintained on the
    // driver: seeded with the initial character set, grown by each accepted
    // concat. Every symbol the vocab can ever contain is an initial char or
    // an accepted concat, so this is an exact superset of the live alphabet
    // (symbols that fall out of use stay — which only makes the freshness
    // check MORE conservative, never wrong) and costs one tiny collect for
    // the whole train instead of one distinct per round.
    val alphabet = scala.collection.mutable.Set[String]()
    alphabet ++= vocab.select(explode(col("syms")).as("s")).distinct()
      .collect().map(_.getString(0))
    val rules = Seq.newBuilder[MergeRule]
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      val want = math.min(batchK, nMerges - rank)
      val top = pairCounts(vocab)
        .orderBy(col("pair_count").desc, col("l").asc, col("r").asc)
        .limit(want + 1).collect()
        .map(t => (t.getString(0), t.getString(1), t.getLong(2)))
      if (top.isEmpty) done = true
      else {
        val used = scala.collection.mutable.Set[String]()
        val accepted = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
        var stop = false
        for (c @ (l, r, _) <- top.take(want) if !stop) {
          val concat = l + r
          val selfPair = l == r
          val fresh = !alphabet.contains(concat) && !used.contains(concat)
          val disjoint = !used.contains(l) && !used.contains(r)
          if (accepted.isEmpty) {
            accepted += c
            if (selfPair || !fresh) stop = true // batch can't grow past it
            else { used ++= Seq(l, r, concat) }
          } else if (fresh && disjoint && !selfPair) {
            accepted += c
            used ++= Seq(l, r, concat)
          } else stop = true
        }
        // condition 4: strict count gap to the first non-batch pair
        var j = accepted.length
        while (j >= 2 && top.length > j && accepted(j - 1)._3 <= top(j)._3)
          j -= 1
        val batch = accepted.take(j)
        batch.foreach { case (l, r, c) =>
          rules += MergeRule(rank, l, r, c); rank += 1
          alphabet += l + r
        }
        val next = batch.foldLeft(vocab) { case (d, (l, r, _)) =>
          applyMerge(d, l, r)
        }.localCheckpoint(true)
        vocab.unpersist(blocking = false)
        vocab = next
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
