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
    var vocab = graft.ops.Checkpoint.cut(initVocab(df, text), eager = true)
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
        }.transform(graft.ops.Checkpoint.cut(_, eager = true))
        vocab.unpersist(blocking = false)
        vocab = next
      }
    }
    vocab.unpersist(blocking = false)
    rules.result()
  }

  /** Vocab-scale training: learn merges on the COLLECTED word-frequency
    * table. The table is Zipf-bounded — corpus-size-independent, usually
    * well under 10⁶ rows — so one distributed pass builds it (the only
    * corpus-wide work) and the entire merge loop then runs driver-local
    * with incremental pair-count maintenance: no per-round Spark jobs, no
    * per-round vocab rewrite, a real 32k-merge train in seconds. Rules are
    * IDENTICAL to [[train]] (BpeSpec pins it rule-for-rule): same counts
    * (the math is the same weighted pair frequency), same greedy rewrite,
    * same (count desc, l asc, r asc) tie-break with the string order
    * matched to Spark's BINARY (UTF-8 byte) ordering — Java's UTF-16
    * compareTo would disagree on supplementary characters. Re-tokenize the
    * corpus ONCE at the end with [[segment]]. `maxWords` is a guard rail:
    * a vocab beyond it fails fast rather than silently collecting an
    * unbounded frame (truncating would change the learned rules). */
  def trainWordFreq(df: DataFrame, text: String, nMerges: Int,
                    maxWords: Int = 2000000): Seq[MergeRule] = {
    val rows = initVocab(df, text)
      .select(col("word"), col("wf")).limit(maxWords + 1).collect()
    require(rows.length <= maxWords,
      s"word vocabulary exceeds maxWords=$maxWords; raise the cap or " +
        "pre-filter the corpus — truncation would change the learned rules")
    trainInMemory(rows.map(r => (r.getString(0), r.getLong(1))), nMerges)
  }

  /** Spark-compatible binary string order: UTF-8 bytes compared unsigned,
    * exactly UTF8String's comparison (= code-point order). */
  private def utf8Compare(a: String, b: String): Int =
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** The in-memory merge loop behind [[trainWordFreq]]. Pair counts live in
    * a hash map; the argmax rides a TreeSet ordered by (count desc, l asc,
    * r asc) and every count mutation is an O(log P) remove/insert, so a
    * 32k-merge train is O(total count updates · log P), not
    * O(merges · pairs). Each merge rewrites ONLY the words that contain
    * its pair (an occurrence index, validated lazily). */
  private[text] def trainInMemory(words: Array[(String, Long)],
                                  nMerges: Int): Seq[MergeRule] = {
    import scala.collection.mutable
    // split matches initVocab's substring(word, i, 1): code points
    val syms: Array[mutable.ArrayBuffer[String]] = words.map { case (w, _) =>
      val buf = mutable.ArrayBuffer[String]()
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        buf += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      buf
    }
    val wf = words.map(_._2)
    val counts = mutable.HashMap[(String, String), Long]()
    val occ = mutable.HashMap[(String, String), mutable.Set[Int]]()
    // the TreeSet comparator runs O(log P) times per count mutation —
    // encoding to UTF-8 inside it would allocate per compare, which
    // dominated deep trains; cache the bytes per distinct symbol instead
    val u8cache = mutable.HashMap[String, Array[Byte]]()
    def u8(s: String): Array[Byte] =
      u8cache.getOrElseUpdate(s, s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    implicit val ord: Ordering[(Long, String, String)] =
      new Ordering[(Long, String, String)] {
        def compare(x: (Long, String, String), y: (Long, String, String)): Int = {
          val c = java.lang.Long.compare(y._1, x._1) // count desc
          if (c != 0) c
          else {
            val l = java.util.Arrays.compareUnsigned(u8(x._2), u8(y._2))
            if (l != 0) l
            else java.util.Arrays.compareUnsigned(u8(x._3), u8(y._3))
          }
        }
      }
    val ranked = mutable.TreeSet[(Long, String, String)]()
    def bump(pair: (String, String), delta: Long): Unit = {
      val old = counts.getOrElse(pair, 0L)
      if (old != 0) ranked -= ((old, pair._1, pair._2))
      val now = old + delta
      if (now != 0) { counts(pair) = now; ranked += ((now, pair._1, pair._2)) }
      else counts -= pair
    }
    def pairsOf(i: Int)(f: ((String, String)) => Unit): Unit = {
      val s = syms(i); var j = 0
      while (j < s.length - 1) { f((s(j), s(j + 1))); j += 1 }
    }
    for (i <- words.indices) pairsOf(i) { p =>
      bump(p, wf(i)); occ.getOrElseUpdate(p, mutable.Set[Int]()) += i
    }
    val rules = Seq.newBuilder[MergeRule]
    var rank = 0
    while (rank < nMerges && ranked.nonEmpty) {
      val (cnt, l, r) = ranked.head
      val merged = l + r
      // iteration order over the occurrence set is irrelevant: rewrites are
      // per-word independent and pair counts are order-free sums, so no
      // sort — sorting 10⁴-word sets per merge dominated deep trains
      for (i <- occ.getOrElse((l, r), mutable.Set.empty[Int]).toArray) {
        val s = syms(i)
        // lazily validate the occurrence (the index is never decremented)
        var has = false; var j = 0
        while (!has && j < s.length - 1) { has = s(j) == l && s(j + 1) == r; j += 1 }
        if (has) {
          pairsOf(i)(bump(_, -wf(i)))
          // greedy left-to-right, the exact applyMerge fold (so "aaa" with
          // (a,a) becomes ["aa","a"])
          val out = mutable.ArrayBuffer[String]()
          for (sym <- s) {
            if (out.nonEmpty && out.last == l && sym == r)
              out(out.length - 1) = merged
            else out += sym
          }
          syms(i) = out
          pairsOf(i) { p =>
            bump(p, wf(i)); occ.getOrElseUpdate(p, mutable.Set[Int]()) += i
          }
        }
      }
      occ -= ((l, r))
      rules += MergeRule(rank, l, r, cnt)
      rank += 1
    }
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
