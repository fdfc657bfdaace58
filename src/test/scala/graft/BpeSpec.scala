package graft

import graft.text.Bpe

/** BPE trainer: hand-computed merge order on a crafted weighted vocab, and
  * the encode step segments with the learned table. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("train learns merges in weighted-count order with deterministic ties") {
    // vocab: "low" x5, "lower" x2, "lowest" x3  (10 words total)
    // initial pairs: (l,o)=10, (o,w)=10, (w,e)=5, (e,r)=2, (e,s)=3, (s,t)=3
    // tie at 10 broken by pair asc → (l,o) first; after merging "lo":
    // (lo,w)=10 → "low"; then (w,e)=5? no — after "low" merge: (low,e)=5
    val docs = Seq((1L, ("low " * 5 + "lower " * 2 + "lowest " * 3).trim))
      .toDF("doc_id", "text")
    val rules = Bpe.train(docs, "text", 4)
    // then (lowe,s)=3 ties (s,t)=3 → left-symbol asc picks (lowe,s)
    assert(rules.map(m => (m.rank, m.left, m.right, m.count)) == Seq(
      (0, "l", "o", 10L),
      (1, "lo", "w", 10L),
      (2, "low", "e", 5L),
      (3, "lowe", "s", 3L)))
    // encode with the learned table
    val segs = Bpe.segment(docs, "doc_id", "text", rules)
      .select("word", "syms").distinct().collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(segs("low") == List("low"))
    assert(segs("lower") == List("lowe", "r"))
    assert(segs("lowest") == List("lowes", "t"))
  }

  test("early stop when no adjacent pairs remain") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    assert(Bpe.train(docs, "text", 5).isEmpty)
  }

  test("batched training ≡ sequential: disjoint tops learned in one round") {
    // three symbol-disjoint pairs with strict count gaps — the ideal batch:
    // one round must learn all three, in snapshot order, identically to
    // one-merge-per-round training
    val docs = Seq((1L, ("ab " * 100 + "cd " * 90 + "ef " * 80).trim))
      .toDF("doc_id", "text")
    val batched = Bpe.train(docs, "text", 3, batchK = 16)
    val sequential = Bpe.train(docs, "text", 3, batchK = 1)
    assert(batched == sequential)
    assert(batched.map(m => (m.rank, m.left, m.right, m.count)) == Seq(
      (0, "a", "b", 100L), (1, "c", "d", 90L), (2, "e", "f", 80L)))
  }

  test("word-frequency training ≡ distributed training, rule for rule") {
    // same counts, same tie-break, same greedy rewrite — the driver-local
    // loop must reproduce the distributed trainer exactly, on both the
    // crafted vocab and a conflict-heavy real corpus (ties, self-pairs,
    // merge-creates-pair chains)
    val crafted = Seq((1L, ("low " * 5 + "lower " * 2 + "lowest " * 3).trim))
      .toDF("doc_id", "text")
    assert(Bpe.trainWordFreq(crafted, "text", 4) == Bpe.train(crafted, "text", 4))
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(60).select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    val local = Bpe.trainWordFreq(docs, "text", 40)
    val dist = Bpe.train(docs, "text", 40, batchK = 16)
    assert(local.size == 40)
    assert(local == dist)
    // early stop parity: single-char words have no pairs
    val flat = Seq((1L, "a b c")).toDF("doc_id", "text")
    assert(Bpe.trainWordFreq(flat, "text", 5).isEmpty)
  }

  test("deep train: the in-memory loop survives thousands of merges, " +
       "equals the distributed trainer to exhaustion, and is prefix-stable") {
    // A small real corpus exhausts its repeating pairs well before 2048
    // merges, so asking for 2048 drives BOTH trainers through the long-run
    // regime (index maintenance over many rewrites) into the early-stop
    // path — rule lists must match to the last rule. This is the unit
    // anchor for q169's vocab-scale 2048-merge catalog run.
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(40).select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    val deep = Bpe.trainWordFreq(docs, "text", 2048)
    val dist = Bpe.train(docs, "text", 2048, batchK = 16)
    assert(deep.nonEmpty && deep.size < 2048, // genuinely exhausted
      s"expected early stop, got ${deep.size} rules")
    assert(deep == dist)
    // greedy training is prefix-stable: a shorter run is literally the
    // prefix of a longer one (guards the incremental pair-count index —
    // corrupt state would show up as a divergent prefix)
    assert(Bpe.trainWordFreq(docs, "text", 50) == deep.take(50))
  }

  test("batched training ≡ sequential on a conflict-heavy real corpus") {
    // overlapping symbols, ties, self-pairs ("oo", "ss"), merge-creates-
    // frequent-pair chains — the cases where the batch must shrink to stay
    // exact. 20 merges, rule-for-rule equality.
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(60).select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    val batched = Bpe.train(docs, "text", 20, batchK = 16)
    val sequential = Bpe.train(docs, "text", 20, batchK = 1)
    assert(batched.size == 20)
    assert(batched == sequential)
  }
}
