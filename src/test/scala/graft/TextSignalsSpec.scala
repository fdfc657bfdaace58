package graft

import graft.text.TextOps

/** Tokenizer-prep and LM-quality signals: BPE pair counting and unigram
  * perplexity on crafted corpora with hand-computable answers. */
class TextSignalsSpec extends SparkSpec {
  import spark.implicits._

  test("bpePairCounts: vocab-weighted adjacent char pairs") {
    // "ab" ×3, "abc" ×1 → pairs: ab: 3+1, bc: 1; single-char word ignored
    val docs = Seq((1L, "ab ab abc x"), (2L, "ab")).toDF("doc_id", "text")
    val got = TextOps.bpePairCounts(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("ab" -> 4L, "bc" -> 1L))
  }

  test("unigramNll: uniform corpus scores ln(V) per token; rare tokens score higher") {
    // 4 tokens, each appearing once → p = 1/4, nll = ln 4 for every token
    val uniform = Seq((1L, "aa bb"), (2L, "cc dd")).toDF("doc_id", "text")
    val u = TextOps.unigramNll(uniform, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    val ln4 = BigDecimal(math.log(4)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(u(1L) == (2L, ln4) && u(2L) == (2L, ln4))
    // doc of common tokens scores below a doc with a rare token
    val skew = Seq((1L, "the the the the"), (2L, "the zyx")).toDF("doc_id", "text")
    val s = TextOps.unigramNll(skew, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(s(2L) > s(1L))
  }

  test("bigramLm: P(·|w1) sums to 1 — document-final occurrences don't " +
       "deflate the denominator") {
    // tokens: a b a b a → bigrams (a,b)×2, (b,a)×2; the trailing 'a' ends
    // the doc and is NOT a context, so c1(a) = 2 (not 3) and P(b|a) = 1
    val docs = Seq((1L, "a b a b a")).toDF("doc_id", "text")
    val got = TextOps.bigramLm(docs, "text", minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(3), r.getDouble(4)))
    assert(got.toSet == Set(("a", "b", 2L, 1.0), ("b", "a", 2L, 1.0)))
    // and on a branching context the conditionals still sum to exactly 1
    val docs2 = Seq((1L, "x y x z x y")).toDF("doc_id", "text")
    val sums = TextOps.bigramLm(docs2, "text", minCount = 1L)
      .groupBy("w1").sum("p").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // p rounds to 6 dp per bigram, so the sum is 1 up to rounding residue
    assert(sums.values.forall(s => math.abs(s - 1.0) < 1e-5), sums.toString)
  }
}
