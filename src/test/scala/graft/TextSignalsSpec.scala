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

  test("kneserNeyScore: hand bigram probabilities, KN normalization, " +
       "and the deterministic OOV floors") {
    import graft.text.NgramLm
    // corpus ["a b a b", "a c"]: c(ab)=2, c(ba)=1, c(ac)=1; c(a)=3, c(b)=1;
    // N1+(a·)=2, N1+(b·)=1; N1+(·a)=N1+(·b)=N1+(·c)=1; N1+(··)=3 → Pcont=1/3
    val train = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val pBA = (2.0 - 0.75) / 3 + 0.75 * 2.0 / 3 / 3   // P(b|a)
    val pAB = (1.0 - 0.75) / 1 + 0.75 * 1.0 / 1 / 3   // P(a|b)
    val pCA = (1.0 - 0.75) / 3 + 0.75 * 2.0 / 3 / 3   // P(c|a)
    val got = NgramLm.kneserNeyScore(train, train, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1L)._1 == 3L && got(2L)._1 == 1L)
    val d1 = (2 * -math.log(pBA) - math.log(pAB)) / 3
    assert(math.abs(got(1L)._2 - d1) < 1e-6)
    assert(math.abs(got(2L)._2 + math.log(pCA)) < 1e-6)

    // KN sums to 1 over the vocabulary for every seen context: score three
    // single-bigram docs covering all of context a's continuations — their
    // exp(−logloss) probabilities must total exactly 1
    val probes = Seq((10L, "a a"), (11L, "a b"), (12L, "a c"))
      .toDF("doc_id", "text")
    val ps = NgramLm.kneserNeyScore(train, probes, "doc_id", "text")
      .collect().map(r => math.exp(-r.getDouble(2))).sum
    assert(math.abs(ps - 1.0) < 1e-5)

    // OOV floors: unseen context → Pcont of the word; unseen word too →
    // 1/(N1+(··)+1) = 1/4
    val oov = Seq((20L, "z q"), (21L, "z b")).toDF("doc_id", "text")
    val o = NgramLm.kneserNeyScore(train, oov, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(math.abs(o(20L) - math.log(4.0)) < 1e-6)  // 1/(3+1)
    assert(math.abs(o(21L) - math.log(3.0)) < 1e-6)  // Pcont(b) = 1/3
  }

  test("kneserNeyMergeCounts: batch merges are order-independent and " +
       "reproduce the from-scratch LM exactly") {
    import graft.text.NgramLm
    val b1 = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val b2 = Seq((3L, "b c a"), (4L, "c c b")).toDF("doc_id", "text")
    val b3 = Seq((5L, "a b c d e"), (6L, "d e d")).toDF("doc_id", "text")
    val full = b1.unionByName(b2).unionByName(b3)
    def counts(df: org.apache.spark.sql.DataFrame) =
      NgramLm.kneserNeyCounts(df, "doc_id", "text")
    val m123 = NgramLm.kneserNeyMergeCounts(
      NgramLm.kneserNeyMergeCounts(counts(b1), counts(b2)), counts(b3))
    val m321 = NgramLm.kneserNeyMergeCounts(
      NgramLm.kneserNeyMergeCounts(counts(b3), counts(b2)), counts(b1))
    val scratch = counts(full)
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(asSet(m123) == asSet(scratch) && asSet(m321) == asSet(scratch))
    // scoring from the maintained index ≡ training from scratch
    val a = NgramLm.kneserNeyScoreFromCounts(m123, full, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = NgramLm.kneserNeyScore(full, full, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b)
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

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("pmiCollocations: closed-form PMI from positional marginals") {
    // bigrams: (a,b)×2, (a,c)×1, (b,b)×1 → N=4; c1: a=3, b=1; c2: b=3, c=1
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "b b"))
      .toDF("doc_id", "text")
    val got = TextOps.pmiCollocations(docs, "text", minCount = 1L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6))).toMap
    assert(got.keySet == Set(("a", "b"), ("a", "c"), ("b", "b")))
    assert(got(("a", "b")) == (2L, 3L, 3L, 4L, r6(math.log(8.0 / 9))))
    assert(got(("a", "c")) == (1L, 3L, 1L, 4L, r6(math.log(4.0 / 3))))
    assert(got(("b", "b")) == (1L, 1L, 3L, 4L, r6(math.log(4.0 / 3))))
  }

  test("heapsFit: cumulative vocabulary points fit the driver-side OLS") {
    // docs in id order: ncum = 2,4,8; vcum = 2,3,4
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "a b c d"))
      .toDF("doc_id", "text")
    val r = TextOps.heapsFit(docs, "doc_id", "text").collect()(0)
    assert(r.getLong(0) == 3L)
    val xs = Seq(2.0, 4.0, 8.0).map(math.log)
    val ys = Seq(2.0, 3.0, 4.0).map(math.log)
    val n = 3.0
    val (sx, sy) = (xs.sum, ys.sum)
    val sxx = xs.map(v => v * v).sum
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(r.getDouble(1) - slope) < 1e-5, s"slope ${r.getDouble(1)}")
    assert(r.getDouble(3) > 0.97)                    // near-log-linear
  }

  test("sourceVocabOverlap: hand Jaccard on two sources") {
    val docs = Seq((1L, "s1", "a b c"), (2L, "s2", "b c d"))
      .toDF("doc_id", "source", "text")
    val r = TextOps.sourceVocabOverlap(docs, "source", "text").collect()(0)
    assert(r.getString(0) == "s1" && r.getString(1) == "s2")
    assert(r.getLong(4) == 2L && r.getDouble(5) == 0.5) // |∩|=2, J=2/4
  }

  test("klFromCorpus: closed-form divergence of a skewed source") {
    val docs = Seq((1L, "s1", "a a b"), (2L, "s2", "b b"))
      .toDF("doc_id", "source", "text")
    val got = TextOps.klFromCorpus(docs, "source", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    def kl(ps: Seq[(Double, Double)]): Double = r6(
      ps.map { case (p, q) => p * math.log(p / q) }.sum)
    assert(math.abs(got("s1") -
      kl(Seq((2.0 / 3, 2.0 / 5), (1.0 / 3, 3.0 / 5)))) < 2e-6)
    assert(math.abs(got("s2") - kl(Seq((1.0, 3.0 / 5)))) < 2e-6)
  }

  test("zipfFit: an exact 1/rank spectrum fits slope −1 with R² = 1") {
    // counts 12, 6, 4, 3 = 12/rank for ranks 1..4 → ln f = ln 12 − ln r
    val words = Seq.fill(12)("aa") ++ Seq.fill(6)("bb") ++
      Seq.fill(4)("cc") ++ Seq.fill(3)("dd")
    val docs = words.grouped(5).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val r = TextOps.zipfFit(docs, "text", minCount = 1L).collect()(0)
    assert(r.getLong(0) == 4L)
    assert(r.getDouble(1) == -1.0, s"slope ${r.getDouble(1)}")
    assert(r.getDouble(2) == r6(math.log(12.0)), s"icept ${r.getDouble(2)}")
    assert(r.getDouble(3) == 1.0, s"r2 ${r.getDouble(3)}")
  }

  test("rakeKeywords: phrases split at stopwords, degree/frequency scores") {
    // doc: "red apple of red apple" → phrases "red apple" ×2 (split at
    // "of"). deg(red)=2+2, freq=2 → 2; deg(apple)=4, freq=2 → 2;
    // phrase score 4. A lone "apple" doc: phrase "apple" scores 2.
    val docs = Seq((1L, "red apple of red apple"), (2L, "apple"))
      .toDF("doc_id", "text")
    val got = TextOps.rakeKeywords(docs, "doc_id", "text",
        stops = Seq("of"), topK = 10)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // deg(red)=4 freq=2 → 2.0; deg(apple)=2+2+1=5 freq=3 → 5/3
    val apple = 5.0 / 3.0
    assert(got("red apple") == (2L,
      r6(BigDecimal(2.0).setScale(10, BigDecimal.RoundingMode.HALF_UP)
        .toDouble + BigDecimal(apple)
        .setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(got("apple") == (1L, r6(BigDecimal(apple)
      .setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("lexicalDiversity: TTR family on a crafted doc; empty doc NULLs") {
    val docs = Seq((1L, "a b a b"), (2L, "")).toDF("doc_id", "text")
    val got = TextOps.lexicalDiversity(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val d = got(1L)
    assert(d.getLong(1) == 4L && d.getLong(2) == 2L)
    assert(d.getDouble(3) == 0.5)                  // ttr
    assert(d.getDouble(4) == 1.0)                  // 2/√4
    assert(d.getDouble(5) == 0.5)                  // ln2/ln4
    val e = got(2L)
    assert(e.getLong(1) == 0L && e.isNullAt(3) && e.isNullAt(4) &&
      e.isNullAt(5))
  }

  test("readability: hand Flesch on a two-sentence doc; empty doc guard") {
    // "the cat sat. it ran!" → 5 words, 2 sentences, 5 syllable groups
    val docs = Seq((1L, "the cat sat. it ran!"), (2L, ""))
      .toDF("doc_id", "text")
    val got = TextOps.readability(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val d = got(1L)
    assert(d.getLong(1) == 5L && d.getLong(2) == 2L && d.getLong(3) == 5L)
    val ease = 206.835 - 1.015 * 2.5 - 84.6 * 1.0
    val grade = 0.39 * 2.5 + 11.8 * 1.0 - 15.59
    assert(d.getDouble(4) == r6(ease) && d.getDouble(5) == r6(grade))
    val e = got(2L)
    assert(e.getLong(1) == 0L && e.isNullAt(4) && e.isNullAt(5))
    // vowel-less token still counts one syllable
    val v = TextOps.readability(Seq((3L, "zzz tv")).toDF("doc_id", "text"),
      "doc_id", "text").collect().head
    assert(v.getLong(3) == 2L)
  }

  test("burstiness: repetition and adaptation separate bursty terms") {
    // "x x x" in one doc (bursty) vs "y" spread across three docs
    val docs = Seq((1L, "x x x y"), (2L, "y"), (3L, "y"))
      .toDF("doc_id", "text")
    val got = TextOps.burstiness(docs, "doc_id", "text", minDf = 1L)
      .collect().map(r => r.getString(0) -> r).toMap
    val x = got("x")
    assert(x.getLong(1) == 1L && x.getLong(2) == 3L && x.getLong(3) == 1L)
    assert(x.getDouble(4) == 3.0 && x.getDouble(5) == 1.0)
    val y = got("y")
    assert(y.getLong(1) == 3L && y.getLong(2) == 3L && y.getLong(3) == 0L)
    assert(y.getDouble(4) == 1.0 && y.getDouble(5) == 0.0)
  }

  test("textRank: the bridging word out-ranks the leaves; stopwords and " +
       "self-pairs never enter the graph") {
    val docs = Seq((1L, "hub beta"), (2L, "hub gamma"), (3L, "hub delta"),
      (4L, "the the the"), (5L, "solo solo")).toDF("doc_id", "text")
    val got = TextOps.textRank(docs, "text", topK = 10)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getInt(2)))
    assert(got.head._1 == "hub" && got.head._3 == 1, got.mkString(";"))
    val words = got.map(_._1).toSet
    // 'the' is a stopword; 'solo solo' collapses to a self-pair (dropped)
    assert(words == Set("hub", "beta", "gamma", "delta"), words)
    // star graph: the three leaves tie exactly, ranked alphabetically
    assert(got.map(_._1).toSeq == Seq("hub", "beta", "delta", "gamma"))
  }
}
