package graft

import graft.text.{Curate, Dedup, Mix}
import org.apache.spark.sql.functions._

/** Corpus-curation operators: decontamination, temperature mixing, URL
  * parsing/domain stats, the composite quality filter, and the LSH bucket
  * histogram + shared-ngram corpus signals. */
class CurateSpec extends SparkSpec {
  import spark.implicits._

  test("contamination counts eval n-gram overlap and flags at threshold") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // shares a 3-gram window with eval
      (2L, "one two three four five six seven"))   // disjoint from eval
      .toDF("doc_id", "text")
    val evalSet = Seq((100L, "beta gamma delta epsilon")).toDF("doc_id", "text")
    val out = Curate.contamination(train, evalSet, "doc_id", "text", 3, 0.2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getInt(4))).toMap
    // doc 1: 4 3-grams, eval's 2 3-grams both appear → overlap 2, 0.5 ≥ 0.2
    assert(out(1L) == ((4L, 2L, 1)))
    assert(out(2L) == ((5L, 0L, 0)))
  }

  test("temperatureWeights: alpha=1 reproduces natural shares; alpha=0.5 flattens") {
    val docs = Seq.tabulate(90)(i => (s"big doc number $i with several tokens", "big")) ++
      Seq.tabulate(10)(i => (s"small doc $i three tokens here now ok", "small"))
    val df = docs.toDF("text", "source")
    val nat = Mix.temperatureWeights(df, "source", "text", 1.0)
      .collect().map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    nat.values.foreach { case (share, w) => assert(math.abs(share - w) < 2e-6) }
    val half = Mix.temperatureWeights(df, "source", "text", 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    val natW = nat("small")._2
    assert(half("small") > natW)         // rare source upweighted
    assert(half("big") < nat("big")._2)  // dominant source downweighted
    assert(math.abs(half.values.sum - 1.0) < 2e-6)
  }

  test("perplexityBuckets: quartile fences per group, head kept fully, " +
       "ppm decision deterministic across re-runs") {
    // 8 docs per group with distinct ppl 1..8: q25 = 2.75, q75 = 6.25 →
    // head {1,2}, middle {3,4,5,6}, tail {7,8}
    val scored = (1 to 8).flatMap(i => Seq(
      (i.toLong, "en", i.toDouble), (100L + i, "de", i.toDouble)))
      .toDF("doc_id", "lang", "ppl")
    val out = Curate.perplexityBuckets(scored, "doc_id", "lang", "ppl")
    val got = out.collect()
      .map(r => r.getLong(0) -> (r.getString(3), r.getInt(4))).toMap
    assert(got.size == 16)
    for (base <- Seq(0L, 100L)) {
      assert(Seq(1L, 2L).forall(i => got(base + i)._1 == "head"))
      assert(Seq(3L, 4L, 5L, 6L).forall(i => got(base + i)._1 == "middle"))
      assert(Seq(7L, 8L).forall(i => got(base + i)._1 == "tail"))
    }
    // head is never down-sampled; the hash decision is id-deterministic
    assert(got.collect { case (id, ("head", s)) => s }.forall(_ == 1))
    val again = Curate.perplexityBuckets(scored, "doc_id", "lang", "ppl")
      .collect().map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(got.map { case (k, v) => k -> v._2 } == again)
    // keepTail = 0 drops every tail doc regardless of hash
    val none = Curate.perplexityBuckets(scored, "doc_id", "lang", "ppl",
        keepMiddle = 1.0, keepTail = 0.0)
      .collect().map(r => (r.getString(3), r.getInt(4)))
    assert(none.collect { case ("tail", s) => s }.forall(_ == 0))
    assert(none.collect { case ("middle", s) => s }.forall(_ == 1))
  }

  test("NaiveBayes: hand Laplace posteriors, symmetric tie breaks to the " +
       "smaller label, OOV floors apply") {
    import graft.text.NaiveBayes
    // vocab {buy, pills, meeting, notes}, V=4, 2 tokens/class, priors 1/2:
    // P(seen|c) = 2/6, P(unseen|c) = 1/6
    val train = Seq((1L, "spam", "buy pills"), (2L, "ham", "meeting notes"))
      .toDF("doc_id", "label", "text")
    val probes = Seq((10L, "buy pills"), (11L, "meeting notes"),
      (12L, "buy notes")).toDF("doc_id", "text")
    val got = NaiveBayes.trainScore(train, probes, "doc_id", "label", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2)))
      .toMap
    assert(got(10L)._1 == "spam" && got(11L)._1 == "ham")
    // "buy notes": one seen token per class → identical scores; the
    // deterministic tie-break picks the lexicographically smaller label
    assert(got(12L)._1 == "ham")
    val expect = math.log(0.5) + math.log(2.0 / 6) + math.log(1.0 / 6)
    val q6e = BigDecimal(expect).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(got(12L)._2 - q6e) < 2e-6)
    assert(got(10L)._2 > got(12L)._2) // two seen tokens beat one
  }

  test("NaiveBayes: NULL/empty text scores by prior; all-empty class " +
       "stays predictable; pure-OOV docs use the closed-form floor") {
    import graft.text.NaiveBayes
    val train = Seq((1L, "spam", "buy pills now now"),
      (2L, "ham", "meeting notes"), (3L, "ham", "meeting agenda"),
      (4L, "mute", null: String)) // a class with no training tokens
      .toDF("doc_id", "label", "text")
    val probes = Seq((10L, null: String), (11L, ""),
      (12L, "zzz qqq zzz"), (13L, "meeting")).toDF("doc_id", "text")
    val got = NaiveBayes.trainScore(train, probes, "doc_id", "label", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2)))
      .toMap
    // token-less docs fall back to the prior argmax: ham has prior 2/4
    assert(got(10L)._1 == "ham" && got(11L)._1 == "ham")
    assert(math.abs(got(10L)._2 - math.log(0.5)) < 2e-6)
    // pure-OOV doc: only floors differ — ham has fewer class tokens than
    // spam? toks: spam=4, ham=4, mute=0 → mute's floor 1/(0+V) is the
    // LARGEST, so the empty class wins the all-OOV doc over the others'
    // smaller per-token floors (V=6: buy,pills,now,meeting,notes,agenda)
    assert(got(12L)._1 == "mute",
      s"all-OOV doc should go to the empty class's larger floor: ${got(12L)}")
    // floor check: 2 distinct OOV tokens, multiplicities 2 and 1 →
    // 3 · ln(1/6) + ln(1/4)
    val expect = 3 * math.log(1.0 / 6) + math.log(1.0 / 4)
    assert(math.abs(got(12L)._2 - expect) < 2e-6)
    assert(got(13L)._1 == "ham") // in-vocab evidence still dominates
  }

  test("parseUrl extracts scheme/host/domain/path depth") {
    val r = Curate.parseUrl(
      Seq(("https://www.sub.example.org/a/b/c", 1)).toDF("url", "x"), "url")
      .select("scheme", "host", "domain", "path_depth").head()
    assert(r.getString(0) == "https")
    assert(r.getString(1) == "www.sub.example.org")
    assert(r.getString(2) == "example.org")
    assert(r.getLong(3) == 3L)
    val bare = Curate.parseUrl(
      Seq(("http://example.net", 1)).toDF("url", "x"), "url")
      .select("domain", "path_depth").head()
    assert(bare.getString(0) == "example.net")
    assert(bare.getLong(1) == 0L)
  }

  test("domainStats aggregates docs/hosts/weight per registered domain") {
    val df = Seq(
      ("https://a.example.org/x", 10L),
      ("https://b.example.org/y", 20L),
      ("https://a.example.org/z", 5L),
      ("https://only.test.io/w", 7L)).toDF("url", "n_chars")
    val out = Curate.domainStats(df, "url", col("n_chars"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out("example.org") == ((3L, 2L, 35L, 0.75)))
    assert(out("test.io") == ((1L, 1L, 7L, 0.25)))
  }

  test("filterPipeline fires each rule with a reason and keeps clean docs") {
    val clean = "the cat sat on a mat and the dog lay in the sun near a tree today"
    val docs = Seq(
      (1L, clean),
      (2L, "short doc"),                                     // too_short
      (3L, Seq.fill(40)("zz xx").mkString(" ")),             // repetitive + low_stopword
      (4L, ("supercalifragilistic " * 12).trim))             // bad_token_len (+dup)
      .toDF("doc_id", "text")
    val out = Curate.filterPipeline(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(5), r.getInt(6))).toMap
    assert(out(1L) == (("", 1)))
    assert(out(2L)._1.contains("too_short") && out(2L)._2 == 0)
    assert(out(3L)._1.contains("repetitive") && out(3L)._1.contains("low_stopword"))
    assert(out(4L)._1.contains("bad_token_len") && out(4L)._2 == 0)
  }

  test("filterDrift: the source whose new shard degraded moves, the " +
       "stable source holds at zero drift") {
    val clean = "the cat sat on a mat and the dog lay in the sun near a tree"
    val junk = Seq.fill(40)("zz xx").mkString(" ")
    def rows(src: String, ids: Seq[Long], texts: Seq[String]) =
      ids.zip(texts).map { case (i, t) => (i, src, t) }
    // old shard (doc_id < 100): both sources ship 3 clean + 1 junk
    val old =
      rows("stable", Seq(1L, 2L, 3L), Seq.fill(3)(clean)) ++
        rows("stable", Seq(4L), Seq(junk)) ++
        rows("moving", Seq(5L, 6L, 7L), Seq.fill(3)(clean)) ++
        rows("moving", Seq(8L), Seq(junk))
    // new shard (doc_id >= 100): stable repeats the mix; moving degrades
    // to all-junk vocabulary — the trained filter must drop all of it
    val nw =
      rows("stable", Seq(101L, 102L, 103L), Seq.fill(3)(clean)) ++
        rows("stable", Seq(104L), Seq(junk)) ++
        rows("moving", Seq(105L, 106L, 107L, 108L), Seq.fill(4)(junk))
    val docs = (old ++ nw).toDF("doc_id", "source", "text")
    val got = Curate.filterDrift(docs, "doc_id", "text", "source",
        col("doc_id") >= 100)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(got("stable") == ((4L, 4L, 0.75, 0.75, 0.0)),
      s"stable source must hold: ${got("stable")}")
    assert(got("moving") == ((4L, 4L, 0.75, 0.0, -0.75)),
      s"moving source must drift down: ${got("moving")}")
  }

  test("sharedNgramStats: duplicated docs share all n-grams, unique docs none") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "totally unrelated words appear here")).toDF("doc_id", "text")
    val out = Dedup.sharedNgramStats(df, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == ((3L, 3L, 1.0)))
    assert(out(2L) == ((3L, 3L, 1.0)))
    assert(out(3L) == ((3L, 0L, 0.0)))
  }

  test("bucketHistogram per-band bucket counts sum to the doc count") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "completely different text about query engines and shuffle plans"))
      .toDF("doc_id", "text")
    val sig = Dedup.minhashSignatures(df, "doc_id", "text")
    val hist = Dedup.bucketHistogram(sig, "doc_id").collect()
    val perBand = hist.groupBy(_.getInt(0)).view
      .mapValues(_.map(r => r.getLong(1) * r.getLong(2)).sum).toMap
    assert(perBand.size == Dedup.NumBands)
    perBand.values.foreach(n => assert(n == 3L)) // every doc lands in a bucket
    // identical docs share every band bucket → each band has a size-2 bucket
    hist.filter(_.getLong(1) == 2L).groupBy(_.getInt(0)).foreach {
      case (_, rs) => assert(rs.map(_.getLong(2)).sum == 1L)
    }
    assert(hist.count(_.getLong(1) == 2L) == Dedup.NumBands)
  }

  test("passageDedup drops repeated boilerplate everywhere but first; strip rebuilds") {
    import spark.implicits._
    val boiler = "subscribe to our newsletter today" // one 5-token chunk
    val docs = Seq(
      (1L, s"alpha beta gamma delta epsilon $boiler"),
      (2L, s"$boiler zeta eta theta iota kappa"),
      (3L, boiler))                                  // all boilerplate
      .toDF("doc_id", "text")
    val v = Curate.passageDedup(docs, "doc_id", "text", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(3), r.getInt(4))).toMap
    // doc 1: chunk0 unique, chunk1 = boiler (first holder by (doc,idx) order)
    assert(v((1L, 0L)) == (1L, 1))
    assert(v((1L, 1L)) == (3L, 1)) // 3 copies, doc 1 holds the first
    assert(v((2L, 0L)) == (3L, 0))
    assert(v((3L, 0L)) == (3L, 0))
    val clean = Curate.stripDupPassages(docs, "doc_id", "text", 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(clean(1L) == s"alpha beta gamma delta epsilon $boiler")
    assert(clean(2L) == "zeta eta theta iota kappa")
    assert(clean(3L) == "") // fully-boilerplate doc survives with empty text
  }

  test("posteriors: max-shifted softmax over the class log-scores") {
    import graft.text.NaiveBayes
    val sa = Seq((1L, "a", 0.0), (1L, "b", 1.098612))
      .toDF("doc_id", "label", "logp")
    val got = NaiveBayes.posteriors(sa, "doc_id")
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(got("a") == 0.25 && got("b") == 0.75, got)
  }

  test("calibrationReport: hand bins, ECE, and multi-class Brier; " +
       "posterior ties predict the smaller label") {
    val probs = Seq(
      (1L, "a", 0.9), (1L, "b", 0.1),    // truth a: hit, bin 9
      (2L, "a", 0.8), (2L, "b", 0.2),    // truth b: miss, bin 8
      (3L, "a", 0.55), (3L, "b", 0.45),  // truth a: hit, bin 5
      (4L, "a", 0.5), (4L, "b", 0.5))    // truth b: tie → pred a, miss
      .toDF("doc_id", "label", "p")
    val truth = Seq((1L, "a"), (2L, "b"), (3L, "a"), (4L, "b"))
      .toDF("doc_id", "source")
    val got = graft.ops.Stats.calibrationReport(probs, "doc_id", "label",
        "p", truth, "source")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(got(9L) == ((1L, 0.9, 1.0, 0.2375, 0.55125)))
    assert(got(8L) == ((1L, 0.8, 0.0, 0.2375, 0.55125)))
    assert(got(5L) == ((2L, 0.525, 0.5, 0.2375, 0.55125)))
  }

  test("calibrationReport: a truth label outside the scored class set " +
       "still owes the true class's full Brier term") {
    // doc 1: truth "c" is NOT among the scored classes {a, b} — Brier is
    // 0.6² + 0.4² + (0 − 1)² = 1.52, not the 0.52 a present-classes-only
    // sum would give; doc 2 is a plain hit: 0.1² + 0.9²·0 → (0.9−1)²+0.1²
    // = 0.02. Mean Brier = (1.52 + 0.02) / 2 = 0.77.
    val probs = Seq(
      (1L, "a", 0.6), (1L, "b", 0.4),
      (2L, "a", 0.9), (2L, "b", 0.1))
      .toDF("doc_id", "label", "p")
    val truth = Seq((1L, "c"), (2L, "a")).toDF("doc_id", "source")
    val brier = graft.ops.Stats.calibrationReport(probs, "doc_id", "label",
        "p", truth, "source")
      .select("brier").distinct().collect().map(_.getDouble(0)).toSeq
    assert(brier == Seq(0.77), brier)
  }

  test("semanticDecontaminate flags embedding neighbors of the eval set " +
       "and leaves orthogonal vectors clean") {
    // cell "a": eval vector 10 and near-copy 1 (contaminated), plus an
    // orthogonal vector 2; cell "b": vector 3, no eval vector routes there
    val rows = Seq(
      (10L, Seq(1f, 0f, 0f, 0f), "a"),
      (1L, Seq(0.9f, 0.1f, 0f, 0f), "a"),
      (2L, Seq(0f, 0f, 1f, 0f), "a"),
      (3L, Seq(0f, 0f, 0f, 1f), "b"))
      .toDF("vec_id", "embedding", "label")
    val got = Curate.semanticDecontaminate(rows,
        rows.filter(col("vec_id") === 10), "vec_id", "embedding", "label",
        minSim = 0.8, k = 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(3)))).toMap
    assert(got(1L) == ((1L, 1)))   // near-copy: one eval hit
    assert(got(2L) == ((0L, 0)))   // same cell, orthogonal
    assert(got(3L) == ((0L, 0)))   // other cell, never a candidate
    assert(got(10L) == ((0L, 0)))  // the eval vector itself: self excluded
  }

  test("dupSpans: a shared 8-token span flags both docs, in-document " +
       "repetition flags itself, short docs report NULL") {
    val span = (1 to 8).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"$span alpha beta gamma"),      // shares span with doc 2
      (2L, s"prefix words here $span"),
      (3L, (1 to 12).map(i => s"u$i").mkString(" ")), // unique
      (4L, s"$span and $span"),             // repeats its own span
      (5L, "too short"))                    // < 8 tokens
      .toDF("doc_id", "text")
    val got = Curate.dupSpans(docs, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    // doc1: 4 windows, the first (= the span) duplicated
    assert(got(1L) == ((4L, 1L)), got(1L))
    assert(got(2L) == ((4L, 1L)), got(2L))
    assert(got(3L) == ((5L, 0L)), got(3L))
    // doc4: 10 windows, window 1 and window 10 are both the span —
    // they duplicate each other AND docs 1/2
    assert(got(4L)._2 >= 2L, got(4L))
    assert(got(5L) == ((0L, 0L)), got(5L))
    val short = Curate.dupSpans(docs, "doc_id", "text", n = 8)
      .filter(col("doc_id") === 5).collect()(0)
    assert(short.isNullAt(3))
  }

  test("dupSpanIslands: overlapping windows merge, exactly-adjacent " +
       "windows merge, a gap splits — hand-replayed islands") {
    // n = 4; window at 1-based pos p covers tokens p..p+3; windows merge
    // when the positional difference <= 4 (overlap or token-adjacency)
    val s = "s1 s2 s3 s4"                    // shared 4-token span
    val t6 = (1 to 6).map(i => s"t$i").mkString(" ") // shared 6-token run
    val docs = Seq(
      (1L, s"$s x1 x2 x3 x4 $s"),  // dup windows at pos 1 and 9: gap (>4)
      (2L, s"p1 p2 $s p3 p4"),     // single dup window at pos 3
      (3L, s"$t6 z1 z2"),          // dup windows 1,2,3: overlap, one span
      (4L, s"q1 $t6"),             // dup windows 2,3,4: overlap, one span
      (5L, s"$s t1 t2 t3 t4"),     // dup at pos 1 and 5: EXACTLY adjacent
      (6L, "too short"))           // < 4 tokens: no windows, no rows
      .toDF("doc_id", "text")
    val got = Curate.dupSpanIslands(docs, "doc_id", "text", n = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val want = Set(
      (1L, 1L, 4L, 1L), (1L, 9L, 12L, 1L), // split: 9 - 1 = 8 > 4
      (2L, 3L, 6L, 1L),
      (3L, 1L, 6L, 3L),                    // 3 overlapping windows merge
      (4L, 2L, 7L, 3L),
      (5L, 1L, 8L, 2L))                    // 5 - 1 = 4: adjacent, merged
    assert(got == want, s"got $got")

    // applying the remove-list: covered tokens drop, survivors rejoin
    val stripped = Curate.removeDupSpans(docs, "doc_id", "text", n = 4)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(stripped(2L) == ((8L, 4L, "p1 p2 p3 p4")), stripped(2L))
    assert(stripped(5L) == ((8L, 8L, "")), stripped(5L)) // fully covered
    assert(stripped(6L) == ((2L, 0L, "too short")), stripped(6L))
    assert(stripped(1L) == ((12L, 8L, "x1 x2 x3 x4")), stripped(1L))
  }

  test("dsirResample prefers target-like docs and is partition-invariant") {
    // two disjoint vocabularies: docs 1-10 "target-like", 11-30 not; mark
    // only 1-5 as target — DSIR should pull 6-10 (target-LIKE but not
    // target-labeled) ahead of the 11-30 crowd
    val docs = ((1L to 10L).map(i => (i, "alpha beta gamma delta", i <= 5)) ++
      (11L to 30L).map(i => (i, "omega psi chi phi", false))).toDF("doc_id", "text", "t")
    val kept = Curate.dsirResample(docs, "doc_id", "text", col("t"), k = 8)
    val ids = kept.select("doc_id").as[Long].collect().toSet
    val targetLike = ids.count(_ <= 10)
    assert(targetLike >= 6, s"expected mostly target-like docs, got $ids")
    // weights separate the vocabularies strictly
    val w = Curate.dsirResample(docs, "doc_id", "text", col("t"), k = 30)
      .select("doc_id", "imp_weight").as[(Long, Double)].collect().toMap
    assert((1L to 10L).map(w).min > (11L to 30L).map(w).max)
    // deterministic under repartitioning
    val again = Curate.dsirResample(docs.repartition(7), "doc_id", "text",
      col("t"), k = 8)
      .select(col("doc_id"), col("score"), col("rank").cast("long"))
      .as[(Long, Double, Long)].collect().toSet
    val base = kept
      .select(col("doc_id"), col("score"), col("rank").cast("long"))
      .as[(Long, Double, Long)].collect().toSet
    assert(again == base)
  }
}
