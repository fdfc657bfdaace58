package graft

import graft.text.{Dedup, TextOps}
import org.apache.spark.sql.functions._

/** Dedup operators on planted duplicates: exact groups collapse, MinHash/LSH
  * surfaces near-dups, SimHash hamming distance is small for near-dups,
  * Jaccard quantifies overlap. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat sleeps near the warm fire " +
      "and the birds sing in the tall green trees above the quiet garden path"
  private val nearDup = base.replace("quiet", "silent") // one word differs
  private val unrelated =
    "completely different content about databases query engines shuffle partitions " +
      "aggregation pipelines and distributed execution frameworks running on clusters"

  private lazy val docs = Seq(
    (1L, base, "s"), (2L, base, "s"),        // exact dup pair
    (3L, nearDup, "s"), (4L, unrelated, "s"),
    (5L, "tiny doc", "s"))
    .toDF("doc_id", "text", "source")

  test("exact dedup collapses identical texts to the min id") {
    val g = Dedup.exactGroups(docs, "doc_id", "text").collect()
    assert(g.length == 4)
    val dupGroup = g.find(_.getLong(2) == 2).get
    assert(dupGroup.getLong(1) == 1L) // canonical = min(doc_id)
  }

  test("minhash LSH finds exact and near duplicates, not unrelated docs") {
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text")
    assert(sig.columns.count(_.startsWith("mh")) == 16)
    val pairs = Dedup.minhashCandidates(sig, "doc_id")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((1L, 2L)) == 1.0) // identical docs → all 16 hashes equal
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L))) // near-dup caught
    assert(!pairs.keySet.exists { case (a, b) => Set(a, b).contains(4L) })
  }

  test("simhash: identical texts equal; near-dups within small hamming distance") {
    val sh = Dedup.simhash(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(1L), sh(3L)) <= 6)
    assert(hamming(sh(1L), sh(4L)) > hamming(sh(1L), sh(3L)))
  }

  test("scoped n-gram jaccard ranks near-dup far above unrelated") {
    val j = Dedup.ngramJaccard(docs, "doc_id", "text", "source", 2, 0.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(j((1L, 2L)) == 1.0)
    assert(j((1L, 3L)) > 0.8)
    assert(j.getOrElse((1L, 4L), 0.0) < 0.05)
  }

  test("native simhash equals the 32-pass HOF reference formulation") {
    val native = Dedup.simhash(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hof = Dedup.simhashHof(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == hof)
  }

  test("hot band buckets are capped and reported, not silently joined") {
    val boiler = (1L to 20L).map(i => (i, base, "s")).toDF("doc_id", "text", "source")
    val sig = Dedup.minhashSignatures(boiler, "doc_id", "text")
    // all 20 docs identical → every band bucket has 20 members
    assert(Dedup.minhashCandidates(sig, "doc_id", maxBucket = 10).count() == 0)
    val over = Dedup.minhashOverflow(sig, "doc_id", maxBucket = 10).collect()
    assert(over.length == Dedup.NumBands)
    assert(over.forall(_.getLong(2) == 20L))
    // default cap keeps them: all C(20,2) pairs at est_jaccard 1.0
    val pairs = Dedup.minhashCandidates(sig, "doc_id").collect()
    assert(pairs.length == 190 && pairs.forall(_.getDouble(2) == 1.0))
  }

  test("shingles above maxDf are dropped from the jaccard join and reported") {
    val boiler = (1L to 12L).map(i =>
      (i, s"common pair here unique$i token$i word$i", "s"))
      .toDF("doc_id", "text", "source")
    // "common pair"/"pair here" have df=12; every other 2-gram df=1
    val hot = Dedup.ngramHotShingles(boiler, "doc_id", "text", "source", 2, maxDf = 11)
      .collect()
    assert(hot.map(_.getString(1)).toSet == Set("common pair", "pair here"))
    assert(Dedup.ngramJaccard(boiler, "doc_id", "text", "source", 2, 0.0, maxDf = 11)
      .count() == 0)
    // raising the cap re-admits them: 5 shingles/doc, 2 shared → J = 2/8
    val j = Dedup.ngramJaccard(boiler, "doc_id", "text", "source", 2, 0.0, maxDf = 12)
      .collect()
    assert(j.length == 66 && j.forall(_.getDouble(2) == 0.25))
  }

  test("dedup clusters: pair chain collapses to one component, singletons keep") {
    val verts = Seq((1L, "x"), (2L, "x"), (3L, "x"), (4L, "y"), (5L, "z"))
      .toDF("doc_id", "text")
    // chain 1-2, 2-3: the min label needs two propagation rounds to reach 3
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val cl = Dedup.dedupClusters(verts, pairs, "doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    assert(cl(1L) == ((1L, 3L, 1)))
    assert(cl(2L) == ((1L, 3L, 0)))
    assert(cl(3L) == ((1L, 3L, 0)))
    assert(cl(4L) == ((4L, 1L, 1)))
    assert(cl(5L) == ((5L, 1L, 1)))
    // the round cap never returns unconverged (wrong) labels: the chain
    // needs 2 propagation rounds + 1 to observe convergence, so maxRounds=1
    // either falls back to large-star/small-star (default) or throws
    val viaFallback = Dedup.dedupClusters(verts, pairs, "doc_id", maxRounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaFallback == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L))
    intercept[IllegalStateException] {
      Dedup.dedupClusters(verts, pairs, "doc_id", maxRounds = 1,
        fallbackToStar = false).collect()
    }
  }

  test("star clusters: 500-hop chain converges in O(log²) rounds with correct labels") {
    // a path graph is the propagation worst case (one round per hop);
    // large-star/small-star must label it without 500 shuffle rounds
    val n = 500L
    val verts = spark.range(0, n + 1).toDF("doc_id")
    val pairs = spark.range(0, n).select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val cl = Dedup.starClusters(verts, pairs, "doc_id")
    val agg = cl.agg(
      countDistinct("cluster_id"), min("cluster_id"), max("cluster_size"),
      sum("keep"), count(lit(1))).head()
    assert(agg.getLong(0) == 1L)      // one component
    assert(agg.getLong(1) == 0L)      // labeled with the min vertex
    assert(agg.getLong(2) == n + 1)   // full size
    assert(agg.getLong(3) == 1L)      // exactly one keeper
    assert(agg.getLong(4) == n + 1)
    // the propagation path falls back to the same answer instead of throwing
    val fb = Dedup.dedupClusters(verts, pairs, "doc_id", maxRounds = 5)
    assert(fb.agg(countDistinct("cluster_id"), sum("keep")).head()
      == org.apache.spark.sql.Row(1L, 1L))
  }

  test("star clusters: the small-tail driver finish is byte-equal to the " +
       "pure distributed rounds (toggled via spark.graft.ccDriverFinishEdges)") {
    val verts = (1L to 40L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val pairs = ((1L to 9L).map(i => (i, i + 1)) ++
      (for (a <- 20L to 24L; b <- (a + 1) to 24L) yield (a, b)) ++
      Seq((30L, 31L), (30L, 32L), (30L, 33L))).toDF("id_a", "id_b")
    def run() = Dedup.starClusters(verts, pairs, "doc_id")
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val viaDriver = run() // default cutoff: the tiny graph finishes local
    spark.conf.set("spark.graft.ccDriverFinishEdges", "0")
    try assert(run() == viaDriver,
      "driver finish and distributed rounds must label identically")
    finally spark.conf.unset("spark.graft.ccDriverFinishEdges")
  }

  test("star clusters match propagation clusters on a multi-component graph") {
    val verts = (1L to 40L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    // three shapes: a chain 1..10, a clique on 20..24, a star at 30
    val pairs = ((1L to 9L).map(i => (i, i + 1)) ++
      (for (a <- 20L to 24L; b <- (a + 1) to 24L) yield (a, b)) ++
      Seq((30L, 31L), (30L, 32L), (30L, 33L))).toDF("id_a", "id_b")
    val prop = Dedup.dedupClusters(verts, pairs, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val star = Dedup.starClusters(verts, pairs, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(prop == star)
  }

  test("stored signature index: indexed incremental equals recomputed, scan is pruned") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sigidx").toString
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text")
    val corpusSig = sig.filter(col("doc_id") <= 2)
    val newSig = sig.filter(col("doc_id") >= 3)
    Dedup.writeSignatureIndex(corpusSig, "doc_id", dir, nBuckets = 16)
    val idx = Dedup.readSignatureIndex(spark, dir)
    assert(idx.nBuckets == 16)
    val indexed = Dedup.incrementalCandidatesIndexed(idx, newSig, "doc_id")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val recomputed = Dedup.incrementalCandidates(corpusSig, newSig, "doc_id")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(indexed == recomputed && indexed.nonEmpty)
    // only the new batch's buckets are read: the pruned corpus scan carries a
    // partition filter on `bucket`, so untouched bucket directories never open
    val pruned = idx.bands.filter(col("bucket").isin(0, 1))
    val planStr = pruned.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters") && planStr.contains("bucket"))
  }

  test("dedup clusters end-to-end: LSH pairs cluster exact+near dups together") {
    val pairs = Dedup.minhashCandidates(
      Dedup.minhashSignatures(docs, "doc_id", "text"), "doc_id")
      .filter(col("est_jaccard") >= 0.5)
    val cl = Dedup.dedupClusters(docs, pairs, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl(1L) == 1L && cl(2L) == 1L && cl(3L) == 1L) // dups + near-dup
    assert(cl(4L) == 4L && cl(5L) == 5L)                 // unrelated stay apart
  }

  test("incremental candidates: new batch vs corpus, no corpus×corpus pairs") {
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text")
    val inc = Dedup.incrementalCandidates(
      sig.filter(col("doc_id") <= 2), sig.filter(col("doc_id") >= 3), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!inc.contains((1L, 2L))) // the corpus pair is NOT re-derived
    assert(inc.contains((1L, 3L)) && inc.contains((2L, 3L))) // corpus×new found
    // exactly the full candidate set minus corpus-internal pairs
    val full = Dedup.minhashCandidates(sig, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc == full.filterNot { case (a, b) => a <= 2 && b <= 2 })
  }

  test("winnowing fingerprint: equal for dups, different for near-dups") {
    val fp = TextOps.fingerprint(docs, "text").select("doc_id", "fingerprint")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(4L))
  }

  test("incrementalClusters: a bridging new doc merges two old clusters " +
       "to the global min label") {
    val oldAssign = Seq((1L, 1L), (2L, 1L), (3L, 3L), (9L, 9L))
      .toDF("doc_id", "cluster_id")
    val newDocs = Seq(Tuple1(4L)).toDF("doc_id")
    val pairs = Seq((2L, 4L), (3L, 4L)).toDF("id_a", "id_b")
    val got = Dedup.incrementalClusters(oldAssign, newDocs, pairs, "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // 4 bridges {1,2} and {3} → one component labelled by the global min 1
    assert(Seq(1L, 2L, 3L, 4L).forall(got(_) == (1L, 4L)))
    assert(got(9L) == (9L, 1L)) // untouched old singleton unchanged
  }

  test("softDedupWeights: weight = 1/size, singletons always sampled, " +
       "decision deterministic") {
    val clusters = Seq(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L), // one 3-cluster
      (4L, 4L, 1L), (5L, 5L, 1L))               // two singletons
      .toDF("doc_id", "cluster_id", "cluster_size")
    val got = Dedup.softDedupWeights(clusters, "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(3), r.getInt(4))).toMap
    assert(got(1L)._1 == 0.333333 && got(4L)._1 == 1.0)
    // singletons: bucket·1 < 10⁶ for every bucket → always kept
    assert(got(4L)._2 == 1 && got(5L)._2 == 1)
    // deterministic across runs
    val again = Dedup.softDedupWeights(clusters, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(got.forall { case (k, (_, s)) => again(k) == s })
  }

  test("ngramContainment: a quoted fragment scores 1 toward its host " +
    "while Jaccard stays small") {
    import spark.implicits._
    val host = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, "alpha beta gamma", "s"),     // fully contained in doc 2
      (2L, host, "s"),
      (3L, "unrelated totally different words here now", "s"))
      .toDF("doc_id", "text", "source")
    val got = Dedup.ngramContainment(docs, "doc_id", "text", "source",
        n = 2, minContainment = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    assert(got.keySet == Set((1L, 2L)))
    val p = got((1L, 2L))
    // doc1 has 2 bigrams, both inside doc2's 9 → C(A→B)=1, C(B→A)=2/9
    assert(p.getLong(2) == 2L && p.getDouble(3) == 1.0)
    assert(p.getDouble(4) == math.floor(2.0 / 9.0 * 1e6 + 0.5) / 1e6)
    // the symmetric Jaccard on the same pair is only 2/9 — sub-threshold
    val j = Dedup.ngramJaccard(docs, "doc_id", "text", "source", 2, 0.5)
    assert(j.count() == 0)
  }

  test("minhashEval: an exact duplicate pair calibrates to bin 9 with " +
       "true jaccard 1 and zero error; unrelated docs produce no pair") {
    val words = (1 to 30).map(i => s"w$i").mkString(" ")
    val other = (1 to 30).map(i => s"z$i").mkString(" ")
    val docs = Seq((1L, words), (2L, words), (3L, other))
      .toDF("doc_id", "text")
    val got = Dedup.minhashEval(docs, "doc_id", "text").collect()
    assert(got.length == 1, got.toSeq)
    val r = got(0)
    assert(r.getLong(0) == 9L && r.getLong(1) == 1L &&
      r.getDouble(2) == 1.0 && r.getDouble(3) == 1.0 &&
      r.getDouble(4) == 0.0, r)
  }

  test("clusterDiff: new / merged / grown / unchanged hand cases") {
    import spark.implicits._
    val oldAssign = Seq(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L, 5L -> 4L,
      10L -> 10L).toDF("doc_id", "cluster_id")
    val newAssign = Seq(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 6L -> 1L, // doc 6 bridged old 1 and 3
      4L -> 4L, 5L -> 4L, 7L -> 4L,           // old 4 gained doc 7
      8L -> 8L, 9L -> 8L,                     // all-new duplicate pair
      10L -> 10L                              // untouched singleton
    ).toDF("doc_id", "cluster_id")
    val got = Dedup.clusterDiff(oldAssign, newAssign, "doc_id")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    assert(got(1L) == ((4L, 1L, 2L, "merged")), got(1L))
    assert(got(4L) == ((3L, 1L, 1L, "grown")), got(4L))
    assert(got(8L) == ((2L, 2L, 0L, "new")), got(8L))
    assert(got(10L) == ((1L, 0L, 1L, "unchanged")), got(10L))
  }
}
