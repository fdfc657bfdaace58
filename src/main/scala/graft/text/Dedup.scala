package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard.
  *
  * Scale design: exact dedup is one hash aggregate on a digest (map-side
  * combine, no text shuffled). MinHash/LSH turns all-pairs O(n²) similarity
  * into a band-bucket equi-join: signature computation is per-row scalar work
  * (ONE md5 per shingle, then cheap affine permutations); only
  * (doc_id, band_key, signature) rows shuffle — at 100 TB the shuffled bytes
  * are ~1% of the corpus. Hot-key safety: every pair-producing join caps its
  * key fan-out (band-bucket size cap, shingle document-frequency cap) because
  * one degenerate key (boilerplate docs, a stopword shingle) is otherwise
  * quadratic no matter how good the plan shape is. The caps are parameters,
  * mirrored in the DuckDB oracles, and the dropped keys are reportable via
  * `minhashOverflow` / `ngramHotShingles` — no silent truncation.
  */
object Dedup {

  import TextOps.h64Sql

  val NumHashes   = 16
  val NumBands    = 8 // 2 rows per band: high recall for near-dups (J≈0.8 →
  // per-band hit J², any-band ≈ 1-(1-J²)^8 ≈ 0.999); est_jaccard filters the
  // extra low-similarity candidates downstream
  val RowsPerBand: Int = NumHashes / NumBands

  /** Mersenne prime 2^31−1: the minhash permutation modulus. Keeping hashes
    * below 2^31 means every `a·h + b` stays under 2^62, so the affine
    * permutations run in plain 64-bit integer arithmetic — exactly
    * reproducible in any engine (no 128-bit / decimal widening needed).
    * 31-bit minhash space is ample: collision odds within one document's
    * shingle set (~10⁴) are ~10⁻⁵ per permutation. */
  val MinhashP = 2147483647L

  /** Deterministic affine-permutation constants (aᵢ ∈ [1,P), bᵢ ∈ [0,P)) from
    * a fixed-seed SplitMix-style integer sequence. The classic one-hash
    * scheme (Broder '97): instead of k independent expensive hashes per
    * shingle, compute ONE base hash and k cheap universal-family permutations
    * `(aᵢ·h + bᵢ) mod P`. The DuckDB oracle SQL is generated from these same
    * values, so both engines agree by construction. */
  val Perms: IndexedSeq[(Long, Long)] = {
    var x = 0x9E3779B97F4A7C15L
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x >>> 3 }
    (0 until NumHashes).map(_ => (next() % (MinhashP - 1) + 1, next() % MinhashP))
  }

  /** Default hot-bucket cap for the LSH band join: a band bucket larger than
    * this (identical boilerplate across >1000 docs) would contribute
    * >500k pairs on its own; such groups are better served by exact dedup.
    * Dropped buckets are listed by `minhashOverflow`. */
  val DefaultMaxBucket = 1000

  /** Default shingle document-frequency cap for exact n-gram Jaccard: a
    * shingle shared by >100 docs in a scope carries no discriminating signal
    * (it's corpus boilerplate) but costs O(df²) join fan-out. */
  val DefaultMaxDf = 100

  /** Exact dedup groups: digest of normalized text → canonical (min) id +
    * multiplicity. Downstream `keep` = semi-join on (digest, canonical_id). */
  def exactGroups(df: DataFrame, id: String, text: String): DataFrame =
    df.groupBy(md5(lower(trim(col(text)))).as("text_hash"))
      .agg(min(col(id)).as("canonical_id"), count(lit(1)).as("n_dups"))

  /** MinHash signatures over word 3-gram shingles + LSH band keys.
    * Output: id, mh0..mh15, band0..band{NumBands-1}.
    *
    * One md5 per shingle (the irreducible text-hash cost), then 16 affine
    * permutations in 64-bit integer arithmetic — vs 16 md5s per shingle in
    * the naive per-permutation form (16× less hashing, same LSH quality). */
  def minhashSignatures(df: DataFrame, id: String, text: String): DataFrame = {
    val toks = df.select(col(id), TextOps.tokens(col(text)).as("w"))
      .withColumn("sh", TextOps.wordShingles("w", 3))
      .withColumn("bh", expr(s"transform(sh, x -> ${h64Sql("x")} % ${MinhashP}L)"))
    val withMh = (0 until NumHashes).foldLeft(toks) { (d, i) =>
      val (a, b) = Perms(i)
      d.withColumn(s"mh$i",
        expr(s"array_min(transform(bh, h -> (${a}L * h + ${b}L) % ${MinhashP}L))"))
    }
    // band key = h64 of the band's hash tuple: an 8-byte join key instead of
    // a 32-char md5 hex string — 4× narrower shuffle rows in the band join
    val withBands = (0 until NumBands).foldLeft(withMh) { (d, b) =>
      val cols = (RowsPerBand * b until RowsPerBand * (b + 1))
        .map(i => s"cast(mh$i AS STRING)").mkString(", ',', ")
      d.withColumn(s"band$b", expr(TextOps.h64Sql(s"concat($cols)")))
    }
    withBands.drop("w", "sh", "bh")
  }

  /** One row per (doc, band): id, mh (16-element signature array), band_idx,
    * band_key. The signature travels WITH the band row so candidate scoring
    * needs no join back to the signature table. */
  private def bandRows(sig: DataFrame, id: String): DataFrame =
    sig.select(col(id),
      array((0 until NumHashes).map(i => col(s"mh$i")): _*).as("mh"),
      posexplode(array((0 until NumBands).map(b => col(s"band$b")): _*))
        .as(Seq("band_idx", "band_key")))

  /** Drop band rows whose bucket exceeds `maxBucket`: sizes via groupBy
    * (map-side combine, bytes ∝ #buckets) + join — NOT a count window,
    * which would buffer the very bucket the cap exists to drop. */
  private def capBuckets(bands: DataFrame, maxBucket: Int): DataFrame =
    bands.join(
      bands.groupBy("band_idx", "band_key").agg(count(lit(1)).as("bucket_n"))
        .filter(col("bucket_n") <= maxBucket),
      Seq("band_idx", "band_key"))

  /** (id_a, id_b, mh_a, mh_b) → distinct (id_a, id_b, est_jaccard): match
    * count from one zip_with over the two 16-long signature arrays. */
  private def estimatePairs(joined: DataFrame): DataFrame =
    joined.select(col("id_a"), col("id_b"),
      (expr("size(filter(zip_with(mh_a, mh_b, (x, y) -> x = y), v -> v))")
        .cast("double") / NumHashes).as("est_jaccard"))
      .distinct()

  /** LSH candidate pairs: docs sharing any band bucket (bucket ≤ maxBucket),
    * with the MinHash Jaccard estimate (matching hashes / 16).
    *
    * Shape, in shuffle order: bucket sizes, hot-bucket cap (`capBuckets`),
    * in-bucket self-join — signatures ride along, so the old "join the
    * signature table twice" (two extra shuffles of sig) is gone. Dropped
    * buckets: `minhashOverflow` (same cap value).
    *
    * The band frame is persisted: it feeds the size aggregate and both join
    * sides, and recomputing it re-hashes the corpus per consumer. At 100 TB
    * it is ~1% of corpus bytes — exactly the index you'd materialize. The
    * cache entry is freed by Spark's ContextCleaner once the result plan is
    * dropped (MEMORY_AND_DISK also evicts LRU under pressure); long-lived
    * sessions doing many dedup passes should materialize the band index to
    * a table instead. */
  def minhashCandidates(sig: DataFrame, id: String,
                        maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val bands = bandRows(sig, id)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ok = capBuckets(bands, maxBucket)
    estimatePairs(
      ok.as("a").join(ok.as("b"),
          col("a.band_idx") === col("b.band_idx") &&
            col("a.band_key") === col("b.band_key") &&
            col(s"a.$id") < col(s"b.$id"))
        .select(col(s"a.$id").as("id_a"), col(s"b.$id").as("id_b"),
          col("a.mh").as("mh_a"), col("b.mh").as("mh_b")))
  }

  /** Incremental LSH candidates: near-dup pairs between a NEW batch and an
    * existing corpus, plus pairs within the new batch — but never
    * corpus × corpus pairs, which were found when the corpus was built. This
    * is the daily-refresh path at scale: the corpus side is the materialized
    * signature index (store `minhashSignatures` output partitioned/bucketed
    * by band key and read it back), so each refresh costs O(|new batch| +
    * touched buckets), not a re-pair of the full corpus.
    *
    * Pair shape: one side of the join is restricted to new-batch band rows;
    * corpus×new pairs emit in either orientation (normalized via
    * least/greatest), new×new pairs dedup on id order. The bucket cap counts
    * BOTH sides — a new doc landing in an already-hot corpus bucket must not
    * re-trigger the quadratic fan-out the cap exists to stop. Cache
    * lifecycle: as in `minhashCandidates` (ContextCleaner + LRU eviction;
    * materialize the index for long refresh loops). */
  def incrementalCandidates(corpusSig: DataFrame, newSig: DataFrame, id: String,
                            maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val all = bandRows(corpusSig, id).withColumn("is_new", lit(false))
      .union(bandRows(newSig, id).withColumn("is_new", lit(true)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ok = capBuckets(all, maxBucket)
    estimatePairs(
      ok.as("a").join(ok.filter(col("is_new")).as("b"),
          col("a.band_idx") === col("b.band_idx") &&
            col("a.band_key") === col("b.band_key") &&
            col(s"a.$id") =!= col(s"b.$id") &&
            (!col("a.is_new") || col(s"a.$id") < col(s"b.$id")))
        .select(least(col(s"a.$id"), col(s"b.$id")).as("id_a"),
          greatest(col(s"a.$id"), col(s"b.$id")).as("id_b"),
          col("a.mh").as("mh_a"), col("b.mh").as("mh_b")))
  }

  /** Band buckets the candidate join drops at `maxBucket`: (band_idx,
    * band_key, bucket_n). Emit/log this alongside minhashCandidates — the
    * members of a mega-bucket are near-identical boilerplate and should be
    * routed to exact dedup, not silently ignored. */
  def minhashOverflow(sig: DataFrame, id: String,
                      maxBucket: Int = DefaultMaxBucket): DataFrame =
    bandRows(sig, id)
      .groupBy("band_idx", "band_key")
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > maxBucket && col("band_key").isNotNull)

  /** 32-bit SimHash over word unigram hashes: bit j set when at least half
    * the token hashes have bit j set (Charikar, STOC'02). One md5 per token,
    * then a single fused native loop (graft.expressions.SimHash) — the HOF
    * reference formulation `simhashHof` computes the identical value with 32
    * interpreted aggregate passes and exists as the cross-check. */
  def simhash(df: DataFrame, id: String, text: String): DataFrame = {
    graft.expressions.SimHash.register(df.sparkSession)
    df.select(col(id), TextOps.tokens(col(text)).as("w"))
      .withColumn("hs", expr(s"transform(w, t -> ${h64Sql("t")})"))
      .select(col(id), expr("graft_simhash(hs)").as("simhash"))
  }

  /** Reference HOF formulation of simhash (one aggregate per bit) — kept for
    * the DedupSpec equivalence check against the native expression; do not
    * use in hot paths. */
  def simhashHof(df: DataFrame, id: String, text: String): DataFrame = {
    val toks = df.select(col(id), TextOps.tokens(col(text)).as("w"))
      .withColumn("hs", expr(s"transform(w, t -> ${h64Sql("t")})"))
      .withColumn("n", size(col("w")))
    val bits: Column = (0 until 32).map { j =>
      when(expr(s"2 * aggregate(hs, 0L, (acc, h) -> acc + (shiftright(h, $j) & 1)) >= n"),
        lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    toks.withColumn("simhash", bits).drop("w", "hs", "n")
  }

  /** Exact n-gram Jaccard similarity for pairs within a scope column (e.g.
    * same source/bucket): explode distinct shingles, self-join per scope,
    * |A∩B| / |A∪B| with exact per-doc set sizes.
    *
    * Hot-shingle safety: shingles with document frequency above `maxDf`
    * inside a scope are dropped BEFORE the self-join — a shingle in df docs
    * fans out O(df²) pairs, and high-df shingles ("of the") carry no
    * discriminating signal (standard near-dup practice; mirrored in the
    * oracle). df=1 shingles are also dropped — they cannot form a pair, so
    * this is pure pruning. Union sizes |A|,|B| are computed on the FULL
    * shingle sets, so the Jaccard denominator is exact; only the
    * intersection count can undercount, by at most the dropped-shingle
    * overlap. `ngramHotShingles` lists what was dropped. Full-corpus use
    * should feed LSH candidates instead of a scope column. */
  def ngramJaccard(df: DataFrame, id: String, text: String, scope: String,
                   n: Int, minJaccard: Double,
                   maxDf: Int = DefaultMaxDf): DataFrame = {
    val grams = ngrams(df, id, text, scope, n)
    val sizes = grams.groupBy(col(id)).agg(count(lit(1)).as("n_g"))
    val dfreq = grams.groupBy(col(scope), col("g")).agg(count(lit(1)).as("ndoc"))
    val keep = grams.join(dfreq.filter(col("ndoc").between(2, maxDf)), Seq(scope, "g"))
    val inter = keep.as("a").join(keep.as("b"),
        col("a.g") === col("b.g") && col(s"a.$scope") === col(s"b.$scope") &&
          col(s"a.$id") < col(s"b.$id"))
      .groupBy(col(s"a.$id").as("id_a"), col(s"b.$id").as("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.as("na"), col("id_a") === col(s"na.$id"))
      .join(sizes.as("nb"), col("id_b") === col(s"nb.$id"))
      .select(col("id_a"), col("id_b"),
        round(col("n_inter").cast("double") /
          (col("na.n_g") + col("nb.n_g") - col("n_inter")), 6).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Shingles the Jaccard join drops at `maxDf`: (scope, g, ndoc). Human-
    * facing report, so g stays the readable string (the join path hashes). */
  def ngramHotShingles(df: DataFrame, id: String, text: String, scope: String,
                       n: Int, maxDf: Int = DefaultMaxDf): DataFrame =
    df.select(col(id), col(scope), TextOps.tokens(col(text)).as("w"))
      .withColumn("g", explode(array_distinct(TextOps.wordShingles("w", n))))
      .groupBy(col(scope), col("g")).agg(count(lit(1)).as("ndoc"))
      .filter(col("ndoc") > maxDf)

  /** Dedup clusters: connected components over candidate near-dup pairs.
    * Every doc is labeled with the minimum doc id reachable through the
    * pair graph (`cluster_id`), plus the cluster size and a `keep` flag
    * (1 on the canonical min-id member) — the final step of a dedup
    * pipeline: pairs → clusters → keep one representative per cluster.
    *
    * Algorithm: iterative min-label propagation. Each round every vertex
    * adopts the minimum label among itself and its neighbors; converged when
    * no label changes (checked with a driver-side scalar count — the data
    * never leaves the cluster). Rounds = eccentricity of the min vertex
    * within its component; LSH components are unions of band-bucket cliques,
    * so chains are short and convergence is a handful of rounds. Per round
    * the shuffle carries (vertex, label) pairs — 16 bytes per doc — plus the
    * edge list. Each round's label set is persisted eagerly and the previous
    * round's is explicitly unpersisted, so at most two label copies are live;
    * each round reads the previous round's in-memory relation, so lineage
    * stays shallow (use reliable `checkpoint` on a cluster where executor
    * loss must be recoverable). For adversarial path-shaped graphs the
    * alternating large-star/small-star formulation (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14) converges in
    * O(log²) rounds with the same per-round shape.
    *
    * `docs` supplies the vertex universe, so docs with no near-dup pair come
    * out as singleton clusters (keep = 1).
    *
    * `maxRounds` bounds the driver loop: a path-shaped component needs one
    * round per hop, so a pathological 10⁵-hop chain would otherwise spin
    * 10⁵ shuffle rounds. Non-convergence throws (silently stopping would
    * return WRONG cluster ids) — components deeper than the cap need the
    * large-star/small-star formulation, not a bigger cap. */
  def dedupClusters(docs: DataFrame, pairs: DataFrame, id: String,
                    idA: String = "id_a", idB: String = "id_b",
                    maxRounds: Int = 100): DataFrame = {
    val edges = pairs.select(col(idA).as("v"), col(idB).as("u"))
      .union(pairs.select(col(idB).as("v"), col(idA).as("u")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cached = docs.select(col(id).as("v")).distinct()
      .withColumn("lbl", col("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = cached
    var changed = 1L
    var rounds = 0
    while (changed > 0) {
      if (rounds >= maxRounds)
        throw new IllegalStateException(
          s"dedupClusters: not converged after $maxRounds rounds — a component " +
            "deeper than the cap exists; use large-star/small-star for such graphs")
      val nbrMin = edges
        .join(labels.select(col("v").as("u"), col("lbl").as("ulbl")), "u")
        .groupBy("v").agg(min("ulbl").as("nmin"))
      val next = labels.join(nbrMin, Seq("v"), "left_outer")
        .select(col("v"), col("lbl"),
          least(col("lbl"), coalesce(col("nmin"), col("lbl"))).as("nlbl"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      changed = next.filter(col("nlbl") =!= col("lbl")).count() // materializes next
      cached.unpersist() // next is live; cap label-set copies at two
      cached = next
      labels = next.select(col("v"), col("nlbl").as("lbl"))
      rounds += 1
    }
    edges.unpersist()
    val sizes = labels.groupBy("lbl").agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "lbl")
      .select(col("v").as(id), col("lbl").as("cluster_id"), col("cluster_size"),
        (col("v") === col("lbl")).cast("int").as("keep"))
  }

  /** Distinct shingles per doc, hashed to 60-bit longs: the join/groupBy key
    * is 8 bytes instead of an n-word string (shuffle bytes ∝ key width; the
    * distinct-THEN-hash order keeps per-doc set sizes exact regardless of
    * hash collisions, and both engines hash identically so results agree). */
  private def ngrams(df: DataFrame, id: String, text: String, scope: String,
                     n: Int): DataFrame =
    df.select(col(id), col(scope), TextOps.tokens(col(text)).as("w"))
      .withColumn("g", explode(array_distinct(TextOps.wordShingles("w", n))))
      .select(col(id), col(scope), expr(TextOps.h64Sql("g")).as("g"))
}
