package graft.queries

import graft.Tables
import graft.sim.Similarity
import graft.text.{Curate, Dedup, Mix, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data-pipeline extension operators (builder prompt: dedup,
  * similarity search, text analysis, multimodal plumbing), oracle-checked
  * over `documents` / `embeddings`.
  *
  * Hash-bearing results (minhash/simhash/fingerprints) use the md5-derived
  * 60-bit `TextOps.h64`, reproducible in DuckDB — so even hash-based
  * operators get full value-level oracle checks, not just row counts.
  */
object ExtensionQueries {
  type Q = (SparkSession, String) => DataFrame

  private val NPlanes = 8
  private val Dim     = 64

  // Fixed closed-form PQ codebook + query vector (q113b): both sides of the
  // oracle regenerate them from the same integer arithmetic, so the encode
  // and ADC stages get full value-level checks with training excluded.
  private val PqM = 4; private val PqKsub = 4; private val PqDsub = Dim / PqM
  private val FixedCodebook: Array[Array[Array[Double]]] =
    Array.tabulate(PqM, PqKsub, PqDsub)((s, c, i0) =>
      ((s * 131 + c * 37 + (i0 + 1) * 17) % 19 - 9) / 10.0)
  private val FixedQuery: Seq[Double] =
    (1 to Dim).map(j => ((j * 13) % 7 - 3) / 5.0)

  /** Scratch directory for stored-index round-trip queries, deleted
    * recursively at JVM exit — repeated verify/bench runs must not
    * accumulate orphaned index trees in /tmp. */
  private[queries] def scratchDir(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      if (Files.exists(dir))
        Files.walk(dir).sorted(Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p))
    }))
    dir.toString
  }

  // ─────────────────────────── shared fixture recipes ──
  // Each build below is the deterministic starting state of SEVERAL
  // catalog queries; [[Fixtures]] memoizes it per (key, data dir) so the
  // expensive Spark build runs once per JVM — read-only consumers share
  // the directory, mutating consumers (delete / fold / recluster) get a
  // file-tree copy. A recipe's key must fully determine its build.

  /** Lexical index, base on doc_id %5≠4, delta %5=4 appended as batch 0
    * — the q323 layout, starting state of q333/q336/q340/q344/q345. */
  private def buildLex5(s: SparkSession, d: String)(dir: String): Unit = {
    val docs = Tables.documents(s, d)
    graft.text.LexIndex.writeIndex(docs.filter(col("doc_id") % 5 =!= 4),
      "doc_id", "text", dir)
    graft.text.LexIndex.appendBatch(docs.filter(col("doc_id") % 5 === 4),
      "doc_id", "text", dir, batchId = 0L)
  }

  /** Lexical index over the FULL corpus, single shot (q324/q327). */
  private def buildLexFull(s: SparkSession, d: String)(dir: String): Unit =
    graft.text.LexIndex.writeIndex(Tables.documents(s, d), "doc_id",
      "text", dir)

  /** Lexical index, base on doc_id %10≠0 with TWO appended batches
    * (%20=0 as 0, %20=10 as 1) — the lifecycle-capstone starting state
    * (q329/q339). */
  private def buildLex10(s: SparkSession, d: String)(dir: String): Unit = {
    val docs = Tables.documents(s, d)
    graft.text.LexIndex.writeIndex(docs.filter(col("doc_id") % 10 =!= 0),
      "doc_id", "text", dir)
    graft.text.LexIndex.appendBatch(docs.filter(col("doc_id") % 20 === 0),
      "doc_id", "text", dir, 0L)
    graft.text.LexIndex.appendBatch(docs.filter(col("doc_id") % 20 === 10),
      "doc_id", "text", dir, 1L)
  }

  /** IVF index under the FULL corpus's label centroids: base written
    * from vec_id %10≠0, the delta appended frozen — the q312 layout,
    * also read by q320/q337 and copied by q318's recluster. */
  private def buildIvf90(s: SparkSession, d: String)(dir: String): Unit = {
    val e = Tables.embeddings(s, d)
    val cents = Similarity.ivfCentroids(e, "label", "embedding")
    Similarity.writeIvfIndex(
      Similarity.ivfAssign(e.filter(col("vec_id") % 10 =!= 0), "vec_id",
        "embedding", cents), cents, dir)
    Similarity.appendIvfBatch(e.filter(col("vec_id") % 10 === 0),
      "vec_id", "embedding", dir)
  }

  /** IVF index over the full corpus, single shot (q324/q327). */
  private def buildIvfFull(s: SparkSession, d: String)(dir: String): Unit = {
    val e = Tables.embeddings(s, d)
    val cents = Similarity.ivfCentroids(e, "label", "embedding")
    Similarity.writeIvfIndex(
      Similarity.ivfAssign(e, "vec_id", "embedding", cents), cents, dir)
  }

  /** Streaming-layout ANN store: base on vec_id %10≠0 under its own
    * label centroids, the delta as increment batch 0 — the compaction /
    * delete / audit starting state (q326/q334/q342). */
  private def buildSann1(s: SparkSession, d: String)(dir: String): Unit = {
    val e = Tables.embeddings(s, d)
    graft.streaming.StreamingAnn.writeBaseIndex(
      e.filter(col("vec_id") % 10 =!= 0), "vec_id", "embedding", "label", dir)
    Similarity.ivfAssign(e.filter(col("vec_id") % 10 === 0), "vec_id",
        "embedding", s.read.parquet(s"$dir/centroids"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$dir/increments/batch=0")
  }

  /** Streaming-layout ANN store with TWO frozen increments (%20=0 as 0,
    * %20=10 as 1) — the lifecycle-capstone vector side (q329/q339). */
  private def buildSann2(s: SparkSession, d: String)(dir: String): Unit = {
    val e = Tables.embeddings(s, d)
    graft.streaming.StreamingAnn.writeBaseIndex(
      e.filter(col("vec_id") % 10 =!= 0), "vec_id", "embedding", "label", dir)
    val frozen = s.read.parquet(s"$dir/centroids")
    Similarity.ivfAssign(e.filter(col("vec_id") % 20 === 0), "vec_id",
        "embedding", frozen)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$dir/increments/batch=0")
    Similarity.ivfAssign(e.filter(col("vec_id") % 20 === 10), "vec_id",
        "embedding", frozen)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$dir/increments/batch=1")
  }

  /** Flat PQ code table under the closed-form frozen codebook: base on
    * vec_id %10≠0, delta appended as batch 0 (q330/q331/q335/q341). */
  private def buildPq1(s: SparkSession, d: String)(dir: String): Unit = {
    val e = Tables.embeddings(s, d)
    graft.sim.PqIndex.writeIndex(e.filter(col("vec_id") % 10 =!= 0),
      "vec_id", "embedding", FixedCodebook, dir)
    graft.sim.PqIndex.appendBatch(e.filter(col("vec_id") % 10 === 0),
      "vec_id", "embedding", dir, 0L)
  }

  /** IVF-PQ posting lists over the full corpus (q332; q341 composes it
    * with the flat table under one root, as a real deployment would). */
  private def buildIvfPq(s: SparkSession, d: String)(dir: String): Unit =
    graft.sim.PqIndex.writeIvfPq(Tables.embeddings(s, d), "vec_id",
      "embedding", "label", FixedCodebook, dir)

  /** Stored MinHash signature index: base on doc_id %5≠4, delta appended
    * as batch 0 — ONE signature pass feeds both (lazy cut), q343/q350. */
  private def buildSig1(s: SparkSession, d: String)(dir: String): Unit = {
    val sig = graft.ops.Checkpoint.cut(
      Dedup.minhashSignatures(Tables.documents(s, d), "doc_id", "text"),
      eager = false)
    Dedup.writeSignatureIndex(sig.filter(col("doc_id") % 5 =!= 4),
      "doc_id", dir)
    Dedup.appendSignatureIndex(sig.filter(col("doc_id") % 5 === 4),
      "doc_id", dir, 0L)
  }

  /** Stored graph-ANN index: base on vec_id %10≠0, delta appended as
    * batch 0 (q346/q348; q347 copies and deletes). */
  private def buildGraph1(s: SparkSession, d: String)(dir: String): Unit = {
    val e = Tables.embeddings(s, d)
    graft.sim.GraphAnnIndex.writeIndex(e.filter(col("vec_id") % 10 =!= 0),
      "vec_id", "embedding", Dim, dir)
    graft.sim.GraphAnnIndex.appendBatch(e.filter(col("vec_id") % 10 === 0),
      "vec_id", "embedding", dir, 0L)
  }

  val queries: Map[String, Q] = Map(
    // ── exact dedup: digest → canonical id + multiplicity
    "q24_dedup_exact" -> ((s, d) =>
      Dedup.exactGroups(Tables.documents(s, d), "doc_id", "text")),

    // ── token counting (whitespace + BPE-ish regex)
    "q25_token_stats" -> ((s, d) =>
      TextOps.tokenStats(Tables.documents(s, d), "text")
        .select("doc_id", "ws_tokens", "bpe_tokens", "avg_token_len")),

    // ── quality scoring (punct/stopword/upper ratios + logistic composite)
    "q26_quality" -> ((s, d) =>
      TextOps.qualityScore(Tables.documents(s, d), "text")
        .select("doc_id", "punct_ratio", "stop_ratio", "upper_ratio", "quality_score")),

    // ── language-ID heuristic (stopword vote)
    "q27_lang_id" -> ((s, d) =>
      TextOps.languageId(Tables.documents(s, d), "text", "lang_pred")
        .select("doc_id", "lang_pred")),

    // ── language-ID eval: per-class precision/recall/F1 of the stopword
    //    heuristic against the labeled lang column — the measured error
    //    profile behind any lang-filtered curation decision
    "q305_langid_eval" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val j = docs.select(col("doc_id"), col("lang"))
        .join(TextOps.languageId(docs, "text", "lang_pred")
          .select(col("doc_id"), col("lang_pred")), "doc_id")
      val byTrue = j.groupBy(col("lang").as("label"))
        .agg(count(lit(1)).as("n_true"),
          sum((col("lang") === col("lang_pred")).cast("long"))
            .as("n_correct"))
      val byPred = j.groupBy(col("lang_pred").as("label"))
        .agg(count(lit(1)).as("n_pred"))
      byTrue.join(byPred, Seq("label"), "full_outer")
        .select(col("label"),
          coalesce(col("n_true"), lit(0L)).as("n_true"),
          coalesce(col("n_pred"), lit(0L)).as("n_pred"),
          coalesce(col("n_correct"), lit(0L)).as("n_correct"))
        .withColumn("_p", when(col("n_pred") > 0,
          col("n_correct").cast("double") / col("n_pred")))
        .withColumn("_r", when(col("n_true") > 0,
          col("n_correct").cast("double") / col("n_true")))
        .select(col("label"), col("n_true"), col("n_pred"),
          col("n_correct"), round(col("_p"), 6).as("precision"),
          round(col("_r"), 6).as("recall"),
          round(when(col("_p").isNotNull && col("_r").isNotNull &&
              col("_p") + col("_r") > 0,
            lit(2) * col("_p") * col("_r") / (col("_p") + col("_r"))), 6)
            .as("f1"))
    }),

    // ── MinHash signatures + LSH band keys
    "q28_minhash_sig" -> ((s, d) =>
      Dedup.minhashSignatures(Tables.documents(s, d), "doc_id", "text")),

    // ── LSH candidate pairs with Jaccard estimate
    "q29_minhash_pairs" -> ((s, d) =>
      Dedup.minhashCandidates(
        Dedup.minhashSignatures(Tables.documents(s, d), "doc_id", "text"), "doc_id")),

    // ── 32-bit SimHash
    "q30_simhash" -> ((s, d) =>
      Dedup.simhash(Tables.documents(s, d), "doc_id", "text")),

    // ── exact 2-gram Jaccard within source scope (hot-shingle df cap 100)
    "q31_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccard(Tables.documents(s, d), "doc_id", "text", "source", 2, 0.05,
        maxDf = Dedup.DefaultMaxDf)),

    // ── asymmetric containment |A∩B|/|A| — the quote/subset detector the
    //    symmetric Jaccard misses
    "q244_containment" -> ((s, d) =>
      Dedup.ngramContainment(Tables.documents(s, d), "doc_id", "text",
        "source", 2, 0.3, maxDf = Dedup.DefaultMaxDf)),

    // ── winnowing fingerprint
    "q32_fingerprint" -> ((s, d) =>
      TextOps.fingerprint(Tables.documents(s, d), "text")
        .select("doc_id", "n_grams", "fingerprint")),

    // ── brute-force cosine top-5 (exact ANN baseline)
    "q33_knn_brute" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.knnBrute(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
    }),

    // ── LSH bucket assignment (sign random projection; native fused loop,
    //    bit-identical to the composed form the oracle mirrors)
    "q34_lsh_buckets" -> ((s, d) =>
      Tables.embeddings(s, d)
        .select(col("vec_id"), Similarity.asDouble("embedding").as("v"))
        .withColumn("bucket",
          Similarity.lshBucketNative(s, "v", Similarity.hyperplanes(NPlanes, Dim)))
        .select("vec_id", "bucket")),

    // ── ANN top-3 within LSH bucket
    "q35_ann_lsh" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.annLsh(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", 3, NPlanes, Dim)
    }),

    // ── per-label centroids, long form (exact decimal sums over rounded dims)
    "q36_centroids" -> ((s, d) =>
      Tables.embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .select(col("label"), (col("pos") + 1).as("dim"),
          round(col("x").cast("double"), 6).as("xr"))
        .groupBy("label", "dim")
        .agg((sum(col("xr").cast(graft.ops.Relational.ExactDec)).cast("double") /
          count(lit(1))).as("centroid"), count(lit(1)).as("n"))),

    // ── embedding-cosine near-dup pairs (LSH candidates, exact filter)
    "q47_embed_neardup" -> ((s, d) =>
      Similarity.cosineNearDupPairs(Tables.embeddings(s, d), "vec_id", "embedding",
        0.25, NPlanes, Dim)),

    // ── SemDeDup: coarse-cluster assignment + intra-cluster cosine prune
    "q92_semdedup" -> ((s, d) =>
      Similarity.semDedup(Tables.embeddings(s, d), "vec_id", "embedding", 8, 0.35)),

    // ── graph ANN (NSW/HNSW family): two-layer degree-capped
    //    bidirectional neighbor graph (3 fine LSH tables + coarse long
    //    links over a 1/16 hub subsample), then 6 rounds of relational
    //    beam search. Fully deterministic (rounded cosine, id
    //    tie-breaks), so the oracle replays the graph build and every
    //    search round with unrolled SQL
    "q172_graph_ann" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.annGraph(e, e.filter(col("vec_id") < 10), "vec_id",
        "embedding", Dim, k = 5)
    }),

    // ── graph ANN served off the STORED/MAINTAINED graph: base on 90%,
    //    delta appended (the touched bucket groups restate over the live
    //    membership, reproducing the from-scratch graph edge for edge),
    //    then the SHARED beam-search tail — value-identical to q172's
    //    in-memory annGraph over everything ingested (SHARED oracle)
    "q346_graph_ann_indexed" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val dir = Fixtures.shared("graph1", d)(buildGraph1(s, d))
      graft.sim.GraphAnnIndex.search(s, dir, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5)
    }),

    // ── GRAPH TAKEDOWN: delete every vec_id ≡ 3 mod 7 from the stored
    //    graph — the touched bucket groups restate over the LIVE
    //    membership, so the maintained search equals a from-scratch
    //    graph over the filtered corpus EXACTLY (deleted vectors stop
    //    competing for degree slots, not just stop being returned).
    //    Stage 'tombstoned' searches before any fold; stage 'erased'
    //    after compactIndex physically removed the rows
    "q347_graph_delete" -> ((s, d) => {
      import graft.sim.GraphAnnIndex
      val e = Tables.embeddings(s, d)
      val dir = Fixtures.mutableCopy("graph1", d)(buildGraph1(s, d))
      GraphAnnIndex.deleteBatch(
        e.filter(col("vec_id") % 7 === 3).select("vec_id"), dir, 1L)
      val q = e.filter(col("vec_id") < 10 && col("vec_id") % 7 =!= 3)
      val tombstoned = GraphAnnIndex.search(s, dir, q, "vec_id",
          "embedding", k = 5)
        .withColumn("stage", lit("tombstoned"))
        .transform(graft.ops.Checkpoint.cut(_, eager = true)) // eager: pin the pre-compaction read
      GraphAnnIndex.compactIndex(s, dir)
      tombstoned.unionByName(
        GraphAnnIndex.search(s, dir, q, "vec_id", "embedding", k = 5)
          .withColumn("stage", lit("erased")))
    }),

    // ── GRAPH BUCKET-OCCUPANCY DRIFT: the frozen LSH geometry's aging
    //    monitor (q331's contract on the graph axis) — per layer, the L1
    //    between the base's and the live increments' bucket-occupancy
    //    distributions, from the stored bucket columns alone. The oracle
    //    recomputes both distributions with the same closed-form plane
    //    buckets and the same decimal-quantized arithmetic
    "q348_graph_bucket_drift" -> ((s, d) =>
      graft.sim.GraphAnnIndex.bucketDrift(s,
        Fixtures.shared("graph1", d)(buildGraph1(s, d)))),

    // ── FILTERED search over the STORED GRAPH — q337's "search within a
    //    tenant" contract on the graph axis: the vec_id ≡ 0 mod 3
    //    predicate applies INSIDE the beam (excluded vectors neither rank
    //    nor navigate — the beam runs over the induced survivor
    //    subgraph), never as a post-filter of an unfiltered top-k. The
    //    oracle rebuilds the full graph and replays the beam with every
    //    candidate/entry restricted to survivors
    "q349_graph_filtered" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val dir = Fixtures.shared("graph1", d)(buildGraph1(s, d))
      graft.sim.GraphAnnIndex.searchFiltered(s, dir,
        e.filter(col("vec_id") < 10), "vec_id", "embedding",
        col("vec_id") % 3 === 0, k = 5)
    }),

    // ── FILTERED search over the MAINTAINED streaming-layout store —
    //    q337's tenant contract on the StreamingAnn axis: the predicate
    //    applies inside the probed posting lists (base 90% under its own
    //    label quantizer + the delta increment), composed with the cell
    //    partition pruning; routing stays unfiltered
    "q354_sann_filtered" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val dir = Fixtures.shared("sann1", d)(buildSann1(s, d))
      graft.streaming.StreamingAnn.searchFiltered(s, dir,
        e.filter(col("vec_id") < 10), "vec_id", "embedding",
        col("vec_id") % 3 === 0, k = 3, nProbe = 2)
    }),

    // ── BAND-OCCUPANCY DRIFT of the stored signature index — the aging
    //    monitor for the dedup family (q331's contract on the MinHash
    //    axis): per band, the L1 between the base's and the live
    //    increments' bucket-occupancy distributions, from the stored band
    //    rows alone. The oracle recomputes both distributions from the
    //    corpus with the shared MinHash replay and the same
    //    decimal-quantized arithmetic
    "q353_band_drift" -> ((s, d) =>
      Dedup.bandOccupancyDrift(s, Fixtures.shared("sig1", d)(buildSig1(s, d)))),

    // ── FILTERED search on the COMPRESSED tier — q337's tenant contract
    //    on the PQ axis: the vec_id ≡ 0 mod 3 predicate applies inside
    //    the 16 B/row code scan (before the LUT join), so excluded
    //    vectors never score. Oracle replays the closed-form encode + ADC
    //    over the survivors only
    "q351_pq_filtered" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val dir = Fixtures.shared("pq1", d)(buildPq1(s, d))
      graft.sim.PqIndex.searchFiltered(s, dir, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", col("vec_id") % 3 === 0, k = 5)
    }),

    // ── FILTERED IVF-PQ search — the tenant predicate composed with the
    //    cell routing: partition-pruned probe, then the predicate inside
    //    the probed posting lists, then the LUT ADC over survivors only
    "q352_ivfpq_filtered" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val dir = Fixtures.shared("ivfpq", d)(buildIvfPq(s, d))
      graft.sim.PqIndex.searchIvfPqFiltered(s, dir,
        e.filter(col("vec_id") < 10), "vec_id", "embedding",
        col("vec_id") % 3 === 0, k = 5, nProbe = 2)
    }),

    // ── FILTERED graph search, HUBLESS-TENANT arm: the predicate
    //    (vec_id ≡ 1 mod 16) excludes every hub node, so entry points
    //    fall back to the lowest-id survivors — without the fallback the
    //    beam would have zero entries and return nothing for this tenant
    "q355_graph_filtered_nohub" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val dir = Fixtures.shared("graph1", d)(buildGraph1(s, d))
      graft.sim.GraphAnnIndex.searchFiltered(s, dir,
        e.filter(col("vec_id") < 10), "vec_id", "embedding",
        col("vec_id") % 16 === 1, k = 5)
    }),

    // ── GRAPH DRIFT-TRIGGERED REBUILD: the monitor→act loop on the graph
    //    axis (IVF reclusterIfDrifted / PQ retrainIndexIfDrifted's
    //    contract) — the 10% delta increment always drifts the bucket
    //    occupancy above 0, so the trigger retires the frozen epoch-0 LSH
    //    geometry and rebuilds vectors+edges from the live membership
    //    under the epoch-1 plane matrix (nGroups re-derived). The oracle
    //    replays the ENTIRE epoch-1 from-scratch graph build and beam —
    //    only a real rebuild at the new geometry can match it
    "q356_graph_rebuild" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val dir = Fixtures.mutableCopy("graph1", d)(buildGraph1(s, d))
      require(graft.sim.GraphAnnIndex.rebuildIfDrifted(s, dir,
        maxDrift = 0.0), "the delta increment must breach a 0.0 threshold")
      graft.sim.GraphAnnIndex.search(s, dir, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5)
    }),

    // ── FILTERED graph search, LOW-SELECTIVITY BRUTE arm: the tenant
    //    (vec_id < 32, ~2% of the corpus) survives with at most
    //    bruteThreshold vectors, so the engine drops the beam and runs
    //    exact brute cosine over the filtered corpus — recall over a tiny
    //    tenant no longer depends on the induced subgraph staying
    //    navigable. The oracle is plain brute top-k over the survivors
    "q357_graph_filtered_brute" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val dir = Fixtures.shared("graph1", d)(buildGraph1(s, d))
      graft.sim.GraphAnnIndex.searchFiltered(s, dir,
        e.filter(col("vec_id") < 10), "vec_id", "embedding",
        col("vec_id") < 32, k = 5, bruteThreshold = 64)
    }),

    // ── FILTERED IVF-PQ search, LOW-SELECTIVITY BRUTE arm: same tenant —
    //    the cell routing is dropped and the LUT ADC runs over every
    //    surviving code (the flat-PQ exact scan), so the tenant's recall
    //    no longer depends on its vectors landing in the probed cells.
    //    Oracle: the closed-form encode + ADC replay over the survivors
    "q358_ivfpq_filtered_brute" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val dir = Fixtures.shared("ivfpq", d)(buildIvfPq(s, d))
      graft.sim.PqIndex.searchIvfPqFiltered(s, dir,
        e.filter(col("vec_id") < 10), "vec_id", "embedding",
        col("vec_id") < 32, k = 5, nProbe = 2, bruteThreshold = 64)
    }),

    // ── DEDUP-INDEX DRIFT-TRIGGERED REBUILD: the monitor→act loop on
    //    the dedup axis (q356's contract) — the %5=4 increment always
    //    drifts the band occupancy above 0, so the trigger folds base ∪
    //    increment into ONE new base at the deriveBuckets width
    //    (min-clamped to the 256 default at these corpus sizes) and
    //    re-baselines the monitor. The oracle replays the from-scratch
    //    layout over the FULL corpus — per-(band, bucket) counts only a
    //    real fold at the derived width can match, and only from the
    //    BASE alone (an unfolded increment would leave the base short)
    "q359_sig_rebuild" -> ((s, d) => {
      val dir = Fixtures.mutableCopy("sig1", d)(buildSig1(s, d))
      require(Dedup.rebuildSignatureIndexIfDrifted(s, dir, maxDrift = 0.0),
        "the %5=4 increment must breach a 0.0 threshold")
      graft.streaming.Compaction.view(s, dir)
        .readBase(Seq("band_idx", "bucket"), "bands").get
        .groupBy("band_idx", "bucket").agg(count(lit(1)).as("n_rows"))
    }),

    // ── FLEET DRIFT SWEEP: one maintenance campaign across ALL FIVE
    //    families (q350's contract on the keep-it-healthy axis) — every
    //    family's own monitor breaches at 0.0 against its delta
    //    increment, so the sweep rebuilds all five under their fresh
    //    geometry/layout and RETURNS the per-family outcomes (checked
    //    here). The oracle pins the post-sweep bases: each family's BASE
    //    alone must own its full live membership — corpus-derived counts
    //    only a fleet-wide fold-and-rebuild can satisfy
    "q361_drift_sweep" -> ((s, d) => {
      import graft.streaming.{Compaction, Maintenance, Takedown}
      // five independent fixture copies (shared builds memoize under the
      // Fixtures lock; the tree copies themselves overlap)
      val Seq(lexD, annD, pqD, dedupD, graphD) =
        graft.ops.Par.map(Seq[(String, String => Unit)](
          "lex5" -> buildLex5(s, d), "sann1" -> buildSann1(s, d),
          "pq1" -> buildPq1(s, d), "sig1" -> buildSig1(s, d),
          "graph1" -> buildGraph1(s, d))) { case (k, b) =>
          Fixtures.mutableCopy(k, d)(b)
        }
      val t = Takedown.Targets(lex = Some(lexD), ann = Some(annD),
        pq = Some(pqD), dedup = Some(dedupD), graph = Some(graphD))
      val acted = Maintenance.driftSweep(s, t,
        Maintenance.DriftPolicy(lexGrowthFrac = 0.0, annMaxDrift = 0.0,
          pqMaxL1 = 0.0, dedupMaxDrift = 0.0, graphMaxDrift = 0.0),
        Some(Maintenance.PqRetrain(Tables.embeddings(s, d), "vec_id",
          "embedding", m = PqM, ksub = PqKsub)))
      require(acted.size == 5 && acted.values.forall(identity),
        s"every family must breach and act; got $acted")
      def baseRows(root: String, name: String, idCol: String): Long =
        Compaction.view(s, root).readBase(Seq(idCol), name).get.count()
      val rows = Seq(
        ("lex", baseRows(s"${t.lex.get}/postings", "base", "doc_id")),
        ("ann", baseRows(t.ann.get, "base", "vec_id")),
        ("pq", baseRows(Compaction.view(s, t.pq.get).dirOrLegacy("codes"),
          "base", "vec_id")),
        ("dedup", baseRows(t.dedup.get, "bands", "doc_id")),
        ("graph", baseRows(s"${t.graph.get}/vectors", "base", "vec_id")))
      import s.implicits._
      rows.map { case (f, n) => (f, 1, n) }
        .toDF("family", "acted", "base_rows")
    }),

    // ── LEXICAL-INDEX DRIFT-TRIGGERED REBUILD: the monitor→act loop on
    //    the lexical axis — the %5=4 batch is 25% growth over the base,
    //    breaching a 0.0 growth threshold, so the trigger folds both
    //    roots into new bases at the deriveBuckets width (min-clamped to
    //    the 64 default here) under one meta+postings pointer commit.
    //    The oracle replays the from-scratch postings layout over the
    //    FULL corpus — per-bucket term/posting/tf masses from the BASE
    //    alone
    "q360_lex_rebuild" -> ((s, d) => {
      val dir = Fixtures.mutableCopy("lex5", d)(buildLex5(s, d))
      require(graft.text.LexIndex.rebuildIfDrifted(s, dir,
        maxGrowthFrac = 0.0), "the %5=4 batch must breach 0.0 growth")
      graft.streaming.Compaction.view(s, s"$dir/postings")
        .readBase(Seq("term", "doc_id", "tf", "bucket")).get
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_postings"),
          countDistinct(col("term")).as("n_terms"),
          sum(col("tf")).as("sum_tf"))
    }),

    // ── TAKEDOWN CAMPAIGN: one compliance request landed across ALL FIVE
    //    maintained families at once (lexical postings, IVF vector store,
    //    PQ code table, dedup signature bands, graph-ANN store) + ONE
    //    combined erasure-attestation frame — stage 'tombstoned' shows
    //    every family's physical rows hidden-but-present, stage 'erased'
    //    (after each family's erasure-bearing fold) all-clean. The graph
    //    family's landing restates the victims' bucket groups, so its
    //    live edges reference no deleted endpoint even BEFORE the fold
    //    (rows_hidden = the vector rows alone). The oracle derives every
    //    family's counts from the corpus
    "q350_takedown_campaign" -> ((s, d) => {
      import graft.streaming.Takedown
      val docs = Tables.documents(s, d)
      val e = Tables.embeddings(s, d)
      // five independent fixture copies (shared builds memoize under the
      // Fixtures lock; the tree copies themselves overlap)
      val Seq(lexD, annD, pqD, dedupD, graphD) =
        graft.ops.Par.map(Seq[(String, String => Unit)](
          "lex5" -> buildLex5(s, d), "sann1" -> buildSann1(s, d),
          "pq1" -> buildPq1(s, d), "sig1" -> buildSig1(s, d),
          "graph1" -> buildGraph1(s, d))) { case (k, b) =>
          Fixtures.mutableCopy(k, d)(b)
        }
      val t = Takedown.Targets(lex = Some(lexD), ann = Some(annD),
        pq = Some(pqD), dedup = Some(dedupD), graph = Some(graphD))
      Takedown.land(
        Some(docs.filter(col("doc_id") % 7 === 3).select("doc_id")),
        Some(e.filter(col("vec_id") % 7 === 3).select("vec_id")),
        t, batchId = 0L)
      val before = Takedown.attest(s, t)
        .withColumn("stage", lit("tombstoned"))
        .transform(graft.ops.Checkpoint.cut(_, eager = true)) // eager: pin the pre-erasure attestation
      Takedown.erase(s, t)
      before.unionByName(Takedown.attest(s, t)
        .withColumn("stage", lit("erased")))
    }),

    // ── IVF-style ANN: centroid routing + in-cell exact rerank
    "q48_ann_ivf" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.annIvf(e, e.filter(col("vec_id") < 10), "vec_id", "embedding",
        "label", 3)
    }),

    // ── canonical text normalization (dedup-prep per-row transform)
    "q53_normalize" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        TextOps.normalize(col("text")).as("norm_text"),
        md5(TextOps.normalize(col("text"))).as("norm_hash"))),

    // ── word-bigram LM: P(w2|w1) over the corpus (minCount 3)
    "q134_bigram_lm" -> ((s, d) =>
      TextOps.bigramLm(Tables.documents(s, d), "text", minCount = 3L)),

    // ── PMI collocations: ln(c12·N / (c1·c2)) over corpus bigrams with
    //    positional marginals (Church & Hanks 1990)
    "q179_pmi" -> ((s, d) =>
      TextOps.pmiCollocations(Tables.documents(s, d), "text", minCount = 3L)),

    // ── Zipf-law fit: OLS of ln(freq) on ln(rank) over the token spectrum
    //    — the corpus-composition health check (slope ≈ −1 when healthy)
    "q182_zipf" -> ((s, d) =>
      TextOps.zipfFit(Tables.documents(s, d), "text", minCount = 3L)),

    // ── Heaps-law fit: vocabulary growth V(N) ≈ k·N^β over the corpus in
    //    doc_id order (Zipf's companion health check)
    "q191_heaps" -> ((s, d) =>
      TextOps.heapsFit(Tables.documents(s, d), "doc_id", "text")),

    // ── pairwise source vocabulary Jaccard (corpus-composition overlap)
    "q192_source_overlap" -> ((s, d) =>
      TextOps.sourceVocabOverlap(Tables.documents(s, d), "source", "text")),

    // ── KL divergence of each source's unigram distribution from the
    //    corpus marginal (mixture-drift monitor)
    "q193_kl" -> ((s, d) =>
      TextOps.klFromCorpus(Tables.documents(s, d), "source", "text")),

    // ── RAKE keyword extraction: top-50 stopword-delimited phrases by
    //    degree/frequency word scores
    "q209_rake" -> ((s, d) =>
      TextOps.rakeKeywords(Tables.documents(s, d), "doc_id", "text")),

    // ── lexical diversity per document: TTR, Guiraud root TTR, Herdan C
    "q210_lexdiv" -> ((s, d) =>
      TextOps.lexicalDiversity(Tables.documents(s, d), "doc_id", "text")),

    // ── term burstiness: within-doc repetition + adaptation P(k≥2|k≥1)
    "q211_burstiness" -> ((s, d) =>
      TextOps.burstiness(Tables.documents(s, d), "doc_id", "text",
        minDf = 5L)),

    // ── Flesch reading ease + Flesch-Kincaid grade per document
    "q228_readability" -> ((s, d) =>
      TextOps.readability(Tables.documents(s, d), "doc_id", "text")),

    // ── BPE trainer counting step: adjacent char-pair frequencies over the
    //    weighted word vocabulary
    "q99_bpe_pairs" -> ((s, d) =>
      TextOps.bpePairCounts(Tables.documents(s, d), "text")),

    // ── BPE trainer at vocab scale (rows-only like q42/q43; BpeSpec pins
    //    the merge order on hand-computed goldens and rule-for-rule ≡ the
    //    distributed batched path): ONE distributed pass builds the
    //    Zipf-bounded word-frequency table, the 256-merge loop runs
    //    driver-local with incremental pair counts — no per-round jobs,
    //    which is what makes a real 32k-merge train feasible
    "q101_bpe_train" -> ((s, d) => {
      import s.implicits._
      graft.text.Bpe.trainWordFreq(Tables.documents(s, d), "text", 256)
        .map(m => (m.rank, m.left, m.right, m.count))
        .toDF("rank", "left", "right", "pair_count")
    }),

    // ── production-depth BPE train: 2048 merges through the heap-indexed
    //    in-memory loop (rows-only like q101; BpeSpec's deep-train case
    //    pins long-run rules ≡ the distributed trainer and prefix
    //    stability). The synthetic corpus has only ~31 distinct words —
    //    nowhere near 2048 learnable merges — so each doc's text is
    //    augmented with its md5 hex fingerprint: tens of thousands of
    //    distinct high-entropy "words" over a 16-symbol alphabet, the
    //    worst-case vocabulary shape (identifiers, hashes, URLs) a real
    //    tokenizer train has to chew through. Corpus cost is unchanged —
    //    still ONE distributed word-frequency pass; this measures the
    //    merge loop itself at depth, the q101 ceiling the round-6 verdict
    //    flagged
    "q169_bpe_train2k" -> ((s, d) => {
      import s.implicits._
      // fingerprints keyed mod 20k and clipped to 16 hex chars: vocab (and
      // so merge-loop cost) is corpus-size-independent — the trainWordFreq
      // contract at scale — while still carrying >2048 learnable merges
      val aug = Tables.documents(s, d).select(col("doc_id"),
        concat(col("text"), lit(" "),
          substring(md5((col("doc_id") % 20000).cast("string")), 1, 16))
          .as("text"))
      graft.text.Bpe.trainWordFreq(aug, "text", 2048)
        .map(m => (m.rank, m.left, m.right, m.count))
        .toDF("rank", "left", "right", "pair_count")
    }),

    // ── unigram-LM perplexity signal per doc (CCNet-style quality filter)
    "q100_unigram_nll" -> ((s, d) =>
      TextOps.unigramNll(Tables.documents(s, d), "doc_id", "text")),

    // ── vocabulary stats: top-50 tokens by document frequency
    "q54_term_freq" -> ((s, d) =>
      graft.ops.Relational.topK(
        TextOps.termStats(Tables.documents(s, d), "doc_id", "text"),
        50, col("doc_freq").desc, col("term_freq").desc, col("token").asc)),

    // ── dedup clusters: connected components over LSH candidates (est ≥ 0.5)
    "q75_dedup_clusters" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashCandidates(
        Dedup.minhashSignatures(docs, "doc_id", "text"), "doc_id")
        .filter(col("est_jaccard") >= 0.5)
      Dedup.dedupClusters(docs, pairs, "doc_id")
    }),

    // ── soft dedup: duplication-aware sampling weights — every doc gets
    //    weight 1/|cluster| and a deterministic salted-hash keep decision
    //    with P(keep) = weight, so each near-dup cluster survives with ~1
    //    doc in expectation WITHOUT hard-dropping (the down-weighting
    //    alternative to q137's keep-one). Integer-exact sampling compare
    //    (bucket·size < 10⁶), so the oracle matches bit-for-bit.
    "q149_soft_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashCandidates(
        Dedup.minhashSignatures(docs, "doc_id", "text"), "doc_id")
        .filter(col("est_jaccard") >= 0.5)
      Dedup.softDedupWeights(Dedup.dedupClusters(docs, pairs, "doc_id"),
        "doc_id")
    }),

    // ── incremental cluster maintenance: cluster the old corpus, then fold
    //    the new batch in via incremental candidates + star edges — the
    //    oracle is the FROM-SCRATCH clustering of the full corpus, so the
    //    check proves incremental ≡ recompute
    "q155_incremental_clusters" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val old = docs.filter(col("doc_id") % 5 =!= 4)
      val nw = docs.filter(col("doc_id") % 5 === 4)
      // the old-corpus SIGNATURES feed both legs (from-scratch pairing for
      // the baseline assignment, and the corpus side of the incremental
      // join) — compute the shingle+minhash pass over 80% of the corpus
      // once. LAZY localCheckpoint, NOT persist: CacheManager pins
      // persisted plans until explicit unpersist (which a lazily returned
      // frame can never issue), whereas checkpoint blocks are freed by
      // the ContextCleaner when the plan is dropped. Checkpoint the
      // per-doc signatures (20 numeric cols, one row per doc), NOT the
      // band rows — banding is a cheap posexplode each leg redoes, and
      // caching the 4×-exploded rows with the signature array on every
      // one costs more than it saves (the r12→r13 A/B measured it).
      val oldSigs = Dedup.minhashSignatures(old, "doc_id", "text")
        .transform(graft.ops.Checkpoint.cut(_, eager = false))
      val oldBands = Dedup.bandRows(oldSigs, "doc_id")
      val oldPairs = Dedup.minhashCandidatesFromBands(oldBands, "doc_id")
        .filter(col("est_jaccard") >= 0.5)
      val oldAssign = Dedup.dedupClusters(old, oldPairs, "doc_id")
        .select("doc_id", "cluster_id")
      val incPairs = Dedup.incrementalFromBands(oldBands,
          Dedup.bandRows(
            Dedup.minhashSignatures(nw, "doc_id", "text"), "doc_id"),
          "doc_id", Dedup.DefaultMaxBucket)
        .filter(col("est_jaccard") >= 0.5)
      Dedup.incrementalClusters(oldAssign, nw, incPairs, "doc_id")
    }),

    // ── CROSS-SNAPSHOT CLUSTER DIFF: what did the last batch do to the
    //    duplicate structure — new clusters, grown clusters, old clusters
    //    merged by a bridging doc. One LSH pass: the old assignment is
    //    the same pair set restricted to old↔old (append-only snapshots,
    //    so old clusters never split)
    "q315_cluster_diff" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // both assignments read the candidate pairs — lazy localCheckpoint,
      // NOT persist: a persisted entry stays pinned by the CacheManager for
      // the session (no unpersist point exists for a returned lazy frame);
      // checkpoint blocks free with the plan via the ContextCleaner
      val pairs = Dedup.minhashCandidates(
          Dedup.minhashSignatures(docs, "doc_id", "text"), "doc_id")
        .filter(col("est_jaccard") >= 0.5)
        .transform(graft.ops.Checkpoint.cut(_, eager = false))
      val newAssign = Dedup.dedupClusters(docs, pairs, "doc_id")
        .select("doc_id", "cluster_id")
      val oldAssign = Dedup.dedupClusters(
        docs.filter(col("doc_id") % 5 =!= 4),
        pairs.filter(col("id_a") % 5 =!= 4 && col("id_b") % 5 =!= 4),
        "doc_id").select("doc_id", "cluster_id")
      Dedup.clusterDiff(oldAssign, newAssign, "doc_id")
    }),

    // ── leakage-free split: train/val/test assigned by DEDUP CLUSTER, not
    //    by doc, so near-duplicates can never straddle the split boundary
    //    (the classic eval-contamination hole in naive per-doc splits)
    "q151_cluster_split" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashCandidates(
        Dedup.minhashSignatures(docs, "doc_id", "text"), "doc_id")
        .filter(col("est_jaccard") >= 0.5)
      Mix.splitAssign(
        Dedup.dedupClusters(docs, pairs, "doc_id")
          .select("doc_id", "cluster_id"),
        "cluster_id")
    }),

    // ── end-to-end dedup: corpus in → near-dup-free corpus out (the whole
    //    minhash → LSH → clusters → keep-representative chain as ONE query)
    "q137_dedup_keep" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashCandidates(
        Dedup.minhashSignatures(docs, "doc_id", "text"), "doc_id")
        .filter(col("est_jaccard") >= 0.5)
      val keepers = Dedup.dedupClusters(docs, pairs, "doc_id")
        .filter(col("keep") === 1).select("doc_id")
      docs.join(keepers, Seq("doc_id"), "left_semi")
        .select("doc_id", "source", "n_chars")
    }),

    // ── deterministic stratified sample + train/val/test split assignment
    "q76_sample_split" -> ((s, d) =>
      Mix.splitAssign(
        Mix.stratifiedSample(Tables.documents(s, d), "doc_id", "source",
          Map("src0" -> 0.25, "src1" -> 0.25), 0.75),
        "doc_id")
        .select("doc_id", "source", "split")),

    // ── repetition quality signals (dup-token/2-gram fractions, top token)
    "q77_repetition" -> ((s, d) =>
      TextOps.repetition(Tables.documents(s, d), "doc_id", "text")),

    // ── PII detect + redact over deterministically planted emails/phones
    "q78_pii_scrub" -> ((s, d) =>
      TextOps.piiScrub(
        Tables.documents(s, d).withColumn("aug",
          concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com or call 555-"),
            lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
            lpad(((col("doc_id") * 7) % 10000).cast("string"), 4, "0"))),
        "doc_id", "aug")),

    // ── per-source token budget cap in deterministic hash order (800 binds
    //    at every SF: sources exceed it even at sf0.01)
    "q79_token_budget" -> ((s, d) =>
      Mix.tokenBudget(Tables.documents(s, d), "doc_id", "source", "text", 800L)
        .select("doc_id", "source", "ws_tokens", "cum_tokens")),

    // ── incremental dedup: new batch (doc_id%5=4) against the corpus index;
    //    corpus×corpus pairs are NOT re-derived
    "q80_incremental_dedup" -> ((s, d) => {
      val sig = Dedup.minhashSignatures(Tables.documents(s, d), "doc_id", "text")
      Dedup.incrementalCandidates(
        sig.filter(col("doc_id") % 5 =!= 4),
        sig.filter(col("doc_id") % 5 === 4), "doc_id")
    }),

    // ── same pairs via the STORED signature index: the corpus band rows are
    //    written to bucket-partitioned parquet and read back, and only the
    //    buckets the new batch touches are scanned — value-identical to q80
    //    (shared oracle), so the index round-trip itself is oracle-checked
    "q83_incremental_indexed" -> ((s, d) => {
      // one signature pass: the corpus-side write and the new-batch probe
      // read the same frame — lazy localCheckpoint (ContextCleaner-freed;
      // a persist here would stay CacheManager-pinned for the session)
      val sig = Dedup.minhashSignatures(Tables.documents(s, d), "doc_id", "text")
        .transform(graft.ops.Checkpoint.cut(_, eager = false))
      val dir = scratchDir("graft_sigidx")
      Dedup.writeSignatureIndex(sig.filter(col("doc_id") % 5 =!= 4), "doc_id", dir, 64)
      Dedup.incrementalCandidatesIndexed(Dedup.readSignatureIndex(s, dir),
        sig.filter(col("doc_id") % 5 === 4), "doc_id")
    }),

    // ── connected components via alternating large-star/small-star (the
    //    adversarial-graph path q75 falls back to): identical labels to
    //    q75's min-label propagation, so it shares the recursive-CTE oracle
    "q84_star_clusters" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashCandidates(
        Dedup.minhashSignatures(docs, "doc_id", "text"), "doc_id")
        .filter(col("est_jaccard") >= 0.5)
      Dedup.starClusters(docs, pairs, "doc_id")
    }),

    // ── int8 embedding quantization (codes hashed; saturation + L1 checked)
    "q81_quantize_int8" -> ((s, d) =>
      Similarity.quantizeInt8(Tables.embeddings(s, d), "vec_id", "embedding")
        .select(col("vec_id"), col("mx"),
          md5(expr("concat_ws(',', transform(codes, c -> cast(c AS STRING)))"))
            .as("codes_hash"),
          expr("CAST(size(filter(codes, c -> abs(c) = 127)) AS BIGINT)").as("n_sat"),
          expr("CAST(aggregate(codes, 0L, (a, c) -> a + abs(c)) AS BIGINT)").as("l1"))),

    // ── JL sign random projection to 16 dims (long format, seedless ±1
    //    matrix regenerated from the hyperplanes closed form)
    "q215_jl_project" -> ((s, d) =>
      Similarity.jlProject(Tables.embeddings(s, d), "vec_id", "embedding",
        dim = 64, k = 16)),

    // ── simplified (centroid-based) silhouette per cluster label
    "q216_silhouette" -> ((s, d) =>
      Similarity.silhouette(Tables.embeddings(s, d), "vec_id", "embedding",
        "label", dim = 64)),

    // ── benchmark decontamination: train docs (doc_id%10 != 7) whose word
    //    3-grams overlap the eval set (doc_id%10 = 7); eval n-gram set is
    //    broadcast — no corpus-side pair join exists in the plan
    "q85_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Curate.contamination(
        docs.filter(col("doc_id") % 10 =!= 7),
        docs.filter(col("doc_id") % 10 === 7),
        "doc_id", "text", 3, 0.2)
    }),

    // ── passage-level exact dedup (CCNet paragraph dedup; 3-token chunks so
    //    the synthetic small-vocab corpus actually repeats passages)
    "q95_passage_dedup" -> ((s, d) =>
      Curate.passageDedup(Tables.documents(s, d), "doc_id", "text", 3)),

    // ── rebuilt clean text with duplicated passages stripped
    "q96_passage_strip" -> ((s, d) =>
      Curate.stripDupPassages(Tables.documents(s, d), "doc_id", "text", 3)),

    // ── temperature-weighted source mixing (alpha-sampling, alpha = 0.5)
    "q86_mix_weights" -> ((s, d) =>
      Mix.temperatureWeights(Tables.documents(s, d), "source", "text", 0.5)),

    // ── URL/domain stats over a deterministic synthetic URL column (the
    //    documents table carries no URL; the parse/agg path is the operator)
    "q87_domain_stats" -> ((s, d) => {
      val aug = Tables.documents(s, d).withColumn("url", concat(
        lit("https://"),
        when(col("doc_id") % 2 === 0, lit("www.")).otherwise(lit("")),
        col("source"), lit("-"), (col("doc_id") % 7).cast("string"), lit("."),
        when(col("doc_id") % 3 === 0, lit("example.org"))
          .when(col("doc_id") % 3 === 1, lit("sample.net"))
          .otherwise(lit("test.io")),
        expr("substring('/a/b/c', 1, CAST((doc_id % 4) * 2 AS INT))")))
      Curate.domainStats(aug, "url", col("n_chars"))
    }),

    // ── cross-document duplicate 3-gram fraction per doc (no pair join)
    "q88_shared_ngrams" -> ((s, d) =>
      Dedup.sharedNgramStats(Tables.documents(s, d), "doc_id", "text", 3)),

    // ── composite C4/Gopher-style quality filter with per-rule reasons
    "q89_filter_pipeline" -> ((s, d) =>
      Curate.filterPipeline(Tables.documents(s, d), "doc_id", "text")),

    // ── sequence packing: concat-and-split each source's doc stream at
    //    256-token boundaries (the pretraining batch-assembly step)
    "q94_seq_pack" -> ((s, d) =>
      Mix.packSequences(Tables.documents(s, d), "doc_id", "source", "text", 256L)),

    // ── LSH bucket-size histogram per band (the dedup health report)
    "q90_lsh_histogram" -> ((s, d) =>
      Dedup.bucketHistogram(
        Dedup.minhashSignatures(Tables.documents(s, d), "doc_id", "text"),
        "doc_id")),

    // ── multimodal plumbing: opaque binary column + typed metadata
    "q37_binary_meta" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("bin", encode(col("text"), "UTF-8"))
        .select(col("doc_id"),
          octet_length(col("bin")).cast("long").as("n_bytes"),
          (octet_length(col("bin")) % 640).cast("long").as("width"),
          ((octet_length(col("bin")) * 7) % 480 + 1).cast("long").as("height"),
          lower(hex(encode(substring(col("text"), 1, 8), "UTF-8"))).as("head_hex"))),

    // ── REAL image decode (JDK ImageIO, header-only): genuine PNG bytes of
    //    known dimensions are generated driver-side, decoded distributed,
    //    and the recovered format/width/height/channels value-check against
    //    the closed-form oracle — the decode itself is what's under test
    "q158_image_meta" -> ((s, _) => {
      import s.implicits._
      val assets = (0L until 64L).map(i =>
          (i, graft.multimodal.Multimodal.pngBytes(
            1 + (i % 7).toInt, 1 + (i % 5).toInt)))
        .toDF("asset_id", "content")
        .repartition(8, col("asset_id"))
      graft.multimodal.Multimodal.decodeImageMeta(assets)
        .select(col("asset_id"), col("format"), col("width"), col("height"),
          col("channels"))
    }),

    // ── REAL image content features: genuine gradient PNGs decoded
    //    raster-deep (JDK ImageIO), per-channel mean/variance from exact
    //    integer pixel sums — the oracle recomputes the identical doubles
    //    from the fixtures' closed-form pixel function, so the DECODE is
    //    the only thing only Spark does, and it is value-checked
    "q167_image_features" -> ((s, _) =>
      graft.multimodal.Multimodal.imageFeatures(gradAssets(s))
        .select(col("asset_id"), col("width"), col("height"), col("n_px"),
          col("mean_r"), col("mean_g"), col("mean_b"),
          col("var_r"), col("var_g"), col("var_b"))),

    // ── REAL audio content features: genuine WAV containers decoded
    //    through the JDK PCM codec, integer-exact sample statistics
    //    (mean/RMS/zero-crossings/extremes) — fixtures are closed-form
    //    pseudo-saw waves, so the oracle recomputes the identical values
    //    and only the DECODE is unique to the Spark side (q167's recipe,
    //    for audio)
    "q170_audio_features" -> ((s, _) => {
      import s.implicits._
      val assets = (0 until 40).map(k =>
          (k.toLong, graft.multimodal.Multimodal.sawWavBytes(k)))
        .toDF("asset_id", "content")
        .repartition(8, col("asset_id"))
      graft.multimodal.Multimodal.audioFeatures(assets)
    }),

    // ── REAL video container metadata: minimal ISO BMFF (MP4) box parser
    //    — brand, movie-header timescale/duration, track count — over
    //    authored spec-conformant fixtures; the oracle recomputes the
    //    closed-form header fields, so only the box-tree PARSE is unique
    //    to the Spark side. Frame decode needs an external codec and
    //    stays out (the honest boundary, as with image/audio)
    "q171_video_meta" -> ((s, _) => {
      import s.implicits._
      val assets = (0 until 40).map(k =>
          (k.toLong, graft.multimodal.Multimodal.mp4Fixture(k)))
        .toDF("asset_id", "content")
        .repartition(8, col("asset_id"))
      graft.multimodal.Multimodal.videoMeta(assets)
        .select(col("asset_id"), col("brand"), col("timescale"),
          col("duration_ms"), col("n_tracks"))
    }),

    // ── image near-dup dedup END TO END: decoded pixel-stat features feed
    //    the SAME similarity + clustering stack the text corpus uses
    //    (LSH-bucketed cosine pairs → connected components) — multimodal
    //    content as a first-class citizen of the dedup pipeline, not a
    //    parallel silo. Fixture groups are near-duplicates by construction
    //    (uniform brightness shifts); the oracle recomputes features,
    //    buckets, cosine filter, and the reachability closure
    "q168_image_neardup" -> ((s, _) => {
      // materialized once: the decode feeds both sides of the pair
      // self-join plus the cluster vertex set — without it every PNG
      // raster is decoded ~3x. Lazy localCheckpoint, not persist, so the
      // blocks free with the plan instead of pinning the CacheManager.
      val feats = graft.multimodal.Multimodal.imageFeatures(gradAssets(s))
        .transform(graft.ops.Checkpoint.cut(_, eager = false))
      val pairs = Similarity.cosineNearDupPairs(feats, "asset_id", "features",
        ImgMinSim, ImgPlanes, ImgDim)
      Dedup.dedupClusters(feats.select("asset_id"), pairs, "asset_id")
    }),

    // ── BM25 retrieval scoring for a fixed query-term set
    "q102_bm25" -> ((s, d) =>
      graft.text.Retrieval.bm25(Tables.documents(s, d), "doc_id", "text",
        Bm25Terms)),

    // ── the same BM25 through the STORED LEXICAL INDEX: base postings +
    //    doc lengths written from the old 80%, the delta batch appended as
    //    its own increment, the probe scan bucket-PRUNED by the query
    //    terms — value-identical to q102 (shared oracle), so the lexical
    //    index round-trip + append path is itself oracle-checked
    "q323_bm25_indexed" -> ((s, d) =>
      graft.text.LexIndex.bm25Indexed(s,
        Fixtures.shared("lex5", d)(buildLex5(s, d)), Bm25Terms)),

    // ── FILTERED BM25 over the stored index: search-within-a-tenant on
    //    the LEXICAL axis, completing the tier matrix (graph q349, PQ
    //    q351, IVF-PQ q352, streaming-layout q354, IVF q337). The tenant
    //    predicate (doc_id ≡ 0 mod 3) restricts postings AND the corpus
    //    statistics, so scores ≡ from-scratch BM25 over the tenant's
    //    corpus alone — the oracle replays exactly that
    "q362_bm25_filtered" -> ((s, d) =>
      graft.text.LexIndex.bm25IndexedFiltered(s,
        Fixtures.shared("lex5", d)(buildLex5(s, d)), Bm25Terms,
        col("doc_id") % 3 === 0)),

    // ── FILTERED ANN: top-3 under a metadata predicate (vec_id ≡ 0 mod 3,
    //    ~⅓ selectivity), nProbe=2 — the predicate applies INSIDE the two
    //    probed posting lists (never a post-filter of an unfiltered top-k,
    //    never a brute-force scan of all matches)
    "q246_filtered_ann" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.annIvfFiltered(e, e.filter(col("vec_id") < 10), "vec_id",
        "embedding", "label", col("vec_id") % 3 === 0, k = 3, nProbe = 2)
    }),

    // ── ANN JOIN: top-3 neighbors for EVERY vector via shared cell
    //    routing — the corpus-wide near-dup-pairs shape (candidates =
    //    probed posting lists, never the N² cross join)
    "q260_ann_join" -> ((s, d) =>
      Similarity.annJoin(Tables.embeddings(s, d), "vec_id", "embedding",
        "label", k = 3, nProbe = 2)),

    // ── semantic near-dup DECISION LIST on top of the ANN join: pairs
    //    with sim ≥ 0.35 among each vector's top-5 routed neighbors,
    //    canonicalized (dup_id > keep_id, smaller id kept)
    "q263_semdedup_pairs" -> ((s, d) =>
      Similarity.semDedupPairs(Tables.embeddings(s, d), "vec_id",
        "embedding", "label", k = 5, nProbe = 2, minSim = 0.35)),

    // ── RETRIEVAL EVAL METRICS: recall@5 / MRR@5 / nDCG@5 of the IVF
    //    search against the exact brute-force truth, per query + macro —
    //    the tuning-loop numbers as a first-class operator (both inputs
    //    deterministic, so the whole evaluation is oracle-replayable)
    "q266_ranking_metrics" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") < 10)
      val res = Similarity.annIvf(e, q, "vec_id", "embedding", "label", 5)
      val truth = Similarity.knnBrute(e, q, "vec_id", "embedding", 5)
      Similarity.rankingMetrics(res, truth, k = 5)
    }),

    // ── SEMANTIC DEDUP CLUSTERS: connected components over the q263 pair
    //    list — pairs → clusters → keep-one-per-cluster, the full
    //    embedding-space dedup decision (vectors with no near-dup come
    //    out as singleton keeps)
    "q265_semantic_clusters" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val pairs = Similarity.semDedupPairs(e, "vec_id", "embedding",
        "label", k = 5, nProbe = 2, minSim = 0.35)
      // star formulation: thresholded similarity graphs are chain-shaped
      // (A~B~C without A~C), where min-label propagation needs one round
      // per hop — large/small-star converges in O(log²) rounds on any
      // shape (q84 proves label equality with the min-label form)
      graft.text.Dedup.starClusters(e, pairs, "vec_id",
        idA = "dup_id", idB = "keep_id")
    }),

    // ── RECORD LINKAGE: blocked Jaro–Winkler candidate pairs over part
    //    names (block = name noun + size, so candidates = Σ|block|², never
    //    n²), scored by the native graft_jaro_winkler expression — the
    //    oracle scores the same blocked pairs with DuckDB's independent
    //    jaro_winkler_similarity, so the hash check is a value-for-value
    //    cross-engine audit of the expression itself
    "q267_er_pairs" -> ((s, d) =>
      graft.text.Link.jwPairs(
        Tables.part(s, d)
          .withColumn("_noun", expr("split_part(p_name, ' ', 2)")),
        "p_partkey", "p_name", Seq("_noun", "p_size"), minSim = 0.9)),

    // ── ENTITY CANONICALIZATION: connected components over the q267 match
    //    graph (match is symmetric, not transitive — components ARE the
    //    entity), min-id labels via the large/small-star method
    "q268_er_entities" -> ((s, d) =>
      graft.text.Link.erEntities(
        Tables.part(s, d)
          .withColumn("_noun", expr("split_part(p_name, ' ', 2)")),
        "p_partkey", "p_name", Seq("_noun", "p_size"), minSim = 0.9)),

    // ── TEXTRANK corpus keywords: PageRank over the adjacent-content-word
    //    co-occurrence graph (window 2, stopwords out) — the centrality
    //    complement to RAKE's degree/frequency phrase scoring
    "q281_textrank" -> ((s, d) =>
      TextOps.textRank(Tables.documents(s, d), "text")),

    // ── SEMANTIC decontamination: corpus vectors within cosine 0.35 of
    //    any eval vector (eval = vec_id % 10 == 0) via IVF-routed
    //    candidates — the paraphrase-robust complement to lexical q85
    "q279_sem_decontaminate" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Curate.semanticDecontaminate(e, e.filter(col("vec_id") % 10 === 0),
        "vec_id", "embedding", "label", minSim = 0.35, k = 50)
    }),

    // ── DSIR importance resampling (Xie et al. 2023): hashed uni+bigram
    //    bag models for target (lang=en) vs raw corpus, per-doc importance
    //    weights, Gumbel-top-k resample — deterministic via the salted
    //    portable hash, so the oracle replays the full selection
    "q271_dsir" -> ((s, d) =>
      Curate.dsirResample(Tables.documents(s, d), "doc_id", "text",
        col("lang") === "en", buckets = 256, k = 100)),

    // ── INCREMENTAL ANN INDEX: centroids frozen from the corpus, posting
    //    lists assembled from TWO ivfAssign batches (assign(old ∪ delta) =
    //    assign(old) ∪ assign(delta) under fixed centroids), then searched
    //    — the oracle assigns from scratch, so the hash check IS the
    //    incremental ≡ from-scratch proof for the vector index
    "q264_ann_incremental" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val cents = Similarity.ivfCentroids(e, "label", "embedding")
      val assigned = Similarity
        .ivfAssign(e.filter(col("vec_id") % 10 =!= 0), "vec_id",
          "embedding", cents)
        .unionByName(Similarity.ivfAssign(e.filter(col("vec_id") % 10 === 0),
          "vec_id", "embedding", cents))
      Similarity.annIvfStored(assigned, cents, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 3, nProbe = 2)
    }),

    // ── the same search through the ON-DISK index: posting lists written
    //    cell-partitioned from the old batch, the delta batch APPENDED
    //    under the frozen stored centroids, probe = static partition
    //    pruning — value-identical to q264 (shared oracle), so the index
    //    round-trip + append path is itself oracle-checked
    "q312_ann_index_stored" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val dir = Fixtures.shared("ivf90", d)(buildIvf90(s, d))
      Similarity.annIvfIndexed(s, dir, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 3, nProbe = 2)
    }),

    // ── per-cell drift of an incrementally-maintained index against its
    //    FROZEN centroids (learned on the old 90%, full corpus assigned
    //    to them): cosine(stored centroid, current member mean) — the
    //    recluster trigger that decides when append-only maintenance has
    //    aged out the quantizer
    "q313_ivf_cell_drift" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val cents = Similarity.ivfCentroids(
        e.filter(col("vec_id") % 10 =!= 0), "label", "embedding")
      Similarity.ivfCellDrift(
        Similarity.ivfAssign(e, "vec_id", "embedding", cents), cents)
    }),

    // ── the RECLUSTER arm the q313 trigger fires: base written under the
    //    label quantizer, delta appended frozen, then the index rebuilds
    //    with fresh centroids (current cell means, one Lloyd refresh) and
    //    every vector re-assigns — the oracle replays quantizer → assign →
    //    refresh → re-assign → route → rank end to end, closing the
    //    drift→recluster loop under full value-level checks
    "q318_ivf_recluster" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val dir = Fixtures.mutableCopy("ivf90", d)(buildIvf90(s, d))
      Similarity.reclusterIvfIndex(s, dir)
      Similarity.annIvfIndexed(s, dir, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 3, nProbe = 2)
    }),

    // ── the COMPACTED maintained ANN store, oracle-checked: streaming
    //    layout (base on 90% under its own label centroids, the delta as
    //    an increment), increments folded into a new base, then the
    //    search over the compacted store — assignment under frozen
    //    centroids distributes over union, and this proves it at the
    //    value level through the fold
    "q326_compacted_ann_index" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val dir = Fixtures.mutableCopy("sann1", d)(buildSann1(s, d))
      require(graft.streaming.StreamingAnn.compactIndex(s, dir) == 1,
        "the increment must fold")
      graft.streaming.StreamingAnn.search(s, dir,
        e.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 3, nProbe = 2)
    }),

    // ── END-TO-END RETRIEVAL QUALITY of the maintained index: BM25 picks
    //    50 lexical candidates, only THEIR stored vectors (the q312
    //    write+append index's posting lists) are fetched and exact-cosine
    //    reranked, and the reranked top-5 scores against the exhaustive
    //    truth — recall/MRR/nDCG of the hybrid stack, not the scorer
    "q320_rerank_eval" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val dir = Fixtures.shared("ivf90", d)(buildIvf90(s, d))
      val (post, _) = Similarity.readIvfIndex(s, dir)
      graft.text.Retrieval.rerankEval(Tables.documents(s, d), "doc_id",
        "text", Bm25Terms, post.select("vec_id", "v"),
        e.filter(col("vec_id") < 10), "vec_id", "embedding",
        nCand = 50, k = 5)
    }),

    // ── the SAME hybrid eval with the lexical stage ALSO on a stored
    //    artifact: BM25 candidates from the q323 lexical index (base on
    //    80%, delta appended), vectors from the q312 vector index — the
    //    whole retrieval stack runs off maintained on-disk state and is
    //    value-identical to q320 (shared oracle)
    "q324_hybrid_indexed" -> ((s, d) => {
      // single-shot builds: the append paths are q323's / q312's claims;
      // this query's claim is the eval running off the stored state
      val e = Tables.embeddings(s, d)
      val ldir = Fixtures.shared("lexFull", d)(buildLexFull(s, d))
      val vdir = Fixtures.shared("ivfFull", d)(buildIvfFull(s, d))
      val (post, _) = Similarity.readIvfIndex(s, vdir)
      graft.text.Retrieval.rerankEvalIndexed(s, ldir, Bm25Terms,
        post.select("vec_id", "v"), e.filter(col("vec_id") < 10),
        "vec_id", "embedding", nCand = 50, k = 5)
    }),

    // ── FUSED STORED-HYBRID SERVING: the BM25 ranking probed from the
    //    stored lexical index and the ANN ranking probed from the stored
    //    IVF index, fused by reciprocal-rank fusion (DECIMAL(28,12)
    //    terms, the q298 scheme), the fused top-5 scored against the
    //    exhaustive truth — the standard hybrid-search serving query run
    //    entirely off maintained on-disk state
    "q327_hybrid_rrf" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val ldir = Fixtures.shared("lexFull", d)(buildLexFull(s, d))
      val vdir = Fixtures.shared("ivfFull", d)(buildIvfFull(s, d))
      graft.text.Retrieval.hybridRrfIndexed(s, ldir, vdir, Bm25Terms,
        e.filter(col("vec_id") < 10), "vec_id", "embedding",
        nLex = 50, nProbe = 2, k = 5)
    }),

    // ── TENANT-FILTERED fused hybrid serving: both legs, the fusion and
    //    the exhaustive truth restricted to the tenant (ids ≡ 0 mod 3) —
    //    the q327 stack under the q337/q352 filter contract (candidates
    //    filtered, routing on the full frozen centroids; BM25 statistics
    //    from the tenant corpus alone). The oracle is q327's full replay
    //    with every corpus-facing CTE tenant-restricted
    "q363_hybrid_filtered" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val ldir = Fixtures.shared("lexFull", d)(buildLexFull(s, d))
      val vdir = Fixtures.shared("ivfFull", d)(buildIvfFull(s, d))
      graft.text.Retrieval.hybridRrfIndexedFiltered(s, ldir, vdir,
        Bm25Terms, e.filter(col("vec_id") < 10), "vec_id", "embedding",
        docPred = col("doc_id") % 3 === 0,
        vecPred = col("vec_id") % 3 === 0,
        nLex = 50, nProbe = 2, k = 5)
    }),

    // ── RETRIEVAL-QUALITY DRIFT across snapshots of a maintained index:
    //    the same eval battery against the SAME exhaustive truth (it
    //    depends only on the ingested vectors), on the index right after
    //    a frozen-centroid append vs after the recluster — the readout
    //    that says whether the recluster actually repaired routing
    //    quality (q319's drift pattern on the retrieval axis; composes
    //    q318's recluster replay with q320's metrics replay)
    "q328_retrieval_drift" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val old = e.filter(col("vec_id") % 10 =!= 0)
      val cents = Similarity.ivfCentroids(old, "label", "embedding")
      val dir = scratchDir("graft_ivfdrift")
      Similarity.writeIvfIndex(
        Similarity.ivfAssign(old, "vec_id", "embedding", cents), cents, dir)
      Similarity.appendIvfBatch(e.filter(col("vec_id") % 10 === 0),
        "vec_id", "embedding", dir)
      val q = e.filter(col("vec_id") < 10)
      // ONE truth for both snapshots (a recluster permutes cells, never
      // the ingested vectors) — eager-checkpointed, like the frozen eval,
      // because the recluster below rewrites the directory both read
      val truth = Similarity.annEvalTruth(s, dir, q, "vec_id", "embedding",
        k = 5).transform(graft.ops.Checkpoint.cut(_, eager = true))
      val frozen = Similarity.annEvalStored(s, dir, q, "vec_id",
          "embedding", k = 5, nProbe = 2, truth = Some(truth))
        .select(col("q_id"), col("recall").as("recall_frozen"),
          col("ndcg").as("ndcg_frozen"))
        .transform(graft.ops.Checkpoint.cut(_, eager = true))
      Similarity.reclusterIvfIndex(s, dir)
      val re = Similarity.annEvalStored(s, dir, q, "vec_id", "embedding",
          k = 5, nProbe = 2, truth = Some(truth))
        .select(col("q_id"), col("recall").as("recall_reclustered"),
          col("ndcg").as("ndcg_reclustered"))
      frozen.join(re, "q_id")
        .withColumn("d_recall",
          round(col("recall_reclustered") - col("recall_frozen"), 6))
        .withColumn("d_ndcg",
          round(col("ndcg_reclustered") - col("ndcg_frozen"), 6))
    }),

    // ── CAPSTONE: the FULL index lifecycle in one oracle-checked query.
    //    Vector store on the streaming layout: base on 90% under its own
    //    label centroids, TWO frozen-centroid increments, the compaction
    //    trigger folds them, a certain drift breach reclusters (the
    //    marker-commit promote). Lexical store: base on 90%, two appended
    //    batches, trigger-folded. Then the fused hybrid serving query runs
    //    off both end-states — and the oracle derives the SAME answer from
    //    scratch in SQL (frozen assign ∪-distributes, folds are identities,
    //    recluster is the deterministic Lloyd refresh), so the whole
    //    maintain→compact→recluster→serve chain is value-checked end to end
    "q329_index_lifecycle" -> ((s, d) => {
      import graft.streaming.StreamingAnn
      val e = Tables.embeddings(s, d)
      val vdir = Fixtures.mutableCopy("sann2", d)(buildSann2(s, d))
      require(StreamingAnn.compactIndexIfNeeded(s, vdir, 1) == 2,
        "the trigger must fold both increments")
      require(StreamingAnn.reclusterIfDrifted(s, vdir, maxDrift = -1.0),
        "the certain breach must recluster")
      val ldir = Fixtures.mutableCopy("lex10", d)(buildLex10(s, d))
      require(graft.text.LexIndex.compactIndexIfNeeded(s, ldir, 1) == ((2, 2)),
        "the trigger must fold both lexical increments")
      graft.text.Retrieval.hybridRrfStored(s, ldir,
        StreamingAnn.readPostings(s, vdir),
        // post-recluster: the legacy literal path still exists in grace
        // but holds the OLD generation — resolve the live one
        s.read.parquet(graft.streaming.Compaction
          .resolve(s, vdir, "centroids").get), Bm25Terms,
        e.filter(col("vec_id") < 10), "vec_id", "embedding",
        nLex = 50, nProbe = 2, k = 5)
    }),

    // ── the q329 LIFECYCLE capstone WITH A TAKEDOWN in the middle — the
    //    strongest statement the delete family can make: base → two
    //    streamed appends → tombstone every id ≡ 3 mod 7 → trigger fold
    //    (physical erasure rides the same fold) → forced recluster (fresh
    //    centroids = means over LIVE members only) → fused hybrid serving
    //    eval, where the exhaustive truth itself comes from the live
    //    stored postings. ONE oracle derives the end state from scratch
    //    over the FILTERED corpus
    "q339_delete_lifecycle" -> ((s, d) => {
      import graft.streaming.StreamingAnn
      val e = Tables.embeddings(s, d)
      val docs = Tables.documents(s, d)
      val vdir = Fixtures.mutableCopy("sann2", d)(buildSann2(s, d))
      StreamingAnn.deleteBatch(
        e.filter(col("vec_id") % 7 === 3).select("vec_id"), vdir, 0L)
      require(StreamingAnn.compactIndexIfNeeded(s, vdir, 1) == 2,
        "the trigger must fold both increments")
      require(StreamingAnn.reclusterIfDrifted(s, vdir, maxDrift = -1.0),
        "the certain breach must recluster")
      val ldir = Fixtures.mutableCopy("lex10", d)(buildLex10(s, d))
      graft.text.LexIndex.deleteBatch(
        docs.filter(col("doc_id") % 7 === 3).select("doc_id"), ldir, 0L)
      require(graft.text.LexIndex.compactIndexIfNeeded(s, ldir, 1) == ((2, 2)),
        "the trigger must fold both lexical increments")
      graft.text.Retrieval.hybridRrfStored(s, ldir,
        StreamingAnn.readPostings(s, vdir),
        // post-recluster: the legacy literal path still exists in grace
        // but holds the OLD generation — resolve the live one
        s.read.parquet(graft.streaming.Compaction
          .resolve(s, vdir, "centroids").get), Bm25Terms,
        e.filter(col("vec_id") < 10), "vec_id", "embedding",
        nLex = 50, nProbe = 2, k = 5)
    }),

    // ── STORED PQ INDEX: the compressed serving tier as a maintained
    //    artifact. Codes under a FROZEN codebook distribute over union
    //    (the frozen-centroid contract on the compression axis), so
    //    base + appended increment + trigger-fold searches exactly like
    //    a from-scratch encode — the oracle replays the closed-form
    //    codebook, the argmin encode, the per-query ADC, and the rank
    "q330_pq_index_stored" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val dir = Fixtures.mutableCopy("pq1", d)(buildPq1(s, d))
      require(graft.sim.PqIndex.compactIndexIfNeeded(s, dir, 0) == 1,
        "the trigger must fold the increment")
      graft.sim.PqIndex.search(s, dir, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5)
    }),

    // ── PQ CODE-USAGE DRIFT: the aging monitor a frozen codebook needs,
    //    computed from the stored codes alone — per subspace, the L1
    //    distance between the base's and the increments' codeword-usage
    //    distributions (exact-integer counts, single-rounded double
    //    quotients, decimal-quantized terms)
    "q331_pq_code_drift" -> ((s, d) =>
      graft.sim.PqIndex.codeUsageDrift(s,
        Fixtures.shared("pq1", d)(buildPq1(s, d)))),

    // ── IVF-PQ: the production serving composition (Jégou's IVFADC /
    //    the faiss IVFPQ layout) — posting lists carry CODES, a probe
    //    partition-prunes to each query's routed cells and runs the LUT
    //    ADC over ~nProbe/nCells of the corpus at 16 B a row; raw
    //    vectors never enter the hot path. Oracle replays routing,
    //    frozen assignment, the closed-form encode, the per-candidate
    //    ADC, and the ascending rank
    "q332_ivfpq" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val dir = Fixtures.shared("ivfpq", d)(buildIvfPq(s, d))
      graft.sim.PqIndex.searchIvfPq(s, dir, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, nProbe = 2)
    }),

    // ── the corpus-wide ANN JOIN served off the STORED index: posting
    //    lists written with the corpus's own label cells and their exact
    //    means as centroids, so the stored join is value-identical to
    //    q260's in-memory annJoin (SHARED oracle) — semantic-dedup pair
    //    generation without re-reading or re-embedding the corpus
    "q338_ann_join_indexed" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val dir = scratchDir("graft_annjidx")
      Similarity.writeIvfIndex(
        e.select(col("vec_id"), Similarity.asDouble("embedding").as("v"),
          col("label").as("cell")),
        Similarity.ivfCentroids(e, "label", "embedding"), dir)
      Similarity.annJoinIndexed(s, dir, k = 3, nProbe = 2)
    }),

    // ── FILTERED search over the STORED index — q246's semantics on
    //    q312's layout (base on 90%, delta appended frozen): the
    //    vec_id ≡ 0 mod 3 predicate applies INSIDE the probed posting
    //    lists of the on-disk index, composed with the cell partition
    //    pruning — the "search within a tenant" serving query
    "q337_filtered_indexed" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val dir = Fixtures.shared("ivf90", d)(buildIvf90(s, d))
      Similarity.annIvfIndexedFiltered(s, dir, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", col("vec_id") % 3 === 0, k = 3, nProbe = 2)
    }),

    // ── ERASURE AUDIT: the compliance readout of a takedown — stage
    //    'tombstoned' (delete landed, fold not yet run) must report the
    //    deleted docs' physical rows as hidden-but-present; stage
    //    'compacted' must report zero hidden rows and physically_clean.
    //    The oracle derives both stages' counts from the corpus
    "q340_erasure_audit" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val dir = Fixtures.mutableCopy("lex5", d)(buildLex5(s, d))
      graft.text.LexIndex.deleteBatch(
        docs.filter(col("doc_id") % 7 === 3).select("doc_id"), dir,
        batchId = 0L)
      val before = graft.text.LexIndex.erasureAudit(s, dir)
        .withColumn("stage", lit("tombstoned"))
        .transform(graft.ops.Checkpoint.cut(_, eager = true)) // eager: pin the pre-compaction audit
      graft.text.LexIndex.compactIndex(s, dir)
      before.unionByName(graft.text.LexIndex.erasureAudit(s, dir)
        .withColumn("stage", lit("compacted")))
    }),

    // ── ERASURE AUDIT, PQ family — q340's compliance readout on the
    //    compressed axis, over BOTH layouts in one dir (flat code table:
    //    base 90% + delta appended; IVF-PQ posting lists over the full
    //    corpus): stage 'tombstoned' reports the deleted vectors' code
    //    AND posting rows as hidden-but-present, stage 'erased' (after
    //    compactIndex folds-with-erasure and vacuumIvfPq rewrites the
    //    cell lists) reports zero hidden rows and physically_clean
    "q341_pq_erasure_audit" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val dir = Fixtures.mutableCopy("pq1", d)(buildPq1(s, d))
      // compose the IVF-PQ store under the same root (both fixtures
      // write the identical closed-form codebook, so the overlap is
      // byte-equal to the sequential build this replaces)
      Fixtures.copyInto("ivfpq", d, dir)(buildIvfPq(s, d))
      graft.sim.PqIndex.deleteBatch(
        e.filter(col("vec_id") % 7 === 3).select("vec_id"), dir,
        batchId = 0L)
      val before = graft.sim.PqIndex.erasureAudit(s, dir)
        .withColumn("stage", lit("tombstoned"))
        .transform(graft.ops.Checkpoint.cut(_, eager = true)) // eager: pin the pre-erasure audit
      require(graft.sim.PqIndex.compactIndex(s, dir) == 1,
        "the code increment must fold")
      graft.sim.PqIndex.vacuumIvfPq(s, dir)
      before.unionByName(graft.sim.PqIndex.erasureAudit(s, dir)
        .withColumn("stage", lit("erased")))
    }),

    // ── ERASURE AUDIT, maintained-ANN family — q340's readout on the
    //    vector axis (base 90%, delta landed as a frozen-assignment
    //    increment): hidden posting rows before the fold, clean after
    "q342_ann_erasure_audit" -> ((s, d) => {
      import graft.streaming.StreamingAnn
      val e = Tables.embeddings(s, d)
      val dir = Fixtures.mutableCopy("sann1", d)(buildSann1(s, d))
      StreamingAnn.deleteBatch(
        e.filter(col("vec_id") % 7 === 3).select("vec_id"), dir,
        batchId = 0L)
      val before = StreamingAnn.erasureAudit(s, dir)
        .withColumn("stage", lit("tombstoned"))
        .transform(graft.ops.Checkpoint.cut(_, eager = true))
      require(StreamingAnn.compactIndex(s, dir) == 1,
        "the increment must fold")
      before.unionByName(StreamingAnn.erasureAudit(s, dir)
        .withColumn("stage", lit("erased")))
    }),

    // ── ERASURE AUDIT, dedup-signature family — q340's readout on the
    //    dedup axis: MinHash band rows are DERIVED CONTENT of the deleted
    //    docs, so the attestation needs them physically gone too. The
    //    oracle recomputes the deleted docs' band-row count from the
    //    corpus via the shared MinHash replay (docs too short to shingle
    //    contribute no band rows, exactly as the index holds none)
    "q343_dedup_erasure_audit" -> ((s, d) => {
      import graft.text.Dedup
      val docs = Tables.documents(s, d)
      val dir = Fixtures.mutableCopy("sig1", d)(buildSig1(s, d))
      Dedup.deleteFromSignatureIndex(
        docs.filter(col("doc_id") % 7 === 3).select("doc_id"), dir,
        batchId = 0L)
      val before = Dedup.erasureAudit(s, dir)
        .withColumn("stage", lit("tombstoned"))
        .transform(graft.ops.Checkpoint.cut(_, eager = true))
      require(Dedup.compactSignatureIndex(s, dir) == 1,
        "the band increment must fold")
      before.unionByName(Dedup.erasureAudit(s, dir)
        .withColumn("stage", lit("erased")))
    }),

    // ── PREDICATE-SHAPED DELETE, corpus-resolved: a DOMAIN TAKEDOWN
    //    ("remove everything from sources src3/src7") — the predicate
    //    resolves against the documents metadata to an id frame and lands
    //    as a normal tombstone batch; both stages must equal a
    //    from-scratch BM25 over the corpus minus those domains
    "q344_delete_by_source" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val dir = Fixtures.mutableCopy("lex5", d)(buildLex5(s, d))
      graft.text.LexIndex.deleteWhere(docs, "doc_id",
        col("source").isin("src3", "src7"), dir, batchId = 0L)
      val tombstoned = graft.text.LexIndex.bm25Indexed(s, dir, Bm25Terms)
        .withColumn("stage", lit("tombstoned"))
        .transform(graft.ops.Checkpoint.cut(_, eager = true)) // eager: pin the pre-compaction read
      graft.text.LexIndex.compactIndex(s, dir)
      tombstoned.unionByName(
        graft.text.LexIndex.bm25Indexed(s, dir, Bm25Terms)
          .withColumn("stage", lit("compacted")))
    }),

    // ── PREDICATE-SHAPED DELETE, artifact-resolved: a CONTENT TAKEDOWN
    //    ("remove every document containing term T") answered by the
    //    lexical index itself — the resolution is a bucket-pruned
    //    postings probe of T's hash bucket, never a corpus scan; the
    //    resolved ids tombstone the index and both stages must equal a
    //    from-scratch BM25 over the corpus minus the matching docs (the
    //    query still asks for T: its df is 0 afterwards, by construction)
    "q345_delete_by_term" -> ((s, d) => {
      val dir = Fixtures.mutableCopy("lex5", d)(buildLex5(s, d))
      graft.text.LexIndex.deleteWhereTermMatches(s, dir, Seq("stream"),
        batchId = 0L)
      val tombstoned = graft.text.LexIndex.bm25Indexed(s, dir, Bm25Terms)
        .withColumn("stage", lit("tombstoned"))
        .transform(graft.ops.Checkpoint.cut(_, eager = true))
      graft.text.LexIndex.compactIndex(s, dir)
      tombstoned.unionByName(
        graft.text.LexIndex.bm25Indexed(s, dir, Bm25Terms)
          .withColumn("stage", lit("compacted")))
    }),

    // ── LEXICAL-STATS DRIFT of the maintained lexical index — the aging
    //    monitor on the text axis (q331's contract for BM25): N/avgdl
    //    shift plus the increments' out-of-vocabulary term and occurrence
    //    mass against the base vocabulary, all from the stored index
    //    alone. Exact-integer counts, single-rounded quotients, ONE row
    "q336_lex_stats_drift" -> ((s, d) =>
      graft.text.LexIndex.statsDrift(s,
        Fixtures.shared("lex5", d)(buildLex5(s, d)))),

    // ── DELETE from the stored PQ tier: base codes on 90% under the
    //    closed-form frozen codebook, delta appended, every vec_id ≡ 3
    //    mod 7 tombstoned. Stage 'tombstoned' runs the LUT ADC through
    //    the anti-join, stage 'compacted' after the fold physically
    //    erased the code rows; both must equal a from-scratch encode of
    //    the FILTERED corpus (codes under a frozen codebook are
    //    per-vector, so deletion distributes exactly)
    "q335_pq_delete" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val dir = Fixtures.mutableCopy("pq1", d)(buildPq1(s, d))
      graft.sim.PqIndex.deleteBatch(
        e.filter(col("vec_id") % 7 === 3).select("vec_id"), dir,
        batchId = 0L)
      val q = e.filter(col("vec_id") < 10)
      val tombstoned = graft.sim.PqIndex.search(s, dir, q, "vec_id",
          "embedding", k = 5)
        .withColumn("stage", lit("tombstoned"))
        .transform(graft.ops.Checkpoint.cut(_, eager = true)) // eager: pin the pre-compaction read
      require(graft.sim.PqIndex.compactIndex(s, dir) == 1,
        "the increment must fold")
      tombstoned.unionByName(
        graft.sim.PqIndex.search(s, dir, q, "vec_id", "embedding", k = 5)
          .withColumn("stage", lit("compacted")))
    }),

    // ── DELETE from the stored lexical index (takedown/opt-out): base on
    //    80%, delta appended, then every doc_id ≡ 3 mod 7 tombstoned.
    //    Stage 'tombstoned' scores BEFORE any fold (the logical delete —
    //    eagerly pinned so compaction can't leak into it), stage
    //    'compacted' after compactIndex physically erased the rows; both
    //    must equal a from-scratch BM25 over the corpus MINUS the deleted
    //    docs — tf, df, N and avgdl all reflecting the deletion
    "q333_lex_delete" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val dir = Fixtures.mutableCopy("lex5", d)(buildLex5(s, d))
      graft.text.LexIndex.deleteBatch(
        docs.filter(col("doc_id") % 7 === 3).select("doc_id"), dir,
        batchId = 0L)
      val tombstoned = graft.text.LexIndex.bm25Indexed(s, dir, Bm25Terms)
        .withColumn("stage", lit("tombstoned"))
        .transform(graft.ops.Checkpoint.cut(_, eager = true)) // eager: pin the pre-compaction read
      graft.text.LexIndex.compactIndex(s, dir)
      tombstoned.unionByName(
        graft.text.LexIndex.bm25Indexed(s, dir, Bm25Terms)
          .withColumn("stage", lit("compacted")))
    }),

    // ── DELETE from the maintained ANN index: streaming layout (base on
    //    90% under its own label centroids, the delta as an increment),
    //    every vec_id ≡ 3 mod 7 tombstoned. Stage 'tombstoned' searches
    //    through the anti-join (logical), stage 'compacted' after the fold
    //    rewrote the base without the deleted rows (physical); both must
    //    equal a from-scratch frozen assignment of the FILTERED corpus —
    //    deletes never move a centroid until recluster
    "q334_ann_delete" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val dir = Fixtures.mutableCopy("sann1", d)(buildSann1(s, d))
      graft.streaming.StreamingAnn.deleteBatch(
        e.filter(col("vec_id") % 7 === 3).select("vec_id"), dir,
        batchId = 0L)
      val q = e.filter(col("vec_id") < 10)
      val tombstoned = graft.streaming.StreamingAnn.search(s, dir, q,
          "vec_id", "embedding", k = 3, nProbe = 2)
        .withColumn("stage", lit("tombstoned"))
        .transform(graft.ops.Checkpoint.cut(_, eager = true)) // eager: pin the pre-compaction read
      require(graft.streaming.StreamingAnn.compactIndex(s, dir) == 1,
        "the increment must fold")
      tombstoned.unionByName(
        graft.streaming.StreamingAnn.search(s, dir, q, "vec_id",
            "embedding", k = 3, nProbe = 2)
          .withColumn("stage", lit("compacted")))
    }),

    // ── MMR diversity re-ranking of the exact top-20 (λ = 7/10 as a
    //    rational — no float literal near the score), 5 greedy picks per
    //    query; the oracle replays every greedy step
    "q292_mmr" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.mmrRerank(e, e.filter(col("vec_id") < 3), "vec_id",
        "embedding", k = 5, topN = 20)
    }),

    // ── recall@10 of int8-quantized dot-product retrieval vs the exact
    //    float cosine top-10 — integer code dots, engine-portable
    "q293_quant_recall" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.quantRecall(e, e.filter(col("vec_id") < 5), "vec_id",
        "embedding", k = 10)
    }),

    // ── duplicated 8-token span fraction per doc (window-level substring
    //    dedup signal, Lee et al. 2022) — catches boilerplate and
    //    in-document repetition that doc-level MinHash misses
    "q307_dup_spans" -> ((s, d) =>
      Curate.dupSpans(Tables.documents(s, d), "doc_id", "text", n = 8)),

    // ── maximal duplicated spans: adjacent/overlapping duplicated 8-token
    //    windows coalesced into per-doc removable token ranges — the
    //    remove-list output of exact-substring dedup (Lee et al. 2022)
    "q310_dup_span_islands" -> ((s, d) =>
      Curate.dupSpanIslands(Tables.documents(s, d), "doc_id", "text",
        n = 8)),

    // ── apply the q310 remove-list: drop every token inside a maximal
    //    duplicated span, emit the cleaned corpus + removal accounting
    "q316_strip_dup_spans" -> ((s, d) =>
      Curate.removeDupSpans(Tables.documents(s, d), "doc_id", "text",
        n = 8)),

    // ── MinHash estimator calibration: per est_jaccard decile, the TRUE
    //    shingle-set Jaccard of every LSH candidate pair — the evidence
    //    behind the dedup threshold ("measure, don't guess")
    "q302_minhash_eval" -> ((s, d) =>
      Dedup.minhashEval(Tables.documents(s, d), "doc_id", "text")),

    // ── Neyman-allocated stratified sample: budget 1000 split by
    //    N_h·S_h over exact integer moments of n_chars, largest-remainder
    //    seats, salted-hash per-stratum picks via the binned selection
    "q303_neyman_sample" -> ((s, d) =>
      Mix.neymanSample(Tables.documents(s, d), "doc_id", "source",
        "n_chars", budget = 1000)),

    // ── embedding drift between snapshot halves (odd vs even vec_id)
    //    per label: fixed-point centroids, cosine between halves
    "q304_embedding_drift" -> ((s, d) =>
      Similarity.embeddingDrift(Tables.embeddings(s, d), "label",
        "embedding", col("vec_id") % 2 === 1)),

    // ── reciprocal-rank fusion of the exact-cosine and int8-quantized
    //    rankings (k0 = 60) — the calibration-free hybrid combiner
    "q298_rrf" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.rrfBruteQuant(e, e.filter(col("vec_id") < 5), "vec_id",
        "embedding", k = 10, k0 = 60, topK = 10)
    }),

    // ── product-quantized ANN with exact re-rank (rows-only: learned
    //    per-subspace KMeans codebooks aren't reproducible in the oracle
    //    engine — recall/determinism pinned by AnnSpec instead)
    "q113_pq_ann" -> ((s, d) => {
      // normalized embeddings feed THREE passes (codebook training's five
      // KMeans iterations, encode, and the exact re-rank) — lazy
      // localCheckpoint so the parquet scan + float→double + l2-normalize
      // runs once, not 7+ times, and the blocks free with the plan (a
      // persist would stay CacheManager-pinned for the session).
      val norm = Tables.embeddings(s, d).select(col("vec_id"),
          Similarity.l2Normalize(Similarity.asDouble("embedding")).as("nv"))
        .transform(graft.ops.Checkpoint.cut(_, eager = false))
      val cb = Similarity.pqTrain(norm, "nv", m = 8, ksub = 16, maxIter = 5)
      val codes = Similarity.pqEncode(norm, "vec_id", "nv", cb)
      Similarity.annPqRerank(codes, cb, norm,
        norm.filter(col("vec_id") < 10), "vec_id", "nv",
        k = 10, shortlist = 50)
    }),

    // ── PQ encode + ADC ranking with the FIXED closed-form codebook:
    //    training excluded, so the q113 family's search math (nearest-
    //    codeword argmin + asymmetric distance) is deterministic arithmetic
    //    the oracle replicates value-for-value
    "q113b_pq_fixed" -> ((s, d) => {
      import s.implicits._
      val e = Tables.embeddings(s, d)
      val codes = Similarity.pqEncode(e, "vec_id", "embedding", FixedCodebook)
      val qdf = Seq((-1L, FixedQuery)).toDF("vec_id", "qv")
      val adc = Similarity.annPq(codes, FixedCodebook, qdf, "vec_id", "qv",
          k = Int.MaxValue)
        .select(col("vec_id"), col("adist"), col("rank"))
      codes.select(col("vec_id"),
          expr("array_join(transform(codes, c -> cast(c AS STRING)), ',')")
            .as("codes_str"))
        .join(adc, "vec_id")
    }),

    // ── CCNet-style LM quality scoring: interpolated Kneser–Ney bigram
    //    perplexity of every document under the corpus's own LM (the
    //    standard curation signal; train + score are two scan-shaped
    //    passes, counts shuffle at vocabulary size)
    "q248_lm_perplexity" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.text.NgramLm.kneserNeyScore(docs, docs, "doc_id", "text")
    }),

    // ── CCNet head/middle/tail bucketing on the q248 perplexities:
    //    per-language quartile fences + the deterministic ppm keep
    "q255_ccnet_buckets" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val scored = graft.text.NgramLm
        .kneserNeyScore(docs, docs, "doc_id", "text")
        .join(docs.select("doc_id", "lang"), "doc_id")
      Curate.perplexityBuckets(scored, "doc_id", "lang", "perplexity")
    }),

    // ── INCREMENTALLY-MAINTAINED KN-LM: the stored index is the bigram
    //    type-count table (additive across batches); two batch merges must
    //    reproduce the from-scratch full-corpus LM exactly — the oracle is
    //    q248's full-corpus SQL VERBATIM, so the hash check IS the
    //    incremental ≡ from-scratch proof
    "q259_lm_incremental" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val old = docs.filter(col("doc_id") % 10 =!= 0)
      val delta = docs.filter(col("doc_id") % 10 === 0)
      val stored = graft.text.NgramLm.kneserNeyCounts(old, "doc_id", "text")
      val merged = graft.text.NgramLm.kneserNeyMergeCounts(stored,
        graft.text.NgramLm.kneserNeyCounts(delta, "doc_id", "text"))
      graft.text.NgramLm.kneserNeyScoreFromCounts(merged, docs, "doc_id",
        "text")
    }),

    // ── multinomial Naive Bayes provenance classifier: train on the
    //    corpus's own source labels, score every doc — the deterministic
    //    stand-in for the fastText domain/quality filters (integer
    //    sufficient statistics, fully value-checked)
    "q256_nb_domain" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.text.NaiveBayes.trainScore(docs, docs, "doc_id", "source", "text")
    }),

    // ── CLASSIFIER CALIBRATION: NB trained on folds 1-4, scored on fold
    //    0 with full softmax posteriors → reliability bins, ECE, and the
    //    multi-class Brier score — the trust-the-filter evaluation
    "q282_calibration" -> ((s, d) => {
      val folded = graft.ops.Stats.kfoldAssign(Tables.documents(s, d),
        "doc_id", 5)
      val train = folded.filter(col("fold") =!= 0)
      val test = folded.filter(col("fold") === 0)
      val post = graft.text.NaiveBayes.posteriors(
        graft.text.NaiveBayes.scoreAll(train, test, "doc_id", "source",
          "text"), "doc_id")
      graft.ops.Stats.calibrationReport(post, "doc_id", "label", "p",
        test.select("doc_id", "source"), "source")
    }),

    // ── END-TO-END CURATION LOOP (CCNet-style): the rule-based quality
    //    filter (q89) labels the corpus keep/drop, NB trains on folds 1-4
    //    to IMITATE the rules from raw text, and the held-out fold 0
    //    calibration report says whether the learned filter can replace
    //    the rules at the next 100 TB shard — q89 + q256 + q282 composed
    "q314_quality_loop" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val labeled = docs.join(
        Curate.filterPipeline(docs, "doc_id", "text")
          .select(col("doc_id"),
            when(col("keep") === 1, lit("keep")).otherwise(lit("drop"))
              .as("quality")), Seq("doc_id"))
      val folded = graft.ops.Stats.kfoldAssign(labeled, "doc_id", 5)
      val train = folded.filter(col("fold") =!= 0)
      val test = folded.filter(col("fold") === 0)
      val post = graft.text.NaiveBayes.posteriors(
        graft.text.NaiveBayes.scoreAll(train, test, "doc_id", "quality",
          "text"), "doc_id")
      graft.ops.Stats.calibrationReport(post, "doc_id", "label", "p",
        test.select("doc_id", "quality"), "quality")
    }),

    // ── WHERE does the learned filter disagree with the rules: NB
    //    trained on the rule labels scores the whole corpus back, and the
    //    per-source false-keep/false-drop rollup is the audit that says
    //    which slices the classifier can't imitate (q314's companion —
    //    calibration says IF to trust it, this says WHERE not to)
    "q317_filter_audit" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val labeled = docs.join(
        Curate.filterPipeline(docs, "doc_id", "text")
          .select(col("doc_id"),
            when(col("keep") === 1, lit("keep")).otherwise(lit("drop"))
              .as("quality")), Seq("doc_id"))
      val pred = graft.text.NaiveBayes.trainScore(labeled, labeled,
        "doc_id", "quality", "text")
      labeled.select(col("doc_id"), col("source"), col("quality"))
        .join(pred.select(col("doc_id"), col("pred_label")), Seq("doc_id"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("pred_label") === col("quality"), 1))
            .as("n_agree"),
          count(when(col("pred_label") === "keep" &&
            col("quality") === "drop", 1)).as("n_false_keep"),
          count(when(col("pred_label") === "drop" &&
            col("quality") === "keep", 1)).as("n_false_drop"))
        .withColumn("agree_rate",
          round(col("n_agree").cast("double") / col("n_docs"), 6))
    }),

    // ── DID THE LEARNED FILTER DRIFT WITH THE CORPUS: train the q314 NB
    //    filter on the PRIOR snapshot's rule labels only, apply it to the
    //    prior snapshot AND the new shard (doc_id%5=4), and diff per-source
    //    keep-rates — the incremental-curation readout that pairs with
    //    q315's cluster diff (a source whose keep-rate moves is a source
    //    whose incoming distribution moved past the trained filter)
    "q319_filter_drift" -> ((s, d) =>
      Curate.filterDrift(Tables.documents(s, d), "doc_id", "text",
        "source", col("doc_id") % 5 === 4)),

    // ── sliding-window chunking with overlap (64-token window, 48 stride)
    "q115_chunk_overlap" -> ((s, d) =>
      Curate.chunkOverlap(Tables.documents(s, d), "doc_id", "text",
        window = 64, stride = 48)),

    // ── materialize a training mix from per-source epoch targets
    //    (floor copies + salted-hash fractional copy; exact .25 steps)
    "q116_mix_materialize" -> ((s, d) =>
      Mix.mixMaterialize(Tables.documents(s, d), "doc_id", "source",
          Map("src0" -> 2.5, "src1" -> 0.25, "src2" -> 0.0, "src3" -> 1.75),
          defaultEpochs = 1.0)
        .select("doc_id", "source", "copy_idx")),

    // ── top-5 terms per doc by smoothed tf-idf (sklearn idf form)
    "q112_tfidf" -> ((s, d) =>
      graft.text.Retrieval.tfIdfTopK(Tables.documents(s, d), "doc_id",
        "text", k = 5)),

    // ── deterministic k-per-stratum downsample (md5-ordered "reservoir")
    "q106_source_sample" -> ((s, d) =>
      graft.ops.Relational.limitPerGroup(Tables.documents(s, d), 50,
          Seq("source"),
          Seq(md5(col("doc_id").cast("string")), col("doc_id")))
        .select("doc_id", "source")),

    // ── BPE encode with a fixed merge table (the tokenizer-apply step;
    //    q101 trains the table, this applies one). All rules have l≠r, so
    //    greedy per-pass merging equals left-to-right non-overlapping
    //    string replacement — which is how the oracle recomputes it.
    "q108_bpe_encode" -> ((s, d) => {
      val rules = BpeEncodeRules.zipWithIndex.map { case ((l, r), i) =>
        graft.text.Bpe.MergeRule(i, l, r, 0L)
      }
      graft.text.Bpe.segment(Tables.documents(s, d), "doc_id", "text", rules)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"),
          sum(size(col("syms"))).cast("long").as("n_tokens"))
    }))

  /** Query terms for q102 (mixed document frequencies in the test corpus). */
  private val Bm25Terms = Seq("join", "hash", "filter", "stream")

  /** q167/q168 fixture: 12 gradient-PNG groups × 4 brightness-shifted
    * members (near-dups within a group; groups well separated — measured
    * within-group cosine ≥ 0.99987, cross-group ≤ 0.99816, so the 0.9995
    * threshold splits them with margin on both sides). */
  private val ImgGroups = 12
  private val ImgMembers = 4
  private val ImgMinSim = 0.9995
  private val ImgPlanes = 4
  private val ImgDim = 6 // [mean_r, mean_g, mean_b, var_r, var_g, var_b]

  private def gradAssets(s: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    (0 until ImgGroups).flatMap(g => (0 until ImgMembers).map(m =>
        ((g * ImgMembers + m).toLong,
          graft.multimodal.Multimodal.gradPngBytes(g, m))))
      .toDF("asset_id", "content")
      .repartition(8, col("asset_id"))
  }

  /** Fixed merge table for q108, rank order; every rule has l≠r (see the
    * query comment — required for the replace-based oracle equivalence). */
  private val BpeEncodeRules =
    Seq(("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"))

  // ───────────────────────── DuckDB oracle SQL ─────────────────────────

  private def h64d(e: String) = s"('0x' || substr(md5($e),1,15))::BIGINT"

  /** Interpolated Kneser–Ney bigram LM scoring as a reusable CTE chain
    * ending in `lm(doc_id, n_bigrams, avg_logloss, perplexity)` —
    * q248 selects it directly; q255 builds CCNet buckets on top. */
  private lazy val lmCtes =
    s"""$toksCte,
       |bg AS MATERIALIZED (SELECT doc_id, b.v AS v, b.u AS u FROM (
       | SELECT doc_id, unnest(list_transform(generate_series(1, len(w)-1),
       |   i -> {'v': w[i], 'u': w[i+1]})) AS b
       | FROM toks WHERE len(w) >= 2)),
       |cvw AS MATERIALIZED (SELECT v, u, CAST(count(*) AS BIGINT) AS cvw
       | FROM bg GROUP BY 1, 2),
       |ctx AS (SELECT v, CAST(sum(cvw) AS BIGINT) AS cv,
       |  CAST(count(*) AS BIGINT) AS n1p_v FROM cvw GROUP BY 1),
       |cont AS (SELECT u, CAST(count(*) AS BIGINT) AS n1p_w
       | FROM cvw GROUP BY 1),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n1p FROM cvw),
       |sc AS (SELECT b.doc_id,
       |  coalesce(CAST(n1p_w AS DOUBLE) / CAST(n1p AS DOUBLE),
       |    1.0 / (CAST(n1p AS DOUBLE) + 1.0)) AS pcont,
       |  c.cvw, x.cv, x.n1p_v
       | FROM bg b LEFT JOIN cvw c USING (v, u) LEFT JOIN ctx x USING (v)
       | LEFT JOIN cont USING (u) CROSS JOIN tot),
       |p AS (SELECT doc_id, CASE WHEN cv IS NULL THEN pcont
       |  ELSE greatest(coalesce(CAST(cvw AS DOUBLE), 0.0) - 0.75, 0.0)
       |      / CAST(cv AS DOUBLE)
       |    + 0.75 * CAST(n1p_v AS DOUBLE) / CAST(cv AS DOUBLE) * pcont
       |  END AS p FROM sc),
       |a AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |  sum(CAST(-ln(p) AS DECIMAL(28,12))) AS snll FROM p GROUP BY 1),
       |lm AS MATERIALIZED (SELECT doc_id, n_bigrams,
       |  round(CAST(snll AS DOUBLE) / n_bigrams, 6) AS avg_logloss,
       |  round(exp(CAST(snll AS DOUBLE) / n_bigrams), 6) AS perplexity
       | FROM a)""".stripMargin
  private val toksCte =
    raw"toks AS (SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') AS w FROM documents)"
  private def shingleExpr(n: Int): String = {
    val parts = (0 until n).map(k => s"w[i+$k]").mkString(" || ' ' || ")
    s"CASE WHEN len(w) >= $n THEN list_transform(generate_series(1, len(w)-${n - 1}), i -> $parts) ELSE [] END"
  }
  private def inList(words: Seq[String]) = words.map(w => s"'$w'").mkString(",")

  // one base hash per shingle + 16 affine permutations mod 2^31-1, generated
  // from the same Dedup.Perms constants the Spark side uses
  private val mhCols = (0 until Dedup.NumHashes).map { i =>
    val (a, b) = Dedup.Perms(i)
    s"list_min(list_transform(bh, h -> ($a * h + $b) % ${Dedup.MinhashP})) AS mh$i"
  }.mkString(", ")
  private val bandCols = (0 until Dedup.NumBands).map { b =>
    val cs = (Dedup.RowsPerBand * b until Dedup.RowsPerBand * (b + 1))
      .map(i => s"mh$i::VARCHAR").mkString(" || ',' || ")
    s"${h64d(cs)} AS band$b"
  }.mkString(", ")
  private val sigCte =
    s"""$toksCte,
       |sh AS (SELECT doc_id, ${shingleExpr(3)} AS sh FROM toks),
       |bhc AS (SELECT doc_id, list_transform(sh, x -> ${h64d("x")} % ${Dedup.MinhashP}) AS bh FROM sh),
       |mh AS (SELECT doc_id, $mhCols FROM bhc),
       |sig AS (SELECT doc_id, mh.* EXCLUDE (doc_id), $bandCols FROM mh)""".stripMargin

  /** LSH candidate pairs with MinHash Jaccard estimate, shared by q29 and the
    * q75 connected-components oracle (identical semantics to
    * `Dedup.minhashCandidates` at the default bucket cap). */
  private val candCte: String = {
    val bandUnion = (0 until Dedup.NumBands).map(b =>
      s"SELECT doc_id, $b AS band_idx, band$b AS band_key FROM sig").mkString(" UNION ALL ")
    val matches = (0 until Dedup.NumHashes).map(i =>
      s"(CASE WHEN sa.mh$i = sb.mh$i THEN 1 ELSE 0 END)").mkString(" + ")
    s"""bands AS ($bandUnion),
       |bsz AS (SELECT band_idx, band_key, count(*) AS bucket_n FROM bands GROUP BY 1, 2),
       |ok AS (SELECT bands.* FROM bands JOIN bsz USING (band_idx, band_key)
       |  WHERE bucket_n <= ${Dedup.DefaultMaxBucket}),
       |cpairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM ok a JOIN ok b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       |    AND a.doc_id < b.doc_id),
       |cand AS (SELECT id_a, id_b, ($matches)::DOUBLE / 16 AS est_jaccard
       |  FROM cpairs JOIN sig sa ON id_a = sa.doc_id JOIN sig sb ON id_b = sb.doc_id)""".stripMargin
  }

  private val simhashBits = (0 until 32).map(j =>
    s"(CASE WHEN 2*list_sum(list_transform(hs, h -> (h >> $j) & 1)) >= n THEN ${1L << j} ELSE 0 END)")
    .mkString(" + ")

  private val planes = Similarity.hyperplanes(NPlanes, Dim)
  /** The ONE SQL rendering of the LSH bucket (sign bits of plane dots) and
    * the rounded cosine — every oracle that buckets or scores must go
    * through these, so a change to the sign convention or the rounding
    * cannot silently diverge between oracles. */
  private def bucketExprOf(v: String, ps: Seq[Seq[Int]]): String =
    ps.zipWithIndex.map { case (p, j) =>
      s"(CASE WHEN ${Similarity.planeDotSql(v, p)} >= 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")
  private val bucketExpr = bucketExprOf("v", planes)
  private val qBucketExpr = bucketExprOf("qv", planes)
  private def cosSqlAB(a: String, b: String, dim: Int = 64) =
    s"round(list_sum(list_transform(generate_series(1,$dim), i -> $a[i]*$b[i])) / " +
      s"(sqrt(list_sum(list_transform($a, x -> x*x))) * sqrt(list_sum(list_transform($b, x -> x*x)))), 6)"
  private val cosSql = cosSqlAB("qv", "v")

  /** NB-calibration replay shared by q282 and q314: callers supply the
    * CTE chain ending in tk(doc_id, source, w, fold); everything from
    * the class-conditional counts to the reliability bins is identical. */
  private def nbCalibrationSqlFrom(tkCtes: String): String =
    raw"""WITH $tkCtes,
         |tt AS MATERIALIZED (SELECT source AS c, unnest(w) AS tok FROM tk
         | WHERE fold != 0),
         |cvc AS MATERIALIZED (SELECT c, tok, CAST(count(*) AS BIGINT) AS cnt
         | FROM tt GROUP BY 1, 2),
         |cs AS (SELECT c, CAST(sum(cnt) AS BIGINT) AS toks FROM cvc GROUP BY 1),
         |vv AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM cvc),
         |pr AS (SELECT source AS c, CAST(count(*) AS BIGINT) AS nd
         | FROM tk WHERE fold != 0 GROUP BY 1),
         |nt AS (SELECT CAST(count(*) AS BIGINT) AS ndtot FROM tk WHERE fold != 0),
         |st AS MATERIALIZED (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS n
         | FROM (SELECT doc_id, unnest(w) AS tok FROM tk WHERE fold = 0)
         | GROUP BY 1, 2),
         |tm AS (SELECT st.doc_id, cs.c,
         |  CAST(st.n * ln(CAST(coalesce(cvc.cnt, 0) + 1 AS DOUBLE)
         |    / CAST(cs.toks + vv.v AS DOUBLE)) AS DECIMAL(28,12)) AS lp
         | FROM st CROSS JOIN cs CROSS JOIN vv
         | LEFT JOIN cvc ON cvc.c = cs.c AND cvc.tok = st.tok),
         |sc AS (SELECT doc_id, c, sum(lp) AS slp FROM tm GROUP BY 1, 2),
         |fin AS (SELECT sc.doc_id, sc.c,
         |  round(CAST(slp AS DOUBLE)
         |    + ln(CAST(pr.nd AS DOUBLE) / CAST(nt.ndtot AS DOUBLE)), 6)
         |    AS logp
         | FROM sc JOIN pr USING (c) CROSS JOIN nt),
         |mx AS (SELECT *, max(logp) OVER (PARTITION BY doc_id) AS m FROM fin),
         |ex AS (SELECT doc_id, c, CAST(exp(logp - m) AS DECIMAL(28,12)) AS e
         | FROM mx),
         |zz AS (SELECT *, sum(e) OVER (PARTITION BY doc_id) AS z FROM ex),
         |post AS (SELECT doc_id, c AS label,
         |  round(CAST(e AS DOUBLE) / CAST(z AS DOUBLE), 6) AS p FROM zz),
         |jt AS (SELECT p.doc_id, p.label, p.p,
         |  CASE WHEN p.label = d.source THEN 1 ELSE 0 END AS hit
         | FROM post p JOIN (SELECT doc_id, source FROM tk WHERE fold = 0) d
         |   USING (doc_id)),
         |db AS (SELECT doc_id,
         |  sum(CAST((p - hit) * (p - hit) AS DECIMAL(28,12)))
         |    + CAST(1 - max(hit) AS DECIMAL(28,12)) AS b
         | FROM jt GROUP BY 1),
         |br AS (SELECT CAST(sum(b) AS DOUBLE) / count(*) AS brier FROM db),
         |tp AS (SELECT doc_id, p, hit FROM (
         |  SELECT *, row_number() OVER (PARTITION BY doc_id
         |    ORDER BY p DESC, label) AS rn FROM jt) WHERE rn = 1),
         |bn AS (SELECT least(CAST(floor(p * 10) AS BIGINT), 9) AS bin,
         |  CAST(count(*) AS BIGINT) AS n,
         |  sum(CAST(p AS DECIMAL(28,12))) AS cs2,
         |  CAST(sum(hit) AS BIGINT) AS hits FROM tp GROUP BY 1)
         |SELECT bin, n,
         | round(CAST(cs2 AS DOUBLE) / n, 6) AS avg_conf,
         | round(CAST(hits AS DOUBLE) / n, 6) AS accuracy,
         | round(CAST(sum(CAST(CAST(n AS DOUBLE) *
         |     abs(CAST(cs2 AS DOUBLE) / n - CAST(hits AS DOUBLE) / n)
         |     AS DECIMAL(28,12))) OVER () AS DOUBLE)
         |   / CAST(sum(n) OVER () AS BIGINT), 6) AS ece,
         | round(brier, 6) AS brier
         |FROM bn CROSS JOIN br""".stripMargin
  private val cosSqlAV = cosSqlAB("qv", "a.v")

  /** q264 and q312 share this replay: the on-disk index is value-
    * identical to in-memory incremental assembly (assign distributes
    * over union under frozen centroids). */
  private lazy val annJoinOracleSql =
    s"""WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |cent AS (SELECT label AS cid, i AS pos,
       |  CAST(sum(CAST(floor(v[i]*1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)/1000000.0/count(*) AS cx
       |  FROM e, generate_series(1,64) g(i) GROUP BY 1, 2),
       |cv AS (SELECT cid, list(cx ORDER BY pos) AS cv FROM cent GROUP BY cid),
       |q AS (SELECT vec_id AS q_id, v AS qv FROM e),
       |routed AS (SELECT q_id, qv, cid FROM (
       |  SELECT q_id, qv, cid, row_number() OVER (PARTITION BY q_id
       |    ORDER BY ${cosSqlAB("qv", "cv")} DESC, cid) AS rn FROM q, cv) WHERE rn <= 2),
       |s AS (SELECT q_id, vec_id, $cosSql AS sim
       |  FROM e JOIN routed r ON e.label = r.cid AND e.vec_id != r.q_id)
       |SELECT q_id, vec_id, sim, rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank FROM s)
       |WHERE rank <= 3""".stripMargin

  private lazy val annIncrementalOracleSql =
    s"""WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |cent AS (SELECT label AS cid, i AS pos,
         |  CAST(sum(CAST(floor(v[i]*1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)/1000000.0/count(*) AS cx
         |  FROM e, generate_series(1,64) g(i) GROUP BY 1, 2),
         |cv AS (SELECT cid, list(cx ORDER BY pos) AS cv FROM cent GROUP BY cid),
         |asn AS (SELECT vec_id, v, cid FROM (
         |  SELECT e.vec_id, e.v, cv.cid, row_number() OVER (PARTITION BY e.vec_id
         |    ORDER BY ${cosSqlAB("v", "cv")} DESC, cid) AS rn FROM e, cv) WHERE rn = 1),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
         |routed AS (SELECT q_id, qv, cid FROM (
         |  SELECT q_id, qv, cid, row_number() OVER (PARTITION BY q_id
         |    ORDER BY ${cosSqlAB("qv", "cv")} DESC, cid) AS rn FROM q, cv) WHERE rn <= 2),
         |s AS (SELECT q_id, a.vec_id, $cosSqlAV AS sim
         |  FROM asn a JOIN routed r ON a.cid = r.cid AND a.vec_id != r.q_id)
         |SELECT q_id, vec_id, sim, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank FROM s)
         |WHERE rank <= 3""".stripMargin

  /** MMR oracle: exact top-`topN` candidates (q33 chain), pairwise
    * candidate cosines, then `k` greedy steps unrolled CTE-for-CTE —
    * each step the same (7·sim − 3·pen)/10 argmax the Spark side runs. */
  private def mmrOracleSql(k: Int, topN: Int): String = {
    val steps = (2 to k).map { i =>
      s"""pen$i AS (SELECT p.q_id, p.va AS vec_id, max(p.psim) AS pen
         | FROM pw p JOIN sel${i - 1} s ON s.q_id = p.q_id
         |   AND s.vec_id = p.vb
         | GROUP BY 1, 2),
         |st$i AS (SELECT q_id, vec_id, score FROM (
         |  SELECT r.q_id, r.vec_id,
         |    (7 * r.sim - 3 * p.pen) / CAST(10 AS DOUBLE) AS score,
         |    row_number() OVER (PARTITION BY r.q_id
         |      ORDER BY (7 * r.sim - 3 * p.pen) / CAST(10 AS DOUBLE) DESC,
         |        r.vec_id) AS rn
         |  FROM cand r
         |  LEFT JOIN sel${i - 1} sx ON sx.q_id = r.q_id
         |    AND sx.vec_id = r.vec_id
         |  JOIN pen$i p ON p.q_id = r.q_id AND p.vec_id = r.vec_id
         |  WHERE sx.vec_id IS NULL) WHERE rn = 1),
         |sel$i AS (SELECT * FROM sel${i - 1} UNION ALL
         | SELECT q_id, vec_id, $i AS pick, score FROM st$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT vec_id,
       |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       | FROM embeddings),
       |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 3),
       |sc AS (SELECT q_id, vec_id, $cosSql AS sim, v FROM e, q
       | WHERE vec_id != q_id),
       |cand AS MATERIALIZED (SELECT q_id, vec_id, sim, v FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY sim DESC, vec_id) AS rank FROM sc) WHERE rank <= $topN),
       |pw AS MATERIALIZED (SELECT x.q_id, x.vec_id AS va, y.vec_id AS vb,
       |  ${cosSqlAB("x.v", "y.v")} AS psim
       | FROM cand x JOIN cand y ON x.q_id = y.q_id
       |   AND x.vec_id != y.vec_id),
       |sel1 AS (SELECT q_id, vec_id, 1 AS pick, score FROM (
       |  SELECT q_id, vec_id,
       |    (7 * sim - 3 * CAST(0 AS DOUBLE)) / CAST(10 AS DOUBLE) AS score,
       |    row_number() OVER (PARTITION BY q_id
       |      ORDER BY (7 * sim - 3 * CAST(0 AS DOUBLE))
       |        / CAST(10 AS DOUBLE) DESC, vec_id) AS rn
       |  FROM cand) WHERE rn = 1),
       |$steps
       |SELECT q_id, pick, vec_id, round(score, 6) AS mmr_score
       |FROM sel$k""".stripMargin
  }

  /** Closed-form recomputation of the q167/q168 gradient-fixture pixel
    * statistics (mirrors `Multimodal.gradDims`/`gradChannels`): enumerate
    * every (asset, x, y), evaluate the integer channel formulas, aggregate
    * exact integer sums, derive mean/variance with the same double
    * operation order the Spark side uses — bit-identical values. */
  private val imgFeatsCtes = {
    val n = ImgGroups * ImgMembers
    s"""ia AS (SELECT range AS asset_id, range // $ImgMembers AS g,
       |    range % $ImgMembers AS m FROM range($n)),
       |idm AS (SELECT asset_id, g, m, 3 + g % 4 AS w, 2 + g % 3 AS h FROM ia),
       |ipx AS (SELECT asset_id, w, h,
       |    (g*97) % 200 + 30 + m + x*(1 + g % 3) + y*2 AS r,
       |    (g*53) % 180 + 40 + m + x*(2 + g % 2) + y*(1 + g % 3) AS gc,
       |    (g*71) % 190 + 25 + m + x + y*(2 + g % 2) AS b
       |  FROM idm, generate_series(0, 5) gx(x), generate_series(0, 3) gy(y)
       |  WHERE x < w AND y < h),
       |iag AS (SELECT asset_id, any_value(w) AS w, any_value(h) AS h,
       |    count(*) AS n, sum(r) AS sr, sum(gc) AS sg, sum(b) AS sb,
       |    sum(r*r) AS srr, sum(gc*gc) AS sgg, sum(b*b) AS sbb
       |  FROM ipx GROUP BY 1),
       |ift AS (SELECT asset_id, CAST(w AS INT) AS width,
       |    CAST(h AS INT) AS height, CAST(n AS BIGINT) AS n_px,
       |    CAST(sr AS DOUBLE)/n AS mean_r, CAST(sg AS DOUBLE)/n AS mean_g,
       |    CAST(sb AS DOUBLE)/n AS mean_b,
       |    CAST(srr AS DOUBLE)/n - (CAST(sr AS DOUBLE)/n)*(CAST(sr AS DOUBLE)/n) AS var_r,
       |    CAST(sgg AS DOUBLE)/n - (CAST(sg AS DOUBLE)/n)*(CAST(sg AS DOUBLE)/n) AS var_g,
       |    CAST(sbb AS DOUBLE)/n - (CAST(sb AS DOUBLE)/n)*(CAST(sb AS DOUBLE)/n) AS var_b
       |  FROM iag)""".stripMargin
  }

  /** q168 oracle: features → fixed-plane LSH buckets → rounded-cosine
    * filter → recursive reachability closure (the clustersCtes shape on
    * the image pair graph). */
  private val imgClustersSql = {
    val bexpr = bucketExprOf("v", Similarity.hyperplanes(ImgPlanes, ImgDim))
    def cos6(a: String, b: String) = cosSqlAB(a, b, ImgDim)
    s"""WITH RECURSIVE $imgFeatsCtes,
       |iv AS (SELECT asset_id,
       |  [mean_r, mean_g, mean_b, var_r, var_g, var_b] AS v FROM ift),
       |ib AS (SELECT asset_id AS vid, v, $bexpr AS bucket FROM iv),
       |ip AS (SELECT a.vid AS id_a, b.vid AS id_b
       |  FROM ib a JOIN ib b ON a.bucket = b.bucket AND a.vid < b.vid
       |  WHERE ${cos6("a.v", "b.v")} >= CAST($ImgMinSim AS DOUBLE)),
       |ie AS (SELECT id_a AS v, id_b AS u FROM ip
       |  UNION ALL SELECT id_b, id_a FROM ip),
       |ir AS (SELECT asset_id AS v, asset_id AS lbl FROM iv
       |  UNION
       |  SELECT e.v, r.lbl FROM ie e JOIN ir r ON r.v = e.u),
       |icl AS (SELECT v AS asset_id, min(lbl) AS cluster_id FROM ir GROUP BY v)
       |SELECT asset_id, cluster_id,
       |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       |  CAST(asset_id = cluster_id AS INT) AS keep
       |FROM icl""".stripMargin
  }

  /** q172 oracle: rebuild the two-layer neighbor graph edge-for-edge and
    * replay the beam search with one unrolled CTE pair per round — every
    * step is rounded-cosine + id-tie-break deterministic arithmetic.
    * `corpusWhere` restricts the graph's membership (the delete replay:
    * a takedown's from-scratch truth is the graph over the FILTERED
    * corpus); `queryWhere` restricts the query set to live vectors;
    * `candWhere` (a predicate builder over a vec_id column reference)
    * restricts the BEAM — entries and every round's scored candidates —
    * to the surviving pool while the graph itself keeps its full
    * membership (the q349 filtered-search replay: a filter is per-query,
    * never a restatement).
    *
    * Every CTE is `AS MATERIALIZED`: DuckDB inlines CTEs referenced more
    * than once, and each beam round references the graph and the
    * previous beam twice — un-hinted, the replay re-evaluates the whole
    * graph build exponentially across the 6 rounds (measured 269 s →
    * 0.7 s at sf0.01, value-identical). The driver's oracle compare runs
    * four of these replays, so this hint is what keeps its correctness
    * gate inside any plausible time budget. */
  private def graphAnnOracleSql(corpusWhere: String = "TRUE",
                                queryWhere: String = "vec_id < 10",
                                candWhere: String => String =
                                  _ => "TRUE",
                                hublessEnt: Boolean = false,
                                epoch: Int = 0): String = {
    val (fineSlices, coarseSlice) = Similarity.nswPlaneSlices(Dim, 8, 3, epoch)
    def bexpr(ps: Seq[Seq[Int]]) = bucketExprOf("v", ps)
    val edgeCos = cosSqlAB("a.v", "b.v")
    def layerCte(in: String, out: String) =
      s"""$out AS MATERIALIZED (SELECT src, dst FROM (
         |  SELECT a.vid AS src, b.vid AS dst,
         |    row_number() OVER (PARTITION BY a.vid
         |      ORDER BY $edgeCos DESC, b.vid) AS rn
         |  FROM $in a JOIN $in b ON a.bucket = b.bucket AND a.vid != b.vid)
         |  WHERE rn <= 12)""".stripMargin
    val fineCtes = fineSlices.zipWithIndex.map { case (planes, t) =>
      s"""cf$t AS MATERIALIZED (SELECT vec_id AS vid, v, ${bexpr(planes)} AS bucket FROM e),
         |${layerCte(s"cf$t", s"gf$t")}""".stripMargin
    }.mkString(",\n")
    val fineUnion = fineSlices.indices
      .map(t => s"SELECT src, dst FROM gf$t").mkString(" UNION ALL ")
    val rounds = (1 to 6).map { r =>
      s"""c$r AS MATERIALIZED (SELECT DISTINCT q_id, vec_id FROM (
         |  SELECT b.q_id, g.dst AS vec_id
         |  FROM b${r - 1} b JOIN g ON b.vec_id = g.src
         |  UNION ALL SELECT q_id, vec_id FROM b${r - 1})),
         |s$r AS MATERIALIZED (SELECT c.q_id, c.vec_id, ${cosSqlAB("q.qv", "ev.v")} AS sim
         |  FROM c$r c JOIN ev ON c.vec_id = ev.vid JOIN q ON c.q_id = q.q_id
         |  WHERE c.vec_id != c.q_id AND ${candWhere("c.vec_id")}),
         |b$r AS MATERIALIZED (SELECT q_id, vec_id, sim FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id
         |    ORDER BY sim DESC, vec_id) AS rn FROM s$r) WHERE rn <= 24)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings WHERE $corpusWhere),
       |ev AS MATERIALIZED (SELECT vec_id AS vid, v FROM e),
       |$fineCtes,
       |ch AS MATERIALIZED (SELECT vid, v, ${bexpr(coarseSlice)} AS bucket
       |  FROM (SELECT vec_id AS vid, v FROM e WHERE vec_id % 16 = 0)),
       |${layerCte("ch", "gc")},
       |gd AS MATERIALIZED ($fineUnion UNION ALL SELECT src, dst FROM gc),
       |g AS MATERIALIZED (SELECT DISTINCT src, dst FROM
       |  (SELECT src, dst FROM gd UNION ALL SELECT dst, src FROM gd)),
       |q AS MATERIALIZED (SELECT vec_id AS q_id, v AS qv FROM e WHERE $queryWhere),
       |ent AS MATERIALIZED (SELECT vec_id FROM e
       |  WHERE ${if (hublessEnt) "TRUE" else "vec_id % 16 = 0"}
       |  AND ${candWhere("vec_id")}
       |  ORDER BY vec_id LIMIT 16),
       |c0x AS MATERIALIZED (SELECT q_id, ent.vec_id FROM q, ent),
       |s0 AS MATERIALIZED (SELECT c.q_id, c.vec_id, ${cosSqlAB("q.qv", "ev.v")} AS sim
       |  FROM c0x c JOIN ev ON c.vec_id = ev.vid JOIN q ON c.q_id = q.q_id
       |  WHERE c.vec_id != c.q_id AND ${candWhere("c.vec_id")}),
       |b0 AS MATERIALIZED (SELECT q_id, vec_id, sim FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY sim DESC, vec_id) AS rn FROM s0) WHERE rn <= 24),
       |$rounds
       |SELECT q_id, vec_id, sim, rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY sim DESC, vec_id) AS rank FROM b6)
       |WHERE rank <= 5""".stripMargin
  }

  /** The q330 closed-form flat-PQ encode + LUT-ADC replay with the
    * candidate (code) side restricted to `candWhere` — shared by the
    * filtered flat-PQ search (q351) and the IVF-PQ brute fallback arm
    * (q358), whose routing-dropped exact ADC is the same computation. */
  private def pqFilteredOracleSql(candWhere: String): String =
    s"""WITH e AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |enc AS (SELECT vec_id, v,
       |  list_transform([0, 1, 2, 3], s ->
       |    list_transform([0, 1, 2, 3], c ->
       |      list_sum(list_transform(generate_series(1, 16), i ->
       |        (v[s*16 + i] - (((s*131 + c*37 + i*17) % 19) - 9) / 10.0)
       |      * (v[s*16 + i] - (((s*131 + c*37 + i*17) % 19) - 9) / 10.0)))))
       |    AS dists
       |  FROM e),
       |cod AS (SELECT vec_id,
       |  list_transform(dists, ds ->
       |    list_position(ds, list_aggregate(ds, 'min')) - 1) AS codes
       |  FROM enc WHERE $candWhere),
       |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
       |ad AS (SELECT q.q_id, c.vec_id,
       |  round(list_sum(list_transform([0, 1, 2, 3], s ->
       |    list_sum(list_transform(generate_series(1, 16), i ->
       |      (q.qv[s*16 + i]
       |        - (((s*131 + c.codes[s+1]*37 + i*17) % 19) - 9) / 10.0)
       |    * (q.qv[s*16 + i]
       |        - (((s*131 + c.codes[s+1]*37 + i*17) % 19) - 9) / 10.0))))), 6)
       |    AS adist
       |  FROM cod c, q WHERE c.vec_id != q.q_id)
       |SELECT q_id, vec_id, adist, rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY adist ASC, vec_id ASC) AS rank FROM ad)
       |WHERE rank <= 5""".stripMargin

  /** Shared CTE prefix for the connected-components oracles (q75/q84/q137):
    * recursive reachability closure over the ≥0.5 candidate edges. */
  private val clustersCtes =
    s"""WITH RECURSIVE $sigCte,
       |$candCte,
       |edges AS (SELECT id_a AS v, id_b AS u FROM cand WHERE est_jaccard >= 0.5
       |  UNION ALL SELECT id_b, id_a FROM cand WHERE est_jaccard >= 0.5),
       |reach AS (SELECT doc_id AS v, doc_id AS lbl FROM documents
       |  UNION
       |  SELECT e.v, r.lbl FROM edges e JOIN reach r ON r.v = e.u),
       |cl AS (SELECT v AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY v)""".stripMargin

  /** q75 oracle — shared by q84, whose large-star/small-star formulation
    * must produce identical labels. */
  private val clustersOracleSql =
    s"""$clustersCtes
       |SELECT doc_id, cluster_id,
       |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       |  CAST(doc_id = cluster_id AS INT) AS keep
       |FROM cl""".stripMargin

  /** q315 oracle: the q75 replay for the new snapshot, a second
    * min-label recursion over the old↔old edge restriction for the old
    * one, then the per-cluster diff rollup. */
  private val clusterDiffOracleSql =
    s"""$clustersCtes,
       |edges2 AS (SELECT id_a AS v, id_b AS u FROM cand
       |  WHERE est_jaccard >= 0.5 AND id_a % 5 != 4 AND id_b % 5 != 4
       |  UNION ALL SELECT id_b, id_a FROM cand
       |  WHERE est_jaccard >= 0.5 AND id_a % 5 != 4 AND id_b % 5 != 4),
       |reach2 AS (SELECT doc_id AS v, doc_id AS lbl FROM documents
       |  WHERE doc_id % 5 != 4
       |  UNION
       |  SELECT e.v, r.lbl FROM edges2 e JOIN reach2 r ON r.v = e.u),
       |cl2 AS (SELECT v AS doc_id, min(lbl) AS cluster_id FROM reach2
       |  GROUP BY v),
       |jd AS (SELECT cl.doc_id, cl.cluster_id, cl2.cluster_id AS oc
       |  FROM cl LEFT JOIN cl2 USING (doc_id)),
       |ag AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN oc IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_new_docs,
       |  CAST(count(DISTINCT oc) AS BIGINT) AS n_old_clusters
       | FROM jd GROUP BY 1)
       |SELECT *, CASE WHEN n_old_clusters = 0 THEN 'new'
       |  WHEN n_old_clusters > 1 THEN 'merged'
       |  WHEN n_new_docs > 0 THEN 'grown'
       |  ELSE 'unchanged' END AS status
       |FROM ag""".stripMargin

  /** q137 oracle: the deduped corpus — keep exactly the cluster
    * representatives (min doc id per component). */
  private val dedupKeepOracleSql =
    s"""$clustersCtes
       |SELECT d.doc_id, d.source, d.n_chars
       |FROM documents d JOIN cl ON d.doc_id = cl.doc_id
       |WHERE cl.doc_id = cl.cluster_id""".stripMargin

  /** q80 oracle: new-batch band join with both-sides bucket cap — shared by
    * q83, whose stored-index path must produce identical pairs. */
  private val incrementalOracleSql = {
    val bandUnion = (0 until Dedup.NumBands).map(b =>
      s"SELECT doc_id, $b AS band_idx, band$b AS band_key FROM sig").mkString(" UNION ALL ")
    val matches = (0 until Dedup.NumHashes).map(i =>
      s"(CASE WHEN sa.mh$i = sb.mh$i THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH $sigCte,
       |ib AS (SELECT doc_id, doc_id % 5 = 4 AS is_new, band_idx, band_key
       |  FROM ($bandUnion) u),
       |ibsz AS (SELECT band_idx, band_key, count(*) AS bucket_n FROM ib GROUP BY 1, 2),
       |iok AS (SELECT ib.* FROM ib JOIN ibsz USING (band_idx, band_key)
       |  WHERE bucket_n <= ${Dedup.DefaultMaxBucket}),
       |ip AS (SELECT DISTINCT least(a.doc_id, b.doc_id) AS id_a,
       |    greatest(a.doc_id, b.doc_id) AS id_b
       |  FROM iok a JOIN iok b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       |    AND b.is_new AND a.doc_id != b.doc_id
       |    AND (NOT a.is_new OR a.doc_id < b.doc_id))
       |SELECT id_a, id_b, ($matches)::DOUBLE / 16 AS est_jaccard
       |FROM ip JOIN sig sa ON id_a = sa.doc_id JOIN sig sb ON id_b = sb.doc_id""".stripMargin
  }

  private val gramCte3 =
    s"""gs AS (SELECT doc_id, unnest(list_distinct(${shingleExpr(3)})) AS gstr FROM toks),
       |g AS (SELECT doc_id, ${h64d("gstr")} AS g FROM gs)""".stripMargin

  // chunked passages: 1-based inclusive DuckDB list slice, ceil for the
  // trailing partial chunk, floor of 1 chunk for empty docs
  private val chunkCte =
    raw"""chunks AS (
       |  SELECT doc_id, i AS chunk_idx,
       |    array_to_string(w[CAST(i*3+1 AS BIGINT):CAST(i*3+3 AS BIGINT)], ' ') AS chunk
       |  FROM toks, unnest(generate_series(0, CAST(greatest(1, ceil(len(w)/3.0)) AS BIGINT) - 1)) AS u(i)),
       |hashed AS (SELECT doc_id, chunk_idx, ${h64d("chunk")} AS chunk_hash, chunk FROM chunks)""".stripMargin

  // q53-style normalization (lowercase, strip control chars, collapse
  // whitespace) — the tokenization base for the BM25/BPE-encode oracles
  /** The q320 BM25→rerank→metrics replay — shared with q324, whose
    * both-stages-stored path is value-identical by the index contracts. */
  private lazy val rerankEvalOracleSql: String =
      s"""WITH $normCte,
         |tkb AS (SELECT doc_id, regexp_split_to_array(t, '\\s+') AS w FROM nrm),
         |dls AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM tkb),
         |stats AS (SELECT count(*) AS n_docs,
         |  CAST(sum(CAST(dl AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS avgdl FROM dls),
         |tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM (
         |    SELECT tkb.doc_id, dls.dl, unnest(tkb.w) AS term
         |    FROM tkb JOIN dls USING (doc_id))
         |  WHERE term IN (${inList(Seq("join", "hash", "filter", "stream"))})
         |  GROUP BY 1, 2, 3),
         |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |scored AS (SELECT doc_id,
         |  CAST(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * (tf * (1.25 + 1)) /
         |    (tf + 1.25 * (1 - 0.75 + 0.75 * dl / avgdl)) AS DECIMAL(28,12)) AS part
         |  FROM tf JOIN dfreq USING (term) CROSS JOIN stats),
         |bmsc AS (SELECT doc_id, round(CAST(sum(part) AS DOUBLE), 6) AS bm25
         | FROM scored GROUP BY doc_id),
         |cand AS (SELECT doc_id AS vec_id FROM (
         |  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id)
         |    AS rn FROM bmsc) WHERE rn <= 50),
         |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
         |res AS (SELECT q_id, vec_id, rank FROM (
         |  SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
         |    ORDER BY sim DESC, vec_id) AS rank FROM (
         |    SELECT q_id, e.vec_id, $cosSql AS sim
         |    FROM e JOIN cand USING (vec_id) CROSS JOIN q
         |    WHERE e.vec_id != q.q_id))
         | WHERE rank <= 5),
         |tru AS (SELECT q_id, vec_id, rank FROM (
         |  SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
         |    ORDER BY sim DESC, vec_id) AS rank FROM (
         |    SELECT q_id, vec_id, $cosSql AS sim
         |    FROM e, q WHERE vec_id != q_id))
         | WHERE rank <= 5),
         |nt AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_truth FROM tru GROUP BY 1),
         |idcg AS (SELECT nt.q_id,
         |  sum(CAST(1.0/log2(g.r + 1) AS DECIMAL(28,12))) AS idcg
         | FROM nt, generate_series(1, 5) g(r) WHERE g.r <= nt.n_truth GROUP BY 1),
         |hits AS (SELECT r.q_id, CAST(count(*) AS BIGINT) AS hits,
         |  min(r.rank) AS frst,
         |  sum(CAST(1.0/log2(r.rank + 1) AS DECIMAL(28,12))) AS dcg
         | FROM res r JOIN tru USING (q_id, vec_id) GROUP BY 1),
         |pq AS (SELECT nt.q_id, nt.n_truth, coalesce(h.hits, 0) AS hits,
         |  round(CAST(coalesce(h.hits, 0) AS DOUBLE) /
         |    CAST(least(5, nt.n_truth) AS DOUBLE), 6) AS recall,
         |  round(coalesce(1.0 / CAST(h.frst AS DOUBLE), 0), 6) AS mrr,
         |  round(coalesce(CAST(h.dcg AS DOUBLE), 0) /
         |    CAST(i.idcg AS DOUBLE), 6) AS ndcg
         | FROM nt JOIN idcg i USING (q_id) LEFT JOIN hits h USING (q_id))
         |SELECT q_id, n_truth, hits, recall, mrr, ndcg,
         |  round(CAST(sum(CAST(recall AS DECIMAL(28,12))) OVER () AS DOUBLE)
         |    / count(*) OVER (), 6) AS macro_recall,
         |  round(CAST(sum(CAST(mrr AS DECIMAL(28,12))) OVER () AS DOUBLE)
         |    / count(*) OVER (), 6) AS macro_mrr,
         |  round(CAST(sum(CAST(ndcg AS DECIMAL(28,12))) OVER () AS DOUBLE)
         |    / count(*) OVER (), 6) AS macro_ndcg
         |FROM pq""".stripMargin

  /** The q102 BM25 replay — shared with q323, whose stored-index path is
    * value-identical by the union-distributive sufficient-statistics
    * contract. */
  /** The BM25 CTE chain over a given `nrm`-producing CTE — shared by the
    * plain (q102/q323) and the delete-filtered (q333) oracles. */
  private def bm25Ctes(norm: String): String =
    s"""$norm,
       |tk AS (SELECT doc_id, regexp_split_to_array(t, '\\s+') AS w FROM nrm),
       |dls AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM tk),
       |stats AS (SELECT count(*) AS n_docs,
       |  CAST(sum(CAST(dl AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS avgdl FROM dls),
       |tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM (
       |    SELECT tk.doc_id, dls.dl, unnest(tk.w) AS term
       |    FROM tk JOIN dls USING (doc_id))
       |  WHERE term IN (${inList(Seq("join", "hash", "filter", "stream"))})
       |  GROUP BY 1, 2, 3),
       |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |scored AS (SELECT doc_id,
       |  CAST(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * (tf * (1.25 + 1)) /
       |    (tf + 1.25 * (1 - 0.75 + 0.75 * dl / avgdl)) AS DECIMAL(28,12)) AS part
       |  FROM tf JOIN dfreq USING (term) CROSS JOIN stats)""".stripMargin

  /** The q327 fused stored-hybrid replay, parameterized by tenant
    * predicates: `docWhere` restricts the BM25 corpus (candidates AND
    * df/N/avgdl), `vecWhere` the ANN candidates and the exhaustive
    * truth; assignment and routing stay full-corpus (the frozen-
    * centroid contract). "TRUE"/"TRUE" is exactly the unfiltered q327. */
  private def hybridRrfOracleSql(docWhere: String,
                                 vecWhere: String): String =
    s"""WITH ${normCteWhere(docWhere)},
         |tkb AS (SELECT doc_id, regexp_split_to_array(t, '\\s+') AS w FROM nrm),
         |dls AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM tkb),
         |stats AS (SELECT count(*) AS n_docs,
         |  CAST(sum(CAST(dl AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS avgdl FROM dls),
         |tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM (
         |    SELECT tkb.doc_id, dls.dl, unnest(tkb.w) AS term
         |    FROM tkb JOIN dls USING (doc_id))
         |  WHERE term IN (${inList(Bm25Terms)})
         |  GROUP BY 1, 2, 3),
         |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |scored AS (SELECT doc_id,
         |  CAST(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * (tf * (1.25 + 1)) /
         |    (tf + 1.25 * (1 - 0.75 + 0.75 * dl / avgdl)) AS DECIMAL(28,12)) AS part
         |  FROM tf JOIN dfreq USING (term) CROSS JOIN stats),
         |bmsc AS (SELECT doc_id, round(CAST(sum(part) AS DOUBLE), 6) AS bm25
         | FROM scored GROUP BY doc_id),
         |cand AS (SELECT doc_id AS vec_id, rn AS lrank FROM (
         |  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id)
         |    AS rn FROM bmsc) WHERE rn <= 50),
         |e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
         |lexr AS (SELECT q.q_id, c.vec_id, c.lrank AS rank
         |  FROM cand c, q WHERE c.vec_id != q.q_id),
         |cent AS (SELECT label AS cid, i AS pos,
         |  CAST(sum(CAST(floor(v[i]*1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)/1000000.0/count(*) AS cx
         |  FROM e, generate_series(1,64) g(i) GROUP BY 1, 2),
         |cv AS (SELECT cid, list(cx ORDER BY pos) AS cv FROM cent GROUP BY cid),
         |asn AS (SELECT vec_id, v, cid FROM (
         |  SELECT e.vec_id, e.v, cv.cid, row_number() OVER (PARTITION BY e.vec_id
         |    ORDER BY ${cosSqlAB("v", "cv")} DESC, cid) AS rn FROM e, cv) WHERE rn = 1),
         |routed AS (SELECT q_id, qv, cid FROM (
         |  SELECT q_id, qv, cid, row_number() OVER (PARTITION BY q_id
         |    ORDER BY ${cosSqlAB("qv", "cv")} DESC, cid) AS rn FROM q, cv) WHERE rn <= 2),
         |sv AS (SELECT q_id, a.vec_id, $cosSqlAV AS sim
         |  FROM asn a JOIN routed r ON a.cid = r.cid AND a.vec_id != r.q_id
         |  WHERE $vecWhere),
         |annr AS (SELECT q_id, vec_id, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id
         |    ORDER BY sim DESC, vec_id) AS rank FROM sv) WHERE rank <= 5),
         |t AS (SELECT q_id, vec_id,
         |  CAST(CAST(1 AS DOUBLE) / (60 + rank) AS DECIMAL(28,12)) AS t
         | FROM (SELECT * FROM lexr UNION ALL SELECT * FROM annr)),
         |fsum AS (SELECT q_id, vec_id, sum(t) AS s FROM t GROUP BY 1, 2),
         |res AS (SELECT q_id, vec_id, rank FROM (
         |  SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
         |    ORDER BY s DESC, vec_id) AS rank FROM fsum) WHERE rank <= 5),
         |tru AS (SELECT q_id, vec_id, rank FROM (
         |  SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
         |    ORDER BY sim DESC, vec_id) AS rank FROM (
         |    SELECT q_id, vec_id, $cosSql AS sim
         |    FROM e, q WHERE vec_id != q_id AND ($vecWhere)))
         | WHERE rank <= 5),
         |nt AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_truth FROM tru GROUP BY 1),
         |idcg AS (SELECT nt.q_id,
         |  sum(CAST(1.0/log2(g.r + 1) AS DECIMAL(28,12))) AS idcg
         | FROM nt, generate_series(1, 5) g(r) WHERE g.r <= nt.n_truth GROUP BY 1),
         |hits AS (SELECT r.q_id, CAST(count(*) AS BIGINT) AS hits,
         |  min(r.rank) AS frst,
         |  sum(CAST(1.0/log2(r.rank + 1) AS DECIMAL(28,12))) AS dcg
         | FROM res r JOIN tru USING (q_id, vec_id) GROUP BY 1),
         |pq AS (SELECT nt.q_id, nt.n_truth, coalesce(h.hits, 0) AS hits,
         |  round(CAST(coalesce(h.hits, 0) AS DOUBLE) /
         |    CAST(least(5, nt.n_truth) AS DOUBLE), 6) AS recall,
         |  round(coalesce(1.0 / CAST(h.frst AS DOUBLE), 0), 6) AS mrr,
         |  round(coalesce(CAST(h.dcg AS DOUBLE), 0) /
         |    CAST(i.idcg AS DOUBLE), 6) AS ndcg
         | FROM nt JOIN idcg i USING (q_id) LEFT JOIN hits h USING (q_id))
         |SELECT q_id, n_truth, hits, recall, mrr, ndcg,
         |  round(CAST(sum(CAST(recall AS DECIMAL(28,12))) OVER () AS DOUBLE)
         |    / count(*) OVER (), 6) AS macro_recall,
         |  round(CAST(sum(CAST(mrr AS DECIMAL(28,12))) OVER () AS DOUBLE)
         |    / count(*) OVER (), 6) AS macro_mrr,
         |  round(CAST(sum(CAST(ndcg AS DECIMAL(28,12))) OVER () AS DOUBLE)
         |    / count(*) OVER (), 6) AS macro_ndcg
         |FROM pq""".stripMargin

  private lazy val bm25OracleSql: String =
    s"""WITH ${bm25Ctes(normCte)}
       |SELECT doc_id, count(*) AS n_terms,
       |  round(CAST(sum(part) AS DOUBLE), 6) AS bm25
       |FROM scored GROUP BY doc_id""".stripMargin

  private val normCte =
    raw"""nrm AS (SELECT doc_id,
       |  trim(regexp_replace(regexp_replace(lower(text), '[[:cntrl:]]', ' ', 'g'),
       |    '\s+', ' ', 'g')) AS t FROM documents)""".stripMargin

  /** [[normCte]] over a filtered documents set — the delete oracles'
    * from-scratch-on-the-filtered-corpus replay. */
  private def normCteWhere(pred: String) =
    raw"""nrm AS (SELECT doc_id,
       |  trim(regexp_replace(regexp_replace(lower(text), '[[:cntrl:]]', ' ', 'g'),
       |    '\s+', ' ', 'g')) AS t FROM documents WHERE $pred)""".stripMargin

  private val bpeEncodeSql: String = {
    // chr(1) separator: normalize replaced every control char with a space,
    // so it cannot collide with document content
    val enc = Seq(("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"))
      .foldLeft("cs") { case (acc, (l, r)) =>
        s"replace($acc, '$l' || chr(1) || '$r', '$l$r')"
      }
    s"""WITH $normCte,
       |w AS (SELECT doc_id, unnest(string_split(t, ' ')) AS word FROM nrm),
       |s AS (SELECT doc_id, array_to_string(string_split(word, ''), chr(1)) AS cs
       |  FROM w WHERE length(word) > 0),
       |e AS (SELECT doc_id, $enc AS enc FROM s)
       |SELECT doc_id, count(*) AS n_words,
       |  CAST(sum(len(string_split(enc, chr(1)))) AS BIGINT) AS n_tokens
       |FROM e GROUP BY doc_id""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q134_bigram_lm" ->
      s"""WITH $normCte,
         |tk AS (SELECT list_filter(regexp_split_to_array(t, '\\s+'),
         |    x -> length(x) > 0) AS w FROM nrm),
         |bi AS (SELECT w[i] AS w1, w[i + 1] AS w2
         |  FROM tk, unnest(generate_series(1, len(w) - 1)) AS u(i)
         |  WHERE len(w) >= 2),
         |ba AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY 1, 2),
         |bc AS (SELECT * FROM ba WHERE c12 >= 3),
         |u AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM ba GROUP BY 1)
         |SELECT w1, w2, c12, c1,
         |  round(CAST(c12 AS DOUBLE) / c1, 6) AS p
         |FROM bc JOIN u USING (w1)""".stripMargin,
    "q179_pmi" ->
      s"""WITH $normCte,
         |tk AS (SELECT list_filter(regexp_split_to_array(t, '\\s+'),
         |    x -> length(x) > 0) AS w FROM nrm),
         |bi AS (SELECT w[i] AS w1, w[i + 1] AS w2
         |  FROM tk, unnest(generate_series(1, len(w) - 1)) AS u(i)
         |  WHERE len(w) >= 2),
         |ba AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY 1, 2),
         |tot AS (SELECT CAST(sum(c12) AS BIGINT) AS n_bi FROM ba),
         |lft AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM ba GROUP BY 1),
         |rgt AS (SELECT w2, CAST(sum(c12) AS BIGINT) AS c2 FROM ba GROUP BY 1)
         |SELECT w1, w2, c12, c1, c2, n_bi,
         |  round(ln(CAST(c12 * n_bi AS DOUBLE) / CAST(c1 * c2 AS DOUBLE)), 6)
         |    AS pmi
         |FROM ba JOIN lft USING (w1) JOIN rgt USING (w2) CROSS JOIN tot
         |WHERE c12 >= 3""".stripMargin,
    "q182_zipf" ->
      s"""WITH $normCte,
         |tk AS (SELECT unnest(list_filter(regexp_split_to_array(t, '\\s+'),
         |    x -> length(x) > 0)) AS term FROM nrm),
         |c AS (SELECT term, count(*) AS c FROM tk GROUP BY 1
         |  HAVING count(*) >= 3),
         |r AS (SELECT term, c,
         |  row_number() OVER (ORDER BY c DESC, term ASC) AS rank FROM c),
         |x AS (SELECT ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y
         |  FROM r),
         |a AS (SELECT count(*) AS n_terms,
         |  CAST(sum(CAST(x AS DECIMAL(28,10))) AS DOUBLE) AS sx,
         |  CAST(sum(CAST(y AS DECIMAL(28,10))) AS DOUBLE) AS sy,
         |  CAST(sum(CAST(x * x AS DECIMAL(28,10))) AS DOUBLE) AS sxx,
         |  CAST(sum(CAST(y * y AS DECIMAL(28,10))) AS DOUBLE) AS syy,
         |  CAST(sum(CAST(x * y AS DECIMAL(28,10))) AS DOUBLE) AS sxy
         | FROM x)
         |SELECT n_terms,
         | CASE WHEN n_terms * sxx - sx * sx > 0
         |   THEN round((n_terms * sxy - sx * sy) / (n_terms * sxx - sx * sx), 6)
         | END AS slope,
         | CASE WHEN n_terms * sxx - sx * sx > 0
         |   THEN round((sy - (n_terms * sxy - sx * sy)
         |     / (n_terms * sxx - sx * sx) * sx) / n_terms, 6)
         | END AS intercept,
         | CASE WHEN n_terms * sxx - sx * sx > 0 AND n_terms * syy - sy * sy > 0
         |   THEN round((n_terms * sxy - sx * sy) * (n_terms * sxy - sx * sy)
         |     / ((n_terms * sxx - sx * sx) * (n_terms * syy - sy * sy)), 6)
         | END AS r2
         |FROM a""".stripMargin,
    "q191_heaps" ->
      s"""WITH $normCte,
         |tk AS (SELECT doc_id, list_filter(regexp_split_to_array(t, '\\s+'),
         |    x -> length(x) > 0) AS w FROM nrm),
         |pd AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n FROM tk),
         |fx AS (SELECT term, min(doc_id) AS fd FROM
         |  (SELECT doc_id, unnest(w) AS term FROM tk) GROUP BY 1),
         |nv AS (SELECT fd AS doc_id, count(*) AS v FROM fx GROUP BY 1),
         |cm AS (SELECT pd.doc_id,
         |  CAST(sum(pd.n) OVER wc AS BIGINT) AS ncum,
         |  CAST(sum(coalesce(nv.v, 0)) OVER wc AS BIGINT) AS vcum
         | FROM pd LEFT JOIN nv USING (doc_id)
         | WINDOW wc AS (ORDER BY pd.doc_id
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |x AS (SELECT ln(CAST(ncum AS DOUBLE)) AS x,
         |  ln(CAST(vcum AS DOUBLE)) AS y FROM cm
         | WHERE ncum > 0 AND vcum > 0),
         |a AS (SELECT count(*) AS n_docs,
         |  CAST(sum(CAST(x AS DECIMAL(28,10))) AS DOUBLE) AS sx,
         |  CAST(sum(CAST(y AS DECIMAL(28,10))) AS DOUBLE) AS sy,
         |  CAST(sum(CAST(x * x AS DECIMAL(28,10))) AS DOUBLE) AS sxx,
         |  CAST(sum(CAST(y * y AS DECIMAL(28,10))) AS DOUBLE) AS syy,
         |  CAST(sum(CAST(x * y AS DECIMAL(28,10))) AS DOUBLE) AS sxy
         | FROM x)
         |SELECT n_docs,
         | CASE WHEN n_docs * sxx - sx * sx > 0
         |   THEN round((n_docs * sxy - sx * sy) / (n_docs * sxx - sx * sx), 6)
         | END AS slope,
         | CASE WHEN n_docs * sxx - sx * sx > 0
         |   THEN round((sy - (n_docs * sxy - sx * sy)
         |     / (n_docs * sxx - sx * sx) * sx) / n_docs, 6)
         | END AS intercept,
         | CASE WHEN n_docs * sxx - sx * sx > 0 AND n_docs * syy - sy * sy > 0
         |   THEN round((n_docs * sxy - sx * sy) * (n_docs * sxy - sx * sy)
         |     / ((n_docs * sxx - sx * sx) * (n_docs * syy - sy * sy)), 6)
         | END AS r2
         |FROM a""".stripMargin,
    "q209_rake" ->
      raw"""WITH $normCte,
         |tk AS (SELECT doc_id, list_filter(regexp_split_to_array(t, '\s+'),
         |    x -> length(x) > 0) AS w FROM nrm),
         |px AS (SELECT doc_id, unnest(w) AS tok,
         |  unnest(range(1, len(w) + 1)) AS pos FROM tk),
         |st AS (SELECT doc_id, pos, tok,
         |  CASE WHEN tok IN ('the','a','of','and','to','in','is','that',
         |    'it','for') THEN 1 ELSE 0 END AS stop FROM px),
         |pid AS (SELECT doc_id, pos, tok, stop,
         |  CAST(sum(stop) OVER (PARTITION BY doc_id ORDER BY pos
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS pid FROM st),
         |ph AS (SELECT doc_id, pid, list(tok ORDER BY pos) AS words,
         |  CAST(count(*) AS BIGINT) AS len
         | FROM pid WHERE stop = 0 GROUP BY 1, 2),
         |wx AS (SELECT unnest(words) AS wd, len FROM ph),
         |ws AS (SELECT wd, count(*) AS freq,
         |  CAST(sum(len) AS BIGINT) AS deg FROM wx GROUP BY 1),
         |ws2 AS (SELECT wd, CAST(deg AS DOUBLE) / freq AS wscore FROM ws),
         |pw AS (SELECT doc_id, pid, array_to_string(words, ' ') AS phrase,
         |  unnest(words) AS wd FROM ph),
         |sc AS (SELECT doc_id, pid, phrase,
         |  CAST(sum(CAST(wscore AS DECIMAL(28,10))) AS DOUBLE) AS raw
         | FROM pw JOIN ws2 USING (wd) GROUP BY 1, 2, 3),
         |fin AS (SELECT phrase, count(*) AS n_mentions, min(raw) AS r
         | FROM sc GROUP BY 1)
         |SELECT phrase, n_mentions, round(r, 6) AS score FROM fin
         |ORDER BY score DESC, phrase LIMIT 50""".stripMargin,
    "q210_lexdiv" ->
      raw"""WITH $normCte,
         |tk AS (SELECT doc_id, list_filter(regexp_split_to_array(t, '\s+'),
         |    x -> length(x) > 0) AS w FROM nrm),
         |b AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
         |  CAST(len(list_distinct(w)) AS BIGINT) AS n_types FROM tk)
         |SELECT doc_id, n_tokens, n_types,
         | CASE WHEN n_tokens > 0
         |   THEN round(CAST(n_types AS DOUBLE) / n_tokens, 6) END AS ttr,
         | CASE WHEN n_tokens > 0
         |   THEN round(CAST(n_types AS DOUBLE)
         |     / sqrt(CAST(n_tokens AS DOUBLE)), 6) END AS guiraud,
         | CASE WHEN n_tokens > 1 AND n_types > 0
         |   THEN round(ln(CAST(n_types AS DOUBLE))
         |     / ln(CAST(n_tokens AS DOUBLE)), 6) END AS herdan
         |FROM b""".stripMargin,
    "q211_burstiness" ->
      raw"""WITH $normCte,
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM
         |  (SELECT doc_id, unnest(list_filter(
         |     regexp_split_to_array(t, '\s+'), x -> length(x) > 0)) AS term
         |   FROM nrm) GROUP BY 1, 2),
         |agg AS (SELECT term AS token, count(*) AS doc_freq,
         |  CAST(sum(tf) AS BIGINT) AS term_freq,
         |  count(CASE WHEN tf >= 2 THEN 1 END) AS n_multi
         | FROM tf GROUP BY 1)
         |SELECT token, doc_freq, term_freq, n_multi,
         | round(CAST(term_freq AS DOUBLE) / doc_freq, 6) AS burstiness,
         | round(CAST(n_multi AS DOUBLE) / doc_freq, 6) AS adaptation
         |FROM agg WHERE doc_freq >= 5""".stripMargin,
    "q228_readability" ->
      raw"""WITH $normCte,
         |tk AS (SELECT doc_id, t, list_filter(regexp_split_to_array(t, '\s+'),
         |    x -> length(x) > 0) AS w FROM nrm),
         |b AS (SELECT doc_id,
         |  CAST(len(w) AS BIGINT) AS n_words,
         |  greatest(1, CAST(len(regexp_extract_all(t, '[.!?]+')) AS BIGINT))
         |    AS n_sentences,
         |  coalesce(CAST(list_sum(list_transform(w, x -> greatest(1,
         |    len(regexp_extract_all(x, '[aeiouy]+'))))) AS BIGINT), 0)
         |    AS n_syllables
         | FROM tk)
         |SELECT doc_id, n_words, n_sentences, n_syllables,
         | CASE WHEN n_words > 0 THEN round(206.835
         |   - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
         |   - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)),
         |   6) END AS flesch_ease,
         | CASE WHEN n_words > 0 THEN round(0.39
         |   * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
         |   + 11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
         |   - 15.59, 6) END AS fk_grade
         |FROM b""".stripMargin,
    "q192_source_overlap" ->
      raw"""WITH nrm2 AS (SELECT source,
         |  trim(regexp_replace(regexp_replace(lower(text), '[[:cntrl:]]', ' ', 'g'),
         |    '\s+', ' ', 'g')) AS t FROM documents),
         |v AS (SELECT DISTINCT source AS s, term FROM
         |  (SELECT source, unnest(list_filter(regexp_split_to_array(t, '\s+'),
         |     x -> length(x) > 0)) AS term FROM nrm2)),
         |sz AS (SELECT s, CAST(count(*) AS BIGINT) AS vn FROM v GROUP BY 1)
         |SELECT a.s AS s1, b.s AS s2, sa.vn AS v1, sb.vn AS v2,
         |  count(*) AS n_common,
         |  round(CAST(count(*) AS DOUBLE)
         |    / CAST(sa.vn + sb.vn - count(*) AS DOUBLE), 6) AS jaccard
         |FROM v a JOIN v b USING (term)
         |JOIN sz sa ON sa.s = a.s JOIN sz sb ON sb.s = b.s
         |WHERE a.s < b.s
         |GROUP BY a.s, b.s, sa.vn, sb.vn""".stripMargin,
    "q193_kl" ->
      raw"""WITH nrm2 AS (SELECT source,
         |  trim(regexp_replace(regexp_replace(lower(text), '[[:cntrl:]]', ' ', 'g'),
         |    '\s+', ' ', 'g')) AS t FROM documents),
         |tk AS (SELECT source AS s,
         |  unnest(list_filter(regexp_split_to_array(t, '\s+'),
         |    x -> length(x) > 0)) AS term FROM nrm2),
         |c AS (SELECT s, term, count(*) AS c FROM tk GROUP BY 1, 2),
         |e AS (SELECT s, term, c,
         |  CAST(sum(c) OVER (PARTITION BY s) AS BIGINT) AS ns,
         |  CAST(sum(c) OVER (PARTITION BY term) AS BIGINT) AS ct,
         |  CAST(sum(c) OVER () AS BIGINT) AS nt FROM c),
         |t AS (SELECT s, ns, CAST((CAST(c AS DOUBLE) / ns)
         |  * ln((CAST(c AS DOUBLE) / ns) / (CAST(ct AS DOUBLE) / nt))
         |  AS DECIMAL(28,12)) AS term_v FROM e)
         |SELECT s AS source, max(ns) AS n_tokens, count(*) AS n_terms,
         |  round(CAST(sum(term_v) AS DOUBLE), 6) AS kl_nats
         |FROM t GROUP BY 1""".stripMargin,
    "q102_bm25" -> bm25OracleSql,
    // stored-index BM25 ≡ from-scratch BM25 (the sufficient statistics
    // are union-distributive over an append-only corpus)
    "q323_bm25_indexed" -> bm25OracleSql,
    // filtered BM25 replay: from-scratch BM25 over the tenant's corpus
    // alone — df/N/avgdl all from the surviving docs
    "q362_bm25_filtered" ->
      s"""WITH ${bm25Ctes(normCteWhere("doc_id % 3 = 0"))}
         |SELECT doc_id, count(*) AS n_terms,
         |  round(CAST(sum(part) AS DOUBLE), 6) AS bm25
         |FROM scored GROUP BY doc_id""".stripMargin,
    "q112_tfidf" ->
      s"""WITH $normCte,
         |tk AS (SELECT doc_id, unnest(regexp_split_to_array(t, '\\s+')) AS term FROM nrm),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tk
         |  WHERE length(term) > 0 GROUP BY 1, 2),
         |nd AS (SELECT count(*) AS n_docs FROM documents),
         |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |sc AS (SELECT doc_id, term, tf,
         |  tf * (ln(CAST(n_docs + 1 AS DOUBLE) / (df + 1)) + 1.0) AS tfidf
         |  FROM tf JOIN dfq USING (term) CROSS JOIN nd),
         |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
         |    ORDER BY tfidf DESC, term ASC) AS rank FROM sc)
         |SELECT doc_id, rank, term, tf, round(tfidf, 6) AS tfidf
         |FROM r WHERE rank <= 5""".stripMargin,
    "q115_chunk_overlap" ->
      raw"""WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
         |  FROM documents),
         |n AS (SELECT doc_id, w,
         |  CAST(greatest(1, ceil((len(w) - 64) / CAST(48 AS DOUBLE)) + 1) AS BIGINT) AS nc
         |  FROM toks),
         |c AS (SELECT doc_id, i AS chunk_idx,
         |  w[CAST(i*48+1 AS BIGINT):CAST(i*48+64 AS BIGINT)] AS cw
         |  FROM n, unnest(generate_series(0, nc - 1)) AS t(i))
         |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
         | CAST(len(cw) AS BIGINT) AS n_chunk_toks,
         | ${h64d("array_to_string(cw, ' ')")} AS chunk_hash
         |FROM c""".stripMargin,
    "q116_mix_materialize" ->
      """WITH e AS (SELECT doc_id, source,
        |  CAST(CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 0.25
        |    WHEN 'src2' THEN 0.0 WHEN 'src3' THEN 1.75 ELSE 1.0 END AS DOUBLE) AS eps
        |  FROM documents),
        |r AS (SELECT doc_id, source,
        |  CAST(floor(eps) AS BIGINT) +
        |  CASE WHEN (('0x' || substr(md5(doc_id || ':mix'), 1, 15))::BIGINT % 1000000)
        |         < (eps - floor(eps)) * 1000000 THEN 1 ELSE 0 END AS rep
        |  FROM e)
        |SELECT doc_id, source, CAST(i AS BIGINT) AS copy_idx
        |FROM r, unnest(generate_series(1, rep)) AS t(i)""".stripMargin,
    "q106_source_sample" ->
      """WITH r AS (SELECT doc_id, source,
        |  row_number() OVER (PARTITION BY source
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        | FROM documents)
        |SELECT doc_id, source FROM r WHERE rn <= 50""".stripMargin,
    "q108_bpe_encode" -> bpeEncodeSql,
    "q95_passage_dedup" ->
      s"""WITH $toksCte,
         |$chunkCte
         |SELECT doc_id, chunk_idx, chunk_hash,
         |  count(*) OVER (PARTITION BY chunk_hash) AS n_dups,
         |  CAST(row_number() OVER (PARTITION BY chunk_hash ORDER BY doc_id, chunk_idx) = 1 AS INT) AS keep
         |FROM hashed""".stripMargin,
    "q96_passage_strip" ->
      s"""WITH $toksCte,
         |$chunkCte,
         |v AS (SELECT doc_id, chunk_idx, chunk,
         |  row_number() OVER (PARTITION BY chunk_hash ORDER BY doc_id, chunk_idx) AS rn
         |FROM hashed),
         |agg AS (SELECT doc_id, string_agg(chunk, ' ' ORDER BY chunk_idx) AS clean_text
         |  FROM v WHERE rn = 1 GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(clean_text, '') AS clean_text
         |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id""".stripMargin,
    "q85_decontaminate" ->
      s"""WITH $toksCte,
         |$gramCte3,
         |ev AS (SELECT DISTINCT g FROM g WHERE doc_id % 10 = 7),
         |tr AS (SELECT * FROM g WHERE doc_id % 10 != 7),
         |sz AS (SELECT doc_id, count(*) AS n_grams FROM tr GROUP BY 1),
         |hit AS (SELECT doc_id, count(*) AS n_overlap FROM tr JOIN ev USING (g) GROUP BY 1)
         |SELECT sz.doc_id, n_grams, coalesce(n_overlap, 0) AS n_overlap,
         |  round(coalesce(n_overlap, 0)::DOUBLE / n_grams, 6) AS contamination,
         |  CAST(round(coalesce(n_overlap, 0)::DOUBLE / n_grams, 6) >= 0.2 AS INT) AS contaminated
         |FROM sz LEFT JOIN hit ON sz.doc_id = hit.doc_id""".stripMargin,
    "q86_mix_weights" ->
      raw"""WITH t AS (SELECT source, len(regexp_split_to_array(trim(text), '\s+'))::BIGINT AS t
         |  FROM documents),
         |c AS (SELECT source, count(*) AS n_docs, CAST(sum(t) AS BIGINT) AS n_tokens
         |  FROM t GROUP BY 1),
         |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM c),
         |r AS (SELECT source, n_docs, n_tokens,
         |  round(n_tokens::DOUBLE / total, 6) AS nat_share,
         |  round(pow(round(n_tokens::DOUBLE / total, 6), 0.5), 6) AS raw FROM c, tot),
         |z AS (SELECT CAST(sum(CAST(raw AS DECIMAL(18,6))) AS DOUBLE) AS z FROM r)
         |SELECT source, n_docs, n_tokens, nat_share,
         |  round(raw / z, 6) AS mix_weight,
         |  round(round(raw / z, 6) / nat_share, 6) AS epochs
         |FROM r, z""".stripMargin,
    "q87_domain_stats" ->
      raw"""WITH u AS (SELECT doc_id, n_chars,
         |  'https://' || CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END ||
         |  source || '-' || (doc_id % 7)::VARCHAR || '.' ||
         |  CASE WHEN doc_id % 3 = 0 THEN 'example.org'
         |       WHEN doc_id % 3 = 1 THEN 'sample.net' ELSE 'test.io' END ||
         |  substr('/a/b/c', 1, CAST((doc_id % 4) * 2 AS INT)) AS url FROM documents),
         |p AS (SELECT n_chars, regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host FROM u),
         |d AS (SELECT n_chars, host, regexp_extract(host, '([^.]+\.[^.]+)$$', 1) AS domain FROM p),
         |per AS (SELECT domain, count(*) AS n_docs, count(DISTINCT host) AS n_hosts,
         |  CAST(sum(n_chars) AS BIGINT) AS total_weight FROM d GROUP BY 1),
         |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS corpus_docs FROM per)
         |SELECT domain, n_docs, n_hosts, total_weight,
         |  round(n_docs::DOUBLE / corpus_docs, 6) AS doc_share FROM per, tot""".stripMargin,
    "q88_shared_ngrams" ->
      s"""WITH $toksCte,
         |$gramCte3,
         |dfq AS (SELECT g, count(*) AS ndoc FROM g GROUP BY 1),
         |per AS (SELECT doc_id, count(*) AS n_grams,
         |  CAST(sum(CASE WHEN ndoc >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
         |  FROM g JOIN dfq USING (g) GROUP BY 1)
         |SELECT doc_id, n_grams, n_shared,
         |  round(n_shared::DOUBLE / n_grams, 6) AS shared_frac FROM per""".stripMargin,
    "q89_filter_pipeline" ->
      s"""WITH $toksCte,
         |b AS (SELECT doc_id, len(w)::BIGINT AS ws_tokens,
         |  round(length(array_to_string(w, ''))::DOUBLE / len(w), 6) AS avg_token_len,
         |  ${shingleExpr(2)} AS g,
         |  round(len(list_filter(w, t -> t IN (${inList(TextOps.Stopwords("en"))})))::DOUBLE
         |    / len(w), 6) AS stop_ratio
         |  FROM toks),
         |c AS (SELECT doc_id, ws_tokens, avg_token_len,
         |  CASE WHEN len(g) > 0
         |    THEN round(1.0 - len(list_distinct(g))::DOUBLE / len(g), 6)
         |    ELSE 0.0 END AS dup_2gram_ratio, stop_ratio FROM b),
         |r AS (SELECT *, concat_ws(',',
         |  CASE WHEN ws_tokens < 10 THEN 'too_short' END,
         |  CASE WHEN ws_tokens > 5000 THEN 'too_long' END,
         |  CASE WHEN avg_token_len < 2.0 OR avg_token_len > 12.0 THEN 'bad_token_len' END,
         |  CASE WHEN dup_2gram_ratio > 0.3 THEN 'repetitive' END,
         |  CASE WHEN stop_ratio < 0.01 THEN 'low_stopword' END) AS reasons FROM c)
         |SELECT doc_id, ws_tokens, avg_token_len, dup_2gram_ratio, stop_ratio, reasons,
         |  CAST(reasons = '' AS INT) AS keep FROM r""".stripMargin,
    "q94_seq_pack" ->
      raw"""WITH t AS (SELECT doc_id, source,
         |  len(regexp_split_to_array(trim(text), '\s+'))::BIGINT AS ws_tokens,
         |  ${h64d("'ord:' || doc_id")} AS h FROM documents),
         |c AS (SELECT doc_id, source, ws_tokens,
         |  CAST(sum(ws_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS e FROM t)
         |SELECT doc_id, source, ws_tokens, e - ws_tokens AS offset,
         |  CAST(floor((e - ws_tokens) / 256.0) AS BIGINT) AS first_bin,
         |  CAST(floor((e - 1) / 256.0) AS BIGINT) AS last_bin
         |FROM c""".stripMargin,
    "q90_lsh_histogram" -> {
      val bandUnion = (0 until Dedup.NumBands).map(b =>
        s"SELECT doc_id, $b AS band_idx, band$b AS band_key FROM sig").mkString(" UNION ALL ")
      s"""WITH $sigCte,
         |bands AS ($bandUnion),
         |bsz AS (SELECT band_idx, band_key, count(*) AS bucket_n FROM bands GROUP BY 1, 2)
         |SELECT band_idx, bucket_n, count(*) AS n_buckets FROM bsz GROUP BY 1, 2""".stripMargin
    },
    "q92_semdedup" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |cent AS (SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT 8),
         |s AS (SELECT e.vec_id, e.v, cent.cid, ${cosSqlAB("e.v", "cent.cv")} AS sim FROM e, cent),
         |a AS (SELECT vec_id, v, cid AS cluster FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn FROM s)
         |  WHERE rn = 1),
         |dup AS (SELECT DISTINCT a.vec_id FROM a JOIN a b
         |  ON a.cluster = b.cluster AND b.vec_id < a.vec_id
         |  WHERE ${cosSqlAB("a.v", "b.v")} >= 0.35)
         |SELECT a.vec_id, a.cluster,
         |  CASE WHEN dup.vec_id IS NULL THEN 1 ELSE 0 END AS keep
         |FROM a LEFT JOIN dup ON a.vec_id = dup.vec_id""".stripMargin,
    "q83_incremental_indexed" -> incrementalOracleSql,
    "q84_star_clusters" -> clustersOracleSql,
    "q24_dedup_exact" ->
      """SELECT md5(lower(trim(text))) AS text_hash, min(doc_id) AS canonical_id, count(*) AS n_dups
        |FROM documents GROUP BY 1""".stripMargin,
    "q25_token_stats" ->
      s"""WITH $toksCte
         |SELECT doc_id, len(w)::BIGINT AS ws_tokens,
         | len(regexp_extract_all(text, '${TextOps.BpeishPattern}'))::BIGINT AS bpe_tokens,
         | round(length(array_to_string(w, ''))::DOUBLE / len(w), 6) AS avg_token_len
         |FROM toks JOIN documents USING (doc_id)""".stripMargin,
    "q26_quality" ->
      s"""WITH $toksCte,
         |raw AS (SELECT doc_id,
         |  (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::DOUBLE / length(text) AS pr,
         |  len(list_filter(w, t -> t IN (${inList(TextOps.Stopwords("en"))})))::DOUBLE / len(w) AS sr,
         |  length(regexp_replace(text, '[^A-Z]', '', 'g'))::DOUBLE / length(text) AS ur,
         |  len(w) AS n
         |FROM toks JOIN documents USING (doc_id))
         |SELECT doc_id, round(pr, 6) AS punct_ratio, round(sr, 6) AS stop_ratio,
         | round(ur, 6) AS upper_ratio,
         | round(1.0 / (1.0 + exp(-(sr*3.0 + ln(n::DOUBLE)*0.1 - pr*5.0))), 6) AS quality_score
         |FROM raw""".stripMargin,
    "q27_lang_id" ->
      s"""WITH $toksCte,
         |sc AS (SELECT doc_id,
         |  len(list_filter(w, t -> t IN (${inList(TextOps.Stopwords("en"))}))) AS en,
         |  len(list_filter(w, t -> t IN (${inList(TextOps.Stopwords("es"))}))) AS es,
         |  len(list_filter(w, t -> t IN (${inList(TextOps.Stopwords("fr"))}))) AS fr
         |FROM toks)
         |SELECT doc_id, CASE WHEN en + es + fr = 0 THEN 'und'
         |  WHEN en >= es AND en >= fr THEN 'en' WHEN es >= fr THEN 'es' ELSE 'fr' END AS lang_pred
         |FROM sc""".stripMargin,
    "q28_minhash_sig" -> s"WITH $sigCte SELECT * FROM sig",
    "q29_minhash_pairs" ->
      s"WITH $sigCte,\n$candCte\nSELECT id_a, id_b, est_jaccard FROM cand",
    "q75_dedup_clusters" -> clustersOracleSql,
    // incremental maintenance must reproduce the from-scratch answer —
    // the oracle IS the full-corpus clustering
    "q155_incremental_clusters" -> clustersOracleSql,
    "q315_cluster_diff" -> clusterDiffOracleSql,
    "q151_cluster_split" ->
      s"""$clustersCtes,
         |h AS (SELECT doc_id, cluster_id,
         |  ${h64d("'split:' || cluster_id")} % 100 AS h FROM cl)
         |SELECT doc_id, cluster_id,
         |  CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM h""".stripMargin,
    "q149_soft_dedup" ->
      s"""$clustersCtes,
         |sz AS (SELECT doc_id, cluster_id,
         |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size FROM cl)
         |SELECT doc_id, cluster_id, cluster_size,
         |  round(CAST(1 AS DOUBLE) / cluster_size, 6) AS weight,
         |  CAST((('0x' || substr(md5(doc_id::VARCHAR || ':dw'), 1, 15))::BIGINT
         |    % 1000000) * cluster_size < 1000000 AS INT) AS sampled
         |FROM sz""".stripMargin,
    "q137_dedup_keep" -> dedupKeepOracleSql,
    "q30_simhash" ->
      s"""WITH $toksCte,
         |hs AS (SELECT doc_id, list_transform(w, t -> ${h64d("t")}) AS hs, len(w) AS n FROM toks)
         |SELECT doc_id, $simhashBits AS simhash FROM hs""".stripMargin,
    "q244_containment" ->
      s"""WITH $toksCte,
         |gs AS (SELECT doc_id, source, unnest(list_distinct(${shingleExpr(2)})) AS gstr FROM toks),
         |g AS (SELECT doc_id, source, ${h64d("gstr")} AS g FROM gs),
         |sizes AS (SELECT doc_id, count(*) AS n_g FROM g GROUP BY 1),
         |dfreq AS (SELECT source, g, count(*) AS ndoc FROM g GROUP BY 1, 2),
         |k AS (SELECT g.* FROM g JOIN dfreq USING (source, g)
         |  WHERE ndoc BETWEEN 2 AND ${Dedup.DefaultMaxDf}),
         |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
         |  FROM k a JOIN k b ON a.g = b.g AND a.source = b.source AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |f AS (SELECT id_a, id_b, n_inter,
         |  round(n_inter::DOUBLE / na.n_g, 6) AS containment_a,
         |  round(n_inter::DOUBLE / nb.n_g, 6) AS containment_b
         |  FROM inter JOIN sizes na ON id_a = na.doc_id
         |  JOIN sizes nb ON id_b = nb.doc_id)
         |SELECT * FROM f
         |WHERE containment_a >= 0.3 OR containment_b >= 0.3""".stripMargin,
    "q31_ngram_jaccard" ->
      s"""WITH $toksCte,
         |gs AS (SELECT doc_id, source, unnest(list_distinct(${shingleExpr(2)})) AS gstr FROM toks),
         |g AS (SELECT doc_id, source, ${h64d("gstr")} AS g FROM gs),
         |sizes AS (SELECT doc_id, count(*) AS n_g FROM g GROUP BY 1),
         |dfreq AS (SELECT source, g, count(*) AS ndoc FROM g GROUP BY 1, 2),
         |k AS (SELECT g.* FROM g JOIN dfreq USING (source, g)
         |  WHERE ndoc BETWEEN 2 AND ${Dedup.DefaultMaxDf}),
         |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_i
         |  FROM k a JOIN k b ON a.g = b.g AND a.source = b.source AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b, round(n_i::DOUBLE / (na.n_g + nb.n_g - n_i), 6) AS jaccard
         |FROM inter JOIN sizes na ON id_a = na.doc_id JOIN sizes nb ON id_b = nb.doc_id
         |WHERE round(n_i::DOUBLE / (na.n_g + nb.n_g - n_i), 6) >= 0.05""".stripMargin,
    "q32_fingerprint" ->
      s"""WITH g AS (SELECT doc_id,
         |  list_transform(generate_series(1, greatest(length(text)-4, 1)),
         |    i -> ${h64d("substr(text, i, 5)")}) AS g FROM documents),
         |m AS (SELECT doc_id, len(g)::BIGINT AS n_grams,
         |  list_sort(list_distinct(list_transform(generate_series(1, greatest(len(g)-3, 1)),
         |    j -> list_min(g[j:j+3])))) AS mins FROM g)
         |SELECT doc_id, n_grams, md5(array_to_string(mins, ',')) AS fingerprint FROM m""".stripMargin,
    "q33_knn_brute" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
         |s AS (SELECT q_id, vec_id, $cosSql AS sim FROM e, q WHERE vec_id != q_id)
         |SELECT q_id, vec_id, sim, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank FROM s)
         |WHERE rank <= 5""".stripMargin,
    "q34_lsh_buckets" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)
         |SELECT vec_id, $bucketExpr AS bucket FROM e""".stripMargin,
    "q292_mmr" -> mmrOracleSql(k = 5, topN = 20),
    // duplicated spans: positional 8-gram window hashes, global
    // occurrence >= 2 marks a window, one per-doc rollup
    "q307_dup_spans" ->
      s"""WITH $toksCte,
         |win AS (SELECT doc_id, ${h64d("x")} AS g FROM
         | (SELECT doc_id, unnest(${shingleExpr(8)}) AS x FROM toks)),
         |dup AS (SELECT g FROM
         | (SELECT g, count(*) AS c FROM win GROUP BY 1) WHERE c >= 2),
         |pd AS (SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_windows,
         |  CAST(sum(CASE WHEN d.g IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_dup
         | FROM win w LEFT JOIN dup d ON d.g = w.g GROUP BY 1)
         |SELECT dd.doc_id, coalesce(n_windows, 0) AS n_windows,
         | coalesce(n_dup, 0) AS n_dup_windows,
         | round(CASE WHEN n_windows > 0
         |   THEN CAST(coalesce(n_dup, 0) AS DOUBLE) / n_windows END, 6)
         |   AS dup_frac
         |FROM (SELECT DISTINCT doc_id FROM documents) dd
         |LEFT JOIN pd ON pd.doc_id = dd.doc_id""".stripMargin,
    // maximal duplicated spans: positional window hashes, occurrence >= 2
    // marks a window, gaps-and-islands (new island when the positional
    // difference exceeds the window width) coalesces them into per-doc
    // removable token ranges
    "q310_dup_span_islands" ->
      s"""WITH $toksCte,
         |pw AS (SELECT doc_id, unnest(generate_series(1, len(w)-7)) AS pos,
         |  w FROM toks WHERE len(w) >= 8),
         |wh AS (SELECT doc_id, pos, ${h64d(
             (0 until 8).map(k => "w[pos+" + k + "]")
               .mkString(" || ' ' || "))} AS g FROM pw),
         |dup AS (SELECT g FROM
         | (SELECT g, count(*) AS c FROM wh GROUP BY 1) WHERE c >= 2),
         |m AS (SELECT wh.doc_id, wh.pos FROM wh JOIN dup USING (g)),
         |lg AS (SELECT doc_id, pos,
         |  CASE WHEN pos - lag(pos) OVER
         |    (PARTITION BY doc_id ORDER BY pos) > 8 THEN 1 ELSE 0 END AS gp
         | FROM m),
         |isl AS (SELECT doc_id, pos, sum(gp) OVER
         |  (PARTITION BY doc_id ORDER BY pos
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS il
         | FROM lg)
         |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
         | CAST(max(pos) + 7 AS BIGINT) AS span_end,
         | CAST(count(*) AS BIGINT) AS span_windows
         |FROM isl GROUP BY doc_id, il""".stripMargin,
    // strip: the q310 island chain, then every token position NOT inside
    // a span survives and re-joins with single spaces
    "q316_strip_dup_spans" ->
      s"""WITH $toksCte,
         |pw AS (SELECT doc_id, unnest(generate_series(1, len(w)-7)) AS pos,
         |  w FROM toks WHERE len(w) >= 8),
         |wh AS (SELECT doc_id, pos, ${h64d(
             (0 until 8).map(k => "w[pos+" + k + "]")
               .mkString(" || ' ' || "))} AS g FROM pw),
         |dup AS (SELECT g FROM
         | (SELECT g, count(*) AS c FROM wh GROUP BY 1) WHERE c >= 2),
         |m AS (SELECT wh.doc_id, wh.pos FROM wh JOIN dup USING (g)),
         |lg AS (SELECT doc_id, pos,
         |  CASE WHEN pos - lag(pos) OVER
         |    (PARTITION BY doc_id ORDER BY pos) > 8 THEN 1 ELSE 0 END AS gp
         | FROM m),
         |isl AS (SELECT doc_id, pos, sum(gp) OVER
         |  (PARTITION BY doc_id ORDER BY pos
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS il
         | FROM lg),
         |sp AS (SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e FROM isl
         | GROUP BY doc_id, il),
         |pt AS (SELECT doc_id, unnest(generate_series(1, len(w))) AS pos,
         |  w FROM toks),
         |ptt AS (SELECT doc_id, pos, w[pos] AS t FROM pt),
         |kept AS (SELECT p.doc_id, p.pos, p.t FROM ptt p
         | WHERE NOT EXISTS (SELECT 1 FROM sp WHERE sp.doc_id = p.doc_id
         |   AND p.pos BETWEEN sp.s AND sp.e)),
         |cl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nk,
         |  string_agg(t, ' ' ORDER BY pos) AS clean_text FROM kept
         | GROUP BY 1),
         |tot AS (SELECT doc_id, len(w)::BIGINT AS n_tokens FROM toks)
         |SELECT t.doc_id, n_tokens,
         | n_tokens - coalesce(nk, 0) AS n_removed,
         | coalesce(clean_text, '') AS clean_text
         |FROM tot t LEFT JOIN cl USING (doc_id)""".stripMargin,
    // lang-id eval: the q27 stopword-vote CASE, then the standard
    // per-class confusion aggregates with guarded pinned divisions
    "q305_langid_eval" ->
      s"""WITH $toksCte,
         |sc AS (SELECT doc_id, source,
         |  len(list_filter(w, t -> t IN (${inList(TextOps.Stopwords("en"))}))) AS en,
         |  len(list_filter(w, t -> t IN (${inList(TextOps.Stopwords("es"))}))) AS es,
         |  len(list_filter(w, t -> t IN (${inList(TextOps.Stopwords("fr"))}))) AS fr
         |FROM toks),
         |pr AS (SELECT doc_id, CASE WHEN en + es + fr = 0 THEN 'und'
         |  WHEN en >= es AND en >= fr THEN 'en'
         |  WHEN es >= fr THEN 'es' ELSE 'fr' END AS lang_pred
         | FROM sc),
         |j AS (SELECT d.lang, p.lang_pred FROM documents d
         | JOIN pr p USING (doc_id)),
         |bt AS (SELECT lang AS label, CAST(count(*) AS BIGINT) AS n_true,
         |  CAST(sum(CASE WHEN lang = lang_pred THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_correct
         | FROM j GROUP BY 1),
         |bp AS (SELECT lang_pred AS label, CAST(count(*) AS BIGINT)
         |   AS n_pred FROM j GROUP BY 1),
         |f AS (SELECT coalesce(bt.label, bp.label) AS label,
         |  coalesce(n_true, 0) AS n_true, coalesce(n_pred, 0) AS n_pred,
         |  coalesce(n_correct, 0) AS n_correct
         | FROM bt FULL OUTER JOIN bp ON bt.label = bp.label),
         |g AS (SELECT *,
         |  CASE WHEN n_pred > 0
         |    THEN CAST(n_correct AS DOUBLE) / n_pred END AS p,
         |  CASE WHEN n_true > 0
         |    THEN CAST(n_correct AS DOUBLE) / n_true END AS r
         | FROM f)
         |SELECT label, n_true, n_pred, n_correct,
         | round(p, 6) AS precision, round(r, 6) AS recall,
         | round(CASE WHEN p IS NOT NULL AND r IS NOT NULL AND p + r > 0
         |   THEN 2 * p * r / (p + r) END, 6) AS f1
         |FROM g""".stripMargin,
    // minhash calibration: candidates from the q29 chain, truth from the
    // estimator's own hashed-shingle universe (bhc deduplicated)
    "q302_minhash_eval" ->
      s"""WITH $sigCte,
         |$candCte,
         |gs AS (SELECT doc_id, unnest(list_distinct(bh)) AS g FROM bhc),
         |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS ng FROM gs
         | GROUP BY 1),
         |pi AS (SELECT c.id_a, c.id_b, CAST(count(*) AS BIGINT) AS ni
         | FROM cand c JOIN gs a ON a.doc_id = c.id_a
         | JOIN gs b ON b.doc_id = c.id_b AND b.g = a.g
         | GROUP BY 1, 2),
         |sc AS (SELECT c.id_a, c.id_b, c.est_jaccard AS est,
         |  coalesce(pi.ni, 0) AS ni, na.ng AS na, nb.ng AS nb
         | FROM cand c LEFT JOIN pi ON pi.id_a = c.id_a AND pi.id_b = c.id_b
         | JOIN sz na ON na.doc_id = c.id_a
         | JOIN sz nb ON nb.doc_id = c.id_b),
         |bn AS (SELECT least(CAST(floor(est * 10) AS BIGINT), 9) AS bin,
         |  est, CAST(ni AS DOUBLE) / (na + nb - ni) AS tr FROM sc)
         |SELECT bin, CAST(count(*) AS BIGINT) AS n_pairs,
         | round(CAST(sum(CAST(est AS DECIMAL(28,12))) AS DOUBLE)
         |   / count(*), 6) AS mean_est,
         | round(CAST(sum(CAST(tr AS DECIMAL(28,12))) AS DOUBLE)
         |   / count(*), 6) AS mean_true,
         | round(CAST(sum(CAST(abs(est - tr) AS DECIMAL(28,12))) AS DOUBLE)
         |   / count(*), 6) AS mean_abs_err
         |FROM bn GROUP BY 1""".stripMargin,
    // Neyman sampling: exact integer moments -> pinned S_h, decimal
    // share sums, largest-remainder seats, md5-ordered quota picks
    "q303_neyman_sample" ->
      s"""WITH st AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CAST(n_chars AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
         |  CAST(sum(CAST(CAST(n_chars AS DECIMAL(38,0))
         |      * CAST(n_chars AS DECIMAL(38,0)) AS DECIMAL(38,0)))
         |    AS DECIMAL(38,0)) AS sx2
         | FROM documents GROUP BY 1),
         |sh AS (SELECT source, n, CASE WHEN n > 1 THEN
         |   sqrt(greatest((CAST(sx2 AS DOUBLE)
         |     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1),
         |     CAST(0 AS DOUBLE)))
         |  ELSE CAST(0 AS DOUBLE) END AS s FROM st),
         |x AS (SELECT source, CAST(CAST(n AS DOUBLE) * s AS DECIMAL(28,6))
         |   AS x FROM sh),
         |a0 AS (SELECT *, sum(x) OVER () AS tot FROM x),
         |a1 AS (SELECT source, CASE WHEN tot > 0
         |   THEN CAST(x AS DOUBLE) / CAST(tot AS DOUBLE)
         |   ELSE CAST(0 AS DOUBLE) END AS w FROM a0),
         |a2 AS (SELECT source, CAST(floor(1000 * w) AS BIGINT) AS base,
         |  1000 * w - floor(1000 * w) AS frac FROM a1),
         |a3 AS (SELECT *, 1000 - CAST(sum(base) OVER () AS BIGINT) AS rem,
         |  row_number() OVER (ORDER BY frac DESC, source) AS seat FROM a2),
         |al AS (SELECT source,
         |  base + CASE WHEN seat <= rem THEN 1 ELSE 0 END AS alloc_n
         | FROM a3),
         |hk AS (SELECT doc_id, source,
         |  ${h64d("'ns:' || CAST(doc_id AS VARCHAR)")} AS hk
         | FROM documents),
         |rk AS (SELECT doc_id, source, row_number() OVER (
         |   PARTITION BY source ORDER BY hk, doc_id) AS samp_rank FROM hk)
         |SELECT r.doc_id, r.source, r.samp_rank,
         | CAST(al.alloc_n AS BIGINT) AS alloc_n
         |FROM rk r JOIN al USING (source) WHERE samp_rank <= alloc_n""".stripMargin,
    // embedding drift: the q36 fixed-point centroid trick per half,
    // cosine via the shared cosSql rendering
    "q304_embedding_drift" ->
      s"""WITH b AS (SELECT label AS cid, CAST(vec_id % 2 = 1 AS INT) AS h,
         |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         | FROM embeddings),
         |cx AS (SELECT cid, h, i AS pos,
         |  CAST(sum(CAST(floor(v[i] * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
         |    / 1e6 / count(*) AS cx
         | FROM b, generate_series(1, 64) g(i) GROUP BY 1, 2, 3),
         |cvt AS (SELECT cid, h, list(cx ORDER BY pos) AS cv FROM cx
         | GROUP BY 1, 2),
         |cnt AS (SELECT cid, h, CAST(count(*) AS BIGINT) AS n FROM b
         | GROUP BY 1, 2),
         |j AS (SELECT c0.cid, n0.n AS n_old, n1.n AS n_new,
         |  c0.cv AS a, c1.cv AS b
         | FROM cvt c0 JOIN cvt c1 ON c0.cid = c1.cid
         |   AND c0.h = 0 AND c1.h = 1
         | JOIN cnt n0 ON n0.cid = c0.cid AND n0.h = 0
         | JOIN cnt n1 ON n1.cid = c0.cid AND n1.h = 1)
         |SELECT cid AS label, n_old, n_new,
         | ${cosSqlAB("a", "b")} AS cos_sim,
         | round(1 - ${cosSqlAB("a", "b")}, 6) AS drift
         |FROM j""".stripMargin,
    // RRF: the q33 float chain and q293 integer chain fused by
    // 1/(60+rank) terms quantized to DECIMAL pre-sum
    "q298_rrf" ->
      s"""WITH e AS (SELECT vec_id,
         |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         | FROM embeddings),
         |qe AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 5),
         |sf AS (SELECT q_id, vec_id, $cosSql AS sim FROM e, qe
         | WHERE vec_id != q_id),
         |ra AS (SELECT q_id, vec_id, rank FROM (SELECT *,
         |  row_number() OVER (PARTITION BY q_id
         |    ORDER BY sim DESC, vec_id) AS rank FROM sf) WHERE rank <= 10),
         |m AS (SELECT vec_id, v,
         |  list_max(list_transform(v, x -> abs(x))) AS mx FROM e),
         |qz AS (SELECT vec_id,
         |  CASE WHEN mx = 0 THEN list_transform(v, x -> 0)
         |    ELSE list_transform(v, x -> CAST(floor(x * 127.0 / mx + 0.5)
         |      AS INT)) END AS codes
         | FROM m),
         |qq AS (SELECT vec_id AS q_id, codes AS qc FROM qz
         | WHERE vec_id < 5),
         |dt AS (SELECT q.q_id, z.vec_id,
         |  CAST(list_sum(list_transform(generate_series(1, 64),
         |    i -> CAST(qc[i] AS BIGINT) * z.codes[i])) AS BIGINT) AS dot
         | FROM qz z, qq q WHERE z.vec_id != q.q_id),
         |rb AS (SELECT q_id, vec_id, rank FROM (SELECT *,
         |  row_number() OVER (PARTITION BY q_id
         |    ORDER BY dot DESC, vec_id) AS rank FROM dt) WHERE rank <= 10),
         |t AS (SELECT q_id, vec_id,
         |  CAST(CAST(1 AS DOUBLE) / (60 + rank) AS DECIMAL(28,12)) AS t
         | FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb)),
         |fs AS (SELECT q_id, vec_id, sum(t) AS s FROM t GROUP BY 1, 2)
         |SELECT q_id, vec_id, round(CAST(s AS DOUBLE), 6) AS rrf_score,
         | rank
         |FROM (SELECT *, row_number() OVER (PARTITION BY q_id
         |   ORDER BY s DESC, vec_id) AS rank FROM fs)
         |WHERE rank <= 10""".stripMargin,
    // quantized retrieval recall: the q81 codes, integer dot products
    // (BIGINT — no float anywhere in the quantized ranking), and the
    // q33 float chain as the reference set
    "q293_quant_recall" ->
      s"""WITH e AS (SELECT vec_id,
         |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         | FROM embeddings),
         |m AS (SELECT vec_id, v,
         |  list_max(list_transform(v, x -> abs(x))) AS mx FROM e),
         |qz AS (SELECT vec_id,
         |  CASE WHEN mx = 0 THEN list_transform(v, x -> 0)
         |    ELSE list_transform(v, x -> CAST(floor(x * 127.0 / mx + 0.5)
         |      AS INT)) END AS codes
         | FROM m),
         |qq AS (SELECT vec_id AS q_id, codes AS qc FROM qz
         | WHERE vec_id < 5),
         |dt AS (SELECT q.q_id, z.vec_id,
         |  CAST(list_sum(list_transform(generate_series(1, 64),
         |    i -> CAST(qc[i] AS BIGINT) * z.codes[i])) AS BIGINT) AS dot
         | FROM qz z, qq q WHERE z.vec_id != q.q_id),
         |it AS (SELECT q_id, vec_id FROM (SELECT *,
         |  row_number() OVER (PARTITION BY q_id
         |    ORDER BY dot DESC, vec_id) AS rn FROM dt) WHERE rn <= 10),
         |qe AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 5),
         |sf AS (SELECT q_id, vec_id, $cosSql AS sim FROM e, qe
         | WHERE vec_id != q_id),
         |ex AS (SELECT q_id, vec_id FROM (SELECT *,
         |  row_number() OVER (PARTITION BY q_id
         |    ORDER BY sim DESC, vec_id) AS rn FROM sf) WHERE rn <= 10),
         |h AS (SELECT i.q_id, CAST(count(*) AS BIGINT) AS n_hit
         | FROM it i JOIN ex x ON x.q_id = i.q_id AND x.vec_id = i.vec_id
         | GROUP BY 1)
         |SELECT q.q_id, coalesce(h.n_hit, 0) AS n_hit,
         | round(CAST(coalesce(h.n_hit, 0) AS DOUBLE) / 10, 6) AS recall
         |FROM (SELECT DISTINCT q_id FROM qq) q LEFT JOIN h USING (q_id)""".stripMargin,
    // cw(s,c,i) and qv(j) are the closed forms of FixedCodebook/FixedQuery;
    // argmin ties go to the lowest code in both engines (first minimum)
    "q113b_pq_fixed" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |enc AS (SELECT vec_id, v,
        |  list_transform([0, 1, 2, 3], s ->
        |    list_transform([0, 1, 2, 3], c ->
        |      list_sum(list_transform(generate_series(1, 16), i ->
        |        (v[s*16 + i] - (((s*131 + c*37 + i*17) % 19) - 9) / 10.0)
        |      * (v[s*16 + i] - (((s*131 + c*37 + i*17) % 19) - 9) / 10.0)))))
        |    AS dists
        |  FROM e),
        |cod AS (SELECT vec_id,
        |  list_transform(dists, ds ->
        |    list_position(ds, list_aggregate(ds, 'min')) - 1) AS codes
        |  FROM enc),
        |ad AS (SELECT vec_id, codes,
        |  round(list_sum(list_transform([0, 1, 2, 3], s ->
        |    list_sum(list_transform(generate_series(1, 16), i ->
        |      ((((s*16 + i)*13) % 7 - 3) / 5.0
        |        - (((s*131 + codes[s+1]*37 + i*17) % 19) - 9) / 10.0)
        |    * ((((s*16 + i)*13) % 7 - 3) / 5.0
        |        - (((s*131 + codes[s+1]*37 + i*17) % 19) - 9) / 10.0))))), 6)
        |    AS adist
        |  FROM cod)
        |SELECT vec_id, array_to_string(codes, ',') AS codes_str, adist,
        |  CAST(row_number() OVER (ORDER BY adist ASC, vec_id ASC) AS INT)
        |    AS rank
        |FROM ad""".stripMargin,
    "q35_ann_lsh" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |c AS (SELECT vec_id, v, $bucketExpr AS bucket FROM e),
         |q AS (SELECT vec_id AS q_id, v AS qv, $qBucketExpr AS q_bucket
         |      FROM (SELECT vec_id, v AS qv, v FROM e WHERE vec_id < 10)),
         |s AS (SELECT q_id, vec_id, $cosSql AS sim
         |      FROM c JOIN q ON bucket = q_bucket AND vec_id != q_id)
         |SELECT q_id, vec_id, sim, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank FROM s)
         |WHERE rank <= 3""".stripMargin,
    "q53_normalize" ->
      raw"""SELECT doc_id,
        | trim(regexp_replace(regexp_replace(lower(text), '[[:cntrl:]]', ' ', 'g'), '\s+', ' ', 'g')) AS norm_text,
        | md5(trim(regexp_replace(regexp_replace(lower(text), '[[:cntrl:]]', ' ', 'g'), '\s+', ' ', 'g'))) AS norm_hash
        |FROM documents""".stripMargin,
    "q99_bpe_pairs" ->
      raw"""WITH n AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text), '[[:cntrl:]]', ' ', 'g'), '\s+', ' ', 'g')) AS t
        |  FROM documents),
        |w AS (SELECT unnest(regexp_split_to_array(trim(t), '\s+')) AS word FROM n),
        |v AS (SELECT word, count(*) AS wf FROM w GROUP BY 1),
        |p AS (SELECT wf, unnest(list_transform(generate_series(1, length(word) - 1),
        |  i -> substr(word, CAST(i AS BIGINT), 2))) AS pair
        |  FROM v WHERE length(word) >= 2)
        |SELECT pair, CAST(sum(wf) AS BIGINT) AS pair_count FROM p GROUP BY 1""".stripMargin,
    "q100_unigram_nll" ->
      raw"""WITH n AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text), '[[:cntrl:]]', ' ', 'g'), '\s+', ' ', 'g')) AS t
        |  FROM documents),
        |occ AS (SELECT doc_id, unnest(regexp_split_to_array(trim(t), '\s+')) AS token FROM n),
        |v AS (SELECT token, count(*) AS tf FROM occ GROUP BY 1),
        |tot AS (SELECT CAST(sum(tf) AS DOUBLE) AS total FROM v),
        |s AS (SELECT doc_id, round(-ln(tf::DOUBLE / total), 6) AS nll
        |  FROM occ JOIN v USING (token), tot)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(sum(CAST(nll AS DECIMAL(38,6))) AS DOUBLE) AS sum_nll,
        |  round(CAST(sum(CAST(nll AS DECIMAL(38,6))) AS DOUBLE) / count(*), 6) AS mean_nll
        |FROM s GROUP BY 1""".stripMargin,
    "q54_term_freq" ->
      raw"""WITH n AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text), '[[:cntrl:]]', ' ', 'g'), '\s+', ' ', 'g')) AS t
        |  FROM documents),
        |tf AS (SELECT doc_id, unnest(regexp_split_to_array(trim(t), '\s+')) AS token FROM n),
        |per AS (SELECT doc_id, token, count(*) AS tf FROM tf GROUP BY 1, 2)
        |SELECT token, count(*) AS doc_freq, CAST(sum(tf) AS BIGINT) AS term_freq FROM per GROUP BY 1
        |ORDER BY doc_freq DESC, term_freq DESC, token LIMIT 50""".stripMargin,
    "q47_embed_neardup" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |c AS (SELECT vec_id AS vid, v, $bucketExpr AS bucket FROM e)
         |SELECT a.vid AS id_a, b.vid AS id_b, ${cosSqlAB("a.v", "b.v")} AS sim
         |FROM c a JOIN c b ON a.bucket = b.bucket AND a.vid < b.vid
         |WHERE ${cosSqlAB("a.v", "b.v")} >= 0.25""".stripMargin,
    "q48_ann_ivf" ->
      s"""WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |cent AS (SELECT label AS cid, i AS pos,
         |  CAST(sum(CAST(floor(v[i]*1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)/1000000.0/count(*) AS cx
         |  FROM e, generate_series(1,64) g(i) GROUP BY 1, 2),
         |cv AS (SELECT cid, list(cx ORDER BY pos) AS cv FROM cent GROUP BY cid),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
         |routed AS (SELECT q_id, qv, cid FROM (
         |  SELECT q_id, qv, cid, row_number() OVER (PARTITION BY q_id
         |    ORDER BY ${cosSqlAB("qv", "cv")} DESC, cid) AS rn FROM q, cv) WHERE rn = 1),
         |s AS (SELECT q_id, r.cid, vec_id, $cosSql AS sim
         |  FROM e JOIN routed r ON e.label = r.cid AND e.vec_id != r.q_id)
         |SELECT q_id, cid, vec_id, sim, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank FROM s)
         |WHERE rank <= 3""".stripMargin,
    // KN bigram LM replayed count-for-count; each position's -ln P is
    // quantized to DECIMAL(28,12) BEFORE the per-doc sum in BOTH engines,
    // so document log-loss is order-independent and hash-matchable
    "q248_lm_perplexity" ->
      s"""WITH $lmCtes
         |SELECT doc_id, n_bigrams, avg_logloss, perplexity
         |FROM lm""".stripMargin,
    // the incremental variant must equal the from-scratch full-corpus LM
    // bit-for-bit — same oracle SQL as q248 by construction
    "q259_lm_incremental" ->
      s"""WITH $lmCtes
         |SELECT doc_id, n_bigrams, avg_logloss, perplexity
         |FROM lm""".stripMargin,
    // NB classifier replayed count-for-count: Laplace likelihoods from
    // integer counts, per-(doc, class, token) log terms quantized to
    // DECIMAL(28,12) pre-sum, prior added post-sum, argmax on the rounded
    // score with label tie-break
    "q256_nb_domain" ->
      s"""WITH $toksCte,
         |tt AS MATERIALIZED (SELECT source AS c, unnest(w) AS tok FROM toks),
         |cvc AS MATERIALIZED (SELECT c, tok, CAST(count(*) AS BIGINT) AS cnt
         | FROM tt GROUP BY 1, 2),
         |cs AS (SELECT c, CAST(sum(cnt) AS BIGINT) AS toks FROM cvc GROUP BY 1),
         |vv AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM cvc),
         |pr AS (SELECT source AS c, CAST(count(*) AS BIGINT) AS nd
         | FROM documents GROUP BY 1),
         |nt AS (SELECT CAST(count(*) AS BIGINT) AS ndtot FROM documents),
         |st AS MATERIALIZED (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS n
         | FROM (SELECT doc_id, unnest(w) AS tok FROM toks) GROUP BY 1, 2),
         |tm AS (SELECT st.doc_id, cs.c,
         |  CAST(st.n * ln(CAST(coalesce(cvc.cnt, 0) + 1 AS DOUBLE)
         |    / CAST(cs.toks + vv.v AS DOUBLE)) AS DECIMAL(28,12)) AS lp
         | FROM st CROSS JOIN cs CROSS JOIN vv
         | LEFT JOIN cvc ON cvc.c = cs.c AND cvc.tok = st.tok),
         |sc AS (SELECT doc_id, c, sum(lp) AS slp FROM tm GROUP BY 1, 2),
         |fin AS (SELECT sc.doc_id, sc.c,
         |  round(CAST(slp AS DOUBLE)
         |    + ln(CAST(pr.nd AS DOUBLE) / CAST(nt.ndtot AS DOUBLE)), 6)
         |    AS logp
         | FROM sc JOIN pr USING (c) CROSS JOIN nt)
         |SELECT doc_id, c AS pred_label, logp FROM (
         | SELECT *, row_number() OVER (PARTITION BY doc_id
         |   ORDER BY logp DESC, c) AS rn FROM fin) WHERE rn = 1""".stripMargin,
    // CCNet bucketing on top of the same LM CTEs: per-language quartile
    // fences (0.25/0.75 exactly representable → both engines' linear
    // interpolation agrees) + the salted-hash ppm keep decision
    "q255_ccnet_buckets" ->
      s"""WITH $lmCtes,
         |j AS (SELECT lm.doc_id, d.lang, lm.perplexity
         | FROM lm JOIN documents d USING (doc_id)),
         |f AS (SELECT lang, quantile_cont(perplexity, 0.25) AS q25,
         |  quantile_cont(perplexity, 0.75) AS q75 FROM j GROUP BY 1),
         |b AS (SELECT j.doc_id, j.lang, j.perplexity,
         |  CASE WHEN j.perplexity <= f.q25 THEN 'head'
         |       WHEN j.perplexity <= f.q75 THEN 'middle'
         |       ELSE 'tail' END AS bucket
         | FROM j JOIN f USING (lang))
         |SELECT doc_id, lang, perplexity, bucket,
         | CASE WHEN ${h64d("'ppl:' || doc_id")} % 1000000 <
         |   CASE bucket WHEN 'head' THEN 1000000
         |     WHEN 'middle' THEN 500000 ELSE 100000 END
         |  THEN 1 ELSE 0 END AS sampled
         |FROM b""".stripMargin,
    // filtered ANN mirrors the q48 shape: centroids over the FULL corpus
    // (index reuse), route rn <= 2 (nProbe), predicate on the posting-list
    // scan BEFORE scoring, exact rank over survivors
    // incremental ANN index: centroids as q48, every vector assigned to
    // its nearest centroid from scratch (≡ the union of per-batch
    // assignments under frozen centroids), routed search over the
    // assigned posting lists
    // the on-disk index search (q312) is value-identical to q264 by the
    // assign-distributes-over-union property — identical oracle replay;
    // q313 freezes centroids on the old 90% and reads the per-cell drift
    "q312_ann_index_stored" -> annIncrementalOracleSql,
    // hybrid-stack retrieval eval: q102's BM25 chain picks 50 candidates,
    // exact-cosine rerank over only those, q266's metric tail scores the
    // reranked top-5 against the exhaustive q33 truth
    "q320_rerank_eval" -> rerankEvalOracleSql,
    // both stages on stored artifacts ≡ the from-scratch q320 chain
    "q324_hybrid_indexed" -> rerankEvalOracleSql,
    // compacted-store search: q264's replay with the quantizer learned on
    // the base shard only (writeBaseIndex's contract)
    "q326_compacted_ann_index" ->
      s"""WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |cent AS (SELECT label AS cid, i AS pos,
         |  CAST(sum(CAST(floor(v[i]*1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)/1000000.0/count(*) AS cx
         |  FROM e, generate_series(1,64) g(i) WHERE vec_id % 10 != 0
         |  GROUP BY 1, 2),
         |cv AS (SELECT cid, list(cx ORDER BY pos) AS cv FROM cent GROUP BY cid),
         |asn AS (SELECT vec_id, v, cid FROM (
         |  SELECT e.vec_id, e.v, cv.cid, row_number() OVER (PARTITION BY e.vec_id
         |    ORDER BY ${cosSqlAB("v", "cv")} DESC, cid) AS rn FROM e, cv) WHERE rn = 1),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
         |routed AS (SELECT q_id, qv, cid FROM (
         |  SELECT q_id, qv, cid, row_number() OVER (PARTITION BY q_id
         |    ORDER BY ${cosSqlAB("qv", "cv")} DESC, cid) AS rn FROM q, cv) WHERE rn <= 2),
         |sc AS (SELECT q_id, a.vec_id, $cosSqlAV AS sim
         |  FROM asn a JOIN routed r ON a.cid = r.cid AND a.vec_id != r.q_id)
         |SELECT q_id, vec_id, sim, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank FROM sc)
         |WHERE rank <= 3""".stripMargin,

    // filtered stored-index search replay: q312's chain with the
    // predicate's survivors as the candidate pool (applied after the
    // frozen assignment — a filter never moves a vector's cell)
    "q337_filtered_indexed" ->
      s"""WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |cent AS (SELECT label AS cid, i AS pos,
         |  CAST(sum(CAST(floor(v[i]*1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)/1000000.0/count(*) AS cx
         |  FROM e, generate_series(1,64) g(i) GROUP BY 1, 2),
         |cv AS (SELECT cid, list(cx ORDER BY pos) AS cv FROM cent GROUP BY cid),
         |asn AS (SELECT vec_id, v, cid FROM (
         |  SELECT e.vec_id, e.v, cv.cid, row_number() OVER (PARTITION BY e.vec_id
         |    ORDER BY ${cosSqlAB("v", "cv")} DESC, cid) AS rn FROM e, cv) WHERE rn = 1),
         |live AS (SELECT * FROM asn WHERE vec_id % 3 = 0),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
         |routed AS (SELECT q_id, qv, cid FROM (
         |  SELECT q_id, qv, cid, row_number() OVER (PARTITION BY q_id
         |    ORDER BY ${cosSqlAB("qv", "cv")} DESC, cid) AS rn FROM q, cv) WHERE rn <= 2),
         |s AS (SELECT q_id, a.vec_id, $cosSqlAV AS sim
         |  FROM live a JOIN routed r ON a.cid = r.cid AND a.vec_id != r.q_id)
         |SELECT q_id, vec_id, sim, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank FROM s)
         |WHERE rank <= 3""".stripMargin,

    // erasure-audit replay: the tombstoned stage's hidden rows are the
    // deleted docs' (term, doc) posting groups and doclens rows over the
    // full ingested corpus; the compacted stage must be clean
    "q340_erasure_audit" ->
      s"""WITH $normCte,
         |tk AS (SELECT doc_id, regexp_split_to_array(t, '\\s+') AS w FROM nrm),
         |toks AS (SELECT doc_id, term FROM (
         |    SELECT doc_id, unnest(w) AS term FROM tk)
         |  WHERE length(term) > 0),
         |ph AS (SELECT CAST(count(*) AS BIGINT) AS p FROM (
         |  SELECT DISTINCT term, doc_id FROM toks WHERE doc_id % 7 = 3)),
         |dh AS (SELECT CAST(count(*) AS BIGINT) AS d
         |  FROM documents WHERE doc_id % 7 = 3)
         |SELECT dh.d AS n_tombstones,
         |  CASE st.stage WHEN 'tombstoned' THEN ph.p ELSE 0 END
         |    AS postings_rows_hidden,
         |  CASE st.stage WHEN 'tombstoned' THEN dh.d ELSE 0 END
         |    AS doclens_rows_hidden,
         |  CASE WHEN st.stage = 'tombstoned'
         |    THEN (ph.p = 0 AND dh.d = 0) ELSE TRUE END
         |    AS physically_clean,
         |  st.stage
         |FROM ph, dh, (VALUES ('tombstoned'), ('compacted')) st(stage)""".stripMargin,

    // PQ-family erasure-audit replay: the whole corpus is ingested into
    // both layouts (flat codes: 90% base + 10% increment; IVF-PQ postings:
    // full), so the tombstoned stage hides exactly one code row and one
    // posting row per deleted vector; the erased stage is clean
    "q341_pq_erasure_audit" ->
      """WITH dh AS (SELECT CAST(count(*) AS BIGINT) AS n
        |  FROM embeddings WHERE vec_id % 7 = 3)
        |SELECT dh.n AS n_tombstones,
        |  CASE st.stage WHEN 'tombstoned' THEN dh.n ELSE CAST(0 AS BIGINT)
        |    END AS code_rows_hidden,
        |  CASE st.stage WHEN 'tombstoned' THEN dh.n ELSE CAST(0 AS BIGINT)
        |    END AS posting_rows_hidden,
        |  CASE WHEN st.stage = 'tombstoned' THEN dh.n = 0 ELSE TRUE END
        |    AS physically_clean,
        |  st.stage
        |FROM dh, (VALUES ('tombstoned'), ('erased')) st(stage)""".stripMargin,

    // maintained-ANN erasure-audit replay: full corpus ingested (90% base
    // + 10% frozen-assignment increment) — one hidden posting row per
    // deleted vector before the fold, none after
    "q342_ann_erasure_audit" ->
      """WITH dh AS (SELECT CAST(count(*) AS BIGINT) AS n
        |  FROM embeddings WHERE vec_id % 7 = 3)
        |SELECT dh.n AS n_tombstones,
        |  CASE st.stage WHEN 'tombstoned' THEN dh.n ELSE CAST(0 AS BIGINT)
        |    END AS rows_hidden,
        |  CASE WHEN st.stage = 'tombstoned' THEN dh.n = 0 ELSE TRUE END
        |    AS physically_clean,
        |  st.stage
        |FROM dh, (VALUES ('tombstoned'), ('erased')) st(stage)""".stripMargin,

    // dedup-signature erasure-audit replay: the deleted docs' hidden band
    // rows are recomputed from the corpus via the shared MinHash replay —
    // NumBands rows per deleted doc that shingles, zero for docs too
    // short (their band keys are NULL and the index never held them)
    "q343_dedup_erasure_audit" ->
      s"""WITH $sigCte,
         |bh2 AS (SELECT doc_id, bk FROM (
         |  SELECT doc_id, unnest([${(0 until Dedup.NumBands)
               .map(b => s"band$b").mkString(", ")}]) AS bk
         |  FROM sig WHERE doc_id % 7 = 3) WHERE bk IS NOT NULL),
         |hid AS (SELECT CAST(count(*) AS BIGINT) AS h FROM bh2),
         |dh AS (SELECT CAST(count(*) AS BIGINT) AS n
         |  FROM documents WHERE doc_id % 7 = 3)
         |SELECT dh.n AS n_tombstones,
         |  CASE st.stage WHEN 'tombstoned' THEN hid.h ELSE CAST(0 AS BIGINT)
         |    END AS band_rows_hidden,
         |  CASE WHEN st.stage = 'tombstoned' THEN hid.h = 0 ELSE TRUE END
         |    AS physically_clean,
         |  st.stage
         |FROM dh, hid, (VALUES ('tombstoned'), ('erased')) st(stage)""".stripMargin,

    // domain-takedown replay: from-scratch BM25 over the corpus minus the
    // deleted sources, emitted at both stages
    "q344_delete_by_source" ->
      s"""WITH ${bm25Ctes(normCteWhere("source NOT IN ('src3','src7')"))},
         |res AS (SELECT doc_id, count(*) AS n_terms,
         |  round(CAST(sum(part) AS DOUBLE), 6) AS bm25
         |FROM scored GROUP BY doc_id)
         |SELECT st.stage, res.doc_id, res.n_terms, res.bm25
         |FROM res CROSS JOIN (VALUES ('tombstoned'), ('compacted')) st(stage)""".stripMargin,

    // content-takedown replay: the matching-doc set is recomputed with the
    // engine's own tokenization (normalize -> whitespace split), then
    // from-scratch BM25 over the corpus minus it, at both stages
    "q345_delete_by_term" ->
      s"""WITH ${bm25Ctes(normCteWhere(
             raw"""doc_id NOT IN (SELECT doc_id FROM (
               |    SELECT doc_id, unnest(regexp_split_to_array(
               |      trim(regexp_replace(regexp_replace(lower(text),
               |        '[[:cntrl:]]', ' ', 'g'), '\s+', ' ', 'g')),
               |      '\s+')) AS term FROM documents) WHERE term = 'stream')"""
               .stripMargin))},
         |res AS (SELECT doc_id, count(*) AS n_terms,
         |  round(CAST(sum(part) AS DOUBLE), 6) AS bm25
         |FROM scored GROUP BY doc_id)
         |SELECT st.stage, res.doc_id, res.n_terms, res.bm25
         |FROM res CROSS JOIN (VALUES ('tombstoned'), ('compacted')) st(stage)""".stripMargin,

    // lexical-stats drift replay: split the corpus exactly as the index
    // build did (base 80% / increment 20%), recompute N/avgdl per side
    // and the increments' OOV term/occurrence mass against the base
    // vocabulary — postings drop empty tokens, doclens count them,
    // mirroring the engine's tokenization contract
    "q336_lex_stats_drift" ->
      s"""WITH $normCte,
         |tk AS (SELECT doc_id, regexp_split_to_array(t, '\\s+') AS w FROM nrm),
         |dls AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM tk),
         |b AS (SELECT count(*) AS n_docs_base,
         |  round(CAST(sum(CAST(dl AS DECIMAL(28,6))) AS DOUBLE) / count(*), 6)
         |    AS avgdl_base FROM dls WHERE doc_id % 5 <> 4),
         |i AS (SELECT count(*) AS n_docs_inc,
         |  round(CAST(sum(CAST(dl AS DECIMAL(28,6))) AS DOUBLE) / count(*), 6)
         |    AS avgdl_inc FROM dls WHERE doc_id % 5 = 4),
         |toks AS (SELECT doc_id, term FROM (
         |    SELECT doc_id, unnest(w) AS term FROM tk)
         |  WHERE length(term) > 0),
         |bvocab AS (SELECT DISTINCT term FROM toks WHERE doc_id % 5 <> 4),
         |it AS (SELECT term, count(*) AS occ FROM toks
         |  WHERE doc_id % 5 = 4 GROUP BY 1),
         |fr AS (SELECT
         |  round(CAST(count(*) FILTER (WHERE bv.term IS NULL) AS DOUBLE)
         |    / count(*), 6) AS oov_term_frac,
         |  round(CAST(COALESCE(sum(it.occ) FILTER (WHERE bv.term IS NULL),
         |      0) AS DOUBLE)
         |    / CAST(sum(it.occ) AS DOUBLE), 6) AS oov_occ_frac
         |  FROM it LEFT JOIN bvocab bv ON it.term = bv.term)
         |SELECT b.n_docs_base, b.avgdl_base, i.n_docs_inc, i.avgdl_inc,
         |  fr.oov_term_frac, fr.oov_occ_frac
         |FROM b, i, fr""".stripMargin,

    // delete replay, PQ: the q330 closed-form encode + LUT ADC chain with
    // the tombstoned vectors dropped from the code table (codes are
    // per-vector — deletion distributes exactly), ranked per stage
    "q335_pq_delete" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |enc AS (SELECT vec_id, v,
        |  list_transform([0, 1, 2, 3], s ->
        |    list_transform([0, 1, 2, 3], c ->
        |      list_sum(list_transform(generate_series(1, 16), i ->
        |        (v[s*16 + i] - (((s*131 + c*37 + i*17) % 19) - 9) / 10.0)
        |      * (v[s*16 + i] - (((s*131 + c*37 + i*17) % 19) - 9) / 10.0)))))
        |    AS dists
        |  FROM e),
        |cod AS (SELECT vec_id,
        |  list_transform(dists, ds ->
        |    list_position(ds, list_aggregate(ds, 'min')) - 1) AS codes
        |  FROM enc WHERE vec_id % 7 != 3),
        |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
        |ad AS (SELECT q.q_id, c.vec_id,
        |  round(list_sum(list_transform([0, 1, 2, 3], s ->
        |    list_sum(list_transform(generate_series(1, 16), i ->
        |      (q.qv[s*16 + i]
        |        - (((s*131 + c.codes[s+1]*37 + i*17) % 19) - 9) / 10.0)
        |    * (q.qv[s*16 + i]
        |        - (((s*131 + c.codes[s+1]*37 + i*17) % 19) - 9) / 10.0))))), 6)
        |    AS adist
        |  FROM cod c, q WHERE c.vec_id != q.q_id),
        |res AS (SELECT q_id, vec_id, adist, rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |    ORDER BY adist ASC, vec_id ASC) AS rank FROM ad)
        |WHERE rank <= 5)
        |SELECT st.stage, res.q_id, res.vec_id, res.adist, res.rank
        |FROM res CROSS JOIN (VALUES ('tombstoned'), ('compacted')) st(stage)""".stripMargin,

    // delete replay, lexical: BM25 from scratch over the corpus MINUS the
    // tombstoned docs (tf/df/N/avgdl all reflect the deletion), once per
    // stage — 'tombstoned' (anti-join read) and 'compacted' (physically
    // erased base) must both equal it
    "q333_lex_delete" ->
      s"""WITH ${bm25Ctes(normCteWhere("doc_id % 7 <> 3"))},
         |res AS (SELECT doc_id, count(*) AS n_terms,
         |  round(CAST(sum(part) AS DOUBLE), 6) AS bm25
         |FROM scored GROUP BY doc_id)
         |SELECT st.stage, res.doc_id, res.n_terms, res.bm25
         |FROM res CROSS JOIN (VALUES ('tombstoned'), ('compacted')) st(stage)""".stripMargin,

    // delete replay, ANN: the q326 chain (90% label quantizer, full
    // frozen assignment) with the tombstoned vectors dropped AFTER
    // assignment (a delete never moves a frozen centroid), ranked per
    // stage — logical (anti-join) and physical (folded base) reads both
    // equal the from-scratch filtered assignment
    "q334_ann_delete" ->
      s"""WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |cent AS (SELECT label AS cid, i AS pos,
         |  CAST(sum(CAST(floor(v[i]*1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)/1000000.0/count(*) AS cx
         |  FROM e, generate_series(1,64) g(i) WHERE vec_id % 10 != 0
         |  GROUP BY 1, 2),
         |cv AS (SELECT cid, list(cx ORDER BY pos) AS cv FROM cent GROUP BY cid),
         |asn AS (SELECT vec_id, v, cid FROM (
         |  SELECT e.vec_id, e.v, cv.cid, row_number() OVER (PARTITION BY e.vec_id
         |    ORDER BY ${cosSqlAB("v", "cv")} DESC, cid) AS rn FROM e, cv) WHERE rn = 1),
         |live AS (SELECT * FROM asn WHERE vec_id % 7 != 3),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
         |routed AS (SELECT q_id, qv, cid FROM (
         |  SELECT q_id, qv, cid, row_number() OVER (PARTITION BY q_id
         |    ORDER BY ${cosSqlAB("qv", "cv")} DESC, cid) AS rn FROM q, cv) WHERE rn <= 2),
         |sc AS (SELECT q_id, a.vec_id, $cosSqlAV AS sim
         |  FROM live a JOIN routed r ON a.cid = r.cid AND a.vec_id != r.q_id),
         |res AS (SELECT q_id, vec_id, sim, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank FROM sc)
         |WHERE rank <= 3)
         |SELECT st.stage, res.q_id, res.vec_id, res.sim, res.rank
         |FROM res CROSS JOIN (VALUES ('tombstoned'), ('compacted')) st(stage)""".stripMargin,

    // recluster replay: label quantizer -> full assign (the maintained
    // postings) -> fresh centroids from current cell means -> re-assign ->
    // route queries over the REFRESHED quantizer -> exact rank
    "q318_ivf_recluster" ->
      s"""WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |cent AS (SELECT label AS cid, i AS pos,
         |  CAST(sum(CAST(floor(v[i]*1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)/1000000.0/count(*) AS cx
         |  FROM e, generate_series(1,64) g(i) GROUP BY 1, 2),
         |cv AS (SELECT cid, list(cx ORDER BY pos) AS cv FROM cent GROUP BY cid),
         |asn AS (SELECT vec_id, v, cid FROM (
         |  SELECT e.vec_id, e.v, cv.cid, row_number() OVER (PARTITION BY e.vec_id
         |    ORDER BY ${cosSqlAB("v", "cv")} DESC, cid) AS rn FROM e, cv) WHERE rn = 1),
         |cur0 AS (SELECT cid, i AS pos,
         |  CAST(sum(CAST(floor(v[i]*1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)/1000000.0/count(*) AS cx
         |  FROM asn, generate_series(1,64) g(i) GROUP BY 1, 2),
         |cur AS (SELECT cid, list(cx ORDER BY pos) AS cv FROM cur0 GROUP BY cid),
         |asn2 AS (SELECT vec_id, v, cid FROM (
         |  SELECT a.vec_id, a.v, cur.cid, row_number() OVER (PARTITION BY a.vec_id
         |    ORDER BY ${cosSqlAB("a.v", "cur.cv")} DESC, cur.cid) AS rn FROM asn a, cur) WHERE rn = 1),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
         |routed AS (SELECT q_id, qv, cid FROM (
         |  SELECT q_id, qv, cid, row_number() OVER (PARTITION BY q_id
         |    ORDER BY ${cosSqlAB("qv", "cur.cv")} DESC, cid) AS rn FROM q, cur) WHERE rn <= 2),
         |s AS (SELECT q_id, a.vec_id, $cosSqlAV AS sim
         |  FROM asn2 a JOIN routed r ON a.cid = r.cid AND a.vec_id != r.q_id)
         |SELECT q_id, vec_id, sim, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank FROM s)
         |WHERE rank <= 3""".stripMargin,
    // fused stored-hybrid serving: the q320 BM25 CTEs (global candidate
    // ranking, per-query view keeps GLOBAL ranks with the self-doc
    // dropped), the q312 IVF chain, the q298 decimal RRF fold, and the
    // shared metrics tail
    "q327_hybrid_rrf" -> hybridRrfOracleSql("TRUE", "TRUE"),
    // tenant-filtered fused serving: the same replay with every
    // corpus-facing CTE restricted to the tenant — BM25 candidates and
    // statistics from the tenant docs, ANN candidates and the exhaustive
    // truth from the tenant vectors (assignment/routing stay full-corpus,
    // the frozen-centroid contract)
    "q363_hybrid_filtered" ->
      hybridRrfOracleSql("doc_id % 3 = 0", "vec_id % 3 = 0"),

    // stored PQ index: q113b's closed-form codebook + argmin encode over
    // the full corpus (frozen-codebook encoding distributes over union;
    // the fold is an identity), then the per-query ADC and the ascending
    // rank — the maintained compressed tier replayed from scratch
    "q330_pq_index_stored" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |enc AS (SELECT vec_id, v,
        |  list_transform([0, 1, 2, 3], s ->
        |    list_transform([0, 1, 2, 3], c ->
        |      list_sum(list_transform(generate_series(1, 16), i ->
        |        (v[s*16 + i] - (((s*131 + c*37 + i*17) % 19) - 9) / 10.0)
        |      * (v[s*16 + i] - (((s*131 + c*37 + i*17) % 19) - 9) / 10.0)))))
        |    AS dists
        |  FROM e),
        |cod AS (SELECT vec_id,
        |  list_transform(dists, ds ->
        |    list_position(ds, list_aggregate(ds, 'min')) - 1) AS codes
        |  FROM enc),
        |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
        |ad AS (SELECT q.q_id, c.vec_id,
        |  round(list_sum(list_transform([0, 1, 2, 3], s ->
        |    list_sum(list_transform(generate_series(1, 16), i ->
        |      (q.qv[s*16 + i]
        |        - (((s*131 + c.codes[s+1]*37 + i*17) % 19) - 9) / 10.0)
        |    * (q.qv[s*16 + i]
        |        - (((s*131 + c.codes[s+1]*37 + i*17) % 19) - 9) / 10.0))))), 6)
        |    AS adist
        |  FROM cod c, q WHERE c.vec_id != q.q_id)
        |SELECT q_id, vec_id, adist, rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |    ORDER BY adist ASC, vec_id ASC) AS rank FROM ad)
        |WHERE rank <= 5""".stripMargin,
    // PQ code-usage drift: encode both shards under the closed-form
    // codebook, per-subspace codeword frequencies, exact-integer counts,
    // single-rounded double quotients, decimal-quantized |Δ| terms
    "q331_pq_code_drift" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |enc AS (SELECT vec_id, v,
        |  list_transform([0, 1, 2, 3], s ->
        |    list_transform([0, 1, 2, 3], c ->
        |      list_sum(list_transform(generate_series(1, 16), i ->
        |        (v[s*16 + i] - (((s*131 + c*37 + i*17) % 19) - 9) / 10.0)
        |      * (v[s*16 + i] - (((s*131 + c*37 + i*17) % 19) - 9) / 10.0)))))
        |    AS dists
        |  FROM e),
        |cod AS (SELECT vec_id,
        |  list_transform(dists, ds ->
        |    list_position(ds, list_aggregate(ds, 'min')) - 1) AS codes
        |  FROM enc),
        |lng AS (SELECT vec_id, g.i - 1 AS s, codes[g.i] AS code
        |  FROM cod, generate_series(1, 4) g(i)),
        |b AS (SELECT s, code, CAST(count(*) AS BIGINT) AS cb FROM lng
        |  WHERE vec_id % 10 != 0 GROUP BY 1, 2),
        |nb AS (SELECT s, CAST(count(*) AS BIGINT) AS nb FROM lng
        |  WHERE vec_id % 10 != 0 GROUP BY 1),
        |i2 AS (SELECT s, code, CAST(count(*) AS BIGINT) AS ci FROM lng
        |  WHERE vec_id % 10 = 0 GROUP BY 1, 2),
        |ni AS (SELECT s, CAST(count(*) AS BIGINT) AS ni FROM lng
        |  WHERE vec_id % 10 = 0 GROUP BY 1),
        |u AS (SELECT coalesce(b.s, i2.s) AS s,
        |    coalesce(b.cb, 0) AS cb, coalesce(i2.ci, 0) AS ci
        |  FROM b FULL JOIN i2 ON b.s = i2.s AND b.code = i2.code),
        |d AS (SELECT u.s,
        |  CAST(abs(CAST(cb AS DOUBLE) / CAST(nb.nb AS DOUBLE)
        |         - CAST(ci AS DOUBLE) / CAST(ni.ni AS DOUBLE))
        |    AS DECIMAL(28,12)) AS dd
        |  FROM u JOIN nb ON nb.s = u.s JOIN ni ON ni.s = u.s)
        |SELECT s, round(CAST(sum(dd) AS DOUBLE), 6) AS l1_drift
        |FROM d GROUP BY s""".stripMargin,
    // IVF-PQ: q312's routing + frozen assignment composed with q330's
    // closed-form encode — candidates are each query's probed cells'
    // code rows, ranked by the per-pair ADC ascending
    "q332_ivfpq" ->
      s"""WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |cent AS (SELECT label AS cid, i AS pos,
         |  CAST(sum(CAST(floor(v[i]*1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)/1000000.0/count(*) AS cx
         |  FROM e, generate_series(1,64) g(i) GROUP BY 1, 2),
         |cv AS (SELECT cid, list(cx ORDER BY pos) AS cv FROM cent GROUP BY cid),
         |asn AS (SELECT vec_id, cid FROM (
         |  SELECT e.vec_id, cv.cid, row_number() OVER (PARTITION BY e.vec_id
         |    ORDER BY ${cosSqlAB("v", "cv")} DESC, cid) AS rn FROM e, cv) WHERE rn = 1),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
         |routed AS (SELECT q_id, qv, cid FROM (
         |  SELECT q_id, qv, cid, row_number() OVER (PARTITION BY q_id
         |    ORDER BY ${cosSqlAB("qv", "cv")} DESC, cid) AS rn FROM q, cv) WHERE rn <= 2),
         |enc AS (SELECT vec_id,
         |  list_transform([0, 1, 2, 3], s ->
         |    list_transform([0, 1, 2, 3], c ->
         |      list_sum(list_transform(generate_series(1, 16), i ->
         |        (v[s*16 + i] - (((s*131 + c*37 + i*17) % 19) - 9) / 10.0)
         |      * (v[s*16 + i] - (((s*131 + c*37 + i*17) % 19) - 9) / 10.0)))))
         |    AS dists
         |  FROM e),
         |cod AS (SELECT vec_id,
         |  list_transform(dists, ds ->
         |    list_position(ds, list_aggregate(ds, 'min')) - 1) AS codes
         |  FROM enc),
         |ad AS (SELECT r.q_id, c.vec_id,
         |  round(list_sum(list_transform([0, 1, 2, 3], s ->
         |    list_sum(list_transform(generate_series(1, 16), i ->
         |      (r.qv[s*16 + i]
         |        - (((s*131 + c.codes[s+1]*37 + i*17) % 19) - 9) / 10.0)
         |    * (r.qv[s*16 + i]
         |        - (((s*131 + c.codes[s+1]*37 + i*17) % 19) - 9) / 10.0))))), 6)
         |    AS adist
         |  FROM cod c JOIN asn a ON a.vec_id = c.vec_id
         |  JOIN routed r ON a.cid = r.cid AND c.vec_id != r.q_id)
         |SELECT q_id, vec_id, adist, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id
         |    ORDER BY adist ASC, vec_id ASC) AS rank FROM ad)
         |WHERE rank <= 5""".stripMargin,
    // lifecycle capstone: the lexical store after two appends + fold IS
    // from-scratch BM25 over everything ingested (union-distributive
    // statistics, fold identity — the q323 contract), and the vector
    // store after two frozen increments + fold + recluster IS the q318
    // chain (frozen assign distributes over union; the refresh is the
    // deterministic Lloyd step) — so the whole maintained end-state
    // replays from scratch: q327's fused serving SQL with the IVF leg
    // swapped to frozen(old-shard)-centroids → assign-all → refresh →
    // re-assign → route
    "q329_index_lifecycle" ->
      s"""WITH $normCte,
         |tkb AS (SELECT doc_id, regexp_split_to_array(t, '\\s+') AS w FROM nrm),
         |dls AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM tkb),
         |stats AS (SELECT count(*) AS n_docs,
         |  CAST(sum(CAST(dl AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS avgdl FROM dls),
         |tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM (
         |    SELECT tkb.doc_id, dls.dl, unnest(tkb.w) AS term
         |    FROM tkb JOIN dls USING (doc_id))
         |  WHERE term IN (${inList(Bm25Terms)})
         |  GROUP BY 1, 2, 3),
         |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |scored AS (SELECT doc_id,
         |  CAST(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * (tf * (1.25 + 1)) /
         |    (tf + 1.25 * (1 - 0.75 + 0.75 * dl / avgdl)) AS DECIMAL(28,12)) AS part
         |  FROM tf JOIN dfreq USING (term) CROSS JOIN stats),
         |bmsc AS (SELECT doc_id, round(CAST(sum(part) AS DOUBLE), 6) AS bm25
         | FROM scored GROUP BY doc_id),
         |cand AS (SELECT doc_id AS vec_id, rn AS lrank FROM (
         |  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id)
         |    AS rn FROM bmsc) WHERE rn <= 50),
         |e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
         |lexr AS (SELECT q.q_id, c.vec_id, c.lrank AS rank
         |  FROM cand c, q WHERE c.vec_id != q.q_id),
         |cent AS (SELECT label AS cid, i AS pos,
         |  CAST(sum(CAST(floor(v[i]*1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)/1000000.0/count(*) AS cx
         |  FROM e, generate_series(1,64) g(i) WHERE vec_id % 10 != 0
         |  GROUP BY 1, 2),
         |cv AS (SELECT cid, list(cx ORDER BY pos) AS cv FROM cent GROUP BY cid),
         |asn AS (SELECT vec_id, v, cid FROM (
         |  SELECT e.vec_id, e.v, cv.cid, row_number() OVER (PARTITION BY e.vec_id
         |    ORDER BY ${cosSqlAB("v", "cv")} DESC, cid) AS rn FROM e, cv) WHERE rn = 1),
         |cur0 AS (SELECT cid, i AS pos,
         |  CAST(sum(CAST(floor(v[i]*1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)/1000000.0/count(*) AS cx
         |  FROM asn, generate_series(1,64) g(i) GROUP BY 1, 2),
         |cur AS (SELECT cid, list(cx ORDER BY pos) AS cv FROM cur0 GROUP BY cid),
         |asn2 AS (SELECT vec_id, v, cid FROM (
         |  SELECT a.vec_id, a.v, cur.cid, row_number() OVER (PARTITION BY a.vec_id
         |    ORDER BY ${cosSqlAB("a.v", "cur.cv")} DESC, cur.cid) AS rn FROM asn a, cur) WHERE rn = 1),
         |routed AS (SELECT q_id, qv, cid FROM (
         |  SELECT q_id, qv, cid, row_number() OVER (PARTITION BY q_id
         |    ORDER BY ${cosSqlAB("qv", "cur.cv")} DESC, cid) AS rn FROM q, cur) WHERE rn <= 2),
         |sv AS (SELECT q_id, a.vec_id, $cosSqlAV AS sim
         |  FROM asn2 a JOIN routed r ON a.cid = r.cid AND a.vec_id != r.q_id),
         |annr AS (SELECT q_id, vec_id, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id
         |    ORDER BY sim DESC, vec_id) AS rank FROM sv) WHERE rank <= 5),
         |t AS (SELECT q_id, vec_id,
         |  CAST(CAST(1 AS DOUBLE) / (60 + rank) AS DECIMAL(28,12)) AS t
         | FROM (SELECT * FROM lexr UNION ALL SELECT * FROM annr)),
         |fsum AS (SELECT q_id, vec_id, sum(t) AS s FROM t GROUP BY 1, 2),
         |res AS (SELECT q_id, vec_id, rank FROM (
         |  SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
         |    ORDER BY s DESC, vec_id) AS rank FROM fsum) WHERE rank <= 5),
         |tru AS (SELECT q_id, vec_id, rank FROM (
         |  SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
         |    ORDER BY sim DESC, vec_id) AS rank FROM (
         |    SELECT q_id, vec_id, $cosSql AS sim
         |    FROM e, q WHERE vec_id != q_id))
         | WHERE rank <= 5),
         |nt AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_truth FROM tru GROUP BY 1),
         |idcg AS (SELECT nt.q_id,
         |  sum(CAST(1.0/log2(g.r + 1) AS DECIMAL(28,12))) AS idcg
         | FROM nt, generate_series(1, 5) g(r) WHERE g.r <= nt.n_truth GROUP BY 1),
         |hits AS (SELECT r.q_id, CAST(count(*) AS BIGINT) AS hits,
         |  min(r.rank) AS frst,
         |  sum(CAST(1.0/log2(r.rank + 1) AS DECIMAL(28,12))) AS dcg
         | FROM res r JOIN tru USING (q_id, vec_id) GROUP BY 1),
         |pq AS (SELECT nt.q_id, nt.n_truth, coalesce(h.hits, 0) AS hits,
         |  round(CAST(coalesce(h.hits, 0) AS DOUBLE) /
         |    CAST(least(5, nt.n_truth) AS DOUBLE), 6) AS recall,
         |  round(coalesce(1.0 / CAST(h.frst AS DOUBLE), 0), 6) AS mrr,
         |  round(coalesce(CAST(h.dcg AS DOUBLE), 0) /
         |    CAST(i.idcg AS DOUBLE), 6) AS ndcg
         | FROM nt JOIN idcg i USING (q_id) LEFT JOIN hits h USING (q_id))
         |SELECT q_id, n_truth, hits, recall, mrr, ndcg,
         |  round(CAST(sum(CAST(recall AS DECIMAL(28,12))) OVER () AS DOUBLE)
         |    / count(*) OVER (), 6) AS macro_recall,
         |  round(CAST(sum(CAST(mrr AS DECIMAL(28,12))) OVER () AS DOUBLE)
         |    / count(*) OVER (), 6) AS macro_mrr,
         |  round(CAST(sum(CAST(ndcg AS DECIMAL(28,12))) OVER () AS DOUBLE)
         |    / count(*) OVER (), 6) AS macro_ndcg
         |FROM pq""".stripMargin,
    // delete-lifecycle capstone: q329's end-to-end replay over the
    // FILTERED corpus — lexical stats from live docs, recluster means
    // and re-assignment over live vectors, and the exhaustive truth
    // itself filtered (a deleted vector can neither be returned nor
    // expected)
    "q339_delete_lifecycle" ->
      s"""WITH ${normCteWhere("doc_id % 7 <> 3")},
         |tkb AS (SELECT doc_id, regexp_split_to_array(t, '\\s+') AS w FROM nrm),
         |dls AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM tkb),
         |stats AS (SELECT count(*) AS n_docs,
         |  CAST(sum(CAST(dl AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS avgdl FROM dls),
         |tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM (
         |    SELECT tkb.doc_id, dls.dl, unnest(tkb.w) AS term
         |    FROM tkb JOIN dls USING (doc_id))
         |  WHERE term IN (${inList(Bm25Terms)})
         |  GROUP BY 1, 2, 3),
         |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |scored AS (SELECT doc_id,
         |  CAST(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * (tf * (1.25 + 1)) /
         |    (tf + 1.25 * (1 - 0.75 + 0.75 * dl / avgdl)) AS DECIMAL(28,12)) AS part
         |  FROM tf JOIN dfreq USING (term) CROSS JOIN stats),
         |bmsc AS (SELECT doc_id, round(CAST(sum(part) AS DOUBLE), 6) AS bm25
         | FROM scored GROUP BY doc_id),
         |cand AS (SELECT doc_id AS vec_id, rn AS lrank FROM (
         |  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id)
         |    AS rn FROM bmsc) WHERE rn <= 50),
         |e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
         |lexr AS (SELECT q.q_id, c.vec_id, c.lrank AS rank
         |  FROM cand c, q WHERE c.vec_id != q.q_id),
         |cent AS (SELECT label AS cid, i AS pos,
         |  CAST(sum(CAST(floor(v[i]*1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)/1000000.0/count(*) AS cx
         |  FROM e, generate_series(1,64) g(i) WHERE vec_id % 10 != 0
         |  GROUP BY 1, 2),
         |cv AS (SELECT cid, list(cx ORDER BY pos) AS cv FROM cent GROUP BY cid),
         |asn AS (SELECT vec_id, v, cid FROM (
         |  SELECT e.vec_id, e.v, cv.cid, row_number() OVER (PARTITION BY e.vec_id
         |    ORDER BY ${cosSqlAB("v", "cv")} DESC, cid) AS rn FROM e, cv) WHERE rn = 1),
         |live AS (SELECT * FROM asn WHERE vec_id % 7 != 3),
         |cur0 AS (SELECT cid, i AS pos,
         |  CAST(sum(CAST(floor(v[i]*1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)/1000000.0/count(*) AS cx
         |  FROM live, generate_series(1,64) g(i) GROUP BY 1, 2),
         |cur AS (SELECT cid, list(cx ORDER BY pos) AS cv FROM cur0 GROUP BY cid),
         |asn2 AS (SELECT vec_id, v, cid FROM (
         |  SELECT a.vec_id, a.v, cur.cid, row_number() OVER (PARTITION BY a.vec_id
         |    ORDER BY ${cosSqlAB("a.v", "cur.cv")} DESC, cur.cid) AS rn FROM live a, cur) WHERE rn = 1),
         |routed AS (SELECT q_id, qv, cid FROM (
         |  SELECT q_id, qv, cid, row_number() OVER (PARTITION BY q_id
         |    ORDER BY ${cosSqlAB("qv", "cur.cv")} DESC, cid) AS rn FROM q, cur) WHERE rn <= 2),
         |sv AS (SELECT q_id, a.vec_id, $cosSqlAV AS sim
         |  FROM asn2 a JOIN routed r ON a.cid = r.cid AND a.vec_id != r.q_id),
         |annr AS (SELECT q_id, vec_id, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id
         |    ORDER BY sim DESC, vec_id) AS rank FROM sv) WHERE rank <= 5),
         |t AS (SELECT q_id, vec_id,
         |  CAST(CAST(1 AS DOUBLE) / (60 + rank) AS DECIMAL(28,12)) AS t
         | FROM (SELECT * FROM lexr UNION ALL SELECT * FROM annr)),
         |fsum AS (SELECT q_id, vec_id, sum(t) AS s FROM t GROUP BY 1, 2),
         |res AS (SELECT q_id, vec_id, rank FROM (
         |  SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
         |    ORDER BY s DESC, vec_id) AS rank FROM fsum) WHERE rank <= 5),
         |tru AS (SELECT q_id, vec_id, rank FROM (
         |  SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
         |    ORDER BY sim DESC, vec_id) AS rank FROM (
         |    SELECT q_id, vec_id, $cosSql AS sim
         |    FROM e, q WHERE vec_id != q_id AND vec_id % 7 != 3))
         | WHERE rank <= 5),
         |nt AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_truth FROM tru GROUP BY 1),
         |idcg AS (SELECT nt.q_id,
         |  sum(CAST(1.0/log2(g.r + 1) AS DECIMAL(28,12))) AS idcg
         | FROM nt, generate_series(1, 5) g(r) WHERE g.r <= nt.n_truth GROUP BY 1),
         |hits AS (SELECT r.q_id, CAST(count(*) AS BIGINT) AS hits,
         |  min(r.rank) AS frst,
         |  sum(CAST(1.0/log2(r.rank + 1) AS DECIMAL(28,12))) AS dcg
         | FROM res r JOIN tru USING (q_id, vec_id) GROUP BY 1),
         |pq AS (SELECT nt.q_id, nt.n_truth, coalesce(h.hits, 0) AS hits,
         |  round(CAST(coalesce(h.hits, 0) AS DOUBLE) /
         |    CAST(least(5, nt.n_truth) AS DOUBLE), 6) AS recall,
         |  round(coalesce(1.0 / CAST(h.frst AS DOUBLE), 0), 6) AS mrr,
         |  round(coalesce(CAST(h.dcg AS DOUBLE), 0) /
         |    CAST(i.idcg AS DOUBLE), 6) AS ndcg
         | FROM nt JOIN idcg i USING (q_id) LEFT JOIN hits h USING (q_id))
         |SELECT q_id, n_truth, hits, recall, mrr, ndcg,
         |  round(CAST(sum(CAST(recall AS DECIMAL(28,12))) OVER () AS DOUBLE)
         |    / count(*) OVER (), 6) AS macro_recall,
         |  round(CAST(sum(CAST(mrr AS DECIMAL(28,12))) OVER () AS DOUBLE)
         |    / count(*) OVER (), 6) AS macro_mrr,
         |  round(CAST(sum(CAST(ndcg AS DECIMAL(28,12))) OVER () AS DOUBLE)
         |    / count(*) OVER (), 6) AS macro_ndcg
         |FROM pq""".stripMargin,

    // retrieval drift: frozen centroids from the OLD shard route the
    // frozen-snapshot search; the recluster (q318's replay) refreshes
    // them from the current assignment; BOTH snapshots score against the
    // ONE exhaustive truth (it depends only on the ingested vectors)
    "q328_retrieval_drift" ->
      s"""WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |cent AS (SELECT label AS cid, i AS pos,
         |  CAST(sum(CAST(floor(v[i]*1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)/1000000.0/count(*) AS cx
         |  FROM e, generate_series(1,64) g(i) WHERE vec_id % 10 != 0
         |  GROUP BY 1, 2),
         |cv AS (SELECT cid, list(cx ORDER BY pos) AS cv FROM cent GROUP BY cid),
         |asn AS (SELECT vec_id, v, cid FROM (
         |  SELECT e.vec_id, e.v, cv.cid, row_number() OVER (PARTITION BY e.vec_id
         |    ORDER BY ${cosSqlAB("v", "cv")} DESC, cid) AS rn FROM e, cv) WHERE rn = 1),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
         |routed1 AS (SELECT q_id, qv, cid FROM (
         |  SELECT q_id, qv, cid, row_number() OVER (PARTITION BY q_id
         |    ORDER BY ${cosSqlAB("qv", "cv")} DESC, cid) AS rn FROM q, cv) WHERE rn <= 2),
         |s1 AS (SELECT q_id, a.vec_id, $cosSqlAV AS sim
         |  FROM asn a JOIN routed1 r ON a.cid = r.cid AND a.vec_id != r.q_id),
         |res1 AS (SELECT q_id, vec_id, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id
         |    ORDER BY sim DESC, vec_id) AS rank FROM s1) WHERE rank <= 5),
         |cur0 AS (SELECT cid, i AS pos,
         |  CAST(sum(CAST(floor(v[i]*1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)/1000000.0/count(*) AS cx
         |  FROM asn, generate_series(1,64) g(i) GROUP BY 1, 2),
         |cur AS (SELECT cid, list(cx ORDER BY pos) AS cv FROM cur0 GROUP BY cid),
         |asn2 AS (SELECT vec_id, v, cid FROM (
         |  SELECT a.vec_id, a.v, cur.cid, row_number() OVER (PARTITION BY a.vec_id
         |    ORDER BY ${cosSqlAB("a.v", "cur.cv")} DESC, cur.cid) AS rn FROM asn a, cur) WHERE rn = 1),
         |routed2 AS (SELECT q_id, qv, cid FROM (
         |  SELECT q_id, qv, cid, row_number() OVER (PARTITION BY q_id
         |    ORDER BY ${cosSqlAB("qv", "cur.cv")} DESC, cid) AS rn FROM q, cur) WHERE rn <= 2),
         |s2 AS (SELECT q_id, a.vec_id, $cosSqlAV AS sim
         |  FROM asn2 a JOIN routed2 r ON a.cid = r.cid AND a.vec_id != r.q_id),
         |res2 AS (SELECT q_id, vec_id, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id
         |    ORDER BY sim DESC, vec_id) AS rank FROM s2) WHERE rank <= 5),
         |tru AS (SELECT q_id, vec_id, rank FROM (
         |  SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
         |    ORDER BY sim DESC, vec_id) AS rank FROM (
         |    SELECT q_id, vec_id, $cosSql AS sim
         |    FROM e, q WHERE vec_id != q_id))
         | WHERE rank <= 5),
         |nt AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_truth FROM tru GROUP BY 1),
         |idcg AS (SELECT nt.q_id,
         |  sum(CAST(1.0/log2(g.r + 1) AS DECIMAL(28,12))) AS idcg
         | FROM nt, generate_series(1, 5) g(r) WHERE g.r <= nt.n_truth GROUP BY 1),
         |h1 AS (SELECT r.q_id, CAST(count(*) AS BIGINT) AS hits,
         |  sum(CAST(1.0/log2(r.rank + 1) AS DECIMAL(28,12))) AS dcg
         | FROM res1 r JOIN tru USING (q_id, vec_id) GROUP BY 1),
         |p1 AS (SELECT nt.q_id,
         |  round(CAST(coalesce(h.hits, 0) AS DOUBLE) /
         |    CAST(least(5, nt.n_truth) AS DOUBLE), 6) AS recall_frozen,
         |  round(coalesce(CAST(h.dcg AS DOUBLE), 0) /
         |    CAST(i.idcg AS DOUBLE), 6) AS ndcg_frozen
         | FROM nt JOIN idcg i USING (q_id) LEFT JOIN h1 h USING (q_id)),
         |h2 AS (SELECT r.q_id, CAST(count(*) AS BIGINT) AS hits,
         |  sum(CAST(1.0/log2(r.rank + 1) AS DECIMAL(28,12))) AS dcg
         | FROM res2 r JOIN tru USING (q_id, vec_id) GROUP BY 1),
         |p2 AS (SELECT nt.q_id,
         |  round(CAST(coalesce(h.hits, 0) AS DOUBLE) /
         |    CAST(least(5, nt.n_truth) AS DOUBLE), 6) AS recall_reclustered,
         |  round(coalesce(CAST(h.dcg AS DOUBLE), 0) /
         |    CAST(i.idcg AS DOUBLE), 6) AS ndcg_reclustered
         | FROM nt JOIN idcg i USING (q_id) LEFT JOIN h2 h USING (q_id))
         |SELECT q_id, recall_frozen, ndcg_frozen,
         |  recall_reclustered, ndcg_reclustered,
         |  round(recall_reclustered - recall_frozen, 6) AS d_recall,
         |  round(ndcg_reclustered - ndcg_frozen, 6) AS d_ndcg
         |FROM p1 JOIN p2 USING (q_id)""".stripMargin,
    "q313_ivf_cell_drift" ->
      s"""WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |cent AS (SELECT label AS cid, i AS pos,
         |  CAST(sum(CAST(floor(v[i]*1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)/1000000.0/count(*) AS cx
         |  FROM e, generate_series(1,64) g(i) WHERE vec_id % 10 != 0
         |  GROUP BY 1, 2),
         |cv AS (SELECT cid, list(cx ORDER BY pos) AS cv FROM cent GROUP BY cid),
         |asn AS (SELECT vec_id, v, cid FROM (
         |  SELECT e.vec_id, e.v, cv.cid, row_number() OVER (PARTITION BY e.vec_id
         |    ORDER BY ${cosSqlAB("v", "cv")} DESC, cid) AS rn FROM e, cv) WHERE rn = 1),
         |cur AS (SELECT cid, list(cx ORDER BY pos) AS mv FROM (
         |  SELECT cid, i AS pos,
         |    CAST(sum(CAST(floor(v[i]*1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)/1000000.0/count(*) AS cx
         |  FROM asn, generate_series(1,64) g(i) GROUP BY 1, 2) GROUP BY cid),
         |n AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_members FROM asn
         | GROUP BY 1)
         |SELECT cv.cid, COALESCE(n_members, 0) AS n_members,
         | CASE WHEN cur.mv IS NOT NULL
         |   THEN ${cosSqlAB("cv.cv", "cur.mv")} END AS cos_sim,
         | CASE WHEN cur.mv IS NOT NULL
         |   THEN round(1.0 - ${cosSqlAB("cv.cv", "cur.mv")}, 6) END AS drift
         |FROM cv LEFT JOIN cur USING (cid) LEFT JOIN n USING (cid)""".stripMargin,
    "q264_ann_incremental" -> annIncrementalOracleSql,
    // ranking metrics: IVF results (q48 chain, rank<=5) scored against the
    // brute-force truth — binary hits, 1/log2(r+1) gains quantized to
    // DECIMAL pre-sum, macro averages over the query battery
    "q266_ranking_metrics" ->
      s"""WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |cent AS (SELECT label AS cid, i AS pos,
         |  CAST(sum(CAST(floor(v[i]*1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)/1000000.0/count(*) AS cx
         |  FROM e, generate_series(1,64) g(i) GROUP BY 1, 2),
         |cv AS (SELECT cid, list(cx ORDER BY pos) AS cv FROM cent GROUP BY cid),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
         |routed AS (SELECT q_id, qv, cid FROM (
         |  SELECT q_id, qv, cid, row_number() OVER (PARTITION BY q_id
         |    ORDER BY ${cosSqlAB("qv", "cv")} DESC, cid) AS rn FROM q, cv) WHERE rn = 1),
         |res AS (SELECT q_id, vec_id, rank FROM (
         |  SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
         |    ORDER BY sim DESC, vec_id) AS rank FROM (
         |    SELECT q_id, vec_id, $cosSql AS sim
         |    FROM e JOIN routed r ON e.label = r.cid AND e.vec_id != r.q_id))
         | WHERE rank <= 5),
         |tru AS (SELECT q_id, vec_id, rank FROM (
         |  SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
         |    ORDER BY sim DESC, vec_id) AS rank FROM (
         |    SELECT q_id, vec_id, $cosSql AS sim
         |    FROM e, q WHERE vec_id != q_id))
         | WHERE rank <= 5),
         |nt AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_truth FROM tru GROUP BY 1),
         |idcg AS (SELECT nt.q_id,
         |  sum(CAST(1.0/log2(g.r + 1) AS DECIMAL(28,12))) AS idcg
         | FROM nt, generate_series(1, 5) g(r) WHERE g.r <= nt.n_truth GROUP BY 1),
         |hits AS (SELECT r.q_id, CAST(count(*) AS BIGINT) AS hits,
         |  min(r.rank) AS frst,
         |  sum(CAST(1.0/log2(r.rank + 1) AS DECIMAL(28,12))) AS dcg
         | FROM res r JOIN tru USING (q_id, vec_id) GROUP BY 1),
         |pq AS (SELECT nt.q_id, nt.n_truth, coalesce(h.hits, 0) AS hits,
         |  round(CAST(coalesce(h.hits, 0) AS DOUBLE) /
         |    CAST(least(5, nt.n_truth) AS DOUBLE), 6) AS recall,
         |  round(coalesce(1.0 / CAST(h.frst AS DOUBLE), 0), 6) AS mrr,
         |  round(coalesce(CAST(h.dcg AS DOUBLE), 0) /
         |    CAST(i.idcg AS DOUBLE), 6) AS ndcg
         | FROM nt JOIN idcg i USING (q_id) LEFT JOIN hits h USING (q_id))
         |SELECT q_id, n_truth, hits, recall, mrr, ndcg,
         |  round(CAST(sum(CAST(recall AS DECIMAL(28,12))) OVER () AS DOUBLE)
         |    / count(*) OVER (), 6) AS macro_recall,
         |  round(CAST(sum(CAST(mrr AS DECIMAL(28,12))) OVER () AS DOUBLE)
         |    / count(*) OVER (), 6) AS macro_mrr,
         |  round(CAST(sum(CAST(ndcg AS DECIMAL(28,12))) OVER () AS DOUBLE)
         |    / count(*) OVER (), 6) AS macro_ndcg
         |FROM pq""".stripMargin,
    // calibration: the q256 NB chain on a fold split (the per-token
    // left-join floor IS the OOV closed form), softmax with DECIMAL-
    // quantized exp terms, then bins/ECE/Brier with pinned op order
    "q282_calibration" -> nbCalibrationSqlFrom(
      raw"""tk AS (SELECT doc_id, source,
         |  regexp_split_to_array(trim(text), '\s+') AS w,
         |  ('0x' || substr(md5(doc_id || ':fold'), 1, 15))::BIGINT % 5 AS fold
         | FROM documents)""".stripMargin),
    // the quality loop shares the whole NB + calibration replay; only the
    // label derivation differs — the q89 rule CASE instead of `source`
    "q314_quality_loop" -> nbCalibrationSqlFrom(
      raw"""t0 AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w,
         |  ('0x' || substr(md5(doc_id || ':fold'), 1, 15))::BIGINT % 5 AS fold
         | FROM documents),
         |qb AS (SELECT doc_id, w, fold, len(w)::BIGINT AS ws_tokens,
         |  round(length(array_to_string(w, ''))::DOUBLE / len(w), 6) AS avg_token_len,
         |  ${shingleExpr(2)} AS g,
         |  round(len(list_filter(w, t -> t IN (${inList(TextOps.Stopwords("en"))})))::DOUBLE
         |    / len(w), 6) AS stop_ratio FROM t0),
         |qc AS (SELECT doc_id, w, fold, ws_tokens, avg_token_len,
         |  CASE WHEN len(g) > 0
         |    THEN round(1.0 - len(list_distinct(g))::DOUBLE / len(g), 6)
         |    ELSE 0.0 END AS dup_2gram_ratio, stop_ratio FROM qb),
         |tk AS (SELECT doc_id,
         |  CASE WHEN ws_tokens >= 10 AND ws_tokens <= 5000
         |    AND avg_token_len >= 2.0 AND avg_token_len <= 12.0
         |    AND dup_2gram_ratio <= 0.3 AND stop_ratio >= 0.01
         |   THEN 'keep' ELSE 'drop' END AS source, w, fold FROM qc)""".stripMargin),
    // filter audit: the q89 rule CASE labels the corpus, the q256 NB
    // trainScore replay predicts, per-source disagreement rollup
    "q317_filter_audit" ->
      raw"""WITH $toksCte,
         |qb AS (SELECT doc_id, source, w, len(w)::BIGINT AS ws_tokens,
         |  round(length(array_to_string(w, ''))::DOUBLE / len(w), 6) AS avg_token_len,
         |  ${shingleExpr(2)} AS g,
         |  round(len(list_filter(w, t -> t IN (${inList(TextOps.Stopwords("en"))})))::DOUBLE
         |    / len(w), 6) AS stop_ratio FROM toks),
         |qc AS (SELECT doc_id, source, w, ws_tokens, avg_token_len,
         |  CASE WHEN len(g) > 0
         |    THEN round(1.0 - len(list_distinct(g))::DOUBLE / len(g), 6)
         |    ELSE 0.0 END AS dup_2gram_ratio, stop_ratio FROM qb),
         |lab AS (SELECT doc_id, source,
         |  CASE WHEN ws_tokens >= 10 AND ws_tokens <= 5000
         |    AND avg_token_len >= 2.0 AND avg_token_len <= 12.0
         |    AND dup_2gram_ratio <= 0.3 AND stop_ratio >= 0.01
         |   THEN 'keep' ELSE 'drop' END AS c, w FROM qc),
         |tt AS MATERIALIZED (SELECT c, unnest(w) AS tok FROM lab),
         |cvc AS MATERIALIZED (SELECT c, tok, CAST(count(*) AS BIGINT) AS cnt
         | FROM tt GROUP BY 1, 2),
         |cs AS (SELECT c, CAST(sum(cnt) AS BIGINT) AS toks FROM cvc GROUP BY 1),
         |vv AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM cvc),
         |pr AS (SELECT c, CAST(count(*) AS BIGINT) AS nd FROM lab GROUP BY 1),
         |nt AS (SELECT CAST(count(*) AS BIGINT) AS ndtot FROM lab),
         |st AS MATERIALIZED (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS n
         | FROM (SELECT doc_id, unnest(w) AS tok FROM lab) GROUP BY 1, 2),
         |tm AS (SELECT st.doc_id, cs.c,
         |  CAST(st.n * ln(CAST(coalesce(cvc.cnt, 0) + 1 AS DOUBLE)
         |    / CAST(cs.toks + vv.v AS DOUBLE)) AS DECIMAL(28,12)) AS lp
         | FROM st CROSS JOIN cs CROSS JOIN vv
         | LEFT JOIN cvc ON cvc.c = cs.c AND cvc.tok = st.tok),
         |sc AS (SELECT doc_id, c, sum(lp) AS slp FROM tm GROUP BY 1, 2),
         |fin AS (SELECT sc.doc_id, sc.c,
         |  round(CAST(slp AS DOUBLE)
         |    + ln(CAST(pr.nd AS DOUBLE) / CAST(nt.ndtot AS DOUBLE)), 6)
         |    AS logp
         | FROM sc JOIN pr USING (c) CROSS JOIN nt),
         |pred AS (SELECT doc_id, c AS pl FROM (
         | SELECT *, row_number() OVER (PARTITION BY doc_id
         |   ORDER BY logp DESC, c) AS rn FROM fin) WHERE rn = 1)
         |SELECT l.source, CAST(count(*) AS BIGINT) AS n_docs,
         | CAST(sum(CASE WHEN p.pl = l.c THEN 1 ELSE 0 END) AS BIGINT)
         |   AS n_agree,
         | CAST(sum(CASE WHEN p.pl = 'keep' AND l.c = 'drop' THEN 1 ELSE 0
         |   END) AS BIGINT) AS n_false_keep,
         | CAST(sum(CASE WHEN p.pl = 'drop' AND l.c = 'keep' THEN 1 ELSE 0
         |   END) AS BIGINT) AS n_false_drop,
         | round(CAST(sum(CASE WHEN p.pl = l.c THEN 1 ELSE 0 END) AS DOUBLE)
         |   / count(*), 6) AS agree_rate
         |FROM lab l JOIN pred p USING (doc_id) GROUP BY 1""".stripMargin,
    // filter drift: the q317 NB replay with the TRAINING CTEs restricted
    // to the prior snapshot (doc_id%5!=4); scoring runs over everything,
    // and the rollup diffs per-source keep-rates old vs new shard
    "q319_filter_drift" ->
      raw"""WITH $toksCte,
         |qb AS (SELECT doc_id, source, w, len(w)::BIGINT AS ws_tokens,
         |  round(length(array_to_string(w, ''))::DOUBLE / len(w), 6) AS avg_token_len,
         |  ${shingleExpr(2)} AS g,
         |  round(len(list_filter(w, t -> t IN (${inList(TextOps.Stopwords("en"))})))::DOUBLE
         |    / len(w), 6) AS stop_ratio FROM toks),
         |qc AS (SELECT doc_id, source, w, ws_tokens, avg_token_len,
         |  CASE WHEN len(g) > 0
         |    THEN round(1.0 - len(list_distinct(g))::DOUBLE / len(g), 6)
         |    ELSE 0.0 END AS dup_2gram_ratio, stop_ratio FROM qb),
         |lab AS (SELECT doc_id, source,
         |  CASE WHEN ws_tokens >= 10 AND ws_tokens <= 5000
         |    AND avg_token_len >= 2.0 AND avg_token_len <= 12.0
         |    AND dup_2gram_ratio <= 0.3 AND stop_ratio >= 0.01
         |   THEN 'keep' ELSE 'drop' END AS c, w FROM qc),
         |tt AS MATERIALIZED (SELECT c, unnest(w) AS tok FROM lab
         | WHERE doc_id % 5 != 4),
         |cvc AS MATERIALIZED (SELECT c, tok, CAST(count(*) AS BIGINT) AS cnt
         | FROM tt GROUP BY 1, 2),
         |cs AS (SELECT c, CAST(sum(cnt) AS BIGINT) AS toks FROM cvc GROUP BY 1),
         |vv AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM cvc),
         |pr AS (SELECT c, CAST(count(*) AS BIGINT) AS nd FROM lab
         | WHERE doc_id % 5 != 4 GROUP BY 1),
         |nt AS (SELECT CAST(count(*) AS BIGINT) AS ndtot FROM lab
         | WHERE doc_id % 5 != 4),
         |st AS MATERIALIZED (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS n
         | FROM (SELECT doc_id, unnest(w) AS tok FROM lab) GROUP BY 1, 2),
         |tm AS (SELECT st.doc_id, cs.c,
         |  CAST(st.n * ln(CAST(coalesce(cvc.cnt, 0) + 1 AS DOUBLE)
         |    / CAST(cs.toks + vv.v AS DOUBLE)) AS DECIMAL(28,12)) AS lp
         | FROM st CROSS JOIN cs CROSS JOIN vv
         | LEFT JOIN cvc ON cvc.c = cs.c AND cvc.tok = st.tok),
         |sc AS (SELECT doc_id, c, sum(lp) AS slp FROM tm GROUP BY 1, 2),
         |fin AS (SELECT sc.doc_id, sc.c,
         |  round(CAST(slp AS DOUBLE)
         |    + ln(CAST(pr.nd AS DOUBLE) / CAST(nt.ndtot AS DOUBLE)), 6)
         |    AS logp
         | FROM sc JOIN pr USING (c) CROSS JOIN nt),
         |pred AS (SELECT doc_id, c AS pl FROM (
         | SELECT *, row_number() OVER (PARTITION BY doc_id
         |   ORDER BY logp DESC, c) AS rn FROM fin) WHERE rn = 1),
         |agg AS (SELECT l.source,
         |  CAST(sum(CASE WHEN l.doc_id % 5 != 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
         |  CAST(sum(CASE WHEN l.doc_id % 5 = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
         |  CAST(sum(CASE WHEN l.doc_id % 5 != 4 AND p.pl = 'keep' THEN 1
         |    ELSE 0 END) AS BIGINT) AS k_old,
         |  CAST(sum(CASE WHEN l.doc_id % 5 = 4 AND p.pl = 'keep' THEN 1
         |    ELSE 0 END) AS BIGINT) AS k_new
         | FROM lab l JOIN pred p USING (doc_id) GROUP BY 1),
         |rt AS (SELECT source, n_old, n_new,
         |  CASE WHEN n_old > 0
         |    THEN round(CAST(k_old AS DOUBLE) / n_old, 6) END AS keep_rate_old,
         |  CASE WHEN n_new > 0
         |    THEN round(CAST(k_new AS DOUBLE) / n_new, 6) END AS keep_rate_new
         | FROM agg)
         |SELECT source, n_old, n_new, keep_rate_old, keep_rate_new,
         | CASE WHEN n_old > 0 AND n_new > 0
         |   THEN round(keep_rate_new - keep_rate_old, 6) END AS drift
         |FROM rt""".stripMargin,
    // TextRank: co-occurrence edges from the normalized token stream,
    // then the q162 power-iteration replay (symmetrized, no dangling)
    "q281_textrank" -> {
      val stopIn = inList(TextOps.Stopwords("en"))
      val body = (1 to 3).map { i =>
        val p = s"r${i - 1}"
        s"""c$i AS (SELECT e.dst AS id, sum(p.r / d.deg) AS c
           |  FROM e0 e JOIN $p p ON e.src = p.id JOIN deg d ON e.src = d.src
           |  GROUP BY 1),
           |d$i AS (SELECT coalesce(sum(p.r), 0.0) AS dm FROM $p p
           |  LEFT JOIN srcs s2 ON p.id = s2.src WHERE s2.src IS NULL),
           |r$i AS (SELECT nodes.id,
           |    (1.0 - 0.85) / nn.n
           |      + 0.85 * (coalesce(c$i.c, 0.0) + d$i.dm / nn.n) AS r
           |  FROM nodes CROSS JOIN nn CROSS JOIN d$i
           |  LEFT JOIN c$i ON nodes.id = c$i.id)""".stripMargin
      }.mkString(",\n")
      raw"""WITH $normCte,
         |tk AS (SELECT list_filter(regexp_split_to_array(t, '\s+'),
         |    x -> length(x) > 0 AND NOT x IN ($stopIn)) AS w FROM nrm),
         |pp AS (SELECT unnest(CASE WHEN len(w) >= 2
         |  THEN list_transform(generate_series(1, len(w) - 1),
         |    i -> [least(w[i], w[i+1]), greatest(w[i], w[i+1])])
         |  ELSE [] END) AS p FROM tk),
         |und AS (SELECT DISTINCT p[1] AS a, p[2] AS b FROM pp WHERE p[1] != p[2]),
         |e0 AS (SELECT a AS src, b AS dst FROM und UNION ALL SELECT b, a FROM und),
         |nodes AS (SELECT DISTINCT src AS id FROM e0),
         |deg AS (SELECT src, count(*) AS deg FROM e0 GROUP BY 1),
         |srcs AS (SELECT DISTINCT src FROM e0),
         |nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
         |r0 AS (SELECT id, 1.0 / nn.n AS r FROM nodes CROSS JOIN nn),
         |$body,
         |rk AS (SELECT id AS word, round(r, 6) AS rank FROM r3)
         |SELECT word, rank, kw_rank FROM (
         |  SELECT *, row_number() OVER (ORDER BY rank DESC, word) AS kw_rank
         |  FROM rk)
         |WHERE kw_rank <= 30""".stripMargin
    },
    // semantic decontamination: the q48 routing chain with eval queries,
    // rank <= 50 candidates, sim >= 0.35 hits rolled up per corpus vector
    "q279_sem_decontaminate" ->
      s"""WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |cent AS (SELECT label AS cid, i AS pos,
         |  CAST(sum(CAST(floor(v[i]*1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)/1000000.0/count(*) AS cx
         |  FROM e, generate_series(1,64) g(i) GROUP BY 1, 2),
         |cv AS (SELECT cid, list(cx ORDER BY pos) AS cv FROM cent GROUP BY cid),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 10 = 0),
         |routed AS (SELECT q_id, qv, cid FROM (
         |  SELECT q_id, qv, cid, row_number() OVER (PARTITION BY q_id
         |    ORDER BY ${cosSqlAB("qv", "cv")} DESC, cid) AS rn FROM q, cv) WHERE rn = 1),
         |s AS (SELECT q_id, vec_id, $cosSql AS sim
         |  FROM e JOIN routed r ON e.label = r.cid AND e.vec_id != r.q_id),
         |topk AS (SELECT q_id, vec_id, sim FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank FROM s)
         | WHERE rank <= 50),
         |hits AS (SELECT vec_id, CAST(count(*) AS BIGINT) AS n_eval_hits,
         |  max(sim) AS max_eval_sim FROM topk WHERE sim >= 0.35 GROUP BY 1)
         |SELECT emb.vec_id, coalesce(h.n_eval_hits, 0) AS n_eval_hits,
         |  h.max_eval_sim,
         |  CAST(h.max_eval_sim IS NOT NULL AS INT) AS contaminated
         |FROM embeddings emb LEFT JOIN hits h ON emb.vec_id = h.vec_id""".stripMargin,
    // DSIR: hashed uni+bigram bucket counts, add-1/2 smoothed log-ratios
    // quantized to DECIMAL before the per-doc sum, Gumbel keys from the
    // salted hash, global top-100 by (score, doc_id)
    "q271_dsir" ->
      raw"""WITH tk AS (SELECT doc_id, lang = 'en' AS t,
         |  regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
         |gr AS (SELECT doc_id, t, unnest(w) AS g FROM tk
         |  UNION ALL
         |  SELECT doc_id, t, unnest(CASE WHEN len(w) >= 2
         |    THEN list_transform(generate_series(1, len(w) - 1), i -> w[i] || ' ' || w[i+1])
         |    ELSE [] END) FROM tk),
         |hb AS (SELECT doc_id, t, ${h64d("g")} % 256 AS b FROM gr),
         |pd AS (SELECT doc_id, t, b, CAST(count(*) AS BIGINT) AS n
         |  FROM hb GROUP BY 1, 2, 3),
         |bc AS (SELECT b, CAST(sum(n) AS BIGINT) AS rc,
         |  CAST(sum(CASE WHEN t THEN n ELSE 0 END) AS BIGINT) AS tc
         |  FROM pd GROUP BY 1),
         |tot AS (SELECT CAST(sum(rc) AS BIGINT) AS rn_tot,
         |  CAST(sum(tc) AS BIGINT) AS tc_tot FROM bc),
         |lam AS (SELECT b, CAST(
         |    ln((CAST(tc AS DOUBLE) + 0.5) / (CAST(tc_tot AS DOUBLE) + 128.0))
         |  - ln((CAST(rc AS DOUBLE) + 0.5) / (CAST(rn_tot AS DOUBLE) + 128.0))
         |  AS DECIMAL(28,12)) AS lam FROM bc CROSS JOIN tot),
         |dw AS (SELECT doc_id, sum(CAST(n AS DECIMAL(10,0)) * lam) AS iw
         |  FROM pd JOIN lam USING (b) GROUP BY 1),
         |sc AS (SELECT doc_id, iw, CAST(iw + CAST(-ln(-ln(
         |    ((${h64d("'dsir:' || CAST(doc_id AS VARCHAR)")} % 1000000) + 0.5) / 1000000.0))
         |  AS DECIMAL(28,12)) AS DOUBLE) AS score FROM dw),
         |rk AS (SELECT doc_id, iw, score,
         |  row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM sc)
         |SELECT doc_id, round(CAST(iw AS DOUBLE), 6) AS imp_weight,
         |  round(score, 6) AS score, rank
         |FROM rk WHERE rank <= 100""".stripMargin,
    // record linkage: the same blocked pairs, scored by DuckDB's OWN
    // jaro_winkler_similarity — an independent implementation of the
    // measure, so parity here certifies the native expression
    "q267_er_pairs" ->
      """WITH b AS (SELECT p_partkey AS id, p_name AS nm,
        |  split_part(p_name, ' ', 2) || CAST(p_size AS VARCHAR) AS blk FROM part),
        |ok AS (SELECT blk FROM (SELECT blk, count(*) AS c FROM b GROUP BY 1) WHERE c <= 10000),
        |i AS (SELECT b.* FROM b JOIN ok USING (blk))
        |SELECT a.id AS id_a, c.id AS id_b, a.nm AS name_a, c.nm AS name_b,
        |  round(jaro_winkler_similarity(a.nm, c.nm), 6) AS jw
        |FROM i a JOIN i c ON a.blk = c.blk AND a.id < c.id
        |WHERE jaro_winkler_similarity(a.nm, c.nm) >= 0.9""".stripMargin,
    // ER entities: q267's pair chain + the recursive reachability closure
    // over the part universe (same idiom as q265/q75)
    "q268_er_entities" ->
      """WITH RECURSIVE b AS (SELECT p_partkey AS id, p_name AS nm,
        |  split_part(p_name, ' ', 2) || CAST(p_size AS VARCHAR) AS blk FROM part),
        |ok AS (SELECT blk FROM (SELECT blk, count(*) AS c FROM b GROUP BY 1) WHERE c <= 10000),
        |i AS (SELECT b.* FROM b JOIN ok USING (blk)),
        |prs AS (SELECT a.id AS id_a, c.id AS id_b
        |  FROM i a JOIN i c ON a.blk = c.blk AND a.id < c.id
        |  WHERE jaro_winkler_similarity(a.nm, c.nm) >= 0.9),
        |edges AS (SELECT id_a AS u, id_b AS v FROM prs
        |  UNION ALL SELECT id_b, id_a FROM prs),
        |reach AS (SELECT p_partkey AS v, p_partkey AS lbl FROM part
        |  UNION
        |  SELECT e2.v, r.lbl FROM edges e2 JOIN reach r ON r.v = e2.u),
        |cl AS (SELECT v AS p_partkey, min(lbl) AS cluster_id FROM reach GROUP BY v)
        |SELECT p_partkey, cluster_id,
        |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
        |  CAST(p_partkey = cluster_id AS INT) AS keep
        |FROM cl""".stripMargin,
    // semantic clusters: the q263 pair chain + the q75 recursive
    // reachability closure over the embedding vertex universe
    "q265_semantic_clusters" ->
      s"""WITH RECURSIVE e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |cent AS (SELECT label AS cid, i AS pos,
         |  CAST(sum(CAST(floor(v[i]*1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)/1000000.0/count(*) AS cx
         |  FROM e, generate_series(1,64) g(i) GROUP BY 1, 2),
         |cv AS (SELECT cid, list(cx ORDER BY pos) AS cv FROM cent GROUP BY cid),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e),
         |routed AS (SELECT q_id, qv, cid FROM (
         |  SELECT q_id, qv, cid, row_number() OVER (PARTITION BY q_id
         |    ORDER BY ${cosSqlAB("qv", "cv")} DESC, cid) AS rn FROM q, cv) WHERE rn <= 2),
         |s AS (SELECT q_id, vec_id, $cosSql AS sim
         |  FROM e JOIN routed r ON e.label = r.cid AND e.vec_id != r.q_id),
         |topk AS (SELECT q_id, vec_id, sim FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank FROM s)
         | WHERE rank <= 5),
         |prs AS (SELECT DISTINCT greatest(q_id, vec_id) AS dup_id,
         |  least(q_id, vec_id) AS keep_id FROM topk WHERE sim >= 0.35),
         |edges AS (SELECT dup_id AS v, keep_id AS u FROM prs
         |  UNION ALL SELECT keep_id, dup_id FROM prs),
         |reach AS (SELECT vec_id AS v, vec_id AS lbl FROM embeddings
         |  UNION
         |  SELECT e2.v, r.lbl FROM edges e2 JOIN reach r ON r.v = e2.u),
         |cl AS (SELECT v AS vec_id, min(lbl) AS cluster_id FROM reach GROUP BY v)
         |SELECT vec_id, cluster_id,
         |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
         |  CAST(vec_id = cluster_id AS INT) AS keep
         |FROM cl""".stripMargin,
    // semantic near-dup pairs: the q260 chain with k=5, a sim threshold,
    // and DISTINCT canonicalized (dup > keep) pairs
    "q263_semdedup_pairs" ->
      s"""WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |cent AS (SELECT label AS cid, i AS pos,
         |  CAST(sum(CAST(floor(v[i]*1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)/1000000.0/count(*) AS cx
         |  FROM e, generate_series(1,64) g(i) GROUP BY 1, 2),
         |cv AS (SELECT cid, list(cx ORDER BY pos) AS cv FROM cent GROUP BY cid),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e),
         |routed AS (SELECT q_id, qv, cid FROM (
         |  SELECT q_id, qv, cid, row_number() OVER (PARTITION BY q_id
         |    ORDER BY ${cosSqlAB("qv", "cv")} DESC, cid) AS rn FROM q, cv) WHERE rn <= 2),
         |s AS (SELECT q_id, vec_id, $cosSql AS sim
         |  FROM e JOIN routed r ON e.label = r.cid AND e.vec_id != r.q_id),
         |topk AS (SELECT q_id, vec_id, sim FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank FROM s)
         | WHERE rank <= 5)
         |SELECT DISTINCT greatest(q_id, vec_id) AS dup_id,
         |  least(q_id, vec_id) AS keep_id, sim
         |FROM topk WHERE sim >= 0.35""".stripMargin,
    // ANN join: q246's routing/ranking shape with every vector as a query
    // and no predicate — candidates come only from the 2 probed cells
    "q260_ann_join" -> annJoinOracleSql,
    // the stored-index join is value-identical to the in-memory one over
    // the same (cells, vectors) — shared oracle
    "q338_ann_join_indexed" -> annJoinOracleSql,
    "q246_filtered_ann" ->
      s"""WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |cent AS (SELECT label AS cid, i AS pos,
         |  CAST(sum(CAST(floor(v[i]*1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)/1000000.0/count(*) AS cx
         |  FROM e, generate_series(1,64) g(i) GROUP BY 1, 2),
         |cv AS (SELECT cid, list(cx ORDER BY pos) AS cv FROM cent GROUP BY cid),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
         |routed AS (SELECT q_id, qv, cid FROM (
         |  SELECT q_id, qv, cid, row_number() OVER (PARTITION BY q_id
         |    ORDER BY ${cosSqlAB("qv", "cv")} DESC, cid) AS rn FROM q, cv) WHERE rn <= 2),
         |s AS (SELECT q_id, vec_id, $cosSql AS sim
         |  FROM e JOIN routed r ON e.label = r.cid AND e.vec_id != r.q_id
         |  WHERE e.vec_id % 3 = 0)
         |SELECT q_id, vec_id, sim, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank FROM s)
         |WHERE rank <= 3""".stripMargin,
    "q36_centroids" ->
      """SELECT label, i AS dim,
        | CAST(sum(CAST(round(CAST(embedding[i] AS DOUBLE), 6) AS DECIMAL(38,6))) AS DOUBLE)
        |   / count(*) AS centroid,
        | count(*) AS n
        |FROM embeddings, generate_series(1, 64) g(i)
        |GROUP BY label, i""".stripMargin,
    "q80_incremental_dedup" -> incrementalOracleSql,
    "q76_sample_split" ->
      s"""WITH smp AS (SELECT doc_id, source FROM documents
         |  WHERE ${h64d("'smp:' || doc_id")} % 1000 <
         |    CASE WHEN source IN ('src0', 'src1') THEN 0.25 ELSE 0.75 END * 1000),
         |h AS (SELECT doc_id, source, ${h64d("'split:' || doc_id")} % 100 AS h FROM smp)
         |SELECT doc_id, source,
         |  CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val' ELSE 'test' END AS split
         |FROM h""".stripMargin,
    "q77_repetition" ->
      s"""WITH $toksCte,
         |g2 AS (SELECT doc_id, ${shingleExpr(2)} AS g FROM toks),
         |base AS (SELECT doc_id, len(w)::BIGINT AS n_tokens,
         |  round(1.0 - len(list_distinct(w))::DOUBLE / len(w), 6) AS dup_token_ratio,
         |  CASE WHEN len(g) > 0
         |    THEN round(1.0 - len(list_distinct(g))::DOUBLE / len(g), 6)
         |    ELSE 0.0 END AS dup_2gram_ratio
         |  FROM toks JOIN g2 USING (doc_id)),
         |tf AS (SELECT doc_id, unnest(w) AS tok FROM toks),
         |per AS (SELECT doc_id, tok, count(*) AS cnt FROM tf GROUP BY 1, 2),
         |top AS (SELECT doc_id, tok AS top_token, cnt FROM (
         |  SELECT *, row_number() OVER (PARTITION BY doc_id
         |    ORDER BY cnt DESC, tok DESC) AS rn FROM per) WHERE rn = 1)
         |SELECT doc_id, n_tokens, dup_token_ratio, dup_2gram_ratio, top_token,
         |  round(cnt::DOUBLE / n_tokens, 6) AS top_token_ratio
         |FROM base JOIN top USING (doc_id)""".stripMargin,
    "q78_pii_scrub" ->
      s"""WITH a AS (SELECT doc_id,
         |  text || ' contact user' || doc_id || '@example.com or call 555-' ||
         |  lpad((doc_id % 1000)::VARCHAR, 3, '0') || '-' ||
         |  lpad(((doc_id * 7) % 10000)::VARCHAR, 4, '0') AS aug
         |  FROM documents)
         |SELECT doc_id,
         |  len(regexp_extract_all(aug, '${TextOps.EmailPattern}'))::BIGINT AS n_emails,
         |  len(regexp_extract_all(aug, '${TextOps.PhonePattern}'))::BIGINT AS n_phones,
         |  md5(regexp_replace(regexp_replace(aug, '${TextOps.EmailPattern}', '<EMAIL>', 'g'),
         |    '${TextOps.PhonePattern}', '<PHONE>', 'g')) AS scrubbed_hash
         |FROM a""".stripMargin,
    "q79_token_budget" ->
      raw"""WITH t AS (SELECT doc_id, source,
         |  len(regexp_split_to_array(trim(text), '\s+'))::BIGINT AS ws_tokens,
         |  ${h64d("'ord:' || doc_id")} AS h FROM documents),
         |c AS (SELECT doc_id, source, ws_tokens,
         |  CAST(sum(ws_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens FROM t)
         |SELECT doc_id, source, ws_tokens, cum_tokens FROM c
         |WHERE cum_tokens <= 800""".stripMargin,
    "q215_jl_project" -> {
      val legs = Similarity.hyperplanes(16, 64).zipWithIndex.map {
        case (p, j) =>
          s"SELECT vec_id, $j AS dim, " +
            s"round((${Similarity.planeDotSql("v", p)}) " +
            "/ sqrt(CAST(16 AS DOUBLE)), 6) AS value FROM e"
      }.mkString("\nUNION ALL ")
      "WITH e AS (SELECT vec_id, list_transform(embedding, " +
        "x -> CAST(x AS DOUBLE)) AS v FROM embeddings)\n" + legs
    },
    "q216_silhouette" ->
      """WITH e AS (SELECT vec_id, label,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        | FROM embeddings),
        |lx AS (SELECT label, unnest(v) AS x,
        |  unnest(range(1, len(v) + 1)) AS d FROM e),
        |c AS (SELECT label, d,
        |  CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS cv
        | FROM lx GROUP BY 1, 2),
        |ca AS (SELECT label AS clbl, list(cv ORDER BY d) AS carr
        | FROM c GROUP BY 1),
        |dd AS (SELECT e.vec_id, e.label, ca.clbl,
        |  sqrt(list_reduce(list_transform(range(1, 64 + 1),
        |    i -> (v[i] - carr[i]) * (v[i] - carr[i])),
        |    (a, b) -> a + b)) AS dist
        | FROM e CROSS JOIN ca),
        |pv AS (SELECT vec_id, label,
        |  min(CASE WHEN clbl = label THEN dist END) AS a,
        |  min(CASE WHEN clbl != label THEN dist END) AS b
        | FROM dd GROUP BY 1, 2),
        |sv AS (SELECT label,
        |  CASE WHEN greatest(a, b) > 0
        |    THEN (b - a) / greatest(a, b) END AS s
        | FROM pv)
        |SELECT label, count(*) AS n_vecs,
        | round(CAST(sum(CAST(s AS DECIMAL(28,12))) AS DOUBLE) / count(s), 6)
        |   AS mean_silhouette
        |FROM sv GROUP BY 1""".stripMargin,
    "q81_quantize_int8" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS mx FROM e),
        |q AS (SELECT vec_id, mx,
        |  CASE WHEN mx = 0 THEN list_transform(v, x -> 0)
        |    ELSE list_transform(v, x -> CAST(floor(x * 127.0 / mx + 0.5) AS INT)) END AS codes
        |  FROM m)
        |SELECT vec_id, mx, md5(array_to_string(codes, ',')) AS codes_hash,
        |  len(list_filter(codes, c -> abs(c) = 127))::BIGINT AS n_sat,
        |  list_sum(list_transform(codes, c -> abs(c)))::BIGINT AS l1
        |FROM q""".stripMargin,
    "q158_image_meta" ->
      """SELECT range AS asset_id, 'png' AS format,
        | CAST(1 + range % 7 AS INT) AS width,
        | CAST(1 + range % 5 AS INT) AS height,
        | CAST(3 AS INT) AS channels
        |FROM range(64)""".stripMargin,
    "q167_image_features" ->
      s"""WITH $imgFeatsCtes
         |SELECT asset_id, width, height, n_px, mean_r, mean_g, mean_b,
         |  var_r, var_g, var_b
         |FROM ift""".stripMargin,
    "q168_image_neardup" -> imgClustersSql,
    "q172_graph_ann" -> graphAnnOracleSql(),
    // the stored/maintained graph reproduces the from-scratch build edge
    // for edge (bucket-group restatement) and shares the search tail —
    // the oracle is q172's, shared
    "q346_graph_ann_indexed" -> graphAnnOracleSql(),
    // drift-triggered rebuild replay: the full from-scratch graph build
    // and beam at the EPOCH-1 plane matrix over the live membership —
    // the rebuilt index must match it edge for edge, search for search
    "q356_graph_rebuild" -> graphAnnOracleSql(epoch = 1),
    // graph takedown replay: the truth is the from-scratch graph over the
    // FILTERED corpus (deleted vectors stop competing for degree slots),
    // emitted at both stages — the maintained index matches BEFORE the
    // fold (touched-group repair) and after (physical erasure)
    "q347_graph_delete" ->
      s"""SELECT st.stage, r.q_id, r.vec_id, r.sim, r.rank
         |FROM (${graphAnnOracleSql("vec_id % 7 <> 3",
             "vec_id < 10 AND vec_id % 7 <> 3")}) r
         |CROSS JOIN (VALUES ('tombstoned'), ('erased')) st(stage)""".stripMargin,
    // filtered graph search replay: the graph keeps its FULL membership
    // (a filter is per-query, never a restatement), the beam — entries
    // and every round's scored candidates — is restricted to survivors
    "q349_graph_filtered" ->
      graphAnnOracleSql(candWhere = ref => s"$ref % 3 = 0"),
    // filtered maintained-store replay: q334's chain (90% label quantizer,
    // full frozen assignment) with the candidate side restricted to the
    // surviving tenant — the filter applies to candidates, never routing
    "q354_sann_filtered" ->
      s"""WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |cent AS (SELECT label AS cid, i AS pos,
         |  CAST(sum(CAST(floor(v[i]*1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)/1000000.0/count(*) AS cx
         |  FROM e, generate_series(1,64) g(i) WHERE vec_id % 10 != 0
         |  GROUP BY 1, 2),
         |cv AS (SELECT cid, list(cx ORDER BY pos) AS cv FROM cent GROUP BY cid),
         |asn AS (SELECT vec_id, v, cid FROM (
         |  SELECT e.vec_id, e.v, cv.cid, row_number() OVER (PARTITION BY e.vec_id
         |    ORDER BY ${cosSqlAB("v", "cv")} DESC, cid) AS rn FROM e, cv) WHERE rn = 1),
         |live AS (SELECT * FROM asn WHERE vec_id % 3 = 0),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
         |routed AS (SELECT q_id, qv, cid FROM (
         |  SELECT q_id, qv, cid, row_number() OVER (PARTITION BY q_id
         |    ORDER BY ${cosSqlAB("qv", "cv")} DESC, cid) AS rn FROM q, cv) WHERE rn <= 2),
         |sc AS (SELECT q_id, a.vec_id, $cosSqlAV AS sim
         |  FROM live a JOIN routed r ON a.cid = r.cid AND a.vec_id != r.q_id)
         |SELECT q_id, vec_id, sim, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank FROM sc)
         |WHERE rank <= 3""".stripMargin,
    // band-occupancy drift replay: both distributions recomputed from the
    // corpus via the shared MinHash CTEs — bucket = band_key % 256 (the
    // index default), base = doc_id %5≠4, live increment = %5=4; LEFT
    // joins on both totals so a one-sided band keeps its coalesced-to-0
    // arithmetic (the q348 lesson)
    "q353_band_drift" -> {
      val bandUnion = (0 until Dedup.NumBands).map(b =>
        s"SELECT doc_id, $b AS band_idx, band$b AS band_key FROM sig")
        .mkString(" UNION ALL ")
      s"""WITH $sigCte,
         |lb AS (SELECT doc_id, band_idx, band_key % ${Dedup.DefaultIndexBuckets}
         |    AS bucket
         |  FROM ($bandUnion) WHERE band_key IS NOT NULL),
         |b AS (SELECT band_idx, bucket, CAST(count(*) AS BIGINT) AS cb
         |  FROM lb WHERE doc_id % 5 != 4 GROUP BY 1, 2),
         |i AS (SELECT band_idx, bucket, CAST(count(*) AS BIGINT) AS ci
         |  FROM lb WHERE doc_id % 5 = 4 GROUP BY 1, 2),
         |nb AS (SELECT band_idx, CAST(sum(cb) AS BIGINT) AS n FROM b GROUP BY 1),
         |ni AS (SELECT band_idx, CAST(sum(ci) AS BIGINT) AS n FROM i GROUP BY 1),
         |j AS (SELECT coalesce(b.band_idx, i.band_idx) AS band_idx,
         |    coalesce(cb, 0) AS cb, coalesce(ci, 0) AS ci
         |  FROM b FULL JOIN i
         |  ON b.band_idx = i.band_idx AND b.bucket = i.bucket)
         |SELECT j.band_idx,
         |  round(CAST(sum(CAST(abs(
         |    coalesce(CAST(cb AS DOUBLE) / CAST(nb.n AS DOUBLE), 0.0) -
         |    coalesce(CAST(ci AS DOUBLE) / CAST(ni.n AS DOUBLE), 0.0))
         |    AS DECIMAL(28,12))) AS DOUBLE), 6) AS l1_drift
         |FROM j LEFT JOIN nb ON j.band_idx = nb.band_idx
         |LEFT JOIN ni ON j.band_idx = ni.band_idx
         |GROUP BY j.band_idx""".stripMargin
    },
    // dedup-index rebuild replay: the from-scratch band layout over the
    // FULL corpus (base %5≠4 ∪ increment %5=4, no tombstones) at the
    // deriveBuckets width — min-clamped to the 256 default at sf≤0.1, so
    // the modulus is the constant; only a real fold leaves the BASE
    // holding every row
    "q359_sig_rebuild" -> {
      val bandUnion = (0 until Dedup.NumBands).map(b =>
        s"SELECT doc_id, $b AS band_idx, band$b AS band_key FROM sig")
        .mkString(" UNION ALL ")
      s"""WITH $sigCte,
         |lb AS (SELECT band_idx,
         |    CAST(band_key % ${Dedup.DefaultIndexBuckets} AS INTEGER) AS bucket
         |  FROM ($bandUnion) WHERE band_key IS NOT NULL)
         |SELECT band_idx, bucket, CAST(count(*) AS BIGINT) AS n_rows
         |FROM lb GROUP BY 1, 2""".stripMargin
    },
    // fleet drift-sweep replay: every family's post-sweep BASE must own
    // its full live membership — the lexical postings and dedup band-row
    // masses recomputed from the corpus (the shared tokenize/MinHash
    // CTEs), the three vector families = the embeddings row count
    "q361_drift_sweep" -> {
      val bandUnion = (0 until Dedup.NumBands).map(b =>
        s"SELECT doc_id, $b AS band_idx, band$b AS band_key FROM sig")
        .mkString(" UNION ALL ")
      s"""WITH $normCte,
         |w AS (SELECT doc_id, unnest(regexp_split_to_array(t, '\\s+')) AS term
         |  FROM nrm),
         |lexp AS (SELECT term, doc_id FROM w WHERE length(term) > 0
         |  GROUP BY 1, 2),
         |$sigCte,
         |lb AS (SELECT band_idx FROM ($bandUnion) WHERE band_key IS NOT NULL),
         |emb AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings)
         |SELECT 'lex' AS family, 1 AS acted,
         |  (SELECT CAST(count(*) AS BIGINT) FROM lexp) AS base_rows
         |UNION ALL SELECT 'ann', 1, n FROM emb
         |UNION ALL SELECT 'pq', 1, n FROM emb
         |UNION ALL SELECT 'dedup', 1,
         |  (SELECT CAST(count(*) AS BIGINT) FROM lb)
         |UNION ALL SELECT 'graph', 1, n FROM emb""".stripMargin
    },
    // lexical-index rebuild replay: the from-scratch postings layout over
    // the FULL corpus at the deriveBuckets width (min-clamped to the 64
    // writeIndex default here) — per-bucket masses from the BASE alone
    "q360_lex_rebuild" ->
      s"""WITH $normCte,
         |w AS (SELECT doc_id, unnest(regexp_split_to_array(t, '\\s+')) AS term
         |  FROM nrm),
         |p AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf FROM w
         |  WHERE length(term) > 0 GROUP BY 1, 2)
         |SELECT CAST(${h64d("term")} % 64 AS INTEGER) AS bucket,
         |  CAST(count(*) AS BIGINT) AS n_postings,
         |  CAST(count(DISTINCT term) AS BIGINT) AS n_terms,
         |  CAST(sum(tf) AS BIGINT) AS sum_tf
         |FROM p GROUP BY 1""".stripMargin,
    // filtered flat-PQ replay: the q330 closed-form encode + ADC chain
    // with the candidate side restricted to the surviving tenant
    "q351_pq_filtered" -> pqFilteredOracleSql("vec_id % 3 = 0"),
    // IVF-PQ brute arm replay: with the routing dropped, the engine's
    // exact-ADC fallback IS the flat-PQ filtered computation (same codes,
    // same LUT arithmetic), so the oracle is the same replay over the
    // low-selectivity tenant
    "q358_ivfpq_filtered_brute" -> pqFilteredOracleSql("vec_id < 32"),
    // graph brute arm replay: exact brute cosine top-k over the
    // surviving tenant — the engine's knnBrute fallback, no beam
    "q357_graph_filtered_brute" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
         |s AS (SELECT q_id, vec_id, $cosSql AS sim FROM e, q
         |  WHERE vec_id < 32 AND vec_id != q_id)
         |SELECT q_id, vec_id, sim, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id
         |    ORDER BY sim DESC, vec_id) AS rank FROM s)
         |WHERE rank <= 5""".stripMargin,
    // filtered IVF-PQ replay: q332's routing + frozen assignment + encode
    // chain with the candidate side restricted to the surviving tenant
    // (the filter applies to candidates, never to routing)
    "q352_ivfpq_filtered" ->
      s"""WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |cent AS (SELECT label AS cid, i AS pos,
         |  CAST(sum(CAST(floor(v[i]*1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)/1000000.0/count(*) AS cx
         |  FROM e, generate_series(1,64) g(i) GROUP BY 1, 2),
         |cv AS (SELECT cid, list(cx ORDER BY pos) AS cv FROM cent GROUP BY cid),
         |asn AS (SELECT vec_id, cid FROM (
         |  SELECT e.vec_id, cv.cid, row_number() OVER (PARTITION BY e.vec_id
         |    ORDER BY ${cosSqlAB("v", "cv")} DESC, cid) AS rn FROM e, cv) WHERE rn = 1),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
         |routed AS (SELECT q_id, qv, cid FROM (
         |  SELECT q_id, qv, cid, row_number() OVER (PARTITION BY q_id
         |    ORDER BY ${cosSqlAB("qv", "cv")} DESC, cid) AS rn FROM q, cv) WHERE rn <= 2),
         |enc AS (SELECT vec_id,
         |  list_transform([0, 1, 2, 3], s ->
         |    list_transform([0, 1, 2, 3], c ->
         |      list_sum(list_transform(generate_series(1, 16), i ->
         |        (v[s*16 + i] - (((s*131 + c*37 + i*17) % 19) - 9) / 10.0)
         |      * (v[s*16 + i] - (((s*131 + c*37 + i*17) % 19) - 9) / 10.0)))))
         |    AS dists
         |  FROM e),
         |cod AS (SELECT vec_id,
         |  list_transform(dists, ds ->
         |    list_position(ds, list_aggregate(ds, 'min')) - 1) AS codes
         |  FROM enc WHERE vec_id % 3 = 0),
         |ad AS (SELECT r.q_id, c.vec_id,
         |  round(list_sum(list_transform([0, 1, 2, 3], s ->
         |    list_sum(list_transform(generate_series(1, 16), i ->
         |      (r.qv[s*16 + i]
         |        - (((s*131 + c.codes[s+1]*37 + i*17) % 19) - 9) / 10.0)
         |    * (r.qv[s*16 + i]
         |        - (((s*131 + c.codes[s+1]*37 + i*17) % 19) - 9) / 10.0))))), 6)
         |    AS adist
         |  FROM cod c JOIN asn a ON a.vec_id = c.vec_id
         |  JOIN routed r ON a.cid = r.cid AND c.vec_id != r.q_id)
         |SELECT q_id, vec_id, adist, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id
         |    ORDER BY adist ASC, vec_id ASC) AS rank FROM ad)
         |WHERE rank <= 5""".stripMargin,
    // hubless-tenant filtered graph replay: same beam, entries = the 16
    // lowest-id SURVIVORS (no hub filter — the engine's fallback arm)
    "q355_graph_filtered_nohub" ->
      graphAnnOracleSql(candWhere = ref => s"$ref % 16 = 1",
        hublessEnt = true),
    // campaign attestation replay: every family's hidden-row count
    // derived from the corpus — lexical = distinct (term, doc) postings
    // of the deleted docs + their doclens rows; ann/pq = one row per
    // deleted vector in each store; dedup = the deleted docs' MinHash
    // band rows (short docs contribute none); graph = one vector row per
    // deleted vector and ZERO edge rows (the landing's bucket-group
    // restatement already removed every deleted endpoint from the live
    // edges). Stage 'erased' is all-zero by construction; tombstone
    // counts persist (terminal semantics)
    "q350_takedown_campaign" ->
      s"""WITH $normCte,
         |ltk AS (SELECT doc_id, regexp_split_to_array(t, '\\s+') AS w
         |  FROM nrm),
         |ltoks AS (SELECT doc_id, term FROM (
         |    SELECT doc_id, unnest(w) AS term FROM ltk)
         |  WHERE length(term) > 0),
         |ph AS (SELECT CAST(count(*) AS BIGINT) AS p FROM (
         |  SELECT DISTINCT term, doc_id FROM ltoks WHERE doc_id % 7 = 3)),
         |dhd AS (SELECT CAST(count(*) AS BIGINT) AS d
         |  FROM documents WHERE doc_id % 7 = 3),
         |dhe AS (SELECT CAST(count(*) AS BIGINT) AS n
         |  FROM embeddings WHERE vec_id % 7 = 3),
         |$sigCte,
         |bh2 AS (SELECT doc_id, bk FROM (
         |  SELECT doc_id, unnest([${(0 until Dedup.NumBands)
               .map(b => s"band$b").mkString(", ")}]) AS bk
         |  FROM sig WHERE doc_id % 7 = 3) WHERE bk IS NOT NULL),
         |hid AS (SELECT CAST(count(*) AS BIGINT) AS h FROM bh2),
         |fam AS (
         |  SELECT 'lex' AS family, dhd.d AS n_tombstones,
         |    ph.p + dhd.d AS rows_hidden FROM dhd, ph
         |  UNION ALL SELECT 'ann', dhe.n, dhe.n FROM dhe
         |  UNION ALL SELECT 'pq', dhe.n, dhe.n FROM dhe
         |  UNION ALL SELECT 'dedup', dhd.d, hid.h FROM dhd, hid
         |  UNION ALL SELECT 'graph', dhe.n, dhe.n FROM dhe)
         |SELECT fam.family, fam.n_tombstones,
         |  CASE st.stage WHEN 'tombstoned' THEN fam.rows_hidden
         |    ELSE CAST(0 AS BIGINT) END AS rows_hidden,
         |  CASE WHEN st.stage = 'tombstoned' THEN fam.rows_hidden = 0
         |    ELSE TRUE END AS physically_clean,
         |  st.stage
         |FROM fam, (VALUES ('tombstoned'), ('erased')) st(stage)""".stripMargin,

    // graph bucket-drift replay: both distributions recomputed with the
    // closed-form plane buckets; one-sided buckets keep their full mass
    // under their real (layer, bucket) via the coalesced full join
    "q348_graph_bucket_drift" -> {
      val (fineSlices, coarseSlice) = Similarity.nswPlaneSlices(Dim, 8, 3)
      val fines = fineSlices.zipWithIndex.map { case (ps, t) =>
        s"SELECT $t AS layer, ${bucketExprOf("v", ps)} AS bucket, vec_id FROM e"
      }.mkString("\n  UNION ALL ")
      s"""WITH e AS (SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |lb AS ($fines
         |  UNION ALL SELECT 3 AS layer, ${bucketExprOf("v", coarseSlice)}
         |    AS bucket, vec_id FROM e WHERE vec_id % 16 = 0),
         |b AS (SELECT layer, bucket, count(*) AS cb FROM lb
         |  WHERE vec_id % 10 <> 0 GROUP BY 1, 2),
         |i AS (SELECT layer, bucket, count(*) AS ci FROM lb
         |  WHERE vec_id % 10 = 0 GROUP BY 1, 2),
         |nb AS (SELECT layer, sum(cb) AS n FROM b GROUP BY 1),
         |ni AS (SELECT layer, sum(ci) AS n FROM i GROUP BY 1),
         |j AS (SELECT coalesce(b.layer, i.layer) AS layer,
         |    coalesce(cb, 0) AS cb, coalesce(ci, 0) AS ci
         |  FROM b FULL JOIN i ON b.layer = i.layer AND b.bucket = i.bucket)
         |SELECT j.layer,
         |  round(CAST(sum(CAST(abs(
         |    coalesce(CAST(cb AS DOUBLE) / CAST(nb.n AS DOUBLE), 0.0) -
         |    coalesce(CAST(ci AS DOUBLE) / CAST(ni.n AS DOUBLE), 0.0))
         |    AS DECIMAL(28,12))) AS DOUBLE), 6) AS l1_drift
         |FROM j LEFT JOIN nb ON j.layer = nb.layer
         |LEFT JOIN ni ON j.layer = ni.layer
         |GROUP BY j.layer""".stripMargin
      // LEFT joins on BOTH totals: a layer with zero base rows (possible
      // if the fixture ever loses its base hub members) must keep its
      // coalesce-to-0 arithmetic — the engine's bucketDrift emits it with
      // l1_drift = 1.0, and an INNER join on nb would silently drop it
    },
    // closed-form recomputation of Multimodal.mp4Fixture's header fields
    // (timescale 600; integer-truncating ms division mirrored with //)
    "q171_video_meta" ->
      """SELECT range AS asset_id, 'isom' AS brand,
        | CAST(600 AS BIGINT) AS timescale,
        | CAST((3000 + 97 * range) * 1000 // 600 AS BIGINT) AS duration_ms,
        | CAST(range % 3 + 1 AS INT) AS n_tracks
        |FROM range(40)""".stripMargin,
    // closed-form recomputation of Multimodal.sawDims/sawSample; the
    // previous sample is the formula at i−1, so no window is needed for
    // zero crossings
    "q170_audio_features" ->
      """WITH aa AS (SELECT range AS asset_id, range AS k FROM range(40)),
        |ad AS (SELECT asset_id, k, 200 + 40 * (k % 5) AS n FROM aa),
        |ax AS (SELECT asset_id, k, n, i,
        |    ((i*(3 + k % 7) + k*17) % 4001 - 2000) * 8 AS s,
        |    CASE WHEN i > 0
        |      THEN (((i-1)*(3 + k % 7) + k*17) % 4001 - 2000) * 8 END AS ps
        |  FROM ad, generate_series(0, 359) gi(i) WHERE i < n),
        |ag AS (SELECT asset_id, count(*) AS n, sum(s) AS sm,
        |    sum(s*s) AS ssq, min(s) AS mn, max(s) AS mx,
        |    sum(CASE WHEN ps IS NOT NULL AND ((s >= 0) != (ps >= 0))
        |      THEN 1 ELSE 0 END) AS zc
        |  FROM ax GROUP BY 1)
        |SELECT asset_id, CAST(8000 AS INT) AS sample_rate,
        |  CAST(1 AS INT) AS channels, CAST(n AS BIGINT) AS n_samples,
        |  CAST(sm AS DOUBLE)/n AS mean_amp,
        |  sqrt(CAST(ssq AS DOUBLE)/n) AS rms,
        |  CAST(zc AS BIGINT) AS zero_crossings,
        |  CAST(mn AS INT) AS min_amp, CAST(mx AS INT) AS max_amp
        |FROM ag""".stripMargin,
    "q37_binary_meta" ->
      """SELECT doc_id,
        | octet_length(encode(text))::BIGINT AS n_bytes,
        | (octet_length(encode(text)) % 640)::BIGINT AS width,
        | ((octet_length(encode(text)) * 7) % 480 + 1)::BIGINT AS height,
        | lower(hex(encode(substr(text, 1, 8)))) AS head_hex
        |FROM documents""".stripMargin)
}
