package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Plan-quality audit: dump `.explain("formatted")` for representative
  * queries and assert the scale-critical plan properties (predicate
  * pushdown, column pruning, broadcast joins, TakeOrderedAndProject,
  * single window exec for lag fan-out). Output → PLANS.md.
  *
  * Run: sbt "runMain graft.Plans"
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"

    val interesting = Seq(
      "q02_filter_project" -> Seq(
        "PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_returnflag), IsNotNull(l_quantity)",
        // pruned to projected + filter columns only (5 of 11)
        "ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double,l_returnflag:string,l_shipdate:timestamp"),
      "q01_agg" -> Seq("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      "q03_join_star" -> Seq("BroadcastHashJoin"),
      "q12_topk" -> Seq("TakeOrderedAndProject"),
      "q09_lag_features" -> Seq("Window"),
      // max_by over a struct payload needs SortAggregate (var-width buffer);
      // single pass, partial agg before the exchange — acceptable (measured
      // equal to per-column max_by; both sort)
      "q13_latest_per_group" -> Seq("SortAggregate"),
      "q16_corr_matrix" -> Seq("HashAggregate"),
      // the scored candidate frame is checkpointed inside the binned
      // selection — the broadcast cross join lives in its RDD lineage
      "q33_knn_brute" -> Seq("Scan ExistingRDD"),
      // as-of join: ONE exchange (the union's key partitioning) + window
      "q44_asof_join" -> Seq("Window", "Union"),
      // SQL surface plans identically to the DataFrame API (joins broadcast)
      "q46_sql_tpch_q3" -> Seq("BroadcastHashJoin", "TakeOrderedAndProject"),
      // time-RANGE frame stays a single Window exec
      "q50_rolling_mean" -> Seq("Window"),
      // LSH candidates: the band frame is persisted (one signature pass
      // feeds the size aggregate and both self-join sides)
      "q29_minhash_pairs" -> Seq("InMemoryTableScan"),
      // SimHash runs as the fused native expression, not 32 HOF passes
      "q30_simhash" -> Seq("graft_simhash"),
      // LSH bucket is the native fused-loop expression
      "q34_lsh_buckets" -> Seq("graft_lsh_bucket"),
      // repetition: fully per-row (sorted-run top token) — NO shuffle at all
      "q77_repetition" -> Seq("!Exchange"),
      // token budget: one Window exec per stratum partitioning
      "q79_token_budget" -> Seq("Window"),
      // stored-index incremental dedup: the corpus side is a parquet scan
      // with a real partition filter on the bucket column — untouched
      // bucket directories are pruned, never opened
      "q83_incremental_indexed" -> Seq("PartitionFilters: [bucket"),
      // decontamination: the eval n-gram set broadcasts into a semi-join —
      // the corpus side never shuffles for the probe itself
      "q85_decontaminate" -> Seq("BroadcastHashJoin", "LeftSemi"),
      // composite quality filter: fully per-row — NO shuffle at all
      "q89_filter_pipeline" -> Seq("!Exchange"),
      // domain stats: per-domain agg has map-side partial aggregation
      "q87_domain_stats" -> Seq("HashAggregate"),
      // SemDeDup: broadcast centroid assignment (fused native cosine), and
      // the persisted assignment frame feeds both pairwise sides + output
      "q92_semdedup" -> Seq("graft_cosine", "InMemoryTableScan"),
      // passage dedup: ONE shuffle (the chunk-hash window); chunking itself
      // is per-row generate/project
      "q95_passage_dedup" -> Seq("Window"),
      // BM25: per-term df frame and the 1-row corpus stats both broadcast —
      // the corpus-sized match frame never shuffles for them
      "q102_bm25" -> Seq("BroadcastHashJoin", "BroadcastNestedLoopJoin"),
      // indicators: one sort-partitioned window chain, no extra exchange
      "q103_bollinger" -> Seq("Window"),
      "q104_rsi" -> Seq("Window"),
      // Tukey fences broadcast back onto the scan
      "q105_outlier_iqr" -> Seq("BroadcastHashJoin"),
      // rollup-merge: map-side partial aggregation on both levels
      "q109_agg_merge" -> Seq("HashAggregate"),
      // interval overlap runs as an EQUI-join on (keys, bucket) — the
      // binning exists precisely so this is not a nested-loop theta join
      // (any hash/merge equi-join qualifies; AQE broadcasts the small side)
      "q120_interval_overlap" -> Seq("HashJoin", "!NestedLoopJoin"),
      // snapshot diff: one key-partitioned full-outer sort-merge join
      "q110_snapshot_diff" -> Seq("SortMergeJoin", "FullOuter"),
      // indicators share one exchange + sort; both windows chain on it
      "q121_rolling_corr" -> Seq("Window"),
      "q122_drawdown" -> Seq("Window"),
      // Q6 is the pushdown-is-everything shape: all three predicates must
      // reach the parquet scan
      "q133_sql_tpch_q6" -> Seq(
        "PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_discount), IsNotNull(l_quantity)"),
      // feature scaling: fitted stats broadcast back onto the scan
      "q131_feature_scale" -> Seq("BroadcastHashJoin"),
      // serve layer: the cached panel feeds all three dashboard panels —
      // every panel side reads the in-memory relation, not the parquet scan
      "q141_serve_page" -> Seq("InMemoryTableScan"),
      // count-min: the depth×width sketch broadcasts into the estimate join
      "q142_countmin" -> Seq("BroadcastHashJoin"),
      // rolling median: one ordered window, frame rides as an array
      "q153_rolling_median" -> Seq("Window"),
      // blocked fuzzy join: MUST be an equi-join on the blocking keys —
      // a nested-loop here would be the O(n²) the blocking exists to avoid
      "q154_fuzzy_blocked" -> Seq("HashJoin", "!NestedLoopJoin"),
      // quantile normalization: the 1-row global lattice broadcasts
      "q150_quantile_norm" -> Seq("BroadcastNestedLoopJoin", "Window"),
      // ACF: all five lag columns come out of ONE Window exec (the q09
      // fan-out shape), then one hash aggregate per (key, lag)
      "q176_acf" -> Seq("Window", "HashAggregate"),
      // stochastic/donchian/OBV: one sort-partitioned window chain each
      "q175_stochastic" -> Seq("Window"),
      "q183_donchian" -> Seq("Window"),
      "q184_obv" -> Seq("Window"),
      // moments/tail risk: single aggregate pass over exact power sums /
      // rank window then a partial-aggregated tail
      "q178_moments" -> Seq("HashAggregate"),
      "q177_tail_risk" -> Seq("Window", "HashAggregate"),
      // cointegration: the stage-1 fit broadcasts back onto the series scan
      "q185_coint" -> Seq("BroadcastHashJoin", "Window"),
      // hurst: pure aggregate ladder after the diff window
      "q203_hurst" -> Seq("Window", "HashAggregate"),
      // rfm: quantile breakpoints broadcast — NOT a global ntile sort
      "q206_rfm" -> Seq("BroadcastNestedLoopJoin"),
      // JL projection and the per-doc text stats are shuffle-free
      "q215_jl_project" -> Seq("!Exchange"),
      "q210_lexdiv" -> Seq("!Exchange"),
      "q228_readability" -> Seq("!Exchange"),
      // silhouette: label-sized centroid frame broadcast onto the corpus
      "q216_silhouette" -> Seq("BroadcastNestedLoopJoin"),
      // triangles: wedge closure MUST stay an equi-join
      "q220_triangles" -> Seq("HashJoin", "!NestedLoopJoin"),
      // basket lift: item marginals broadcast onto the pair frame
      "q218_basket_lift" -> Seq("BroadcastHashJoin"),
      // modularity: community tags broadcast onto the edge aggregate
      "q223_modularity" -> Seq("BroadcastHashJoin"),
      // market beta: the bucket-bounded market leg broadcasts
      "q231_market_beta" -> Seq("BroadcastHashJoin", "Window"),
      // weighted median / chi²: value-grouped cumulative windows
      "q233_weighted_median" -> Seq("Window", "HashAggregate"),
      "q242_chi2" -> Seq("Window", "HashAggregate"),
      // top-share after the binned-prefix rework: per-value pre-aggregation
      // + bounded windows, group totals broadcast back
      "q138_top_share" -> Seq("Window", "HashAggregate", "BroadcastHashJoin"),
      // Granger sweep: the distributed work (one Gram-moment hash
      // aggregate) ran eagerly inside Granger.test; the returned frame is
      // the key-count-bounded driver-side result table
      "q42c_granger_sweep_f" -> Seq("LocalTableScan"),
      // filtered ANN: the routed (query, cell) frame broadcasts onto the
      // predicate-filtered posting lists
      "q246_filtered_ann" -> Seq("BroadcastHashJoin"),
      // louvain: the returned plan reads round-checkpointed label RDDs —
      // lineage truncation keeps plan depth O(1) in rounds
      "q245_louvain" -> Seq("Scan ExistingRDD"),
      // LM scoring: vocabulary-sized count tables broadcast onto the
      // doc-bigram stream (AQE picks broadcast at catalog scale)
      "q248_lm_perplexity" -> Seq("HashAggregate"),
      // CCNet buckets: the (lang, fences) frame broadcasts back
      "q255_ccnet_buckets" -> Seq("BroadcastHashJoin"),
      // NB classifier: vocabulary-sized likelihood table broadcast onto
      // the (doc, token) stream; never corpus x corpus
      "q256_nb_domain" -> Seq("BroadcastHashJoin"),
      // Granger p-value sweep: distributed Gram aggregate ran eagerly,
      // returned frame is the key-count-bounded driver result table
      "q42_granger" -> Seq("LocalTableScan"),
      // auto-level Louvain: per-level label RDDs are checkpointed —
      // plan depth O(1) in levels and rounds
      "q258_louvain_hier" -> Seq("Scan ExistingRDD"),
      // incremental LM: count-table merge is union + partial-agg sum
      "q259_lm_incremental" -> Seq("HashAggregate", "Union"),
      // ANN join: per-query selection is the binned extremeK over the
      // lazily-checkpointed scored candidate frame (no raw rank window —
      // a hot cell would otherwise sort |cell| rows in one task per
      // probing vector); routing's nProbe window stays inside the RDD
      "q260_ann_join" -> Seq("Scan ExistingRDD"),
      // snapshot diff: one join on the key, no cartesian anywhere
      "q261_snapshot_diff" -> Seq("Join", "!NestedLoopJoin"),
      // PSI: the 9-fence lattice broadcasts onto both scans
      "q262_psi_drift" -> Seq("BroadcastNestedLoopJoin"),
      // near-dup pairs: composes annJoin — scored frame checkpointed,
      // fused cosine runs inside the RDD lineage
      "q263_semdedup_pairs" -> Seq("Scan ExistingRDD"),
      "q264_ann_incremental" -> Seq("Scan ExistingRDD"),
      // semantic clusters: the small-tail driver finish resolves the
      // star rounds locally — the member frame is a bounded LocalTableScan
      // (an edge set above the cutoff reads checkpointed RDDs instead)
      "q265_semantic_clusters" -> Seq("LocalTableScan"),
      // ER pairs: native codegen'd Jaro–Winkler scoring a blocked
      // EQUI-join — a nested loop here would be the n² the blocks avoid
      "q267_er_pairs" -> Seq("graft_jaro_winkler", "HashJoin", "!NestedLoopJoin"),
      // entity closure / k-core / k-truss / PPR: iterative ops return
      // plans over round-checkpointed RDDs (lineage truncation)
      "q268_er_entities" -> Seq("LocalTableScan"),
      "q269_kcore" -> Seq("Scan ExistingRDD"),
      "q275_ktruss" -> Seq("Scan ExistingRDD", "!NestedLoopJoin"),
      "q276_ppr" -> Seq("Scan ExistingRDD"),
      // DSIR: the 256-bucket log-ratio table broadcasts onto the per-doc
      // counts; the top-k runs through the binned two-pass selection
      "q271_dsir" -> Seq("BroadcastHashJoin", "HashAggregate"),
      // assortativity / DiD: pure aggregate pipelines
      "q270_assortativity" -> Seq("HashAggregate"),
      "q274_did" -> Seq("HashAggregate"),
      // KM / conformal / interval score / attribution: ordered windows
      // over calendar-bounded or per-key frames + hash aggregates
      "q273_kaplan_meier" -> Seq("Window", "HashAggregate"),
      "q272_conformal" -> Seq("Window"),
      "q277_interval_score" -> Seq("Window", "HashAggregate"),
      "q278_attribution" -> Seq("Window", "HashAggregate"),
      // semantic decontamination: IVF-routed candidates (broadcast
      // routing), native fused cosine — never corpus x eval
      "q279_sem_decontaminate" -> Seq("Scan ExistingRDD", "BroadcastHashJoin"),
      // LTV: cohort assignment join + calendar-bounded cumulative window
      "q280_ltv" -> Seq("Window", "HashAggregate"),
      // TextRank: the iteration reads the vocabulary-bounded edge frame;
      // top-k via the binned selection, never a raw global sort window
      "q281_textrank" -> Seq("HashAggregate", "Window"),
      // calibration: class tables broadcast; bins-sized windows
      "q282_calibration" -> Seq("BroadcastHashJoin", "Window"),
      // log-rank: KM's duration-axis windows + one-row aggregates
      "q283_logrank" -> Seq("Window", "HashAggregate"),
      // ROC/PR rides binnedPrefix (per-value counts, bounded windows)
      "q284_roc_pr" -> Seq("HashAggregate", "Window"),
      "q285_cuped" -> Seq("HashAggregate"),
      // HITS: the iteration runs at construction (checkpointed frames —
      // its shuffled-hash/no-edge-broadcast shape is pinned by GraphSpec
      // and the scaladoc); the audited final plan is the node-sized
      // zero-fill join over checkpointed score RDDs
      "q286_hits" -> Seq("SortMergeJoin LeftOuter", "Scan ExistingRDD"),
      // isotonic: bins-sized aggregates, stats broadcast back
      "q287_isotonic" -> Seq("HashAggregate", "BroadcastHashJoin"),
      // bootstrap: the reps fan-out feeds a map-side-combined aggregate
      // (shuffle = groups x reps); CI ranks over reps-sized windows
      "q289_bootstrap_ci" -> Seq("Generate", "HashAggregate", "Window"),
      // LPA: rounds run at construction (checkpointed labels); the final
      // plan is the community-size aggregate + membership join
      "q290_lpa" -> Seq("HashAggregate", "Scan ExistingRDD"),
      // trend test: month-bounded pair self-join, never corpus-sized
      "q291_trend_test" -> Seq("HashAggregate", "Window"),
      // MMR: greedy steps run at construction on bounded checkpointed
      // frames (knnBrute's broadcast scan shape is audited via q33); the
      // final plan reads the materialized picks
      "q292_mmr" -> Seq("Scan ExistingRDD"),
      // both rankings read the ONE checkpointed scored-pair frame (the
      // broadcast cross join lives inside its lineage)
      "q293_quant_recall" -> Seq("Scan ExistingRDD", "HashAggregate"),
      // lift/gains: the rocPr per-value + binnedPrefix contract
      "q294_lift_gains" -> Seq("HashAggregate", "Window"),
      "q295_nelson_aalen" -> Seq("Window", "HashAggregate"),
      // mutual info: one corpus aggregate, margins broadcast back
      "q296_mutual_info" -> Seq("HashAggregate", "BroadcastHashJoin"),
      // Q17: dimension filter + per-part averages both broadcast
      "q297_tpch_q17" -> Seq("BroadcastHashJoin"),
      "q298_rrf" -> Seq("Window", "HashAggregate"),
      // Markov attribution: the data plane (transition matrix) runs at
      // construction and collects a channel-bounded result; the emitted
      // frame is the driver-solved local table
      "q301_markov_attribution" -> Seq("LocalTableScan"),
      // minhash calibration: LSH band frame persisted once (q29 chain)
      "q302_minhash_eval" -> Seq("HashAggregate", "InMemoryTableScan"),
      // Neyman: strata-frame allocation windows, quota broadcast back
      "q303_neyman_sample" -> Seq("Window", "BroadcastHashJoin"),
      "q304_embedding_drift" -> Seq("HashAggregate", "graft_cosine"),
      // lang-id eval: two class-bounded aggregates full-outer joined
      "q305_langid_eval" -> Seq("HashAggregate", "FullOuter"),
      // SMD balance: the per-covariate selects read the checkpointed
      // 1-row moment frame, not the corpus
      "q306_smd_balance" -> Seq("Scan ExistingRDD", "Union"),
      // dup spans: generate + two hash aggregates, no window functions
      "q307_dup_spans" -> Seq("Generate", "HashAggregate", "!Window"),
      // ddsketch: one corpus aggregate to the bucket counts, cumulative
      // windows only over the log-range-bounded sketch frame
      "q308_ddsketch" -> Seq("HashAggregate", "Window"),
      // connected components: contraction rounds run at construction
      // (checkpointed edges); the final plan is the size join over the
      // materialized label frame
      "q309_connected_components" -> Seq("LocalTableScan", "HashAggregate"),
      // Shapley: one user aggregate; the 2^n v-table broadcast onto the
      // driver-built coefficient table
      "q299_shapley" -> Seq("HashAggregate", "BroadcastHashJoin"),
      "q300_position_attribution" -> Seq("Window", "HashAggregate"),
      // dup-span coalescing: gaps-and-islands is a doc-bounded Window
      "q310_dup_span_islands" -> Seq("Window"),
      // sketch merge: counter sums are map-side-combined aggregates
      "q311_ddsketch_merge" -> Seq("HashAggregate"),
      // on-disk index probe: the scored frame is checkpointed (selection
      // reads it twice); the cell-partition-pruned posting scan lives in
      // its lineage and AnnSpec asserts PartitionFilters on the scan
      "q312_ann_index_stored" -> Seq("Scan ExistingRDD"),
      "q313_ivf_cell_drift" -> Seq("graft_cosine", "HashAggregate"),
      // curation loop / audits: corpus scans + vocabulary-shaped aggregates
      "q314_quality_loop" -> Seq("HashAggregate"),
      // cluster diff: the shared pair frame is checkpointed, not re-derived
      "q315_cluster_diff" -> Seq("Scan ExistingRDD"),
      // strip: doc-keyed equi-join, never a nested-loop over spans
      "q316_strip_dup_spans" -> Seq("!NestedLoopJoin"),
      "q317_filter_audit" -> Seq("HashAggregate"),
      "q318_ivf_recluster" -> Seq("Scan ExistingRDD"),
      "q319_filter_drift" -> Seq("HashAggregate"),
      // hybrid rerank eval: the lexical cut is a bounded TakeOrdered, the
      // rerank is exact native cosine on the shortlist
      "q320_rerank_eval" -> Seq("TakeOrderedAndProject", "graft_cosine"),
      // stored lexical index: the query terms' buckets land as a
      // PARTITION filter on the postings scan
      "q323_bm25_indexed" -> Seq("PartitionFilters: [bucket"),
      // both-stages-stored hybrid eval: bucket-pruned lexical probe,
      // bounded lexical cut, exact native cosine on the shortlist
      "q324_hybrid_indexed" -> Seq("PartitionFilters: [bucket",
        "TakeOrderedAndProject", "graft_cosine"),
      // compacted-store reads: counter merge / checkpointed selection
      "q325_compacted_ddsketch" -> Seq("HashAggregate"),
      "q326_compacted_ann_index" -> Seq("Scan ExistingRDD"),
      // fused stored-hybrid serving: bucket-pruned lexical probe, bounded
      // lexical cut, truth via the checkpointed brute selection
      "q327_hybrid_rrf" -> Seq("PartitionFilters: [bucket",
        "TakeOrderedAndProject", "Scan ExistingRDD"),
      // retrieval drift: the frozen-snapshot metrics are an EAGER
      // checkpoint (they must materialize before the recluster rewrites
      // the directory both evals read)
      "q328_retrieval_drift" -> Seq("Scan ExistingRDD"),
      // lifecycle capstone: the lexical probe partition-prunes on the
      // query-term buckets; the cell-pruned postings scan sits inside
      // the checkpointed selection's RDD lineage (AnnSpec asserts the
      // cell PartitionFilters directly on the probe plan)
      "q329_index_lifecycle" -> Seq("PartitionFilters: [bucket",
        "TakeOrderedAndProject", "Scan ExistingRDD"),
      // stored PQ tier: the ADC scan + LUT ride the checkpointed binned
      // selection; the drift readout is two aggregate passes
      "q330_pq_index_stored" -> Seq("Scan ExistingRDD"),
      "q331_pq_code_drift" -> Seq("HashAggregate", "!NestedLoopJoin"),
      "q332_ivfpq" -> Seq("Scan ExistingRDD"),
      // delete read path: the tombstone anti-join must BROADCAST (the
      // build side is deleted-ids-sized) and must not break the term-
      // bucket partition pruning of the probe scan
      "q333_lex_delete" -> Seq("PartitionFilters: [bucket",
        "BroadcastHashJoin", "LeftAnti"),
      // the anti-join itself sits inside topKPerQuery's checkpointed
      // lineage (invisible here); TombstoneSpec asserts it on the read
      // path, with cell pruning pushed through it
      "q334_ann_delete" -> Seq("Scan ExistingRDD", "!SortMergeJoin"),
      "q335_pq_delete" -> Seq("Scan ExistingRDD", "!SortMergeJoin"),
      // lexical drift: the OOV anti-join and the base-doc semi/anti
      // splits all broadcast; output is one row
      "q336_lex_stats_drift" -> Seq("BroadcastHashJoin", "LeftAnti",
        "!SortMergeJoin", "!CartesianProduct"),
      // filtered stored search: ranking rides the checkpointed selection;
      // AnnSpec asserts the pushdown + partition pruning on the read path
      "q337_filtered_indexed" -> Seq("Scan ExistingRDD", "!SortMergeJoin"),
      "q338_ann_join_indexed" -> Seq("Scan ExistingRDD",
        "!CartesianProduct"),
      // the delete-lifecycle capstone keeps q329's shape: bucket-pruned
      // lexical probe, bounded lexical top-N, checkpointed ANN selection
      "q339_delete_lifecycle" -> Seq("PartitionFilters: [bucket",
        "TakeOrderedAndProject", "Scan ExistingRDD"),
      // audit: driver-computed counts — the plan is a local one-row scan
      "q340_erasure_audit" -> Seq("!SortMergeJoin", "!CartesianProduct"))

    val sb = new StringBuilder
    sb.append("# PLANS — physical-plan audit (generated by `graft.Plans`)\n\n")
    sb.append("Checked properties: filters reach the parquet scan " +
      "(`PushedFilters`), projections prune the read schema (`ReadSchema`), " +
      "dims broadcast, top-k avoids global sort, lag fan-out uses one Window " +
      "exec. Regenerate with `sbt \"runMain graft.Plans\"`.\n\n")
    var ok = true
    interesting.foreach { case (name, expects) =>
      val df = SparkEntry.queries(name)(spark, d)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // "!X" asserts the plan does NOT contain X (e.g. "!Exchange" = no shuffle)
      val missing = expects.filterNot(e =>
        if (e.startsWith("!")) !plan.contains(e.drop(1)) else plan.contains(e))
      val verdict = if (missing.isEmpty) "OK" else s"MISSING: ${missing.mkString("; ")}"
      if (missing.nonEmpty) ok = false
      println(s"[plans] $name: $verdict")
      sb.append(s"## $name — $verdict\n\n```\n")
      // keep the audit readable: node headers + scan details only
      val lines = plan.split("\n")
      val keep = lines.takeWhile(!_.startsWith("(1) Scan")) ++
        lines.filter(l => l.contains("PushedFilters") || l.contains("ReadSchema") ||
          l.contains("Location:"))
      sb.append(keep.take(40).mkString("\n")).append("\n```\n\n")
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println(s"[plans] overall: ${if (ok) "ALL OK" else "ISSUES FOUND"}")
    spark.stop()
  }
}
