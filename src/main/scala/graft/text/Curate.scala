package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for the large-scale training-data pipeline:
  * benchmark decontamination, URL/domain statistics, and a composite
  * keep/drop quality filter with per-rule reasons.
  *
  * All per-doc work is codegen'd scalar/array expressions (no UDFs); the only
  * shuffles are the per-doc n-gram aggregate in `contamination` (hashed
  * 8-byte keys, map-side combined) and the per-domain aggregate in
  * `domainStats`. The eval-set n-gram table is broadcast — benchmark suites
  * are a few MB against a 100 TB corpus, so the contamination pass adds no
  * corpus-side shuffle beyond the per-doc count.
  */
object Curate {

  /** Distinct hashed word n-grams per doc: (id, g). Docs with fewer than `n`
    * tokens contribute no rows (and so drop out of contamination — a doc
    * with no n-grams has no overlap to measure). */
  private[text] def docNgrams(df: DataFrame, id: String, text: String,
                              n: Int): DataFrame =
    df.select(col(id), TextOps.tokens(col(text)).as("w"))
      .withColumn("g", explode(array_distinct(TextOps.wordShingles("w", n))))
      .select(col(id), expr(TextOps.h64Sql("g")).as("g"))

  /** Benchmark decontamination (GPT-3 appendix C / RefinedWeb practice):
    * for each training doc, count distinct word n-grams that also appear
    * anywhere in the eval/benchmark set, and flag docs whose overlap
    * fraction reaches `flagAt`.
    *
    * Scale shape: the eval n-gram set is collected small (benchmarks are
    * tiny) and BROADCAST into a semi-join against the exploded train
    * n-grams — the corpus side is one scan + one per-doc count aggregate on
    * 8-byte keys; no corpus×corpus join exists anywhere in the plan. */
  def contamination(train: DataFrame, evalSet: DataFrame, id: String,
                    text: String, n: Int = 3,
                    flagAt: Double = 0.2): DataFrame = {
    val tg = docNgrams(train, id, text, n)
    val eg = docNgrams(evalSet, id, text, n).select("g").distinct()
    val sizes = tg.groupBy(col(id)).agg(count(lit(1)).as("n_grams"))
    val hits = tg.join(broadcast(eg), Seq("g"), "left_semi")
      .groupBy(col(id)).agg(count(lit(1)).as("n_overlap"))
    sizes.join(hits, Seq(id), "left_outer")
      .na.fill(0L, Seq("n_overlap"))
      .withColumn("contamination",
        round(col("n_overlap").cast("double") / col("n_grams"), 6))
      .withColumn("contaminated",
        (col("contamination") >= flagAt).cast("int"))
  }

  /** Passage-level exact dedup (CCNet's paragraph dedup, Wenzek et al.
    * LREC'20; the chunk-hash approximation of Lee et al. ACL'22 exact
    * substring dedup): split each doc into fixed `chunkTokens`-token
    * passages, hash each, and across the WHOLE corpus keep only the first
    * occurrence of every distinct passage — boilerplate repeated across
    * documents (headers, licence blocks, navigation) is dropped everywhere
    * but its first appearance. On real corpora the passage boundary is a
    * line/paragraph; the token-chunk variant is the deterministic equivalent
    * for unstructured text.
    *
    * Output: one row per passage (id, chunk_idx, chunk_hash, n_dups, keep),
    * keep = 1 iff this (id, chunk_idx) is the lexicographically-first holder
    * of the hash. Trailing tokens short of a full chunk form the last chunk.
    *
    * Scale shape: one corpus scan to chunk+hash (8-byte keys), one shuffle
    * keyed by chunk hash for the first-holder window. Passage frequency is
    * Zipfian — a viral boilerplate passage is ONE hot key; cap it like the
    * LSH buckets (the keep decision for a hot hash only needs the global
    * min, which the partial-aggregate form of min_by computes map-side;
    * the window form here is exact and fine up to ~10⁸ copies of one
    * passage). */
  def passageDedup(df: DataFrame, id: String, text: String,
                   chunkTokens: Int = 50): DataFrame = {
    val k = chunkTokens
    val chunks = df
      .select(col(id), TextOps.tokens(col(text)).as("w"))
      .withColumn("nc",
        greatest(lit(1L), ceil(size(col("w")).cast("double") / k).cast("long")))
      .select(col(id), col("w"),
        posexplode(expr(s"transform(sequence(0, nc - 1), i -> " +
          s"concat_ws(' ', slice(w, CAST(i * $k + 1 AS INT), $k)))"))
          .as(Seq("chunk_idx", "chunk")))
      .select(col(id), col("chunk_idx").cast("long").as("chunk_idx"),
        expr(TextOps.h64Sql("chunk")).as("chunk_hash"))
    val w = Window.partitionBy("chunk_hash").orderBy(col(id), col("chunk_idx"))
    chunks
      .withColumn("n_dups", count(lit(1)).over(w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("keep", (row_number().over(w) === 1).cast("int"))
  }

  /** Rebuild each doc's text with duplicated passages stripped: the kept
    * chunks of `passageDedup`, re-joined in chunk order. One groupBy on the
    * doc id (map-side list concat is bounded by doc length). Docs whose
    * every passage was boilerplate come back with empty text rather than
    * disappearing — the caller decides whether to drop empties. */
  def stripDupPassages(df: DataFrame, id: String, text: String,
                       chunkTokens: Int = 50): DataFrame = {
    val k = chunkTokens
    val verdicts = passageDedup(df, id, text, k)
    val chunks = df
      .select(col(id), TextOps.tokens(col(text)).as("w"))
      .withColumn("nc",
        greatest(lit(1L), ceil(size(col("w")).cast("double") / k).cast("long")))
      .select(col(id),
        posexplode(expr(s"transform(sequence(0, nc - 1), i -> " +
          s"concat_ws(' ', slice(w, CAST(i * $k + 1 AS INT), $k)))"))
          .as(Seq("chunk_idx", "chunk")))
      .select(col(id), col("chunk_idx").cast("long").as("chunk_idx"), col("chunk"))
    val rebuilt = chunks
      .join(verdicts.filter(col("keep") === 1).select(col(id), col("chunk_idx")),
        Seq(id, "chunk_idx"))
      .groupBy(col(id))
      .agg(array_join(expr("transform(array_sort(collect_list(struct(chunk_idx, chunk))), " +
        "p -> p.chunk)"), " ").as("clean_text"))
    df.select(col(id)).join(rebuilt, Seq(id), "left_outer")
      .na.fill("", Seq("clean_text"))
  }

  /** Sliding-window chunking with overlap (`stride` < `window` tokens) —
    * the context-window segmentation step for pretraining / retrieval
    * indexing, where passage boundaries must overlap so no span is split
    * across chunks unseen. Pure per-row generate: chunk i covers tokens
    * [i·stride+1, i·stride+window]; every doc yields ≥ 1 chunk (empty docs
    * included, mirroring [[passageDedup]]'s convention). Emits the chunk
    * hash (portable h64) for downstream dedup without carrying text. */
  def chunkOverlap(df: DataFrame, id: String, text: String,
                   window: Int = 64, stride: Int = 48): DataFrame = {
    require(stride > 0 && window >= stride, "need window >= stride > 0")
    df.select(col(id), TextOps.tokens(col(text)).as("w"))
      .withColumn("nc", greatest(lit(1L),
        (ceil((size(col("w")) - window).cast("double") / stride) + 1).cast("long")))
      .select(col(id), col("w"),
        posexplode(expr(s"transform(sequence(0, nc - 1), i -> " +
          s"slice(w, CAST(i * $stride + 1 AS INT), $window))"))
          .as(Seq("chunk_idx", "cw")))
      .select(col(id), col("chunk_idx").cast("long").as("chunk_idx"),
        size(col("cw")).cast("long").as("n_chunk_toks"),
        expr(TextOps.h64Sql("concat_ws(' ', cw)")).as("chunk_hash"))
  }

  /** URL structure parse: scheme, host, registered domain (last two
    * dot-labels), path depth (count of '/' in the path). Pure per-row
    * RE2-portable regex work. */
  def parseUrl(df: DataFrame, url: String): DataFrame = {
    val path = regexp_extract(col(url), "^[a-z]+://[^/]+(/.*)?$", 1)
    df.withColumn("scheme", regexp_extract(col(url), "^([a-z]+)://", 1))
      .withColumn("host", regexp_extract(col(url), "^[a-z]+://([^/]+)", 1))
      .withColumn("domain",
        regexp_extract(col("host"), "([^.]+\\.[^.]+)$", 1))
      .withColumn("path_depth",
        (length(path) - length(regexp_replace(path, "/", ""))).cast("long"))
  }

  /** Per-domain corpus stats: doc count, distinct hosts, total chars, and
    * each domain's share of the corpus — the input to domain blocklists and
    * per-domain caps. One groupBy on the domain key; the corpus-total is a
    * 1-row broadcast. */
  def domainStats(df: DataFrame, url: String, weight: Column): DataFrame = {
    val parsed = parseUrl(df, url)
    val per = parsed.groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("host")).as("n_hosts"),
        sum(weight.cast("long")).as("total_weight"))
    val tot = per.agg(sum(col("n_docs")).as("corpus_docs"))
    per.crossJoin(broadcast(tot))
      .select(col("domain"), col("n_docs"), col("n_hosts"), col("total_weight"),
        round(col("n_docs").cast("double") / col("corpus_docs"), 6).as("doc_share"))
  }

  /** Composite C4/Gopher-style quality filter: evaluate every rule per doc,
    * emit `keep` plus a comma-joined reason list for each failed rule.
    * Fully per-row (one corpus scan, zero shuffle) — rules reuse the same
    * token/shingle expressions as `TextOps.tokenStats`/`repetition`.
    *
    * Rules: too_short (<minTokens ws tokens), too_long (>maxTokens),
    * bad_token_len (mean ws-token length outside [2,12]), repetitive
    * (duplicate-2-gram fraction > 0.3), low_stopword (English stopword
    * ratio < 0.01). */
  /** CCNet-style perplexity bucketing + deterministic keep decision
    * (Wenzek et al., LREC'20 §4.3): per `group` (CCNet buckets per
    * language), split the corpus into head / middle / tail by LM
    * perplexity quartiles — low perplexity ≈ Wikipedia-like, high ≈
    * noise — then keep head fully and down-sample middle/tail with the
    * salted-hash decision every mixing operator here uses (re-runs and
    * repartitions never flip a keep). Quartile fences (exactly
    * representable 0.25/0.75, so both engines' linear interpolation
    * agrees) come from one group-sized aggregate broadcast back — the RFM
    * pattern, no global sort. Keep probabilities are resolved to exact
    * parts-per-million integers at plan build. Output: (id, group, ppl,
    * bucket, sampled). */
  def perplexityBuckets(scored: DataFrame, id: String, group: String,
                        ppl: String, keepMiddle: Double = 0.5,
                        keepTail: Double = 0.1): DataFrame = {
    require(keepMiddle >= 0 && keepMiddle <= 1 && keepTail >= 0 && keepTail <= 1,
      s"keep rates must be probabilities: ($keepMiddle, $keepTail)")
    val midPpm = math.round(keepMiddle * 1e6)
    val tailPpm = math.round(keepTail * 1e6)
    val fences = scored.groupBy(col(group))
      .agg(expr(s"percentile($ppl, 0.25)").as("_q25"),
        expr(s"percentile($ppl, 0.75)").as("_q75"))
    val bucket = when(col(ppl) <= col("_q25"), "head")
      .when(col(ppl) <= col("_q75"), "middle").otherwise("tail")
    val keepPpm = when(col("bucket") === "head", lit(1000000L))
      .when(col("bucket") === "middle", lit(midPpm)).otherwise(lit(tailPpm))
    scored.join(broadcast(fences), Seq(group))
      .filter(col(ppl).isNotNull)
      .withColumn("bucket", bucket)
      .withColumn("sampled",
        (TextOps.h64(concat(lit("ppl:"), col(id).cast("string"))) % 1000000L
          < keepPpm).cast("int"))
      .select(col(id), col(group), col(ppl), col("bucket"), col("sampled"))
  }

  def filterPipeline(df: DataFrame, id: String, text: String,
                     minTokens: Long = 10L,
                     maxTokens: Long = 5000L): DataFrame = {
    val stopIn = TextOps.Stopwords("en").map(w => s"'$w'").mkString(",")
    val d = df.select(col(id), col(text))
      .withColumn("w", TextOps.tokens(col(text)))
      .withColumn("ws_tokens", size(col("w")).cast("long"))
      .withColumn("avg_token_len",
        round(length(concat_ws("", col("w"))).cast("double") / col("ws_tokens"), 6))
      .withColumn("g", TextOps.wordShingles("w", 2))
      .withColumn("dup_2gram_ratio",
        round(when(size(col("g")) > 0,
          lit(1.0) - size(array_distinct(col("g"))).cast("double") / size(col("g")))
          .otherwise(lit(0.0)), 6))
      .withColumn("stop_ratio",
        round(expr(s"size(filter(w, t -> t IN ($stopIn)))").cast("double") /
          col("ws_tokens"), 6))
    val reason: Seq[Column] = Seq(
      when(col("ws_tokens") < minTokens, lit("too_short")),
      when(col("ws_tokens") > maxTokens, lit("too_long")),
      when(col("avg_token_len") < 2.0 || col("avg_token_len") > 12.0,
        lit("bad_token_len")),
      when(col("dup_2gram_ratio") > 0.3, lit("repetitive")),
      when(col("stop_ratio") < 0.01, lit("low_stopword")))
    d.withColumn("reasons", concat_ws(",", reason: _*))
      .withColumn("keep", (col("reasons") === "").cast("int"))
      .select(col(id), col("ws_tokens"), col("avg_token_len"),
        col("dup_2gram_ratio"), col("stop_ratio"), col("reasons"), col("keep"))
  }

  /** Semantic benchmark decontamination: flag corpus members whose
    * EMBEDDING sits within `minSim` cosine of any eval-set vector — the
    * paraphrase-robust complement to the lexical n-gram overlap of
    * [[contamination]] (a reworded eval question shares no 8-gram but
    * keeps its embedding neighborhood). Candidates come from the IVF
    * cell-routed search ([[graft.sim.Similarity.annIvf]]), so the join
    * is posting-list-shaped, never corpus × eval; detection recall is
    * bounded by the per-eval-query `k` cap and the routing (raise k /
    * probe more cells for a stricter sweep — the q246 trade-off).
    * Emits every corpus id with (n_eval_hits, max_eval_sim,
    * contaminated); the eval set's own vectors match only as non-self
    * neighbors. */
  def semanticDecontaminate(corpus: DataFrame, evalSet: DataFrame,
                            id: String, emb: String, cell: String,
                            minSim: Double, k: Int = 50): DataFrame = {
    val hits = graft.sim.Similarity.annIvf(corpus, evalSet, id, emb, cell, k)
      .filter(col("sim") >= minSim)
      .groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n_eval_hits"), max(col("sim")).as("max_eval_sim"))
    corpus.select(col(id).as("vec_id"))
      .join(hits, Seq("vec_id"), "left_outer")
      .select(col("vec_id"),
        coalesce(col("n_eval_hits"), lit(0L)).as("n_eval_hits"),
        col("max_eval_sim"),
        col("max_eval_sim").isNotNull.cast("int").as("contaminated"))
  }

  /** DSIR — Data Selection with Importance Resampling (Xie et al.,
    * NeurIPS 2023): pick the k raw-corpus documents that look most like a
    * target distribution, under hashed-n-gram bag models.
    *
    * Features are word uni+bigrams hashed into `buckets` buckets; the
    * importance weight of a document is
    *   w(x) = Σ_b n_b(x) · [ ln p̂_target(b) − ln p̂_raw(b) ]
    * with add-½ smoothed bucket probabilities. Resampling without
    * replacement is the Gumbel-top-k trick (Vieira 2014): key = w + g with
    * g = −ln(−ln u) and u drawn from the salted portable hash — the same
    * determinism contract as [[Mix.weightedSample]] (reproducible across
    * runs, partitionings and engines; adding documents never flips an
    * existing doc's u).
    *
    * Scale shape: the gram explode is scan-shaped; bucket statistics are
    * a `buckets`-sized aggregate (map-side combined) broadcast back; the
    * per-doc weight is one (doc, bucket)-grained aggregate. Per-bucket
    * log-ratios quantize to DECIMAL(28,12) BEFORE the per-doc sum (the
    * [[NgramLm]] parity rule: document weights independent of partition
    * layout, hash-matchable cross-engine), and the top-k selection runs
    * through `Stats.extremeK` — never a global raw-row rank window.
    *
    * Emits the k kept docs: (id, imp_weight, score, rank), weights/scores
    * rounded at 6 dp, rank 1 = most target-like after noise. */
  def dsirResample(df: DataFrame, id: String, text: String, isTarget: Column,
                   buckets: Int = 256, k: Int = 100): DataFrame = {
    val grams = df
      .select(col(id), isTarget.cast("boolean").as("_t"),
        TextOps.tokens(col(text)).as("_w"))
      .withColumn("_g", explode(concat(col("_w"), TextOps.wordShingles("_w", 2))))
      .select(col(id), col("_t"),
        pmod(TextOps.h64(col("_g")), lit(buckets.toLong)).as("_b"))
    // (doc, bucket) counts feed BOTH the bucket models and the per-doc
    // weights — persist so the gram explode + md5 hashing runs once, not
    // twice (≤ `buckets` rows per doc, far smaller than the gram stream;
    // the ContextCleaner frees the entry when the plan is dropped)
    val perDoc = grams.groupBy(col(id), col("_t"), col("_b"))
      .agg(count(lit(1)).as("_n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bc = perDoc.groupBy("_b").agg(
      sum("_n").as("_rc"),
      sum(when(col("_t"), col("_n")).otherwise(lit(0L))).as("_tc"))
    val tot = bc.agg(sum("_rc").as("_rn_tot"), sum("_tc").as("_tc_tot"))
    val half = buckets * 0.5
    val lam = bc.crossJoin(broadcast(tot)).select(col("_b"),
      (log((col("_tc").cast("double") + 0.5) / (col("_tc_tot").cast("double") + half))
        - log((col("_rc").cast("double") + 0.5) / (col("_rn_tot").cast("double") + half)))
        .cast("decimal(28,12)").as("_lam"))
    // u strictly inside (0, 1): the +0.5 midpoint can never reach either
    // endpoint, so -log(-log(u)) stays finite — u = 1.0 (possible under a
    // (pmod+1)/1e6 draw) would make the Gumbel key +Infinity and poison
    // extremeK's bin arithmetic for the whole selection
    val u = (pmod(TextOps.h64(concat(lit("dsir:"), col(id).cast("string"))),
      lit(1000000L)) + 0.5) / lit(1000000.0)
    val keyed = perDoc.join(broadcast(lam), "_b")
      .groupBy(col(id))
      .agg(sum(col("_n").cast("decimal(10,0)") * col("_lam")).as("_iw"))
      .withColumn("_gum", (-log(-log(u))).cast("decimal(28,12)"))
      .withColumn("_score", (col("_iw") + col("_gum")).cast("double"))
    graft.ops.Stats.extremeK(keyed, "_score", Nil, k,
        descending = true, tie = Seq(col(id).asc))
      .select(col(id), round(col("_iw").cast("double"), 6).as("imp_weight"),
        round(col("_score"), 6).as("score"), col("_rn").as("rank"))
  }

  /** Duplicated-span signal (the window-level approximation of exact
    * substring dedup — Lee et al., "Deduplicating Training Data Makes
    * Language Models Better", ACL 2022): slide an `n`-token window over
    * every document, hash each window, and mark a window DUPLICATED when
    * its hash occurs ≥ 2 times across the corpus (cross-document copies
    * AND in-document repetition both count — the second copy is the
    * redundant one either way). Per document: window count, duplicated
    * count, and the duplicated fraction — the "how much of this doc is
    * boilerplate someone else already has" score that doc-level MinHash
    * (which needs the WHOLE doc to look similar) structurally misses.
    *
    * Scale shape: the window stream is one generate pass (positions ≈
    * tokens, hashed to 60-bit longs so shuffle keys are 8 B); duplicate
    * marking is one hash-keyed count aggregate semi-joined back as the
    * dup set (broadcast when small, shuffle join at corpus scale — AQE's
    * call); the per-doc rollup is one map-side-combined aggregate. No
    * window functions, no per-doc sorts. Docs shorter than `n` tokens
    * have zero windows and report dup_frac NULL. Emits (id, n_windows,
    * n_dup_windows, dup_frac@6dp). */
  def dupSpans(df: DataFrame, id: String, text: String,
               n: Int = 8): DataFrame = {
    require(n >= 2, s"window $n < 2")
    val wins = df
      .select(col(id), TextOps.tokens(col(text)).as("_w"))
      .select(col(id), explode(TextOps.wordShingles("_w", n)).as("_s"))
      .select(col(id), expr(TextOps.h64Sql("_s")).as("_g"))
    val dups = wins.groupBy("_g").agg(count(lit(1)).as("_c"))
      .filter(col("_c") >= 2).select("_g")
    val perDoc = wins
      .join(dups.withColumn("_dup", lit(1)), Seq("_g"), "left")
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_windows"),
        sum(coalesce(col("_dup"), lit(0))).as("n_dup_windows"))
    df.select(col(id)).distinct()
      .join(perDoc, Seq(id), "left")
      .select(col(id),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        round(when(col("n_windows") > 0,
          coalesce(col("n_dup_windows"), lit(0L)).cast("double") /
            col("n_windows")), 6).as("dup_frac"))
  }

  /** Maximal duplicated spans — the remove-list output of exact-substring
    * dedup (Lee et al., ACL 2022) that [[dupSpans]]'s per-doc `dup_frac`
    * alone can't drive: duplicated `n`-token windows are coalesced into
    * maximal per-doc token ranges. Windows at 1-based positions p, p'
    * (each covering tokens p..p+n-1) belong to the same span when
    * p' − p ≤ n — overlapping (< n) or token-adjacent (= n), i.e. the
    * union of their token ranges is contiguous; a difference > n leaves
    * at least one non-duplicated token between them, which closes the
    * span. Classic gaps-and-islands over the duplicated positions.
    *
    * Scale shape: the window/mark stages are [[dupSpans]]'s (one generate
    * pass, 60-bit hash keys, one count aggregate, semi-join back); the
    * islands pass adds one per-doc ordered window whose partition is the
    * doc's DUPLICATED window set — bounded by document token count, never
    * corpus-sized (documents are bounded; this is the per-doc-partition
    * shape the engine accepts everywhere, not the few-group trap).
    * Emits (id, span_start, span_end, span_windows) with 1-based
    * inclusive token indices, one row per maximal span. */
  def dupSpanIslands(df: DataFrame, id: String, text: String,
                     n: Int = 8): DataFrame = {
    require(n >= 2, s"window $n < 2")
    val wins = df
      .select(col(id), TextOps.tokens(col(text)).as("_w"))
      .select(col(id), posexplode(TextOps.wordShingles("_w", n)))
      .select(col(id), (col("pos") + 1).as("pos"),
        expr(TextOps.h64Sql("col")).as("_g"))
    val dups = wins.groupBy("_g").agg(count(lit(1)).as("_c"))
      .filter(col("_c") >= 2).select("_g")
    val marked = wins.join(dups, Seq("_g"), "left_semi")
    val w = Window.partitionBy(col(id)).orderBy(col("pos"))
    marked
      .withColumn("_gap",
        when(col("pos") - lag(col("pos"), 1).over(w) > n, 1).otherwise(0))
      .withColumn("_isl", sum(col("_gap")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(id), col("_isl"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + lit(n - 1)).cast("long").as("span_end"),
        count(lit(1)).as("span_windows"))
      .select(col(id), col("span_start"), col("span_end"),
        col("span_windows"))
  }

  /** APPLY the [[dupSpanIslands]] remove-list: drop every token covered
    * by a maximal duplicated span and re-assemble the survivors — the
    * exact-substring-dedup output corpus (Lee et al. 2022's `dedup` step,
    * where both copies of a duplicated span are removed; the second
    * occurrence is redundant and the first is boilerplate by symmetry).
    * Whitespace is normalized to single spaces in the rebuilt text (the
    * tokenizer's view — deterministic both engines).
    *
    * Scale shape: one posexplode token pass joined to the span frame on
    * the doc key (equi on id, the BETWEEN is a post-join filter —
    * co-partitioned, span count per doc is tiny), then one per-doc
    * collect of the surviving (pos, token) pairs — doc-bounded, the
    * accepted per-doc-array shape. Emits (id, n_tokens, n_removed,
    * clean_text). */
  def removeDupSpans(df: DataFrame, id: String, text: String,
                     n: Int = 8): DataFrame = {
    val sp = dupSpanIslands(df, id, text, n)
      .select(col(id).as("_sid"), col("span_start"), col("span_end"))
    val toks = df
      .select(col(id), posexplode(TextOps.tokens(col(text))))
      .select(col(id), (col("pos") + 1).as("pos"), col("col").as("_t"))
    val kept = toks.join(sp, col(id) === col("_sid") &&
        col("pos") >= col("span_start") && col("pos") <= col("span_end"),
      "left_anti")
    val cleaned = kept.groupBy(col(id))
      .agg(count(lit(1)).as("_nk"),
        array_sort(collect_list(struct(col("pos"), col("_t")))).as("_ps"))
      .select(col(id), col("_nk"),
        expr("array_join(transform(_ps, p -> p._t), ' ')").as("clean_text"))
    df.select(col(id),
        size(TextOps.tokens(col(text))).cast("long").as("n_tokens"))
      .join(cleaned, Seq(id), "left")
      .select(col(id), col("n_tokens"),
        (col("n_tokens") - coalesce(col("_nk"), lit(0L))).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Did the LEARNED filter drift with the corpus: train the
    * [[filterPipeline]]-labeled NB filter (the q314 classifier-in-the-loop)
    * on the PRIOR snapshot only (`isNew` false), apply it to both shards,
    * and diff per-source keep-rates — the incremental-curation readout
    * that pairs with the cluster diff. A source whose keep-rate moves is
    * a source whose incoming distribution moved past the trained filter;
    * sources absent from a shard emit NULL rates/drift rather than a
    * divide-by-zero.
    *
    * Scale shape: one rules pass + one NB train (integer sufficient
    * statistics, vocabulary-sized shuffles) + one scoring pass + a
    * sources-sized rollup — nothing pairwise, nothing corpus². Emits
    * (source, n_old, n_new, keep_rate_old, keep_rate_new, drift@6dp). */
  def filterDrift(docs: DataFrame, id: String, text: String,
                  source: String, isNew: Column): DataFrame = {
    val labeled = docs.join(
      filterPipeline(docs, id, text)
        .select(col(id),
          when(col("keep") === 1, lit("keep")).otherwise(lit("drop"))
            .as("_quality")), Seq(id))
    val pred = NaiveBayes.trainScore(
      labeled.filter(!isNew), labeled, id, "_quality", text)
    labeled.select(col(id), col(source).as("source"), isNew.cast("int").as("_new"))
      .join(pred.select(col(id), col("pred_label")), Seq(id))
      .groupBy("source").agg(
        count(when(col("_new") === 0, 1)).as("n_old"),
        count(when(col("_new") === 1, 1)).as("n_new"),
        count(when(col("_new") === 0 && col("pred_label") === "keep", 1))
          .as("_kOld"),
        count(when(col("_new") === 1 && col("pred_label") === "keep", 1))
          .as("_kNew"))
      .withColumn("keep_rate_old", when(col("n_old") > 0,
        round(col("_kOld").cast("double") / col("n_old"), 6)))
      .withColumn("keep_rate_new", when(col("n_new") > 0,
        round(col("_kNew").cast("double") / col("n_new"), 6)))
      .withColumn("drift", when(col("n_old") > 0 && col("n_new") > 0,
        round(col("keep_rate_new") - col("keep_rate_old"), 6)))
      .select("source", "n_old", "n_new", "keep_rate_old",
        "keep_rate_new", "drift")
  }
}
