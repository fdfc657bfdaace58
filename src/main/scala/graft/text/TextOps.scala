package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the large-scale training-data pipeline:
  * tokenization, quality scoring, language ID, fingerprinting.
  *
  * Everything is built from codegen'd scalar/array expressions — per-row,
  * shuffle-free, embarrassingly parallel — so throughput scales linearly with
  * executors at 100 TB. No UDFs: `transform`/`filter`/`aggregate` higher-order
  * functions keep evaluation inside Tungsten.
  *
  * Cross-engine determinism: the 60-bit hash `h64` is the first 15 hex chars
  * of md5 (exactly reproducible in any engine with md5), so hash-derived
  * results (minhash, simhash, fingerprints) are portable and stable.
  */
object TextOps {

  /** 60-bit deterministic hash from md5 (portable across engines). */
  def h64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")
  def h64Sql(e: String): String =
    s"CAST(conv(substring(md5($e),1,15),16,10) AS BIGINT)"

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Word n-gram shingles over a token array column (1-based element_at,
    * mirroring SQL list indexing). Empty when fewer than n tokens. */
  def wordShingles(toks: String, n: Int): Column = {
    val parts = (0 until n).map(k => s"element_at($toks, i + $k)").mkString(", ' ', ")
    expr(s"CASE WHEN size($toks) >= $n THEN " +
      s"transform(sequence(1, size($toks) - ${n - 1}), i -> concat($parts)) " +
      s"ELSE array() END")
  }

  /** Token statistics: whitespace token count, BPE-ish regex token count
    * (letters runs | single digits | single symbols), mean token length. */
  val BpeishPattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  def tokenStats(df: DataFrame, text: String): DataFrame =
    df.withColumn("_w", tokens(col(text)))
      .withColumn("ws_tokens", size(col("_w")).cast("long"))
      .withColumn("bpe_tokens",
        size(regexp_extract_all(col(text), lit(BpeishPattern), lit(0))).cast("long"))
      .withColumn("avg_token_len",
        round(length(concat_ws("", col("_w"))).cast("double") / col("ws_tokens"), 6))
      .drop("_w")

  /** Small per-language stopword lists for the language-ID heuristic. */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "un", "una", "es", "los"),
    "fr" -> Seq("le", "la", "de", "et", "que", "en", "un", "une", "est", "les"))

  private def stopCount(toks: String, words: Seq[String]): Column =
    expr(s"size(filter($toks, t -> t IN (${words.map(w => s"'$w'").mkString(",")})))")

  /** Language-ID heuristic: stopword-vote argmax with deterministic
    * tie-breaking (en > es > fr), 'und' when no stopwords hit. */
  def languageId(df: DataFrame, text: String, out: String): DataFrame = {
    val d = df.withColumn("_w", tokens(col(text)))
      .withColumn("_en", stopCount("_w", Stopwords("en")))
      .withColumn("_es", stopCount("_w", Stopwords("es")))
      .withColumn("_fr", stopCount("_w", Stopwords("fr")))
    d.withColumn(out,
        when(col("_en") + col("_es") + col("_fr") === 0, "und")
          .when(col("_en") >= col("_es") && col("_en") >= col("_fr"), "en")
          .when(col("_es") >= col("_fr"), "es")
          .otherwise("fr"))
      .drop("_w", "_en", "_es", "_fr")
  }

  /** Quality signals: punctuation ratio, stopword ratio, uppercase ratio,
    * length-aware logistic composite score (rounded — exp/ln are libm-
    * dependent in the last ulp). */
  def qualityScore(df: DataFrame, text: String): DataFrame = {
    val len = length(col(text)).cast("double")
    val d = df.withColumn("_w", tokens(col(text)))
      .withColumn("punct_ratio",
        (len - length(regexp_replace(col(text), "[.,!?;:]", ""))) / len)
      .withColumn("stop_ratio",
        stopCount("_w", Stopwords("en")).cast("double") / size(col("_w")))
      .withColumn("upper_ratio",
        length(regexp_replace(col(text), "[^A-Z]", "")).cast("double") / len)
    d.withColumn("quality_score",
        round(lit(1.0) / (lit(1.0) + exp(-(col("stop_ratio") * 3.0 +
          log(size(col("_w")).cast("double")) * 0.1 - col("punct_ratio") * 5.0))), 6))
      .withColumn("punct_ratio", round(col("punct_ratio"), 6))
      .withColumn("stop_ratio", round(col("stop_ratio"), 6))
      .withColumn("upper_ratio", round(col("upper_ratio"), 6))
      .drop("_w")
  }

  /** Canonical text normalization for dedup/training-data prep: lowercase,
    * strip control characters, collapse whitespace runs, trim. Pure per-row
    * regex work (codegen'd, shuffle-free). */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[\\p{Cntrl}]", " "), "\\s+", " "))

  /** Corpus vocabulary statistics: per token, document frequency (docs
    * containing it) and total term frequency. The classic vocab-building
    * pass: explode distinct tokens per doc → one hash aggregate. At corpus
    * scale the shuffle carries (token, count) partials after map-side
    * combine — bytes ∝ vocabulary, not corpus. */
  def termStats(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id), tokens(normalize(col(text))).as("_w"))
      .select(col(id), explode(col("_w")).as("token"))
      .groupBy(col(id), col("token")).agg(count(lit(1)).as("_tf"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("doc_freq"), sum(col("_tf")).as("term_freq"))

  /** One BPE-trainer counting step (Sennrich et al. ACL'16): corpus-wide
    * frequencies of adjacent symbol pairs, the quantity a tokenizer trainer
    * maximizes at every merge. Counted over the DISTINCT word vocabulary
    * weighted by word frequency — the corpus is scanned once for the
    * (Zipf-bounded) vocab aggregate, and the quadratic-ish pair explode runs
    * over vocab entries, not token occurrences. Shuffle bytes ∝ |vocab| +
    * |charset²| after map-side combine. Here "symbols" are the initial
    * character alphabet (merge step 0); subsequent merge rounds would
    * re-tokenize with the learned merge table and re-run the same count. */
  def bpePairCounts(df: DataFrame, text: String): DataFrame =
    df.select(explode(tokens(normalize(col(text)))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wf"))
      .filter(length(col("word")) >= 2)
      .select(col("wf"), explode(expr(
        "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))"))
        .as("pair"))
      .groupBy(col("pair")).agg(sum(col("wf")).as("pair_count"))

  /** Unigram language-model perplexity signal (the CCNet/Wenzek LREC'20
    * quality filter shape, with the corpus's own unigram LM standing in for
    * the external KenLM): per doc, token count and the summed/mean negative
    * log-likelihood under p(w) = term_freq(w) / total_tokens. High mean NLL
    * = improbable token mix = candidate junk; low = boilerplate-like.
    *
    * Scale shape: one vocab aggregate (map-side combined, bytes ∝ vocab),
    * a 1-row total broadcast, one hash join of token occurrences against the
    * vocab table (both sides keyed by token), one per-doc aggregate.
    * Cross-engine determinism: each token's NLL rounds to 6 dp and sums as
    * DECIMAL(38,6) — no double-accumulation order anywhere. */
  def unigramNll(df: DataFrame, id: String, text: String): DataFrame = {
    val occ = df.select(col(id), explode(tokens(normalize(col(text)))).as("token"))
    val vocab = occ.groupBy(col("token")).agg(count(lit(1)).as("tf"))
    val total = vocab.agg(sum(col("tf")).as("total"))
    val scored = occ.join(vocab, Seq("token"))
      .crossJoin(broadcast(total))
      .withColumn("nll",
        round(-log(col("tf").cast("double") / col("total").cast("double")), 6))
    scored.groupBy(col(id))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("nll").cast("decimal(38,6)")).cast("double").as("sum_nll"))
      .withColumn("mean_nll", round(col("sum_nll") / col("n_tokens"), 6))
  }

  /** Word-bigram language model: adjacent-pair counts over the corpus with
    * the conditional probability P(w₂|w₁) = c(w₁w₂) / c(w₁ as context) —
    * the textbook MLE. The denominator counts w₁ only where it HAS a
    * continuation (the per-w₁ sum of bigram counts before the `minCount`
    * filter), so P(·|w₁) sums to exactly 1 for every context — a w₁ that
    * also ends documents is not deflated by those continuation-less
    * occurrences. The classic distributed-counting workload (and the n-gram
    * LM a cheap next-token quality scorer is built from): one
    * map-side-combined bigram aggregate, a re-aggregate of it for contexts,
    * one vocab-keyed join; shuffled bytes ∝ distinct n-grams, Zipf-bounded,
    * never corpus-sized. `minCount` floors the EMITTED bigrams only — at
    * corpus scale the singleton tail is most of the distinct mass and all
    * of the noise, but it still belongs in the denominator. */
  def bigramLm(df: DataFrame, text: String, minCount: Long = 3L): DataFrame = {
    val toks = df.select(tokens(normalize(col(text))).as("w"))
      .select(expr("filter(w, t -> length(t) > 0)").as("w"))
    val biAll = toks
      .select(explode(expr(
        "CASE WHEN size(w) >= 2 THEN transform(sequence(1, size(w) - 1), " +
          "i -> struct(element_at(w, i) AS w1, element_at(w, i + 1) AS w2)) " +
          "ELSE array() END"))
        .as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("c12"))
    val uni = biAll.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    biAll.filter(col("c12") >= minCount)
      .join(uni, Seq("w1"))
      .withColumn("p", round(col("c12").cast("double") / col("c1"), 6))
  }

  /** Repetition signals (the Gopher/C4-style quality filters for generated or
    * boilerplate text): duplicate-token fraction, duplicate-2-gram fraction,
    * and the most frequent token with its share of the doc. Fully per-row —
    * ONE corpus scan, zero shuffle: the top token comes from a longest-run
    * scan over the sorted token array (run length = occurrence count), not
    * an explode + re-join. Deterministic tie-break: highest count, then
    * lexicographically greatest token (`>=` on an ascending-sorted array
    * leaves the greatest token of the maximal runs in place). */
  def repetition(df: DataFrame, id: String, text: String): DataFrame = {
    val topRun =
      """aggregate(
        |  array_sort(w),
        |  named_struct('prev', CAST(NULL AS STRING), 'run', 0L,
        |               'best', 0L, 'btok', CAST(NULL AS STRING)),
        |  (s, t) -> named_struct(
        |    'prev', t,
        |    'run',  IF(s.prev IS NOT NULL AND t = s.prev, s.run + 1L, 1L),
        |    'best', IF(IF(s.prev IS NOT NULL AND t = s.prev, s.run + 1L, 1L) >= s.best,
        |               IF(s.prev IS NOT NULL AND t = s.prev, s.run + 1L, 1L), s.best),
        |    'btok', IF(IF(s.prev IS NOT NULL AND t = s.prev, s.run + 1L, 1L) >= s.best,
        |               t, s.btok)),
        |  s -> named_struct('cnt', s.best, 'tok', s.btok))""".stripMargin
    df.select(col(id), tokens(col(text)).as("w"))
      .withColumn("n_tokens", size(col("w")).cast("long"))
      .withColumn("dup_token_ratio",
        round(lit(1.0) - size(array_distinct(col("w"))).cast("double") / col("n_tokens"), 6))
      .withColumn("g", wordShingles("w", 2))
      .withColumn("dup_2gram_ratio",
        round(when(size(col("g")) > 0,
          lit(1.0) - size(array_distinct(col("g"))).cast("double") / size(col("g")))
          .otherwise(lit(0.0)), 6))
      .withColumn("top", expr(topRun))
      .select(col(id), col("n_tokens"), col("dup_token_ratio"), col("dup_2gram_ratio"),
        col("top.tok").as("top_token"),
        round(col("top.cnt").cast("double") / col("n_tokens"), 6).as("top_token_ratio"))
  }

  /** PII patterns for scrubbing: plain ASCII email and NNN-NNN-NNNN phone.
    * Both are RE2-compatible (no backrefs/lookaround) so the DuckDB oracle
    * runs the identical patterns. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** PII detection + redaction: per-row counts of email/phone matches and the
    * md5 of the scrubbed text (emails → `<EMAIL>`, phones → `<PHONE>`).
    * Pure per-row regex work — codegen'd, shuffle-free, linear at any scale;
    * emitting the hash rather than the scrubbed body keeps the verify dump
    * narrow (the real pipeline would write the scrubbed column itself). */
  def piiScrub(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id),
      size(regexp_extract_all(col(text), lit(EmailPattern), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(col(text), lit(PhonePattern), lit(0))).cast("long").as("n_phones"),
      md5(regexp_replace(regexp_replace(col(text), EmailPattern, "<EMAIL>"),
        PhonePattern, "<PHONE>")).as("scrubbed_hash"))

  /** Winnowing-style document fingerprint: char 5-gram rolling hashes,
    * min per 4-window, distinct-sorted mins → md5 fingerprint.
    * (Schleimer et al., "Winnowing: Local Algorithms for Document
    * Fingerprinting", SIGMOD'03 — the standard near-dup fingerprint.) */
  def fingerprint(df: DataFrame, text: String): DataFrame =
    df.withColumn("_g",
        expr(s"transform(sequence(1, greatest(length($text) - 4, 1)), i -> " +
          h64Sql(s"substring($text, i, 5)") + ")"))
      .withColumn("_mins",
        expr("array_sort(array_distinct(transform(sequence(1, greatest(size(_g) - 3, 1)), " +
          "j -> array_min(slice(_g, j, 4)))))"))
      .withColumn("n_grams", size(col("_g")).cast("long"))
      .withColumn("fingerprint",
        md5(expr("concat_ws(',', transform(_mins, x -> cast(x AS STRING)))")))
      .drop("_g", "_mins")

  /** PMI collocations: pointwise mutual information
    * ln(c₁₂·N / (c₁·c₂)) over corpus word bigrams (Church & Hanks 1990 —
    * the standard collocation-mining score; c₁/c₂ are positional
    * marginals: w₁-as-first, w₂-as-second). Same tokenization as
    * [[bigramLm]]; the count products stay in exact BIGINT (≤ ~10¹⁴ at
    * any plausible corpus) and only the final log ratio runs in double.
    * Three hash aggregates over the bigram frame + one broadcast total —
    * the corpus text is scanned once. */
  def pmiCollocations(df: DataFrame, text: String,
                      minCount: Long = 3L): DataFrame = {
    val toks = df.select(tokens(normalize(col(text))).as("w"))
      .select(expr("filter(w, t -> length(t) > 0)").as("w"))
    val biAll = toks
      .select(explode(expr(
        "CASE WHEN size(w) >= 2 THEN transform(sequence(1, size(w) - 1), " +
          "i -> struct(element_at(w, i) AS w1, element_at(w, i + 1) AS w2)) " +
          "ELSE array() END"))
        .as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("c12"))
    val total = biAll.agg(sum(col("c12")).as("n_bi"))
    val left  = biAll.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val right = biAll.groupBy(col("w2")).agg(sum(col("c12")).as("c2"))
    biAll.filter(col("c12") >= minCount)
      .join(left, Seq("w1"))
      .join(right, Seq("w2"))
      .crossJoin(broadcast(total))
      .withColumn("pmi", round(log(
        (col("c12") * col("n_bi")).cast("double") /
          (col("c1") * col("c2")).cast("double")), 6))
      .select("w1", "w2", "c12", "c1", "c2", "n_bi", "pmi")
  }

  /** Zipf-law fit over the corpus token-frequency spectrum: OLS of
    * ln(freq) on ln(rank) (rank by count desc, term asc — deterministic
    * ties), terms with count ≥ `minCount`. Returns ONE row (n_terms,
    * slope, intercept, r2) — a healthy natural-language corpus fits slope
    * ≈ −1 (Zipf 1949), and drift in the slope after filtering is the
    * standard corpus-composition health check. The spectrum is
    * vocabulary-sized (≪ corpus), so the rank window and the moment
    * aggregate cost nothing next to the token count scan. */
  def zipfFit(df: DataFrame, text: String, minCount: Long = 3L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df
      .select(tokens(normalize(col(text))).as("w"))
      .select(explode(expr("filter(w, t -> length(t) > 0)")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount)
    val ranked = counts.withColumn("rank",
      row_number().over(Window.orderBy(col("c").desc, col("term"))))
    val x = log(col("rank").cast("double"))
    val y = log(col("c").cast("double"))
    def dsum(e: Column) = sum(e.cast("decimal(28,10)")).cast("double")
    val agged = ranked.agg(
      count(lit(1)).as("n_terms"),
      dsum(x).as("_sx"), dsum(y).as("_sy"),
      dsum(x * x).as("_sxx"), dsum(y * y).as("_syy"),
      dsum(x * y).as("_sxy"))
    val n   = col("n_terms")
    val cov = n * col("_sxy") - col("_sx") * col("_sy")
    val vx  = n * col("_sxx") - col("_sx") * col("_sx")
    val vy  = n * col("_syy") - col("_sy") * col("_sy")
    agged
      .withColumn("slope", when(vx > 0, round(cov / vx, 6)))
      .withColumn("intercept",
        when(vx > 0, round((col("_sy") - cov / vx * col("_sx")) / n, 6)))
      .withColumn("r2",
        when(vx > 0 && vy > 0, round(cov * cov / (vx * vy), 6)))
      .drop("_sx", "_sy", "_sxx", "_syy", "_sxy")
  }

  /** Heaps-law fit: OLS of ln(cumulative vocabulary) on ln(cumulative
    * tokens) over the corpus read in `id` order — V(N) ≈ k·N^β with β ≈
    * 0.4–0.6 for natural language (Heaps 1978); drift flags synthetic or
    * boilerplate-heavy corpora. New-vocabulary attribution is exact: each
    * term counts at its FIRST document (min id), and the cumulative
    * token/vocabulary sums ride [[graft.ops.Stats.binnedPrefix]] over the
    * per-doc frame — a single global ordered window would sort the ENTIRE
    * doc axis in one task at corpus scale; the range-partitioned prefix
    * keeps parallelism at `bins` with bit-identical integer sums. Returns
    * one row (n_docs, slope, intercept, r2). */
  def heapsFit(df: DataFrame, id: String, text: String): DataFrame = {
    val toks = df.select(col(id).as("_id"),
        tokens(normalize(col(text))).as("w"))
      .select(col("_id"), expr("filter(w, t -> length(t) > 0)").as("w"))
    val perDoc = toks.select(col("_id"), size(col("w")).cast("long").as("_n"))
    val firstDoc = toks
      .select(col("_id"), explode(col("w")).as("term"))
      .groupBy("term").agg(min(col("_id")).as("_fd"))
      .groupBy(col("_fd").as("_id")).agg(count(lit(1)).as("_v"))
    val cums = graft.ops.Stats.binnedPrefix(
        perDoc.join(firstDoc, Seq("_id"), "left").na.fill(0L, Seq("_v")),
        Nil, "_id", Seq("_n", "_v"), descending = false)
      .withColumnRenamed("_n_cum", "_ncum")
      .withColumnRenamed("_v_cum", "_vcum")
      .filter(col("_ncum") > 0 && col("_vcum") > 0)
    val x = log(col("_ncum").cast("double"))
    val y = log(col("_vcum").cast("double"))
    def dsum(e: Column) = sum(e.cast("decimal(28,10)")).cast("double")
    val agged = cums.agg(
      count(lit(1)).as("n_docs"),
      dsum(x).as("_sx"), dsum(y).as("_sy"),
      dsum(x * x).as("_sxx"), dsum(y * y).as("_syy"),
      dsum(x * y).as("_sxy"))
    val n   = col("n_docs")
    val cov = n * col("_sxy") - col("_sx") * col("_sy")
    val vx  = n * col("_sxx") - col("_sx") * col("_sx")
    val vy  = n * col("_syy") - col("_sy") * col("_sy")
    agged
      .withColumn("slope", when(vx > 0, round(cov / vx, 6)))
      .withColumn("intercept",
        when(vx > 0, round((col("_sy") - cov / vx * col("_sx")) / n, 6)))
      .withColumn("r2",
        when(vx > 0 && vy > 0, round(cov * cov / (vx * vy), 6)))
      .drop("_sx", "_sy", "_sxx", "_syy", "_sxy")
  }

  /** Pairwise vocabulary Jaccard between sources: |V₁∩V₂| / |V₁∪V₂| over
    * distinct normalized terms — the corpus-composition overlap matrix
    * (which slices duplicate each other's vocabulary). The distinct
    * (source, term) frame is vocabulary-sized; the pair join is on term
    * with source-pair aggregation after, so cost is Σ per-term source
    * multiplicity, never |corpus|². Emits each unordered pair once
    * (s1 < s2). */
  def sourceVocabOverlap(df: DataFrame, source: String,
                         text: String): DataFrame = {
    val vocab = df.select(col(source).as("_s"),
        tokens(normalize(col(text))).as("w"))
      .select(col("_s"), explode(col("w")).as("term"))
      .filter(length(col("term")) > 0)
      .distinct()
    val sizes = vocab.groupBy(col("_s")).agg(count(lit(1)).as("_v"))
    val inter = vocab.as("_a").join(vocab.as("_b"), Seq("term"))
      .filter(col("_a._s") < col("_b._s"))
      .groupBy(col("_a._s").as("s1"), col("_b._s").as("s2"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(broadcast(sizes).withColumnRenamed("_s", "s1")
        .withColumnRenamed("_v", "v1"), Seq("s1"))
      .join(broadcast(sizes).withColumnRenamed("_s", "s2")
        .withColumnRenamed("_v", "v2"), Seq("s2"))
      .withColumn("jaccard", round(col("n_common").cast("double") /
        (col("v1") + col("v2") - col("n_common")).cast("double"), 6))
      .select("s1", "s2", "v1", "v2", "n_common", "jaccard")
  }

  /** KL divergence of each source's unigram distribution from the corpus
    * distribution: Σ p·ln(p/q) over the source's terms (q > 0 always —
    * the corpus marginal includes every source). The mixture-drift signal
    * a data-mixing stage monitors. Per-term contributions quantize to
    * DECIMAL before the final sum (the [[graft.analytics.Indicators]]
    * entropy scheme), so accumulation order can't wiggle low bits. */
  def klFromCorpus(df: DataFrame, source: String, text: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.select(col(source).as("_s"),
        tokens(normalize(col(text))).as("w"))
      .select(col("_s"), explode(col("w")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("_s"), col("term")).agg(count(lit(1)).as("_c"))
    val wSrc = Window.partitionBy(col("_s"))
    val wAll = Window.partitionBy()
    val wTerm = Window.partitionBy(col("term"))
    counts
      .withColumn("_ns", sum(col("_c")).over(wSrc))
      .withColumn("_ct", sum(col("_c")).over(wTerm))
      .withColumn("_nt", sum(col("_c")).over(wAll))
      .withColumn("_term",
        ((col("_c").cast("double") / col("_ns")) *
          log((col("_c").cast("double") / col("_ns")) /
            (col("_ct").cast("double") / col("_nt"))))
          .cast("decimal(28,12)"))
      .groupBy(col("_s").as("source"))
      .agg(max(col("_ns")).as("n_tokens"),
        count(lit(1)).as("n_terms"),
        round(sum(col("_term")).cast("double"), 6).as("kl_nats"))
  }

  /** RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    * maximal stopword-free token runs (the gaps-and-islands idiom — one
    * per-doc position window splits phrases at stopword rows), each word
    * scores degree/frequency where degree sums the lengths of every phrase
    * containing it, and a phrase scores the sum of its word scores.
    * Corpus-level top-k by (score desc, phrase) — a deterministic total
    * order feeding TakeOrderedAndProject. The word-stats frame is
    * vocabulary-sized and the phrase frame ∝ corpus/avg-phrase-len, so
    * beyond the token shuffle nothing is wide; identical phrases score
    * identically because word scores quantize to DECIMAL before the
    * phrase sum (order-free accumulation). */
  def rakeKeywords(df: DataFrame, id: String, text: String,
                   stops: Seq[String] = Stopwords("en"),
                   topK: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df
      .select(col(id).as("_doc"), tokens(normalize(col(text))).as("_w"))
      .select(col("_doc"),
        posexplode(expr("filter(_w, t -> length(t) > 0)"))
          .as(Seq("_pos", "_tok")))
      .withColumn("_stop", col("_tok").isin(stops: _*).cast("int"))
    val wDoc = Window.partitionBy(col("_doc")).orderBy(col("_pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val phrases = toks
      .withColumn("_pid", sum(col("_stop")).over(wDoc))
      .filter(col("_stop") === 0)
      .groupBy(col("_doc"), col("_pid"))
      .agg(array_sort(collect_list(struct(col("_pos"), col("_tok"))))
        .as("_pw"))
      .withColumn("_words", expr("transform(_pw, p -> p._tok)"))
      .withColumn("_len", size(col("_words")).cast("long"))
    val wordScores = phrases
      .select(explode(col("_words")).as("_wd"), col("_len"))
      .groupBy(col("_wd"))
      .agg(count(lit(1)).as("_freq"), sum(col("_len")).as("_deg"))
      .withColumn("_wscore", col("_deg").cast("double") / col("_freq"))
    val scored = phrases
      .select(col("_doc"), col("_pid"),
        concat_ws(" ", col("_words")).as("phrase"),
        explode(col("_words")).as("_wd"))
      .join(wordScores.select("_wd", "_wscore"), Seq("_wd"))
      .groupBy(col("_doc"), col("_pid"), col("phrase"))
      .agg(sum(col("_wscore").cast("decimal(28,10)")).cast("double")
        .as("_raw"))
    scored.groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_mentions"), min(col("_raw")).as("_r"))
      .withColumn("score", round(col("_r"), 6))
      .drop("_r")
      .orderBy(col("score").desc, col("phrase"))
      .limit(topK)
  }

  /** Lexical-diversity statistics per document: type-token ratio, Guiraud's
    * root TTR (types/√tokens — less length-sensitive), and Herdan's C
    * (ln types / ln tokens). Pure per-row array work over one tokenize —
    * zero shuffle; the standard corpus-quality screen that catches
    * keyword-stuffed and boilerplate documents TTR alone misses at
    * varying lengths. */
  def lexicalDiversity(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id), tokens(normalize(col(text))).as("_w"))
      .withColumn("_w", expr("filter(_w, t -> length(t) > 0)"))
      .withColumn("n_tokens", size(col("_w")).cast("long"))
      .withColumn("n_types", size(array_distinct(col("_w"))).cast("long"))
      .withColumn("ttr",
        when(col("n_tokens") > 0,
          round(col("n_types").cast("double") / col("n_tokens"), 6)))
      .withColumn("guiraud",
        when(col("n_tokens") > 0,
          round(col("n_types").cast("double") /
            sqrt(col("n_tokens").cast("double")), 6)))
      .withColumn("herdan",
        when(col("n_tokens") > 1 && col("n_types") > 0,
          round(log(col("n_types").cast("double")) /
            log(col("n_tokens").cast("double")), 6)))
      .drop("_w")

  /** Flesch readability per document from the classic closed forms
    * (Flesch 1948 / Kincaid 1975): reading ease = 206.835 − 1.015·(W/S) −
    * 84.6·(Y/W) and grade = 0.39·(W/S) + 11.8·(Y/W) − 15.59, with W
    * whitespace words, S sentence-terminator runs ([.!?]+, min 1), and Y
    * the vowel-group syllable heuristic (runs of [aeiouy] per word,
    * min 1 per word — the standard seedless approximation; real syllable
    * dictionaries are a lookup-table swap). Pure per-row regex + fold
    * work — zero shuffle, codegen-friendly — the long-form quality signal
    * complementing [[qualityScore]]'s ratios. */
  def readability(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id), normalize(col(text)).as("_t"))
      .withColumn("_w", expr("filter(split(_t, '\\\\s+'), t -> length(t) > 0)"))
      .withColumn("n_words", size(col("_w")).cast("long"))
      .withColumn("n_sentences",
        greatest(lit(1L),
          size(regexp_extract_all(col("_t"), lit("[.!?]+"), lit(0)))
            .cast("long")))
      .withColumn("n_syllables", expr(
        "aggregate(_w, 0L, (a, t) -> a + greatest(1L, " +
          "size(regexp_extract_all(t, '[aeiouy]+', 0))))"))
      .withColumn("flesch_ease",
        when(col("n_words") > 0,
          round(lit(206.835) -
            lit(1.015) * (col("n_words").cast("double") /
              col("n_sentences").cast("double")) -
            lit(84.6) * (col("n_syllables").cast("double") /
              col("n_words").cast("double")), 6)))
      .withColumn("fk_grade",
        when(col("n_words") > 0,
          round(lit(0.39) * (col("n_words").cast("double") /
            col("n_sentences").cast("double")) +
            lit(11.8) * (col("n_syllables").cast("double") /
              col("n_words").cast("double")) - lit(15.59), 6)))
      .drop("_t", "_w")

  /** Term burstiness (Church & Gale 1995): per term with document
    * frequency ≥ `minDf`, the mean within-document repetition tf/df and
    * the adaptation probability P(k ≥ 2 | k ≥ 1) — how much more likely a
    * second occurrence is once one appears. Bursty terms (names, topics)
    * adapt strongly; function words don't — the standard signal separating
    * topical from structural vocabulary when building keep-lists. Two hash
    * aggregates, shuffle bytes ∝ vocabulary after map-side combine. */
  def burstiness(df: DataFrame, id: String, text: String,
                 minDf: Long = 5L): DataFrame =
    df.select(col(id), explode(tokens(normalize(col(text)))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col(id), col("token")).agg(count(lit(1)).as("_tf"))
      .groupBy(col("token")).agg(
        count(lit(1)).as("doc_freq"),
        sum(col("_tf")).cast("long").as("term_freq"),
        count(when(col("_tf") >= 2, 1)).as("n_multi"))
      .filter(col("doc_freq") >= minDf)
      .withColumn("burstiness",
        round(col("term_freq").cast("double") / col("doc_freq"), 6))
      .withColumn("adaptation",
        round(col("n_multi").cast("double") / col("doc_freq"), 6))

  /** TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004): corpus
    * keywords = PageRank over the word co-occurrence graph — an
    * undirected edge joins every pair of adjacent content words
    * (window 2, stopwords and empties removed after [[normalize]]), and
    * a word's importance is its stationary mass under the q162 power
    * iteration. The graph-centrality complement to [[rakeKeywords]]'s
    * degree/frequency scoring: RAKE rewards long phrases, TextRank
    * rewards words that bridge many contexts.
    *
    * Scale shape: the pair explode is scan-shaped; the distinct edge
    * list is vocabulary²-bounded (in practice Heaps-sublinear in corpus
    * bytes — co-occurrence vocabularies saturate); the iteration is
    * [[graft.analytics.Graph.pageRank]]'s edge-join shape on that
    * bounded frame; the final top-k runs through `Stats.extremeK`
    * (never a global raw-row rank window). Symmetrized edges have no
    * dangling nodes, so no mass correction path activates. Emits the
    * top `topK` (word, rank, kw_rank). */
  def textRank(df: DataFrame, text: String,
               stops: Seq[String] = Stopwords("en"),
               topK: Int = 30, iters: Int = 3): DataFrame = {
    val stopIn = stops.map(w => s"'$w'").mkString(",")
    val toks = df.select(tokens(normalize(col(text))).as("_w"))
      .select(expr(s"filter(_w, t -> length(t) > 0 AND NOT t IN ($stopIn))")
        .as("_w"))
    // materialize the vocabulary-bounded edge list ONCE: pageRank's
    // iterations reference it several times per round, and without the
    // checkpoint each reference re-runs the corpus-sized explode
    val pairs = toks
      .select(explode(expr("CASE WHEN size(_w) >= 2 THEN " +
        "transform(sequence(1, size(_w) - 1), i -> " +
        "struct(element_at(_w, i) AS x, element_at(_w, i + 1) AS y)) " +
        "ELSE array() END")).as("_p"))
      .select(least(col("_p.x"), col("_p.y")).as("a"),
        greatest(col("_p.x"), col("_p.y")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .transform(graft.ops.Checkpoint.cut(_, eager = true))
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .union(pairs.select(col("b").as("src"), col("a").as("dst")))
    val nodes = edges.select(col("src").as("id")).distinct()
    val ranks = graft.analytics.Graph.pageRank(edges, "src", "dst",
      nodes, "id", iters)
    graft.ops.Stats.extremeK(ranks, "rank", Nil, topK,
        descending = true, tie = Seq(col("id").asc))
      .select(col("id").as("word"), col("rank"), col("_rn").as("kw_rank"))
  }
}
