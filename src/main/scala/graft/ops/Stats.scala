package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-based data-quality operators: robust outlier fences and
  * mergeable partial aggregates (the incremental-rollup maintenance a
  * warehouse runs nightly instead of rescanning the fact table).
  */
object Stats {

  /** Tukey-fence outlier rows per group: values outside
    * [q1 − k·IQR, q3 + k·IQR] with the fences attached. The quantile pass
    * is one per-group aggregate (exact interpolated percentile — the 100 TB
    * path swaps in approx_percentile, same plan shape); the fences frame is
    * group-cardinality-sized and broadcast back onto the scan, so the
    * filter costs one corpus read + a broadcast hash join, no wide shuffle
    * of the data itself. */
  def iqrOutliers(df: DataFrame, value: String, keys: Seq[String],
                  k: Double = 1.5): DataFrame = {
    val fences = df.groupBy(keys.map(col): _*).agg(
      expr(s"percentile($value, 0.25)").as("_q1"),
      expr(s"percentile($value, 0.75)").as("_q3"))
      .withColumn("lo", col("_q1") - lit(k) * (col("_q3") - col("_q1")))
      .withColumn("hi", col("_q3") + lit(k) * (col("_q3") - col("_q1")))
      .drop("_q1", "_q3")
    df.join(broadcast(fences), keys)
      .filter(col(value) < col("lo") || col(value) > col("hi"))
  }

  /** Median/MAD robust z-score outliers per group: rows where
    * |x − median| / MAD > `k` (MAD = median absolute deviation — both
    * medians exact interpolated percentiles). Unlike the Tukey fences,
    * MAD needs a second aggregate over |x − median|, so the shape is two
    * group-cardinality aggregates, each broadcast back — the data itself
    * still never shuffles. Degenerate groups (MAD = 0 — over half the
    * values sit exactly at the median) are excluded rather than dividing
    * by zero, matching the robust-stats convention. */
  def madOutliers(df: DataFrame, value: String, keys: Seq[String],
                  k: Double = 4.0): DataFrame = {
    val med = df.groupBy(keys.map(col): _*)
      .agg(expr(s"percentile($value, 0.5)").as("med"))
    val withMed = df.join(broadcast(med), keys)
    val mad = withMed.groupBy(keys.map(col): _*)
      .agg(expr(s"percentile(abs($value - med), 0.5)").as("mad"))
    withMed.join(broadcast(mad), keys)
      .filter(col("mad") > 0)
      .withColumn("robust_z", (col(value) - col("med")) / col("mad"))
      .filter(abs(col("robust_z")) > k)
      .withColumn("robust_z", round(col("robust_z"), 6))
  }

  /** Feature scaling per group: sample z-score and min-max normalization
    * from one stats aggregate broadcast back onto the scan (the standard
    * train-feature prep; fit stats once, apply anywhere). Same exact-decimal
    * Σx/Σx² scheme as the indicators, so both engines evaluate one closed
    * form. NULL z for constant groups; NULL min-max when max = min. */
  def scaleFeatures(df: DataFrame, value: String,
                    keys: Seq[String]): DataFrame = {
    val dec = "decimal(28,10)"
    val stats = df.groupBy(keys.map(col): _*).agg(
      count(col(value)).as("_n"),
      sum(col(value).cast(dec)).cast("double").as("_sx"),
      sum((col(value) * col(value)).cast(dec)).cast("double").as("_sxx"),
      min(col(value)).as("_lo"), max(col(value)).as("_hi"))
    val n    = col("_n")
    val mean = col("_sx") / n
    val varS = (col("_sxx") - col("_sx") * col("_sx") / n) / (n - 1)
    df.join(broadcast(stats), keys)
      .withColumn("zscore",
        when(n > 1 && varS > 0, round((col(value) - mean) / sqrt(varS), 6)))
      .withColumn("minmax",
        when(col("_hi") > col("_lo"),
          round((col(value) - col("_lo")) / (col("_hi") - col("_lo")), 6)))
      .drop("_n", "_sx", "_sxx", "_lo", "_hi")
  }

  /** One-hot encoding with a stable, data-derived index: categories get
    * dense 0-based indices in lexicographic order (a pure plan — the
    * category dictionary is a distinct + row_number frame broadcast back,
    * no driver collect), and each row carries the fixed-width 0/1 vector.
    * Vocab-bounded state; the dictionary is reusable across batches as
    * long as the category set is stable. The vector column is emitted
    * both as `onehot` (array) and `onehot_str` (comma-joined — the
    * cross-engine-comparable rendering). */
  def oneHotEncode(df: DataFrame, category: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cats = df.select(col(category)).distinct()
      .withColumn("cat_index",
        row_number().over(Window.orderBy(col(category))) - 1)
    val n = cats.agg(count(lit(1)).as("_ncats"))
    df.join(broadcast(cats), Seq(category)).crossJoin(broadcast(n))
      .withColumn("onehot", expr(
        "transform(sequence(1, _ncats), i -> " +
          "CAST(CASE WHEN i = cat_index + 1 THEN 1 ELSE 0 END AS INT))"))
      .withColumn("onehot_str", concat_ws(",", col("onehot")))
      .drop("_ncats")
  }

  /** ANALYZE-style column statistics: per column, row count, null count,
    * and exact distinct count — the numbers a cost-based optimizer and a
    * file-skipping index are built from. ONE aggregate pass over the table
    * (Spark plans the multi-distinct agg with one expand), then a stack
    * unpivot of the single stats row. At 100 TB swap `countDistinct` for
    * `approx_count_distinct` — same plan shape, sketch-sized state. */
  def columnStats(df: DataFrame): DataFrame = {
    val aggs = df.columns.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
      countDistinct(col(c)).as(s"__ndv_$c"))).toSeq
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stackArgs = df.columns
      .map(c => s"'$c', `__nulls_$c`, `__ndv_$c`").mkString(", ")
    row.select(col("__n"),
        expr(s"stack(${df.columns.length}, $stackArgs) AS (col_name, n_nulls, ndv)"))
      .select(col("col_name"), col("__n").as("n_rows"), col("n_nulls"), col("ndv"))
  }

  /** Equi-depth histogram: `bins` buckets holding equal row mass, edges at
    * the i/bins exact quantiles (the ANALYZE histogram an optimizer uses
    * for selectivity on skewed columns, where equi-width bins collapse).
    * One percentile aggregate (array form — a single sort, not `bins`
    * passes) exploded into (bin, lo, hi) rows. */
  def equiDepthHistogram(df: DataFrame, value: String, bins: Int): DataFrame = {
    val ps = (0 to bins).map(i => i.toDouble / bins)
    val edges = df.agg(
      expr(s"percentile($value, array(${ps.mkString("D, ")}D))").as("e"))
    edges.select(explode(expr(
        s"transform(sequence(1, $bins), i -> " +
          "struct(CAST(i - 1 AS BIGINT) AS bin, element_at(e, i) AS lo, " +
          "element_at(e, i + 1) AS hi))")).as("b"))
      .select(col("b.bin"), col("b.lo"), col("b.hi"))
  }

  /** Top-share selection per group: keep the largest rows until they cover
    * `share` of the group's total mass (the nucleus/top-p cut, and the
    * heavy-hitter report's "smallest set explaining X%"). The row that
    * crosses the boundary is included. Requires a non-negative value
    * column (shares of a signed measure aren't monotone).
    *
    * Scale shape: the naive form — one `Window.partitionBy(keys)` ordered
    * frame over the RAW rows — collapses to a single-task sort per group
    * when `keys` has few distinct values (a 3-flag table at 100 TB sorts
    * ⅓ of the data in one reducer). Here the running sum is decomposed:
    * rows pre-aggregate per distinct value, the mass-above-each-value
    * prefix comes from [[binnedPrefix]] (two bounded windows), and only
    * the tie-break ordering runs per (keys, value) — a window whose
    * partitions are tie-group-sized, giving parallelism ≈ |distinct
    * values| instead of |groups|. Decimal sums are exact and associative,
    * so the decomposition reproduces the single-window cumulative
    * bit-for-bit. */
  def topShare(df: DataFrame, value: String, keys: Seq[String],
               tie: Seq[Column], share: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(28,10)"
    val k   = keys.map(col)
    // per-value masses; the non-negativity precondition is ENFORCED, not
    // just documented: a negative value makes the running share
    // non-monotone and the boundary filter would silently select a wrong
    // set. The guard lives INSIDE `_vm`, which the binnedPrefix bucket
    // aggregate evaluates for EVERY per-value row — so it fires even for
    // groups whose rows would all be filtered out downstream.
    val perValue = df.filter(col(value).isNotNull)
      .groupBy((k :+ col(value).as("_v")): _*)
      .agg(sum(col(value).cast(dec)).as("_vm0"))
      .withColumn("_vm",
        when(col("_v") < 0, raise_error(lit(
          s"topShare requires a non-negative '$value' column")))
          .otherwise(col("_vm0")))
      .drop("_vm0")
    // mass strictly above each value, exact decimal (inclusive − own);
    // the group total rides out of the SAME prefix pass (`_vm_tot` — the
    // full descending cumulative), so no separate scan or broadcast
    val candidates = binnedPrefix(perValue, keys, "_v", Seq("_vm"),
        descending = true, totals = true)
      .withColumn("_above", col("_vm_cum") - col("_vm"))
      .withColumn("_tot", col("_vm_tot"))
      // performance-only pre-filter WITH SLACK: the exact per-row filter
      // below decides membership; this merely drops values whose first
      // tie-row already lies past the boundary (1e-6 ≫ the double rounding
      // gap between (above+v)−v and above, so it can only over-admit)
      .filter(col("_tot") > 0 &&
        col("_above").cast("double") / col("_tot").cast("double") <
          share + 1e-6)
      .select((k :+ col("_v").as(value) :+ col("_above") :+ col("_tot")): _*)
    val wTie = Window.partitionBy((k :+ col(value)): _*).orderBy(tie: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    njoin(df, candidates, keys :+ value)
      .withColumn("_cum", col("_above") + sum(col(value).cast(dec)).over(wTie))
      .withColumn("_before",
        when(col("_tot") > 0,
          (col("_cum").cast("double") - col(value)) /
            col("_tot").cast("double")))
      .withColumn("cum_share",
        when(col("_tot") > 0,
          round(col("_cum").cast("double") / col("_tot").cast("double"), 6)))
      .filter(col("_before") < share)
      .drop("_before", "_cum", "_above", "_tot")
  }

  /** Winsorization per group: clip values into the [`pLo`, `pHi`] exact
    * percentile band (the standard heavy-tail tamer for features and
    * reward/score columns before training). Same scale shape as
    * [[iqrOutliers]]: one group-cardinality percentile aggregate broadcast
    * back onto the scan — the data itself never shuffles. NULL values pass
    * through unclipped (least/greatest skip nulls in Spark and DuckDB
    * alike) and never enter the percentile fit. Emits the original row
    * plus (lo, hi, value_w). */
  def winsorize(df: DataFrame, value: String, keys: Seq[String],
                pLo: Double = 0.01, pHi: Double = 0.99): DataFrame = {
    val bounds = df.groupBy(keys.map(col): _*).agg(
      expr(s"percentile($value, $pLo)").as("lo"),
      expr(s"percentile($value, $pHi)").as("hi"))
    df.join(broadcast(bounds), keys)
      .withColumn(s"${value}_w",
        least(greatest(col(value).cast("double"), col("lo")), col("hi")))
  }

  /** Count-min sketch (Cormode & Muthukrishnan, J.Alg'05): `depth` portable
    * hash rows × `width` counters estimate any key's frequency with
    * one-sided error — est ≥ exact always, est ≤ exact + εN with
    * probability 1−δ at width = e/ε, depth = ln(1/δ). THE bounded-memory
    * frequency structure for 100 TB streams: the sketch is depth×width
    * longs (a few KB) regardless of key cardinality, built with one
    * map-side-combined aggregate whose shuffle is ≤ depth·width rows.
    *
    * Returns the sketch as (j, bucket, c) rows. Hashes are the portable
    * md5-derived `h64` salted per row, so another engine rebuilds the
    * identical sketch — estimates are oracle-checkable, unlike HLL/GK
    * internals (q52). NULL keys hash to a NULL bucket row that no
    * estimate lookup can match (NULL ≠ NULL in the join) — filter null
    * keys upstream if they carry meaning. */
  def countMinSketch(df: DataFrame, key: String, depth: Int = 4,
                     width: Int = 256): DataFrame =
    df.select(posexplode(array((0 until depth).map(j =>
        pmod(graft.text.TextOps.h64(
          concat(col(key).cast("string"), lit(s":cm$j"))), lit(width.toLong))): _*))
      .as(Seq("j", "bucket")))
      .groupBy(col("j"), col("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Cross-source score calibration by quantile normalization: map each
    * row's within-source rank onto the GLOBAL score distribution, so a
    * "0.7-quality" doc means the same thing whether its source's scorer
    * runs hot or cold — the standard pre-threshold step when quality
    * scores from heterogeneous sources feed one global filter. Rank is
    * row_number-based ((rn−1)/(n−1), `tie` breaks equal scores), never
    * percent_rank, so ties are deterministic; the global quantile lattice
    * (nQ+1 exact interpolated percentiles) is ONE 1-row aggregate
    * broadcast back. The within-source rank is DECOMPOSED (the [[topShare]]
    * scheme): per-(source, score) counts feed [[binnedPrefix]] for the
    * count-below offset, and row_number runs only inside (source, score)
    * tie groups — parallelism ≈ |sources|·bins instead of |sources| (a
    * handful of sources would otherwise sort all their raw rows in one
    * task each). A NULL score FAILS FAST (rank is undefined for it — a
    * silent null-first placement would assign real calibrated scores to
    * unscored rows); filter nulls before calling.
    * Emits df + (src_rank, `score`_qn). */
  def quantileNormalize(df: DataFrame, score: String, source: String,
                        tie: Seq[Column], nQ: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qs = (0 to nQ).map(i => s"${i.toDouble / nQ}D").mkString(", ")
    val global = df.agg(expr(s"percentile($score, array($qs))").as("_q"))
    val perValue = df.filter(col(score).isNotNull)
      .groupBy(col(source), col(score).as("_v"))
      .agg(count(lit(1)).as("_c"))
    val below = binnedPrefix(perValue, Seq(source), "_v", Seq("_c"),
        descending = false)
      .select(col(source), col("_v").as(score),
        (col("_c_cum") - col("_c")).as("_below"))
    val nSrc = df.groupBy(col(source)).agg(count(lit(1)).as("_n"))
    // left join: a NULL-score row must SURVIVE to the raise_error guard
    // below, not silently vanish in an inner join
    val wTie = Window.partitionBy(col(source), col(score)).orderBy(tie: _*)
    val n = col("_n")
    njoin(df, below, Seq(source, score), how = "left")
      .transform(njoin(_, nSrc, Seq(source), bcastRight = true))
      .withColumn("_rn", col("_below") + row_number().over(wTie))
      .withColumn("_r", when(n > 1,
        (col("_rn") - 1).cast("double") / (n - 1)).otherwise(lit(0.0)))
      .crossJoin(broadcast(global))
      .withColumn("_p", col("_r") * nQ)
      .withColumn("_lo", floor(col("_p")).cast("int"))
      .withColumn("src_rank", round(col("_r"), 6))
      .withColumn(s"${score}_qn", round(
        when(col(score).isNull, raise_error(lit(
          s"quantileNormalize: NULL '$score' — filter nulls before calibrating")))
          .when(col("_lo") >= nQ, expr(s"element_at(_q, ${nQ + 1})"))
          .otherwise(expr("element_at(_q, _lo + 1)") +
            (col("_p") - col("_lo")) *
              (expr("element_at(_q, _lo + 2)") - expr("element_at(_q, _lo + 1)"))),
        6))
      .drop("_rn", "_r", "_q", "_p", "_lo", "_below", "_n")
  }

  /** Linear (probabilistic) counting (Whang, Vander-Zanden, Taylor —
    * TODS'90): distinct-count estimate per group from an m-bucket occupancy
    * set — est = −m·ln(V) where V is the empty-bucket fraction. Buckets
    * come from the portable salted h64, so unlike HLL the WHOLE estimate is
    * engine-reproducible and oracle-checkable; state is m bits per group
    * regardless of cardinality and merges by union across
    * partitions/batches. Accurate while load n/m ≲ 12; saturated groups
    * (every bucket hit) emit NULL rather than ±∞. */
  def linearCountDistinct(df: DataFrame, key: String, keys: Seq[String],
                          m: Int = 256): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(countDistinct(pmod(graft.text.TextOps.h64(
        concat(col(key).cast("string"), lit(":lc"))), lit(m.toLong)))
        .as("occupied"))
      .withColumn("lc_est", when(col("occupied") < m,
        round(-lit(m.toDouble) *
          log(lit(1.0) - col("occupied") / lit(m.toDouble)), 6)))

  /** Equi-join cardinality estimate from two count-min sketches (the AMS/CM
    * inner-product bound, Cormode & Muthukrishnan §4.2): for each hash row
    * j, Σ_bucket cmA[j][b]·cmB[j][b] over-estimates |A ⋈ B| on the key;
    * the min over rows is the estimate, with est ≥ exact ALWAYS (every
    * matching pair lands in the same bucket) and expected slack ≤
    * |A|·|B|/width per row. This is how an optimizer sizes a join from
    * KB-sized sketches instead of scanning either side — both sketches
    * build in one map-side-combined pass each, and the estimate itself
    * joins two ≤ depth·width frames. Emits one row: (est_join_size). */
  def cmJoinSize(a: DataFrame, b: DataFrame, key: String, depth: Int = 4,
                 width: Int = 256): DataFrame = {
    val dots = countMinSketch(a, key, depth, width).as("a")
      .join(countMinSketch(b, key, depth, width).as("b"), Seq("j", "bucket"))
      .groupBy(col("j"))
      .agg(sum(col("a.c") * col("b.c")).as("dot"))
    // A hash row with NO shared (j, bucket) buckets has dot = 0 — and a
    // shared key hashes to the same bucket in BOTH sketches on every row,
    // so dot_j = 0 proves the exact join size is 0. Those rows vanish from
    // the inner join though, so every j must be re-seated explicitly:
    // otherwise disjoint sketches return NULL (min over no rows) and a
    // partially-colliding pair skips its own zero rows, inflating the min.
    // est >= exact still holds; this only tightens it.
    a.sparkSession.range(depth).select(col("id").cast("int").as("j"))
      .join(dots, Seq("j"), "left")
      .agg(min(coalesce(col("dot"), lit(0L))).as("est_join_size"))
  }

  /** Bloom filter as a mergeable bit-set frame: the distinct bit positions
    * set by `k` salted-h64 hashes of each key, m bits total. State is
    * ≤ m rows regardless of cardinality, merges across partitions/batches
    * by plain union+distinct, and — because the hashes are the portable
    * h64, not a JVM-private hash — the WHOLE filter is engine-reproducible
    * and oracle-checkable (unlike `DataFrameStatFunctions.bloomFilter`'s
    * opaque sketch). The classic decontamination shape: build over the
    * eval/benchmark set, probe the training corpus, drop maybe-hits. */
  def bloomBits(df: DataFrame, key: String, m: Int = 4096,
                k: Int = 3): DataFrame =
    df.select(explode(array((0 until k).map(j =>
        pmod(graft.text.TextOps.h64(
          concat(col(key).cast("string"), lit(s":bf$j"))), lit(m.toLong))): _*))
      .as("bit")).distinct()

  /** Probe candidate keys against a [[bloomBits]] filter: maybe_present = 1
    * iff ALL `k` of the key's bit positions are set — no false negatives
    * ever (a present key's bits are all set by construction), false
    * positives at the standard (1 − e^(−kn/m))^k rate. The filter frame is
    * ≤ m rows, so it broadcasts; the probe is one explode + broadcast join
    * + count — linear in candidates at any corpus size. */
  def bloomProbe(bits: DataFrame, candidates: DataFrame, key: String,
                 m: Int = 4096, k: Int = 3): DataFrame =
    candidates.select(col(key)).distinct()
      .select(col(key), explode(array((0 until k).map(j =>
        pmod(graft.text.TextOps.h64(
          concat(col(key).cast("string"), lit(s":bf$j"))), lit(m.toLong))): _*))
        .as("bit"))
      .join(broadcast(bits.withColumn("_hit", lit(1))), Seq("bit"), "left")
      .groupBy(col(key))
      .agg((count(col("_hit")) === k).cast("int").as("maybe_present"))

  /** Count-min point estimates for every distinct key: est = min over the
    * `depth` rows of that key's bucket counter. The lookup joins the
    * (≤ depth·width row) sketch broadcast against the distinct keys —
    * the raw data is scanned once for the sketch and once for the key set
    * (in a stream the key set is whatever you query later). */
  def countMinEstimates(df: DataFrame, key: String, depth: Int = 4,
                        width: Int = 256): DataFrame =
    cmLookup(countMinSketch(df, key, depth, width),
      df.select(col(key).cast("string").as("key")).distinct(), depth, width)

  /** Point estimates from a PREBUILT (j, bucket, c) sketch — the lookup
    * half of [[countMinEstimates]], split out so a maintained sketch
    * (e.g. [[graft.streaming.StreamingSketch]]'s merged increments) can
    * be queried without rescanning any data. `keys` must carry a string
    * `key` column. The sketch join is a LEFT join with absent buckets
    * counting as zero: a maintained sketch only stores buckets that were
    * ever incremented, so a never-ingested key may hash to missing
    * counter rows — its correct count-min estimate is 0, not the min
    * over whichever of its buckets happen to exist. */
  def cmLookup(sketch: DataFrame, keys: DataFrame, depth: Int = 4,
               width: Int = 256): DataFrame =
    keys.select(col("key"), posexplode(array((0 until depth).map(j =>
        pmod(graft.text.TextOps.h64(concat(col("key"), lit(s":cm$j"))),
          lit(width.toLong))): _*))
      .as(Seq("j", "bucket")))
      .join(broadcast(sketch), Seq("j", "bucket"), "left")
      .groupBy(col("key"))
      .agg(min(coalesce(col("c"), lit(0L))).as("cm_est"))

  /** Classifier calibration report (Guo et al., ICML 2017 conventions):
    * from a per-(doc, class) posterior frame and a truth table, the
    * `bins`-bin reliability diagram on the argmax confidence (per-bin n,
    * mean confidence, accuracy), the expected calibration error
    * ECE = Σ_b (n_b/N)·|acc_b − conf_b|, and the multi-class Brier score
    * (mean over docs of Σ_c (p_c − 1{c=truth})²) — the evaluation
    * companion the NB filter (q256) and any probabilistic curation
    * classifier need before their scores gate real data.
    *
    * Scale shape: one truth join (doc-keyed), one |classes|-row window
    * per doc for the argmax, one per-doc Brier aggregate, then
    * everything rides the bins-sized frame. Brier and ECE terms quantize
    * to DECIMAL pre-sum. Emits one row per non-empty bin:
    * (bin, n, avg_conf, accuracy, ece, brier) — ece/brier constant
    * across rows, all at 6 dp. */
  def calibrationReport(probs: DataFrame, id: String, classCol: String,
                        p: String, truth: DataFrame, truthLabel: String,
                        bins: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val j = probs.join(truth.select(col(id), col(truthLabel).as("_y")), Seq(id))
      .withColumn("_hit", (col(classCol) === col("_y")).cast("int"))
    // a doc whose truth label is absent from its scored class set (a
    // test-fold-only label) still owes the true class's (0 − 1)² = 1
    // Brier term — max(_hit) = 0 detects exactly that doc
    val docB = j.groupBy(col(id)).agg(
      (sum(((col(p) - col("_hit")) * (col(p) - col("_hit")))
        .cast("decimal(28,12)")) +
        (lit(1L) - max(col("_hit"))).cast("decimal(28,12)")).as("_b"))
    val brier = docB.agg(
      (sum(col("_b")).cast("double") / count(lit(1))).as("_brier"))
    val w = Window.partitionBy(col(id)).orderBy(col(p).desc, col(classCol).asc)
    val top = j.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
    val binned = top
      .withColumn("bin", least(floor(col(p) * bins).cast("long"),
        lit(bins - 1L)))
      .groupBy("bin").agg(count(lit(1)).as("n"),
        sum(col(p).cast("decimal(28,12)")).as("_cs"),
        sum(col("_hit")).as("_hits"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    binned
      .withColumn("_term", (col("n").cast("double") *
          abs(col("_cs").cast("double") / col("n") -
            col("_hits").cast("double") / col("n")))
        .cast("decimal(28,12)"))
      .withColumn("ece", round(
        sum(col("_term")).over(wAll).cast("double") /
          sum(col("n")).over(wAll), 6))
      .crossJoin(broadcast(brier))
      .select(col("bin"), col("n"),
        round(col("_cs").cast("double") / col("n"), 6).as("avg_conf"),
        round(col("_hits").cast("double") / col("n"), 6).as("accuracy"),
        col("ece"), round(col("_brier"), 6).as("brier"))
  }

  /** k-fold cross-validation assignment: fold = salted-hash of the id mod
    * k — deterministic, engine-portable, stable under data growth (the
    * same contract as `Mix.splitAssign`). */
  def kfoldAssign(df: DataFrame, id: String, k: Int,
                  salt: String = "fold"): DataFrame =
    df.withColumn("fold",
      pmod(graft.text.TextOps.h64(
        concat(col(id).cast("string"), lit(":" + salt))), lit(k.toLong)))

  /** Mergeable partial-aggregate state per (keys, bucket): count / exact
    * decimal sum / min / max — the standard incremental-view state. Computed
    * per ingest bucket (a day, an hour, a file batch), stored, and folded
    * with [[mergePartials]] instead of rescanning history. */
  def partialAgg(df: DataFrame, keys: Seq[String], bucket: Column,
                 value: String): DataFrame =
    df.groupBy((keys.map(col) :+ bucket.as("_bucket")): _*).agg(
      count(col(value)).as("n"),
      sum(col(value).cast(Relational.ExactDec)).as("sum_state"),
      min(col(value)).as("min_value"),
      max(col(value)).as("max_value"))

  /** Fold stored partial states down to per-key totals. Identity:
    * mergePartials(partialAgg(df)) == direct groupBy(keys).agg(...) — the
    * algebraic-aggregate contract (count/sum/min/max are all mergeable;
    * avg derives as sum/count). One tiny shuffle over state rows, never
    * the base data. */
  def mergePartials(partials: DataFrame, keys: Seq[String]): DataFrame =
    partials.groupBy(keys.map(col): _*).agg(
      sum(col("n")).as("n"),
      sum(col("sum_state")).cast("double").as("sum_value"),
      min(col("min_value")).as("min_value"),
      max(col("max_value")).as("max_value"))
      .withColumn("avg_value", col("sum_value") / col("n"))

  // ── HyperLogLog (Flajolet-Fuchs-Gandouet-Meunier, AofA'07) ──────────────

  /** Bits of h64's value space left after the register index is peeled off
    * (h64 is 15 hex chars = 60 bits; 6 go to a 64-register index). */
  private val HllWBits = 54

  /** Portable rank-of-first-one: for `w` in [0, 2^54), rho = (leading
    * zeros in the 54-bit word) + 1 = 55 − bitlength(w), with bitlength
    * read off `bin()`'s minimal binary string — exact integers end to end
    * (no log2, whose float rounding at power-of-two boundaries would break
    * cross-engine equality; and no deep CASE chain, which Spark's
    * subexpression-elimination pass walks exponentially when nested).
    * w = 0 → 55, the all-zeros sentinel. */
  private def rhoExpr(w: Column): Column =
    when(w === 0, lit(HllWBits + 1))
      .otherwise(lit(HllWBits + 1) - length(bin(w))).cast("int")

  /** The same formula as DuckDB SQL (`bin` prints the identical minimal
    * binary string in both engines), so the oracle rebuilds identical
    * registers from the identical md5-derived hash. */
  def rhoSql(w: String): String =
    s"CASE WHEN $w = 0 THEN ${HllWBits + 1} " +
      s"ELSE ${HllWBits + 1} - length(bin($w)) END"

  /** HyperLogLog registers per group: 64 registers × max rank-of-first-one.
    * THE mergeable distinct-count state for 100 TB: 64 small ints per
    * group no matter the cardinality, built by one map-side-combined
    * aggregate (merge across partitions/batches/days = elementwise MAX).
    * Unlike [[linearCountDistinct]] (which saturates past n ≈ 12·m), HLL's
    * relative error stays ~1.04/√64 ≈ 13% at ANY cardinality. Hashes are
    * the portable salted h64, so a second engine rebuilds bit-identical
    * registers — the whole estimate is oracle-checkable, which Spark's own
    * `approx_count_distinct` (opaque JVM sketch) is not. */
  def hllRegisters(df: DataFrame, key: String, keys: Seq[String],
                   m: Int = 64): DataFrame = {
    require(m == 64, s"hllRegisters: register count is fixed at 64 " +
      s"(6 index bits of the 60-bit portable hash); got $m")
    val h = graft.text.TextOps.h64(
      concat(col(key).cast("string"), lit(":hll")))
    // register = low 6 hash bits; w = the remaining 54 (shiftright, not
    // `/` — double division of a 60-bit value is inexact)
    df.groupBy((keys.map(col) :+ pmod(h, lit(m.toLong)).as("reg")): _*)
      .agg(max(rhoExpr(shiftright(h, 6))).as("rho"))
  }

  /** HLL distinct estimate per group from [[hllRegisters]], with the
    * standard small-range (linear-counting) correction. The indicator sum
    * Σ 2^(−rho) is carried as the EXACT integer Σ 2^(55−rho) (absent
    * registers contribute rho = 0 → 2^55 each; 64·2^55 < 2^63), so the
    * only floating-point steps are one division and one log — engine
    * round-off lives below the 6-decimal rounding the catalog compares
    * at. */
  def hllEstimate(df: DataFrame, key: String, keys: Seq[String]): DataFrame =
    hllEstimateFromRegisters(hllRegisters(df, key, keys), keys)

  /** Elementwise-max merge of [[hllRegisters]] frames — THE reason HLL is
    * the 100 TB distinct-count state: shards/days/batches are sketched
    * independently, and union is a (keys, reg) max — no re-scan of any
    * shard. `hllMerge(a, b) |> estimate ≡ estimate(a ∪ b)` exactly
    * (max is associative/commutative/idempotent); q167 emits both sides
    * of that identity and IndicatorsSpec pins it on random splits. */
  def hllMerge(shards: DataFrame*): DataFrame = {
    val all = shards.reduce(_ unionByName _)
    val ks = all.columns.filterNot(_ == "rho").map(col)
    all.groupBy(ks: _*).agg(max(col("rho")).as("rho"))
  }

  /** The FFGM estimator over a register frame (from [[hllRegisters]] or
    * [[hllMerge]]). */
  def hllEstimateFromRegisters(regs: DataFrame, keys: Seq[String]): DataFrame = {
    val m = 64
    val alpha = 0.7213 / (1.0 + 1.079 / m) // FFGM §4, m ≥ 64
    val scale = HllWBits + 1               // 2^(55−rho) keeps rho=55 integral
    regs.groupBy(keys.map(col): _*)
      .agg(sum(expr(s"shiftleft(CAST(1 AS BIGINT), $scale - rho)")).as("_seen"),
        count(lit(1)).as("_nreg"))
      .withColumn("_denom",
        col("_seen") + (lit(m) - col("_nreg")) * lit(1L << scale))
      .withColumn("_zeros", lit(m) - col("_nreg"))
      .withColumn("_raw",
        lit(alpha * m * m) * lit(math.pow(2.0, scale)) / col("_denom"))
      .withColumn("hll_est", round(
        when(col("_raw") <= lit(2.5 * m) && col("_zeros") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("_zeros")))
          .otherwise(col("_raw")), 6))
      .drop("_seen", "_nreg", "_denom", "_zeros", "_raw")
  }

  // ── KMV (k minimum values) distinct sketch ──────────────────────────────

  /** Size of the portable 60-bit hash value space, as a double. */
  private val KmvH = math.pow(2.0, 60)

  /** Per-group k-minimum-values sketch: the k smallest DISTINCT h64
    * hashes, as a sorted array (Bar-Yossef et al., RANDOM'02; the
    * "KMV/theta sketch" of Beyer et al., SIGMOD'07). Where HLL
    * ([[hllRegisters]]) only counts, KMV supports SET ALGEBRA: sketches
    * union by re-taking the k smallest of the merged arrays, and the
    * Jaccard of two sets is read off one union sketch ([[kmvJaccard]]) —
    * the cheap "how much do these two 10-TB corpora overlap?" probe.
    * State is k longs per group; the heavy lift is one shuffle to rank
    * hashes per group. Hashes are md5-derived, so a second engine rebuilds
    * the identical sketch. */
  def kmvSketch(df: DataFrame, key: String, keys: Seq[String],
                k: Int = 64): DataFrame = {
    val h = graft.text.TextOps.h64(
      concat(col(key).cast("string"), lit(":kmv")))
    // bottom-k via the two-pass binned selection: the distinct-hash frame
    // is distinct-key-sized, so with few groups a plain rank window would
    // sort each group's whole key space in one task (and hashes are
    // uniform, so the target bucket holds ~|hashes|/bins rows — the
    // selection reads ~k + n/bins rows per group past pass 1)
    extremeK(
      df.select((keys.map(col) :+ h.as("_h")): _*).distinct(),
      "_h", keys, k, descending = false)
      .groupBy(keys.map(col): _*)
      .agg(array_sort(collect_list(col("_h"))).as("kmv"))
  }

  /** Distinct estimate from a [[kmvSketch]]: (k−1)·H/h₍k₎ when the sketch
    * is full (the kth-smallest of n uniform hashes sits near k·H/n);
    * below k distinct hashes the sketch IS the distinct set — exact. */
  def kmvEstimate(df: DataFrame, key: String, keys: Seq[String],
                  k: Int = 64): DataFrame =
    kmvSketch(df, key, keys, k)
      .withColumn("n_sketch", size(col("kmv")).cast("long"))
      .withColumn("kmv_est", round(
        when(col("n_sketch") < k, col("n_sketch").cast("double"))
          .otherwise(lit((k - 1).toDouble * KmvH) /
            element_at(col("kmv"), k)), 6))
      .drop("kmv")

  /** Jaccard similarity + intersection size of two keyed sets from their
    * KMV sketches (Beyer et al. §4): build the union sketch (k smallest
    * of the merged hash arrays), count its members present in BOTH input
    * sketches (ρ), then J ≈ ρ/k and |A∩B| ≈ J·|A∪B|. Exact when both
    * sets fit in the sketch. `a`/`b` are (group-less) single sketches as
    * 1-row frames from [[kmvSketch]] with keys = Nil semantics — here
    * taken as arrays for composability inside one plan. */
  def kmvJaccardExpr(a: Column, b: Column, k: Int): Column = {
    val union = slice(array_sort(array_union(a, b)), 1, k)
    val rho = size(array_intersect(array_intersect(union, a), b))
    val unionEst = when(size(union) < k, size(union).cast("double"))
      .otherwise(lit((k - 1).toDouble * KmvH) / element_at(union, k))
    struct(
      round(rho.cast("double") / least(size(union), lit(k)), 6).as("jaccard"),
      round(rho.cast("double") / least(size(union), lit(k)) * unionEst, 6)
        .as("inter_est"),
      round(unionEst, 6).as("union_est"))
  }

  // ── target encoding ─────────────────────────────────────────────────────

  /** Leave-one-out target encoding with a smoothing prior (the standard
    * high-cardinality categorical feature for GBDT/linear models): each
    * row's category is encoded by the mean target of the OTHER rows in its
    * category, shrunk toward the global mean by `prior` pseudo-counts —
    * te = (sum_y − y + prior·ȳ) / (n − 1 + prior). Leaving the own row out
    * kills the target-leakage overfit of naive mean encoding; the prior
    * keeps singleton categories at the global mean instead of 0/0. Cost at
    * scale: one per-category aggregate (map-side combined) broadcast back
    * onto the scan — no wide shuffle of the data. NULL targets must be
    * filtered upstream (they would poison sum_y). */
  def targetEncode(df: DataFrame, cat: String, y: String,
                   prior: Double = 10.0): DataFrame = {
    val stats = df.groupBy(col(cat))
      .agg(sum(col(y).cast("double")).as("_sum_y"), count(lit(1)).as("_n_cat"))
    val global = df.agg(avg(col(y).cast("double")).as("_gmean"))
    df.join(broadcast(stats), Seq(cat))
      .crossJoin(broadcast(global))
      .withColumn(s"${y}_te", round(
        (col("_sum_y") - col(y) + lit(prior) * col("_gmean")) /
          (col("_n_cat") - 1 + lit(prior)), 6))
      .drop("_sum_y", "_n_cat", "_gmean")
  }

  // ── two-pass exact median ───────────────────────────────────────────────

  /** EXACT per-group median without a global sort — the two-pass
    * histogram-narrowing algorithm (the textbook distributed selection
    * scheme; cf. Blum et al. selection and Spark's own approx_percentile
    * narrowing). Pass 1 bins every value into `bins` equal-width buckets
    * per group and locates, from cumulative bin counts (a bins-sized
    * per-group frame), which bucket holds each middle order statistic
    * (ranks ⌈n/2⌉ and ⌈(n+1)/2⌉). Pass 2 re-scans ONLY the rows of those
    * target buckets — expected n/bins of the data — and sorts within them,
    * offsetting local ranks by the cumulative count below the bucket. At
    * 100 TB this replaces `sort().limit(k)` over the full group (a
    * full-shuffle death) with two scans plus a sort of ~n/1000 rows; exact
    * result, unlike approx_percentile. All-equal groups (bin width 0)
    * collapse to bucket 0 and come out exact. */
  def exactMedianTwoPass(df: DataFrame, value: String, keys: Seq[String],
                         bins: Int = 1001): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = keys.map(col)
    val v = col(value).cast("double")
    // pass 1: per-group extent + target ranks
    val ext = df.groupBy(k: _*).agg(
      min(v).as("_lo"), max(v).as("_hi"), count(v).as("_n"))
      .withColumn("_w", (col("_hi") - col("_lo")) / bins)
      .withColumn("_k1", expr("(_n + 1) div 2"))
      .withColumn("_k2", expr("(_n + 2) div 2"))
    val binned = njoin(df.filter(v.isNotNull), ext, keys, bcastRight = true)
      .withColumn("_bin", when(col("_w") === 0, lit(0L))
        .otherwise(least(floor((v - col("_lo")) / col("_w")),
          lit(bins - 1L))))
    val cumW = Window.partitionBy(k: _*).orderBy(col("_bin"))
    val hist = binned.groupBy((k :+ col("_bin")): _*)
      .agg(count(lit(1)).as("_c"),
        first(col("_k1")).as("_k1"), first(col("_k2")).as("_k2"))
      .withColumn("_cum", sum(col("_c")).over(cumW))
      .withColumn("_below", col("_cum") - col("_c"))
    // buckets holding either middle rank (≤ 2 per group)
    val targets = hist.filter(
      (col("_below") < col("_k1") && col("_k1") <= col("_cum")) ||
        (col("_below") < col("_k2") && col("_k2") <= col("_cum")))
      .select((k :+ col("_bin") :+ col("_below")): _*)
    // pass 2: sort only the target buckets, pick the global order stats
    val rankW = Window.partitionBy((k :+ col("_bin")): _*).orderBy(v)
    njoin(binned, targets, keys :+ "_bin")
      .withColumn("_rk", col("_below") + row_number().over(rankW))
      .filter(col("_rk") === col("_k1") || col("_rk") === col("_k2"))
      .groupBy(k: _*)
      .agg(round(avg(v), 6).as("median"))
  }

  private val Dec = "decimal(28,10)"

  /** NULL-safe inner/left equi-join on `keys`: Spark's `join(df, usingCols)`
    * compiles to plain `=` on the keys, which drops any group whose key is
    * NULL — but the window-based semantics these operators replace (and
    * their DuckDB oracles) treat NULL as a regular partition. This helper
    * joins with `<=>` (null-safe equality — still a hash-joinable key, and
    * Catalyst rewrites it back to `=` when both sides are non-nullable, so
    * the non-null fast path costs nothing). Right-side key columns are
    * renamed before the join, so self-derived frames resolve without
    * ambiguity, and dropped after. `bcastRight` marks group-sized frames. */
  private[graft] def njoin(l: DataFrame, r: DataFrame, keys: Seq[String],
      bcastRight: Boolean = false, how: String = "inner"): DataFrame = {
    val r1 = keys.foldLeft(r)((d, kk) => d.withColumnRenamed(kk, s"__nj_$kk"))
    val rr = if (bcastRight) broadcast(r1) else r1
    if (keys.isEmpty) l.crossJoin(rr)
    else l.join(rr,
        keys.map(kk => col(kk) <=> col(s"__nj_$kk")).reduce(_ && _), how)
      .drop(keys.map(kk => s"__nj_$kk"): _*)
  }

  /** Range-partitioned prefix sums over a per-value frame — the scale-safe
    * replacement for `sum(x).over(Window.partitionBy(keys).orderBy(v))`
    * when `keys` has few distinct values (where that window is a
    * single-task sort of the whole group at any scale). Values are bucketed
    * into `bins` equal-width ranges; per-bucket totals roll up in ONE
    * bins-sized window per group; the per-row cumulative is then
    * bucket-offset + within-bucket prefix. Both windows are bounded:
    * ≤ `bins` rows per group for the offsets, ~|values|/`bins` rows per
    * task for the local pass — parallelism is groups × bins instead of
    * groups (the two-level scheme [[exactMedianTwoPass]] uses for
    * selection, generalized to full prefixes). Decimal/integer sums are
    * exact and associative, so the decomposition is bit-identical to the
    * single global window. Requires one row per (keys, vCol); appends
    * `<c>_cum` (inclusive prefix in `vCol` order, descending if
    * `descending`) for each column in `sums`, plus — when `totals` — the
    * per-group grand total `<c>_tot` (computed in the SAME bins-sized
    * offsets window pass, so it costs no extra scan or broadcast: the
    * q138-rework trim). NULL group keys are regular groups (null-safe
    * joins throughout, matching Window.partitionBy semantics). */
  private[graft] def binnedPrefix(perValue: DataFrame, keys: Seq[String],
      vCol: String, sums: Seq[String], descending: Boolean,
      bins: Int = 256, totals: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k  = keys.map(col)
    val vd = col(vCol).cast("double")
    val ext = perValue.groupBy(k: _*)
      .agg(min(vd).as("_plo"), max(vd).as("_phi"))
      .withColumn("_pw", (col("_phi") - col("_plo")) / bins)
      .select((k :+ col("_plo") :+ col("_pw")): _*)
    // bin index is monotone in the value (equal values share a bin), so
    // (bin order, value order within bin) IS the global value order
    val binned = njoin(perValue, ext, keys, bcastRight = true)
      .withColumn("_pbin", when(col("_pw") === 0, lit(0L))
        .otherwise(least(floor((vd - col("_plo")) / col("_pw")),
          lit(bins - 1L))))
      .drop("_plo", "_pw")
    val binTot = binned.groupBy((k :+ col("_pbin")): _*)
      .agg(sum(col(sums.head)).as(s"_bt_${sums.head}"),
        sums.tail.map(c => sum(col(c)).as(s"_bt_$c")): _*)
    val wOff = Window.partitionBy(k: _*)
      .orderBy(if (descending) col("_pbin").desc else col("_pbin").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(k: _*)
    val offsets0 = sums.foldLeft(binTot)((d, c) => {
      val d2 = d.withColumn(s"_off_$c", sum(col(s"_bt_$c")).over(wOff))
      if (totals) d2.withColumn(s"${c}_tot", sum(col(s"_bt_$c")).over(wAll))
      else d2
    })
    val offCols = sums.map(c => col(s"_off_$c")) ++
      (if (totals) sums.map(c => col(s"${c}_tot")) else Nil)
    val offsets = offsets0.select((k :+ col("_pbin")) ++ offCols: _*)
    val wLoc = Window.partitionBy((k :+ col("_pbin")): _*)
      .orderBy(if (descending) col(vCol).desc else col(vCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sums.foldLeft(njoin(binned, offsets, keys :+ "_pbin"))((d, c) =>
        d.withColumn(s"${c}_cum",
          coalesce(col(s"_off_$c"), lit(0)) + sum(col(c)).over(wLoc)))
      .drop((sums.map(c => s"_off_$c") :+ "_pbin"): _*)
  }

  /** Scale-safe k extreme rows per group — the two-pass binned selection
    * ([[exactMedianTwoPass]] scheme) for top-k/bottom-k: pass 1 bins
    * values and finds, from bins-sized cumulative counts, the bucket
    * holding rank k (kEff = min(k, n) per group); pass 2 keeps only rows
    * in buckets at-or-better than that bucket (~k + n/bins rows per
    * group), ranks THAT small frame, and filters to rank ≤ kEff. A plain
    * `row_number().over(partitionBy(keys).orderBy(value))` sorts each
    * group's ENTIRE data in one task — with few groups, the classic
    * single-reducer trap; here the full-data pass is one broadcast-join
    * scan and the only per-group sort covers the bounded kept frame.
    * Equal values share a bucket, so the kept set is a superset of the
    * true top-k under any tie order and `_rn` equals the global
    * row_number in (value, tie…) order. Emits the kept rows + `_rn`. */
  private[graft] def extremeK(df: DataFrame, value: String,
      keys: Seq[String], k: Int, descending: Boolean,
      tie: Seq[Column] = Nil, bins: Int = 1001): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1, got $k")
    val kk = keys.map(col)
    val vd = col(value).cast("double")
    val base = df.filter(col(value).isNotNull)
    val ext = base.groupBy(kk: _*).agg(
        min(vd).as("_lo"), max(vd).as("_hi"), count(lit(1)).as("_nx"))
      .withColumn("_w", (col("_hi") - col("_lo")) / bins)
      .withColumn("_keff", least(lit(k.toLong), col("_nx")))
      .select((kk :+ col("_lo") :+ col("_w") :+ col("_keff")): _*)
    val binned = njoin(base, ext, keys, bcastRight = true)
      .withColumn("_bin", when(col("_w") === 0, lit(0L))
        .otherwise(least(floor((vd - col("_lo")) / col("_w")),
          lit(bins - 1L))))
    val cumW = Window.partitionBy(kk: _*)
      .orderBy(if (descending) col("_bin").desc else col("_bin").asc)
    val target = binned.groupBy((kk :+ col("_bin")): _*)
      .agg(count(lit(1)).as("_c"), first(col("_keff")).as("_tk"))
      .withColumn("_cum", sum(col("_c")).over(cumW))
      .withColumn("_blw", col("_cum") - col("_c"))
      .filter(col("_blw") < col("_tk") && col("_tk") <= col("_cum"))
      .select((kk :+ col("_bin").as("_tbin")): _*)
    val keepCond =
      if (descending) col("_bin") >= col("_tbin") else col("_bin") <= col("_tbin")
    val vOrd = (if (descending) col(value).desc else col(value).asc) +: tie
    val wFull = Window.partitionBy(kk: _*).orderBy(vOrd: _*)
    njoin(binned, target, keys, bcastRight = true)
      .filter(keepCond)
      .withColumn("_rn", row_number().over(wFull))
      .filter(col("_rn") <= col("_keff"))
      .drop("_lo", "_w", "_keff", "_bin", "_tbin")
  }

  /** Historical tail risk per group: VaR and expected shortfall at level
    * `alpha` by EXACT order statistics — k = ⌈α·n⌉, VaR = the k-th
    * smallest value, ES = the mean of the k smallest (the coherent
    * tail-average risk measure; Artzner et al. 1999). Order statistics,
    * not interpolated percentiles, so ties and engine interpolation
    * conventions can't wiggle the answer (`id` breaks value ties
    * deterministically).
    *
    * Selection is the [[exactMedianTwoPass]] two-pass scheme generalized
    * to rank ⌈αn⌉ — a per-group raw-row rank window would sort each
    * group's ENTIRE data in one task (few groups → few tasks at any
    * scale). Pass 1 bins values per group and finds, from bins-sized
    * cumulative counts, the bucket holding rank k; pass 2 drops every row
    * above that bucket (1−α of the data, before any sort), ranks ONLY
    * inside the boundary bucket (~n/bins rows), and aggregates the tail.
    * Bin indices are monotone in the value and ties share a bin, so
    * bucket-offset + within-bucket (value, id) rank IS the global rank —
    * the selected set is row-for-row what the single window selected. */
  def tailRisk(df: DataFrame, value: String, keys: Seq[String], id: String,
               alpha: Double = 0.05, bins: Int = 1001): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(alpha > 0 && alpha < 1, s"alpha $alpha outside (0, 1)")
    val k  = keys.map(col)
    val vd = col(value).cast("double")
    val base = df.filter(col(value).isNotNull)
    val ext = base.groupBy(k: _*).agg(
        min(vd).as("_lo"), max(vd).as("_hi"), count(lit(1)).as("_n"))
      .withColumn("_w", (col("_hi") - col("_lo")) / bins)
      .withColumn("_k",
        greatest(lit(1L), ceil(lit(alpha) * col("_n")).cast("long")))
      .select((k :+ col("_lo") :+ col("_w") :+ col("_n") :+ col("_k")): _*)
    val binned = njoin(base, ext, keys, bcastRight = true)
      .withColumn("_bin", when(col("_w") === 0, lit(0L))
        .otherwise(least(floor((vd - col("_lo")) / col("_w")),
          lit(bins - 1L))))
    val cumW = Window.partitionBy(k: _*).orderBy(col("_bin"))
    val target = binned.groupBy((k :+ col("_bin")): _*)
      .agg(count(lit(1)).as("_c"), first(col("_k")).as("_tk"))
      .withColumn("_cum", sum(col("_c")).over(cumW))
      .withColumn("_blw", col("_cum") - col("_c"))
      .filter(col("_blw") < col("_tk") && col("_tk") <= col("_cum"))
      .select((k :+ col("_bin").as("_tbin") :+ col("_blw").as("_tbelow")): _*)
    val wRank = Window.partitionBy((k :+ col("_bin")): _*)
      .orderBy(col(value), col(id))
    val tail = njoin(binned, target, keys, bcastRight = true)
      .filter(col("_bin") <= col("_tbin"))
      .withColumn("_rk", when(col("_bin") === col("_tbin"),
        col("_tbelow") + row_number().over(wRank)).otherwise(lit(0L)))
      .filter(col("_bin") < col("_tbin") || col("_rk") <= col("_k"))
    tail.groupBy(k: _*)
      .agg(
        max(col("_n")).as("n_obs"),
        max(col("_k")).as("tail_n"),
        max(col(value)).as("var_tail"),
        round(sum(col(value).cast(Dec)).cast("double") / max(col("_k")), 6)
          .as("es_tail"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic: D = max over observed values
    * of |F₁(x) − F₂(x)|, with the ECDFs evaluated EXACTLY from cumulative
    * counts over the merged distinct-value axis (no interpolation, ties
    * handled by aggregating per distinct value first — the textbook
    * definition). The cumulative counts ride [[binnedPrefix]] (bounded
    * windows): the distinct-value axis of a continuous column is ≈ n, so
    * a single global ordered window over it would be a one-task sort at
    * scale — the prefix decomposition keeps parallelism at `bins` while
    * the integer sums stay bit-identical. Returns one row (n₁, n₂,
    * d_stat). */
  def ksTest(df: DataFrame, value: String, group: String,
             aLabel: String, bLabel: String): DataFrame = {
    val base = df.filter(col(value).isNotNull &&
      (col(group) === aLabel || col(group) === bLabel))
    val perValue = base.groupBy(col(value).as("_v")).agg(
      count(when(col(group) === aLabel, 1)).as("_c1"),
      count(when(col(group) === bLabel, 1)).as("_c2"))
    val withCum = binnedPrefix(perValue, Nil, "_v", Seq("_c1", "_c2"),
        descending = false)
      .withColumnRenamed("_c1_cum", "_f1")
      .withColumnRenamed("_c2_cum", "_f2")
    val tot = withCum.agg(max(col("_f1")).as("n1"), max(col("_f2")).as("n2"))
    withCum.crossJoin(broadcast(tot))
      .agg(
        max(col("n1")).as("n1"),
        max(col("n2")).as("n2"),
        // divisors null-guarded, not CASE-guarded (ANSI hoists divisions)
        round(max(abs(
          col("_f1").cast("double") /
            when(col("n1") > 0, col("n1").cast("double")) -
            col("_f2").cast("double") /
              when(col("n2") > 0, col("n2").cast("double")))), 6)
          .as("d_stat"))
  }

  /** Mann–Whitney U rank-sum test (two-sided normal approximation with tie
    * correction): average ranks over the pooled sample (min-rank +
    * (ties−1)/2 — deterministic under any partitioning), U₁ = R₁ −
    * n₁(n₁+1)/2, z = (U₁ − n₁n₂/2)/√var with var = (n₁n₂/12)·((n+1) −
    * Σ(t³−t)/(n(n−1))). Rows pre-aggregate per DISTINCT VALUE (the
    * [[ksTest]] shape) and the min-rank derives from [[binnedPrefix]]
    * cumulative counts (minrank(v) = 1 + #rows below v) — no raw-row
    * global rank window, whose single unpartitioned sort was the one-task
    * scale killer. Per-value rank sums accumulate in exact DECIMAL
    * (t₁·avgrank = the sum of the t₁ identical per-row terms, so the
    * decomposition is bit-identical to the pooled-window form). Returns
    * one row (n1, n2, u1, z). */
  def mannWhitney(df: DataFrame, value: String, group: String,
                  aLabel: String, bLabel: String): DataFrame = {
    val base = df.filter(col(value).isNotNull &&
      (col(group) === aLabel || col(group) === bLabel))
    val perValue = base.groupBy(col(value).as("_v")).agg(
      count(when(col(group) === aLabel, 1)).as("_t1"),
      count(when(col(group) === bLabel, 1)).as("_t2"))
      .withColumn("_t", col("_t1") + col("_t2"))
    val ranked = binnedPrefix(perValue, Nil, "_v", Seq("_t"),
        descending = false)
      // min-rank = 1 + #rows strictly below; average rank of the tie group
      // = minrank + (t−1)/2 — exact in double (ranks step by halves)
      .withColumn("_avgr",
        (col("_t_cum") - col("_t") + 1).cast("double") +
          (col("_t") - 1).cast("double") / lit(2.0))
    val agged = ranked.agg(
      coalesce(sum(col("_t1")), lit(0L)).as("n1"),
      coalesce(sum(col("_t2")), lit(0L)).as("n2"),
      // R₁ = Σ_v t₁(v)·avgrank(v), exact: t₁ copies of the same DECIMAL
      sum(col("_avgr").cast(Dec) * col("_t1"))
        .cast("double").as("_r1"),
      // Σ(t³−t) over tie GROUPS: (t²−1)·t per value — the (t²−1) factor
      // stays in BIGINT range, the ·t product is exact in DECIMAL
      sum((col("_t") * col("_t") - 1).cast(Dec) * col("_t")).cast("double")
        .as("_tsum3"))
    val n1 = col("n1").cast("double"); val n2 = col("n2").cast("double")
    val n  = n1 + n2
    val u1 = col("_r1") - n1 * (n1 + 1) / lit(2.0)
    // null-guarded divisor (ANSI hoists divisions past CASE guards)
    val variance = n1 * n2 / lit(12.0) *
      ((n + 1) - col("_tsum3") / when(n > 1, n * (n - 1)))
    agged
      .withColumn("u1", round(u1, 6))
      .withColumn("z",
        when(col("n1") > 0 && col("n2") > 0 && variance > 0,
          round((u1 - n1 * n2 / lit(2.0)) / sqrt(variance), 6)))
      .select("n1", "n2", "u1", "z")
  }

  /** Benford first-significant-digit analysis per group: observed digit
    * shares vs the Benford expectation log₁₀(1 + 1/d) — the classic
    * fabricated-data / corpus-drift screen. The digit is extracted through
    * an ENGINE-PORTABLE integer path (floor(x·100 + ½) → first character
    * of the integer's decimal rendering), never via log₁₀(x) — a value
    * sitting on a power of ten would round its log either side of the
    * integer in different engines. Two hash aggregates, no window over
    * the data itself. */
  def benford(df: DataFrame, value: String, keys: Seq[String]): DataFrame = {
    val base = df.filter(col(value).isNotNull && col(value) > 0)
      .withColumn("_i", floor(col(value) * lit(100.0) + lit(0.5))
        .cast("long"))
      .filter(col("_i") > 0)
      .withColumn("digit",
        substring(col("_i").cast("string"), 1, 1).cast("int"))
    val counts = base.groupBy((keys.map(col) :+ col("digit")): _*)
      .agg(count(lit(1)).as("n_digit"))
    val totals = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
    counts
      .withColumn("n_rows", sum(col("n_digit")).over(totals))
      .withColumn("share",
        round(col("n_digit").cast("double") / col("n_rows"), 6))
      .withColumn("benford_p",
        round(log(lit(1.0) + lit(1.0) / col("digit")) / log(lit(10.0)), 6))
  }

  /** Central-moment shape statistics per group: population skewness
    * m₃/m₂^1.5 and excess kurtosis m₄/m₂² − 3, derived from exact DECIMAL
    * power sums (Σx..Σx⁴ — one aggregate pass, mergeable partials). The
    * closed forms are evaluated in a PINNED operation order (each term a
    * named intermediate, powers as explicit products, √ not pow) so two
    * engines produce bit-identical doubles before the final round. NULL
    * for degenerate groups (m₂ ≤ 0 or fewer than 3 rows). */
  def momentStats(df: DataFrame, value: String, keys: Seq[String]): DataFrame = {
    val x = col(value)
    val ok = x.isNotNull
    def dsum(e: Column) = sum(when(ok, e.cast(Dec))).cast("double")
    val agged = df.groupBy(keys.map(col): _*).agg(
      count(when(ok, 1)).as("n_obs"),
      dsum(x).as("_s1"),
      dsum(x * x).as("_s2"),
      dsum(x * x * x).as("_s3"),
      dsum(x * x * x * x).as("_s4"))
    val n = col("n_obs").cast("double")
    val mean = col("_s1") / n
    // raw moments first, then central moments in left-associated order —
    // the oracle SQL spells out the identical association
    val r2 = col("_s2") / n; val r3 = col("_s3") / n; val r4 = col("_s4") / n
    val m2 = r2 - mean * mean
    val m3 = r3 - lit(3.0) * mean * r2 + lit(2.0) * mean * mean * mean
    val m4 = r4 - lit(4.0) * mean * r3 + lit(6.0) * mean * mean * r2 -
      lit(3.0) * mean * mean * mean * mean
    agged
      .withColumn("mean", round(mean, 6))
      .withColumn("variance", when(col("n_obs") >= 2, round(m2, 6)))
      .withColumn("skewness",
        when(col("n_obs") >= 3 && m2 > 0, round(m3 / (m2 * sqrt(m2)), 6)))
      .withColumn("kurtosis_excess",
        when(col("n_obs") >= 3 && m2 > 0, round(m4 / (m2 * m2) - lit(3.0), 6)))
      .drop("_s1", "_s2", "_s3", "_s4")
  }

  /** Chi-square test of independence between two categorical columns plus
    * Cramér's V effect size: χ² = Σ (O − E)²/E over the contingency table
    * with E = rowTotal·colTotal/n, V = √(χ²/(n·(min(r,c)−1))). The
    * contingency table is |a|·|b| cells (one hash aggregate over the
    * data); marginals ride cell-frame windows; per-cell terms quantize to
    * DECIMAL before the χ² sum so accumulation order is pinned. Returns
    * one row (n, r, c, dof, chi2, cramers_v). */
  def chiSquare(df: DataFrame, a: String, b: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = df.filter(col(a).isNotNull && col(b).isNotNull)
      .groupBy(col(a).as("_a"), col(b).as("_b"))
      .agg(count(lit(1)).as("_o"))
    val wA = Window.partitionBy(col("_a"))
    val wB = Window.partitionBy(col("_b"))
    val wAll = Window.partitionBy()
    val withE = cells
      .withColumn("_ra", sum(col("_o")).over(wA))
      .withColumn("_cb", sum(col("_o")).over(wB))
      .withColumn("_n", sum(col("_o")).over(wAll))
      .withColumn("_e",
        (col("_ra") * col("_cb")).cast("double") /
          when(col("_n") > 0, col("_n").cast("double")))
      .withColumn("_term",
        (((col("_o").cast("double") - col("_e")) *
          (col("_o").cast("double") - col("_e"))) /
          when(col("_e") > 0, col("_e"))).cast("decimal(28,12)"))
    val agged = withE.agg(
      max(col("_n")).cast("long").as("n"),
      countDistinct(col("_a")).as("r"),
      countDistinct(col("_b")).as("c"),
      sum(col("_term")).cast("double").as("_chi2"))
    val minDim = least(col("r"), col("c")).cast("double") - lit(1.0)
    agged
      .withColumn("dof", (col("r") - 1) * (col("c") - 1))
      .withColumn("chi2", round(col("_chi2"), 6))
      .withColumn("cramers_v",
        when(col("n") > 0 && minDim > 0,
          round(sqrt(col("_chi2") /
            when(col("n").cast("double") * minDim > 0,
              col("n").cast("double") * minDim)), 6)))
      .drop("_chi2")
  }

  /** CUPED variance-reduced metric (Deng et al. WSDM'13): per row,
    * y_adj = y − θ·(x − x̄) with θ = cov(x, y)/var(x) from exact-decimal
    * moments over the WHOLE frame (the pre-experiment covariate is fitted
    * pooled, as the method prescribes, so the adjustment cannot leak the
    * treatment split). One 1-row moment aggregate broadcast back onto the
    * scan; emits the input columns plus y_adj and repeats theta. The
    * standard experimentation trick: same mean, strictly smaller variance
    * whenever x correlates with y ([[cupedReadout]] is the per-arm
    * experiment summary built on the same identity). */
  def cuped(df: DataFrame, y: String, x: String): DataFrame = {
    def dsum(e: Column) = sum(e.cast(Dec)).cast("double")
    val base = df.filter(col(y).isNotNull && col(x).isNotNull)
    val m = base.agg(
      count(lit(1)).as("_n"),
      dsum(col(x)).as("_sx"), dsum(col(y)).as("_sy"),
      dsum(col(x) * col(x)).as("_sxx"),
      dsum(col(x) * col(y)).as("_sxy"))
    val n = col("_n").cast("double")
    val vx = n * col("_sxx") - col("_sx") * col("_sx")
    val theta = (n * col("_sxy") - col("_sx") * col("_sy")) /
      when(vx =!= 0.0, vx)
    val xbar = col("_sx") / when(n > 0, n)
    base.crossJoin(broadcast(m))
      .withColumn("theta", when(vx =!= 0.0, round(theta, 6)))
      .withColumn("y_adj",
        when(vx =!= 0.0,
          round(col(y) - theta * (col(x) - xbar), 6))
          .otherwise(col(y)))
      .drop("_n", "_sx", "_sy", "_sxx", "_sxy")
  }

  /** Hill tail-index estimator per group (Hill 1975): over the k largest
    * positive values, α̂ = k / Σᵢ ln(xᵢ/x₍ₖ₊₁₎) — the standard heavy-tail
    * diagnostic (α ≈ 1–2 for power-law traffic/wealth tails, large α for
    * thin tails). Boundary ties are safe: tied rows carry identical ln x,
    * so which of them land inside the top-k cannot change the sum. One
    * per-group rank window (top-k+1 survives, the rest drop before the
    * aggregate) + exact-decimal log sums. NULL when the denominator
    * degenerates (all top values equal) or the group has < k+1 positive
    * rows. */
  def hillEstimator(df: DataFrame, value: String, keys: Seq[String],
                    k: Int = 50): DataFrame = {
    require(k >= 2, s"k must be ≥ 2, got $k")
    // top-(k+1) via the two-pass binned selection — a per-group raw-row
    // rank window would sort each group's entire data in one task; ties
    // at the boundary are estimator-invariant (only Σlog of the top k and
    // the (k+1)-th VALUE enter, both unchanged by which tied row ranks k)
    val top = extremeK(df.filter(col(value).isNotNull && col(value) > 0),
      value, keys, k + 1, descending = true)
    val agged = top.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("_n"),
      sum(when(col("_rn") <= k, log(col(value))).cast(Dec))
        .cast("double").as("_slog"),
      max(when(col("_rn") === k + 1, col(value))).as("_xk1"))
    val denom = col("_slog") - lit(k.toDouble) * log(col("_xk1"))
    agged
      .withColumn("hill_alpha",
        when(col("_n") === k + 1 && col("_xk1") > 0 && denom > 0,
          round(lit(k.toDouble) / denom, 6)))
      .select(keys.map(col) :+ col("_n").as("n_top") :+
        col("hill_alpha"): _*)
  }

  /** Trimmed mean per group: the exact-decimal mean of values strictly
    * inside the [p_lo, p_hi] exact-percentile band — the DROPPING robust
    * location estimate ([[winsorize]] is the clipping one). Same plan
    * shape as the winsorize fences: one group-sized quantile aggregate
    * broadcast back onto the scan, the data never wide-shuffles. */
  def trimmedMean(df: DataFrame, value: String, keys: Seq[String],
                  lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, s"bad band [$lo, $hi]")
    val fences = df.groupBy(keys.map(col): _*).agg(
      expr(s"percentile($value, $lo)").as("_lo"),
      expr(s"percentile($value, $hi)").as("_hi"))
    df.filter(col(value).isNotNull)
      .join(broadcast(fences), keys)
      .filter(col(value) >= col("_lo") && col(value) <= col("_hi"))
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_kept"),
        round(sum(col(value).cast(Dec)).cast("double") /
          count(lit(1)), 6).as("trimmed_mean"))
  }

  /** Two-proportion z-test (pooled): for binary outcomes across two
    * groups, z = (p₁ − p₂) / √(p̂(1−p̂)(1/n₁ + 1/n₂)) with p̂ the pooled
    * success rate — the conversion A/B screen. `success` must be 0/1.
    * One tiny aggregate; every closed form pinned; NULL z when a group
    * is empty or the pooled rate degenerates. */
  def twoProportionZ(df: DataFrame, group: String, success: String,
                     aLabel: String, bLabel: String): DataFrame = {
    // NULL outcomes are EXCLUDED, not zero-filled: counting them in n while
    // dropping them from s would silently deflate both proportions
    val base = df.filter((col(group) === aLabel || col(group) === bLabel) &&
      col(success).isNotNull)
    val agged = base.agg(
      count(when(col(group) === aLabel, 1)).as("n1"),
      count(when(col(group) === bLabel, 1)).as("n2"),
      sum(when(col(group) === aLabel, col(success)).otherwise(lit(0)))
        .cast("long").as("s1"),
      sum(when(col(group) === bLabel, col(success)).otherwise(lit(0)))
        .cast("long").as("s2"))
    val n1 = col("n1").cast("double"); val n2 = col("n2").cast("double")
    val p1 = col("s1").cast("double") / when(n1 > 0, n1)
    val p2 = col("s2").cast("double") / when(n2 > 0, n2)
    val pp = (col("s1") + col("s2")).cast("double") /
      when(n1 + n2 > 0, n1 + n2)
    val se = sqrt(pp * (lit(1.0) - pp) * (lit(1.0) / when(n1 > 0, n1) +
      lit(1.0) / when(n2 > 0, n2)))
    agged
      .withColumn("p1", when(col("n1") > 0, round(p1, 6)))
      .withColumn("p2", when(col("n2") > 0, round(p2, 6)))
      .withColumn("z",
        when(col("n1") > 0 && col("n2") > 0 && se > 0,
          round((p1 - p2) / se, 6)))
  }

  /** Lorenz curve at decile resolution per group: for i = 1..10, the
    * cumulative share of total mass held by the bottom ⌈n·i/10⌉ rows —
    * the distributional companion to [[graft.analytics.Behavior.gini]]
    * (Gini = 1 − 2·area under this curve). Rows pre-aggregate per VALUE
    * before the cumulative pass, so ties cannot make the curve depend on
    * row order; mass accumulates in exact DECIMAL. Output: (keys, decile,
    * n_rows_covered, cum_share). Assumes non-negative mass. */
  def lorenzCurve(df: DataFrame, value: String,
                  keys: Seq[String]): DataFrame = {
    val perValue = df.filter(col(value).isNotNull)
      .groupBy((keys.map(col) :+ col(value).as("_v")): _*)
      .agg(count(lit(1)).as("_c"), sum(col(value).cast(Dec)).as("_m"))
    // cumulative count/mass via the range-partitioned two-level prefix
    // (bounded windows) instead of one per-group ordered window — exact
    // integer/decimal sums, so identical values at any partitioning
    val grp = perValue.groupBy(keys.map(col): _*)
      .agg(sum(col("_c")).as("_n"), sum(col("_m")).as("_tm"))
    val cum = njoin(
      binnedPrefix(perValue, keys, "_v", Seq("_c", "_m"),
          descending = false)
        .withColumnRenamed("_c_cum", "_cc")
        .withColumnRenamed("_m_cum", "_cm"),
      grp, keys, bcastRight = true)
    val dec = cum.withColumn("_d", explode(sequence(lit(1), lit(10))))
      // this value-row covers decile d iff it is the FIRST row whose
      // cumulative row count reaches ⌈n·d/10⌉
      .withColumn("_need", ceil(col("_n") * col("_d") / lit(10)))
      .filter(col("_cc") >= col("_need") &&
        col("_cc") - col("_c") < col("_need"))
    dec.select((keys.map(col) :+ col("_d").as("decile") :+
        col("_cc").as("n_rows_covered") :+
        when(col("_tm").cast("double") > 0,
          round(col("_cm").cast("double") /
            when(col("_tm").cast("double") > 0, col("_tm").cast("double")),
            6)).as("cum_share")): _*)
  }

  /** Herfindahl–Hirschman concentration index per group over per-entity
    * mass (Σ shareᵢ² — 1/n for perfect competition, 1 for monopoly) plus
    * the effective number of entities 1/HHI. One entity aggregate + one
    * group aggregate, shares from exact-decimal sums, share² quantized to
    * DECIMAL before the final sum. */
  def hhi(df: DataFrame, entity: String, value: String,
          keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perEntity = df.filter(col(value).isNotNull)
      .groupBy((keys.map(col) :+ col(entity)): _*)
      .agg(sum(col(value).cast(Dec)).as("_m"))
    val wKey = Window.partitionBy(keys.map(col): _*)
    val withTot = perEntity
      .withColumn("_tm", sum(col("_m")).over(wKey))
      .withColumn("_share",
        col("_m").cast("double") /
          when(col("_tm").cast("double") > 0, col("_tm").cast("double")))
    withTot.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_entities"),
        sum((col("_share") * col("_share")).cast("decimal(28,12)"))
          .cast("double").as("_h"))
      .withColumn("hhi", round(col("_h"), 6))
      .withColumn("effective_n",
        when(col("_h") > 0, round(lit(1.0) / when(col("_h") > 0, col("_h")),
          6)))
      .drop("_h")
  }

  /** Exact lower weighted median per group: the smallest value whose
    * cumulative weight reaches half the group's total (ties on value are
    * safe — cumulative weight at a value is summed over ALL rows carrying
    * it before the comparison, so row order within a value can't matter).
    * Cumulative weights come from [[binnedPrefix]] (bounded windows, no
    * per-group single-task sort) and accumulate in
    * exact DECIMAL. The weighted generalisation of [[exactMedianTwoPass]]
    * for frequency- or importance-weighted distributions (token counts,
    * notional sizes). Non-positive/NULL weights drop. */
  def weightedMedian(df: DataFrame, value: String, weight: String,
                     keys: Seq[String]): DataFrame = {
    val base = df.filter(col(value).isNotNull && col(weight).isNotNull &&
      col(weight) > 0)
    val perValue = base
      .groupBy((keys.map(col) :+ col(value).as("_v")): _*)
      .agg(sum(col(weight).cast(Dec)).as("_w"))
    // cumulative weight via the range-partitioned two-level prefix
    // (bounded windows — no per-group single-task sort of distinct values)
    val tw = perValue.groupBy(keys.map(col): _*)
      .agg(sum(col("_w")).as("_tw"))
    val cum = njoin(
      binnedPrefix(perValue, keys, "_v", Seq("_w"),
          descending = false)
        .withColumnRenamed("_w_cum", "_cw"),
      tw, keys, bcastRight = true)
    cum.filter(col("_cw") * 2 >= col("_tw"))
      .groupBy(keys.map(col): _*)
      .agg(min(col("_v")).as("weighted_median"),
        max(col("_tw")).cast("double").as("total_weight"))
  }

  /** Scale-safe Gini concentration coefficient per group directly over raw
    * rows: G = 2·Σᵢ i·x₍ᵢ₎ / (n·Σx) − (n+1)/n with x ascending, i = 1..n.
    * Where [[graft.analytics.Behavior.gini]] ranks every input row in one
    * per-group window (fine for entity-sized frames, a single-task sort
    * for few-group raw data), this uses the per-distinct-value closed
    * form: a value v with count c and r strictly-smaller rows occupies
    * ranks r+1..r+c, so Σᵢ i·v over its rows = v·(c·r + c(c+1)/2) — and
    * r comes from [[binnedPrefix]] cumulative counts (bounded windows).
    * The identity is permutation-invariant over ties by construction.
    * Rank terms are integer-exact (c(c+1) is always even, so `div 2` is
    * exact), the v·Σi product quantizes to DECIMAL per VALUE (the oracle
    * replays the identical closed form). NULL gini for zero-mass groups.
    * Output: (keys, n_obs, gini). */
  def giniPerValue(df: DataFrame, value: String,
                   keys: Seq[String]): DataFrame = {
    val k = keys.map(col)
    val perValue = df.filter(col(value).isNotNull)
      .groupBy((k :+ col(value).as("_v")): _*)
      .agg(count(lit(1)).as("_c"), sum(col(value).cast(Dec)).as("_m"))
    val terms = binnedPrefix(perValue, keys, "_v", Seq("_c"),
        descending = false)
      .withColumn("_r", col("_c_cum") - col("_c"))
      .withColumn("_ksum",
        col("_c") * col("_r") + expr("_c * (_c + 1) div 2"))
      .withColumn("_iw",
        (col("_v") * col("_ksum").cast("double")).cast(Dec))
    val agged = terms.groupBy(k: _*).agg(
      sum(col("_c")).cast("long").as("n_obs"),
      sum(col("_m")).cast("double").as("_s"),
      sum(col("_iw")).cast("double").as("_w"))
    val n = col("n_obs").cast("double")
    agged
      .withColumn("gini",
        when(col("_s") > 0,
          round(lit(2.0) * col("_w") / (n * when(col("_s") > 0, col("_s"))) -
            (n + lit(1.0)) / n, 6)))
      .drop("_s", "_w")
  }

  /** Population Stability Index between a REFERENCE and a CURRENT
    * distribution of `value` — the standard drift monitor a training
    * pipeline runs per feature/score between data loads (rule of thumb:
    * < 0.1 stable, 0.1–0.25 moderate shift, > 0.25 investigate). Bins are
    * the reference's `bins`-quantile fences (equal-mass on ref), both
    * sides share them, and PSI = Σ (curᵢ − refᵢ)·ln(curᵢ/refᵢ) with the
    * standard ε-floor on shares so empty bins contribute a large-but-
    * finite term instead of ±∞.
    *
    * Scale shape: ONE percentile aggregate on ref (1-row, broadcast) +
    * one scan-shaped conditional-count aggregate per side — the fences
    * frame is bins-sized and the bin assignment is a sum of `value > fᵢ`
    * indicators (portable: no width_bucket in the oracle engine). Fences
    * are quantized to 6 dp before comparison so both engines bin
    * boundary-adjacent rows identically. Output: one row per bin
    * (bin, ref_n, cur_n, ref_share, cur_share, psi_term, psi) with the
    * total repeated per row (bins-sized window). */
  def psi(ref: DataFrame, cur: DataFrame, value: String, bins: Int = 10,
          eps: Double = 1e-6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(bins >= 2, s"need >= 2 bins, got $bins")
    val qs = (1 until bins).map(i => s"${i.toDouble / bins}D").mkString(", ")
    val fences = ref.agg(expr(
      s"transform(percentile($value, array($qs)), f -> floor(f * 1e6 + 0.5) / 1e6)")
      .as("_f"))
    def binned(df: DataFrame): DataFrame = df
      .filter(col(value).isNotNull)
      .crossJoin(broadcast(fences))
      .withColumn("bin", expr(
        s"aggregate(_f, 0, (acc, f) -> acc + CASE WHEN $value > f THEN 1 ELSE 0 END)"))
    val refC = binned(ref).groupBy("bin").agg(count(lit(1)).as("ref_n"))
    val curC = binned(cur).groupBy("bin").agg(count(lit(1)).as("cur_n"))
    // every bin 0..bins-1 must appear even when empty on both sides
    val allBins = fences.select(explode(
      sequence(lit(0), lit(bins - 1))).as("bin"))
    val wAll = Window.partitionBy(lit(1))
    val joined = allBins
      .join(refC, Seq("bin"), "left").join(curC, Seq("bin"), "left")
      .na.fill(0L, Seq("ref_n", "cur_n"))
      .withColumn("_rt", sum(col("ref_n")).over(wAll))
      .withColumn("_ct", sum(col("cur_n")).over(wAll))
    val rShare = greatest(col("ref_n").cast("double") /
      when(col("_rt") > 0, col("_rt").cast("double")), lit(eps))
    val cShare = greatest(col("cur_n").cast("double") /
      when(col("_ct") > 0, col("_ct").cast("double")), lit(eps))
    joined
      .withColumn("ref_share", round(rShare, 6))
      .withColumn("cur_share", round(cShare, 6))
      .withColumn("_term", ((cShare - rShare) * log(cShare / rShare))
        .cast("decimal(28,12)"))
      .withColumn("psi_term", round(col("_term").cast("double"), 6))
      .withColumn("psi",
        round(sum(col("_term")).over(wAll).cast("double"), 6))
      .select("bin", "ref_n", "cur_n", "ref_share", "cur_share",
        "psi_term", "psi")
  }

  /** Benjamini–Hochberg FDR correction over a battery of p-values
    * (Benjamini & Hochberg 1995): with m tests and ascending order
    * statistics p₍ᵢ₎, the rejection threshold is the largest p₍ᵢ₎ ≤
    * i·α/m, and every p ≤ threshold is significant — the standard
    * multiple-testing gate over per-key test batteries (Granger/KS/
    * Pettitt screens produce exactly such frames). Ties are safe by
    * construction: the rejection set is {p ≤ p₍k₎}, which is invariant
    * to how equal p-values are ranked, so row_number needs no tiebreak.
    * The rank window is global over the TEST frame (|keys| rows, not
    * data rows — test batteries are key-sized); the threshold is a 1-row
    * aggregate broadcast back. NULL p-values are passed through as not
    * significant. */
  def bhFdr(df: DataFrame, pCol: String, alpha: Double = 0.05): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(alpha > 0 && alpha < 1, s"alpha $alpha outside (0, 1)")
    val valid = df.filter(col(pCol).isNotNull)
    val m1 = valid.agg(count(lit(1)).as("_m"))
    val ranked = valid.crossJoin(broadcast(m1))
      .withColumn("_i", row_number().over(Window.orderBy(col(pCol))))
    val thresh = ranked
      .filter(col(pCol) <=
        col("_i").cast("double") * lit(alpha) / col("_m").cast("double"))
      .agg(max(col(pCol)).as("_thresh"))
    df.crossJoin(broadcast(thresh))
      .withColumn("significant",
        when(col(pCol).isNotNull,
          col("_thresh").isNotNull && col(pCol) <= col("_thresh"))
          .otherwise(lit(false)))
      .withColumn("bh_threshold", col("_thresh"))
      .drop("_thresh")
  }

  /** Spearman rank correlation per group: Pearson's closed form applied to
    * pooled average ranks (min-rank + (ties−1)/2 — deterministic under any
    * partitioning, exact in double since ranks step by halves). Robust to
    * monotone transforms and outliers where the raw Pearson (q16) is not —
    * the standard screen for nonlinear association.
    *
    * Each margin's rank is a function of the VALUE alone within a group,
    * so ranks come from per-distinct-value counts + [[binnedPrefix]]
    * cumulative counts (min-rank = 1 + #rows below — the [[mannWhitney]]
    * scheme), joined back onto the rows null-safely. No per-group raw-row
    * rank window anywhere: a few-group input (e.g. a 5-flag table) would
    * otherwise sort each group's entire data in one task. One aggregate
    * of exact DECIMAL rank sums; rank products stay ≤ n² so
    * DECIMAL(28,10) never saturates below ~10⁹-row groups. NULL rho when
    * either margin is constant. */
  def spearman(df: DataFrame, x: String, y: String,
               keys: Seq[String]): DataFrame = {
    val base = df.filter(col(x).isNotNull && col(y).isNotNull)
    def avgRank(c: String, out: String)(d: DataFrame): DataFrame = {
      val perValue = d.groupBy((keys.map(col) :+ col(c).as("_v")): _*)
        .agg(count(lit(1)).as("_t"))
      val ranks = binnedPrefix(perValue, keys, "_v", Seq("_t"),
          descending = false)
        .withColumn(out,
          (col("_t_cum") - col("_t") + 1).cast("double") +
            (col("_t").cast("double") - lit(1.0)) / lit(2.0))
        .select((keys.map(col) :+ col("_v").as(c) :+ col(out)): _*)
      njoin(d, ranks, keys :+ c)
    }
    val ranked = avgRank(y, "_ry")(avgRank(x, "_rx")(base))
    def dsum(e: Column) = sum(e.cast(Dec)).cast("double")
    val agged = ranked.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n_obs"),
      dsum(col("_rx")).as("_sx"), dsum(col("_ry")).as("_sy"),
      dsum(col("_rx") * col("_rx")).as("_sxx"),
      dsum(col("_ry") * col("_ry")).as("_syy"),
      dsum(col("_rx") * col("_ry")).as("_sxy"))
    val n  = col("n_obs").cast("double")
    val cov = n * col("_sxy") - col("_sx") * col("_sy")
    val vx  = n * col("_sxx") - col("_sx") * col("_sx")
    val vy  = n * col("_syy") - col("_sy") * col("_sy")
    agged
      .withColumn("rho", when(vx > 0 && vy > 0, round(cov / sqrt(vx * vy), 6)))
      .select(keys.map(col) :+ col("n_obs") :+ col("rho"): _*)
  }

  /** ROC AUC and average precision per group — the threshold-free ranking
    * metrics every scored filter (quality classifier, dedup score, ANN
    * re-ranker) is judged by before its threshold is chosen.
    *
    * AUC is the Mann–Whitney U statistic normalized by n₁·n₀ (Hanley &
    * McNeil 1982): P(score⁺ > score⁻) + ½·P(=). Computed ENTIRELY from
    * per-distinct-value counts + [[binnedPrefix]] descending cumulatives —
    * never a raw-row rank window — as 2U = Σ_v n⁻_v·(2·(P_{≥v} − p_v) +
    * p_v), an integer identity (positives strictly above each negative's
    * value, plus half the ties), summed in DECIMAL so it is exact and
    * associative in any engine. Average precision is the step-interpolated
    * area under the precision–recall curve (the sklearn
    * `average_precision_score` form): AP = Σ_v (p_v/P)·precision(≥v) with
    * thresholds at the distinct score values descending; the per-value
    * precision term is one pinned double division, quantized to DECIMAL
    * before the cross-value sum.
    *
    * Scale shape: one hash-aggregate to per-value counts, then everything
    * rides binnedPrefix's two bounded windows (groups × bins tasks) — the
    * q138/topShare contract. Emits one row per group: (keys, n_pos,
    * n_neg, auc, avg_prec) at 6 dp; NULL metrics for one-class groups. */
  def rocPr(df: DataFrame, score: String, label: String,
            keys: Seq[String]): DataFrame = {
    val base = df.filter(col(score).isNotNull && col(label).isNotNull)
    val perValue = base.groupBy((keys.map(col) :+ col(score).as("_v")): _*)
      .agg(count(when(col(label) === 1, 1)).as("_p"),
        count(when(col(label) === 0, 1)).as("_n"))
    val pre = binnedPrefix(perValue, keys, "_v", Seq("_p", "_n"),
      descending = true, totals = true)
    // integer 2U in unbounded DECIMAL (n⁻_v · positives-above products
    // overflow BIGINT near 10¹⁰ rows); the AP term is the only double
    val agged = pre.groupBy(keys.map(col): _*).agg(
      max(col("_p_tot")).as("n_pos"),
      max(col("_n_tot")).as("n_neg"),
      sum(col("_n").cast("decimal(38,0)") *
        (lit(2) * (col("_p_cum") - col("_p")) + col("_p"))).as("_u2"),
      sum(when(col("_p") > 0,
        (col("_p").cast("double") * col("_p_cum").cast("double") /
          (col("_p_cum") + col("_n_cum")).cast("double"))
          .cast("decimal(28,12)"))).as("_ap"))
    agged
      .withColumn("auc",
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(col("_u2").cast("double") /
            (lit(2.0) * col("n_pos") * col("n_neg")), 6)))
      .withColumn("avg_prec",
        when(col("n_pos") > 0,
          round(col("_ap").cast("double") / col("n_pos"), 6)))
      .select(keys.map(col) :+ col("n_pos") :+ col("n_neg") :+
        col("auc") :+ col("avg_prec"): _*)
  }

  /** CUPED experiment READOUT (Deng et al., WSDM 2013) — the per-arm
    * companion to the row-level [[cuped]] transform: with a pre-period
    * covariate X per unit and the experiment metric Y, θ = cov(X,Y)/var(X)
    * estimated on the POOLED population, and each arm is compared on the
    * adjusted metric Y − θ·(X − X̄) — same expectation, variance shrunk by
    * the pre/post correlation (the industry-standard sensitivity boost),
    * with the achieved per-arm variance reduction reported alongside.
    *
    * `df` carries one row per unit: (arm, pre, post). θ and the adjusted
    * means/variances derive from one pass of per-arm power sums (n, ΣX,
    * ΣY, ΣX², ΣY², ΣXY — per-unit cross terms quantized to DECIMAL before
    * the cross-unit sums, so partials merge exactly) — the arm-sized frame
    * then folds to the pooled 1-row frame and broadcasts back; the closed
    * forms are evaluated in a PINNED operation order mirrored by the
    * oracle. Scale: one hash aggregate over units, everything after is
    * arm-count-sized. Emits (arm, n, mean_pre, mean_post, mean_adj,
    * var_post, var_adj, theta, var_reduction) at 6 dp; adjusted columns
    * NULL when the pooled pre-variance is 0. */
  def cupedReadout(df: DataFrame, arm: String, pre: String,
                   post: String): DataFrame = {
    val x = col(pre).cast("double"); val y = col(post).cast("double")
    def dsum(e: Column) = sum(e.cast(Dec))
    val perArm = df.groupBy(col(arm)).agg(
      count(lit(1)).as("n"),
      dsum(x).as("_sx"), dsum(y).as("_sy"),
      dsum(x * x).as("_sxx"), dsum(y * y).as("_syy"),
      dsum(x * y).as("_sxy"))
    val all = perArm.agg(
      sum(col("n")).as("_na"),
      sum(col("_sx")).as("_sxa"), sum(col("_sy")).as("_sya"),
      sum(col("_sxx")).as("_sxxa"), sum(col("_sxy")).as("_sxya"))
    val na = col("_na").cast("double")
    val varPreAll = col("_sxxa").cast("double") / na -
      col("_sxa").cast("double") / na * (col("_sxa").cast("double") / na)
    val covAll = col("_sxya").cast("double") / na -
      col("_sxa").cast("double") / na * (col("_sya").cast("double") / na)
    val pooled = all.select(
      when(varPreAll > 0, covAll / varPreAll).as("_theta"),
      (col("_sxa").cast("double") / na).as("_mxa"))
    val n = col("n").cast("double")
    val mx = col("_sx").cast("double") / n
    val my = col("_sy").cast("double") / n
    val th = col("_theta")
    val varPost = col("_syy").cast("double") / n - my * my
    val varAdj = (col("_syy").cast("double") -
      lit(2.0) * th * col("_sxy").cast("double") +
      th * th * col("_sxx").cast("double")) / n -
      (my - th * mx) * (my - th * mx)
    perArm.crossJoin(broadcast(pooled))
      .withColumn("mean_pre", round(mx, 6))
      .withColumn("mean_post", round(my, 6))
      .withColumn("mean_adj", round(my - th * (mx - col("_mxa")), 6))
      .withColumn("var_post", round(varPost, 6))
      .withColumn("var_adj", round(varAdj, 6))
      .withColumn("theta", round(th, 6))
      .withColumn("var_reduction",
        when(varPost > 0, round(lit(1.0) - varAdj / varPost, 6)))
      .select(col(arm), col("n"), col("mean_pre"), col("mean_post"),
        col("mean_adj"), col("var_post"), col("var_adj"), col("theta"),
        col("var_reduction"))
  }

  /** Isotonic (monotone non-decreasing) calibration of a score against a
    * binary outcome, on an equal-width score grid — the PAV-fit
    * reliability mapping (Zadrozny & Elkan, KDD 2002) that turns a raw
    * classifier score into a calibrated probability.
    *
    * The pool-adjacent-violators solution is computed through its minimax
    * characterization (Robertson–Wright–Dykstra 1988, §1.4): over the
    * binned curve, fit_b = max_{i≤b} min_{j≥b} rate(i..j) where rate(i..j)
    * is the pooled positive rate of bins i..j — pure integer-ratio
    * arithmetic (one division per (i,j) pair from exact BIGINT pooled
    * counts), so both engines produce bit-identical doubles and the
    * min/max lattice is order-free. Bin fences are broadcast min/max;
    * empty bins are absent (PAV pools over occupied bins).
    *
    * Scale shape: ONE full-data hash aggregate to ≤`bins` rows; the
    * minimax runs on the bins-sized frame (≤ bins³ tiny rows, broadcast
    * joins) — corpus-size-independent after the first pass. Emits one row
    * per occupied bin: (bin, n, pos, raw_rate, iso_rate) at 6 dp,
    * iso_rate monotone in bin (StatsSpec property). */
  def isotonicCalibration(df: DataFrame, score: String, label: String,
                          bins: Int = 16): DataFrame = {
    val base = df.filter(col(score).isNotNull && col(label).isNotNull)
    val s = col(score).cast("double")
    val ext = base.agg(min(s).as("_lo"), max(s).as("_hi"))
      .withColumn("_w", (col("_hi") - col("_lo")) / bins)
    val binned = base.crossJoin(broadcast(ext))
      .withColumn("bin", when(col("_w") === 0, lit(0L))
        .otherwise(least(floor((s - col("_lo")) / col("_w")),
          lit(bins - 1L))))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col(label).cast("long")).as("pos"))
    // minimax PAV over the occupied-bins frame: every frame below is
    // bins-sized — broadcast self-joins, no data-sized shuffle
    val bi = binned.select(col("bin").as("_i"))
    val bj = binned.select(col("bin").as("_j"))
    val mem = binned.select(col("bin").as("_b"), col("n").as("_bn"),
      col("pos").as("_bp"))
    val pair = broadcast(bi).crossJoin(broadcast(bj))
      .filter(col("_i") <= col("_j"))
      .join(broadcast(mem),
        col("_b") >= col("_i") && col("_b") <= col("_j"))
      .groupBy(col("_i"), col("_j"))
      .agg((sum(col("_bp")).cast("double") /
        sum(col("_bn")).cast("double")).as("_rate"))
    val fit = broadcast(binned.select(col("bin")))
      .join(broadcast(pair),
        col("_i") <= col("bin") && col("_j") >= col("bin"))
      .groupBy(col("bin"), col("_i"))
      .agg(min(col("_rate")).as("_mn"))
      .groupBy(col("bin"))
      .agg(max(col("_mn")).as("_fit"))
    binned.join(broadcast(fit), Seq("bin"))
      .withColumn("raw_rate",
        round(col("pos").cast("double") / col("n"), 6))
      .withColumn("iso_rate", round(col("_fit"), 6))
      .select("bin", "n", "pos", "raw_rate", "iso_rate")
  }

  /** Mutual information between two categorical columns, with the
    * marginal entropies and the geometric-mean-normalized NMI
    * (Strehl & Ghosh, JMLR 2002) — the "does source predict language /
    * does domain predict quality bucket" dependence readout a curation
    * pipeline wants before stratifying on a column.
    *
    * MI = Σ_xy (n_xy/N)·ln(N·n_xy/(n_x·n_y)), H(X) = −Σ_x (n_x/N)·
    * ln(n_x/N); NMI = MI/√(H(X)·H(Y)), NULL when either entropy is 0
    * (a constant column carries no information to normalize by).
    *
    * Scale shape: ONE corpus hash-aggregate to the (x, y) contingency
    * cells; margins, N, and every log term ride the cells frame, which
    * is |X|·|Y|-bounded (categorical contract) — margin joins broadcast.
    * Per-cell and per-margin terms quantize to DECIMAL(28,12) before
    * their sums, each log argument one pinned double expression, so the
    * oracle replays bit-for-bit. Emits one row:
    * (n, mi, h_x, h_y, nmi) at 6 dp. */
  def mutualInfo(df: DataFrame, x: String, y: String): DataFrame = {
    val cells = df.filter(col(x).isNotNull && col(y).isNotNull)
      .groupBy(col(x).as("_x"), col(y).as("_y"))
      .agg(count(lit(1)).as("_nxy"))
      .transform(graft.ops.Checkpoint.cut(_, eager = true))
    val mx = cells.groupBy("_x").agg(sum("_nxy").as("_nx"))
    val my = cells.groupBy("_y").agg(sum("_nxy").as("_ny"))
    val nn = cells.agg(sum("_nxy").as("_n"))
    val dN = col("_n").cast("double")
    val mi = cells
      .join(broadcast(mx), "_x").join(broadcast(my), "_y")
      .crossJoin(broadcast(nn))
      .select(((col("_nxy").cast("double") / dN) *
        log((col("_nxy").cast("double") * dN) /
          (col("_nx").cast("double") * col("_ny").cast("double"))))
        .cast("decimal(28,12)").as("_t"))
      .agg(sum(col("_t")).cast("double").as("_mi"))
    def entropy(m: DataFrame, c: String) = m.crossJoin(broadcast(nn))
      .select((negate(col(c).cast("double") / dN) *
        log(col(c).cast("double") / dN)).cast("decimal(28,12)").as("_t"))
      .agg(sum(col("_t")).cast("double").as(s"_h$c"))
    mi.crossJoin(broadcast(entropy(mx, "_nx")))
      .crossJoin(broadcast(entropy(my, "_ny")))
      .crossJoin(broadcast(nn))
      .select(col("_n").as("n"), round(col("_mi"), 6).as("mi"),
        round(col("_h_nx"), 6).as("h_x"), round(col("_h_ny"), 6).as("h_y"),
        round(when(col("_h_nx") > 0 && col("_h_ny") > 0,
          col("_mi") / sqrt(col("_h_nx") * col("_h_ny"))), 6).as("nmi"))
  }

  /** The prime modulus of the bootstrap's per-row draw family (the
    * largest prime below 2²⁰) and the cumulative Poisson(1) CDF scaled
    * to it as INTEGER thresholds — the resample weight is the first k
    * whose threshold exceeds the draw (tail collapsed to 9). Integer
    * compares only: no float parsing anywhere near the draw, so any
    * engine replays the weights exactly. */
  private val PoissonMod = 1048573L
  private val PoissonCuts = Seq(385748L, 771496L, 964371L, 1028662L,
    1044735L, 1047949L, 1048485L, 1048562L, 1048571L)

  /** Poisson bootstrap confidence interval for the per-group mean
    * (Chamandy et al., Google 2012; Hanley & MacGibbon 2006): resample r
    * weights each row by an independent Poisson(1) count — for large n
    * this is the multinomial bootstrap without needing n up front, which
    * is what makes the bootstrap ONE-PASS at cluster scale (no
    * per-resample data copies, no sampling coordination). The weights
    * are deterministic and CHEAP: one portable md5 per row seeds a
    * Carter–Wegman linear family u_r = (s₀ + r·s₁) mod p over the prime
    * p = [[PoissonMod]] — pairwise-independent uniform draws across
    * resamples from pure ≤2²⁶ integer arithmetic (no overflow in any
    * engine), compared against [[PoissonCuts]]. The hex→int conversion
    * runs ONCE per row, not per resample — measured ~9× cheaper at
    * reps = 64 than hashing every (row, rep) pair.
    *
    * Scale shape: the reps-way fan-out feeds a map-side-combined
    * aggregate keyed (group, rep) — the shuffle is |groups|·reps rows,
    * never data-sized; the quantile of the resample means is an ordered
    * window over reps rows per group. Resample sums quantize each term
    * to DECIMAL(28,6) (value·small-int weight is exact there), the mean
    * is one pinned division. CI rank indexes use pure integer ceil
    * arithmetic k = ⌈m·perMille/1000⌉ over the NON-EMPTY resample count
    * m (an all-zero-weight resample estimates nothing and is dropped —
    * only possible for tiny groups). Emits per group: (keys, n, mean,
    * ci_lo, ci_hi, n_resamples) at 6 dp. */
  def bootstrapCi(df: DataFrame, id: String, value: String,
                  keys: Seq[String], reps: Int = 64, loPerMille: Int = 25,
                  hiPerMille: Int = 975): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(reps >= 2 && loPerMille >= 1 && hiPerMille <= 1000 &&
      loPerMille < hiPerMille, s"bad bootstrap params ($reps, $loPerMille, $hiPerMille)")
    val k = keys.map(col)
    val base = df.select(k :+ col(id).cast("string").as("_id") :+
      col(value).cast("double").as("_x"): _*)
    // seed once per row (md5 + one hex→int conversion), then the r-th
    // draw is (s0 + r·s1) mod p — products stay < 2²⁶, exact in BIGINT
    val h = graft.text.TextOps.h64(concat(col("_id"), lit(":bs")))
    val s0 = pmod(h, lit(PoissonMod))
    val s1 = lit(1L) + pmod(expr("_h DIV 1048576"), lit(PoissonMod - 1))
    val hm = col("_hm")
    val w = PoissonCuts.zipWithIndex.reverse.foldLeft(lit(9L): Column) {
      case (acc, (c, i)) => when(hm < c, lit(i.toLong)).otherwise(acc)
    }
    // fan out by exploding sequence(0, reps−1) and computing the r-th draw
    // AFTER the explode — one pmod per output row. Building a reps-wide
    // array of per-r pmod expressions instead (the previous shape) costs
    // ~3× more per input row and a reps× bigger expression tree (measured
    // 6.4 → 2.2 s on the q289 scan at reps = 64); the draw values are
    // identical: position r's value IS pmod(s0 + r·s1, p) either way.
    val res = base
      .withColumn("_h", h).withColumn("_s0", s0).withColumn("_s1", s1)
      .select(k ++ Seq(col("_x"), col("_s0"), col("_s1"),
        posexplode(expr(s"sequence(0L, ${reps - 1}L)"))
          .as(Seq("_rep", "_r"))): _*)
      .withColumn("_hm",
        pmod(col("_s0") + col("_r") * col("_s1"), lit(PoissonMod)))
      .withColumn("_w", w)
      .groupBy(k :+ col("_rep"): _*)
      .agg(sum((col("_w") * col("_x")).cast("decimal(28,6)")).as("_sv"),
        sum(col("_w")).as("_wn"))
      .filter(col("_wn") > 0)
      .withColumn("_mean", col("_sv").cast("double") / col("_wn"))
    val wRk = Window.partitionBy(k: _*)
      .orderBy(col("_mean").asc, col("_rep").asc)
    val wAll = Window.partitionBy(k: _*)
    val ranked = res
      .withColumn("_rn", row_number().over(wRk))
      .withColumn("_m", count(lit(1)).over(wAll))
      .withColumn("_klo",
        expr(s"CAST((_m * $loPerMille + 999) DIV 1000 AS BIGINT)"))
      .withColumn("_khi",
        expr(s"CAST((_m * $hiPerMille + 999) DIV 1000 AS BIGINT)"))
    val ci = ranked.groupBy(k: _*)
      .agg(max(when(col("_rn") === col("_klo"), col("_mean"))).as("_lo"),
        max(when(col("_rn") === col("_khi"), col("_mean"))).as("_hi"),
        max(col("_m")).as("n_resamples"))
    val full = base.groupBy(k: _*)
      .agg(count(lit(1)).as("n"),
        (sum(col("_x").cast("decimal(28,6)")).cast("double") /
          count(lit(1))).as("_mean"))
    njoin(full, ci, keys)
      .select(k ++ Seq(col("n"), round(col("_mean"), 6).as("mean"),
        round(col("_lo"), 6).as("ci_lo"), round(col("_hi"), 6).as("ci_hi"),
        col("n_resamples")): _*)
  }

  /** Decile lift-and-gains table for a score against a binary label —
    * the campaign-targeting readout ("the top decile captures X% of all
    * conversions at Y× the base rate"). Rows rank by score DESCENDING;
    * a distinct score value lands entirely in the decile its cumulative
    * row count ends in (d = ⌈10·cum_n/N⌉, pure integer arithmetic), so
    * value ties never straddle deciles non-deterministically.
    *
    * Scale shape: per-distinct-value counts then [[binnedPrefix]]
    * descending cumulatives — the rocPr contract, never a raw-row rank
    * window. Everything after rides the distinct-value frame. Emits one
    * row per non-empty decile: (decile, n, n_pos, cum_pos, gain =
    * cum_pos/P, lift = decile rate / base rate) at 6 dp. */
  def liftGains(df: DataFrame, score: String, label: String,
                keys: Seq[String]): DataFrame = {
    val k = keys.map(col)
    val base = df.filter(col(score).isNotNull && col(label).isNotNull)
    val perValue = base.groupBy(k :+ col(score).as("_v"): _*)
      .agg(count(lit(1)).as("_c"),
        count(when(col(label) === 1, 1)).as("_p"))
    val pre = binnedPrefix(perValue, keys, "_v", Seq("_c", "_p"),
      descending = true, totals = true)
    val dec = pre
      .withColumn("decile",
        expr("CAST((10 * _c_cum + _c_tot - 1) DIV _c_tot AS BIGINT)"))
      .groupBy(k :+ col("decile"): _*)
      .agg(sum(col("_c")).as("n"), sum(col("_p")).as("n_pos"),
        max(col("_p_cum")).as("cum_pos"), max(col("_p_tot")).as("_ptot"),
        max(col("_c_tot")).as("_ctot"))
    dec.select(k ++ Seq(col("decile"), col("n"), col("n_pos"),
      col("cum_pos"),
      round(when(col("_ptot") > 0,
        col("cum_pos").cast("double") / col("_ptot")), 6).as("gain"),
      round(when(col("_ptot") > 0,
        (col("n_pos").cast("double") / col("n")) /
          (col("_ptot").cast("double") / col("_ctot"))), 6).as("lift")): _*)
  }

  /** DDSketch relative-error quantile sketch (Masson, Rim & Lee, VLDB
    * 2019): bucket(x) = ⌈ln x / ln γ⌉ with γ = (1+α)/(1−α), so every
    * estimate 2γᵇ/(γ+1) is within relative error α of the true quantile
    * — the mergeable quantile summary a 100 TB metrics pipeline actually
    * ships (bucket counts ADD across partitions/days/shards, unlike any
    * rank-based exact quantile). Deterministic end-to-end: no sampling,
    * no ordering sensitivity, so the whole sketch AND its quantile reads
    * hash-check against the oracle — rare among quantile sketches
    * (t-digest and GK are merge-order-dependent). Positive-domain store
    * (the standard DDSketch store); ≤ 0 values are excluded.
    *
    * α arrives as per-mille (`alphaPm`) and quantiles as per-mille
    * (`qPm`), so rank cutoffs are pure integer ⌈n·q/1000⌉ arithmetic —
    * never a float·count ceil. The γ-constants are computed once in
    * Scala and INLINED into both engines' expressions as decimal
    * literals, so libm-vs-JVM log differences can only enter through
    * per-row ln(x) (a 1-ulp bucket flip needs the ratio within 1 ulp of
    * an integer — measure-zero on real data).
    *
    * Scale shape: one hash-aggregate to (keys, bucket) counts — the
    * sketch itself, log-range-bounded (~⌈ln(max/min)/ln γ⌉ rows per
    * key) — then cumulative windows over that bounded frame. Emits per
    * key: (keys, n, n_buckets, p<q> for each requested quantile) at
    * 6 dp. */
  def ddSketch(df: DataFrame, value: String, keys: Seq[String],
               alphaPm: Int = 10, qPm: Seq[Int] = Seq(500, 950, 990)): DataFrame =
    ddSketchRead(ddSketchBuckets(df, value, keys, alphaPm), keys,
      alphaPm, qPm)

  /** The DDSketch additive sufficient statistic on its own: per-key
    * log-bucket counts (keys, _b, _c). Bucket counts ADD across any
    * partition of the data — sketch(A ∪ B) = sketch(A) ⊕ sketch(B)
    * counter-for-counter ([[ddSketchMerge]]) — which is what makes the
    * sketch maintainable (per-day/per-batch increments summed at read
    * time, the [[graft.streaming.StreamingSketch]] contract) without
    * ever reordering or resampling anything. */
  def ddSketchBuckets(df: DataFrame, value: String, keys: Seq[String],
                      alphaPm: Int = 10): DataFrame = {
    require(alphaPm >= 1 && alphaPm < 1000, s"bad ddSketch alpha $alphaPm")
    val k = keys.map(col)
    val gamma = (1000.0 + alphaPm) / (1000.0 - alphaPm)
    val lnG = math.log(gamma)
    df.filter(col(value) > 0)
      .select(k :+ ceil(log(col(value).cast("double")) / lit(lnG))
        .cast("long").as("_b"): _*)
      .groupBy(k :+ col("_b"): _*).agg(count(lit(1)).as("_c"))
  }

  /** Merge bucket frames produced by [[ddSketchBuckets]] with the same
    * (keys, α): one integer counter sum — exact by additivity, the
    * result is bit-identical to sketching the concatenated inputs. */
  def ddSketchMerge(sketches: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(sketches.nonEmpty, "no sketches to merge")
    sketches.map(_.select((keys.map(col) :+ col("_b") :+ col("_c")): _*))
      .reduce(_.unionByName(_))
      .groupBy((keys.map(col) :+ col("_b")): _*)
      .agg(sum(col("_c")).as("_c"))
  }

  /** Quantile readout over a (keys, _b, _c) bucket frame — the other
    * half of [[ddSketch]], split out so maintained/merged sketches read
    * through the same cumulative-rank arithmetic. The frame is
    * log-range-bounded per key, so the windows here are sketch-sized,
    * never data-sized. */
  def ddSketchRead(sk: DataFrame, keys: Seq[String], alphaPm: Int = 10,
                   qPm: Seq[Int] = Seq(500, 950, 990)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(alphaPm >= 1 && alphaPm < 1000 && qPm.nonEmpty &&
      qPm.forall(q => q >= 1 && q <= 999), s"bad ddSketch params")
    val k = keys.map(col)
    val gamma = (1000.0 + alphaPm) / (1000.0 - alphaPm)
    val gp1 = gamma + 1.0
    val wCum = Window.partitionBy(k: _*).orderBy(col("_b").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(k: _*)
    val est = sk
      .withColumn("_cum", sum(col("_c")).over(wCum))
      .withColumn("_n", sum(col("_c")).over(wAll))
      .withColumn("_e", round(lit(2.0) * pow(lit(gamma), col("_b")) /
        lit(gp1), 6))
    val qCols = qPm.flatMap { q =>
      val kq = expr(s"CAST((_n * $q + 999) DIV 1000 AS BIGINT)")
      Seq(min(when(col("_cum") >= kq, col("_e")))
        .as(s"p${if (q % 10 == 0) (q / 10).toString else s"0$q"}"))
    }
    est.groupBy(k: _*)
      .agg(max(col("_n")).as("n"),
        (count(lit(1)).as("n_buckets") +: qCols): _*)
  }

  /** The exact decimal literal rendering of [[ddSketch]]'s γ-constants
    * for the oracle SQL — the SAME Scala doubles, round-tripped through
    * their shortest string repr (CAST('…' AS DOUBLE) parses
    * correctly-rounded in any engine). */
  def ddSketchConsts(alphaPm: Int): (String, String, String) = {
    val gamma = (1000.0 + alphaPm) / (1000.0 - alphaPm)
    (math.log(gamma).toString, gamma.toString, (gamma + 1.0).toString)
  }

  /** Covariate-balance check for a two-group assignment: per covariate,
    * the standardized mean difference SMD = (mean_A − mean_B) /
    * √((var_A + var_B)/2) (Austin, Stat Med 2009 conventions — |SMD| <
    * 0.1 is the usual "balanced" bar). This is the pre-experiment health
    * gate an A/B readout (q274/q285) should pass before anyone trusts
    * the effect estimate.
    *
    * One aggregate pass computes exact conditional moments per group
    * (Σx, Σx² quantized to DECIMAL(28,6) per term — value·value runs in
    * double then quantizes, the q285 sufficient-statistic contract), so
    * the variance is one pinned double expression in any engine. Emits
    * one row per covariate: (covariate, n_a, n_b, mean_a, mean_b, smd)
    * at 6 dp; smd NULL when the pooled variance is 0. */
  def smdBalance(df: DataFrame, group: Column,
                 covariates: Seq[String]): DataFrame = {
    require(covariates.nonEmpty, "need at least one covariate")
    val g = group.cast("int")
    val aggCols: Seq[Column] =
      Seq(sum(g).as("_na"), sum(lit(1) - g).as("_nb")) ++
        covariates.flatMap(c => Seq(
          sum(when(g === 1, col(c).cast("double")).otherwise(lit(0.0))
            .cast("decimal(28,6)")).as(s"_sa_$c"),
          sum(when(g === 1, col(c).cast("double") * col(c).cast("double"))
            .otherwise(lit(0.0)).cast("decimal(28,6)")).as(s"_qa_$c"),
          sum(when(g === 0, col(c).cast("double")).otherwise(lit(0.0))
            .cast("decimal(28,6)")).as(s"_sb_$c"),
          sum(when(g === 0, col(c).cast("double") * col(c).cast("double"))
            .otherwise(lit(0.0)).cast("decimal(28,6)")).as(s"_qb_$c")))
    val agg = df.agg(aggCols.head, aggCols.tail: _*)
      // one corpus pass: the 1-row moment frame feeds |covariates|
      // selects below — materialize it so they don't re-scan
      .transform(graft.ops.Checkpoint.cut(_, eager = true))
    val rows = covariates.map { c =>
      def v(side: String) = {
        val s = col(s"_s$side" + s"_$c").cast("double")
        val q = col(s"_q$side" + s"_$c").cast("double")
        val n = col(s"_n$side")
        when(n > 1, (q - s * s / n) / (n - 1))
      }
      val ma = col(s"_sa_$c").cast("double") / col("_na")
      val mb = col(s"_sb_$c").cast("double") / col("_nb")
      val pooled = (v("a") + v("b")) / 2.0
      agg.select(lit(c).as("covariate"),
        col("_na").as("n_a"), col("_nb").as("n_b"),
        round(ma, 6).as("mean_a"), round(mb, 6).as("mean_b"),
        round(when(pooled > 0, (ma - mb) / sqrt(pooled)), 6).as("smd"))
    }
    rows.reduce(_ unionByName _)
  }

  /** Mann–Kendall trend test (Mann 1945; Kendall 1975) with the
    * tie-corrected normal approximation, plus the Theil–Sen slope
    * (Theil 1950; Sen 1968) — the robust "is this series trending, and
    * how fast" pair for monotone-trend monitoring. S = Σ_{i<j}
    * sgn(y_j − y_i); Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]/18 over
    * tie groups t of y; z applies the ±1 continuity correction. The Sen
    * slope is the exact median of the pairwise slopes (y_j−y_i)/(t_j−t_i)
    * over pairs with distinct t.
    *
    * Scale contract: the input must be a per-group series whose length
    * is CALENDAR-BOUNDED (monthly/daily aggregates — the KM duration-
    * axis rule), because the pair fan-out is n² per group: bounded n
    * makes the within-group self-join a constant-factor map-side
    * operation at any corpus size, and the per-group slope-median
    * window sorts ≤ n²/2 rows. S and the tie/variance terms are pure
    * integers (cross-engine exact); each slope is one pinned division;
    * the even-count median midpoint is one pinned (a+b)/2.0. Emits per
    * group: (keys, n, s_stat, var_s, z, sen_slope), stats at 6 dp. */
  def trendTest(df: DataFrame, keys: Seq[String], t: String,
                y: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = keys.map(col)
    val a = df.select(k :+ col(t).cast("double").as("_t1") :+
      col(y).cast("double").as("_y1"): _*)
    val b = df.select(k :+ col(t).cast("double").as("_t2") :+
      col(y).cast("double").as("_y2"): _*)
    val pairs = njoin(a, b, keys).filter(col("_t1") < col("_t2"))
    val sStat = pairs.groupBy(k: _*)
      .agg(sum(signum(col("_y2") - col("_y1")).cast("long")).as("s_stat"))
    val nRows = df.groupBy(k: _*).agg(count(lit(1)).as("n"))
    val ties = df.groupBy(k :+ col(y).as("_yv"): _*)
      .agg(count(lit(1)).as("_tc"))
      .groupBy(k: _*)
      .agg(sum(col("_tc") * (col("_tc") - 1) * (lit(2) * col("_tc") + 5))
        .as("_tie"))
    val slopes = pairs.filter(col("_t2") =!= col("_t1"))
      .withColumn("_sl", (col("_y2") - col("_y1")) / (col("_t2") - col("_t1")))
    val wRk = Window.partitionBy(k: _*).orderBy(col("_sl").asc)
    val wAll = Window.partitionBy(k: _*)
    val sen = slopes
      .withColumn("_rn", row_number().over(wRk))
      .withColumn("_m", count(lit(1)).over(wAll))
      .filter(col("_rn") * 2 === col("_m") ||
        col("_rn") * 2 === col("_m") + 2 || col("_rn") * 2 === col("_m") + 1)
      .groupBy(k: _*)
      .agg(((min(col("_sl")) + max(col("_sl"))) / 2.0).as("_sen"))
    njoin(njoin(njoin(nRows, sStat, keys), ties, keys), sen, keys)
      .withColumn("_vs",
        ((col("n") * (col("n") - 1) * (lit(2) * col("n") + 5) - col("_tie"))
          .cast("double") / 18.0))
      .select(k ++ Seq(col("n"), col("s_stat"),
        round(col("_vs"), 6).as("var_s"),
        round(when(col("_vs") > 0,
          when(col("s_stat") > 0,
            (col("s_stat") - 1).cast("double") / sqrt(col("_vs")))
            .when(col("s_stat") < 0,
              (col("s_stat") + 1).cast("double") / sqrt(col("_vs")))
            .otherwise(lit(0.0))), 6).as("z"),
        round(col("_sen"), 6).as("sen_slope")): _*)
  }
}
