package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data mixing operators: deterministic sampling, split assignment,
  * and per-source token budgets — the "data recipe" stage that sits between
  * dedup/quality filtering and tokenization in a large-scale pipeline.
  *
  * Everything keys off the salted portable hash `TextOps.h64(salt:id)`, not
  * `rand()`: results are reproducible across runs, partitionings, and
  * engines (the DuckDB oracles compute the identical hashes), and adding new
  * rows never reshuffles previous decisions — the property that makes
  * incremental corpus refreshes safe. Sampling and splits are pure per-row
  * filters (no shuffle, linear at 100 TB); the budget cap and sequence
  * packing decompose their per-stratum running sums through
  * `Stats.binnedPrefix` (strata are few — a single ordered window per
  * stratum would stream each source's whole corpus in one task).
  */
object Mix {

  private def saltedHash(salt: String, id: String, mod: Int): Column =
    TextOps.h64(concat(lit(salt), col(id).cast("string"))) % mod

  /** Deterministic stratified sampling: keep a row when
    * `h64('smp:'||id) mod 1000 < rate(stratum)·1000`. Per-stratum rates with
    * a default — the standard way to rebalance source mixes (upweight rare
    * domains, downsample boilerplate-heavy ones) without a shuffle. */
  def stratifiedSample(df: DataFrame, id: String, stratum: String,
                       rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
      when(col(stratum) === k, lit(r)).otherwise(acc)
    }
    df.filter(saltedHash("smp:", id, 1000) < rate * 1000)
  }

  /** Weighted sampling without replacement, top-`n` per stratum (Efraimidis
    * & Spirakis A-Res): each row draws u ∈ (0, 1] from its salted id hash
    * and gets priority u^(1/w); the n highest priorities per stratum are a
    * weighted sample without replacement — the quality-weighted "pick the
    * best n docs per source, biased by score but not deterministically
    * top-score" selection a curation pass wants. Deterministic twice over:
    * u comes from the portable h64 (reproducible across runs/engines — the
    * oracle computes identical priorities) and the rank breaks ties by id.
    * One window per stratum, no shuffle beyond it; weights must be > 0. */
  def weightedSample(df: DataFrame, id: String, weight: String,
                     stratum: String, n: Int): DataFrame = {
    val u = (pmod(TextOps.h64(concat(lit("ws:"), col(id).cast("string"))),
      lit(1000000L)) + 1) / lit(1000000.0)
    // top-n per stratum via the two-pass binned selection — strata are
    // FEW (sources), so a per-stratum rank window would sort each
    // stratum's entire corpus in one task at any scale
    graft.ops.Stats.extremeK(
        df.withColumn("_pri", pow(u, lit(1.0) / col(weight).cast("double"))),
        "_pri", Seq(stratum), n, descending = true, tie = Seq(col(id).asc))
      .withColumnRenamed("_rn", "rank")
      .withColumn("priority", round(col("_pri"), 6))
      .drop("_pri")
  }

  /** Deterministic train/val/test assignment by id hash: stable under
    * re-runs and corpus growth (a doc's split never changes when other docs
    * arrive — unlike `randomSplit`). */
  def splitAssign(df: DataFrame, id: String, trainPct: Int = 80,
                  valPct: Int = 10): DataFrame = {
    val h = saltedHash("split:", id, 100)
    df.withColumn("split",
      when(h < trainPct, "train")
        .when(h < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Temperature-weighted source mixing (the multilingual-LM "alpha
    * sampling" recipe): per-stratum sampling weight ∝ (token share)^alpha,
    * normalized. alpha=1 reproduces natural proportions; alpha→0 flattens
    * toward uniform — the knob that keeps low-resource sources represented.
    * `epochs` is how many passes over the stratum the weight implies at the
    * natural corpus size (>1 means upsampling/repeating that source).
    *
    * Determinism: weights are rounded to 6 dp before the normalizing sum,
    * and the sum runs in DECIMAL(18,6) — bit-identical across partition
    * orders and engines. One groupBy on the stratum key; the normalizer is
    * a 1-row broadcast. */
  def temperatureWeights(df: DataFrame, stratum: String, text: String,
                         alpha: Double): DataFrame = {
    val counts = df
      .select(col(stratum), size(TextOps.tokens(col(text))).cast("long").as("_t"))
      .groupBy(col(stratum))
      .agg(count(lit(1)).as("n_docs"), sum(col("_t")).as("n_tokens"))
    val tot = counts.agg(sum(col("n_tokens")).as("_total"))
    val withRaw = counts.crossJoin(broadcast(tot))
      .withColumn("nat_share",
        round(col("n_tokens").cast("double") / col("_total"), 6))
      .withColumn("_raw", round(pow(col("nat_share"), alpha), 6))
    val z = withRaw.agg(
      sum(col("_raw").cast(graft.ops.Relational.ExactDec)).cast("double").as("_z"))
    withRaw.crossJoin(broadcast(z))
      .withColumn("mix_weight", round(col("_raw") / col("_z"), 6))
      .withColumn("epochs", round(col("mix_weight") / col("nat_share"), 6))
      .select(col(stratum), col("n_docs"), col("n_tokens"), col("nat_share"),
        col("mix_weight"), col("epochs"))
  }

  /** Sequence packing: lay each stratum's docs end-to-end in deterministic
    * salted-hash order and cut the token stream at fixed `seqLen`
    * boundaries — the standard pretraining concat-and-split. Emits each
    * doc's token offset in its stratum stream and the first/last
    * training sequence it lands in (`first_bin != last_bin` means the doc
    * straddles a boundary). One window sum per stratum over (id, n_tokens)
    * rows — the text itself never shuffles; the downstream tokenizer join
    * consumes (doc → bin) assignments. */
  def packSequences(df: DataFrame, id: String, stratum: String, text: String,
                    seqLen: Long): DataFrame = {
    stratumHashCumSum(
      df.withColumn("ws_tokens", size(TextOps.tokens(col(text))).cast("long")),
      id, stratum)
      .withColumn("offset", col("_end") - col("ws_tokens"))
      .withColumn("first_bin", floor(col("offset") / seqLen))
      .withColumn("last_bin", floor((col("_end") - 1) / seqLen))
      .select(col(id), col(stratum), col("ws_tokens"), col("offset"),
        col("first_bin"), col("last_bin"))
  }

  /** Per-stratum token budget: order docs by salted hash (a deterministic
    * "random" order), keep docs while the running token total fits `budget`.
    * This is domain capping — bounding any one source's contribution to the
    * training mix. One window sum per stratum; the per-partition state is a
    * single running counter, so it scales to arbitrarily large strata. */
  def tokenBudget(df: DataFrame, id: String, stratum: String, text: String,
                  budget: Long): DataFrame = {
    stratumHashCumSum(
      df.withColumn("ws_tokens", size(TextOps.tokens(col(text))).cast("long")),
      id, stratum)
      .withColumnRenamed("_end", "cum_tokens")
      .filter(col("cum_tokens") <= budget)
  }

  /** Materialize a training mix from per-stratum epoch targets: each doc is
    * emitted floor(epochs) times, plus one more copy for a deterministic
    * per-doc hash fraction of the stratum (so a 1.25-epoch source repeats
    * every doc once and a salted-hash quarter of them twice — expected
    * token mass ∝ epochs, no RNG, stable under corpus growth). Pure per-row
    * explode: zero shuffle; downstream packing (`packSequences`) handles
    * ordering. Epoch values should be exactly representable (.0/.25/.5/.75)
    * so the fractional threshold is engine-portable. */
  def mixMaterialize(df: DataFrame, id: String, stratum: String,
                     epochs: Map[String, Double],
                     defaultEpochs: Double = 1.0): DataFrame = {
    val eff = epochs.foldLeft(lit(defaultEpochs)) { case (acc, (k, v)) =>
      when(col(stratum) === k, lit(v)).otherwise(acc)
    }
    df.withColumn("_eps", eff)
      .withColumn("_rep", floor(col("_eps")).cast("long") +
        when(pmod(TextOps.h64(concat(col(id).cast("string"), lit(":mix"))),
          lit(1000000L)) < (col("_eps") - floor(col("_eps"))) * 1000000,
          lit(1L)).otherwise(lit(0L)))
      .withColumn("copy_idx",
        explode(when(col("_rep") >= 1, sequence(lit(1L), col("_rep")))
          .otherwise(expr("CAST(array() AS ARRAY<BIGINT>)"))))
      .drop("_eps", "_rep")
  }
  /** Inclusive running token sum per stratum in deterministic salted-hash
    * order — the shared engine of [[packSequences]] and [[tokenBudget]],
    * decomposed for scale: strata are FEW (sources), so one ordered
    * window per stratum is a single task streaming the stratum's whole
    * corpus. Instead, per-(stratum, hash) token totals feed
    * `Stats.binnedPrefix` (bounded windows, parallelism = strata × bins)
    * and only the intra-hash tie order (id) runs in a per-value window —
    * hash-collision-group-sized partitions. Long sums are associative,
    * so `_end` is bit-identical to the single-window cumulative. Appends
    * `_end`; requires a `ws_tokens` column. */
  private def stratumHashCumSum(df: DataFrame, id: String,
                                stratum: String): DataFrame = {
    val withH = df.withColumn("_h",
      TextOps.h64(concat(lit("ord:"), col(id).cast("string"))))
    val perValue = withH.groupBy(col(stratum), col("_h"))
      .agg(sum(col("ws_tokens")).as("_vt"))
    val cums = graft.ops.Stats.binnedPrefix(perValue, Seq(stratum), "_h",
        Seq("_vt"), descending = false)
      .select(col(stratum), col("_h"), (col("_vt_cum") - col("_vt")).as("_before"))
    val wTie = Window.partitionBy(col(stratum), col("_h")).orderBy(col(id))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    graft.ops.Stats.njoin(withH, cums, Seq(stratum, "_h"))
      .withColumn("_end", col("_before") + sum(col("ws_tokens")).over(wTie))
      .drop("_h", "_before")
  }

  /** Neyman-allocated stratified sample (Neyman, JRSS 1934): split a
    * fixed `budget` across strata proportionally to N_h·S_h — sampling
    * more where the stratum is big AND internally variable, the
    * minimum-variance allocation for estimating the mean of `value` —
    * then pick each stratum's quota deterministically by salted-hash
    * order. `value` must be integer-typed: the stratum variance comes
    * from EXACT integer power sums (Σx, Σx² in DECIMAL(38,0)), so S_h is
    * one pinned double expression in any engine, never a
    * Welford-vs-textbook stddev drift. Seats are integer floor shares
    * plus largest-remainder apportionment (fraction ties toward the
    * smaller stratum name) — Σ n_h = budget exactly whenever any stratum
    * varies and quotas don't exceed stratum sizes; the degenerate
    * all-constant corpus (every S_h = 0) degrades to one seat per
    * stratum rather than dividing by zero.
    *
    * Scale shape: one stratum-keyed moment aggregate (strata-sized
    * result), allocation windows over the strata frame, then ONE
    * [[graft.ops.Stats.extremeK]] two-pass binned selection for the
    * per-stratum hash-order picks (never a corpus-wide rank window) cut
    * to the allocated quota. Emits (id, stratum, samp_rank, alloc_n). */
  def neymanSample(df: DataFrame, id: String, stratum: String,
                   value: String, budget: Int): DataFrame = {
    import org.apache.spark.sql.functions.{floor => ffloor}
    require(budget >= 1, s"budget $budget < 1")
    val st = df.groupBy(col(stratum)).agg(
      count(lit(1)).as("_n"),
      sum(col(value).cast("decimal(38,0)")).as("_sx"),
      sum((col(value).cast("decimal(38,0)") *
        col(value).cast("decimal(38,0)")).cast("decimal(38,0)")).as("_sx2"))
    // greatest(0, …) mirrors the q303 oracle exactly: for a near-constant
    // stratum with large values the double cancellation can dip slightly
    // negative, and an unclamped sqrt would yield NaN → NULL allocation
    // (stratum silently dropped) while the oracle reports 0
    val sh = st.withColumn("_s",
      when(col("_n") > 1, sqrt(greatest(lit(0.0),
        (col("_sx2").cast("double") -
          col("_sx").cast("double") * col("_sx").cast("double") / col("_n"))
          / (col("_n") - 1)))).otherwise(lit(0.0)))
      .withColumn("_x",
        (col("_n").cast("double") * col("_s")).cast("decimal(28,6)"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val alloc0 = sh
      .withColumn("_tot", sum(col("_x")).over(wAll))
      .withColumn("_w", when(col("_tot") > 0,
        col("_x").cast("double") / col("_tot").cast("double"))
        .otherwise(lit(0.0)))
      .withColumn("_base", ffloor(lit(budget) * col("_w")).cast("long"))
      .withColumn("_frac", lit(budget) * col("_w") - col("_base"))
    val wSeat = Window.orderBy(col("_frac").desc, col(stratum).asc)
    val alloc = alloc0
      .withColumn("_rem", lit(budget.toLong) - sum(col("_base")).over(wAll))
      .withColumn("_seat", row_number().over(wSeat))
      .withColumn("alloc_n",
        col("_base") + when(col("_seat") <= col("_rem"), 1L).otherwise(0L))
      .select(col(stratum), col("alloc_n"))
    val keyed = df.select(col(id), col(stratum))
      .withColumn("_hk", graft.text.TextOps.h64(
        concat(lit("ns:"), col(id).cast("string"))))
    graft.ops.Stats.extremeK(keyed, "_hk", Seq(stratum), budget,
        descending = false, tie = Seq(col(id).asc))
      .join(broadcast(alloc), stratum)
      .filter(col("_rn") <= col("alloc_n"))
      .select(col(id), col(stratum), col("_rn").as("samp_rank"),
        col("alloc_n"))
  }
}
