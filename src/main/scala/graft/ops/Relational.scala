package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, NumericType}

/** Composable relational operators covering SURVEY.md §2.2–§2.4, §2.6, §2.7.
  *
  * Everything here is a thin declarative composition over the DataFrame API so
  * Catalyst retains full freedom (predicate pushdown, column pruning, join
  * strategy selection, AQE). Nothing materializes on the driver.
  */
object Relational {

  /** Exact-sum cast: aggregating doubles through exact decimals makes the sum
    * independent of partitioning / merge order (decimal addition is exact),
    * which both stabilizes results across cluster sizes and matches any
    * single-threaded oracle bit-for-bit after the final cast back to double.
    * At 100 TB this also means a re-run on a different cluster layout produces
    * the identical answer — a property plain double sums do not have.
    *
    * DECIMAL(18,6) keeps per-row values long-backed ("compact") in Spark's
    * Decimal, so the aggregation path is integer arithmetic, not BigDecimal —
    * ~an order of magnitude faster. Constraint: |value| < 1e12 per row
    * (holds for every column in this engine's catalog); the sum accumulator
    * widens to DECIMAL(28,6) automatically.
    */
  val ExactDec: DecimalType = DecimalType(18, 6)
  def exactSum(c: Column): Column = sum(c.cast(ExactDec)).cast("double")
  def exactAvg(c: Column): Column =
    sum(c.cast(ExactDec)).cast("double") / count(c)

  /** P3 — projection of numeric columns only (reference: select_dtypes,
    * integrate/main.py:115). */
  def numericCols(df: DataFrame): Seq[String] =
    df.schema.fields.collect { case f if f.dataType.isInstanceOf[NumericType] => f.name }.toSeq

  /** P8 — drop columns that are entirely null (reference:
    * dropna(axis=1, how="all"), dashboard/app.py:381). One stats pass, then a
    * driver-side projection decision — the data never leaves executors. */
  def dropAllNullCols(df: DataFrame): DataFrame = {
    val counts = df.select(df.columns.map(c => count(col(c)).as(c)).toSeq: _*).head()
    val keep = df.columns.zipWithIndex.collect { case (c, i) if counts.getLong(i) > 0 => c }
    df.select(keep.map(col).toSeq: _*)
  }

  /** P11 — required-column assertion (reference: analysis_part/main.py:138-141). */
  def requireColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"missing required columns: ${missing.mkString(", ")}")
    df
  }

  /** A2 — distinct non-null values of one key (reference:
    * df["symbol"].dropna().unique(), integrate/main.py:79). */
  def distinctKey(df: DataFrame, c: String): DataFrame =
    df.select(c).na.drop().distinct()

  /** A6 — latest row per group as a single aggregate (max_by on an
    * orderable struct). Note: a struct payload is var-width, so Spark plans
    * SortAggregate rather than HashAggregate — still one pass with partial
    * aggregation before the shuffle (measured equal to per-column max_by,
    * which hits the same fallback for string payloads). Reference:
    * idxmax + loc, dashboard/app.py:173-174. */
  def latestPerGroup(df: DataFrame, keys: Seq[String], ord: Seq[Column], payload: Seq[String]): DataFrame = {
    val packed = df.groupBy(keys.map(col): _*)
      .agg(max_by(struct(payload.map(col): _*), struct(ord: _*)).as("_latest"))
    packed.select(keys.map(col) ++ payload.map(c => col(s"_latest.$c").as(c)): _*)
  }

  /** O2 — global top-k; Spark plans this as TakeOrderedAndProject (per-partition
    * top-k, then a k-row merge on the driver — no global sort even at 100 TB). */
  def topK(df: DataFrame, k: Int, ord: Column*): DataFrame =
    df.orderBy(ord: _*).limit(k)

  /** O4 — bounded enumeration per key (reference: 50-tweet cap,
    * twitter/main.py:15-17). */
  def limitPerGroup(df: DataFrame, n: Int, keys: Seq[String], ord: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= n).drop("_rn")
  }

  /** U1 — n-ary union by name, tolerating per-frame missing columns
    * (reference: pd.concat, integrate/main.py:130-131). */
  def unionByNameAll(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))

  /** Blocked edit-distance self-join (the entity-resolution workhorse):
    * equi-join on cheap blocking keys, then the exact Levenshtein ≤
    * `maxDist` filter WITHIN blocks only — pair space is Σ|block|², never
    * n². Same hot-key discipline as LSH buckets: a blocking key that
    * collapses is one quadratic block, so blocks larger than `maxBlock`
    * are EXCLUDED in code (not just documented) — their rows drop out of
    * pairing exactly like an over-full minhash bucket, and the caller can
    * audit block sizes q90-style to pick better keys. The distance is the
    * codegen'd built-in `levenshtein` — no UDF — and identical in DuckDB,
    * so the q154 oracle value-checks the distances. */
  def fuzzyJoinBlocked(df: DataFrame, id: String, name: String,
                       blockKeys: Seq[String], maxDist: Int,
                       maxBlock: Int = 10000): DataFrame = {
    val sizes = df.groupBy(blockKeys.map(col): _*)
      .agg(count(lit(1)).as("_bn"))
      .filter(col("_bn") <= maxBlock)
      .drop("_bn")
    val bounded = df.join(sizes, blockKeys)
    bounded.as("a").join(bounded.as("b"),
        blockKeys.map(k => col(s"a.$k") === col(s"b.$k")).reduce(_ && _) &&
          col(s"a.$id") < col(s"b.$id"))
      .withColumn("dist",
        levenshtein(col(s"a.$name"), col(s"b.$name")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col(s"a.$id").as("id_a"), col(s"b.$id").as("id_b"),
        col(s"a.$name").as("name_a"), col(s"b.$name").as("name_b"),
        col("dist"))
  }

  /** Skew-safe equi-join: the probe side splits each key across `nSalts`
    * shuffle partitions via a deterministic per-row salt, and the build
    * side replicates `nSalts`× — one hot key's rows spread over nSalts
    * reducers instead of stalling one task, at the cost of an nSalts×
    * larger build side (use for moderate build sides with a skewed probe;
    * AQE's skew-join split handles the sort-merge case, this handles the
    * shuffled-hash/aggregating case it can't). Result ≡ the plain join:
    * every probe row still meets every matching build row exactly once,
    * in exactly one salt bucket. The salt derives from `saltFrom` with the
    * portable `h64`, so the physical row placement itself is deterministic
    * and re-runs are bit-stable — the same contract as salted aggregation
    * (q127) and hash mixing. */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
                 saltFrom: Column, nSalts: Int,
                 joinType: String = "inner"): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    // Right/full outer would emit each unmatched BUILD row nSalts times
    // (the build side is replicated across every salt), breaking the
    // "result ≡ plain join" contract — reject them outright.
    val probeSided = Set("inner", "cross", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti")
    require(probeSided.contains(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin supports probe-sided join types only (got '$joinType'): " +
        "right/full outer joins would duplicate unmatched build rows across salts")
    val p = probe.withColumn("_salt",
      pmod(graft.text.TextOps.h64(saltFrom.cast("string")),
        lit(nSalts.toLong)).cast("int"))
    val b = build.withColumn("_salt",
      explode(lit((0 until nSalts).toArray)))
    p.join(b, keys :+ "_salt", joinType).drop("_salt")
  }

  /** Table profiler: one long-format row per column with null count, exact
    * distinct cardinality, and (numeric columns only) min/max/mean — the
    * data-quality summary a warehouse materializes per ingest. ONE aggregate
    * scan computes every column's stats (the multi-distinct expands to
    * Spark's Expand plan — |cols| passes worth of shuffle bytes but one scan
    * of the table); the single stats row then unpivots via explode, so no
    * per-column jobs and nothing driver-side. Means run through exact
    * decimals; non-numeric columns carry NULL numeric stats. At 100 TB swap
    * `approx_count_distinct` in for the exact distinct if ±2% suffices —
    * same plan shape minus the Expand. */
  def profile(df: DataFrame): DataFrame = {
    val fields = df.schema.fields.toSeq
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      val numeric = f.dataType.isInstanceOf[NumericType]
      Seq(
        count(c).as(s"_nn_${f.name}"),
        countDistinct(c).as(s"_nd_${f.name}")) ++ (if (numeric) Seq(
        min(c).cast("double").as(s"_mn_${f.name}"),
        max(c).cast("double").as(s"_mx_${f.name}"),
        (sum(c.cast("decimal(28,10)")).cast("double") / count(c))
          .as(s"_av_${f.name}")) else Nil)
    } :+ count(lit(1)).as("_rows")
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val entries = fields.map { f =>
      val numeric = f.dataType.isInstanceOf[NumericType]
      struct(
        lit(f.name).as("column"),
        lit(f.dataType.simpleString).as("dtype"),
        col("_rows").as("n_rows"),
        (col("_rows") - col(s"_nn_${f.name}")).as("n_null"),
        col(s"_nd_${f.name}").as("n_distinct"),
        (if (numeric) round(col(s"_mn_${f.name}"), 6)
         else lit(null).cast("double")).as("min_val"),
        (if (numeric) round(col(s"_mx_${f.name}"), 6)
         else lit(null).cast("double")).as("max_val"),
        (if (numeric) round(col(s"_av_${f.name}"), 6)
         else lit(null).cast("double")).as("mean_val"))
    }
    stats.select(explode(array(entries: _*)).as("_p")).select("_p.*")
  }
  /** Snapshot DIFF — the table-versioning primitive every incremental
    * pipeline needs ("what changed between yesterday's load and today's"):
    * full outer join on the key, classify each key as added / removed /
    * changed, and name the columns that differ. Unchanged rows are dropped
    * (the diff of a 100 TB table against itself is empty, not 100 TB).
    * One co-partitioned shuffle join; with both snapshots bucketed on the
    * key the exchange disappears entirely (the CDC-merge shape). Value
    * comparison is NULL-SAFE (`<=>`): NULL→value and value→NULL are
    * changes, NULL→NULL is not. Compared columns = the non-key columns
    * the snapshots SHARE; columns present in only one snapshot are a
    * schema change, out of scope by contract. Output: (keys…,
    * change_type, changed_cols — comma-joined in shared-column order,
    * empty for added/removed). */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   keys: Seq[String]): DataFrame = {
    val shared = oldDf.columns.toSeq.intersect(newDf.columns.toSeq)
      .filterNot(keys.contains)
    val o = oldDf.select((keys ++ shared).map(col): _*)
      .withColumn("_in_old", lit(1))
      .toDF((keys ++ shared.map(c => s"_o_$c") :+ "_in_old"): _*)
    val n = newDf.select((keys ++ shared).map(col): _*)
      .withColumn("_in_new", lit(1))
      .toDF((keys ++ shared.map(c => s"_n_$c") :+ "_in_new"): _*)
    val nR = keys.foldLeft(n)((d, k) => d.withColumnRenamed(k, s"_k_$k"))
    val joined = o.join(nR,
      keys.map(k => col(k) <=> col(s"_k_$k")).reduce(_ && _), "full_outer")
    val keyOut = keys.map(k => coalesce(col(k), col(s"_k_$k")).as(k))
    val diffs = shared.map(c => !(col(s"_o_$c") <=> col(s"_n_$c")))
    val anyDiff = diffs.reduceOption(_ || _).getOrElse(lit(false))
    // concat_ws skips NULLs, so the changed-column list assembles itself
    val changedCols =
      if (shared.isEmpty) lit("")
      else concat_ws(",", shared.zip(diffs).map { case (c, d) =>
        when(d, lit(c)) }: _*)
    joined
      .withColumn("change_type",
        when(col("_in_old").isNull, lit("added"))
          .when(col("_in_new").isNull, lit("removed"))
          .when(anyDiff, lit("changed")))
      .filter(col("change_type").isNotNull)
      .withColumn("changed_cols",
        when(col("change_type") === "changed", changedCols).otherwise(lit("")))
      .select(keyOut :+ col("change_type") :+ col("changed_cols"): _*)
  }
}
