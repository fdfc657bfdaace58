package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage 1 — cleaning (reference: preprocess_function/main.py).
  *
  * Per source: coerce timestamps (`errors="coerce"` ≙ to_timestamp's
  * NULL-on-failure), whole-row dedup, drop-null rows — plus the struct
  * flatten the reference performs implicitly between preprocess and
  * integrate (SURVEY.md §1.3 "load-bearing assumption"): `data.*` is lifted
  * to top-level columns here, explicitly.
  *
  * Scale: all steps are narrow per-row transforms except dropDuplicates —
  * a hash aggregate on the full row, which Spark executes with map-side
  * partial dedup before the shuffle.
  */
object Preprocess {

  /** Parse a string timestamp column with coerce semantics (F4):
    * pandas `errors="coerce"` → NULL on parse failure. Under Spark 4's
    * default ANSI mode plain to_timestamp THROWS on malformed input, so
    * coerce semantics require try_to_timestamp. */
  def coerceTimestamp(df: DataFrame, c: String): DataFrame =
    df.withColumn(c, try_to_timestamp(col(c)))

  /** Flatten the nested `data` struct into top-level columns (F16; the
    * reference relies on this implicitly — integrate/main.py:61,79 reads
    * `c`/`symbol` flat while preprocess stored the nested dict). */
  def flattenDoc(df: DataFrame): DataFrame = {
    val others = df.columns.filterNot(_ == "data").map(col)
    df.select(others :+ col("data.*"): _*)
  }

  /** Clean one document collection: flatten (if nested), dedup, dropna
    * (preprocess_function/main.py:10-15 and siblings). `dropNaSubset`
    * restricts the null check (pandas dropna() drops any-null rows; for
    * sources with legitimately-null optional fields pass the required ones).
    */
  def clean(df: DataFrame, dropNaSubset: Seq[String] = Nil): DataFrame = {
    val flat = if (df.columns.contains("data")) flattenDoc(df) else df
    val deduped = flat.dropDuplicates()
    if (dropNaSubset.isEmpty) deduped.na.drop("any")
    else deduped.na.drop("any", dropNaSubset)
  }

  /** Conditional sink (S5): write only when non-empty — `head(1)` instead of
    * `count()` so the emptiness probe reads one partition, not the table. */
  def writeIfNonEmpty(df: DataFrame, path: String): Boolean = {
    val nonEmpty = df.head(1).nonEmpty
    if (nonEmpty) df.write.mode("overwrite").parquet(path)
    nonEmpty
  }
}
