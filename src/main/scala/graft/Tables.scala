package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All engine queries take a scale-factor directory and read parquet from it;
  * parquet (columnar, statistics-bearing) is the at-rest format the engine
  * standardizes on (reference used CSV-on-GCS — see SURVEY.md §2.1 S3/S4).
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame   = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  /** The events parquet's `ts` physical type has varied across driver data
    * generations: TIMESTAMP(NANOS) (pandas datetime64[ns], which Spark reads
    * as long under spark.sql.legacy.parquet.nanosAsLong), TIMESTAMP(MICROS)
    * isAdjustedToUTC=false (read as TIMESTAMP_NTZ), or a plain UTC
    * timestamp. Normalize all three to session-zone TimestampType — the
    * session is pinned to UTC everywhere, so the NTZ→TZ cast is wall-clock
    * lossless and matches DuckDB's naive read of the same file.
    *
    * Sessions should set `spark.sql.legacy.parquet.nanosAsLong=true` at
    * creation (all graft entry points do — Bench/Verify/specs alongside the
    * UTC pin); it is re-asserted here only as a safety net for external sessions
    * because a NANOS-annotated file cannot be read at all without it.
    * FormatsSpec pins all three branches against written fixtures. */
  def events(s: SparkSession, d: String): DataFrame = {
    // getOption would never be None here — the key is a registered SQLConf
    // with a default of "false" — so test the VALUE (an external session
    // that set it intentionally is respected; an unset one gets the net)
    if (s.conf.get(NanosAsLongKey, "false") != "true")
      s.conf.set(NanosAsLongKey, "true")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    normalizeEventTs(t(s, d, "events"))
  }

  val NanosAsLongKey = "spark.sql.legacy.parquet.nanosAsLong"

  /** The three-branch `ts` normalization behind [[events]], factored out so
    * FormatsSpec can drive it over synthetic fixtures of every physical
    * type the driver has ever generated. The int64 branch guards magnitude
    * (ADVICE r6): a plain int64 storing epoch millis/micros would be
    * silently mis-scaled 1000× by the nanos assumption, so values in the
    * seconds/millis/micros magnitude band for modern instants
    * (10⁹ ≤ |ts| < one year of nanos ≈ 1971) raise instead of guessing.
    * Values BELOW 10⁹ (epoch-adjacent sentinels like 0) pass through —
    * a single legitimate sentinel row must not fail the whole table. */
  private[graft] def normalizeEventTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    raw.schema("ts").dataType match {
      case LongType => // nanos-as-long: truncate to micros (driver data is micro-aligned)
        raw.withColumn("ts", timestamp_micros(expr(
          """CASE WHEN ts IS NOT NULL AND abs(ts) >= 1000000000
            |          AND abs(ts) < 31536000000000000
            |THEN CAST(raise_error(concat('events.ts int64 value ',
            |  CAST(ts AS STRING),
            |  ' is too small to be epoch nanoseconds — millis/micros file?'))
            |  AS BIGINT)
            |ELSE ts div 1000 END""".stripMargin)))
      case _: TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
