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
    * lossless and matches DuckDB's naive read of the same file. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val raw = t(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => // nanos-as-long: truncate to micros (driver data is micro-aligned)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
