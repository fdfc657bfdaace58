package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S3/S4 — headered CSV sink + schema-on-read source (the reference's
  * interchange format: preprocess_function/main.py:49-52 writes headered CSV,
  * integrate/main.py:9-14 reads it back with date parsing).
  *
  * The timestamp format is pinned (second precision by default, no zone
  * suffix) so the written text is portable: Spark's default CSV timestamp
  * format emits a zone marker that other readers sniff as TIMESTAMPTZ.
  * Distributed: write emits one part file per partition; read is a normal
  * splittable scan with an explicit schema (no inference pass over the data,
  * which at 100 TB would double the read).
  */
object Csv {

  val DefaultTsFormat = "yyyy-MM-dd HH:mm:ss"

  /** Headered CSV write (S3). */
  def write(df: DataFrame, path: String,
            tsFormat: String = DefaultTsFormat): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("timestampFormat", tsFormat)
      .csv(path)

  /** Headered CSV read with explicit schema + timestamp parse (S4). Pass the
    * DDL schema string; inference is deliberately not offered. */
  def read(spark: SparkSession, path: String, ddlSchema: String,
           tsFormat: String = DefaultTsFormat): DataFrame =
    spark.read
      .option("header", "true")
      .option("timestampFormat", tsFormat)
      .schema(ddlSchema)
      .csv(path)
}
