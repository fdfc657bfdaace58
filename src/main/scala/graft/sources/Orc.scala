package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Columnar ORC sink + source — the second columnar interchange format next
  * to parquet (Spark's ORC support is native and vectorized; an engine
  * swap-in for the reference's pipeline must read whichever columnar format
  * the lake already holds). Same splittable-scan / predicate-pushdown
  * properties as parquet: filters and column pruning reach the ORC reader
  * (`spark.sql.orc.filterPushdown` is on by default in Spark 4).
  */
object Orc {

  /** ORC write (snappy, Spark default). One part file per partition. */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** ORC read with explicit schema (skips footer-merge schema resolution
    * across many files — at 100 TB file listings are big enough that
    * schema-on-read should be declared, not discovered). */
  def read(spark: SparkSession, path: String, ddlSchema: String): DataFrame =
    spark.read.schema(ddlSchema).orc(path)
}
