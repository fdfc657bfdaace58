package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch debug main: dump one SparkEntry query to parquet for local
  * cross-engine diffing. Not part of the driver contract. */
object DebugDump {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(outDir)
    spark.stop()
  }
}
