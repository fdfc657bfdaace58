package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch debug main: time a subset of SparkEntry queries with Bench's
  * methodology (warmup + min-of-2). Args: sfDir query1 [query2 ...]. */
object DebugBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.Tables.NanosAsLongKey, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").count()
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n =>
      val t = math.min(once(n), once(n))
      println(f"BENCH $n%-24s $t%8.3f s")
    }
    spark.stop()
  }
}
