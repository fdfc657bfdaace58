package graft
import org.apache.spark.sql.SparkSession

/** Dev-only single-query timer: `runMain graft.DevTime <sfDir> <regex>` —
  * times each matching catalog query (warmup + 2 timed runs, min reported)
  * under the same session config as [[Bench]]. NOT part of the driver
  * contract; Bench remains the measured artifact. */
object DevTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val re = args(1).r
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.NanosAsLongKey, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => re.findFirstIn(n).isDefined)
    names.foreach { n =>
      def once(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).groupBy().count().collect()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val t = math.min(once(), once())
      println(f"DEVTIME $n%-28s ${t}%8.2f s")
    }
    spark.stop()
  }
}
