package graft
import org.apache.spark.sql.SparkSession
/** Local smoke main mirroring the driver's t1 check: entry() returns rows>0. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(s)
    println(s"ENTRY rows=${df.count()} cols=${df.columns.mkString(",")}")
    s.stop()
  }
}
