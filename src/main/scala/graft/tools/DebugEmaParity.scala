package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: count rows where emaSeriesChunked's quantized value differs
  * from emaSeries's (the q157 oracle hash needs exact agreement). */
object DebugEmaParity {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.Tables.NanosAsLongKey, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (d <- args) {
      val ev = graft.Tables.events(spark, d)
      val a = graft.analytics.Indicators.emaSeries(ev, "value",
        Seq("user_id"), "ts", alpha = 0.25, carry = Seq("event_id"))
        .select(col("event_id"), col("ema").as("ema_a"))
      for (cl <- Seq(8, 12, 16, 24, 32)) {
        val b = graft.analytics.Indicators.emaSeriesChunked(ev, "value",
          Seq("user_id"), "ts", alpha = 0.25, chunkLen = cl,
          carry = Seq("event_id"))
          .select(col("event_id"), col("ema").as("ema_b"))
        val j = a.join(b, "event_id")
        val n = j.count()
        val diff = j.filter(col("ema_a") =!= col("ema_b")).count()
        val maxd = j.agg(max(abs(col("ema_a") - col("ema_b")))).head().getDouble(0)
        println(s"PARITY $d chunkLen=$cl rows=$n mismatched_quant6=$diff max_abs_diff=$maxd")
      }
    }
    spark.stop()
  }
}
