package graft.tools

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway probe: does CollectMetrics (observe) complete when the only
  * action on the frame is an eager localCheckpoint? */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(1000).select(col("id"), (col("id") % 7).as("k"))
    val obs = Observation("probe")
    val cut = df.groupBy("k").agg(count(lit(1)).as("n"))
      .observe(obs, count(lit(1)).as("rows"), sum(col("n")).as("total"))
      .localCheckpoint(true)
    // if observe does not fire under localCheckpoint, this blocks forever —
    // bound it
    val t0 = System.nanoTime()
    val r = try {
      scala.concurrent.Await.result(
        scala.concurrent.Future(obs.get)(scala.concurrent.ExecutionContext.global),
        scala.concurrent.duration.Duration(10, "s")).toString
    } catch { case e: Throwable => s"TIMEOUT/${e.getClass.getSimpleName}" }
    println(s"OBSERVE RESULT: $r after ${(System.nanoTime()-t0)/1e9}s")
    println(s"checkpointed rows: ${cut.count()}")
    spark.stop()
  }
}
