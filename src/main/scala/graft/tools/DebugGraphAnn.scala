package graft.tools

import graft.sim.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: graph-ANN recall vs brute truth across parameter combos. */
object DebugGraphAnn {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val qs = e.filter(col("vec_id") < 10)
    val truth = Similarity.knnBrute(e, qs, "vec_id", "embedding", 5).cache()
    truth.count()
    def rec(got: org.apache.spark.sql.DataFrame): Double =
      got.join(truth, Seq("q_id", "vec_id")).count().toDouble / truth.count()
    println(f"GANN baseline annLsh recall=${rec(
      Similarity.annLsh(e, qs, "vec_id", "embedding", 5, 8, 64))}%.2f")
    println(f"GANN baseline multiprobe recall=${rec(
      Similarity.annLshMultiProbe(e, qs, "vec_id", "embedding", 5, 8, 64))}%.2f")
    for ((deg, beam, rounds, ents) <- Seq(
        (6, 12, 3, 8), (12, 24, 3, 8), (12, 24, 6, 16))) {
      val got = Similarity.annGraph(e, qs, "vec_id", "embedding", dim = 64,
        k = 5, beam = beam, rounds = rounds, nEntries = ents, degree = deg)
      println(f"GANN deg=$deg%2d beam=$beam%2d rounds=$rounds%2d ents=$ents%2d recall=${rec(got)}%.2f")
    }
    spark.stop()
  }
}
