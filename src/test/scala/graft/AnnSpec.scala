package graft

import graft.sim.Similarity
import org.apache.spark.sql.functions._

/** ANN quality: learned-IVF and multi-probe LSH must beat single-bucket LSH
  * recall against the brute-force ground truth, deterministically. */
class AnnSpec extends SparkSpec {

  private lazy val e = Tables.embeddings(spark, "/root/testdata/sf0.01")
  private lazy val q = e.filter(col("vec_id") < 20)

  private def recall(got: org.apache.spark.sql.DataFrame,
                     truth: org.apache.spark.sql.DataFrame): Double = {
    val hits = got.join(truth, Seq("q_id", "vec_id")).count().toDouble
    hits / truth.count()
  }

  test("multi-probe LSH recall ≥ single-bucket LSH recall") {
    val truth = Similarity.knnBrute(e, q, "vec_id", "embedding", 5).cache()
    val single = Similarity.annLsh(e, q, "vec_id", "embedding", 5, 8, 64)
    val multi = Similarity.annLshMultiProbe(e, q, "vec_id", "embedding", 5, 8, 64)
    val rs = recall(single, truth); val rm = recall(multi, truth)
    assert(rm >= rs, s"multi-probe $rm < single $rs")
    assert(rm > 0.2, s"multi-probe recall too low: $rm")
  }

  test("learned IVF with multi-cell probing finds most true neighbours") {
    val truth = Similarity.knnBrute(e, q, "vec_id", "embedding", 5).cache()
    val (assigned, centroids) = Similarity.ivfLearned(e, "vec_id", "embedding", nCells = 8)
    assert(assigned.select("cell").distinct().count() == 8)
    val got = Similarity.annIvfLearned(assigned, centroids, q, "vec_id", "embedding",
      k = 5, nProbe = 3)
    val r = recall(got, truth)
    assert(r > 0.4, s"IVF nProbe=3 recall too low: $r")
    // determinism under fixed seed: same cells on re-fit
    val (assigned2, _) = Similarity.ivfLearned(e, "vec_id", "embedding", nCells = 8)
    val diff = assigned.select("vec_id", "cell").except(assigned2.select("vec_id", "cell"))
    assert(diff.count() == 0)
  }

  test("int8 quantization: bounded dequant error, cosine preserved") {
    val qz = Similarity.quantizeInt8(e, "vec_id", "embedding")
      .join(e.select(col("vec_id"), Similarity.asDouble("embedding").as("v")), "vec_id")
      .withColumn("dq", expr("transform(codes, c -> c * mx / 127.0)"))
    // |x - dequant(x)| ≤ mx/254 (half a quantization step), codes in [-127,127]
    val bad = qz.filter(expr(
      "exists(zip_with(v, dq, (x, y) -> abs(x - y) > mx / 254.0 + 1e-12), b -> b)") ||
      expr("exists(codes, c -> abs(c) > 127)"))
    assert(bad.count() == 0)
    // cosine between original and dequantized stays near 1 for every vector
    val minCos = qz
      .withColumn("cos", Similarity.cosineNative(spark, "v", "dq"))
      .agg(min("cos")).head().getDouble(0)
    assert(minCos > 0.995, s"dequantized cosine degraded: $minCos")
  }
}
