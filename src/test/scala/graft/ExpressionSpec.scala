package graft

import graft.sim.Similarity
import org.apache.spark.sql.functions._

/** Custom Catalyst expression: graft_cosine must be bit-identical to the
  * HOF composition (same accumulation order) and handle nulls/edge shapes. */
class ExpressionSpec extends SparkSpec {
  import spark.implicits._

  test("graft_cosine equals the HOF cosine bit-for-bit") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), Similarity.asDouble("embedding").as("v"))
    val pairs = e.as("a").crossJoin(e.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id")).limit(500)
      .select(col("a.v").as("x"), col("b.v").as("y"))
    graft.expressions.CosineSimilarity.register(spark)
    val diff = pairs
      .select((expr("graft_cosine(x, y)") - Similarity.cosine("x", "y")).as("d"))
      .agg(max(abs(col("d")))).head().getDouble(0)
    assert(diff == 0.0, s"native vs HOF maxdiff=$diff")
  }

  test("graft_cosine null and edge semantics") {
    graft.expressions.CosineSimilarity.register(spark)
    val df = Seq(
      (Some(Seq(1.0, 0.0)), Some(Seq(1.0, 0.0))),
      (None: Option[Seq[Double]], Some(Seq(1.0, 0.0))),
      (Some(Seq(0.0, 0.0)), Some(Seq(1.0, 0.0)))) // zero vector → NaN
      .toDF("x", "y")
    val got = df.select(expr("graft_cosine(x, y)")).collect()
    assert(got(0).getDouble(0) == 1.0)
    assert(got(1).isNullAt(0))
    assert(got(2).getDouble(0).isNaN)
  }

  test("native lsh bucket equals the composed textual-sum form (dim 64)") {
    val planes = Similarity.hyperplanes(8, 64)
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), Similarity.asDouble("embedding").as("v"))
    val diff = e.select(
        (Similarity.lshBucketNative(spark, "v", planes) -
          Similarity.lshBucket("v", planes)).as("d"))
      .agg(max(abs(col("d")))).head().getLong(0)
    assert(diff == 0L, s"native vs composed bucket maxdiff=$diff")
  }

  test("dim 768: native cosine and lsh bucket stay in whole-stage codegen") {
    graft.expressions.CosineSimilarity.register(spark)
    val planes = Similarity.hyperplanes(8, 768)
    val wide = spark.range(100).select(col("id"),
      expr("transform(sequence(1, 768), i -> cast(i * (id + 1) % 17 - 8 AS DOUBLE))").as("v"))
    val name = graft.expressions.LshBucket.register(spark, planes)
    val plan = wide.select(expr("graft_cosine(v, v)").as("s"), expr(s"$name(v)").as("b"))
      .queryExecution.executedPlan.toString
    // prettyName (not the registry name) appears in the plan dump
    assert(plan.linesIterator.exists(l => l.contains("graft_cosine") && l.contains("*(")), plan)
    assert(plan.linesIterator.exists(l => l.contains("graft_lsh_bucket") && l.contains("*(")), plan)
    // the composed textual-sum form cannot even be ANALYZED at dim 768 (the
    // 768-term `+` chain overflows the analyzer's recursion — why the native
    // expression exists), so check values against a driver-side computation
    val rows = wide.select(col("v"),
        Similarity.lshBucketNative(spark, "v", planes).as("b"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Double](0)
      var exp = 0L
      planes.zipWithIndex.foreach { case (p, j) =>
        var dot = 0.0
        p.indices.foreach(d => dot += p(d) * v(d))
        if (dot >= 0.0) exp |= 1L << j
      }
      assert(r.getLong(1) == exp, s"dim-768 bucket mismatch: got ${r.getLong(1)} want $exp")
    }
  }

  test("whole-stage codegen keeps graft_cosine fused (no fallback)") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(Similarity.asDouble("embedding").as("v"))
    graft.expressions.CosineSimilarity.register(spark)
    val plan = e.select(expr("graft_cosine(v, v)").as("s"))
      .queryExecution.executedPlan.toString
    // "*(n)" prefix marks a WholeStageCodegen stage in the compact plan form;
    // the graft_cosine projection must carry it (no CodegenFallback)
    assert(plan.linesIterator.exists(l => l.contains("graft_cosine") && l.contains("*(")), plan)
  }
}
