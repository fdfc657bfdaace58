package graft

/** Blanket physical-plan lint over the ENTIRE query catalog: no query may
  * plan a true cartesian product (broadcast nested-loop is fine — that's
  * the deliberate small-side pattern) or fall back to a ScalaUDF / Python
  * eval node (everything must stay inside codegen'd built-ins, HOFs, or
  * the native graft expressions). Catches an anti-pattern sneaking into
  * any future query without needing a per-query assertion. */
class PlanLintSpec extends SparkSpec {

  test("no catalog query plans a CartesianProduct or any UDF eval node") {
    val d = "/root/testdata/sf0.001"
    val offenders = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, q) =>
      val plan = q(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      if (plan.contains("CartesianProduct")) offenders += s"$name: CartesianProduct"
      if (plan.contains("ScalaUDF")) offenders += s"$name: ScalaUDF"
      if (plan.contains("BatchEvalPython")) offenders += s"$name: PythonUDF"
    }
    assert(offenders.isEmpty, s"plan lint: ${offenders.mkString("; ")}")
  }

  test("driver contract: every oracle key has a query; entry returns rows") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }
}
