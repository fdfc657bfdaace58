package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Post-execution plan metrics: read the SQL metric accumulators off an
  * EXECUTED plan (AQE stages and reused exchanges unwrapped) and sum the
  * scale-relevant ones — shuffle bytes written and spill. Accumulators are
  * merged on the driver as tasks complete, so after an action returns the
  * values are final. This is how the bench turns "the plan looks right"
  * into measured bytes. */
object PlanMetrics {

  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
    case q: QueryStageExec        => q +: flatten(q.plan)
    case other =>
      (other +: other.children.flatMap(flatten)) ++
        other.subqueries.flatMap(flatten)
  }

  /** Sum of metric values across the executed plan for metrics whose
    * description contains `needle` (e.g. "shuffle bytes written").
    * Nodes are deduped by REFERENCE identity, not structural equality: two
    * genuinely distinct but structurally identical nodes (the two scans or
    * exchanges of a self-join over the same source — the normal shape of the
    * dedup/minhash queries) each carry their own accumulators and must both
    * be summed, while a node instance reached twice (reused exchange/stage)
    * must be summed once. */
  def sumMetric(df: DataFrame, needle: String): Long = {
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    flatten(df.queryExecution.executedPlan)
      .filter(seen.add)
      .flatMap(_.metrics.values)
      .filter(m => m.name.exists(_.contains(needle)))
      .map(m => math.max(m.value, 0L))
      .sum
  }

  def shuffleBytes(df: DataFrame): Long = sumMetric(df, "shuffle bytes written")
  def spillBytes(df: DataFrame): Long   = sumMetric(df, "spill size")
}
