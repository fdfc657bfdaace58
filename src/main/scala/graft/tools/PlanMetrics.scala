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
    * description contains `needle` (e.g. "shuffle bytes written"). */
  def sumMetric(df: DataFrame, needle: String): Long =
    flatten(df.queryExecution.executedPlan)
      .distinct
      .flatMap(_.metrics.values)
      .filter(m => m.name.exists(_.contains(needle)))
      .map(m => math.max(m.value, 0L))
      .sum

  def shuffleBytes(df: DataFrame): Long = sumMetric(df, "shuffle bytes written")
  def spillBytes(df: DataFrame): Long   = sumMetric(df, "spill size")
}
