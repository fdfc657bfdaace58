package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-sequence analytics: funnel progression and cohort retention — the
  * standard behavioral-OLAP pair over an event log.
  *
  * Scale shape: both operators reduce the event log to per-user rows with
  * group aggregates (map-side combined, shuffle keyed by user), then join
  * user-cardinality frames — bytes ∝ users, never events². No window over
  * the raw log, no self-join of events.
  */
object Behavior {

  /** Ordered funnel: for each user, the earliest time of step 1, the
    * earliest step-2 time AFTER that, and so on (strict ordering — a
    * click before the first view doesn't count). Output: one row per user
    * with t1..tN (NULL once the funnel breaks) and `stage` = furthest step
    * reached (0 = none). Each step is one filtered aggregate joined on the
    * user key; steps are few and fixed, so the plan is a short chain of
    * user-sized hash joins. */
  def funnel(df: DataFrame, user: String, ts: String, etype: String,
             steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var acc = df.select(col(user)).distinct()
    var prevT: Option[String] = None
    steps.zipWithIndex.foreach { case (step, i) =>
      val tcol = s"t${i + 1}"
      val stepEvents = df.filter(col(etype) === step)
      val stepTs = prevT match {
        case None =>
          stepEvents.groupBy(col(user)).agg(min(col(ts)).as(tcol))
        case Some(p) =>
          stepEvents
            .join(acc.filter(col(p).isNotNull).select(col(user), col(p)), Seq(user))
            .filter(col(ts) > col(p))
            .groupBy(col(user)).agg(min(col(ts)).as(tcol))
      }
      acc = acc.join(stepTs, Seq(user), "left_outer")
      prevT = Some(tcol)
    }
    val stage = steps.indices
      .map(i => when(col(s"t${i + 1}").isNotNull, i + 1).otherwise(0))
      .reduce(greatest(_, _))
    acc.withColumn("stage", stage)
  }

  /** Cohort retention: users grouped by first-activity day, counted on each
    * subsequent active day. Output: (cohort, day_n, n_users). Two passes
    * over the log (first-day aggregate + distinct active days), one
    * user-keyed join, one small aggregate. */
  def retention(df: DataFrame, user: String, ts: String): DataFrame = {
    val first = df.groupBy(col(user))
      .agg(min(to_date(col(ts))).as("cohort"))
    val active = df.select(col(user), to_date(col(ts)).as("day")).distinct()
    active.join(first, Seq(user))
      .groupBy(col("cohort"), datediff(col("day"), col("cohort")).as("day_n"))
      .agg(count(lit(1)).as("n_users"))
  }
}
