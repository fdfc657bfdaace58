package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives for the 100 TB path. AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default) covers sort-merge
  * joins at runtime; these helpers cover the two cases AQE does not:
  * hot-key AGGREGATION state and broadcast-infeasible hot-key joins.
  */
object Skew {

  /** Two-phase salted aggregation: phase 1 aggregates on (keys, salt) —
    * spreading one hot key over `salt` reducers — phase 2 merges the salted
    * partials. `partials` must be algebraic (re-aggregable): pass the
    * partial aggregate and the merge aggregate per output column, e.g.
    * (sum, sum), (count → sum), (min, min).
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], salt: Int,
                      partials: Seq[(Column, String)],
                      merges: Seq[(String => Column, String)]): DataFrame = {
    val salted = df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)))
    val phase1 = salted.groupBy((keys :+ "_salt").map(col): _*)
      .agg(partials.head._1.as(partials.head._2),
        partials.tail.map { case (c, n) => c.as(n) }: _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(merges.head._1(merges.head._2).as(merges.head._2),
        merges.tail.map { case (f, n) => f(n).as(n) }: _*)
  }

  /** Salted equi-join for a skewed LEFT side against a right side too large
    * to broadcast: left rows get a random salt in [0, salt); right rows are
    * replicated `salt` times. The hot key's rows then land on `salt`
    * reducers instead of one. Cost: right side shuffled `salt`×, so use a
    * `salt` sized to the observed hot-key factor, not a blanket large value.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 salt: Int, joinType: String = "inner"): DataFrame = {
    // replication is only sound when unmatched RIGHT rows don't surface:
    // under right/full outer joins every unmatched right row would appear
    // `salt` times (once per replica)
    require(Set("inner", "left", "left_outer", "leftouter").contains(joinType),
      s"saltedJoin supports inner/left joins only, got $joinType")
    val l = left.withColumn("_salt",
      pmod(pmod(spark_partition_id() + monotonically_increasing_id(), lit(1000003)), lit(salt)))
    val r = right.withColumn("_salt", explode(array((0 until salt).map(lit): _*)))
    l.join(r, keys :+ "_salt", joinType).drop("_salt")
  }

  /** Hot-key report: the top-k heaviest keys and their share of rows — the
    * measurement that decides whether salting is warranted and what factor
    * to use. One aggregate + a k-row driver summary. */
  def hotKeys(df: DataFrame, keys: Seq[String], k: Int = 10): DataFrame = {
    val total = df.count().toDouble
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .withColumn("share", col("n") / total)
      .orderBy(col("n").desc)
      .limit(k)
  }
}
