package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph ranking as relational plans.
  *
  * The reference pipeline ranks entities by scalar aggregates (volume,
  * volatility — serve_part/main.py's summary tables); PageRank is the
  * graph-native generalisation: importance flows along edges instead of
  * being summed per row. Expressed Spark-first, one iteration is exactly
  * one equi-join + one aggregation — the shape Catalyst already knows how
  * to shuffle, co-partition and AQE-replan — so no custom execution (GraphX
  * RDDs, Pregel) is needed for the bounded iteration counts analytics use.
  */
object Graph {

  /** Power-iteration PageRank (Brin & Page, WWW'98) with dangling-mass
    * redistribution, over a DIRECTED edge list.
    *
    * rank_{t+1}(v) = (1−d)/N + d·( Σ_{u→v} rank_t(u)/outdeg(u) + D_t/N )
    *
    * where D_t is the total rank held by dangling (outdeg-0) nodes —
    * dropped instead of redistributed, ranks would leak and the vector
    * would no longer sum to 1 (checked in GraphSpec).
    *
    * Plan shape per iteration (the 100 TB story): contributions are ONE
    * shuffle — edges join ranks on src (both hash-partitioned on the same
    * key, so consecutive iterations reuse the exchange) then a map-side-
    * combined sum on dst; the dangling mass is a 1-row aggregate broadcast
    * back. Out-degrees are computed once, outside the loop. `iters` is
    * expected small (3–20, analytics-grade convergence); each iteration
    * extends the logical plan, so very deep loops should checkpoint — at
    * the catalog's iteration counts the plan stays comfortably small.
    *
    * Emits (id, rank) with rank rounded at 6 dp — rounding ONLY at the
    * end keeps the fixed point exact while absorbing engine summation-
    * order noise at compare time. */
  def pageRank(edges: DataFrame, src: String, dst: String,
               nodes: DataFrame, id: String,
               iters: Int = 3, damping: Double = 0.85): DataFrame = {
    val e = edges.select(col(src).as("_src"), col(dst).as("_dst")).distinct()
    val v = nodes.select(col(id).as("id")).distinct()
    val n1 = v.agg(count(lit(1)).cast("double").as("_n"))
    val deg = e.groupBy(col("_src")).agg(count(lit(1)).as("_deg"))
    val srcs = e.select(col("_src")).distinct()

    var ranks = v.crossJoin(broadcast(n1))
      .select(col("id"), (lit(1.0) / col("_n")).as("r"))
    for (_ <- 1 to iters) {
      val contrib = e.join(deg, "_src")
        .join(ranks, col("_src") === col("id"))
        .groupBy(col("_dst").as("id"))
        .agg(sum(col("r") / col("_deg")).as("_c"))
      val dangling = ranks.join(srcs, col("id") === col("_src"), "left_anti")
        .agg(coalesce(sum(col("r")), lit(0.0)).as("_dm"))
      ranks = v.join(contrib, Seq("id"), "left")
        .crossJoin(broadcast(n1)).crossJoin(broadcast(dangling))
        .select(col("id"),
          (lit(1.0 - damping) / col("_n") + lit(damping) *
            (coalesce(col("_c"), lit(0.0)) + col("_dm") / col("_n"))).as("r"))
    }
    ranks.select(col("id"), round(col("r"), 6).as("rank"))
  }
}
