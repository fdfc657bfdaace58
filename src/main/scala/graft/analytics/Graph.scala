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
    * back. Out-degrees are computed once, outside the loop.
    *
    * Plan-depth safety is CODE, not prose (round-6 ask): every
    * `checkpointEvery` iterations the rank frame is `localCheckpoint`ed
    * eagerly, cutting the logical plan back to a leaf — an analyst passing
    * iters=50 gets O(checkpointEvery)-deep plans, not an exponentially
    * nested one (same guard as `Bpe.train`/`Dedup.dedupClusters`).
    * `tol` > 0 adds an L1 early-stop: iteration ends when
    * Σ|rankₜ−rankₜ₋₁| < tol. The delta needs an action per iteration, so
    * each tested iteration also checkpoints — the honest cost of
    * convergence testing; leave tol=0 (the default) for fixed-iteration
    * analytics runs. GraphSpec pins checkpointed ≡ un-checkpointed at 30
    * iterations and early-stop ≡ full-run ranks.
    *
    * Emits (id, rank) with rank rounded at 6 dp — rounding ONLY at the
    * end keeps the fixed point exact while absorbing engine summation-
    * order noise at compare time. */
  def pageRank(edges: DataFrame, src: String, dst: String,
               nodes: DataFrame, id: String,
               iters: Int = 3, damping: Double = 0.85,
               checkpointEvery: Int = 8, tol: Double = 0.0): DataFrame = {
    require(checkpointEvery >= 1, s"checkpointEvery $checkpointEvery < 1")
    val e = edges.select(col(src).as("_src"), col(dst).as("_dst")).distinct()
    val v = nodes.select(col(id).as("id")).distinct()
    val n1 = v.agg(count(lit(1)).cast("double").as("_n"))
    val deg = e.groupBy(col("_src")).agg(count(lit(1)).as("_deg"))
    val srcs = e.select(col("_src")).distinct()

    var ranks = v.crossJoin(broadcast(n1))
      .select(col("id"), (lit(1.0) / col("_n")).as("r"))
    var it = 0
    var converged = false
    while (it < iters && !converged) {
      it += 1
      val contrib = e.join(deg, "_src")
        .join(ranks, col("_src") === col("id"))
        .groupBy(col("_dst").as("id"))
        .agg(sum(col("r") / col("_deg")).as("_c"))
      val dangling = ranks.join(srcs, col("id") === col("_src"), "left_anti")
        .agg(coalesce(sum(col("r")), lit(0.0)).as("_dm"))
      val prev = ranks
      ranks = v.join(contrib, Seq("id"), "left")
        .crossJoin(broadcast(n1)).crossJoin(broadcast(dangling))
        .select(col("id"),
          (lit(1.0 - damping) / col("_n") + lit(damping) *
            (coalesce(col("_c"), lit(0.0)) + col("_dm") / col("_n"))).as("r"))
      if (tol > 0) {
        ranks = ranks.localCheckpoint(true) // about to be acted on anyway
        // coalesce: sum over an EMPTY node set is NULL, and an empty graph
        // is trivially converged — not an NPE
        val delta = ranks.join(prev.withColumnRenamed("r", "_rp"), "id")
          .agg(coalesce(sum(abs(col("r") - col("_rp"))), lit(0.0)).as("d"))
          .head().getDouble(0)
        converged = delta < tol
      } else if (it % checkpointEvery == 0 && it < iters)
        ranks = ranks.localCheckpoint(true)
    }
    ranks.select(col("id"), round(col("r"), 6).as("rank"))
  }

  /** Per-node triangle counts over an UNDIRECTED graph, by the
    * degree-oriented wedge algorithm (Latapy's compact-forward, TCS'08 —
    * the standard distributed formulation, cf. Suri & Vassilvitskii,
    * WWW'11): orient every edge from the (degree, id)-smaller endpoint to
    * the larger, enumerate wedges only at each node's oriented
    * out-neighbors, and close them against the oriented edge list. Raw
    * wedge counting does Σ deg(v)² work — a single celebrity node at
    * 100 TB means 10¹² wedges; orientation bounds out-degree by O(√m), so
    * total wedges fall to O(m^1.5), the known optimum for exact counting.
    * Each triangle is found exactly once (its two lowest-ordered members
    * form the wedge), then credited to all three corners.
    *
    * Plan shape: two self-joins of the oriented edge list on its join
    * keys plus one explode+count — all hash-shuffled equi-joins, no
    * cartesian. Emits (id, triangles), nodes in ≥1 triangle. */
  def triangles(edges: DataFrame, src: String, dst: String): DataFrame = {
    // canonical undirected edge set (a < b), self-loops dropped
    val und = edges.select(
        least(col(src), col(dst)).as("a"), greatest(col(src), col(dst)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = und.select(col("a").as("id"))
      .union(und.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    // orient by (deg, id): u → v iff (deg_u, u) < (deg_v, v)
    val withDeg = und
      .join(deg.withColumnRenamed("id", "a").withColumnRenamed("deg", "da"), "a")
      .join(deg.withColumnRenamed("id", "b").withColumnRenamed("deg", "db"), "b")
    val oriented = withDeg.select(
      when(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")), col("a"))
        .otherwise(col("b")).as("u"),
      when(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")), col("b"))
        .otherwise(col("a")).as("v"))
    // wedges at u over ordered out-neighbor pairs, closed by v1 → v2
    val e1 = oriented.select(col("u"), col("v").as("v1"))
    val e2 = oriented.select(col("u"), col("v").as("v2"))
    val closing = oriented.select(col("u").as("v1"), col("v").as("v2"))
    val tris = e1.join(e2, "u").filter(col("v1") < col("v2"))
      .join(closing, Seq("v1", "v2"))
    tris.select(explode(array(col("u"), col("v1"), col("v2"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("triangles"))
  }

  /** Local clustering coefficient per node: C(v) = 2·T(v)/(deg(v)·(deg(v)−1))
    * over the canonical undirected simple graph — how close each node's
    * neighborhood is to a clique (Watts & Strogatz 1998). Composes
    * [[triangles]] with the degree frame (nodes without triangles get 0;
    * degree-1 nodes get NULL — the coefficient is undefined there). Same
    * plan shape as triangles plus one node-sized left join. */
  def clusteringCoeff(edges: DataFrame, src: String, dst: String): DataFrame = {
    val und = edges.select(
        least(col(src), col(dst)).as("a"), greatest(col(src), col(dst)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = und.select(col("a").as("id"))
      .union(und.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    deg.join(triangles(edges, src, dst), Seq("id"), "left")
      .na.fill(0L, Seq("triangles"))
      .withColumn("clustering",
        when(col("deg") >= 2,
          round(lit(2.0) * col("triangles") /
            (col("deg") * (col("deg") - lit(1L))).cast("double"), 6)))
  }

  /** Newman modularity of a node partition over an undirected simple
    * graph: Q = Σ_c ( e_c/m − (d_c/2m)² ) with e_c the intra-community
    * edge count, d_c the community degree sum, m the edge total (Newman &
    * Girvan 2004) — how much denser communities are than a random graph
    * with the same degrees. Emits one row per community with its
    * contribution plus the total Q attached (the q52 pattern);
    * contributions quantize to DECIMAL before the total so accumulation
    * order can't wiggle low bits. Everything is node- or community-sized
    * after the one edge aggregation — scale-safe by construction. */
  def modularity(edges: DataFrame, src: String, dst: String,
                 communities: DataFrame, id: String,
                 community: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val und = edges.select(
        least(col(src), col(dst)).as("a"), greatest(col(src), col(dst)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val comm = communities
      .select(col(id).as("_id"), col(community).as("_c")).distinct()
    val total = und.agg(count(lit(1)).as("m"))
    val tagged = und
      .join(broadcast(comm.select(col("_id").as("a"), col("_c").as("_ca"))), Seq("a"))
      .join(broadcast(comm.select(col("_id").as("b"), col("_c").as("_cb"))), Seq("b"))
    val within = tagged.filter(col("_ca") === col("_cb"))
      .groupBy(col("_ca").as("community"))
      .agg(count(lit(1)).as("e_within"))
    val degC = und.select(col("a").as("_id"))
      .union(und.select(col("b").as("_id")))
      .join(broadcast(comm), Seq("_id"))
      .groupBy(col("_c").as("community"))
      .agg(count(lit(1)).as("d_sum"))
    val md = col("m").cast("double")
    val frac = col("d_sum").cast("double") / (lit(2.0) * md)
    val perComm = degC.join(within, Seq("community"), "left")
      .na.fill(0L, Seq("e_within"))
      .crossJoin(broadcast(total))
      .withColumn("contribution",
        round(col("e_within").cast("double") / md - frac * frac, 6))
    perComm
      .withColumn("modularity",
        round(sum(col("contribution").cast("decimal(28,12)"))
          .over(Window.partitionBy()).cast("double"), 6))
      .select("community", "e_within", "d_sum", "m", "contribution",
        "modularity")
  }

  /** Minimum hop distance from a source set, by iterative frontier
    * expansion over a DIRECTED edge list (classic BFS as relational
    * algebra; GraphX/Pregel's sssp with unit weights). Iteration i joins
    * the CURRENT frontier (not the whole visited set) against the edges
    * and anti-joins out already-settled nodes, so per-round work is
    * proportional to the frontier — the standard level-synchronous BFS a
    * 1000-executor cluster runs; `maxHops` bounds the loop. Unreachable
    * nodes are absent from the output. Emits (id, hops).
    *
    * Deep-graph hardening (the `starClusters` pattern): each frontier is
    * eagerly `localCheckpoint`ed — it is consumed three times (emptiness
    * probe, settled union, next round's join), and without truncation the
    * logical plan grows a join level per hop, making Catalyst analysis
    * (not data) the bottleneck on path-shaped graphs. The settled set's
    * union chain is likewise truncated every `CheckpointEvery` hops. The
    * edge list is persisted once — it is re-joined every round. On a
    * cluster where executor loss must be survivable, swap for reliable
    * `checkpoint`. */
  def bfsHops(edges: DataFrame, src: String, dst: String,
              sources: DataFrame, id: String, maxHops: Int): DataFrame = {
    val CheckpointEvery = 8
    val e = edges.select(col(src).as("_s"), col(dst).as("_d")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var settled = sources.select(col(id).as("id")).distinct()
      .withColumn("hops", lit(0))
    var frontier = settled
    var hop = 0
    while (hop < maxHops && !frontier.isEmpty) {
      hop += 1
      frontier = frontier.join(e, frontier("id") === e("_s"))
        .select(col("_d").as("id")).distinct()
        .join(settled.select("id"), Seq("id"), "left_anti")
        .withColumn("hops", lit(hop))
        .localCheckpoint(true) // materialize + truncate lineage
      settled = settled.union(frontier)
      if (hop % CheckpointEvery == 0)
        settled = settled.localCheckpoint(true)
    }
    // frontiers are materialized, so the returned plan no longer reads e
    e.unpersist()
    settled
  }
}
