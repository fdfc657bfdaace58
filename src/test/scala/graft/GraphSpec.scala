package graft

import graft.analytics.Graph
import org.apache.spark.sql.functions._

/** Goldens for the iterative graph operators (q162): PageRank checked
  * against a scalar reference implementation run over the same edge list,
  * plus the conservation invariant (ranks always sum to 1). */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference PageRank — the textbook scalar loop. */
  private def refPageRank(edges: Seq[(String, String)], nodes: Seq[String],
                          iters: Int, d: Double = 0.85): Map[String, Double] = {
    val e = edges.distinct
    val out = e.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val n = nodes.size.toDouble
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dangling = r.collect { case (v, x) if !out.contains(v) => x }.sum
      val contrib = e.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / out(s) }.sum).toMap
      r = nodes.map(v => v -> ((1.0 - d) / n +
        d * (contrib.getOrElse(v, 0.0) + dangling / n))).toMap
    }
    r
  }

  test("pageRank matches the scalar reference on a graph with a cycle, " +
       "a hub, and a dangling sink") {
    // a⇄b cycle, c→a and c→b hub fan-out, b→d with d dangling
    val edges = Seq("a" -> "b", "b" -> "a", "c" -> "a", "c" -> "b", "b" -> "d")
    val nodes = Seq("a", "b", "c", "d")
    val got = Graph.pageRank(edges.toDF("s", "t"), "s", "t",
        nodes.toDF("id"), "id", iters = 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = refPageRank(edges, nodes, iters = 4)
    nodes.foreach { v =>
      assert(math.abs(got(v) - want(v)) < 1e-6,
        s"$v: got ${got(v)}, want ${want(v)}")
    }
    // the hub holds only the teleport share; the cycle nodes dominate
    assert(got("a") > got("c") && got("b") > got("c"))
  }

  test("pageRank conserves total rank (sum = 1) despite dangling nodes") {
    // every edge points into d; d has no out-edges, so without dangling
    // redistribution ~all rank would leak each iteration
    val edges = Seq("a" -> "d", "b" -> "d", "c" -> "d")
    val nodes = Seq("a", "b", "c", "d").toDF("id")
    for (iters <- Seq(1, 3, 5)) {
      val total = Graph.pageRank(edges.toDF("s", "t"), "s", "t",
        nodes, "id", iters = iters).agg(sum("rank")).head().getDouble(0)
      assert(math.abs(total - 1.0) < 1e-4, s"iters=$iters: sum $total")
    }
  }

  test("pageRank on a symmetric cycle is uniform") {
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a")
    val got = Graph.pageRank(edges.toDF("s", "t"), "s", "t",
        Seq("a", "b", "c").toDF("id"), "id", iters = 3)
      .collect().map(_.getDouble(1)).toSeq
    // output is rounded at 6 dp, so compare at that grain
    assert(got.forall(r => math.abs(r - 1.0 / 3) <= 5e-7))
  }
}
