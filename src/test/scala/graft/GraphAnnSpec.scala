package graft

import graft.sim.{GraphAnnIndex, Similarity}
import org.apache.spark.sql.functions._

/** Stored/maintained graph ANN: because every directed NSW edge is a pure
  * function of its LSH bucket's membership, restating exactly the touched
  * bucket groups keeps the maintained graph IDENTICAL to a from-scratch
  * build — after appends AND after deletes — and the search tail is shared
  * code, so stored search ≡ [[Similarity.annGraph]] value for value. */
class GraphAnnSpec extends SparkSpec {

  private val Dim = 64
  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString
  private lazy val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
  private lazy val q = e.filter(col("vec_id") < 10)

  private def res(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    .toSet

  test("maintained ≡ scratch: base + two appends searches exactly like " +
       "annGraph over everything ingested; restatement is idempotent") {
    val dir = tmp("graft_gann")
    GraphAnnIndex.writeIndex(e.filter(col("vec_id") % 3 === 0), "vec_id",
      "embedding", Dim, dir)
    GraphAnnIndex.appendBatch(e.filter(col("vec_id") % 3 === 1), "vec_id",
      "embedding", dir, 0L)
    GraphAnnIndex.appendBatch(e.filter(col("vec_id") % 3 === 2), "vec_id",
      "embedding", dir, 1L)
    val scratch = res(Similarity.annGraph(e, q, "vec_id", "embedding",
      Dim, k = 5))
    assert(res(GraphAnnIndex.search(spark, dir, q, "vec_id", "embedding",
      k = 5)) === scratch)

    // replayed batch: its vectors restate their own directory and the
    // edge repair re-lands under a fresh clock with identical content —
    // nothing changes
    GraphAnnIndex.appendBatch(e.filter(col("vec_id") % 3 === 1), "vec_id",
      "embedding", dir, 0L)
    assert(res(GraphAnnIndex.search(spark, dir, q, "vec_id", "embedding",
      k = 5)) === scratch)

    // fold: reads identical before and after; live increments drained
    // (two appends + the replay's clock generation on the edges tree)
    val (fv, fe) = GraphAnnIndex.compactIndexIfNeeded(spark, dir, 1)
    assert(fv == 2 && fe == 3, s"folded ($fv, $fe)")
    assert(res(GraphAnnIndex.search(spark, dir, q, "vec_id", "embedding",
      k = 5)) === scratch)
    assert(graft.streaming.Compaction
      .incrementCount(spark, s"$dir/edges") == 0)
  }

  test("delete restates the touched groups: search over the maintained " +
       "graph ≡ annGraph over the FILTERED corpus (deleted vectors stop " +
       "competing for degree slots, not just stop being returned); " +
       "erasure completes at the fold") {
    val dir = tmp("graft_gann_del")
    GraphAnnIndex.writeIndex(e.filter(col("vec_id") % 10 =!= 0), "vec_id",
      "embedding", Dim, dir)
    GraphAnnIndex.appendBatch(e.filter(col("vec_id") % 10 === 0), "vec_id",
      "embedding", dir, 0L)
    assert(GraphAnnIndex.deleteBatch(
      e.filter(col("vec_id") % 7 === 3).select("vec_id"), dir, 1L))

    val live = e.filter(col("vec_id") % 7 =!= 3)
    val scratch = res(Similarity.annGraph(live,
      q.filter(col("vec_id") % 7 =!= 3), "vec_id", "embedding", Dim, k = 5))
    assert(res(GraphAnnIndex.search(spark, dir,
      q.filter(col("vec_id") % 7 =!= 3), "vec_id", "embedding",
      k = 5)) === scratch)

    // before the fold: logically gone, physically present
    val pre = GraphAnnIndex.erasureAudit(spark, dir).head()
    assert(pre.getLong(0) > 0 && pre.getLong(1) > 0 && !pre.getBoolean(3),
      pre.toString)
    GraphAnnIndex.compactIndex(spark, dir)
    val post = GraphAnnIndex.erasureAudit(spark, dir).head()
    assert(post.getLong(1) == 0L && post.getLong(2) == 0L &&
      post.getBoolean(3), post.toString)
    assert(res(GraphAnnIndex.search(spark, dir,
      q.filter(col("vec_id") % 7 =!= 3), "vec_id", "embedding",
      k = 5)) === scratch)

    // terminal: re-ingesting deleted vectors is suppressed
    GraphAnnIndex.appendBatch(e.filter(col("vec_id") % 7 === 3), "vec_id",
      "embedding", dir, 2L)
    assert(res(GraphAnnIndex.search(spark, dir,
      q.filter(col("vec_id") % 7 =!= 3), "vec_id", "embedding",
      k = 5)) === scratch)
  }

  test("a group restated to EMPTY stays empty under last-writer-wins " +
       "(the sentinel row): deleting every member of a bucket leaves no " +
       "resurrectable edges") {
    val dir = tmp("graft_gann_empty")
    GraphAnnIndex.writeIndex(e, "vec_id", "embedding", Dim, dir)
    // delete everything — every group restates to empty
    assert(GraphAnnIndex.deleteBatch(e.select("vec_id"), dir, 0L))
    assert(GraphAnnIndex.readEdges(spark, dir).isEmpty,
      "all edges must be gone once every member is deleted")
    assert(GraphAnnIndex.readVectors(spark, dir).isEmpty)
  }
}
