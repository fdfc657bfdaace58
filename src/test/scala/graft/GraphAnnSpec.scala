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

  test("crash between vectors landing and edge restatement cannot orphan " +
       "the batch: compactIndex repairs an unmarked increment before " +
       "folding, and a replayed appendBatch repairs after the fold") {
    val dir = tmp("graft_gann_crash")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    GraphAnnIndex.writeIndex(e.filter(col("vec_id") % 10 =!= 0), "vec_id",
      "embedding", Dim, dir)
    GraphAnnIndex.appendBatch(e.filter(col("vec_id") % 10 === 0), "vec_id",
      "embedding", dir, 0L)
    // simulate the crash window: the vectors increment landed but the
    // edge restatement never completed — wipe the restatement AND its
    // marker (the pre-marker failure mode the r14 advice flagged)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/edges/increments"), true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/edges/_restated"), true)

    // compactIndex runs BEFORE the stream retries (legal: a crashed
    // stream is between streams) — the repair arm must restate the
    // unmarked increment's groups before the fold absorbs it
    GraphAnnIndex.compactIndex(spark, dir)
    val scratch = res(Similarity.annGraph(e, q, "vec_id", "embedding",
      Dim, k = 5))
    assert(res(GraphAnnIndex.search(spark, dir, q, "vec_id", "embedding",
      k = 5)) === scratch,
      "fold after an unrestated landing must not orphan the new vectors")

    // the replayed batch (vectors already folded, marker reaped by the
    // fold): the repair is value-identical, nothing changes
    GraphAnnIndex.appendBatch(e.filter(col("vec_id") % 10 === 0), "vec_id",
      "embedding", dir, 0L)
    assert(res(GraphAnnIndex.search(spark, dir, q, "vec_id", "embedding",
      k = 5)) === scratch)
  }

  test("filtered search over the stored graph ≡ the in-memory beam over " +
       "the induced survivor subgraph: excluded vectors neither rank nor " +
       "navigate") {
    val dir = tmp("graft_gann_filt")
    GraphAnnIndex.writeIndex(e.filter(col("vec_id") % 10 =!= 0), "vec_id",
      "embedding", Dim, dir)
    GraphAnnIndex.appendBatch(e.filter(col("vec_id") % 10 === 0), "vec_id",
      "embedding", dir, 0L)
    val stored = GraphAnnIndex.searchFiltered(spark, dir, q, "vec_id",
      "embedding", col("vec_id") % 3 === 0, k = 5)
    assert(stored.filter(col("vec_id") % 3 =!= 0).isEmpty,
      "excluded vectors must never rank")
    // in-memory reference: the FULL graph (a filter is per-query, never
    // a restatement), the beam restricted to the survivor pool
    val c = e.select(col("vec_id"),
        Similarity.asDouble("embedding").as("v"))
      .filter(col("vec_id") % 3 === 0)
    val g = Similarity.nswGraph(e, "vec_id", "embedding", Dim)
      .localCheckpoint(true)
    val mem = Similarity.nswBeamSearch(c, g, q, "vec_id", "embedding",
      k = 5, beam = 24, rounds = 6, nEntries = 16, hubMod = 16)
    assert(res(stored) === res(mem),
      "stored filtered search must equal the in-memory induced-subgraph beam")

    // hubless tenant: the predicate excludes every hub node (ids ≡ 1 mod
    // 16 can never be ≡ 0 mod 16) — entry points must fall back to the
    // lowest-id survivors instead of stranding the beam with no entries
    val hubless = GraphAnnIndex.searchFiltered(spark, dir, q, "vec_id",
      "embedding", col("vec_id") % 16 === 1, k = 5)
    assert(hubless.count() > 0,
      "a tenant with no surviving hub must still get results")
    assert(hubless.filter(col("vec_id") % 16 =!= 1).isEmpty)
  }

  test("drift-triggered rebuild: calm → no-op; breach → rebuilt ≡ " +
       "from-scratch at the NEXT epoch over the live membership; recall " +
       "holds and terminality survives the new geometry") {
    val dir = tmp("graft_gann_reb")
    GraphAnnIndex.writeIndex(e.filter(col("vec_id") % 10 =!= 0), "vec_id",
      "embedding", Dim, dir)
    // no live increments: nothing to compare the base against — never a
    // rebuild, even at threshold 0 (the just-compacted state)
    assert(!GraphAnnIndex.rebuildIfDrifted(spark, dir, maxDrift = 0.0))
    GraphAnnIndex.appendBatch(e.filter(col("vec_id") % 10 === 0), "vec_id",
      "embedding", dir, 0L)
    val before = res(GraphAnnIndex.search(spark, dir, q, "vec_id",
      "embedding", k = 5))
    // calm: a generous threshold leaves the index untouched
    assert(!GraphAnnIndex.rebuildIfDrifted(spark, dir, maxDrift = 100.0))
    assert(res(GraphAnnIndex.search(spark, dir, q, "vec_id", "embedding",
      k = 5)) === before)
    // a takedown BEFORE the rebuild: the rebuilt base must exclude the
    // victims and keep them terminally suppressed afterwards
    GraphAnnIndex.deleteBatch(
      e.filter(col("vec_id") % 7 === 3).select("vec_id"), dir, 1L)
    // breach: the 10% delta always drifts above 0 → rebuild at epoch 1
    assert(GraphAnnIndex.rebuildIfDrifted(spark, dir, maxDrift = 0.0))
    val live = e.filter(col("vec_id") % 7 =!= 3)
    val scratch = tmp("graft_gann_reb_s")
    GraphAnnIndex.writeIndex(live, "vec_id", "embedding", Dim, scratch,
      epoch = 1)
    val rebuilt = res(GraphAnnIndex.search(spark, dir, q, "vec_id",
      "embedding", k = 5))
    assert(rebuilt === res(GraphAnnIndex.search(spark, scratch, q,
        "vec_id", "embedding", k = 5)),
      "rebuilt must equal a from-scratch epoch-1 build over live members")
    // recall non-regression: exact-truth recall@5 at the new geometry
    // stays in the pre-rebuild band
    def recall(r: Set[(Long, Long, Double, Int)],
               corpus: org.apache.spark.sql.DataFrame): Double = {
      val truth = res(Similarity.knnBrute(corpus, q, "vec_id",
        "embedding", k = 5)).map(t => (t._1, t._2))
      r.map(t => (t._1, t._2)).intersect(truth).size.toDouble / truth.size
    }
    val rb = recall(before, e); val ra = recall(rebuilt, live)
    assert(ra >= math.max(0.5, rb - 0.15),
      s"epoch-1 recall $ra regressed too far from epoch-0 recall $rb")
    // terminal re-ingest + a post-rebuild restatement under the NEW
    // geometry: the tombstoned rows never re-enter, and the restated
    // groups reproduce the same live edges — search is unchanged
    GraphAnnIndex.appendBatch(e.filter(col("vec_id") % 7 === 3), "vec_id",
      "embedding", dir, 2L)
    assert(res(GraphAnnIndex.search(spark, dir, q, "vec_id", "embedding",
      k = 5)) === rebuilt)
  }

  test("low-selectivity brute fallback: a tiny tenant gets EXACT recall " +
       "(knnBrute over the survivors); above the threshold the beam path " +
       "is byte-identical to the unarmed call") {
    val dir = tmp("graft_gann_brute")
    GraphAnnIndex.writeIndex(e, "vec_id", "embedding", Dim, dir)
    // ~3% of the 500-vector corpus — the regime where the induced
    // subgraph can lose navigability and the beam's recall decays
    val tiny = col("vec_id") < 16
    val brute = GraphAnnIndex.searchFiltered(spark, dir, q, "vec_id",
      "embedding", tiny, k = 5, bruteThreshold = 32)
    val exact = Similarity.knnBrute(e.filter(tiny), q, "vec_id",
      "embedding", k = 5)
    assert(res(brute) === res(exact),
      "the brute arm must equal exact brute over the filtered corpus")
    // a tenant ABOVE the threshold keeps the pure beam path: armed and
    // unarmed calls are value-identical (the bounded limit-probe decides
    // the arm, it never changes the beam's semantics)
    val wide = col("vec_id") % 3 === 0
    assert(res(GraphAnnIndex.searchFiltered(spark, dir, q, "vec_id",
        "embedding", wide, k = 5, bruteThreshold = 32)) ===
      res(GraphAnnIndex.searchFiltered(spark, dir, q, "vec_id",
        "embedding", wide, k = 5)))
  }
}
