package graft

import graft.sim.Similarity
import org.apache.spark.sql.functions._

/** The reliable-checkpoint escape hatch: every materialization cut in the
  * similarity family (topKPerQuery, annJoin's corpus scan, the graph beam)
  * is `localCheckpoint` by default — right for static executors — and a
  * RELIABLE `checkpoint` on the session's checkpoint dir when
  * `spark.graft.reliableCheckpoint=true` (dynamic allocation / preemption
  * can lose localCheckpoint blocks, which fails the job instead of
  * recomputing). The switch must not move a single value. */
class CheckpointSpec extends SparkSpec {

  test("spark.graft.reliableCheckpoint=true routes cuts through reliable " +
       "checkpoints with identical results (knn, annJoin, graph beam)") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.filter(col("vec_id") < 5)
    def run(): (Set[String], Set[String], Set[String]) = (
      Similarity.knnBrute(e, q, "vec_id", "embedding", 5)
        .collect().map(_.toString).toSet,
      Similarity.annJoin(e, "vec_id", "embedding", "label", k = 3,
        nProbe = 2).collect().map(_.toString).toSet,
      Similarity.annGraph(e, q, "vec_id", "embedding", 64, k = 5)
        .collect().map(_.toString).toSet)

    val default = run()
    val dir = java.nio.file.Files.createTempDirectory("graft_chk").toString
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set("spark.graft.reliableCheckpoint", "true")
    try {
      assert(run() === default,
        "the reliable-checkpoint path must not move a value")
      // and it actually wrote reliable checkpoint state
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fs.listStatus(new org.apache.hadoop.fs.Path(dir)).nonEmpty,
        "reliable checkpoints must land in the checkpoint dir")
    } finally spark.conf.set("spark.graft.reliableCheckpoint", "false")
  }

  test("the graph/stats iterative cuts honor the escape hatch too " +
       "(louvain + mutualInfo identical under reliable checkpoints)") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L)).toDF("u", "v")
    val pairs = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "y"),
      ("b", "y"), ("b", "x"), ("c", "z")).toDF("p", "q")
    def run(): (Set[String], Set[String]) = (
      graft.analytics.Graph.louvain(edges, "u", "v", rounds = 2)
        .collect().map(_.toString).toSet,
      graft.ops.Stats.mutualInfo(pairs, "p", "q")
        .collect().map(_.toString).toSet)

    val default = run()
    val dir = java.nio.file.Files.createTempDirectory("graft_chk2").toString
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set("spark.graft.reliableCheckpoint", "true")
    try assert(run() === default,
      "graph/stats cuts must not move a value under reliable checkpoints")
    finally spark.conf.set("spark.graft.reliableCheckpoint", "false")
  }

  test("observed fixpoint probes (kCore/kTruss/starClusters/dedupClusters) " +
       "complete and agree under BOTH checkpoint modes") {
    // r17 folded each round's convergence probe into the round's own
    // checkpoint job as an observed metric; Observation.get blocks until
    // the action completes, so this test is the liveness pin: a cut mode
    // that stopped firing Dataset.withAction would hang here, and a
    // metric drift would move the fixpoint round count and the values.
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L), (4L, 6L), (5L, 7L), (6L, 7L), (7L, 8L)).toDF("u", "v")
    val docs = (1L to 9L).toDF("id")
    def run(): (Set[String], Set[String], Set[String], Set[String]) = (
      graft.analytics.Graph.kCore(edges, "u", "v", k = 2)
        .collect().map(_.toString).toSet,
      graft.analytics.Graph.kTruss(edges, "u", "v", k = 3)
        .collect().map(_.toString).toSet,
      graft.text.Dedup.starClusters(docs,
          edges.select(col("u").as("id_a"), col("v").as("id_b")), "id")
        .collect().map(_.toString).toSet,
      graft.text.Dedup.dedupClusters(docs,
          edges.select(col("u").as("id_a"), col("v").as("id_b")), "id")
        .collect().map(_.toString).toSet)

    val default = run()
    assert(default._1.nonEmpty && default._2.nonEmpty,
      "fixture graph must have a 2-core and a 3-truss")
    // star and label-propagation clusterings agree on this graph (one
    // connected component over 1..8 plus the isolated doc 9)
    assert(default._3 === default._4)
    val dir = java.nio.file.Files.createTempDirectory("graft_chk3").toString
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set("spark.graft.reliableCheckpoint", "true")
    try assert(run() === default,
      "observed probes must not move a value under reliable checkpoints")
    finally spark.conf.set("spark.graft.reliableCheckpoint", "false")
  }
}
