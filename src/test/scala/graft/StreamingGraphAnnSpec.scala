package graft

import graft.sim.{GraphAnnIndex, Similarity}
import graft.streaming.StreamingGraphAnn
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming graph-ANN maintenance: the drained ingest stream's index
  * must search exactly like a from-scratch annGraph over everything
  * ingested (touched-group restatement is exact), and a drained DELETE
  * stream must equal the batch delete — including scratch-exactness over
  * the filtered corpus. The ingest and delete streams use independent
  * checkpoints (independent batch counters); the edges tree stays
  * consistent because restatements ride the index's own logical clock. */
class StreamingGraphAnnSpec extends SparkSpec {

  private val Dim = 64
  private val schema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  test("drained ingest stream ≡ from-scratch annGraph; a drained DELETE " +
       "stream ≡ batch delete (scratch-exact over the filtered corpus)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sgann").toString
    val idx = s"$dir/index"
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    GraphAnnIndex.writeIndex(e.filter(col("vec_id") % 3 === 0), "vec_id",
      "embedding", Dim, idx)

    val in = s"$dir/in"
    e.filter(col("vec_id") % 3 === 1).write.parquet(in)
    StreamingGraphAnn.graphSink(spark.readStream.schema(schema).parquet(in),
      "vec_id", "embedding", idx, s"$dir/chk").start().awaitTermination()
    e.filter(col("vec_id") % 3 === 2).write.mode("append").parquet(in)
    StreamingGraphAnn.graphSink(spark.readStream.schema(schema).parquet(in),
      "vec_id", "embedding", idx, s"$dir/chk").start().awaitTermination()

    val q = e.filter(col("vec_id") < 10)
    def res(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(res(StreamingGraphAnn.search(spark, idx, q, "vec_id",
        "embedding", k = 5)) ===
      res(Similarity.annGraph(e, q, "vec_id", "embedding", Dim, k = 5)),
      "the drained stream index must search like a from-scratch build")

    // DELETE stream on its own checkpoint (independent batch counter)
    val delIn = s"$dir/delin"
    e.filter(col("vec_id") % 7 === 3).select("vec_id").write.parquet(delIn)
    StreamingGraphAnn.tombstoneSink(
        spark.readStream.schema(StructType(Seq(
          StructField("vec_id", LongType)))).parquet(delIn),
        idx, s"$dir/chkdel")
      .start().awaitTermination()

    val live = e.filter(col("vec_id") % 7 =!= 3)
    val liveQ = q.filter(col("vec_id") % 7 =!= 3)
    assert(res(StreamingGraphAnn.search(spark, idx, liveQ, "vec_id",
        "embedding", k = 5)) ===
      res(Similarity.annGraph(live, liveQ, "vec_id", "embedding", Dim,
        k = 5)),
      "the drained delete stream must be scratch-exact over the " +
        "filtered corpus")

    // fold drains the live increments and erases physically
    GraphAnnIndex.compactIndex(spark, idx)
    val audit = GraphAnnIndex.erasureAudit(spark, idx).head()
    assert(audit.getBoolean(audit.fieldIndex("physically_clean")))
    assert(res(StreamingGraphAnn.search(spark, idx, liveQ, "vec_id",
        "embedding", k = 5)) ===
      res(Similarity.annGraph(live, liveQ, "vec_id", "embedding", Dim,
        k = 5)))
  }
}
