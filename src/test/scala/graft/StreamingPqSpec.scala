package graft

import graft.sim.{PqIndex, Similarity}
import graft.streaming.StreamingPq
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming PQ maintenance: the drained stream's code table must search
  * exactly like a from-scratch encode over everything ingested (encoding
  * under a frozen codebook is per-row pure), restatement must not
  * duplicate rows, and the trigger-driven fold must not move a result. */
class StreamingPqSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  private val cb: Array[Array[Array[Double]]] =
    Array.tabulate(4, 4, 16)((s, c, i0) =>
      ((s * 131 + c * 37 + (i0 + 1) * 17) % 19 - 9) / 10.0)

  test("drained stream ≡ from-scratch encode; restatement idempotent; " +
       "trigger fold changes nothing") {
    val dir = java.nio.file.Files.createTempDirectory("graft_spq").toString
    val in = s"$dir/in"; val idx = s"$dir/index"; val chk = s"$dir/chk"
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    PqIndex.writeIndex(e.filter(col("vec_id") % 3 === 0), "vec_id",
      "embedding", cb, idx)

    e.filter(col("vec_id") % 3 === 1).write.parquet(in)
    StreamingPq.pqSink(spark.readStream.schema(schema).parquet(in),
      "vec_id", "embedding", idx, chk).start().awaitTermination()
    e.filter(col("vec_id") % 3 === 2).write.mode("append").parquet(in)
    StreamingPq.pqSink(spark.readStream.schema(schema).parquet(in),
      "vec_id", "embedding", idx, chk).start().awaitTermination()

    def codeMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    val scratch = codeMap(Similarity
      .pqEncode(e, "vec_id", "embedding", cb).select("vec_id", "codes"))
    assert(codeMap(PqIndex.readCodes(spark, idx)) == scratch)

    // restatement: re-land batch 0's directory by hand — no duplication
    PqIndex.appendBatch(e.filter(col("vec_id") % 3 === 1), "vec_id",
      "embedding", idx, 0L)
    assert(codeMap(PqIndex.readCodes(spark, idx)) == scratch)

    val q = e.filter(col("vec_id") < 3)
    val before = StreamingPq.search(spark, idx, q, "vec_id", "embedding",
      k = 4).collect().toSet
    assert(PqIndex.compactIndexIfNeeded(spark, idx, 1) == 2,
      "two increments above threshold 1 must fold")
    assert(StreamingPq.search(spark, idx, q, "vec_id", "embedding",
      k = 4).collect().toSet == before)
    assert(codeMap(PqIndex.readCodes(spark, idx)) == scratch)
  }

  test("drained DELETE stream ≡ batch deleteBatch: tombstones land per " +
       "micro-batch with their own watermark; fold erases physically") {
    val dir = java.nio.file.Files.createTempDirectory("graft_spqdel").toString
    val idx = s"$dir/index"
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    PqIndex.writeIndex(e, "vec_id", "embedding", cb, idx)

    // the same takedown applied via the batch API to a twin index
    val twin = s"$dir/twin"
    PqIndex.writeIndex(e, "vec_id", "embedding", cb, twin)
    PqIndex.deleteBatch(e.filter(col("vec_id") % 7 === 3)
      .select("vec_id"), twin, 0L)

    val in = s"$dir/delin"
    e.filter(col("vec_id") % 7 === 3).select("vec_id").write.parquet(in)
    val idSchema = StructType(Seq(StructField("vec_id", LongType)))
    StreamingPq.tombstoneSink(
        spark.readStream.schema(idSchema).parquet(in), idx, s"$dir/chkdel")
      .start().awaitTermination()

    val q = e.filter(col("vec_id") < 3)
    def res(p: String) = StreamingPq.search(spark, p, q, "vec_id",
      "embedding", k = 4).collect().toSet
    assert(res(idx) == res(twin),
      "the drained delete stream must equal the batch delete")
    // fold-driven physical erasure attested by the audit
    PqIndex.compactIndex(spark, idx)
    val audit = PqIndex.erasureAudit(spark, idx).head()
    assert(audit.getBoolean(audit.fieldIndex("physically_clean")))
    assert(res(idx) == res(twin))
  }
}
