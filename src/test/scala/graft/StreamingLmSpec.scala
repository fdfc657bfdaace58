package graft

import graft.streaming.StreamingLm
import graft.text.NgramLm
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming LM-index maintenance: micro-batched bigram-count increments
  * merged at read must reproduce the from-scratch LM exactly, and a
  * restated batch must not inflate counts. */
class StreamingLmSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  test("drained stream counts ≡ from-scratch; scoring from the maintained " +
       "index matches batch training; restatement is idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("graft_slm").toString
    val in = s"$dir/in"; val counts = s"$dir/counts"; val chk = s"$dir/chk"

    val baseDocs = Seq((1L, "a b a b"), (2L, "a c b")).toDF("doc_id", "text")
    val batchA = Seq((3L, "b c a a"), (4L, "c c b a")).toDF("doc_id", "text")
    val batchB = Seq((5L, "a b c d e"), (6L, "d e d")).toDF("doc_id", "text")
    StreamingLm.writeBaseCounts(baseDocs, "doc_id", "text", counts)

    batchA.write.parquet(in)
    StreamingLm.countsSink(spark.readStream.schema(schema).parquet(in),
      "doc_id", "text", counts, chk).start().awaitTermination()
    batchB.write.mode("append").parquet(in)
    StreamingLm.countsSink(spark.readStream.schema(schema).parquet(in),
      "doc_id", "text", counts, chk).start().awaitTermination()

    val all = baseDocs.unionByName(batchA).unionByName(batchB)
    def cset(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val merged = StreamingLm.readMergedCounts(spark, counts)
    assert(cset(merged) == cset(NgramLm.kneserNeyCounts(all, "doc_id", "text")),
      "streamed counts must equal from-scratch counts")

    // scoring from the maintained index ≡ batch training end-to-end
    val a = NgramLm.kneserNeyScoreFromCounts(merged, all, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = NgramLm.kneserNeyScore(all, all, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b)

    // restating batch 0 (same content, same partition) must not duplicate:
    // overwrite its own increments dir and nothing else
    NgramLm.kneserNeyCounts(batchA, "doc_id", "text")
      .write.mode("overwrite").parquet(s"$counts/increments/batch=0")
    assert(cset(StreamingLm.readMergedCounts(spark, counts)) == cset(merged),
      "restated increment must restate, not duplicate")

    // compaction folds the increments into the base count-for-count and
    // scoring from the folded index is unchanged; increments gone
    val preCounts = cset(merged)
    assert(StreamingLm.compactCounts(spark, counts) == 2)
    assert(cset(StreamingLm.readMergedCounts(spark, counts)) == preCounts,
      "compaction must not change a count")
    assert(NgramLm.kneserNeyScoreFromCounts(
        StreamingLm.readMergedCounts(spark, counts), all, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet == b)
    assert(StreamingLm.compactCounts(spark, counts) == 0)
  }
}
