package graft

import graft.streaming.StreamingIngest
import org.apache.spark.sql.functions._

/** End-to-end streaming ingest of the reference's quote documents: landed
  * doc stream → struct flatten → watermarked dedup → hourly last-price
  * aggregate → parquet sink, equal to the batch formulation on the same
  * data (SURVEY.md §2.9: the streaming path must be semantics-preserving
  * w.r.t. the batch baseline). */
class StreamingPipelineSpec extends SparkSpec {

  test("streamed quote pipeline ≡ batch pipeline") {
    val dir = java.nio.file.Files.createTempDirectory("graft_spipe").toString
    val in = s"$dir/in"; val out = s"$dir/out"; val chk = s"$dir/chk"

    // land the fixture docs (with injected duplicates) as the source dir
    val docs = Fixtures.quotes(spark).limit(400)
    docs.write.parquet(in)

    // streaming: read docs → flatten → dedup(symbol, ts) → hourly last c
    val stream = StreamingIngest.readDocs(spark, docs.schema, in)
      .select(col("symbol"), col("timestamp"), col("data.c").as("c"))
      .filter(col("c").isNotNull)
    val deduped = StreamingIngest.dedupWithinWatermark(stream, "timestamp",
      "2 hours", Seq("symbol"))
    val q = StreamingIngest.appendSink(deduped, out, chk).start()
    q.awaitTermination()
    val hourlyStream = spark.read.parquet(out)
      .groupBy(col("symbol"), date_trunc("hour", col("timestamp")).as("hour"))
      .agg(max_by(col("c"), col("timestamp")).as("last_c"))

    // batch baseline on the same source
    val hourlyBatch = spark.read.parquet(in)
      .select(col("symbol"), col("timestamp"), col("data.c").as("c"))
      .filter(col("c").isNotNull)
      .dropDuplicates(Seq("symbol", "timestamp"))
      .groupBy(col("symbol"), date_trunc("hour", col("timestamp")).as("hour"))
      .agg(max_by(col("c"), col("timestamp")).as("last_c"))

    val a = hourlyStream.orderBy("symbol", "hour").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2)))
    val b = hourlyBatch.orderBy("symbol", "hour").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2)))
    assert(a.nonEmpty && a.sameElements(b))
  }
}
