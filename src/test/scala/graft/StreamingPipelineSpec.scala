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

  test("streamed ingest → dedup → cluster over the documents corpus " +
       "equals the from-scratch clustering (the q155 truth, composed)") {
    // The pieces are each proven ≡ batch (StreamingDedupSpec fixtures,
    // q155's oracle); composition over a real corpus through a file source
    // is where watermark/state/index bugs would live — so run the full
    // chain: landed parquet batches → StreamingIngest file stream →
    // StreamingDedup cluster sink advancing a stored index + assignment
    // across TWO micro-batch rounds, then compare the final assignment to
    // clustering everything from scratch.
    import graft.streaming.StreamingDedup
    import graft.text.Dedup
    val dir = java.nio.file.Files.createTempDirectory("graft_spipe2").toString
    val in = s"$dir/in"; val idx = s"$dir/idx"; val out = s"$dir/pairs"
    val asg = s"$dir/assign"; val chk = s"$dir/chk"

    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 5 < 3)
    val batchA = docs.filter(col("doc_id") % 5 === 3)
    val batchB = docs.filter(col("doc_id") % 5 === 4)

    // pre-stream state: signature index + seed assignment over the corpus
    val corpusSig = Dedup.minhashSignatures(corpus, "doc_id", "text")
    Dedup.writeSignatureIndex(corpusSig, "doc_id", idx, nBuckets = 8)
    Dedup.dedupClusters(corpus,
        Dedup.minhashCandidates(corpusSig, "doc_id")
          .filter(col("est_jaccard") >= 0.5), "doc_id")
      .select("doc_id", "cluster_id").write.parquet(s"$asg/batch=-1")

    // two streamed rounds over the same landed-file source
    val schema = docs.schema
    batchA.write.parquet(in)
    StreamingDedup.dedupClusterSink(
      graft.streaming.StreamingIngest.readDocs(spark, schema, in),
      "doc_id", "text", idx, out, asg, chk).start().awaitTermination()
    batchB.write.mode("append").parquet(in)
    StreamingDedup.dedupClusterSink(
      graft.streaming.StreamingIngest.readDocs(spark, schema, in),
      "doc_id", "text", idx, out, asg, chk).start().awaitTermination()

    val streamed = StreamingDedup.latestAssignment(spark, asg, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val truth = Dedup.dedupClusters(docs,
        Dedup.minhashCandidates(
          Dedup.minhashSignatures(docs, "doc_id", "text"), "doc_id")
          .filter(col("est_jaccard") >= 0.5), "doc_id")
      .select("doc_id", "cluster_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed.size == truth.size)
    assert(streamed == truth)
    // sanity on the structure: real near-dup clusters exist (not all
    // singletons), so the equality above is not vacuous
    assert(truth.values.groupBy(identity).exists(_._2.size > 1))
  }
}
