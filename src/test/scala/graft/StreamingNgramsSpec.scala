package graft

import graft.analytics.Behavior
import graft.streaming.StreamingNgrams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stateful streaming n-gram mining ≡ the batch lead-window extraction,
  * including across micro-batch boundaries (the state must stitch the
  * tail of one batch to the head of the next). */
class StreamingNgramsSpec extends SparkSpec {
  import spark.implicits._

  test("streamed n-grams across batch splits equal the batch extraction") {
    implicit val sqlCtx = spark.sqlContext
    // real driver fixture, deterministically split into two batches
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_id"), col("event_type"))
      .collect()
      .map(r => StreamingNgrams.Ev(r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_.seq)
    val (first, second) = events.splitAt(events.length / 2)

    val input = MemoryStream[StreamingNgrams.Ev]
    val q = StreamingNgrams.ngrams(input.toDS(), n = 3)
      .writeStream.format("memory").queryName("sngrams")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    input.addData(first.toSeq: _*)
    q.processAllAvailable()
    input.addData(second.toSeq: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("sngrams")
      .groupBy("ngram").agg(count(lit(1)).as("n_occurrences"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // batch truth: event_id IS the per-user order (ts ties break on it)
    val batch = Behavior.eventNgrams(
        Tables.events(spark, "/root/testdata/sf0.001"), "user_id", "event_id",
        "event_type", Nil, n = 3, topK = Int.MaxValue)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch, s"streamed ${streamed.size} vs batch ${batch.size}")
    assert(streamed.values.sum > 0)
  }

  test("cross-batch ordering contract: a seq regression throws") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingNgrams.Ev]
    val q = StreamingNgrams.ngrams(input.toDS(), n = 2)
      .writeStream.format("memory").queryName("sngrams_bad")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    input.addData(StreamingNgrams.Ev(1L, 10L, "a"))
    q.processAllAvailable()
    input.addData(StreamingNgrams.Ev(1L, 5L, "b")) // regresses: 5 < 10
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    assert(ex.getMessage.contains("out-of-order") ||
      Option(ex.getCause).exists(_.getMessage.contains("out-of-order")))
    q.stop()
  }
}
