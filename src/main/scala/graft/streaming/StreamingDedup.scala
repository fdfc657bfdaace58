package graft.streaming

import graft.text.Dedup
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** Dedup-on-ingest: the streaming form of the daily-refresh loop.
  *
  * Each micro-batch of documents is MinHash-signed, probed against the
  * STORED signature index (base corpus bands + all prior batches'
  * increments, bucket-pruned to just the buckets this batch touches), and
  * then absorbed into the index as its own increment. Candidate pairs land
  * partitioned by batch. Within-batch duplicates surface too (the band join
  * includes new×new pairs).
  *
  * Idempotence: a retried micro-batch overwrites exactly its own
  * `pairs/batch=<id>` and `index/increments/batch=<id>` directories, so
  * replays restate rather than duplicate — no other batch's output is
  * touched. State is the parquet index itself, not executor memory: the
  * driver restarts cheaply, and index size is ~1% of corpus bytes (band
  * keys + signatures, no text).
  */
object StreamingDedup {

  /** foreachBatch sink wiring `docs` (a streaming DataFrame) through the
    * probe-then-absorb loop. `indexPath` must already hold a corpus index
    * written by `Dedup.writeSignatureIndex` (possibly over an empty corpus).
    */
  def dedupSink(docs: DataFrame, id: String, text: String, indexPath: String,
                pairsPath: String, checkpoint: String): DataStreamWriter[Row] =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val sig = Dedup.minhashSignatures(batch, id, text)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val index = Dedup.readSignatureIndex(spark, indexPath)
          Dedup.incrementalCandidatesIndexed(index, sig, id)
            .write.mode("overwrite").parquet(s"$pairsPath/batch=$batchId")
          Dedup.appendSignatureIndex(sig, id, indexPath, batchId)
          sig.unpersist()
        }: Unit
      }
      .option("checkpointLocation", checkpoint)
      .outputMode("update").trigger(Trigger.AvailableNow())
}
