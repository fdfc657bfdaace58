package graft.streaming

import graft.sim.{PqIndex, Similarity}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** Streaming maintenance of the stored PQ index — the [[StreamingAnn]]
  * contract on the compression axis: each micro-batch PQ-encodes under
  * the STORED (frozen) codebook and lands as an idempotent
  * `codes/increments/batch=<id>` directory; because encoding under a
  * fixed codebook is a pure per-row function, the maintained code table
  * is value-identical to a from-scratch encode of everything ingested
  * (PqIndexSpec/StreamingPqSpec pin it). Retried batches restate their
  * own directory; batches already folded into the base are dropped by
  * the watermark guard; increments fold with
  * [[graft.sim.PqIndex.compactIndexIfNeeded]] between streams; and
  * codebook aging is watched by [[graft.sim.PqIndex.codeUsageDrift]]
  * with [[graft.sim.PqIndex.retrainIndexIfDrifted]] as the recluster
  * arm (the retrain promotes codebook+codes together and restarts the
  * increments). */
object StreamingPq {

  /** foreachBatch sink: encode each micro-batch under the stored
    * codebook and land it as its own increment. `indexPath` must already
    * hold a base written by [[graft.sim.PqIndex.writeIndex]]. */
  def pqSink(df: DataFrame, id: String, emb: String, indexPath: String,
             checkpoint: String): DataStreamWriter[Row] =
    df.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          PqIndex.appendBatch(batch, id, emb, indexPath, batchId)
      }
      .option("checkpointLocation", checkpoint)
      .outputMode("update").trigger(Trigger.AvailableNow())

  /** foreachBatch sink for a DELETE stream (takedown vec_ids) — the
    * [[StreamingLex.tombstoneSink]] / [[StreamingAnn.tombstoneSink]]
    * contract on the compressed tier: each micro-batch lands as a
    * tombstone increment with its own watermark, so the ingest and
    * delete streams replay independently. Logically gone from the next
    * [[search]]; physically erased at the next
    * [[graft.sim.PqIndex.compactIndex]] / retrain; terminal against
    * re-ingest. */
  def tombstoneSink(ids: DataFrame, indexPath: String,
                    checkpoint: String): DataStreamWriter[Row] =
    ids.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        PqIndex.deleteBatch(batch, indexPath, batchId): Unit
      }
      .option("checkpointLocation", checkpoint)
      .outputMode("update").trigger(Trigger.AvailableNow())

  /** ADC search over the maintained code table (one pointer view:
    * codebook + codes resolve together — [[graft.sim.PqIndex.search]]). */
  def search(spark: SparkSession, indexPath: String, queries: DataFrame,
             id: String, emb: String, k: Int): DataFrame =
    PqIndex.search(spark, indexPath, queries, id, emb, k)
}
