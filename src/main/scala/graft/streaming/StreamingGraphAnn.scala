package graft.streaming

import graft.sim.GraphAnnIndex
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** Streaming maintenance of the stored GRAPH ANN index — the
  * [[StreamingAnn]] contract on the navigable-small-world axis: each
  * micro-batch lands its bucket-annotated vectors as an idempotent
  * increment and restates exactly the touched LSH bucket groups' edges
  * over the live membership, so the maintained graph keeps equaling a
  * from-scratch build edge for edge (GraphAnnSpec pins it). The ingest
  * and DELETE streams replay independently: vector landings key on the
  * stream batch id (restatement, watermark guard), edge restatements on
  * the index's own logical clock (see
  * [[graft.sim.GraphAnnIndex.appendBatch]]), and tombstones carry their
  * own watermark. Increments fold with
  * [[graft.sim.GraphAnnIndex.compactIndexIfNeeded]] between streams. */
object StreamingGraphAnn {

  /** foreachBatch sink: land each micro-batch into the maintained graph.
    * `indexPath` must already hold a base written by
    * [[graft.sim.GraphAnnIndex.writeIndex]]. */
  def graphSink(df: DataFrame, id: String, emb: String, indexPath: String,
                checkpoint: String): DataStreamWriter[Row] =
    df.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // no isEmpty pre-pass (an extra job per micro-batch — the shape
        // StreamingLex retired): appendBatch's own touched-groups collect
        // detects and skips an empty batch
        GraphAnnIndex.appendBatch(batch, id, emb, indexPath, batchId)
      }
      .option("checkpointLocation", checkpoint)
      .outputMode("update").trigger(Trigger.AvailableNow())

  /** foreachBatch sink for a DELETE stream (takedown vec_ids): tombstone
    * + touched-group edge repair per micro-batch — logically gone AND
    * scratch-exact from the next search; physically erased at the next
    * [[graft.sim.GraphAnnIndex.compactIndex]]; terminal against
    * re-ingest. */
  def tombstoneSink(ids: DataFrame, indexPath: String,
                    checkpoint: String): DataStreamWriter[Row] =
    ids.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        GraphAnnIndex.deleteBatch(batch, indexPath, batchId): Unit
      }
      .option("checkpointLocation", checkpoint)
      .outputMode("update").trigger(Trigger.AvailableNow())

  /** Beam search over the maintained graph. */
  def search(spark: SparkSession, indexPath: String, queries: DataFrame,
             id: String, emb: String, k: Int, beam: Int = 24,
             rounds: Int = 6, nEntries: Int = 16): DataFrame =
    GraphAnnIndex.search(spark, indexPath, queries, id, emb, k, beam,
      rounds, nEntries)
}
