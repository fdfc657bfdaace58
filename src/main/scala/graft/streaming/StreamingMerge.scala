package graft.streaming

import graft.ops.Merge
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** CDC apply-on-ingest: the streaming form of `ops.Merge.upsert`.
  *
  * Each micro-batch of change rows (op I/U/D + per-key version) merges into
  * the persisted snapshot; the result is written beside the live snapshot
  * and swapped in with renames, so readers always see a complete snapshot
  * and a crashed apply leaves the previous one untouched (the same
  * write-sibling-then-swap shape as `Dedup.compactSignatureIndex`).
  *
  * Replay safety comes from the merge semantics themselves: applying the
  * same change batch onto the post-apply snapshot is a no-op — a re-applied
  * 'U'/'I' outranks the snapshot row it already produced (same bytes win
  * again), a re-applied 'D' deletes an already-absent key. So a retried
  * micro-batch restates the snapshot instead of corrupting it; no
  * batch-id bookkeeping is needed beyond the checkpoint itself
  * (StreamingMergeSpec proves apply∘apply = apply). The contract covers
  * exactly Structured Streaming's retry shape — the LAST uncommitted batch
  * re-runs; replaying an OLDER batch by hand would regress its keys
  * (snapshot rows ride at version 0) and is outside the contract.
  *
  * State is the parquet snapshot, not executor memory: driver restarts are
  * cheap and snapshot size tracks the keyspace, not the stream history.
  */
object StreamingMerge {

  /** One merge application onto the stored snapshot (shared by the batch
    * and streaming paths). `basePath/current` must exist. */
  def applyBatch(spark: SparkSession, changes: DataFrame, basePath: String,
                 key: String, versionCol: String, opCol: String): Unit = {
    val base = spark.read.parquet(s"$basePath/current")
    Merge.upsert(base, changes, key, versionCol, opCol)
      .write.mode("overwrite").parquet(s"$basePath/next")
    val fs = new org.apache.hadoop.fs.Path(basePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s"$basePath/$s")
    fs.delete(p("old"), true)
    fs.rename(p("current"), p("old"))
    fs.rename(p("next"), p("current"))
    fs.delete(p("old"), true): Unit
  }

  /** Seed the snapshot directory from an initial base table. */
  def init(base: DataFrame, basePath: String): Unit =
    base.write.mode("overwrite").parquet(s"$basePath/current")

  /** foreachBatch sink applying each micro-batch of changes to the
    * snapshot at `basePath/current`. */
  def upsertSink(changes: DataFrame, basePath: String, key: String,
                 versionCol: String, opCol: String,
                 checkpoint: String): DataStreamWriter[Row] =
    changes.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          applyBatch(batch.sparkSession, batch, basePath, key, versionCol, opCol)
      }
      .option("checkpointLocation", checkpoint)
      .outputMode("update").trigger(Trigger.AvailableNow())
}
