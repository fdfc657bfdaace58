package graft.streaming

import graft.ops.Merge
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** CDC apply-on-ingest: the streaming form of `ops.Merge.upsert`.
  *
  * Each micro-batch of change rows (op I/U/D + per-key version) merges into
  * the persisted snapshot; the result publishes as a new immutable
  * generation behind [[Compaction]]'s atomic pointer flip, so readers
  * always see a complete snapshot — including readers that resolved
  * BEFORE the apply (grace period) — and a crashed apply leaves the
  * previous generation fully live (uncommitted payload is GC'd).
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
    * and streaming paths). `basePath/current` must exist (via [[init]]).
    * The swap rides [[Compaction]]'s versioned-root protocol: the merged
    * snapshot publishes as a new immutable generation behind an atomic
    * pointer flip, so a reader that resolved [[readSnapshot]] before the
    * apply keeps a complete view through the grace period (one further
    * apply) — never a path-not-found mid-swap. */
  def applyBatch(spark: SparkSession, changes: DataFrame, basePath: String,
                 key: String, versionCol: String, opCol: String): Unit = {
    val base = readSnapshot(spark, basePath)
    Merge.upsert(base, changes, key, versionCol, opCol)
      .write.mode("overwrite").parquet(s"$basePath/current_new")
    Compaction.promote(spark, basePath, Seq("current"))
  }

  /** Seed the snapshot directory from an initial base table. */
  def init(base: DataFrame, basePath: String): Unit =
    base.write.mode("overwrite").parquet(s"$basePath/current")

  /** The live snapshot — resolve the pointer once per query
    * ([[Compaction.view]]; legacy pre-versioning layouts fall back to the
    * literal `current` directory). */
  def readSnapshot(spark: SparkSession, basePath: String): DataFrame =
    spark.read.parquet(Compaction.resolve(spark, basePath, "current")
      .getOrElse(s"$basePath/current"))

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
