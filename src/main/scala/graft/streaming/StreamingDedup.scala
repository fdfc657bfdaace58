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

  /** [[dedupSink]] extended through CLUSTERING: each micro-batch also
    * advances the cluster assignment with `Dedup.incrementalClusters` and
    * lands it as `assignPath/batch=<id>` (the max-batch directory is the
    * current assignment; seed the pre-stream corpus assignment as
    * `batch=-1`). Retries are harmless twice over: a replayed batch
    * restates its own pairs/increment/assignment directories, and
    * re-applying the same pairs to an already-advanced assignment yields
    * identical labels (the CC of the same components plus their own star
    * edges is unchanged). The previous assignment is MATERIALIZED
    * (`localCheckpoint`) before the write, so a replayed batch can safely
    * overwrite the very directory it just read. */
  def dedupClusterSink(docs: DataFrame, id: String, text: String,
                       indexPath: String, pairsPath: String,
                       assignPath: String, checkpoint: String,
                       minJaccard: Double = 0.5): DataStreamWriter[Row] =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val sig = Dedup.minhashSignatures(batch, id, text)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val index = Dedup.readSignatureIndex(spark, indexPath)
          Dedup.incrementalCandidatesIndexed(index, sig, id)
            .write.mode("overwrite").parquet(s"$pairsPath/batch=$batchId")
          val pairs = spark.read.parquet(s"$pairsPath/batch=$batchId")
            .filter(col("est_jaccard") >= minJaccard)
          val prev = latestAssignment(spark, assignPath, id,
              batch.schema(id).dataType)
            .transform(graft.ops.Checkpoint.cut(_, eager = true))
          Dedup.incrementalClusters(prev, batch.select(col(id)), pairs, id)
            .select(col(id), col("cluster_id"))
            .write.mode("overwrite").parquet(s"$assignPath/batch=$batchId")
          Dedup.appendSignatureIndex(sig, id, indexPath, batchId)
          sig.unpersist()
        }: Unit
      }
      .option("checkpointLocation", checkpoint)
      .outputMode("update").trigger(Trigger.AvailableNow())

  /** foreachBatch sink for a DELETE stream (takedown doc_ids) — the
    * [[StreamingLex.tombstoneSink]] contract on the dedup axis: each
    * micro-batch lands as a tombstone increment under the signature index
    * with its own watermark (the ingest and delete streams replay
    * independently). The deleted docs' band rows are logically gone from
    * the next probe — a future near-dup of a deleted doc becomes its own
    * keeper, exactly as if the index had been built from the filtered
    * corpus — physically gone at the next
    * [[graft.text.Dedup.compactSignatureIndex]], and terminal against
    * re-ingest. Assignment SNAPSHOTS of other docs are untouched (a
    * cluster label is not the doc's content). */
  def tombstoneSink(docIds: DataFrame, indexPath: String,
                    checkpoint: String): DataStreamWriter[Row] =
    docIds.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Dedup.deleteFromSignatureIndex(batch, indexPath, batchId): Unit
      }
      .option("checkpointLocation", checkpoint)
      .outputMode("update").trigger(Trigger.AvailableNow())

  /** The current (max-batch) cluster assignment under `assignPath`, or an
    * empty (id, cluster_id) frame before any batch landed. `idType` is the
    * doc-id type of the corpus (cluster_id = min reachable id shares it) —
    * pass the batch schema's type so a string-keyed corpus bootstraps
    * without a union type mismatch on the first micro-batch. */
  def latestAssignment(spark: org.apache.spark.sql.SparkSession,
                       assignPath: String, id: String,
                       idType: org.apache.spark.sql.types.DataType =
                         org.apache.spark.sql.types.LongType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(assignPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val latest =
      if (fs.exists(p))
        fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName)
          .filter(_.startsWith("batch=")).map(_.stripPrefix("batch=").toLong)
          .sorted.lastOption
      else None
    latest match {
      case Some(b) => spark.read.parquet(s"$assignPath/batch=$b")
      case None =>
        import org.apache.spark.sql.types.{StructField, StructType}
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
          StructType(Seq(StructField(id, idType),
            StructField("cluster_id", idType))))
    }
  }

  /** Prune superseded assignment snapshots: every batch directory except
    * the `keepLast` most recent is deleted. [[latestAssignment]] only ever
    * reads the max batch — each snapshot is a FULL assignment, not an
    * increment — so older directories are pure history; without pruning
    * the tree grows one corpus-sized directory per micro-batch forever
    * (the assignment-side counterpart of [[graft.streaming.Compaction]]'s
    * increment folding). Keep ≥ 1 so a replayed batch that overwrites its
    * own directory still has the prior snapshot to read. Returns the
    * number of directories deleted; run between streams. */
  def pruneAssignments(spark: org.apache.spark.sql.SparkSession,
                       assignPath: String, keepLast: Int = 2): Int = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val p = new org.apache.hadoop.fs.Path(assignPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return 0
    val batches = fs.listStatus(p).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong).sorted
    val drop = batches.dropRight(keepLast)
    drop.foreach(b =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$assignPath/batch=$b"), true))
    if (drop.nonEmpty) spark.catalog.refreshByPath(assignPath)
    drop.length
  }

  /** The [[pruneAssignments]] trigger: prune iff more than `maxSnapshots`
    * assignment snapshots have accumulated (one directory listing below
    * threshold), keeping the newest `keepLast`. Call after every stream
    * run and superseded snapshots never pile up. */
  def pruneIfNeeded(spark: org.apache.spark.sql.SparkSession,
                    assignPath: String, maxSnapshots: Int,
                    keepLast: Int = 2): Int = {
    require(maxSnapshots >= keepLast,
      s"maxSnapshots ($maxSnapshots) must be >= keepLast ($keepLast)")
    val p = new org.apache.hadoop.fs.Path(assignPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val n = if (!fs.exists(p)) 0
      else fs.listStatus(p).count(s =>
        s.isDirectory && s.getPath.getName.startsWith("batch="))
    if (n > maxSnapshots) pruneAssignments(spark, assignPath, keepLast)
    else 0
  }
}
