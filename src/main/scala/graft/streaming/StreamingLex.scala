package graft.streaming

import graft.text.LexIndex
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** Streaming maintenance of the stored LEXICAL index — the
  * [[StreamingAnn]] contract on the BM25 axis: each micro-batch's term
  * postings and doc lengths land as idempotent `increments/batch=<id>`
  * directories under [[graft.text.LexIndex]]'s layout; the maintained
  * index is the directory union, and because (term, doc, tf) / (doc, dl)
  * rows are union-distributive over an append-only corpus,
  * [[graft.text.LexIndex.bm25Indexed]] over it scores identically to a
  * from-scratch [[graft.text.Retrieval.bm25]] over everything ingested
  * (StreamingLexSpec pins it). Retried batches overwrite exactly their
  * own directories (restatement, never duplication); increments fold with
  * [[graft.text.LexIndex.compactIndex]] between streams. */
object StreamingLex {

  /** foreachBatch sink: land each micro-batch's postings + doc lengths as
    * their own increment directories. `indexPath` must already hold a base
    * written by [[graft.text.LexIndex.writeIndex]] (possibly over an empty
    * corpus). */
  def lexSink(docs: DataFrame, id: String, text: String, indexPath: String,
              checkpoint: String): DataStreamWriter[Row] =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          LexIndex.appendBatch(batch, id, text, indexPath, batchId)
      }
      .option("checkpointLocation", checkpoint)
      .outputMode("update").trigger(Trigger.AvailableNow())

  /** foreachBatch sink for a DELETE stream (takedown doc_ids): each
    * micro-batch lands as a tombstone increment
    * ([[graft.text.LexIndex.deleteBatch]] — its own watermark, so the
    * ingest and delete streams replay independently). Logically gone from
    * the next read, physically gone at the next
    * [[graft.text.LexIndex.compactIndex]]; terminal against re-ingest. */
  def tombstoneSink(docIds: DataFrame, indexPath: String,
                    checkpoint: String): DataStreamWriter[Row] =
    docIds.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        LexIndex.deleteBatch(batch, indexPath, batchId): Unit
      }
      .option("checkpointLocation", checkpoint)
      .outputMode("update").trigger(Trigger.AvailableNow())
}
