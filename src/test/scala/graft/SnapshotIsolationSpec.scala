package graft

import graft.sim.{PqIndex, Similarity}
import graft.streaming.{Compaction, StreamingAnn}
import graft.text.{Dedup, LexIndex, Retrieval}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SNAPSHOT ISOLATION for readers of the maintained artifacts: a query
  * PLANNED before a concurrent fold / vacuum / recluster / retrain must
  * execute AFTER it without errors and return exactly its snapshot's
  * answer — never a path-not-found, never a double-read, never a mixed
  * generation. This is the versioned-root contract
  * ([[graft.streaming.Compaction]]): maintenance publishes a new
  * generation and flips a pointer; the previous generation and the
  * increments it needs survive one grace round, so any reader that
  * resolved before the flip keeps a complete view.
  *
  * Each test: capture the truth, BUILD a reader plan (Spark pins its file
  * listing at read time), run the maintenance op, then execute the held
  * plan — it must equal the truth — and a freshly-planned reader must see
  * the post-maintenance state. All four index families are covered:
  * lexical (BM25), maintained ANN (IVF), PQ (flat code table), and the
  * dedup signature index. */
class SnapshotIsolationSpec extends SparkSpec {

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString
  private val terms = Seq("join", "hash", "filter", "stream")

  private def bmSet(df: DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("lexical: readers planned before a concurrent fold and before a " +
       "pure-deletion vacuum execute unchanged; fresh readers see the " +
       "new generation") {
    val idx = tmp("graft_iso_lex")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    LexIndex.writeIndex(docs.filter(col("doc_id") % 3 =!= 2), "doc_id",
      "text", idx)
    LexIndex.appendBatch(docs.filter(col("doc_id") % 3 === 2), "doc_id",
      "text", idx, batchId = 0L)

    val truth = bmSet(LexIndex.bm25Indexed(spark, idx, terms))
    // reader A plans against base + increment, THEN the fold runs
    val heldA = LexIndex.bm25Indexed(spark, idx, terms)
    assert(LexIndex.compactIndex(spark, idx) == ((1, 1)))
    assert(bmSet(heldA) == truth,
      "a reader planned before the fold must execute unchanged after it")
    assert(bmSet(LexIndex.bm25Indexed(spark, idx, terms)) == truth,
      "a fresh reader sees the folded generation with identical scores")

    // reader B plans against the folded base, THEN a deletion campaign
    // vacuums it (base rewrite with no fold) — the reader's snapshot
    // predates the delete, so it still sees the full corpus
    val heldB = LexIndex.bm25Indexed(spark, idx, terms)
    LexIndex.deleteBatch(docs.filter(col("doc_id") % 5 === 1)
      .select("doc_id"), idx, batchId = 0L)
    LexIndex.compactIndex(spark, idx) // vacuum arm
    assert(bmSet(heldB) == truth,
      "a reader planned before the vacuum keeps its pre-delete snapshot")
    assert(bmSet(LexIndex.bm25Indexed(spark, idx, terms)) ==
      bmSet(Retrieval.bm25(docs.filter(col("doc_id") % 5 =!= 1),
        "doc_id", "text", terms)),
      "a fresh reader sees the post-vacuum corpus")
  }

  test("maintained ANN: readers planned before a concurrent fold and " +
       "before a recluster execute unchanged (the recluster flips " +
       "centroids + base together; the held reader keeps the OLD pair)") {
    val idx = tmp("graft_iso_ann")
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    StreamingAnn.writeBaseIndex(e.filter(col("vec_id") % 10 =!= 0),
      "vec_id", "embedding", "label", idx)
    Similarity.ivfAssign(e.filter(col("vec_id") % 10 === 0), "vec_id",
        "embedding",
        spark.read.parquet(Compaction.resolve(spark, idx, "centroids").get))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$idx/increments/batch=0")

    val q = e.filter(col("vec_id") < 10)
    def reader() = StreamingAnn.search(spark, idx, q, "vec_id",
      "embedding", k = 3, nProbe = 2)
    val truth = reader().collect().toSet

    val heldFold = reader()
    assert(StreamingAnn.compactIndex(spark, idx) == 1)
    assert(heldFold.collect().toSet == truth,
      "a search planned before the fold must execute unchanged after it")
    assert(reader().collect().toSet == truth,
      "assignment under frozen centroids distributes over union: the " +
        "folded generation searches identically")

    val heldRecluster = reader()
    StreamingAnn.reclusterIndex(spark, idx)
    assert(heldRecluster.collect().toSet == truth,
      "a search planned before the recluster keeps the old centroids AND " +
        "the old posting lists — one generation, never a mix")
    val fresh = reader().collect()
    assert(fresh.nonEmpty, "the fresh-quantizer generation serves")
  }

  test("PQ: readers planned before a concurrent fold and before a " +
       "retrain execute unchanged (the retrain flips codebook + codes " +
       "together; the held reader keeps the OLD pair)") {
    val idx = tmp("graft_iso_pq")
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cb = Similarity.pqTrain(e.select("vec_id", "embedding"),
      "embedding", m = 4, ksub = 8, maxIter = 2)
    PqIndex.writeIndex(e.filter(col("vec_id") % 10 =!= 0), "vec_id",
      "embedding", cb, idx)
    PqIndex.appendBatch(e.filter(col("vec_id") % 10 === 0), "vec_id",
      "embedding", idx, 0L)

    val q = e.filter(col("vec_id") < 5)
    def reader() = PqIndex.search(spark, idx, q, "vec_id", "embedding",
      k = 5)
    val truth = reader().collect().toSet

    val heldFold = reader()
    assert(PqIndex.compactIndex(spark, idx) == 1)
    assert(heldFold.collect().toSet == truth,
      "an ADC search planned before the fold must execute unchanged")
    assert(reader().collect().toSet == truth,
      "the folded code table searches identically")

    val heldRetrain = reader()
    PqIndex.retrainIndex(spark, idx, e, "vec_id", "embedding",
      m = 4, ksub = 8, maxIter = 2)
    assert(heldRetrain.collect().toSet == truth,
      "a search planned before the retrain keeps the old codebook AND " +
        "the old codes — mixed generations would decode garbage")
    assert(reader().collect().nonEmpty,
      "the retrained generation serves")
  }

  test("dedup signatures: a probe planned before a concurrent " +
       "fold-with-erasure executes unchanged; a fresh probe sees the " +
       "filtered index") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val idx = tmp("graft_iso_sig")
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text")
    Dedup.writeSignatureIndex(sig.filter(col("doc_id") % 3 =!= 2),
      "doc_id", idx)
    Dedup.appendSignatureIndex(sig.filter(col("doc_id") % 3 === 2),
      "doc_id", idx, 0L)

    def liveDocs() = Dedup.readSignatureIndex(spark, idx).bands
      .select("doc_id").distinct()
    val truth = liveDocs().collect().map(_.getLong(0)).toSet

    // plan, then fold (with a takedown landing in between — the held
    // plan's snapshot predates BOTH)
    val held = liveDocs()
    Dedup.deleteFromSignatureIndex(
      docs.filter(col("doc_id") % 2 === 0).select("doc_id"), idx, 0L)
    assert(Dedup.compactSignatureIndex(spark, idx) == 1)
    assert(held.collect().map(_.getLong(0)).toSet == truth,
      "a probe planned before the fold must execute unchanged after it")
    val fresh = liveDocs().collect().map(_.getLong(0)).toSet
    assert(fresh.nonEmpty && fresh.forall(_ % 2 == 1),
      "a fresh probe sees the physically-filtered generation")
  }

  test("the isolation window is one maintenance op: generations leave " +
       "grace after the second commit (documented contract, pinned here)") {
    val idx = tmp("graft_iso_window")
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    StreamingAnn.writeBaseIndex(e, "vec_id", "embedding", "label", idx)
    val gen0 = Compaction.resolve(spark, idx, "base").get
    StreamingAnn.reclusterIndex(spark, idx)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(gen0)),
      "the superseded generation survives its grace round")
    val gen1 = Compaction.resolve(spark, idx, "base").get
    StreamingAnn.reclusterIndex(spark, idx)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(gen0)),
      "two commits later the old generation is reaped")
    assert(fs.exists(new org.apache.hadoop.fs.Path(gen1)),
      "the most recent superseded generation is still in grace")
  }
}
