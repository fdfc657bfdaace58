package graft

import graft.streaming.StreamingDedup
import graft.text.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming dedup-on-ingest: each micro-batch probes the stored signature
  * index (corpus + prior batches) and absorbs itself as an increment; pairs
  * equal the batch-computed incremental results, and restating an increment
  * does not duplicate band rows. */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat sleeps near the warm fire " +
      "and the birds sing in the tall green trees above the quiet garden path"
  private val other =
    "completely different content about databases query engines shuffle partitions " +
      "aggregation pipelines and distributed execution frameworks running on clusters"
  private val third =
    "a third body of text describing harvest seasons orchards rainfall irrigation " +
      "schedules soil rotation and the long patient work of growing food every year"

  private def pairsOf(df: DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("stream probes corpus + prior increments and stays idempotent on restatement") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sdedup").toString
    val in = s"$dir/in"; val idx = s"$dir/idx"; val out = s"$dir/pairs"
    val chk = s"$dir/chk"

    // corpus: docs 1-3; doc 2 is unrelated, doc 3 a third topic
    val corpus = Seq((1L, base), (2L, other), (3L, third)).toDF("doc_id", "text")
    val corpusSig = Dedup.minhashSignatures(corpus, "doc_id", "text")
    Dedup.writeSignatureIndex(corpusSig, "doc_id", idx, nBuckets = 8)

    // batch A: doc 4 duplicates corpus doc 1; doc 5 near-dups doc 4 (in-batch)
    val batchA = Seq((4L, base), (5L, base.replace("quiet", "silent")))
      .toDF("doc_id", "text")
    batchA.write.parquet(in)
    StreamingDedup.dedupSink(
      spark.readStream.schema(schema).parquet(in),
      "doc_id", "text", idx, out, chk).start().awaitTermination()

    // batch B: doc 6 duplicates doc 4 — found only if batch A's INCREMENT is
    // probed, not just the original corpus
    Seq((6L, base)).toDF("doc_id", "text").write.mode("append").parquet(in)
    StreamingDedup.dedupSink(
      spark.readStream.schema(schema).parquet(in),
      "doc_id", "text", idx, out, chk).start().awaitTermination()

    val got = spark.read.parquet(out)
    val gotA = pairsOf(got.filter(col("batch") === 0))
    val gotB = pairsOf(got.filter(col("batch") === 1))

    // expected = the batch-computed incremental results at each step
    val sigA = Dedup.minhashSignatures(batchA, "doc_id", "text")
    val wantA = pairsOf(Dedup.incrementalCandidates(corpusSig, sigA, "doc_id"))
    val sigB = Dedup.minhashSignatures(Seq((6L, base)).toDF("doc_id", "text"),
      "doc_id", "text")
    val wantB = pairsOf(
      Dedup.incrementalCandidates(corpusSig.unionByName(sigA), sigB, "doc_id"))
    assert(gotA == wantA)
    assert(gotB == wantB)
    assert(gotA.contains((1L, 4L)))              // corpus hit
    assert(gotA.contains((4L, 5L)))              // within-batch near-dup
    assert(Set((1L, 6L), (4L, 6L)).subsetOf(gotB)) // prior-increment hit

    // restating an increment overwrites, never duplicates
    val before = Dedup.readSignatureIndex(spark, idx).bands.count()
    Dedup.appendSignatureIndex(sigA, "doc_id", idx, batchId = 0L)
    val after = Dedup.readSignatureIndex(spark, idx).bands.count()
    assert(before == after)

    // compaction folds increments into base bands; probes are unchanged
    val probeBefore = pairsOf(Dedup.incrementalCandidatesIndexed(
      Dedup.readSignatureIndex(spark, idx), sigB, "doc_id"))
    Dedup.compactSignatureIndex(spark, idx)
    val compacted = Dedup.readSignatureIndex(spark, idx)
    assert(compacted.bands.count() == before)
    assert(graft.streaming.Compaction
      .incrementCount(spark, idx, "bands") == 0,
      "no LIVE increment may remain (folded dirs stay one grace round)")
    val probeAfter = pairsOf(Dedup.incrementalCandidatesIndexed(compacted, sigB, "doc_id"))
    assert(probeBefore == probeAfter)
  }

  test("cluster sink: the streamed assignment equals from-scratch " +
       "clustering of everything seen so far") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scluster").toString
    val in = s"$dir/in"; val idx = s"$dir/idx"; val out = s"$dir/pairs"
    val asg = s"$dir/assign"; val chk = s"$dir/chk"

    val corpus = Seq((1L, base), (2L, other), (3L, third)).toDF("doc_id", "text")
    Dedup.writeSignatureIndex(
      Dedup.minhashSignatures(corpus, "doc_id", "text"), "doc_id", idx,
      nBuckets = 8)
    // seed the pre-stream corpus assignment as batch=-1
    val corpusPairs = Dedup.minhashCandidates(
        Dedup.minhashSignatures(corpus, "doc_id", "text"), "doc_id")
      .filter(col("est_jaccard") >= 0.5)
    Dedup.dedupClusters(corpus, corpusPairs, "doc_id")
      .select("doc_id", "cluster_id").write.parquet(s"$asg/batch=-1")

    // batch A: 4 dups corpus doc 1, 5 near-dups 4; batch B: 6 dups 4
    val batchA = Seq((4L, base), (5L, base.replace("quiet", "silent")))
      .toDF("doc_id", "text")
    batchA.write.parquet(in)
    StreamingDedup.dedupClusterSink(
      spark.readStream.schema(schema).parquet(in),
      "doc_id", "text", idx, out, asg, chk).start().awaitTermination()
    Seq((6L, base)).toDF("doc_id", "text").write.mode("append").parquet(in)
    StreamingDedup.dedupClusterSink(
      spark.readStream.schema(schema).parquet(in),
      "doc_id", "text", idx, out, asg, chk).start().awaitTermination()

    val streamed = StreamingDedup.latestAssignment(spark, asg, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // from-scratch truth over all 6 docs
    val all = corpus.unionByName(batchA)
      .unionByName(Seq((6L, base)).toDF("doc_id", "text"))
    val truth = Dedup.dedupClusters(all,
        Dedup.minhashCandidates(
          Dedup.minhashSignatures(all, "doc_id", "text"), "doc_id")
          .filter(col("est_jaccard") >= 0.5), "doc_id")
      .select("doc_id", "cluster_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == truth)
    assert(streamed(6L) == 1L && streamed(5L) == 1L) // chain through batches
    assert(streamed(2L) == 2L && streamed(3L) == 3L) // singletons untouched

    // pruning drops superseded snapshots (batch=-1 here), keeps the
    // latest two, and the current assignment read is unchanged
    assert(StreamingDedup.pruneAssignments(spark, asg, keepLast = 2) == 1)
    val afterPrune = StreamingDedup.latestAssignment(spark, asg, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(afterPrune == streamed,
      "pruning history must not change the current assignment")
    assert(StreamingDedup.pruneAssignments(spark, asg, keepLast = 2) == 0)
  }

  test("cluster sink bootstraps a string-id corpus with no batch=-1 seed") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sidstr").toString
    val in = s"$dir/in"; val idx = s"$dir/idx"; val out = s"$dir/pairs"
    val asg = s"$dir/assign"; val chk = s"$dir/chk"
    val sidSchema = StructType(Seq(
      StructField("doc_id", StringType), StructField("text", StringType)))

    // cold start: the index is written over an EMPTY string-keyed corpus and
    // no assignment seed exists — the first micro-batch must union its
    // string ids against the bootstrap frame (the old LongType hardcode
    // made exactly this path throw)
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], sidSchema)
    Dedup.writeSignatureIndex(Dedup.minhashSignatures(empty, "doc_id", "text"),
      "doc_id", idx, nBuckets = 8)
    Seq(("a", base), ("b", base.replace("quiet", "silent")), ("c", other))
      .toDF("doc_id", "text").write.parquet(in)
    StreamingDedup.dedupClusterSink(
      spark.readStream.schema(sidSchema).parquet(in),
      "doc_id", "text", idx, out, asg, chk).start().awaitTermination()

    val streamed = StreamingDedup.latestAssignment(spark, asg, "doc_id",
        StringType)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(streamed == Map("a" -> "a", "b" -> "a", "c" -> "c"))
  }

  test("drained DELETE stream ≡ batch deleteFromSignatureIndex: the " +
       "deleted docs stop matching probes; fold erases the band rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sdeldel").toString
    val idx = s"$dir/index"; val twin = s"$dir/twin"
    val docs = Seq((1L, base), (2L, base.replace("quiet", "silent")),
      (3L, other), (4L, third)).toDF("doc_id", "text")
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text")
    Dedup.writeSignatureIndex(sig, "doc_id", idx)
    Dedup.writeSignatureIndex(sig, "doc_id", twin)
    Dedup.deleteFromSignatureIndex(
      docs.filter(col("doc_id") === 1L).select("doc_id"), twin, 0L)

    val in = s"$dir/delin"
    docs.filter(col("doc_id") === 1L).select("doc_id").write.parquet(in)
    StreamingDedup.tombstoneSink(
        spark.readStream.schema(StructType(Seq(
          StructField("doc_id", LongType)))).parquet(in),
        idx, s"$dir/chkdel")
      .start().awaitTermination()

    // a near-dup of the deleted doc probes as if the index never held it
    val probe = Dedup.minhashSignatures(
      Seq((9L, base.replace("warm", "cold"))).toDF("doc_id", "text"),
      "doc_id", "text")
    def matches(p: String) = pairsOf(Dedup.incrementalCandidatesIndexed(
      Dedup.readSignatureIndex(spark, p), probe, "doc_id"))
    assert(matches(idx) == matches(twin),
      "the drained delete stream must equal the batch delete")
    assert(!matches(idx).exists(t => t._1 == 1L || t._2 == 1L))
    // fold-driven physical erasure attested by the audit
    Dedup.compactSignatureIndex(spark, idx)
    val audit = Dedup.erasureAudit(spark, idx).head()
    assert(audit.getBoolean(audit.fieldIndex("physically_clean")))
    assert(matches(idx) == matches(twin))
  }

  test("drift-triggered rebuild: calm → no-op; breach → one base at the " +
       "re-derived width, probes ≡ from-scratch over live members, " +
       "terminality survives") {
    import graft.streaming.Compaction
    val dir = java.nio.file.Files.createTempDirectory("graft_sdreb").toString
    val idx = s"$dir/index"
    val docs = Seq((1L, base), (2L, other), (3L, third),
      (4L, base.replace("quiet", "silent"))).toDF("doc_id", "text")
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text")
      .localCheckpoint(true)
    // seed at a deliberately tiny width — the aged-layout starting state
    Dedup.writeSignatureIndex(sig.filter(col("doc_id") =!= 4L), "doc_id",
      idx, nBuckets = 8)
    // no live increments: nothing to compare — never a rebuild
    assert(!Dedup.rebuildSignatureIndexIfDrifted(spark, idx, maxDrift = 0.0))
    Dedup.appendSignatureIndex(sig.filter(col("doc_id") === 4L), "doc_id",
      idx, 0L)
    val probe = Dedup.minhashSignatures(
      Seq((9L, base.replace("warm", "cold"))).toDF("doc_id", "text"),
      "doc_id", "text")
    def matches() = pairsOf(Dedup.incrementalCandidatesIndexed(
      Dedup.readSignatureIndex(spark, idx), probe, "doc_id"))
    val before = matches()
    // calm: band L1 is ≤ 2 by construction — a generous threshold leaves
    // the index untouched (increment still live, width still 8)
    assert(!Dedup.rebuildSignatureIndexIfDrifted(spark, idx,
      maxDrift = 100.0))
    assert(Compaction.incrementCount(spark, idx, "bands") == 1)
    assert(Dedup.readSignatureIndex(spark, idx).nBuckets == 8)
    // a takedown BEFORE the rebuild: the new base must exclude the victim
    Dedup.deleteFromSignatureIndex(
      docs.filter(col("doc_id") === 2L).select("doc_id"), idx, 1L)
    // breach: the delta always drifts above 0 → fold + fresh layout
    assert(Dedup.rebuildSignatureIndexIfDrifted(spark, idx, maxDrift = 0.0))
    assert(Compaction.incrementCount(spark, idx, "bands") == 0,
      "the rebuild must subsume every increment")
    val width = Dedup.readSignatureIndex(spark, idx).nBuckets
    assert(width == Dedup.deriveBuckets(
      Dedup.readSignatureIndex(spark, idx).bands.count()),
      "meta must carry the deriveBuckets width")
    assert(width != 8, "the seed layout must have been retired")
    // probes ≡ a from-scratch index over the live membership at the same
    // width (docs 1,3,4 — doc 2 tombstoned)
    val scratch = s"$dir/scratch"
    Dedup.writeSignatureIndex(sig.filter(col("doc_id") =!= 2L), "doc_id",
      scratch, nBuckets = width)
    assert(matches() == pairsOf(Dedup.incrementalCandidatesIndexed(
      Dedup.readSignatureIndex(spark, scratch), probe, "doc_id")))
    assert(matches() == before,
      "a pure fold + relayout must not move a single pair")
    // terminality under the new layout: re-ingesting the deleted doc is
    // suppressed (its band rows never re-enter a probe)
    Dedup.appendSignatureIndex(sig.filter(col("doc_id") === 2L), "doc_id",
      idx, 2L)
    assert(Dedup.readSignatureIndex(spark, idx).bands
      .filter(col("doc_id") === 2L).isEmpty)
  }
}
