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
}
