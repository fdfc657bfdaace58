package graft

import graft.text.{Mix, TextOps}
import org.apache.spark.sql.functions._

/** Training-data mixing + quality-signal operators: deterministic sampling /
  * splits / budgets (stable under re-runs and corpus growth), repetition
  * ratios, PII scrubbing. */
class MixSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (0L until 200L).map(i =>
    (i, s"src${i % 4}", Seq.fill((i % 7).toInt + 1)(s"tok$i").mkString(" ")))
    .toDF("doc_id", "source", "text")

  test("stratified sample honors exact 0/1 rates and is deterministic") {
    val s = Mix.stratifiedSample(docs, "doc_id", "source",
      Map("src0" -> 0.0), defaultRate = 1.0)
    val srcs = s.select("source").distinct().as[String].collect().toSet
    assert(!srcs.contains("src0") && srcs == Set("src1", "src2", "src3"))
    assert(s.count() == 150) // rate 1.0 keeps every non-src0 row
    val mid = Mix.stratifiedSample(docs, "doc_id", "source", Map.empty, 0.5)
    assert(mid.count() == Mix.stratifiedSample(docs, "doc_id", "source", Map.empty, 0.5).count())
    assert(mid.count() > 50 && mid.count() < 150) // ~100 expected
  }

  test("split assignment is stable under corpus growth") {
    val first = Mix.splitAssign(docs.filter(col("doc_id") < 100), "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val all = Mix.splitAssign(docs, "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(first.forall { case (id, sp) => all(id) == sp })
    val counts = all.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts("train") > counts("val") && counts("train") > counts("test"))
    assert(counts.values.sum == 200)
  }

  test("token budget keeps a per-source hash-order prefix within budget") {
    val kept = Mix.tokenBudget(docs, "doc_id", "source", "text", budget = 40L)
    assert(kept.filter(col("cum_tokens") > 40).count() == 0)
    val perSource = kept.groupBy("source").agg(sum("ws_tokens").as("t"))
      .as[(String, Long)].collect().toMap
    assert(perSource.size == 4 && perSource.values.forall(t => t > 0 && t <= 40))
    // budget below the smallest doc still admits the first doc per source? no:
    // a doc larger than the budget is excluded entirely
    assert(Mix.tokenBudget(docs, "doc_id", "source", "text", 0L).count() == 0)
  }

  test("repetition signals on crafted repetitive text") {
    val d = Seq((1L, "a a a b"), (2L, "w x y z")).toDF("doc_id", "text")
    val r = TextOps.repetition(d, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> x).toMap
    val rep = r(1L)
    assert(rep.getLong(1) == 4L)                      // n_tokens
    assert(rep.getDouble(2) == 0.5)                   // 1 - 2/4 dup tokens
    assert(rep.getDouble(3) == 0.333333)              // 2grams: aa,aa,ab → 1-2/3
    assert(rep.getString(4) == "a" && rep.getDouble(5) == 0.75)
    val clean = r(2L)
    assert(clean.getDouble(2) == 0.0 && clean.getDouble(3) == 0.0)
    assert(clean.getDouble(5) == 0.25)
  }

  test("packSequences lays each stratum contiguously and bins at seqLen") {
    val docs = (1L to 30L).map(i =>
      (i, Seq.fill((i % 7 + 3).toInt)("tok").mkString(" "), s"s${i % 2}"))
      .toDF("doc_id", "text", "source")
    val out = Mix.packSequences(docs, "doc_id", "source", "text", 10L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    out.groupBy(_._2).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.head._4 == 0L) // stream starts at offset 0
      // contiguous: each doc starts exactly where the previous one ended
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 + a._3 == b._4)
        case _           =>
      }
    }
    out.foreach { case (_, _, n, off, first, last) =>
      assert(first == off / 10)
      assert(last == (off + n - 1) / 10)
    }
    // crossing docs exist in the fixture and are flagged
    assert(out.exists(r => r._5 != r._6))
    // deterministic under re-evaluation and repartitioning
    val again = Mix.packSequences(docs.repartition(7), "doc_id", "source", "text", 10L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.sortBy(_._1).sameElements(again.sortBy(_._1)))
  }

  test("pii scrub counts and redacts emails/phones") {
    val d = Seq(
      (1L, "reach me at bob@test.org or 555-123-4567 ok"),
      (2L, "no pii here at all")).toDF("doc_id", "text")
    val p = TextOps.piiScrub(d, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(p(1L).getLong(1) == 1L && p(1L).getLong(2) == 1L)
    assert(p(2L).getLong(1) == 0L && p(2L).getLong(2) == 0L)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    assert(p(1L).getString(3) == md5hex("reach me at <EMAIL> or <PHONE> ok"))
    assert(p(2L).getString(3) == md5hex("no pii here at all"))
  }

  test("neymanSample: all budget flows to the variable stratum; a " +
       "zero-variance stratum gets nothing; quotas are hit exactly") {
    import org.apache.spark.sql.functions.col
    // stratum A: 20 docs, constant value (S=0); B: 20 docs, spread
    val docs = ((1 to 20).map(i => (i.toLong, "A", 100L)) ++
      (21 to 40).map(i => (i.toLong, "B", (i * 37 % 400).toLong)))
      .toDF("doc_id", "source", "n_chars")
    val got = graft.text.Mix.neymanSample(docs, "doc_id", "source",
      "n_chars", budget = 10)
    val bySrc = got.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc == Map("B" -> 10L), bySrc)
    assert(got.agg(org.apache.spark.sql.functions.max("alloc_n"))
      .collect()(0).getLong(0) == 10L)
    // determinism across partitioning
    val again = graft.text.Mix.neymanSample(docs.repartition(7), "doc_id",
      "source", "n_chars", budget = 10)
    assert(got.collect().map(_.toSeq).toSet ==
      again.collect().map(_.toSeq).toSet)
  }
}
