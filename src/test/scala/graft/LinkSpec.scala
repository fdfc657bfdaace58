package graft

import graft.text.Link
import org.apache.spark.sql.functions._

/** Record linkage: the native Jaro–Winkler expression against the classic
  * literature values (which q267 re-certifies wholesale against DuckDB's
  * independent implementation), blocking semantics, and the entity
  * closure over a non-transitive match graph. */
class LinkSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double = {
    graft.expressions.JaroWinkler.register(spark)
    Seq((a, b)).toDF("x", "y")
      .select(expr("graft_jaro_winkler(x, y)")).head().getDouble(0)
  }

  test("jaro-winkler matches the classic Winkler values") {
    // the canonical record-linkage test pairs (Winkler 1990) — exact
    // doubles, same values DuckDB's jaro_winkler_similarity returns
    assert(jw("martha", "marhta") == 0.9611111111111111)
    assert(jw("dixon", "dicksonx") == 0.8133333333333332)
    assert(jw("duane", "dwayne") == 0.8400000000000001)
    assert(jw("a", "a") == 1.0)
    // no boost at jaro ≤ 0.7 boundary behavior: crate/trace has jaro
    // 0.7333 but zero common prefix — the boost multiplies by ℓ=0
    assert(jw("crate", "trace") == 0.7333333333333334)
    // window-0 short strings: transposed bigram has no in-window match
    assert(jw("ab", "ba") == 0.0)
    // prefix cap at 4 with unequal lengths
    assert(jw("aaa", "aaaaaaaaaaaa") == 0.825)
    // DuckDB's empty-string convention (NOT the textbook 1.0)
    assert(jw("", "") == 0.0)
    assert(jw("", "x") == 0.0)
  }

  test("jaro-winkler null semantics and codegen participation") {
    graft.expressions.JaroWinkler.register(spark)
    val got = Seq((Option("x"), None: Option[String]))
      .toDF("x", "y").select(expr("graft_jaro_winkler(x, y)")).collect()
    assert(got(0).isNullAt(0))
    val plan = spark.range(10)
      .select(expr("graft_jaro_winkler(cast(id AS STRING), 'x')").as("s"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_jaro_winkler") && l.contains("*(")), plan)
  }

  test("jwPairs blocks, thresholds, and excludes oversized blocks") {
    val df = Seq(
      (1L, "small ring", "b1"), (2L, "small ring", "b1"),
      (3L, "small rings", "b1"), (4L, "large bolt", "b1"),
      // block b2 has 5 records and is excluded at maxBlock = 4
      (5L, "same name", "b2"), (6L, "same name", "b2"), (7L, "same name", "b2"),
      (8L, "same name", "b2"), (9L, "same name", "b2"))
      .toDF("id", "nm", "blk")
    val got = Link.jwPairs(df, "id", "nm", Seq("blk"), minSim = 0.9,
        maxBlock = 4)
      .select("id_a", "id_b", "jw").as[(Long, Long, Double)].collect().toSet
    // within b1: (1,2) exact, (1,3)/(2,3) near; (x,4) fails the threshold;
    // b2's identical triplet is gated out entirely
    assert(got.map(p => (p._1, p._2)) == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(got.forall(_._3 >= 0.9))
    assert(got.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1.0))
  }

  test("blockHealth flags the oversized block") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"))
      .toDF("id", "blk")
    val got = Link.blockHealth(df, Seq("blk"), maxBlock = 2)
      .as[(String, Long, Int)].collect().toSet
    assert(got == Set(("a", 3L, 1), ("b", 1L, 0)))
  }

  test("erEntities closes the non-transitive match chain") {
    // A~B and B~C at ≥0.94 but A~C below (0.9): one entity {A,B,C}
    val df = Seq(
      (10L, "abcdefgh", "k"),   // A
      (11L, "abcdefgx", "k"),   // B: 1 substitution from A
      (12L, "abcdefxx", "k"),   // C: 1 substitution from B, 2 from A
      (20L, "zzzzzzzz", "k"))   // unrelated singleton
      .toDF("id", "nm", "blk")
    val got = Link.erEntities(df, "id", "nm", Seq("blk"), minSim = 0.94)
      .as[(Long, Long, Long, Int)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got(10L) == ((10L, 3L, 1)))
    assert(got(11L) == ((10L, 3L, 0)))
    assert(got(12L) == ((10L, 3L, 0)))
    assert(got(20L) == ((20L, 1L, 1)))
    // sanity on the premise: A~C really is below the threshold
    assert(jw("abcdefgh", "abcdefxx") < 0.94)
    assert(jw("abcdefgh", "abcdefgx") >= 0.94)
    assert(jw("abcdefgx", "abcdefxx") >= 0.94)
  }
}
