package graft

import org.apache.spark.sql.functions._

/** Invariant checks for the BreadthQueries battery (q56–q67) on sf0.001 —
  * cross-validation that doesn't need the DuckDB oracle: algebraic
  * identities between equivalent plans, partition/segment disjointness,
  * and frame-semantics ground truths. */
class BreadthSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q56 grouping sets ≡ union of the three groupBys") {
    val e = Tables.events(spark, sf).withColumn("hr", hour(col("ts")))
    val fine = e.groupBy("event_type", "hr").count()
    val mid = e.groupBy("event_type").count()
    val got = q("q56_grouping_sets").cache()
    assert(got.filter(col("gid") === 0).count() == fine.count())
    assert(got.filter(col("gid") === 1).count() == mid.count())
    assert(got.filter(col("gid") === 3).count() == 1)
    val totalRows = e.count()
    val grandN = got.filter(col("gid") === 3).select("n").head().getLong(0)
    assert(grandN == totalRows)
  }

  test("q57 unpivot: 3 metrics × base rows, round-trips via pivot") {
    val base = Tables.lineitem(spark, sf).filter(col("l_orderkey") % 100 === 0)
    val long = q("q57_unpivot")
    assert(long.count() == 3 * base.count())
    assert(long.select("metric").distinct().count() == 3)
    // pivot back and compare to the base (the synthetic lineitem has
    // duplicate (orderkey, linenumber) keys with differing measures, so the
    // round-trip equality is on the deterministic per-key max of each
    // metric, applied identically on both sides)
    val metrics = Seq("l_quantity", "l_extendedprice", "l_discount")
    val wide = long.groupBy("l_orderkey", "l_linenumber")
      .pivot("metric", metrics).agg(max(col("val")))
      .select(("l_orderkey" +: "l_linenumber" +: metrics).map(col): _*)
    val orig = base.groupBy("l_orderkey", "l_linenumber")
      .agg(metrics.map(m => max(col(m)).as(m)).head,
        metrics.map(m => max(col(m)).as(m)).tail: _*)
      .select(("l_orderkey" +: "l_linenumber" +: metrics).map(col): _*)
    assert(wide.exceptAll(orig).isEmpty && orig.exceptAll(wide).isEmpty)
  }

  test("q58 range join keeps every error event exactly once") {
    val errs = Tables.events(spark, sf).filter(col("event_type") === "error")
    val got = q("q58_range_join")
    assert(got.count() == errs.count())
    assert(got.select("err_id").distinct().count() == errs.count())
  }

  test("q59 ranking: rank gaps vs dense_rank, quartiles cover 1..4") {
    val got = q("q59_ranking").cache()
    assert(got.filter(col("drnk") > col("rnk")).count() == 0)
    assert(got.filter(col("quartile") < 1 || col("quartile") > 4).count() == 0)
    assert(got.filter(col("prnk") < 0 || col("prnk") > 1).count() == 0)
    // cume_dist of the per-user max-rank row is exactly 1
    val lastPerUser = got.groupBy("user_id").agg(max("rnk").as("mx"))
    val joined = got.join(lastPerUser, Seq("user_id")).filter(col("rnk") === col("mx"))
    assert(joined.filter(col("cd") =!= 1.0).count() == 0)
  }

  test("q60 segments are disjoint and cover all clickers") {
    val got = q("q60_intersect_except").cache()
    val e = Tables.events(spark, sf)
    val clickers = e.filter(col("event_type") === "click").select("user_id").distinct().count()
    assert(got.count() == clickers)
    assert(got.select("user_id").distinct().count() == clickers)
  }

  test("q61 full outer covers union of both key sets") {
    val e = Tables.events(spark, sf)
    val keys = e.filter(col("event_type").isin("click", "purchase"))
      .select("user_id").distinct().count()
    assert(q("q61_full_outer").count() == keys)
  }

  test("q62 conditional agg matches per-type groupBy counts") {
    val e = Tables.events(spark, sf)
    val direct = e.filter(col("event_type") === "click").count()
    val got = q("q62_conditional_agg").agg(sum("n_click")).head().getLong(0)
    assert(got == direct)
  }

  test("q64 frames: running first is constant per user; sliding min ≤ max") {
    val got = q("q64_window_frames").cache()
    assert(got.filter(col("min3") > col("max3")).count() == 0)
    val firstsPerUser = got.select("user_id", "first_v").distinct()
      .groupBy("user_id").count().filter(col("count") > 1)
    assert(firstsPerUser.count() == 0)
  }

  test("q65 median lies within [min, max] per type; mode_k in 0..49") {
    val e = Tables.events(spark, sf)
    val rng = e.groupBy("event_type").agg(min("value").as("lo"), max("value").as("hi"))
    val bad = q("q65_median_mode").join(rng, Seq("event_type"))
      .filter(col("median_v") < col("lo") || col("median_v") > col("hi") ||
        col("mode_k") < 0 || col("mode_k") > 49)
    assert(bad.count() == 0)
  }

  test("q66 correlated subquery ≡ explicit aggregate-join rewrite") {
    val o = Tables.orders(spark, sf)
    // same expression as the query's subquery — avg(DECIMAL(38,6)) cast
    // double — so the rewrite is bit-identical even on boundary values
    // (exactAvg's sum-then-divide can differ in the last ulp)
    val avgs = o.groupBy(col("o_custkey").as("k"))
      .agg(avg(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(38, 6)))
        .cast("double").as("m"))
    val expected = o.join(avgs, col("o_custkey") === col("k"))
      .filter(col("o_totalprice") > lit(1.5) * col("m")).count()
    assert(q("q66_corr_subquery").count() == expected)
  }

  test("q67 distinct agg: n_users ≤ n, totals match raw scan") {
    val got = q("q67_distinct_agg").cache()
    assert(got.filter(col("n_users") > col("n")).count() == 0)
    val n = got.agg(sum("n")).head().getLong(0)
    assert(n == Tables.events(spark, sf).count())
  }
}
