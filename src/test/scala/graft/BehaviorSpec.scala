package graft

import graft.analytics.Behavior
import java.sql.Timestamp

/** Hand fixtures for the behavioral pair (q117/q118): funnel strict
  * ordering and cohort retention counts. */
class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2025-01-01 00:$m%02d:00")

  test("funnel: strict step ordering — early clicks don't count") {
    val events = Seq(
      // u1 completes in order: view@1 click@2 purchase@3
      (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
      // u2 clicks BEFORE the first view → stuck at stage 1
      (2L, ts(1), "click"), (2L, ts(2), "view"),
      // u3 never views → stage 0 despite purchase
      (3L, ts(1), "purchase"),
      // u4 view@1, click@2, but purchase@2 is NOT after click → stage 2
      (4L, ts(1), "view"), (4L, ts(2), "click"), (4L, ts(2), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = Behavior.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("user_id").select("user_id", "stage").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(got.toSeq == Seq((1L, 3), (2L, 1), (3L, 0), (4L, 2)))
  }

  test("retention: cohort day-offset counts") {
    def day(d: Int) = Timestamp.valueOf(f"2025-01-${d}%02d 12:00:00")
    val events = Seq(
      (1L, day(1)), (1L, day(1)), (1L, day(3)), // cohort d1, active d0 + d2
      (2L, day(1)),                             // cohort d1, active d0
      (3L, day(3))                              // cohort d3, active d0
    ).toDF("user_id", "ts")
    val got = Behavior.retention(events, "user_id", "ts")
      .orderBy("cohort", "day_n")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    assert(got.toSeq == Seq(("2025-01-01", 0, 2L), ("2025-01-01", 2, 1L),
      ("2025-01-03", 0, 1L)))
  }

  test("rfm: breakpoint scores — best/worst cells, composite segment") {
    def day(d: Int) = Timestamp.valueOf(f"2025-01-${d}%02d 12:00:00")
    // five users, strictly increasing frequency/monetary/recency quality:
    // u5 buys most, most recently, for the most money → 555; u1 → 111
    val events = (1 to 5).flatMap { u =>
      (1 to u).map(i => (u.toLong, day(u * 5 + i - 5), "purchase",
        u * 100.0))
    } ++ Seq((9L, day(25), "view", 1e9)) // non-purchase noise is ignored
    val got = Behavior.rfm(events.toDF("user_id", "ts", "event_type",
        "value"), "user_id", "ts", "event_type", "value", "purchase")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!got.contains(9L))
    val u5 = got(5L); val u1 = got(1L)
    assert(u5.getInt(1) == 0 && u5.getLong(2) == 5L &&
      u5.getDouble(3) == 2500.0)
    assert(u5.getInt(4) == 5 && u5.getInt(5) == 5 && u5.getInt(6) == 5 &&
      u5.getInt(7) == 555)
    assert(u1.getInt(4) == 1 && u1.getInt(5) == 1 && u1.getInt(6) == 1 &&
      u1.getInt(7) == 111)
  }

  test("transitionMatrix: adjacent-pair counts and row-normalized probs") {
    val events = Seq(
      (1L, ts(1), 1L, "a"), (1L, ts(2), 2L, "b"), (1L, ts(3), 3L, "a"),
      (1L, ts(4), 4L, "b"),
      (2L, ts(1), 5L, "a"), (2L, ts(2), 6L, "a")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Behavior.transitionMatrix(events, "user_id", "ts",
        "event_type", Seq(org.apache.spark.sql.functions.col("event_id")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    // from a: a→b twice (u1), a→a once (u2) → probs 2/3 and 1/3
    assert(got(("a", "b")).getLong(2) == 2L &&
      got(("a", "b")).getDouble(4) == q6(2.0 / 3.0))
    assert(got(("a", "a")).getLong(2) == 1L &&
      got(("a", "a")).getDouble(4) == q6(1.0 / 3.0))
    // from b: only b→a (u1 middle) → prob 1
    assert(got(("b", "a")).getLong(2) == 1L &&
      got(("b", "a")).getDouble(4) == 1.0)
    assert(!got.contains(("b", "b")))
  }

  test("funnelTiming: per-transition dt distribution over converted users") {
    val events = Seq(
      (1L, ts(0), "view"), (1L, ts(1), "click"), (1L, ts(3), "purchase"),
      (2L, ts(0), "view"), (2L, ts(2), "click")
    ).toDF("user_id", "ts", "event_type")
    val got = Behavior.funnelTiming(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(0) -> r).toMap
    val vc = got("view->click") // dts 60 and 120 seconds
    assert(vc.getLong(1) == 2L && vc.getDouble(2) == 90.0 &&
      vc.getDouble(3) == 90.0 && vc.getDouble(4) == 114.0)
    val cp = got("click->purchase") // only u1, 120 s
    assert(cp.getLong(1) == 1L && cp.getDouble(2) == 120.0 &&
      cp.getDouble(4) == 120.0)
  }

  test("basketLift: hand support/confidence/lift on four baskets") {
    // baskets: {a,b}, {a,b}, {a}, {c} → n_users 4, n_a 3, n_b 2, n_ab 2
    val events = Seq((1L, "a"), (1L, "b"), (1L, "a"), (2L, "a"), (2L, "b"),
      (3L, "a"), (4L, "c")).toDF("user_id", "event_type")
    val got = Behavior.basketLift(events, "user_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(got.size == 1) // only (a, b) co-occurs
    val ab = got(("a", "b"))
    assert(ab.getLong(2) == 2L && ab.getLong(3) == 3L &&
      ab.getLong(4) == 2L && ab.getLong(5) == 4L)
    assert(ab.getDouble(6) == 0.5)             // support 2/4
    assert(ab.getDouble(7) == q6(2.0 / 3.0))   // conf a→b
    assert(ab.getDouble(8) == 1.0)             // conf b→a
    assert(ab.getDouble(9) == q6(8.0 / 6.0))   // lift 2·4/(3·2)
  }

  test("churnRate: silence beyond the window counts against the cohort") {
    def day(d: Int) = Timestamp.valueOf(f"2025-01-$d%02d 12:00:00")
    val events = Seq((1L, day(1)), (2L, day(1)), (2L, day(20)))
      .toDF("user_id", "ts")
    val got = Behavior.churnRate(events, "user_id", "ts", inactiveDays = 7)
      .collect()
    assert(got.length == 1)
    val r = got.head // cohort 2025-01-01: u1 silent 19d → churned, u2 active
    assert(r.getLong(1) == 2L && r.getLong(2) == 1L &&
      r.getDouble(3) == 0.5)
  }

  test("rollingActives: trailing-window distinct counts via bounded fan-out") {
    def h(i: Int) = Timestamp.valueOf(f"2025-01-01 $i%02d:15:00")
    val events = Seq((1L, h(0)), (2L, h(0)), (2L, h(1)), (3L, h(5)))
      .toDF("user_id", "ts")
    val got = Behavior.rollingActives(events, "ts", "user_id",
        bucket = "hour", windowN = 2)
      .collect()
      .map(r => r.getTimestamp(0).toString.take(13) -> r.getLong(1)).toMap
    assert(got("2025-01-01 00") == 2L && got("2025-01-01 01") == 2L)
    assert(got("2025-01-01 02") == 1L) // only u2's h1 activity survives
    assert(got("2025-01-01 05") == 1L && got("2025-01-01 06") == 1L)
    assert(got.size == 5)
  }

  test("eventNgrams: per-user motifs, no cross-user bleed, top-k order") {
    val events = Seq(
      (1L, ts(1), 1L, "a"), (1L, ts(2), 2L, "b"), (1L, ts(3), 3L, "c"),
      (1L, ts(4), 4L, "a"), (1L, ts(5), 5L, "b"), (1L, ts(6), 6L, "c"),
      (2L, ts(1), 7L, "a"), (2L, ts(2), 8L, "b"), (2L, ts(3), 9L, "c")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Behavior.eventNgrams(events, "user_id", "ts", "event_type",
        Seq(org.apache.spark.sql.functions.col("event_id")), n = 3,
        topK = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // a>b>c: twice in u1 + once in u2; c>a>b and b>c>a once each (u1)
    assert(got("a>b>c") == 3L && got("b>c>a") == 1L && got("c>a>b") == 1L)
    assert(got.size == 3) // nothing spans the u1/u2 boundary
  }

  test("gini: perfect equality → 0; total concentration → (n−1)/n") {
    val eq = Seq(("g", 5.0), ("g", 5.0), ("g", 5.0), ("g", 5.0))
      .toDF("k", "x")
    val g1 = Behavior.gini(eq, "x", Seq("k")).collect().head
    assert(g1.getLong(1) == 4L && g1.getDouble(2) == 0.0)
    val conc = Seq(("g", 0.0), ("g", 0.0), ("g", 0.0), ("g", 12.0))
      .toDF("k", "x")
    val g2 = Behavior.gini(conc, "x", Seq("k")).collect().head
    // G = 2·(4·12)/(4·12) − 5/4 = 0.75 = (n−1)/n
    assert(g2.getDouble(2) == 0.75)
    val zero = Seq(("g", 0.0)).toDF("k", "x")
    assert(Behavior.gini(zero, "x", Seq("k")).collect().head.isNullAt(2))
  }

  private def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("kaplanMeier: hand survival curve with censoring and an " +
       "event/censor mix at the same duration") {
    import org.apache.spark.sql.functions.{col, to_timestamp}
    val T = 1000000000L
    // (subject, first, last): durations 10h/5h/5h/2h/5h; s1 and s5 end
    // within 3 days of the window max → censored
    val spans = Seq(
      ("s1", T - 36000L, T),                       // 10h, censored
      ("s2", T - 345600L - 18000L, T - 345600L),   // 5h, observed
      ("s3", T - 345600L - 18000L, T - 345600L),   // 5h, observed
      ("s4", T - 432000L - 7200L, T - 432000L),    // 2h, observed
      ("s5", T - 86400L - 18000L, T - 86400L))     // 5h, censored
    val ev = spans.flatMap { case (u, a, b) => Seq((u, a), (u, b)) }
      .toDF("u", "secs").select(col("u"), to_timestamp(col("secs")).as("ts"))
    val got = Behavior.kaplanMeier(ev, Seq("u"), "ts", censorDays = 3)
      .orderBy("duration_hr")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    // d=2: 5 at risk, 1 event → S=0.8; d=5: 4 at risk, 2 events + 1
    // censored → S=0.4; d=10: censor only, survival unchanged
    assert(got == Seq(
      (2L, 5L, 1L, 0L, 0.8),
      (5L, 4L, 2L, 1L, 0.4),
      (10L, 1L, 0L, 1L, 0.4)), got)
  }

  test("shapleyAttribution: hand two-channel game — efficiency and the " +
       "exact factorial-weighted marginals") {
    // coalitions: {} 2 users 0 conv; {a} 2 users 1 conv; {b} 2 users
    // 0 conv; {a,b} 2 users 2 conv. φ_a = ½·0.5 + ½·(1−0) = 0.75,
    // φ_b = ½·0 + ½·(1−0.5) = 0.25; Σφ = v(ab) − v(∅) = 1 (efficiency)
    val ev = Seq(
      ("u1", "x"), ("u2", "x"),
      ("u3", "a"), ("u4", "a"), ("u4", "conv"),
      ("u5", "b"), ("u6", "b"),
      ("u7", "a"), ("u7", "b"), ("u7", "conv"),
      ("u8", "a"), ("u8", "b"), ("u8", "conv"))
      .toDF("u", "et")
    val got = Behavior.shapleyAttribution(ev, "u", "et", "conv",
        Seq("a", "b"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("a" -> 0.75, "b" -> 0.25), got)
  }

  test("markovAttribution: hand chain — absorption and removal effects " +
       "match the exact matrix arithmetic; no renormalization on removal") {
    import org.apache.spark.sql.functions.{col, to_timestamp}
    // start→a ½, start→b ¼, start→null ¼; a→conv ½, a→null ½; b→conv 1.
    // P(start) = ½·½ + ¼·1 = 0.5; remove a → ¼; remove b → ¼ —
    // both removal effects 0.5
    val ev = Seq(
      ("u1", 1L, "a"), ("u1", 2L, "conv"),
      ("u2", 1L, "a"),
      ("u3", 1L, "b"), ("u3", 2L, "conv"),
      ("u4", 1L, "x"))
      .toDF("u", "secs", "et")
      .select(col("u"), to_timestamp(col("secs")).as("ts"), col("et"))
    val got = Behavior.markovAttribution(ev, "u", "ts", "et", "conv",
        Seq("a", "b"))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got == Map(
      "a" -> ((0.5, 0.25, 0.5)),
      "b" -> ((0.5, 0.25, 0.5))), got)
  }

  test("positionAttribution: U-shaped credits over 4/2/1-touch paths; " +
       "post-conversion touches carry nothing") {
    import org.apache.spark.sql.functions.{col, to_timestamp}
    // u1: a b b a conv → 0.4/0.1/0.1/0.4; u2: b conv → 1.0;
    // u3: a b conv → 0.5/0.5; u4: conv a (post-conversion, dropped)
    val ev = Seq(
      ("u1", 1L, "a"), ("u1", 2L, "b"), ("u1", 3L, "b"), ("u1", 4L, "a"),
      ("u1", 5L, "conv"),
      ("u2", 1L, "b"), ("u2", 2L, "conv"),
      ("u3", 1L, "a"), ("u3", 2L, "b"), ("u3", 3L, "conv"),
      ("u4", 1L, "conv"), ("u4", 2L, "a"))
      .toDF("u", "secs", "et")
      .select(col("u"), to_timestamp(col("secs")).as("ts"), col("et"))
    val got = Behavior.positionAttribution(ev, "u", "ts", "et", "conv",
        Seq("a", "b"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2))))
      .toMap
    // a: 0.4 + 0.4 + 0.5 = 1.3 (opens u1, u3); b: 0.1 + 0.1 + 1.0 + 0.5
    // = 1.7 (opens u2)
    assert(got == Map("a" -> ((1.3, 2L)), "b" -> ((1.7, 1L))), got)
  }

  test("nelsonAalen: hand cumulative hazard and variance on the KM " +
       "fixture — censor-only durations leave the curve flat") {
    import org.apache.spark.sql.functions.{col, to_timestamp}
    val T = 1000000000L
    val spans = Seq(
      ("s1", T - 36000L, T),                       // 10h, censored
      ("s2", T - 345600L - 18000L, T - 345600L),   // 5h, observed
      ("s3", T - 345600L - 18000L, T - 345600L),   // 5h, observed
      ("s4", T - 432000L - 7200L, T - 432000L),    // 2h, observed
      ("s5", T - 86400L - 18000L, T - 86400L))     // 5h, censored
    val ev = spans.flatMap { case (u, a, b) => Seq((u, a), (u, b)) }
      .toDF("u", "secs").select(col("u"), to_timestamp(col("secs")).as("ts"))
    val got = Behavior.nelsonAalen(ev, Seq("u"), "ts", censorDays = 3)
      .orderBy("duration_hr")
      .as[(Long, Long, Long, Long, Double, Double)].collect().toSeq
    // H(2) = 1/5; H(5) = 1/5 + 2/4 = 0.7; H(10) = flat (censor only)
    // V(2) = 1/25; V(5) = 0.04 + 2/16 = 0.165; V(10) = flat
    assert(got == Seq(
      (2L, 5L, 1L, 0L, 0.2, 0.04),
      (5L, 4L, 2L, 1L, 0.7, 0.165),
      (10L, 1L, 0L, 1L, 0.7, 0.165)), got)
  }

  test("kaplanMeier: a duration where every at-risk subject dies pins " +
       "survival to exactly zero") {
    import org.apache.spark.sql.functions.{col, to_timestamp}
    val T = 1000000000L
    val spans = Seq(
      ("a", T - 345600L - 3600L, T - 345600L),  // 1h, observed
      ("b", T - 345600L - 3600L, T - 345600L),  // 1h, observed
      ("c", T, T))                              // 0h, censored (window end)
    val ev = spans.flatMap { case (u, a, b) => Seq((u, a), (u, b)) }
      .toDF("u", "secs").select(col("u"), to_timestamp(col("secs")).as("ts"))
    val got = Behavior.kaplanMeier(ev, Seq("u"), "ts", censorDays = 3)
      .orderBy("duration_hr")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((0L, 3L, 0L, 1L, 1.0), (1L, 2L, 2L, 0L, 0.0)), got)
  }

  test("ltvCurve: weekly rollup, cumulative per cohort member, gaps ok") {
    import org.apache.spark.sql.functions.{col, to_timestamp}
    val day = 86400L
    val ev = Seq(
      ("u1", 0L, Some(10.0)), ("u1", 8L * day, Some(20.0)),
      ("u2", 0L, Some(5.0)), ("u2", 1L * day, None))  // null value ignored
      .toDF("u", "secs", "v")
      .select(col("u"), to_timestamp(col("secs")).as("ts"), col("v"))
    val got = Behavior.ltvCurve(ev, "u", "ts", "v")
      .orderBy("age_week")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toSeq
    // cohort 1970-01-01, 2 users: week 0 = 15 (ltv 7.5), week 1 = 20
    // (cumulative 35 → ltv 17.5)
    assert(got == Seq((0L, 2L, 15.0, 7.5), (1L, 2L, 20.0, 17.5)), got)
  }

  test("attribution: first vs last touch diverge on a touch-switching " +
       "user; untouched conversions credit '(none)'") {
    import org.apache.spark.sql.functions.{col, to_timestamp}
    // u1: view → click → purchase (first=view, last=click)
    // u2: purchase with no prior touch → (none); then click → purchase
    val ev = Seq(
      ("u1", 1L, "view"), ("u1", 2L, "click"), ("u1", 3L, "purchase"),
      ("u2", 1L, "purchase"), ("u2", 2L, "click"), ("u2", 3L, "purchase"))
      .toDF("u", "secs", "et")
      .select(col("u"), to_timestamp(col("secs")).as("ts"), col("et"))
    val got = Behavior.attribution(ev, "u", "ts", "et", "purchase",
        Seq("view", "click"))
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("view") == ((1L, 0L, q6(1.0 / 3), 0.0)))
    assert(got("click") == ((1L, 2L, q6(1.0 / 3), q6(2.0 / 3))))
    assert(got("(none)") == ((1L, 1L, q6(1.0 / 3), q6(1.0 / 3))))
  }

  test("logRank: hand O-E/variance terms on the KM fixture split by " +
       "group; identical groups score zero") {
    import org.apache.spark.sql.functions.{col, to_timestamp}
    val T = 1000000000L
    // the kaplanMeier fixture with s2/s3 treated: at dur 2 (ctrl event)
    // O-E = -0.4, V = 0.24; at dur 5 (two treated events) O-E = 1,
    // V = 1/3 → chi2 = 0.36 / 0.573333333333 = 0.627907
    val spans = Seq(
      ("s1", T - 36000L, T, 0),
      ("s2", T - 345600L - 18000L, T - 345600L, 1),
      ("s3", T - 345600L - 18000L, T - 345600L, 1),
      ("s4", T - 432000L - 7200L, T - 432000L, 0),
      ("s5", T - 86400L - 18000L, T - 86400L, 0))
    val ev = spans.flatMap { case (u, a, b, t) => Seq((u, a, t), (u, b, t)) }
      .toDF("u", "secs", "t")
      .select(col("u"), to_timestamp(col("secs")).as("ts"), col("t"))
    val r = Behavior.logRank(ev, Seq("u"), "ts", col("t") === 1,
      censorDays = 3).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 3L, 2L, 1L)))
    assert(r.getDouble(4) == 0.627907, r)
    // degenerate: nobody treated → p1 = 0, every O-E and V term is 0 →
    // the variance guard yields NULL, not a 0/0
    val r2 = Behavior.logRank(ev, Seq("u"), "ts",
      org.apache.spark.sql.functions.lit(false), censorDays = 3).head()
    assert(r2.getLong(0) == 0L && r2.isNullAt(4), r2)
  }

  test("diffInDiff: hand 2x2 cells, unpooled SE, degenerate-cell guard") {
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      (1, 0, 1.0), (1, 0, 3.0),   // treat pre:  mean 2, var 2
      (1, 1, 5.0), (1, 1, 9.0),   // treat post: mean 7, var 8
      (0, 0, 2.0), (0, 0, 2.0),   // ctrl pre:   mean 2, var 0
      (0, 1, 4.0), (0, 1, 4.0))   // ctrl post:  mean 4, var 0
      .toDF("t", "p", "y")
    val r = Behavior.diffInDiff(rows, "y", col("t") === 1, col("p") === 1)
      .head()
    assert(r.getDouble(8) == 3.0)                       // did
    assert(r.getDouble(9) == q6(math.sqrt(5.0)))        // se = √(8/2+2/2)
    assert(r.getDouble(10) == q6(3.0 / math.sqrt(5.0))) // t
    // a 1-observation cell nulls se/t but keeps the point estimate
    val r2 = Behavior.diffInDiff(rows.limit(7), "y",
      col("t") === 1, col("p") === 1).head()
    assert(!r2.isNullAt(8) && r2.isNullAt(9) && r2.isNullAt(10))
  }
}
