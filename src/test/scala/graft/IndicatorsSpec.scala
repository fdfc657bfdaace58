package graft

import graft.analytics.Indicators
import graft.ops.Stats
import graft.text.Retrieval
import org.apache.spark.sql.functions._

/** Hand-computed goldens for the indicator / retrieval / robust-stats
  * operators (q102-q105, q109). */
class IndicatorsSpec extends SparkSpec {
  import spark.implicits._

  test("bollinger: 3-row bands match the closed form; NULL until full frame") {
    val df = Seq((1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0)).toDF("i", "x")
    val rows = Indicators.bollinger(df.withColumn("g", lit(1)), "x", Seq("g"),
        Seq(col("i")), n = 3, k = 2.0)
      .orderBy("i").select("bb_mid", "bb_upper", "bb_lower").collect()
    assert(rows(0).isNullAt(0) && rows(1).isNullAt(0))
    // rows 1..3: mean 2, sample sd 1
    assert(rows(2).getDouble(0) == 2.0 && rows(2).getDouble(1) == 4.0 &&
      rows(2).getDouble(2) == 0.0)
    // rows 2..4: mean 3, sample sd 1
    assert(rows(3).getDouble(0) == 3.0 && rows(3).getDouble(1) == 5.0 &&
      rows(3).getDouble(2) == 1.0)
  }

  test("rollingCorr: perfect positive/negative correlation and flat guard") {
    val df = Seq(
      (1, 1.0, 2.0), (2, 2.0, 4.0), (3, 3.0, 6.0),   // y = 2x → corr 1
      (4, 4.0, 1.0), (5, 5.0, 0.0)                    // window mixes → < 1
    ).toDF("i", "x", "y").withColumn("g", lit(1))
    val rows = Indicators.rollingCorr(df, "x", "y", Seq("g"), Seq(col("i")), n = 3)
      .orderBy("i").select("rolling_corr").collect()
    assert(rows(0).isNullAt(0) && rows(1).isNullAt(0))
    assert(rows(2).getDouble(0) == 1.0)
    assert(rows(4).getDouble(0) < 0) // 3,4,5 vs 6,1,0 anti-correlated
    val flat = Seq((1, 1.0, 5.0), (2, 2.0, 5.0), (3, 3.0, 5.0))
      .toDF("i", "x", "y").withColumn("g", lit(1))
    val f = Indicators.rollingCorr(flat, "x", "y", Seq("g"), Seq(col("i")), n = 3)
      .orderBy("i").select("rolling_corr").collect()
    assert(f(2).isNullAt(0)) // constant y → vy = 0 → NULL, not NaN
  }

  test("twap: interval weighting; open-ended tail drops") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2025-01-01 00:$m%02d:00")
    // 10.0 held 60s, 20.0 held 180s, 99.0 is the open tail
    val df = Seq((1L, ts(0), 10.0), (1L, ts(1), 20.0), (1L, ts(4), 99.0))
      .toDF("k", "t", "x")
    val got = Indicators.twap(df, "x", Seq("k"), "t").collect()
    assert(got.length == 1)
    assert(got(0).getLong(1) == 240L)
    assert(got(0).getDouble(2) == 17.5) // (10*60 + 20*180) / 240
  }

  test("ohlcBars: first/last by timestamp, extremes, tick count") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2025-01-01 09:$m%02d:00")
    val df = Seq((1L, ts(5), 3.0), (1L, ts(1), 7.0), (1L, ts(59), 2.0),
      (1L, ts(30), 9.0)).toDF("k", "t", "x")
    val got = Indicators.ohlcBars(df, "x", Seq("k"), "t").collect()
    assert(got.length == 1)
    val byName = got(0).getValuesMap[Any](Seq("open", "high", "low", "close", "n_ticks"))
    assert(byName("open") == 7.0 && byName("high") == 9.0 &&
      byName("low") == 2.0 && byName("close") == 2.0 && byName("n_ticks") == 4L)
  }

  test("olsPerKey: exact line recovered; constant-x guard") {
    val df = Seq((1, 1.0, 5.0), (1, 2.0, 7.0), (1, 3.0, 9.0), // y = 2x + 3
      (2, 4.0, 1.0), (2, 4.0, 2.0))                           // constant x
      .toDF("g", "x", "y")
    val got = Indicators.olsPerKey(df, "x", "y", Seq("g"))
      .orderBy("g").collect()
    assert(got(0).getDouble(2) == 2.0 && got(0).getDouble(3) == 3.0 &&
      got(0).getDouble(4) == 1.0)
    assert(got(1).isNullAt(2) && got(1).isNullAt(3) && got(1).isNullAt(4))
  }

  test("entropy: uniform vs single-category distributions") {
    val df = (Seq.fill(4)("a") ++ Seq.fill(4)("b")).map(("u1", _)) ++
      Seq.fill(5)(("u2", "a"))
    val got = Indicators.entropy(df.toDF("g", "cat"), "cat", Seq("g"))
      .orderBy("g").collect()
    // u1: two equal halves → ln 2; u2: single category → 0
    assert(got(0).getDouble(3) ==
      BigDecimal(math.log(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got(1).getDouble(3) == 0.0)
  }

  test("drawdown: running peak and trough depth") {
    val df = Seq((1, 10.0), (2, 20.0), (3, 5.0), (4, 15.0))
      .toDF("i", "x").withColumn("g", lit(1))
    val rows = Indicators.drawdown(df, "x", Seq("g"), Seq(col("i")))
      .orderBy("i").select("peak", "drawdown").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    assert(rows.toSeq == Seq((10.0, 0.0), (20.0, 0.0), (20.0, -0.75),
      (20.0, -0.25)))
  }

  test("rsi: Cutler SMA form on a hand series") {
    val df = Seq((1, 1.0), (2, 2.0), (3, 1.0), (4, 3.0)).toDF("i", "x")
      .withColumn("g", lit(1))
    val rows = Indicators.rsi(df, "x", Seq("g"), Seq(col("i")), n = 2)
      .orderBy("i").select("rsi").collect()
    assert(rows(0).isNullAt(0) && rows(1).isNullAt(0)) // <2 diffs in frame
    assert(rows(2).getDouble(0) == 50.0)               // +1 / -1
    assert(rows(3).getDouble(0) == 66.666667)          // gains 2, losses 1
  }

  test("bm25: closed-form score on a 3-doc corpus") {
    val docs = Seq((1L, "a b"), (2L, "a a c"), (3L, "d")).toDF("doc_id", "text")
    val got = Retrieval.bm25(docs, "doc_id", "text", Seq("a"))
      .orderBy("doc_id").collect()
    assert(got.length == 2) // doc 3 matches no term
    val idf = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1.0) // df(a)=2, N=3
    val avgdl = 2.0                                      // (2+3+1)/3
    def score(tf: Long, dl: Long): Double = {
      val raw = idf * (tf * 2.25) / (tf + (dl * 0.75 / avgdl + 0.25) * 1.25)
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got(0).getLong(0) == 1L && got(0).getLong(1) == 1L &&
      got(0).getDouble(2) == score(1, 2))
    assert(got(1).getLong(0) == 2L && got(1).getLong(1) == 1L &&
      got(1).getDouble(2) == score(2, 3))
  }

  test("iqrOutliers: Tukey fences flag the planted extreme only") {
    val df = ((1 to 9).map(_.toDouble) :+ 100.0).zipWithIndex
      .map { case (v, i) => (i.toLong, "g", v) }.toDF("id", "grp", "x")
    val out = Stats.iqrOutliers(df, "x", Seq("grp")).select("id", "x", "lo", "hi")
      .collect()
    assert(out.length == 1)
    assert(out(0).getDouble(1) == 100.0)
    assert(out(0).getDouble(2) == -3.5 && out(0).getDouble(3) == 14.5)
  }

  test("scaleFeatures: z-score and min-max on a hand group; constant guard") {
    val df = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0), ("c", 7.0), ("c", 7.0))
      .toDF("grp", "x")
    val got = Stats.scaleFeatures(df, "x", Seq("grp"))
      .orderBy("grp", "x").select("grp", "zscore", "minmax").collect()
    assert(got(0).getString(0) == "c" && got(0).isNullAt(1) && got(0).isNullAt(2))
    // g: mean 2, sample sd 1, range [1,3]
    assert(got(2).getDouble(1) == -1.0 && got(2).getDouble(2) == 0.0)
    assert(got(3).getDouble(1) == 0.0 && got(3).getDouble(2) == 0.5)
    assert(got(4).getDouble(1) == 1.0 && got(4).getDouble(2) == 1.0)
  }

  test("oneHotEncode: lexicographic stable index, fixed-width vector") {
    val df = Seq("b", "a", "c", "a").toDF("cat")
    val got = Stats.oneHotEncode(df, "cat")
      .select("cat", "cat_index", "onehot_str").distinct()
      .orderBy("cat").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    assert(got.toSeq == Seq(("a", 0, "1,0,0"), ("b", 1, "0,1,0"),
      ("c", 2, "0,0,1")))
  }

  test("topShare: boundary row included, smallest covering set kept") {
    // g: masses 5,3,1,1 (total 10) → 50% cut keeps 5 (crosses at 0.5)...
    // actually 5 reaches exactly 0.5; next row starts AT the boundary
    val df = Seq(("g", 1L, 5.0), ("g", 2L, 3.0), ("g", 3L, 1.0), ("g", 4L, 1.0))
      .toDF("grp", "id", "m")
    val keep60 = Stats.topShare(df, "m", Seq("grp"), Seq(col("id")), 0.6)
      .select("id", "cum_share").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(keep60.toSet == Set((1L, 0.5), (2L, 0.8))) // 3.0 crosses 0.6
    val keep50 = Stats.topShare(df, "m", Seq("grp"), Seq(col("id")), 0.5)
      .select("id").collect().map(_.getLong(0))
    assert(keep50.toSet == Set(1L)) // 5.0 alone covers exactly half
  }

  test("topShare: a negative value fails fast instead of silently " +
       "selecting a wrong set") {
    val df = Seq(("g", 1L, 5.0), ("g", 2L, -1.0)).toDF("grp", "id", "m")
    val ex = intercept[Throwable] {
      Stats.topShare(df, "m", Seq("grp"), Seq(col("id")), 0.5).collect()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + " | " + chain(t.getCause)
    assert(chain(ex).contains("non-negative"), s"unexpected error: ${chain(ex)}")
  }

  test("ema: pandas ewm(adjust=False) recursion, hand-computed") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2025-01-01 00:$m%02d:00")
    // α = 0.5: ema = 10 → 0.5·10+0.5·20 = 15 → 0.5·15+0.5·30 = 22.5
    val df = Seq((1L, ts(3), 30.0), (1L, ts(1), 10.0), (1L, ts(2), 20.0),
      (2L, ts(1), 7.0)).toDF("k", "t", "x")
    val got = Indicators.ema(df, "x", Seq("k"), "t", alpha = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1L) == (3L, 22.5)) // out-of-order input sorted by ts first
    assert(got(2L) == (1L, 7.0))  // single row: ema = x
  }

  test("winsorize: values clipped into the per-group percentile band") {
    val df = (1 to 100).map(i => ("g", i.toLong, i.toDouble)).toDF("grp", "id", "v")
    val got = Stats.winsorize(df, "v", Seq("grp"), 0.10, 0.90)
      .select("id", "lo", "hi", "v_w").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    // interpolated percentiles of 1..100: p10 ≈ 10.9, p90 ≈ 90.1 (linear
    // interpolation carries float residue — compare with tolerance)
    def near(a: Double, b: Double) = math.abs(a - b) < 1e-9
    assert(got.forall { case (_, lo, hi, _) => near(lo, 10.9) && near(hi, 90.1) })
    val byId = got.map(g => g._1 -> g._4).toMap
    assert(near(byId(1L), 10.9) && near(byId(5L), 10.9))   // low tail up
    assert(near(byId(100L), 90.1) && near(byId(95L), 90.1)) // high tail down
    assert(byId(50L) == 50.0)                               // interior untouched
  }

  test("countMinEstimates: exact when width avoids collisions; one-sided " +
       "error when it can't") {
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("k")
    // 3 keys in 1024 buckets × 4 rows: overestimation needs a full-depth
    // collision — estimates are exact here
    val wide = Stats.countMinEstimates(df, "k", depth = 4, width = 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wide == Map("a" -> 5L, "b" -> 3L, "c" -> 1L))
    // width 1: every key shares the single counter → everyone sees the
    // total mass — the one-sided (est ≥ exact) degenerate extreme
    val tiny = Stats.countMinEstimates(df, "k", depth = 2, width = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tiny == Map("a" -> 9L, "b" -> 9L, "c" -> 9L))
  }

  test("interpolateLinear: time-axis lerp between observations, edge fills") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2025-01-01 00:$m%02d:00")
    // observations at minute 0 (10.0) and minute 4 (30.0); nulls at 1 and 3
    // lerp: minute 1 → 15.0, minute 3 → 25.0; leading/trailing nulls fill
    val df = Seq(
      (1L, ts(0), Some(10.0)), (1L, ts(1), None), (1L, ts(3), None),
      (1L, ts(4), Some(30.0)),
      (2L, ts(0), None), (2L, ts(1), Some(7.0)), (2L, ts(2), None))
      .toDF("k", "t", "x")
    val got = graft.ops.TimeSeriesOps.interpolateLinear(df, Seq("k"), "t", "x")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1)) -> r.getDouble(3))
      .toMap
    assert(got((1L, ts(0))) == 10.0 && got((1L, ts(4))) == 30.0)
    assert(got((1L, ts(1))) == 15.0) // 10 + 20 * (1/4)
    assert(got((1L, ts(3))) == 25.0) // 10 + 20 * (3/4)
    assert(got((2L, ts(0))) == 7.0)  // leading null back-fills
    assert(got((2L, ts(2))) == 7.0)  // trailing null forward-fills
  }

  test("rollingMedian: interpolated middle over trailing frame, robust " +
       "to a spike") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2025-01-01 00:$m%02d:00")
    val df = Seq((1L, ts(1), 10.0), (1L, ts(2), 12.0), (1L, ts(3), 1000.0),
      (1L, ts(4), 11.0), (1L, ts(5), 13.0)).toDF("k", "t", "x")
    val got = Indicators.rollingMedian(df, "x", Seq("k"), Seq(col("t")), n = 3)
      .orderBy("t").collect().map(_.getDouble(3))
    // frames: [10] [10,12] [10,12,1000] [12,1000,11] [1000,11,13]
    assert(got(0) == 10.0)
    assert(got(1) == 11.0)   // even frame: (10+12)/2
    assert(got(2) == 12.0)   // spike does NOT drag the median
    assert(got(3) == 12.0 && got(4) == 13.0)
  }

  test("emaSeries: per-row running EMA equals the hand recursion; chunked " +
       "closed form ≡ sequential fold across chunk sizes") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2025-01-01 00:${m % 60}%02d:${m / 60}%02d")
    val rows = (1 to 30).map(i =>
      (if (i % 2 == 0) "a" else "b", i.toLong, ts(i), ((i * 37) % 100) / 10.0))
    val df = rows.toDF("k", "id", "t", "x")
    val plain = Indicators.emaSeries(df, "x", Seq("k"), "t", alpha = 0.25,
        carry = Seq("id"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(plain.size == 30)
    // hand recursion: ema₁ = x₁, emaₜ = 0.75·emaₜ₋₁ + 0.25·xₜ per key
    for (k <- Seq("a", "b")) {
      var e = 0.0; var first = true
      for ((_, id, _, x) <- rows.filter(_._1 == k)) {
        e = if (first) x else 0.75 * e + 0.25 * x; first = false
        assert(math.abs(plain((k, id)) - e) < 1.1e-6, s"($k,$id)")
      }
    }
    // chunk-stitch carry: identical values at ANY chunking, including a
    // chunk length beyond the series (single-chunk degenerate case)
    for (l <- Seq(2, 4, 7, 64)) {
      val ch = Indicators.emaSeriesChunked(df, "x", Seq("k"), "t",
          alpha = 0.25, chunkLen = l, carry = Seq("id"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
      assert(ch.keySet == plain.keySet)
      for ((key, want) <- plain)
        assert(math.abs(ch(key) - want) <= 1.1e-6,
          s"chunkLen=$l $key: ${ch(key)} vs $want")
    }
    // the precision cap rejects chunk sizes whose intra-chunk weight ratio
    // would burn double headroom
    intercept[IllegalArgumentException] {
      Indicators.emaSeriesChunked(df, "x", Seq("k"), "t", alpha = 0.25,
        chunkLen = 1000)
    }
  }

  test("emaSeriesAuto routes oversized keys to the chunked path and " +
       "modest keys bit-identically through the fold") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2025-01-01 00:${m % 60}%02d:${m / 60}%02d")
    // key "big" has 24 rows, key "sm" has 6 — threshold 10 splits them
    val rows = (1 to 24).map(i => ("big", i.toLong, ts(i), (i % 7) / 2.0)) ++
      (1 to 6).map(i => ("sm", 100L + i, ts(i), i / 3.0))
    val df = rows.toDF("k", "id", "t", "x")
    val auto = Indicators.emaSeriesAuto(df, "x", Seq("k"), "t", alpha = 0.25,
        carry = Seq("id"), chunkLen = 8, inlineMax = 10)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val fold = Indicators.emaSeries(df, "x", Seq("k"), "t", alpha = 0.25,
        carry = Seq("id"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(auto.keySet == fold.keySet)         // no row lost at the split
    for ((key, want) <- fold)
      assert(math.abs(auto(key) - want) <= 1.1e-6, s"$key")
    // the modest key's values came through the fold path — bit-identical
    for ((key @ ("sm", _), want) <- fold) assert(auto(key) == want, s"$key")
    // with the default 2^20 threshold nothing routes chunked: bit-identical
    val autoDefault = Indicators.emaSeriesAuto(df, "x", Seq("k"), "t",
        alpha = 0.25, carry = Seq("id"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(autoDefault == fold)
    // a NULL-key hot group (missing-key skew, pooled by groupBy) must
    // route too: the join is null-safe, so no row may be lost or silently
    // left on the quadratic fold path
    val nullRows = (1 to 24).map(i =>
      (None: Option[String], 200L + i, ts(i), i / 4.0)) ++
      (1 to 6).map(i => (Some("sm2"), 300L + i, ts(i), i / 2.0))
    val ndf = nullRows.toDF("k", "id", "t", "x")
    val nAuto = Indicators.emaSeriesAuto(ndf, "x", Seq("k"), "t",
        alpha = 0.25, carry = Seq("id"), chunkLen = 8, inlineMax = 10)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    val nFold = Indicators.emaSeries(ndf, "x", Seq("k"), "t", alpha = 0.25,
        carry = Seq("id"))
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(nAuto.keySet == nFold.keySet)     // null-key rows all present
    for ((id, want) <- nFold)
      assert(math.abs(nAuto(id) - want) <= 1.1e-6, s"id $id")
  }

  test("rollingBeta: slope/intercept of the trailing-frame regression " +
       "match the closed form; NULL before the frame fills") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2025-01-01 00:$m%02d:00")
    // y = 3x + 2 exactly on a drifting x → beta 3, alpha 2 once n=3 fills
    val rows = (1 to 6).map(i => (1L, ts(i), i * 1.5, i * 1.5 * 3 + 2))
    val df = rows.toDF("k", "t", "x", "y")
    val got = graft.analytics.Indicators.rollingBeta(df, "y", "x", Seq("k"),
        Seq(col("t")), n = 3)
      .orderBy("t").collect()
    assert(got(0).isNullAt(4) && got(1).isNullAt(4)) // frame not yet full
    for (i <- 2 until 6) {
      assert(got(i).getDouble(4) == 3.0, s"beta at $i")
      assert(got(i).getDouble(5) == 2.0, s"alpha at $i")
    }
    // constant x in the frame → NULL, not a division blow-up
    val flat = (1 to 4).map(i => (1L, ts(i), 7.0, i * 1.0)).toDF("k", "t", "x", "y")
    val g2 = graft.analytics.Indicators.rollingBeta(flat, "y", "x", Seq("k"),
        Seq(col("t")), n = 3)
      .orderBy("t").collect()
    assert(g2.forall(_.isNullAt(4)))
  }

  test("rollingMedian: nulls are ignored; an all-null frame yields NULL, " +
       "not a crash") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2025-01-01 00:$m%02d:00")
    val df = Seq((1L, ts(1), None: Option[Double]), (1L, ts(2), None),
      (1L, ts(3), Some(10.0)), (1L, ts(4), None), (1L, ts(5), Some(20.0)))
      .toDF("k", "t", "x")
    val got = Indicators.rollingMedian(df, "x", Seq("k"), Seq(col("t")), n = 2)
      .orderBy("t").collect()
    // n=2 frames after null-drop: [] [] [10] [10] [20]
    assert(got(0).isNullAt(3) && got(1).isNullAt(3))
    assert(got(2).getDouble(3) == 10.0)
    assert(got(3).getDouble(3) == 10.0) // median of the OBSERVED values
    assert(got(4).getDouble(3) == 20.0)
  }

  test("fuzzyJoinBlocked: pairs only within blocks, distance filtered") {
    val df = Seq(
      (1L, "alpha beta", "B1", 5), (2L, "alpha bets", "B1", 5), // dist 1
      (3L, "alpha beta", "B2", 5),  // same name, DIFFERENT block → no pair
      (4L, "zzzzzzzzzz", "B1", 5))  // same block, far name → filtered
      .toDF("id", "name", "brand", "size")
    val got = graft.ops.Relational.fuzzyJoinBlocked(
        df, "id", "name", Seq("brand", "size"), maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(got.toSeq == Seq((1L, 2L, 1L)))
    // a collapsed block (size > maxBlock) is EXCLUDED from pairing rather
    // than going quadratic — same discipline as over-full LSH buckets
    val capped = graft.ops.Relational.fuzzyJoinBlocked(
      df, "id", "name", Seq("brand", "size"), maxDist = 3, maxBlock = 2)
    assert(capped.count() == 0) // the B1 block has 3 members
  }

  test("quantileNormalize: rank-matched rows from different sources " +
       "calibrate to identical global scores") {
    // source A scores 1..10, source B 101..110 — same shape, shifted scale.
    // After calibration the i-th ranked row of A and of B must land on the
    // SAME global-distribution value (that is the point of the operator).
    val a = (1 to 10).map(i => ("A", i.toLong, i.toDouble))
    val b = (1 to 10).map(i => ("B", i.toLong + 100, (i + 100).toDouble))
    val got = Stats.quantileNormalize((a ++ b).toDF("src", "id", "x"),
        "x", "src", Seq(col("id")))
      .select("src", "x", "x_qn").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val qa = got.filter(_._1 == "A").sortBy(_._2).map(_._3)
    val qb = got.filter(_._1 == "B").sortBy(_._2).map(_._3)
    assert(qa.sameElements(qb))
    // rank 0 → global min, rank 1 → global max
    assert(qa.head == 1.0 && qa.last == 110.0)
    // calibrated scores are monotone in within-source rank
    assert(qa.zip(qa.tail).forall { case (x, y) => x <= y })
    // NULL score fails fast instead of silently ranking nulls first
    val withNull = (a :+ (("A", 99L, Double.NaN))).map {
      case (s2, i, x) => (s2, i, if (i == 99L) None else Some(x))
    }.toDF("src", "id", "x")
    val ex = intercept[Throwable] {
      Stats.quantileNormalize(withNull, "x", "src", Seq(col("id"))).collect()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + " | " + chain(t.getCause)
    assert(chain(ex).contains("filter nulls"), s"unexpected: ${chain(ex)}")
  }

  test("linearCountDistinct: near-exact at low load; saturated → NULL") {
    val df = (1 to 50).map(i => ("g", s"k$i")).toDF("grp", "k")
    val r = Stats.linearCountDistinct(df, "k", Seq("grp"), m = 256).head()
    assert(r.getLong(1) <= 50) // bucket collisions only reduce occupancy
    val est = r.getDouble(2)
    assert(math.abs(est - 50) / 50.0 < 0.15, s"estimate $est too far from 50")
    // m=4 with 50 distinct keys: every bucket hit → NULL, not −∞
    val sat = Stats.linearCountDistinct(df, "k", Seq("grp"), m = 4).head()
    assert(sat.getLong(1) == 4L && sat.isNullAt(2))
  }

  test("cmJoinSize: never underestimates; exact without collisions, " +
       "exact total with width 1") {
    val a = (Seq.fill(4)("x") ++ Seq.fill(2)("y") ++ Seq("z")).toDF("k")
    val b = (Seq.fill(3)("x") ++ Seq.fill(5)("y")).toDF("k")
    // exact |A ⋈ B| = 4·3 + 2·5 = 22; 3 keys in 1024 buckets → exact
    val wide = Stats.cmJoinSize(a, b, "k", depth = 4, width = 1024)
      .head().getLong(0)
    assert(wide == 22L)
    // width 1: single counter per row → |A|·|B| = 7·8 = 56 (the degenerate
    // upper bound — still one-sided)
    val tiny = Stats.cmJoinSize(a, b, "k", depth = 2, width = 1)
      .head().getLong(0)
    assert(tiny == 56L)
  }

  test("cmJoinSize: disjoint key sets estimate exactly 0, never NULL") {
    val a = Seq("a1", "a2", "a3").toDF("k")
    val b = Seq("b1", "b2", "b3").toDF("k")
    val r = Stats.cmJoinSize(a, b, "k", depth = 4, width = 1 << 16).head()
    assert(!r.isNullAt(0), "empty sketch intersection must not yield NULL")
    assert(r.getLong(0) == 0L)
  }

  test("saltedJoin ≡ plain join for inner and left, matches met exactly once") {
    val probe = Seq((1L, "p1"), (1L, "p2"), (2L, "p3"), (3L, "p4"))
      .toDF("k", "ptag")
    val build = Seq((1L, "b1"), (2L, "b2"), (4L, "b3")).toDF("k", "btag")
    val inner = graft.ops.Relational.saltedJoin(
      probe, build, Seq("k"), col("ptag"), nSalts = 4)
    val plainI = probe.join(build, Seq("k"))
    assert(inner.count() == plainI.count())
    assert(inner.except(plainI).isEmpty && plainI.except(inner).isEmpty)
    val leftJ = graft.ops.Relational.saltedJoin(
      probe, build, Seq("k"), col("ptag"), nSalts = 4, joinType = "left")
    val plainL = probe.join(build, Seq("k"), "left")
    assert(leftJ.count() == plainL.count())
    assert(leftJ.except(plainL).isEmpty && plainL.except(leftJ).isEmpty)
    // right/full outer would emit each unmatched build row nSalts times —
    // rejected up front instead of silently breaking the ≡-plain contract
    for (bad <- Seq("right", "full", "full_outer", "right_outer")) {
      val ex = intercept[IllegalArgumentException] {
        graft.ops.Relational.saltedJoin(
          probe, build, Seq("k"), col("ptag"), nSalts = 4, joinType = bad)
      }
      assert(ex.getMessage.contains("probe-sided"))
    }
  }

  test("kfoldAssign: folds in range, deterministic across runs") {
    val df = (0L until 200L).toDF("id")
    val a = Stats.kfoldAssign(df, "id", k = 5).orderBy("id")
      .collect().map(_.getLong(1))
    val b = Stats.kfoldAssign(df, "id", k = 5).orderBy("id")
      .collect().map(_.getLong(1))
    assert(a.forall(f => f >= 0 && f < 5) && a.sameElements(b))
    assert(a.distinct.length == 5) // all folds populated at n=200
  }

  test("columnStats: null and distinct counts per column in one pass") {
    val df = Seq((1L, Option("a")), (2L, Option("a")), (3L, None))
      .toDF("id", "s")
    val got = Stats.columnStats(df).orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("id", 3L, 0L, 3L), ("s", 3L, 1L, 1L)))
  }

  test("equiDepthHistogram: equal-mass edges on a uniform ramp") {
    val df = (1 to 9).map(_.toDouble).toDF("x")
    val got = Stats.equiDepthHistogram(df, "x", 4).orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got.toSeq == Seq((0L, 1.0, 3.0), (1L, 3.0, 5.0), (2L, 5.0, 7.0),
      (3L, 7.0, 9.0)))
  }

  test("snapshotDiff classifies adds / deletes / changes and drops unchanged") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val next = Seq((2L, "b", 20.0), (3L, "c", 99.0), (4L, "d", 40.0))
      .toDF("k", "s", "v")
    val got = graft.ops.Merge.snapshotDiff(base, next, "k", Seq("s", "v"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "D"), (3L, "C"), (4L, "A")))
  }

  test("snapshotDiff treats null-vs-null as unchanged (null-safe compare)") {
    val base = Seq((1L, Option.empty[String]), (2L, Option("x")))
      .toDF("k", "s")
    val next = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("k", "s")
    val got = graft.ops.Merge.snapshotDiff(base, next, "k", Seq("s"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((2L, "C")))
  }

  test("madOutliers flags by |x-med|/MAD and skips MAD=0 groups") {
    // g1: values 1..9 plus 100 → med 5.5, MAD 2.5 → z(100) = 37.8
    // g2: constant → MAD 0 → excluded entirely
    val df = (((1 to 9).map(_.toDouble) :+ 100.0).map(("g1", _)) ++
      Seq.fill(5)(("g2", 7.0))).zipWithIndex
      .map { case ((g, v), i) => (i.toLong, g, v) }.toDF("id", "grp", "x")
    val got = Stats.madOutliers(df, "x", Seq("grp"), k = 4.0)
      .select("grp", "x", "robust_z").collect()
    assert(got.length == 1)
    assert(got(0).getString(0) == "g1" && got(0).getDouble(1) == 100.0)
    assert(got(0).getDouble(2) == 37.8)
  }

  test("tfIdfTopK ranks by smoothed tf-idf with term tie-break") {
    val docs = Seq((1L, "apple apple banana"), (2L, "banana cherry"))
      .toDF("doc_id", "text")
    val got = Retrieval.tfIdfTopK(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank")
      .select("doc_id", "rank", "term").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    // idf: apple ln(3/2)+1, banana ln(3/3)+1=1, cherry ln(3/2)+1
    // doc1: apple 2*1.405 > banana 1*1 ; doc2: cherry 1.405 > banana 1
    assert(got.toSeq == Seq((1L, 1, "apple"), (1L, 2, "banana"),
      (2L, 1, "cherry"), (2L, 2, "banana")))
  }

  test("asofJoinForward: same-ts match, tolerance boundary, no-match NULL") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2025-01-01 00:$m%02d:00")
    val left = Seq((1L, ts(10), "a"), (1L, ts(20), "b"), (1L, ts(40), "c"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, ts(10), 1.0), (1L, ts(22), 2.0))
      .toDF("k", "t", "rv")
    val got = graft.ops.TimeSeriesOps.asofJoinForward(
        left, right, Seq("k"), "t", Seq("rv"), toleranceSeconds = 120L)
      .orderBy("t").select("tag", "rv").collect()
    assert(got(0).getString(0) == "a" && got(0).getDouble(1) == 1.0) // same ts
    assert(got(1).getString(0) == "b" && got(1).getDouble(1) == 2.0) // +120s, on boundary
    assert(got(2).getString(0) == "c" && got(2).isNullAt(1))         // nothing ahead
  }

  test("asofJoinForward: whole right row is atomic — NULL payload on the " +
       "nearest row stays NULL, never back-filled from a later row") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2025-01-01 00:$m%02d:00")
    val left = Seq((1L, ts(10), "a")).toDF("k", "t", "tag")
    // nearest forward row (00:11) has a NULL payload; a later row (00:12,
    // still inside tolerance) has a value — merge_asof row semantics must
    // NOT mix them: matched_ts = 00:11, rv = NULL.
    val right = Seq((1L, ts(11), Option.empty[Double]),
        (1L, ts(12), Some(2.0)))
      .toDF("k", "t", "rv")
    val got = graft.ops.TimeSeriesOps.asofJoinForward(
        left, right, Seq("k"), "t", Seq("rv"), toleranceSeconds = 600L)
      .select("tag", "rv", "matched_ts").collect()
    assert(got.length == 1)
    assert(got(0).getString(0) == "a")
    assert(got(0).isNullAt(1), "payload must come from the matched row")
    assert(got(0).getTimestamp(2) == ts(11))
  }

  test("overlapJoin: one row per pair across buckets; inclusive-touch; disjoint") {
    val a = Seq((1L, 0L, 10000L, "a1"), (1L, 20000L, 20100L, "a2"))
      .toDF("k", "s", "e", "atag")
    val b = Seq(
      (1L, 5000L, 30000L, "b1"),  // overlaps a1 (spans many buckets) AND a2
      (1L, 10000L, 10500L, "b2"), // touches a1's end exactly
      (1L, 10001L, 19999L, "b3")  // disjoint from both
    ).toDF("k", "bs", "be", "btag")
    val got = graft.ops.Intervals.overlapJoin(a, b, Seq("k"),
        "s", "e", "bs", "be", bucketSeconds = 1000L)
      .select("atag", "btag", "overlap_seconds")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("a1", "b1", 5000L), ("a2", "b1", 100L),
      ("a1", "b2", 0L)))
  }

  test("mergePartials(partialAgg) equals the direct aggregate") {
    val df = Tables.events(spark, "/root/testdata/sf0.001")
    val merged = Stats.mergePartials(
      Stats.partialAgg(df, Seq("event_type"), to_date(col("ts")), "value"),
      Seq("event_type"))
    val direct = df.groupBy("event_type").agg(
      count(col("value")).as("n"),
      sum(col("value").cast(graft.ops.Relational.ExactDec)).cast("double").as("sum_value"),
      min(col("value")).as("min_value"),
      max(col("value")).as("max_value"))
      .withColumn("avg_value", col("sum_value") / col("n"))
    assert(merged.orderBy("event_type").collect()
      .sameElements(direct.orderBy("event_type").collect()))
  }

  test("hllEstimate: small cardinality hits linear-counting near-exactly; " +
       "large stays inside the m=64 error bound; duplicates don't move it") {
    val small = (1 to 5).map(i => ("g", s"k$i")).toDF("grp", "k")
    val sEst = Stats.hllEstimate(small, "k", Seq("grp")).head()
      .getDouble(1)
    assert(math.abs(sEst - 5.0) < 1.0, s"small-range estimate $sEst vs 5")
    // 2000 distinct: raw HLL regime, expected σ ≈ 1.04/√64 ≈ 13%
    val big = (1 to 2000).map(i => ("g", s"k$i")).toDF("grp", "k")
    val bEst = Stats.hllEstimate(big, "k", Seq("grp")).head().getDouble(1)
    assert(math.abs(bEst - 2000) / 2000.0 < 0.30, s"estimate $bEst vs 2000")
    // distinct-count state: repeating every key 7× is a no-op
    val dup = (1 to 2000).flatMap(i => Seq.fill(7)(("g", s"k$i")))
      .toDF("grp", "k")
    assert(Stats.hllEstimate(dup, "k", Seq("grp")).head().getDouble(1) == bEst)
  }

  test("targetEncode: leave-one-out closed form; singleton category " +
       "collapses to the global mean") {
    val df = Seq(("r1", "A", 1.0), ("r2", "A", 3.0), ("r3", "B", 10.0))
      .toDF("id", "cat", "y")
    val g = (1.0 + 3.0 + 10.0) / 3
    val got = Stats.targetEncode(df, "cat", "y", prior = 10.0)
      .select("id", "y_te").collect().map(r => r.getString(0) -> r.getDouble(1))
      .toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got("r1") == r6((4.0 - 1.0 + 10 * g) / (2 - 1 + 10)))
    assert(got("r2") == r6((4.0 - 3.0 + 10 * g) / (2 - 1 + 10)))
    // singleton B: (10 − 10 + p·g)/(0 + p) = g — pure prior, no self-leak
    assert(got("r3") == r6(g))
  }

  test("exactMedianTwoPass: equals the sort-based median on odd/even/" +
       "all-equal/negative groups, even with bins ≪ n") {
    val rows =
      (1 to 101).map(i => ("odd", (i * 37 % 101).toDouble)) ++
      (1 to 100).map(i => ("even", (i * 13 % 100).toDouble)) ++
      Seq.fill(9)(("flat", 42.0)) ++
      (1 to 50).map(i => ("neg", -i.toDouble))
    val df = rows.toDF("grp", "v")
    // bins = 7 forces real narrowing (many values per bucket)
    val got = Stats.exactMedianTwoPass(df, "v", Seq("grp"), bins = 7)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    def truth(vs: Seq[Double]): Double = {
      val s = vs.sorted; val n = s.size
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2
    }
    rows.groupBy(_._1).foreach { case (grp, vs) =>
      assert(got(grp) == truth(vs.map(_._2)), s"group $grp")
    }
  }

  test("seasonalDecompose: pure-seasonal series has zero residuals and no " +
       "anomalies; a planted spike in a noisy series is the one flag") {
    import java.sql.Timestamp
    def ts(day: Int, hr: Int) =
      Timestamp.valueOf(f"2024-01-${day}%02d $hr%02d:00:00")
    // two weeks of a value that depends ONLY on (dow, hour): residual ≡ 0,
    // sd = 0 → z NULL, anomaly false everywhere
    val pure = (1 to 14).flatMap(d => Seq(0, 6, 12).map(h =>
      (s"e$d$h", ts(d, h), "pure", (d % 7) * 100.0 + h)))
    // noisy group, 4 weeks: alternating ±1 around the slot mean plus one
    // 1000-point spike — 4 obs/slot dilutes the spike's pull on its own
    // slot mean enough that only the spike row crosses |z| > 3
    val noisy = (1 to 28).map(d =>
      (s"n$d", ts(d, 3), "noisy",
        50.0 + (if (d == 7) 1000.0 else if (d % 2 == 0) 1.0 else -1.0)))
    val df = (pure ++ noisy).toDF("event_id", "ts", "event_type", "value")
    val got = graft.ops.TimeSeriesOps.seasonalDecompose(
      df, "ts", "value", Seq("event_type")).cache()
    val p = got.filter(col("event_type") === "pure")
    assert(p.filter(col("residual") =!= 0.0).count() == 0)
    assert(p.filter(col("z").isNotNull).count() == 0)
    assert(p.filter(col("is_anomaly")).count() == 0)
    val flagged = got.filter(col("event_type") === "noisy" &&
      col("is_anomaly")).select("event_id").as[String].collect().toSeq
    assert(flagged == Seq("n7"), s"flagged $flagged")
  }

  private def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
  private def emaScan(xs: Seq[Double], a: Double): Seq[Double] =
    xs.tail.scanLeft(xs.head)((acc, x) => (1 - a) * acc + a * x)

  test("macd: three-leg composition equals the driver-side recursion; " +
    "signalSpan=1 pins signal ≡ macd") {
    val xs = Seq(1.0, 4.0, 2.0, 8.0, 5.0, 7.0)
    val df = xs.zipWithIndex.map { case (x, i) => (1L, i.toLong, i, x) }
      .toDF("k", "id", "tm", "x")
    val got = Indicators.macd(df, "x", Seq("k"), "tm", fast = 3, slow = 5,
        signalSpan = 2, carry = Seq("id"))
      .orderBy("id")
      .select("ema_fast", "ema_slow", "macd", "macd_signal", "macd_hist")
      .collect()
    val ef = emaScan(xs, 2.0 / 4).map(q6)
    val es = emaScan(xs, 2.0 / 6).map(q6)
    val m  = ef.zip(es).map { case (f, s) => f - s }
    val sg = emaScan(m, 2.0 / 3).map(q6)
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getDouble(0) == ef(i) && r.getDouble(1) == es(i), s"ema row $i")
      assert(r.getDouble(2) == m(i) && r.getDouble(3) == sg(i), s"macd row $i")
      assert(r.getDouble(4) == m(i) - sg(i), s"hist row $i")
    }
    // α_signal = 1 (span 1): the signal fold replays macd itself
    val deg = Indicators.macd(df, "x", Seq("k"), "tm", fast = 3, slow = 5,
        signalSpan = 1, carry = Seq("id"))
      .select("macd", "macd_signal").collect()
    deg.foreach(r => assert(q6(r.getDouble(0)) == r.getDouble(1)))
  }

  test("macd: oversized keys route to the chunk-stitch composition and " +
    "agree with the fused fold to a quant6 ulp") {
    val xs = (1 to 50).map(i => math.sin(i * 0.7) * 10 + 20)
    val df = xs.zipWithIndex.map { case (x, i) => (1L, i.toLong, i, x) }
      .toDF("k", "id", "tm", "x")
    val cols = Seq("ema_fast", "ema_slow", "macd", "macd_signal", "macd_hist")
    def run(inlineMax: Long) =
      Indicators.macd(df, "x", Seq("k"), "tm", fast = 5, slow = 9,
          signalSpan = 4, carry = Seq("id"), inlineMax = inlineMax)
        .orderBy("id").select(cols.map(col): _*).collect()
    val fused  = run(1L << 20)
    val routed = run(8L) // every key oversized → macdComposed
    fused.zip(routed).zipWithIndex.foreach { case ((a, b), i) =>
      cols.indices.foreach { j =>
        // each quantized leg may sit one 6-dp ulp off (chunk-stitch vs
        // sequential fold); differences stack through macd and hist
        assert(math.abs(a.getDouble(j) - b.getDouble(j)) <= 5e-6,
          s"row $i col ${cols(j)}: fused ${a.getDouble(j)} vs routed " +
            s"${b.getDouble(j)}")
      }
    }
  }

  test("stochastic: %K from the trailing frame, %D the pinned 3-sum; " +
    "flat frame → NULL") {
    val xs = Seq(1.0, 3.0, 2.0, 5.0, 4.0)
    val df = xs.zipWithIndex.map { case (x, i) => (1L, i, x) }.toDF("k", "i", "x")
    val rows = Indicators.stochastic(df, "x", Seq("k"), Seq(col("i")), n = 3)
      .orderBy("i").select("pct_k", "pct_d").collect()
    assert(rows(0).isNullAt(0) && rows(1).isNullAt(0))
    assert(rows(2).getDouble(0) == 50.0)        // (2-1)/(3-1)
    assert(rows(3).getDouble(0) == 100.0)       // (5-2)/(5-2)
    assert(rows(4).getDouble(0) == q6(200.0 / 3)) // (4-2)/(5-2)
    assert(rows(3).isNullAt(1))                 // only two %K values yet
    assert(rows(4).getDouble(1) == q6((q6(200.0 / 3) + 100.0 + 50.0) / 3.0))
    val flat = Seq.fill(4)(7.0).zipWithIndex.map { case (x, i) => (1L, i, x) }
      .toDF("k", "i", "x")
    val f = Indicators.stochastic(flat, "x", Seq("k"), Seq(col("i")), n = 3)
      .select("pct_k").collect()
    assert(f.forall(_.isNullAt(0)))             // hi = lo → NULL, not ÷0
  }

  test("acf: a linear ramp is perfectly autocorrelated at every lag; " +
    "minPairs gates short lags") {
    val df = (1 to 12).map(t => (1L, t, t.toDouble)).toDF("k", "t", "x")
    val got = Indicators.acf(df, "x", Seq("k"), Seq(col("t")), maxLag = 3,
        minPairs = 10L)
      .collect().map(r => r.getInt(1) -> (r.getLong(2), r)).toMap
    assert(got(1)._1 == 11L && got(1)._2.getDouble(3) == 1.0)
    assert(got(2)._1 == 10L && got(2)._2.getDouble(3) == 1.0)
    assert(got(3)._1 == 9L && got(3)._2.isNullAt(3)) // under minPairs
  }

  test("cusumSeries: Page folds against the hand recursion around μ") {
    val df = Seq((1L, 1, 10L, 1.0), (1L, 2, 11L, 2.0), (1L, 3, 12L, 3.0))
      .toDF("k", "t", "id", "x")
    val rows = Indicators.cusumSeries(df, "x", Seq("k"), "t", carry = Seq("id"))
      .orderBy("id").select("mu", "cusum_pos", "cusum_neg").collect()
    // μ = 2: s⁺ = [0, 0, 1]; s⁻ = [−1, −1, 0]
    assert(rows.forall(_.getDouble(0) == 2.0))
    assert(rows.map(_.getDouble(1)).toSeq == Seq(0.0, 0.0, 1.0))
    assert(rows.map(_.getDouble(2)).toSeq == Seq(-1.0, -1.0, 0.0))
  }

  test("candlePatterns: doji / hammer / bullish-engulfing flags on " +
    "constructed bars") {
    import java.sql.Timestamp
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2025-01-01 $h%02d:$m%02d:00")
    val df = Seq(
      // hour 9: red bar open 5 → close 4
      (1L, ts(9, 0), 5.0), (1L, ts(9, 10), 4.0),
      // hour 10: green bar 3.9 → 5.2 engulfing the previous body
      (1L, ts(10, 0), 3.9), (1L, ts(10, 10), 5.2),
      // hour 11: tiny body inside a wide range → doji
      (1L, ts(11, 0), 10.0), (1L, ts(11, 5), 11.0), (1L, ts(11, 10), 10.05),
      // hour 12: long lower wick, tiny upper, body too big for doji → hammer
      (1L, ts(12, 0), 10.0), (1L, ts(12, 5), 8.0), (1L, ts(12, 10), 10.5)
    ).toDF("k", "t", "x")
    val got = Indicators.candlePatterns(df, "x", Seq("k"), "t")
      .orderBy("bar").select("doji", "hammer", "bull_engulf").collect()
    assert(got.length == 4)
    assert(got.map(_.getBoolean(2)).toSeq == Seq(false, true, false, false))
    assert(got.map(_.getBoolean(0)).toSeq == Seq(false, false, true, false))
    assert(got.map(_.getBoolean(1)).toSeq == Seq(false, false, false, true))
  }

  test("tailRisk: VaR/ES are exact order statistics — k = ⌈αn⌉ smallest") {
    val df = (1 to 20).map(v => ("g", v.toLong, v.toDouble))
      .toDF("g", "id", "x")
    val r25 = Stats.tailRisk(df, "x", Seq("g"), id = "id", alpha = 0.25)
      .collect()(0)
    assert(r25.getLong(1) == 20L && r25.getLong(2) == 5L)
    assert(r25.getDouble(3) == 5.0 && r25.getDouble(4) == 3.0)
    val r05 = Stats.tailRisk(df, "x", Seq("g"), id = "id", alpha = 0.05)
      .collect()(0)
    assert(r05.getLong(2) == 1L && r05.getDouble(3) == 1.0 &&
      r05.getDouble(4) == 1.0)
  }

  test("donchian: trailing bands, midpoint, breakout vs previous upper") {
    val df = (1 to 5).map(i => (1L, i, i.toDouble)).toDF("k", "i", "x")
    val rows = Indicators.donchian(df, "x", Seq("k"), Seq(col("i")), n = 3)
      .orderBy("i").select("dc_upper", "dc_lower", "dc_mid", "breakout")
      .collect()
    assert(rows(0).isNullAt(0) && rows(1).isNullAt(0))
    assert(rows(2).getDouble(0) == 3.0 && rows(2).getDouble(1) == 1.0 &&
      rows(2).getDouble(2) == 2.0 && !rows(2).getBoolean(3))
    assert(rows(3).getDouble(0) == 4.0 && rows(3).getBoolean(3)) // 4 > 3
    assert(rows(4).getBoolean(3))                                // 5 > 4
  }

  test("obv: volume flows toward each move's side; flat and first rows " +
    "contribute zero") {
    val df = Seq((1L, 1, 5.0), (1L, 2, 7.0), (1L, 3, 6.0), (1L, 4, 6.0),
      (1L, 5, 9.0)).toDF("k", "i", "x").withColumn("vol", abs(col("x")))
    val got = Indicators.obv(df, "x", "vol", Seq("k"), Seq(col("i")))
      .orderBy("i").select("obv").collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(0.0, 7.0, 1.0, 1.0, 10.0))
  }

  test("engleGranger: orthogonal alternating residuals give the " +
    "closed-form DF stat; exact fit → NULL (zero residual variance)") {
    // y = 2x + 1 + e with e = [.5,-.5,-.5,.5] ⊥ {1,x} → OLS recovers
    // (2, 1) exactly; the DF regression on e has φ = −4/3, t = −2
    val e = Seq(0.5, -0.5, -0.5, 0.5)
    val df = (1 to 4).map(i =>
      (1L, i, i.toDouble, 2.0 * i + 1 + e(i - 1))).toDF("k", "i", "x", "y")
    val r = Indicators.engleGranger(df, "y", "x", Seq("k"), Seq(col("i")))
      .collect()(0)
    assert(r.getLong(1) == 4L && r.getDouble(2) == 2.0 &&
      r.getDouble(3) == 1.0)                       // n_obs, beta, alpha
    assert(r.getLong(4) == 3L)                     // m diffs
    assert(r.getDouble(5) == -1.333333)            // φ = −4/3
    assert(r.getDouble(6) == -2.0, s"df ${r.getDouble(6)}")
    // exact linear fit: residuals identically 0 → sll = 0 → NULLs
    val exact = (1 to 4).map(i => (1L, i, i.toDouble, 2.0 * i + 1))
      .toDF("k", "i", "x", "y")
    val ex = Indicators.engleGranger(exact, "y", "x", Seq("k"), Seq(col("i")))
      .collect()(0)
    assert(ex.isNullAt(5) && ex.isNullAt(6))
  }

  test("ksTest: disjoint samples → D = 1; interleaved → exact ECDF gap") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0))
      .toDF("g", "x")
    val r = Stats.ksTest(df, "x", "g", "a", "b").collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L &&
      r.getDouble(2) == 1.0)
    val mixed = Seq(("a", 1.0), ("b", 2.0), ("a", 3.0), ("b", 4.0))
      .toDF("g", "x")
    val m = Stats.ksTest(mixed, "x", "g", "a", "b").collect()(0)
    assert(m.getDouble(2) == 0.5)
  }

  test("benford: portable integer-path digit extraction; sub-cent values " +
    "drop; shares and expectations match") {
    val df = Seq(1.23, 0.05, 23.4, 0.004, 9.99, 1.0)
      .map(("g", _)).toDF("g", "x")
    val got = Stats.benford(df, "x", Seq("g"))
      .collect().map(r => r.getInt(1) -> (r.getLong(2), r.getDouble(4)))
      .toMap
    // digits: 1.23→1, 0.05→5, 23.4→2, 0.004→dropped, 9.99→9, 1.0→1
    assert(got.keySet == Set(1, 2, 5, 9))
    assert(got(1)._1 == 2L && got(1)._2 == 0.4)
    assert(got(2)._1 == 1L && got(2)._2 == 0.2)
    val ln = math.log _
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val p1 = Stats.benford(df, "x", Seq("g"))
      .filter(col("digit") === 1).collect()(0).getDouble(5)
    assert(p1 == r6(ln(2.0) / ln(10.0)))           // log₁₀ 2 ≈ 0.301030
  }

  test("mannWhitney: disjoint samples give U=0; tie correction matches " +
    "the closed form") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 4.0), ("b", 5.0), ("b", 6.0)).toDF("g", "x")
    val r = Stats.mannWhitney(df, "x", "g", "a", "b").collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 0.0)                       // U₁ = 0
    // z = (0 − 4.5)/√5.25
    val z = BigDecimal(-4.5 / math.sqrt(5.25))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(3) == z, s"z ${r.getDouble(3)}")
    // ties: pooled [1,1,1,2] → avg rank 2 for the 1s; var telescopes to 1
    val t = Seq(("a", 1.0), ("a", 1.0), ("b", 1.0), ("b", 2.0)).toDF("g", "x")
    val rt = Stats.mannWhitney(t, "x", "g", "a", "b").collect()(0)
    assert(rt.getDouble(2) == 1.0 && rt.getDouble(3) == -1.0)
  }

  test("heikinAshi: hand candles — closed-form hc, recursive ho") {
    import java.sql.Timestamp
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2025-01-01 $h%02d:$m%02d:00")
    val df = Seq(
      (1L, ts(9, 0), 10.0), (1L, ts(9, 5), 13.0), (1L, ts(9, 10), 9.0),
      (1L, ts(9, 15), 12.0),
      (1L, ts(10, 0), 12.0), (1L, ts(10, 5), 15.0), (1L, ts(10, 10), 11.0),
      (1L, ts(10, 15), 14.0)).toDF("k", "t", "x")
    val rows = Indicators.heikinAshi(df, "x", Seq("k"), "t")
      .orderBy("bar")
      .select("ha_open", "ha_close", "ha_high", "ha_low").collect()
    assert(rows(0).getDouble(0) == 11.0 && rows(0).getDouble(1) == 11.0)
    assert(rows(0).getDouble(2) == 13.0 && rows(0).getDouble(3) == 9.0)
    // ho₂ = (ho₁ + hc₁)/2 = 11; hc₂ = (12+15+11+14)/4 = 13
    assert(rows(1).getDouble(0) == 11.0 && rows(1).getDouble(1) == 13.0)
    assert(rows(1).getDouble(2) == 15.0 && rows(1).getDouble(3) == 11.0)
  }

  test("ichimoku: midlines at custom spans on a linear ramp; " +
    "shifted spans and chikou") {
    val df = (1 to 12).map(i => (1L, i, i.toDouble)).toDF("k", "i", "x")
    val rows = Indicators.ichimoku(df, "x", Seq("k"), Seq(col("i")),
        tenkanN = 3, kijunN = 5, senkouN = 7)
      .orderBy("i")
      .select("tenkan", "kijun", "senkou_a", "senkou_b", "chikou").collect()
    assert(rows(1).isNullAt(0))                      // frame not full
    assert(rows(2).getDouble(0) == 2.0)              // (3+1)/2
    assert(rows(4).getDouble(1) == 3.0)              // (5+1)/2
    // senkou_a at row 10 = (tenkan₅ + kijun₅)/2 = (4+3)/2
    assert(rows(9).getDouble(2) == 3.5)
    // senkou_b at row 12 = midline₇ at row 7 = (7+1)/2
    assert(rows(11).getDouble(3) == 4.0)
    assert(rows(0).getDouble(4) == 6.0)              // chikou = lead 5
    assert(rows(7).isNullAt(4))
  }

  test("atr: true range picks the widest of the three gaps; Wilder " +
    "smoothing is the α=1/n fold") {
    import java.sql.Timestamp
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2025-01-01 $h%02d:$m%02d:00")
    val df = Seq(
      (1L, ts(9, 0), 10.0), (1L, ts(9, 5), 13.0), (1L, ts(9, 10), 9.0),
      (1L, ts(9, 15), 12.0),                       // bar1: h13 l9 c12, tr 4
      (1L, ts(10, 0), 12.0), (1L, ts(10, 5), 16.0), (1L, ts(10, 10), 11.0),
      (1L, ts(10, 15), 14.0)                       // bar2: h16 l11, tr 5
    ).toDF("k", "t", "x")
    val rows = Indicators.atr(df, "x", Seq("k"), "t", n = 2)
      .orderBy("bar").select("tr", "atr").collect()
    assert(rows(0).getDouble(0) == 4.0 && rows(0).getDouble(1) == 4.0)
    assert(rows(1).getDouble(0) == 5.0 && rows(1).getDouble(1) == 4.5)
  }

  test("adx: hand directional system — DI split, DX, held-ADX fold") {
    import java.sql.Timestamp
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2025-01-01 $h%02d:$m%02d:00")
    // three bars via 3 ticks each: (h,l,c) = (10,8,9), (12,10,11), (11,9,10)
    val df = Seq(
      (1L, ts(9, 0), 10.0), (1L, ts(9, 5), 8.0), (1L, ts(9, 10), 9.0),
      (1L, ts(10, 0), 12.0), (1L, ts(10, 5), 10.0), (1L, ts(10, 10), 11.0),
      (1L, ts(11, 0), 11.0), (1L, ts(11, 5), 9.0), (1L, ts(11, 10), 10.0)
    ).toDF("k", "t", "x")
    val rows = Indicators.adx(df, "x", Seq("k"), "t", n = 2)
      .orderBy("bar").select("str", "di_plus", "di_minus", "dx", "adx")
      .collect()
    assert(rows.map(_.getDouble(0)).toSeq == Seq(2.0, 2.5, 2.25))
    assert(rows.map(_.getDouble(1)).toSeq == Seq(0.0, 40.0, q6(100 * 0.5 / 2.25)))
    assert(rows(2).getDouble(2) == q6(100 * 0.5 / 2.25))
    assert(rows(0).isNullAt(3))                    // DI⁺+DI⁻ = 0 → DX NULL
    assert(rows(1).getDouble(3) == 100.0 && rows(2).getDouble(3) == 0.0)
    assert(rows(0).isNullAt(4))                    // ADX₁ = DX₁ = NULL
    assert(rows(1).getDouble(4) == 50.0)           // .5·0 + .5·100
    assert(rows(2).getDouble(4) == 25.0)           // .5·50 + .5·0
  }

  test("ccf: a pure lag-2 copy peaks at exactly lag 2") {
    val xs = Seq(3.0, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3)
    val df = xs.zipWithIndex.map { case (x, i) =>
      (1L, i + 1, x, if (i >= 2) Some(xs(i - 2)) else None)
    }.toDF("k", "i", "xc", "yv")
    val got = Indicators.ccf(df, "yv", "xc", Seq("k"), Seq(col("i")),
        maxLag = 3, minPairs = 10L)
      .collect().map(r => r.getInt(1) -> r).toMap
    assert(got(2).getDouble(3) == 1.0, s"lag2 ${got(2)}")
    assert(!got(0).isNullAt(3) && got(0).getDouble(3) < 1.0)
  }

  test("varianceRatio: an alternating series collapses VR(2) to zero; " +
    "a pure trend degenerates to NULL") {
    val alt = (1 to 12).map(i => (1L, i, (i % 2).toDouble)).toDF("k", "i", "x")
    val got = Indicators.varianceRatio(alt, "x", Seq("k"), Seq(col("i")),
        qs = Seq(2, 3))
      .collect().map(r => r.getInt(1) -> r).toMap
    assert(got(2).getDouble(4) == 0.0, s"vr2 ${got(2)}")
    assert(!got(3).isNullAt(4) && got(3).getDouble(4) > 0)
    val trend = (1 to 12).map(i => (1L, i, i.toDouble)).toDF("k", "i", "x")
    val t = Indicators.varianceRatio(trend, "x", Seq("k"), Seq(col("i")),
      qs = Seq(2)).collect()(0)
    assert(t.isNullAt(4))                          // σ²₁ = 0 → NULL
  }

  test("underwater: episode split at peak touches, depth and length; " +
    "monotonic series has zero episodes") {
    val df = Seq(10.0, 8, 9, 11, 11, 7).zipWithIndex
      .map { case (x, i) => (1L, i, x) }.toDF("k", "i", "x")
    val r = Indicators.underwater(df, "x", Seq("k"), Seq(col("i")))
      .collect()(0)
    assert(r.getLong(1) == 6L && r.getLong(2) == 2L && r.getLong(3) == 2L)
    assert(r.getDouble(4) == BigDecimal(7.0 / 11 - 1)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val mono = (1 to 5).map(i => (1L, i, i.toDouble)).toDF("k", "i", "x")
    val m = Indicators.underwater(mono, "x", Seq("k"), Seq(col("i")))
      .collect()(0)
    assert(m.getLong(2) == 0L && m.getLong(3) == 0L && m.isNullAt(4))
  }

  test("calendarAnova: hand two-group F over day-of-week returns") {
    import java.sql.Timestamp
    def ts(d: Int) = Timestamp.valueOf(f"2025-01-$d%02d 12:00:00")
    // returns: Mon {1, 3}, Sun {5} → SSB 6, SSW 2, F = 3
    val df = Seq((1L, ts(5), 0.0), (1L, ts(6), 1.0),
      (1L, ts(12), 6.0), (1L, ts(13), 9.0)).toDF("k", "t", "x")
    val rows = Indicators.calendarAnova(df, "x", Seq("k"), "t",
        Seq(col("t"))).collect().map(r => r.getInt(0) -> r).toMap
    assert(rows(1).getLong(1) == 1L && rows(1).getDouble(2) == 5.0) // Sun
    assert(rows(2).getLong(1) == 2L && rows(2).getDouble(2) == 2.0) // Mon
    assert(rows.values.forall(_.getDouble(3) == 3.0))
    assert(rows(1).getLong(4) == 2L && rows(1).getLong(5) == 3L)
  }

  test("momentStats: hand central moments; constant group → NULL shape " +
    "stats") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 5.0), ("b", 5.0), ("b", 5.0)).toDF("g", "x")
    val got = Stats.momentStats(df, "x", Seq("g"))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert(a.getLong(1) == 3L && a.getDouble(2) == 2.0)
    assert(a.getDouble(3) == q6(2.0 / 3))     // m2 = 2/3
    assert(a.getDouble(4) == 0.0)             // symmetric → skew 0
    assert(a.getDouble(5) == -1.5)            // m4/m2² − 3 = 1.5 − 3
    val b = got("b")
    assert(b.getDouble(3) == 0.0 && b.isNullAt(4) && b.isNullAt(5))
  }

  test("spearman: monotone ⇒ 1 through ties; constant margin ⇒ NULL") {
    val df = Seq(("a", 1.0, 10.0), ("a", 2.0, 40.0), ("a", 2.0, 40.0),
      ("a", 3.0, 90.0), ("b", 1.0, 7.0), ("b", 2.0, 7.0), ("b", 3.0, 7.0))
      .toDF("g", "x", "y")
    val got = Stats.spearman(df, "x", "y", Seq("g"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("a").getLong(1) == 4L && got("a").getDouble(2) == 1.0)
    assert(got("b").isNullAt(2)) // constant y → zero rank variance
  }

  test("runsTest: hand runs count and z on a 5-move series") {
    // x = 1,2,3,2,1,2 → moves +,+,−,−,+ → 3 runs, n1=3, n2=2
    val df = Seq((1, 1.0), (2, 2.0), (3, 3.0), (4, 2.0), (5, 1.0),
      (6, 2.0)).toDF("i", "x").withColumn("g", lit(1))
    val r = Indicators.runsTest(df, "x", Seq("g"), Seq(col("i")))
      .collect().head
    assert(r.getLong(1) == 5L && r.getLong(2) == 3L &&
      r.getLong(3) == 2L && r.getLong(4) == 3L)
    // μ = 2·3·2/5 + 1 = 3.4, σ² = 12·(12−5)/(25·4) = 0.84
    val z = (3.0 - 3.4) / math.sqrt(0.84)
    assert(r.getDouble(5) == q6(z))
  }

  test("runsTest: zero moves dropped before run counting") {
    // x = 1,1,2 → the flat move is discarded → 1 up-move, no down → z NULL
    val df = Seq((1, 1.0), (2, 1.0), (3, 2.0)).toDF("i", "x")
      .withColumn("g", lit(1))
    val r = Indicators.runsTest(df, "x", Seq("g"), Seq(col("i")))
      .collect().head
    assert(r.getLong(1) == 1L && r.getLong(2) == 1L && r.getLong(3) == 0L)
    assert(r.isNullAt(5))
  }

  test("pettitt: step change located at the break, integer K") {
    // 1,1,1,10,10,10 → U = (−3,−6,−9,−6,−3), K = 9 at t = 3
    val df = Seq((1, 1.0), (2, 1.0), (3, 1.0), (4, 10.0), (5, 10.0),
      (6, 10.0)).toDF("i", "x").withColumn("g", lit(1))
    val r = Indicators.pettitt(df, "x", Seq("g"), Seq(col("i")))
      .collect().head
    assert(r.getLong(1) == 6L && r.getLong(2) == 9L && r.getLong(3) == 3L)
    val p = 2.0 * math.exp(-6.0 * 81.0 / (216.0 + 36.0))
    assert(r.getDouble(4) == q6(p))
  }

  test("hurst: degenerate scales → NULL; golden vs naive loop") {
    import org.apache.spark.sql.Row
    // cumsum of alternating ±1: every m ≥ 2 block mean is 0 → 1 scale
    val alt = (0 to 8).map(i => (i, if (i % 2 == 0) 0.0 else 1.0))
      .toDF("i", "x").withColumn("g", lit(1))
    val a = Indicators.hurst(alt, "x", Seq("g"), Seq(col("i")),
      ms = Seq(1, 2, 4)).collect().head
    assert(a.getLong(1) == 1L && a.isNullAt(2))
    // golden: naive double-loop aggregated-variance H on the same rets
    val rets = Seq(1.0, 2.0, -1.0, 3.0, 0.0, -2.0, 4.0, 1.0)
    val xs = rets.scanLeft(0.0)(_ + _)
    val df = xs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("i", "x")
      .withColumn("g", lit(1))
    val ms = Seq(1, 2, 4)
    val pts = ms.flatMap { m =>
      val means = rets.grouped(m).filter(_.size == m)
        .map(b => b.sum / m).toSeq
      if (means.size < 2) None else {
        val k = means.size
        val v = (means.map(b => b * b).sum - means.sum * means.sum / k) /
          (k - 1)
        if (v > 0) Some((math.log(m.toDouble), math.log(v))) else None
      }
    }
    val k = pts.size.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    val got = Indicators.hurst(df, "x", Seq("g"), Seq(col("i")), ms)
      .collect().head
    assert(got.getLong(1) == pts.size.toLong)
    assert(math.abs(got.getDouble(2) - (1.0 + slope / 2.0)) < 1e-5)
  }

  test("kalmanLevel: exact replay of the scalar recursion") {
    val xs = Seq(10.0, 12.0, 11.0, 13.0)
    val df = xs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("i", "x")
      .withColumn("g", lit(1))
    val (qv, rv) = (0.01, 1.0)
    var (level, p) = (xs.head, rv)
    val exp = xs.head +: xs.tail.map { x =>
      val ppred = p + qv
      val k = ppred / (ppred + rv)
      level = level + k * (x - level)
      p = (1.0 - k) * ppred
      level
    }
    val got = Indicators.kalmanLevel(df, "x", Seq("g"), "i", qv, rv)
      .orderBy("i").collect().map(_.getDouble(3))
    assert(got.toSeq == exp.map(q6))
    // filter starts at the first observation, gain < 1 thereafter
    assert(got.head == 10.0 && math.abs(got(1) - 12.0) > 0.9)
  }

  test("kalmanLevel / heikinAshi: single-bar keys take the closed form " +
       "(sequence(2,1) counts DOWN — the fold must be guarded)") {
    // a key with exactly one observation: sequence(2, size) = [2, 1] would
    // run two out-of-bounds fold iterations emitting garbage rows (or an
    // ANSI abort); the guard returns kf = x and ho = (o + c)/2 directly.
    // Mixed with a 3-bar key to prove the guard doesn't disturb the fold.
    val df = Seq((1, 1, 10.0), (2, 1, 42.0), (2, 2, 44.0), (2, 3, 43.0))
      .toDF("g", "i", "x")
    val kf = Indicators.kalmanLevel(df, "x", Seq("g"), "i", 0.01, 1.0)
      .select("g", "i", "kf_level")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(kf.size == 4)
    assert(kf((1, 1)) == 10.0)        // closed form: kf₁ = x₁
    assert(kf((2, 1)) == 42.0)        // fold path unchanged
    import java.sql.Timestamp
    def ts(h: Int) = Timestamp.valueOf(f"2025-01-01 $h%02d:00:00")
    val hdf = Seq((1, ts(9), 10.0), (2, ts(9), 42.0), (2, ts(10), 44.0),
      (2, ts(11), 43.0)).toDF("g", "t", "x")
    val ha = Indicators.heikinAshi(hdf, "x", Seq("g"), "t")
      .orderBy("bar").select("g", "ha_open").collect()
      .groupBy(_.getInt(0)).view.mapValues(_.map(_.getDouble(1)).toSeq).toMap
    assert(ha(1) == Seq(10.0))        // single bar: ho = (o + c)/2 = x
    assert(ha(2).size == 3 && ha(2).head == 42.0)
  }

  test("holtLinear: exact replay of the dyadic double-smoothing recursion") {
    // α=0.5, β=0.25; xs 10,12,11,14: l=10,12,12.5,14.0625;
    // b=2,2,1.625,1.609375; fitted=10,12,14,14.125 — all dyadic-exact
    val df = Seq(10.0, 12.0, 11.0, 14.0).zipWithIndex
      .map { case (x, i) => (1, i, x) }.toDF("g", "i", "x")
    val rows = Indicators.holtLinear(df, "x", Seq("g"), "i",
        alpha = 0.5, beta = 0.25)
      .orderBy("i").select("level", "trend", "fitted").collect()
    assert(rows.map(_.getDouble(0)).toSeq == Seq(10.0, 12.0, 12.5, 14.0625))
    assert(rows.map(_.getDouble(1)).toSeq == Seq(2.0, 2.0, 1.625, 1.609375))
    assert(rows.map(_.getDouble(2)).toSeq == Seq(10.0, 12.0, 14.0, 14.125))
  }

  test("seasonalDecompose: pure period-3 cycle — flat trend, exact " +
       "seasonal pattern, zero residuals") {
    val df = (1 to 9).map(i => (1, i, ((i - 1) % 3 + 1).toDouble))
      .toDF("g", "i", "x")
    val rows = Indicators.seasonalDecompose(df, "x", Seq("g"), Seq(col("i")),
        period = 3)
      .orderBy("i").collect()
    val trend = rows.map(r => if (r.isNullAt(4)) None else Some(r.getDouble(4)))
    assert(trend.head.isEmpty && trend.last.isEmpty)        // edges NULL
    assert(trend.slice(1, 8).forall(_.contains(2.0)))
    val seasonal = rows.map(_.getDouble(5)) // every row has a phase mean
    assert(rows.map(r => (r.getInt(3), r.getDouble(5))).distinct.sorted
      .toSeq == Seq((0, -1.0), (1, 0.0), (2, 1.0)))
    assert(rows.slice(1, 8).forall(_.getDouble(6) == 0.0))  // resid ≡ 0
    assert(seasonal.length == 9)
  }

  test("seasonalDecompose: short series with a never-detrended phase — " +
       "seasonal sums to zero over PRESENT phases (documented convention)") {
    // period 5, 6 rows → only rows 3 and 4 (phases 2 and 3) get a full
    // centered window; phases 0, 1, 4 never detrend. The re-centering
    // offset is the mean over the two PRESENT phase means, so their
    // seasonal values sum to zero and absent phases emit NULL seasonal.
    val df = Seq((1, 1, 10.0), (1, 2, 20.0), (1, 3, 15.0), (1, 4, 25.0),
      (1, 5, 12.0), (1, 6, 18.0)).toDF("g", "i", "x")
    val rows = Indicators.seasonalDecompose(df, "x", Seq("g"), Seq(col("i")),
        period = 5)
      .orderBy("i").collect()
    val byPhase = rows.map(r => r.getInt(3) ->
      (if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toMap
    assert(byPhase(0).isEmpty && byPhase(1).isEmpty && byPhase(4).isEmpty,
      s"absent phases must have NULL seasonal: $byPhase")
    val present = Seq(byPhase(2), byPhase(3)).flatten
    assert(present.length == 2 && math.abs(present.sum) < 1e-9,
      s"present-phase seasonal must sum to zero: $present")
  }

  test("forecastAccuracy: hand MAE/RMSE/SMAPE/MASE on the Holt fixture; " +
       "constant series gives NULL MASE") {
    // actuals 10,12,11,14 vs fitted 10,12,14,14.125 → e = 0,0,−3,−0.125;
    // naive diffs 2,−1,3 → naive MAE = 2
    val df = Seq((1, 1, 10.0, 10.0), (1, 2, 12.0, 12.0), (1, 3, 11.0, 14.0),
      (1, 4, 14.0, 14.125), (2, 1, 5.0, 6.0), (2, 2, 5.0, 6.0))
      .toDF("g", "i", "y", "yhat")
    val got = Indicators.forecastAccuracy(df, "y", "yhat", Seq("g"),
        Seq(col("i")))
      .collect().map(r => r.getInt(0) -> r).toMap
    val r1 = got(1)
    assert(r1.getLong(1) == 4L)
    assert(r1.getDouble(2) == q6(3.125 / 4))
    assert(r1.getDouble(3) == q6(math.sqrt((9.0 + 0.015625) / 4)))
    val smape = (2 * 3.0 / 25 + 2 * 0.125 / 28.125) / 4
    assert(math.abs(r1.getDouble(4) - smape) < 1e-6)
    assert(r1.getDouble(5) == q6(3.125 / 4 / 2.0))
    // group 2 never moves: naive MAE = 0 → MASE NULL, MAE still 1
    assert(got(2).getDouble(2) == 1.0 && got(2).isNullAt(5))
  }

  test("rollSpread: bouncing prices recover the spread; trend gives NULL") {
    // bounce 10,11,10,11,10 → d = +1,−1,+1,−1; pairs (d,dl): n=3,
    // Σd=−1, Σdl=1, Σd·dl=−3 → cov = (−3 + 1/3)/3 = −8/9,
    // spread = 2·√(8/9) = 1.885618
    val df = (Seq(10.0, 11.0, 10.0, 11.0, 10.0).zipWithIndex.map {
      case (p, i) => (1, i, p)
    } ++ Seq(1.0, 2.0, 3.0, 4.0).zipWithIndex.map {
      case (p, i) => (2, i, p)
    }).toDF("g", "i", "x")
    val got = Indicators.rollSpread(df, "x", Seq("g"), Seq(col("i")))
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(got(1).getLong(1) == 3L)
    assert(got(1).getDouble(2) == q6(-8.0 / 9))
    assert(got(1).getDouble(3) == q6(2 * math.sqrt(8.0 / 9)))
    // pure trend: d ≡ 1, cov = 0 → no spread estimate
    assert(got(2).isNullAt(3))
  }

  test("amihud: mean |return| per unit volume; zero-volume rows drop") {
    // prices 10,12,11 volumes 5,2,4 → |2|/2 = 1, |−1|/4 = 0.25 → 0.625;
    // the zero-volume 4th row must not contribute (and not divide by zero)
    val df = Seq((1, 1, 10.0, 5.0), (1, 2, 12.0, 2.0), (1, 3, 11.0, 4.0),
      (1, 4, 13.0, 0.0)).toDF("g", "i", "x", "vol")
    val r = Indicators.amihud(df, "x", "vol", Seq("g"), Seq(col("i")))
      .collect().head
    assert(r.getLong(1) == 2L && r.getDouble(2) == 0.625)
  }

  test("garch: exact replay of the scalar recursion; single-return key " +
       "takes the unconditional seed") {
    // ω=0.25, α=0.25, β=0.5 → σ²₁ = 0.25/0.25 = 1; xs 10,12,11,14 →
    // rets 2,−1,3: σ²₂ = 0.25+0.25·4+0.5·1 = 1.75,
    // σ²₃ = 0.25+0.25·1+0.5·1.75 = 1.375 (all dyadic-exact)
    val df = (Seq(10.0, 12.0, 11.0, 14.0).zipWithIndex.map {
      case (x, i) => (1, i, x)
    } :+ (2, 0, 5.0) :+ (2, 1, 7.0)).toDF("g", "i", "x")
    val got = Indicators.garch(df, "x", Seq("g"), "i",
        omega = 0.25, alpha = 0.25, beta = 0.5)
      .orderBy("g", "i")
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    assert(got.size == 4)
    assert(got((1, 1)) == ((2.0, 1.0)))
    assert(got((1, 2)) == ((-1.0, 1.75)))
    assert(got((1, 3)) == ((3.0, 1.375)))
    assert(got((2, 1)) == ((2.0, 1.0)))   // single return → seed only
  }

  test("riskRatios: hand Sharpe/Sortino/Calmar on a short path") {
    // x = 10, 12, 9, 12 → rets +2, −3, +3; peak path 10,12,12,12
    val df = Seq((1, 10.0), (2, 12.0), (3, 9.0), (4, 12.0))
      .toDF("i", "x").withColumn("g", lit(1))
    val r = Indicators.riskRatios(df, "x", Seq("g"), Seq(col("i")))
      .collect().head
    assert(r.getLong(1) == 3L)
    val mean = 2.0 / 3
    assert(r.getDouble(2) == q6(mean))
    // var = (22 − 4/3)/2; downside = √(9/3) = √3; mdd = 9/12 − 1 = −0.25
    val variance = (22.0 - 2.0 / 3 * 2.0) / 2 // (Σr² − (Σr)²/n)/(n−1)
    assert(r.getDouble(3) == q6(mean / math.sqrt(variance)))
    assert(r.getDouble(4) == q6(mean / math.sqrt(3.0)))
    assert(r.getDouble(5) == -0.25)
    assert(r.getDouble(6) == q6(mean / 0.25))
  }

  test("arHalfLife: exact AR(1) path recovers phi and half-life") {
    // xₜ = 0.5·xₜ₋₁ exactly → phi 0.5, half-life 1
    val xs = Iterator.iterate(64.0)(_ * 0.5).take(8).toSeq
    val df = xs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("i", "x")
      .withColumn("g", lit(1))
    val r = Indicators.arHalfLife(df, "x", Seq("g"), Seq(col("i")))
      .collect().head
    assert(r.getLong(1) == 7L && r.getDouble(2) == 0.5)
    assert(r.getDouble(3) == 1.0)
    // a pure random-walk-ish trend: phi ≥ 1 → half-life NULL
    val trend = (0 to 7).map(i => (i, i.toDouble)).toDF("i", "x")
      .withColumn("g", lit(1))
    val t = Indicators.arHalfLife(trend, "x", Seq("g"), Seq(col("i")))
      .collect().head
    assert(t.isNullAt(3))
  }

  test("chiSquare: hand 2×2 association and Cramér's V") {
    val rows = Seq.fill(30)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
      Seq.fill(10)(("b", "x")) ++ Seq.fill(30)(("b", "y"))
    val r = Stats.chiSquare(rows.toDF("u", "v"), "u", "v").collect().head
    assert(r.getLong(0) == 80L && r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getLong(3) == 1L)        // dof
    assert(r.getDouble(4) == 20.0)    // 4 cells × (10²/20)
    assert(r.getDouble(5) == 0.5)     // √(20/80)
  }

  test("cuped: a perfect covariate collapses variance; constant x is a " +
    "no-op") {
    val df = Seq((1L, 2.0, 1.0), (2L, 4.0, 2.0), (3L, 6.0, 3.0))
      .toDF("id", "y", "x")
    val got = Stats.cuped(df, "y", "x").orderBy("id").collect()
    assert(got.forall(_.getDouble(3) == 2.0))  // theta
    assert(got.forall(_.getDouble(4) == 4.0))  // y_adj = ȳ everywhere
    val const = Seq((1L, 2.0, 5.0), (2L, 9.0, 5.0)).toDF("id", "y", "x")
    val c = Stats.cuped(const, "y", "x").orderBy("id").collect()
    assert(c.forall(_.isNullAt(3)))
    assert(c.map(_.getDouble(4)).toSeq == Seq(2.0, 9.0)) // passthrough
  }

  test("hillEstimator: hand dyadic tail; short groups NULL") {
    // top-2 of (8,4,2,1) over x₃=2 → α = 2/(ln8 + ln4 − 2·ln2) = 2/(3ln2)
    val df = Seq(("g", 8.0), ("g", 4.0), ("g", 2.0), ("g", 1.0),
      ("s", 5.0), ("s", 3.0)).toDF("k", "x")
    val got = Stats.hillEstimator(df, "x", Seq("k"), k = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    val exp = 2.0 / (math.log(8.0) + math.log(4.0) - 2.0 * math.log(2.0))
    assert(got("g").getLong(1) == 3L &&
      math.abs(got("g").getDouble(2) - exp) < 1e-6)
    assert(got("s").isNullAt(2)) // only 2 rows < k+1
  }

  test("trimmedMean: drops the exact-percentile tails, unlike winsorize") {
    val df = (1 to 20).map(i => ("g", i.toDouble)).toDF("k", "x")
    val r = Stats.trimmedMean(df, "x", Seq("k"), 0.05, 0.95)
      .collect().head
    // p05 = 1.95, p95 = 19.05 → keep 2..19 → mean 10.5
    assert(r.getLong(1) == 18L && r.getDouble(2) == 10.5)
  }

  test("twoProportionZ: hand pooled z on a small A/B split") {
    val df = (Seq.fill(2)(("A", 1)) ++ Seq.fill(2)(("A", 0)) ++
      Seq.fill(1)(("B", 1)) ++ Seq.fill(3)(("B", 0))).toDF("g", "c")
    val r = Stats.twoProportionZ(df, "g", "c", "A", "B").collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 4L &&
      r.getLong(2) == 2L && r.getLong(3) == 1L)
    assert(r.getDouble(4) == 0.5 && r.getDouble(5) == 0.25)
    val se = math.sqrt(0.375 * 0.625 * (0.25 + 0.25))
    assert(r.getDouble(6) == q6(0.25 / se))
  }

  test("lorenzCurve: hand deciles over a skewed four-row mass") {
    val df = Seq(("g", 1.0), ("g", 1.0), ("g", 2.0), ("g", 6.0))
      .toDF("k", "x")
    val got = Stats.lorenzCurve(df, "x", Seq("k"))
      .collect().map(r => r.getInt(1) -> r.getDouble(3)).toMap
    assert(got.size == 10)
    assert((1 to 5).forall(got(_) == 0.2))   // bottom half holds 2/10
    assert(got(6) == 0.4 && got(7) == 0.4)   // +the 2.0 row → 4/10
    assert((8 to 10).forall(got(_) == 1.0))
  }

  test("hhi: hand shares and the monopoly/competition poles") {
    val df = Seq(("g", "a", 5.0), ("g", "b", 3.0), ("g", "c", 2.0),
      ("m", "only", 7.0)).toDF("k", "e", "x")
    val got = Stats.hhi(df, "e", "x", Seq("k"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("g").getLong(1) == 3L && got("g").getDouble(2) == 0.38)
    assert(got("g").getDouble(3) == q6(1.0 / 0.38))
    assert(got("m").getDouble(2) == 1.0 && got("m").getDouble(3) == 1.0)
  }

  test("weightedMedian: cumulative-weight pick, tie-safe, zero weights drop") {
    val df = Seq(("a", 1.0, 1.0), ("a", 2.0, 1.0), ("a", 3.0, 10.0),
      ("b", 5.0, 2.0), ("b", 7.0, 2.0),      // even split → lower median 5
      ("b", 9.0, 0.0)).toDF("g", "v", "w")   // zero weight ignored
    val got = Stats.weightedMedian(df, "v", "w", Seq("g"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("a").getDouble(1) == 3.0) // 10 of 12 mass sits at 3
    assert(got("a").getDouble(2) == 12.0)
    assert(got("b").getDouble(1) == 5.0 && got("b").getDouble(2) == 4.0)
  }

  test("ewmVolatility: hand RiskMetrics recursion at λ=0.5") {
    val df = Seq((1, 10.0), (2, 12.0), (3, 11.0)).toDF("i", "x")
      .withColumn("g", lit(1)).withColumn("t",
        org.apache.spark.sql.functions.expr("timestamp_micros(i)"))
    val got = Indicators.ewmVolatility(df, "x", Seq("g"), "t",
        lambda = 0.5, carry = Seq("i"))
      .orderBy("i").collect()
    // rets 2, −1 → r² 4, 1 → v = (4, 2.5) → vol = (2, √2.5)
    assert(got.map(_.getDouble(3)).toSeq == Seq(4.0, 2.5))
    assert(got.map(_.getDouble(4)).toSeq ==
      Seq(2.0, q6(math.sqrt(2.5))))
  }

  test("marketBeta: a 2x-levered series scores beta 4/3 against the mean") {
    import org.apache.spark.sql.functions.expr
    def t(h: Int) = f"2025-01-01 $h%02d:30:00"
    val rows = Seq(0.0, 1.0, 3.0, 6.0).zipWithIndex.flatMap {
      case (v, h) => Seq((1L, t(h), 2 * v), (2L, t(h), v))
    }
    val df = rows.toDF("user_id", "ts_s", "x")
      .withColumn("t", expr("CAST(ts_s AS TIMESTAMP)"))
    val got = Indicators.marketBeta(df, "x", "user_id", "t", "hour")
      .collect().map(r => r.getLong(0) -> r).toMap
    // market = 1.5·base → beta(2x) = 4/3, beta(1x) = 2/3; both corr 1
    assert(got(1L).getLong(1) == 3L)
    assert(got(1L).getDouble(2) == q6(4.0 / 3.0) &&
      got(1L).getDouble(3) == 0.0 && got(1L).getDouble(4) == 1.0)
    assert(got(2L).getDouble(2) == q6(2.0 / 3.0))
  }

  test("bhFdr: step-up threshold, ties-safe, NULLs never significant") {
    val df = Seq((1, Some(0.001)), (2, Some(0.01)), (3, Some(0.03)),
      (4, Some(0.6)), (5, None)).toDF("k", "p")
    val got = Stats.bhFdr(df, "p", alpha = 0.25)
      .collect().map(r => r.getInt(0) -> r).toMap
    // i·α/m (m=4): .0625 .125 .1875 .25 → largest passing p = 0.03
    assert(got.values.forall(r => r.isNullAt(1) ||
      r.getDouble(3) == 0.03))
    assert(got(1).getBoolean(2) && got(2).getBoolean(2) &&
      got(3).getBoolean(2))
    assert(!got(4).getBoolean(2) && !got(5).getBoolean(2))
  }

  test("kmv: exact below k, estimate within tolerance above, Jaccard " +
    "exact on sketchable sets") {
    import org.apache.spark.sql.functions.{col, lit}
    // 40 distinct < k=64 → sketch IS the set → exact count
    val small = (1 to 40).map(i => ("g", i.toLong)).toDF("g", "u")
    val se = Stats.kmvEstimate(small, "u", Seq("g"), k = 64).collect().head
    assert(se.getLong(1) == 40L && se.getDouble(2) == 40.0)
    // 5000 distinct, k=64 → estimate within ~35% (KMV σ ≈ 1/√(k−2) ≈ 13%)
    val big = (1 to 5000).map(i => ("g", i.toLong)).toDF("g", "u")
    val be = Stats.kmvEstimate(big, "u", Seq("g"), k = 64).collect().head
    assert(math.abs(be.getDouble(2) - 5000.0) / 5000.0 < 0.35,
      s"estimate ${be.getDouble(2)}")
    // Jaccard: A = 1..30, B = 16..45 → |∩| = 15, |∪| = 45, J = 1/3 exact
    def sk(lo: Int, hi: Int) =
      Stats.kmvSketch((lo to hi).map(i => ("g", i.toLong)).toDF("g", "u"),
        "u", Nil, k = 64).select(col("kmv"))
    val j = sk(1, 30).crossJoin(sk(16, 45).withColumnRenamed("kmv", "kmv2"))
      .select(Stats.kmvJaccardExpr(col("kmv"), col("kmv2"), 64).as("j"))
      .select("j.jaccard", "j.inter_est", "j.union_est").collect().head
    assert(j.getDouble(0) == q6(15.0 / 45.0))
    assert(j.getDouble(2) == 45.0 && j.getDouble(1) == q6(15.0))
  }

  test("kpss: hand statistic at lags=1; trend scores above noise") {
    // x = 1,3,2,4: e = (−1.5,.5,−.5,1.5), S = (−1.5,−1,−1.5,0)
    // η = 5.5/16, γ0 = 1.25, γ1 = −0.4375, lrv = 0.8125
    val df = Seq((1, 1.0), (2, 3.0), (3, 2.0), (4, 4.0)).toDF("i", "x")
      .withColumn("g", lit(1))
    val r = Indicators.kpss(df, "x", Seq("g"), Seq(col("i")), lags = 1)
      .collect().head
    assert(r.getLong(1) == 4L)
    assert(r.getDouble(2) == q6(0.34375 / 0.8125))
    // a strong trend accumulates partial sums → larger KPSS than a zigzag
    val n = 16
    val trend = (1 to n).map(i => (i, i.toDouble)).toDF("i", "x")
      .withColumn("g", lit(1))
    val zig = (1 to n).map(i => (i, (i % 2).toDouble)).toDF("i", "x")
      .withColumn("g", lit(1))
    val kt = Indicators.kpss(trend, "x", Seq("g"), Seq(col("i")))
      .collect().head.getDouble(2)
    val kz = Indicators.kpss(zig, "x", Seq("g"), Seq(col("i")))
      .collect().head.getDouble(2)
    assert(kt > kz, s"trend $kt should exceed zigzag $kz")
  }

  test("permutationEntropy: monotone series → 0; all-six-patterns > 0") {
    val mono = (0 to 9).map(i => (i, i.toDouble)).toDF("i", "x")
      .withColumn("g", lit(1))
    val m = Indicators.permutationEntropy(mono, "x", Seq("g"),
      Seq(col("i"))).collect().head
    assert(m.getLong(1) == 8L && m.getLong(2) == 1L &&
      m.getDouble(3) == 0.0)
    // uniform over two patterns → H = ln2/ln6
    val zig = Seq(0.0, 1.0, 0.0, 1.0, 0.0, 1.0).zipWithIndex
      .map { case (v, i) => (i, v) }.toDF("i", "x").withColumn("g", lit(1))
    val z = Indicators.permutationEntropy(zig, "x", Seq("g"),
      Seq(col("i"))).collect().head
    assert(z.getLong(2) == 2L)
    assert(z.getDouble(3) == q6(math.log(2.0) / math.log(6.0)))
  }

  test("periodogram: pure period-4 cosine concentrates power at p = 4") {
    val xs = (0 until 8).map(t => (t, math.cos(2.0 * math.Pi * t / 4)))
    val df = xs.toDF("i", "x").withColumn("g", lit(1))
    val got = Indicators.periodogram(df, "x", Seq("g"), Seq(col("i")),
        periods = Seq(2, 4))
      .collect().map(r => r.getInt(1) -> r).toMap
    assert(got(4).getLong(2) == 8L && got(4).getDouble(3) == 2.0)
    assert(got(2).getDouble(3) == 0.0) // orthogonal frequency → no power
  }

  test("series scans: hand recursions match exactly (garch/holt/kalman)") {
    // the native O(n) scans must reproduce the recurrence ops bit-for-bit
    // (the unchanged DuckDB oracles replay the old fold arithmetic)
    val xs = Seq(10.0, 10.5, 9.8, 11.2, 10.9, 12.1, 11.0)
    val df = xs.zipWithIndex.map { case (x, i) => ("k", i.toLong, x) }
      .toDF("g", "t", "x")
    // GARCH(1,1) ω=.05 α=.1 β=.85 over diffs
    val (om, al, be) = (0.05, 0.1, 0.85)
    val rs = xs.sliding(2).map(p => p(1) - p(0)).toVector
    var s2 = om / (1.0 - al - be)
    val expS2 = Vector(s2) ++ rs.dropRight(1).map { r =>
      s2 = om + al * r * r + be * s2; s2 }
    def q6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6 // = Indicators.quant6
    val gotS2 = graft.analytics.Indicators.garch(df, "x", Seq("g"), "t",
        om, al, be)
      .orderBy("t").select("sigma2").collect().map(_.getDouble(0))
    assert(gotS2.sameElements(expS2.map(q6)),
      s"garch: ${gotS2.toSeq} vs $expS2")
    // Holt α=.5 β=.25
    var (l, b) = (xs.head, xs(1) - xs.head)
    val expHolt = Vector((l, b, xs.head)) ++ (1 until xs.length).map { i =>
      val f = l + b
      val ln = 0.5 * xs(i) + 0.5 * (l + b)
      val bn = 0.25 * (ln - l) + 0.75 * b
      l = ln; b = bn; (ln, bn, f)
    }
    val gotHolt = graft.analytics.Indicators.holtLinear(df, "x", Seq("g"),
        "t", alpha = 0.5, beta = 0.25)
      .orderBy("t").select("level", "trend", "fitted").collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    assert(gotHolt.sameElements(expHolt.map(t => (q6(t._1), q6(t._2), q6(t._3)))),
      s"holt: ${gotHolt.toSeq} vs $expHolt")
    // Kalman q=.01 r=1
    var lv = xs.head; var p = 1.0
    val expKf = Vector(lv) ++ (1 until xs.length).map { i =>
      val pp = p + 0.01; val k = pp / (pp + 1.0)
      lv = lv + k * (xs(i) - lv); p = (1.0 - k) * pp; lv
    }
    val gotKf = graft.analytics.Indicators.kalmanLevel(df, "x", Seq("g"), "t")
      .orderBy("t").select("kf_level").collect().map(_.getDouble(0))
    assert(gotKf.sameElements(expKf.map(q6)), s"kalman: ${gotKf.toSeq}")
  }

  test("series scans are O(n): a 1M-row single-key series completes in " +
       "seconds") {
    // the SQL-fold formulation did Θ(n²) accumulator copies — a 1M-bar
    // key would run for hours; the native scans must stay linear
    val n = 1000000
    val big = spark.range(n).select(lit("k").as("g"), col("id").as("t"),
        (sin(col("id").cast("double") / 37.0) * 10 +
          col("id").cast("double") / 1000.0).as("x"))
    val t0 = System.nanoTime()
    val cnts = Seq(
      graft.analytics.Indicators.garch(big, "x", Seq("g"), "t",
        0.05, 0.1, 0.85).count(),
      graft.analytics.Indicators.holtLinear(big, "x", Seq("g"), "t",
        0.5, 0.25).count(),
      graft.analytics.Indicators.kalmanLevel(big, "x", Seq("g"), "t").count(),
      graft.analytics.Indicators.emaSeries(big, "x", Seq("g"), "t",
        alpha = 0.25).count(),
      graft.analytics.Indicators.cusumSeries(big, "x", Seq("g"), "t").count())
    val secs = (System.nanoTime() - t0) / 1e9
    assert(cnts == Seq(n - 1L, n.toLong, n.toLong, n.toLong, n.toLong), cnts)
    assert(secs < 120.0, f"series scans took $secs%.1f s on 1M rows")
  }

  test("conformalNaive: hand-checked quantile, intervals, and coverage") {
    // 11 bars: alternating 0/1 gives residual 1 on every calibration row
    // (10 forecastable bars, n_cal = ⌈0.8·10⌉ = 8, k = min(⌈9·9/10⌉, 8)
    // = 8 → q̂ = 1); then one covered and one uncovered holdout point
    val ys = Seq(0.0, 1.0, 0.0, 1.0, 0.0, 1.0, 0.0, 1.0, 0.0, 0.5, 3.0)
    val df = ys.zipWithIndex.map { case (y, i) => ("k", i + 1, y) }
      .toDF("g", "t", "y")
    val got = Indicators.conformalNaive(df, "y", Seq("g"), "t").orderBy("t")
      .collect()
    assert(got.length == 2, got.mkString(";"))
    val (r10, r11) = (got(0), got(1))
    assert(r10.getLong(7) == 8L)                            // n_cal
    assert(r10.getDouble(8) == 1.0)                         // q̂
    assert(r10.getDouble(3) == 0.0 && r10.getInt(6) == 1)   // 0.5 ∈ [−1, 1]
    assert(r11.getDouble(3) == 0.5 && r11.getInt(6) == 0)   // 3 ∉ [−0.5, 1.5]
    assert(r10.getDouble(4) == -1.0 && r10.getDouble(5) == 1.0)
    assert(r10.getDouble(9) == 0.5)                         // coverage 1/2
  }

  test("intervalScore: hand Winkler scores — inside pays width, misses " +
       "pay width plus 20x the overshoot") {
    val df = Seq(("k", 5.0, 4.0, 6.0), ("k", 3.0, 4.0, 6.0),
      ("k", 7.0, 4.0, 6.0)).toDF("g", "y", "lo", "hi")
    val r = Indicators.intervalScore(df, "y", "lo", "hi", Seq("g")).head()
    assert(r.getLong(1) == 3L)
    assert(r.getDouble(2) == 2.0)                       // mean width
    assert(r.getDouble(3) == 0.333333)                  // coverage
    assert(r.getDouble(4) == 15.333333)                 // (2 + 22 + 22)/3
  }

  test("rocPr: perfect separation → AUC=AP=1; hand case matches the " +
    "U-statistic and step-interpolated AP; one-class → NULL") {
    val perfect = Seq((1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1))
      .toDF("s", "y").withColumn("g", lit("m"))
    val p = Stats.rocPr(perfect, "s", "y", Seq("g")).collect()(0)
    assert(p.getLong(1) == 2L && p.getLong(2) == 2L)
    assert(p.getDouble(3) == 1.0 && p.getDouble(4) == 1.0)
    // pos {3, 1}, neg {2, 1}: U = 2 wins + 1 tie/2 = 2.5 → AUC .625;
    // AP = ½·1 (thr 3: P=1/1) + ½·½ (thr 1: P=2/4) = 0.75
    val mixed = Seq((3.0, 1), (1.0, 1), (2.0, 0), (1.0, 0))
      .toDF("s", "y").withColumn("g", lit("m"))
    val m = Stats.rocPr(mixed, "s", "y", Seq("g")).collect()(0)
    assert(m.getDouble(3) == 0.625 && m.getDouble(4) == 0.75)
    // all scores tied: AUC ½, AP = prevalence
    val tied = Seq((1.0, 1), (1.0, 0), (1.0, 0), (1.0, 0))
      .toDF("s", "y").withColumn("g", lit("m"))
    val t = Stats.rocPr(tied, "s", "y", Seq("g")).collect()(0)
    assert(t.getDouble(3) == 0.5 && t.getDouble(4) == 0.25)
    val oneClass = Seq((1.0, 1), (2.0, 1)).toDF("s", "y")
      .withColumn("g", lit("m"))
    val o = Stats.rocPr(oneClass, "s", "y", Seq("g")).collect()(0)
    assert(o.isNullAt(3))
  }

  test("cupedReadout: Y exactly linear in X → θ recovered, adjusted means " +
    "equalize, adjusted variance 0, reduction 1") {
    val units = Seq(("A", 1.0, 2.0), ("A", 2.0, 4.0),
      ("B", 3.0, 6.0), ("B", 4.0, 8.0)).toDF("grp", "pre", "post")
    val rows = Stats.cupedReadout(units, "grp", "pre", "post")
      .orderBy("grp").collect()
    for (r <- rows) {
      assert(r.getDouble(7) == 2.0, s"theta ${r.getDouble(7)}")
      assert(r.getDouble(4) == 5.0, s"mean_adj ${r.getDouble(4)}")
      assert(r.getDouble(6) == 0.0)                     // var_adj
      assert(r.getDouble(8) == 1.0)                     // var_reduction
    }
    // arm means differ before adjustment (pure pre-period drift)
    assert(rows(0).getDouble(3) == 3.0 && rows(1).getDouble(3) == 7.0)
    // constant covariate → θ undefined → NULL adjusted columns
    val flat = Seq(("A", 1.0, 2.0), ("B", 1.0, 3.0))
      .toDF("grp", "pre", "post")
    assert(Stats.cupedReadout(flat, "grp", "pre", "post").collect()
      .forall(_.isNullAt(7)))
  }

  test("isotonicCalibration: PAV pools the violating bins (minimax = " +
    "pooled rate), keeps monotone bins, output is monotone") {
    // scores 0/1/2/3 land in bins 0..3 (w = 0.75); rates 0, 1, ½, 1 →
    // bins 1-2 pool to ¾
    val df = Seq((0.0, 0), (0.0, 0), (1.0, 1), (1.0, 1),
      (2.0, 1), (2.0, 0), (3.0, 1), (3.0, 1)).toDF("s", "y")
    val got = Stats.isotonicCalibration(df, "s", "y", bins = 4)
      .orderBy("bin").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(got.map(_.getDouble(4)).toSeq == Seq(0.0, 0.75, 0.75, 1.0))
    assert(got.map(_.getDouble(3)).toSeq == Seq(0.0, 1.0, 0.5, 1.0))
    val iso = got.map(_.getDouble(4))
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b })
  }

  test("bootstrapCi: constant column collapses the interval to the mean; " +
       "bounds bracket and are ordered on a spread sample") {
    val const = (1 to 50).map(i => (i.toLong, 42.0, "g")).toDF("id", "x", "g")
    val c = Stats.bootstrapCi(const, "id", "x", Seq("g")).collect()(0)
    assert((c.getDouble(2), c.getDouble(3), c.getDouble(4)) ==
      ((42.0, 42.0, 42.0)), c)
    assert(c.getLong(1) == 50L && c.getLong(5) == 64L, c)
    val spread = (1 to 200).map(i => (i.toLong, i.toDouble, "g"))
      .toDF("id", "x", "g")
    val s = Stats.bootstrapCi(spread, "id", "x", Seq("g")).collect()(0)
    val (mean, lo, hi) = (s.getDouble(2), s.getDouble(3), s.getDouble(4))
    assert(lo < mean && mean < hi && mean == 100.5, s)
    // a 97.5% bound of a 200-point uniform mean stays within a few sd
    assert(lo > 80 && hi < 121, s)
  }

  test("bootstrapCi is partition-invariant (hash-deterministic weights)") {
    val df = (1 to 100).map(i => (i.toLong, (i % 7).toDouble, "g"))
      .toDF("id", "x", "g")
    val a = Stats.bootstrapCi(df, "id", "x", Seq("g")).collect().toSeq
    val b = Stats.bootstrapCi(df.repartition(13), "id", "x", Seq("g"))
      .collect().toSeq
    assert(a == b)
  }

  test("trendTest: strict monotone series give S = ±n(n−1)/2 and the " +
       "exact slope; a constant series has zero variance → NULL z") {
    val up = (1 to 10).map(i => ("u", i.toDouble, 3.0 * i + 1))
    val dn = (1 to 10).map(i => ("d", i.toDouble, -2.0 * i))
    val ct = (1 to 10).map(i => ("c", i.toDouble, 5.0))
    val df = (up ++ dn ++ ct).toDF("g", "t", "y")
    val got = Stats.trendTest(df, Seq("g"), "t", "y").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("u").getLong(2) == 45L && got("u").getDouble(5) == 3.0)
    assert(got("u").getDouble(4) > 0)
    assert(got("d").getLong(2) == -45L && got("d").getDouble(5) == -2.0)
    assert(got("d").getDouble(4) < 0)
    // all ties: S = 0, tie term equals the main term → var 0 → z NULL
    assert(got("c").getLong(2) == 0L && got("c").getDouble(3) == 0.0)
    assert(got("c").isNullAt(4))
    assert(got("c").getDouble(5) == 0.0)
  }

  test("liftGains: hand deciles — top decile captures its positives at " +
       "the right multiple of the base rate") {
    // 20 distinct scores descending; positives at the 4 highest scores
    val df = (1 to 20).map(i => (i.toDouble, if (i >= 17) 1 else 0, "g"))
      .toDF("s", "y", "g")
    val got = Stats.liftGains(df, "s", "y", Seq("g"))
      .orderBy("decile").collect()
    // decile 1 = scores {20, 19}: 2 pos of 4 → gain .5, lift (2/2)/(4/20)=5
    val d1 = got(0)
    assert(d1.getLong(1) == 1L && d1.getLong(2) == 2L &&
      d1.getLong(3) == 2L && d1.getLong(4) == 2L, d1)
    assert(d1.getDouble(5) == 0.5 && d1.getDouble(6) == 5.0, d1)
    // decile 2 = {18, 17}: cumulative gain 1.0; lift 5 again
    val d2 = got(1)
    assert(d2.getDouble(5) == 1.0 && d2.getDouble(6) == 5.0, d2)
    // deciles 3..10: no positives → lift 0, gain stays 1.0
    assert(got.drop(2).forall(r => r.getDouble(6) == 0.0 &&
      r.getDouble(5) == 1.0), got.toSeq)
    assert(got.map(_.getLong(1)).toSeq == (1L to 10L), got.toSeq)
  }

  test("mutualInfo: identical columns give MI = H = ln 2 and NMI = 1; " +
       "independent columns give MI = 0") {
    val dep = Seq(("a", "a"), ("a", "a"), ("b", "b"), ("b", "b"))
      .toDF("x", "y")
    val d = Stats.mutualInfo(dep, "x", "y").collect()(0)
    val ln2 = BigDecimal(math.log(2)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(d.getLong(0) == 4L && d.getDouble(1) == ln2 &&
      d.getDouble(2) == ln2 && d.getDouble(3) == ln2 &&
      d.getDouble(4) == 1.0, d)
    val ind = Seq(("a", "a"), ("a", "b"), ("b", "a"), ("b", "b"))
      .toDF("x", "y")
    val i = Stats.mutualInfo(ind, "x", "y").collect()(0)
    assert(i.getDouble(1) == 0.0 && i.getDouble(4) == 0.0, i)
  }

  test("ddSketch: every quantile estimate is within the relative-error " +
       "bound of the exact quantile; partition-invariant; merge-shaped") {
    // log-spread positives across 4 decades — the regime rank sketches
    // hate and relative-error sketches are built for
    val vals = (1 to 5000).map(i => (math.exp(i % 97 / 10.0) * (1 + i % 7))
      .max(0.001))
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v, "g") }
      .toDF("id", "x", "g")
    val got = Stats.ddSketch(df, "x", Seq("g"), alphaPm = 10)
      .collect()(0)
    val sorted = vals.sorted
    def exact(q: Double) = sorted(math.ceil(q * vals.length).toInt - 1)
    for ((q, idx) <- Seq((0.5, 3), (0.95, 4), (0.99, 5))) {
      val est = got.getDouble(idx)
      val ex = exact(q)
      assert(math.abs(est - ex) / ex <= 0.0101,
        s"q=$q est=$est exact=$ex rel=${math.abs(est - ex) / ex}")
    }
    assert(got.getLong(1) == 5000L)
    // the sketch is bucket counts — identical under any partitioning
    val again = Stats.ddSketch(df.repartition(13), "x", Seq("g"),
      alphaPm = 10).collect()(0)
    assert(got.toSeq == again.toSeq)
  }

  test("smdBalance: identical groups score 0, a 10-sd shift scores ±10, " +
       "zero pooled variance yields NULL") {
    val df = Seq(
      (1, 1.0, 1.0, 5.0), (1, 2.0, 2.0, 5.0), (1, 3.0, 3.0, 5.0),
      (0, 1.0, 11.0, 5.0), (0, 2.0, 12.0, 5.0), (0, 3.0, 13.0, 5.0))
      .toDF("g", "same", "shifted", "const")
    val got = Stats.smdBalance(df, col("g") === 1,
        Seq("same", "shifted", "const"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("same").getDouble(5) == 0.0)
    // mean diff −10, pooled var (1+1)/2 = 1 → SMD = −10
    assert(got("shifted").getDouble(5) == -10.0)
    assert(got("const").isNullAt(5))
    assert(got("same").getLong(1) == 3L && got("same").getLong(2) == 3L)
    assert(got("shifted").getDouble(3) == 2.0 &&
      got("shifted").getDouble(4) == 12.0)
  }

  test("holtWinters: matches the scalar recurrence from the data seeds; " +
    "series shorter than 2·period drop") {
    import java.sql.Timestamp
    def ts(h: Int) = Timestamp.valueOf(f"2025-01-01 $h%02d:00:00")
    val xs = Seq(10.0, 20.0, 12.0, 22.0, 14.0, 24.0, 16.0, 26.0)
    val df = xs.zipWithIndex.map { case (x, i) => (1L, ts(i), x) }
      .toDF("k", "t", "x")
    val m = 2; val a = 0.25; val b = 0.125; val g = 0.25
    // scalar reference: identical seeds and step order
    val l0 = xs.take(m).sum / m
    val b0 = (xs.slice(m, 2 * m).sum / m - l0) / m
    var l = l0; var bb = b0
    val ring = Array(xs(0) - l0, xs(1) - l0)
    val exp = (m until xs.size).map { t =>
      val x = xs(t); val sm = ring(t % m)
      val f = l + bb + sm
      val lN = a * (x - sm) + (1 - a) * (l + bb)
      val bN = b * (lN - l) + (1 - b) * bb
      val sN = g * (x - l - bb) + (1 - g) * sm
      ring(t % m) = sN; l = lN; bb = bN
      (lN, bN, sN, f)
    }
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val got = Indicators.holtWinters(df, "x", Seq("k"), "t",
        period = m, alpha = a, beta = b, gamma = g)
      .orderBy("t").collect()
    assert(got.length == xs.size - m)
    got.zip(exp).foreach { case (r, (el, eb, es, ef)) =>
      assert(r.getDouble(3) == q6(el) && r.getDouble(4) == q6(eb) &&
        r.getDouble(5) == q6(es) && r.getDouble(6) == q6(ef))
    }
    // 2m−1 points: no trend seed window → filtered out entirely
    val short = xs.take(2 * m - 1).zipWithIndex
      .map { case (x, i) => (1L, ts(i), x) }.toDF("k", "t", "x")
    assert(Indicators.holtWinters(short, "x", Seq("k"), "t",
      period = m, alpha = a, beta = b, gamma = g).count() == 0L)
  }
}
