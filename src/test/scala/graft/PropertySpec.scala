package graft

import graft.ops.TimeSeriesOps
import graft.text.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5.4): dedup idempotence, ffill
  * completeness, pivot/melt round-trip, imputation mean preservation.
  * (Raw scalacheck generators with fixed seeds — the scalatestplus bridge
  * isn't in the offline dependency set.) */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def forAll[T](gen: Gen[T], n: Int = 10)(body: T => Unit): Unit =
    (0 until n).foreach { i =>
      body(gen.apply(Gen.Parameters.default, Seed(42L + i))
        .getOrElse(fail(s"generator failed at seed ${42 + i}")))
    }

  private val rowsGen = Gen.listOfN(40, for {
    k <- Gen.oneOf("A", "B", "C")
    h <- Gen.choose(0, 12)
    v <- Gen.option(Gen.choose(-100.0, 100.0))
  } yield (k, h, v))

  test("dedup is idempotent") {
    forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "h", "v")
      val once = df.dropDuplicates()
      assert(once.dropDuplicates().count() == once.count())
      assert(Dedup.exactGroups(df.select(concat_ws(",", col("k"), col("h")).as("text"),
          monotonically_increasing_id().as("id")), "id", "text")
        .agg(sum("n_dups")).head().getLong(0) == df.count())
    }
  }

  test("ffill leaves no nulls after the first observation per key") {
    forAll(rowsGen) { rows =>
      val df = rows.map { case (k, h, v) =>
        (k, java.sql.Timestamp.valueOf(f"2025-08-01 $h%02d:00:00"), v)
      }.toDF("k", "hour", "v").dropDuplicates("k", "hour")
      val out = TimeSeriesOps.gapFillFFill(df, Seq("k"), "hour", "interval 1 hour", "v", "vf")
      // for each key: once a non-null has appeared (ordered by hour), vf
      // must be non-null from then on
      val bad = out.withColumn("seen",
          count(col("vf")).over(org.apache.spark.sql.expressions.Window
            .partitionBy("k").orderBy("hour")
            .rowsBetween(Long.MinValue, 0)))
        .filter(col("seen") > 0 && col("vf").isNull)
      assert(bad.count() == 0)
    }
  }

  test("binnedPrefix equals the naive per-group ordered window on random " +
       "per-value frames (both directions, NULL group key, totals)") {
    import org.apache.spark.sql.expressions.Window
    // a NULL group key is a REGULAR partition for Window.partitionBy — the
    // internal joins must be null-safe or the whole group silently vanishes
    val perValueGen = Gen.listOfN(60, for {
      k <- Gen.oneOf("A", "B", null: String)
      v <- Gen.choose(-50, 50)           // ints → duplicate values likely
      m <- Gen.choose(1L, 9L)
    } yield (k, v.toDouble, m))
    forAll(perValueGen, n = 6) { rows =>
      // one row per (group, value): the binnedPrefix input contract
      val pv = rows.toDF("g", "v", "m")
        .groupBy("g", "v").agg(sum(col("m").cast("decimal(28,10)")).as("m"))
      for (desc <- Seq(false, true)) {
        val w = Window.partitionBy("g")
          .orderBy(if (desc) col("v").desc else col("v").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy("g")
        val naive = pv.withColumn("m_cum", sum("m").over(w))
          .withColumn("m_tot", sum("m").over(wAll))
          .select("g", "v", "m_cum", "m_tot")
        val fast = graft.ops.Stats.binnedPrefix(pv, Seq("g"), "v", Seq("m"),
            descending = desc, bins = 7, // small bins → multi-bucket paths
            totals = true)
          .select("g", "v", "m_cum", "m_tot")
        assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty,
          s"binnedPrefix(desc=$desc) diverged from the naive window")
      }
    }
  }

  test("extremeK equals the naive rank window on random frames " +
       "(ties, duplicate-heavy, k beyond group size, both directions)") {
    import org.apache.spark.sql.expressions.Window
    val gen = Gen.listOfN(80, for {
      g <- Gen.oneOf("A", "B")
      v <- Gen.choose(-9, 9) // heavy duplication → boundary ties certain
    } yield (g, v.toDouble))
    forAll(gen, n = 5) { rows =>
      val df = rows.zipWithIndex.map { case ((g, v), i) => (g, i.toLong, v) }
        .toDF("g", "id", "v")
      for (desc <- Seq(false, true); k <- Seq(1, 7, 200)) {
        val ord = (if (desc) col("v").desc else col("v").asc) +: Seq(col("id"))
        val naive = df.withColumn("_rn",
            row_number().over(Window.partitionBy("g").orderBy(ord: _*)))
          .filter(col("_rn") <= k)
          .select("g", "id", "v", "_rn")
        val fast = graft.ops.Stats.extremeK(df, "v", Seq("g"), k,
            descending = desc, tie = Seq(col("id")))
          .select("g", "id", "v", "_rn")
        assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty,
          s"extremeK(desc=$desc, k=$k) diverged from the naive window")
      }
      // all-equal group (bin width 0) collapses to one bucket and ranks
      val const = Seq(("C", 1L, 5.0), ("C", 2L, 5.0), ("C", 3L, 5.0))
        .toDF("g", "id", "v")
      val got = graft.ops.Stats.extremeK(const, "v", Seq("g"), 2,
          descending = false, tie = Seq(col("id")))
        .select("id").collect().map(_.getLong(0)).sorted
      assert(got.sameElements(Array(1L, 2L)))
    }
  }

  test("topShare / weightedMedian keep NULL-key groups (null-safe joins)") {
    // two real groups + one NULL-key group; the NULL group must appear in
    // the output with the same semantics as any other partition
    val df = Seq(("A", 1L, 10.0), ("A", 2L, 30.0), ("A", 3L, 60.0),
        (null: String, 4L, 50.0), (null: String, 5L, 50.0),
        ("B", 6L, 100.0))
      .toDF("g", "id", "v")
    val ts = graft.ops.Stats.topShare(df, "v", Seq("g"), Seq(col("id")), 0.5)
    val nullRows = ts.filter(col("g").isNull).select("id").collect()
      .map(_.getLong(0)).sorted
    assert(nullRows.sameElements(Array(4L)),
      s"NULL-key group lost or wrong in topShare: ${nullRows.mkString(",")}")
    val wm = graft.ops.Stats.weightedMedian(df, "v", "id", Seq("g"))
      .filter(col("g").isNull).select("weighted_median").collect()
    assert(wm.length == 1 && wm.head.getDouble(0) == 50.0,
      "NULL-key group lost in weightedMedian")
    // the non-negativity guard must still fire for a NULL-key group
    val neg = Seq((null: String, 1L, -5.0), (null: String, 2L, 7.0))
      .toDF("g", "id", "v")
    val err = intercept[Exception] {
      graft.ops.Stats.topShare(neg, "v", Seq("g"), Seq(col("id")), 0.5)
        .collect()
    }
    assert(err.getMessage != null)
  }

  test("pivot(last) / melt round-trip preserves cell values") {
    forAll(rowsGen) { rows =>
      val df = rows.collect { case (k, h, Some(v)) => (k, h, v) }
        .toDF("k", "h", "v").dropDuplicates("k", "h")
      val wide = df.groupBy("h").pivot("k", Seq("A", "B", "C")).agg(first("v"))
      val long = wide.melt(Array(col("h")), Array(col("A"), col("B"), col("C")), "k", "v")
        .filter(col("v").isNotNull)
      val a = df.orderBy("k", "h").collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
      val b = long.orderBy("k", "h").collect().map(r => (r.getString(1), r.getInt(0), r.getDouble(2)))
      assert(a.sameElements(b))
    }
  }

  test("group-mean imputation preserves the group mean") {
    forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "h", "v")
      val imp = TimeSeriesOps.groupMeanImpute(df, "v", col("k"), "v_imp")
      val before = df.groupBy("k").agg(avg("v").as("m"))
      val after = imp.groupBy("k").agg(avg("v_imp").as("m2"))
      before.join(after, "k").collect().foreach { r =>
        (Option(r.get(1)), Option(r.get(2))) match {
          case (Some(m), Some(m2)) =>
            // the deterministic mean rounds inputs at DECIMAL(18,6), so the
            // preserved mean is exact only up to 1e-6 per contributing value
            assert(math.abs(m.asInstanceOf[Double] - m2.asInstanceOf[Double]) < 1e-5)
          case (None, None) => // all-null group stays all-null (pandas parity)
          case other => fail(s"mean mismatch: $other")
        }
      }
    }
  }

  // ── CDC round-trip: applying the diff-recovered change log onto the base
  //    reproduces the next snapshot exactly (snapshotDiff ∘ upsert = id)
  test("upsert(base, snapshotDiff changes) reproduces the next snapshot") {
    val snapGen = Gen.listOfN(30, for {
      k <- Gen.choose(0L, 14L)
      v <- Gen.choose(-50, 50)
    } yield (k, v.toDouble))
    forAll(snapGen) { rows =>
      val base = rows.toDF("k", "v").dropDuplicates("k")
      // a deterministic "next": drop k%4==1, bump k%3==0, add shifted keys
      val next = base.filter(col("k") % 4 =!= 1)
        .withColumn("v", when(col("k") % 3 === 0, col("v") + 7.0).otherwise(col("v")))
        .unionByName(base.filter(col("k") % 5 === 2)
          .withColumn("k", col("k") + 100L))
        .dropDuplicates("k")
      val diff = graft.ops.Merge.snapshotDiff(base, next, "k", Seq("v"))
      // rebuild a change batch from the diff + the next snapshot's values
      val changes = diff
        .join(next.withColumnRenamed("v", "_nv"), Seq("k"), "left_outer")
        .select(col("k"), coalesce(col("_nv"), lit(0.0)).as("v"),
          when(col("change_type") === "D", "D").otherwise("U").as("_op"),
          lit(1L).as("_v"))
      val rebuilt = graft.ops.Merge.upsert(base, changes, "k", "_v", "_op")
      val a = rebuilt.orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1)))
      val b = next.orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(a.sameElements(b), "diff+upsert failed to reproduce next snapshot")
    }
  }

  // ── binned interval join ≡ naive per-key theta join, for random intervals
  test("overlapJoin equals the naive theta join on random intervals") {
    val ivGen = Gen.listOfN(25, for {
      k <- Gen.oneOf(1L, 2L)
      s <- Gen.choose(0L, 5000L)
      len <- Gen.choose(0L, 2500L)
    } yield (k, s, s + len))
    forAll(ivGen, n = 6) { ivs =>
      val half = ivs.length / 2
      val a = ivs.take(half).zipWithIndex
        .map { case ((k, s, e), i) => (k, s, e, i.toLong) }
        .toDF("k", "s", "e", "aid")
      val b = ivs.drop(half).zipWithIndex
        .map { case ((k, s, e), i) => (k, s, e, i.toLong) }
        .toDF("k", "bs", "be", "bid")
      val got = graft.ops.Intervals.overlapJoin(a, b, Seq("k"),
          "s", "e", "bs", "be", bucketSeconds = 700L)
        .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
      val naive = a.join(b, Seq("k"))
        .filter(col("s") <= col("be") && col("bs") <= col("e"))
        .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.toSet == naive.toSet, "binned join diverged from theta join")
      assert(got.length == naive.length, "binned join duplicated a pair")
    }
  }

  // ── mix materialization: copy mass matches the epoch targets exactly
  test("mixMaterialize emits floor(eps) or ceil(eps) copies per doc") {
    val docGen = Gen.listOfN(30, Gen.choose(0L, 1000L))
    forAll(docGen) { ids =>
      val df = ids.distinct.map((_, "s")).toDF("id", "src")
      val eps = 1.75
      val out = graft.text.Mix.mixMaterialize(df, "id", "src",
        Map("s" -> eps))
      val counts = out.groupBy("id").count().collect().map(_.getLong(1))
      assert(counts.forall(c => c == 1L || c == 2L))
      // every doc appears at least floor(eps) times; totals bounded by ceil
      assert(counts.length == ids.distinct.length)
    }
  }
}
