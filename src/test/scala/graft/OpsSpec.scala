package graft

import graft.ingest.Ingest
import graft.multimodal.Multimodal
import graft.ops.{Relational, TimeSeriesOps}
import org.apache.spark.sql.functions._

/** Unit cases for pandas-exact semantics the oracle can't isolate
  * (SURVEY.md §5.2) + ingest/multimodal plumbing. */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("gapFillFFill: fills interior gaps, leading nulls stay null") {
    def t(h: Int) = java.sql.Timestamp.valueOf(f"2025-08-01 $h%02d:00:00")
    val df = Seq(("A", t(1), Some(10.0)), ("A", t(4), Some(40.0)),
      ("B", t(2), None: Option[Double]), ("B", t(3), Some(3.0)))
      .toDF("k", "hour", "v")
    val out = TimeSeriesOps.gapFillFFill(df, Seq("k"), "hour", "interval 1 hour", "v", "vf")
      .orderBy("k", "hour").collect()
    val a = out.filter(_.getString(0) == "A").map(r => Option(r.get(2)))
    assert(a.toSeq == Seq(Some(10.0), Some(10.0), Some(10.0), Some(40.0)))
    val b = out.filter(_.getString(0) == "B").map(r => Option(r.get(2)))
    assert(b.toSeq == Seq(None, Some(3.0))) // no observation before first row
  }

  test("stddev ddof=1 (pandas .std) via stddev_samp") {
    val got = Seq(1.0, 2.0, 3.0).toDF("x").agg(stddev_samp(col("x"))).head().getDouble(0)
    assert(math.abs(got - 1.0) < 1e-12)
  }

  test("dropAllNullCols keeps partially-null, drops fully-null") {
    val df = Seq((1, Some(1.0), None: Option[Double]), (2, None, None))
      .toDF("id", "partial", "allnull")
    assert(Relational.dropAllNullCols(df).columns.toSeq == Seq("id", "partial"))
  }

  test("requireColumns raises on missing (analysis_part guard)") {
    val df = Seq(1).toDF("a")
    Relational.requireColumns(df, Seq("a"))
    intercept[IllegalArgumentException] {
      Relational.requireColumns(df, Seq("a", "zz"))
    }
  }

  test("latestPerGroup is a single aggregate equal to the window formulation") {
    val df = Seq(("A", 1, 10.0), ("A", 3, 30.0), ("A", 2, 20.0), ("B", 1, 1.0))
      .toDF("k", "o", "v")
    val got = Relational.latestPerGroup(df, Seq("k"), Seq(col("o")), Seq("o", "v"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    assert(got.toSeq == Seq(("A", 3, 30.0), ("B", 1, 1.0)))
  }

  test("ingest: json landing, latest-per-key, tweet packing cap") {
    val raw = Seq(
      ("AAPL", """{"c": 101.5, "h": 102.0, "l": 99.0, "o": 100.0, "pc": 100.5, "d": 1.0, "dp": 0.99, "t": 1722470400}""",
        java.sql.Timestamp.valueOf("2025-08-01 00:00:00")),
      ("MSFT", "not json at all", java.sql.Timestamp.valueOf("2025-08-01 00:00:00")))
      .toDF("symbol", "body", "timestamp")
    val landed = Ingest.landQuotes(raw).collect()
    assert(landed.find(_.getString(0) == "AAPL").get.getStruct(1).getDouble(0) == 101.5)
    // PERMISSIVE from_json: malformed body → struct of all-null fields
    val msft = landed.find(_.getString(0) == "MSFT").get
    assert(msft.isNullAt(1) || (0 until 8).forall(msft.getStruct(1).isNullAt))

    val hist = Seq(("AAPL", 1, 1.0), ("AAPL", 3, 3.0), ("AAPL", 2, 2.0))
      .toDF("symbol", "ts", "Close")
    val last = Ingest.latestPerKey(hist, "symbol", "ts").collect()
    assert(last.length == 1 && last(0).getDouble(2) == 3.0)

    val flat = (1 to 60).map(i => ("AAPL", f"2025-08-01T00:$i%02d:00", s"tweet $i", s"u$i",
      java.sql.Timestamp.valueOf("2025-08-01 01:00:00")))
      .toDF("symbol", "date", "content", "username", "timestamp")
    val packed = Ingest.packTweets(flat, cap = 50).collect()
    assert(packed(0).getSeq[Any](1).size == 50) // bounded enumeration
    val exploded = Ingest.explodeTweets(Ingest.packTweets(flat, 50))
    assert(exploded.count() == 50 &&
      exploded.columns.toSet == Set("symbol", "ingest_ts", "content", "username", "tweet_ts"))
  }

  test("S3/S4: headered CSV round-trip with timestamp parse") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString + "/out"
    val df = Seq(("AAPL", "2025-08-01 10:00:00", 101.5), ("MSFT", "not a ts", 99.0))
      .toDF("symbol", "ts", "c")
    df.write.option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").csv(dir)
      .withColumn("ts", try_to_timestamp(col("ts")))   // F4: coerce → NULL (ANSI-safe)
      .withColumn("c", col("c").cast("double"))
    val rows = back.orderBy("symbol").collect()
    assert(rows(0).getTimestamp(1) == java.sql.Timestamp.valueOf("2025-08-01 10:00:00"))
    assert(rows(1).isNullAt(1) && rows(1).getDouble(2) == 99.0)
  }

  test("S5: conditional write skips empty frames") {
    val base = java.nio.file.Files.createTempDirectory("graft_cond").toString
    val nonEmpty = Seq(1).toDF("a")
    assert(graft.pipeline.Preprocess.writeIfNonEmpty(nonEmpty, s"$base/a"))
    assert(!graft.pipeline.Preprocess.writeIfNonEmpty(nonEmpty.filter(col("a") > 99), s"$base/b"))
    assert(new java.io.File(s"$base/a").exists() && !new java.io.File(s"$base/b").exists())
  }

  test("multimodal: pack → decode stub → frame sample plumbing") {
    val docs = Seq((1L, "hello world this is binary content"),
      (2L, "another asset payload with more bytes in it")).toDF("doc_id", "text")
    val assets = Multimodal.packAssets(docs, "doc_id", "text")
    assert(assets.schema("content").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val feats = Multimodal.decodeBatch(assets).collect()
    assert(feats.forall(_.getSeq[Float](2).size == 8))
    // deterministic: same input → same features
    val again = Multimodal.decodeBatch(assets).collect()
    assert(feats.map(_.getSeq[Float](2)).toSeq == again.map(_.getSeq[Float](2)).toSeq)
    val frames = Multimodal.frameSample(assets, chunk = 8, stride = 2)
    assert(frames.count() > 0)
    assert(frames.filter(col("frame_idx") % 2 =!= 0).count() == 0)
  }

  test("multimodal: ImageIO decode reads true PNG/JPEG dimensions; " +
       "garbage bytes degrade to NULL metadata") {
    // a genuine PNG round-trips through the header-only probe
    val png = Multimodal.pngBytes(23, 11)
    assert(Multimodal.imageHeader(png).contains(("png", 23, 11, 3)))
    // a genuine JPEG too (different reader, different format name)
    val img = new java.awt.image.BufferedImage(
      9, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    val jpg = Multimodal.imageHeader(out.toByteArray)
    assert(jpg.map(t => (t._1, t._2, t._3)).contains(("jpeg", 9, 4)))
    // bytes no reader claims → None, never a throw
    assert(Multimodal.imageHeader("not an image at all".getBytes).isEmpty)
    assert(Multimodal.imageHeader(Array.empty[Byte]).isEmpty)
    // distributed end-to-end: mixed decodable/undecodable assets
    val assets = Seq(
      (1L, Multimodal.pngBytes(5, 7)),
      (2L, "plain text bytes".getBytes)).toDF("asset_id", "content")
    val got = Multimodal.decodeImageMeta(assets).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getString(1) == "png" && got(1L).getInt(2) == 5 &&
      got(1L).getInt(3) == 7 && got(1L).getInt(4) == 3)
    assert(got(2L).isNullAt(1) && got(2L).isNullAt(2))
    assert(got(2L).getLong(5) == "plain text bytes".getBytes.length.toLong)
  }

  test("multimodal: imageFeatures recovers exact closed-form pixel stats " +
       "from decoded rasters; poison and oversized assets yield NULLs") {
    // closed-form truth for a gradient fixture, computed in-test
    def truth(g: Int, m: Int): (Int, Int, Array[Double]) = {
      val (w, h) = Multimodal.gradDims(g)
      var s = Array(0L, 0L, 0L); var ss = Array(0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, gc, b) = Multimodal.gradChannels(g, m, x, y)
        for ((v, i) <- Seq(r, gc, b).zipWithIndex) {
          s(i) += v; ss(i) += v.toLong * v
        }
      }
      val n = (w * h).toLong
      (w, h, Array(
        s(0).toDouble / n, s(1).toDouble / n, s(2).toDouble / n,
        ss(0).toDouble / n - (s(0).toDouble / n) * (s(0).toDouble / n),
        ss(1).toDouble / n - (s(1).toDouble / n) * (s(1).toDouble / n),
        ss(2).toDouble / n - (s(2).toDouble / n) * (s(2).toDouble / n)))
    }
    val assets = Seq(
      (0L, Multimodal.gradPngBytes(3, 1)),
      (1L, Multimodal.gradPngBytes(7, 2)),
      (2L, "definitely not an image".getBytes),
      (3L, Multimodal.pngBytes(40, 40))) // 1600 px > the tiny cap below
      .toDF("asset_id", "content")
    val got = Multimodal.imageFeatures(assets, maxPixels = 100)
      .collect().map(r => r.getLong(0) -> r).toMap
    for ((id, (g, m)) <- Map(0L -> (3, 1), 1L -> (7, 2))) {
      val (w, h, feats) = truth(g, m)
      val r = got(id)
      assert(r.getInt(1) == w && r.getInt(2) == h &&
        r.getLong(3) == w.toLong * h)
      // decoded raster statistics are BIT-identical to the closed form
      assert(r.getSeq[Double](10).toArray.sameElements(feats), s"asset $id")
      assert(r.getDouble(4) == feats(0) && r.getDouble(7) == feats(3))
    }
    assert(got(2L).isNullAt(1) && got(2L).isNullAt(4) && got(2L).isNullAt(10))
    assert(got(3L).isNullAt(1), "over-cap image must not decode")
  }

  test("multimodal: audioFeatures decodes real WAV PCM to exact sample " +
       "stats; poison / over-cap / non-PCM16 assets yield NULLs") {
    // closed-form truth for fixture k, computed in-test
    def truth(k: Int): (Long, Long, Long, Long, Int, Int) = {
      val (_, n) = Multimodal.sawDims(k)
      var sm, ssq, zc = 0L
      var mn = Int.MaxValue; var mx = Int.MinValue
      for (i <- 0 until n) {
        val s = Multimodal.sawSample(k, i)
        sm += s; ssq += s.toLong * s
        if (s < mn) mn = s
        if (s > mx) mx = s
        if (i > 0 && (s >= 0) != (Multimodal.sawSample(k, i - 1) >= 0)) zc += 1
      }
      (n.toLong, sm, ssq, zc, mn, mx)
    }
    // k=5 → 200 samples, k=6 → 240 (inside the 250 cap); k=3 → 320 (over)
    val assets = Seq(
      (0L, Multimodal.sawWavBytes(5)),
      (1L, Multimodal.sawWavBytes(6)),
      (2L, "not audio content at all".getBytes),
      (3L, Multimodal.sawWavBytes(3)))
      .toDF("asset_id", "content")
    val got = Multimodal.audioFeatures(assets, maxSamples = 250)
      .collect().map(r => r.getLong(0) -> r).toMap
    for ((id, k) <- Map(0L -> 5, 1L -> 6)) {
      val (n, sm, ssq, zc, mn, mx) = truth(k)
      val r = got(id)
      assert(r.getInt(1) == 8000 && r.getInt(2) == 1 && r.getLong(3) == n)
      assert(r.getDouble(4) == sm.toDouble / n, s"mean k=$k")
      assert(r.getDouble(5) == math.sqrt(ssq.toDouble / n), s"rms k=$k")
      assert(r.getLong(6) == zc && r.getInt(7) == mn && r.getInt(8) == mx)
    }
    assert(got(2L).isNullAt(1) && got(2L).isNullAt(4))
    assert(got(3L).isNullAt(1), "over-cap audio must not decode")
    // an 8-bit WAV is a real container the codec opens but not PCM16 —
    // the stats contract rejects it instead of mis-scaling
    val fmt8 = new javax.sound.sampled.AudioFormat(8000f, 8, 1, true, false)
    val pcm8 = Array.tabulate[Byte](64)(i => (i * 3 - 90).toByte)
    val out8 = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm8), fmt8, 64L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out8)
    assert(Multimodal.audioStats(out8.toByteArray, 1000).isEmpty)
  }

  test("multimodal: MP4 box parser reads brand/timescale/duration/tracks; " +
       "64-bit and to-end box sizes parse; malformed boxes yield None") {
    // authored fixture round-trips through the parser
    assert(Multimodal.mp4Meta(Multimodal.mp4Bytes("isom", 600, 3601L, 2))
      .contains(("isom", 600L, 3601L * 1000 / 600, 2)))
    // v0 duration of 0 tracks, different brand
    assert(Multimodal.mp4Meta(Multimodal.mp4Bytes("mp42", 1000, 250L, 0))
      .contains(("mp42", 1000L, 250L, 0)))
    // largesize (size==1 + 64-bit length) on the moov box still parses
    val std = Multimodal.mp4Bytes("isom", 600, 100L, 1)
    val moovAt = 20 // after the 20-byte ftyp
    val moovLen = ((std(moovAt) & 0xff) << 24) | ((std(moovAt + 1) & 0xff) << 16) |
      ((std(moovAt + 2) & 0xff) << 8) | (std(moovAt + 3) & 0xff)
    val big = new java.io.ByteArrayOutputStream()
    big.write(std, 0, moovAt)
    big.write(Array[Byte](0, 0, 0, 1)); big.write("moov".getBytes("ISO-8859-1"))
    big.write(Array[Byte](0, 0, 0, 0, 0, 0, 0, 0)) // patched below
    big.write(std, moovAt + 8, moovLen - 8)
    val bigArr = big.toByteArray
    val large = (moovLen + 8).toLong // original payload + 16-byte header
    for (i <- 0 until 8)
      bigArr(moovAt + 8 + i) = ((large >> (8 * (7 - i))) & 0xff).toByte
    assert(Multimodal.mp4Meta(bigArr).contains(("isom", 600L, 100L * 1000 / 600, 1)))
    // size==0 (box runs to end of file) on the final box
    val toEnd = std.clone()
    for (i <- 0 until 4) toEnd(moovAt + i) = 0
    assert(Multimodal.mp4Meta(toEnd).contains(("isom", 600L, 100L * 1000 / 600, 1)))
    // malformed: truncated box length, garbage, no moov
    assert(Multimodal.mp4Meta(std.take(std.length - 4)).isEmpty)
    assert(Multimodal.mp4Meta("not a container".getBytes).isEmpty)
    assert(Multimodal.mp4Meta(std.take(20)).isEmpty)
    // distributed end-to-end with a poison row
    val assets = Seq((1L, Multimodal.mp4Fixture(7)),
      (2L, "junk".getBytes)).toDF("asset_id", "content")
    val got = Multimodal.videoMeta(assets).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getString(1) == "isom" && got(1L).getLong(2) == 600L &&
      got(1L).getLong(3) == (3000L + 97 * 7) * 1000 / 600 &&
      got(1L).getInt(4) == 7 % 3 + 1)
    assert(got(2L).isNullAt(1) && got(2L).getLong(5) == 4L)
  }

  test("multimodal: decodeBatch uses real raster features for decodable " +
       "images and the byte-histogram fallback otherwise") {
    val png = Multimodal.gradPngBytes(2, 0)
    val assets = Seq(
      (1L, "image", png),
      (2L, "audio", "pretend audio bytes".getBytes))
      .toDF("asset_id", "media_type", "content")
    val got = Multimodal.decodeBatch(assets).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    assert(got(1L).size == 8 && got(2L).size == 8)
    // the image's leading dims are its channel means scaled to [0,1] —
    // cross-check against imageFeatures
    val f = Multimodal.imageFeatures(Seq((1L, png)).toDF("asset_id", "content"))
      .head()
    assert(got(1L)(0) == (f.getDouble(4) / 255.0).toFloat)
    assert(got(1L)(1) == (f.getDouble(5) / 255.0).toFloat)
    assert(got(1L)(3) == (math.sqrt(f.getDouble(7)) / 255.0).toFloat)
    // non-image content takes the documented fallback path unchanged
    val pseudoOnly = Multimodal.decodeBatch(
        Seq((2L, "audio", "pretend audio bytes".getBytes))
          .toDF("asset_id", "media_type", "content"))
      .head().getSeq[Float](2)
    assert(got(2L) == pseudoOnly)
  }

  test("Merge.upsert: latest version wins, deletes remove, inserts add") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "status", "price")
    val changes = Seq(
      (1L, "a1", 11.0, "U", 1L), (1L, "a2", 12.0, "U", 2L), // two versions: v2 wins
      (2L, "b", 20.0, "D", 1L),                             // delete key 2
      (3L, "c1", 31.0, "U", 2L), (3L, "c", 30.0, "D", 1L),  // delete then later update: update wins
      (4L, "d", 40.0, "I", 1L))                             // brand-new key
      .toDF("k", "status", "price", "_op", "_v")
    val got = graft.ops.Merge.upsert(base, changes, "k", "_v", "_op")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(got == Map(1L -> ("a2", 12.0), 3L -> ("c1", 31.0), 4L -> ("d", 40.0)))
  }

  test("Merge.scd2: validity chains per key, exactly one current row") {
    val log = Seq((1L, 1000L, "x"), (1L, 2000L, "y"), (1L, 3000L, "z"), (2L, 1500L, "w"))
      .toDF("k", "ts", "attr")
    val h = graft.ops.Merge.scd2(log, "k", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]), r.getInt(4))).toMap
    assert(h((1L, 1000L)) == (Some(2000L), 0))
    assert(h((1L, 2000L)) == (Some(3000L), 0))
    assert(h((1L, 3000L)) == (None, 1))
    assert(h((2L, 1500L)) == (None, 1))
  }

  test("coerceTimestamp: parse failures coerce to NULL, not throw (F4)") {
    val df = Seq("2025-01-02 03:04:05", "not-a-time", "2025-13-45 99:99:99")
      .toDF("t")
    val got = graft.pipeline.Preprocess.coerceTimestamp(df, "t")
      .collect().map(r => Option(r.get(0)))
    assert(got(0).contains(java.sql.Timestamp.valueOf("2025-01-02 03:04:05")))
    assert(got(1).isEmpty && got(2).isEmpty)
  }

  test("profile: one row per column, nulls/distinct/numeric stats") {
    val df = Seq((1L, Some(2.0), "a"), (2L, None, "b"), (3L, Some(6.0), "a"))
      .toDF("id", "x", "s")
    val got = graft.ops.Relational.profile(df)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.size == 3)
    val id = got("id")
    assert(id.getString(1) == "bigint" && id.getLong(2) == 3L &&
      id.getLong(3) == 0L && id.getLong(4) == 3L)
    assert(id.getDouble(5) == 1.0 && id.getDouble(6) == 3.0 &&
      id.getDouble(7) == 2.0)
    val x = got("x")
    assert(x.getLong(3) == 1L && x.getLong(4) == 2L &&
      x.getDouble(7) == 4.0) // mean over non-null {2, 6}
    val s = got("s")
    assert(s.getString(1) == "string" && s.getLong(4) == 2L &&
      s.isNullAt(5) && s.isNullAt(6) && s.isNullAt(7))
  }
  test("snapshotDiff: added/removed/changed with NULL-safe column compare") {
    val oldS = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, null: String, 40.0)).toDF("k", "s", "v")
    val newS = Seq((1L, "a", 10.0),            // unchanged -> dropped
      (2L, "B", 20.0),                          // changed: s
      (4L, null: String, 41.0),                 // changed: v (null==null ok)
      (5L, "e", 50.0))                          // added
    .toDF("k", "s", "v")                        // 3 removed
    val got = graft.ops.Relational.snapshotDiff(oldS, newS, Seq("k"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2)))
      .toMap
    assert(got == Map(
      2L -> ("changed", "s"),
      3L -> ("removed", ""),
      4L -> ("changed", "v"),
      5L -> ("added", "")), got.toString)
    // multi-column change lists every differing column in shared order
    val both = graft.ops.Relational.snapshotDiff(
      Seq((1L, "a", 1.0)).toDF("k", "s", "v"),
      Seq((1L, "z", 2.0)).toDF("k", "s", "v"), Seq("k"))
      .head()
    assert(both.getString(1) == "changed" && both.getString(2) == "s,v")
  }

  test("psi: identical distributions score 0; a moved distribution doesn't;" +
       " empty bins hit the epsilon floor, never infinity") {
    val ref = (1 to 1000).map(i => i.toDouble).toDF("x")
    val same = graft.ops.Stats.psi(ref, ref, "x", bins = 10)
      .select("psi").head().getDouble(0)
    assert(same == 0.0, s"self-PSI must be 0, got $same")
    // shift the current distribution entirely above the reference: every
    // current row lands in the top bin -> 9 eps-floored current bins
    val cur = (1 to 1000).map(i => i + 10000.0).toDF("x")
    val rows = graft.ops.Stats.psi(ref, cur, "x", bins = 10)
      .collect().map(r => r.getInt(0) -> r).toMap
    val psi = rows(0).getDouble(6)
    assert(psi > 1.0 && !psi.isInfinite, s"shifted PSI should be large/finite: $psi")
    assert(rows(9).getLong(2) == 1000L) // all current mass in the top bin
    assert((0 to 8).forall(b => rows(b).getDouble(4) == 1e-6),
      "empty current bins must sit on the epsilon floor")
  }
}
