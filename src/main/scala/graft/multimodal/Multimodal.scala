package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque BINARY columns
  * with typed metadata, plus batch decode / feature-extract / frame-sample
  * operators.
  *
  * The Spark-side contract is real and tested — schema, partitioning, batch
  * iteration shape (`mapPartitions`, the Scala analog of `mapInPandas`:
  * one iterator per partition, decode amortized across the batch, no
  * per-row JVM↔native crossings). IMAGE decode is REAL at both depths:
  * `decodeImageMeta` reads format/dimensions/channels through JDK ImageIO
  * (header-only), and `imageFeatures`/`decodeBatch` decode the full raster
  * for per-channel pixel statistics that feed the similarity/dedup stack
  * (q167 value-checks the decode, q168 runs image near-dup dedup end to
  * end). Audio/video feature extraction remains a clearly-marked fallback
  * (`pseudoFeatures` — no AV libraries in this container): deterministic
  * byte-level features keep that plumbing verifiable end-to-end, and a
  * real AV codec changes only the `rasterStats` analog for those types.
  */
object Multimodal {

  /** Asset schema: content plus typed metadata (what a lakehouse media
    * table carries per row at 100 TB — bytes stay columnar/compressed in
    * parquet, metadata prunes without touching content). */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("media_type", StringType), // image | audio | video
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))))))

  /** Pack a text/id frame into fake assets (test fixture path: any corpus
    * becomes a media table with deterministic bytes). */
  def packAssets(df: DataFrame, id: String, payload: String): DataFrame =
    df.select(
      col(id).cast("long").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col(id) % 3 + 1).cast("int")).as("media_type"),
      encode(col(payload), "UTF-8").as("content"))
      .withColumn("meta", struct(
        octet_length(col("content")).cast("long").as("n_bytes"),
        (octet_length(col("content")) % 640).cast("int").as("width"),
        ((octet_length(col("content")) * 7) % 480 + 1).cast("int").as("height"),
        (octet_length(col("content")) * 13L).cast("long").as("duration_ms")))

  private val featureSchema = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("media_type", StringType),
    StructField("features", ArrayType(FloatType)),
    StructField("n_bytes", LongType)))

  /** Fallback features: deterministic 8-dim byte-histogram projection, used
    * for media no installed codec can decode (audio/video in this
    * container). Does real byte-level work, is documented as a proxy, and
    * keeps the batch plumbing verifiable end to end for every media type. */
  private def pseudoFeatures(bytes: Array[Byte], dim: Int = 8): Array[Float] = {
    val acc = new Array[Long](dim)
    var i = 0
    while (i < bytes.length) { acc(i % dim) += bytes(i) & 0xff; i += 1 }
    acc.map(v => (v % 1000) / 1000.0f)
  }

  /** Integer-exact raster statistics: per-channel pixel sums and sums of
    * squares as longs (exact — 255²·maxPixels is far inside int64), so the
    * derived mean/variance doubles are REPRODUCIBLE in any engine that
    * divides the same integers (the q167 oracle recomputes them in SQL).
    * Returns null when no codec claims the bytes or the image exceeds
    * `maxPixels` (decode cost is per-pixel — at corpus scale an unbounded
    * decode is how one poison 10⁹-pixel asset stalls a task). */
  private[graft] def rasterStats(bytes: Array[Byte],
                                 maxPixels: Long): Option[RasterStats] = {
    // the size cap must be enforced BEFORE the raster decode, from the
    // header-only probe — a decompression-bomb PNG (tiny bytes, 10⁹
    // pixels) would otherwise allocate the full raster just to be
    // rejected, which is exactly the stall the cap exists to prevent
    val headerOk = imageHeader(bytes).exists { case (_, w, h, _) =>
      w > 0 && h > 0 && w.toLong * h <= maxPixels
    }
    val img =
      if (!headerOk) None
      else
        try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
        catch { case scala.util.control.NonFatal(_) => None }
    img.flatMap { im =>
      val (w, h) = (im.getWidth, im.getHeight)
      if (w.toLong * h > maxPixels || w == 0 || h == 0) None
      else {
        var sr, sg, sb, srr, sgg, sbb = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = im.getRGB(x, y)
            val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
            sr += r; sg += g; sb += b
            srr += r.toLong * r; sgg += g.toLong * g; sbb += b.toLong * b
            x += 1
          }
          y += 1
        }
        Some(RasterStats(w, h, sr, sg, sb, srr, sgg, sbb))
      }
    }
  }

  final case class RasterStats(w: Int, h: Int, sr: Long, sg: Long, sb: Long,
                               srr: Long, sgg: Long, sbb: Long) {
    def n: Long = w.toLong * h
    def mean(s: Long): Double = s.toDouble / n
    def variance(s: Long, ss: Long): Double = {
      val m = s.toDouble / n
      ss.toDouble / n - m * m
    }
    /** The 6-dim content vector [mean_r, mean_g, mean_b, var_r, var_g,
      * var_b] — unrounded, from exact integer sums, so two engines (or two
      * partitionings) produce bit-identical doubles. */
    def featureVector: Array[Double] = Array(
      mean(sr), mean(sg), mean(sb),
      variance(sr, srr), variance(sg, sgg), variance(sb, sbb))
  }

  /** Batch decode / feature extraction over partitions (mapInPandas shape:
    * iterator-in/iterator-out per partition). Content that decodes as an
    * image gets REAL pixel-statistic features (per-channel mean and
    * variance from the decoded raster, scaled to [0,1], plus log-scaled
    * dimensions — the vector SemDeDup/ANN consume downstream); anything
    * else falls back to [[pseudoFeatures]]. */
  def decodeBatch(assets: DataFrame, maxPixels: Long = 1L << 22,
                  maxSamples: Long = 1L << 24): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    assets.select("asset_id", "media_type", "content").mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]]("content")
        val feats = rasterStats(bytes, maxPixels) match {
          case Some(st) =>
            val v = st.featureVector
            Array(
              (v(0) / 255.0).toFloat, (v(1) / 255.0).toFloat,
              (v(2) / 255.0).toFloat,
              (math.sqrt(v(3)) / 255.0).toFloat,
              (math.sqrt(v(4)) / 255.0).toFloat,
              (math.sqrt(v(5)) / 255.0).toFloat,
              (math.log1p(st.w.toDouble) / 16.0).toFloat,
              (math.log1p(st.h.toDouble) / 16.0).toFloat)
          case None => audioStats(bytes, maxSamples) match {
            case Some(st) => Array(
              (st.mean / 32768.0).toFloat, (st.rms / 32768.0).toFloat,
              (st.crossings.toDouble / math.max(st.n - 1, 1)).toFloat,
              (st.min / 32768.0).toFloat, (st.max / 32768.0).toFloat,
              (math.log1p(st.n.toDouble) / 24.0).toFloat,
              (st.sampleRate / 48000.0).toFloat, (st.channels / 8.0).toFloat)
            case None => pseudoFeatures(bytes)
          }
        }
        Row(r.getLong(0), r.getString(1), feats.toSeq, bytes.length.toLong)
      }
    }(enc)
  }

  private val imageFeatureSchema = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_px", LongType),
    StructField("mean_r", DoubleType), StructField("mean_g", DoubleType),
    StructField("mean_b", DoubleType),
    StructField("var_r", DoubleType), StructField("var_g", DoubleType),
    StructField("var_b", DoubleType),
    StructField("features", ArrayType(DoubleType))))

  /** REAL image content features (round-6 ask #2): decode the raster via
    * JDK ImageIO and emit per-channel mean/variance — as scalar columns
    * (oracle-comparable) and as the 6-dim `features` vector the similarity
    * stack consumes (q168 feeds it straight into `cosineNearDupPairs` →
    * `dedupClusters`). Same `mapPartitions` batch shape as [[decodeBatch]];
    * undecodable or over-`maxPixels` assets yield NULL stats rather than
    * failing the partition. Exact integer sums make the doubles
    * engine-portable — see [[rasterStats]]. */
  def imageFeatures(assets: DataFrame, maxPixels: Long = 1L << 22): DataFrame = {
    val enc = RowEncoder.encoderFor(imageFeatureSchema)
    assets.select("asset_id", "content").mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]]("content")
        rasterStats(bytes, maxPixels) match {
          case Some(st) =>
            Row(r.getLong(0), st.w, st.h, st.n,
              st.mean(st.sr), st.mean(st.sg), st.mean(st.sb),
              st.variance(st.sr, st.srr), st.variance(st.sg, st.sgg),
              st.variance(st.sb, st.sbb), st.featureVector.toSeq)
          case None =>
            Row(r.getLong(0), null, null, null, null, null, null, null, null,
              null, null)
        }
      }
    }(enc)
  }

  private val imageMetaSchema = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_bytes", LongType)))

  /** REAL image decode via JDK ImageIO (no external dependency —
    * `javax.imageio` ships in every JVM and reads PNG/JPEG/BMP/GIF/WBMP):
    * per asset, the container format, pixel dimensions, and channel count,
    * read HEADER-ONLY (`ImageReader.getWidth/getHeight` never decode the
    * raster, so cost is per-asset metadata, not per-pixel). Same
    * `mapPartitions` batch shape as [[decodeBatch]]; the input stream is a
    * `MemoryCacheImageInputStream` so no temp-file cache is touched on
    * executors. Undecodable bytes (no registered reader claims them) yield
    * NULL metadata instead of failing the partition — at corpus scale a
    * poison row must not kill the job. q158 value-checks the decode
    * against PNGs of known dimensions. */
  def decodeImageMeta(assets: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(imageMetaSchema)
    assets.select("asset_id", "content").mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]]("content")
        imageHeader(bytes) match {
          case Some((fmt, w, h, ch)) =>
            Row(r.getLong(0), fmt, w, h, ch, bytes.length.toLong)
          case None =>
            Row(r.getLong(0), null, null, null, null, bytes.length.toLong)
        }
      }
    }(enc)
  }

  /** Header-only ImageIO probe: (format, width, height, channels), or None
    * when no installed reader recognizes the bytes (or the header is
    * corrupt — any reader exception degrades to None). */
  private[graft] def imageHeader(
      bytes: Array[Byte]): Option[(String, Int, Int, Int)] = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val rd = readers.next()
        try {
          rd.setInput(iis, true, true)
          val w = rd.getWidth(0); val h = rd.getHeight(0)
          val types = rd.getImageTypes(0)
          val ch = if (types.hasNext) types.next().getNumComponents else -1
          Some((rd.getFormatName.toLowerCase(java.util.Locale.ROOT), w, h, ch))
        } catch { case scala.util.control.NonFatal(_) => None }
        finally rd.dispose()
      }
    } finally iis.close()
  }

  /** Deterministic PNG fixture bytes: a real `width`×`height` RGB image
    * encoded by the JDK's PNG writer (pixels a fixed function of position,
    * so the bytes are reproducible). Fixture path for specs and the q158
    * oracle — the decode side never sees anything but genuine PNGs. */
  def pngBytes(width: Int, height: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y, ((x * 31 + y * 17) * 2654435761L).toInt & 0xffffff)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** REAL audio decode via the JDK's RIFF/WAV codec (`javax.sound.sampled`
    * ships in every JVM): parse the container header, stream the PCM
    * frames, and accumulate integer-exact sample statistics. Only
    * 16-bit-per-sample PCM is accepted (the overwhelmingly common WAV
    * layout; anything else → None, same poison-safety contract as
    * [[rasterStats]]). Sums are exact longs, so derived mean/RMS doubles
    * are engine-reproducible — the q170 oracle recomputes them from the
    * fixtures' closed-form sample function. `maxSamples` bounds decode
    * cost per asset. */
  private[graft] def audioStats(bytes: Array[Byte],
                                maxSamples: Long): Option[AudioStats] = {
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val ok = fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16
        val nFrames = in.getFrameLength
        val nSamples = nFrames * fmt.getChannels
        if (!ok || nFrames <= 0 || nSamples > maxSamples) None
        else {
          val little = !fmt.isBigEndian
          val buf = new Array[Byte](4096)
          var sum, ssq = 0L
          var crossings = 0L
          var prevNonNeg = true
          var first = true
          var mn = Int.MaxValue; var mx = Int.MinValue
          var carry = -1 // pending low/high byte across read boundaries
          var read = in.read(buf)
          while (read > 0) {
            var i = 0
            while (i < read) {
              if (carry < 0 && i == read - 1) { carry = buf(i) & 0xff; i += 1 }
              else {
                val (lo, hi) =
                  if (carry >= 0) {
                    val p = (carry, buf(i) & 0xff); carry = -1; i += 1; p
                  } else { val p = (buf(i) & 0xff, buf(i + 1) & 0xff); i += 2; p }
                val s =
                  if (little) ((hi << 8) | lo).toShort.toInt
                  else ((lo << 8) | hi).toShort.toInt
                sum += s; ssq += s.toLong * s
                if (s < mn) mn = s
                if (s > mx) mx = s
                val nonNeg = s >= 0
                if (!first && nonNeg != prevNonNeg) crossings += 1
                prevNonNeg = nonNeg; first = false
              }
            }
            read = in.read(buf)
          }
          Some(AudioStats(math.round(fmt.getSampleRate), fmt.getChannels,
            nSamples, sum, ssq, crossings, mn, mx))
        }
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  final case class AudioStats(sampleRate: Int, channels: Int, n: Long,
                              sum: Long, ssq: Long, crossings: Long,
                              min: Int, max: Int) {
    def mean: Double = sum.toDouble / n
    def rms: Double = math.sqrt(ssq.toDouble / n)
  }

  private val audioFeatureSchema = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_samples", LongType),
    StructField("mean_amp", DoubleType),
    StructField("rms", DoubleType),
    StructField("zero_crossings", LongType),
    StructField("min_amp", IntegerType),
    StructField("max_amp", IntegerType)))

  /** Audio analog of [[imageFeatures]]: WAV containers decoded through the
    * JDK codec, integer-exact per-asset sample statistics (q170
    * value-checks against closed-form fixtures). Undecodable / non-PCM16 /
    * over-cap assets yield NULL stats. */
  def audioFeatures(assets: DataFrame,
                    maxSamples: Long = 1L << 24): DataFrame = {
    val enc = RowEncoder.encoderFor(audioFeatureSchema)
    assets.select("asset_id", "content").mapPartitions { it =>
      it.map { r =>
        audioStats(r.getAs[Array[Byte]]("content"), maxSamples) match {
          case Some(st) =>
            Row(r.getLong(0), st.sampleRate, st.channels, st.n,
              st.mean, st.rms, st.crossings, st.min, st.max)
          case None =>
            Row(r.getLong(0), null, null, null, null, null, null, null, null)
        }
      }
    }(enc)
  }

  /** REAL video container metadata via a minimal ISO BMFF (MP4) box
    * parser — the container layout is a public standard (ISO/IEC 14496-12:
    * length-prefixed box tree; `ftyp` brand, `moov`→`mvhd` movie header,
    * `trak` per track) and needs no codec, exactly the tier
    * [[decodeImageMeta]] occupies for images: header/metadata decode is
    * real, frame decode would need an external codec and stays out.
    * Returns (majorBrand, timescale, durationMs, nTracks); malformed or
    * non-BMFF bytes → None (poison-safe). Handles 64-bit `largesize` and
    * size-0 (to-end) boxes. */
  private[graft] def mp4Meta(bytes: Array[Byte])
      : Option[(String, Long, Long, Int)] = {
    def be32(o: Int): Long =
      ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    def be64(o: Int): Long = (be32(o) << 32) | be32(o + 4)
    def typ(o: Int): String = new String(bytes, o, 4, "ISO-8859-1")
    // walk a box sequence in [from, to); returns (type, payloadFrom,
    // payloadTo) triples or None on a malformed length
    def boxes(from: Int, to: Int): Option[Seq[(String, Int, Int)]] = {
      val out = Seq.newBuilder[(String, Int, Int)]
      var o = from
      while (o < to) {
        if (o + 8 > to) return None
        val raw = be32(o)
        val (size, hdr) =
          if (raw == 1) { if (o + 16 > to) return None; (be64(o + 8), 16) }
          else if (raw == 0) ((to - o).toLong, 8)
          else (raw, 8)
        if (size < hdr || o + size > to) return None
        out += ((typ(o + 4), o + hdr, o + size.toInt))
        o += size.toInt
      }
      Some(out.result())
    }
    try {
      boxes(0, bytes.length).flatMap { top =>
        for {
          ftyp <- top.find(_._1 == "ftyp").filter(b => b._3 - b._2 >= 4)
          moov <- top.find(_._1 == "moov")
          kids <- boxes(moov._2, moov._3)
          mvhd <- kids.find(_._1 == "mvhd").filter(b => b._3 - b._2 >= 20)
          ver = bytes(mvhd._2) & 0xff
          if (ver == 0 && mvhd._3 - mvhd._2 >= 20) ||
            (ver == 1 && mvhd._3 - mvhd._2 >= 32)
        } yield {
          val (ts, dur) =
            if (ver == 0) (be32(mvhd._2 + 12), be32(mvhd._2 + 16))
            else (be32(mvhd._2 + 20), be64(mvhd._2 + 24))
          (typ(ftyp._2), ts, if (ts > 0) dur * 1000L / ts else 0L,
            kids.count(_._1 == "trak"))
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private val videoMetaSchema = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("brand", StringType),
    StructField("timescale", LongType),
    StructField("duration_ms", LongType),
    StructField("n_tracks", IntegerType),
    StructField("n_bytes", LongType)))

  /** Distributed MP4 container-metadata decode (same batch shape as
    * [[decodeImageMeta]]). Non-BMFF assets yield NULL metadata. */
  def videoMeta(assets: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(videoMetaSchema)
    assets.select("asset_id", "content").mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]]("content")
        mp4Meta(bytes) match {
          case Some((brand, ts, ms, nTrak)) =>
            Row(r.getLong(0), brand, ts, ms, nTrak, bytes.length.toLong)
          case None =>
            Row(r.getLong(0), null, null, null, null, bytes.length.toLong)
        }
      }
    }(enc)
  }

  /** Author a minimal, well-formed ISO BMFF stream: `ftyp` (major brand)
    * + `moov` holding a version-0 `mvhd` (timescale/duration) and
    * `nTracks` empty `trak` boxes. Fixture path for q171 and specs — the
    * parser side never sees anything but spec-conformant box layout. */
  def mp4Bytes(brand: String, timescale: Int, duration: Long,
               nTracks: Int): Array[Byte] = {
    require(brand.length == 4, "brand must be 4 chars")
    val out = new java.io.ByteArrayOutputStream()
    def be32(v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    def tag(t: String): Unit = out.write(t.getBytes("ISO-8859-1"))
    // ftyp: major brand + minor version + one compatible brand
    be32(20); tag("ftyp"); tag(brand); be32(0); tag(brand)
    // moov = mvhd(108) + nTracks empty trak(8)
    be32(8 + 108 + 8L * nTracks); tag("moov")
    be32(108); tag("mvhd")
    be32(0)                       // version 0 + flags
    be32(0); be32(0)              // creation, modification
    be32(timescale); be32(duration)
    be32(0x00010000); be32(0x01000000L) // rate 1.0; volume 1.0 + reserved16
    be32(0); be32(0)              // reserved2
    Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
      .foreach(v => be32(v.toLong)) // unity matrix
    (1 to 6).foreach(_ => be32(0)) // pre_defined
    be32(nTracks + 1L)            // next_track_ID
    (1 to nTracks).foreach { _ => be32(8); tag("trak") }
    out.toByteArray
  }

  /** Deterministic MP4 fixture for q171: timescale 600 (the classic
    * QuickTime tick rate — exercises the ms integer division), duration
    * and track count closed-form in `k`. */
  def mp4Fixture(k: Int): Array[Byte] =
    mp4Bytes("isom", 600, 3000L + 97L * k, k % 3 + 1)

  /** Genuine WAV bytes (JDK encoder): 16-bit signed PCM mono at
    * `sampleRate`, frames from `samples`. */
  def wavBytes(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false) // signed, little-endian
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Deterministic WAV fixture family (q170): asset `k` is a pseudo-saw
    * wave whose every sample is a closed-form integer function of (k, i) —
    * an oracle engine recomputes the exact statistics with no audio
    * library, so the DECODE is the only thing under test (the q167
    * recipe, for audio). */
  def sawDims(k: Int): (Int, Int) = (8000, 200 + 40 * (k % 5)) // (rate, n)

  def sawSample(k: Int, i: Int): Int =
    (((i * (3 + k % 7) + k * 17) % 4001) - 2000) * 8

  def sawWavBytes(k: Int): Array[Byte] = {
    val (rate, n) = sawDims(k)
    wavBytes(rate, Array.tabulate(n)(i => sawSample(k, i).toShort))
  }

  /** Deterministic gradient-PNG fixture family for the multimodal
    * queries (q167/q168): group `g` fixes the dimensions, per-channel base
    * color and gradient slopes; member `m` adds a small uniform brightness
    * shift. Members of a group are therefore NEAR-duplicates (feature
    * vectors differ by ~m across the mean dims, variances identical) while
    * distinct groups sit far apart — the structure an image-dedup pipeline
    * must recover. Every channel value is a closed-form integer function
    * of (g, m, x, y), bounded < 256 by construction, so an oracle engine
    * recomputes the exact pixel statistics from the formula with no image
    * library — only the DECODE is unique to the Spark side, which is
    * precisely what q167/q168 put under test. */
  def gradDims(g: Int): (Int, Int) = (3 + g % 4, 2 + g % 3)

  def gradChannels(g: Int, m: Int, x: Int, y: Int): (Int, Int, Int) = (
    (g * 97) % 200 + 30 + m + x * (1 + g % 3) + y * 2,
    (g * 53) % 180 + 40 + m + x * (2 + g % 2) + y * (1 + g % 3),
    (g * 71) % 190 + 25 + m + x + y * (2 + g % 2))

  /** Genuine PNG bytes (JDK encoder) for group `g`, member `m`. */
  def gradPngBytes(g: Int, m: Int): Array[Byte] = {
    val (w, h) = gradDims(g)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, gc, b) = gradChannels(g, m, x, y)
        img.setRGB(x, y, (r << 16) | (gc << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Frame/segment sampling: every `stride`-th chunk of `chunk` bytes —
    * the byte-slicing shape of video frame-sampling, pure expressions. */
  def frameSample(assets: DataFrame, chunk: Int, stride: Int): DataFrame =
    assets.select(col("asset_id"),
        posexplode(expr(
          s"transform(sequence(1, greatest(int(octet_length(content) / $chunk), 1)), " +
            s"i -> substring(content, (i - 1) * $chunk + 1, $chunk))")).as(Seq("frame_idx", "frame")))
      .filter(col("frame_idx") % stride === 0)
}
