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
  * per-row JVM↔native crossings). IMAGE decode is REAL: `decodeImageMeta`
  * reads format/dimensions/channels through JDK ImageIO (PNG/JPEG/BMP/GIF,
  * header-only — no external codec needed). Audio/video feature extraction
  * remains a clearly-marked stub (`pseudoFeatures` — no AV libraries in
  * this container): deterministic pseudo-features keep that plumbing
  * verifiable end-to-end, and a real codec changes only `decodeBatch`'s
  * body.
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

  /** STUB decode: deterministic 8-dim pseudo-features from byte content.
    * A real implementation would decode image/audio here (e.g. via javacv /
    * a JNI codec) — batch-wise inside the same mapPartitions loop. */
  private def pseudoFeatures(bytes: Array[Byte], dim: Int = 8): Array[Float] = {
    val acc = new Array[Long](dim)
    var i = 0
    while (i < bytes.length) { acc(i % dim) += bytes(i) & 0xff; i += 1 }
    acc.map(v => (v % 1000) / 1000.0f)
  }

  /** Batch decode / feature extraction over partitions (mapInPandas shape:
    * iterator-in/iterator-out per partition). */
  def decodeBatch(assets: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    assets.select("asset_id", "media_type", "content").mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]]("content")
        Row(r.getLong(0), r.getString(1), pseudoFeatures(bytes).toSeq, bytes.length.toLong)
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

  /** Frame/segment sampling: every `stride`-th chunk of `chunk` bytes —
    * the byte-slicing shape of video frame-sampling, pure expressions. */
  def frameSample(assets: DataFrame, chunk: Int, stride: Int): DataFrame =
    assets.select(col("asset_id"),
        posexplode(expr(
          s"transform(sequence(1, greatest(int(octet_length(content) / $chunk), 1)), " +
            s"i -> substring(content, (i - 1) * $chunk + 1, $chunk))")).as(Seq("frame_idx", "frame")))
      .filter(col("frame_idx") % stride === 0)
}
