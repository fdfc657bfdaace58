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
  * per-row JVM↔native crossings). The actual codec call is a clearly-marked
  * STUB (no image/audio libraries in this container): `decodeStub`
  * produces deterministic pseudo-features from the bytes so the plumbing is
  * verifiable end-to-end; swapping in a real decoder changes only the body
  * of `decodeBatch`.
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

  /** Frame/segment sampling: every `stride`-th chunk of `chunk` bytes —
    * the byte-slicing shape of video frame-sampling, pure expressions. */
  def frameSample(assets: DataFrame, chunk: Int, stride: Int): DataFrame =
    assets.select(col("asset_id"),
        posexplode(expr(
          s"transform(sequence(1, greatest(int(octet_length(content) / $chunk), 1)), " +
            s"i -> substring(content, (i - 1) * $chunk + 1, $chunk))")).as(Seq("frame_idx", "frame")))
      .filter(col("frame_idx") % stride === 0)
}
