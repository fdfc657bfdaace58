package graft.tools

import graft.Tables
import graft.text.Dedup
import org.apache.spark.sql.SparkSession

/** Scratch debug main: materialize the LSH signature index for a SF dir and
  * report its on-disk size vs the corpus parquet — the number SCALING.md
  * quotes for the incremental-dedup index. Args: sfDir outDir [nBuckets]. */
object DebugIndexSize {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1)
    val nBuckets = if (args.length > 2) args(2).toInt else Dedup.DefaultIndexBuckets
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    Dedup.writeSignatureIndex(
      Dedup.minhashSignatures(docs, "doc_id", "text"), "doc_id", outDir, nBuckets)
    def treeSize(p: java.io.File): Long =
      if (p.isDirectory) p.listFiles().map(treeSize).sum else p.length()
    val idxBytes = treeSize(new java.io.File(outDir))
    val corpusBytes = treeSize(new java.io.File(s"$sfDir/documents.parquet"))
    val nDocs = docs.count()
    println(f"docs=$nDocs corpus=$corpusBytes%d B index=$idxBytes%d B " +
      f"ratio=${idxBytes.toDouble / corpusBytes}%.3f perDoc=${idxBytes.toDouble / nDocs}%.1f B")
    spark.stop()
  }
}
