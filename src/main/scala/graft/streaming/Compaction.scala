package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared fold-increments-into-a-new-base protocol for the maintained
  * parquet artifacts ([[StreamingAnn]] posting lists, [[StreamingSketch]]
  * count-min and DDSketch counters, [[StreamingLm]] bigram counts — the
  * same write-aside-and-swap scheme as
  * [[graft.text.Dedup.compactSignatureIndex]]).
  *
  * Why it exists: every foreachBatch sink in this family lands one
  * `increments/batch=<id>` directory per micro-batch, forever — correct
  * (the merge contracts are additive / union-distributive), but the read
  * path's file listing and union width grow linearly with batch count; at
  * hourly cadence a reader unions thousands of directories within months.
  *
  * Protocol, restatement-safe by construction:
  *  1. snapshot the `increments/batch=*` directories present NOW — a batch
  *     that lands mid-compaction is simply not folded this round;
  *  2. compute the folded frame from base ∪ snapshot (each family's own
  *     merge — the very contract its read path already applies, so
  *     read-before ≡ read-after is an identity, spec-pinned per family);
  *  3. write it to `base_compact`, then swap: base → base_old,
  *     base_compact → base, delete base_old — a crash at any step leaves
  *     either the original base+increments or the new base readable,
  *     never neither;
  *  4. delete ONLY the folded snapshot directories (later increments stay),
  *     and the `increments/` dir itself once empty.
  *
  * Run it when no stream is mid-batch (this family's sinks use
  * AvailableNow triggers, which terminate between runs): a batch retried
  * AFTER its increment was folded would re-land its directory and
  * double-count — the same caveat `compactSignatureIndex` documents.
  */
private[graft] object Compaction {

  /** Fold the current increments of the artifact rooted at `root` into a
    * new `base`. `fold(basePath, incrementPaths)` builds the merged frame
    * (basePath is None when no base exists yet); `write(df, outPath)`
    * materializes it with the family's layout (partitioning etc.).
    * Returns the number of increment directories folded (0 = nothing to
    * do, the artifact is untouched). */
  def foldIncrements(spark: SparkSession, root: String)
                    (fold: (Option[String], Seq[String]) => DataFrame)
                    (write: (DataFrame, String) => Unit): Int = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val incDir = new Path(s"$root/increments")
    if (!fs.exists(incDir)) return 0
    val batches = fs.listStatus(incDir).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("batch=")).toSeq.sorted
    if (batches.isEmpty) return 0
    val baseP = new Path(s"$root/base")
    val base = if (fs.exists(baseP)) Some(s"$root/base") else None
    // the shared FileStatusCache may hold listings from earlier reads of
    // these paths (a restated increment rewrites its part files under the
    // same directory) — refresh before folding and again after the swap,
    // or readers chase deleted part files
    spark.catalog.refreshByPath(root)
    write(fold(base, batches.map(b => s"$root/increments/$b")),
      s"$root/base_compact")
    val oldP = new Path(s"$root/base_old")
    if (fs.exists(baseP)) { fs.rename(baseP, oldP); () }
    fs.rename(new Path(s"$root/base_compact"), baseP)
    fs.delete(oldP, true)
    batches.foreach(b => fs.delete(new Path(s"$root/increments/$b"), true))
    // drop the dir itself once empty so exists-checks in the readers stay
    // cheap and a bare dir can't trip schema inference
    if (fs.listStatus(incDir).isEmpty) fs.delete(incDir, true)
    spark.catalog.refreshByPath(root)
    batches.size
  }
}
