package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared fold-increments-into-a-new-base protocol for the maintained
  * parquet artifacts ([[StreamingAnn]] posting lists, [[StreamingSketch]]
  * count-min and DDSketch counters, [[StreamingLm]] bigram counts,
  * [[graft.text.LexIndex]] postings/doclens — the same write-aside-and-swap
  * scheme as [[graft.text.Dedup.compactSignatureIndex]]).
  *
  * Why it exists: every foreachBatch sink in this family lands one
  * `increments/batch=<id>` directory per micro-batch, forever — correct
  * (the merge contracts are additive / union-distributive), but the read
  * path's file listing and union width grow linearly with batch count; at
  * hourly cadence a reader unions thousands of directories within months.
  *
  * Protocol — crash-safe and replay-safe by MECHANISM, not convention:
  *  1. [[recover]] first: converge any interrupted swap (below) so the
  *     preconditions of this run's renames hold;
  *  2. snapshot the `increments/batch=<id>` directories present NOW and
  *     DROP the stale ones — `id <= foldedWatermark(base)` means a prior
  *     fold already owns that batch's rows (its delete never ran, or a
  *     retried batch re-landed the directory after the fold) — deleting
  *     them instead of folding is what makes a rerun single-count;
  *  3. compute the folded frame from base ∪ fresh snapshot (each family's
  *     own merge — the very contract its read path already applies, so
  *     read-before ≡ read-after is an identity, spec-pinned per family);
  *  4. write it to `base_compact` and stamp the new watermark (max folded
  *     batch id) INSIDE it as `_folded_watermark` (underscore-prefixed →
  *     invisible to parquet readers) — the watermark travels with the
  *     base through the rename, atomically;
  *  5. swap with CHECKED renames (fail fast on a false return): base →
  *     base_old, base_compact → base, delete base_old;
  *  6. delete ONLY the folded snapshot directories (later increments
  *     stay), and the `increments/` dir itself once empty.
  *
  * Crash matrix (every state converges under [[recover]] + the watermark):
  *  - during/after the base_compact write, before the swap → recover
  *    deletes the (possibly torn) `base_compact`; original intact;
  *  - between rename(base→base_old) and rename(base_compact→base) → base
  *    absent + base_old present: recover restores base_old → base and
  *    deletes base_compact; original intact (the state ADVICE r12 showed
  *    would otherwise lose the base to a naive rerun);
  *  - after rename(base_compact→base), before delete(base_old) → both
  *    present: the NEW base is live (it carries the watermark); recover
  *    deletes base_old;
  *  - after the swap, before/mid increment deletes → the folded
  *    increments survive on disk but carry `id <= watermark`, so readers
  *    PRUNE them (every family's read path filters the `batch` partition
  *    column against [[foldedWatermark]] — stale dirs never even open),
  *    sinks drop a replayed landing ([[isFolded]]), and the next fold
  *    deletes instead of double-counting them.
  *
  * Run it when no stream is mid-batch (this family's sinks use
  * AvailableNow triggers, which terminate between runs); the watermark
  * guard makes even a violated discipline single-count as long as batch
  * ids are the monotone foreachBatch ids (they are).
  */
private[graft] object Compaction {

  /** Name of the watermark stamp inside a base directory. Underscore
    * prefix: parquet readers ignore it as a hidden file. */
  private val WmFile = "_folded_watermark"

  private def fsFor(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Max batch id ever folded into `root`'s base; -1 when no fold has
    * happened (or no base exists). `baseName` is the live directory's
    * name under `root` ("base" for the streaming artifacts, "bands" for
    * the dedup signature index). Readers prune `batch <= watermark`
    * increment directories; sinks drop replayed landings via
    * [[isFolded]]. */
  def foldedWatermark(spark: SparkSession, root: String,
                      baseName: String = "base"): Long =
    readWm(fsFor(spark, root), new Path(s"$root/$baseName"))

  /** True iff `batchId`'s rows are already owned by `root`'s base — the
    * sink-side replay guard: a batch retried AFTER its increment was
    * folded must NOT re-land its directory. */
  def isFolded(spark: SparkSession, root: String, batchId: Long,
               baseName: String = "base"): Boolean =
    batchId <= foldedWatermark(spark, root, baseName)

  private def readWm(fs: FileSystem, baseDir: Path): Long = {
    val p = new Path(baseDir, WmFile)
    if (!fs.exists(p)) return -1L
    val in = fs.open(p)
    try {
      val buf = new Array[Byte](64)
      val n = in.read(buf)
      new String(buf, 0, math.max(n, 0), "UTF-8").trim.toLong
    } finally in.close()
  }

  private def writeWm(fs: FileSystem, baseDir: Path, wm: Long): Unit = {
    val out = fs.create(new Path(baseDir, WmFile), true)
    try out.write(wm.toString.getBytes("UTF-8")) finally out.close()
  }

  /** Stamp a freshly-written sibling (e.g. a recluster's `base_new`) with
    * the watermark it subsumes, BEFORE it is promoted — the stamp travels
    * with the directory through the rename, atomically. */
  private[graft] def stampWatermark(spark: SparkSession, dir: String,
                                    wm: Long): Unit =
    writeWm(fsFor(spark, dir), new Path(dir), wm)

  /** Batch ids of the increment directories currently under `root`. */
  private[graft] def incrementIds(spark: SparkSession, root: String): Seq[Long] = {
    val fs = fsFor(spark, root)
    val incDir = new Path(s"$root/increments")
    if (!fs.exists(incDir)) Nil
    else fs.listStatus(incDir).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong).toSeq.sorted
  }

  /** Delete the increment directories with id <= `wm` (and the
    * `increments/` dir itself once empty) — the post-promote cleanup of a
    * recluster; idempotent, and a crash mid-way is covered by the
    * read-time watermark prune. */
  private[graft] def dropFoldedIncrements(spark: SparkSession, root: String,
                                          wm: Long): Unit = {
    val fs = fsFor(spark, root)
    val incDir = new Path(s"$root/increments")
    if (!fs.exists(incDir)) return
    incrementIds(spark, root).filter(_ <= wm)
      .foreach(b => fs.delete(new Path(s"$root/increments/batch=$b"), true))
    if (fs.listStatus(incDir).isEmpty) fs.delete(incDir, true): Unit
  }

  /** Checked rename: Hadoop's rename reports failure as a boolean (dest
    * exists, source missing, FS error) — a silent no-op here is what turns
    * the later deletes destructive, so fail fast instead. */
  private def mv(fs: FileSystem, src: Path, dst: Path): Unit = {
    require(!fs.exists(dst), s"compaction swap: $dst already exists")
    require(fs.rename(src, dst), s"compaction swap: rename $src -> $dst failed")
  }

  /** Converge any interrupted swap under `root` to a readable state (the
    * crash matrix in the object doc). Safe to call any time no fold is
    * concurrently running; [[foldIncrements]] always calls it on entry. */
  private[graft] def recover(spark: SparkSession, root: String,
                             baseName: String = "base"): Unit = {
    val fs = fsFor(spark, root)
    val base = new Path(s"$root/$baseName")
    val old = new Path(s"$root/${baseName}_old")
    val compact = new Path(s"$root/${baseName}_compact")
    if (fs.exists(old)) {
      if (fs.exists(base)) {
        // crash after the promote: the new base is live; drop the old copy
        fs.delete(old, true)
      } else {
        // crash mid-swap: the original base IS base_old — restore it
        require(fs.rename(old, base),
          s"compaction recover: rename $old -> $base failed")
      }
    }
    // a write-aside that never got promoted (possibly torn) — discard;
    // the original base + increments are intact and a rerun refolds them
    if (fs.exists(compact)) fs.delete(compact, true)
  }

  /** Fold the current increments of the artifact rooted at `root` into a
    * new `base`. `fold(basePath, incrementPaths)` builds the merged frame
    * (basePath is None when no base exists yet); `write(df, outPath)`
    * materializes it with the family's layout (partitioning etc.).
    * Returns the number of increment directories folded (0 = nothing to
    * do, the artifact is untouched — stale replayed increments may still
    * have been dropped). */
  def foldIncrements(spark: SparkSession, root: String,
                     baseName: String = "base")
                    (fold: (Option[String], Seq[String]) => DataFrame)
                    (write: (DataFrame, String) => Unit): Int = {
    val fs = fsFor(spark, root)
    // a half-finished PROMOTE (recluster family) must converge before the
    // fold reads base — otherwise the fold snapshots a torn layout
    recoverPromote(spark, root)
    recover(spark, root, baseName)
    val incDir = new Path(s"$root/increments")
    if (!fs.exists(incDir)) return 0
    val baseP = new Path(s"$root/$baseName")
    val wm = readWm(fs, baseP)
    val ids = fs.listStatus(incDir).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("batch="))
      .map(n => n.stripPrefix("batch=").toLong).toSeq.sorted
    // id <= watermark: a prior fold owns these rows (its delete never ran,
    // or a retried batch re-landed after the fold) — drop, don't refold
    val (stale, fresh) = ids.partition(_ <= wm)
    stale.foreach(b => fs.delete(new Path(s"$root/increments/batch=$b"), true))
    if (fresh.isEmpty) {
      if (fs.listStatus(incDir).isEmpty) fs.delete(incDir, true)
      return 0
    }
    val base = if (fs.exists(baseP)) Some(s"$root/$baseName") else None
    // the shared FileStatusCache may hold listings from earlier reads of
    // these paths (a restated increment rewrites its part files under the
    // same directory) — refresh before folding and again after the swap,
    // or readers chase deleted part files
    spark.catalog.refreshByPath(root)
    val compactP = new Path(s"$root/${baseName}_compact")
    write(fold(base, fresh.map(b => s"$root/increments/batch=$b")),
      compactP.toString)
    writeWm(fs, compactP, math.max(wm, fresh.max))
    val oldP = new Path(s"$root/${baseName}_old")
    if (fs.exists(baseP)) mv(fs, baseP, oldP)
    mv(fs, compactP, baseP)
    fs.delete(oldP, true)
    fresh.foreach(b => fs.delete(new Path(s"$root/increments/batch=$b"), true))
    // drop the dir itself once empty so exists-checks in the readers stay
    // cheap and a bare dir can't trip schema inference
    if (fs.listStatus(incDir).isEmpty) fs.delete(incDir, true)
    spark.catalog.refreshByPath(root)
    fresh.size
  }

  /** Rewrite a live base directory through the same write-aside-and-swap
    * (and the same crash matrix) as [[foldIncrements]], WITHOUT folding
    * increments — the vacuum arm: physically removing tombstoned rows
    * when no data increments are pending (a pure deletion campaign would
    * otherwise never rewrite the base). The folded watermark is preserved
    * verbatim — a vacuum folds nothing, so it must not change which
    * increment directories readers prune. No-op when no base exists. */
  private[graft] def rewriteBase(spark: SparkSession, root: String,
                                 baseName: String = "base")
                                (transform: DataFrame => DataFrame)
                                (write: (DataFrame, String) => Unit): Unit = {
    val fs = fsFor(spark, root)
    recoverPromote(spark, root)
    recover(spark, root, baseName)
    val baseP = new Path(s"$root/$baseName")
    if (!fs.exists(baseP)) return
    val wm = readWm(fs, baseP)
    spark.catalog.refreshByPath(root)
    val compactP = new Path(s"$root/${baseName}_compact")
    write(transform(spark.read.parquet(baseP.toString)), compactP.toString)
    writeWm(fs, compactP, wm)
    val oldP = new Path(s"$root/${baseName}_old")
    mv(fs, baseP, oldP)
    mv(fs, compactP, baseP)
    fs.delete(oldP, true)
    spark.catalog.refreshByPath(root)
  }

  /** Count of increment directories currently under `root` — the trigger
    * signal every family's `compact*IfNeeded` gate reads (the families
    * each own their fold, so the threshold gate lives with them rather
    * than as a generic hook here). */
  def incrementCount(spark: SparkSession, root: String): Int = {
    val fs = fsFor(spark, root)
    val incDir = new Path(s"$root/increments")
    if (!fs.exists(incDir)) 0
    else fs.listStatus(incDir).count(s =>
      s.isDirectory && s.getPath.getName.startsWith("batch="))
  }

  // ── multi-directory promote: the recluster family swaps SEVERAL live
  //    dirs (centroids + postings) that must flip together — two
  //    independent rename pairs leave fresh centroids routing over old
  //    posting lists if a crash lands between them. The commit point here
  //    is ONE atomic file create; recovery rolls forward past it and
  //    rolls back before it, so the artifact set is always EITHER all-old
  //    or all-new after [[recoverPromote]] runs.

  /** Marker carrying the promote's name list (root-relative). */
  private val PendingFile = "_promote_pending"

  /** Atomically promote `$root/<name>_new` over `$root/<name>` for every
    * name, with checked renames and a single-file commit point:
    *  1. [[recoverPromote]] (converge any earlier crash — preconditions);
    *  2. require every `<name>_new` present;
    *  3. create `$root/_promote_pending` listing the names — THE commit:
    *     before it exists a crash discards the `_new` dirs, after it
    *     exists recovery completes the promote;
    *  4. per name: rename live → `<name>_old`, `<name>_new` → live;
    *  5. delete the `_old` dirs, then the marker.
    * Callers delete subsumed increments AFTER promote returns — a crash
    * before those deletes is covered by the read-time watermark prune,
    * never by double-counting. */
  private[graft] def promote(spark: SparkSession, root: String,
                             names: Seq[String]): Unit = {
    require(names.nonEmpty, "promote needs at least one directory name")
    val fs = fsFor(spark, root)
    // converge any interrupted EARLIER promote, but keep the _new dirs —
    // they are this call's freshly-written payload
    recoverPromote(spark, root, dropUncommittedNew = false)
    names.foreach { n =>
      require(fs.exists(new Path(s"$root/${n}_new")),
        s"promote: $root/${n}_new is missing")
    }
    val marker = new Path(s"$root/$PendingFile")
    val out = fs.create(marker, false) // atomic create, fail if present
    try out.write(names.mkString("\n").getBytes("UTF-8")) finally out.close()
    names.foreach { n =>
      val live = new Path(s"$root/$n")
      if (fs.exists(live)) mv(fs, live, new Path(s"$root/${n}_old"))
      mv(fs, new Path(s"$root/${n}_new"), live)
    }
    names.foreach(n => fs.delete(new Path(s"$root/${n}_old"), true))
    fs.delete(marker, false): Unit
  }

  /** Converge an interrupted [[promote]]: marker present → roll FORWARD
    * (finish each name's swap, delete `_old` dirs and the marker); marker
    * absent → roll BACK (leftover `_new` dirs from a pre-commit crash are
    * discarded unless `dropUncommittedNew` is false — [[promote]] passes
    * false because the `_new` dirs are its own payload). `_old` dirs with
    * no marker are NEVER touched here: `<base>_old` may belong to an
    * interrupted [[foldIncrements]] swap, whose [[recover]] is the one
    * that knows whether it is the only live copy. Call on entry of any
    * maintenance op — and at reader startup after an unclean shutdown —
    * before trusting the layout. */
  private[graft] def recoverPromote(spark: SparkSession, root: String,
                                    dropUncommittedNew: Boolean = true): Unit = {
    val fs = fsFor(spark, root)
    val marker = new Path(s"$root/$PendingFile")
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val names = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().filter(_.nonEmpty).toList finally in.close()
      names.foreach { n =>
        val live = new Path(s"$root/$n")
        val nw = new Path(s"$root/${n}_new")
        val old = new Path(s"$root/${n}_old")
        if (fs.exists(nw)) {
          // this name's swap did not finish — complete it
          if (fs.exists(live)) {
            require(!fs.exists(old), s"recoverPromote: both $live and $old " +
              s"exist with ${nw} pending — layout needs manual inspection")
            mv(fs, live, old)
          }
          mv(fs, nw, live)
        }
        // swap done (or just completed): the old copy is garbage
        fs.delete(old, true)
      }
      fs.delete(marker, false)
    } else if (dropUncommittedNew) {
      // pre-commit crash: _new dirs are unpromoted garbage, discard
      val st = if (fs.exists(new Path(root))) fs.listStatus(new Path(root))
               else Array.empty[org.apache.hadoop.fs.FileStatus]
      st.filter(s => s.isDirectory && s.getPath.getName.endsWith("_new"))
        .foreach(s => fs.delete(s.getPath, true))
    }
  }
}
