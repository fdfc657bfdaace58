package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Shared maintenance protocol for the maintained parquet artifacts
  * ([[StreamingAnn]] posting lists, [[StreamingSketch]] count-min and
  * DDSketch counters, [[StreamingLm]] bigram counts,
  * [[graft.text.LexIndex]] postings/doclens, [[graft.text.Dedup]]
  * signature bands, [[graft.sim.PqIndex]] code tables, [[Tombstones]]).
  *
  * Why it exists: every foreachBatch sink in this family lands one
  * `increments/batch=<id>` directory per micro-batch, forever — correct
  * (the merge contracts are additive / union-distributive), but the read
  * path's file listing and union width grow linearly with batch count; at
  * hourly cadence a reader unions thousands of directories within months.
  * Folds, vacuums and reclusters rewrite the base — and at 100 TB a
  * serving fleet queries these indexes CONTINUOUSLY, so the rewrite must
  * never require a read outage.
  *
  * == Versioned roots: snapshot isolation for readers ==
  *
  * Maintenance never mutates or renames a directory a reader could be
  * holding. Instead each root carries a POINTER:
  * {{{
  *   <root>/_pointer/p<NNNN>       one file per committed generation,
  *                                 lines of "name<TAB>versioned-dir"
  *   <root>/<name>_v<K>            immutable content generations
  *   <root>/<name>                 the pre-versioning (legacy) layout —
  *                                 still resolvable as a fallback
  * }}}
  * A reader resolves the pointer ONCE per query ([[view]]): the highest
  * `p<N>` file names the live directory of every maintained artifact
  * under the root; names absent from the pointer fall back to the legacy
  * literal path. Maintenance writes a NEW `<name>_v<K>` directory in
  * full, then commits by renaming a finished pointer file into place —
  * one atomic create is the commit point; a crash before it leaves
  * uncommitted garbage (reaped by the next op's GC), a crash after it
  * leaves the new generation fully live. Multi-directory flips
  * (recluster: centroids + postings; retrain: codebook + codes) commit in
  * ONE pointer file, so the artifact SET is always all-old or all-new.
  *
  * == Grace period ==
  *
  * GC keeps the directories referenced by the LAST TWO pointers (plus the
  * legacy dirs until two versioned generations supersede them), and keeps
  * every increment directory whose batch id exceeds the OLDEST in-grace
  * base's folded watermark. So a reader that resolved the previous
  * generation keeps a complete, consistent view — base plus the
  * increments that base has not folded — throughout the next maintenance
  * op. The isolation contract: a query is safe so long as it finishes
  * before TWO subsequent maintenance ops land on the same root (at any
  * plausible fold cadence, hours of slack). SnapshotIsolationSpec
  * interleaves reader execution with concurrent fold/recluster/vacuum on
  * all four index families to pin exactly this.
  *
  * == Watermarks (unchanged from the pre-versioned protocol) ==
  *
  * The folded-batch watermark is stamped INSIDE each base generation as
  * `_folded_watermark` (hidden from parquet readers) and travels with the
  * directory: readers prune `batch <= watermark` increment directories
  * (partition-column filter — stale dirs never open), sinks drop a
  * replayed landing ([[isFolded]]), and folds skip batches a prior fold
  * owns. Because watermark and content commit together, replay is
  * single-count in every crash state.
  *
  * Single-writer contract: maintenance ops (fold / vacuum / promote) on
  * one root must not run concurrently with each other — run them between
  * streams (this family's sinks use AvailableNow triggers, which
  * terminate between runs). Readers need no coordination at all.
  *
  * [[recover]] / [[recoverPromote]] remain solely to converge debris of
  * the PRE-versioning rename-swap protocol (`base_old` / `base_compact` /
  * `_promote_pending`) left by an upgrade mid-crash; versioned operation
  * never creates those states.
  */
private[graft] object Compaction {

  /** Name of the watermark stamp inside a base directory. Underscore
    * prefix: parquet readers ignore it as a hidden file. */
  private val WmFile = "_folded_watermark"

  /** Pointer directory under a versioned root. */
  private val PtrDir = "_pointer"

  private def fsFor(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // ─────────────────────────────── write lease ──

  /** Run `body` holding the root's exclusive MAINTENANCE LEASE — the
    * mechanical form of the single-writer contract: a second maintenance
    * op (fold / vacuum / promote / graph restate) on the same root fails
    * fast with a clear error instead of racing the pointer commit (the
    * `commitPointer` expect-check would catch the race only at commit
    * time, after both writers burned their rewrite).
    *
    * Implementation: one create-exclusive `_lease` file under the root
    * (atomic on HDFS and local FS), holder token = host:pid:nonce, released
    * on completion. A lease left by a CRASHED writer is broken once it is
    * older than `spark.graft.leaseTtlMinutes` (default 60 — longer than
    * any plausible fold). Ownership is VERIFIED at every destructive step:
    * the break renames the stale lease aside first (rename is atomic, so
    * of two racing breakers exactly one wins — the loser falls through to
    * the create-exclusive acquire and fails fast on the winner's fresh
    * lease), and the release re-reads the lease and deletes it only if it
    * still carries THIS call's token — a writer whose lease was TTL-broken
    * mid-body (a fold outliving the TTL, clock skew) must not delete the
    * new holder's lease on its way out. A root that does not exist yet is
    * not leased: there is nothing to protect before the first write, and
    * the commitPointer expectation stays as the backstop for two
    * concurrent first builds. Readers never touch the lease. */
  private[graft] def withWriteLease[T](spark: SparkSession, root: String)
                                      (body: => T): T = {
    val fs = fsFor(spark, root)
    if (!fs.exists(new Path(root))) return body
    val p = new Path(s"$root/_lease")
    val ttlMs = (spark.conf.get("spark.graft.leaseTtlMinutes", "60")
      .toDouble * 60000).toLong
    val token = java.net.InetAddress.getLocalHost.getHostName + ":" +
      ProcessHandle.current.pid + ":" + java.util.UUID.randomUUID
    def readLease(): String =
      try {
        val in = fs.open(p)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      } catch { case _: Throwable => "unknown" }
    if (fs.exists(p) && System.currentTimeMillis -
          fs.getFileStatus(p).getModificationTime > ttlMs) {
      // stale lease of a crashed writer: break it by renaming it ASIDE —
      // one atomic step only one racing breaker can win, so two breakers
      // can never each delete-then-create and both believe they hold it
      val aside = new Path(s"$root/_lease_broken_${java.util.UUID.randomUUID}")
      if (fs.rename(p, aside)) fs.delete(aside, false): Unit
      // reap aside files a breaker crashed between rename and delete
      fs.listStatus(new Path(root))
        .filter(_.getPath.getName.startsWith("_lease_broken_"))
        .foreach(st => fs.delete(st.getPath, false))
    }
    val out =
      try fs.create(p, false)
      catch {
        case e: java.io.IOException =>
          throw new IllegalStateException(
            s"maintenance lease at $root is held by [${readLease()}] — a " +
              "concurrent maintenance op is running on this root " +
              "(single-writer contract); a crashed holder's lease " +
              "expires after spark.graft.leaseTtlMinutes", e)
      }
    try out.write(token.getBytes("UTF-8"))
    finally out.close()
    try body
    finally if (readLease() == token) fs.delete(p, false): Unit
  }

  // ─────────────────────────────── pointer machinery ──

  /** An immutable resolution of a maintained root, taken ONCE — every
    * directory a single query touches must come from the same view, or a
    * concurrent multi-directory promote could hand it mixed generations
    * (fresh centroids over stale posting lists). Cheap: one directory
    * listing of `_pointer/`. */
  final class RootView private[Compaction] (
      val spark: SparkSession, val root: String,
      private[Compaction] val ptrId: Long,
      private[Compaction] val mapping: Map[String, String]) {

    private val fs = fsFor(spark, root)

    /** The live directory for `name`: the pointer's generation when one
      * is committed, else the legacy literal `<root>/<name>` if present. */
    def dir(name: String): Option[String] =
      mapping.get(name).map(d => s"$root/$d").orElse {
        val legacy = new Path(s"$root/$name")
        if (fs.exists(legacy)) Some(legacy.toString) else None
      }

    /** [[dir]] with the legacy literal as the last resort even when the
      * directory does not exist — callers that would rather surface
      * Spark's own path-not-found than an Option. */
    def dirOrLegacy(name: String): String =
      dir(name).getOrElse(s"$root/$name")

    /** The folded watermark stamped inside [[dir]](name); -1 when the
      * directory (or the stamp) is absent. */
    def watermark(name: String): Long =
      dir(name).map(d => readWm(fs, new Path(d))).getOrElse(-1L)

    /** Snapshot-isolated union read of this root's artifact: resolved
      * base generation ∪ increments above ITS watermark. None when
      * neither exists. `cols` also prunes the increment scan's schema
      * (partition column `batch` is dropped unless requested). */
    def read(cols: Seq[String], baseName: String = "base"): Option[DataFrame] = {
      val basePath = dir(baseName)
      val wm = basePath.map(d => readWm(fs, new Path(d))).getOrElse(-1L)
      val incP = new Path(s"$root/increments")
      val base = basePath.map(p =>
        spark.read.parquet(p).select(cols.map(col): _*))
      val inc =
        if (fs.exists(incP) && incrementIds(spark, root).exists(_ > wm))
          Some(spark.read.parquet(incP.toString)
            .filter(col("batch") > wm).select(cols.map(col): _*))
        else None
      (base, inc) match {
        case (Some(b), Some(i)) => Some(b.unionByName(i))
        case (b, i)             => b.orElse(i)
      }
    }

    /** The base generation alone (no increments) — drift monitors compare
      * it against [[readIncrements]]. */
    def readBase(cols: Seq[String], baseName: String = "base"): Option[DataFrame] =
      dir(baseName).map(p => spark.read.parquet(p).select(cols.map(col): _*))

    /** The live increments alone (batch > the base's watermark); None
      * when none exist. */
    def readIncrements(cols: Seq[String],
                       baseName: String = "base"): Option[DataFrame] = {
      val wm = watermark(baseName)
      val incP = new Path(s"$root/increments")
      if (fs.exists(incP) && incrementIds(spark, root).exists(_ > wm))
        Some(spark.read.parquet(incP.toString)
          .filter(col("batch") > wm).select(cols.map(col): _*))
      else None
    }
  }

  /** Resolve a root's pointer ONCE. See [[RootView]]. */
  def view(spark: SparkSession, root: String): RootView = {
    val (id, m) = latestPointer(fsFor(spark, root), root)
    new RootView(spark, root, id, m)
  }

  /** The live directory for `name` under `root` (one-shot [[view]]).
    * Queries touching a SINGLE directory may use this; anything touching
    * two maintained directories must share one [[view]]. */
  def resolve(spark: SparkSession, root: String, name: String): Option[String] =
    view(spark, root).dir(name)

  /** (pointer id, name→dir map); (0, empty) when the root is unversioned. */
  private def latestPointer(fs: FileSystem,
                            root: String): (Long, Map[String, String]) = {
    val dir = new Path(s"$root/$PtrDir")
    if (!fs.exists(dir)) return (0L, Map.empty)
    val ids = fs.listStatus(dir).map(_.getPath.getName)
      .filter(n => n.startsWith("p") && n.drop(1).forall(_.isDigit))
      .map(_.drop(1).toLong)
    if (ids.isEmpty) return (0L, Map.empty)
    val id = ids.max
    val in = fs.open(new Path(dir, ptrName(id)))
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).toList finally in.close()
    (id, lines.map { l =>
      val Array(k, v) = l.split("\t", 2); k -> v
    }.toMap)
  }

  private def ptrName(id: Long): String = f"p$id%012d"

  /** Commit generation `expect` with `updates` merged over the previous
    * pointer's map. The rename of a fully-written temp file is the atomic
    * commit point — a reader never observes a torn pointer. `expect` is
    * the id the caller reserved via [[nextGenId]]; a mismatch means a
    * concurrent maintenance op violated the single-writer contract. */
  private def commitPointer(spark: SparkSession, root: String,
                            updates: Map[String, String],
                            expect: Long): Unit = {
    val fs = fsFor(spark, root)
    val (id, cur) = latestPointer(fs, root)
    require(id + 1 == expect,
      s"pointer commit at $root: expected generation $expect but the " +
        s"latest is $id — a concurrent maintenance op ran (single-writer " +
        "contract violated)")
    val dir = new Path(s"$root/$PtrDir")
    fs.mkdirs(dir)
    val tmp = new Path(dir, s".tmp_${ptrName(expect)}")
    val out = fs.create(tmp, true)
    try out.write((cur ++ updates).toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k\t$v" }.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    val dst = new Path(dir, ptrName(expect))
    require(!fs.exists(dst) && fs.rename(tmp, dst),
      s"pointer commit at $root: rename $tmp -> $dst failed")
  }

  /** The generation id the next commit will use; also the `_v<K>` suffix
    * of the directories that commit publishes. */
  private def nextGenId(fs: FileSystem, root: String): Long =
    latestPointer(fs, root)._1 + 1

  private val VersionedDir = "^(.+)_v(\\d+)$".r

  /** Wall-clock GC grace: in ADDITION to the last-two-pointers rule,
    * superseded generations, old pointer files and folded increments
    * survive until they are at least this old — so a long analytical
    * reader that outlives TWO quick maintenance ops on the same root
    * still cannot chase deleted files within the window. 0 disables the
    * floor (generation-counting alone, the pre-r15 behavior — what the
    * unit-test session uses so rapid-fire fold specs stay meaningful). */
  private def graceMs(spark: SparkSession): Long =
    (spark.conf.get("spark.graft.gcGraceMinutes", "30").toDouble * 60000)
      .toLong

  private def agedOut(fs: FileSystem, p: Path, grace: Long): Boolean =
    System.currentTimeMillis - fs.getFileStatus(p).getModificationTime >= grace

  /** Reap everything outside the grace window: pointer files older than
    * the previous generation, `_v<K>` directories referenced by no kept
    * pointer (including uncommitted crash leftovers), and legacy
    * directories superseded in EVERY kept pointer — each only once it is
    * also older than the wall-clock floor ([[graceMs]]). Never touches
    * `increments/`, `tombstones/`, `meta`, or any live generation. */
  private def gcVersions(spark: SparkSession, root: String): Unit = {
    val fs = fsFor(spark, root)
    val grace = graceMs(spark)
    val dir = new Path(s"$root/$PtrDir")
    if (!fs.exists(dir)) return
    val ids = fs.listStatus(dir).map(_.getPath.getName)
      .filter(n => n.startsWith("p") && n.drop(1).forall(_.isDigit))
      .map(_.drop(1).toLong).sorted
    if (ids.isEmpty) return
    val last2 = ids.takeRight(2).toSet
    // kept = the last two pointers plus any older one still inside the
    // wall-clock floor (a reader may have resolved it)
    val kept = ids.filter(i => last2(i) ||
      !agedOut(fs, new Path(dir, ptrName(i)), grace))
    ids.filterNot(kept.contains)
      .foreach(i => fs.delete(new Path(dir, ptrName(i)), false))
    def mapOf(id: Long): Map[String, String] = {
      val in = fs.open(new Path(dir, ptrName(id)))
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).map { l =>
          val Array(k, v) = l.split("\t", 2); k -> v
        }.toMap
      finally in.close()
    }
    val keptMaps = kept.map(mapOf)
    val referenced = keptMaps.flatMap(_.values).toSet
    fs.listStatus(new Path(root)).foreach { st =>
      st.getPath.getName match {
        case n @ VersionedDir(_, _) if st.isDirectory && !referenced(n) &&
            agedOut(fs, st.getPath, grace) =>
          fs.delete(st.getPath, true): Unit
        case _ => ()
      }
    }
    // a legacy dir is unreachable only once at least two pointers are in
    // grace and EVERY kept pointer maps its name elsewhere (with one
    // pointer, the legacy dir IS the previous snapshot and an in-flight
    // reader may hold it)
    if (keptMaps.size >= 2) {
      val latest = keptMaps.last
      latest.foreach { case (name, vdir) =>
        if (vdir != name &&
            keptMaps.init.forall(m => m.get(name).exists(_ != name))) {
          val legacy = new Path(s"$root/$name")
          if (fs.exists(legacy) && agedOut(fs, legacy, grace))
            fs.delete(legacy, true): Unit
        }
      }
    }
  }

  /** Delete the increment directories every in-grace snapshot prunes:
    * batch id at or below the OLDEST kept generation's watermark. Called
    * by folds and by [[StreamingAnn]]-style reclusters after their
    * promote; deferred deletion is what lets a reader of the previous
    * base keep unioning the increments that base has not folded. */
  private[graft] def gcIncrements(spark: SparkSession, root: String,
                                  baseName: String = "base"): Unit = {
    val fs = fsFor(spark, root)
    val grace = graceMs(spark)
    val incDir = new Path(s"$root/increments")
    if (!fs.exists(incDir)) return
    val dir = new Path(s"$root/$PtrDir")
    val ids =
      if (fs.exists(dir)) {
        val all = fs.listStatus(dir).map(_.getPath.getName)
          .filter(n => n.startsWith("p") && n.drop(1).forall(_.isDigit))
          .map(_.drop(1).toLong).sorted
        // same kept set as gcVersions: last two plus any in-grace pointer
        // (its snapshot still needs the increments above ITS watermark)
        val last2 = all.takeRight(2).toSet
        all.filter(i => last2(i) ||
          !agedOut(fs, new Path(dir, ptrName(i)), grace))
      } else Array.empty[Long]
    def wmOfGen(id: Long): Long = {
      val in = fs.open(new Path(dir, ptrName(id)))
      val m = try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).map { l =>
          val Array(k, v) = l.split("\t", 2); k -> v
        }.toMap
      finally in.close()
      m.get(baseName)
        .map(d => readWm(fs, new Path(s"$root/$d")))
        .getOrElse(legacyWm)
    }
    def legacyWm: Long = {
      val legacy = new Path(s"$root/$baseName")
      if (fs.exists(legacy)) readWm(fs, legacy) else -1L
    }
    val horizon: Long =
      if (ids.isEmpty) legacyWm // unversioned root: legacy base (if any)
                                // is the only snapshot anyone can hold
      else {
        val gens = ids.map(wmOfGen).min
        // with fewer than two generations the legacy layout (if any) is
        // still in grace
        val legacy = new Path(s"$root/$baseName")
        if (ids.length < 2 && fs.exists(legacy)) math.min(legacyWm, gens)
        else gens
      }
    incrementIds(spark, root).filter(_ <= horizon).foreach { b =>
      val p = new Path(s"$root/increments/batch=$b")
      if (agedOut(fs, p, grace)) fs.delete(p, true): Unit
    }
    if (fs.listStatus(incDir).isEmpty) fs.delete(incDir, true): Unit
  }

  // ─────────────────────────────── watermarks & signals ──

  /** Max batch id ever folded into `root`'s live base generation; -1 when
    * no fold has happened (or no base exists). Readers prune
    * `batch <= watermark` increment directories; sinks drop replayed
    * landings via [[isFolded]]. One-shot resolution — reads sharing a
    * base scan must take the watermark from the same [[view]]. */
  def foldedWatermark(spark: SparkSession, root: String,
                      baseName: String = "base"): Long =
    view(spark, root).watermark(baseName)

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

  /** Stamp a freshly-written uncommitted sibling (e.g. a recluster's
    * `base_new`) with the watermark it subsumes, BEFORE it is promoted —
    * the stamp travels with the directory through the promote,
    * atomically. */
  private[graft] def stampWatermark(spark: SparkSession, dir: String,
                                    wm: Long): Unit =
    writeWm(fsFor(spark, dir), new Path(dir), wm)

  /** Batch ids of the increment directories currently under `root`
    * (live AND folded-but-in-grace — see [[incrementCount]] for the
    * trigger signal, which counts live only). */
  private[graft] def incrementIds(spark: SparkSession, root: String): Seq[Long] = {
    val fs = fsFor(spark, root)
    val incDir = new Path(s"$root/increments")
    if (!fs.exists(incDir)) Nil
    else fs.listStatus(incDir).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong).toSeq.sorted
  }

  /** Count of LIVE increment directories under `root` (batch id above the
    * current base's watermark) — the trigger signal every family's
    * `compact*IfNeeded` gate reads. Folded-but-in-grace directories are
    * excluded: they are already pruned by every current reader and would
    * otherwise re-trigger a no-op fold each call. */
  def incrementCount(spark: SparkSession, root: String,
                     baseName: String = "base"): Int = {
    val wm = foldedWatermark(spark, root, baseName)
    incrementIds(spark, root).count(_ > wm)
  }

  // ─────────────────────────────── maintenance ops ──

  /** Checked rename: Hadoop's rename reports failure as a boolean (dest
    * exists, source missing, FS error) — fail fast instead. */
  private def mv(fs: FileSystem, src: Path, dst: Path): Unit = {
    require(!fs.exists(dst), s"maintenance swap: $dst already exists")
    require(fs.rename(src, dst), s"maintenance swap: rename $src -> $dst failed")
  }

  /** Converge debris of the PRE-versioning rename-swap fold (`base_old` /
    * `base_compact`) left by an upgrade mid-crash; versioned folds never
    * create these states. Crash matrix: `base_old` with `base` present →
    * the new base was live, drop the old copy; `base_old` alone → it IS
    * the only copy, restore it; any `base_compact` → an unpromoted
    * write-aside, discard (its increments are intact and refold). */
  private[graft] def recover(spark: SparkSession, root: String,
                             baseName: String = "base"): Unit = {
    val fs = fsFor(spark, root)
    val base = new Path(s"$root/$baseName")
    val old = new Path(s"$root/${baseName}_old")
    val compact = new Path(s"$root/${baseName}_compact")
    if (fs.exists(old)) {
      if (fs.exists(base)) {
        fs.delete(old, true)
      } else {
        require(fs.rename(old, base),
          s"compaction recover: rename $old -> $base failed")
      }
    }
    if (fs.exists(compact)) fs.delete(compact, true): Unit
  }

  /** Fold the current increments of the artifact rooted at `root` into a
    * NEW base generation. `fold(basePath, incrementPaths)` builds the
    * merged frame (basePath is None when no base exists yet);
    * `write(df, outPath)` materializes it with the family's layout.
    * The new generation commits via the pointer; the previous generation
    * and the increments it still needs survive one grace round for
    * in-flight readers. Returns the number of increment directories
    * folded (0 = nothing to do — GC may still have reaped out-of-grace
    * debris). */
  def foldIncrements(spark: SparkSession, root: String,
                     baseName: String = "base")
                    (fold: (Option[String], Seq[String]) => DataFrame)
                    (write: (DataFrame, String) => Unit): Int =
    withWriteLease(spark, root) {
      val fs = fsFor(spark, root)
      // converge any pre-versioning debris before trusting the layout
      recoverPromote(spark, root)
      recover(spark, root, baseName)
      val v = view(spark, root)
      val basePath = v.dir(baseName)
      val wm = v.watermark(baseName)
      val fresh = incrementIds(spark, root).filter(_ > wm)
      if (fresh.isEmpty) {
        gcVersions(spark, root)
        gcIncrements(spark, root, baseName)
        0
      } else graft.ops.Jobs.labeled(spark, s"fold $root/$baseName") {
        // the shared FileStatusCache may hold listings from earlier reads
        // of these paths (a restated increment rewrites its part files
        // under the same directory) — refresh before folding
        spark.catalog.refreshByPath(root)
        val gen = nextGenId(fs, root)
        val outDir = s"$root/${baseName}_v$gen"
        fs.delete(new Path(outDir), true) // uncommitted leftover of a crash
        write(fold(basePath, fresh.map(b => s"$root/increments/batch=$b")),
          outDir)
        writeWm(fs, new Path(outDir), math.max(wm, fresh.max))
        commitPointer(spark, root, Map(baseName -> s"${baseName}_v$gen"), gen)
        gcVersions(spark, root)
        gcIncrements(spark, root, baseName)
        spark.catalog.refreshByPath(root)
        fresh.size
      }
    }

  /** Rewrite the live base generation WITHOUT folding increments — the
    * vacuum arm: physically removing tombstoned rows when no data
    * increments are pending (a pure deletion campaign would otherwise
    * never rewrite the base). The folded watermark is preserved verbatim —
    * a vacuum folds nothing, so it must not change which increment
    * directories readers prune. No-op when no base exists. */
  private[graft] def rewriteBase(spark: SparkSession, root: String,
                                 baseName: String = "base")
                                (transform: DataFrame => DataFrame)
                                (write: (DataFrame, String) => Unit): Unit =
    withWriteLease(spark, root) {
      val fs = fsFor(spark, root)
      recoverPromote(spark, root)
      recover(spark, root, baseName)
      val v = view(spark, root)
      v.dir(baseName).foreach { basePath => graft.ops.Jobs.labeled(spark,
          s"vacuum $root/$baseName") {
        val wm = v.watermark(baseName)
        spark.catalog.refreshByPath(root)
        val gen = nextGenId(fs, root)
        val outDir = s"$root/${baseName}_v$gen"
        fs.delete(new Path(outDir), true)
        write(transform(spark.read.parquet(basePath)), outDir)
        writeWm(fs, new Path(outDir), wm)
        commitPointer(spark, root, Map(baseName -> s"${baseName}_v$gen"), gen)
        gcVersions(spark, root)
        gcIncrements(spark, root, baseName)
        spark.catalog.refreshByPath(root)
      } }
    }

  /** Atomically publish `$root/<name>_new` as the live generation of
    * every name, in ONE pointer commit — the recluster/retrain flip where
    * several directories must move together (fresh centroids routing over
    * old posting lists silently degrades every search). The `_new`
    * payload dirs are renamed to their `_v<K>` generation names (invisible
    * to readers — nothing references them yet), then the pointer commit
    * makes the whole set live at once. A crash before the commit leaves
    * uncommitted garbage for GC; after it, the new set is fully live.
    * The previous generation survives one grace round. Callers relying on
    * increments being subsumed stamp the new base's watermark BEFORE
    * calling ([[stampWatermark]]) and run [[gcIncrements]] after. */
  private[graft] def promote(spark: SparkSession, root: String,
                             names: Seq[String]): Unit =
    withWriteLease(spark, root) { promoteHeld(spark, root, names) }

  /** [[promote]]'s body for a caller ALREADY holding this root's write
    * lease (nested acquisition on one root fails fast by design —
    * [[graft.sim.GraphAnnIndex.rebuildIndex]] flips the edges root while
    * serializing the whole rebuild on that same root's lease). */
  private[graft] def promoteHeld(spark: SparkSession, root: String,
                                 names: Seq[String]): Unit = {
      require(names.nonEmpty, "promote needs at least one directory name")
      val fs = fsFor(spark, root)
      // converge any PRE-VERSIONING interrupted promote, but keep the _new
      // dirs — they are this call's freshly-written payload
      recoverPromote(spark, root, dropUncommittedNew = false)
      names.foreach { n =>
        require(fs.exists(new Path(s"$root/${n}_new")),
          s"promote: $root/${n}_new is missing")
      }
      val gen = nextGenId(fs, root)
      names.foreach { n =>
        val dst = new Path(s"$root/${n}_v$gen")
        fs.delete(dst, true) // uncommitted leftover of a crash
        mv(fs, new Path(s"$root/${n}_new"), dst)
      }
      commitPointer(spark, root,
        names.map(n => n -> s"${n}_v$gen").toMap, gen)
      gcVersions(spark, root)
  }

  /** Converge an interrupted PRE-VERSIONING [[promote]] (the
    * `_promote_pending` marker protocol): marker present → roll FORWARD
    * (finish each name's swap, delete `_old` dirs and the marker); marker
    * absent → roll BACK (leftover `_new` dirs from a pre-commit crash are
    * discarded unless `dropUncommittedNew` is false — [[promote]] passes
    * false because the `_new` dirs are its own payload). `_old` dirs with
    * no marker are NEVER touched here: `<base>_old` may belong to an
    * interrupted legacy fold swap, whose [[recover]] is the one that
    * knows whether it is the only live copy. */
  private[graft] def recoverPromote(spark: SparkSession, root: String,
                                    dropUncommittedNew: Boolean = true): Unit = {
    val fs = fsFor(spark, root)
    val marker = new Path(s"$root/_promote_pending")
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
