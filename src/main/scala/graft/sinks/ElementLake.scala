package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Element

/**
 * The element-lake layout (SURVEY §4.2 "partition pruning" row): persisted
 * element streams are written hive-partitioned by detected filetype so that
 * downstream scans over a 100 TB lake prune whole directories before reading
 * a byte — `partition by filetype` is the reference pipeline's most common
 * WHERE clause (every per-format metric/eval pass starts there).
 *
 * Layout choices, and why:
 *  - partition column `p_filetype` is a COPY of `metadata.filetype` (null →
 *    "unknown"): the sparse metadata struct stays intact in the data files,
 *    so reads need no reconstruction and the schema equals the wire schema;
 *  - file-level distribution is `repartition(p_filetype, doc_id)` — one
 *    filetype maps to MANY tasks (no single-writer bottleneck per format,
 *    no small-file explosion from per-doc writers);
 *  - rows sort by `(p_filetype, doc_id, seq)` within each task — leading
 *    with the partition column satisfies FileFormatWriter's required
 *    ordering EXPLICITLY (it would otherwise insert its own sort by
 *    p_filetype alone, and the per-file (doc_id, seq) order would rest on
 *    that sort's stability, which is not a contract), so a per-doc reader
 *    streams elements in reading order without a shuffle.
 */
object ElementLake {

  val PartitionCol = "p_filetype"
  val UnknownFiletype = "unknown"

  def write(ds: Dataset[Element], path: String): Unit = {
    checkRenameContract(ds.sparkSession, path)
    writeMode(ds, path, "overwrite")
  }

  /** The lake's protocols (compaction swap, lock lease, crash recovery —
    * all reachable from every read/write entry point) are built on atomic
    * rename; see [[RenameContract]]. */
  private def checkRenameContract(spark: SparkSession, path: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    RenameContract.requireAtomicRename(
      new org.apache.hadoop.fs.Path(path).getFileSystem(conf), conf,
      "ElementLake")
  }

  /** Append a new slice (a micro-batch, an incremental ingest) into the same
    * layout — the partition directories accumulate files. Runs crash recovery
    * first (see [[recoverIfCrashed]]) so a compaction that died mid-swap
    * never leaves the slice landing beside a stranded partition. */
  def append(ds: Dataset[Element], path: String): Unit = {
    recoverIfCrashed(ds.sparkSession, path)
    writeMode(ds, path, "append")
  }

  private def writeMode(ds: Dataset[Element], path: String, mode: String): Unit =
    ds.toDF()
      .withColumn(PartitionCol,
        coalesce(col("metadata.filetype"), lit(UnknownFiletype)))
      .repartition(col(PartitionCol), col("doc_id"))
      .sortWithinPartitions(PartitionCol, "doc_id", "seq")
      .write.mode(mode).partitionBy(PartitionCol).parquet(path)

  /** Full-lake read; `p_filetype` is dropped (the data files carry the real
    * `metadata.filetype`, nulls included). */
  def read(spark: SparkSession, path: String): Dataset[Element] =
    scanDf(spark, path, Nil).drop(PartitionCol).as(Encoders.product[Element])

  /** Pruned read: only the named filetypes' directories are listed and
    * scanned — the filter lands in `PartitionFilters`, not post-scan. */
  def scan(spark: SparkSession, path: String, filetypes: Seq[String]): Dataset[Element] =
    scanDf(spark, path, filetypes).drop(PartitionCol).as(Encoders.product[Element])

  private def scanDf(spark: SparkSession, path: String,
      filetypes: Seq[String]): DataFrame = {
    recoverIfCrashed(spark, path)
    val df = spark.read.parquet(path)
    if (filetypes.isEmpty) df
    else df.filter(col(PartitionCol).isin(filetypes: _*))
  }

  /** Advisory compaction lock at the lake root: held for the life of a
    * [[compact]] call; read/append-path recovery no-ops while a LIVE lock
    * exists so recovery never races an in-flight swap. The lock is a LEASE,
    * not a tombstone: the holder writes `pid=… token=… created_ms=…` into
    * it, and a lock whose filesystem mtime is older than the lease age is
    * presumed to belong to a crashed compactor — the next [[compact]] takes
    * it over (the stale lock is CONSUMED by an atomic rename to a
    * token-unique tombstone, so of N racing takers exactly one wins; atomic
    * re-create then gates the new lock), and read/append recovery treats it
    * as absent. Size the lease
    * above the longest plausible partition rewrite: a hung-but-alive
    * compactor past its lease can be overtaken, the inherent lease trade. */
  val LockName = "_graft_compact.lock"

  /** Default lock lease: a compactor silent this long is presumed dead. */
  val DefaultLockLeaseMs: Long = 15L * 60 * 1000

  private val SnapshotManifest = "_compact_snapshot"

  /**
   * Crash recovery for a compaction that died mid-flight, callable from any
   * path (compact itself, [[append]], reads). No-ops when [[LockName]] is
   * present — the dirs then belong to a LIVE compaction, not a crashed one
   * (a reader racing the lock's creation can still slip through; the lock is
   * advisory, which is as strong as a plain parquet lake gets). States, by
   * what survived (`old` = `.compact_old_<name>`, `live` = the partition
   * dir, `tmp` = `.compact_tmp_<name>`):
   *
   *  - live missing, old present — died between the two swap renames: old is
   *    authoritative, restore it;
   *  - live present WITH the `_compact_snapshot` manifest, old present — the
   *    swap landed but cleanup didn't finish: files in old NOT named by the
   *    manifest are appends that raced the rewrite window (the first rename
   *    carried them aside with the snapshot); move them into live, drop old;
   *  - live present WITHOUT the manifest, old present — a concurrent append
   *    recreated live mid-swap and the land failed: live holds only those
   *    fresh appends, so ALL of old's files move in (part-file names are
   *    UUID-unique across jobs — no collisions), then old drops;
   *  - any `tmp` — an unlanded rewrite, always garbage.
   */
  def recoverIfCrashed(spark: SparkSession, path: String): Unit = {
    checkRenameContract(spark, path)
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return
    // a lock within its lease belongs to a live compaction — stand down; a
    // stale one is a crash remnant and must not block recovery forever (the
    // lock itself is left for the next compact()'s takeover to consume)
    val lockAlive =
      try System.currentTimeMillis() - fs.getFileStatus(
        new org.apache.hadoop.fs.Path(root, LockName)).getModificationTime <=
        DefaultLockLeaseMs
      catch { case _: java.io.FileNotFoundException => false }
    if (lockAlive) return
    recoverInner(fs, root)
  }

  /** The recovery walk itself, lock-check-free — [[compact]] calls this while
    * HOLDING the lock (the dirs it finds then are a prior crash's, since the
    * lock guarantees no other live compaction). */
  private def recoverInner(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Unit = {
    val entries = fs.listStatus(root).toSeq
    if (!entries.exists(_.getPath.getName.startsWith(".compact_"))) return
    entries.filter(s => s.isDirectory &&
        s.getPath.getName.startsWith(".compact_old_"))
      .foreach { old =>
        val live = new org.apache.hadoop.fs.Path(root,
          old.getPath.getName.stripPrefix(".compact_old_"))
        if (!fs.exists(live)) {
          require(fs.rename(old.getPath, live),
            s"compact recovery: cannot restore stranded partition ${old.getPath}")
        } else {
          val manifest = new org.apache.hadoop.fs.Path(live, SnapshotManifest)
          val snapshot: Set[String] =
            if (fs.exists(manifest)) readManifest(fs, manifest) else Set.empty
          mergeInto(fs, old.getPath, live, excluding = snapshot)
          fs.delete(old.getPath, true)
          fs.delete(manifest, false)
        }
      }
    entries.filter(s => s.isDirectory &&
        s.getPath.getName.startsWith(".compact_tmp_"))
      .foreach(t => fs.delete(t.getPath, true))
    // a completed compact whose crash hit after old was dropped but before
    // the manifest was — the manifest is read-invisible (underscore) but
    // should not accumulate
    entries.filter(s => s.isDirectory &&
        s.getPath.getName.startsWith(s"$PartitionCol="))
      .foreach { d =>
        fs.delete(new org.apache.hadoop.fs.Path(d.getPath, SnapshotManifest), false)
      }
  }

  private def readManifest(fs: org.apache.hadoop.fs.FileSystem,
      manifest: org.apache.hadoop.fs.Path): Set[String] = {
    val in = fs.open(manifest)
    try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8).linesIterator
      .filter(_.nonEmpty).toSet
    finally in.close()
  }

  /** Move every part-file of `src` not named in `excluding` into `dst`. */
  private def mergeInto(fs: org.apache.hadoop.fs.FileSystem,
      src: org.apache.hadoop.fs.Path, dst: org.apache.hadoop.fs.Path,
      excluding: Set[String]): Unit =
    fs.listStatus(src).toSeq
      .filter(f => f.isFile && f.getPath.getName.startsWith("part-") &&
        !excluding.contains(f.getPath.getName))
      .foreach { f =>
        require(fs.rename(f.getPath,
          new org.apache.hadoop.fs.Path(dst, f.getPath.getName)),
          s"compact: cannot carry ${f.getPath} into $dst")
      }

  /**
   * Small-file compaction: every [[append]] (one per micro-batch of a
   * long-lived [[graft.streaming.StreamingOps.ingestToLake]] stream) lands a
   * new file set in each touched partition directory, so file counts grow
   * unbounded with stream lifetime — the classic lake small-file problem
   * (NameNode/listing pressure, per-file open cost dominating scans).
   *
   * Any `p_filetype=…` directory holding more than `maxFilesPerPartition`
   * parquet files is rewritten to `ceil(bytes / targetFileBytes)` files
   * (128 MB default — a healthy scan-task size), range-distributed AND
   * sorted by `(doc_id, seq)`, so the per-doc reading-order contract the
   * writer establishes survives compaction and doc ranges never straddle
   * more files than they must.
   *
   * Durability/concurrency contract (this is a parquet lake, not a
   * transaction log):
   *  - one compactor at a time: an advisory [[LockName]] file is created
   *    atomically at the root and held for the call; a second concurrent
   *    compact() fails fast instead of double-swapping — unless the lock is
   *    older than `lockLeaseMs` (holder presumed crashed), in which case it
   *    is taken over, recovery runs under the new lock, and release is
   *    token-checked so the overtaken holder's finally cannot delete the
   *    new holder's lock; the swap itself is epoch-fenced — the canonical
   *    lock is re-read immediately before each of the two renames, so a
   *    compactor displaced mid-rewrite ABORTS (restoring the partition it
   *    had moved aside) instead of landing stale files on the successor's
   *    work;
   *  - the rewrite is per-partition read(snapshot) → temp dir → two renames
   *    (old aside, new in place) → carry late appends over → delete old.
   *    Readers racing the swap see the old or the new file set, both
   *    complete;
   *  - appends landing DURING the rewrite window are not lost: the first
   *    rename carries them aside inside `.compact_old_`, and the
   *    `_compact_snapshot` manifest (written into the rewrite before the
   *    swap) names exactly the files the rewrite covered, so everything
   *    else moves into the new live dir before old is dropped;
   *  - if the land rename fails because a concurrent append recreated the
   *    live dir mid-swap, the partition self-heals: old's files merge back
   *    into live (UUID part names — no collisions), the rewrite is
   *    abandoned, and the partition is skipped this pass;
   *  - a crash anywhere leaves a state [[recoverIfCrashed]] maps back to a
   *    complete partition — and recovery runs from [[append]] and the read
   *    paths too, so no window waits for the next compact() call.
   * Returns the rewritten partition directory names.
   */
  def compact(spark: SparkSession, path: String,
      maxFilesPerPartition: Int = 8,
      targetFileBytes: Long = 128L << 20,
      lockLeaseMs: Long = DefaultLockLeaseMs): Seq[String] =
    compactImpl(spark, path, maxFilesPerPartition, targetFileBytes, _ => (),
      lockLeaseMs)

  /** [[compact]] with a test seam invoked between a partition's rewrite and
    * its swap — how the concurrent-append specs stage writes into the exact
    * race window deterministically. */
  private[graft] def compactImpl(spark: SparkSession, path: String,
      maxFilesPerPartition: Int, targetFileBytes: Long,
      beforeSwap: String => Unit,
      lockLeaseMs: Long = DefaultLockLeaseMs,
      betweenRenames: String => Unit = _ => ()): Seq[String] = {
    checkRenameContract(spark, path)
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return Nil
    val lock = new org.apache.hadoop.fs.Path(root, LockName)
    // best-effort sweep of EXPIRED takeover/release tombstones: when
    // restoreLock exhausts its attempts, a displaced peer's lock content is
    // stranded as `_graft_compact.lock.{takeover,release}.<token>`; once
    // older than the lease it is evidence of a long-dead actor, not anything
    // live, and nothing else ever deletes it — sweep here so failed restores
    // cannot accumulate in the lake root. Fresh tombstones are left alone
    // (their owner may still be mid-restore).
    try fs.listStatus(root).toSeq
      .filter { s =>
        val n = s.getPath.getName
        s.isFile &&
          (n.startsWith(s"$LockName.takeover.") ||
            n.startsWith(s"$LockName.release.")) &&
          System.currentTimeMillis() - s.getModificationTime > lockLeaseMs
      }
      .foreach(s => fs.delete(s.getPath, false))
    catch { case _: java.io.IOException => () }
    // the lock carries holder identity: pid/created for diagnostics, token
    // so release only ever deletes OUR lock (a post-takeover holder's lock
    // must survive the overtaken compactor's finally block)
    val token = java.util.UUID.randomUUID().toString
    def tryAcquire(): Boolean =
      try {
        val s = fs.create(lock, false)
        s.write((s"pid=${ProcessHandle.current().pid()} token=$token " +
          s"created_ms=${System.currentTimeMillis()}\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        s.close()
        true
      } catch { case _: java.io.IOException => false }
    def contentOf(p: org.apache.hadoop.fs.Path): String =
      try {
        val in = fs.open(p)
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8).trim
        finally in.close()
      } catch { case _: Exception => "" }
    def lockContent(): String = contentOf(lock)
    if (!tryAcquire()) {
      // holder crashed? the lease is judged on filesystem mtime, not the
      // holder's self-reported clock
      val staleOrGone =
        try System.currentTimeMillis() -
          fs.getFileStatus(lock).getModificationTime > lockLeaseMs
        catch { case _: java.io.FileNotFoundException => true }
      if (!staleOrGone) throw new IllegalStateException(
        s"compact: a live compaction holds $lock (${lockContent()}); " +
          s"takeover only after ${lockLeaseMs} ms of silence")
      // consume the stale lock ATOMICALLY by renaming it to a token-unique
      // tombstone: of N racing takers exactly one rename succeeds.
      // delete-then-create was a double-acquire: taker B's delete could
      // remove taker A's FRESHLY CREATED lock and both would compact. If
      // our rename instead grabbed a lock a faster peer already re-created
      // (src was live again), the preserved mtime exposes it: restore and
      // lose the race. (Residual: the restored lock is briefly absent — a
      // third taker slipping a create() into that window strands the peer;
      // microseconds and three actors, vs the old two-actor macro race.)
      val tomb = new org.apache.hadoop.fs.Path(root, s"$LockName.takeover.$token")
      val consumed =
        try fs.rename(lock, tomb) catch { case _: java.io.IOException => false }
      if (consumed) {
        val grabbedLive =
          try System.currentTimeMillis() -
            fs.getFileStatus(tomb).getModificationTime <= lockLeaseMs
          catch { case _: java.io.FileNotFoundException => false }
        if (grabbedLive) {
          restoreLock(fs, tomb, lock)
          throw new IllegalStateException(
            s"compact: lost the takeover race for $lock — a peer already " +
              "re-created it")
        }
        fs.delete(tomb, false)
      }
      // whether we consumed the stale lock or a peer did, atomic
      // create(false) stays the final gate
      if (!tryAcquire()) throw new IllegalStateException(
        s"compact: lost the takeover race for stale $lock (now ${lockContent()})")
    }
    try {
      // recovery BEFORE anything else — under our lock, so any .compact_*
      // dirs found are a prior crash's, never a live peer's
      recoverInner(fs, root)
      val partDirs = fs.listStatus(root).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$PartitionCol="))
      partDirs.flatMap { d =>
        val parts = fs.listStatus(d.getPath).toSeq
          .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
        if (parts.size <= maxFilesPerPartition) None
        else {
          val snapshot = parts.map(_.getPath.getName).toSet
          val bytes = parts.map(_.getLen).sum
          val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
          val name = d.getPath.getName
          // the lease token is stamped into the rewrite dir's name: a
          // displaced compactor's tmp is then attributable at a glance, and
          // can never be mistaken for (or collide with) the dir a takeover
          // successor is writing for the same partition. Recovery deletes
          // any `.compact_tmp_*` regardless of suffix.
          val tmp = new org.apache.hadoop.fs.Path(root, s".compact_tmp_$name.$token")
          val old = new org.apache.hadoop.fs.Path(root, s".compact_old_$name")
          // epoch fence: verify the canonical lock still carries OUR token
          // immediately before each of the two swap renames — a compactor
          // that outlived its lease and was taken over must not land its
          // swap on top of the successor's work.
          def fenceOrNull(stage: String): String = {
            val held = lockContent()
            if (held.contains(s"token=$token")) null
            else s"compact: lease lost before $stage for $name — " +
              s"$LockName now reads '$held'; aborting the swap"
          }
          // read ONLY the snapshot files, not "whatever is in the dir by
          // scan time" — the late-append carry-over below is exact only if
          // the rewrite and the manifest cover the same file set
          spark.read.parquet(parts.map(_.getPath.toString): _*)
            .repartitionByRange(nFiles, col("doc_id"), col("seq"))
            .sortWithinPartitions("doc_id", "seq")
            .write.mode("overwrite").parquet(tmp.toString)
          val manifestOut = fs.create(
            new org.apache.hadoop.fs.Path(tmp, SnapshotManifest), true)
          manifestOut.write(snapshot.toSeq.sorted.mkString("\n")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          manifestOut.close()
          beforeSwap(name)
          val fence1 = fenceOrNull("the aside rename")
          if (fence1 != null) {
            // nothing has moved yet: drop our rewrite and stop compacting —
            // every remaining partition belongs to the successor now
            fs.delete(tmp, true)
            throw new IllegalStateException(fence1)
          }
          require(fs.rename(d.getPath, old), s"compact: cannot move $name aside")
          betweenRenames(name)
          val fence2 = fenceOrNull("the land rename")
          if (fence2 != null) {
            // displaced INSIDE the swap window: the successor's recovery may
            // already be restoring old → live, so ours is best-effort (one
            // of the two renames wins, both produce a complete live dir)
            if (!fs.exists(d.getPath)) {
              try fs.rename(old, d.getPath)
              catch { case _: java.io.IOException => () }
            }
            fs.delete(tmp, true)
            throw new IllegalStateException(fence2)
          }
          val landed =
            try fs.rename(tmp, d.getPath)
            catch { case _: java.io.IOException => false }
          if (!landed) {
            // a concurrent append recreated the live dir inside the swap
            // window (or the rename failed outright). Self-heal: abandon the
            // rewrite, merge the complete old file set back into live.
            if (!fs.exists(d.getPath)) {
              require(fs.rename(old, d.getPath),
                s"compact: cannot land $name and cannot roll back — restore .compact_old_$name manually")
            } else {
              mergeInto(fs, old, d.getPath, excluding = Set.empty)
              fs.delete(old, true)
            }
            fs.delete(tmp, true)
            None
          } else {
            // carry appends that raced the rewrite window: the first rename
            // moved them aside along with the snapshot files
            mergeInto(fs, old, d.getPath, excluding = snapshot)
            fs.delete(old, true)
            fs.delete(new org.apache.hadoop.fs.Path(d.getPath, SnapshotManifest), false)
            Some(name)
          }
        }
      }
    } finally {
      // release only if the lock is still ours — after a lease takeover the
      // file belongs to the new holder and must survive this finally. The
      // read-then-delete pair had the same TOCTOU as takeover (a taker
      // swapping locks between our read and our delete loses ITS lock), so
      // the delete is a rename-consume too: grab to a token-unique
      // tombstone, verify it is really ours, restore a successor's.
      if (lockContent().contains(s"token=$token")) {
        val tomb = new org.apache.hadoop.fs.Path(root, s"$LockName.release.$token")
        val consumed =
          try fs.rename(lock, tomb) catch { case _: java.io.IOException => false }
        if (consumed) {
          if (contentOf(tomb).contains(s"token=$token")) fs.delete(tomb, false)
          else restoreLock(fs, tomb, lock)
        }
      }
    }
  }

  /** Put a CONSUMED-by-mistake peer lock back at the canonical path. A
    * third party may have created a fresh lock inside the brief absence
    * window — and on LocalFileSystem `fs.rename` is POSIX rename(2), which
    * silently REPLACES an existing destination (HDFS returns false), so the
    * restore must check for an occupant before each attempt rather than
    * trust the rename to fail. If the path stays occupied, LEAVE the
    * tombstone in place — it is the displaced peer's lock content, and
    * deleting it would erase the only evidence of the displacement. The
    * displaced peer is stranded either way (its canonical lock is gone; its
    * own token-checked release will correctly no-op), which is the residual
    * three-actor window an advisory lock without compare-and-swap cannot
    * close — but no code path may DESTROY a peer's live lock content. (The
    * exists-then-rename pair is itself a small TOCTOU against a fourth
    * create; the alternative — blind rename — loses a peer's lock on EVERY
    * occupied restore on local filesystems, strictly worse.) */
  private def restoreLock(fs: org.apache.hadoop.fs.FileSystem,
      tomb: org.apache.hadoop.fs.Path,
      lock: org.apache.hadoop.fs.Path): Unit = {
    var attempts = 0
    var restored = false
    while (!restored && attempts < 5) {
      restored = try !fs.exists(lock) && fs.rename(tomb, lock)
        catch { case _: java.io.IOException => false }
      attempts += 1
      if (!restored && attempts < 5) Thread.sleep(10L << attempts)
    }
  }
}
