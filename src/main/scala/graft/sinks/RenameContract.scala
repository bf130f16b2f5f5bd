package graft.sinks

/**
 * The durable sinks' filesystem contract, made explicit and enforced.
 *
 * [[ElementLake]]'s compaction swap (two renames with a recovery state
 * machine), its lock takeover (rename-consume of a stale lease), and
 * [[StageStore]]'s marker-last commit all assume `FileSystem.rename` is
 * ATOMIC and O(1) — true on HDFS-like stores, FALSE on object stores
 * (s3a/gs/abfs emulate rename as copy+delete: non-atomic, a reader can see
 * a half-moved directory, and two racing "renames" of the same lock file
 * can BOTH appear to succeed). Running the lake on such a store would not
 * fail loudly; it would silently lose the exact crash/concurrency
 * guarantees the protocol exists to provide. So construction/entry points
 * check the scheme against stores known to provide single-object atomic
 * rename and reject everything else with an error naming this contract.
 *
 * Escape hatch: set `graft.lake.unsafe.allowNonAtomicRename=true` in the
 * Hadoop configuration to run anyway (sensible for a single-writer job on
 * an object store where the concurrency windows are provably unoccupied,
 * or behind an external lock service) — the override is deliberately
 * spelled "unsafe".
 */
object RenameContract {

  /** Hadoop-conf boolean that waives the atomic-rename requirement. */
  val OverrideKey = "graft.lake.unsafe.allowNonAtomicRename"

  /** Schemes whose `rename` is a single atomic namespace operation:
    * local POSIX, HDFS and its proxies, Ozone's Hadoop adapters, Alluxio.
    * Object stores (s3a, s3n, gs, wasb/abfs, oss, cos, swift, …) are
    * deliberately absent — rename there is copy+delete. */
  private val AtomicRenameSchemes =
    Set("file", "hdfs", "viewfs", "webhdfs", "swebhdfs", "ofs", "o3fs", "alluxio")

  /** Throw unless `fs` is known to give atomic rename (or the unsafe
    * override is set). `component` names the caller in the error. */
  def requireAtomicRename(fs: org.apache.hadoop.fs.FileSystem,
      conf: org.apache.hadoop.conf.Configuration, component: String): Unit = {
    val scheme = Option(fs.getUri.getScheme).getOrElse("file")
      .toLowerCase(java.util.Locale.ROOT)
    if (!AtomicRenameSchemes.contains(scheme) &&
        !conf.getBoolean(OverrideKey, false))
      throw new IllegalStateException(
        s"$component requires a filesystem with ATOMIC rename (its " +
          "compaction swap / lock lease / marker-last commit protocols are " +
          s"built on it), but scheme '$scheme' is not known to provide one " +
          "— object stores emulate rename as copy+delete, which silently " +
          "voids the crash and concurrency guarantees. Use an HDFS-like " +
          s"store (${AtomicRenameSchemes.toSeq.sorted.mkString("/")}), or " +
          s"set $OverrideKey=true to accept the risk explicitly.")
  }
}
