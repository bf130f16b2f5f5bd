package graft

/** The one recursive-delete helper — previously re-implemented in three
  * places (streaming drains, the refresh scratch sweep, RefDocsBench), so a
  * hardening (symlink handling, retry) would have had to land three times.
  * Swallows every error: all callers are best-effort scratch cleanup where a
  * failed delete must never fail the work that produced the data. */
object FsUtil {
  def deleteRecursively(p: java.nio.file.Path): Unit = {
    try {
      // list children only for REAL directories: following a symlink here
      // would delete through it into the target tree
      if (java.nio.file.Files.isDirectory(p,
          java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
        val s = java.nio.file.Files.list(p)
        try {
          val it = s.iterator()
          while (it.hasNext) deleteRecursively(it.next())
        } finally s.close()
      }
      java.nio.file.Files.deleteIfExists(p)
    } catch { case _: Throwable => () }
  }
}
