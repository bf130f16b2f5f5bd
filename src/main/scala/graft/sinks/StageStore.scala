package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Durable stage materializer for multi-stage pipelines (the
 * [[graft.functions.CorpusOps.crawlRefresh]] `materialize` seam): each
 * stage's survivor set lands as parquet under `root/<name>` behind a
 * done-marker, and a pipeline killed between stages RESUMES — completed
 * stages are read back, not recomputed.
 *
 * Protocol (plain parquet + marker, no transaction log needed because each
 * stage has exactly one writer — the pipeline itself):
 *  - `apply(name, df)`: if `root/<name>/_stage_done` exists, the stage is
 *    complete → read it back, skip the compute entirely (the input `df`'s
 *    plan is never executed). Otherwise write `df` to `root/<name>`
 *    (overwrite — a crash mid-write leaves no marker, so the half-written
 *    dir is re-overwritten on resume, never read), then create the marker
 *    LAST. The marker's existence is the only commit signal; parquet files
 *    without it are garbage by definition.
 *  - Stage results are always consumed via the read-back frame, so
 *    downstream lineage roots at the parquet scan — the restart gets the
 *    same plan the first run had.
 *
 * At 100 TB this is the difference between re-running a multi-hour Bloom +
 * near-dup cascade and a directory listing: stage outputs are restart
 * currency. `writes` counts actual computations this store performed —
 * the restart specs pin that a resumed pipeline recomputes only what the
 * crash lost.
 */
final class StageStore(spark: SparkSession, root: String) {

  // marker-last commit leans on the job committer's atomic renames (a
  // half-renamed overwrite with a SURVIVING old marker would be read back
  // as complete) — enforce the contract at construction; see RenameContract
  locally {
    val conf = spark.sessionState.newHadoopConf()
    RenameContract.requireAtomicRename(
      new org.apache.hadoop.fs.Path(root).getFileSystem(conf), conf,
      "StageStore")
  }

  @volatile var writes: Int = 0

  private val DoneMarker = "_stage_done"

  def apply(name: String, df: DataFrame): DataFrame = {
    require(name.matches("[A-Za-z0-9_.-]+"), s"unsafe stage name: $name")
    val dir = new org.apache.hadoop.fs.Path(root, name)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val marker = new org.apache.hadoop.fs.Path(dir, DoneMarker)
    if (!fs.exists(marker)) {
      df.write.mode("overwrite").parquet(dir.toString)
      fs.create(marker, true).close()
      writes += 1
    }
    spark.read.parquet(dir.toString)
  }

  /** Names of stages already committed under this root. */
  def completed(): Seq[String] = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(rootPath)) Nil
    else fs.listStatus(rootPath).toSeq
      .filter(s => s.isDirectory &&
        fs.exists(new org.apache.hadoop.fs.Path(s.getPath, DoneMarker)))
      .map(_.getPath.getName)
  }
}
