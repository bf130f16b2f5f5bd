package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
 *
 * `queries` aggregates every implemented operator's declared query; `oracleSql` holds the
 * DuckDB-equivalent ANSI SQL for each (omitted only for non-SQL-expressible operators,
 * which then get a rows-only check).
 */
object SparkEntry {

  /** Flagship pipeline on /root/testdata/sf0.001 — the engine's signature path:
    * partition_text → classifier cascade → chunk_by_title fold. Driver
    * smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_chunk_by_title")(spark, "/root/testdata/sf0.001")

  private val groups: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (graft.queries.RelationalQueries.queries, graft.queries.RelationalQueries.oracles),
      (graft.queries.TextQueries.queries, graft.queries.TextQueries.oracles),
      (graft.queries.AnalysisQueries.queries, graft.queries.AnalysisQueries.oracles),
      (graft.queries.CorpusQueries.queries, graft.queries.CorpusQueries.oracles),
      (graft.queries.PipelineQueries.queries, graft.queries.PipelineQueries.oracles),
      (graft.queries.SourceQueries.queries, graft.queries.SourceQueries.oracles),
      (graft.queries.FormatQueries.queries, graft.queries.FormatQueries.oracles),
      (graft.queries.BinaryFormatQueries.queries, graft.queries.BinaryFormatQueries.oracles),
      (graft.queries.LayoutQueries.queries, graft.queries.LayoutQueries.oracles))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.map(_._1).reduce(_ ++ _)

  /** DuckDB-runnable twin for each query (same column names, same ordering). */
  def oracleSql: Map[String, String] =
    groups.map(_._2).reduce(_ ++ _)
}
