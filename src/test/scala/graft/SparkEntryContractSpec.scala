package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * The driver contract's INTERNAL consistency, pinned: the correctness gate
 * hash-compares Verify output against `oracleSql` per query name, so a
 * missing oracle silently downgrades a query to a rows-only check, an
 * orphan oracle is dead weight that can mask a renamed query, and a
 * duplicate name across the query modules silently SHADOWS one
 * implementation with another (Map ++ keeps the right-most) — all three
 * are the kind of wiring rot a 219-row gate accumulates without a tripwire.
 */
class SparkEntryContractSpec extends AnyFunSuite {

  test("every declared query has a DuckDB oracle, and no oracle is orphaned") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val missing = (q -- o).toSeq.sorted
    val orphaned = (o -- q).toSeq.sorted
    assert(missing.isEmpty,
      s"queries without an oracle (rows-only check — declare or justify): $missing")
    assert(orphaned.isEmpty, s"oracles without a query: $orphaned")
  }

  test("no query name is declared twice across the query modules") {
    val perModule = Seq(
      graft.queries.RelationalQueries.queries,
      graft.queries.TextQueries.queries,
      graft.queries.AnalysisQueries.queries,
      graft.queries.CorpusQueries.queries,
      graft.queries.PipelineQueries.queries,
      graft.queries.SourceQueries.queries,
      graft.queries.FormatQueries.queries,
      graft.queries.BinaryFormatQueries.queries,
      graft.queries.LayoutQueries.queries)
    val all = perModule.flatMap(_.keys)
    val dups = all.groupBy(identity).filter(_._2.size > 1).keys.toSeq.sorted
    assert(dups.isEmpty, s"query names declared in more than one module: $dups")
    assert(all.size == SparkEntry.queries.size)
  }

  test("every oracle is non-empty SQL mentioning a FROM clause") {
    val weird = SparkEntry.oracleSql.filter { case (_, sql) =>
      sql.trim.isEmpty || !sql.toUpperCase.contains("FROM")
    }.keys.toSeq.sorted
    assert(weird.isEmpty, s"suspicious oracle SQL for: $weird")
  }
}
