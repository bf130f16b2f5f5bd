package graft.plans

import org.apache.spark.sql.graft.{ChunkElementsNode, ChunkPlan}

import graft.SparkSuiteBase
import graft.model.{Element, ElementType}
import graft.operators.{Chunker, ChunkingOptions}

/** The plan-visible chunk operator (SURVEY §7.3): same results as the typed
  * fold, a named node in explain output, one shuffle, and the doc-level
  * filter pushdown rule (§4.2). */
class ChunkPlanSpec extends SparkSuiteBase {

  private def corpus: Seq[Element] = (1 to 6).flatMap { d =>
    Seq(
      Element("", ElementType.Title, s"Section $d", s"doc$d", 1),
      Element("", ElementType.NarrativeText,
        s"First sentence of document $d with some body text.", s"doc$d", 2),
      Element("", ElementType.Title, s"Second section $d", s"doc$d", 3),
      Element("", ElementType.NarrativeText,
        s"Closing sentence for document $d.", s"doc$d", 4))
  }

  private val opts = ChunkingOptions(maxCharacters = 80,
    includeOrigElements = false)

  test("plan-node chunking matches the typed groupByKey fold exactly") {
    val sp = spark
    import sp.implicits._
    val ds = corpus.toDS()
    val viaPlan = ChunkPlan.chunkElements(ds, opts)
      .collect().sortBy(e => (e.doc_id, e.seq)).toSeq
    val viaFold = Chunker.chunkElements(ds, opts)
      .collect().sortBy(e => (e.doc_id, e.seq)).toSeq
    assert(viaPlan == viaFold)
    assert(viaPlan.nonEmpty)
  }

  test("by_title options flow through the node the same way") {
    val sp = spark
    import sp.implicits._
    val o = opts.copy(byTitle = true, combineTextUnderNChars = Some(0))
    val ds = corpus.toDS()
    assert(ChunkPlan.chunkElements(ds, o).collect().sortBy(e => (e.doc_id, e.seq)).toSeq ==
      Chunker.chunkByTitle(ds, o).collect().sortBy(e => (e.doc_id, e.seq)).toSeq)
  }

  test("the chunker appears as a named node with exactly one exchange") {
    val sp = spark
    import sp.implicits._
    val plan = ChunkPlan.chunkElements(corpus.toDS(), opts)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GraftChunkElements"), plan)
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 exchange, plan:\n$plan")
  }

  test("a doc_id filter pushes below the chunk node; other filters stay above") {
    val sp = spark
    import sp.implicits._
    val chunked = ChunkPlan.chunkElements(corpus.toDS(), opts)
    val filtered = chunked
      .filter(e => e.doc_id == "doc2") // typed filter does NOT push (opaque)
    // column-level filters are what the rule sees
    val dfFiltered = chunked.toDF()
      .filter($"doc_id" === "doc3" && $"text".contains("Closing"))
    val optimized = dfFiltered.queryExecution.optimizedPlan
    // the doc_id predicate must sit BELOW the chunk node after optimization
    val nodes = optimized.collect { case n: ChunkElementsNode => n }
    assert(nodes.length == 1)
    val below = nodes.head.child.toString
    assert(below.contains("doc_id"), s"doc_id filter not pushed:\n$optimized")
    assert(!below.contains("Closing"), s"text filter wrongly pushed:\n$optimized")
    // and it still returns the right rows
    val out = dfFiltered.as[Element].collect()
    assert(out.nonEmpty && out.forall(_.doc_id == "doc3"))
    assert(out.forall(_.text.contains("Closing")))
    assert(filtered.collect().forall(_.doc_id == "doc2"))
  }

  test("chunking a multi-doc partition streams consecutive groups correctly") {
    val sp = spark
    import sp.implicits._
    // force everything into one partition so the exec walks group boundaries
    val ds = corpus.toDS().repartition(1)
    val viaPlan = ChunkPlan.chunkElements(ds, opts)
      .collect().sortBy(e => (e.doc_id, e.seq)).toSeq
    val viaFold = Chunker.chunkElements(ds, opts)
      .collect().sortBy(e => (e.doc_id, e.seq)).toSeq
    assert(viaPlan == viaFold)
    assert(viaPlan.map(_.doc_id).distinct.size == 6)
  }
}
