package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Element, ElementMetadata, ElementType}
import graft.sinks.ElementJson

/**
 * Table isolation during chunking, ported from the reference regression suite
 * (`test_unstructured/chunking/test_table_isolation.py`, issue #3921): a
 * `Table`/`TableChunk` must never share a pre-chunk with unrelated text, so
 * downstream gets standalone table chunks instead of mixed composites —
 * unless `isolate_table=False` restores the pre-#4307 behavior.
 */
class TableIsolationSpec extends AnyFunSuite {

  private var nextSeq = 0L
  private def el(tpe: String, text: String): Element = {
    nextSeq += 1
    Element("", tpe, text, "doc1", nextSeq, ElementMetadata())
  }
  private def title(t: String) = el(ElementType.Title, t)
  private def text(t: String) = el(ElementType.NarrativeText, t)
  private def table(t: String) = el(ElementType.Table, t)

  private def basic(els: Seq[Element], opts: ChunkingOptions): Vector[Element] =
    Chunker.chunkDoc("doc1", els.iterator, opts.copy(byTitle = false)).toVector

  private def byTitle(els: Seq[Element], opts: ChunkingOptions): Vector[Element] =
    Chunker.chunkDoc("doc1", els.iterator, opts.copy(byTitle = true)).toVector

  // -- DescribeTableIsolationPreChunkStream --

  test("a table gets its own pre-chunk between text blocks") {
    val chunks = basic(
      Seq(title("Section A"), text("Narrative before the table."),
        table("Col1\nCell A"), text("Narrative after the table.")),
      ChunkingOptions(maxCharacters = 500, newAfterNChars = Some(0),
        includeOrigElements = false))
    assert(chunks.map(_.text) == Vector("Section A",
      "Narrative before the table.", "Col1\nCell A",
      "Narrative after the table."))
    assert(chunks.map(_.`type`) == Vector(
      ElementType.CompositeElement, ElementType.CompositeElement,
      ElementType.Table, ElementType.CompositeElement))
  }

  test("adjacent tables each get their own pre-chunk") {
    val chunks = basic(
      Seq(table("T1\nA"), table("T2\nB"), text("Closing text.")),
      ChunkingOptions(maxCharacters = 500, includeOrigElements = false))
    assert(chunks.map(_.text) == Vector("T1\nA", "T2\nB", "Closing text."))
    assert(chunks.take(2).forall(_.`type` == ElementType.Table))
  }

  // -- DescribeTableIsolationPreChunkCombiner --

  test("the combiner never stitches a table pre-chunk onto text neighbors") {
    val chunks = byTitle(
      Seq(text("Hello world."), table("H\nC"), text("Goodbye world.")),
      ChunkingOptions(maxCharacters = 500, combineTextUnderNChars = Some(500),
        includeOrigElements = false))
    assert(chunks.map(_.text) == Vector("Hello world.", "H\nC", "Goodbye world."))
    assert(chunks(1).`type` == ElementType.Table)
  }

  // -- DescribeTableIsolationOrderingGuarantees --

  test("global element order is preserved through isolation") {
    val chunks = basic(
      Seq(text("alpha"), table("T\n1"), text("beta"), table("T\n2"),
        title("gamma")),
      ChunkingOptions(maxCharacters = 500, newAfterNChars = Some(0),
        includeOrigElements = false))
    assert(chunks.map(_.text) == Vector("alpha", "T\n1", "beta", "T\n2", "gamma"))
  }

  test("chunk stream categories interleave in document order") {
    val chunks = basic(
      Seq(title("Intro"), text("Body before."), table("K\nV"),
        text("Body after.")),
      ChunkingOptions(maxCharacters = 500, newAfterNChars = Some(0),
        includeOrigElements = false))
    assert(chunks.map(_.`type`) == Vector(
      ElementType.CompositeElement, ElementType.CompositeElement,
      ElementType.Table, ElementType.CompositeElement))
  }

  // -- DescribeTableIsolationChunkElements --

  test("a table and its surrounding text never share a composite") {
    val chunks = basic(
      Seq(title("Report"), text("Short intro."), table("Key\nValue"),
        text("Short outro.")),
      ChunkingOptions(maxCharacters = 500, newAfterNChars = Some(0),
        includeOrigElements = false))
    assert(chunks.size == 4)
    assert(chunks(2).`type` == ElementType.Table)
    assert(chunks(2).text.contains("Key") || chunks(2).text.contains("Value"))
    assert(chunks.zipWithIndex.filter(_._2 != 2)
      .forall(_._1.`type` == ElementType.CompositeElement))
  }

  test("two tables in a row yield two Table chunks") {
    val chunks = basic(Seq(table("T1\nA"), table("T2\nB")),
      ChunkingOptions(maxCharacters = 500, includeOrigElements = false))
    assert(chunks.size == 2 && chunks.forall(_.`type` == ElementType.Table))
  }

  test("isolation is semantic, not a size heuristic: huge windows still isolate") {
    val chunks = basic(Seq(text("x"), table("tiny"), text("y")),
      ChunkingOptions(maxCharacters = 50000, newAfterNChars = Some(10000),
        includeOrigElements = false))
    val tables = chunks.filter(_.`type` == ElementType.Table)
    val composites = chunks.filter(_.`type` == ElementType.CompositeElement)
    assert(tables.size == 1 && tables.head.text == "tiny")
    assert(composites.size == 2)
  }

  test("no composite ever lists a Table in its orig_elements") {
    val chunks = basic(Seq(text("preamble"), table("H\nC"), text("post")),
      ChunkingOptions(maxCharacters = 400, newAfterNChars = Some(0),
        includeOrigElements = true))
    val composites = chunks.filter(_.`type` == ElementType.CompositeElement)
    assert(composites.nonEmpty)
    composites.foreach { c =>
      val origJson = ElementJson.decodeOrigElementsJson(c.metadata.orig_elements.get)
      assert(!origJson.contains("\"type\":\"Table\""),
        s"composite '${c.text}' carries a table in orig_elements")
    }
  }

  // -- DescribeTableIsolationDisabled --

  test("isolate_table=false lets a tiny table collapse into one composite") {
    val chunks = basic(Seq(text("preamble"), table("H\nC"), text("post")),
      ChunkingOptions(maxCharacters = 500, isolateTable = false,
        includeOrigElements = false))
    assert(chunks.size == 1)
    assert(chunks.head.`type` == ElementType.CompositeElement)
    assert(chunks.head.text.contains("preamble") && chunks.head.text.contains("post"))
  }

  test("isolate_table=false lets the combiner merge table and text pre-chunks") {
    val chunks = byTitle(
      Seq(text("Hello world."), table("H\nC"), text("Goodbye world.")),
      ChunkingOptions(maxCharacters = 500, combineTextUnderNChars = Some(500),
        isolateTable = false, includeOrigElements = false))
    assert(chunks.size == 1)
    // composite text normalizes each element's whitespace to single spaces
    // (base.py:753-759), so the table's newline becomes a space here
    assert(chunks.head.text ==
      "Hello world.\n\nH C\n\nGoodbye world.")
  }

  // -- DescribeTableIsolationOverlapAll --

  test("overlap never crosses INTO a table chunk") {
    val chunks = basic(Seq(text("Alpha beta gamma delta."), table("H\nC")),
      ChunkingOptions(maxCharacters = 500, newAfterNChars = Some(0),
        overlap = 5, overlapAll = true, includeOrigElements = false))
    val t = chunks.filter(_.`type` == ElementType.Table)
    assert(t.size == 1)
    assert(!t.head.text.contains("Alpha") && !t.head.text.contains("elta"))
  }

  test("overlap never crosses OUT of a table chunk") {
    val chunks = basic(Seq(table("H\nC"), text("Omega sigma tau upsilon.")),
      ChunkingOptions(maxCharacters = 500, newAfterNChars = Some(0),
        overlap = 5, overlapAll = true, includeOrigElements = false))
    val composites = chunks.filter(_.`type` == ElementType.CompositeElement)
    assert(composites.size == 1)
    assert(composites.head.text.startsWith("Omega"))
    assert(!composites.head.text.take(20).contains("H"))
  }
}
