package graft.operators

import java.nio.file.{Files, Paths}

import graft.SparkSuiteBase
import graft.model.{Element, ElementMetadata, ElementType}

/**
 * The chunker's 100x-scale story, proven rather than told: per-group state is
 * O(window) — a 1225-page book folds through `chunkDoc` with bounded
 * lookahead, never materializing the document — and the Spark operator is one
 * doc_id shuffle whose per-task cost is bounded by the same fold, so a skewed
 * giant document slows only its own task, with AQE balancing the rest.
 */
class ChunkerScaleSpec extends SparkSuiteBase {

  private lazy val bookElements: Vector[Element] = {
    val text = new String(Files.readAllBytes(
      Paths.get("/root/reference/example-docs/book-war-and-peace-1225p.txt")), "UTF-8")
    graft.sources.TextSource.splitParagraphs(text).zipWithIndex.map { case (p, i) =>
      Element("", if (p.length < 40) ElementType.Title else ElementType.NarrativeText,
        p, "war-and-peace", i + 1L, ElementMetadata.empty)
    }.toVector
  }

  test("chunkDoc folds the 1225-page book with O(window) lookahead") {
    assert(bookElements.size > 10000, s"book split into ${bookElements.size} paragraphs")
    var pulled = 0
    val counting = bookElements.iterator.map { e => pulled += 1; e }
    val out = Chunker.chunkDoc("war-and-peace", counting,
      ChunkingOptions(byTitle = true, maxCharacters = 500))
    // pulling the FIRST chunk must not consume the whole document: the fold's
    // lookahead is one pre-chunk (window) plus the combine run, not O(doc)
    val first = out.next()
    assert(first.text.nonEmpty)
    assert(pulled < 200,
      s"first chunk pulled $pulled of ${bookElements.size} elements — fold is not lazy")
    // and the remainder streams through to the same result as the batch fold
    val streamed = (first +: out.toVector).map(_.text)
    val batch = Chunker.chunkDoc("war-and-peace", bookElements.iterator,
      ChunkingOptions(byTitle = true, maxCharacters = 500)).toVector.map(_.text)
    assert(streamed == batch)
    assert(streamed.size > 5000)
  }

  test("a giant skewed doc beside 1,000 small docs: one shuffle, per-doc-bounded tasks") {
    import spark.implicits._
    val smallDocs = (1 to 1000).flatMap { i =>
      Seq(
        Element("", ElementType.Title, s"Doc $i title", s"doc$i", 1, ElementMetadata.empty),
        Element("", ElementType.NarrativeText, s"Body text for document number $i.",
          s"doc$i", 2, ElementMetadata.empty))
    }
    val ds = spark.createDataset(smallDocs ++ bookElements)
      .repartition(4) // scatter the giant doc's rows like a real scan would
    val chunked = Chunker.chunkByTitle(ds, ChunkingOptions(maxCharacters = 500))

    // exactly TWO exchanges: the scatter repartition above plus the doc_id
    // group shuffle — the chunker itself adds only the one hash exchange.
    // (AQE wraps the plan lazily, so inspect with it off, as PlanGuardSpec does.)
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val shuffles =
      try {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        Chunker.chunkByTitle(ds, ChunkingOptions(maxCharacters = 500))
          .queryExecution.executedPlan.collect {
            case s: ShuffleExchangeExec => s.outputPartitioning.toString
          }
      } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    assert(shuffles.size == 2, s"unexpected shuffles: $shuffles")
    // the group key (doc_id) shuffle prints as the groupByKey value column
    assert(shuffles.count(_.startsWith("hashpartitioning")) == 1, shuffles.toString)
    assert(shuffles.count(_.startsWith("RoundRobinPartitioning")) == 1, shuffles.toString)

    val counts = chunked.groupByKey(_.doc_id).count().collect().toMap
    assert(counts.size == 1001)
    // every small doc chunks to exactly one composite; the giant doc to many —
    // the skew stays inside one task whose memory is bounded by the fold, so
    // the job completes on a 2-core driver-sized JVM
    assert((1 to 1000).forall(i => counts(s"doc$i") == 1L))
    assert(counts("war-and-peace") > 5000L)

    // AQE is on in the production sessions (Spark 4 default, never disabled in
    // SparkEntry/Bench/Verify): post-shuffle partitions rebalance around the
    // skewed group, which is as far as ANY engine can split a single group
    assert(spark.conf.get("spark.sql.adaptive.enabled").toBoolean)
  }
}
