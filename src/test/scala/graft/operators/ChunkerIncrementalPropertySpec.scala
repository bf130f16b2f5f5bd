package graft.operators

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Element, ElementMetadata, ElementType}

/**
 * Property fuzz: the streaming chunker (micro-batch-stepped
 * [[Chunker.chunkDocIncremental]], re-fed its open tail and overlap prefix
 * between steps exactly as `StreamingOps.chunkStream`'s state fold does) must
 * produce the SAME chunk stream as the one-shot batch fold, for every element
 * stream, option set, and arbitrary micro-batch partitioning. 300 seeded
 * cases x random batch cuts.
 */
class ChunkerIncrementalPropertySpec extends AnyFunSuite {

  private val rng = new Random(20260814L)

  private def randText(): String = {
    val r = rng.nextDouble()
    if (r < 0.08) ""
    else if (r < 0.15) "x" * (30 + rng.nextInt(180))
    else Seq.fill(1 + rng.nextInt(25))(
      Seq("alpha", "beta", "gamma", "delta", "naive", "table", "row", "cell")(
        rng.nextInt(8))).mkString(" ")
  }

  private def randElements(): Vector[Element] = {
    val n = rng.nextInt(24)
    Vector.tabulate(n) { i =>
      val tpe = Seq(ElementType.NarrativeText, ElementType.Title,
        ElementType.ListItem, ElementType.Table, ElementType.PageBreak)(rng.nextInt(5))
      val text = if (tpe == ElementType.PageBreak) "" else randText()
      Element(s"e$i", tpe, text, "doc", i.toLong,
        ElementMetadata(page_number = Some(1 + i / 7)))
    }
  }

  private def randOpts(): ChunkingOptions = {
    val maxc = Seq(40, 80, 150, 400)(rng.nextInt(4))
    ChunkingOptions(
      maxCharacters = maxc,
      newAfterNChars = if (rng.nextBoolean()) Some(rng.nextInt(maxc)) else None,
      overlap = if (rng.nextBoolean()) rng.nextInt(maxc / 3 + 1) else 0,
      overlapAll = rng.nextBoolean(),
      combineTextUnderNChars = if (rng.nextBoolean()) Some(rng.nextInt(maxc)) else None,
      multipageSections = rng.nextBoolean(),
      includeOrigElements = false,
      byTitle = rng.nextBoolean())
  }

  test("micro-batch-stepped incremental chunking equals the one-shot batch fold") {
    var failures = List.empty[String]
    for (caseId <- 0 until 300) {
      val els = randElements()
      val opts = randOpts()
      val batch = Chunker.chunkDoc("doc", els.iterator, opts).toVector

      // random micro-batch cuts (possibly empty batches)
      var cuts = Vector(0, els.length)
      for (_ <- 0 until rng.nextInt(5)) cuts = cuts :+ rng.nextInt(els.length + 1)
      val bounds = cuts.sorted.distinct
      var pending = Vector.empty[Element]
      var seq = 0L
      var prefix = ""
      val inc = Vector.newBuilder[Element]
      bounds.sliding(2).filter(_.size == 2).foreach { case Seq(a, b) =>
        val slice = els.slice(a, b)
        val (closed, open, nextSeq, nextPrefix) =
          Chunker.chunkDocIncremental("doc", pending ++ slice, opts, seq, prefix,
            finalFlush = false)
        inc ++= closed
        pending = open
        seq = nextSeq
        prefix = nextPrefix
      }
      val (tail, _, _, _) =
        Chunker.chunkDocIncremental("doc", pending, opts, seq, prefix, finalFlush = true)
      inc ++= tail
      val incremental = inc.result()

      if (incremental.map(c => (c.`type`, c.text)) != batch.map(c => (c.`type`, c.text)))
        failures ::= s"case $caseId (byTitle=${opts.byTitle} max=${opts.maxCharacters} " +
          s"ov=${opts.overlap}/${opts.overlapAll}): " +
          s"incremental ${incremental.length} vs batch ${batch.length} chunks\n" +
          s"  inc:   ${incremental.map(_.text.take(25)).mkString("|")}\n" +
          s"  batch: ${batch.map(_.text.take(25)).mkString("|")}"
    }
    assert(failures.isEmpty,
      s"${failures.length}/300 divergences:\n" + failures.take(4).mkString("\n"))
  }
}
