package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/**
 * Cross-language differential for the BPE pre-tokenizer split: the vectors in
 * `bpe-split-vectors.txt` were produced by the PYTHON pattern the merge-table
 * generator trains with (`dev/gen_split_diff_vectors.py`), over adversarial
 * inputs — NFD combining marks, stacked marks, ZWNJ/ZWJ sequences, mixed
 * scripts, contraction forms, digit and whitespace runs. The Java runtime
 * pattern must segment every input IDENTICALLY, or the committed merge table
 * and the independent Python oracle would rest on diverging tokenizations
 * (Java's Unicode `\w` contains Mn/Mc/Me + join controls that Python's
 * excludes — subtracted via class arithmetic in `TokenCounter.SplitRe`).
 */
class BpeSplitDifferentialSpec extends AnyFunSuite {

  private def unescape(s: String): String = graft.TestEscapes.unescape(s)

  private val vectors: Seq[(String, Vector[String])] = {
    val in = getClass.getResourceAsStream("/graft/bpe-split-vectors.txt")
    require(in != null, "bpe-split-vectors.txt missing from test resources")
    val src = scala.io.Source.fromInputStream(in, "US-ASCII")
    try src.getLines().filter(_.nonEmpty).map { line =>
      val Array(input, piecesField) = line.split("\t", 2)
      val pieces =
        if (piecesField.isEmpty) Vector.empty[String]
        else piecesField.split("\u0001", -1).toVector.map(unescape)
      (unescape(input), pieces)
    }.toVector
    finally src.close()
  }

  test("Java segmentation matches the Python generator on every vector") {
    assert(vectors.size >= 20)
    vectors.foreach { case (input, expected) =>
      val got = TokenCounter.splitPieces(input)
      assert(got == expected,
        s"diverged on ${input.map(c => f"\\u${c.toInt}%04x").mkString}:" +
          s" java=$got python=$expected")
    }
  }

  test("the vectors genuinely exercise marks, joins, and contractions") {
    val all = vectors.map(_._1).mkString
    assert(all.exists(c => Character.getType(c) == Character.NON_SPACING_MARK))
    assert(all.contains('‍') && all.contains('‌'))
    assert(all.contains("'"))
  }
}
