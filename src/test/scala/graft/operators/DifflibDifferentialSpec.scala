package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestEscapes

/**
 * Differential fuzz harness for the difflib kernel under the table metrics:
 * `dev/gen_difflib_diff_vectors.py` executed the REAL stdlib reference — no
 * substitutions — over a seeded adversarial corpus and pinned 387 vectors:
 * 261 `SequenceMatcher(None, a, b).ratio()` pairs (astral chars sharing a
 * high surrogate, autojunk boundary at len(b)=200 counted in code points,
 * popularity-junked spaces) and 126 `get_close_matches(word, cands, n=1,
 * cutoff)` + `.index(match)` alignments (ratio ties where heapq.nlargest
 * picks the code-point-LARGER candidate, duplicate winners resolved to the
 * first occurrence, empty candidate lists).
 *
 * Replayed through [[TableEval.sequenceRatio]] / [[TableEval.closestIndex]] —
 * the kernels under `q_table_eval` / `q_table_eval_processor` cell scoring
 * and table/element alignment (`table_eval.py:76`,
 * `table_alignment.py:47,113`).
 */
class DifflibDifferentialSpec extends AnyFunSuite {

  private val vecPath = "src/test/resources/graft/refvec/difflib_diff.ndjson"

  private def strField(line: String, k: String): String = {
    val key = "\"" + k + "\": \""
    val from = line.indexOf(key) + key.length
    TestEscapes.unescape(line.substring(from, line.indexOf('"', from)))
  }

  private def numField(line: String, k: String): Double = {
    ("\"" + k + "\": (-?[0-9.eE+-]+)").r.findFirstMatchIn(line).get.group(1).toDouble
  }

  private lazy val lines: Vector[String] = {
    val src = scala.io.Source.fromFile(vecPath, "UTF-8")
    try src.getLines().filter(_.nonEmpty).toVector finally src.close()
  }

  test("corpus sanity: 387 vectors, astral + autojunk + tie cases present") {
    assert(lines.size == 387)
    assert(lines.count(_.contains("\"kind\": \"closest\"")) == 126)
    assert(lines.exists(_.contains("\\ud83e")))
  }

  test("261 SequenceMatcher.ratio vectors reproduce exactly") {
    val ratios = lines.filter(_.contains("\"kind\": \"ratio\""))
    assert(ratios.size == 261)
    ratios.foreach { line =>
      val a = strField(line, "a")
      val b = strField(line, "b")
      val want = numField(line, "ratio")
      val got = TableEval.sequenceRatio(a, b)
      assert(got == want, s"ratio diverged for a=<$a> b=<$b>")
    }
  }

  test("126 get_close_matches alignment vectors reproduce exactly") {
    lines.filter(_.contains("\"kind\": \"closest\"")).foreach { line =>
      val word = strField(line, "word")
      val cutoff = numField(line, "cutoff")
      val want = numField(line, "index").toInt
      val open = line.indexOf("\"cands\": [") + "\"cands\": [".length
      val inner = line.substring(open, line.indexOf(']', open))
      val cands =
        if (inner.isEmpty) Seq.empty[String]
        else inner.split(", ").toSeq.map(q =>
          TestEscapes.unescape(q.stripPrefix("\"").stripSuffix("\"")))
      val got = TableEval.closestIndex(word, cands, cutoff)
      assert(got == want, s"closest diverged for word=<$word> cands=$cands cutoff=$cutoff")
    }
  }
}
