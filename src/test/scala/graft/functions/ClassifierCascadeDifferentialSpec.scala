package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase

/**
 * Differential proof of the element-type classification cascade: the vectors
 * in `classifier-cascade-vectors.txt` were produced by running the REFERENCE's
 * own `element_from_text` (`partition/text.py:111-166`, first match wins) over
 * an adversarial battery of strings that collide multiple cascade branches —
 * bullets that are also emails, addresses that look like numbered lists,
 * prefix-matching email regexes, unicode str-method mirrors (strip/isupper/
 * isnumeric on NBSP, fullwidth, numeric glyphs), threshold-boundary cap
 * ratios. `Predicates.classifyText` must agree on every one, so a branch
 * ORDER change (invisible to per-predicate unit tests) fails here.
 * Regenerate with `python3 dev/gen_classifier_vectors.py` (reference checkout
 * required; tokenizers are replaced by the documented closed-list/regex
 * approximations, everything else is the reference's real code).
 */
class ClassifierCascadeDifferentialSpec extends SparkSuiteBase {

  private def unescape(s: String): String = graft.TestEscapes.unescape(s)

  private val vectors: Seq[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/classifier-cascade-vectors.txt")
    require(in != null, "classifier-cascade-vectors.txt missing from test resources")
    val src = scala.io.Source.fromInputStream(in, "US-ASCII")
    try src.getLines().filterNot(l => l.isEmpty || l.startsWith("#")).map { line =>
      val Array(expected, text) = line.split("\t", 2)
      (expected, unescape(text))
    }.toVector
    finally src.close()
  }

  test("classifyText agrees with the reference cascade on every vector") {
    import spark.implicits._
    assert(vectors.size >= 100, s"battery shrank to ${vectors.size}")
    val df = vectors.zipWithIndex
      .map { case ((exp, text), i) => (i, text, exp) }
      .toDF("i", "text", "expected")
    val got = df.select(col("i"), col("text"), col("expected"),
        Predicates.classifyText(col("text")).as("got"))
      .collect().sortBy(_.getInt(0))
    val bad = got.filter(r => r.getString(3) != r.getString(2))
    assert(bad.isEmpty, bad.map(r =>
      s"[${r.getInt(0)}] ${r.getString(1).take(60)}: " +
        s"expected ${r.getString(2)}, got ${r.getString(3)}").mkString("\n", "\n", ""))
  }
}
