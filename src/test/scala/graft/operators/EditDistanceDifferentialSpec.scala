package graft.operators

import graft.{SparkSuiteBase, TestEscapes}

/**
 * Differential fuzz harness for `calculate_edit_distance` /
 * `calculate_accuracy` (`metrics/text_extraction.py:69-130`):
 * `dev/gen_editdist_diff_vectors.py` executed the REFERENCE pipeline —
 * prepare_str whitespace collapse (Python str.split() semantics),
 * standardize_quotes translate (incl. the astral U+1F676..78 ornaments),
 * weighted Levenshtein, division-safe bounded score — over a seeded
 * adversarial corpus (astral code points, the full Python whitespace set
 * \x1c-\x1f/NBSP/U+2028…, quote tables, empty/None sides, four weight
 * tuples) and pinned 538 vectors. Only the unavailable rapidfuzz C kernel is
 * substituted by a clean-room code-point DP in the generator; everything
 * around it is reference-executed.
 *
 * The deliberate divergence traps: Python computes the DP and `len(source)`
 * over CODE POINTS, so a UTF-16 port that uses `String.length`/`charAt`
 * miscounts every surrogate pair; Python's split() whitespace is wider than
 * Java regex `\s`.
 *
 * Replayed through (a) the scalar [[TextExtractionMetrics]] pipeline and
 * (b) the codegen'd [[graft.functions.expr.WeightedLevenshtein]] expression
 * the distributed q_edit_distance_accuracy path uses.
 */
class EditDistanceDifferentialSpec extends SparkSuiteBase {

  private val vecPath = "src/test/resources/graft/refvec/editdist_diff.ndjson"

  private case class Vec(output: String, source: String,
    ins: Int, del: Int, sub: Int, stdWs: Boolean,
    prepOut: String, prepSrc: String,
    distance: Double, score: Double, accuracy: Option[Double])

  private def strField(line: String, k: String): Option[String] = {
    val key = "\"" + k + "\": "
    val i = line.indexOf(key)
    if (i < 0) None
    else if (line.startsWith("null", i + key.length)) None
    else {
      // every string field is pure \uXXXX escapes — no raw quotes inside
      val from = i + key.length + 1
      val end = line.indexOf('"', from)
      Some(TestEscapes.unescape(line.substring(from, end)))
    }
  }

  private def numField(line: String, k: String): Option[Double] = {
    val m = ("\"" + k + "\": (-?[0-9.eE+-]+)").r.findFirstMatchIn(line)
    m.map(_.group(1).toDouble)
  }

  private lazy val vectors: Vector[Vec] = {
    val src = scala.io.Source.fromFile(vecPath, "UTF-8")
    try src.getLines().filter(_.nonEmpty).toVector.map { line =>
      val w = ("\"weights\": \\[(\\d+), (\\d+), (\\d+)\\]").r
        .findFirstMatchIn(line).get
      Vec(
        output = strField(line, "output").orNull,
        source = strField(line, "source").orNull,
        ins = w.group(1).toInt, del = w.group(2).toInt, sub = w.group(3).toInt,
        stdWs = line.contains("\"std_ws\": true"),
        prepOut = strField(line, "prep_out").get,
        prepSrc = strField(line, "prep_src").get,
        distance = numField(line, "distance").get,
        score = numField(line, "score").get,
        accuracy = numField(line, "accuracy"))
    } finally src.close()
  }

  test("corpus sanity: 538 vectors, astral + python-whitespace + null cases present") {
    assert(vectors.size == 538)
    assert(vectors.exists(v =>
      Option(v.source).exists(_.exists(c => Character.isSurrogate(c)))))
    assert(vectors.exists(v => Option(v.output).exists(_.contains('\u001c'))))
    assert(vectors.exists(v => v.output == null || v.source == null))
    assert(vectors.exists(v => (v.ins, v.del, v.sub) != ((2, 1, 1))))
  }

  test("prepare_str + standardize_quotes match the reference on all vectors") {
    vectors.foreach { v =>
      val o = TextExtractionMetrics.standardizeQuotes(
        TextExtractionMetrics.prepareStr(v.output, v.stdWs))
      val s = TextExtractionMetrics.standardizeQuotes(
        TextExtractionMetrics.prepareStr(v.source, v.stdWs))
      assert(o == v.prepOut, s"prep_out diverged for ${pp(v)}")
      assert(s == v.prepSrc, s"prep_src diverged for ${pp(v)}")
    }
  }

  test("scalar distance, score and accuracy match the reference on all vectors") {
    vectors.foreach { v =>
      val w = (v.ins, v.del, v.sub)
      val d = TextExtractionMetrics.calculateEditDistance(
        v.output, v.source, "distance", v.stdWs, w)
      val sc = TextExtractionMetrics.calculateEditDistance(
        v.output, v.source, "score", v.stdWs, w)
      assert(d == v.distance, s"distance diverged for ${pp(v)}")
      assert(sc == v.score, s"score diverged for ${pp(v)}")
      v.accuracy.foreach { acc =>
        // the reference's calculate_accuracy has no standardize_whitespaces
        // parameter — it always runs the default collapse
        val a = TextExtractionMetrics.calculateAccuracy(
          v.output, v.source, standardizeWhitespaces = true, w)
        assert(a == acc, s"accuracy diverged for ${pp(v)}")
      }
    }
  }

  test("codegen'd WeightedLevenshtein expression agrees with the reference per weight tuple") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.graft.bridge
    vectors.groupBy(v => (v.ins, v.del, v.sub)).foreach { case ((i, d, s), group) =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(group.map(v =>
          org.apache.spark.sql.Row(v.prepOut, v.prepSrc, v.distance)), 2),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("o",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("s",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("want",
            org.apache.spark.sql.types.DoubleType))))
      val got = df.select(
        bridge.column(graft.functions.expr.WeightedLevenshtein(
          bridge.expression(col("o")), bridge.expression(col("s")),
          i, d, s)).cast("double").as("got"), col("want")).collect()
      got.foreach { r =>
        assert(r.getDouble(0) == r.getDouble(1),
          s"expression path diverged under weights ($i,$d,$s): ${r}")
      }
    }
  }

  private def pp(v: Vec): String =
    s"output=${esc(v.output)} source=${esc(v.source)} w=(${v.ins},${v.del},${v.sub}) std=${v.stdWs}"

  private def esc(s: String): String =
    if (s == null) "null"
    else s.map(c => if (c >= ' ' && c < 127) c.toString else f"\\u${c.toInt}%04x").mkString("\"", "", "\"")
}
