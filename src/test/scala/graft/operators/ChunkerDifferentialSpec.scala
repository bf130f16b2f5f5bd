package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.types._

import graft.SparkSuiteBase
import graft.model.{Element, ElementMetadata}
import graft.sinks.ElementJson

/**
 * Differential fuzz harness against the reference chunker: 160 seeded
 * pseudo-random (element stream, option set) cases were executed through the
 * reference implementation (`chunking/basic.py` `chunk_elements`,
 * `chunking/title.py` `chunk_by_title`) by `dev/gen_chunk_diff_vectors.py`,
 * and their outputs pinned to `refvec/chunker_diff.ndjson`. This spec replays
 * every case through [[Chunker.chunkDoc]] and asserts identical chunk text,
 * categories, continuation flags, consolidated metadata
 * (`ConsolidationStrategy`, elements.py:517-579), and `orig_elements`
 * membership. Randomized inputs cover splitter-hostile shapes the hand-ported
 * suites don't reach: unicode multi-byte runs, unbroken 260-char tokens,
 * newline-mixed separators, empty texts, and page-boundary interleavings.
 */
class ChunkerDifferentialSpec extends SparkSuiteBase {

  private val vecPath = "src/test/resources/graft/refvec/chunker_diff.ndjson"

  private val metaSchema = StructType(Seq(
    StructField("page_number", IntegerType),
    StructField("emphasized_text_contents", ArrayType(StringType)),
    StructField("emphasized_text_tags", ArrayType(StringType)),
    StructField("link_texts", ArrayType(StringType)),
    StructField("link_urls", ArrayType(StringType)),
    StructField("languages", ArrayType(StringType))))

  private val schema = StructType(Seq(
    StructField("case", LongType),
    StructField("strategy", StringType),
    StructField("opts", StructType(Seq(
      StructField("max_characters", IntegerType),
      StructField("new_after_n_chars", IntegerType),
      StructField("combine_text_under_n_chars", IntegerType),
      StructField("overlap", IntegerType),
      StructField("overlap_all", BooleanType),
      StructField("include_orig_elements", BooleanType),
      StructField("multipage_sections", BooleanType),
      StructField("isolate_table", BooleanType),
      StructField("skip_table_chunking", BooleanType),
      StructField("repeat_table_headers", BooleanType)))),
    StructField("elements", ArrayType(StructType(Seq(
      StructField("type", StringType),
      StructField("text", StringType),
      StructField("meta", metaSchema))))),
    StructField("chunks", ArrayType(StructType(Seq(
      StructField("type", StringType),
      StructField("text", StringType),
      StructField("is_continuation", BooleanType),
      StructField("page_number", IntegerType),
      StructField("emphasized_text_contents", ArrayType(StringType)),
      StructField("emphasized_text_tags", ArrayType(StringType)),
      StructField("link_texts", ArrayType(StringType)),
      StructField("link_urls", ArrayType(StringType)),
      StructField("languages", ArrayType(StringType)),
      StructField("orig", StructType(Seq(
        StructField("types", ArrayType(StringType)),
        StructField("texts", ArrayType(StringType)))))))))))

  /** Split a JSON array of objects into the raw source of each object (the
    * decoded `orig_elements` payload is our own writer's output, so structure
    * is well-formed by construction). */
  private def splitArray(src: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    val n = src.length
    var depth = 0
    var start = -1
    while (i < n) {
      src.charAt(i) match {
        case '"' =>
          i += 1
          while (i < n && src.charAt(i) != '"') {
            if (src.charAt(i) == '\\') i += 1
            i += 1
          }
        case '{' =>
          if (depth == 0) start = i
          depth += 1
        case '}' =>
          depth -= 1
          if (depth == 0 && start >= 0) { out += src.substring(start, i + 1); start = -1 }
        case _ => ()
      }
      i += 1
    }
    out.result()
  }

  /** Extract one top-level string field from an element-object source. */
  private def strField(objSrc: String, name: String): Option[String] = {
    val key = "\"" + name + "\""
    var i = objSrc.indexOf(key)
    var found: Option[String] = None
    while (i >= 0 && found.isEmpty) {
      // ensure the match is a key at depth 1 followed by ':'
      var j = i + key.length
      while (j < objSrc.length && Character.isWhitespace(objSrc.charAt(j))) j += 1
      if (j < objSrc.length && objSrc.charAt(j) == ':') {
        j += 1
        while (j < objSrc.length && Character.isWhitespace(objSrc.charAt(j))) j += 1
        if (j < objSrc.length && objSrc.charAt(j) == '"') {
          val sb = new java.lang.StringBuilder
          j += 1
          var done = false
          while (j < objSrc.length && !done) {
            val c = objSrc.charAt(j)
            if (c == '\\' && j + 1 < objSrc.length) {
              objSrc.charAt(j + 1) match {
                case 'n' => sb.append('\n'); j += 2
                case 't' => sb.append('\t'); j += 2
                case 'r' => sb.append('\r'); j += 2
                case 'b' => sb.append('\b'); j += 2
                case 'f' => sb.append('\f'); j += 2
                case '"' => sb.append('"'); j += 2
                case '\\' => sb.append('\\'); j += 2
                case '/' => sb.append('/'); j += 2
                case 'u' =>
                  sb.append(Integer.parseInt(objSrc.substring(j + 2, j + 6), 16).toChar)
                  j += 6
                case other => sb.append(other); j += 2
              }
            } else if (c == '"') done = true
            else { sb.append(c); j += 1 }
          }
          found = Some(sb.toString)
        }
      }
      if (found.isEmpty) i = objSrc.indexOf(key, i + 1)
    }
    found
  }

  private lazy val cases = {
    val df = spark.read.schema(schema).json(vecPath)
    df.collect().sortBy(_.getLong(0))
  }

  private def optInt(row: org.apache.spark.sql.Row, i: Int): Option[Int] =
    if (row.isNullAt(i)) None else Some(row.getInt(i))
  private def optSeq(row: org.apache.spark.sql.Row, i: Int): Option[Seq[String]] =
    if (row.isNullAt(i)) None else Some(row.getSeq[String](i))

  test("all reference chunker differential vectors replay identically") {
    assert(cases.length == 160)
    val failures = mutable.ArrayBuffer[String]()
    for (row <- cases) {
      val caseId = row.getLong(0)
      val byTitle = row.getString(1) == "by_title"
      val o = row.getStruct(2)
      val opts = ChunkingOptions(
        maxCharacters = o.getInt(0),
        newAfterNChars = optInt(o, 1),
        combineTextUnderNChars = optInt(o, 2),
        overlap = optInt(o, 3).getOrElse(0),
        overlapAll = !o.isNullAt(4) && o.getBoolean(4),
        includeOrigElements = !o.isNullAt(5) && o.getBoolean(5),
        multipageSections = o.isNullAt(6) || o.getBoolean(6),
        isolateTable = o.isNullAt(7) || o.getBoolean(7),
        skipTableChunking = !o.isNullAt(8) && o.getBoolean(8),
        repeatTableHeaders = o.isNullAt(9) || o.getBoolean(9),
        byTitle = byTitle)
      val els = row.getSeq[org.apache.spark.sql.Row](3).zipWithIndex.map {
        case (er, idx) =>
          val m = er.getStruct(2)
          val meta =
            if (m == null) ElementMetadata.empty
            else ElementMetadata(
              page_number = optInt(m, 0),
              emphasized_text_contents = optSeq(m, 1),
              emphasized_text_tags = optSeq(m, 2),
              link_texts = optSeq(m, 3),
              link_urls = optSeq(m, 4),
              languages = optSeq(m, 5))
          Element(s"e$idx", er.getString(0), er.getString(1), "doc", idx.toLong, meta)
      }
      val expected = row.getSeq[org.apache.spark.sql.Row](4)
      val actual = Chunker.chunkDoc("doc", els.iterator, opts).toVector

      def fail(msg: String): Unit =
        failures += s"case $caseId (${row.getString(1)}): $msg"

      if (actual.length != expected.length)
        fail(s"chunk count ${actual.length} != ${expected.length}\n" +
          s"  ours:   ${actual.map(c => c.`type` + ":" + c.text.take(40)).mkString(" | ")}\n" +
          s"  theirs: ${expected.map(c => c.getString(0) + ":" + c.getString(1).take(40)).mkString(" | ")}")
      else {
        actual.zip(expected).zipWithIndex.foreach { case ((a, e), ci) =>
          if (a.`type` != e.getString(0))
            fail(s"chunk $ci type ${a.`type`} != ${e.getString(0)}")
          if (a.text != e.getString(1))
            fail(s"chunk $ci text <${a.text}> != <${e.getString(1)}>")
          val aCont = a.metadata.is_continuation.getOrElse(false)
          val eCont = !e.isNullAt(2) && e.getBoolean(2)
          if (aCont != eCont) fail(s"chunk $ci is_continuation $aCont != $eCont")
          if (a.metadata.page_number != optInt(e, 3))
            fail(s"chunk $ci page ${a.metadata.page_number} != ${optInt(e, 3)}")
          if (a.metadata.emphasized_text_contents != optSeq(e, 4))
            fail(s"chunk $ci emph contents ${a.metadata.emphasized_text_contents} != ${optSeq(e, 4)}")
          if (a.metadata.emphasized_text_tags != optSeq(e, 5))
            fail(s"chunk $ci emph tags differ")
          if (a.metadata.link_texts != optSeq(e, 6))
            fail(s"chunk $ci link texts ${a.metadata.link_texts} != ${optSeq(e, 6)}")
          if (a.metadata.link_urls != optSeq(e, 7))
            fail(s"chunk $ci link urls differ")
          if (a.metadata.languages != optSeq(e, 8))
            fail(s"chunk $ci languages ${a.metadata.languages} != ${optSeq(e, 8)}")
          val eOrig = if (e.isNullAt(9)) None else Some(e.getStruct(9))
          eOrig.foreach { og =>
            a.metadata.orig_elements match {
              case None => fail(s"chunk $ci missing orig_elements")
              case Some(enc) =>
                val objs = splitArray(ElementJson.decodeOrigElementsJson(enc))
                val aTypes = objs.map(strField(_, "type").getOrElse(""))
                val aTexts = objs.map(strField(_, "text").getOrElse(""))
                if (aTypes != og.getSeq[String](0).toVector)
                  fail(s"chunk $ci orig types $aTypes != ${og.getSeq[String](0)}")
                if (aTexts != og.getSeq[String](1).toVector)
                  fail(s"chunk $ci orig texts differ: $aTexts != ${og.getSeq[String](1)}")
            }
          }
          if (eOrig.isEmpty && opts.includeOrigElements && a.metadata.orig_elements.isEmpty && expected.nonEmpty) ()
        }
      }
    }
    if (failures.nonEmpty)
      org.scalatest.Assertions.fail(
        s"${failures.length} divergence(s) from the reference chunker:\n" +
          failures.take(12).mkString("\n"))
  }
}
