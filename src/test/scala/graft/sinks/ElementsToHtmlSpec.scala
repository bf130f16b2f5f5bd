package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSuiteBase

/** `elements_to_html` option paths (`partition/html/convert.py:305-320`). */
class ElementsToHtmlSpec extends SparkSuiteBase {

  private def df(rows: Seq[(Long, Long, String, String, String, Option[String],
      Option[Int], Option[Int], Option[String], Option[String], Option[String],
      Option[String])]) = {
    import spark.implicits._
    rows.toDF("doc_id", "seq", "element_id", "element_type", "text",
      "parent_id", "page_number", "category_depth", "text_as_html",
      "image_base64", "image_mime", "url")
  }

  private def html(rows: Seq[(Long, Long, String, String, String, Option[String],
      Option[Int], Option[Int], Option[String], Option[String], Option[String],
      Option[String])], exclude: Boolean = false, noPage: Boolean = false) =
    ElementsToHtml.elementsToHtml(df(rows), exclude, noPage)
      .select("html").collect().head.getString(0)

  private def row(seq: Long, id: String, tpe: String, text: String,
      parent: Option[String] = None, page: Option[Int] = Some(1),
      depth: Option[Int] = None, tah: Option[String] = None,
      b64: Option[String] = None, mime: Option[String] = None,
      url: Option[String] = None) =
    (1L, seq, id, tpe, text, parent, page, depth, tah, b64, mime, url)

  test("excludeBinaryImageData drops the src data URI but keeps alt") {
    val rows = Seq(row(1, "i1", "Image", "a chart", b64 = Some("QUJD"),
      mime = Some("image/png")))
    val withData = html(rows)
    assert(withData.contains("src=\"data:image/png;base64,QUJD\""))
    val without = html(rows, exclude = true)
    assert(!without.contains("src="))
    assert(without.contains("alt=\"a chart\""))
  }

  test("noGroupByPage renders elements without page divs") {
    val rows = Seq(row(1, "t1", "Title", "Hello", depth = Some(0)))
    val paged = html(rows)
    assert(paged.contains("data-page_number=\"1\""))
    val flat = html(rows, noPage = true)
    assert(!flat.contains("data-page_number"))
    assert(flat.contains("<h1 class=\"Title\" id=\"t1\">"))
  }

  test("elements without a page number are skipped in by-page mode only") {
    val rows = Seq(
      row(1, "t1", "Title", "Kept"),
      row(2, "t2", "Title", "Dropped", page = None))
    val paged = html(rows)
    assert(paged.contains("Kept") && !paged.contains("Dropped"))
    val flat = html(rows, noPage = true)
    assert(flat.contains("Dropped"))
  }

  test("page numbering is enumeration order, not the source page number") {
    val rows = Seq(
      row(1, "a", "Title", "On page seven", page = Some(7)),
      row(2, "b", "Title", "On page nine", page = Some(9)))
    val out = html(rows)
    assert(out.contains("data-page_number=\"1\""))
    assert(out.contains("data-page_number=\"2\""))
    assert(!out.contains("data-page_number=\"7\""))
  }

  test("Link renders an anchor with href from metadata url") {
    val out = html(Seq(row(1, "l1", "Link", "click",
      url = Some("https://example.com"))))
    assert(out.contains("<a class=\"Link\" href=\"https://example.com\" id=\"l1\">"))
  }

  test("nested parents wrap recursively; list runs group under one ol") {
    val rows = Seq(
      row(1, "t1", "Title", "Top", depth = Some(0)),
      row(2, "t2", "Title", "Sub", parent = Some("t1"), depth = Some(2)),
      row(3, "l1", "ListItem", "one", parent = Some("t2")),
      row(4, "l2", "ListItem", "two", parent = Some("t2")),
      row(5, "p1", "NarrativeText", "tail", parent = Some("t2")))
    val out = html(rows)
    // t1 wrapper div contains t2's wrapper div; one ol groups l1+l2
    assert("<ol class=\"UncategorizedText\">".r.findAllIn(out).size == 1)
    val olIdx = out.indexOf("<ol")
    assert(out.indexOf("id=\"l2\"") > olIdx)
    assert(out.indexOf("id=\"p1\"") > out.indexOf("</ol>"))
    assert(out.indexOf("<h2") > out.indexOf("<h1"))
  }

  test("unmapped element types fall back to div") {
    val out = html(Seq(row(1, "f1", "Formula", "x = 1")))
    assert(out.contains("<div class=\"Formula\" id=\"f1\">"))
  }

  test("per-type attrs inject into adopted text_as_html too (convert.py always runs them)") {
    // a Link that carries text_as_html still gets href
    val link = html(Seq(row(1, "l1", "Link", "click",
      tah = Some("<a>click</a>"), url = Some("https://x.io"))))
    assert(link.contains("href=\"https://x.io\""))
    // a checked checkbox with text_as_html still gets type + checked
    val box = html(Seq(row(1, "c1", "CheckBoxChecked", "",
      tah = Some("<input/>"))))
    assert(box.contains("checked=\"true\"") && box.contains("type=\"checkbox\""))
    // a synthesized Table (no text_as_html) is styled like an adopted one
    val tbl = html(Seq(row(1, "tb1", "Table", "k v")))
    assert(tbl.contains("style=\"border: 1px solid black; border-collapse: collapse;\""))
  }

  test("duplicate element ids all render; parent links resolve to the first carrier") {
    // identical text -> identical hash id; the reference keeps a list and
    // renders every element, resolving parent_id by first match
    val rows = Seq(
      row(1, "dup", "NarrativeText", "same text"),
      row(2, "dup", "NarrativeText", "same text"),
      row(3, "k1", "NarrativeText", "child", parent = Some("dup")))
    val out = html(rows)
    assert("class=\"NarrativeText\" id=\"dup\"".r.findAllIn(out).size == 2)
    // the child nests under the FIRST dup (wrapper div precedes the second dup)
    val wrapIdx = out.indexOf("<div>")
    assert(wrapIdx >= 0 && out.indexOf("child") > wrapIdx)
  }

  test("mixed text/element content preserves source order") {
    val out = html(Seq(row(1, "t1", "Table", "before x after",
      tah = Some("<table><tr><td>before <b>x</b> after</td></tr></table>"))))
    val td = out.substring(out.indexOf("<td"))
    assert(td.indexOf("before") < td.indexOf("<b"))
    assert(td.indexOf("<b") < td.indexOf("after"))
  }
}
