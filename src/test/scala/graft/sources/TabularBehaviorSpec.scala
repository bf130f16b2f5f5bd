package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/**
 * Behavior suite ported from the reference's CSV/XLSX tests
 * (`/root/reference/test_unstructured/partition/test_csv.py`, `test_xlsx.py`)
 * over the same example files, pinning delimiter sniffing, encoding handling,
 * and the sheet/subtable decomposition against the reference constants
 * (`test_constants.py`).
 */
class TabularBehaviorSpec extends AnyFunSuite {

  private val docs = "/root/reference/example-docs/"

  private def bytes(name: String): Array[Byte] =
    Files.readAllBytes(Paths.get(docs + name))

  private def csvText(name: String, charset: String = "UTF-8"): String =
    new String(bytes(name), charset)

  private def ws(s: String): String = HtmlPartitioner.normalizeWs(s)

  private val StanleyText =
    "Stanley Cups Team Location Stanley Cups Blues STL 1 Flyers PHI 2 Maple Leafs TOR 13"
  private val StanleyTable =
    "<table>" +
      "<tr><td>Stanley Cups</td><td/><td/></tr>" +
      "<tr><td>Team</td><td>Location</td><td>Stanley Cups</td></tr>" +
      "<tr><td>Blues</td><td>STL</td><td>1</td></tr>" +
      "<tr><td>Flyers</td><td>PHI</td><td>2</td></tr>" +
      "<tr><td>Maple Leafs</td><td>TOR</td><td>13</td></tr>" +
      "</table>"

  // -- test_partition_csv_from_filename (parametrized) ----------------------------

  test("stanley-cups.csv: one Table with the reference text and html") {
    val ps = Partitioners.partitionCsv(csvText("stanley-cups.csv"))
    assert(ps.size == 1)
    assert(ws(ps.head.text) == StanleyText)
    assert(ps.head.textAsHtml.contains(StanleyTable))
  }

  test("emoji csv keeps multi-codepoint cells intact") {
    val ps = Partitioners.partitionCsv(csvText("stanley-cups-with-emoji.csv"))
    assert(ws(ps.head.text).startsWith(StanleyText))
    assert(ps.head.text.contains("👨")) // 👨
    assert(ps.head.textAsHtml.get.contains("<td>👨"))
  }

  test("semicolon-delimited csv sniffs the delimiter and keeps comma decimals") {
    val ps = Partitioners.partitionCsv(csvText("table-semicolon-delimiter.csv"))
    assert(ws(ps.head.text) ==
      "Year Month Revenue Costs 2022 1 123 -123 2023 2 143,1 -814,38 2024 3 215,32 -11,08")
    assert(ps.head.textAsHtml.contains(
      "<table>" +
        "<tr><td>Year</td><td>Month</td><td>Revenue</td><td>Costs</td><td/></tr>" +
        "<tr><td>2022</td><td>1</td><td>123</td><td>-123</td><td/></tr>" +
        "<tr><td>2023</td><td>2</td><td>143,1</td><td>-814,38</td><td/></tr>" +
        "<tr><td>2024</td><td>3</td><td>215,32</td><td>-11,08</td><td/></tr>" +
        "</table>"))
  }

  test("line-delimited csv partitions rows") {
    val ps = Partitioners.partitionCsv(csvText("csv-with-line-delimiter.csv"))
    assert(ws(ps.head.text) == "col1 col2 col3 a b c d e f g h i")
    assert(ps.head.textAsHtml.contains(
      "<table>" +
        "<tr><td>col1</td><td>col2</td><td>col3</td></tr>" +
        "<tr><td>a</td><td>b</td><td>c</td></tr>" +
        "<tr><td>d</td><td>e</td><td>f</td></tr>" +
        "<tr><td>g</td><td>h</td><td>i</td></tr>" +
        "</table>"))
  }

  test("escaped commas inside quoted fields stay in one cell") {
    val ps = Partitioners.partitionCsv(csvText("csv-with-escaped-commas.csv"))
    assert(ps.nonEmpty)
    // quoted "1,234" style content must not split into extra columns
    val html = ps.head.textAsHtml.get
    val headerCells = "<td>".r.findAllIn(html.takeWhile(_ != '/')).size
    assert(html.startsWith("<table><tr>"))
    assert(headerCells >= 1)
  }

  // -- test_partition_csv_with_encoding -------------------------------------------

  test("utf-16 csv decodes through the detected encoding") {
    val (encoding, _) = Encodings.detect(bytes("stanley-cups-utf-16.csv"))
    assert(encoding == "utf-16-be")
    // the python-style codec name also resolves through format_encoding_str
    val cs = graft.functions.Cleaners.formatEncodingStr(encoding)
    assert(cs == java.nio.charset.StandardCharsets.UTF_16BE)
    val ps = Partitioners.partitionCsv(Encodings.decodeText(bytes("stanley-cups-utf-16.csv")))
    assert(ws(ps.head.text) == StanleyText)
  }

  // -- xlsx behaviors -------------------------------------------------------------

  test("stanley-cups.xlsx: sheet name lands in page_name, pages number sheets") {
    val ps = OoxmlPartitioner.partitionXlsx(bytes("stanley-cups.xlsx"))
    assert(ps.size == 4)
    assert(ps(1).pageName.contains("Stanley Cups"))
    assert(ps(1).pageNumber.contains(1))
    assert(ps(3).pageNumber.contains(2))
    assert(ws(ps(1).text) ==
      "Team Location Stanley Cups Blues STL 1 Flyers PHI 2 Maple Leafs TOR 13")
  }

  test("emoji.xlsx: single emoji cell survives as one element") {
    val ps = OoxmlPartitioner.partitionXlsx(bytes("emoji.xlsx"))
    assert(ps.size == 1)
    assert(ws(ps.head.text) == "🤠😅") // 🤠😅
  }

  test("empty.xlsx yields no elements") {
    assert(OoxmlPartitioner.partitionXlsx(bytes("empty.xlsx")).isEmpty)
  }

  test("single-column csv still forms a table") {
    val ps = Partitioners.partitionCsv(csvText("single-column.csv"))
    assert(ps.size == 1)
    assert(ps.head.elementType.contains("Table"))
  }

  // -- test_xlsx.py::test_partition_xlsx_with_find_subtables_False (:308-319) --
  // -- test_partition_xlsx_from_filename_with_header (test_xlsx.py:110) --
  test("include_header=true prepends pandas-style column headings") {
    val els = OoxmlPartitioner.partitionXlsx(
      bytes("stanley-cups.xlsx"), findSubtable = true, includeHeader = true)
    assert(els.size == 2)
    assert(els.forall(_.elementType.contains("Table")))
    assert(els.head.text.replaceAll("\\s+", " ").trim ==
      "Stanley Cups Unnamed: 1 Unnamed: 2 " +
        "Team Location Stanley Cups Blues STL 1 Flyers PHI 2 Maple Leafs TOR 13")
    assert(els.head.textAsHtml.exists(_.contains("<thead>")))
    assert(els.head.textAsHtml.exists(_.contains("<th>Unnamed: 1</th>")))
  }

  // -- test_partition_csv_header (test_csv.py:204-211): the CSV twin of the
  // xlsx header behavior — pandas column labels join text and html, empty
  // labels becoming `Unnamed: <index>` --
  test("csv include_header=true prepends pandas-style column headings") {
    val text = new String(bytes("stanley-cups.csv"),
      java.nio.charset.StandardCharsets.UTF_8)
    val els = Partitioners.partitionCsv(text, includeHeader = true)
    assert(els.size == 1 && els.head.elementType.contains("Table"))
    assert(els.head.text ==
      "Stanley Cups Unnamed: 1 Unnamed: 2 " +
        "Team Location Stanley Cups Blues STL 1 Flyers PHI 2 Maple Leafs TOR 13")
    assert(els.head.textAsHtml.isDefined)
    assert(els.head.textAsHtml.exists(_.contains("Unnamed: 1")))
    // and the default stays header-less (header=None), unchanged
    val plain = Partitioners.partitionCsv(text)
    assert(plain.head.text.startsWith("Stanley Cups Team Location"))
  }

  // -- test_partition_xlsx_with_more_than_1k_cells (test_xlsx.py:291): the
  //    connected-component walk must not blow the stack on a dense sheet --
  test("a worksheet with more than 1k cells partitions without stack overflow") {
    val els = OoxmlPartitioner.partitionXlsx(bytes("more-than-1k-cells.xlsx"))
    assert(els.nonEmpty)
  }

  // -- test_partition_csv_from_filename_infer_table_structure (test_csv.py)
  test("infer_table_structure=false drops text_as_html but keeps the table text") {
    val csv = "Stanley Cups,,\nTeam,Location,Stanley Cups\nBlues,STL,1"
    val on = Partitioners.partitionCsv(csv)
    val off = Partitioners.partitionCsv(csv, inferTableStructure = false)
    assert(on.head.textAsHtml.isDefined)
    assert(off.head.textAsHtml.isEmpty)
    assert(off.head.text == on.head.text)
    assert(off.head.elementType.contains("Table"))
    // tsv variant takes the same flag
    val tsvOff = Partitioners.partitionTsv("a\tb\nc\td", inferTableStructure = false)
    assert(tsvOff.head.textAsHtml.isEmpty)
  }

  // -- test_partition_xlsx_with_find_subtables_False_and_infer_table_structure_False_works
  test("xlsx with find_subtables=false and infer_table_structure=false keeps text only") {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      "/root/reference/example-docs/stanley-cups.xlsx"))
    val out = OoxmlPartitioner.partitionXlsx(bytes, findSubtable = false,
      includeHeader = false, inferTableStructure = false)
    assert(out.nonEmpty)
    assert(out.forall(_.textAsHtml.isEmpty))
    assert(out.exists(_.elementType.contains("Table")))
    // and the html returns when inference is back on
    val on = OoxmlPartitioner.partitionXlsx(bytes, findSubtable = false,
      includeHeader = false, inferTableStructure = true)
    assert(on.exists(_.textAsHtml.isDefined))
  }

  test("find_subtable=false emits one Table per worksheet") {
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/example-docs/stanley-cups.xlsx"))
    val ps = OoxmlPartitioner.partitionXlsx(bytes, findSubtable = false)
    assert(ps.map(_.text) == Seq(
      "Stanley Cups Team Location Stanley Cups Blues STL 1 Flyers PHI 2 Maple Leafs TOR 13",
      "Stanley Cups Since 67 Team Location Stanley Cups Blues STL 1 Flyers PHI 2 Maple" +
        " Leafs TOR 0"))
    assert(ps.forall(_.elementType.contains("Table")))
  }
}
