package graft.sinks

import graft.SparkSuiteBase
import graft.functions.expr.FormulaMarkdown
import graft.model.{Element, ElementMetadata, ElementType}
import org.apache.spark.sql.functions.{col, lit}

/**
 * Behavior suite ported from `test_unstructured/staging/test_base.py` — the
 * serde codec, `flatten_dict`, and the `element_to_md` render family
 * (formula styles, normalization, binary exclusion).
 */
class StagingBaseSpec extends SparkSuiteBase {

  // The reference suite's zlib-compressed fixture: [Title("Lorem"),
  // UncategorizedText("Lorem Ipsum")] (test_base.py:41-52).
  private val fixtureB64 =
    "eJyFzcsKwjAQheFXKVm7yDS3xjcQXNaViKTJjBR6o46glr67zVI3Lmf4Dv95EdhhjwNf2yT2hYDGUaWtJVm5WDoq" +
    "NUL0UoJrqtLHJHaF6JFDChw2v6zbzfjkvD2OM/YZ8GvC/Khb7lBs5LcilUwRyCsblQYTiBQpZRxYZcCA/1spDtP9" +
    "8dU6DTEw3sa5fWOqs10vH0cLQn0="

  test("base64 gzipped json deserializes the reference's compressed fixture") {
    val json = ElementJson.gunzipBase64(fixtureB64)
    assert(json.contains("\"text\": \"Lorem\""))
    assert(json.contains("\"type\": \"Title\""))
    assert(json.contains("\"text\": \"Lorem Ipsum\""))
    assert(json.contains("\"type\": \"UncategorizedText\""))
  }

  test("truncated compressed payload raises instead of returning partial data") {
    val full = java.util.Base64.getDecoder.decode(fixtureB64)
    val truncated = java.util.Base64.getEncoder.encodeToString(full.dropRight(6))
    intercept[java.util.zip.ZipException] { ElementJson.gunzipBase64(truncated) }
  }

  test("decompression past the size cap raises DecompressedSizeExceededException") {
    intercept[ElementJson.DecompressedSizeExceededException] {
      ElementJson.gunzipBase64(fixtureB64, maxBytes = 32)
    }
  }

  test("serialize then deserialize is a round-trip (zlib wire form)") {
    val els = Seq(
      Element("id-a", ElementType.Title, "Lorem", "d", 1, ElementMetadata()),
      Element("id-b", ElementType.UncategorizedText, "Lorem Ipsum", "d", 2, ElementMetadata()))
    val b64 = ElementJson.encodeOrigElements(els)
    // reference-interop: the payload must be zlib (0x78 first byte), not gzip
    val firstByte = java.util.Base64.getDecoder.decode(b64)(0) & 0xFF
    assert(firstByte == 0x78)
    val json = ElementJson.decodeOrigElementsJson(b64)
    assert(json.contains("\"Lorem\"") && json.contains("\"Lorem Ipsum\""))
  }

  // -- flatten_dict (test_base.py:422-572) ------------------------------------

  private def fd(d: Seq[(String, Any)], flattenLists: Boolean = false,
      removeNone: Boolean = false, keysToOmit: Seq[String] = Nil,
      separator: String = "_"): Map[String, Any] =
    Staging.flattenDict(d, separator = separator, flattenLists = flattenLists,
      removeNone = removeNone, keysToOmit = keysToOmit)

  test("flatten_dict: simple dictionary is unchanged") {
    assert(fd(Seq("a" -> 1, "b" -> 2, "c" -> 3)) == Map("a" -> 1, "b" -> 2, "c" -> 3))
  }

  test("flatten_dict: nested dictionary flattens with underscore") {
    assert(fd(Seq("a" -> 1, "b" -> Map("c" -> 2, "d" -> 3), "e" -> 4)) ==
      Map("a" -> 1, "b_c" -> 2, "b_d" -> 3, "e" -> 4))
  }

  test("flatten_dict: lists stay intact by default") {
    assert(fd(Seq("a" -> 1, "b" -> Seq(2, 3, 4), "c" -> Map("d" -> 5, "e" -> Seq(6, 7)))) ==
      Map("a" -> 1, "b" -> Seq(2, 3, 4), "c_d" -> 5, "c_e" -> Seq(6, 7)))
  }

  test("flatten_dict: omitted key keeps its unflattened value") {
    val nested = Map("c" -> 2, "d" -> 3)
    assert(fd(Seq("a" -> 1, "b" -> nested, "e" -> 3), keysToOmit = Seq("b")) ==
      Map("a" -> 1, "b" -> nested, "e" -> 3))
  }

  test("flatten_dict: alternate separator") {
    assert(fd(Seq("a" -> 1, "b" -> Map("c" -> 2, "d" -> 3), "e" -> 4), separator = "-") ==
      Map("a" -> 1, "b-c" -> 2, "b-d" -> 3, "e" -> 4))
  }

  test("flatten_dict: flatten_lists expands to indexed keys") {
    assert(fd(Seq("a" -> 1, "b" -> Seq(2, 3, 4), "c" -> Map("d" -> 5, "e" -> Seq(6, 7))),
      flattenLists = true) ==
      Map("a" -> 1, "b_0" -> 2, "b_1" -> 3, "b_2" -> 4, "c_d" -> 5, "c_e_0" -> 6, "c_e_1" -> 7))
  }

  test("flatten_dict: flatten_lists with omitted top-level key") {
    val nested = Map("d" -> 5, "e" -> Seq(6, 7))
    assert(fd(Seq("a" -> 1, "b" -> Seq(2, 3, 4), "c" -> nested),
      flattenLists = true, keysToOmit = Seq("c")) ==
      Map("a" -> 1, "b_0" -> 2, "b_1" -> 3, "b_2" -> 4, "c" -> nested))
  }

  test("flatten_dict: flatten_lists + omit + remove_none") {
    val nested = Map("d" -> null, "e" -> Seq(6, 7))
    assert(fd(Seq("a" -> null, "b" -> Seq(2, 3, 4), "c" -> nested),
      flattenLists = true, removeNone = true, keysToOmit = Seq("c")) ==
      Map("b_0" -> 2, "b_1" -> 3, "b_2" -> 4, "c" -> nested))
  }

  test("flatten_dict: flatten_lists + remove_none drops null nested values") {
    assert(fd(Seq("a" -> null, "b" -> Seq(2, 3, 4), "c" -> Map("d" -> null, "e" -> Seq(6, 7))),
      flattenLists = true, removeNone = true) ==
      Map("b_0" -> 2, "b_1" -> 3, "b_2" -> 4, "c_e_0" -> 6, "c_e_1" -> 7))
  }

  test("flatten_dict: null inside a flattened list is removed") {
    assert(fd(Seq("a" -> 1, "b" -> Seq(2, 3, 4), "c" -> Map("d" -> null, "e" -> Seq(6, null))),
      flattenLists = true, removeNone = true) ==
      Map("a" -> 1, "b_0" -> 2, "b_1" -> 3, "b_2" -> 4, "c_e_0" -> 6))
  }

  test("flatten_dict: omitting a list key keeps the list") {
    assert(fd(Seq("a" -> 1, "b" -> Seq(2, 3, 4), "c" -> Map("d" -> 5, "e" -> Seq(6, 7))),
      flattenLists = true, keysToOmit = Seq("b")) ==
      Map("a" -> 1, "b" -> Seq(2, 3, 4), "c_d" -> 5, "c_e_0" -> 6, "c_e_1" -> 7))
  }

  test("flatten_dict: omitting a nested list key by flattened address") {
    assert(fd(Seq("a" -> 1, "b" -> Seq(2, 3, 4), "c" -> Map("d" -> 5, "e" -> Seq(6, 7))),
      flattenLists = true, keysToOmit = Seq("c_e")) ==
      Map("a" -> 1, "b_0" -> 2, "b_1" -> 3, "b_2" -> 4, "c_d" -> 5, "c_e" -> Seq(6, 7)))
  }

  test("flatten_dict: omitting a nested dict key by flattened address") {
    val inner = Map("f" -> 6, "g" -> 7)
    assert(fd(Seq("a" -> 1, "b" -> Seq(2, 3, 4), "c" -> Map("d" -> 5, "e" -> inner)),
      flattenLists = true, keysToOmit = Seq("c_e")) ==
      Map("a" -> 1, "b_0" -> 2, "b_1" -> 3, "b_2" -> 4, "c_d" -> 5, "c_e" -> inner))
  }

  test("flatten_dict: empty dictionary") {
    assert(fd(Nil) == Map.empty[String, Any])
  }

  test("flatten_dict: empty lists survive") {
    assert(fd(Seq("a" -> Seq(), "b" -> Map("c" -> Seq()))) ==
      Map("a" -> Seq(), "b_c" -> Seq()))
  }

  // -- element_to_md dispatch (test_base.py:575-652) --------------------------

  /** Evaluates `ElementSink.elementMd` over a one-row frame. */
  private def mdOf(tpe: String, text: String, html: Option[String] = None,
      b64: Option[String] = None, mime: Option[String] = None,
      url: Option[String] = None, excludeBinary: Boolean = false,
      normalize: Boolean = true, style: String = FormulaMarkdown.Auto): String = {
    import spark.implicits._
    def l(o: Option[String]) = o.map(lit).getOrElse(lit(null).cast("string"))
    Seq(text).toDF("text")
      .select(ElementSink.elementMd(lit(tpe), col("text"), l(html), l(b64), l(mime),
        l(url), excludeBinary, normalize, style).as("md"))
      .head().getString(0)
  }

  private val png1x1 =
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkYPhfDwAChwGA60e6kgAAAABJRU5ErkJggg=="

  test("element_to_md: title renders as h1 heading") {
    assert(mdOf(ElementType.Title, "Test Title") == "# Test Title")
  }

  test("element_to_md: narrative text renders bare") {
    assert(mdOf(ElementType.NarrativeText, "This is some narrative text.") ==
      "This is some narrative text.")
  }

  test("element_to_md: formula with LaTeX commands wraps in display math") {
    assert(mdOf(ElementType.Formula, "\\int_a^b x^2 dx") == "$$\n\\int_a^b x^2 dx\n$$")
  }

  test("element_to_md: image with base64 + mime renders a data URL") {
    assert(mdOf(ElementType.Image, "Test Image", b64 = Some(png1x1),
      mime = Some("image/png")) ==
      s"![Test Image](data:image/png;base64,$png1x1)")
  }

  test("element_to_md: image with base64 and no mime uses image/* placeholder") {
    assert(mdOf(ElementType.Image, "Test Image", b64 = Some(png1x1)) ==
      s"![Test Image](data:image/*;base64,$png1x1)")
  }

  test("element_to_md: exclude_binary_image_data falls back to bare text") {
    assert(mdOf(ElementType.Image, "Test Image", b64 = Some(png1x1),
      mime = Some("image/png"), excludeBinary = true) == "Test Image")
  }

  test("element_to_md: exclude_binary still renders image_url if present") {
    assert(mdOf(ElementType.Image, "Test Image", b64 = Some(png1x1),
      mime = Some("image/png"), url = Some("https://example.com/image.jpg"),
      excludeBinary = true) == "![Test Image](https://example.com/image.jpg)")
  }

  test("element_to_md: image with url renders a link image") {
    assert(mdOf(ElementType.Image, "Test Image",
      url = Some("https://example.com/image.jpg")) ==
      "![Test Image](https://example.com/image.jpg)")
  }

  test("element_to_md: table uses text_as_html when present, else text") {
    assert(mdOf(ElementType.Table, "Table Text",
      html = Some("<table><tr><td>Test</td></tr></table>")) ==
      "<table><tr><td>Test</td></tr></table>")
    assert(mdOf(ElementType.Table, "Table Text") == "Table Text")
  }

  // -- formula markdown styles (test_base.py:654-828) -------------------------

  test("formula: normalizes common math symbols inside display blocks") {
    assert(FormulaMarkdown.renderString("x ∈ A and y ≤ z and a × b = c") ==
      "$$\nx \\in{} A and y \\leq{} z and a \\times{} b = c\n$$")
  }

  test("formula: normalization can be disabled") {
    assert(FormulaMarkdown.renderString("x ∈ A and y ≤ z and a × b = c",
      normalize = false) == "$$\nx ∈ A and y ≤ z and a × b = c\n$$")
  }

  test("formula: unicode square root is preserved, not rewritten") {
    assert(FormulaMarkdown.renderString("√2") == "$$\n√2\n$$")
    assert(FormulaMarkdown.renderString("√(x+1)") == "$$\n√(x+1)\n$$")
    assert(FormulaMarkdown.renderString("√2 ≤ x") == "$$\n√2 \\leq{} x\n$$")
  }

  test("formula: auto stays plain for noisy OCR") {
    val text = "_ CRo—CR O= OR"
    assert(FormulaMarkdown.renderString(text) == text)
  }

  test("formula: auto stays plain when text embeds dollar delimiters") {
    assert(FormulaMarkdown.renderString("a $$ b") == "a $$ b")
    assert(FormulaMarkdown.renderString("inline $x$ math") == "inline $x$ math")
  }

  test("formula: display_math falls back to raw on unsafe delimiters") {
    assert(FormulaMarkdown.renderString("a $$ b",
      style = FormulaMarkdown.DisplayMath) == "a $$ b")
  }

  test("formula: display_math wraps where auto would stay plain") {
    assert(FormulaMarkdown.renderString("x = 1") == "x = 1")
    assert(FormulaMarkdown.renderString("x = 1",
      style = FormulaMarkdown.DisplayMath) == "$$\nx = 1\n$$")
  }

  test("formula: prose-style caption stays plain") {
    val text = "The corrosion rate (CR) was calculated using Eq. (1) " +
      "and we reference [1–5] for detail in this manuscript."
    assert(FormulaMarkdown.renderString(text) == text)
  }

  test("formula: invalid style raises") {
    val e = intercept[IllegalArgumentException] {
      FormulaMarkdown.renderString("x=1", style = "nope")
    }
    assert(e.getMessage.contains("formula_markdown_style"))
  }

  test("formula: plain style emits text only and never normalizes") {
    assert(FormulaMarkdown.renderString("x ∈ A", style = FormulaMarkdown.Plain) == "x ∈ A")
    assert(FormulaMarkdown.renderString("x ∈ A", normalize = false,
      style = FormulaMarkdown.Plain) == "x ∈ A")
  }

  test("formula: plain never normalizes the unicode minus") {
    assert(FormulaMarkdown.renderString("a − b",
      style = FormulaMarkdown.Plain) == "a − b")
  }

  test("formula: brace boundary prevents command fusing after symbol") {
    assert(FormulaMarkdown.renderString("x∈S",
      style = FormulaMarkdown.DisplayMath) == "$$\nx\\in{}S\n$$")
  }

  test("formula: prose with one symbol scores below the wrap threshold") {
    val text = "E ≤ threshold where E is the energy and threshold was determined " +
      "experimentally in the laboratory setup described above herein."
    assert(FormulaMarkdown.renderString(text) == text)
  }

  test("formula: auto + normalize disabled still wraps high-scoring text") {
    assert(FormulaMarkdown.renderString("x ∈ A", normalize = false) == "$$\nx ∈ A\n$$")
  }

  // -- elements_to_md flag propagation (test_base.py:696-878) -----------------

  test("elements_to_md propagates formula style and normalization flags") {
    import spark.implicits._
    val els = Seq(
      Element("e1", ElementType.Formula, "x ∈ A", "d", 1, ElementMetadata()))
    val ds = els.toDS()
    def mdWith(style: String, normalize: Boolean = true): String =
      ElementSink.elementsToMd(ds, normalizeFormula = normalize, formulaStyle = style)
        .head().getAs[String]("markdown")
    assert(mdWith(FormulaMarkdown.Plain) == "x ∈ A")
    assert(mdWith(FormulaMarkdown.Auto) == "$$\nx \\in{} A\n$$")
    assert(mdWith(FormulaMarkdown.Auto, normalize = false) == "$$\nx ∈ A\n$$")
    assert(mdWith(FormulaMarkdown.DisplayMath) == "$$\nx \\in{} A\n$$")
  }

  test("elements_to_md: formula document renders equation after narrative") {
    import spark.implicits._
    val els = Seq(
      Element("e1", ElementType.NarrativeText, "See equation below.", "d", 1,
        ElementMetadata()),
      Element("e2", ElementType.Formula, "E = mc^2", "d", 2, ElementMetadata()))
    val md = ElementSink.elementsToMd(els.toDS()).head().getAs[String]("markdown")
    assert(md == "See equation below.\n$$\nE = mc^2\n$$")
  }

  test("elements_to_md: exclude_binary strips data URLs document-wide") {
    import spark.implicits._
    val els = Seq(
      Element("e1", ElementType.Title, "Doc", "d", 1, ElementMetadata()),
      Element("e2", ElementType.Image, "A Picture", "d", 2,
        ElementMetadata(image_base64 = Some(png1x1),
          image_mime_type = Some("image/png"))))
    val withBinary = ElementSink.elementsToMd(els.toDS())
      .head().getAs[String]("markdown")
    val without = ElementSink.elementsToMd(els.toDS(), excludeBinary = true)
      .head().getAs[String]("markdown")
    assert(withBinary == s"# Doc\n![A Picture](data:image/png;base64,$png1x1)")
    assert(without == "# Doc\nA Picture")
  }
}
