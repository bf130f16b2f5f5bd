package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/**
 * `detect_filetype` behavior ports (`test_unstructured/file_utils/
 * test_filetype.py`) over the reference's own example docs. Detection is a pure
 * function of (filename, head bytes, asserted content-type) — no Spark needed.
 */
class FileTypeDetectionSpec extends AnyFunSuite {

  private def refDoc(name: String): Array[Byte] =
    Files.readAllBytes(Paths.get(s"/root/reference/example-docs/$name"))

  private def detectBytes(name: String, ct: Option[String] = None): FileType =
    DetectFiletype.detect(name, refDoc(name), ct)

  // -- STRATEGY 1: CFB/ZIP subtypes by direct inspection (test_filetype.py:54-69).
  // -- The reference asserts MIME-guessing is never consulted; here the name is
  // -- blanked so only container magic can answer.
  private val containerCases = Seq(
    "fake-email.msg" -> FileType.Msg,
    "fake-power-point.ppt" -> FileType.Ppt,
    "fake.doc" -> FileType.Doc,
    "tests-example.xls" -> FileType.Xls,
    "fake-power-point.pptx" -> FileType.Pptx,
    "fake.docx" -> FileType.Docx,
    "simple.odt" -> FileType.Odt,
    "stanley-cups.xlsx" -> FileType.Xlsx,
    "winter-sports.epub" -> FileType.Epub)

  containerCases.foreach { case (name, expected) =>
    test(s"container magic alone detects $name as ${expected.name}") {
      assert(DetectFiletype.detect("", refDoc(name)) == expected)
    }
  }

  // -- STRATEGY 2: asserted content-type, no filename (test_filetype.py:114-152)
  private val contentTypeCases = Seq(
    ("img/bmp_24.bmp", "image/bmp", FileType.Bmp),
    ("stanley-cups.csv", "text/csv", FileType.Csv),
    ("eml/fake-email.eml", "message/rfc822", FileType.Eml),
    ("img/DA-1p.heic", "image/heic", FileType.Heic),
    ("example-10k-1p.html", "text/html", FileType.Html),
    ("img/DA-1p.jpg", "image/jpeg", FileType.Jpg),
    ("README.md", "text/markdown", FileType.Md),
    ("README.org", "text/org", FileType.Org),
    ("pdf/layout-parser-paper-fast.pdf", "application/pdf", FileType.Pdf),
    ("img/DA-1p.png", "image/png", FileType.Png),
    ("README.rst", "text/x-rst", FileType.Rst),
    ("fake-doc.rtf", "text/rtf", FileType.Rtf),
    ("img/layout-parser-paper-fast.tiff", "image/tiff", FileType.Tiff),
    ("stanley-cups.tsv", "text/tsv", FileType.Tsv),
    ("norwich-city.txt", "text/plain", FileType.Txt),
    ("CantinaBand3.wav", "audio/wav", FileType.Wav),
    ("factbook.xml", "application/xml", FileType.Xml),
    ("simple.zip", "application/zip", FileType.Zip),
    ("spring-weather.html.ndjson", "application/x-ndjson", FileType.Ndjson))

  contentTypeCases.foreach { case (name, ct, expected) =>
    test(s"asserted $ct detects a nameless ${expected.name} stream") {
      assert(DetectFiletype.detect("", refDoc(name), Some(ct)) == expected)
    }
  }

  // -- JSON/NDJSON disambiguation (test_filetype.py:153-166, 430-452, 1069-1108)

  test("NDJSON content-type on a nameless stream is trusted") {
    assert(DetectFiletype.detect("", refDoc("simple.ndjson"),
      Some("application/x-ndjson")) == FileType.Ndjson)
  }

  test("JSON content-type on ndjson content disambiguates to NDJSON") {
    assert(detectBytes("simple.ndjson", Some("application/json")) == FileType.Ndjson)
    // even when the filename carries a wrong extension (test_filetype.py:1095)
    assert(DetectFiletype.detect("filename.pdf", refDoc("simple.ndjson"),
      Some("application/json")) == FileType.Ndjson)
  }

  test("json/ndjson content detects correctly without extension") {
    assert(DetectFiletype.detect("", refDoc("simple.ndjson")) == FileType.Ndjson)
    assert(DetectFiletype.detect("", refDoc("spring-weather.html.json")) == FileType.Json)
  }

  test("json/ndjson content detects correctly with extension") {
    assert(detectBytes("simple.ndjson") == FileType.Ndjson)
    assert(detectBytes("spring-weather.html.json") == FileType.Json)
  }

  test("content sniff beats a misleading .pdf filename for JSON payloads") {
    val json = """[{"example": "data"}]""".getBytes("UTF-8")
    assert(DetectFiletype.detect("filename.pdf", json) == FileType.Json)
    val ndjson = Seq("""{"example": "data1"}""", """{"example": "data2"}""",
      """{"example": "data3"}""").mkString("", "\n", "\n").getBytes("UTF-8")
    assert(DetectFiletype.detect("filename.pdf", ndjson) == FileType.Ndjson)
  }

  test("a complete single-line object counts as 1-record NDJSON") {
    assert(DetectFiletype.isNdjsonProcessable("""{"a": 1}"""))
    // a pretty-printed object's first line is a bare fragment — JSON, not NDJSON
    assert(!DetectFiletype.isNdjsonProcessable("{\n  \"a\": 1\n}"))
    // arrays are never NDJSON
    assert(!DetectFiletype.isNdjsonProcessable("""[{"a": 1}]"""))
  }

  // -- content-type rule-outs (test_filetype.py:405-409)

  test("asserted XLS content-type is ignored when the file is CSV text") {
    for (mime <- Seq("application/vnd.ms-excel", "application/msexcel"))
      assert(detectBytes("stanley-cups.csv", Some(mime)) == FileType.Csv)
  }

  test("asserted DOCX content-type is ruled out for a plain-text file") {
    assert(detectBytes("fake-text.txt", Some(
      "application/vnd.openxmlformats-officedocument.wordprocessingml.document")) ==
      FileType.Txt)
  }

  // -- XML mime + html extension refinement (test_filetype.py:412-427)

  test("xml mime with .html/.htm extension resolves to HTML") {
    for (mime <- Seq("application/xml", "text/xml"); ext <- Seq(".html", ".htm"))
      assert(DetectFiletype.detect(s"a/b/page$ext", refDoc("example-10k-1p.html"),
        Some(mime)) == FileType.Html)
  }

  // -- extension strategy (test_filetype.py:366-402)

  private val extensionCases = Seq(
    "stanley-cups.csv" -> FileType.Csv,
    "eml/fake-email.eml" -> FileType.Eml,
    "example-10k-1p.html" -> FileType.Html,
    "README.md" -> FileType.Md,
    "README.org" -> FileType.Org,
    "README.rst" -> FileType.Rst,
    "fake-doc.rtf" -> FileType.Rtf,
    "stanley-cups.tsv" -> FileType.Tsv,
    "fake-text.txt" -> FileType.Txt,
    "factbook.xml" -> FileType.Xml)

  extensionCases.foreach { case (name, expected) =>
    test(s"extension routes $name to ${expected.name} with no content-type") {
      assert(detectBytes(name) == expected)
    }
  }

  // -- source-code and unknown text subtypes resolve to TXT (test_filetype.py:455-476)

  test("source-code files detect as plain text") {
    assert(detectBytes("logger.py", Some("text/x-script.python")) == FileType.Txt)
    assert(detectBytes("fake.go", Some("text/x-go")) == FileType.Txt)
    assert(detectBytes("fake-text.txt", Some("application/x-javascript")) == FileType.Txt)
  }

  test("an unknown guessed text subtype falls back to TXT") {
    assert(detectBytes("fake-text.txt", Some("text/new-type")) == FileType.Txt)
  }

  // -- EMPTY detection (test_filetype.py:483-489)

  test("a zero-byte input detects as EMPTY regardless of name") {
    assert(DetectFiletype.detect("empty.txt", Array.emptyByteArray) == FileType.Empty)
    assert(DetectFiletype.detect("", Array.emptyByteArray) == FileType.Empty)
  }

  // -- CSV with escaped commas (test_filetype.py:492-497)

  test("CSV detection survives escaped commas, from path and nameless") {
    assert(detectBytes("csv-with-escaped-commas.csv") == FileType.Csv)
    assert(DetectFiletype.detect("", refDoc("csv-with-escaped-commas.csv")) == FileType.Csv)
  }

  test("quote-aware comma counting drives the CSV sniff") {
    assert(DetectFiletype.looksLikeCsv("a,b,c\n1,2,3\n4,5,6"))
    assert(DetectFiletype.looksLikeCsv("a,b\n\"x, y\",2\n\"z, w\",3"))
    assert(!DetectFiletype.looksLikeCsv("a,b\nno commas here"))
    assert(!DetectFiletype.looksLikeCsv("only,one,line"))
    assert(!DetectFiletype.looksLikeCsv("a,b,c\n1,2"))
  }

  // -- _TextFileDifferentiator edges (test_filetype.py:972-1045): the CSV rule
  // -- needs a header plus one data row with 2+ columns; JSON must be a
  // -- container, not a bare scalar; broken UTF-8 falls through to TXT
  test("text differentiator edges: invalid UTF-8, scalar JSON, minimal CSV") {
    assert(DetectFiletype.detect("",
      Array('d'.toByte, 0xe2.toByte, 0x80.toByte)) == FileType.Txt)
    assert(DetectFiletype.detect("", "\"This is not a JSON\"".getBytes) == FileType.Txt)
    assert(DetectFiletype.detect("",
      "column1,column2,column3\nvalue1,value2,value3\n".getBytes) == FileType.Csv)
    assert(DetectFiletype.detect("", "[{\"key\": \"value\"}]".getBytes) == FileType.Json)
  }

  // -- _TextFileDifferentiator._is_eml on real example docs (:1019-1026)
  test("EML distinguishes from plain text by content alone") {
    assert(DetectFiletype.detect("", refDoc("eml/fake-email.eml")) == FileType.Eml)
    assert(DetectFiletype.detect("", refDoc("norwich-city.txt")) == FileType.Txt)
    // Describe_OleFileDetector/_ZipFileDetector: a non-container (README.org)
    // resolves through the text chain, not the container detectors
    assert(DetectFiletype.detect("", refDoc("README.org")) == FileType.Txt)
  }

  // -- GOOGLE_DRIVE_EXPORT_TYPES (file_utils/google_filetype.py): native
  // -- Google-Apps MIME types resolve to their Drive export format
  test("google-apps content types resolve to their export file types") {
    assert(FileType.fromMimeType("application/vnd.google-apps.document")
      .contains(FileType.Docx))
    assert(FileType.fromMimeType("application/vnd.google-apps.spreadsheet")
      .contains(FileType.Xlsx))
    assert(FileType.fromMimeType("application/vnd.google-apps.presentation")
      .contains(FileType.Pptx))
    assert(FileType.fromMimeType("application/vnd.google-apps.photo")
      .contains(FileType.Jpg))
  }

  // -- non-standard OPC prefix (test_filetype.py:1111-1115)

  test("office365 docx with non-standard archive prefix detects as DOCX") {
    val path = "/root/reference/test_unstructured/testfiles/file_type/" +
      "test_document_from_office365.docx"
    val bytes = Files.readAllBytes(Paths.get(path))
    assert(DetectFiletype.detect("", bytes) == FileType.Docx)
  }

  // -- audio family magic detection (`file_utils/model.py:296-521`) ----------
  test("audio magics: flac, ogg, opus, webm, mp3, m4a") {
    import DetectFiletype.detect
    assert(detect("a.bin", "fLaC\u0000\u0000\u0000\u0022".getBytes("ISO-8859-1")) ==
      FileType.Flac)
    val ogg = ("OggS" + "\u0000" * 24 + "vorbisxx").getBytes("ISO-8859-1")
    assert(detect("a.bin", ogg) == FileType.Ogg)
    val opus = ("OggS" + "\u0000" * 24 + "OpusHead").getBytes("ISO-8859-1")
    assert(detect("a.bin", opus) == FileType.Opus)
    val webm = Array(0x1A, 0x45, 0xDF, 0xA3, 0x01, 0x00, 0x00, 0x00).map(_.toByte)
    assert(detect("a.bin", webm) == FileType.Webm)
    assert(detect("a.bin", ("ID3\u0003" + "\u0000" * 8).getBytes("ISO-8859-1")) ==
      FileType.Mp3)
    // a bare frame-sync stays undetected (0xFFFE would collide with UTF-16 BOMs)
    assert(detect("a.mp3", Array(0xFF, 0xFB, 0x90, 0x00).map(_.toByte)) == FileType.Mp3)
    val m4a = ("\u0000\u0000\u0000\u0020ftypM4A \u0000\u0000\u0000\u0000").getBytes("ISO-8859-1")
    assert(detect("a.bin", m4a) == FileType.M4a)
    // extension fallback when the payload is headerless
    assert(detect("x.opus", Array[Byte]()) == FileType.Empty)
  }
}
