package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** URL entry point (`partition/auto.py:303-320`): scheme resolution,
  * content-type-driven routing, and the network seam. */
class UrlSourceSpec extends AnyFunSuite {

  test("data: URL with base64 payload and media type routes by content-type") {
    val payload = java.util.Base64.getEncoder.encodeToString(
      "<p>hi there</p>".getBytes("UTF-8"))
    val (ft, paras) = UrlSource.partitionUrl(s"data:text/html;base64,$payload")
    assert(ft == FileType.Html) // un-sniffable without the declared type
    assert(paras.map(_.text) == Seq("hi there"))
  }

  test("data: URL without media type percent-decodes and defaults to text") {
    val (ft, paras) = UrlSource.partitionUrl("data:,This%20is%20a%20note.")
    assert(ft == FileType.Txt)
    assert(paras.map(_.text) == Seq("This is a note."))
  }

  test("non-ASCII literals in a data: payload survive percent-decoding") {
    // literal é (U+00E9), 漢 (above 0xFF), and an emoji surrogate pair mixed
    // with %XX escapes — each must decode intact, not to U+FFFD
    val (ft, paras) = UrlSource.partitionUrl("data:,café%20漢%20😀%20ok")
    assert(ft == FileType.Txt)
    assert(paras.map(_.text) == Seq("café 漢 😀 ok"))
  }

  test("charset parameter is stripped from the content-type") {
    assert(UrlSource.normalizeContentType(Some("text/HTML; charset=utf-8"))
      .contains("text/html"))
    assert(UrlSource.normalizeContentType(Some("")).isEmpty)
  }

  test("file:// URL reads bytes and routes via the path's extension") {
    val tmp = java.nio.file.Files.createTempFile("urlspec-", ".csv")
    try {
      java.nio.file.Files.write(tmp, "a,b\n1,2".getBytes("UTF-8"))
      val (ft, paras) = UrlSource.partitionUrl("file://" + tmp.toAbsolutePath)
      assert(ft == FileType.Csv)
      assert(paras.head.elementType.contains("Table"))
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }

  test("filename hint comes from the URL path, query string excluded") {
    assert(UrlSource.filenameOf("https://x.com/a/b/report.pdf?dl=1") == "report.pdf")
    assert(UrlSource.filenameOf("https://x.com/") == "url")
    assert(UrlSource.filenameOf("data:text/csv;base64,xyz") == "url")
  }

  test("http(s) URLs refuse without a network-capable fetcher, and a custom fetcher works") {
    intercept[UnsupportedOperationException] {
      UrlSource.partitionUrl("https://example.com/page.html")
    }
    val fake = new UrlFetcher {
      def fetch(url: String) =
        ("<html><body><p>remote fetched</p></body></html>".getBytes("UTF-8"),
          Some("text/html; charset=utf-8"))
    }
    val (ft, paras) = UrlSource.partitionUrl("https://example.com/x", fake)
    assert(ft == FileType.Html)
    assert(paras.map(_.text) == Seq("remote fetched"))
  }
}
