package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Encoding detection (`file_utils/encoding.py`). */
class EncodingsSpec extends AnyFunSuite {

  import java.nio.charset.StandardCharsets._

  private def bom(b: Int*) = b.map(_.toByte).toArray

  test("format_encoding_str normalizes case/underscores and annotations") {
    assert(Encodings.formatEncodingStr("UTF_8") == "utf-8")
    assert(Encodings.formatEncodingStr("ISO-8859-6-I") == "iso-8859-6")
    assert(Encodings.formatEncodingStr("Shift_JIS") == "shift-jis")
  }

  test("validate_encoding accepts the common list in any spelling") {
    assert(Encodings.validateEncoding("UTF-8"))
    assert(Encodings.validateEncoding("iso_8859_1"))
    assert(!Encodings.validateEncoding("klingon-1"))
  }

  test("BOMs identify utf-8/16/32 in both orders and are stripped") {
    assert(Encodings.detect(bom(0xEF, 0xBB, 0xBF) ++ "x".getBytes(UTF_8)) == (("utf-8", 3)))
    assert(Encodings.detect(bom(0xFF, 0xFE) ++ "x".getBytes(UTF_16LE)) == (("utf-16-le", 2)))
    assert(Encodings.detect(bom(0xFE, 0xFF) ++ "x".getBytes(UTF_16BE)) == (("utf-16-be", 2)))
    assert(Encodings.detect(bom(0xFF, 0xFE, 0, 0))._1 == "utf-32-le")
    assert(Encodings.detect(bom(0, 0, 0xFE, 0xFF))._1 == "utf-32-be")
    assert(Encodings.decodeText(bom(0xFF, 0xFE) ++ "hello wide".getBytes(UTF_16LE))
      == "hello wide")
  }

  test("BOM-less UTF-16 of ASCII text detects from the NUL pattern") {
    assert(Encodings.detect("plain ascii text".getBytes(UTF_16LE))._1 == "utf-16-le")
    assert(Encodings.detect("plain ascii text".getBytes(UTF_16BE))._1 == "utf-16-be")
  }

  test("valid UTF-8 multibyte stays utf-8; invalid falls back to iso-8859-1") {
    assert(Encodings.detect("naïve café".getBytes(UTF_8))._1 == "utf-8")
    val latin = "café".getBytes(ISO_8859_1) // 0xE9 alone is invalid UTF-8
    assert(Encodings.detect(latin)._1 == "iso-8859-1")
    assert(Encodings.decodeText(latin) == "café")
  }

  test("strict decode round-trips every explicit charset it accepts") {
    val text = "Ünïcode — מאיה и русский 中文 done."
    val cases = Seq(
      ("utf-8", text.getBytes("UTF-8")),
      ("utf-16-le", text.getBytes("UTF-16LE")),
      ("utf-16-be", text.getBytes("UTF-16BE")),
      ("utf-16", text.getBytes("UTF-16")), // java UTF-16 writes a BE BOM
      ("utf-32-le", text.getBytes("UTF-32LE")),
      ("utf-32-be", text.getBytes("UTF-32BE")))
    cases.foreach { case (enc, bytes) =>
      assert(Encodings.decodeTextStrict(bytes, enc) == text, enc)
    }
    // underscores/case normalize through format_encoding_str first
    assert(Encodings.decodeTextStrict(text.getBytes("UTF-8"), "UTF_8") == text)
  }

  test("strict decode accepts the annotated RTL charsets via format_encoding_str") {
    // iso-8859-8-i/-e direction annotations strip to the base charset
    // (encoding.py:35-48); the Hebrew bytes from test_core.py:119 decode
    val hebrew = Array[Byte](0xEE.toByte, 0xE0.toByte, 0xE9.toByte, 0xE4.toByte)
    assert(Encodings.decodeTextStrict(hebrew, "iso-8859-8") == "מאיה")
    assert(Encodings.decodeTextStrict(hebrew, "ISO_8859_8-I") == "מאיה")
  }

  test("auto-router sniffs UTF-16 HTML as html, not garbled text") {
    val html = "<html><body><p>wide markup</p></body></html>"
    val bytes = bom(0xFF, 0xFE) ++ html.getBytes(UTF_16LE)
    val (ft, paras) = Partitioners.partitionAuto("page", bytes)
    assert(ft == FileType.Html)
    assert(paras.map(_.text) == Seq("wide markup"))
  }
}
