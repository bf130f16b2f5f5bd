package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/**
 * Behavior port of the hOCR cases in
 * `test_unstructured/partition/pdf_image/test_ocr.py:559-624` plus
 * `test_pad_element_bboxes` — the tesseract word-assembly parser over the
 * reference's synthesized hOCR spans.
 */
class HocrSpec extends AnyFunSuite {

  /** `_create_hocr_word_span` (`test_ocr.py:538-556`). */
  private def hocrWordSpan(characters: Seq[(String, String)],
      bbox: (Int, Int, Int, Int)): String = {
    val sb = new StringBuilder
    sb.append("<root xmlns=\"http://www.w3.org/1999/xhtml\" xml:lang=\"en\" lang=\"en\">\n")
    sb.append(s"<span class='ocrx_word' title='bbox ${bbox._1} ${bbox._2} " +
      s"${bbox._3} ${bbox._4}; x_wconf 64'>")
    characters.foreach { case (c, conf) =>
      sb.append(s"<span class='ocrx_cinfo' title='x_bboxes 0 0 0 0; x_conf $conf'>$c</span>")
    }
    sb.append("</span></root>")
    sb.toString
  }

  private val characters = Seq(
    ("w", "99.0"), ("o", "98.5"), ("r", "97.5"), ("d", "96.0"),
    ("!", "50.0"), ("@", "45.0"))
  private val wordBbox = (10, 9, 70, 22)

  test("extract_word_from_hocr filters characters by confidence") {
    val hocr = hocrWordSpan(characters, wordBbox)
    def at(threshold: Double): String =
      Hocr.parse(hocr, threshold).headOption.map(_.text).getOrElse("")
    assert(at(0.0) == "word!@")
    assert(at(0.960) == "word")
    assert(at(0.990) == "w")
    assert(at(0.999) == "") // word dropped entirely
  }

  test("hocr_to_dataframe row shape: bbox converts to left/top/width/height") {
    val words = Hocr.parse(hocrWordSpan(characters, wordBbox), 0.960)
    assert(words.length == 1)
    val w = words.head
    assert(w.left == 10 && w.top == 9 && w.width == 60 && w.height == 13)
    assert(w.text == "word")
  }

  test("empty hocr parses to no words") {
    assert(Hocr.parse("").isEmpty)
    assert(Hocr.parse("", 0.5).isEmpty)
  }

  test("pad_element_bboxes vectors") {
    val b = (10.0, 20.0, 30.0, 40.0)
    assert(Hocr.padBbox(b, 5) == ((5.0, 15.0, 35.0, 45.0)))
    assert(Hocr.padBbox(b, -3) == ((13.0, 23.0, 27.0, 37.0)))
    assert(Hocr.padBbox(b, 2.5) == ((7.5, 17.5, 32.5, 42.5)))
    assert(Hocr.padBbox(b, -1.5) == ((11.5, 21.5, 28.5, 38.5)))
  }
}
