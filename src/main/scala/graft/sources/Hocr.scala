package graft.sources

import scala.collection.mutable

/**
 * Tesseract hOCR parsing — the pure slice of
 * `partition/utils/ocr_models/tesseract_ocr.py:110-172`
 * (`hocr_to_dataframe` / `extract_word_from_hocr`): walk `ocrx_word` spans,
 * read the word bbox from the `title` attribute, and assemble each word from
 * its per-character `ocrx_cinfo` spans, dropping characters whose `x_conf`
 * falls below the confidence threshold. A word with no surviving characters
 * (or no bbox) contributes no row.
 *
 * The tesseract invocation itself is the documented OCR seam; this parser is
 * what turns its hOCR payload into the word regions the OCR merge joins.
 */
object Hocr {

  /** One OCR'd word: the reference's dataframe row (left/top/width/height/text). */
  final case class Word(left: Int, top: Int, width: Int, height: Int, text: String)

  private val BboxRe = "bbox (\\d+) (\\d+) (\\d+) (\\d+)".r
  private val XConfRe = "x_conf\\s+(\\d+(?:\\.\\d+)?)".r

  /** `extract_word_from_hocr` (`:148-172`): join the characters whose
    * confidence (x_conf / 100) clears the threshold; empty when the word has
    * no character spans. */
  def extractWordFromSpan(word: HtmlPartitioner.HElem,
      characterConfidenceThreshold: Double = 0.0): String = {
    val chars = mutable.ArrayBuffer.empty[String]
    def walk(e: HtmlPartitioner.HElem): Unit = {
      if (e.attrs.get("class").contains("ocrx_cinfo")) {
        val text = e.children.collect { case HtmlPartitioner.HText(s) => s }.mkString
        val conf = e.attrs.get("title").flatMap(t =>
          XConfRe.findFirstMatchIn(t).map(_.group(1).toDouble / 100.0))
        (conf, Option(text).filter(_.nonEmpty)) match {
          case (Some(p), Some(c)) if p >= characterConfidenceThreshold => chars += c
          case _ => ()
        }
      }
      e.children.foreach { case c: HtmlPartitioner.HElem => walk(c); case _ => () }
    }
    walk(word)
    chars.mkString
  }

  /** `hocr_to_dataframe` (`:110-146`) as a word list. */
  def parse(hocr: String, characterConfidenceThreshold: Double = 0.0): Seq[Word] = {
    if (hocr == null || hocr.isEmpty) return Nil
    val out = mutable.ArrayBuffer.empty[Word]
    def walk(e: HtmlPartitioner.HElem): Unit = {
      if (e.tag == "span" && e.attrs.get("class").contains("ocrx_word")) {
        val title = e.attrs.getOrElse("title", "")
        val text = extractWordFromSpan(e, characterConfidenceThreshold)
        BboxRe.findFirstMatchIn(title).foreach { m =>
          if (text.nonEmpty) {
            val Seq(left, top, right, bottom) = (1 to 4).map(m.group(_).toInt)
            out += Word(left, top, right - left, bottom - top, text)
          }
        }
      } else {
        e.children.foreach { case c: HtmlPartitioner.HElem => walk(c); case _ => () }
      }
    }
    walk(HtmlPartitioner.parse(hocr))
    out.toSeq
  }

  /** `pad_element_bboxes` (`pdf_image/pdf_image_utils.py:85-97`): extend (or
    * shrink, negative padding) every edge outward. */
  def padBbox(bbox: (Double, Double, Double, Double),
      padding: Double): (Double, Double, Double, Double) =
    (bbox._1 - padding, bbox._2 - padding, bbox._3 + padding, bbox._4 + padding)
}
