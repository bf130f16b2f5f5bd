package graft.sources

import java.util.zip.Inflater

import scala.collection.mutable

import graft.sources.HtmlPartitioner.RawPara

/**
 * `partition_pdf` FAST strategy (`/root/reference/unstructured/partition/pdf.py:430-588`
 * — pdfminer text extraction) re-implemented as a minimal native content-stream
 * reader: FlateDecode streams are inflated with `java.util.zip.Inflater`, text
 * rendered by `Tj`/`'`/`TJ` operators is decoded (paren strings with escapes +
 * octal, hex strings), line breaks derived from `Td`/`TD`/`Tm`/`T*` y-motion, and
 * the per-page text then flows through the same paragraph-split + classifier
 * cascade as `partition_text`.
 *
 * Scope (documented): simple fonts with ASCII-compatible encodings — the 80% fast
 * path. CID/Type0-composite fonts, encrypted PDFs and scanned pages need the
 * hi_res/OCR strategies, which remain pluggable external-model traits (the
 * reference also shells out for those).
 */
object PdfPartitioner {

  private[sources] val StreamRe = "(?s)stream\r?\n(.*?)endstream".r

  def isPdf(bytes: Array[Byte]): Boolean =
    bytes.length > 4 && bytes(0) == '%' && bytes(1) == 'P' && bytes(2) == 'D' && bytes(3) == 'F'

  private[sources] def inflate(data: Array[Byte]): Option[Array[Byte]] = {
    val inf = new Inflater()
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(data.length * 4)
      val buf = new Array[Byte](8192)
      var n = inf.inflate(buf)
      var guard = 0
      while (n > 0 && guard < 100000) { out.write(buf, 0, n); n = inf.inflate(buf); guard += 1 }
      if (out.size() == 0) None else Some(out.toByteArray)
    } catch { case _: Exception => None } finally inf.end()
  }

  /** Decode a PDF paren-string body: escapes `\\ \( \) \n \r \t` + octal `\ddd`. */
  private[sources] def decodePdfString(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        val n = s.charAt(i + 1)
        n match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'b' | 'f' => i += 2
          case '(' | ')' | '\\' => sb.append(n); i += 2
          case d if d >= '0' && d <= '7' =>
            val end = math.min(i + 4, s.length)
            val oct = s.substring(i + 1, end).takeWhile(ch => ch >= '0' && ch <= '7').take(3)
            sb.append(Integer.parseInt(oct, 8).toChar)
            i += 1 + oct.length
          case '\n' => i += 2 // line continuation
          case _ => i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  // text-showing / positioning operator scan within a BT..ET block
  private val TokenRe =
    ("""\(((?:[^()\\]|\\.)*)\)\s*(Tj|')""" + // (s) Tj  or  (s) '
      """|<([0-9A-Fa-f\s]+)>\s*Tj""" + // <hex> Tj
      """|\[((?:\((?:[^()\\]|\\.)*\)|<[0-9A-Fa-f\s]*>|[-0-9.\s])*)\]\s*TJ""" + // [..] TJ
      """|(-?[0-9.]+)\s+(-?[0-9.]+)\s+(Td|TD)""" +
      """|(?:-?[0-9.]+\s+){4}(-?[0-9.]+)\s+(-?[0-9.]+)\s+Tm""" +
      """|T\*""").r

  private val TjPartRe = """\(((?:[^()\\]|\\.)*)\)|(-?[0-9.]+)""".r

  private def decodeHex(h: String): String = {
    val clean = h.replaceAll("\\s", "")
    val sb = new StringBuilder
    var i = 0
    while (i + 1 < clean.length) {
      sb.append(Integer.parseInt(clean.substring(i, i + 2), 16).toChar)
      i += 2
    }
    sb.toString
  }

  /** Extract reading text from one decompressed content stream: lines split on
    * y-motion, words joined in operator order. */
  private[sources] def extractText(content: String): String = {
    val lines = mutable.ArrayBuffer.empty[StringBuilder]
    var cur = new StringBuilder
    def newLine(): Unit = { if (cur.nonEmpty) lines += cur; cur = new StringBuilder }
    var lastY = Double.NaN
    TokenRe.findAllMatchIn(content).foreach { m =>
      if (m.matched == "T*") newLine()
      else if (m.group(1) != null) { // (s) Tj or '
        if (m.group(2) == "'") newLine()
        cur.append(decodePdfString(m.group(1)))
      } else if (m.group(3) != null) { // <hex> Tj
        cur.append(decodeHex(m.group(3)))
      } else if (m.group(4) != null) { // [..] TJ — strings + kern numbers
        TjPartRe.findAllMatchIn(m.group(4)).foreach { p =>
          if (p.group(1) != null) cur.append(decodePdfString(p.group(1)))
          else if (p.group(2) != null && math.abs(p.group(2).toDouble) > 180)
            cur.append(' ') // large negative kern ~ inter-word gap
        }
      } else if (m.group(7) != null) { // Td/TD — y motion starts a new line
        val dy = m.group(6).toDouble
        if (dy != 0.0) newLine() else cur.append(' ')
      } else if (m.group(8) != null) { // Tm — absolute: new line when y changes
        val y = m.group(9).toDouble
        if (lastY.isNaN || y != lastY) newLine()
        lastY = y
      }
    }
    newLine()
    lines.map(_.toString.trim).filter(_.nonEmpty).mkString("\n")
  }

  /** The fast-strategy partitioner: pages (content streams with text ops) →
    * paragraph split → classifier cascade downstream (classifier="text"). */
  def partitionPdf(bytes: Array[Byte]): Seq[RawPara] = {
    if (!isPdf(bytes)) return Nil
    val raw = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val out = mutable.ArrayBuffer.empty[RawPara]
    var page = 0
    StreamRe.findAllMatchIn(raw).foreach { m =>
      val body = m.group(1).getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      val content = inflate(body) match {
        case Some(d) => new String(d, java.nio.charset.StandardCharsets.ISO_8859_1)
        case None => m.group(1)
      }
      if (content.contains("BT") && (content.contains("Tj") || content.contains("TJ"))) {
        val text = extractText(content)
        if (text.nonEmpty) {
          page += 1
          // same paragraph-grouping path as partition_text
          TextSource.splitParagraphs(text).foreach { p =>
            out += RawPara(p, None, classifier = "text", pageNumber = Some(page))
          }
        }
      }
    }
    out.toSeq
  }
}
