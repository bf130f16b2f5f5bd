package graft.sources

import scala.collection.mutable

/**
 * `partition_html` (v1 flow/phrasing model) —
 * `/root/reference/unstructured/partition/html/partition.py:28-292` and
 * `partition/html/parser.py` (principles at `:1-77`):
 *
 *  - elements are paragraphs; empty paragraphs are skipped;
 *  - whitespace is normalized (except inside `<pre>`);
 *  - block items (`h1..h6`, `p`, `pre`, `li`, `table`, `img`) start new paragraphs;
 *    phrasing (`a`, `b/strong`, `i/em`, `span`, …) flows within one;
 *  - `h1..h6` → Title (`category_depth` = level-1), `li` → ListItem (depth = list
 *    nesting), `pre` → CodeSnippet, `table` → Table with compact `text_as_html`,
 *    `img` → Image; an un-typed paragraph derives its type from its text
 *    (`derive_element_type_from_text`, `parser.py:921-936`);
 *  - `script`/`style`/comments and removed blocks (`nav`, `form`, `figure`, …) are
 *    dropped (contents AND text), removed phrasing (`button`, `label`) drops contents
 *    but keeps flowing;
 *  - `<a>` produces link annotations, `b/strong`/`i/em` produce emphasis annotations.
 *
 * The DOM is a minimal hand-rolled parser (no external deps): tolerant tokenizer,
 * void elements, raw-text elements, implicit `</p>`/`</li>`/`</tr>`/`</td>` closes.
 * Element typing for derived paragraphs happens downstream in the codegen'd
 * classifier column (see `HtmlSource`), keeping the predicates single-sourced.
 */
object HtmlPartitioner {

  // ----------------------------------------------------------------- minimal DOM

  sealed trait HNode
  final case class HText(s: String) extends HNode
  final case class HElem(tag: String, attrs: Map[String, String],
      var children: Vector[HNode]) extends HNode

  private val VoidTags = Set("br", "img", "hr", "input", "meta", "link", "wbr",
    "area", "base", "col", "embed", "source", "track")
  private val RawTextTags = Set("script", "style")
  /** opener -> set of tags it implicitly closes (browser recovery rules). */
  private val ImplicitClose: Map[String, Set[String]] = Map(
    "p" -> Set("p"), "li" -> Set("li"), "tr" -> Set("tr", "td", "th"),
    "td" -> Set("td", "th"), "th" -> Set("td", "th"),
    "thead" -> Set("tr", "td", "th"), "tbody" -> Set("tr", "td", "th"))

  def unescape(s: String): String = {
    if (!s.contains('&')) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i)
        if (semi > i && semi - i <= 10) {
          val ent = s.substring(i + 1, semi)
          val rep: Option[String] = ent match {
            case "amp" => Some("&")
            case "lt" => Some("<")
            case "gt" => Some(">")
            case "quot" => Some("\"")
            case "apos" => Some("'")
            case "nbsp" => Some(" ")
            case e if e.startsWith("#x") || e.startsWith("#X") =>
              scala.util.Try(Integer.parseInt(e.drop(2), 16)).toOption
                .map(Character.toChars(_).mkString)
            case e if e.startsWith("#") =>
              scala.util.Try(e.drop(1).toInt).toOption
                .map(Character.toChars(_).mkString)
            case _ => None
          }
          rep match {
            case Some(r) => sb.append(r); i = semi + 1
            case None => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private val AttrRe =
    """([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*(?:=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+)))?""".r

  /** Tolerant HTML parse into a tree rooted at a synthetic element. */
  def parse(html: String): HElem = {
    val root = HElem("#root", Map.empty, Vector.empty)
    val stack = mutable.ArrayBuffer[HElem](root)
    def top = stack.last
    var i = 0
    val n = html.length
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) {
        if (i < n) top.children :+= HText(unescape(html.substring(i)))
        i = n
      } else {
        if (lt > i) top.children :+= HText(unescape(html.substring(i, lt)))
        if (html.startsWith("<!--", lt)) {
          val end = html.indexOf("-->", lt)
          i = if (end < 0) n else end + 3
        } else if (html.startsWith("<!", lt) || html.startsWith("<?", lt)) {
          val end = html.indexOf('>', lt)
          i = if (end < 0) n else end + 1
        } else if (html.startsWith("</", lt)) {
          val end = html.indexOf('>', lt)
          val name = html.substring(lt + 2, if (end < 0) n else end).trim.toLowerCase
          // pop to matching open tag if present
          val idx = stack.lastIndexWhere(_.tag == name)
          if (idx > 0) stack.takeInPlace(idx)
          i = if (end < 0) n else end + 1
        } else {
          val end = html.indexOf('>', lt)
          if (end < 0) { i = n }
          else {
            val inner = html.substring(lt + 1, end)
            val selfClose = inner.endsWith("/")
            val body = if (selfClose) inner.dropRight(1) else inner
            val sp = body.indexWhere(Character.isWhitespace)
            val name = (if (sp < 0) body else body.substring(0, sp)).toLowerCase
            val attrStr = if (sp < 0) "" else body.substring(sp)
            val attrs = AttrRe.findAllMatchIn(attrStr).map { m =>
              val v = Option(m.group(2)).orElse(Option(m.group(3)))
                .orElse(Option(m.group(4))).getOrElse("")
              m.group(1).toLowerCase -> unescape(v)
            }.toMap
            if (name.isEmpty || !name.head.isLetter) {
              top.children :+= HText(unescape(html.substring(lt, end + 1)))
              i = end + 1
            } else {
              // implicit closes
              ImplicitClose.get(name).foreach { closes =>
                while (stack.size > 1 && closes.contains(top.tag))
                  stack.takeInPlace(stack.size - 1)
              }
              val el = HElem(name, attrs, Vector.empty)
              top.children :+= el
              i = end + 1
              if (RawTextTags.contains(name)) {
                // consume raw text up to the matching close tag, discard content
                val close = "</" + name
                val ci = html.toLowerCase.indexOf(close, i)
                i = if (ci < 0) n else html.indexOf('>', ci) + 1
              } else if (!selfClose && !VoidTags.contains(name)) {
                stack += el
              }
            }
          }
        }
      }
    }
    root
  }

  // ----------------------------------------------------------------- walk model

  private val FlowTags = Set("address", "article", "aside", "blockquote", "body",
    "center", "div", "footer", "header", "hgroup", "main", "section",
    "html", "#root", "head")
  private val HeadingTags = Map("h1" -> 0, "h2" -> 1, "h3" -> 2, "h4" -> 3,
    "h5" -> 4, "h6" -> 5)
  private val RemovedBlocks = Set("details", "dl", "dd", "dt", "figure", "hr",
    "nav", "template", "form", "input", "summary", "title")
  private val RemovedPhrasing = Set("button", "label")
  private val EmphasisTags = Map("b" -> "b", "strong" -> "b", "i" -> "i", "em" -> "i")
  private val PhrasingTags = Set("a", "b", "strong", "i", "em", "abbr", "bdi",
    "bdo", "big", "br", "cite", "code", "data", "dfn", "kbd", "mark", "meter",
    "q", "s", "samp", "small", "span", "strike", "sub", "sup", "time", "tt",
    "u", "var", "wbr") ++ RemovedPhrasing

  /** Every tag with an assigned element class (parser.py:954-1036). Anything
    * else is the reference's `DefaultElement` (:872-881): contents skipped
    * entirely, tail kept, and the surrounding phrase CONTINUES across it —
    * RemovedBlock and RemovedPhrasing behavior combined. */
  private val KnownBlockTags: Set[String] =
    FlowTags ++ HeadingTags.keySet ++ RemovedBlocks ++
      Set("li", "ul", "ol", "pre", "p", "table", "img")

  /** One parsed paragraph; `elementType` None = derive from text downstream. */
  final case class RawPara(
      text: String,
      elementType: Option[String],
      categoryDepth: Option[Int] = None,
      textAsHtml: Option[String] = None,
      imageUrl: Option[String] = None,
      imageBase64: Option[String] = None,
      imageMime: Option[String] = None,
      emphasizedContents: Seq[String] = Nil,
      emphasizedTags: Seq[String] = Nil,
      linkTexts: Seq[String] = Nil,
      linkUrls: Seq[String] = Nil,
      pageNumber: Option[Int] = None,
      pageName: Option[String] = None,
      /** Which derive cascade types an untyped paragraph: "html"
        * (`derive_element_type_from_text`) or "text" (`element_from_text`). */
      classifier: String = "html",
      linkStartIndexes: Seq[Int] = Nil,
      /** "primary" | "first_page" | "even_page" on Header/Footer elements
        * (docx.py:684,713). */
      headerFooterType: Option[String] = None)

  def normalizeWs(s: String): String = graft.operators.Chunker.normalizeWs(s)

  private final class Accum {
    val segs = mutable.ArrayBuffer.empty[String]
    val emphC = mutable.ArrayBuffer.empty[String]
    val emphT = mutable.ArrayBuffer.empty[String]
    val linkT = mutable.ArrayBuffer.empty[String]
    val linkU = mutable.ArrayBuffer.empty[String]
    def isEmpty: Boolean = segs.isEmpty
    def flush(tpe: Option[String], depth: Option[Int], out: mutable.ArrayBuffer[RawPara],
        preserveWs: Boolean = false, page: Option[Int] = None): Unit = {
      if (segs.nonEmpty) {
        val joined = segs.mkString
        val text =
          if (preserveWs) joined.stripPrefix("\n").stripSuffix("\n")
          else normalizeWs(joined)
        if (text.nonEmpty) {
          out += RawPara(text, tpe, depth,
            emphasizedContents = emphC.toSeq, emphasizedTags = emphT.toSeq,
            linkTexts = linkT.toSeq, linkUrls = linkU.toSeq, pageNumber = page)
        }
        segs.clear(); emphC.clear(); emphT.clear(); linkT.clear(); linkU.clear()
      }
    }
  }

  private val Base64ImageRe = "^data:(image/[^;]+);base64,(.*)".r

  /** Walk an element's subtree, emitting paragraphs. */
  def partition(html: String, skipHeadersAndFooters: Boolean = false,
      extractImageBlockToPayload: Boolean = false,
      extractImageBlockTypes: Seq[String] = Nil): Vector[RawPara] = {
    val dom = parse(html)
    // root jump: <main> if present, else <body>, else whole document
    def find(el: HElem, tag: String): Option[HElem] =
      if (el.tag == tag) Some(el)
      else el.children.iterator.collect { case e: HElem => find(e, tag) }
        .collectFirst { case Some(hit) => hit }
    val root = find(dom, "main").orElse(find(dom, "body")).getOrElse(dom)
    val out = mutable.ArrayBuffer.empty[RawPara]
    walkFlow(root, None, 0, out, skipHeadersAndFooters, None)
    // data-URI image payloads surface as metadata only when asked for —
    // extract_image_block_to_payload AND "Image" among the requested types
    // (test_partition.py:306-345); the alt text and element always emit
    val keepPayload = extractImageBlockToPayload &&
      PdfImages.checkElementTypesToExtract(extractImageBlockTypes)
        .contains("Image")
    if (keepPayload) out.toVector
    else out.toVector.map { p =>
      if (p.imageBase64.isDefined) p.copy(imageBase64 = None, imageMime = None)
      else p
    }
  }

  private def walkFlow(el: HElem, cls: Option[String], listDepth: Int,
      out: mutable.ArrayBuffer[RawPara], skipHF: Boolean,
      inheritedPage: Option[Int] = None): Unit = {
    // `data-page-number` on the nearest flow ancestor (or self) sets
    // page_number; a non-numeric value falls back to the outer ancestor's
    // (`html/parser.py:351-363`)
    val page: Option[Int] =
      el.attrs.get("data-page-number").flatMap(_.trim.toIntOption)
        .orElse(inheritedPage)
    val acc = new Accum
    val isPre = el.tag == "pre"
    val depth: Option[Int] = cls match {
      case Some("Title") => Some(HeadingTags.getOrElse(el.tag, 0))
      case Some("ListItem") => Some(listDepth)
      case _ => None
    }
    def flushAcc(): Unit = acc.flush(cls, depth, out, isPre, page)
    // dispatch one block child in this flow's context — reachable both from
    // the flow loop and from a block nested inside phrasing (parser.py
    // `_iter_phrasing`: invalid-but-tolerated blocks become their own
    // elements, like the browser renders them)
    def emitBlock(child: HElem): Unit = child.tag match {
      case t if HeadingTags.contains(t) =>
        walkFlow(child, Some("Title"), listDepth, out, skipHF, page)
      case "li" =>
        walkFlow(child, Some("ListItem"), listDepth, out, skipHF, page)
      case "ul" | "ol" =>
        walkFlow(child, None, listDepth + 1, out, skipHF, page)
      case "pre" =>
        walkFlow(child, Some("CodeSnippet"), listDepth, out, skipHF, page)
      case "p" =>
        walkFlow(child, None, listDepth, out, skipHF, page)
      case "table" => emitTable(child, out, page)
      case "img" => emitImage(child, out, page)
      case _ => walkFlow(child, None, listDepth, out, skipHF, page)
    }
    el.children.foreach {
      case HText(s) => if (s.nonEmpty) acc.segs += s
      case child: HElem =>
        val tag = child.tag
        if (RemovedBlocks.contains(tag)) () // dropped entirely
        else if (skipHF && (tag == "header" || tag == "footer")) ()
        else if (PhrasingTags.contains(tag))
          walkPhrasing(child, "", acc, () => flushAcc(), emitBlock, out)
        else if (KnownBlockTags.contains(tag)) {
          // block boundary: flush accumulated phrasing as its own paragraph
          flushAcc()
          emitBlock(child)
        } else {
          // DefaultElement: contents skipped, NO phrase flush — text before
          // and after (its tail) joins the same element (parser.py:872-881,
          // DescribeDefaultElement)
        }
    }
    flushAcc()
  }

  private def walkPhrasing(el: HElem, emphasis: String, acc: Accum,
      flushAcc: () => Unit, emitBlock: HElem => Unit,
      out: mutable.ArrayBuffer[RawPara]): Unit = {
    val tag = el.tag
    if (tag == "br") { acc.segs += "\n"; return }
    if (RemovedPhrasing.contains(tag)) return // contents dropped, flow continues
    val emph = EmphasisTags.get(tag) match {
      case Some(e) if !emphasis.contains(e) => emphasis + e
      case _ => emphasis
    }
    val href =
      if (tag == "a") el.attrs.get("href").map(_.trim).filter(_.nonEmpty) else None
    // Anchor link annotation goes to the FIRST non-whitespace phrase or the
    // first element a nested block emits — never both, never later items
    // (parser.py Anchor.iter_text_segments:695-731). With no href there is
    // nothing to attach, so the search is born finished.
    var linkDone = href.isEmpty
    var textStart = acc.segs.length
    def handleNestedBlock(c: HElem): Unit = {
      if (!linkDone) {
        val leading = normalizeWs(acc.segs.drop(textStart).mkString)
        if (leading.nonEmpty) {
          acc.linkT += leading; acc.linkU += href.get; linkDone = true
        }
      }
      // the phrase (including any text accumulated before this anchor) ends
      // here; the block's elements emit on their own
      flushAcc()
      val before = out.length
      emitBlock(c)
      if (out.length > before && !linkDone) {
        // first emitted element ends the link search — annotated only when it
        // has text (`_link_annotate_element`, preserving existing links)
        val first = out(before)
        if (first.text.nonEmpty)
          out(before) = first.copy(linkTexts = first.linkTexts :+ first.text,
            linkUrls = first.linkUrls :+ href.get)
        linkDone = true
      }
      textStart = 0 // accumulator was flushed; a fresh phrase follows
    }
    el.children.foreach {
      case HText(s) =>
        if (s.nonEmpty) {
          acc.segs += s
          // one annotation entry PER TEXT LEAF with the composite emphasis
          // string at that leaf ("b", "bi", ...) — `<b>x <i>y</i></b>` yields
          // contents [x, y] / tags [b, bi], and an anchor boundary splits the
          // run (parser.py Bold/Italic `iter_text_segments`)
          if (emph.nonEmpty) {
            val norm = normalizeWs(s)
            if (norm.nonEmpty) { acc.emphC += norm; acc.emphT += emph }
          }
        }
      case c: HElem if PhrasingTags.contains(c.tag) =>
        walkPhrasing(c, emph, acc, flushAcc, emitBlock, out)
      case c: HElem if RemovedBlocks.contains(c.tag) => ()
      case c: HElem if KnownBlockTags.contains(c.tag) => handleNestedBlock(c)
      case _ => () // DefaultElement inside phrasing: skipped, phrase continues
    }
    if (!linkDone) {
      val innerText = normalizeWs(acc.segs.drop(textStart).mkString)
      if (innerText.nonEmpty) {
        acc.linkT += innerText; acc.linkU += href.get
      }
    }
  }

  /** `TableBlock.iter_elements` (parser.py:528-563): direct rows only (a nested
    * table reduces to text inside its containing cell), cell text is the
    * stripped-text-node join, html renders the cell matrix through
    * `htmlify_matrix_of_cell_texts` (newlines inside a cell become `<br/>`). */
  private def emitTable(el: HElem, out: mutable.ArrayBuffer[RawPara],
      inheritedPage: Option[Int]): Unit = {
    // Table inherits the tracked page number like any flow element
    // (parser.py:563 attaches page_number=self._page_number); a
    // data-page-number on the <table> itself wins, as in walkFlow.
    val page = el.attrs.get("data-page-number").flatMap(_.trim.toIntOption)
      .orElse(inheritedPage)
    val sectionTags = Set("thead", "tbody", "tfoot")
    val trs: Vector[HElem] = el.children.toVector.flatMap {
      case e: HElem if e.tag == "tr" => Vector(e)
      case e: HElem if sectionTags(e.tag) =>
        e.children.collect { case t: HElem if t.tag == "tr" => t }
      case _ => Vector.empty
    }
    if (trs.isEmpty) return
    def cellText(td: HElem): String = {
      val b = Vector.newBuilder[String]
      def go(n: HNode): Unit = n match {
        case HText(s) => val t = s.strip; if (t.nonEmpty) b += t
        case e: HElem => e.children.foreach(go)
      }
      td.children.foreach(go)
      b.result().mkString(" ")
    }
    val matrix = trs.map(tr => tr.children.toVector.collect {
      case c: HElem if c.tag == "td" || c.tag == "th" => cellText(c)
    })
    val text = matrix.map(_.filter(_.nonEmpty).mkString(" ")).mkString(" ").strip
    if (text.isEmpty) return
    out += RawPara(text, Some("Table"),
      textAsHtml = Some(Partitioners.htmlifyMatrix(matrix, escapeQuotes = true)),
      pageNumber = page)
  }

  private def emitImage(el: HElem, out: mutable.ArrayBuffer[RawPara],
      inheritedPage: Option[Int]): Unit = {
    // Image inherits the tracked page number (parser.py:523).
    val page = el.attrs.get("data-page-number").flatMap(_.trim.toIntOption)
      .orElse(inheritedPage)
    val src = el.attrs.get("data-src").map(_.trim).filter(_.nonEmpty)
      .orElse(el.attrs.get("src").map(_.trim).filter(_.nonEmpty))
    val alt = el.attrs.get("alt").map(_.trim).getOrElse("")
    src match {
      case None => ()
      case Some(Base64ImageRe(mime, b64)) =>
        out += RawPara(alt, Some("Image"), imageBase64 = Some(b64),
          imageMime = Some(mime), pageNumber = page)
      case Some(url) =>
        out += RawPara(alt, Some("Image"), imageUrl = Some(url), pageNumber = page)
    }
  }

  /** Re-render a subtree to HTML (for table extraction). */
  private def render(el: HElem): String = {
    val sb = new StringBuilder
    def esc(s: String) = graft.operators.Chunker.TableChunker.escapeHtml(s)
    def go(n: HNode): Unit = n match {
      case HText(s) => sb.append(esc(s))
      case e: HElem =>
        sb.append('<').append(e.tag)
        e.attrs.foreach { case (k, v) => sb.append(' ').append(k).append("=\"")
          .append(esc(v)).append('"') }
        sb.append('>')
        e.children.foreach(go)
        sb.append("</").append(e.tag).append('>')
    }
    go(el)
    sb.toString
  }
}
