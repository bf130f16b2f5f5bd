package graft.sources

import scala.collection.mutable

/**
 * HTML "v2" ontology partitioner — the reference's `html_parser_version="v2"`
 * flow: `partition/html/partition.py:28-292` routes to
 * `partition/html/transformations.py:1-585`, which (1) parses annotated HTML
 * into a tree of ontology classes (`documents/ontology.py:27-622`,
 * tag/CSS-class dispatch per `documents/mappings.py:133-192`), then (2)
 * flattens that tree into unstructured elements
 * (`ontology_to_unstructured_elements`): layout containers (Document, Page,
 * Column, Sidebar, PageBreak, Section) become empty `Text` elements carrying
 * their own HTML and tree `parent_id`; content nodes become their mapped
 * element type (`mappings.py:55-127`) with `text_as_html` preserving the
 * normalized ontology HTML; consecutive same-depth childless inline/text
 * siblings are merged (`combine_inline_elements`).
 *
 * Faithfully replicated quirks (each pinned by HtmlOntologySpec):
 *  - `to_html` renders `class="<OntologyClass>"` first, then the source
 *    attributes minus class/id, bare (value-less) attributes bare, and
 *    self-closing empties as `<tag attrs />` (`ontology.py:77-132`);
 *  - `Table.to_html` round-trips BeautifulSoup (`ontology.py:311-314`):
 *    attributes are re-sorted alphabetically, bare attributes render as
 *    `attr=""`, void tags close as `/>` without a space, and inner tags lose
 *    id/class except `img`/`input` (`remove_ids_and_class_from_table`);
 *  - `category_depth` is the HTML heading level, not DOM nesting
 *    (`partition/common/metadata.py:71-98`: h1→0 … h6→5, non-heading Title→0,
 *    ListItem→0); content elements leave `parent_id` unset — the hierarchy
 *    pass (`MetadataOps.applyMetadata`) assigns heading-based parents
 *    downstream, exactly like the reference's `@apply_metadata`;
 *  - `FormFieldValue.to_text` appends the `value` attribute
 *    (`ontology.py:509-514`);
 *  - attr-less `<div>`s are unwrapped and empty p/span/div/h1-h6 dropped
 *    before parsing (`transformations.py:406-438`).
 *
 * Divergence (documented): the reference generates UUID ids for elements whose
 * HTML carries no `id` attribute; this port assigns id-less CONTAINERS a
 * deterministic per-document counter id ("gen-N", element-only — never
 * rendered into `text_as_html`) so the inverse can tell sibling containers
 * apart, and leaves id-less content elements absent (the hash-ids pass
 * assigns those downstream). A malformed document (no
 * `<body class="Document">` / `<div class="Page">`) yields zero elements
 * instead of raising, so a bad row can never kill a Spark task.
 */
object HtmlOntology {

  // --------------------------------------------------------------- ontology
  object Cat extends Enumeration {
    val Layout, Text, ListC, TableC, Media, Code, Math, Reference, Meta,
      Navigation, Form, Annotation, SpecializedText, DocSpecific = Value
  }

  /** One ontology class: name == CSS class, element-type category, allowed
    * HTML tags (first = canonical), and the mapped unstructured element type. */
  final case class OntClass(name: String, cat: Cat.Value, tags: Vector[String],
      mapped: String)

  import Cat._
  // `documents/ontology.py:174-622` (name/category/allowed_tags) joined with
  // `documents/mappings.py:55-127` (mapped unstructured class).
  val classes: Vector[OntClass] = Vector(
    OntClass("Document", Layout, Vector("body"), "Text"),
    OntClass("Section", Layout, Vector("section"), "Text"),
    OntClass("Page", Layout, Vector("div"), "Text"),
    OntClass("Column", Layout, Vector("div"), "Text"),
    OntClass("Paragraph", Text, Vector("p"), "NarrativeText"),
    OntClass("Header", Text, Vector("header"), "Header"),
    OntClass("Footer", Text, Vector("footer"), "Footer"),
    OntClass("Sidebar", Layout, Vector("aside"), "Text"),
    OntClass("PageBreak", Layout, Vector("hr"), "PageBreak"),
    OntClass("Title", Text, Vector("h1"), "Title"),
    OntClass("Subtitle", Text, Vector("h2"), "Title"),
    OntClass("Heading", Text, Vector("h1", "h2", "h3", "h4", "h5", "h6"), "Title"),
    OntClass("NarrativeText", Text, Vector("p"), "NarrativeText"),
    OntClass("Quote", Text, Vector("blockquote"), "NarrativeText"),
    OntClass("Footnote", Text, Vector("div"), "Text"),
    OntClass("Caption", Text, Vector("figcaption"), "FigureCaption"),
    OntClass("PageNumber", Text, Vector("span"), "PageNumber"),
    OntClass("UncategorizedText", Text, Vector("span"), "Text"),
    OntClass("OrderedList", ListC, Vector("ol"), "Text"),
    OntClass("UnorderedList", ListC, Vector("ul"), "Text"),
    OntClass("DefinitionList", ListC, Vector("dl"), "Text"),
    OntClass("ListItem", ListC, Vector("li"), "ListItem"),
    OntClass("Table", TableC, Vector("table"), "Table"),
    OntClass("TableBody", TableC, Vector("tbody"), "Table"),
    OntClass("TableHeader", TableC, Vector("thead"), "Table"),
    OntClass("TableRow", TableC, Vector("tr"), "Table"),
    OntClass("TableCell", TableC, Vector("td"), "Table"),
    OntClass("TableCellHeader", TableC, Vector("th"), "Table"),
    OntClass("Image", Media, Vector("img"), "Image"),
    OntClass("Figure", Media, Vector("figure"), "Image"),
    OntClass("Video", Media, Vector("video"), "Text"),
    OntClass("Audio", Media, Vector("audio"), "Text"),
    OntClass("Barcode", Media, Vector("img"), "Image"),
    OntClass("QRCode", Media, Vector("img"), "Image"),
    OntClass("Logo", Media, Vector("img"), "Image"),
    OntClass("CodeBlock", Code, Vector("pre", "code"), "CodeSnippet"),
    OntClass("InlineCode", Code, Vector("code"), "CodeSnippet"),
    OntClass("Formula", Math, Vector("math"), "Formula"),
    OntClass("Equation", Math, Vector("math"), "Formula"),
    OntClass("FootnoteReference", Reference, Vector("sub"), "Text"),
    OntClass("Citation", Reference, Vector("cite"), "Text"),
    OntClass("Bibliography", Reference, Vector("ul"), "Text"),
    OntClass("Glossary", Reference, Vector("dl"), "Text"),
    OntClass("Author", Meta, Vector("meta"), "Text"),
    OntClass("MetaDate", Meta, Vector("meta"), "Text"),
    OntClass("Keywords", Meta, Vector("meta"), "Text"),
    OntClass("Abstract", Meta, Vector("section"), "NarrativeText"),
    OntClass("Hyperlink", Navigation, Vector("a"), "Text"),
    OntClass("TableOfContents", TableC, Vector("table"), "Table"),
    OntClass("Index", Navigation, Vector("nav"), "Text"),
    OntClass("Form", Form, Vector("form"), "Text"),
    OntClass("FormField", Form, Vector("label"), "Text"),
    OntClass("FormFieldValue", Form, Vector("input"), "Text"),
    OntClass("Checkbox", Form, Vector("input"), "Text"),
    OntClass("RadioButton", Form, Vector("input"), "Text"),
    OntClass("Button", Form, Vector("button"), "Text"),
    OntClass("Comment", Annotation, Vector("span"), "Text"),
    OntClass("Highlight", Annotation, Vector("mark"), "Text"),
    OntClass("RevisionInsertion", Annotation, Vector("ins"), "Text"),
    OntClass("RevisionDeletion", Annotation, Vector("del"), "Text"),
    OntClass("Address", SpecializedText, Vector("address"), "Address"),
    OntClass("EmailAddress", SpecializedText, Vector("a"), "EmailAddress"),
    OntClass("PhoneNumber", SpecializedText, Vector("span"), "Text"),
    OntClass("CalendarDate", SpecializedText, Vector("time"), "Text"),
    OntClass("Time", SpecializedText, Vector("time"), "Text"),
    OntClass("Currency", SpecializedText, Vector("span"), "Text"),
    OntClass("Measurement", SpecializedText, Vector("span"), "Text"),
    OntClass("Letterhead", DocSpecific, Vector("header"), "Header"),
    OntClass("Signature", DocSpecific, Vector("img", "svg"), "Text"),
    OntClass("Watermark", DocSpecific, Vector("div"), "Text"),
    OntClass("Stamp", DocSpecific, Vector("img", "svg"), "Text"))

  val byName: Map[String, OntClass] = classes.map(c => c.name -> c).toMap
  private val Uncat = byName("UncategorizedText")
  private val ParagraphC = byName("Paragraph")

  /** `(tag, css-class) -> class` (`mappings.py:133-137`). */
  private val byTagAndCss: Map[(String, String), OntClass] =
    classes.flatMap(c => c.tags.map(t => (t, c.name) -> c)).toMap
  /** `css-class -> class` (`mappings.py:138-140`). */
  private val byCss: Map[String, OntClass] = byName

  /** `HTML_TAG_TO_DEFAULT_ELEMENT_TYPE_MAP` (`mappings.py:142-192`). */
  private val defaultByTag: Map[String, OntClass] = Map(
    "a" -> "Hyperlink", "address" -> "Address", "aside" -> "Sidebar",
    "audio" -> "Audio", "blockquote" -> "Quote", "body" -> "Document",
    "button" -> "Button", "cite" -> "Citation", "code" -> "CodeBlock",
    "del" -> "RevisionDeletion", "div" -> "UncategorizedText",
    "dl" -> "DefinitionList", "figcaption" -> "Caption", "figure" -> "Figure",
    "footer" -> "Footer", "form" -> "Form", "h1" -> "Title", "h2" -> "Subtitle",
    "h3" -> "Heading", "h4" -> "Heading", "h5" -> "Heading", "h6" -> "Heading",
    "header" -> "Header", "hr" -> "PageBreak", "img" -> "Image",
    "input" -> "Checkbox", "ins" -> "RevisionInsertion", "label" -> "FormField",
    "li" -> "ListItem", "mark" -> "Highlight", "math" -> "Equation",
    "meta" -> "Keywords", "nav" -> "Index", "ol" -> "OrderedList",
    "p" -> "Paragraph", "pre" -> "CodeBlock", "section" -> "Section",
    "span" -> "UncategorizedText", "sub" -> "FootnoteReference",
    "svg" -> "Signature", "table" -> "Table", "tbody" -> "TableBody",
    "td" -> "TableCell", "th" -> "TableCellHeader", "thead" -> "TableHeader",
    "time" -> "Time", "tr" -> "TableRow", "ul" -> "UnorderedList",
    "video" -> "Video"
  ).map { case (k, v) => k -> byName(v) }

  private val RecursionLimit = 50
  private val HeadingDepth = Map("h1" -> 0, "h2" -> 1, "h3" -> 2, "h4" -> 3,
    "h5" -> 4, "h6" -> 5)

  // ------------------------------------------------- DOM with ordered attrs
  sealed trait Node
  final case class TextNode(s: String) extends Node
  final case class Elem(tag: String, attrs: Vector[(String, String)],
      children: Vector[Node]) extends Node {
    def attr(k: String): Option[String] = attrs.collectFirst { case (`k`, v) => v }
    def classTokens: Seq[String] =
      attr("class").toSeq.flatMap(_.split("\\s+")).filter(_.nonEmpty)
  }

  private val VoidTags = Set("br", "img", "hr", "input", "meta", "link", "wbr",
    "area", "base", "col", "embed", "source", "track")
  private val AttrRe =
    """([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*(?:=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+)))?""".r

  /** Tolerant tag-soup parse preserving attribute order (the v1 partitioner's
    * `HtmlPartitioner.parse` loses it in a Map; v2's `to_html` needs it). */
  def parseDom(html: String): Elem = {
    final case class B(tag: String, attrs: Vector[(String, String)],
        kids: mutable.ArrayBuffer[Node])
    val root = B("#root", Vector.empty, mutable.ArrayBuffer.empty)
    val stack = mutable.ArrayBuffer(root)
    def finish(b: B): Elem = Elem(b.tag, b.attrs, b.kids.toVector)
    def closeTop(): Unit = {
      val b = stack.remove(stack.size - 1)
      stack.last.kids += finish(b)
    }
    var i = 0
    val n = html.length
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) {
        if (i < n) stack.last.kids += TextNode(HtmlPartitioner.unescape(html.substring(i)))
        i = n
      } else {
        if (lt > i) stack.last.kids += TextNode(HtmlPartitioner.unescape(html.substring(i, lt)))
        if (html.startsWith("<!--", lt)) {
          val end = html.indexOf("-->", lt); i = if (end < 0) n else end + 3
        } else if (html.startsWith("<!", lt) || html.startsWith("<?", lt)) {
          val end = html.indexOf('>', lt); i = if (end < 0) n else end + 1
        } else if (html.startsWith("</", lt)) {
          val end = html.indexOf('>', lt)
          val name = html.substring(lt + 2, if (end < 0) n else end).trim.toLowerCase
          val idx = stack.lastIndexWhere(_.tag == name)
          if (idx > 0) while (stack.size > idx) closeTop()
          i = if (end < 0) n else end + 1
        } else {
          val end = html.indexOf('>', lt)
          if (end < 0) i = n
          else {
            val inner = html.substring(lt + 1, end)
            val selfClose = inner.endsWith("/")
            val body = if (selfClose) inner.dropRight(1) else inner
            val sp = body.indexWhere(Character.isWhitespace)
            val name = (if (sp < 0) body else body.substring(0, sp)).toLowerCase
            val attrStr = if (sp < 0) "" else body.substring(sp)
            if (name.isEmpty || !name.head.isLetter) {
              stack.last.kids += TextNode(HtmlPartitioner.unescape(html.substring(lt, end + 1)))
              i = end + 1
            } else {
              val attrs = AttrRe.findAllMatchIn(attrStr).map { m =>
                val v = Option(m.group(2)).orElse(Option(m.group(3)))
                  .orElse(Option(m.group(4))).getOrElse("")
                m.group(1).toLowerCase -> HtmlPartitioner.unescape(v)
              }.toVector
              i = end + 1
              if (selfClose || VoidTags.contains(name))
                stack.last.kids += Elem(name, attrs, Vector.empty)
              else stack += B(name, attrs, mutable.ArrayBuffer.empty)
            }
          }
        }
      }
    }
    while (stack.size > 1) closeTop()
    finish(root)
  }

  // ----------------------------------------------------- HTML preprocessing

  /** `remove_empty_divs_from_html_content` (`transformations.py:406-412`):
    * attribute-less `<div>`s are spliced out bottom-up. */
  def unwrapBareDivs(el: Elem): Elem = {
    val kids = el.children.flatMap {
      case e: Elem =>
        val p = unwrapBareDivs(e)
        if (p.tag == "div" && p.attrs.isEmpty) p.children else Vector(p)
      case t => Vector(t)
    }
    el.copy(children = kids)
  }

  /** `remove_empty_tags_from_html_content` (`transformations.py:415-438`):
    * h1-h6/p/span/div with no attrs, no child tags and no text are dropped.
    * Pre-order like the reference's `find_all` snapshot — a parent is judged
    * before its empty descendants are removed. */
  def removeEmptyTags(el: Elem): Elem = {
    val removable = Set("h1", "h2", "h3", "h4", "h5", "h6", "p", "span", "div")
    def hasTag(e: Elem): Boolean = e.children.exists {
      case c: Elem => true
      case _ => false
    }
    def isEmpty(e: Elem): Boolean =
      removable.contains(e.tag) && e.attrs.isEmpty && !hasTag(e) &&
        domText(e).trim.isEmpty
    val kids = el.children.flatMap {
      case e: Elem => if (isEmpty(e)) Vector.empty else Vector(removeEmptyTags(e))
      case t => Vector(t)
    }
    el.copy(children = kids)
  }

  /** All descendant text, concatenated (bs4 `.text`). */
  def domText(e: Elem): String = e.children.map {
    case TextNode(s) => s
    case c: Elem => domText(c)
  }.mkString

  private def hasDescendant(e: Elem, tag: String): Boolean = e.children.exists {
    case c: Elem => c.tag == tag || hasDescendant(c, tag)
    case _ => false
  }

  // ----------------------------------------------------------- ontology tree

  /** One parsed ontology node. `cssClass` is None only for the `<br>` special
    * case (`transformations.py:458-464`); `text` is stored in serialized
    * (entity-escaped) form exactly as Python's `str(content)` keeps it. */
  final case class ONode(cls: OntClass, tag: String,
      attrs: Vector[(String, String)], text: String, children: Vector[ONode],
      cssClass: Option[String]) {
    def id: Option[String] = attrs.collectFirst { case ("id", v) => v }
    def attr(k: String): Option[String] = attrs.collectFirst { case (`k`, v) => v }
  }

  /** `extract_tag_and_ontology_class_from_tag` (`transformations.py:498-562`):
    * six-scenario dispatch, CSS class prioritized over tag. */
  def classify(el: Elem): (String, OntClass) = {
    val firstClass = el.classTokens.headOption
    var tag: String = el.tag
    var cls: OntClass = null
    firstClass.foreach { c => cls = byTagAndCss.getOrElse((el.tag, c), null) } // 1
    if (cls == null) firstClass.foreach { c => // 2: css wins, tag overwritten
      byCss.get(c).foreach { k => cls = k; tag = k.tags.head }
    }
    if (cls == null && el.tag == "input") { // 3: dispatch on type attr
      tag = "input"
      cls = el.attr("type").map(_.toLowerCase) match {
        case Some("checkbox") => byName("Checkbox")
        case Some("radio") => byName("RadioButton")
        case _ => byName("FormFieldValue")
      }
    }
    if (cls == null) defaultByTag.get(el.tag).foreach { k => tag = el.tag; cls = k } // 4
    if (cls == null) { tag = "span"; cls = Uncat } // 5
    if (cls == Uncat && hasDescendant(el, "img") && domText(el).trim.isEmpty)
      cls = byName("Image") // 6: image-wrapping span/div
    (tag, cls)
  }

  /** Escape text content the way `str(NavigableString)` does (&, <, > only). */
  private def escText(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Escape an attribute value like `html.escape` (quote=True). */
  private def escAttr(s: String): String =
    escText(s).replace("\"", "&quot;").replace("'", "&#x27;")

  /** bs4-style serialization of a raw DOM node (sorted attrs, bare -> `=""`,
    * void tags `/>`): what Python's `str(child)` yields for the
    * no-unwrap text branch. */
  def serializeDom(n: Node): String = n match {
    case TextNode(s) => escText(s)
    case e: Elem =>
      val attrs = e.attrs.sortBy(_._1)
        .map { case (k, v) => s"""$k="${escAttr(v)}"""" }.mkString(" ")
      val attrPart = if (attrs.isEmpty) "" else " " + attrs
      if (VoidTags.contains(e.tag)) s"<${e.tag}$attrPart/>"
      else {
        val inner = e.children.map(serializeDom).mkString
        s"<${e.tag}$attrPart>$inner</${e.tag}>"
      }
  }

  /** `parse_html_to_ontology_element` (`transformations.py:441-495`). */
  def toOntology(el: Elem, depth: Int = 1): ONode = {
    val (tag, cls) = classify(el)
    if (el.tag == "br")
      return ONode(ParagraphC, "br", el.attrs, "", Vector.empty, cssClass = None)
    val tagChildren = el.children.exists(_.isInstanceOf[Elem])
    val hasChildren = (cls != Uncat && tagChildren) || cls.cat == Layout
    if (hasChildren && depth <= RecursionLimit) {
      val kids = el.children.flatMap {
        case e: Elem => Some(toOntology(e, depth + 1))
        case TextNode(s) if s.trim.nonEmpty =>
          Some(ONode(ParagraphC, "p", Vector.empty, escText(s.trim),
            Vector.empty, Some("Paragraph")))
        case _ => None
      }
      ONode(cls, tag, el.attrs, "", kids, Some(cls.name))
    } else {
      val text = el.children.map(c => serializeDom(c).trim)
        .mkString("\n").trim
      ONode(cls, tag, el.attrs, text, Vector.empty, Some(cls.name))
    }
  }

  /** `parse_html_to_ontology` (`transformations.py:377-403`); None instead of
    * raising when no Document/Page root exists. */
  def parseOntology(html: String): Option[ONode] = {
    val dom = removeEmptyTags(unwrapBareDivs(parseDom(html)))
    def find(e: Elem, p: Elem => Boolean): Option[Elem] =
      if (p(e)) Some(e)
      else e.children.collectFirst(Function.unlift {
        case c: Elem => find(c, p)
        case _ => None
      })
    val root = find(dom, e => e.tag == "body" && e.classTokens.contains("Document"))
      .orElse(find(dom, e => e.tag == "div" && e.classTokens.contains("Page")))
    root.map(toOntology(_, 1))
  }

  // ---------------------------------------------------------------- rendering

  /** `OntologyElement.to_html` (`ontology.py:77-132`); Table/TableOfContents
    * use the bs4 round-trip variant. */
  def toHtml(n: ONode, addChildren: Boolean = true): String = {
    if ((n.cls.name == "Table" || n.cls.name == "TableOfContents") && addChildren)
      return tableHtml(n)
    val attrStr = (n.cssClass.map(c => s"""class="$c"""").toVector ++
      n.attrs.filter(kv => kv._1 != "class" && kv._1 != "id")
        .map { case (k, v) => if (v.nonEmpty) s"""$k="${escAttr(v)}"""" else k })
      .mkString(" ")
    val childrenHtml = if (addChildren) n.children.map(toHtml(_)).mkString else ""
    if (n.text.nonEmpty || childrenHtml.nonEmpty) {
      val inside = s"${n.text} $childrenHtml".trim
      s"<${n.tag} $attrStr>$inside</${n.tag}>"
    } else s"<${n.tag} $attrStr />"
  }

  /** `Table.to_html` (`ontology.py:311-314`): the generic render passed
    * through BeautifulSoup + `remove_ids_and_class_from_table` — attributes
    * re-sorted, ids dropped, class dropped except on img/input (and the table
    * tag itself), bare attrs as `=""`, void tags as `/>`. */
  private def tableHtml(n: ONode): String = {
    def render(m: ONode): String = {
      val keepClass = m.tag == "table" || m.tag == "img" || m.tag == "input"
      val attrs0 = m.cssClass.map("class" -> _).toVector ++
        m.attrs.filter(kv => kv._1 != "class" && kv._1 != "id")
      val attrs = attrs0.filter { case (k, _) => k != "class" || keepClass }
        .sortBy(_._1)
        .map { case (k, v) => s"""$k="${escAttr(v)}"""" }.mkString(" ")
      val attrPart = if (attrs.isEmpty) "" else " " + attrs
      val inside = s"${m.text} ${m.children.map(render).mkString}".trim
      if (VoidTags.contains(m.tag)) s"<${m.tag}$attrPart/>"
      else if (inside.nonEmpty) s"<${m.tag}$attrPart>$inside</${m.tag}>"
      else s"<${m.tag}$attrPart></${m.tag}>"
    }
    render(n)
  }

  /** bs4 `get_text()` over a rendered fragment: drop tags, unescape. */
  def stripTags(html: String): String = {
    val sb = new StringBuilder(html.length)
    var i = 0
    while (i < html.length) {
      val c = html.charAt(i)
      if (c == '<') {
        val end = html.indexOf('>', i)
        i = if (end < 0) html.length else end + 1
      } else { sb.append(c); i += 1 }
    }
    HtmlPartitioner.unescape(sb.toString)
  }

  /** `OntologyElement.to_text` (`ontology.py:93-113`) +
    * `FormFieldValue.to_text` (`:509-514`). */
  def toText(n: ONode, addImgAlt: Boolean = true): String = {
    val base =
      if (n.children.nonEmpty) n.children.map(c => toText(c, addImgAlt).trim).mkString(" ")
      else {
        var t = stripTags(toHtml(n)).trim
        if (addImgAlt && n.tag == "img")
          n.attr("alt").foreach(a => t = (t + " " + escAttr(a)).trim)
        t
      }
    if (n.cls.name == "FormFieldValue")
      n.attr("value").filter(_.nonEmpty)
        .map(v => s"$base ${escAttr(v)}".trim).getOrElse(base.trim)
    else base.trim
  }

  // ------------------------------------------------------- element conversion

  /** One flattened v2 element. Containers carry their tree `parent_id`;
    * content rows leave it None for the downstream hierarchy pass. */
  final case class V2Element(elementType: String, elementId: Option[String],
      text: String, textAsHtml: String, categoryDepth: Option[Int],
      pageNumber: Option[Int], parentId: Option[String])

  private def isTextClass(c: OntClass): Boolean =
    Set("NarrativeText", "Quote", "Paragraph", "Footnote", "FootnoteReference",
      "Citation", "Bibliography", "Glossary").contains(c.name) || c.cat == Meta

  private def isInlineClass(c: OntClass): Boolean =
    c.name == "Hyperlink" || c.cat == SpecializedText || c.cat == Annotation

  /** (class, hasChildren) of each top-level tag in an element's HTML — what
    * `can_unstructured_elements_be_merged` re-derives by re-parsing. */
  private final case class Part(cls: OntClass, hasKids: Boolean)
  private final case class WElem(e: V2Element, depth: Int, parts: Vector[Part])

  /** `combine_inline_elements` (`transformations.py:175-263`). */
  private def combine(xs: Vector[WElem]): Vector[WElem] = {
    val out = Vector.newBuilder[WElem]
    var cur: WElem = null
    def mergeable(a: WElem, b: WElem): Boolean =
      a.depth == b.depth && (a.parts ++ b.parts).forall(p =>
        !p.hasKids && (isTextClass(p.cls) || isInlineClass(p.cls)))
    for (nxt <- xs) {
      if (cur == null) cur = nxt
      else if (mergeable(cur, nxt))
        cur = WElem(cur.e.copy(text = cur.e.text + " " + nxt.e.text,
          textAsHtml = cur.e.textAsHtml + nxt.e.textAsHtml),
          cur.depth, cur.parts ++ nxt.parts)
      else { out += cur; cur = nxt }
    }
    if (cur != null) out += cur
    out.result()
  }

  /** `_ontology_to_unstructured_elements` (`transformations.py:86-172`). */
  private def worker(el: ONode, parentId: Option[String],
      pageNumber0: Option[Int], depth: Int, addImgAlt: Boolean,
      genId: () => String): Vector[WElem] = {
    if (el.cls.cat == Layout && depth <= RecursionLimit) {
      val pn =
        if (pageNumber0.isEmpty && el.cls.name == "Page")
          el.attr("data-page-number").flatMap(_.toIntOption)
        else pageNumber0
      val isDoc = el.cls.name == "Document"
      // the reference assigns every element a UUID when the source HTML has
      // no id; a deterministic per-document counter stands in here so the
      // inverse (elementsToOntology) can tell sibling containers apart —
      // synthetic ids live on the element only, never in text_as_html
      val cid = el.id.orElse(if (isDoc) None else Some(genId()))
      val self =
        if (isDoc) Vector.empty
        else Vector(WElem(
          // the ontology maps these to the `Text` CLASS, whose serialized
          // category is UncategorizedText (elements.py Text.category)
          V2Element("UncategorizedText", cid, "", toHtml(el, addChildren = false),
            None, pn, parentId),
          depth, Vector(Part(el.cls, hasKids = false))))
      val childDepth = if (isDoc) 0 else depth + 1
      val kids = el.children.flatMap(c =>
        worker(c, cid, pn, childDepth, addImgAlt, genId))
      self ++ combine(kids)
    } else {
      val mapped0 = el.cls.mapped
      val mapped = if (mapped0 == "Text") "UncategorizedText" else mapped0
      val catDepth =
        if (mapped == "Title") Some(HeadingDepth.getOrElse(el.tag, 0))
        else if (mapped == "ListItem") Some(0)
        else None
      Vector(WElem(
        V2Element(mapped, el.id, toText(el, addImgAlt), toHtml(el),
          catDepth, pageNumber0, parentId = None),
        depth, Vector(Part(el.cls, el.children.nonEmpty))))
    }
  }

  /** Full v2 partition: HTML string -> flattened element list. */
  def partition(html: String, addImgAltText: Boolean = true): Vector[V2Element] = {
    if (html == null || html.trim.isEmpty) return Vector.empty
    var n = 0
    val genId = () => { n += 1; s"gen-$n" }
    parseOntology(html).toVector
      .flatMap(worker(_, None, None, 0, addImgAltText, genId))
  }
      .map(_.e)

  // ----------------------------------------------- inverse: elements -> tree

  private final class MutNode(val o: ONode) {
    val kids = mutable.ArrayBuffer.empty[Either[MutNode, ONode]]
    def freeze: ONode = o.copy(children = o.children ++ kids.map {
      case Left(m) => m.freeze
      case Right(n) => n
    })
  }

  /**
   * `unstructured_elements_to_ontology` (`transformations.py:302-374`): rebuild
   * the ontology tree from a flattened element list. Layout containers (which
   * keep their tree `parent_id`) drive the nesting via a stack keyed on their
   * own element ids; content elements nest in the innermost open container.
   * A container whose `parent_id` matches no open container attaches to the
   * current innermost one instead of mis-popping to root. Each element's
   * `text_as_html` re-parses through the ontology classifier, so merged runs
   * contribute one node per top-level tag.
   */
  def elementsToOntology(els: Seq[V2Element]): ONode = {
    val rootId = els.headOption.flatMap(_.parentId)
    val rootAttrs = rootId.map(id => Vector("id" -> id)).getOrElse(Vector.empty)
    val root = new MutNode(ONode(byName("Document"), "body", rootAttrs, "",
      Vector.empty, Some("Document")))
    // (container element id, node); bottom frame is the Document root
    val stack = mutable.ArrayBuffer[(Option[String], MutNode)]((rootId, root))
    for (e <- els if e.textAsHtml != null && e.textAsHtml.nonEmpty) {
      val dom = parseDom(e.textAsHtml)
      for (tag <- dom.children.collect { case el: Elem => el }) {
        val o = toOntology(tag, 1)
        if (o.cls.cat == Layout) {
          val parentId = e.parentId.orElse(rootId)
          if (stack.exists(_._1 == parentId))
            while (stack.size > 1 && stack.last._1 != parentId)
              stack.remove(stack.size - 1)
          val m = new MutNode(o)
          stack.last._2.kids += Left(m)
          stack += ((e.elementId, m))
        } else stack.last._2.kids += Right(o)
      }
    }
    root.freeze
  }
}
