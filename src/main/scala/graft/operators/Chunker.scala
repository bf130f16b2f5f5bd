package graft.operators

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.col

import graft.model.{Element, ElementMetadata, ElementType}
import graft.sinks.ElementJson

/**
 * The chunking kernel — `chunk_elements` ("basic") and `chunk_by_title`, re-expressed as
 * a per-document streaming fold.
 *
 * Semantics follow the reference chunker
 * (`/root/reference/unstructured/chunking/base.py`, `basic.py`, `title.py`):
 *
 *  - [[PreChunkBuilder]] — greedy element accumulator with soft/hard window and
 *    `"\n\n"`-separator accounting (`base.py:505-650`, will-fit `:575-611`);
 *  - semantic boundaries — `Title` elements, and page changes when
 *    `multipageSections=false` (`title.py:144-158`, `base.py:1831-1874`);
 *  - table isolation — a `Table` never shares a pre-chunk (`base.py:587-597`), drops
 *    inbound overlap (`base.py:533-540`) and never donates an overlap tail
 *    (`base.py:566-571`);
 *  - [[TextSplitter]] — oversized text split at the rightmost `"\n"`/`" "` before the
 *    window edge, with overlap carry (`base.py:1396-1624`);
 *  - metadata consolidation per the `ConsolidationStrategy` field table
 *    (`documents/elements.py:517-579`), `orig_elements` as base64-gzip JSON;
 *  - [[PreChunkCombiner]] — by-title small-chunk recombination under
 *    `combineTextUnderNChars` (`base.py:1734-1809`);
 *  - `_TableChunker` — single-table pre-chunks emit `Table` or row-packed `TableChunk`s
 *    with repeated header rows and `num_carried_over_header_rows` (`base.py:957-1190`).
 *    HTML row/cell handling here is a simplified regex row model over the engine's own
 *    `<table><tr><td>` shape (the reference uses a full lxml model).
 *
 * Scale design: the Spark operator is `groupByKey(doc_id).flatMapSortedGroups(seq)` —
 * one shuffle on `doc_id`, secondary-sorted by Spark (no in-memory doc sort), and the
 * fold itself is an O(window) streaming iterator, so a 1225-page skew-document holds
 * only the work-in-progress pre-chunk in memory, never the whole document.
 *
 * Chunk ids differ from the reference by design: the reference assigns random UUIDs
 * (`base.py:1110`); Spark task retries/speculation require deterministic output, so ids
 * are content hashes (sha-256, 32 hex).
 */
final case class ChunkingOptions(
    maxCharacters: Int = 500, // CHUNK_MAX_CHARS_DEFAULT, base.py:33
    newAfterNChars: Option[Int] = None, // soft max; defaults to hard max, base.py:249-278
    combineTextUnderNChars: Option[Int] = None, // by_title only; title.py:160-171
    overlap: Int = 0, // base.py:239-246
    overlapAll: Boolean = false, // base.py:229-236
    multipageSections: Boolean = true, // CHUNK_MULTI_PAGE_DEFAULT, base.py:42
    includeOrigElements: Boolean = true,
    repeatTableHeaders: Boolean = true,
    skipTableChunking: Boolean = false,
    isolateTable: Boolean = true,
    byTitle: Boolean = false,
    // token mode — window measured in tokens, base.py:176-190,249-266. Mutually
    // exclusive with character limits. With a `tokenizer` name the BPE counter
    // runs ([[TokenCounter]], base.py:54-78); without one the oracle-matched
    // regex counter stands in (tiktoken itself is a model download).
    maxTokens: Option[Int] = None,
    newAfterNTokens: Option[Int] = None,
    tokenizer: Option[String] = None) {
  require(maxCharacters > 0, "maxCharacters must be > 0")
  require(maxTokens.forall(_ > 0), "maxTokens must be > 0")
  // fail fast on unknown names; the resolved counter (derived vocabulary, or
  // a user-supplied .tiktoken file loaded lazily per executor) does the
  // measuring — @transient so the closure ships the name, not the vocab
  @transient private lazy val tokenCounter: Option[String => Int] =
    tokenizer.map(TokenCounter.resolve)
  tokenizer.foreach(TokenCounter.resolve)
  require(!skipTableChunking || isolateTable,
    "'skip_table_chunking=True' requires 'isolate_table=True'") // base.py:151-156
  /** `use_token_counting` — base.py:316-318. */
  val useTokenCounting: Boolean = maxTokens.isDefined
  /** Window size in the active unit (tokens when `maxTokens` is set). */
  val hardMax: Int = maxTokens.getOrElse(maxCharacters)
  require(overlap >= 0 && overlap < hardMax, "overlap must be in [0, hardMax)")
  /** Soft max — base.py:249-278: defaults to hardMax; larger values clamp to it. */
  val softMax: Int =
    if (useTokenCounting)
      newAfterNTokens.map(n => math.min(math.max(n, 0), hardMax)).getOrElse(hardMax)
    else newAfterNChars.map(n => math.min(math.max(n, 0), hardMax)).getOrElse(hardMax)
  val combineUnder: Int = combineTextUnderNChars.getOrElse(hardMax)
  require(combineUnder >= 0 && combineUnder <= hardMax,
    "combineTextUnderNChars must be in [0, hardMax]")
  val interChunkOverlap: Int = if (overlapAll) overlap else 0
  val separator: String = "\n\n"
  /** `measure` — base.py:320-326: size of `text` in the active unit. Char mode
    * counts CODE POINTS (Python `len`), not UTF-16 units. */
  def measure(text: String): Int =
    if (!useTokenCounting) Chunker.cpLen(text)
    else tokenCounter.fold(Chunker.tokenCount(text))(_.apply(text))
}

object ChunkingOptions {
  /**
   * `ChunkingOptions._validate` (`base.py:325-360`) — the kwargs-presence
   * validation the case-class defaults can't express: max_tokens and
   * max_characters are mutually exclusive, max_tokens requires a tokenizer
   * (model or encoding name, tiktoken resolution order), new_after_n_tokens
   * requires max_tokens. Returns the resolved options or throws the
   * reference's ValueError messages.
   */
  def validated(
      maxCharacters: Option[Int] = None,
      newAfterNChars: Option[Int] = None,
      combineTextUnderNChars: Option[Int] = None,
      overlap: Int = 0,
      overlapAll: Boolean = false,
      multipageSections: Option[Boolean] = None,
      byTitle: Boolean = false,
      // the four table-behavior kwargs resolve absent/None to their
      // defaults, exactly as both entry points' parametrized option
      // matrices pin (test_basic.py:232-301, test_title.py:557-630):
      // include_orig_elements None -> True, repeat_table_headers None ->
      // True, skip_table_chunking None -> False, isolate_table None -> True
      includeOrigElements: Option[Boolean] = None,
      repeatTableHeaders: Option[Boolean] = None,
      skipTableChunking: Option[Boolean] = None,
      isolateTable: Option[Boolean] = None,
      maxTokens: Option[Int] = None,
      newAfterNTokens: Option[Int] = None,
      tokenizer: Option[String] = None): ChunkingOptions = {
    if (maxTokens.isDefined && maxCharacters.isDefined)
      throw new IllegalArgumentException(
        "'max_tokens' and 'max_characters' are mutually exclusive;" +
          " specify one or the other, not both")
    if (maxTokens.isDefined && tokenizer.isEmpty)
      throw new IllegalArgumentException(
        "'tokenizer' is required when using 'max_tokens'")
    maxTokens.filter(_ <= 0).foreach(t =>
      throw new IllegalArgumentException(s"'max_tokens' argument must be > 0, got $t"))
    if (newAfterNTokens.isDefined && maxTokens.isEmpty)
      throw new IllegalArgumentException(
        "'new_after_n_tokens' requires 'max_tokens' to be specified")
    newAfterNTokens.filter(_ < 0).foreach(t =>
      throw new IllegalArgumentException(
        s"'new_after_n_tokens' argument must be >= 0, got $t"))
    // a negative new_after_n_chars is assumed to be a caller mistake
    // (base.py:364-367) — rejected rather than clamped
    newAfterNChars.filter(_ < 0).foreach(n =>
      throw new IllegalArgumentException(
        s"'new_after_n_chars' argument must be >= 0, got $n"))
    tokenizer.foreach(TokenCounter.resolve)
    ChunkingOptions(
      maxCharacters = maxCharacters.getOrElse(500),
      newAfterNChars = newAfterNChars,
      combineTextUnderNChars = combineTextUnderNChars,
      overlap = overlap, overlapAll = overlapAll,
      multipageSections = multipageSections.getOrElse(true),
      includeOrigElements = includeOrigElements.getOrElse(true),
      repeatTableHeaders = repeatTableHeaders.getOrElse(true),
      skipTableChunking = skipTableChunking.getOrElse(false),
      isolateTable = isolateTable.getOrElse(true),
      byTitle = byTitle,
      maxTokens = maxTokens, newAfterNTokens = newAfterNTokens,
      tokenizer = tokenizer)
  }
}

object Chunker {

  // ---------------------------------------------------------------- string helpers

  /** Python `str.isspace` for one UTF-16 unit: Java's `Character.isWhitespace`
    * plus the no-break/NEL characters Python includes (U+0085, U+00A0, U+2007,
    * U+202F). Exact union over the whole code space — no other code point
    * differs between the two predicates. */
  @inline private[graft] def pyIsSpace(c: Char): Boolean =
    Character.isWhitespace(c) ||
      c == '\u0085' || c == '\u00A0' || c == '\u2007' || c == '\u202F'

  /** Python `str.lstrip()` / `rstrip()` / `strip()` — Java's `String.strip`
    * family misses the four no-break/NEL whitespace characters above. */
  implicit final class PyStringOps(private val s: String) {
    def pyStripLeading: String = {
      var i = 0
      while (i < s.length && pyIsSpace(s.charAt(i))) i += 1
      if (i == 0) s else s.substring(i)
    }
    def pyStripTrailing: String = {
      var j = s.length
      while (j > 0 && pyIsSpace(s.charAt(j - 1))) j -= 1
      if (j == s.length) s else s.substring(0, j)
    }
    def pyStrip: String = s.pyStripLeading.pyStripTrailing
  }

  /** Python `" ".join(s.pyStrip.split())`: collapse all whitespace runs to one space. */
  private[graft] def normalizeWs(s: String): String = {
    val sb = new StringBuilder(s.length)
    var inWs = true // leading whitespace dropped
    s.foreach { c =>
      if (pyIsSpace(c)) { if (!inWs) { sb.append(' '); inWs = true } }
      else { sb.append(c); inWs = false }
    }
    if (sb.nonEmpty && sb.last == ' ') sb.setLength(sb.length - 1)
    sb.toString
  }

  /** Number of Unicode code points in `s`. The reference counts characters with
    * Python `len()`, which is code points — Java's `String.length` is UTF-16
    * units, so astral-plane characters (emoji, rare CJK) would count double and
    * shift every window/overlap boundary (caught by `ChunkerDifferentialSpec`). */
  @inline private[graft] def cpLen(s: String): Int = s.codePointCount(0, s.length)

  /** UTF-16 offset of code-point index `cp` (clamped to the string). */
  private[graft] def cpOffset(s: String, cp: Int): Int =
    if (cp <= 0) 0
    else {
      val total = s.codePointCount(0, s.length)
      if (cp >= total) s.length else s.offsetByCodePoints(0, cp)
    }

  /** Python `s[-n:]` — last `n` code points. */
  private[graft] def cpTakeRight(s: String, n: Int): String = {
    if (n <= 0) return ""
    val total = s.codePointCount(0, s.length)
    if (n >= total) s else s.substring(s.offsetByCodePoints(0, total - n))
  }

  /** Deterministic BPE-ish token count — letter runs, digit runs, and isolated
    * symbols each count once; mirrors [[graft.functions.TextAnalysis.tokenCountRegex]]
    * so SQL oracles can reproduce it (`regexp_extract_all` + `len`). */
  private val TokenRe = java.util.regex.Pattern.compile("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")

  private[graft] def tokenCount(s: String): Int = {
    val m = TokenRe.matcher(s)
    var n = 0
    while (m.find()) n += 1
    n
  }

  private[operators] def isTableFamily(e: Element): Boolean =
    e.`type` == ElementType.Table || e.`type` == ElementType.TableChunk

  /** Deterministic chunk id: content hash over (doc, ordinal, text). */
  private def chunkId(docId: String, chunkSeq: Long, text: String): String =
    sha32(docId + " " + chunkSeq + " " + text)

  private def sha32(s: String): String =
    graft.operators.Hashing.sha256Hex(s).substring(0, 32)

  // ---------------------------------------------------------------- text splitter

  /**
   * `_TextSplitter` char mode — `base.py:1396-1460,1585-1624`. `apply` returns
   * (fragment, remainder); remainder is "" once the input fits the window.
   */
  final class TextSplitter(opts: ChunkingOptions) {
    private val maxlen = opts.hardMax
    private val overlap = opts.overlap

    def apply(s: String): (String, String) = {
      if (opts.useTokenCounting) {
        // token mode dispatch — base.py:1434-1438
        if (opts.measure(s) <= maxlen) return (s, "")
        return splitByTokens(s)
      }
      val sLen = Chunker.cpLen(s)
      if (sLen <= maxlen) return (s, "")
      for (sep <- Seq('\n', ' ')) {
        splitFromMaxlen(sep, s) match {
          case Some((frag, rem)) if frag.nonEmpty && Chunker.cpLen(rem) < sLen =>
            return (frag.pyStripTrailing, rem.pyStripLeading)
          case _ => ()
        }
      }
      // arbitrary-character back-stop — no separator between tail and remainder
      (s.substring(0, Chunker.cpOffset(s, maxlen)).pyStripTrailing,
        s.substring(Chunker.cpOffset(s, maxlen - overlap)).pyStripLeading)
    }

    /**
     * Split on the rightmost `sep` whose index is in `[overlap+1, maxlen]` (a split not
     * longer than the overlap would not progress). The separator is removed; the
     * overlap tail re-joins the remainder with a single space.
     */
    /**
     * `_split_by_tokens` — base.py:1462-1532: rightmost separator split whose
     * fragment fits the token window; whitespace-boundary binary-search fallback;
     * token-measured overlap tail carried into the remainder.
     */
    private def splitByTokens(s: String): (String, String) = {
      for (sep <- Seq('\n', ' ')) {
        var i = s.lastIndexOf(sep.toInt)
        while (i >= 0) {
          val fragment = s.substring(0, i).pyStripTrailing
          val m = opts.measure(fragment)
          if (m <= maxlen && m > 0)
            return withTokenOverlap(fragment, s.substring(i + 1).pyStripLeading)
          i = if (i == 0) -1 else s.lastIndexOf(sep.toInt, i - 1)
        }
      }
      // fallback — binary search the char position holding ≤ maxlen tokens
      var low = 0
      var high = s.length
      var bestPos = math.max(overlap + 1, 1)
      while (low <= high) {
        val mid = (low + high) / 2
        if (opts.measure(s.substring(0, mid)) <= maxlen) { bestPos = mid; low = mid + 1 }
        else high = mid - 1
      }
      // back up to a whitespace boundary when one is in range
      var splitPos = bestPos
      var i = bestPos
      var found = false
      while (!found && i > math.max(overlap, 0)) {
        if (i < s.length && pyIsSpace(s.charAt(i))) { splitPos = i; found = true }
        i -= 1
      }
      var fragment = s.substring(0, splitPos).pyStripTrailing
      if (opts.measure(fragment) > maxlen && splitPos > overlap + 1) {
        fragment = s.substring(0, bestPos).pyStripTrailing
        splitPos = bestPos
      }
      withTokenOverlap(fragment, s.substring(splitPos).pyStripLeading)
    }

    private def withTokenOverlap(fragment: String, rawRemainder: String): (String, String) =
      if (overlap > 0 && fragment.nonEmpty)
        (fragment, tokenOverlapTail(fragment, overlap) + " " + rawRemainder)
      else (fragment, rawRemainder)

    /** `_get_token_overlap_tail` — base.py:1534-1568: tail holding ~`target` tokens,
      * adjusted forward to a word boundary. */
    private def tokenOverlapTail(text: String, target: Int): String = {
      if (opts.measure(text) <= target) return text.pyStrip
      var low = 0
      var high = text.length
      while (low < high) {
        val mid = (low + high) / 2
        if (opts.measure(text.substring(mid)) > target) low = mid + 1 else high = mid
      }
      var pos = low
      while (pos < text.length && !pyIsSpace(text.charAt(pos))) pos += 1
      while (pos < text.length && pyIsSpace(text.charAt(pos))) pos += 1
      if (pos >= text.length) text.substring(low).pyStripLeading else text.substring(pos)
    }

    private def splitFromMaxlen(sep: Char, s: String): Option[(String, String)] = {
      // rightmost `sep` whose CODE-POINT index is in [overlap+1, maxlen]
      // (`pattern.search(s, pos=overlap+1, endpos=maxlen+sep_len)`, base.py:1600)
      val i = s.lastIndexOf(sep.toInt, Chunker.cpOffset(s, maxlen + 1) - 1)
      if (i < 0 || i < Chunker.cpOffset(s, overlap + 1)) None
      else {
        val fragment = s.substring(0, i).pyStripTrailing
        val rawRemainder = s.substring(i + 1).pyStripLeading
        if (overlap <= 1) Some((fragment, rawRemainder))
        else {
          val tail = Chunker.cpTakeRight(fragment, overlap - 1).pyStripLeading
          Some((fragment, tail + " " + rawRemainder))
        }
      }
    }
  }

  // ---------------------------------------------------------------- consolidation

  /**
   * Per-field consolidation over a pre-chunk's elements — the strategy table at
   * `documents/elements.py:517-579`. FIRST = first populated value; LIST_CONCATENATE =
   * in-order concat of populated lists; LIST_UNIQUE = order-preserving union;
   * STRING_CONCATENATE = space-joined stripped values; everything else DROPs.
   */
  private[operators] def consolidatedMetadata(elements: Seq[Element]): ElementMetadata = {
    val ms = elements.map(_.metadata)
    def first[A](get: ElementMetadata => Option[A]): Option[A] =
      ms.iterator.flatMap(get(_)).nextOption()
    def listConcat[A](get: ElementMetadata => Option[Seq[A]]): Option[Seq[A]] = {
      val vs = ms.flatMap(get)
      if (vs.isEmpty) None else Some(vs.flatten)
    }
    def listUnique[A](get: ElementMetadata => Option[Seq[A]]): Option[Seq[A]] = {
      val vs = ms.flatMap(get)
      if (vs.isEmpty) None else Some(vs.flatten.distinct)
    }
    def stringConcat(get: ElementMetadata => Option[String]): Option[String] = {
      val vs = ms.flatMap(get)
      if (vs.isEmpty) None else Some(vs.map(_.strip).mkString(" "))
    }
    // DICT_LIST_UNIQUE — elements.py:512-515: union keys; per key concatenate the
    // lists then drop duplicates, preserving first-seen order
    def dictListUnique(get: ElementMetadata => Option[Map[String, Seq[Map[String, String]]]])
        : Option[Map[String, Seq[Map[String, String]]]] = {
      val vs = ms.flatMap(get)
      if (vs.isEmpty) None
      else {
        val keys = vs.flatMap(_.keys).distinct
        Some(keys.map(k => k -> vs.flatMap(_.getOrElse(k, Nil)).distinct).toMap)
      }
    }
    ElementMetadata(
      filename = first(_.filename),
      file_directory = first(_.file_directory),
      filetype = first(_.filetype),
      url = first(_.url),
      last_modified = first(_.last_modified),
      attached_to_filename = first(_.attached_to_filename),
      data_source = first(_.data_source),
      page_number = first(_.page_number),
      page_name = first(_.page_name),
      emphasized_text_contents = listConcat(_.emphasized_text_contents),
      emphasized_text_tags = listConcat(_.emphasized_text_tags),
      link_texts = listConcat(_.link_texts),
      link_urls = listConcat(_.link_urls),
      languages = listUnique(_.languages),
      enrichment_origins = dictListUnique(_.enrichment_origins),
      text_as_html = stringConcat(_.text_as_html),
      sent_from = first(_.sent_from),
      sent_to = first(_.sent_to),
      cc_recipient = first(_.cc_recipient),
      bcc_recipient = first(_.bcc_recipient),
      subject = first(_.subject),
      signature = first(_.signature),
      email_message_id = first(_.email_message_id))
    // all other fields (coordinates, category_depth, parent_id, images, detection_*,
    // segment_*, chunking artifacts) are DROP
  }

  /** Table-chunk base metadata: original table metadata minus DROP fields — `base.py:1128-1155`. */
  private def tableChunkMetadata(table: Element): ElementMetadata =
    table.metadata.copy(
      coordinates = None, category_depth = None, parent_id = None,
      image_base64 = None, image_mime_type = None, image_path = None, image_url = None,
      detection_class_prob = None, detection_origin = None,
      links = None, link_start_indexes = None,
      is_continuation = None, orig_elements = None,
      table_id = None, chunk_index = None, num_carried_over_header_rows = None,
      segment_start_seconds = None, segment_end_seconds = None)

  // ---------------------------------------------------------------- pre-chunk

  /** A staged run of elements that will form one chunk (or several, if oversized). */
  final case class PreChunk(elements: Vector[Element], overlapPrefix: String,
      opts: ChunkingOptions) {

    /** Overlap prefix + each element's whitespace-normalized non-empty text, in order
      * (`base.py:734-750`; CodeSnippet keeps raw whitespace). */
    def textSegments: Vector[String] = {
      val b = Vector.newBuilder[String]
      if (overlapPrefix.nonEmpty) b += overlapPrefix
      elements.foreach { e =>
        val t = e.text
        if (t != null && t.nonEmpty) {
          if (e.`type` == ElementType.CodeSnippet) b += t
          else { val n = normalizeWs(t); if (n.nonEmpty) b += n }
        }
      }
      b.result()
    }

    lazy val text: String = textSegments.mkString(opts.separator)

    /** Tail to prefix the next chunk — empty unless `overlapAll` (`base.py:723-732`). */
    def overlapTail: String =
      if (opts.interChunkOverlap > 0 && text.nonEmpty)
        Chunker.cpTakeRight(text, opts.interChunkOverlap).pyStrip
      else ""

    def combine(other: PreChunk): PreChunk =
      PreChunk(elements ++ other.elements, overlapPrefix, opts)

    /** `can_combine` — `base.py:675-694`. */
    def canCombine(other: PreChunk): Boolean = {
      val tableForbids = opts.isolateTable &&
        (elements.exists(isTableFamily) || other.elements.exists(isTableFamily))
      !tableForbids &&
        opts.measure(text) < opts.combineUnder &&
        opts.measure(combine(other).text) <= opts.hardMax
    }
  }

  // ---------------------------------------------------------------- builder (fold state)

  private final class PreChunkBuilder(opts: ChunkingOptions,
      initialOverlapPrefix: String = "") {
    private val sepLen = opts.separator.length
    private var elements = Vector.empty[Element]
    private var overlapPrefix = initialOverlapPrefix
    private var nSegs = if (initialOverlapPrefix.nonEmpty) 1 else 0
    private var textLen = Chunker.cpLen(initialOverlapPrefix)
    // token mode keeps the raw segments: sizes don't add, the join must be re-measured
    // (`_text_length`, base.py:628-650)
    private var segs =
      if (initialOverlapPrefix.nonEmpty) Vector(initialOverlapPrefix)
      else Vector.empty[String]

    private def textLength: Int =
      if (opts.useTokenCounting) {
        if (segs.isEmpty) 0 else opts.measure(segs.mkString(opts.separator))
      } else textLen + (if (nSegs > 0) (nSegs - 1) * sepLen else 0)

    def willFit(e: Element): Boolean = {
      if (opts.isolateTable) {
        if (isTableFamily(e)) return elements.isEmpty
        if (elements.exists(isTableFamily)) return false
      }
      if (elements.isEmpty) return true
      if (textLength > opts.softMax) return false
      if (opts.useTokenCounting) {
        // measure the would-be joined text — base.py:604-609
        val cand = if (e.text == null || e.text.isEmpty) segs else segs :+ e.text
        return opts.measure(cand.mkString(opts.separator)) <= opts.hardMax
      }
      val remaining = opts.hardMax - textLen - sepLen * nSegs
      val elLen = if (e.text == null) 0 else Chunker.cpLen(e.text)
      remaining >= elLen
    }

    def add(e: Element): Unit = {
      // a table-only pre-chunk never takes the prior chunk's narrative overlap
      if (opts.isolateTable && elements.isEmpty && isTableFamily(e)) {
        overlapPrefix = ""; nSegs = 0; textLen = 0; segs = Vector.empty
      }
      elements :+= e
      if (e.text != null && e.text.nonEmpty) {
        nSegs += 1; textLen += Chunker.cpLen(e.text); segs :+= e.text
      }
    }

    def flush(): Option[PreChunk] = {
      if (elements.isEmpty) None
      else {
        val pc = PreChunk(elements, overlapPrefix, opts)
        val overlapForNext =
          if (opts.isolateTable && elements.size == 1 && isTableFamily(elements.head)) ""
          else pc.overlapTail
        overlapPrefix = overlapForNext
        elements = Vector.empty
        nSegs = if (overlapForNext.nonEmpty) 1 else 0
        textLen = Chunker.cpLen(overlapForNext)
        segs = if (overlapForNext.nonEmpty) Vector(overlapForNext) else Vector.empty
        Some(pc)
      }
    }
  }

  // ---------------------------------------------------------------- pre-chunker

  /** Streaming fold: elements (doc order) -> pre-chunks. O(window) memory.
    * `initialOverlapPrefix` seeds the first pre-chunk (incremental resume). */
  def preChunks(els: Iterator[Element], opts: ChunkingOptions,
      initialOverlapPrefix: String = ""): Iterator[PreChunk] = {
    val builder = new PreChunkBuilder(opts, initialOverlapPrefix)
    // page-boundary predicate state (`is_on_next_page`, base.py:1831-1874)
    var pageIsFirst = true
    var currentPage = 1
    def isNewSemanticUnit(e: Element): Boolean = {
      if (!opts.byTitle) return false
      val titleBoundary = e.`type` == ElementType.Title
      var pageBoundary = false
      if (!opts.multipageSections) {
        val pn = e.metadata.page_number
        if (pageIsFirst) { currentPage = pn.getOrElse(1); pageIsFirst = false }
        else pn match {
          case Some(p) if p != currentPage => currentPage = p; pageBoundary = true
          case _ => ()
        }
      }
      titleBoundary || pageBoundary // both predicates always evaluated (state update)
    }
    els.flatMap { e =>
      val flushed =
        if (isNewSemanticUnit(e) || !builder.willFit(e)) builder.flush() else None
      builder.add(e)
      flushed.iterator
    } ++ Iterator.single(()).flatMap(_ => builder.flush().iterator)
  }

  /** `PreChunkCombiner` — adjacent small pre-chunks merged when they fit (by_title). */
  def combinePreChunks(pcs: Iterator[PreChunk], opts: ChunkingOptions): Iterator[PreChunk] = {
    var accum: PreChunk = null
    pcs.flatMap { pc =>
      if (accum == null) { accum = pc; Iterator.empty }
      else if (accum.canCombine(pc)) { accum = accum.combine(pc); Iterator.empty }
      else { val out = accum; accum = pc; Iterator.single(out) }
    } ++ Iterator.single(()).flatMap { _ =>
      if (accum == null) Iterator.empty
      else { val out = accum; accum = null; Iterator.single(out) }
    }
  }

  // ---------------------------------------------------------------- chunk emission

  /** Emit chunks for one pre-chunk (seq/ids assigned by the caller). */
  private def iterChunks(docId: String, pc: PreChunk, opts: ChunkingOptions,
      split: TextSplitter): Iterator[Element] = {
    if (pc.elements.size == 1 && pc.elements.head.`type` == ElementType.Table) {
      if (opts.skipTableChunking) Iterator.single(pc.elements.head)
      else TableChunker.iterChunks(docId, pc.elements.head, pc.overlapPrefix, opts, split)
    } else {
      iterCompositeChunks(docId, pc, opts, split)
    }
  }

  /** `_Chunker.iter_chunks` — `base.py:767-806`. */
  private def iterCompositeChunks(docId: String, pc: PreChunk, opts: ChunkingOptions,
      split: TextSplitter): Iterator[Element] = {
    val text = pc.text
    if (text.isEmpty) return Iterator.empty
    val baseMeta = consolidatedMetadata(pc.elements)
    val origEls =
      if (opts.includeOrigElements) Some(ElementJson.encodeOrigElements(pc.elements))
      else None
    def mk(t: String, isCont: Boolean): Element =
      Element(
        element_id = "", // assigned by caller (content hash over doc/seq/text)
        `type` = ElementType.CompositeElement,
        text = t,
        doc_id = docId,
        seq = 0L,
        metadata = baseMeta.copy(
          is_continuation = if (isCont) Some(true) else None,
          orig_elements = origEls))
    new Iterator[Element] {
      private var remainder: String = text
      private var isFirst = true
      def hasNext: Boolean = remainder.nonEmpty
      def next(): Element = {
        val (s, r) = split(remainder)
        remainder = r
        val e = mk(s, !isFirst)
        isFirst = false
        e
      }
    }
  }

  // ---------------------------------------------------------------- table chunker
  /**
   * `_TableChunker` + `_HtmlTableSplitter` — `base.py:957-1393`, over a simplified
   * regex HTML model (`common/html_table.py` semantics: rows/cells flattened to
   * normalized text, attributes stripped, `thead`/`th` mark header rows; nested inline
   * markup inside cells is flattened to text — a documented simplification of the
   * lxml model). The algorithm is faithful:
   *
   *  - fits-whole → single `Table` with compactified HTML;
   *  - no HTML (or window < 50) → text-only `TableChunk` splits;
   *  - else whole-row packing by TEXT length (`_RowAccumulator`, base.py:1675-1726),
   *    oversized rows split on cell boundaries (`_CellAccumulator`, :1627-1672),
   *    oversized lone cells text-split with a fresh `maxlen-33` splitter (:1269-1291);
   *  - leading header rows are packed normally into the FIRST chunk and prepended
   *    synthetically (text + `<thead>` html) to continuations (:1355-1374), window
   *    reduced by header length (:1347-1353), disabled when a header row exceeds half
   *    the window (:1330-1338).
   */
  private[graft] object TableChunker {

    /** One cell: normalized text plus the STRUCTURAL attributes compactification
      * preserves — colspan/rowspan are required to reconstruct merged-cell
      * layout; cosmetic attrs (class, style, data-*) drop
      * (`common/html_table.py:87-97`). */
    final case class Cell(text: String, preserved: Vector[(String, String)] = Vector.empty,
        sourceInner: String = "") {
      def attrHtml: String = preserved.map { case (k, v) => s""" $k="$v"""" }.mkString
      /** Cell content for re-serialization: plain text normally, but nested
        * markup (an inner `<table>`) survives verbatim-normalized, matching
        * `HtmlCell.html`'s preserve-nested-markup behavior
        * (`common/html_table.py` DescribeHtmlCell
        * `and_it_preserves_nested_markup_when_serializing_nonempty_cells`). */
      def contentHtml: String =
        if (sourceInner.contains("<table")) normalizeWs(sourceInner)
        else escapeHtml(text)
    }

    /** One `<tr>`: cells (empty kept for `<td/>` slots), header flag, and the
      * original source `<tr>` markup — captured before compactification so
      * repeated continuation headers keep their full semantics
      * (`html_table.py:73-85`, `base.py:1366-1379`). */
    final case class Row(cells: Vector[Cell], isHeader: Boolean, sourceHtml: String = "") {
      def cellTexts: Vector[String] = cells.map(_.text)
      def nonEmptyTexts: Vector[String] = cellTexts.filter(_.nonEmpty)
      def text: String = nonEmptyTexts.mkString(" ")
      def html: String =
        "<tr>" + cells.map(c =>
          if (c.text.isEmpty) s"<td${c.attrHtml}/>"
          else s"<td${c.attrHtml}>${c.contentHtml}</td>").mkString + "</tr>"
      /** `_as_header_row_html`: the SOURCE row with direct `<td>` converted to
        * `<th>`, all original attributes kept (`base.py:1366-1379`). Only
        * top-level cells of this `<tr>` are rewritten — cells of a nested
        * `<table>` inside a header cell keep their `<td>` tag, matching the
        * reference's direct-child `./td` XPath. */
      def headerHtml: String =
        if (sourceHtml.nonEmpty) {
          val s = sourceHtml
          val sb = new StringBuilder(s.length)
          var i = 0
          var nestedTables = 0
          while (i < s.length) {
            if (s.charAt(i) == '<') {
              val end = s.indexOf('>', i)
              val tag = if (end >= 0) s.substring(i, end + 1) else s.substring(i)
              val lower = tag.toLowerCase
              def isTag(name: String): Boolean = {
                val p = "<" + name
                lower.startsWith(p) &&
                  (tag.length == p.length || !Character.isLetterOrDigit(tag.charAt(p.length)))
              }
              if (isTag("table")) { nestedTables += 1; sb.append(tag) }
              else if (lower.startsWith("</table")) { nestedTables -= 1; sb.append(tag) }
              else if (nestedTables == 0 && isTag("td"))
                sb.append("<th").append(tag.substring(3))
              else if (nestedTables == 0 && lower.startsWith("</td"))
                sb.append("</th").append(tag.substring(4))
              else sb.append(tag)
              i = if (end >= 0) end + 1 else s.length
            } else { sb.append(s.charAt(i)); i += 1 }
          }
          sb.toString
        } else
          "<tr>" + cells.map(c =>
            if (c.text.isEmpty) s"<th${c.attrHtml}/>"
            else s"<th${c.attrHtml}>${escapeHtml(c.text)}</th>").mkString + "</tr>"
    }


    private[graft] def escapeHtml(s: String): String =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

    private def unescapeHtml(s: String): String =
      s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
        .replace("&#x27;", "'").replace("&apos;", "'").replace("&amp;", "&")

    private val TagRe = "(?s)<[^>]*>".r

    private val PreservedAttrRe =
      "(?i)\\b(colspan|rowspan)\\s*=\\s*(?:\"([^\"]*)\"|'([^']*)'|(\\S+))".r

    private def tagName(tag: String): String = {
      val s = if (tag.startsWith("</")) tag.substring(2) else tag.substring(1)
      s.takeWhile(Character.isLetterOrDigit).toLowerCase
    }

    /** All TOP-LEVEL `<tr>` rows of an HTML table in order, header-flagged when
      * inside the table's `<thead>` or containing a `<th>` cell —
      * `html_table.py:74-80` (lxml's `./tr | ./thead/tr | ...` XPath sees only
      * direct-section rows). Rows and cells of a table NESTED inside a cell
      * stay inside that cell's content — the scanner tracks `<table>` depth
      * instead of regex-matching the first `</tr>`, which would truncate a
      * nesting row. Cell colspan/rowspan survive compactification; the raw
      * `<tr>` markup rides along for header repetition and reconstruction. */
    def parseRows(html: String): Vector[Row] = {
      val tags = TagRe.findAllMatchIn(html).toVector
      val rows = Vector.newBuilder[Row]
      var tableDepth = 0
      var inThead = false
      var rowStart = -1
      var rowTagEnd = -1
      var rowInThead = false
      tags.foreach { m =>
        val t = m.matched
        val isClose = t.startsWith("</")
        val isVoid = t.endsWith("/>")
        tagName(t) match {
          case "table" =>
            if (isClose) tableDepth = math.max(0, tableDepth - 1)
            else if (!isVoid) tableDepth += 1
          case "thead" if tableDepth <= 1 && rowStart < 0 =>
            inThead = !isClose && !isVoid
          case "tr" if tableDepth <= 1 =>
            if (!isClose && !isVoid && rowStart < 0) {
              rowStart = m.start; rowTagEnd = m.end; rowInThead = inThead
            } else if (isClose && rowStart >= 0) {
              rows += buildRow(html.substring(rowStart, m.end),
                html.substring(rowTagEnd, m.start), rowInThead)
              rowStart = -1
            }
          case _ => ()
        }
      }
      rows.result()
    }

    /** One row from its source markup: top-level `<td>`/`<th>` cells only
      * (cells of a nested table belong to their outer cell's content). */
    private def buildRow(sourceHtml: String, inner: String, inThead: Boolean): Row = {
      val tags = TagRe.findAllMatchIn(inner).toVector
      val cells = Vector.newBuilder[Cell]
      var depth = 0
      var openTag: String = null
      var contentStart = -1
      var hasTh = false
      def mkCell(open: String, content: String): Cell = {
        val preserved = PreservedAttrRe.findAllMatchIn(open).map { am =>
          (am.group(1).toLowerCase,
            Seq(am.group(2), am.group(3), am.group(4)).find(_ != null).getOrElse(""))
        }.toVector
        Cell(normalizeWs(unescapeHtml(TagRe.replaceAllIn(content, " "))), preserved,
          sourceInner = content)
      }
      tags.foreach { m =>
        val t = m.matched
        val isClose = t.startsWith("</")
        val isVoid = t.endsWith("/>")
        tagName(t) match {
          case "table" =>
            if (isClose) depth = math.max(0, depth - 1)
            else if (!isVoid) depth += 1
          case n @ ("td" | "th") if depth == 0 =>
            if (!isClose && openTag == null) {
              if (n == "th") hasTh = true
              if (isVoid) cells += mkCell(t, "")
              else { openTag = t; contentStart = m.end }
            } else if (isClose && openTag != null) {
              cells += mkCell(openTag, inner.substring(contentStart, m.start))
              openTag = null
            }
          case _ => ()
        }
      }
      Row(cells.result(), inThead || hasTh, sourceHtml)
    }

    def iterChunks(docId: String, table: Element, overlapPrefix: String,
        opts: ChunkingOptions, split: TextSplitter): Iterator[Element] = {
      val tableText = if (table.text == null) "" else normalizeWs(table.text)
      if (tableText.isEmpty) return Iterator.empty

      val textWithOverlap =
        if (overlapPrefix.nonEmpty) overlapPrefix + "\n" + table.text.pyStrip
        else table.text.pyStrip
      val rawHtml = table.metadata.text_as_html.map(_.strip).filter(_.nonEmpty)
      val rows = rawHtml.map(parseRows).getOrElse(Vector.empty)
      val compactHtml =
        if (rows.nonEmpty) "<table>" + rows.map(_.html).mkString + "</table>"
        else rawHtml.filter(_.toLowerCase.contains("<table")) match {
          // a row-less but genuine <table> survives compactification with its
          // flattened inner text (HtmlTable.from_html_text(...).html keeps it,
          // base.py:982-994); invalid/non-table html falls back to None, the
          // reference's logged-warning text-only path (base.py:976-981)
          case Some(raw) =>
            // unescape THEN re-escape, like the cell path: the reference's
            // lxml parse/serialize round-trip leaves `a &amp; b` as-is, so
            // escaping the raw source would double-escape entities
            val inner = normalizeWs(unescapeHtml(TagRe.replaceAllIn(raw, " ")))
            if (inner.isEmpty) "<table/>" else "<table>" + escapeHtml(inner) + "</table>"
          case None => ""
        }
      val baseMeta = tableChunkMetadata(table)
      val origEls =
        if (opts.includeOrigElements) Some(ElementJson.encodeOrigElements(Seq(table)))
        else None

      // fits whole -> single Table element with compactified html (base.py:982-994)
      if (opts.measure(textWithOverlap) <= opts.hardMax &&
          opts.measure(compactHtml) <= opts.hardMax) {
        return Iterator.single(Element("", ElementType.Table, textWithOverlap, docId, 0L,
          baseMeta.copy(
            text_as_html = if (compactHtml.isEmpty) None else Some(compactHtml),
            orig_elements = origEls)))
      }

      // html is impractical below ~50 chars / ~15 tokens of window (base.py:996-1003)
      val minHtmlThreshold = if (opts.useTokenCounting) 15 else 50
      val (pairs, carried) =
        if (rows.isEmpty && compactHtml.nonEmpty && opts.hardMax >= minHtmlThreshold)
          // a genuine but row-less <table> that is oversized: the reference's
          // `if not self._html` check is FALSE (compact html is non-empty), so
          // it enters the html-sync splitter, which iterates zero rows and
          // yields zero chunks (base.py:996-1009) — parity means no output
          (Vector.empty[(String, Option[String])], 0)
        else if (rows.isEmpty || opts.hardMax < minHtmlThreshold)
          (textOnlySplits(textWithOverlap, split), 0)
        else syncSplits(rows, opts)

      val tableId = sha32(docId + " " + table.seq)
      pairs.iterator.zipWithIndex.map { case ((t, h), i) =>
        Element("", ElementType.TableChunk, t, docId, 0L,
          baseMeta.copy(
            text_as_html = h,
            is_continuation = if (i > 0) Some(true) else None,
            num_carried_over_header_rows = Some(if (i > 0) carried else 0),
            table_id = Some(tableId),
            chunk_index = Some(i),
            orig_elements = origEls))
      }
    }

    /** `_iter_text_only_table_chunks` — repeated application of the shared splitter. */
    private def textOnlySplits(text: String, split: TextSplitter): Vector[(String, Option[String])] = {
      val out = Vector.newBuilder[(String, Option[String])]
      var rem = text
      while (rem.nonEmpty) { val (s, r) = split(rem); out += ((s, None)); rem = r }
      out.result()
    }

    /** `_HtmlTableSplitter._iter_subtables` — (text, html) pairs + carried-header count. */
    private[graft] def syncSplits(rows: Vector[Row], opts: ChunkingOptions)
        : (Vector[(String, Option[String])], Int) = {
      val headerRows =
        if (opts.repeatTableHeaders) rows.takeWhile(_.isHeader) else Vector.empty[Row]
      val headerText = headerRows.flatMap(_.nonEmptyTexts).mkString(" ")
      val maxHeaderRowLen =
        if (headerRows.isEmpty) 0 else headerRows.map(r => opts.measure(r.text)).max
      // guard against pathological headers consuming more than half the window
      val shouldRepeat = headerRows.nonEmpty && maxHeaderRowLen <= (opts.hardMax + 1) / 2
      val carried = if (shouldRepeat) headerRows.size else 0
      val theadHtml =
        if (shouldRepeat) "<thead>" + headerRows.map(_.headerHtml).mkString + "</thead>"
        else ""

      var isFirst = true
      def maxlenNow: Int =
        if (isFirst || !shouldRepeat) opts.hardMax
        else math.max(1, opts.hardMax - opts.measure(headerText) - 1)

      def prepend(text: String, html: String): (String, Option[String]) = {
        if (isFirst || !shouldRepeat) (text, Some(html))
        else {
          val t =
            if (headerText.nonEmpty && text.nonEmpty) headerText + " " + text
            else if (headerText.nonEmpty) headerText
            else text
          val inner = html.stripPrefix("<table>").stripSuffix("</table>")
          (t, Some("<table>" + theadHtml + inner + "</table>"))
        }
      }

      val out = Vector.newBuilder[(String, Option[String])]
      var accRows = Vector.empty[Row]
      var accLen = 0
      var curMax = maxlenNow
      // separators: one trailing space per accumulated row (base.py:1717-1722);
      // token mode re-measures the joined candidate (base.py:1272-1280)
      def willFit(r: Row): Boolean =
        if (opts.useTokenCounting)
          opts.measure(((accRows :+ r).flatMap(_.nonEmptyTexts)).mkString(" ")) <= curMax
        else curMax - accRows.size - accLen >= Chunker.cpLen(r.text)
      def flushAcc(): Unit = if (accRows.nonEmpty) {
        val text = accRows.flatMap(_.nonEmptyTexts).mkString(" ")
        val html = "<table>" + accRows.map(_.html).mkString + "</table>"
        out += prepend(text, html)
        isFirst = false
        accRows = Vector.empty; accLen = 0
      }

      rows.foreach { row =>
        if (!willFit(row)) { flushAcc(); curMax = maxlenNow }
        if (willFit(row)) { accRows :+= row; accLen += Chunker.cpLen(row.text) }
        else {
          // single row bigger than the window: split on cell boundaries
          iterRowSplits(row, curMax, opts).foreach { case (t, h) =>
            out += prepend(t, h); isFirst = false
          }
          curMax = maxlenNow
        }
      }
      flushAcc()
      (out.result(), carried)
    }

    /** `_iter_row_splits` — cell packing; a lone oversized cell is text-split. */
    private def iterRowSplits(row: Row, maxlen: Int, opts: ChunkingOptions)
        : Vector[(String, String)] = {
      val out = Vector.newBuilder[(String, String)]
      var cells = Vector.empty[String]
      def remaining = maxlen - cells.size - cells.map(Chunker.cpLen).sum
      def willFit(cell: String): Boolean =
        if (opts.useTokenCounting)
          opts.measure((cells :+ cell).filter(_.nonEmpty).mkString(" ")) <= maxlen
        else remaining >= Chunker.cpLen(cell)
      def flush(): Unit = if (cells.nonEmpty) {
        val t = cells.filter(_.nonEmpty).mkString(" ")
        val h = "<table><tr>" + cells.map(c =>
          if (c.isEmpty) "<td/>" else s"<td>${escapeHtml(c)}</td>").mkString + "</tr></table>"
        out += ((t, h)); cells = Vector.empty
      }
      row.cellTexts.foreach { cell =>
        if (!willFit(cell)) flush()
        if (willFit(cell)) cells :+= cell
        else {
          // 33 = len("<table><tr><td></td></tr></table>") html overhead (base.py:1277)
          val sub = new TextSplitter(ChunkingOptions(
            maxCharacters = math.max(1, maxlen - 33)))
          var rem = cell
          while (rem.nonEmpty) {
            val (s, r) = sub(rem)
            out += ((s, s"<table><tr><td>${escapeHtml(s)}</td></tr></table>"))
            rem = r
          }
        }
      }
      flush()
      out.result()
    }
  }

  // ---------------------------------------------------------------- driver API

  /**
   * Pure per-document fold: elements in reading order -> chunk elements. The unit the
   * behavior tests exercise directly.
   */
  def chunkDoc(docId: String, els: Iterator[Element], opts: ChunkingOptions): Iterator[Element] = {
    val split = new TextSplitter(opts)
    val pcs0 = preChunks(els, opts)
    val pcs = if (opts.byTitle) combinePreChunks(pcs0, opts) else pcs0
    var chunkSeq = 0L
    pcs.flatMap(pc => iterChunks(docId, pc, opts, split)).map { c =>
      val id = chunkId(docId, chunkSeq, c.text)
      val out = c.copy(element_id = id, seq = chunkSeq)
      chunkSeq += 1
      out
    }
  }

  /**
   * Incremental (resumable) variant of [[chunkDoc]] for streaming: chunks and emits
   * every CLOSED pre-chunk, returning the elements of the still-open trailing
   * pre-chunk (which a future element could extend — or, under `byTitle`
   * combining, absorb) as the carry for the next call. The carry is bounded by the
   * chunking window — one pre-chunk, or one combinable run capped at `hardMax` —
   * plus at most one oversized element, so resume state is O(window) regardless of
   * document length.
   *
   * The fold is a left fold with state (open builder content, overlap prefix), so
   * re-folding `carry ++ newElements` with the returned `overlapPrefix` and
   * `startSeq` reproduces exactly the chunks the one-shot fold would emit.
   * `finalFlush` closes everything (end of document).
   */
  def chunkDocIncremental(docId: String, els: Seq[Element], opts: ChunkingOptions,
      startSeq: Long, overlapPrefix: String, finalFlush: Boolean)
      : (Vector[Element], Vector[Element], Long, String) = {
    val split = new TextSplitter(opts)
    val pcs0 = preChunks(els.iterator, opts, overlapPrefix).toVector
    val pcs = if (opts.byTitle) combinePreChunks(pcs0.iterator, opts).toVector else pcs0
    val (closed, open) =
      if (finalFlush || pcs.isEmpty) (pcs, Vector.empty[PreChunk])
      else (pcs.init, Vector(pcs.last))
    var seq = startSeq
    val out = Vector.newBuilder[Element]
    closed.foreach { pc =>
      iterChunks(docId, pc, opts, split).foreach { c =>
        val id = chunkId(docId, seq, c.text)
        out += c.copy(element_id = id, seq = seq)
        seq += 1
      }
    }
    // overlap prefix the open pre-chunk would have received from the last closed one
    val nextPrefix = closed.lastOption.map { pc =>
      if (opts.isolateTable && pc.elements.size == 1 && isTableFamily(pc.elements.head)) ""
      else pc.overlapTail
    }.getOrElse(overlapPrefix)
    (out.result(), open.flatMap(_.elements), seq, nextPrefix)
  }

  /** `chunk_elements` — basic strategy (`chunking/basic.py:24-120`). */
  def chunkElements(ds: Dataset[Element], opts: ChunkingOptions = ChunkingOptions()): Dataset[Element] = {
    val sp = ds.sparkSession
    import sp.implicits._
    val o = opts.copy(byTitle = false)
    ds.groupByKey(_.doc_id)
      .flatMapSortedGroups(col("seq"))((doc, it) => chunkDoc(doc, it, o))
  }

  /** `chunk_by_title` — section-boundary strategy (`chunking/title.py:23-127`). */
  def chunkByTitle(ds: Dataset[Element], opts: ChunkingOptions = ChunkingOptions()): Dataset[Element] = {
    val sp = ds.sparkSession
    import sp.implicits._
    val o = opts.copy(byTitle = true)
    ds.groupByKey(_.doc_id)
      .flatMapSortedGroups(col("seq"))((doc, it) => chunkDoc(doc, it, o))
  }

  /**
   * `reconstruct_table_from_chunks` — inverse aggregation (`chunking/dispatch.py:146-325`):
   * order one table's `TableChunk`s by `chunk_index`, strip synthetic carried-over
   * header text from continuations (`:290-325`), merge HTML with one canonical
   * `<thead>` (`:233-253`), and drop the chunking bookkeeping metadata.
   */
  def reconstructTable(chunks: Seq[Element]): Option[Element] = {
    val sorted = chunks.sortBy(c => (c.metadata.chunk_index.isEmpty, c.metadata.chunk_index.getOrElse(0)))
    sorted.headOption.map { head =>
      def rowsOf(c: Element): Vector[TableChunker.Row] =
        c.metadata.text_as_html.map(TableChunker.parseRows).getOrElse(Vector.empty)
      def carriedOf(c: Element): Int = c.metadata.num_carried_over_header_rows.getOrElse(0)

      // strip carried header text from each continuation chunk's text (`:290-325`)
      def strippedText(c: Element): String = {
        val carried = carriedOf(c)
        if (carried == 0) return c.text
        val rws = rowsOf(c)
        if (carried > rws.size) return c.text
        val headerText = rws.take(carried).flatMap(_.nonEmptyTexts).mkString(" ")
        if (headerText.isEmpty) return c.text
        val t = c.text.pyStripLeading
        if (t == headerText) ""
        else if (t.startsWith(headerText + " ")) t.substring(headerText.length + 1)
        else if (t.startsWith(headerText)) t.substring(headerText.length).pyStripLeading
        else c.text
      }
      val text = sorted.map(strippedText).filter(_.nonEmpty).mkString(" ")

      // canonical header rows: first continuation whose carried rows match the first
      // chunk's leading rows by cell-text signature (`:233-253`)
      val firstRows = rowsOf(head)
      val canonical: Option[Vector[TableChunker.Row]] =
        sorted.iterator.flatMap { c =>
          val carried = carriedOf(c)
          if (carried <= 0) None
          else {
            val rws = rowsOf(c)
            if (carried > rws.size || firstRows.size < carried) None
            else {
              val cr = rws.take(carried)
              val matches = firstRows.take(carried).map(_.cellTexts) == cr.map(_.cellTexts)
              if (matches) Some(cr) else None
            }
          }
        }.nextOption()

      val html: Option[String] =
        if (sorted.forall(_.metadata.text_as_html.exists(_.nonEmpty))) {
          val thead = canonical
            .map(rs => "<thead>" + rs.map(_.headerHtml).mkString + "</thead>").getOrElse("")
          val body = sorted.zipWithIndex.flatMap { case (c, i) =>
            val skip = if (i == 0 && canonical.isDefined) canonical.get.size else carriedOf(c)
            // append the SOURCE row markup, as the reference moves lxml row
            // nodes verbatim (dispatch.py:207-215) — nested tables and
            // user-provided attributes survive reconstruction
            rowsOf(c).drop(skip).map(r =>
              if (r.sourceHtml.nonEmpty) r.sourceHtml else r.html)
          }.mkString
          Some("<table>" + thead + body + "</table>")
        } else None

      head.copy(
        `type` = ElementType.Table,
        text = text,
        metadata = head.metadata.copy(
          text_as_html = html,
          is_continuation = None, table_id = None, chunk_index = None,
          num_carried_over_header_rows = None))
    }
  }
}
