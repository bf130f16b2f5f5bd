package graft.functions

/**
 * Language-argument plumbing for the OCR-bearing partitioners — the Scala
 * counterpart of `partition/common/lang.py`: normalizing user-supplied
 * `languages` / deprecated `ocr_languages` arguments, converting standard
 * ISO-639 codes (any part) and spelled-out names to Tesseract's `+`-joined
 * langcode format, and mapping Tesseract codes to PaddleOCR codes.
 *
 * All functions are pure config-resolution logic that runs on the driver when
 * a partition job is planned — none of it touches executors, so no columnar
 * variants are needed. The OCR kernels themselves stay behind the documented
 * pluggable seam; these conversions are what a real deployment feeds them.
 */
object LangCodes {

  /** `TESSERACT_LANGUAGES_SPLITTER` (`partition/utils/constants.py:58`). */
  val TesseractLanguagesSplitter = "+"

  /** `PYTESSERACT_LANG_CODES` (`partition/common/lang.py:25-152`) — the full
    * published Tesseract language-pack list (pytesseract only reports
    * installed packs, so the reference pins it statically; so do we). */
  val PytesseractLangCodes: Seq[String] = Seq(
    "afr", "amh", "ara", "asm", "aze", "aze_cyrl", "bel", "ben", "bod", "bos",
    "bre", "bul", "cat", "ceb", "ces", "chi_sim", "chi_sim_vert", "chi_tra",
    "chi_tra_vert", "chr", "cos", "cym", "dan", "deu", "div", "dzo", "ell",
    "eng", "enm", "epo", "equ", "est", "eus", "fao", "fas", "fil", "fin",
    "fra", "frk", "frm", "fry", "gla", "gle", "glg", "grc", "guj", "hat",
    "heb", "hin", "hrv", "hun", "hye", "iku", "ind", "isl", "ita", "ita_old",
    "jav", "jpn", "jpn_vert", "kan", "kat", "kat_old", "kaz", "khm", "kir",
    "kmr", "kor", "kor_vert", "lao", "lat", "lav", "lit", "ltz", "mal", "mar",
    "mkd", "mlt", "mon", "mri", "msa", "mya", "nep", "nld", "nor", "oci",
    "ori", "osd", "pan", "pol", "por", "pus", "que", "ron", "rus", "san",
    "sin", "slk", "slv", "snd", "snum", "spa", "spa_old", "sqi", "srp",
    "srp_latn", "sun", "swa", "swe", "syr", "tam", "tat", "tel", "tgk", "tha",
    "tir", "ton", "tur", "uig", "ukr", "urd", "uzb", "uzb_cyrl", "vie", "yid",
    "yor")

  private val pytesseractSet = PytesseractLangCodes.toSet
  private val pytesseractPrefixes3 = PytesseractLangCodes.map(_.take(3)).toSet

  /** `PYTESSERACT_TO_PADDLE_LANG_CODE_MAP` (`lang.py:154-209`). */
  val PytesseractToPaddle: Map[String, String] = Map(
    "afr" -> "af", "ara" -> "ar", "aze" -> "az", "bel" -> "be", "bos" -> "bs",
    "bul" -> "bg", "ces" -> "cs", "chi_sim" -> "ch", "chi_tra" -> "chinese_cht",
    "cym" -> "cy", "dan" -> "da", "deu" -> "german", "eng" -> "en",
    "est" -> "et", "fas" -> "fa", "fra" -> "fr", "gle" -> "ga", "hin" -> "hi",
    "hrv" -> "hr", "hun" -> "hu", "ind" -> "id", "isl" -> "is", "ita" -> "it",
    "jpn" -> "japan", "kor" -> "korean", "kmr" -> "ku", "lat" -> "rs_latin",
    "lav" -> "lv", "lit" -> "lt", "mar" -> "mr", "mlt" -> "mt", "msa" -> "ms",
    "nep" -> "ne", "nld" -> "nl", "nor" -> "no", "pol" -> "pl", "por" -> "pt",
    "ron" -> "ro", "rus" -> "ru", "slk" -> "sk", "slv" -> "sl", "spa" -> "es",
    "sqi" -> "sq", "srp" -> "rs_cyrillic", "swa" -> "sw", "swe" -> "sv",
    "tam" -> "ta", "tel" -> "te", "tur" -> "tr", "uig" -> "ug", "ukr" -> "uk",
    "urd" -> "ur", "uzb" -> "uz", "vie" -> "vi")

  /** `TESSERACT_LANGUAGES_AND_CODES` (`partition/utils/constants.py:67-208`) —
    * spelled-out names (lowercased) to Tesseract codes. */
  val TesseractLanguagesAndCodes: Map[String, String] = Map(
    "afrikaans" -> "afr", "amharic" -> "amh", "arabic" -> "ara",
    "assamese" -> "asm", "azerbaijani" -> "aze",
    "azerbaijani - cyrilic" -> "aze_cyrl", "belarusian" -> "bel",
    "bengali" -> "ben", "tibetan" -> "bod", "bosnian" -> "bos",
    "breton" -> "bre", "bulgarian" -> "bul", "catalan; valencian" -> "cat",
    "cebuano" -> "ceb", "czech" -> "ces", "chinese - simplified" -> "chi_sim",
    "chinese" -> "chi_sim", "chinese - traditional" -> "chi_tra",
    "cherokee" -> "chr", "corsican" -> "cos", "welsh" -> "cym",
    "danish" -> "dan", "danish - fraktur" -> "dan_frak", "german" -> "deu",
    "german - fraktur (contrib)" -> "deu_frak", "dzongkha" -> "dzo",
    "greek, modern" -> "ell", "greek" -> "ell", "english" -> "eng",
    "english, middle" -> "enm", "esperanto" -> "epo",
    "math / equation detection module" -> "equ", "estonian" -> "est",
    "basque" -> "eus", "faroese" -> "fao", "persian" -> "fas",
    "filipino (old - tagalog)" -> "fil", "filipino" -> "fil",
    "finnish" -> "fin", "french" -> "fra", "german - fraktur" -> "frk",
    "french, middle" -> "frm", "western frisian" -> "fry",
    "scottish gaelic" -> "gla", "irish" -> "gle", "galician" -> "glg",
    "greek, ancient" -> "grc", "gujarati" -> "guj", "haitian" -> "hat",
    "haitian creole" -> "hat", "hebrew" -> "heb", "hindi" -> "hin",
    "croatian" -> "hrv", "hungarian" -> "hun", "armenian" -> "hye",
    "inuktitut" -> "iku", "indonesian" -> "ind", "icelandic" -> "isl",
    "italian" -> "ita", "italian - old" -> "ita_old", "javanese" -> "jav",
    "japanese" -> "jpn", "kannada" -> "kan", "georgian" -> "kat",
    "georgian - old" -> "kat_old", "kazakh" -> "kaz",
    "central khmer" -> "khm", "kirghiz" -> "kir", "kyrgyz" -> "kir",
    "kurmanji (kurdish - latin script)" -> "kmr", "korean" -> "kor",
    "korean (vertical)" -> "kor_vert", "kurdish (arabic script)" -> "kur",
    "lao" -> "lao", "latin" -> "lat", "latvian" -> "lav",
    "lithuanian" -> "lit", "luxembourgish" -> "ltz", "malayalam" -> "mal",
    "marathi" -> "mar", "macedonian" -> "mkd", "maltese" -> "mlt",
    "mongolian" -> "mon", "maori" -> "mri", "malay" -> "msa",
    "burmese" -> "mya", "nepali" -> "nep", "dutch" -> "nld",
    "flemish" -> "nld", "norwegian" -> "nor", "occitan" -> "oci",
    "oriya" -> "ori", "orientation and script detection module" -> "osd",
    "panjabi" -> "pan", "punjabi" -> "pan", "polish" -> "pol",
    "portuguese" -> "por", "pushto" -> "pus", "pashto" -> "pus",
    "quechua" -> "que", "romanian" -> "ron", "moldavian" -> "ron",
    "moldovan" -> "ron", "russian" -> "rus", "sanskrit" -> "san",
    "sinhala" -> "sin", "sinhalese" -> "sin", "slovak" -> "slk",
    "slovak - fraktur" -> "slk_frak", "slovenian" -> "slv",
    "sindhi" -> "snd", "spanish" -> "spa", "castilian" -> "spa",
    "spanish - old" -> "spa_old", "castilian - old" -> "spa_old",
    "albanian" -> "sqi", "serbian" -> "srp", "serbian - latin" -> "srp_latn",
    "sundanese" -> "sun", "swahili" -> "swa", "swedish" -> "swe",
    "syriac" -> "syr", "tamil" -> "tam", "tatar" -> "tat", "telugu" -> "tel",
    "tajik" -> "tgk", "tagalog" -> "tgl", "thai" -> "tha",
    "tigrinya" -> "tir", "tonga" -> "ton", "turkish" -> "tur",
    "uighur" -> "uig", "uyghur" -> "uig", "ukrainian" -> "ukr",
    "urdu" -> "urd", "uzbek" -> "uzb", "uzbek - cyrilic" -> "uzb_cyrl",
    "vietnamese" -> "vie", "yiddish" -> "yid", "yoruba" -> "yor")

  /** One ISO-639 row: 639-3 code, 639-2 bibliographic variant (equals part3
    * unless the language has a legacy B code), and 639-1 two-letter code
    * ("" when none is assigned). */
  final case class Iso639(part3: String, part2b: String, part1: String)

  /** Compact ISO-639 registry covering every Tesseract-supported language plus
    * the codes the reference suite exercises — the slice of the public ISO 639
    * tables (also shipped by the `iso639` package the reference imports) that
    * this module can ever be asked to resolve. Encoded `part3[:part2b][:part1]`. */
  private val iso639Rows: Seq[String] = Seq(
    "afr::af", "amh::am", "ara::ar", "asm::as", "aze::az", "bel::be",
    "ben::bn", "bod:tib:bo", "bos::bs", "bre::br", "bul::bg", "cat::ca",
    "ceb", "ces:cze:cs", "zho:chi:zh", "chr", "cos::co", "cym:wel:cy",
    "dan::da", "deu:ger:de", "div::dv", "dzo::dz", "ell:gre:el", "eng::en",
    "enm", "epo::eo", "est::et", "eus:baq:eu", "fao::fo", "fas:per:fa",
    "fil", "fin::fi", "fra:fre:fr", "frm", "fry::fy", "gla::gd", "gle::ga",
    "glg::gl", "grc", "guj::gu", "hat::ht", "heb::he", "hin::hi", "hrv::hr",
    "hun::hu", "hye:arm:hy", "iku::iu", "ind::id", "isl:ice:is", "ita::it",
    "jav::jv", "jpn::ja", "kan::kn", "kat:geo:ka", "kaz::kk", "kbd",
    "khm::km", "kir::ky", "kmr", "kor::ko", "kur", "lao::lo", "lat::la",
    "lav::lv", "lit::lt", "ltz::lb", "mal::ml", "mar::mr", "mkd:mac:mk",
    "mlt::mt", "mon::mn", "mri:mao:mi", "msa:may:ms", "mya:bur:my",
    "nep::ne", "nld:dut:nl", "nor::no", "oci::oc", "ori::or", "pan::pa",
    "pol::pl", "por::pt", "pus::ps", "que::qu", "ron:rum:ro", "rus::ru",
    "san::sa", "sin::si", "slk:slo:sk", "slv::sl", "snd::sd", "spa::es",
    "sqi:alb:sq", "srp::sr", "sun::su", "swa::sw", "swe::sv", "syr",
    "tam::ta", "tat::tt", "tel::te", "tgk::tg", "tgl", "tha::th", "tir::ti",
    "ton::to", "tur::tr", "uig::ug", "ukr::uk", "urd::ur", "uzb::uz",
    "vie::vi", "yid::yi", "yor::yo")

  private val iso639Table: Seq[Iso639] = iso639Rows.map { row =>
    val parts = row.split(":", -1)
    val part3 = parts(0)
    val part2b = if (parts.length > 1 && parts(1).nonEmpty) parts(1) else part3
    val part1 = if (parts.length > 2) parts(2) else ""
    Iso639(part3, part2b, part1)
  }

  private val iso639ByAnyCode: Map[String, Iso639] =
    iso639Table.flatMap { l =>
      Seq(l.part3 -> l, l.part2b -> l) ++
        (if (l.part1.nonEmpty) Seq(l.part1 -> l) else Nil)
    }.toMap

  /** `iso639.Language.match` over the registry slice (`lang.py:579-583`):
    * any of part1/part2b/part2t/part3, case-insensitive; None when unknown. */
  def iso639Match(lang: String): Option[Iso639] =
    iso639ByAnyCode.get(lang.toLowerCase)

  /** `_get_all_tesseract_langcodes_with_prefix` (`lang.py:376-380`). */
  def tesseractLangcodesWithPrefix(prefix: String): Seq[String] =
    PytesseractLangCodes.filter(_.startsWith(prefix))

  /**
   * `_convert_language_code_to_pytesseract_lang_code` (`lang.py:328-365`):
   * already-Tesseract codes (incl. the `equ`/`osd` special modules) pass
   * through; otherwise the ISO match's part3 → part2b → part2t prefixes are
   * tried against the Tesseract list and ALL orthographic variants with that
   * prefix are joined (`chi` → `chi_sim+chi_sim_vert+chi_tra+chi_tra_vert`).
   * Unknown or unsupported codes resolve to "" (the reference warns and
   * returns "").
   */
  def convertLanguageCodeToPytesseractLangCode(lang: String): String = {
    if (pytesseractSet.contains(lang)) return lang
    iso639Match(lang) match {
      case Some(l) =>
        val prefix =
          if (pytesseractPrefixes3.contains(l.part3)) Some(l.part3)
          else if (pytesseractPrefixes3.contains(l.part2b)) Some(l.part2b)
          else None
        prefix
          .map(p => tesseractLangcodesWithPrefix(p).mkString(TesseractLanguagesSplitter))
          .getOrElse("")
      case None => ""
    }
  }

  /** `prepare_languages_for_tesseract` (`lang.py:212-234`): convert every
    * entry, drop failures, dedupe preserving order, default to `eng` when
    * nothing survives. A null list is a caller error. */
  def prepareLanguagesForTesseract(languages: Seq[String]): String = {
    require(languages != null, "`languages` can not be `None`")
    val converted = languages
      .map(convertLanguageCodeToPytesseractLangCode)
      .filter(_.nonEmpty)
      .distinct
    if (converted.isEmpty) "eng"
    else converted.mkString(TesseractLanguagesSplitter)
  }

  /** `tesseract_to_paddle_language` (`lang.py:237-253`): lowercased lookup,
    * defaulting to `en` for unsupported codes. */
  def tesseractToPaddleLanguage(tesseractLanguage: String): String =
    PytesseractToPaddle.getOrElse(tesseractLanguage.toLowerCase, "en")

  /** `_clean_ocr_languages_arg` (`lang.py:562-576`): lists join on `+`;
    * stray quotes and brackets are stripped. */
  def cleanOcrLanguagesArg(ocrLanguages: Seq[String]): String =
    cleanOcrLanguagesArg(ocrLanguages.mkString(TesseractLanguagesSplitter))

  def cleanOcrLanguagesArg(ocrLanguages: String): String =
    ocrLanguages.replaceAll("[\"']", "").replaceAll("[\\[\\]]", "")

  /**
   * `check_language_args` (`lang.py:256-316`): reconcile `languages` with the
   * deprecated `ocr_languages`. `languages` wins when both are set;
   * `ocr_languages` fills in when `languages` is null-ish; `auto` anywhere in
   * `languages` collapses to `["auto"]`; `auto` in `ocr_languages` is an
   * error (detection is unsupported in the OCR path); spelled-out names map
   * through [[TesseractLanguagesAndCodes]]. None means "leave unspecified".
   */
  def checkLanguageArgs(languages: Seq[String],
      ocrLanguages: Option[String]): Option[Seq[String]] = {
    val cleanedOcr = ocrLanguages.map(cleanOcrLanguagesArg).filter(_.nonEmpty)
    cleanedOcr.foreach { ocr =>
      if (ocr.contains("auto"))
        throw new IllegalArgumentException(
          "`ocr_languages` is deprecated; the 'auto' argument is only for " +
            "language detection via `languages` outside the OCR path.")
    }
    val effective: Seq[String] =
      if (cleanedOcr.isDefined &&
          (languages == Seq("auto") || languages == Seq("") || languages.isEmpty))
        cleanedOcr.get.split(java.util.regex.Pattern.quote(TesseractLanguagesSplitter)).toSeq
      else languages

    if (effective.isEmpty || effective == Seq("")) None
    else if (effective.contains("auto")) Some(Seq("auto"))
    else {
      val mapped = effective.map(l => TesseractLanguagesAndCodes.getOrElse(l.toLowerCase, l))
      val cleaned = cleanOcrLanguagesArg(mapped)
      if (cleaned.isEmpty) None
      else Some(cleaned.split(java.util.regex.Pattern.quote(TesseractLanguagesSplitter)).toSeq)
    }
  }

  private val asciiRe = "^[\\x00-\\x7F]+$".r

  /**
   * `detect_languages` (`lang.py:412-505`) — the argument-resolution shell
   * around a pluggable detector. Empty text or a leading "" language yields
   * None; short all-ASCII text (< 5 whitespace words) takes the
   * `languageFallback` (default: English); explicit languages map through the
   * name table + ISO registry; otherwise `detector` runs (default: the
   * engine's script+stopword heuristic, `expr.DetectLanguage` — one code, vs
   * the reference's langdetect multi-language ranking; both deterministic).
   */
  def detectLanguages(text: String, languages: Option[Seq[String]] = None,
      languageFallback: Option[String => Option[Seq[String]]] = None,
      detector: String => Option[Seq[String]] = defaultDetector): Option[Seq[String]] = {
    val langs = languages.getOrElse(Seq("auto"))
    if (langs.headOption.contains("") || text.trim.isEmpty) return None

    if (asciiRe.matches(text) && text.split("\\s+").count(_.nonEmpty) < 5) {
      return languageFallback match {
        case Some(fb) => validateFallbackLanguages(fb(text))
        case None => Some(Seq("eng"))
      }
    }

    if (langs.nonEmpty && !langs.contains("auto")) {
      val resolved = langs.flatMap { lang =>
        val strLang = TesseractLanguagesAndCodes.getOrElse(lang.toLowerCase, lang)
        iso639Match(strLang.take(3)).map(_.part3)
      }
      Some(resolved)
    } else detector(text)
  }

  /** `_validate_fallback_languages` (`lang.py:383-409`): normalize a fallback
    * result to ISO 639-3, dropping invalid entries; None when nothing valid. */
  def validateFallbackLanguages(value: Option[Seq[String]]): Option[Seq[String]] =
    value.flatMap { langs =>
      val validated = langs.flatMap { item =>
        val lang = item.trim
        if (lang.isEmpty) None
        else if (lang == "zho") Some("zho")
        else iso639Match(lang.take(3)).map(_.part3)
      }
      if (validated.isEmpty) None else Some(validated)
    }

  private def defaultDetector(text: String): Option[Seq[String]] = {
    val code = graft.functions.expr.DetectLanguage.detect(text)
    Option(code).map(c => Seq(c.toString)).filter(_.head != "und")
  }
}
