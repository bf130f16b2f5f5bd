package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/**
 * Behavior port of `test_unstructured/partition/common/test_lang.py` — the
 * language-argument plumbing for the OCR-bearing partitioners. Pure functions,
 * no Spark session needed. The langdetect-probability cases (multi-language
 * ranking like "My lubimy mleko i chleb." → ces/pol/slk) are not portable to
 * the engine's deterministic script+stopword detector and are documented
 * divergences; everything argument-shaped is pinned here.
 */
class LangCodesSpec extends AnyFunSuite {

  import LangCodes._

  test("prepare_languages_for_tesseract with one language") {
    assert(prepareLanguagesForTesseract(Seq("en")) == "eng")
  }

  test("prepare_languages_for_tesseract dedupes converted languages") {
    assert(prepareLanguagesForTesseract(Seq("en", "eng")) == "eng")
  }

  test("prepare_languages_for_tesseract special cases osd/equ pass through") {
    assert(prepareLanguagesForTesseract(Seq("osd")) == "osd")
    assert(prepareLanguagesForTesseract(Seq("equ")) == "equ")
  }

  test("prepare_languages_for_tesseract removes empty conversions") {
    // kbd (Kabardian) is a valid ISO code with no Tesseract pack
    assert(prepareLanguagesForTesseract(Seq("kbd", "es")) == "spa+spa_old")
  }

  test("prepare_languages_for_tesseract includes orthographic variants") {
    assert(prepareLanguagesForTesseract(Seq("chi"))
      == "chi_sim+chi_sim_vert+chi_tra+chi_tra_vert")
  }

  test("prepare_languages_for_tesseract with multiple languages") {
    assert(prepareLanguagesForTesseract(Seq("ja", "afr", "en", "equ"))
      == "jpn+jpn_vert+afr+eng+equ")
  }

  test("prepare_languages_for_tesseract drops nonstandard codes") {
    assert(prepareLanguagesForTesseract(Seq("zzz", "chi"))
      == "chi_sim+chi_sim_vert+chi_tra+chi_tra_vert")
  }

  test("prepare_languages_for_tesseract drops non-tesseract languages") {
    assert(prepareLanguagesForTesseract(Seq("kbd", "eng")) == "eng")
  }

  test("prepare_languages_for_tesseract rejects null") {
    intercept[IllegalArgumentException] {
      prepareLanguagesForTesseract(null)
    }
  }

  test("prepare_languages_for_tesseract falls back to eng when nothing valid") {
    assert(prepareLanguagesForTesseract(Seq("")) == "eng")
  }

  test("tesseract_to_paddle_language valid codes") {
    val vectors = Seq("eng" -> "en", "chi_sim" -> "ch", "chi_tra" -> "chinese_cht",
      "deu" -> "german", "jpn" -> "japan", "kor" -> "korean")
    vectors.foreach { case (in, out) => assert(tesseractToPaddleLanguage(in) == out) }
  }

  test("tesseract_to_paddle_language invalid code falls back to en") {
    assert(tesseractToPaddleLanguage("unsupported_lang") == "en")
  }

  test("tesseract_to_paddle_language is case-insensitive") {
    assert(tesseractToPaddleLanguage("ENG") == "en")
    assert(tesseractToPaddleLanguage("Fra") == "fr")
    assert(tesseractToPaddleLanguage("DEU") == "german")
  }

  test("detect_languages english auto") {
    assert(detectLanguages("This is a short sentence.") == Some(Seq("eng")))
  }

  test("detect_languages english provided") {
    assert(detectLanguages("This is another short sentence.", Some(Seq("en")))
      == Some(Seq("eng")))
  }

  test("detect_languages korean auto (script route)") {
    assert(detectLanguages("안녕하세요") == Some(Seq("kor")))
  }

  test("detect_languages ignores other inputs when auto present") {
    assert(detectLanguages("This is another short sentence.",
      Some(Seq("en", "auto", "rus"))) == Some(Seq("eng")))
  }

  test("detect_languages handles spelled-out languages") {
    assert(detectLanguages("Sample text longer than 5 words.",
      Some(Seq("Spanish"))) == Some(Seq("spa")))
  }

  test("detect_languages short text fallback returning None leaves unspecified") {
    assert(detectLanguages("Hi there.", languageFallback = Some(_ => None)).isEmpty)
  }

  test("detect_languages short text fallback result is validated and used") {
    assert(detectLanguages("Hi there.",
      languageFallback = Some(_ => Some(Seq("fra")))) == Some(Seq("fra")))
  }

  test("detect_languages short ascii text defaults to English without fallback") {
    assert(detectLanguages("Hi there.") == Some(Seq("eng")))
  }

  test("detect_languages empty text or leading empty language yields None") {
    assert(detectLanguages("").isEmpty)
    assert(detectLanguages("   ").isEmpty)
    assert(detectLanguages("some text", Some(Seq(""))).isEmpty)
  }

  test("validate_fallback_languages normalizes to ISO 639-3 and drops junk") {
    assert(validateFallbackLanguages(Some(Seq("fr", " eng ", "zzz")))
      == Some(Seq("fra", "eng")))
    assert(validateFallbackLanguages(Some(Seq("zho"))) == Some(Seq("zho")))
    assert(validateFallbackLanguages(Some(Seq("zzz"))).isEmpty)
    assert(validateFallbackLanguages(None).isEmpty)
  }

  test("convert_language_code_to_pytesseract_lang_code") {
    assert(convertLanguageCodeToPytesseractLangCode("en") == "eng")
    assert(convertLanguageCodeToPytesseractLangCode("fr") == "fra")
  }

  test("clean_ocr_languages_arg vectors") {
    assert(cleanOcrLanguagesArg(Seq("eng")) == "eng")
    assert(cleanOcrLanguagesArg("\"deu\"") == "deu")
    assert(cleanOcrLanguagesArg("[deu]") == "deu")
    assert(cleanOcrLanguagesArg("['deu']") == "deu")
    assert(cleanOcrLanguagesArg(Seq("[deu]")) == "deu")
    assert(cleanOcrLanguagesArg(Seq("\"deu\"")) == "deu")
    assert(cleanOcrLanguagesArg("deu+spa") == "deu+spa")
  }

  test("check_language_args prefers languages when both defined") {
    val vectors = Seq(
      (Seq("spa"), "deu", Seq("spa")),
      (Seq("spanish"), "english", Seq("spa")),
      (Seq("spa"), "[deu]", Seq("spa")),
      (Seq("spa"), "\"deu\"", Seq("spa")),
      (Seq("spa+deu"), "eng+deu", Seq("spa", "deu")),
    )
    vectors.foreach { case (langs, ocr, expected) =>
      val got = checkLanguageArgs(langs, Some(ocr))
      assert(got.isDefined && got.get.forall(expected.contains),
        s"($langs, $ocr) -> $got")
    }
  }

  test("check_language_args uses ocr_languages when languages is empty") {
    Seq(
      (Seq.empty[String], "deu"),
      (Seq(""), "\"deu\""),
      (Seq(""), "deu"),
      (Seq(""), "[deu]"),
    ).foreach { case (langs, ocr) =>
      assert(checkLanguageArgs(langs, Some(ocr)) == Some(Seq("deu")),
        s"($langs, $ocr)")
    }
  }

  test("check_language_args returns None for null-ish defaults") {
    assert(checkLanguageArgs(Seq.empty, None).isEmpty)
    assert(checkLanguageArgs(Seq(""), None).isEmpty)
  }

  test("check_language_args collapses auto") {
    assert(checkLanguageArgs(Seq("eng", "spa", "auto"), None) == Some(Seq("auto")))
  }

  test("check_language_args rejects auto inside ocr_languages") {
    intercept[IllegalArgumentException] {
      checkLanguageArgs(Seq.empty, Some("auto"))
    }
    intercept[IllegalArgumentException] {
      checkLanguageArgs(Seq(""), Some("eng+auto"))
    }
  }
}
