package graft.sources

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import graft.SparkSuiteBase

/**
 * Robustness sweep: route EVERY file in the reference's example-docs corpus
 * (~120 files across every format family, incl. deliberately malformed ones)
 * through the auto router. The invariants:
 *
 *  - no file throws out of the router (a bad row must never kill a Spark
 *    task — partitioner errors surface as empty output, not exceptions);
 *  - the known-supported text-bearing formats each produce at least one
 *    element.
 *
 * Mirrors the spirit of `test_auto.py`'s filetype matrix without pinning
 * model-bound formats (images/audio produce metadata-only elements or
 * nothing, which is fine here).
 */
class ExampleDocsSweepSpec extends SparkSuiteBase {

  private val docsDir = Paths.get("/root/reference/example-docs")

  private val supportedExts = Set(
    "txt", "md", "org", "rst", "rtf", "html", "htm", "xml", "csv", "tsv",
    "eml", "msg", "doc", "docx", "ppt", "pptx", "xlsx", "odt", "epub", "pdf")

  test("every example doc routes without throwing; text formats yield elements") {
    val files = Files.list(docsDir).iterator().asScala
      .filter(Files.isRegularFile(_))
      .toSeq.sortBy(_.getFileName.toString)
    assert(files.size > 100)
    sweep(files, checkEmpties = true)
  }

  test("every pdf/ eml/ img/ subdirectory doc routes without throwing") {
    // the adversarial corpora live in subdirectories: every malformed /
    // encrypted / rasterized / compressed-object PDF, the full eml charset
    // matrix, and the image fixtures must never throw out of the router.
    // The two stress fixtures over 2 MB (DA-619p, the 400-page memory-error
    // regression doc) are sized out — wall-clock, not correctness.
    val files = Seq("pdf", "eml", "img").map(docsDir.resolve)
      .filter(Files.isDirectory(_))
      .flatMap(d => Files.list(d).iterator().asScala
        .filter(Files.isRegularFile(_))
        .filter(Files.size(_) < 2L * 1024 * 1024)
        .toSeq)
      .sortBy(_.getFileName.toString)
    assert(files.size > 50)
    sweep(files)
  }

  /** Route every file; collect throws, and (top-level corpus only) empties. */
  private def sweep(files: Seq[Path], checkEmpties: Boolean = false): Unit = {
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    val empties = scala.collection.mutable.ArrayBuffer.empty[String]
    files.foreach { f: Path =>
      val name = f.getFileName.toString
      val ext = name.split("\\.").last.toLowerCase
      try {
        val bytes = Files.readAllBytes(f)
        val (_, paras) = Partitioners.partitionAuto(name, bytes)
        if (paras.isEmpty && supportedExts.contains(ext) &&
          bytes.nonEmpty && !name.startsWith("empty"))
          empties += name
      } catch {
        case e: Throwable => failures += s"$name: ${e.getClass.getSimpleName} ${e.getMessage}"
      }
    }
    assert(failures.isEmpty, s"router threw on: ${failures.mkString("; ")}")
    if (!checkEmpties) return
    // the corpus's deliberately content-free samples: encrypted containers
    // (guards yield nothing rather than throwing), whitespace-only text, and
    // picture-only decks (pictures need the injected sub-partitioner)
    // (fake-incomplete-json.txt routes to TXT — truncated JSON fails the
    // strict parse and partitions as plain text, as in the reference)
    val knownEmpty = Set("fake-encrypted.msg",
      "fake-text-all-whitespace.txt", "password_protected.xlsx",
      "picture.pptx", "test-image-jpg-mime.pptx")
    assert(empties.toSet == knownEmpty,
      s"unexpected empty outputs: ${(empties.toSet -- knownEmpty).mkString(", ")}; " +
        s"newly non-empty: ${(knownEmpty -- empties.toSet).mkString(", ")}")
  }
}
