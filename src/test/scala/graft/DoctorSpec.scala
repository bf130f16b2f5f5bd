package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Registries
import graft.sources.FileType

/**
 * Capability diagnostics, ported from `test_unstructured/test_cli_doctor.py`
 * (specifier resolution, family collapse, table/report shape, file-path
 * entry) plus the seam-readiness rules specific to this engine.
 */
class DoctorSpec extends AnyFunSuite {

  // -- test_resolve_specifier_pdf / _jpg_exact --
  test("resolveSpecifier resolves exact names") {
    assert(Doctor.resolveSpecifier("pdf") === Seq(FileType.Pdf))
    assert(Doctor.resolveSpecifier("jpg") === Seq(FileType.Jpg))
  }

  // -- test_resolve_specifier_image_family / _audio_family --
  test("resolveSpecifier expands the image and audio families") {
    val images = Doctor.resolveSpecifier("image")
    assert(images.nonEmpty &&
      images.forall(ft => Doctor.partitionerShortname(ft).contains("image")))
    assert(images.contains(FileType.Png) && images.contains(FileType.Heic))
    val audio = Doctor.resolveSpecifier("audio")
    assert(audio.nonEmpty &&
      audio.forall(ft => Doctor.partitionerShortname(ft).contains("audio")))
  }

  // -- test_resolve_specifier_email_partitioner_shortname --
  test("resolveSpecifier matches partitioner shortnames") {
    assert(Doctor.resolveSpecifier("email").contains(FileType.Eml))
    assert(Doctor.resolveSpecifier("text").contains(FileType.Txt))
  }

  // -- test_resolve_specifier_unknown / _empty --
  test("resolveSpecifier rejects unknown and empty specs") {
    val unknown = intercept[IllegalArgumentException](
      Doctor.resolveSpecifier("not-a-real-type-xyz"))
    assert(unknown.getMessage.contains("Unknown"))
    val empty = intercept[IllegalArgumentException](Doctor.resolveSpecifier("   "))
    assert(empty.getMessage.contains("Empty"))
  }

  // -- test_evaluate_specifier_dedupes_image_family --
  test("evaluateSpecifier collapses a family to one representative") {
    Registries.registerOcrAgent(_ => Nil)
    try {
      val r = Doctor.evaluateSpecifier("image")
      assert(r.ready)
      // one representative evaluated -> no duplicated per-type messages
      assert(r.messages.distinct === r.messages)
    } finally Registries.clearOcrAgent()
  }

  // -- test_evaluate_specifier_dedupes_repeated_message_lines --
  test("evaluateSpecifier dedupes repeated message lines") {
    val r = Doctor.evaluateSpecifier("wav")
    assert(r.messages.count(_.contains("[WAV]")) === r.messages.distinct.size)
  }

  // -- test_evaluate_zip_not_partitionable --
  test("zip is not partitionable") {
    val r = Doctor.evaluateFileTypeCapability(FileType.Zip)
    assert(!r.ready && r.messages.exists(_.contains("not partitionable")))
  }

  // -- test_evaluate_html_no_extra --
  test("native formats are ready with no notes") {
    Seq(FileType.Html, FileType.Docx, FileType.Csv, FileType.Doc, FileType.Epub)
      .foreach { ft =>
        val r = Doctor.evaluateFileTypeCapability(ft)
        assert(r.ready && r.messages.isEmpty, ft.name)
      }
  }

  // -- seam-specific readiness (the engine's analog of the binary checks) --
  test("image readiness follows the registered OCR agent") {
    Registries.clearOcrAgent()
    assert(!Doctor.evaluateFileTypeCapability(FileType.Png).ready)
    Registries.registerOcrAgent(_ => Nil)
    try assert(Doctor.evaluateFileTypeCapability(FileType.Png).ready)
    finally Registries.clearOcrAgent()
  }

  test("pdf warns without a layout detector but stays ready") {
    Registries.clearLayoutDetector()
    val r = Doctor.evaluateFileTypeCapability(FileType.Pdf)
    assert(r.ready && r.messages.exists(_.contains("hi_res")))
    Registries.registerLayoutDetector(pages => pages.map(_ => Nil))
    try assert(Doctor.evaluateFileTypeCapability(FileType.Pdf).messages.isEmpty)
    finally Registries.clearLayoutDetector()
  }

  // -- test_format_table_empty_rows / _with_rows --
  test("formatTable renders fixed-width with a no-rows fallback") {
    assert(Doctor.formatTable(Seq("A", "B"), Nil).contains("(no rows)"))
    val out = Doctor.formatTable(Seq("Col"), Seq(Seq("val")))
    assert(out.contains("Col") && out.contains("val"))
    // column width tracks the widest cell; separator matches
    val wide = Doctor.formatTable(Seq("H"), Seq(Seq("wider-cell")))
    assert(wide.linesIterator.toSeq(1) === "----------")
  }

  // -- test_environment_rows / test_system_tool_rows_shape --
  test("environment and seam rows have the report shape") {
    val env = Doctor.environmentRows
    assert(env.map(_._1).contains("Spark") && env.map(_._1).contains("Scala"))
    assert(Doctor.seamRows.length >= 5)
  }

  // -- test_build_report_smoke --
  test("buildReport emits all three sections") {
    val report = Doctor.buildReport
    assert(report.contains("Environment"))
    assert(report.contains("Model seams"))
    assert(report.contains("Partitionable file types"))
    // every partitionable type appears
    assert(report.contains("docx") && report.contains("wav") && report.contains("pdf"))
  }

  // -- test_file_path_to_capability_txt / _zip / _missing_path --
  test("filePathToCapability detects then evaluates") {
    val tmp = Files.createTempFile("doctor", ".txt")
    Files.write(tmp, "hello doctor".getBytes)
    val (ft, cap) = Doctor.filePathToCapability(tmp.toString)
    assert(ft === FileType.Txt && cap.ready)
    val zip = Files.createTempFile("doctor", ".zip")
    // minimal empty-zip magic: PK\x05\x06 end-of-central-directory
    Files.write(zip, Array[Byte](0x50, 0x4b, 0x05, 0x06) ++ new Array[Byte](18))
    val (zft, zcap) = Doctor.filePathToCapability(zip.toString)
    assert(zft === FileType.Zip && !zcap.ready)
    assertThrows[java.io.FileNotFoundException](
      Doctor.filePathToCapability("/no/such/file.txt"))
  }
}
