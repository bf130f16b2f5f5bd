package graft

import graft.operators.Registries
import graft.sources.FileType

/**
 * Environment and capability diagnostics — `unstructured doctor`
 * (`/root/reference/unstructured/doctor.py`, CLI `cli.py`).
 *
 * The reference checks pip extras and external binaries (pandoc, soffice,
 * tesseract, ffmpeg) per `FileType`; this engine's partitioners are all
 * native JVM code, so the dependency surface that remains is the set of
 * registered MODEL SEAMS (layout detector, OCR agent, STT/MT kernels) plus
 * the Spark runtime itself. The report/specifier/table machinery is ported
 * shape-for-shape; the per-type readiness rules are re-derived against the
 * seams (`doctor.py:75-121` `evaluate_file_type_capability`).
 */
object Doctor {

  /** `CapabilityResult` — readiness plus human-readable issues. */
  final case class CapabilityResult(ready: Boolean, messages: Seq[String])

  /** `partitioner_shortname` (`file_utils/model.py:230-239`): the familiar
    * `partition_<name>` suffix; None for non-partitionable types. */
  def partitionerShortname(ft: FileType): Option[String] = ft match {
    case FileType.Zip | FileType.Empty | FileType.Unknown => None
    case FileType.Eml => Some("email")
    case FileType.Txt => Some("text")
    case FileType.Png | FileType.Jpg | FileType.Bmp | FileType.Tiff |
        FileType.Gif | FileType.Heic => Some("image")
    case FileType.Wav | FileType.Flac | FileType.Mp3 | FileType.M4a |
        FileType.Ogg | FileType.Opus | FileType.Webm => Some("audio")
    case FileType.Ndjson => Some("ndjson")
    case other => Some(other.name)
  }

  /** `is_partitionable` — everything with a partitioner route. */
  def isPartitionable(ft: FileType): Boolean = partitionerShortname(ft).isDefined

  private def imageFamily: Seq[FileType] =
    FileType.all.filter(partitionerShortname(_).contains("image"))
  private def audioFamily: Seq[FileType] =
    FileType.all.filter(partitionerShortname(_).contains("audio"))

  /** `evaluate_file_type_capability` (`doctor.py:75-121`) against this
    * engine's seams: native parsers are always ready; image types need the
    * registered OCR agent (they route hi_res/ocr_only); audio types report
    * the STT stub; PDF warns when no layout detector is registered (fast
    * still works). */
  def evaluateFileTypeCapability(ft: FileType): CapabilityResult = {
    if (!isPartitionable(ft))
      return CapabilityResult(ready = false,
        Seq(s"${ft.name.toUpperCase} is not partitionable."))
    val messages = Seq.newBuilder[String]
    var ready = true
    if (imageFamily.contains(ft) && Registries.ocrAgent.isEmpty) {
      ready = false
      messages += ("No OCR agent registered - partition_image routes ocr_only. " +
        "Register with Registries.registerOcrAgent(...).")
    }
    if (audioFamily.contains(ft)) {
      // the STT kernel has no offline implementation; segmentation/timing are
      // real and transcription text is a deterministic stub
      messages += ("Speech-to-text runs the deterministic stub kernel; " +
        "transcription text is not real (seam).")
    }
    if (ft == FileType.Pdf && Registries.layoutDetector.isEmpty)
      messages += ("No layout detector registered - strategy hi_res unavailable; " +
        "fast and ocr_only (with an OCR agent) still route.")
    CapabilityResult(ready, messages.result())
  }

  /** `resolve_specifier` (`doctor.py:128-160`): map "pdf" / "png" / "image" /
    * "audio" / "email" to FileType members; exact name/MIME matches win over
    * shortname matches. */
  def resolveSpecifier(spec: String): Seq[FileType] = {
    val raw = spec.trim
    if (raw.isEmpty) throw new IllegalArgumentException("Empty specifier")
    val lower = raw.toLowerCase
    if (lower == "image") return imageFamily
    if (lower == "audio") return audioFamily
    val matches = FileType.all.filter(isPartitionable).filter { ft =>
      ft.name == lower || ft.mimeType == lower ||
        partitionerShortname(ft).contains(lower)
    }
    if (matches.isEmpty) {
      val valid = (FileType.all.filter(isPartitionable).map(_.name) ++
        Seq("image", "audio")).distinct.sorted
      throw new IllegalArgumentException(
        s"Unknown file type or alias '$spec'. Examples: ${valid.take(20).mkString(", ")}...")
    }
    val exact = matches.filter(ft => ft.name == lower || ft.mimeType == lower)
    if (exact.nonEmpty) exact else matches
  }

  /** `evaluate_specifier` (`doctor.py:163-189`): family specifiers collapse
    * to one representative; messages are prefixed per type and deduped. */
  def evaluateSpecifier(spec: String): CapabilityResult = {
    var targets = resolveSpecifier(spec)
    val family = targets.headOption.flatMap(partitionerShortname)
    if (targets.length > 1 && family.exists(f => f == "image" || f == "audio") &&
        targets.forall(t => partitionerShortname(t) == family))
      targets = targets.take(1)
    var ready = true
    val messages = Seq.newBuilder[String]
    targets.foreach { ft =>
      val r = evaluateFileTypeCapability(ft)
      if (!r.ready) ready = false
      r.messages.foreach(m => messages += s"[${ft.name.toUpperCase}] $m")
    }
    CapabilityResult(ready, messages.result().distinct)
  }

  /** File-path entry (`doctor.py` `--file`): detect the type from the bytes,
    * then evaluate it. */
  def filePathToCapability(path: String): (FileType, CapabilityResult) = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p))
      throw new java.io.FileNotFoundException(path)
    val bytes = java.nio.file.Files.readAllBytes(p)
    val ft = graft.sources.DetectFiletype.detect(p.getFileName.toString, bytes, None)
    (ft, evaluateFileTypeCapability(ft))
  }

  /** `environment_rows` — the engine runtime facts. */
  def environmentRows: Seq[(String, String, String)] = Seq(
    ("Scala", "ok", scala.util.Properties.versionNumberString),
    ("Spark", "ok", org.apache.spark.SPARK_VERSION),
    ("Java", "ok", System.getProperty("java.version")))

  /** `system_tool_rows` analog: the registered model seams. */
  def seamRows: Seq[(String, String, String)] = Seq(
    ("layout detector (hi_res)",
      if (Registries.layoutDetector.isDefined) "ok" else "missing",
      if (Registries.layoutDetector.isDefined) "registered"
      else "register with Registries.registerLayoutDetector(...)"),
    ("OCR agent (ocr_only / image)",
      if (Registries.ocrAgent.isDefined) "ok" else "missing",
      if (Registries.ocrAgent.isDefined) "registered"
      else "register with Registries.registerOcrAgent(...)"),
    ("speech-to-text kernel", "warn", "deterministic stub (seam)"),
    ("machine-translation kernel", "warn", "deterministic stub (seam)"),
    ("embedding provider", "ok", "deterministic local embedder"))

  /** `partitionable_file_type_rows` — one row per partitionable type, sorted
    * by name: (type, ready, partitioner, notes). */
  def partitionableFileTypeRows: Seq[(String, String, String, String)] =
    FileType.all.filter(isPartitionable).sortBy(_.name).map { ft =>
      val cap = evaluateFileTypeCapability(ft)
      (ft.name, if (cap.ready) "yes" else "no",
        partitionerShortname(ft).getOrElse("-"),
        if (cap.messages.isEmpty) "-" else cap.messages.mkString(" | "))
    }

  /** `format_table` (`doctor.py:240-259`) — fixed-width, no deps. */
  def formatTable(headers: Seq[String], rows: Seq[Seq[String]]): String = {
    if (rows.isEmpty) return headers.mkString(" | ") + "\n(no rows)\n"
    val widths = headers.map(_.length).toArray
    rows.foreach(_.zipWithIndex.foreach { case (c, i) =>
      widths(i) = math.max(widths(i), c.length)
    })
    val sep = widths.map("-" * _).mkString("-+-")
    val lines = Seq(
      headers.zipWithIndex.map { case (h, i) => h.padTo(widths(i), ' ') }.mkString(" | "),
      sep) ++
      rows.map(_.zipWithIndex.map { case (c, i) => c.padTo(widths(i), ' ') }.mkString(" | "))
    lines.mkString("\n") + "\n"
  }

  /** `build_report` — the full three-section diagnostic. */
  def buildReport: String = {
    val parts = Seq.newBuilder[String]
    parts += "Environment\n"
    parts += formatTable(Seq("Component", "Status", "Detail"),
      environmentRows.map(r => Seq(r._1, r._2, r._3)))
    parts += "Model seams (registered extension points)\n"
    parts += formatTable(Seq("Seam", "Status", "Detail"),
      seamRows.map(r => Seq(r._1, r._2, r._3)))
    parts += "Partitionable file types\n"
    parts += formatTable(Seq("File type", "Ready", "Partitioner", "Notes"),
      partitionableFileTypeRows.map(r => Seq(r._1, r._2, r._3, r._4)))
    parts.result().mkString
  }
}
