package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import scala.collection.mutable

import graft.SparkSuiteBase
import graft.operators.Chunker.PyStringOps

/**
 * Differential harness for the filetype text differentiators:
 * `dev/gen_filetype_diff_vectors.py` ran the REFERENCE
 * `_TextFileDifferentiator` (`file_utils/filetype.py`) over ~390 seeded
 * payloads — csv grids with quoted/unbalanced/ragged cells, Python-only line
 * breaks (VT/FF/FS/GS/RS/NEL/LS/PS), exotic leading whitespace, json
 * collections/scalars/truncations/ndjson, and >4096-char head-cut cases —
 * and pinned `_is_csv` / `_is_json`. Replayed through the engine's
 * [[DetectFiletype.looksLikeCsv]] (over the 4096-char `text_head`, as the
 * reference sees it) and the JSON-collection gate `sniffText` uses.
 *
 * `_is_eml` is deliberately not pinned: the engine's EML sniff stands in for
 * libmagic's message/rfc822 detection (there is no libmagic stage before it),
 * which is looser than the differentiator's strict header regex.
 */
class FileTypeDifferentialSpec extends SparkSuiteBase {

  test("all reference filetype differential vectors replay identically") {
    val rows = spark.read
      .json("src/test/resources/graft/refvec/filetype_diff.ndjson")
      .select("payload_b64", "is_csv", "is_json")
      .collect()
    assert(rows.length == 391)
    val failures = mutable.ArrayBuffer[String]()
    rows.zipWithIndex.foreach { case (r, i) =>
      val text = new String(Base64.getDecoder.decode(r.getString(0)), UTF_8)
      val gotCsv = DetectFiletype.looksLikeCsv(text.take(4096))
      val stripped = text.pyStripLeading
      val gotJson = (stripped.startsWith("{") || stripped.startsWith("[")) &&
        DetectFiletype.parsesAsJsonCollection(text)
      if (gotCsv != r.getBoolean(1))
        failures += s"case $i csv: got $gotCsv want ${r.getBoolean(1)}: ${text.take(60)}"
      if (gotJson != r.getBoolean(2))
        failures += s"case $i json: got $gotJson want ${r.getBoolean(2)}: ${text.take(60)}"
    }
    assert(failures.isEmpty,
      s"${failures.size} divergences:\n${failures.take(12).mkString("\n")}")
  }
}
