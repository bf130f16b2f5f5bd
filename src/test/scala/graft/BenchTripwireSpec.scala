package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * CI surface for the bench regression tripwire: `dev/bench_compare.py` (no
 * args) diffs the two newest driver `BENCH_r*.json` artifacts per query and
 * exits 1 only when a common query regressed past 1.5× while the fleet
 * median stayed stable — a plan-level cause, not box contention. Running it
 * inside `sbt test` means a regression of that class fails the build
 * instead of waiting for a judge to run the script by hand.
 *
 * Noise adjudication is mechanical: before failing, the script consults the
 * newest committed `BENCH_QUIET_r*.json` (per-query minima over isolated
 * re-runs, `dev/bench_quiet.sh`). A flagged query whose quiet minimum is
 * within the threshold of its OLD cost was contention, not a regression.
 * The synthetic tests below pin both directions — adjudication must clear
 * noise AND must NOT clear a query whose quiet minimum is still slow.
 */
class BenchTripwireSpec extends AnyFunSuite {

  private def python: Option[String] =
    Seq("/usr/bin/python3", "/usr/local/bin/python3", "/bin/python3")
      .find(new java.io.File(_).exists())

  /** Run bench_compare.py with the given args; (exitCode, combined output). */
  private def compare(args: Seq[String]): (Int, String) = {
    val root = new java.io.File(".").getCanonicalFile
    val pb = new ProcessBuilder(
      (Seq(python.get, "dev/bench_compare.py") ++ args): _*)
    pb.directory(root)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    // Drain as raw bytes first and decode explicitly as UTF-8: the script's
    // drift notes contain multibyte characters (em-dashes), and the JVM
    // default charset on this box is not UTF-8, so a Source-based read threw
    // MalformedInputException and masked the (green) comparison verdict.
    val raw = proc.getInputStream.readAllBytes()
    val code = proc.waitFor()
    (code, new String(raw, java.nio.charset.StandardCharsets.UTF_8))
  }

  test("the two newest driver bench artifacts show no plan-level regression") {
    val root = new java.io.File(".").getCanonicalFile
    val artifacts = Option(root.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(_.getName.matches("BENCH_r\\d+\\.json"))
    assume(artifacts.length >= 2, "needs two driver bench artifacts to diff")
    val script = new java.io.File(root, "dev/bench_compare.py")
    assume(script.exists(), "dev/bench_compare.py missing")
    assume(python.isDefined, "python3 not available on this box")
    val (code, out) = compare(Seq.empty)
    out.linesIterator.foreach(info(_))
    assert(code == 0,
      s"bench_compare flagged a plan-level regression (exit $code):\n$out")
  }

  // --- synthetic both-direction pins for the quiet-minima adjudication ---

  private def writeArtifact(dir: java.nio.file.Path, name: String,
                            queries: Map[String, Double]): java.io.File = {
    val qs = queries.map { case (k, v) => s""""$k": $v""" }.mkString(", ")
    val f = dir.resolve(name).toFile
    val w = new java.io.PrintWriter(f, "UTF-8")
    try w.write(s"""{"metric": "total", "unit": "sec", "sf": "synthetic", """ +
      s""""value": ${queries.values.sum}, "queries": {$qs}}""")
    finally w.close()
    f
  }

  /** Nine stable queries + one regressed 2.0s→4.0s: median 1.0x, flag 2.0x. */
  private def syntheticPair(dir: java.nio.file.Path): (String, String) = {
    val stable = (1 to 9).map(i => s"q_stable_$i" -> 1.0).toMap
    val old = writeArtifact(dir, "old.json", stable + ("q_hot" -> 2.0))
    val neu = writeArtifact(dir, "new.json", stable + ("q_hot" -> 4.0))
    (old.getPath, neu.getPath)
  }

  private def writeQuiet(dir: java.nio.file.Path, name: String,
                         queries: Map[String, Double]): String = {
    val qs = queries.map { case (k, v) => s""""$k": $v""" }.mkString(", ")
    val f = dir.resolve(name).toFile
    val w = new java.io.PrintWriter(f, "UTF-8")
    try w.write(s"""{"metric": "quiet_min", "unit": "sec", "runs": 3, """ +
      s""""value": ${queries.values.sum}, "queries": {$qs}}""")
    finally w.close()
    f.getPath
  }

  test("a flagged query whose quiet minimum returned to the old cost is noise, exit 0") {
    assume(python.isDefined, "python3 not available on this box")
    val dir = java.nio.file.Files.createTempDirectory("tripwire")
    try {
      val (oldP, newP) = syntheticPair(dir)
      val quiet = writeQuiet(dir, "quiet.json", Map("q_hot" -> 2.1))
      val (code, out) = compare(Seq(oldP, newP, "--quiet", quiet))
      assert(code == 0, s"noise adjudication should pass:\n$out")
      assert(out.contains("NOISE q_hot"), out)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("a flagged query whose quiet minimum is STILL slow fails, exit 1") {
    assume(python.isDefined, "python3 not available on this box")
    val dir = java.nio.file.Files.createTempDirectory("tripwire")
    try {
      val (oldP, newP) = syntheticPair(dir)
      val quiet = writeQuiet(dir, "quiet.json", Map("q_hot" -> 3.9))
      val (code, out) = compare(Seq(oldP, newP, "--quiet", quiet))
      assert(code == 1, s"real regression must still fail:\n$out")
      assert(out.contains("REGRESSED q_hot"), out)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("auto-discovery ignores a LATER round's quiet record (exact-round only), exit 1") {
    // A BENCH_QUIET_r(N+1).json is measured on round-N+1 code; letting it
    // adjudicate a round-N artifact could whitewash an rN regression that
    // rN+1 happens to fix. find_quiet must consult ONLY the exact round.
    assume(python.isDefined, "python3 not available on this box")
    val dir = java.nio.file.Files.createTempDirectory("tripwire")
    try {
      val stable = (1 to 9).map(i => s"q_stable_$i" -> 1.0).toMap
      writeArtifact(dir, "BENCH_r5.json", stable + ("q_hot" -> 2.0))
      writeArtifact(dir, "BENCH_r6.json", stable + ("q_hot" -> 4.0))
      // Later-round quiet record says q_hot is fine — must NOT be consulted.
      writeQuiet(dir, "BENCH_QUIET_r7.json", Map("q_hot" -> 2.0))
      val script = new java.io.File("dev/bench_compare.py").getCanonicalFile
      val pb = new ProcessBuilder(python.get, script.getPath)
      pb.directory(dir.toFile)
      pb.redirectErrorStream(true)
      val proc = pb.start()
      val raw = proc.getInputStream.readAllBytes()
      val code = proc.waitFor()
      val out = new String(raw, java.nio.charset.StandardCharsets.UTF_8)
      assert(code == 1, s"later-round quiet record must not adjudicate:\n$out")
      assert(out.contains("ignoring later-round quiet"), out)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("a flagged query the quiet artifact does not cover still fails, exit 1") {
    assume(python.isDefined, "python3 not available on this box")
    val dir = java.nio.file.Files.createTempDirectory("tripwire")
    try {
      val (oldP, newP) = syntheticPair(dir)
      val quiet = writeQuiet(dir, "quiet.json", Map("q_other" -> 0.5))
      val (code, out) = compare(Seq(oldP, newP, "--quiet", quiet))
      assert(code == 1, s"uncovered flag must still fail:\n$out")
      assert(out.contains("REGRESSED q_hot"), out)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }
}
