package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/**
 * SURVEY §4.2's O(window)-memory claim for the streaming chunk fold, pinned
 * as a real constraint instead of prose: [[ChunkMemoryProbe]] chunks one
 * ~200M-char (~400 MB in-heap) single document through 25 micro-batches in
 * a forked JVM capped at 512 MB — a fold that accumulated the open document
 * in its keyed state could not complete there. The 1225-page-book golden is
 * parity-proof; this is the memory-proof.
 */
class ChunkMemoryProofSpec extends AnyFunSuite {

  // same list as build.sbt's jdk17AddOpens — Spark 4 on JDK 17 outside
  // spark-submit needs the opens injected by hand
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("a ~400 MB single-doc stream chunks to completion in a 512 MB heap") {
    val javaBin = java.nio.file.Path.of(
      sys.props("java.home"), "bin", "java").toString
    val cp = sys.props("java.class.path")
    val dir = java.nio.file.Files.createTempDirectory("chunk-mem-probe")
    try {
      val cmd = Seq(javaBin, "-Xmx512m", "-XX:+ExitOnOutOfMemoryError",
        "-Dspark.ui.enabled=false",
        s"-Dspark.local.dir=${dir.resolve("spark-local")}") ++
        addOpens ++ Seq("-cp", cp,
        "graft.streaming.ChunkMemoryProbe", dir.toString)
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(true)
      val proc = pb.start()
      val outF = new java.io.ByteArrayOutputStream()
      val pump = new Thread(() => proc.getInputStream.transferTo(outF))
      pump.start()
      val done = proc.waitFor(480, java.util.concurrent.TimeUnit.SECONDS)
      if (!done) proc.destroyForcibly()
      pump.join(5000)
      val out = outF.toString("UTF-8")
      assert(done, "probe did not finish in 8 minutes")
      assert(proc.exitValue() == 0,
        s"probe failed (exit ${proc.exitValue()}):\n${out.takeRight(4000)}")
      val chunks = out.linesIterator
        .collectFirst { case l if l.startsWith("CHUNKS=") =>
          l.stripPrefix("CHUNKS=").trim.toLong }
      // 1M elements of 200 chars packed to 500-char chunks: >= 400k chunks
      val total = ChunkMemoryProbe.Slices * ChunkMemoryProbe.ElementsPerSlice
      assert(chunks.exists(_ >= total / 3),
        s"implausible chunk count $chunks for $total elements:\n${out.takeRight(2000)}")
    } finally graft.FsUtil.deleteRecursively(dir)
  }
}
