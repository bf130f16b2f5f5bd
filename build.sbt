ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "unstructuredspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked run inherits stdout directly — no sbt [info] prefix, so the driver can
// parse Bench's JSON line from raw output.
run / outputStrategy := Some(StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 32 executor threads allocating concurrently need heap headroom or G1 goes
  // collection-bound and per-query times turn erratic (observed 3 s → 20 s on
  // the same query in one bench run at 8g); the box has 128 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // Whole-document strings (a 3 MB book per parse task) are humongous
  // objects at G1's default region size; 32 concurrent parses then spend
  // the wall in region-reclaim (observed 94 s -> 23 s on a 32-file corpus).
  "-XX:G1HeapRegionSize=32m",
  // Spark whole-stage codegen emits thousands of janino classes across a
  // 147-query bench; the JVM default 240m code cache fills, JIT disables, and
  // stages intermittently run interpreted (observed 3 s → 43 s on one query).
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:+UseCodeCacheFlushing",
  // Shuffle/spill to tmpfs: /tmp is disk-backed here and intermittent writeback
  // stalls serialized whole stages on shuffle-file opens (observed 3 s → 40 s
  // run-to-run on an unchanged query); on a real cluster this is the NVMe
  // scratch volume.
  "-Dspark.local.dir=/dev/shm/spark-local",
  // AQE's coalescer targets bytes, but the CPU-heavy typed stages (chunk fold,
  // table reconstruct, doc parsers) carry kilobytes of shuffle data per core of
  // work — at the default 1m floor they collapse to 1-2 tasks and run serial
  // (observed wall == executorRunTime on 32 cores). A 16k floor keeps small-SF
  // runs parallel; at real scale partitions exceed any floor and this is inert.
  "-Dspark.sql.adaptive.coalescePartitions.minPartitionSize=16k",
)
