package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/**
 * Dev tool: write `.explain("formatted")` output for declared queries to
 * files — the optimization-round evidence artifact (plans/rN/<q>_before.txt /
 * `_after.txt`), and optionally time each query through the noop sink.
 *
 * Usage: `sbt "runMain graft.PlanDump <sfDir> <outDir> <suffix> [query ...]"`
 *   e.g. `sbt "runMain graft.PlanDump /root/testdata/sf0.1 plans/r17 before q_winnow_near_dup"`
 *
 * `SPARK_GRAFT_PLAN_TIME=N` additionally runs each query N times through the
 * noop sink (same methodology as [[Bench]]) and prints per-run seconds — the
 * measure-first loop for a single query without a full bench run.
 */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <sfDir> <outDir> <suffix> [query ...]")
    val sfDir = args(0)
    val outDir = Paths.get(args(1))
    val suffix = args(2)
    val names = if (args.length > 3) args.drop(3).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(outDir)
    val timeRuns = sys.env.get("SPARK_GRAFT_PLAN_TIME")
      .flatMap(s => scala.util.Try(s.trim.toInt).toOption).getOrElse(0)
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(outDir.resolve(s"${n}_$suffix.txt"), plan)
      println(s"[plandump] wrote ${outDir.resolve(s"${n}_$suffix.txt")}")
      (1 to timeRuns).foreach { i =>
        // rebuild per run: a streaming query's function IS the drain (the
        // returned frame is the already-drained batch result), so timing
        // must re-invoke the query function exactly as Bench does
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(f"[plandump] $n run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
