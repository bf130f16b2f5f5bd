package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/**
 * Benchmark main — runs every declared query against `SPARK_GRAFT_SF_DIR` and prints
 * ONE JSON line with per-query wall seconds.
 *
 * Protocol notes (round-1 verdict fixes):
 *  - each query is materialized through the `noop` sink, not `.count()` — a count lets
 *    Catalyst prune every computed column and times a bare parquet scan;
 *  - one full un-timed warm-up pass precedes the timed pass (JIT/codegen/session
 *    warm-up amortized — mirrors the reference's own protocol,
 *    `scripts/performance/time_partition.py:19-30`);
 *  - the JSON line is also written to `bench_result.json` so the driver can parse it
 *    even if sbt decorates stdout.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }

    // SPARK_GRAFT_ONLY=q_a,q_b restricts the run for local iteration; tokens
    // are trimmed and a set-but-empty var means "no restriction".
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    names.foreach(n => runOne(n, SparkEntry.queries(n))) // warm-up pass (not recorded)
    val results = names.map(n => n -> runOne(n, SparkEntry.queries(n)))

    def jsonLine(entries: Seq[(String, Double)], total: Double): String = {
      val qs = entries.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    }

    val total = results.map(_._2).sum
    // Full per-query detail goes to bench_result.json for post-hoc analysis.
    Files.writeString(Paths.get("bench_result.json"), jsonLine(results, total) + "\n")

    // The driver keeps only the last ~2000 chars of stdout, and sbt appends a
    // "[success] Total time: ..." line after us — the printed JSON line must fit
    // in that window or the round records no bench. Print the headline subset,
    // padded with the slowest remaining queries up to the length budget.
    val headline = Seq(
      "q1_pricing_summary", "q_partition_html", "q_partition_text", "q_chunk_by_title",
      "q_chunk_basic", "q_apply_metadata", "q_lsh_near_dup", "q_minhash_signature",
      "q_ann_cosine_topk", "q_classify_text", "q_hash_ids", "q_csv_flatten")
    val byName = results.toMap
    val rest = results.filterNot(r => headline.contains(r._1)).sortBy(-_._2).map(_._1)
    var chosen = headline.filter(byName.contains) ++ rest
    var line = jsonLine(chosen.map(n => n -> byName(n)), total)
    while (line.length > 1700 && chosen.size > 1) {
      chosen = chosen.dropRight(1)
      line = jsonLine(chosen.map(n => n -> byName(n)), total)
    }
    println(line)
    spark.stop()
  }
}
