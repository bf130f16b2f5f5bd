package graft.functions

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuiteBase
import graft.sinks.StageStore

/**
 * The crawl-refresh durability story: stage outputs persisted through
 * [[StageStore]] make the five-stage refresh RESUMABLE — a pipeline killed
 * between stages recomputes only what the crash lost, and the resumed run
 * produces exactly the single-job (localCheckpoint) result.
 */
class CrawlRefreshRestartSpec extends SparkSuiteBase {

  private def corpus: DataFrame = {
    val sp = spark
    import sp.implicits._
    val base = Vector.tabulate(40) { i =>
      (i.toLong,
        s"alpha beta gamma doc$i sentence$i runs quietly past marker$i end",
        "src" + (i % 3), 60L + i)
    }
    val extra = Vector(
      // exact re-crawl of history doc 0 → dropped by the Bloom stage
      (101L, base(0)._2, base(0)._3, base(0)._4),
      // drifted re-crawl of history doc 2 → dropped by the near-dup stage
      (103L, base(2)._2 + " xtra", base(2)._3, base(2)._4),
      // URL collision with delta doc 1 (pinned in rawUrl below) → dropped
      // by the canonical-URL stage before any dedup runs
      (121L, "wholly unique text for the url collision case here now", "src1", 55L))
    (base ++ extra).toDF("doc_id", "text", "source", "n_chars")
  }

  // history = even base ids; delta = odd base ids + the three extras
  private def split(d: DataFrame): (DataFrame, DataFrame) = (
    d.filter(col("doc_id") < 100 && col("doc_id") % 2 === 0),
    d.filter(col("doc_id") % 2 === 1 || col("doc_id") >= 100))

  private val rawUrl = concat(lit("https://x.example.com/p/"),
    when(col("doc_id") === 121L, lit("1"))
      .otherwise(col("doc_id").cast("string")))

  private def run(materialize: (String, DataFrame) => DataFrame): Set[Long] = {
    val (history, delta) = split(corpus)
    CorpusOps.crawlRefresh(history, delta, rawUrl,
        lmRef = history, headMinAvgLp = -1e9, midMinAvgLp = -2e9,
        quota = 100, materialize = materialize)
      .select("doc_id").collect().map(_.getLong(0)).toSet
  }

  test("a refresh killed after a committed stage resumes without recomputing it") {
    val expected = run((_, df) => df.localCheckpoint(true))
    // the planted drops actually dropped (fixture sanity)
    assert(!expected.contains(101L) && !expected.contains(103L) &&
      !expected.contains(121L))
    assert(expected.contains(39L))

    val root = Files.createTempDirectory("refresh-restart").toString
    val store1 = new StageStore(spark, root)
    // crash AFTER exact_new commits (marker written), BEFORE near_new runs
    val crash = intercept[RuntimeException] {
      run { (name, df) =>
        val out = store1(name, df)
        if (name == "exact_new") throw new RuntimeException("simulated kill")
        out
      }
    }
    assert(crash.getMessage == "simulated kill")
    // url_kept commits before exact_new (r17: the canonical-URL survivor set
    // is its own materialized stage so the Bloom split's two references
    // don't re-run the URL window)
    assert(store1.completed().toSet == Set("url_kept", "exact_new"))

    // resume: exact_new is read back (zero recomputes), only near_new runs
    val store2 = new StageStore(spark, root)
    val resumed = run(store2.apply)
    assert(store2.writes == 1,
      s"resume recomputed ${store2.writes} stages, expected only near_new")
    assert(store2.completed().toSet == Set("url_kept", "exact_new", "near_new"))
    assert(resumed == expected,
      "persisted-resume result diverged from the single-job rendering")
  }

  test("a half-written stage dir without its marker is garbage: recomputed, not read") {
    val root = Files.createTempDirectory("refresh-halfwrite").toString
    val junk = java.nio.file.Path.of(root, "exact_new")
    Files.createDirectories(junk)
    Files.write(junk.resolve("part-00000-junk.parquet"), Array[Byte](1, 2, 3))
    val store = new StageStore(spark, root)
    val out = run(store.apply)
    assert(store.writes == 3, "unmarked stage dir was trusted")
    assert(out == run((_, df) => df.localCheckpoint(true)))
  }
}
