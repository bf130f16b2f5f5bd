package graft

import org.apache.spark.sql.SparkSession

/**
 * Dev tool: dump physical-plan facts (join strategies, shuffle count, parquet
 * pushdown, codegen spans) for the declared queries — the scale-review loop
 * (`.explain`-and-iterate) as a runnable main.
 *
 * Usage: `sbt "runMain graft.PlanAudit [sfDir] [query ...]"`.
 */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // static plans (AQE hides codegen spans until runtime re-planning)
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val plan = SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan.toString
      def count(re: String) = re.r.findAllIn(plan).size
      val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findFirstIn(plan).getOrElse("")
      println(f"$n%-28s bhj=${count("BroadcastHashJoin")} smj=${count("SortMergeJoin")} " +
        f"bnl=${count("BroadcastNestedLoopJoin")} exch=${count("Exchange")} " +
        f"codegen=${count("\\*\\(")} ${pushed.take(90)}")
      // SPARK_GRAFT_PLAN_DUMP=1 prints the full physical plan per query
      if (sys.env.get("SPARK_GRAFT_PLAN_DUMP").contains("1")) println(plan)
    }
    spark.stop()
  }
}
