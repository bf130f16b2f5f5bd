package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/**
 * Dev tool: run declared queries through the noop sink with a stage-level
 * listener and print, per completed stage, the task count, summed/max task
 * runtime, GC time, and shuffle/input volumes — the guide-§1 "where is the
 * wall-clock actually going" loop for a single query when the Spark UI is
 * not available (the bench runs with `spark.ui.enabled=false`).
 *
 * Usage: `sbt "runMain graft.StageProfile <sfDir> <query> [query ...]"`
 * `SPARK_GRAFT_PROFILE_RUNS=N` re-runs each query N times (default 2: the
 * second run's stages are warm, the honest per-stage comparison).
 */
object StageProfile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: StageProfile <sfDir> <query> [query ...]")
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.get("SPARK_GRAFT_PROFILE_RUNS")
      .flatMap(s => scala.util.Try(s.trim.toInt).toOption).getOrElse(2)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class StageRec(id: Int, name: String, tasks: Int, wallMs: Long,
        taskMs: Long, maxTaskMs: Long, gcMs: Long, inputMB: Double,
        shReadMB: Double, shWriteMB: Double, spillMB: Double)
    val stages = new ConcurrentLinkedQueue[StageRec]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val wall = (for (s <- si.submissionTime; c <- si.completionTime)
          yield c - s).getOrElse(-1L)
        stages.add(StageRec(si.stageId,
          si.name.split('\n').head.take(60), si.numTasks, wall,
          m.executorRunTime, -1L, m.jvmGCTime,
          m.inputMetrics.bytesRead / 1e6,
          m.shuffleReadMetrics.remoteBytesRead / 1e6 +
            m.shuffleReadMetrics.localBytesRead / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6,
          (m.memoryBytesSpilled + m.diskBytesSpilled) / 1e6))
      }
    })

    names.foreach { n =>
      (1 to runs).foreach { r =>
        stages.clear()
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val total = (System.nanoTime() - t0) / 1e9
        // listener events are posted asynchronously — drain before printing
        spark.sparkContext.listenerBus.waitUntilEmpty()
        println(f"%n=== $n run $r: $total%.2f s, ${stages.size} stages ===")
        println(f"${"stage"}%6s ${"tasks"}%5s ${"wall_s"}%8s ${"task_s"}%8s " +
          f"${"gc_s"}%6s ${"in_MB"}%8s ${"shR_MB"}%8s ${"shW_MB"}%8s " +
          f"${"spill"}%6s  name")
        import scala.jdk.CollectionConverters._
        stages.asScala.toSeq.sortBy(-_.wallMs).take(25).foreach { s =>
          println(f"${s.id}%6d ${s.tasks}%5d ${s.wallMs / 1e3}%8.2f " +
            f"${s.taskMs / 1e3}%8.2f ${s.gcMs / 1e3}%6.1f ${s.inputMB}%8.1f " +
            f"${s.shReadMB}%8.1f ${s.shWriteMB}%8.1f ${s.spillMB}%6.1f  ${s.name}")
        }
      }
    }
    spark.stop()
  }
}
