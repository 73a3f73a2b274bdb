package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicInteger

/** Per-entry task-width snapshot (round-17 scaling evidence): the sf0.1
  * bench can no longer resolve whether an entry parallelizes (c8 vs c32
  * totals differ by ~2%), so this records, for each named query, the
  * maximum stage task count and the total task count of its execution —
  * the direct artifact behind "the heavy stage runs cluster-wide"
  * claims. Usage: WidthSnapshot <sfDir> <outFile> <query> [query ...]
  * (query "_mats_" expands to the shared materializations, built first
  * so per-query widths time their own increment). */
object WidthSnapshot {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = args(0)
    val out = args(1)
    val maxTasks = new AtomicInteger(0)
    val totTasks = new AtomicInteger(0)
    val nStages = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        maxTasks.getAndAccumulate(e.stageInfo.numTasks, math.max)
        totTasks.addAndGet(e.stageInfo.numTasks)
        nStages.incrementAndGet()
      }
    })
    def runNoop(name: String): Unit =
      SparkEntry.queries(name)(spark, dir).write
        .format("noop").mode("overwrite").save()
    runNoop("q1_agg") // warm-up
    val sb = new StringBuilder
    sb.append("query\tmax_stage_tasks\ttotal_tasks\tn_stages\twall_s\n")
    args.drop(2).foreach { name =>
      Thread.sleep(300) // let the listener bus drain the previous entry
      maxTasks.set(0); totTasks.set(0); nStages.set(0)
      val t0 = System.nanoTime()
      try {
        if (name == "_mats_") {
          graft.queries.CmfQueries.custPartRatings(spark, dir).count()
          graft.queries.CmfQueries.coratedCapped(spark, dir).count()
          graft.queries.DedupSimQueries.bandedCosinePairs(spark, dir, 0.35).count()
          graft.queries.DedupSimQueries.embIvfIndex(spark, dir).assigned.count()
          graft.queries.DedupSimQueries.spanGrams(spark, dir).count()
          graft.queries.DedupSimQueries.pqState(spark, dir)._2.count()
          graft.queries.DedupSimQueries.ivfPqIndex(spark, dir).codedCells.count()
        } else runNoop(name)
        Thread.sleep(300)
        val w = (System.nanoTime() - t0) / 1e9
        sb.append(f"$name\t${maxTasks.get}\t${totTasks.get}\t${nStages.get}\t$w%.2f%n")
      } catch {
        case e: Throwable =>
          sb.append(s"$name\tERR\t${e.getMessage}\t\t\n")
      }
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // scalastyle:off println
    println(sb.toString)
    // scalastyle:on println
    spark.stop()
  }
}
