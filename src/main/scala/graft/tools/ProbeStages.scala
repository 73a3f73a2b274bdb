package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Time one query and print per-stage wall/task metrics (optimization
  * diagnostics). Usage: ProbeStages <sfDir> <query> */
object ProbeStages {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val buf = new java.lang.StringBuilder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val ms = for {
          s <- si.submissionTime; c <- si.completionTime
        } yield c - s
        val tm = si.taskMetrics
        buf.append(f"STAGE ${si.stageId}%4d tasks=${si.numTasks}%4d " +
          f"wall=${ms.getOrElse(-1L)}%6d ms run=${tm.executorRunTime}%7d " +
          f"gc=${tm.jvmGCTime}%6d spill=${tm.memoryBytesSpilled / 1048576}%5d MB " +
          f"sr=${tm.shuffleReadMetrics.totalBytesRead / 1048576}%5d MB " +
          f"sw=${tm.shuffleWriteMetrics.bytesWritten / 1048576}%5d MB " +
          f"srRows=${tm.shuffleReadMetrics.recordsRead}%9d " +
          f"swRows=${tm.shuffleWriteMetrics.recordsWritten}%9d%n")
      }
    })
    // warm-up
    SparkEntry.queries("q1_agg")(spark, args(0)).write
      .format("noop").mode("overwrite").save()
    buf.setLength(0)
    val t0 = System.nanoTime()
    SparkEntry.queries(args(1))(spark, args(0)).write
      .format("noop").mode("overwrite").save()
    // scalastyle:off println
    println(f"PROBE ${args(1)} total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    Thread.sleep(500)
    println(buf.toString)
    // scalastyle:on println
    spark.stop()
  }
}
