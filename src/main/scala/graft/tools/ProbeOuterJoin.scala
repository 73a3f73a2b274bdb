package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** One-off calibration probe for the stream-stream LEFT OUTER join's
  * null-emission cutoff: synthetic unmatched views at candidate offsets
  * around wm − 1h and wm − 30m, drained through
  * [[graft.streaming.OuterJoinStream]]; prints which offsets emitted. */
object ProbeOuterJoin {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    import spark.implicits._
    val M = 10000000000000L // max event time, µs (multiple of 1000)
    val wm = (M / 1000 - 3600000) * 1000
    val cut = wm - 1800000000L // hypothesized null cutoff: wm_g − 30m
    val offsets = Seq(
      ("cut-1000us", cut - 1000L),
      ("cut-999us", cut - 999L),
      ("cut-501us", cut - 501L),
      ("cut-500us", cut - 500L),
      ("cut-499us", cut - 499L),
      ("cut-2us", cut - 2L),
      ("cut-1us", cut - 1L))
    // Each probe view gets its own user (no purchases) → never matches.
    // Both sides' max event time = M so the global watermark is wm.
    val rows = offsets.zipWithIndex.map { case ((name, t), i) =>
      (1000L + i, t, 100L + i, "view", 0.0, name)
    } ++ Seq((9998L, M, 1L, "view", 0.0, "maxv"),
      (9999L, M, 1L, "purchase", 0.0, "maxp"))
    val df = rows.toDF("event_id", "tsu", "user_id", "event_type", "value", "name")
      .withColumn("ts", timestamp_micros(col("tsu")))
      .withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("probe_outer").toString
    df.coalesce(1).write.parquet(s"$dir/tmp_out")
    // single file named events.parquet, as Drain expects
    val f = new java.io.File(s"$dir/tmp_out").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(f.toPath,
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val out = graft.streaming.OuterJoinStream.runBatchEquivalent(spark, dir)
      .filter(col("purchase_id").isNull).select("view_id").as[Long].collect().toSet
    offsets.zipWithIndex.foreach { case ((name, t), i) =>
      // scalastyle:off println
      println(s"PROBE $name t=$t emitted=${out.contains(1000L + i)}")
    }
    println(s"PROBE wm=$wm")
    spark.stop()
  }
}
