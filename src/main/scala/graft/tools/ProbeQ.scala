package graft.tools

import graft.{GraftSession, SparkEntry}

/** Isolated per-query bench probe: time each named query (noop sink),
  * repeated `GRAFT_PROBE_REPS` times (default 2), fresh JVM semantics
  * per invocation. Usage: ProbeQ <sfDir> <query> [query ...] */
object ProbeQ {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = sys.env.getOrElse("GRAFT_PROBE_REPS", "2").toInt
    val spark = GraftSession.get()
    // warm the session like Bench does
    SparkEntry.queries("q1_agg")(spark, dir).write
      .format("noop").mode("overwrite").save()
    args.drop(1).foreach { name =>
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).write
          .format("noop").mode("overwrite").save()
        // scalastyle:off println
        println(f"PROBE $name rep$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
        // scalastyle:on println
      }
    }
    spark.stop()
  }
}
