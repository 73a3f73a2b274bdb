package graft.tools

import graft.{GraftSession, SparkEntry}

/** Long-tail fixed-cost breakdown (round-17, VERDICT item 8): for each
  * named query, split the wall time into (a) DataFrame construction
  * (query-layer building, incl. any eager memo jobs), (b) analysis +
  * optimization + physical planning (executedPlan forced), and (c)
  * execution (noop sink) — run twice so the second sample shows what a
  * warm JVM/codegen cache changes. Identifies whether the ~1.1 s/entry
  * bench floor is planning, codegen/JIT, or genuine small-job work.
  * Usage: FloorProbe <sfDir> <query> [query ...] */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = args(0)
    SparkEntry.queries("q1_agg")(spark, dir).write
      .format("noop").mode("overwrite").save()
    // scalastyle:off println
    println("query\trep\tbuild_ms\tplan_ms\texec_ms")
    args.drop(1).foreach { name =>
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, dir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis→physical planning
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        println(f"$name\t$rep\t${(t1 - t0) / 1e6}%.0f\t${(t2 - t1) / 1e6}%.0f\t${(t3 - t2) / 1e6}%.0f")
      }
    }
    // scalastyle:on println
    spark.stop()
  }
}
