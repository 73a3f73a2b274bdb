package graft

/** Isolated timing probe for one shared-materialization bench entry
  * (fresh JVM per run — the per-round bench times these inside a long
  * session where co-tenant contention and GC history pollute single
  * entries; regressions flagged by the judge get re-measured here
  * before any code is blamed). Args: sfDir matName [matName …]. */
object ProbeMat {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = GraftSession.get()
    // Same warm-up discipline as Bench: JVM + codegen + parquet footers.
    SparkEntry.queries("q1_agg")(spark, sfDir).write
      .format("noop").mode("overwrite").save()
    args.drop(1).foreach { name =>
      val t0 = System.nanoTime()
      name match {
        case "_mat_pq_index" =>
          queries.DedupSimQueries.pqState(spark, sfDir)._2.count()
        case "_mat_ivfpq_index" =>
          queries.DedupSimQueries.ivfPqIndex(spark, sfDir).codedCells.count()
        case "_mat_cluster_labels" =>
          queries.DedupSimQueries.clusterLabels(spark, sfDir).count()
        case other =>
          SparkEntry.queries(other)(spark, sfDir).write
            .format("noop").mode("overwrite").save()
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $name%s ${sec}%.3f sec")
    }
    spark.stop()
  }
}
