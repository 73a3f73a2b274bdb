package graft.tools

import graft.{GraftSession, SparkEntry}

/** Long-session ambient-cost diagnostic (round 17, guide §1): runs the
  * same first pass as Bench (alphabetical, noop sink) and records, per
  * entry, wall time plus JVM-ambient counters — GC time delta, JIT
  * compilation time delta, heap in use, live cached-RDD count and
  * storage-memory bytes — then re-runs a probe set of early entries at
  * the END of the session. If the probe re-runs are much slower than
  * their first samples, the bench's per-entry times are dominated by
  * accumulated session state, not by the entries' own plans.
  *
  * Usage: BenchDiag <sfDir> [limit] — output TSV on stdout.
  */
object BenchDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val limit = if (args.length > 1) args(1).toInt else Int.MaxValue
    val spark = GraftSession.get()
    val sc = spark.sparkContext

    import java.lang.management.ManagementFactory
    import scala.jdk.CollectionConverters._
    def gcMs: Long =
      ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    def jitMs: Long = ManagementFactory.getCompilationMXBean.getTotalCompilationTime
    def heapMb: Long = {
      val r = Runtime.getRuntime
      (r.totalMemory - r.freeMemory) / 1048576
    }
    def storage: (Int, Long) = {
      val rdds = sc.getPersistentRDDs
      val mem = sc.getExecutorMemoryStatus.values
        .map { case (max, free) => max - free }.sum
      (rdds.size, mem / 1048576)
    }

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).write
        .format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"ERR $name: ${e.getMessage}") }
      (System.nanoTime() - t0) / 1e9
    }

    run("q1_agg") // warm-up, like Bench
    println("seq\tname\twall_s\tgc_delta_ms\tjit_delta_ms\theap_mb\tn_rdds\tstorage_mb")
    val names = SparkEntry.queries.keys.toSeq.sorted.take(limit)
    var (gc0, jit0) = (gcMs, jitMs)
    names.zipWithIndex.foreach { case (n, i) =>
      val w = run(n)
      val (g1, j1) = (gcMs, jitMs)
      val (nr, smb) = storage
      println(f"$i\t$n\t$w%.2f\t${g1 - gc0}\t${j1 - jit0}\t$heapMb\t$nr\t$smb")
      gc0 = g1; jit0 = j1
    }
    // End-of-session probe: re-run a fixed early slice and q1_agg.
    val probe = names.take(15)
    probe.zipWithIndex.foreach { case (n, i) =>
      val w = run(n)
      val (g1, j1) = (gcMs, jitMs)
      val (nr, smb) = storage
      println(f"RERUN$i\t$n\t$w%.2f\t${g1 - gc0}\t${j1 - jit0}\t$heapMb\t$nr\t$smb")
      gc0 = g1; jit0 = j1
    }
    spark.stop()
  }
}
