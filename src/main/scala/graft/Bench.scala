package graft

/** Per-round benchmark main: times every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Hygiene: a warm-up query runs first (untimed) so JVM/session/codegen
  * startup doesn't land on the first measured query; results sink into a
  * `noop`-format write so the full plan executes without Catalyst pruning
  * the final projection (a bare `.count()` would); failures are reported
  * per query in an `errors` map instead of masquerading as wall-time.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()

    def runOnce(name: String): Either[String, Double] =
      try {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        Right((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
      }

    // Warm-up: JVM, session state, parquet footers, codegen caches.
    runOnce("q1_agg")

    val names = SparkEntry.queries.keys.toSeq.sorted
    val results = names.map(n => n -> runOnce(n))
    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
                  case c if c < ' ' => " "; case c => c.toString }
    // Locale.ROOT: "%.3f" under a comma-decimal default locale would
    // print "1,234" and corrupt the JSON line.
    def fmt(t: Double): String = String.format(java.util.Locale.ROOT, "%.3f", t)
    val qs = results.collect { case (n, Right(t)) => s""""$n":${fmt(t)}""" }
      .mkString("{", ",", "}")
    val errs = results.collect { case (n, Left(m)) => s""""$n":"${esc(m)}"""" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, Right(t)) => t }.sum
    println(
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
