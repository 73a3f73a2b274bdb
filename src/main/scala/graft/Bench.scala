package graft

/** Per-round benchmark main: times every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Hygiene: a warm-up query runs first (untimed) so JVM/session/codegen
  * startup doesn't land on the first measured query; shared-input
  * materializations are timed as explicit `_mat_*` entries so their cost
  * stops landing on whichever consumer runs first alphabetically;
  * results sink into a `noop`-format write so the full plan executes
  * without Catalyst pruning the final projection (a bare `.count()`
  * would); failures are reported per query in an `errors` map instead of
  * masquerading as wall-time.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()

    def timed(body: => Unit): Either[String, Double] =
      try {
        val t0 = System.nanoTime()
        body
        Right((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
      }

    def runOnce(name: String): Either[String, Double] =
      timed(SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save())

    // Warm-up: JVM, session state, parquet footers, codegen caches. Must
    // be a real query (asserted, so a rename can't silently turn the
    // warm-up into a no-op) but a cheap one that touches no shared cache
    // — the `_mat_*` entries below must observe cold caches.
    val warm = "q1_agg"
    require(SparkEntry.queries.contains(warm), s"warm-up query $warm missing")
    runOnce(warm)

    // Shared-input materializations, timed explicitly: these memoized
    // tables/models (localCheckpoint + per-(session, dir) caches in the
    // queries layer) are consumed by several queries each; without these
    // entries their cost lands on the alphabetically-first consumer
    // (round 3: als_explicit recorded 25.4 s of which ~17 s was building
    // custPartRatings + the shared fit). Ordering is dependency order,
    // so each entry times only its own increment.
    val mats: Seq[(String, Either[String, Double])] = Seq(
      "_mat_cust_part_ratings" ->
        timed(queries.CmfQueries.custPartRatings(spark, sfDir).count()),
      "_mat_explicit_model" ->
        timed(queries.CmfQueries.explicitModel(spark, sfDir)),
      "_mat_part_supp_pairs" ->
        timed(queries.CmfQueries.partSuppPairs(spark, sfDir).count()),
      "_mat_ngram_pairs" ->
        timed(queries.DedupSimQueries.ngramPairs(spark, sfDir).count()),
      "_mat_cluster_labels" ->
        timed(queries.DedupSimQueries.clusterLabels(spark, sfDir).count()),
      "_mat_span_grams" ->
        timed(queries.DedupSimQueries.spanGrams(spark, sfDir).count()),
      "_mat_cooc_pairs" ->
        timed(queries.OpsQueries.coocPairs(spark, sfDir).count()),
      // The two collective fits are memoized per (session, dir) and each
      // feeds two queries; without these entries the whole fit cost lands
      // on cmf_fit_predict / cmf_implicit (alphabetically-first consumers),
      // making those entries incomparable across rounds.
      "_mat_cmf_explicit" ->
        timed(queries.CmfQueries.cmfFitPredict(spark, sfDir).count()),
      "_mat_cmf_implicit" ->
        timed(queries.CmfQueries.cmfImplicit(spark, sfDir).count()),
      "_mat_pq_index" ->
        timed(queries.DedupSimQueries.pqState(spark, sfDir)._2.count()),
      "_mat_ivfpq_index" ->
        timed(queries.DedupSimQueries.ivfPqIndex(spark, sfDir).codedCells.count()),
    )

    val names = SparkEntry.queries.keys.toSeq.sorted
    val firstPass = names.map(n => n -> runOnce(n))

    // Round-13 verdict item: single-sample wall-times on these entries
    // swung 3-6x across rounds on byte-unchanged code (host jitter, not
    // plan changes). For this pinned family — plus the stream drains,
    // whose trigger latency is scheduler-noise-bound — run a second pass
    // and publish MIN(run1, run2); both samples survive in `replicated`
    // inside the durable artifact so the reduction is auditable.
    val jitterFamily: Set[String] = Set(
      "ab_cuped", "weighted_median", "changepoint_binseg", "supplier_hhi",
      "cf_item_predict", "slope_one", "corpus_mix", "survival_km",
      "token_dice", "t_closeness", "dedup_simhash")
    // stream_checkpoint is memoized per (session, dir) — its second
    // invocation reads the cached result in ~20 ms, so a MIN there
    // would measure the cache, not the drain. Everything else in the
    // family re-executes its full plan per call (verified round 14).
    def replicated(n: String): Boolean =
      (jitterFamily(n) || n.startsWith("stream_")) && n != "stream_checkpoint"
    val secondPass: Map[String, Double] = firstPass.collect {
      case (n, Right(_)) if replicated(n) =>
        runOnce(n) match { case Right(t2) => Some(n -> t2); case Left(_) => None }
    }.flatten.toMap
    val replicatedSamples: Seq[(String, Double, Double)] = firstPass.collect {
      case (n, Right(t1)) if secondPass.contains(n) => (n, t1, secondPass(n))
    }
    val results = mats ++ firstPass.map {
      case (n, Right(t1)) if secondPass.contains(n) =>
        n -> Right(math.min(t1, secondPass(n))): (String, Either[String, Double])
      case other => other
    }
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
    val repl = replicatedSamples
      .map { case (n, t1, t2) => s""""$n":[${fmt(t1)},${fmt(t2)}]""" }
      .mkString("{", ",", "}")
    val full =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"replicated":$repl,"errors":$errs,"sf":"$sfDir"}"""
    // Durable full artifact FIRST: the driver captures stdout through a
    // bounded (~4 KB) tail buffer, and the 200+-entry full line lost its
    // front two rounds running (BENCH_r07/r08 both came back
    // `parsed: null`). The repo file carries every per-query time.
    try
      java.nio.file.Files.write(
        java.nio.file.Paths.get("bench_out.json"),
        (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch {
      case e: java.io.IOException =>
        // Without the file the full per-query data would be lost entirely
        // (stdout only carries the compact line) — fall back to dumping the
        // full line on stderr so it survives somewhere.
        System.err.println(s"bench_out.json write failed: ${e.getMessage}")
        System.err.println(full)
    }
    // Stdout gets a line guaranteed to FIT the tail buffer: same schema,
    // but `queries` holds only the slowest entries (the ones a perf
    // review reads first) and `errors` is bounded too — round 9's 36
    // untruncated error strings (~7 KB) blew the ~4 KB buffer exactly
    // when the signal mattered most. Caps: 10 errors × 80 chars.
    val ok = results.collect { case (n, Right(t)) => (n, t) }
    val slowest = ok.sortBy(-_._2).take(25)
    val qsCompact = slowest.map { case (n, t) => s""""$n":${fmt(t)}""" }
      .mkString("{", ",", "}")
    val failed = results.collect { case (n, Left(m)) => (n, m) }
    val errsCompact = failed.take(10)
      .map { case (n, m) => s""""$n":"${esc(m.take(80))}"""" }
      .mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qsCompact,"queries_measured":${ok.length},"queries_shown":${slowest.length},"full":"bench_out.json","errors":$errsCompact,"errors_total":${failed.length},"sf":"$sfDir"}"""
    println(line)
    spark.stop()
  }
}
