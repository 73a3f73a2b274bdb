package graft.queries

import org.apache.spark.sql.functions._

/** Round-14 golden-value tranche 25 — same method as [[EdgeBranchSpec]]
  * (constants derived independently by `tools/golden_stats.py`
  * tranche25): the embedding-vector family (pooling, inertia, kNN and
  * centroid classifiers, int8 quantization, covariance, anisotropy,
  * hygiene profile) on a hand-solvable 2-D fixture, the per-group
  * preprocessing family (quantile normalization, winsorize, z-score,
  * robust scale), and Neyman allocation. */
class EdgeBranchSpec5 extends GoldenFixtures {

  /** 2-D embedding fixture: (1,[1,0],l1) (2,[3,0],l1) (3,[0,2],l2)
    * (4,[0,4],l2) (5,[2,2],l1). */
  private lazy val embDir: String = {
    import spark.implicits._
    val dir = tmp()
    Seq(
      (1L, Array(1.0f, 0.0f), 1), (2L, Array(3.0f, 0.0f), 1),
      (3L, Array(0.0f, 2.0f), 2), (4L, Array(0.0f, 4.0f), 2),
      (5L, Array(2.0f, 2.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("vec_mean_pool pins the per-label centroids") {
    // golden_stats.py tranche25 mean_pool: label 1 -> [2, 2/3],
    // label 2 -> [0, 3].
    val out = DedupSimQueries.vecMeanPool(spark, embDir).collect()
      .map(r => (r.getAs[Int]("label"), r.getAs[Int]("dim")) ->
        r.getAs[Double]("v")).toMap
    assert(out == Map(
      (1, 0) -> 2.0, (1, 1) -> 0.666667,
      (2, 0) -> 0.0, (2, 1) -> 3.0))
  }

  test("label_inertia pins the within-label SSE") {
    // golden_stats.py tranche25 inertia: label 1 sse 4.666667 over 3
    // vecs, label 2 sse 2.0 over 2.
    val out = DedupSimQueries.labelInertia(spark, embDir).collect()
      .map(r => r.getAs[Int]("label") -> r).toMap
    assert(out(1).getAs[Long]("n_vecs") == 3L &&
      out(1).getAs[Double]("sse") == 4.666667 &&
      out(1).getAs[Double]("avg_sse") == 1.555556)
    assert(out(2).getAs[Long]("n_vecs") == 2L &&
      out(2).getAs[Double]("sse") == 2.0 &&
      out(2).getAs[Double]("avg_sse") == 1.0)
  }

  test("knn_classify pins the distances and the vote tie-break") {
    // golden_stats.py tranche25 knn: query vec 5 sees d2 = 5,5,4,8 —
    // labels split 2/2, the vote tie breaks to the LOWER label 1.
    val rows = DedupSimQueries.knnClassify(spark, embDir).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("vec_id") == 5L)
    assert(rows(0).getAs[Int]("pred_label") == 1)
    assert(rows(0).getAs[Long]("votes") == 2L)
  }

  test("centroid_classify pins the exact integer distance election") {
    // golden_stats.py tranche25 centroid: dist2 4e8 (label 1) vs 5e8
    // (label 2) on the 1e4 grid -> cell (1, 1, 1).
    val rows = DedupSimQueries.centroidClassify(spark, embDir).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Int]("label_true") == 1 &&
      rows(0).getAs[Int]("label_pred") == 1 &&
      rows(0).getAs[Long]("n") == 1L)
  }

  test("vec_quantize pins the affine codes incl. the constant vector") {
    // golden_stats.py tranche25 quantize: spread vectors code to
    // {0, 255}; the constant vector 5 hits the mx == mn scale-1
    // branch and codes to zeros.
    val out = StatQueries.vecQuantize(spark, embDir).collect()
      .map(r => r.getAs[Long]("vec_id") -> r).toMap
    Seq(1L, 2L, 3L, 4L).foreach { i =>
      assert(out(i).getAs[Long]("sum_codes") == 255L, s"sum $i")
      assert(out(i).getAs[Long]("sum_sq") == 65025L, s"ssq $i")
      assert(out(i).getAs[Boolean]("within_bound"), s"bound $i")
    }
    assert(out(5L).getAs[Long]("sum_codes") == 0L &&
      out(5L).getAs[Long]("sum_sq") == 0L &&
      out(5L).getAs[Boolean]("within_bound"))
  }

  test("emb_covariance pins the exact integer moment algebra") {
    // golden_stats.py tranche25 cov: diag (1.7, 2.8), off -1.4.
    val out = OpsQueries.embCovariance(spark, embDir).collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("j")) ->
        r.getAs[Double]("cov")).toMap
    assert(out == Map((0L, 0L) -> 1.7, (0L, 1L) -> -1.4, (1L, 1L) -> 2.8))
  }

  test("emb_anisotropy pins the sum-vector concentration ratio") {
    // golden_stats.py tranche25 anisotropy: rms_norm 2.75681,
    // anisotropy |Σv|²/(n·Σ|v|²) = 1e10/1.9e10 = 0.526316.
    val r = one(OpsQueries.embAnisotropy(spark, embDir))
    assert(r.getAs[Long]("n_vectors") == 5L)
    assert(r.getAs[Long]("dim") == 2L)
    assert(r.getAs[Double]("rms_norm") == 2.75681)
    assert(r.getAs[Double]("anisotropy") == 0.526316)
  }

  test("vec_profile pins the norm stats and zero-component audit") {
    // golden_stats.py tranche25 profile: label 1 norms {1, 3, 2√2} ->
    // mean 2.276142, median 2.828427; label 2 {2, 4} -> 3.0/3.0.
    val out = OpsQueries.vecProfile(spark, embDir).collect()
      .map(r => r.getAs[Int]("label") -> r).toMap
    assert(out(1).getAs[Long]("n_vecs") == 3L &&
      out(1).getAs[Double]("mean_norm") == 2.276142 &&
      out(1).getAs[Double]("median_norm") == 2.828427 &&
      out(1).getAs[Long]("max_zero_components") == 1L)
    assert(out(2).getAs[Long]("n_vecs") == 2L &&
      out(2).getAs[Double]("mean_norm") == 3.0 &&
      out(2).getAs[Double]("median_norm") == 3.0 &&
      out(2).getAs[Long]("max_zero_components") == 1L)
  }

  // ---------------------------------------------- preprocessing (t25)

  test("quantile_norm pins the pooled-rank index mapping") {
    val dir = tmp()
    writeEvents(dir, Seq(
      (1L, Hour, 1L, "x", 1.0), (2L, 2 * Hour, 2L, "x", 5.0),
      (3L, 3 * Hour, 3L, "y", 2.0), (4L, 4 * Hour, 4L, "y", 4.0),
      (5L, 5 * Hour, 5L, "y", 6.0)))
    // golden_stats.py tranche25 qnorm: pooled sorted 1,2,4,5,6; group
    // x (m=2) maps to pooled ends {1, 6}; y (m=3) to {1, 4, 6}.
    val out = OpsQueries.quantileNorm(spark, dir).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("norm_value"))
      .toMap
    assert(out == Map(1L -> 1.0, 2L -> 6.0, 3L -> 1.0, 4L -> 4.0, 5L -> 6.0))
  }

  test("winsorize_events pins the interpolated P5/P95 clamps") {
    val dir = tmp()
    valueEvents(dir, Map("t" -> (1 to 10).map(_.toDouble)))
    // golden_stats.py tranche25 winsorize: P5 = 1.45, P95 = 9.55 over
    // 1..10 — only the extremes clamp.
    val out = OpsQueries.winsorizeEvents(spark, dir).collect()
      .map(r => r.getAs[Double]("value_w")).sorted
    assert(out.head == 1.45 && out.last == 9.55)
    assert(out.toSeq.slice(1, 9) == (2 to 9).map(_.toDouble))
  }

  test("zscore_events pins the sample-stddev scores and zero-var null") {
    val dir = tmp()
    valueEvents(dir, Map("t" -> Seq(2.0, 4.0, 6.0), "z" -> Seq(5.0, 5.0)))
    val out = OpsQueries.zscoreEvents(spark, dir).collect()
      .map(r => (r.getAs[String]("event_type"),
        Option(r.getAs[java.lang.Double]("value_z")).map(_.toDouble)))
    val t = out.filter(_._1 == "t").flatMap(_._2).sorted
    assert(t.toSeq == Seq(-1.0, 0.0, 1.0))
    assert(out.filter(_._1 == "z").forall(_._2.isEmpty))
  }

  test("robust_scale pins the median/MAD scores and the outlier") {
    val dir = tmp()
    valueEvents(dir, Map(
      "t" -> Seq(1.0, 2.0, 3.0, 4.0, 100.0), "z" -> Seq(7.0, 7.0, 7.0)))
    // golden_stats.py tranche25 robust: med 3, MAD 1 -> scores
    // ±0.674491 steps, the outlier at 65.425604; zero-MAD type null.
    val out = OpsQueries.robustScaleEvents(spark, dir).collect()
      .map(r => (r.getAs[String]("event_type"),
        Option(r.getAs[java.lang.Double]("value_r")).map(_.toDouble)))
    val t = out.filter(_._1 == "t").flatMap(_._2).sorted
    assert(t.toSeq == Seq(-1.348982, -0.674491, 0.0, 0.674491, 65.425604))
    assert(out.filter(_._1 == "z").forall(_._2.isEmpty))
  }

  // ---------------------- conformal / SESD / inventory / sketch (t26)

  test("conformal_interval pins the calibration order statistic") {
    val dir = tmp()
    writeEvents(dir, (1 to 36).map(i =>
      (i.toLong, i * Hour, i.toLong, "t", ((i * 7) % 36 + 1).toDouble)))
    // golden_stats.py tranche26 conformal: 18/9/9 chrono split, q at
    // rank ceil(10*0.9) = 9 of the calib residuals -> half-width 16.5,
    // test coverage 7/9.
    val r = one(EvalQueries.conformalInterval(spark, dir))
    assert(r.getAs[Long]("n_train") == 18L)
    assert(r.getAs[Long]("n_calib") == 9L)
    assert(r.getAs[Long]("n_test") == 9L)
    assert(r.getAs[Double]("mu") == 19.5)
    assert(r.getAs[Double]("half_width") == 16.5)
    assert(r.getAs[Double]("coverage") == 0.777778)
  }

  test("events_sesd pins the three masking-aware Grubbs rounds") {
    val dir = tmp()
    val counts = Array.fill(338)(0)
    counts(0) = 3; counts(1) = 2; counts(168) = 5; counts(169) = 2
    counts(336) = 10; counts(337) = 2
    countEvents(dir, 0L, Map("t" -> counts.toSeq))
    // golden_stats.py tranche26 sesd: the (dow,hod0) cell holds
    // residuals {-3,-1,+4}e9; round 1 removes hour 336 (g 1.754116),
    // round 2 hour 0 against the RECOMPUTED moments (1.687323),
    // round 3 hour 168 (1.5) — masking-aware re-estimation is the
    // branch a single-pass z-score cannot reproduce.
    val out = StatQueries.eventsSesd(spark, dir).collect()
      .map(r => r.getAs[Long]("esd_round") ->
        (r.getAs[Long]("hour_us"), r.getAs[Long]("n"),
          r.getAs[Double]("g_stat"))).toMap
    assert(out(1L) == ((336L * Hour, 10L, 1.754116)))
    assert(out(2L) == ((0L, 3L, 1.687323)))
    assert(out(3L) == ((168L * Hour, 5L, 1.5)))
  }

  test("events_rolling_corr pins the trailing-24h window moments") {
    val dir = tmp()
    countEvents(dir, 1L, Map(
      "click" -> (1 to 25),
      "purchase" -> (1 to 25).map(h => (h * h) % 7 + 1)))
    // golden_stats.py tranche26 rolling_corr: windows ending at hours
    // 24 and 25.
    val out = StatQueries.eventsRollingCorr(spark, dir).collect()
      .map(r => r.getAs[Long]("h") -> r.getAs[Double]("rolling_corr")).toMap
    assert(out == Map(24L -> -0.040881, 25L -> -0.100182))
  }

  test("dq_metric_drift pins the cross-multiplied 20% flags") {
    val dir = tmp()
    writeEvents(dir,
      Seq((1L, 1000L, 1L), (2L, 2000L, 1L), (3L, 3000L, 2L), (4L, 4000L, 2L),
        (5L, Day + 1000L, 1L), (6L, Day + 2000L, 1L), (7L, Day + 3000L, 1L),
        (8L, Day + 4000L, 2L), (9L, Day + 5000L, 2L),
        (10L, 2 * Day + 1000L, 1L), (11L, 2 * Day + 2000L, 1L))
        .map { case (id, ts, u) => (id, ts, u, "t", 1.0) })
    // Day 1: rows 4->5 (5*1 > 4: flagged), users 2->2 (not); day 2:
    // rows 5->2 (flagged), users 2->1 (5*1 > 2: flagged); null counts
    // never move (5*0 > 0 is false, not a 0/0 crash).
    val out = StatQueries.dqMetricDrift(spark, dir).collect()
      .map(r => r.getAs[Long]("day_idx") -> r).toMap
    assert(out(0L).isNullAt(out(0L).fieldIndex("rows_drift")))
    assert(out(1L).getAs[Boolean]("rows_drift") &&
      !out(1L).getAs[Boolean]("users_drift") &&
      !out(1L).getAs[Boolean]("null_drift"))
    assert(out(2L).getAs[Boolean]("rows_drift") &&
      out(2L).getAs[Boolean]("users_drift"))
  }

  /** Weekly-demand fixture (epoch weeks 0-4): part 1 smooth-ish
    * [1,2,3,4,10], part 2 a single spike, part 3 two demands, part 4
    * perfectly steady. */
  private lazy val demandDir: String = {
    import spark.implicits._
    val dir = tmp()
    val wk = Seq("1970-01-01", "1970-01-08", "1970-01-15", "1970-01-22",
      "1970-01-29")
    val rows = Seq(
      (1L, wk(0), 1.0), (1L, wk(1), 2.0), (1L, wk(2), 3.0),
      (1L, wk(3), 4.0), (1L, wk(4), 10.0),
      (2L, wk(2), 7.0),
      (3L, wk(0), 5.0), (3L, wk(3), 9.0),
      (4L, wk(0), 4.0), (4L, wk(1), 4.0), (4L, wk(2), 4.0),
      (4L, wk(3), 4.0), (4L, wk(4), 4.0))
    rows.toDF("l_partkey", "d", "l_quantity")
      .select(col("l_partkey"), to_timestamp(col("d")).as("l_shipdate"),
        col("l_quantity"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("newsvendor_stock pins the zero-week-shifted order statistic") {
    // golden_stats.py tranche26: targets 4/0/1/4 — part 2's four
    // implicit zero weeks push the 80% rank INTO the zero block
    // (stock 0), part 3's two push it to the first active demand.
    val out = OpsQueries.newsvendorStock(spark, demandDir).collect()
      .map(r => r.getAs[Long]("l_partkey") ->
        (r.getAs[Long]("n_active_weeks"), r.getAs[Long]("n_weeks"),
          r.getAs[Long]("stock_qty"))).toMap
    assert(out == Map(
      1L -> (5L, 5L, 4L), 2L -> (1L, 5L, 0L),
      3L -> (2L, 5L, 5L), 4L -> (5L, 5L, 4L)))
  }

  test("xyz_class pins the zero-weeks-inclusive CV bands") {
    // golden_stats.py tranche26: cv 0.790569 (Y), 2.0 (Z), 1.305405
    // (Z), 0 (X) — the single-spike part 2 hits cv = sqrt(w-1) exactly.
    val out = StatQueries.xyzClass(spark, demandDir).collect()
      .map(r => r.getAs[Long]("l_partkey") ->
        (r.getAs[Double]("cv"), r.getAs[String]("xyz"))).toMap
    assert(out == Map(
      1L -> (0.790569, "Y"), 2L -> (2.0, "Z"),
      3L -> (1.305405, "Z"), 4L -> (0.0, "X")))
  }

  test("logbin_quantiles pins the power-of-two bucket median") {
    val dir = tmp()
    valueEvents(dir, Map("t" -> Seq(0.000001, 0.000002, 0.000003,
      0.000008, 0.000016)))
    // micro values 1,2,3,8,16 -> bit buckets 0,1,1,3,4; the median
    // (rank 3) lands in bucket 1 whose upper edge 3 EQUALS the exact
    // median -> certified.
    val r = one(StatQueries.logbinQuantiles(spark, dir))
    assert(r.getAs[Long]("n_values") == 5L)
    assert(r.getAs[Int]("bucket_p50") == 1)
    assert(r.getAs[Double]("est_p50") == 0.000003)
    assert(r.getAs[Double]("exact_p50") == 0.000003)
    assert(r.getAs[Boolean]("certified"))
  }

  test("sketch_bottomk pins the KMV estimator and the n<k passthrough") {
    val dir = tmp()
    writeEvents(dir,
      (1L to 20L).map(u => (u, u * Hour, u, "big", 1.0)) ++
        (1L to 3L).map(u => (20 + u, u * Hour, u, "small", 1.0)))
    // golden_stats.py tranche26 bottomk: 16th-smallest 60-bit user
    // hash 901255563090117366 -> est 19.188589 of 20 exact (406 bp);
    // the 3-user type short-circuits to n_sk (0 bp).
    val out = StatQueries.sketchBottomk(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(out("big").getAs[Long]("n_exact") == 20L)
    assert(out("big").getAs[Long]("h_k") == 901255563090117366L)
    assert(out("big").getAs[Double]("est_distinct") == 19.188589)
    assert(out("big").getAs[Long]("err_bp") == 406L)
    assert(out("small").getAs[Long]("n_exact") == 3L)
    assert(out("small").getAs[Double]("est_distinct") == 3.0)
    assert(out("small").getAs[Long]("err_bp") == 0L)
  }

  // ------------------- text gates / drift / retention (t27)

  test("text_quality pins the three-component composite and its clamps") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, "the cat, and the dog sat."), (2L, "x" * 250), (3L, "!!! ??? ..."))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // golden_stats.py tranche27 quality: doc 2 saturates the length
    // clamp (exactly 2/3: len 1.0, punct 1.0, stop 0); doc 3's punct
    // ratio clamps the middle term to 0.
    val out = OpsQueries.textQuality(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality_score"))
      .toMap
    assert(out == Map(1L -> 0.601667, 2L -> 0.666667, 3L -> 0.018333))
  }

  test("doc_readability pins the Flesch formula on exact counts") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, "the cat, and the dog sat.")).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // golden_stats.py tranche27 readability: 6 words, 1 sentence, 6
    // vowel groups -> 206.835 - 6.09 - 84.6 = 116.145 exactly.
    val r = one(OpsQueries.docReadability(spark, dir))
    assert(r.getAs[Long]("n_words") == 6L)
    assert(r.getAs[Long]("n_sents") == 1L)
    assert(r.getAs[Long]("n_syl") == 6L)
    assert(r.getAs[Double]("flesch") == 116.145)
  }

  test("text_diversity pins TTR and the hapax share") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, "aa bb aa cc"), (2L, "zz")).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = OpsQueries.textDiversity(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_types"),
          r.getAs[Double]("ttr"), r.getAs[Double]("hapax_ratio"))).toMap
    assert(out(1L) == ((4L, 3L, 0.75, 0.5)))
    assert(out(2L) == ((1L, 1L, 1.0, 1.0)))
  }

  test("lm_vocab pins the kept-vocabulary probabilities") {
    val dir = tmp()
    lmVocabCorpus(dir)
    // golden_stats.py tranche27 lm_vocab: only 'a' (6 of 9) survives
    // minCount 5 -> logp ln(2/3).
    val rows = OpsQueries.lmVocab(spark, dir).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[String]("token") == "a")
    assert(rows(0).getAs[Long]("n") == 6L)
    assert(rows(0).getAs[Double]("logp") == -0.405465)
  }

  private def lmVocabCorpus(dir: String): Unit = {
    import spark.implicits._
    Seq((1L, "a a a a a b"), (2L, "a b c")).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("vocab_drift pins the Haldane-corrected log-odds z") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "p q"),
      (5L, "a b"), (6L, "a b"), (7L, "p q"), (8L, "p q"))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // golden_stats.py tranche27 vocab_drift: 'a b' 3-of-4 vs 2-of-4
    // -> lor 0.847298, z 0.640062; 'p q' misses the >=5 support gate.
    val rows = OpsQueries.vocabDrift(spark, dir).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[String]("tok") == "a b")
    assert(rows(0).getAs[Long]("n_first") == 3L)
    assert(rows(0).getAs[Long]("n_second") == 2L)
    assert(rows(0).getAs[Double]("log_odds") == 0.847298)
    assert(rows(0).getAs[Double]("z") == 0.640062)
  }

  test("funnel_ttc pins the window cutoffs and mean stage times") {
    val dir = tmp()
    writeEvents(dir, Seq(
      (1L, 0L, 1L, "view", 1.0),
      (2L, 1800000000L, 1L, "click", 1.0),
      (3L, 7200000000L, 1L, "purchase", 1.0),
      (4L, 0L, 2L, "view", 1.0),
      (5L, 7200000000L, 2L, "click", 1.0),
      (6L, 0L, 3L, "view", 1.0)))
    // u1 converts inside both windows (click +30 min, purchase +90
    // min after click); u2's click at +2 h misses the 1 h window.
    val r = one(OpsQueries.funnelTtc(spark, dir))
    assert(r.getAs[Long]("n_view") == 3L)
    assert(r.getAs[Long]("n_click_1h") == 1L)
    assert(r.getAs[Long]("n_purchase_24h") == 1L)
    assert(r.getAs[Double]("avg_view_click_s") == 1800.0)
    assert(r.getAs[Double]("avg_click_purchase_s") == 5400.0)
  }

  /** Activity fixture: user 1 on days 0/1/3, user 2 on day 0. */
  private def activityFixture(dir: String): Unit =
    writeEvents(dir, Seq(
      (1L, 1000L, 1L, "t", 1.0), (2L, Day + 1000L, 1L, "t", 1.0),
      (3L, 3 * Day + 1000L, 1L, "t", 1.0), (4L, 2000L, 2L, "t", 1.0)))

  test("retention_dayn pins the horizon-bounded base counts") {
    val dir = tmp()
    activityFixture(dir)
    // golden_stats.py tranche27 retention: offsets 4..7 have zero
    // horizon-eligible base rows and must be ABSENT, not 0/0.
    val out = OpsQueries.retentionDayn(spark, dir).collect()
      .map(r => r.getAs[Long]("offset_days") ->
        (r.getAs[Long]("n_base"), r.getAs[Long]("n_retained"),
          r.getAs[Double]("retention"))).toMap
    assert(out == Map(
      1L -> (3L, 1L, 0.333333), 2L -> (3L, 1L, 0.333333),
      3L -> (2L, 1L, 0.5)))
  }

  test("dau_mau pins the trailing-28-day stickiness") {
    val dir = tmp()
    activityFixture(dir)
    val out = OpsQueries.dauMauStickiness(spark, dir).collect()
      .map(r => r.getAs[Long]("day_idx") ->
        (r.getAs[Long]("dau"), r.getAs[Long]("mau"),
          r.getAs[Long]("stickiness_bp"))).toMap
    assert(out == Map(
      0L -> (2L, 2L, 10000L), 1L -> (1L, 2L, 5000L), 3L -> (1L, 2L, 5000L)))
  }

  test("drift_timeline pins the per-day smoothed PSI vs day zero") {
    val dir = tmp()
    writeEvents(dir, Seq(
      (1L, 1000L, 1L, "t", 0.0), (2L, 2000L, 2L, "t", 10.0),
      (3L, Day + 1000L, 3L, "t", 0.0), (4L, Day + 2000L, 4L, "t", 0.0),
      (5L, Day + 3000L, 5L, "t", 10.0),
      (6L, 2 * Day + 1000L, 6L, "t", 10.0), (7L, 2 * Day + 2000L, 7L, "t", 10.0)))
    // golden_stats.py tranche27 drift: day 1 psi 0.05017 (under the
    // 0.2 alert), day 2 psi 0.22992 (drifted).
    val out = OpsQueries.driftTimeline(spark, dir).collect()
      .map(r => r.getAs[Long]("day") ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("psi"),
          r.getAs[Boolean]("drifted"))).toMap
    assert(out == Map(
      1L -> (3L, 0.05017, false), 2L -> (2L, 0.22992, true)))
  }

  test("events_seasonal_anomaly pins the cell-adjusted z ranking") {
    val dir = tmp()
    val counts = Array.fill(338)(0)
    counts(0) = 3; counts(1) = 2; counts(168) = 5; counts(169) = 2
    counts(336) = 10; counts(337) = 2
    countEvents(dir, 0L, Map("t" -> counts.toSeq))
    // Same cells as the SESD fixture, single pass: residuals
    // [-3,-1,4,0,0,0], sd_samp sqrt(5.2) -> z 1.7541/-1.3156/-0.4385,
    // zero-residual hours tie-broken by hour.
    val out = OpsQueries.eventsSeasonalAnomaly(spark, dir).collect()
      .map(r => r.getAs[Long]("rk") ->
        (r.getAs[Long]("hour_us"), r.getAs[Long]("n"),
          r.getAs[Double]("expected"), r.getAs[Double]("z"))).toMap
    assert(out(1L) == ((336L * Hour, 10L, 6.0, 1.7541)))
    assert(out(2L) == ((0L, 3L, 6.0, -1.3156)))
    assert(out(3L) == ((168L * Hour, 5L, 6.0, -0.4385)))
    assert(out(4L) == ((1L * Hour, 2L, 2.0, 0.0)))
    assert(out(5L) == ((169L * Hour, 2L, 2.0, 0.0)))
  }

  test("heavy_hitters pins the ceil(phi*N) threshold boundary") {
    import spark.implicits._
    val dir = tmp()
    val singles = (0 until 20).map(i => s"c${('a' + i).toChar}").mkString(" ")
    Seq((1L, (Seq.fill(30)("aa") ++ Seq("bb", "bb")).mkString(" ")),
      (2L, singles))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // N = 52 tokens -> threshold ceil(1.04) = 2: bb qualifies AT the
    // boundary, every singleton is excluded.
    val rows = OpsQueries.heavyHittersTokens(spark, dir).collect()
      .map(r => (r.getAs[String]("item"), r.getAs[Long]("freq")))
    assert(rows.toSeq == Seq(("aa", 30L), ("bb", 2L)))
  }

  test("cm_sketch pins the md5 counters on a collision-free corpus") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, "aa bb aa cc aa"), (2L, "aa bb dd")).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // golden_stats.py tranche26: no (r, bucket) collisions at width
    // 256 -> every estimate equals its exact count.
    val rows = OpsQueries.cmSketchTokens(spark, dir).collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("n_exact"),
        r.getAs[Long]("n_est"), r.getAs[Boolean]("never_under")))
    assert(rows.toSeq == Seq(
      ("aa", 4L, 4L, true), ("bb", 2L, 2L, true),
      ("cc", 1L, 1L, true), ("dd", 1L, 1L, true)))
  }

  test("sample_neyman pins the n-sigma allocation and zero-var stratum") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, 1, 1.0), (2L, 1, 3.0), (3L, 2, 5.0), (4L, 2, 5.0),
      (5L, 3, 0.0), (6L, 3, 6.0))
      .toDF("c_custkey", "c_nationkey", "c_acctbal")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // golden_stats.py tranche25 neyman: x = n·sd_pop = 200/0/600 ->
    // quotas 125/0/375 of k=500 — the ZERO-VARIANCE stratum gets
    // nothing (its rows vanish from the sample entirely).
    val out = OpsQueries.sampleNeyman(spark, dir).collect()
      .map(r => r.getAs[Long]("c_custkey") -> r.getAs[Long]("quota")).toMap
    assert(out == Map(1L -> 125L, 2L -> 125L, 5L -> 375L, 6L -> 375L))
  }
}
