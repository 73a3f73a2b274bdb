package graft.queries

import org.apache.spark.sql.functions._

/** Round-14 golden-value tranche 23 — same method as [[EdgeBranchSpec]]
  * (constants derived independently by `tools/golden_stats.py`
  * tranche23): record-linkage (Fellegi-Sunter scoring + EM fit), the
  * local-DP mechanisms, leakage-safe encoding, the decision stump,
  * the behavior-chain predictor, cohort LTV, the causal 2×2, the
  * Simpson screen, and the Poisson bootstrap. */
class EdgeBranchSpec4 extends GoldenFixtures {

  /** ER fixture: one n_chars block; d1/d2 share lang+source+prefix16,
    * d3 flips source, d4 flips lang+source — an ASYMMETRIC pattern
    * census so a lang/source field swap cannot cancel in the EM fit. */
  private lazy val erDir: String = {
    import spark.implicits._
    val dir = tmp()
    Seq(
      (1L, "en", "web", "samecontentprefix one", 150L),
      (2L, "en", "web", "samecontentprefix two", 150L),
      (3L, "en", "wiki", "totally different text", 150L),
      (4L, "de", "wiki", "andere inhalte hier", 150L))
      .toDF("doc_id", "lang", "source", "text", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("er_scores pins the log-likelihood field weights per pattern") {
    // golden_stats.py tranche23 er: 111 -> 10.727664, 010 -> -1.357122,
    // 100 -> -2.707049, 000 -> -6.498786.
    val rows = OpsQueries.erScores(spark, erDir).collect()
      .map(r => (r.getAs[Long]("a_doc_id"), r.getAs[Long]("b_doc_id"),
        r.getAs[Double]("score")))
    assert(rows.toSeq == Seq(
      (1L, 2L, 10.727664), (3L, 4L, -1.357122),
      (1L, 3L, -2.707049), (2L, 3L, -2.707049),
      (1L, 4L, -6.498786), (2L, 4L, -6.498786)))
  }

  test("er_em_weights pins the two-iteration EM fit per field") {
    // golden_stats.py tranche23 em: lang m=0.999259/u=0.40005,
    // source m=0.998884/u=0.200092, prefix16 m=0.998152/u=0.000205,
    // lam=0.166804 — source and lang DIFFER (asymmetric census).
    val out = OpsQueries.erEmWeights(spark, erDir).collect()
      .map(r => r.getAs[String]("field") -> r).toMap
    assert(out("lang").getAs[Double]("m") == 0.999259)
    assert(out("lang").getAs[Double]("u") == 0.40005)
    assert(out("lang").getAs[Double]("ln_weight") == 0.915425)
    assert(out("source").getAs[Double]("m") == 0.998884)
    assert(out("source").getAs[Double]("u") == 0.200092)
    assert(out("source").getAs[Double]("ln_weight") == 1.607863)
    assert(out("prefix16").getAs[Double]("m") == 0.998152)
    assert(out("prefix16").getAs[Double]("u") == 0.000205)
    assert(out("prefix16").getAs[Double]("ln_weight") == 8.488536)
    assert(out("lang").getAs[Double]("lam") == 0.166804)
  }

  test("dp_rr pins the md5 coin pattern and the debiased estimate") {
    val dir = tmp()
    writeEvents(dir, (1L to 12L).map(i =>
      (i, i * Hour, i, if (i <= 5) "purchase" else "view", 1.0)))
    // golden_stats.py tranche23 rr: truthful coins keep only id 4's
    // yes; random bits add ids 3, 10, 12 -> n_reported 4, rate 1/3,
    // pi_hat (1/3 - 1/8)/(3/4) = 0.277778.
    val r = one(StatQueries.dpRandResponse(spark, dir))
    assert(r.getAs[Long]("n") == 12L)
    assert(r.getAs[Long]("n_true") == 5L)
    assert(r.getAs[Long]("n_reported") == 4L)
    assert(r.getAs[Double]("reported_rate") == 0.333333)
    assert(r.getAs[Double]("pi_hat") == 0.277778)
    assert(r.getAs[Double]("true_rate") == 0.416667)
  }

  test("dp_svt pins the Laplace threshold/query noise ladder") {
    val dir = tmp()
    countEvents(dir, 0L, Map("t" -> Seq(5, 1, 8, 2)))
    // golden_stats.py tranche23 svt: t_noisy = 4 + 19.427653; query
    // noise swings -20.8.. +122.5 — only hod 3 clears the noisy
    // threshold. All hods evaluated (prior hits stay < 3).
    val out = OpsQueries.dpSvt(spark, dir).collect()
      .map(r => r.getAs[Long]("hod") -> r).toMap
    assert(out.keySet == Set(0L, 1L, 2L, 3L))
    assert(out(0L).getAs[Double]("t_noisy") == 23.427653)
    assert(out(0L).getAs[Double]("q_noisy") == 14.397018)
    assert(out(1L).getAs[Double]("q_noisy") == -19.802581)
    assert(out(2L).getAs[Double]("q_noisy") == 2.635224)
    assert(out(3L).getAs[Double]("q_noisy") == 124.49974)
    assert((0L to 3L).forall(out(_).getAs[Boolean]("evaluated")))
    assert((0L to 2L).forall(!out(_).getAs[Boolean]("above")))
    assert(out(3L).getAs[Boolean]("above"))
  }

  test("target_encode pins the leave-one-out means and the n=1 null") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 60.0), (4L, "b", 50.0))
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // golden_stats.py tranche23 encode: loo means 40/35/15; the
    // singleton group must emit null (no self-exclusion possible).
    val out = OpsQueries.targetEncode(spark, dir).collect()
      .map(r => r.getAs[Long]("o_orderkey") -> r).toMap
    assert(out(1L).getAs[Double]("loo_mean") == 40.0)
    assert(out(2L).getAs[Double]("loo_mean") == 35.0)
    assert(out(3L).getAs[Double]("loo_mean") == 15.0)
    assert(out(4L).isNullAt(out(4L).fieldIndex("loo_mean")))
  }

  test("best_split pins the info-gain curve and the tie-broken winner") {
    import spark.implicits._
    val dir = tmp()
    Seq(("F", 1.0), ("F", 2.0), ("F", 3.0),
      ("O", 8.0), ("O", 9.0), ("O", 10.0))
      .toDF("o_orderstatus", "o_totalprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // golden_stats.py tranche23 split: perfect separation for thr in
    // [370, 730] (gain ln 2); the round-then-rank tie-break elects the
    // SMALLEST threshold, k=3.
    val out = OpsQueries.bestSplit(spark, dir).collect()
      .map(r => r.getAs[Long]("k") -> r).toMap
    assert(out.size == 9)
    val gains = Map(1L -> 0.132304, 2L -> 0.318257, 3L -> 0.693147,
      4L -> 0.693147, 5L -> 0.693147, 6L -> 0.693147, 7L -> 0.693147,
      8L -> 0.318257, 9L -> 0.132304)
    gains.foreach { case (k, g) =>
      assert(out(k).getAs[Double]("gain") == g, s"gain k=$k") }
    assert(out(3L).getAs[Long]("thr") == 370L)
    assert((1L to 9L).filter(out(_).getAs[Boolean]("is_best")) == Seq(3L))
  }

  test("markov_accuracy pins the chrono-split argmax model vs baseline") {
    val dir = tmp()
    writeEvents(dir, Seq(
      // train half (mid = 31.5h): u1 A->B->A->B, u2 C->C
      (1L, Hour, 1L, "A", 1.0), (2L, 2 * Hour, 1L, "B", 1.0),
      (3L, 3 * Hour, 1L, "A", 1.0), (4L, 4 * Hour, 1L, "B", 1.0),
      (5L, Hour, 2L, "C", 1.0), (6L, 2 * Hour, 2L, "C", 1.0),
      // test half: u1 A->B->B, u3 C->C
      (7L, 60 * Hour, 1L, "A", 1.0), (8L, 61 * Hour, 1L, "B", 1.0),
      (9L, 62 * Hour, 1L, "B", 1.0),
      (10L, 60 * Hour, 3L, "C", 1.0), (11L, 61 * Hour, 3L, "C", 1.0)))
    // golden_stats.py tranche23 markov_acc: model {A->B, B->A, C->C},
    // baseline B; test pairs A->B (both right), B->B (model wrong,
    // base right), C->C (model right, base wrong) -> 2/3 each. The
    // cross-boundary pair (B@4h -> A@60h) must be EXCLUDED.
    val r = one(StatQueries.markovAccuracy(spark, dir))
    assert(r.getAs[Long]("n_test_pairs") == 3L)
    assert(r.getAs[Long]("n_correct") == 2L)
    assert(r.getAs[Long]("n_base_correct") == 2L)
    assert(r.getAs[Long]("acc_bp") == 6666L)
    assert(r.getAs[Long]("base_acc_bp") == 6666L)
  }

  test("cohort_ltv pins the first-month cohorts and cumulative curve") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, 10.0, "1995-01-15"), (1L, 20.0, "1995-02-10"),
      (2L, 30.0, "1995-01-20"), (3L, 40.0, "1995-02-05"))
      .toDF("o_custkey", "o_totalprice", "d")
      .select(col("o_custkey"), col("o_totalprice"),
        to_date(col("d")).as("o_orderdate"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // golden_stats.py tranche23 ltv: Jan cohort (2 custs) k0 rev 40
    // cum 20/cust, k1 rev 20 cum 30/cust; Feb cohort (1) k0 rev 40.
    val out = StatQueries.cohortLtv(spark, dir).collect()
      .map(r => (r.getAs[Int]("cohort_year"), r.getAs[Int]("cohort_month"),
        r.getAs[Int]("k")) -> r).toMap
    assert(out.keySet == Set((1995, 1, 0), (1995, 1, 1), (1995, 2, 0)))
    assert(out((1995, 1, 0)).getAs[Long]("n_custs") == 2L &&
      out((1995, 1, 0)).getAs[Double]("revenue") == 40.0 &&
      out((1995, 1, 0)).getAs[Double]("cum_rev_per_cust") == 20.0)
    assert(out((1995, 1, 1)).getAs[Double]("revenue") == 20.0 &&
      out((1995, 1, 1)).getAs[Double]("cum_rev_per_cust") == 30.0)
    assert(out((1995, 2, 0)).getAs[Long]("n_custs") == 1L &&
      out((1995, 2, 0)).getAs[Double]("cum_rev_per_cust") == 40.0)
  }

  test("events_did pins the 2x2 difference-in-differences") {
    val dir = tmp()
    // users 2/4 hash treated, 1/3 control (golden_stats.py arms).
    writeEvents(dir, Seq(
      (1L, Hour, 2L, "t", 10.0), (2L, Hour, 4L, "t", 20.0),
      (3L, 2 * Hour, 1L, "t", 1.0), (4L, 2 * Hour, 3L, "t", 3.0),
      (5L, 90 * Hour, 2L, "t", 40.0), (6L, 95 * Hour, 4L, "t", 60.0),
      (7L, 92 * Hour, 1L, "t", 2.0), (8L, 99 * Hour, 3L, "t", 6.0)))
    // golden_stats.py tranche23 did: (50-15) - (4-2) = 33.
    val r = one(StatQueries.eventsDid(spark, dir))
    assert(r.getAs[Long]("n_tp") == 2L && r.getAs[Long]("n_cq") == 2L)
    assert(r.getAs[Double]("mean_treated_post") == 50.0)
    assert(r.getAs[Double]("mean_treated_pre") == 15.0)
    assert(r.getAs[Double]("mean_control_post") == 4.0)
    assert(r.getAs[Double]("mean_control_pre") == 2.0)
    assert(r.getAs[Double]("did") == 33.0)
  }

  test("simpson_check pins the per-brand vs pooled slope reversal") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, "A"), (2L, "B")).toDF("p_partkey", "p_brand")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/part.parquet")
    Seq((1L, 10.0, 0.01), (1L, 8.0, 0.02), (2L, 30.0, 0.05), (2L, 28.0, 0.06))
      .toDF("l_partkey", "l_quantity", "l_discount")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // golden_stats.py tranche23 simpson: within-brand slopes -200,
    // pooled +458.823529 -> both brands flag the reversal.
    val out = StatQueries.simpsonCheck(spark, dir).collect()
      .map(r => r.getAs[String]("p_brand") -> r).toMap
    assert(out.keySet == Set("A", "B"))
    Seq("A", "B").foreach { b =>
      assert(out(b).getAs[Double]("slope") == -200.0)
      assert(out(b).getAs[Double]("slope_all") == 458.823529)
      assert(out(b).getAs[Boolean]("sign_flip"))
    }
  }

  test("eval_bootstrap pins the Poisson multiplicity walk and CI") {
    val dir = tmp()
    // ids 16/39/48 chosen so the per-id multiplicity CROSSES Poisson
    // bands across the 100 resamples (arbitrary ids leave u inside one
    // band and every resample mean identical).
    writeEvents(dir, Seq(
      (16L, Hour, 1L, "t", 1.0), (39L, 2 * Hour, 2L, "t", 2.0),
      (48L, 3 * Hour, 3L, "t", 3.0)))
    // golden_stats.py tranche23 bootstrap: lo=1.857143, mid=hi=2.0.
    val r = one(OpsQueries.evalBootstrap(spark, dir))
    assert(r.getAs[Long]("n_resamples") == 100L)
    assert(r.getAs[Double]("ci_lo") == 1.857143)
    assert(r.getAs[Double]("ci_mid") == 2.0)
    assert(r.getAs[Double]("ci_hi") == 2.0)
  }
}
