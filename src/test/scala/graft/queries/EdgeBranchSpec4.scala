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

  // --------------------------------- recommender + token stats (t24)

  /** CF ratings fixture: u1 {i1:2, i2:4}, u2 {i1:4, i2:2, i3:6},
    * u3 {i2:2, i3:4} via one order per customer. */
  private lazy val cfDir: String = {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("o_orderkey", "o_custkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 1L, 2.0), (1L, 2L, 4.0), (2L, 1L, 4.0), (2L, 2L, 2.0),
      (2L, 3L, 6.0), (3L, 2L, 2.0), (3L, 3L, 4.0))
      .toDF("l_orderkey", "l_partkey", "l_quantity")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("cf_item_predict pins the micro cosines and neighbor predictions") {
    // golden_stats.py tranche24 cf: sims 730297/744208/566139 micro,
    // all 7 ratings scored, rmse 2.153394, mae 1.965193.
    val r = one(CmfQueries.cfItemPredict(spark, cfDir))
    assert(r.getAs[Long]("n_scored") == 7L)
    assert(r.getAs[Long]("n_ratings") == 7L)
    assert(r.getAs[Double]("rmse") == 2.153394)
    assert(r.getAs[Double]("mae") == 1.965193)
  }

  test("slope_one pins the integer deviation algebra") {
    // golden_stats.py tranche24 slope_one: rmse 1.437867, mae
    // 1.357143 (|e| sum 9.5 over 7).
    val r = one(CmfQueries.slopeOne(spark, cfDir))
    assert(r.getAs[Long]("n_scored") == 7L)
    assert(r.getAs[Long]("n_ratings") == 7L)
    assert(r.getAs[Double]("rmse") == 1.437867)
    assert(r.getAs[Double]("mae") == 1.357143)
  }

  test("item_decayed_pop pins the half-life terms at ages 0/30/60") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, "1995-03-02"), (2L, "1995-01-31"), (3L, "1995-01-01"))
      .toDF("o_orderkey", "d")
      .select(col("o_orderkey"), to_date(col("d")).as("o_orderdate"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 1L, 2.0), (2L, 1L, 4.0), (3L, 2L, 10.0))
      .toDF("l_orderkey", "l_partkey", "l_quantity")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // golden_stats.py tranche24 decayed_pop: age 30 halves exactly
    // (4 -> 2), age 60 quarters (10 -> 2.5); p1 = 2+2 = 4.0.
    val rows = OpsQueries.itemDecayedPop(spark, dir).collect()
      .map(r => (r.getAs[Long]("l_partkey"), r.getAs[Long]("n_lines"),
        r.getAs[Double]("decayed_popularity")))
    assert(rows.toSeq == Seq((1L, 2L, 4.0), (2L, 1L, 2.5)))
  }

  test("user_overlap pins the shared-item Jaccard and minShared gate") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("o_orderkey", "o_custkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 2L), (2L, 3L), (2L, 4L), (3L, 3L))
      .toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // golden_stats.py tranche24 user_overlap: only (u1,u2) passes
    // minShared 2: jaccard 2/(3+3-2) = 0.5; u3's single share drops.
    val rows = OpsQueries.userOverlap(spark, dir).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("entity_a") == 1L)
    assert(rows(0).getAs[Long]("entity_b") == 2L)
    assert(rows(0).getAs[Long]("shared") == 2L)
    assert(rows(0).getAs[Double]("jaccard") == 0.5)
  }

  test("segment_brand_lift pins the independence-expectation ratio") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, "S1"), (2L, "S2")).toDF("c_custkey", "c_mktsegment")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1L, "B1"), (2L, "B2")).toDF("p_partkey", "p_brand")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/part.parquet")
    Seq((1L, 1L), (2L, 2L)).toDF("o_orderkey", "o_custkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 1L), (1L, 1L), (1L, 2L), (2L, 1L))
      .toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // golden_stats.py tranche24 lift: (S1,B1) 0.888889, (S1,B2) and
    // (S2,B1) both 1.333333 over the 4-purchase grid.
    val out = OpsQueries.segmentBrandLift(spark, dir).collect()
      .map(r => (r.getAs[String]("c_mktsegment"), r.getAs[String]("p_brand")) ->
        (r.getAs[Long]("n"), r.getAs[Double]("lift"))).toMap
    assert(out == Map(
      ("S1", "B1") -> (2L, 0.888889),
      ("S1", "B2") -> (1L, 1.333333),
      ("S2", "B1") -> (1L, 1.333333)))
  }

  test("assoc_rules pins the asymmetric directional confidences") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L), (4L, 1L), (5L, 2L))
      .toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // golden_stats.py tranche24 assoc: item 1 in 4 baskets, item 2 in
    // 3 -> conf(1->2) = 0.5 but conf(2->1) = 0.666667.
    val out = StatQueries.assocRules(spark, dir).collect()
      .map(r => (r.getAs[Long]("antecedent"), r.getAs[Long]("consequent")) ->
        (r.getAs[Long]("n_ab"), r.getAs[Double]("conf"))).toMap
    assert(out == Map(
      (1L, 2L) -> (2L, 0.5),
      (2L, 1L) -> (2L, 0.666667)))
  }

  test("basket_triples pins the canonical-order support gate") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L), (2L, 3L),
      (3L, 1L), (3L, 2L), (3L, 4L))
      .toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // (1,2,3) appears in two baskets; (1,2,4) once -> filtered.
    val rows = StatQueries.basketTriples(spark, dir).collect()
    assert(rows.length == 1)
    assert((rows(0).getAs[Long]("item_a"), rows(0).getAs[Long]("item_b"),
      rows(0).getAs[Long]("item_c"), rows(0).getAs[Long]("support")) ==
      (1L, 2L, 3L, 2L))
  }

  test("token_pmi pins the doc-level PMI and the min-pair gate") {
    import spark.implicits._
    val dir = tmp()
    val texts = Seq.fill(5)("alpha beta") ++
      Seq("alpha", "beta gamma", "alpha beta gamma")
    texts.zipWithIndex.map { case (t, i) => (i + 1L, t) }
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // golden_stats.py tranche24 pmi: only (alpha,beta) survives the
    // n_ab >= 5 gate: ln(6*8/49) = -0.020619 (negative: the pair
    // co-occurs slightly LESS than independence predicts).
    val rows = OpsQueries.tokenPmi(spark, dir).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[String]("tok_a") == "alpha")
    assert(rows(0).getAs[String]("tok_b") == "beta")
    assert(rows(0).getAs[Long]("n_ab") == 6L)
    assert(rows(0).getAs[Double]("pmi") == -0.020619)
  }

  test("token_dice pins the adjacency counts and the rank order") {
    import spark.implicits._
    val dir = tmp()
    val texts = Seq.fill(5)("x y z") ++ Seq.fill(2)("y") ++ Seq.fill(2)("x")
    texts.zipWithIndex.map { case (t, i) => (i + 1L, t) }
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // golden_stats.py tranche24 dice: (y,z) 10/12 = 0.833333 outranks
    // (x,y) 10/14 = 0.714286 — the standalone x/y docs dilute only
    // the bigram whose BOTH margins they touch.
    val rows = OpsQueries.tokenDice(spark, dir).collect()
      .map(r => (r.getAs[String]("wa"), r.getAs[String]("wb"),
        r.getAs[Long]("c_ab"), r.getAs[Double]("dice")))
    assert(rows.toSeq == Seq(
      ("y", "z", 5L, 0.833333), ("x", "y", 5L, 0.714286)))
  }

  test("source_jsd pins the Jensen-Shannon terms incl. one-sided tokens") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, "A", "a a b"), (2L, "B", "a c c"))
      .toDF("doc_id", "source", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // golden_stats.py tranche24 jsd: p=(2/3,1/3,0) vs q=(1/3,0,2/3)
    // over {a,b,c} -> 0.37489.
    val r = one(StatQueries.sourceJsd(spark, dir))
    assert(r.getAs[String]("source_a") == "A")
    assert(r.getAs[String]("source_b") == "B")
    assert(r.getAs[Long]("n_union_toks") == 3L)
    assert(r.getAs[Double]("jsd") == 0.37489)
  }

  test("corpus_heaps pins the checkpoint curve and the log-log fit") {
    import spark.implicits._
    val dir = tmp()
    Seq("a b", "a c", "a b c d", "a", "e a", "a b e f", "a g", "a b c h")
      .zipWithIndex.map { case (t, i) => (i + 1L, t) }
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // golden_stats.py tranche24 heaps: cum tokens 2,4,8,9,11,15,17,21;
    // vocab 2,3,4,4,5,6,7,8; fit beta=0.57416, k_coef=1.28967.
    val out = OpsQueries.corpusHeaps(spark, dir).collect()
      .map(r => r.getAs[Long]("checkpoint") -> r).toMap
    assert(out.size == 8)
    val cum = Seq(2L, 4L, 8L, 9L, 11L, 15L, 17L, 21L)
    val voc = Seq(2L, 3L, 4L, 4L, 5L, 6L, 7L, 8L)
    (1L to 8L).foreach { k =>
      assert(out(k).getAs[Long]("cum_tokens") == cum(k.toInt - 1), s"cum $k")
      assert(out(k).getAs[Long]("vocab") == voc(k.toInt - 1), s"vocab $k")
      assert(out(k).getAs[Double]("beta") == 0.57416)
      assert(out(k).getAs[Double]("k_coef") == 1.28967)
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
