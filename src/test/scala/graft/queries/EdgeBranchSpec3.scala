package graft.queries

import org.apache.spark.sql.functions._

/** Round-14 golden-value tranche 20 — same method as [[EdgeBranchSpec]]
  * (constants derived independently by `tools/golden_stats.py`
  * tranche20), extending the tier to the retrieval-ranking, rank-fusion,
  * eval, language-model and agreement families.
  *
  * The shared retrieval corpus is built so the BM25 and TF-IDF rankings
  * DISAGREE: d2/d3 carry identical BM25 stats for `key` (tf 1, dl 8 —
  * the tie breaks by doc_id) while d2's vector norm is dominated by a
  * repeated filler token and d3's fillers are distinct, so TF-IDF
  * inverts the pair — pinning the sign of every downstream rank
  * comparison (tau's discordant count, RBO's depth weights, RRF's
  * reciprocal sums).
  */
class EdgeBranchSpec3 extends GoldenFixtures {

  /** The tranche-20 retrieval corpus (doc_id, text, n_chars). */
  private def retrievalCorpus(dir: String): Unit = {
    import spark.implicits._
    Seq(
      (1L, "vector key dup", 500L),
      (2L, "key zz zz zz zz zz zz zz", 160L),
      (3L, "key aa bb cc dd ee ff gg", 310L),
      (4L, "nothing relevant at all", 10L))
      .toDF("doc_id", "text", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("tfidf_search pins the L2-normalized cosine scores and doc order") {
    val dir = tmp()
    retrievalCorpus(dir)
    // golden_stats.py tranche20 tfidf: d1 is the pure query doc (cos =
    // 1.0 exactly); d3 0.011353 > d2 0.004302 (distinct vs repeated
    // filler norms) — the inversion vs BM25's doc_id tie.
    val rows = OpsQueries.tfidfSearch(spark, dir).collect()
    assert(rows.length == 3)
    assert(rows(0).getAs[Long]("doc_id") == 1L &&
      rows(0).getAs[Double]("score") == 1.0 &&
      rows(0).getAs[Long]("n_terms_hit") == 3L)
    assert(rows(1).getAs[Long]("doc_id") == 3L &&
      rows(1).getAs[Double]("score") == 0.011353)
    assert(rows(2).getAs[Long]("doc_id") == 2L &&
      rows(2).getAs[Double]("score") == 0.004302)
  }

  test("search_rrf pins the reciprocal-rank fusion sums on the tied pair") {
    val dir = tmp()
    retrievalCorpus(dir)
    // golden_stats.py tranche20 rrf: d1 = 2/61 = 0.032787; d2 and d3
    // swap ranks 2/3 across the lists so both sum 1/62 + 1/63 =
    // 0.032002 — the fused order falls back to doc_id.
    val rows = OpsQueries.searchRrf(spark, dir).collect()
    assert(rows.length == 3)
    assert(rows(0).getAs[Long]("doc_id") == 1L &&
      rows(0).getAs[Double]("rrf") == 0.032787 &&
      rows(0).getAs[Long]("n_lists") == 2L)
    assert(rows(1).getAs[Long]("doc_id") == 2L &&
      rows(1).getAs[Double]("rrf") == 0.032002)
    assert(rows(2).getAs[Long]("doc_id") == 3L &&
      rows(2).getAs[Double]("rrf") == 0.032002)
  }

  test("search_rbo pins the Webber depth weights over the rank inversion") {
    val dir = tmp()
    retrievalCorpus(dir)
    // golden_stats.py tranche20 rbo: d1 joins at depth 1, d2/d3 at
    // max(2,3) = 3 each -> sum of 0.1*0.9^(d-1)/d = 0.416249.
    val r = one(OpsQueries.searchRbo(spark, dir))
    assert(r.getAs[Long]("n_overlap10") == 3L)
    assert(r.getAs[Double]("rbo") == 0.416249)
  }

  test("search_tau counts the constructed discordant pair") {
    val dir = tmp()
    retrievalCorpus(dir)
    // golden_stats.py tranche20 tau: pairs (1,2),(1,3) concordant,
    // (2,3) discordant -> tau-a = 2(2-1)/(3*2) = 0.333333.
    val r = one(OpsQueries.searchTau(spark, dir))
    assert(r.getAs[Long]("n_common") == 3L)
    assert(r.getAs[Long]("concordant") == 2L)
    assert(r.getAs[Long]("discordant") == 1L)
    assert(r.getAs[Double]("tau") == 0.333333)
  }

  test("eval_err pins the cascade stop-probability walk incl. the 7-factor") {
    val dir = tmp()
    retrievalCorpus(dir)
    // golden_stats.py tranche20 err: grades g=3,1,2 down the BM25 list
    // -> terms 7/8, 1*1/(64*2), 3*7/(512*3): nano 875000000 + 7812500
    // + 13671875 -> ERR 0.896484; the rank-3 term exercises pnum's
    // pow7 branch (earlier f=7 from the rank-2 grade-1 doc).
    val r = one(OpsQueries.evalErr(spark, dir))
    assert(r.getAs[Long]("n_results") == 3L)
    assert(r.getAs[Long]("sum_gain") == 11L)
    assert(r.getAs[Double]("err") == 0.896484)
  }

  test("eval_regression pins RMSE/MAE/MSE/R2 of the per-part mean predictor") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, 1.0), (1L, 3.0), (2L, 5.0))
      .toDF("l_partkey", "l_quantity")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // golden_stats.py tranche20 regression: preds 2,2,5 vs labels
    // 1,3,5 -> SSE 2, SST 8: mse 2/3, rmse 0.816497, mae 2/3, r2 0.75.
    val r = one(EvalQueries.evalRegression(spark, dir))
    assert(r.getAs[Long]("n") == 3L)
    assert(r.getAs[Double]("mse") == 0.666667)
    assert(r.getAs[Double]("rmse") == 0.816497)
    assert(r.getAs[Double]("mae") == 0.666667)
    assert(r.getAs[Double]("r2") == 0.75)
  }

  test("eval_mrr pins the top-10 cutoff and the ppm reciprocal mean") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("o_orderkey", "o_custkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // u1: relevant item ranks 2nd by spend; u2: relevant ranks 1st;
    // u3: ten decoys (120..30) ahead of the relevant 1.0-spend item ->
    // first relevant rank 11 > 10 -> contributes 0.
    val u3 = (4L to 13L).map(i => (3L, i, 10.0 * (16 - i), 1.0)) :+
      (3L, 14L, 1.0, 30.0)
    val li = Seq(
      (1L, 1L, 100.0, 30.0), (1L, 2L, 200.0, 10.0),
      (2L, 3L, 50.0, 26.0)) ++ u3
    li.toDF("l_orderkey", "l_partkey", "l_extendedprice", "l_quantity")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // golden_stats.py tranche20 mrr: ppm 500000 + 1000000 + 0 over 3
    // truth users -> 0.5.
    val r = one(EvalQueries.evalMrr(spark, dir))
    assert(r.getAs[Long]("n_users") == 3L)
    assert(r.getAs[Long]("n_hit10") == 2L)
    assert(r.getAs[Double]("mrr_at_10") == 0.5)
  }

  test("eval_calibration pins the cell-mean predictor and decile fallback") {
    val dir = tmp()
    // Train half (ts <= mid = 13h): hod0 values 1,3 (cell mean 2),
    // hod1 value 10; global mean 14/3. Test half: hod0 -> 2, hod1 ->
    // 10, hod2 (unseen cell) -> the global fallback.
    writeEvents(dir, Seq(
      (1L, 0L, 1L, "t", 1.0),
      (2L, 1000000L, 2L, "t", 3.0),
      (3L, Hour, 3L, "t", 10.0),
      (4L, 24 * Hour, 4L, "t", 4.0),
      (5L, 25 * Hour, 5L, "t", 8.0),
      (6L, 26 * Hour, 6L, "t", 6.0)))
    // golden_stats.py tranche20 calibration: 3 test rows order by
    // (prediction, event_id) -> ntile(10) gives bins 1,2,3.
    val out = EvalQueries.evalCalibration(spark, dir).collect()
      .map(r => r.getAs[Int]("bin") -> r).toMap
    assert(out.keySet == Set(1, 2, 3))
    assert(out(1).getAs[Long]("n") == 1L &&
      out(1).getAs[Double]("mean_pred") == 2.0 &&
      out(1).getAs[Double]("mean_actual") == 4.0)
    assert(out(2).getAs[Double]("mean_pred") == 4.666667 &&
      out(2).getAs[Double]("mean_actual") == 6.0)
    assert(out(3).getAs[Double]("mean_pred") == 10.0 &&
      out(3).getAs[Double]("mean_actual") == 8.0)
  }

  /** Tiny LM corpus: token a appears 6 times (kept at minCount 5),
    * b twice and c once (OOV at the unigram tier). */
  private def lmCorpus(dir: String): Unit = {
    import spark.implicits._
    Seq((1L, "a a a a a b"), (2L, "a b c")).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("lm_score pins the kept-token logp and the OOV floor") {
    val dir = tmp()
    lmCorpus(dir)
    // golden_stats.py tranche20 lm_score: total 9, logp(a) = ln(6/9),
    // floor ln(1/9): d1 (5*lpa + floor)/6 = -0.704092, d2 = -1.599971.
    val out = OpsQueries.lmScore(spark, dir).collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n_tokens") == 6L &&
      out(0).getAs[Double]("logp_mean") == -0.704092)
    assert(out(1).getAs[Long]("n_tokens") == 3L &&
      out(1).getAs[Double]("logp_mean") == -1.599971)
  }

  test("lm_bigram_score pins stupid backoff through the unigram floor") {
    val dir = tmp()
    lmCorpus(dir)
    // golden_stats.py tranche20 lm_bigram: only 'a a' (4 of n_a=6)
    // survives minCount 3; every other bigram scores ln(0.4) + floor
    // (b and c both miss the unigram minCount 5): d1 -0.947075,
    // d2 -3.113515.
    val out = OpsQueries.lmBigramScore(spark, dir).collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n_bigrams") == 5L &&
      out(0).getAs[Double]("logp_mean") == -0.947075)
    assert(out(1).getAs[Long]("n_bigrams") == 2L &&
      out(1).getAs[Double]("logp_mean") == -3.113515)
  }

  test("nb_lang_classify pins the Laplace weights and the tie-break") {
    import spark.implicits._
    val dir = tmp()
    // Even ids train (en: 'the cat'; de: 'der hund'), odd ids test.
    // d1 'the dog': en wins on the 'the' hit. d3 'der cat' scores
    // EXACTLY equal for en and de (one hit + one default each) — the
    // row_number (score desc, cand) tie-break must pick 'de'.
    Seq(
      (1L, "en", "the dog"), (2L, "en", "the cat"),
      (3L, "de", "der cat"), (4L, "de", "der hund"))
      .toDF("doc_id", "lang", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // golden_stats.py tranche20 nb: d1 en -3583518939 > de -4276666119
    // nano; d3 en == de == -3583518939 -> tie -> 'de'. Accuracy 1.0.
    val out = OpsQueries.nbLangClassify(spark, dir).collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("true_lang") == "de" &&
      out(0).getAs[String]("pred_lang") == "de" &&
      out(0).getAs[Long]("n") == 1L)
    assert(out(1).getAs[String]("true_lang") == "en" &&
      out(1).getAs[String]("pred_lang") == "en" &&
      out(1).getAs[Long]("n") == 1L)
    assert(out(0).getAs[Double]("accuracy") == 1.0)
  }

  // ------------------------------------------ co-purchase graph (t21)

  /** Tranche-21 graph fixture: triangle {1,2,3} — bridge 3-4 — triangle
    * {4,5,6} — triangle {5,6,7} — pendant chain 7-8-9. Every edge is
    * realized by exactly TWO 2-item orders, so `Cooccur.pairs`
    * (minCount 2) reproduces the 11-edge list verbatim, with marginals
    * n_item = 2·deg. Built once (lazy) — `coocPairs` memoizes per
    * (session, dir), so all ten graph tests share one pair build. */
  private lazy val coocDir: String = {
    import spark.implicits._
    val dir = tmp()
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L),
      (4L, 6L), (5L, 6L), (5L, 7L), (6L, 7L), (7L, 8L), (8L, 9L))
    edges.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq((2L * i + 1, a), (2L * i + 1, b), (2L * i + 2, a), (2L * i + 2, b))
    }.toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("item_cooc pins the lift marginals on the 11-edge fixture") {
    // golden_stats.py tranche21 cooc: lift = 2·22/(4·deg_a·deg_b).
    val out = OpsQueries.itemCooc(spark, coocDir).collect()
      .map(r => (r.getAs[Long]("item_a"), r.getAs[Long]("item_b")) ->
        (r.getAs[Long]("n_ab"), r.getAs[Double]("lift"))).toMap
    assert(out.size == 11)
    assert(out.values.forall(_._1 == 2L))
    assert(out((1L, 2L))._2 == 2.75)
    assert(out((1L, 3L))._2 == 1.833333)
    assert(out((3L, 4L))._2 == 1.222222)
    assert(out((7L, 8L))._2 == 1.833333)
    assert(out((8L, 9L))._2 == 5.5)
  }

  test("graph_assortativity pins the endpoint-degree Pearson r") {
    // golden_stats.py tranche21 assortativity: r = 0.435897 over the
    // 22 symmetric endpoint-degree points.
    val r = one(OpsQueries.graphAssortativity(spark, coocDir))
    assert(r.getAs[Long]("n_nodes") == 9L)
    assert(r.getAs[Long]("n_edges") == 11L)
    assert(r.getAs[Double]("assortativity") == 0.435897)
  }

  test("link_adamic_adar pins the rarity weights and rank order") {
    // golden_stats.py tranche21 aa: (4,7) two deg-3 commons 1820478;
    // (7,9) one deg-2 common 1442695 (1/ln2 outranks 1/ln3 — the
    // rarity weighting); six deg-3 singles at 910239 tie-broken by
    // (a, b).
    val rows = OpsQueries.linkAdamicAdar(spark, coocDir).collect()
      .map(r => (r.getAs[Long]("item_a"), r.getAs[Long]("item_b"),
        r.getAs[Long]("n_common"), r.getAs[Long]("aa_score_us")))
    assert(rows.toSeq == Seq(
      (4L, 7L, 2L, 1820478L), (7L, 9L, 1L, 1442695L),
      (1L, 4L, 1L, 910239L), (2L, 4L, 1L, 910239L),
      (3L, 5L, 1L, 910239L), (3L, 6L, 1L, 910239L),
      (5L, 8L, 1L, 910239L), (6L, 8L, 1L, 910239L)))
  }

  test("link_jaccard pins the full-degree union and its AA inversion") {
    // golden_stats.py tranche21 jaccard: same candidates, different
    // order — (5,8)/(6,8) at 250000 ppm outrank (3,5)/(3,6) at 200000
    // where Adamic-Adar tied all four.
    val rows = OpsQueries.linkJaccard(spark, coocDir).collect()
      .map(r => (r.getAs[Long]("item_a"), r.getAs[Long]("item_b"),
        r.getAs[Long]("n_common"), r.getAs[Long]("jaccard_ppm")))
    assert(rows.toSeq == Seq(
      (4L, 7L, 2L, 500000L), (7L, 9L, 1L, 333333L),
      (1L, 4L, 1L, 250000L), (2L, 4L, 1L, 250000L),
      (5L, 8L, 1L, 250000L), (6L, 8L, 1L, 250000L),
      (3L, 5L, 1L, 200000L), (3L, 6L, 1L, 200000L)))
  }

  test("graph_communities pins the synchronous 3-round LPA state") {
    // golden_stats.py tranche21 lpa: the fixed-iteration synchronous
    // update does NOT converge on this graph — round 3 leaves
    // {1,2,3}→1, {4,7}→3, {5,6,8}→4, {9}→5. Pins both the modal-vote
    // tie-break and the exact iteration count.
    val out = OpsQueries.graphCommunities(spark, coocDir).collect()
      .map(r => r.getAs[Long]("item") ->
        (r.getAs[Long]("community"), r.getAs[Long]("community_size"))).toMap
    assert(out == Map(
      1L -> (1L, 3L), 2L -> (1L, 3L), 3L -> (1L, 3L),
      4L -> (3L, 2L), 7L -> (3L, 2L),
      5L -> (4L, 3L), 6L -> (4L, 3L), 8L -> (4L, 3L),
      9L -> (5L, 1L)))
  }

  test("graph_modularity pins Q of the LPA partition") {
    // golden_stats.py tranche21 modularity: E_in=4 of m=11,
    // Σd_c² = 150 -> Q = (4·11·4 − 150)/(4·121) = 0.053719.
    val r = one(OpsQueries.graphModularity(spark, coocDir))
    assert(r.getAs[Long]("n_communities") == 4L)
    assert(r.getAs[Long]("m_edges") == 11L)
    assert(r.getAs[Long]("e_in") == 4L)
    assert(r.getAs[Double]("modularity") == 0.053719)
  }

  test("graph_kcore pins the two-round pendant cascade") {
    // golden_stats.py tranche21 kcore: round 1 peels 9 (deg 1), round
    // 2 peels 8 (its degree fell to 1); 7 survives at deg 2 via the
    // {5,6,7} triangle.
    val out = StatQueries.graphKcore(spark, coocDir).collect()
      .map(r => r.getAs[Long]("item") -> r.getAs[Long]("deg")).toMap
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 3L,
      5L -> 3L, 6L -> 3L, 7L -> 2L))
  }

  test("graph_richclub pins phi at k=2 and the n_rich<2 null branch") {
    // golden_stats.py tranche21 richclub: deg≥2 keeps 8 nodes with 10
    // internal edges -> phi 3571 bp; k=4/8 have NO rich nodes -> the
    // CASE guard must emit null, not divide by zero.
    val out = StatQueries.graphRichclub(spark, coocDir).collect()
      .map(r => r.getAs[Long]("k") -> r).toMap
    assert(out(2L).getAs[Long]("n_rich") == 8L)
    assert(out(2L).getAs[Long]("e_rich") == 10L)
    assert(out(2L).getAs[Long]("phi_bp") == 3571L)
    assert(out(2L).getAs[Long]("density_all_bp") == 3055L)
    assert(out(4L).getAs[Long]("n_rich") == 0L && out(4L).isNullAt(
      out(4L).fieldIndex("phi_bp")))
    assert(out(8L).getAs[Long]("n_rich") == 0L && out(8L).isNullAt(
      out(8L).fieldIndex("phi_bp")))
  }

  test("graph_hits pins the 3-round authority sums and the tie order") {
    // golden_stats.py tranche21 hits: a3 = 856,856,848,760,672,344,
    // 344,288,88 — the (5,6) tie breaks by part key.
    val rows = StatQueries.graphHits(spark, coocDir).collect()
      .map(r => (r.getAs[Long]("l_partkey"), r.getAs[Long]("authority")))
    assert(rows.toSeq == Seq(
      (5L, 856L), (6L, 856L), (4L, 848L), (7L, 760L), (3L, 672L),
      (1L, 344L), (2L, 344L), (8L, 288L), (9L, 88L)))
  }

  test("graph_ppr pins the 5-round pico walk from seed 1") {
    // golden_stats.py tranche21 ppr: vertex 9 is 6 hops out — never
    // reached in 5 rounds; the seed holds 0.313159 of the mass.
    val out = StatQueries.graphPpr(spark, coocDir).collect()
      .map(r => r.getAs[Long]("item") -> r.getAs[Long]("pp_pico")).toMap
    assert(out == Map(
      1L -> 313158520690L, 3L -> 267740537111L, 2L -> 220301596862L,
      4L -> 89398852479L, 5L -> 43664003183L, 6L -> 43664003183L,
      7L -> 16594643133L, 8L -> 5477843364L))
  }

  // ------------------------------------------ series family (t22)

  /** The tranche-22 hourly count series. */
  private val C8 = Seq(5, 2, 4, 1, 6, 3, 5, 2)

  test("events_acf pins the lag-1..3 autocorrelations") {
    val dir = tmp()
    countEvents(dir, 100L, Map("t" -> C8))
    // golden_stats.py tranche22 acf: Pearson over the lag pairs of
    // [5,2,4,1,6,3,5,2].
    val r = one(OpsQueries.eventsAcf(spark, dir))
    assert(r.getAs[Long]("n_hours") == 8L)
    assert(r.getAs[Double]("acf1") == -0.742647)
    assert(r.getAs[Double]("acf2") == 0.657143)
    assert(r.getAs[Double]("acf3") == -0.883721)
  }

  test("events_ccf pins the lag sweep incl. the planted lag-2 echo") {
    val dir = tmp()
    countEvents(dir, 100L, Map(
      "view" -> C8, "click" -> (Seq(1, 1) ++ C8.dropRight(2))))
    // golden_stats.py tranche22 ccf: click = view shifted +2h, so
    // r(lag 2) = 1.0 exactly; the degenerate n=2 tail also hits 1.0.
    val out = StatQueries.eventsCcf(spark, dir).collect()
      .map(r => r.getAs[Long]("lag_h") -> r).toMap
    assert(out.keySet == (0L to 6L).toSet)
    assert(out(0L).getAs[Long]("n") == 8L &&
      out(0L).getAs[Double]("r") == 0.472947)
    assert(out(1L).getAs[Double]("r") == -0.745698)
    assert(out(2L).getAs[Long]("n") == 6L &&
      out(2L).getAs[Double]("r") == 1.0)
    assert(out(3L).getAs[Double]("r") == -0.727048)
    assert(out(4L).getAs[Double]("r") == 0.613941)
    assert(out(5L).getAs[Double]("r") == -0.997176)
    assert(out(6L).getAs[Long]("n") == 2L &&
      out(6L).getAs[Double]("r") == 1.0)
  }

  test("events_ewma pins the normalized 0.7-decay chain") {
    val dir = tmp()
    countEvents(dir, 100L, Map("t" -> C8))
    // golden_stats.py tranche22 ewma over [5,2,4,1,6,3,5,2].
    val exp = Seq(5.0, 3.235294, 3.584475, 2.564153, 3.803144,
      3.530075, 4.010628, 3.37054)
    val out = OpsQueries.eventsEwma(spark, dir).collect()
    assert(out.length == 8)
    out.zip(exp).zipWithIndex.foreach { case ((row, e), i) =>
      assert(row.getAs[Long]("hour_us") == (100L + i) * Hour, s"hour $i")
      assert(row.getAs[Long]("n_events") == C8(i).toLong, s"n $i")
      assert(row.getAs[Double]("ewma") == e, s"ewma $i")
    }
  }

  test("events_cusum pins the peak deviation sum and its hour") {
    val dir = tmp()
    countEvents(dir, 100L, Map("t" -> C8))
    // golden_stats.py tranche22 cusum: mu=3.5, running sums peak at
    // |s|=2.0 in hour index 3.
    val r = one(OpsQueries.eventsCusum(spark, dir))
    assert(r.getAs[Long]("n_hours") == 8L)
    assert(r.getAs[Double]("cusum_max") == 2.0)
    assert(r.getAs[Long]("peak_hour_us") == 103L * Hour)
  }

  test("events_geomean pins the exact power cases and the >0 filter") {
    val dir = tmp()
    valueEvents(dir, Map(
      "t1" -> Seq(2.0, 4.0, 8.0),
      "t2" -> Seq(1.0, 8.0, 0.0, -5.0)))
    // golden_stats.py tranche22 geomean: t1 = (2*4*8)^(1/3) = 4.0
    // exactly; t2 keeps only {1,8} (zero and negative filtered) ->
    // sqrt(8) = 2.828427.
    val out = OpsQueries.eventsGeomean(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(out("t1").getAs[Long]("n") == 3L &&
      out("t1").getAs[Double]("geo_mean") == 4.0)
    assert(out("t2").getAs[Long]("n") == 2L &&
      out("t2").getAs[Double]("geo_mean") == 2.828427)
  }

  test("events_twap pins the hold-weighted mean vs the plain mean") {
    val dir = tmp()
    writeEvents(dir, Seq(
      (1L, 0L, 1L, "t", 10.0),
      (2L, 6 * Hour, 2L, "t", 20.0),
      (3L, 18 * Hour, 3L, "t", 40.0)))
    // golden_stats.py tranche22 twap: holds 6h/12h/6h to day end ->
    // (60+240+240)/24 = 22.5 vs plain 70/3.
    val r = one(StatQueries.eventsTwap(spark, dir))
    assert(r.getAs[Long]("n") == 3L)
    assert(r.getAs[Double]("twap") == 22.5)
    assert(r.getAs[Double]("plain_avg") == 23.333333)
  }

  test("events_negbin pins the moment fit and the underdispersed null") {
    val dir = tmp()
    countEvents(dir, 100L, Map("a" -> Seq(1, 5, 9), "b" -> Seq(4, 4, 4)))
    // golden_stats.py tranche22 negbin: type a mu=5 s2=16 -> r_hat
    // 25/11 = 2.272727, p_hat 0.3125; type b has zero variance -> the
    // s2 > mu guard must null both parameters.
    val out = StatQueries.eventsNegbin(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(out("a").getAs[Double]("mean_rate") == 5.0)
    assert(out("a").getAs[Double]("var_rate") == 16.0)
    assert(out("a").getAs[Double]("r_hat") == 2.272727)
    assert(out("a").getAs[Double]("p_hat") == 0.3125)
    assert(out("b").isNullAt(out("b").fieldIndex("r_hat")))
    assert(out("b").isNullAt(out("b").fieldIndex("p_hat")))
  }

  test("events_partial_corr pins the controlled correlation") {
    val dir = tmp()
    writeEvents(dir, Seq(
      (1L, Hour, 1L, "t", 1.0), (2L, 2 * Hour, 2L, "t", 2.0),
      (3L, 3 * Hour, 3L, "t", 3.0), (4L, Day + Hour, 4L, "t", 2.0),
      (5L, Day + 2 * Hour, 5L, "t", 4.0), (6L, Day + 3 * Hour, 6L, "t", 6.0)))
    // golden_stats.py tranche22 partial: r_vh=0.75, r_vw=0.612372,
    // r_hw=0 (hours balanced across days) -> partial 0.948683.
    val r = one(StatQueries.eventsPartialCorr(spark, dir))
    assert(r.getAs[Long]("n") == 6L)
    assert(r.getAs[Double]("r_vh") == 0.75)
    assert(r.getAs[Double]("r_vw") == 0.612372)
    assert(r.getAs[Double]("r_hw") == 0.0)
    assert(r.getAs[Double]("r_vh_given_w") == 0.948683)
  }

  test("events_mad_outliers pins the lower medians and integer fence") {
    val dir = tmp()
    valueEvents(dir, Map("t" -> Seq(1.0, 2.0, 3.0, 4.0, 100.0)))
    // golden_stats.py tranche22 mad: median 3.0, MAD 1.0; only the
    // 100 passes |v-med|*10000 > mad*44478.
    val r = one(StatQueries.eventsMadOutliers(spark, dir))
    assert(r.getAs[Long]("n") == 5L)
    assert(r.getAs[Double]("median") == 3.0)
    assert(r.getAs[Double]("mad") == 1.0)
    assert(r.getAs[Long]("n_outliers") == 1L)
    assert(r.getAs[Double]("outlier_share") == 0.2)
  }

  test("events_tail_ratio pins the order-statistic ranks on 1..10") {
    val dir = tmp()
    valueEvents(dir, Map("t" -> (1 to 10).map(_.toDouble)))
    // golden_stats.py tranche22 tail: ranks (n+1)/2=5, (9n+9)/10=9,
    // (99n+99)/100=10 -> 5.0/9.0/10.0, ratio 2.0.
    val r = one(StatQueries.eventsTailRatio(spark, dir))
    assert(r.getAs[Long]("n") == 10L)
    assert(r.getAs[Double]("p50") == 5.0)
    assert(r.getAs[Double]("p90") == 9.0)
    assert(r.getAs[Double]("p99") == 10.0)
    assert(r.getAs[Double]("tail_ratio_99_50") == 2.0)
  }

  test("seasonality_strength pins the dow-hod variance decomposition") {
    val dir = tmp()
    countEvents(dir, 0L, Map(
      "t" -> (Seq(3, 1) ++ Seq.fill(166)(0) ++ Seq(5, 1))))
    // Hours 0/1 and 168/169 land on the SAME (dow, hod) cells one week
    // apart: cell means 4 and 1, residuals [-1,0,1,0].
    // golden_stats.py tranche22 seasonality: var_total 2.75,
    // var_resid 0.5, r2 0.818182.
    val r = one(StatQueries.seasonalityStrength(spark, dir))
    assert(r.getAs[Long]("n_hours") == 4L)
    assert(r.getAs[Double]("var_total") == 2.75)
    assert(r.getAs[Double]("var_resid") == 0.5)
    assert(r.getAs[Double]("seasonal_r2") == 0.818182)
  }

  /** Two-user behavior chains: u1 view→click→view (10 s, 20 s holds),
    * u2 view→view (5 s). */
  private def markovFixture(dir: String): Unit =
    writeEvents(dir, Seq(
      (1L, 0L, 1L, "view", 1.0),
      (2L, 10000000L, 1L, "click", 1.0),
      (3L, 30000000L, 1L, "view", 1.0),
      (4L, 0L, 2L, "view", 1.0),
      (5L, 5000000L, 2L, "view", 1.0)))

  test("events_markov pins the conditional transition profile") {
    val dir = tmp()
    markovFixture(dir)
    // golden_stats.py tranche22 markov: view fans out 50/50, click
    // always returns to view.
    val out = OpsQueries.eventsMarkov(spark, dir).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        (r.getAs[Long]("n"), r.getAs[Double]("p"))).toMap
    assert(out == Map(
      ("click", "view") -> (1L, 1.0),
      ("view", "click") -> (1L, 0.5),
      ("view", "view") -> (1L, 0.5)))
  }

  test("markov_sojourn pins the per-transition holding times") {
    val dir = tmp()
    markovFixture(dir)
    val out = OpsQueries.markovSojourn(spark, dir).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        (r.getAs[Double]("mean_gap_s"), r.getAs[Double]("max_gap_s"))).toMap
    assert(out == Map(
      ("click", "view") -> (20.0, 20.0),
      ("view", "click") -> (10.0, 10.0),
      ("view", "view") -> (5.0, 5.0)))
  }

  test("langid_kappa pins po/pe and the chance-corrected agreement") {
    import spark.implicits._
    val dir = tmp()
    // d1/d2 predicted correctly; d3 matches no profile -> 'und';
    // d4 is French text labeled de -> predicted fr. Confusion cells
    // (en,en,1),(de,de,1),(en,und,1),(de,fr,1).
    Seq(
      (1L, "en", "the cat and the dog"), (2L, "de", "der hund ist gut"),
      (3L, "en", "xyz qwerty"), (4L, "de", "le chat est la"))
      .toDF("doc_id", "lang", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // golden_stats.py tranche20 kappa: po = 2/4, pe = (2*1 + 2*1)/16 =
    // 0.25, kappa = (8-4)/(16-4) = 0.333333. The und/fr prediction
    // columns have no matching truth row, so pe sums only en/de.
    val r = one(OpsQueries.langidKappa(spark, dir))
    assert(r.getAs[Long]("n_docs") == 4L)
    assert(r.getAs[Double]("po") == 0.5)
    assert(r.getAs[Double]("pe") == 0.25)
    assert(r.getAs[Double]("kappa") == 0.333333)
  }
}
