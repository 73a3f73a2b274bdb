package graft.queries

import org.apache.spark.sql.functions._

/** Round-14 golden-value tranche — same method as [[EdgeBranchSpec]]
  * (constants derived independently by `tools/golden_stats.py`
  * tranche15+; see that spec's scaladoc), extending the tier to the
  * series, causal, eval, info-theory, inequality, survey and tail
  * statistic families. */
class EdgeBranchSpec2 extends GoldenFixtures {

  // ---------------------------------------------------------- series

  test("events_bollinger pins the trailing-24h exact band test") {
    val dir = tmp()
    val c26 = Seq(5, 6, 5, 7, 6, 5, 6, 7, 5, 6, 5, 7, 6, 5, 6, 7,
      5, 6, 5, 7, 6, 5, 6, 7, 20, 6)
    countEvents(dir, 300L, Map("t" -> c26))
    // golden_stats.py tranche15 bollinger: windows at i=23,24,25 have
    // dev 27/324/-12 vs band 38.28/142.95/142.95 -> one upper breakout
    // at i=24 (the spike), none lower; the spike inside the i=25
    // window inflates its band so -12 stays inside.
    val r = one(StatQueries.eventsBollinger(spark, dir))
    assert(r.getAs[Long]("n_windows") == 3L)
    assert(r.getAs[Long]("n_upper") == 1L)
    assert(r.getAs[Long]("n_lower") == 0L)
    assert(r.getAs[Long]("last_breakout_h") == 324L)
  }

  test("events_drawdown pins the peak-to-trough depth and trough hour") {
    val dir = tmp()
    val vals = Seq(5.0, -3.0, -4.0, 10.0, -2.0, -9.0, 1.0)
    writeEvents(dir, vals.zipWithIndex.map { case (v, i) =>
      ((i + 1).toLong, (310L + i) * Hour, (i + 1).toLong, "t", v)
    })
    // golden_stats.py tranche15 drawdown: cum = 5,2,-2,8,6,-3,-2;
    // runmax = 5,5,5,8,8,8,8; dd peaks at 11 in hour index 5.
    val r = one(StatQueries.eventsDrawdown(spark, dir))
    assert(r.getAs[Long]("n_hours") == 7L)
    assert(r.getAs[Long]("trough_h") == 315L)
    assert(r.getAs[Double]("max_drawdown") == 11.0)
  }

  test("events_wavelet pins the Haar detail energies on an 8-hour series") {
    val dir = tmp()
    countEvents(dir, 400L, Map("t" -> Seq(5, 3, 8, 7, 7, 4, 9, 6)))
    // golden_stats.py tranche15 wavelet: scale-1 details 2,1,3,3
    // (energy 23), scale-2 details -7,-4 (energy 65), scale-3 detail
    // -3 (energy 9); total 97.
    val out = StatQueries.eventsWaveletEnergy(spark, dir).collect()
      .map(r => r.getAs[Long]("scale") -> r).toMap
    assert(out(1L).getAs[Long]("n_blocks") == 4L)
    assert(out(1L).getAs[Long]("energy") == 23L)
    assert(out(1L).getAs[Double]("energy_share") == 0.237113)
    assert(out(2L).getAs[Long]("n_blocks") == 2L)
    assert(out(2L).getAs[Long]("energy") == 65L)
    assert(out(2L).getAs[Double]("energy_share") == 0.670103)
    assert(out(3L).getAs[Long]("n_blocks") == 1L)
    assert(out(3L).getAs[Long]("energy") == 9L)
    assert(out(3L).getAs[Double]("energy_share") == 0.092784)
  }

  test("events_sax pins the Gaussian banding and motif ranks") {
    val dir = tmp()
    countEvents(dir, 500L, Map("t" -> Seq(2, 9, 2, 9, 2, 9, 2, 9)))
    // golden_stats.py tranche15 sax: A2 = 784 exactly, t = 0.6745*28;
    // dd = +-28 -> symbols adadadad -> motifs ada x3, dad x3; the
    // lexicographic tie-break ranks ada first.
    val out = StatQueries.eventsSax(spark, dir).collect()
    assert(out.length == 2)
    assert(out(0).getAs[Int]("rank") == 1 &&
      out(0).getAs[String]("motif") == "ada" &&
      out(0).getAs[Long]("n_occ") == 3L)
    assert(out(1).getAs[Int]("rank") == 2 &&
      out(1).getAs[String]("motif") == "dad" &&
      out(1).getAs[Long]("n_occ") == 3L)
  }

  test("sketch_f2 pins the tug-of-war estimate on known frequencies") {
    val dir = tmp()
    // user frequencies {1:3, 2:1, 3:2, 4:1, 5:1} -> exact F2 = 16.
    val users = Seq(1L, 1L, 1L, 2L, 3L, 3L, 4L, 5L)
    writeEvents(dir, users.zipWithIndex.map { case (u, i) =>
      ((i + 1).toLong, Hour + i, u, "t", 1.0)
    })
    // golden_stats.py tranche15 f2: md5 sign sums give group s2-sums
    // [128, 132, 176, 220]; median-of-means m23 = 132 + 176 = 308,
    // estimate = 308/16 = 19.25, ratio = 1.203125.
    val r = one(StatQueries.sketchF2(spark, dir))
    assert(r.getAs[Long]("exact_f2") == 16L)
    assert(r.getAs[Double]("estimate") == 19.25)
    assert(r.getAs[Double]("ratio") == 1.203125)
  }

  test("events_mcf pins the recurrent-event risk sets and cumulative sum") {
    val dir = tmp()
    // u1 first day0: purchases at ages 1 and 3; u2 first day2:
    // purchase at age 2; u3 first day0, no purchase. Horizon = day4
    // -> t_obs = 4, 2, 4.
    writeEvents(dir, Seq(
      (1L, Day, 1L, "view", 1.0),
      (2L, 2 * Day, 1L, "purchase", 1.0),
      (3L, 4 * Day, 1L, "purchase", 1.0),
      (4L, 3 * Day, 2L, "view", 1.0),
      (5L, 5 * Day, 2L, "purchase", 1.0),
      (6L, Day, 3L, "view", 1.0)))
    // golden_stats.py tranche15 mcf: d/n_risk = 1/3, 1/3, 1/2 at ages
    // 1, 2, 3 -> MCF 0.333333, 0.666667, 1.166667.
    val out = StatQueries.eventsMcf(spark, dir).collect()
      .map(r => r.getAs[Long]("age_day") -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L).getAs[Long]("n_risk") == 3L &&
      out(1L).getAs[Double]("mcf") == 0.333333)
    assert(out(2L).getAs[Long]("n_risk") == 3L &&
      out(2L).getAs[Double]("mcf") == 0.666667)
    assert(out(3L).getAs[Long]("n_risk") == 2L &&
      out(3L).getAs[Double]("mcf") == 1.166667)
  }

  test("littles_law pins the sweep-line area against summed durations") {
    val dir = tmp()
    // Two overlapping sessions: u1 [D, D+600s], u2 [D+300s, D+1200s]
    // (all gaps < the 30-min sessionization cutoff).
    writeEvents(dir, Seq(
      (1L, Day, 1L, "view", 1.0),
      (2L, Day + 600000000L, 1L, "view", 1.0),
      (3L, Day + 300000000L, 2L, "view", 1.0),
      (4L, Day + 1200000000L, 2L, "view", 1.0)))
    // golden_stats.py tranche15 littles: area = 1*300 + 2*300 + 1*600
    // = 1500 s*sessions = summed durations (600 + 900); horizon 1200 s
    // -> avg concurrency 1.25.
    val r = one(StatQueries.littlesLaw(spark, dir))
    assert(r.getAs[Long]("n_sessions") == 2L)
    assert(r.getAs[Long]("area_us") == 1500000000L)
    assert(r.getAs[Long]("dur_us") == 1500000000L)
    assert(r.getAs[Boolean]("l_equals_lambda_w"))
    assert(r.getAs[Long]("horizon_us") == 1200000000L)
    assert(r.getAs[Double]("avg_concurrency") == 1.25)
  }

  test("gorilla_bits pins the delta-of-delta bucket ladder") {
    val dir = tmp()
    // One user, ms stamps 0,100,200,300,1000 (offset by a day):
    // bits 64 (first), 12 (first delta 100), 1, 1 (dod 0), 16 (dod 600).
    val ms = Seq(0L, 100L, 200L, 300L, 1000L)
    writeEvents(dir, ms.zipWithIndex.map { case (m, i) =>
      ((i + 1).toLong, Day + m * 1000L, 7L, "t", 1.0)
    })
    // golden_stats.py tranche15 gorilla: total 94 bits over 5 events,
    // ratio 94/320 = 0.29375.
    val r = one(StatQueries.gorillaBits(spark, dir))
    assert(r.getAs[Long]("n_events") == 5L)
    assert(r.getAs[Long]("total_bits") == 94L)
    assert(r.getAs[Long]("n_zero_dod") == 2L)
    assert(r.getAs[Long]("n_overflow") == 0L)
    assert(r.getAs[Double]("compression_ratio") == 0.29375)
  }

  test("changepoint_binseg pins the SSE-reduction argmax on a level shift") {
    val dir = tmp()
    countEvents(dir, 600L, Map("t" -> Seq(2, 2, 2, 8, 8, 8)))
    // golden_stats.py tranche15 binseg: gains 10.8, 27, 54, 27, 10.8
    // -> best split after hour index 2 (split_hour = 603), means 2|8,
    // gain 54 = SSE reduction of the exact level shift.
    val r = one(StatQueries.changepointBinseg(spark, dir))
    assert(r.getAs[Long]("split_hour") == 603L)
    assert(r.getAs[Long]("n_left") == 3L && r.getAs[Long]("n_right") == 3L)
    assert(r.getAs[Double]("mean_left") == 2.0)
    assert(r.getAs[Double]("mean_right") == 8.0)
    assert(r.getAs[Double]("gain") == 54.0)
  }

  test("extremal_index pins the runs-declustering theta") {
    val dir = tmp()
    // Permutation of 1..20 with the two exceedances (19, 20) adjacent:
    // u = 18th smallest = 18, runs-declustering merges them -> theta 0.5.
    val c = Seq(1, 2, 3, 19, 20, 4, 5, 6, 7, 8,
      9, 10, 11, 12, 13, 14, 15, 16, 17, 18)
    countEvents(dir, 700L, Map("t" -> c))
    val r = one(StatQueries.extremalIndex(spark, dir))
    assert(r.getAs[Long]("n_hours") == 20L)
    assert(r.getAs[Long]("threshold") == 18L)
    assert(r.getAs[Long]("n_exceedances") == 2L)
    assert(r.getAs[Long]("n_clusters") == 1L)
    assert(r.getAs[Double]("theta") == 0.5)
  }

  // ---------------------------------------------------- causal / A/B

  test("ab_tost pins both one-sided Welch statistics and the margin") {
    val dir = tmp()
    val a = Seq(10.0, 12.0, 14.0, 16.0, 18.0).zip(Seq(1L, 3L, 5L, 7L, 8L))
    val b = Seq(11.0, 14.0, 19.0, 23.0, 27.0).zip(Seq(2L, 4L, 6L, 9L, 11L))
    writeEvents(dir, (a ++ b).zipWithIndex.map { case ((v, u), i) =>
      ((i + 1).toLong, Hour + i, u, "m", v)
    })
    // golden_stats.py tranche16 tost: margin = 5% of grand mean 16.4 =
    // 0.82; t_lower = (4.8 + 0.82)/se = 1.739346, t_upper =
    // (0.82 - 4.8)/se = -1.231779 -> not equivalent.
    val r = one(StatQueries.abTost(spark, dir))
    assert(r.getAs[Double]("diff") == 4.8)
    assert(r.getAs[Double]("margin") == 0.82)
    assert(r.getAs[Double]("t_lower") == 1.739346)
    assert(r.getAs[Double]("t_upper") == -1.231779)
    assert(!r.getAs[Boolean]("equivalent"))
  }

  test("rdd_discount recovers perfect-fit local lines and their jump") {
    import spark.implicits._
    val dir = tmp()
    // L: q = 10 + 2*dc at dc 2,3,4; R: q = 30 + dc at dc 5,6,7.
    Seq((0.02, 14.0), (0.03, 16.0), (0.04, 18.0),
      (0.05, 35.0), (0.06, 36.0), (0.07, 37.0))
      .toDF("l_discount", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = one(StatQueries.rddDiscount(spark, dir))
    assert(r.getAs[Long]("n_left") == 3L && r.getAs[Long]("n_right") == 3L)
    assert(r.getAs[Double]("slope_left") == 2.0)
    assert(r.getAs[Double]("slope_right") == 1.0)
    assert(r.getAs[Double]("fit_left") == 20.0)
    assert(r.getAs[Double]("fit_right") == 35.0)
    assert(r.getAs[Double]("jump") == 15.0)
  }

  test("bandit_replay pins the Beta(1,1) leader walk incl. the unmatched hour") {
    val dir = tmp()
    // plays (arm, hour) -> values: reward iff value > 50.
    val plays = Seq(
      ("a", 0, Seq(60.0, 60.0)), ("a", 1, Seq(40.0, 40.0)),
      ("a", 2, Seq(40.0, 40.0)), ("a", 3, Seq(40.0)),
      ("b", 0, Seq(60.0, 40.0)), ("b", 1, Seq(60.0, 60.0)),
      ("b", 2, Seq(60.0, 60.0)))
    var id = 0L
    writeEvents(dir, for {
      (arm, h, vs) <- plays; v <- vs
    } yield { id += 1; (id, (800L + h) * Hour + id, id, arm, v) })
    // golden_stats.py tranche16 bandit: h0 prior-tie -> 'a' (1.0),
    // h1 leader 'a' (0.0), h2 'b' overtakes (1.0), h3 'b' chosen but
    // unplayed -> n_matched = 0, NULL ctr.
    val out = StatQueries.banditReplay(spark, dir).collect()
      .map(r => r.getAs[Long]("hour_idx") -> r).toMap
    assert(out(800L).getAs[String]("chosen_arm") == "a" &&
      out(800L).getAs[Long]("n_matched") == 2L &&
      out(800L).getAs[Double]("replay_ctr") == 1.0)
    assert(out(801L).getAs[String]("chosen_arm") == "a" &&
      out(801L).getAs[Double]("replay_ctr") == 0.0)
    assert(out(802L).getAs[String]("chosen_arm") == "b" &&
      out(802L).getAs[Double]("replay_ctr") == 1.0)
    assert(out(803L).getAs[String]("chosen_arm") == "b" &&
      out(803L).getAs[Long]("n_matched") == 0L &&
      out(803L).isNullAt(out(803L).fieldIndex("replay_ctr")))
  }

  test("uplift_qini pins band ranking and the cumulative Qini walk") {
    val dir = tmp()
    // (uid, n_train, y_train, y_test): bands by activity pair one
    // control {1,3,5,7,8} with one treated {2,4,6,9,11} each.
    val users = Seq(
      (1L, 10, 0, 0), (2L, 9, 1, 1), (3L, 8, 1, 1), (4L, 7, 0, 0),
      (5L, 6, 1, 0), (6L, 5, 1, 1), (7L, 4, 0, 0), (9L, 3, 1, 1),
      (8L, 2, 0, 1), (11L, 1, 0, 0))
    var id = 0L
    val rows = users.flatMap { case (u, nt, yt, yte) =>
      val train = (0 until nt).map { j =>
        id += 1
        (id, Day + id * 1000L, u,
          if (j == 0 && yt == 1) "purchase" else "view", 1.0)
      }
      val test = if (yte == 1) {
        id += 1
        Seq((id, 3 * Day + id * 1000L, u, "purchase", 1.0))
      } else Seq.empty
      train ++ test
    }
    writeEvents(dir, rows)
    // golden_stats.py tranche16 qini: ranked bands 1,4,3,5,2 with
    // uplift_train 1,1,0,0,-1 and qini 1,2,3,2,1 (nt = nc = 1 per band).
    val out = StatQueries.upliftQini(spark, dir).collect()
    assert(out.map(_.getAs[Long]("band")).toSeq == Seq(1L, 4L, 3L, 5L, 2L))
    assert(out.map(_.getAs[Double]("uplift_train")).toSeq ==
      Seq(1.0, 1.0, 0.0, 0.0, -1.0))
    assert(out.map(_.getAs[Double]("qini_test")).toSeq ==
      Seq(1.0, 2.0, 3.0, 2.0, 1.0))
  }

  test("ate_stratified pins within-stratum contrasts and the weighted ATE") {
    val dir = tmp()
    // Per-user (pre x, post y); treated {2,4,6,9,11} get y = control
    // partner + 5,15,25,35,45 within ascending-x strata.
    val users = Seq(
      (1L, 10.0, 100.0), (2L, 11.0, 105.0), (3L, 20.0, 110.0),
      (4L, 21.0, 125.0), (5L, 30.0, 120.0), (6L, 31.0, 145.0),
      (7L, 40.0, 130.0), (9L, 41.0, 165.0), (8L, 50.0, 140.0),
      (11L, 51.0, 185.0))
    var id = 0L
    writeEvents(dir, users.flatMap { case (u, x, y) =>
      id += 2
      Seq((id - 1, Day, u, "m", x), (id, 3 * Day, u, "m", y))
    })
    // golden_stats.py tranche16 ate: per-stratum diffs 5,15,25,35,45;
    // ALL row re-weights to 25 with means 145 vs 120.
    val out = StatQueries.ateStratified(spark, dir).collect()
      .map(r => r.getAs[String]("stratum") -> r).toMap
    for ((st, d) <- Seq("1" -> 5.0, "2" -> 15.0, "3" -> 25.0,
        "4" -> 35.0, "5" -> 45.0)) {
      assert(out(st).getAs[Long]("n_t") == 1L)
      assert(out(st).getAs[Long]("n_c") == 1L)
      assert(out(st).getAs[Double]("diff") == d)
    }
    assert(out("ALL").getAs[Double]("mean_t") == 145.0)
    assert(out("ALL").getAs[Double]("mean_c") == 120.0)
    assert(out("ALL").getAs[Double]("diff") == 25.0)
  }

  test("ab_ratio_delta pins the delta-method SEs and z") {
    val dir = tmp()
    // Per-user (sum, count): A = (30,2),(30,1),(60,2); B = (10,1),
    // (50,2),(60,1).
    val ev = Seq(
      (1L, Seq(10.0, 20.0)), (3L, Seq(30.0)), (5L, Seq(40.0, 20.0)),
      (2L, Seq(10.0)), (4L, Seq(20.0, 30.0)), (6L, Seq(60.0)))
    var id = 0L
    writeEvents(dir, ev.flatMap { case (u, vs) =>
      vs.map { v => id += 1; (id, Hour + id, u, "m", v) }
    })
    // golden_stats.py tranche16 ratio_delta: R_a = 120/5 = 24,
    // R_b = 120/4 = 30, se 5.499091 / 11.456439, z = 0.472148.
    val r = one(StatQueries.abRatioDelta(spark, dir))
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Double]("ratio_a") == 24.0)
    assert(r.getAs[Double]("ratio_b") == 30.0)
    assert(r.getAs[Double]("se_ratio_a") == 5.499091)
    assert(r.getAs[Double]("se_ratio_b") == 11.456439)
    assert(r.getAs[Double]("z") == 0.472148)
  }

  test("ab_group_sequential pins the four interim z's against OBF bounds") {
    val dir = tmp()
    // Arrival-ordered (arm, converted) script; looks of 4 events.
    val seq16 = Seq(
      ("A", 1), ("B", 0), ("A", 1), ("B", 0),
      ("A", 0), ("B", 1), ("A", 0), ("B", 1),
      ("A", 1), ("B", 1), ("A", 0), ("B", 0),
      ("A", 0), ("A", 1), ("B", 1), ("B", 1))
    writeEvents(dir, seq16.zipWithIndex.map { case ((arm, x), i) =>
      ((i + 1).toLong, Day + i * 1000L, if (arm == "A") 1L else 2L, "m",
        if (x == 1) 60.0 else 40.0)
    })
    // golden_stats.py tranche16 gst: z = -2, 0, 0, 0.503953; no look
    // crosses its O'Brien-Fleming boundary.
    val out = StatQueries.abGroupSequential(spark, dir).collect()
      .map(r => r.getAs[Long]("look") -> r).toMap
    assert(out(1L).getAs[Double]("z") == -2.0 &&
      out(1L).getAs[Double]("obf_boundary") == 4.049)
    assert(out(2L).getAs[Double]("z") == 0.0)
    assert(out(3L).getAs[Double]("z") == 0.0)
    assert(out(4L).getAs[Double]("z") == 0.503953 &&
      out(4L).getAs[Double]("obf_boundary") == 2.024)
    assert(out.values.forall(!_.getAs[Boolean]("crossed")))
  }

  // ------------------------------------------------------------ eval

  /** Chrono-split purchase-predictor fixture shared by the eval tests:
    * train half (ids 1-5) gives user rates u1=0.5, u2=1.0, u3=0.0 and
    * global 0.6; test half (ids 6-11) scores y/p pairs
    * (0,.5),(1,.5),(1,1),(0,0),(0,0),(1,.6) — u4 is unseen and falls
    * back to the global rate. */
  private def writePurchaseFixture(dir: String): Unit =
    writeEvents(dir, Seq(
      (1L, Day, 1L, "view", 1.0),
      (2L, Day + 1000L, 1L, "purchase", 1.0),
      (3L, Day + 2000L, 2L, "purchase", 1.0),
      (4L, Day + 3000L, 2L, "purchase", 1.0),
      (5L, Day + 4000L, 3L, "view", 1.0),
      (6L, 3 * Day - 5000L, 1L, "view", 1.0),
      (7L, 3 * Day - 4000L, 1L, "purchase", 1.0),
      (8L, 3 * Day - 3000L, 2L, "purchase", 1.0),
      (9L, 3 * Day - 2000L, 3L, "view", 1.0),
      (10L, 3 * Day - 1000L, 3L, "view", 1.0),
      (11L, 3 * Day, 4L, "purchase", 1.0)))

  test("eval_pr_auc pins the average-precision sum over positives") {
    val dir = tmp()
    writePurchaseFixture(dir)
    // golden_stats.py tranche17 pr_auc: hits at ranks 1, 2, 4 ->
    // AP = (1 + 1 + 0.75)/3 = 0.916667.
    val r = one(EvalQueries.evalPrAuc(spark, dir))
    assert(r.getAs[Long]("n_test") == 6L && r.getAs[Long]("n_pos") == 3L)
    assert(r.getAs[Double]("avg_precision") == 0.916667)
    assert(r.getAs[Double]("base_rate") == 0.5)
  }

  test("eval_rprecision pins precision at the break-even depth") {
    val dir = tmp()
    writePurchaseFixture(dir)
    // tranche17 rprec: top-3 by (p desc, id) holds 2 positives -> 2/3.
    val r = one(EvalQueries.evalRprecision(spark, dir))
    assert(r.getAs[Long]("n_pos") == 3L)
    assert(r.getAs[Double]("r_precision") == 0.666667)
  }

  test("eval_mcc pins the confusion matrix at the base-rate threshold") {
    val dir = tmp()
    writePurchaseFixture(dir)
    // tranche17 mcc: threshold 0.6 -> tp=2 fp=0 fn=1 tn=3,
    // MCC = 6/sqrt(72) = 0.707107.
    val r = one(EvalQueries.evalMcc(spark, dir))
    assert(r.getAs[Long]("tp") == 2L && r.getAs[Long]("fp") == 0L)
    assert(r.getAs[Long]("fn") == 1L && r.getAs[Long]("tn") == 3L)
    assert(r.getAs[Double]("precision") == 1.0)
    assert(r.getAs[Double]("recall") == 0.666667)
    assert(r.getAs[Double]("f1") == 0.8)
    assert(r.getAs[Double]("mcc") == 0.707107)
  }

  test("eval_ece pins the Murphy decomposition REL - RES + UNC") {
    val dir = tmp()
    writePurchaseFixture(dir)
    // tranche17 ece: singleton bins, gaps 0,0,.5,.5,.4,0 ->
    // ECE 0.233333; REL 0.11, RES 0.25, UNC 0.25, Brier 0.11.
    val r = one(EvalQueries.evalEce(spark, dir))
    assert(r.getAs[Long]("n_test") == 6L)
    assert(r.getAs[Double]("ece") == 0.233333)
    assert(r.getAs[Double]("reliability") == 0.11)
    assert(r.getAs[Double]("resolution") == 0.25)
    assert(r.getAs[Double]("uncertainty") == 0.25)
    assert(r.getAs[Double]("brier_decomposed") == 0.11)
  }

  test("eval_ks pins the cross-multiplied sup-CDF gap and its threshold") {
    val dir = tmp()
    writePurchaseFixture(dir)
    // tranche17 ks: gaps 6,6,3,0 over scores 0,.5,.6,1 -> KS = 6/9
    // with the tie broken toward the smallest score.
    val r = one(EvalQueries.evalKs(spark, dir))
    assert(r.getAs[Long]("n_pos") == 3L && r.getAs[Long]("n_neg") == 3L)
    assert(r.getAs[Double]("ks") == 0.666667)
    assert(r.getAs[Double]("ks_at_p") == 0.0)
  }

  test("eval_brier pins the Brier score and the clamped log-loss") {
    val dir = tmp()
    writePurchaseFixture(dir)
    // tranche17 brier: mean squared gap 0.66/6 = 0.11; logloss
    // 0.316187 with p in {0, 1} clamped to [1e-6, 1-1e-6].
    val r = one(EvalQueries.evalBrier(spark, dir))
    assert(r.getAs[Long]("n_test") == 6L)
    assert(r.getAs[Double]("base_rate") == 0.5)
    assert(r.getAs[Double]("brier") == 0.11)
    assert(r.getAs[Double]("logloss") == 0.316187)
  }

  test("eval_lift pins capture and lift over singleton deciles") {
    val dir = tmp()
    writePurchaseFixture(dir)
    // tranche17 lift: positives in deciles 1,2,4 of 6.
    val out = EvalQueries.evalLift(spark, dir).collect()
    assert(out.length == 6)
    assert(out.map(_.getAs[Long]("n_pos")).toSeq ==
      Seq(1L, 1L, 0L, 1L, 0L, 0L))
    assert(out.map(_.getAs[Double]("cum_capture")).toSeq ==
      Seq(0.333333, 0.666667, 0.666667, 1.0, 1.0, 1.0))
    assert(out.map(_.getAs[Double]("cum_lift")).toSeq ==
      Seq(2.0, 2.0, 1.333333, 1.5, 1.2, 1.0))
  }

  // ------------------------------------------------ survey/shrinkage

  test("shrinkage_means pins the James-Stein factor on 4 balanced groups") {
    val dir = tmp()
    valueEvents(dir, Map("a" -> Seq(8.0, 12.0), "b" -> Seq(18.0, 22.0),
      "c" -> Seq(28.0, 32.0), "d" -> Seq(38.0, 42.0)))
    // tranche17 shrink: grand mean 25, sum sq dev 500, mean var-of-mean
    // 4 -> c = 1 - 1*4/500 = 0.992; means pull 0.8% toward 25.
    val out = StatQueries.shrinkageMeans(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    for ((t, m, sm) <- Seq(("a", 10.0, 10.12), ("b", 20.0, 20.04),
        ("c", 30.0, 29.96), ("d", 40.0, 39.88))) {
      assert(out(t).getAs[Double]("raw_mean") == m)
      assert(out(t).getAs[Double]("shrink_factor") == 0.992)
      assert(out(t).getAs[Double]("shrunken_mean") == sm)
    }
  }

  test("brr_se pins the eight md5 half-sample replicate means") {
    val dir = tmp()
    writeEvents(dir, (1 to 6).map { u =>
      (u.toLong, Hour + u, u.toLong, "m", 10.0 * u)
    })
    // tranche17 brr: md5-bit half-samples of users 1..6 give replicate
    // means 35, 36.67, 33.33, 33.33, 36, 35, 40, 40 -> SE 2.723356.
    val r = one(StatQueries.brrSe(spark, dir))
    assert(r.getAs[Long]("n_replicates") == 8L)
    assert(r.getAs[Long]("n_events") == 6L)
    assert(r.getAs[Double]("full_mean") == 35.0)
    assert(r.getAs[Double]("brr_se") == 2.723356)
  }

  private def writeRakingDocs(dir: String): Unit = {
    import spark.implicits._
    val rows = Seq.fill(4)(("en", "s1")) ++ Seq.fill(2)(("en", "s2")) ++
      Seq(("de", "s1"), ("de", "s2"))
    rows.zipWithIndex.map { case ((l, src), i) => (i.toLong + 1, l, src) }
      .toDF("doc_id", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("ipf_raking pins the 4-round nano-grid Deming-Stephan walk") {
    val dir = tmp()
    writeRakingDocs(dir)
    // tranche17 ipf: cells 4/2/1/1, uniform lang target (4,4), observed
    // source targets (5,3) -> weights 2.822086, 1.179487, 2.177914,
    // 1.820513 after 4 rounds.
    val out = StatQueries.ipfRaking(spark, dir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("source")) -> r)
      .toMap
    assert(out(("de", "s1")).getAs[Double]("weight") == 2.177914)
    assert(out(("de", "s1")).getAs[Double]("raking_factor") == 2.177914)
    assert(out(("de", "s2")).getAs[Double]("weight") == 1.820513)
    assert(out(("en", "s1")).getAs[Double]("weight") == 2.822086)
    assert(out(("en", "s1")).getAs[Double]("raking_factor") == 0.705521)
    assert(out(("en", "s2")).getAs[Double]("weight") == 1.179487)
    assert(out(("en", "s2")).getAs[Double]("raking_factor") == 0.589744)
  }

  test("raking_ess pins the Kish effective sample size per lang") {
    val dir = tmp()
    writeRakingDocs(dir)
    // tranche17 ess: de (2.178, 1.821) -> 1.984147 (ratio 0.992074);
    // en (2.822, 1.179) -> 1.711595 (ratio 0.285266).
    val out = StatQueries.rakingEss(spark, dir).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    assert(out("de").getAs[Long]("n_docs") == 2L)
    assert(out("de").getAs[Double]("ess") == 1.984147)
    assert(out("de").getAs[Double]("ess_ratio") == 0.992074)
    assert(out("en").getAs[Long]("n_docs") == 6L)
    assert(out("en").getAs[Double]("ess") == 1.711595)
    assert(out("en").getAs[Double]("ess_ratio") == 0.285266)
  }

  // --------------------------------------- info-theory / inequality

  test("mi_matrix pins nano-rounded MI, marginal entropies, and NMI") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, "en", "s1"), (2L, "en", "s1"), (3L, "en", "s2"),
      (4L, "de", "s1")).toDF("doc_id", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    countEvents(dir, 0L, Map("a" -> Seq(3), "b" -> Seq(1, 2)))
    // golden_stats.py tranche18 mi: docs grid 2/1/1 -> MI 0.08495,
    // H 0.562335 both, NMI 0.151066; events grid 3/1/2 -> MI 0.318257,
    // H 0.693147/0.636514, NMI 0.479139.
    val out = OpsQueries.miMatrix(spark, dir).collect()
      .map(r => r.getAs[String]("pair") -> r).toMap
    val d = out("lang_x_source")
    assert(d.getAs[Long]("n") == 4L)
    assert(d.getAs[Double]("mi") == 0.08495)
    assert(d.getAs[Double]("h_x") == 0.562335)
    assert(d.getAs[Double]("h_y") == 0.562335)
    assert(d.getAs[Double]("nmi") == 0.151066)
    val e = out("type_x_hod")
    assert(e.getAs[Long]("n") == 6L)
    assert(e.getAs[Double]("mi") == 0.318257)
    assert(e.getAs[Double]("h_x") == 0.693147)
    assert(e.getAs[Double]("h_y") == 0.636514)
    assert(e.getAs[Double]("nmi") == 0.479139)
  }

  test("events_uncertainty pins both Theil U directions") {
    val dir = tmp()
    countEvents(dir, 0L, Map("a" -> Seq(3), "b" -> Seq(1, 2)))
    // tranche18 uncert: H(type) = ln 2, H(hour) = 0.636514,
    // MI = 0.318257 -> U(type|hour) = 0.459148, U(hour|type) = 0.5.
    val r = one(StatQueries.eventsUncertaintyCoef(spark, dir))
    assert(r.getAs[Long]("n") == 6L)
    assert(r.getAs[Double]("h_type") == 0.693147)
    assert(r.getAs[Double]("h_hour") == 0.636514)
    assert(r.getAs[Double]("mi") == 0.318257)
    assert(r.getAs[Double]("u_type_given_hour") == 0.459148)
    assert(r.getAs[Double]("u_hour_given_type") == 0.5)
  }

  test("events_lagged_mi pins quartile-binned MI at lags 1 and 24") {
    val dir = tmp()
    countEvents(dir, 100L, Map("t" -> (0 until 28).map(i => (i % 4) + 1)))
    // tranche18 lagged_mi: a 1,2,3,4 cycle is deterministic at both
    // lags; lag 24 aligns with the period (MI = ln 4 = 1.386294), lag 1
    // loses a sliver to unbalanced margins over 27 pairs (1.384182).
    val out = StatQueries.eventsLaggedMi(spark, dir).collect()
      .map(r => r.getAs[Long]("lag") -> r).toMap
    assert(out(1L).getAs[Long]("n_pairs") == 27L)
    assert(out(1L).getAs[Double]("mi_nats") == 1.384182)
    assert(out(24L).getAs[Long]("n_pairs") == 4L)
    assert(out(24L).getAs[Double]("mi_nats") == 1.386294)
  }

  test("revenue_theil pins T and the mean log deviation") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, 1L, 100.0), (2L, 2L, 200.0), (3L, 3L, 300.0),
      (4L, 4L, 400.0)).toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // tranche18 theil: ratios .4/.8/1.2/1.6 -> T = 0.10644,
    // L = 0.121777 (ppb round-then-sum).
    val r = one(OpsQueries.revenueTheil(spark, dir))
    assert(r.getAs[Long]("n_customers") == 4L)
    assert(r.getAs[Double]("mean_revenue") == 250.0)
    assert(r.getAs[Double]("theil_t") == 0.10644)
    assert(r.getAs[Double]("theil_l") == 0.121777)
  }

  test("revenue_atkinson pins 1 - geomean/mean at eps = 1") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, 1L, 100.0), (2L, 2L, 200.0), (3L, 3L, 400.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1L, "ALPHA")).toDF("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    // tranche18 atkinson: cents 1e4/2e4/4e4 -> geomean 2e4, mean
    // 7e4/3 -> A = 1 - 6/7 = 0.142857.
    val r = one(StatQueries.revenueAtkinson(spark, dir))
    assert(r.getAs[Long]("n_customers") == 3L)
    assert(r.getAs[Double]("total_revenue") == 700.0)
    assert(r.getAs[Double]("atkinson") == 0.142857)
  }

  test("woe_iv pins half-count-smoothed WoE and the IV sum") {
    import spark.implicits._
    val dir = tmp()
    val prices = Seq.fill(4)(10000.0) ++ Seq.fill(4)(60000.0)
    prices.zipWithIndex.map { case (p, i) => ((i + 1).toLong, p) }
      .toDF("o_orderkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, "R"), (5L, "R"), (6L, "R"), (7L, "R"), (8L, "N"))
      .toDF("l_orderkey", "l_returnflag")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // tranche18 woe: bands (4 orders, 1 bad) and (4, 3) -> WoE
    // +-ln(7/3) = +-0.847298, IV = 0.847298.
    val out = StatQueries.woeIv(spark, dir).collect()
      .map(r => r.getAs[Long]("band") -> r).toMap
    assert(out(0L).getAs[Long]("n_good") == 3L)
    assert(out(0L).getAs[Double]("woe") == 0.847298)
    assert(out(0L).getAs[Double]("iv_term") == 0.423649)
    assert(out(1L).getAs[Long]("n_bad") == 3L)
    assert(out(1L).getAs[Double]("woe") == -0.847298)
    assert(out(1L).getAs[Double]("iv_term") == 0.423649)
    assert(out(0L).getAs[Double]("iv_total") == 0.847298)
  }

  test("events_tail_index pins the Hill estimator on exact powers of 2") {
    val dir = tmp()
    writeEvents(dir, Seq(8.0, 4.0, 2.0, 1.0).zipWithIndex.map {
      case (v, i) => ((i + 1).toLong, Hour + i, (i + 1).toLong, "t", v)
    })
    // tranche18 hill: k = 4, x_k = 1.0,
    // alpha = 3/(ln8 + ln4 + ln2) = 0.721348 over milli-unit values.
    val r = one(StatQueries.eventsTailIndex(spark, dir))
    assert(r.getAs[Long]("k") == 4L)
    assert(r.getAs[Double]("x_k") == 1.0)
    assert(r.getAs[Double]("hill_alpha") == 0.721348)
  }

  // ------------------------------------- embedding linear algebra

  /** 2-D embeddings with hand-diagonalizable covariance diag(2, 0.5):
    * points (+-2,0), (0,+-1), (0,0) — mean zero, eigenpairs (2, e_x)
    * and (0.5, e_y). See golden_stats.py tranche19. */
  private def writeDiagEmbeddings(dir: String): Unit = {
    import spark.implicits._
    Seq((1L, Seq(2.0f, 0.0f), 0), (2L, Seq(-2.0f, 0.0f), 0),
      (3L, Seq(0.0f, 1.0f), 1), (4L, Seq(0.0f, -1.0f), 1),
      (5L, Seq(0.0f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  test("emb_pca pins the dominant eigenpair of a diagonal covariance") {
    val dir = tmp()
    writeDiagEmbeddings(dir)
    // eigval = 2 (the x-variance), explained = 2/2.5 = 0.8, and the
    // power iteration converges exactly (spectral gap 4x) -> resid 0.
    val r = one(OpsQueries.embPca(spark, dir))
    assert(r.getAs[Long]("n") == 5L && r.getAs[Long]("d") == 2L)
    assert(r.getAs[Double]("eigval") == 2.0)
    assert(r.getAs[Double]("explained_ratio") == 0.8)
    assert(r.getAs[Double]("resid") == 0.0)
  }

  test("emb_mahalanobis pins hand-computed distances and the trace identity") {
    val dir = tmp()
    writeDiagEmbeddings(dir)
    // inv = diag(0.5, 2) -> mahal2 = x^2/2 + 2 y^2 = 2,2,2,2,0;
    // sum = 8 = d(n-1). Ties rank by vec_id.
    val out = OpsQueries.embMahalanobis(spark, dir).collect()
    assert(out.length == 5)
    assert(out.map(_.getAs[Long]("vec_id")).toSeq ==
      Seq(1L, 2L, 3L, 4L, 5L))
    assert(out.map(_.getAs[Double]("mahal2")).toSeq ==
      Seq(2.0, 2.0, 2.0, 2.0, 0.0))
  }

  test("emb_whiten certifies identity covariance on the diagonal fixture") {
    val dir = tmp()
    writeDiagEmbeddings(dir)
    // W = diag(1/sqrt2, sqrt2): whitened cov = I to one ulp -> all
    // three certificate maxima round to zero at 6dp.
    val r = one(OpsQueries.embWhiten(spark, dir))
    assert(r.getAs[Long]("n") == 5L && r.getAs[Long]("d") == 2L)
    assert(r.getAs[Double]("max_mean_abs") == 0.0)
    assert(r.getAs[Double]("max_diag_err") == 0.0)
    assert(r.getAs[Double]("max_offdiag_abs") == 0.0)
  }
}
