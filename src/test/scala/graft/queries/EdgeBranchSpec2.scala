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
}
