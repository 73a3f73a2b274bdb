package graft.queries

import org.apache.spark.sql.functions._

/** Round-14 golden-value tranche 33 — same method as [[EdgeBranchSpec]]
  * (derivations in `tools/golden_stats.py` tranche33): the session /
  * attribution / growth-accounting family on one hand-walkable event
  * log, plus the SLO burn gates, the watermark-lateness dry run, and
  * the join fan-out profile. */
class EdgeBranchSpec8 extends GoldenFixtures {

  /** u1 session A: view→click→purchase→click→purchase (minute steps);
    * u1 session B next day: two views; u2: a lone purchase; u3: a lone
    * view; u4: view→click with no purchase. */
  private lazy val sessDir: String = {
    val dir = tmp()
    writeEvents(dir, Seq(
      (1L, 0L, 1L, "view", 1.0),
      (2L, 60000000L, 1L, "click", 1.0),
      (3L, 120000000L, 1L, "purchase", 1.0),
      (4L, 180000000L, 1L, "click", 1.0),
      (5L, 240000000L, 1L, "purchase", 1.0),
      (6L, Day, 1L, "view", 1.0),
      (7L, Day + 60000000L, 1L, "view", 1.0),
      (8L, 0L, 2L, "purchase", 1.0),
      (9L, 0L, 3L, "view", 1.0),
      (10L, 0L, 4L, "view", 1.0),
      (11L, 30000000L, 4L, "click", 1.0)))
    dir
  }

  test("attribution pins first/last touch incl. the direct fallback") {
    // Both of u1's conversions trace (view, click); u2's session-
    // opening purchase falls back to last_touch = direct.
    val out = OpsQueries.attribution(spark, sessDir).collect()
      .map(r => (r.getAs[String]("first_touch"), r.getAs[String]("last_touch"))
        -> r.getAs[Long]("n_conversions")).toMap
    assert(out == Map(
      ("purchase", "direct") -> 1L, ("view", "click") -> 2L))
  }

  test("attribution_position pins the U-shaped 40/20/40 split") {
    // golden_stats.py tranche33 position: conv1 (m=2) splits 50/50;
    // conv2 (m=4) gives 4000 to each end and 1000 to each middle —
    // the EARLIER purchase is itself a middle touch of conv2; u2's
    // pathless purchase credits 'direct'. Credits sum to 3.0
    // conversions exactly.
    val out = OpsQueries.attributionPosition(spark, sessDir).collect()
      .map(r => r.getAs[String]("channel") ->
        (r.getAs[Long]("n_credits"), r.getAs[Long]("bp_total"),
          r.getAs[Double]("conversions_credited"))).toMap
    assert(out == Map(
      "click" -> (3L, 10000L, 1.0),
      "direct" -> (1L, 10000L, 1.0),
      "purchase" -> (1L, 1000L, 0.1),
      "view" -> (2L, 9000L, 0.9)))
  }

  test("session_bounce pins the single-event sessions per entry") {
    val out = OpsQueries.sessionBounce(spark, sessDir).collect()
      .map(r => r.getAs[String]("entry_channel") ->
        (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_bounces"),
          r.getAs[Double]("bounce_rate"))).toMap
    assert(out == Map(
      "purchase" -> (1L, 1L, 1.0), "view" -> (4L, 1L, 0.25)))
  }

  test("cart_abandonment pins intent/abandon and the no-intent null") {
    val out = OpsQueries.cartAbandonment(spark, sessDir).collect()
      .map(r => r.getAs[Long]("day_idx") ->
        (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_intent"),
          r.getAs[Long]("n_abandoned"),
          Option(r.getAs[java.lang.Long]("abandon_bp")).map(_.toLong))).toMap
    assert(out(0L) == ((4L, 2L, 1L, Some(5000L))))
    assert(out(1L) == ((1L, 0L, 0L, None)))
  }

  test("user_churn pins the shifted full-outer day accounting") {
    // Day 2 exists ONLY through the previous-day shift: all of day
    // 1's users churn into it.
    val out = OpsQueries.userChurn(spark, sessDir).collect()
      .map(r => r.getAs[Long]("day") ->
        (r.getAs[Long]("retained"), r.getAs[Long]("new_users"),
          r.getAs[Long]("churned"))).toMap
    assert(out == Map(
      0L -> (0L, 4L, 0L), 1L -> (1L, 0L, 3L), 2L -> (0L, 0L, 1L)))
  }

  test("user_cumulative pins first-day attribution and the running sum") {
    val out = OpsQueries.userCumulative(spark, sessDir).collect()
      .map(r => r.getAs[Long]("day") ->
        (r.getAs[Long]("new_users"), r.getAs[Long]("cum_users"))).toMap
    assert(out == Map(0L -> (4L, 4L), 1L -> (0L, 4L)))
  }

  test("concurrency_peak pins the sign-folded boundary sweep") {
    // Four sessions all open at t=0 (two of them zero-length —
    // their end keys sort AFTER the starts at the same instant, so
    // the sweep sees all four concurrently).
    val out = StatQueries.concurrencyPeak(spark, sessDir).collect()
      .map(r => r.getAs[Long]("day_idx") ->
        (r.getAs[Long]("peak_concurrency"), r.getAs[Long]("n_starts"))).toMap
    assert(out == Map(0L -> (4L, 4L), 1L -> (1L, 1L)))
  }

  test("slo_burn pins the two-window AND gates at exact tallies") {
    val dir = tmp()
    writeEvents(dir,
      (1 to 9).map(i => (i.toLong, i * 1000L, i.toLong, "t", 99.0)) ++
        Seq((10L, 10000L, 10L, "t", 1.0)) ++
        Seq((11L, Hour + 1000L, 11L, "t", 99.0)) ++
        (12 to 20).map(i => (i.toLong, Hour + i * 1000L, i.toLong, "t", 1.0)))
    // Hour 0: 9/10 errors — burn 18, both gates fire. Hour 1: 1/10 —
    // burn 2, the 6h window holds 10/20, neither gate fires.
    val out = StatQueries.sloBurn(spark, dir).collect()
      .map(r => r.getAs[Long]("hour_idx") ->
        (r.getAs[Double]("burn_1h"), r.getAs[Double]("burn_6h"),
          r.getAs[Boolean]("page"), r.getAs[Boolean]("ticket"))).toMap
    assert(out(0L) == ((18.0, 18.0, true, true)))
    assert(out(1L) == ((2.0, 10.0, false, false)))
  }

  test("watermark_audit pins the strict lateness boundary") {
    val dir = tmp()
    writeEvents(dir, Seq(
      (1L, 0L, 1L, "t", 1.0),
      (2L, 7200000000L, 2L, "t", 1.0),
      (3L, 3600000000L, 3L, "t", 1.0),   // 1 h late vs hwm 2 h
      (4L, 7100000000L, 4L, "t", 1.0)))  // 100 s late
    // delay 60 s drops both stragglers; 600 s keeps the 100 s one;
    // 3600 s keeps both — hwm - delay > ts is STRICT, so the exactly-
    // 1 h-late event 3 survives the 1 h delay.
    val out = StatQueries.watermarkAudit(spark, dir).collect()
      .map(r => r.getAs[Long]("delay_s") ->
        (r.getAs[Long]("n_late"), r.getAs[Long]("late_bp"))).toMap
    assert(out == Map(
      60L -> (2L, 5000L), 600L -> (1L, 2500L), 3600L -> (0L, 0L)))
  }

  test("fanout_profile pins the zero-degree anti-join row") {
    import spark.implicits._
    val dir = tmp()
    Seq(Tuple1(1L), Tuple1(2L), Tuple1(3L)).toDF("c_custkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1L, 1L), (2L, 1L), (3L, 2L)).toDF("o_orderkey", "o_custkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = OpsQueries.fanoutProfile(spark, dir).collect()
      .map(r => r.getAs[Long]("n_orders") -> r.getAs[Long]("n_customers"))
    assert(out.toSeq == Seq(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }
}
