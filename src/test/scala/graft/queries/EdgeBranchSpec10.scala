package graft.queries

import org.apache.spark.sql.functions._

/** Round-14 golden-value tranche 35 — same method as [[EdgeBranchSpec]]
  * (derivations in `tools/golden_stats.py` tranche35): the Lorenz
  * decile boundaries, the Q8-shape market share, z-score anomaly
  * flags at the 3-sigma gate, the chi-square independence audit,
  * regression/correlation profiles on a perfect-fit line, equal-width
  * histogram edges, and the second-digit Benford expectations. */
class EdgeBranchSpec10 extends GoldenFixtures {

  test("revenue_lorenz pins the decile boundary rows") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, 1L, 10.0), (2L, 2L, 20.0), (3L, 3L, 30.0), (4L, 4L, 40.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // golden_stats.py tranche35 lorenz: 4 customers hit boundary
    // deciles 2/5/7/10 with cumulative shares 0.1/0.3/0.6/1.0.
    val out = OpsQueries.revenueLorenz(spark, dir).collect()
      .map(r => r.getAs[Long]("decile") ->
        (r.getAs[Long]("n_customers"), r.getAs[Double]("cum_share")))
    assert(out.toSeq == Seq(
      2L -> (1L, 0.1), 5L -> (2L, 0.3), 7L -> (3L, 0.6), 10L -> (4L, 1.0)))
  }

  test("market_share pins the promo-filtered nation ratio") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, "PROMO"), (2L, "OTHER")).toDF("p_partkey", "p_type")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/part.parquet")
    Seq((1L, 7L), (2L, 0L)).toDF("s_suppkey", "s_nationkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq((1L, "1995-06-01")).toDF("o_orderkey", "d")
      .select(col("o_orderkey"), to_timestamp(col("d")).as("o_orderdate"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 1L, 1L, 1.0, 0.0), (1L, 1L, 2L, 2.0, 0.0),
      (1L, 2L, 1L, 99.0, 0.0))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
        "l_discount")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // The non-promo $99 line is filtered by the part join; nation 7
    // supplies $1 of the $3 promo revenue.
    val r = one(OpsQueries.marketShare(spark, dir))
    assert(r.getAs[Int]("o_year") == 1995)
    assert(r.getAs[Double]("total_revenue") == 3.0)
    assert(r.getAs[Double]("mkt_share") == 0.333333)
  }

  test("events_anomaly pins the z-scores at the 3-sigma gate") {
    val dir = tmp()
    countEvents(dir, 100L, Map("t" -> (Seq.fill(11)(2) ++ Seq(20))))
    // golden_stats.py tranche35 anomaly: the spike hour scores
    // z = 3.175426 (> 3, flagged); the flat hours sit at -0.288675.
    val out = OpsQueries.eventsAnomaly(spark, dir).collect()
      .map(r => r.getAs[Long]("hour_us") ->
        (r.getAs[Double]("z"), r.getAs[Boolean]("is_anomaly"))).toMap
    assert(out(111L * Hour) == ((3.175426, true)))
    assert(out(100L * Hour) == ((-0.288675, false)))
    assert(out.values.count(_._2) == 1)
  }

  test("corpus_chi2 pins the contingency arithmetic and dof") {
    import spark.implicits._
    val dir = tmp()
    val rows = Seq.fill(4)(("en", "web")) ++ Seq.fill(2)(("en", "wiki")) ++
      Seq.fill(2)(("de", "web")) ++ Seq.fill(2)(("de", "wiki"))
    rows.zipWithIndex.map { case ((l, s_), i) => (i + 1L, l, s_) }
      .toDF("doc_id", "lang", "source")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = one(OpsQueries.corpusChi2(spark, dir))
    assert(r.getAs[Double]("chi2") == 0.277778)
    assert(r.getAs[Long]("dof") == 1L)
  }

  /** Perfect line fixture: value = 2 x hour-of-day. */
  private lazy val lineDir: String = {
    val dir = tmp()
    writeEvents(dir, Seq(
      (1L, Hour, 1L, "t", 2.0), (2L, 2 * Hour, 2L, "t", 4.0),
      (3L, 3 * Hour, 3L, "t", 6.0)))
    dir
  }

  test("events_regression pins the perfect-fit recovery") {
    val r = one(OpsQueries.eventsRegression(spark, lineDir))
    assert(r.getAs[Double]("slope") == 2.0)
    assert(r.getAs[Double]("intercept") == 0.0)
    assert(r.getAs[Double]("r2") == 1.0)
  }

  test("events_corr pins corr/covar/stddev on the same line") {
    val r = one(OpsQueries.eventsCorr(spark, lineDir))
    assert(r.getAs[Long]("n") == 3L)
    assert(r.getAs[Double]("corr_vt") == 1.0)
    assert(r.getAs[Double]("covar_vt") == 2.0)
    assert(r.getAs[Double]("sd_value") == 2.0)
  }

  test("events_histogram pins the closed top edge") {
    val dir = tmp()
    valueEvents(dir, Map("t" -> (0 to 10).map(_.toDouble)))
    // Equal-width bins over [0, 10]: the max value closes into bin 9,
    // which therefore holds two rows (9.0 and 10.0).
    val out = OpsQueries.eventsHistogram(spark, dir).collect()
      .map(r => r.getAs[Int]("bin") -> r.getAs[Long]("n")).toMap
    assert(out == (0 to 8).map(_ -> 1L).toMap + (9 -> 2L))
  }

  // ------------------- coverage / interarrival / incremental (t36)

  test("catalog_coverage pins the anti-join dead-stock shares") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, "B1"), (2L, "B1"), (3L, "B1"), (4L, "B2"))
      .toDF("p_partkey", "p_brand")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/part.parquet")
    Seq(Tuple1(1L), Tuple1(2L)).toDF("l_partkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // golden_stats.py tranche36 coverage: B1 sells 2 of 3; B2's only
    // part never sells (the all-dead left-join null path).
    val out = OpsQueries.catalogCoverage(spark, dir).collect()
      .map(r => r.getAs[String]("p_brand") ->
        (r.getAs[Long]("n_parts"), r.getAs[Long]("n_never"),
          r.getAs[Double]("coverage"))).toMap
    assert(out == Map("B1" -> (3L, 1L, 0.666667), "B2" -> (1L, 1L, 0.0)))
  }

  test("events_interarrival pins the lag gaps and percentiles") {
    val dir = tmp()
    writeEvents(dir, Seq(
      (1L, 0L, 1L, "t", 1.0), (2L, 10000000L, 2L, "t", 1.0),
      (3L, 40000000L, 3L, "t", 1.0)))
    // Gaps 10 s and 30 s: mean/p50 20 s, p90 = 10 + 0.9*20 = 28 s.
    val r = one(OpsQueries.eventsInterarrival(spark, dir))
    assert(r.getAs[Long]("n_gaps") == 2L)
    assert(r.getAs[Double]("mean_us") == 2.0e7)
    assert(r.getAs[Double]("p50_us") == 2.0e7)
    assert(r.getAs[Double]("p90_us") == 2.8e7)
  }

  test("agg_incremental pins the mergeable-snapshot equivalence") {
    val dir = tmp()
    writeEvents(dir, (1 to 5).map(i =>
      (i.toLong, i * Hour, i.toLong, "t", i.toDouble)))
    // 80/20 chrono split -> base {1..4}, delta {5}; the merged
    // snapshots must equal the direct aggregation: n=5, sum=15.
    val r = one(OpsQueries.aggIncremental(spark, dir))
    assert(r.getAs[Long]("n_events") == 5L)
    assert(r.getAs[Double]("sum_value") == 15.0)
  }

  test("benford_digit2 pins the marginal second-digit expectations") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, 1.00), (2L, 1.23), (3L, 0.05), (4L, 2.50))
      .toDF("o_orderkey", "o_totalprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // The 5-cent order (< 10 cents) has no second digit and drops;
    // golden_stats.py tranche35 benford2 pins the 9-term ln-ratio
    // marginals and chi-square terms.
    val out = OpsQueries.benfordDigit2(spark, dir).collect()
      .map(r => r.getAs[Long]("digit") ->
        (r.getAs[Long]("n"), r.getAs[Double]("share"),
          r.getAs[Double]("benford_p"), r.getAs[Double]("chi2_term"))).toMap
    assert(out.keySet == Set(0L, 2L, 5L))
    assert(out(0L) == ((1L, 0.333333, 0.119679, 1.14426)))
    assert(out(2L) == ((1L, 0.333333, 0.108821, 1.389585)))
    assert(out(5L) == ((1L, 0.333333, 0.096677, 1.737931)))
  }
}
