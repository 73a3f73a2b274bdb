package graft.queries

import org.apache.spark.sql.functions._

/** Round-14 golden-value tranche 34 — same method as [[EdgeBranchSpec]]
  * (derivations in `tools/golden_stats.py` tranche34): the business
  * rollup family — MoM/YoY growth lags, argmin-per-group supplier
  * election, lead-time percentiles, first-order revenue splits, the
  * seasonal index ratio, supply-risk concentration, the RFM migration
  * matrix with churn/new zero codes, and the per-column profile. */
class EdgeBranchSpec9 extends GoldenFixtures {

  private def orders(dir: String, rows: Seq[(Long, Long, Double, String)]): Unit = {
    import spark.implicits._
    rows.toDF("o_orderkey", "o_custkey", "o_totalprice", "d")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        to_timestamp(col("d")).as("o_orderdate"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
  }

  test("revenue_growth pins the MoM and 12-row YoY lags") {
    val dir = tmp()
    orders(dir, (1 to 12).map(m =>
      (m.toLong, m.toLong, m.toDouble, f"1995-$m%02d-15")) :+
      (13L, 13L, 24.0, "1996-01-15"))
    // golden_stats.py tranche34 growth: a complete month spine makes
    // the 12-row lag a true YoY: 199601 = 24/1 - 1 = 23.
    val out = OpsQueries.revenueGrowth(spark, dir).collect()
      .map(r => r.getAs[Long]("month") ->
        (Option(r.getAs[java.lang.Double]("mom")).map(_.toDouble),
          Option(r.getAs[java.lang.Double]("yoy")).map(_.toDouble))).toMap
    assert(out(199501L) == ((None, None)))
    assert(out(199502L) == ((Some(1.0), None)))
    assert(out(199512L) == ((Some(0.090909), None)))
    assert(out(199601L) == ((Some(1.0), Some(23.0))))
  }

  test("part_best_supplier pins the argmin and the unit-price tie") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, 1L, 4.0, 2.0), (1L, 2L, 3.0, 2.0),
      (2L, 1L, 6.0, 2.0), (2L, 3L, 3.0, 1.0))
      .toDF("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // p1: units 2.0 vs 1.5 -> s2; p2: both unit 3.0 -> the tie breaks
    // to the LOWER suppkey.
    val out = OpsQueries.partBestSupplier(spark, dir).collect()
      .map(r => r.getAs[Long]("l_partkey") ->
        (r.getAs[Long]("best_suppkey"), r.getAs[Double]("unit_price"),
          r.getAs[Long]("n_suppliers"))).toMap
    assert(out == Map(1L -> (2L, 1.5, 2L), 2L -> (1L, 3.0, 2L)))
  }

  test("lead_time pins the exact day lags and percentile bands") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, "a", "1995-01-01"), (2L, "a", "1995-01-01"))
      .toDF("o_orderkey", "o_orderpriority", "d")
      .select(col("o_orderkey"), col("o_orderpriority"),
        to_timestamp(col("d")).as("o_orderdate"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, "1995-01-02"), (2L, "1995-01-04")).toDF("l_orderkey", "d")
      .select(col("l_orderkey"), to_timestamp(col("d")).as("l_shipdate"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // golden_stats.py tranche34 lead: days {1, 3}.
    val r = one(OpsQueries.leadTime(spark, dir))
    assert(r.getAs[Long]("n") == 2L)
    assert(r.getAs[Double]("mean_days") == 2.0)
    assert(r.getAs[Double]("p50") == 2.0)
    assert(r.getAs[Double]("p90") == 2.8)
    assert(r.getAs[Double]("p99") == 2.98)
  }

  test("new_repeat_revenue pins the first-order classification") {
    val dir = tmp()
    orders(dir, Seq(
      (1L, 1L, 10.0, "1995-01-10"), (2L, 1L, 20.0, "1995-02-10"),
      (3L, 2L, 30.0, "1995-02-20")))
    val out = OpsQueries.newRepeatRevenue(spark, dir).collect()
      .map(r => r.getAs[Long]("month") ->
        (r.getAs[Double]("new_revenue"), r.getAs[Double]("repeat_revenue"),
          r.getAs[Long]("n_new"), r.getAs[Long]("n_repeat"))).toMap
    assert(out == Map(
      199501L -> (10.0, 0.0, 1L, 0L), 199502L -> (30.0, 20.0, 1L, 1L)))
  }

  test("revenue_seasonal_index pins the exact cell-grid ratio") {
    val dir = tmp()
    orders(dir, Seq(
      (1L, 1L, 10.0, "1995-01-10"), (2L, 2L, 20.0, "1995-02-10"),
      (3L, 3L, 40.0, "1996-01-10"), (4L, 4L, 10.0, "1996-02-10")))
    // golden_stats.py tranche34 seasonal: month 1 over-indexes at
    // (5000 cents x 4 cells)/(2 years x 8000) = 1.25.
    val out = OpsQueries.revenueSeasonalIndex(spark, dir).collect()
      .map(r => r.getAs[Long]("month") ->
        (r.getAs[Long]("n_years"), r.getAs[Double]("revenue"),
          r.getAs[Double]("seasonal_index"))).toMap
    assert(out == Map(
      1L -> (2L, 50.0, 1.25), 2L -> (2L, 30.0, 0.75)))
  }

  test("single_source_risk pins concentration and the multi-source gate") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, 1L, 9.0), (1L, 2L, 1.0), (2L, 1L, 5.0),
      (3L, 1L, 3.0), (3L, 2L, 3.0))
      .toDF("l_partkey", "l_suppkey", "l_quantity")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // p2 is single-sourced -> excluded; p3's 50/50 tie elects the
    // lower suppkey.
    val rows = OpsQueries.singleSourceRisk(spark, dir).collect()
      .map(r => (r.getAs[Long]("p_partkey"), r.getAs[Long]("top_suppkey"),
        r.getAs[Long]("share_bp")))
    assert(rows.toSeq == Seq((1L, 1L, 9000L), (3L, 1L, 5000L)))
  }

  test("rfm_migration pins the quartile matrix incl. churn/new codes") {
    val dir = tmp()
    orders(dir, Seq(
      (1L, 1L, 40.0, "1995-01-05"), (2L, 2L, 30.0, "1995-01-10"),
      (3L, 3L, 20.0, "1995-01-15"), (4L, 4L, 10.0, "1995-01-20"),
      (5L, 1L, 10.0, "1995-03-20"), (6L, 2L, 40.0, "1995-03-25"),
      (7L, 5L, 5.0, "1995-03-31")))
    // First half ranks c1..c4 into quartiles 1..4; second half ranks
    // c2/c1/c5 into 1/2/3. c3/c4 churn to q_to 0, c5 is new (q_from 0).
    val out = OpsQueries.rfmMigration(spark, dir).collect()
      .map(r => (r.getAs[Long]("q_from"), r.getAs[Long]("q_to")) ->
        r.getAs[Long]("n_customers")).toMap
    assert(out == Map(
      (0L, 3L) -> 1L, (1L, 2L) -> 1L, (2L, 1L) -> 1L,
      (3L, 0L) -> 1L, (4L, 0L) -> 1L))
  }

  test("profile_table pins the per-column census") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, 1L, 1L, 1, 2.0, 10.0, 0.05, 0.01),
      (2L, 2L, 1L, 1, 4.0, 20.0, 0.0, 0.02))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = OpsQueries.profileTable(spark, dir).collect()
      .map(r => r.getAs[String]("col_name") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_null"),
          r.getAs[Long]("n_distinct"), r.getAs[Double]("min_val"),
          r.getAs[Double]("max_val"))).toMap
    assert(out("l_quantity") == ((2L, 0L, 2L, 2.0, 4.0)))
    assert(out("l_suppkey") == ((2L, 0L, 1L, 1.0, 1.0)))
    assert(out("l_discount") == ((2L, 0L, 2L, 0.0, 0.05)))
    assert(out("l_orderkey") == ((2L, 0L, 2L, 1.0, 2.0)))
  }
}
