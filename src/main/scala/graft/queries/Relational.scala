package graft.queries

import graft.Tables
import graft.ops.{AsOfJoin, RangeJoin}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator pack over the TPC-H-ish test tables (SURVEY §2 #1–7).
  *
  * Everything is declarative DataFrame code: filters/projections reach the
  * parquet scan (PushedFilters/ReadSchema), dimension joins are broadcast,
  * aggregation is partial (map-side) before the shuffle, and the pipelines
  * stay inside WholeStageCodegen. Doubles whose value depends on summation
  * order are rounded in-query so results are bit-identical to the DuckDB
  * oracle; every query ends with a full-key ORDER BY for deterministic rows.
  */
object Relational {

  /** #2 hash aggregation: TPC-H Q1-style pricing summary.
    * Scale: single shuffle on (returnflag, linestatus) — 6 groups; partial
    * aggregation collapses each scan partition to ≤6 rows first. */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("2000-01-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum("l_quantity").as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 6).as("avg_qty"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** #3 multi-way join with broadcast dims: revenue by nation in ASIA.
    * Scale: orders⋈customer shuffles on custkey; nation/region are broadcast
    * so the big side never reshuffles for them. */
  def q2Join(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      // Filter BEFORE broadcast: ship the one matching region row, not
      // the table, and let the broadcast join do the region pruning.
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(round(sum("o_totalprice"), 2).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy("n_name")

  /** #4 join + agg + top-k: 10 highest-revenue orders.
    * Scale: agg keyed by orderkey, then TakeOrderedAndProject (per-partition
    * top-k + driver merge) — no global sort materialization. */
  def q3TopK(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(desc("revenue"), col("l_orderkey"))
      .limit(10)
      .select("l_orderkey", "o_orderdate", "revenue")

  /** #4b top-3 orders per priority through the CUSTOM top-k-per-group
    * operator ([[graft.plans.Graft.topKPerGroup]] — logical node +
    * planner strategy + bounded-heap exec via SparkSessionExtensions):
    * same rows as a `row_number` window, but k-bounded heap state
    * instead of a full per-group sort. Exact-cents ranking with the
    * orderkey tiebreak makes the kept set total-order deterministic. */
  def topkPerGroup(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .withColumn("cents", round(col("o_totalprice") * 100, 0).cast("long"))
    graft.plans.Graft.topKPerGroup(o, Seq("o_orderpriority"), "cents", 3,
        descending = true, tiebreak = Seq("o_orderkey"))
      .select(col("o_orderpriority"), col("o_orderkey"),
        round(col("cents") / 100.0, 2).as("price"))
      .orderBy("o_orderpriority", "o_orderkey")
  }

  /** #5 window functions: first 3 orders per customer with running spend.
    * Scale: one shuffle on custkey; window sums are order-deterministic so
    * no rounding drift. */
  def q4Window(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("running_spend",
        round(sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2))
      .filter(col("rn") <= 3)
      .select("o_custkey", "rn", "o_orderkey", "running_spend")
      .orderBy("o_custkey", "rn")
  }

  /** #6 semi/anti join: customers with a finished order and no pending one.
    * Scale: left_semi/left_anti never materialize the join product; with a
    * small filtered build side AQE turns these into broadcast joins. */
  def q5SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    val finished = o.filter(col("o_orderstatus") === "F").select("o_custkey")
    val pending  = o.filter(col("o_orderstatus") === "P").select("o_custkey")
    c.join(finished, col("c_custkey") === finished("o_custkey"), "left_semi")
      .join(pending, col("c_custkey") === pending("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** #1 scan + selective filter + narrow projection: pushdown showcase.
    * The plan must show PushedFilters on l_shipdate/l_discount/l_quantity and
    * a 5-column ReadSchema. */
  def q6Filter(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate").between(
          lit("1996-01-01").cast("timestamp"), lit("1996-12-31").cast("timestamp"))
        && col("l_discount").between(0.05, 0.07)
        && col("l_quantity") < 10)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice")

  /** #7b point-in-time (as-of) join: each event picks the user's most
    * recent purchase at-or-before it (an event that IS a purchase matches
    * itself — the tie arm), nulled when the purchase is older than 24 h —
    * the feature-store / attribution lookup pattern. ~48% of events carry
    * a match at sf0.01, so both the hit and the tolerance-null arms are
    * exercised by the hash.
    * Scale: [[graft.ops.AsOfJoin]]'s union-window plan — one exchange of
    * 2|events| rows keyed by user, no per-key pair space. The purchase
    * side is pre-deduplicated to one row per (user, ts) (greatest
    * (value, event_id) wins) so the match is engine-deterministic. */
  def q8AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(s, dir)
    val purchases = events
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts").as("p_ts"))
      .agg(max(struct(col("value"), col("event_id"))).as("m"))
      .select(col("user_id"), col("p_ts"),
        col("m.event_id").as("p_event_id"), col("m.value").as("p_value"))
    AsOfJoin.backward(
      left = events,
      right = purchases,
      keys = Seq("user_id"),
      leftTs = "ts",
      rightTs = "p_ts",
      rightCols = Seq("p_event_id", "p_value"),
      toleranceUs = Some(24L * 3600 * 1000000))
      .select(
        col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("p_event_id"), round(col("p_value"), 6).as("p_value"))
      .orderBy("event_id")
  }

  /** #7b' forward as-of join: each event picks the user's EARLIEST
    * purchase at-or-after it (the lead-time / time-to-conversion
    * direction), nulled beyond 24 h. Same union-window plan and same
    * deterministic purchase dedup as [[q8AsofJoin]]. */
  def q8AsofForward(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(s, dir)
    val purchases = events
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts").as("p_ts"))
      .agg(max(struct(col("value"), col("event_id"))).as("m"))
      .select(col("user_id"), col("p_ts"),
        col("m.event_id").as("p_event_id"), col("m.value").as("p_value"))
    AsOfJoin.forward(
      left = events,
      right = purchases,
      keys = Seq("user_id"),
      leftTs = "ts",
      rightTs = "p_ts",
      rightCols = Seq("p_event_id", "p_value"),
      toleranceUs = Some(24L * 3600 * 1000000))
      .select(
        col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("p_event_id"), round(col("p_value"), 6).as("p_value"))
      .orderBy("event_id")
  }

  /** #7b'' nearest as-of join: each event picks the user's purchase
    * CLOSEST in time, either direction, within 12 h (backward wins
    * distance ties) — the sensor-alignment / feature-join variant where
    * "most recent" is wrong because the nearest reading may be just
    * ahead. Same single union-window exchange as backward/forward: both
    * direction hits come from two frames over ONE sort. */
  def q8cAsofNearest(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(s, dir)
    val purchases = events
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts").as("p_ts"))
      .agg(max(struct(col("value"), col("event_id"))).as("m"))
      .select(col("user_id"), col("p_ts"),
        col("m.event_id").as("p_event_id"), col("m.value").as("p_value"))
    AsOfJoin.nearest(
      left = events,
      right = purchases,
      keys = Seq("user_id"),
      leftTs = "ts",
      rightTs = "p_ts",
      rightCols = Seq("p_event_id", "p_value"),
      toleranceUs = Some(12L * 3600 * 1000000))
      .select(
        col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("p_event_id"), round(col("p_value"), 6).as("p_value"))
      .orderBy("event_id")
  }

  /** #7c interval (range) join: clicks landing inside the 24 h window
    * opened by each purchase of the same user, aggregated per purchase.
    * Scale: [[graft.ops.RangeJoin]] tiles time into max-interval-width
    * buckets → plain equi-join on (user, bucket) with ≤2× interval
    * fan-out, instead of Spark's per-key nested-loop theta-join. */
  def q9RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(s, dir)
    val intervals = events
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("user_id"),
        col("ts").as("win_start"),
        (col("ts") + expr("INTERVAL 24 HOURS")).as("win_end"))
    val points = events
      .filter(col("event_type") === "click")
      .select("user_id", "ts", "value")
    RangeJoin.pointInInterval(points, intervals, Seq("user_id"), "ts", "win_start", "win_end")
      .groupBy("p_event_id")
      .agg(count(lit(1)).as("n_clicks"), round(sum("value"), 6).as("sum_value"))
      .orderBy("p_event_id")
  }

  /** #7e staged conversion funnel: signup → first view at-or-after the
    * signup → first purchase at-or-after that view, counted per stage.
    * Scale: each stage is a type-filtered scan (pushdown) aggregated on
    * user_id, then an equi-join on user_id against the previous stage's
    * (user, first_ts) — three user-keyed shuffles of per-user rows, never
    * a per-event pair space or a window over the whole history. */
  def q10Funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    def stage(evType: String) =
      ev.filter(col("event_type") === evType).select("user_id", "ts")
    val s1 = stage("signup").groupBy("user_id").agg(min("ts").as("t1"))
    val s2 = stage("view").join(s1, "user_id").filter(col("ts") >= col("t1"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val s3 = stage("purchase").join(s2, "user_id").filter(col("ts") >= col("t2"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
      .agg(
        count("t1").as("n_signup"),
        count("t2").as("n_viewed"),
        count("t3").as("n_purchased"))
  }

  /** #7f weekly cohort retention: users bucketed by first-activity week,
    * counted per (cohort, week offset) of later activity.
    * Scale: distinct (user, week) pairs — bounded by users × horizon —
    * joined to the per-user cohort row; both shuffles are user-keyed. */
  def q11Retention(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val weekly = ev
      .select(col("user_id"), unix_timestamp(date_trunc("week", col("ts"))).as("w"))
      .distinct()
    val cohort = weekly.groupBy("user_id").agg(min("w").as("cw"))
    weekly.join(cohort, "user_id")
      .groupBy(col("cw").as("cohort_week"),
        ((col("w") - col("cw")) / 604800L).cast("long").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** #7g ROLLUP aggregation: pricing summary with per-flag and grand
    * totals in one pass (grouping-sets expansion inside the same hash
    * aggregate — no self-union of aggs). Null grouping keys are
    * sentinel-coalesced so ordering is engine-neutral. */
  def q12Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n_rows"),
        grouping_id().as("gid"))
      .select(col("gid"),
        coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
        col("sum_qty"), col("n_rows"))
      .orderBy("gid", "l_returnflag", "l_linestatus")

  /** #7g' CUBE: the full 2^2 grouping-set lattice over the same keys
    * as the rollup — one shuffle materializes all four granularities. */
  def q12bCube(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n_rows"),
        grouping_id().as("gid"))
      .select(col("gid"),
        coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
        col("sum_qty"), col("n_rows"))
      .orderBy("gid", "l_returnflag", "l_linestatus")

  /** #7h pivot: per-nation event-type activity matrix (conditional
    * aggregation with an explicit value list — one shuffle, no
    * distinct-values pre-pass). */
  def q13Pivot(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(s, dir)
      .join(Tables.customer(s, dir), col("user_id") === col("c_custkey"))
      .groupBy("c_nationkey")
      .pivot("event_type", types)
      .count()
      .select(col("c_nationkey") +:
        types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      .orderBy("c_nationkey")
  }

  /** #7i SQL interface: the same engine driven through `spark.sql` text
    * over a registered view, exercising the custom native expression
    * (`array_dot`, registered SQL-side by [[graft.functions.register]])
    * from SQL — the "switch your BI tool to it" surface. */
  def q14Sql(s: SparkSession, dir: String): DataFrame = {
    graft.functions.register(s)
    Tables.embeddings(s, dir).createOrReplaceTempView("graft_embeddings")
    s.sql("""
      SELECT label, count(*) AS n_vecs,
        round(avg(sqrt(array_dot(v, v))), 6) AS avg_norm
      FROM (SELECT label, cast(embedding AS array<double>) AS v
            FROM graft_embeddings)
      GROUP BY label ORDER BY label""")
  }

  /** #7j full-outer join: per-customer order count next to event count,
    * keeping customers that appear on only one side (events carry
    * user_ids outside the customer table and vice versa). */
  def q15FullOuter(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
      .groupBy(col("o_custkey").as("cust")).agg(count(lit(1)).as("n_orders"))
    val events = Tables.events(s, dir)
      .groupBy(col("user_id").as("cust")).agg(count(lit(1)).as("n_events"))
    orders.join(events, Seq("cust"), "full_outer")
      .select(col("cust"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
      .orderBy("cust")
  }

  /** #7k set operations: customers with both finished orders AND events
    * (INTERSECT), and with finished orders but no events (EXCEPT). */
  def q16SetOps(s: SparkSession, dir: String): DataFrame = {
    val finished = Tables.orders(s, dir)
      .filter(col("o_orderstatus") === "F").select(col("o_custkey").as("cust"))
    val active = Tables.events(s, dir).select(col("user_id").as("cust"))
    val both = finished.intersect(active).withColumn("set_op", lit("intersect"))
    val only = finished.except(active).withColumn("set_op", lit("except"))
    both.unionAll(only).orderBy("set_op", "cust")
  }

  /** #3h TPC-H Q5-style star join: revenue per nation of region 0,
    * counting only lineitems whose supplier sits in the customer's own
    * nation — the 5-table chain (region→nation→customer→orders→
    * lineitem→supplier) with every dim broadcast and the local-supplier
    * predicate as a join condition, not a post-filter. */
  def q17Star(s: SparkSession, dir: String): DataFrame = {
    val nations = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir).filter(col("r_regionkey") === 0)),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    Tables.customer(s, dir)
      .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.orders(s, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(s, dir)),
        col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
      .withColumn("cents",
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100, 0)
          .cast("long"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_items"),
        round(sum("cents") / lit(100.0), 2).as("revenue"))
      .orderBy("n_name")
  }

  /** #3i TPC-H Q7-shape nation-pair trade volume: exact-cents revenue
    * between every (supplier nation, customer nation) pair per ship
    * year, excluding domestic trade. The fact table shuffles once per
    * fact-fact join (lineitem⋈orders on orderkey, then custkey); every
    * dimension (supplier, customer→nation, nation) broadcasts — at
    * 100 TB the two big joins are the only exchanges, and AQE sizes
    * them. */
  def q21Volume(s: SparkSession, dir: String): DataFrame = {
    val nations = broadcast(Tables.nation(s, dir).select("n_nationkey", "n_name"))
    val supp = broadcast(Tables.supplier(s, dir)
      .join(nations, col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation")))
    val cust = broadcast(Tables.customer(s, dir)
      .join(nations, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation")))
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .withColumn("cents",
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100, 0)
          .cast("long"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(count(lit(1)).as("n_items"),
        round(sum("cents") / lit(100.0), 2).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** #6b correlated EXISTS (TPC-H Q4 shape): orders having at least
    * one line shipped more than 60 days after the order date, counted
    * per priority — the semi-join the optimizer must NOT expand into a
    * fan-out join (one output row per order regardless of line count). */
  def q18Exists(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir),
        col("o_orderkey") === col("l_orderkey") &&
          expr("l_shipdate > o_orderdate + INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_late_orders"))
      .orderBy("o_orderpriority")

  /** #6d TPC-H Q21 shape — suppliers who ALONE were late on
    * multi-supplier orders: the doubly-correlated EXISTS (another
    * supplier participated) + NOT EXISTS (no other supplier was also
    * late) pattern, planned as one semi-join and one anti-join over
    * deduplicated (order, supplier) pairs — never a fan-out join and
    * never a correlated re-scan per row. "Late" = shipped > 60 days
    * after order date (this schema has no commit/receipt dates).
    * Top-20 by (numwait desc, s_suppkey): exact integers, TakeOrdered. */
  def q20Waiting(s: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
    val late = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir),
        col("l_orderkey") === col("o_orderkey") &&
          expr("l_shipdate > o_orderdate + INTERVAL 60 DAYS"),
        "left_semi")
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
    val blamed = late.as("l1")
      .join(pairs.as("p"),
        col("l1.l_orderkey") === col("p.l_orderkey") &&
          col("l1.l_suppkey") =!= col("p.l_suppkey"),
        "left_semi")
      .join(late.as("l2"),
        col("l1.l_orderkey") === col("l2.l_orderkey") &&
          col("l1.l_suppkey") =!= col("l2.l_suppkey"),
        "left_anti")
    blamed.groupBy(col("l_suppkey").as("s_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(Tables.supplier(s, dir).select("s_suppkey", "s_name")), "s_suppkey")
      .select("s_suppkey", "s_name", "numwait")
      .orderBy(col("numwait").desc, col("s_suppkey")).limit(20)
  }

  /** #6c correlated scalar aggregate (TPC-H Q17 shape): lineitems with
    * quantity under 20% of their part's average. The comparison runs as
    * exact integers — `qty·5·n < Σqty` instead of `qty < 0.2·avg` — so
    * no float-boundary row can flip between engines. */
  def q19ScalarSub(s: SparkSession, dir: String): DataFrame = {
    val partAgg = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey").as("pk"))
      .agg(sum("l_quantity").as("sumq"), count(lit(1)).as("nq"))
    Tables.lineitem(s, dir)
      .join(partAgg, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") * 5 * col("nq") < col("sumq"))
      .withColumn("cents", round(col("l_extendedprice") * 100, 0).cast("long"))
      .agg(count(lit(1)).as("n_small_lines"),
        round(sum("cents") / lit(100.0) / lit(7.0), 2).as("avg_yearly"))
  }

  /** #6e TPC-H Q14 shape — promo revenue share per ship month: a
    * fact⋈broadcast-dim join feeding one conditional aggregate. The
    * share ships as integer basis points (`promo·10000 div total`),
    * so the ratio is exact integer arithmetic on both engines instead
    * of a float division that could round differently at the edge. */
  def q22Promo(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .withColumn("cents",
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100, 0).cast("long"))
      .join(broadcast(Tables.part(s, dir).select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(date_trunc("month", col("l_shipdate")).cast("date").as("month"))
      .agg(
        sum(when(col("p_type") === "PROMO", col("cents")).otherwise(lit(0L))).as("pc"),
        sum("cents").as("tc"))
      .select(col("month"),
        round(col("pc") / lit(100.0), 2).as("promo_revenue"),
        round(col("tc") / lit(100.0), 2).as("total_revenue"),
        expr("pc * 10000 div tc").as("promo_bp"))
      .orderBy("month")

  /** #6f TPC-H Q19 shape — disjunctive multi-band join predicate:
    * three OR'd conjunctive blocks over (brand, size, quantity). The
    * planner must keep the equi-join key (`l_partkey = p_partkey`)
    * out of the disjunction so the join stays a broadcast hash join
    * with the OR-of-bands as a residual filter — not a nested-loop
    * over the cross space. */
  def q23Disjunct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir).select("p_partkey", "p_brand", "p_size")),
        col("l_partkey") === col("p_partkey") && (
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#15" && col("p_size").between(1, 35) &&
            col("l_quantity").between(20, 30))))
      .withColumn("cents",
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100, 0).cast("long"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_lines"),
        round(sum("cents") / lit(100.0), 2).as("revenue"))
      .orderBy("p_brand")

  /** #6g TPC-H Q22 shape — wealthy dormant customers: acctbal above
    * the positive-balance average AND no orders since 2000-01-01,
    * tallied per nation. The average test runs as exact integers
    * (`c_cents·n > sum_cents`) so no float boundary can flip a row,
    * and the dormancy arm is a left-anti join against the date-filtered
    * orders (never a fan-out + distinct — and the date filter pushes
    * into the orders scan before the anti-join shuffles anything).
    * The one-row positive-balance aggregate broadcasts. */
  def q24Dormant(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
      .withColumn("c_cents", round(col("c_acctbal") * 100, 0).cast("long"))
    val posAvg = cust.filter(col("c_cents") > 0)
      .agg(sum("c_cents").as("sum_cents"), count(lit(1)).as("n_pos"))
    val recent = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
    cust.crossJoin(broadcast(posAvg))
      .filter(col("c_cents") * col("n_pos") > col("sum_cents"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_custs"),
        round(sum("c_cents") / lit(100.0), 2).as("total_bal"))
      .orderBy("n_name")
  }

  /** #6i TPC-H Q12 shape adapted to this schema (no shipmode column):
    * shipping-delay SLA screen per order priority. One fact⋈fact join on
    * orderkey (both sides shuffle on the key once), then a 5-group
    * conditional aggregation: lines shipped more than 60 days after the
    * order date count as late, and the late share reports as exact
    * integer basis points (`div`, never a float ratio). */
  def q26Priority(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .withColumn("late",
        when(expr("l_shipdate > o_orderdate + INTERVAL 60 DAYS"), 1L)
          .otherwise(0L))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"), sum("late").as("n_late"))
      .withColumn("late_bp", expr("n_late * 10000 div n_lines"))
      .orderBy("o_orderpriority")

  /** #6j TPC-H Q18 shape — large-volume orders: orders whose total
    * quantity exceeds 250, joined back to the customer, global top 100.
    * The HAVING runs on the lineitem aggregate BEFORE any join, so only
    * the (rare) big orders reach the join; quantities are integer-valued
    * doubles so the sum is exact; the top-k is TakeOrderedAndProject
    * (per-partition heaps), never a global sort. */
  def q27BigOrders(s: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(s, dir)
      .groupBy("l_orderkey")
      .agg(sum("l_quantity").as("sum_qty"))
      .filter(col("sum_qty") > 250)
    big.join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(col("sum_qty").desc, col("o_orderkey"))
      .limit(100)
  }

  /** #6k TPC-H Q9 shape — product-line profit by supplier nation and
    * order year: parts filtered by name prefix, lineitem joined to
    * part + supplier + nation + orders, profit rolled up per
    * (nation, year). This schema has no partsupp, so unit cost is
    * proxied at 80% of part retail price. All money stays integer:
    * extended-price cents × (100 − discount pct) minus retail cents ×
    * qty × 80, summed in cent·pct units; only the display divides.
    * The name filter prunes parts BEFORE the join; part, supplier and
    * nation are broadcast (dimension-sized at any SF), so the only
    * shuffle is the lineitem→orders join + final 175-group agg. */
  def q28Profit(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir).filter(col("p_name").like("red%"))
      .select(col("p_partkey"),
        round(col("p_retailprice") * 100, 0).cast("long").as("retail_cents"))
    val sn = Tables.supplier(s, dir)
      .join(Tables.nation(s, dir), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    Tables.lineitem(s, dir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .withColumn("profit_units",
        round(col("l_extendedprice") * 100, 0).cast("long")
          * (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))
          - col("retail_cents") * col("l_quantity").cast("long") * 80L)
      .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(count(lit(1)).as("n_lines"),
        round(sum("profit_units") / 10000.0, 2).as("profit"))
      .orderBy(col("n_name"), col("o_year").desc)
  }

  /** #6l TPC-H Q7 shape — trade volume between two nations: revenue
    * shipped where the customer sits in one pinned nation and the
    * supplier in the other, both directions, by year. Revenue is the
    * exact cent·pct integer unit (price cents × (100 − discount pct));
    * the two nation filters prune the dimension BEFORE the broadcast
    * joins, so the fact scan only widens by two ints. */
  def q29Trade(s: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(s, dir)
      .filter(col("n_name").isin("NATION_1", "NATION_3"))
    val cn = Tables.customer(s, dir)
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val sn = Tables.supplier(s, dir)
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cn), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .filter(col("cust_nation") =!= col("supp_nation"))
      .withColumn("units",
        round(col("l_extendedprice") * 100, 0).cast("long")
          * (lit(100L) - round(col("l_discount") * 100, 0).cast("long")))
      .groupBy(col("cust_nation"), col("supp_nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(count(lit(1)).as("n_lines"),
        round(sum("units") / 10000.0, 2).as("revenue"))
      .orderBy("cust_nation", "supp_nation", "o_year")
  }

  /** #6m TPC-H Q16 shape — supplier-count profile: for each
    * (brand, type, size) slice outside an excluded brand, how many
    * DISTINCT suppliers ship it, with "complaint" suppliers (negative
    * account balance, the schema's stand-in) removed by an anti-join
    * BEFORE the distinct count. The exclusion list is dimension-sized
    * and broadcast; the distinct-count shuffle keys on the part
    * attributes. */
  def q30SupplierCnt(s: SparkSession, dir: String): DataFrame = {
    val excl = Tables.supplier(s, dir).filter(col("s_acctbal") < 0)
      .select(col("s_suppkey").as("l_suppkey"))
    val p = Tables.part(s, dir)
      .filter(col("p_brand") =!= "Brand#2" && col("p_size").isin(5, 11, 28))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    Tables.lineitem(s, dir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(excl), Seq("l_suppkey"), "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct("l_suppkey").as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** #6n TPC-H Q17 shape — small-quantity order revenue: lineitems of
    * economy-type parts whose quantity is below 20% of that part's
    * average, summed and annualized. The 20%-of-average compare is the
    * EXACT integer cross-product 5·q·n_part < sum_qty_part (no
    * division, no float); the per-part averages are a broadcast
    * aggregate (catalog-sized), so the fact table is scanned once and
    * never shuffled. */
  def q31SmallQty(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir).filter(col("p_type") === "ECONOMY")
      .select("p_partkey")
    val li = Tables.lineitem(s, dir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .withColumn("q", col("l_quantity").cast("long"))
      .withColumn("cents", round(col("l_extendedprice") * 100, 0).cast("long"))
    val perPart = li.groupBy("p_partkey")
      .agg(count(lit(1)).as("n_part"), sum("q").as("sum_qty"))
    li.join(broadcast(perPart), "p_partkey")
      .filter(col("q") * 5 * col("n_part") < col("sum_qty"))
      .agg(count(lit(1)).as("n_lines"), sum("cents").as("cents"))
      .select(col("n_lines"),
        round(col("cents") / 100.0, 2).as("revenue"),
        round(col("cents") / 100.0 / 7.0, 2).as("avg_yearly"))
  }

  /** #7 time-bucketed event aggregation: daily activity by event type. */
  def q7EventsWindow(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 6).as("sum_value"))
      .orderBy("day", "event_type")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg"           -> (q1Agg _),
    "q2_join"          -> (q2Join _),
    "q3_topk"          -> (q3TopK _),
    "q4_window"        -> (q4Window _),
    "q5_semijoin"      -> (q5SemiJoin _),
    "q6_filter"        -> (q6Filter _),
    "q7_events_window" -> (q7EventsWindow _),
    "q8_asof_join"     -> (q8AsofJoin _),
    "q8b_asof_forward" -> (q8AsofForward _),
    "q8c_asof_nearest" -> (q8cAsofNearest _),
    "q9_range_join"    -> (q9RangeJoin _),
    "q10_funnel"       -> (q10Funnel _),
    "q11_retention"    -> (q11Retention _),
    "q12_rollup"       -> (q12Rollup _),
    "q12b_cube"        -> (q12bCube _),
    "q13_pivot"        -> (q13Pivot _),
    "q14_sql"          -> (q14Sql _),
    "q15_fullouter"    -> (q15FullOuter _),
    "q16_setops"       -> (q16SetOps _),
    "topk_per_group"   -> (topkPerGroup _),
    "q17_star"         -> (q17Star _),
    "q18_exists"       -> (q18Exists _),
    "q20_waiting"      -> (q20Waiting _),
    "q19_scalar_sub"   -> (q19ScalarSub _),
    "q21_volume"       -> (q21Volume _),
    "q22_promo"        -> (q22Promo _),
    "q23_disjunct"     -> (q23Disjunct _),
    "q24_dormant"      -> (q24Dormant _),
    "q26_priority"     -> (q26Priority _),
    "q27_bigorders"    -> (q27BigOrders _),
    "q28_profit"       -> (q28Profit _),
    "q29_trade"        -> (q29Trade _),
    "q30_supplier_cnt" -> (q30SupplierCnt _),
    "q31_smallqty"     -> (q31SmallQty _),
  )

  val oracles: Map[String, String] = Map(
    "q22_promo" ->
      """SELECT date_trunc('month', l_shipdate)::DATE AS month,
        |  round(sum(CASE WHEN p_type = 'PROMO'
        |    THEN round(l_extendedprice * (1.0 - l_discount) * 100, 0)::BIGINT
        |    ELSE 0 END) / 100.0, 2) AS promo_revenue,
        |  round(sum(round(l_extendedprice * (1.0 - l_discount) * 100, 0)::BIGINT)
        |    / 100.0, 2) AS total_revenue,
        |  (sum(CASE WHEN p_type = 'PROMO'
        |    THEN round(l_extendedprice * (1.0 - l_discount) * 100, 0)::BIGINT
        |    ELSE 0 END) * 10000
        |    // sum(round(l_extendedprice * (1.0 - l_discount) * 100, 0)::BIGINT)
        |    )::BIGINT AS promo_bp
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q23_disjunct" ->
      """SELECT p_brand, count(*) AS n_lines,
        |  round(sum(round(l_extendedprice * (1.0 - l_discount) * 100, 0)::BIGINT)
        |    / 100.0, 2) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        |        AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
        |        AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 35
        |        AND l_quantity BETWEEN 20 AND 30)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    // Late = exact integer-microsecond comparison; share = integer
    // basis points (div), so nothing float-ordered enters the hash.
    // The 20%-of-average gate is the exact integer cross-product
    // 5*q*n < sum_qty; revenue is exact cents.
    "q31_smallqty" ->
      """WITH li AS (
        |  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS q,
        |    round(l_extendedprice * 100, 0)::BIGINT AS cents
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE p_type = 'ECONOMY'
        |), pp AS (
        |  SELECT l_partkey, count(*)::BIGINT AS n_part, sum(q)::BIGINT AS sum_qty
        |  FROM li GROUP BY 1
        |), f AS (
        |  SELECT li.cents FROM li JOIN pp USING (l_partkey)
        |  WHERE li.q * 5 * n_part < sum_qty
        |)
        |SELECT count(*)::BIGINT AS n_lines,
        |  round(sum(cents) / 100.0, 2) AS revenue,
        |  round(sum(cents) / 100.0 / 7.0, 2) AS avg_yearly
        |FROM f""".stripMargin,
    // Complaint suppliers anti-joined out before the distinct count.
    "q30_supplier_cnt" ->
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#2' AND p_size IN (5, 11, 28)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    // Exact cent·pct revenue units; both directions between the two
    // pinned nations, grouped by year.
    "q29_trade" ->
      """SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
        |  year(o_orderdate)::BIGINT AS o_year, count(*)::BIGINT AS n_lines,
        |  round(sum(round(l_extendedprice * 100, 0)::BIGINT
        |    * (100 - round(l_discount * 100, 0)::BIGINT)) / 10000.0, 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |  AND cn.n_name IN ('NATION_1', 'NATION_3')
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |  AND sn.n_name IN ('NATION_1', 'NATION_3')
        |WHERE cn.n_name <> sn.n_name
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // Exact cent·pct profit units summed as integers; only the final
    // display division touches doubles.
    "q28_profit" ->
      """SELECT n_name, year(o_orderdate)::BIGINT AS o_year,
        |  count(*)::BIGINT AS n_lines,
        |  round(sum(round(l_extendedprice * 100, 0)::BIGINT
        |      * (100 - round(l_discount * 100, 0)::BIGINT)
        |      - round(p_retailprice * 100, 0)::BIGINT
        |      * CAST(l_quantity AS BIGINT) * 80) / 10000.0, 2) AS profit
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey AND p_name LIKE 'red%'
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation ON n_nationkey = s_nationkey
        |JOIN orders ON o_orderkey = l_orderkey
        |GROUP BY 1, 2 ORDER BY n_name, o_year DESC""".stripMargin,
    "q26_priority" ->
      """SELECT o_orderpriority, count(*)::BIGINT AS n_lines,
        |  sum(CASE WHEN epoch_us(l_shipdate) - epoch_us(o_orderdate)
        |      > 60 * 86400000000 THEN 1 ELSE 0 END)::BIGINT AS n_late,
        |  sum(CASE WHEN epoch_us(l_shipdate) - epoch_us(o_orderdate)
        |      > 60 * 86400000000 THEN 1 ELSE 0 END)::BIGINT
        |    * 10000 // count(*)::BIGINT AS late_bp
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // Quantities are integer-valued doubles, so sum_qty is exact and the
    // (sum_qty DESC, orderkey) top-100 cut is deterministic.
    "q27_bigorders" ->
      """WITH big AS (
        |  SELECT l_orderkey, sum(l_quantity) AS sum_qty
        |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 250
        |)
        |SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
        |FROM big JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY sum_qty DESC, o_orderkey LIMIT 100""".stripMargin,
    "q24_dormant" ->
      """WITH c AS (
        |  SELECT *, round(c_acctbal * 100, 0)::BIGINT AS c_cents FROM customer
        |), pos AS (
        |  SELECT sum(c_cents) AS sum_cents, count(*) AS n_pos
        |  FROM c WHERE c_cents > 0
        |)
        |SELECT n_name, count(*) AS n_custs,
        |  round(sum(c_cents) / 100.0, 2) AS total_bal
        |FROM c CROSS JOIN pos
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_cents * n_pos > sum_cents
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q21_volume" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year, count(*) AS n_items,
        |  round(sum(round(l_extendedprice * (1.0 - l_discount) * 100, 0)::BIGINT)
        |    / 100.0, 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON sn.n_nationkey = s_nationkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON cn.n_nationkey = c_nationkey
        |WHERE sn.n_name <> cn.n_name
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q17_star" ->
      """SELECT n_name, count(*) AS n_items,
        |  round(sum(round(l_extendedprice * (1.0 - l_discount) * 100, 0)::BIGINT)
        |    / 100.0, 2) AS revenue
        |FROM region
        |JOIN nation ON n_regionkey = r_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |WHERE r_regionkey = 0
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    // The doubly-correlated form runs natively in DuckDB; the engine's
    // semi/anti-join rewrite must agree row-for-row.
    "q20_waiting" ->
      """WITH late AS (
        |  SELECT DISTINCT l_orderkey, l_suppkey
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        |), pairs AS (
        |  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
        |), blamed AS (
        |  SELECT l1.l_orderkey, l1.l_suppkey
        |  FROM late l1
        |  WHERE EXISTS (
        |    SELECT 1 FROM pairs p
        |    WHERE p.l_orderkey = l1.l_orderkey AND p.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM late l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |)
        |SELECT b.l_suppkey AS s_suppkey, s.s_name, count(*)::BIGINT AS numwait
        |FROM blamed b JOIN supplier s ON s.s_suppkey = b.l_suppkey
        |GROUP BY 1, 2
        |ORDER BY numwait DESC, s_suppkey LIMIT 20""".stripMargin,
    "q18_exists" ->
      """SELECT o_orderpriority, count(*) AS n_late_orders
        |FROM orders o
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey
        |    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,
    "q19_scalar_sub" ->
      """WITH pa AS (
        |  SELECT l_partkey AS pk, sum(l_quantity) AS sumq, count(*) AS nq
        |  FROM lineitem GROUP BY 1
        |)
        |SELECT count(*) AS n_small_lines,
        |  round(sum(round(l_extendedprice * 100, 0)::BIGINT) / 100.0 / 7.0, 2)
        |    AS avg_yearly
        |FROM lineitem JOIN pa ON l_partkey = pk
        |WHERE l_quantity * 5 * nq < sumq""".stripMargin,
    "topk_per_group" ->
      """WITH o AS (
        |  SELECT o_orderpriority, o_orderkey,
        |    round(o_totalprice * 100, 0)::BIGINT AS cents,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY round(o_totalprice * 100, 0)::BIGINT DESC, o_orderkey) AS rn
        |  FROM orders
        |)
        |SELECT o_orderpriority, o_orderkey, round(cents / 100.0, 2) AS price
        |FROM o WHERE rn <= 3
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | sum(l_quantity) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        | round(avg(l_quantity), 6) AS avg_qty,
        | round(avg(l_discount), 6) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_join" ->
      """SELECT n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,
    "q3_topk" ->
      """SELECT l_orderkey, o_orderdate, revenue FROM (
        | SELECT l_orderkey, o_orderdate,
        |   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | GROUP BY l_orderkey, o_orderdate
        |) ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q4_window" ->
      """SELECT o_custkey, rn, o_orderkey, running_spend FROM (
        | SELECT o_custkey, o_orderkey,
        |   row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn,
        |   round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
        | FROM orders
        |) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q5_semijoin" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,
    "q6_filter" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 10
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice""".stripMargin,
    "q7_events_window" ->
      """SELECT cast(ts AS DATE) AS day, event_type,
        | count(*) AS n_events, round(sum(value), 6) AS sum_value
        |FROM events
        |GROUP BY day, event_type
        |ORDER BY day, event_type""".stripMargin,
    // Independent algorithm on the oracle side: DuckDB's native ASOF JOIN
    // (vs graft's union-window plan), tolerance emulated with a CASE.
    "q8_asof_join" ->
      """WITH p AS (
        |  SELECT user_id, ts, p_event_id, p_value FROM (
        |    SELECT user_id, ts, event_id AS p_event_id, value AS p_value,
        |      row_number() OVER (PARTITION BY user_id, ts
        |                         ORDER BY value DESC, event_id DESC) AS rn
        |    FROM events WHERE event_type = 'purchase') WHERE rn = 1
        |)
        |SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
        |  CASE WHEN epoch_us(e.ts) - epoch_us(p.ts) <= 86400000000
        |       THEN p.p_event_id END AS p_event_id,
        |  CASE WHEN epoch_us(e.ts) - epoch_us(p.ts) <= 86400000000
        |       THEN round(p.p_value, 6) END AS p_value
        |FROM events e ASOF LEFT JOIN p
        |  ON e.user_id = p.user_id AND e.ts >= p.ts
        |ORDER BY e.event_id""".stripMargin,
    // Forward direction via DuckDB's (backward-only) ASOF on NEGATED
    // epoch keys: max(-p.ts) <= -e.ts picks the earliest p.ts >= e.ts.
    "q8b_asof_forward" ->
      """WITH p AS (
        |  SELECT user_id, ts, p_event_id, p_value, -epoch_us(ts) AS nts FROM (
        |    SELECT user_id, ts, event_id AS p_event_id, value AS p_value,
        |      row_number() OVER (PARTITION BY user_id, ts
        |                         ORDER BY value DESC, event_id DESC) AS rn
        |    FROM events WHERE event_type = 'purchase') WHERE rn = 1
        |), e AS (SELECT *, -epoch_us(ts) AS nts FROM events)
        |SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
        |  CASE WHEN epoch_us(p.ts) - epoch_us(e.ts) <= 86400000000
        |       THEN p.p_event_id END AS p_event_id,
        |  CASE WHEN epoch_us(p.ts) - epoch_us(e.ts) <= 86400000000
        |       THEN round(p.p_value, 6) END AS p_value
        |FROM e ASOF LEFT JOIN p
        |  ON e.user_id = p.user_id AND e.nts >= p.nts
        |ORDER BY e.event_id""".stripMargin,
    // Nearest = backward ASOF + forward ASOF (negated-key trick), then
    // pick the closer hit within tolerance; backward wins exact ties.
    "q8c_asof_nearest" ->
      """WITH p AS (
        |  SELECT user_id, ts, p_event_id, p_value FROM (
        |    SELECT user_id, ts, event_id AS p_event_id, value AS p_value,
        |      row_number() OVER (PARTITION BY user_id, ts
        |                         ORDER BY value DESC, event_id DESC) AS rn
        |    FROM events WHERE event_type = 'purchase') WHERE rn = 1
        |), pn AS (
        |  SELECT user_id, ts, p_event_id, p_value, -epoch_us(ts) AS nts FROM p
        |), en AS (
        |  SELECT event_id, user_id, ts, -epoch_us(ts) AS nts FROM events
        |), b AS (
        |  SELECT e.event_id, p.p_event_id AS b_id, p.p_value AS b_val,
        |    epoch_us(e.ts) - epoch_us(p.ts) AS b_d
        |  FROM events e ASOF LEFT JOIN p
        |    ON e.user_id = p.user_id AND e.ts >= p.ts
        |), f AS (
        |  SELECT e.event_id, pn.p_event_id AS f_id, pn.p_value AS f_val,
        |    epoch_us(pn.ts) - epoch_us(e.ts) AS f_d
        |  FROM en e ASOF LEFT JOIN pn
        |    ON e.user_id = pn.user_id AND e.nts >= pn.nts
        |)
        |SELECT ev.event_id, ev.user_id, epoch_us(ev.ts) AS ts_us,
        |  CASE WHEN b_id IS NOT NULL AND b_d <= 43200000000
        |        AND (f_id IS NULL OR f_d > 43200000000 OR b_d <= f_d)
        |       THEN b_id
        |       WHEN f_id IS NOT NULL AND f_d <= 43200000000 THEN f_id
        |  END AS p_event_id,
        |  CASE WHEN b_id IS NOT NULL AND b_d <= 43200000000
        |        AND (f_id IS NULL OR f_d > 43200000000 OR b_d <= f_d)
        |       THEN round(b_val, 6)
        |       WHEN f_id IS NOT NULL AND f_d <= 43200000000 THEN round(f_val, 6)
        |  END AS p_value
        |FROM events ev
        |JOIN b ON ev.event_id = b.event_id
        |JOIN f ON ev.event_id = f.event_id
        |ORDER BY ev.event_id""".stripMargin,
    "q9_range_join" ->
      """SELECT p.event_id AS p_event_id, count(*) AS n_clicks,
        |  round(sum(c.value), 6) AS sum_value
        |FROM events p JOIN events c
        |  ON c.user_id = p.user_id
        | AND p.event_type = 'purchase' AND c.event_type = 'click'
        | AND c.ts >= p.ts AND c.ts < p.ts + INTERVAL 24 HOUR
        |GROUP BY p.event_id
        |ORDER BY p.event_id""".stripMargin,
    "q14_sql" ->
      """SELECT label, count(*) AS n_vecs,
        |  round(avg(sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 6)
        |    AS avg_norm
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,
    "q15_fullouter" ->
      """WITH o AS (
        |  SELECT o_custkey AS cust, count(*) AS n_orders FROM orders GROUP BY 1
        |), e AS (
        |  SELECT user_id AS cust, count(*) AS n_events FROM events GROUP BY 1
        |)
        |SELECT coalesce(o.cust, e.cust) AS cust,
        |  coalesce(n_orders, 0) AS n_orders, coalesce(n_events, 0) AS n_events
        |FROM o FULL OUTER JOIN e ON o.cust = e.cust
        |ORDER BY cust""".stripMargin,
    "q16_setops" ->
      """WITH f AS (
        |  SELECT DISTINCT o_custkey AS cust FROM orders WHERE o_orderstatus = 'F'
        |), a AS (SELECT DISTINCT user_id AS cust FROM events)
        |SELECT cust, 'intersect' AS set_op FROM (SELECT cust FROM f INTERSECT SELECT cust FROM a)
        |UNION ALL
        |SELECT cust, 'except' AS set_op FROM (SELECT cust FROM f EXCEPT SELECT cust FROM a)
        |ORDER BY set_op, cust""".stripMargin,
    "q10_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id
        |), s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'view' AND e.ts >= s1.t1 GROUP BY e.user_id
        |), s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts >= s2.t2 GROUP BY e.user_id
        |)
        |SELECT count(t1) AS n_signup, count(t2) AS n_viewed,
        |  count(t3) AS n_purchased
        |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)""".stripMargin,
    "q12_rollup" ->
      """SELECT GROUPING(l_returnflag, l_linestatus) AS gid,
        |  coalesce(l_returnflag, 'ALL') AS l_returnflag,
        |  coalesce(l_linestatus, 'ALL') AS l_linestatus,
        |  sum(l_quantity) AS sum_qty, count(*) AS n_rows
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,
    "q12b_cube" ->
      """SELECT GROUPING(l_returnflag, l_linestatus) AS gid,
        |  coalesce(l_returnflag, 'ALL') AS l_returnflag,
        |  coalesce(l_linestatus, 'ALL') AS l_linestatus,
        |  sum(l_quantity) AS sum_qty, count(*) AS n_rows
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,
    "q13_pivot" ->
      """SELECT c_nationkey,
        |  count(*) FILTER (event_type = 'click')    AS click,
        |  count(*) FILTER (event_type = 'error')    AS error,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'signup')   AS signup,
        |  count(*) FILTER (event_type = 'view')     AS view
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q11_retention" ->
      """WITH weekly AS (
        |  SELECT DISTINCT user_id,
        |    epoch(date_trunc('week', ts))::BIGINT AS w
        |  FROM events
        |), cohort AS (
        |  SELECT user_id, min(w) AS cw FROM weekly GROUP BY user_id
        |)
        |SELECT cw AS cohort_week, ((w - cw) / 604800)::BIGINT AS week_offset,
        |  count(*) AS n_users
        |FROM weekly JOIN cohort USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin,
  )
}
