package graft.queries

import org.apache.spark.sql.functions._

/** Round-14 golden-value tranche 28 — same method as [[EdgeBranchSpec]]
  * (constants derived independently by `tools/golden_stats.py`
  * tranche28): the deterministic sampling family (hash slice,
  * stratified/temperature quotas, domain cap, class rebalance, CV
  * folds, shuffle), md5 fingerprints/checksums, and token-budget
  * packing. Every constant here is an independent hashlib/arithmetic
  * replication of the engine's md5 or multiplicative-hash draw. */
class EdgeBranchSpec6 extends GoldenFixtures {

  test("text_fingerprint pins the whitespace-collapsing normalization") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, "  Hello   World "), (2L, "a\tb\nc")).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // golden_stats.py tranche28: md5('hello world'), md5('a b c') —
    // tabs and newlines collapse to single spaces before hashing.
    val out = OpsQueries.textFingerprint(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("fp_md5")).toMap
    assert(out(1L) == "5eb63bbbe01eeed093cb22bb8f5acdc3")
    assert(out(2L) == "06f0760ec7f18687a7fbc0ddbf1b1722")
  }

  test("table_checksum pins the xor-of-row-md5 group fingerprint") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, "x a", "en", "web", 10L), (2L, "y", "en", "wiki", 20L),
      (3L, "z", "de", "web", 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // golden_stats.py tranche28 checksum: 60-bit md5 of the
    // pipe-joined row, xor-folded per lang (order-invariant).
    val out = OpsQueries.tableChecksum(spark, dir).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("checksum"))).toMap
    assert(out("de") == ((1L, 1008385495088036780L)))
    assert(out("en") == ((2L, 1135713425592951393L)))
  }

  test("cv_folds pins the md5 fold assignment") {
    val dir = tmp()
    writeEvents(dir, (1L to 10L).map(u => (u, u * Hour, u, "t", 1.0)))
    // golden_stats.py tranche28 cv: md5(user) % 5 puts {7,9} in 0,
    // {2,6,8} in 1, {10} in 2, {1,3} in 3, {4,5} in 4.
    val out = OpsQueries.cvFolds(spark, dir).collect()
      .map(r => r.getAs[Long]("fold") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_users"))).toMap
    assert(out == Map(0L -> (2L, 2L), 1L -> (3L, 3L), 2L -> (1L, 1L),
      3L -> (2L, 2L), 4L -> (2L, 2L)))
  }

  test("domain_cap pins the md5-elected survivors at the cap") {
    import spark.implicits._
    val dir = tmp()
    ((1L to 35L).map(i => (i, "A")) ++ (36L to 40L).map(i => (i, "B")))
      .toDF("doc_id", "source")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // golden_stats.py tranche28 domain_cap: source A keeps 30 of 35 by
    // (md5(id), id) order — exactly {3,5,8,10,34} drop; B keeps all 5.
    val kept = OpsQueries.domainCap(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id")))
    val aKept = kept.filter(_._1 == "A").map(_._2).toSet
    assert(aKept.size == 30)
    assert(Set(3L, 5L, 8L, 10L, 34L).forall(!aKept.contains(_)))
    assert(kept.count(_._1 == "B") == 5)
  }

  test("class_rebalance pins the hash-ranked downsample to the minority") {
    val dir = tmp()
    writeEvents(dir,
      (1L to 5L).map(i => (i, i * Hour, i, "a", 1.0)) ++
        Seq((6L, Hour, 6L, "b", 1.0), (7L, 2 * Hour, 7L, "b", 1.0)))
    // golden_stats.py tranche28 rebalance: target = 2 (minority b);
    // the hash order keeps a-ids {3, 5}.
    val out = OpsQueries.classRebalance(spark, dir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("event_id")))
    assert(out.filter(_._1 == "a").map(_._2).toSet == Set(3L, 5L))
    assert(out.filter(_._1 == "b").map(_._2).toSet == Set(6L, 7L))
  }

  test("corpus_shuffle pins the mod-first permutation") {
    import spark.implicits._
    val dir = tmp()
    Seq(1000002L, 999999L, 3L, 1000001L, 500000L).map((_, "w"))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // Ids straddle the 1e6 modulus, so the mod-FIRST multiplicative
    // hash actually permutes: 1000001, 1000002, 3, 500000, 999999.
    val out = OpsQueries.corpusShuffle(spark, dir).collect()
      .map(r => (r.getAs[Long]("position"), r.getAs[Long]("doc_id")))
    assert(out.toSeq == Seq((1L, 1000001L), (2L, 1000002L), (3L, 3L),
      (4L, 500000L), (5L, 999999L)))
  }

  test("sample_hash pins the [0, 0.25) bucket slice") {
    val dir = tmp()
    writeEvents(dir, (1L to 20L).map(i => (i, i * Hour, i, "t", 1.0)))
    // golden_stats.py tranche28 sample_hash: buckets of ids 5,7,12,14
    // fall under 250000.
    val kept = OpsQueries.sampleHash(spark, dir).collect()
      .map(_.getAs[Long]("event_id")).toSet
    assert(kept == Set(5L, 7L, 12L, 14L))
  }

  test("sample_stratified pins the per-stratum hash quota") {
    import spark.implicits._
    val dir = tmp()
    (1L to 12L).map((_, 1)).toDF("c_custkey", "c_nationkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // golden_stats.py tranche28 stratified: quota 10 of 12 — custs
    // {2, 9} lose the hash election.
    val kept = OpsQueries.sampleStratified(spark, dir).collect()
      .map(_.getAs[Long]("c_custkey")).toSet
    assert(kept == (1L to 12L).toSet -- Set(2L, 9L))
  }

  test("sample_temperature pins the sqrt quotas and overfull stratum") {
    import spark.implicits._
    val dir = tmp()
    ((1L to 200L).map((_, 1)) ++ (201L to 300L).map((_, 2)))
      .toDF("c_custkey", "c_nationkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // golden_stats.py tranche28 temperature: w = floor(sqrt(cnt)) =
    // 14/10, quotas 175/125 of 300 (zero remainders). Nation 2's
    // quota EXCEEDS its 100 rows -> all kept; nation 1's 175
    // survivors sum to 17545 under the hash order.
    val rows = OpsQueries.sampleTemperature(spark, dir).collect()
      .map(r => (r.getAs[Int]("c_nationkey"), r.getAs[Long]("c_custkey")))
    val n1 = rows.filter(_._1 == 1).map(_._2)
    val n2 = rows.filter(_._1 == 2).map(_._2)
    assert(n1.length == 175 && n1.sum == 17545L)
    assert(n2.length == 100 && n2.sum == 25050L)
  }

  // ------------------------- intervals / windows / sweeps (t29)

  test("interval_coalesce pins the touching-merges island convention") {
    val dir = tmp()
    // e_us = s_us + round(value*100)*6e6: value 1.0 -> 10 min.
    writeEvents(dir, Seq(
      (1L, 0L, 1L, "t", 1.0),            // [0, 600 s]
      (2L, 300000000L, 1L, "t", 1.0),    // [300, 900] overlaps
      (3L, 900000000L, 1L, "t", 0.5),    // [900, 1200] TOUCHES -> merges
      (4L, 2000000000L, 1L, "t", 0.1),   // [2000, 2060] new island
      (5L, 0L, 2L, "t", 0.1)))
    val out = OpsQueries.intervalCoalesce(spark, dir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("island_start")) ->
        (r.getAs[Long]("island_end"), r.getAs[Long]("n_merged"))).toMap
    assert(out == Map(
      (1L, 0L) -> (1200000000L, 3L),
      (1L, 2000000000L) -> (2060000000L, 1L),
      (2L, 0L) -> (60000000L, 1L)))
  }

  test("interval_intersect pins the half-open midnight split") {
    val dir = tmp()
    // One session spanning midnight: 23:50 day 0 -> 00:10 day 1
    // (20 min gap < 30 min).
    writeEvents(dir, Seq(
      (1L, 85800000000L, 1L, "t", 1.0),
      (2L, 87000000000L, 1L, "t", 1.0)))
    // Day 0 gets [23:50, 24:00) = 600 s; day 1 gets [24:00, 00:10+1us)
    // — the +1 closing the half-open session end.
    val out = StreamMmQueries.intervalIntersect(spark, dir).collect()
      .map(r => r.getAs[Long]("day_us") ->
        (r.getAs[Long]("o_start"), r.getAs[Long]("o_end"),
          r.getAs[Long]("dur_us"))).toMap
    assert(out == Map(
      0L -> (85800000000L, 86400000000L, 600000000L),
      86400000000L -> (86400000000L, 87000000001L, 600000001L)))
  }

  test("events_moving_avg pins the inclusive trailing-hour range bound") {
    val dir = tmp()
    writeEvents(dir, Seq(
      (1L, 0L, 1L, "t", 2.0), (2L, 1800000000L, 2L, "t", 4.0),
      (3L, 3600000000L, 3L, "t", 6.0), (4L, 7201000000L, 4L, "t", 8.0)))
    // Event 3's window reaches back EXACTLY 1 h and must include
    // event 1 (range frames are inclusive); event 4 stands alone.
    val out = OpsQueries.eventsMovingAvg(spark, dir).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("n_1h"), r.getAs[Double]("avg_1h"))).toMap
    assert(out == Map(1L -> (1L, 2.0), 2L -> (2L, 3.0),
      3L -> (3L, 4.0), 4L -> (1L, 8.0)))
  }

  test("events_gapfill pins the zero-fill and forward-fill semantics") {
    val dir = tmp()
    writeEvents(dir, Seq(
      (1L, 1000L, 1L, "a", 4.0), (2L, 2000L, 2L, "a", 6.0),
      (3L, 2 * Hour, 3L, "a", 7.0), (4L, Hour, 4L, "b", 3.0)))
    // Type a skips hour 1 (zero-filled, value carried forward from
    // hour 0's mean 5.0); type b has no value before hour 1 -> null.
    val out = OpsQueries.eventsGapfill(spark, dir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("hour_us")) ->
        (r.getAs[Long]("n_events"),
          Option(r.getAs[java.lang.Double]("value_ffill")).map(_.toDouble)))
      .toMap
    assert(out == Map(
      ("a", 0L) -> (2L, Some(5.0)),
      ("a", Hour) -> (0L, Some(5.0)),
      ("a", 2 * Hour) -> (1L, Some(7.0)),
      ("b", 0L) -> (0L, None),
      ("b", Hour) -> (1L, Some(3.0)),
      ("b", 2 * Hour) -> (0L, Some(3.0))))
  }

  test("events_streaks pins the gaps-and-islands grouping") {
    val dir = tmp()
    countEvents(dir, 100L, Map("t" -> Seq(5, 5, 1, 5, 1, 1)))
    // Above-mean hours (n > 3): 0,1 consecutive and 3 alone.
    val r = one(OpsQueries.eventsStreaks(spark, dir))
    assert(r.getAs[Long]("longest_streak") == 2L)
    assert(r.getAs[Long]("n_streaks") == 2L)
  }

  test("events_debounce flags the exact-gap boundary") {
    val dir = tmp()
    writeEvents(dir, Seq(
      (1L, 0L, 1L, "t", 1.0),
      (2L, 1800000000L, 1L, "t", 1.0),   // 30 min -> flagged
      (3L, 7200000000L, 1L, "t", 1.0),   // 90 min -> kept
      (4L, 10800000000L, 1L, "t", 1.0))) // EXACTLY 1 h -> flagged
    // kept requires gap STRICTLY greater than the threshold.
    val out = OpsQueries.eventsDebounce(spark, dir).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("gap_us")).toMap
    assert(out == Map(2L -> 1800000000L, 4L -> 3600000000L))
  }

  test("events_heatmap pins the epoch dow anchor (day 0 = Thursday)") {
    val dir = tmp()
    writeEvents(dir, Seq(
      (1L, 1000L, 1L, "t", 1.0), (2L, 2000L, 2L, "t", 1.0),
      (3L, Day + 3 * Hour, 3L, "t", 1.0)))
    val out = OpsQueries.eventsHeatmap(spark, dir).collect()
      .map(r => (r.getAs[Long]("dow"), r.getAs[Long]("hod")) ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("share"))).toMap
    assert(out == Map((4L, 0L) -> (2L, 0.666667), (5L, 3L) -> (1L, 0.333333)))
  }

  test("events_percentile_series pins the interpolated band values") {
    val dir = tmp()
    writeEvents(dir, (1 to 5).map(i =>
      (i.toLong, i * 1000L, i.toLong, "t", i.toDouble)))
    val r = one(OpsQueries.eventsPercentileSeries(spark, dir))
    assert(r.getAs[Long]("n") == 5L)
    assert(r.getAs[Double]("p10") == 1.4)
    assert(r.getAs[Double]("p50") == 3.0)
    assert(r.getAs[Double]("p90") == 4.6)
  }

  test("skyline_parts pins the STRICT prefix-min dominance sweep") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, 1.0, 5), (2L, 2.0, 3), (3L, 2.0, 7), (4L, 3.0, 3),
      (5L, 4.0, 2), (6L, 4.0, 2))
      .toDF("p_partkey", "p_retailprice", "p_size")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/part.parquet")
    // (3.0, 3) TIES the cheaper (2.0, 3) on size -> dominated (strict
    // <); the duplicate (4.0, 2) pair collapses with n_dup 2.
    val rows = StatQueries.skylineParts(spark, dir).collect()
      .map(r => (r.getAs[Double]("price"), r.getAs[Int]("p_size"),
        r.getAs[Long]("p_partkey"), r.getAs[Long]("n_dup")))
    assert(rows.toSeq == Seq(
      (1.0, 5, 1L, 1L), (2.0, 3, 2L, 1L), (4.0, 2, 5L, 2L)))
  }

  test("backlog_aging pins the point-in-time membership per snapshot") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, "1970-01-01"), (2L, "1970-04-11")).toDF("o_orderkey", "d")
      .select(col("o_orderkey"), to_timestamp(col("d")).as("o_orderdate"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, "1970-07-20", 10.0), (2L, "1970-05-31", 20.0))
      .toDF("l_orderkey", "d", "l_extendedprice")
      .select(col("l_orderkey"), to_timestamp(col("d")).as("l_shipdate"),
        col("l_extendedprice"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // Snapshots at days 50/100/150 of the 200-day span: o2 is open
    // only at T2 (ordered day 100, shipped day 150 — T3 = ship day is
    // EXCLUDED by T < shipdate); o1 ages across buckets.
    val out = StatQueries.backlogAging(spark, dir).collect()
      .map(r => (r.getAs[Long]("snap"), r.getAs[String]("bucket")) ->
        (r.getAs[Long]("n_open_lines"), r.getAs[Double]("open_value"))).toMap
    assert(out == Map(
      (1L, "1_30_to_90d") -> (1L, 10.0),
      (2L, "0_under_30d") -> (1L, 20.0),
      (2L, "2_over_90d") -> (1L, 10.0),
      (3L, "2_over_90d") -> (1L, 10.0)))
  }

  // ------------------------------- planner / layout audits (t30)

  test("join_size_audit pins the uniform estimate against exact truth") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, 1L, 1L), (1L, 2L, 1L), (1L, 2L, 1L), (2L, 2L, 1L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, 1L), (3L, 1L)).toDF("o_orderkey", "o_custkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq(Tuple1(1L), Tuple1(2L)).toDF("p_partkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/part.parquet")
    Seq(Tuple1(1L)).toDF("s_suppkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq(Tuple1(1L), Tuple1(2L)).toDF("c_custkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // golden_stats.py tranche30 jsa: order key 2 has no match (order 3
    // is dangling) -> est 4 vs actual 3 = 13333 bp; the other edges
    // estimate exactly.
    val out = StatQueries.joinSizeAudit(spark, dir).collect()
      .map(r => r.getAs[String]("edge") ->
        (r.getAs[Long]("est_uniform"), r.getAs[Long]("actual"),
          r.getAs[Long]("ratio_bp"))).toMap
    assert(out("lineitem_orders") == ((4L, 3L, 13333L)))
    assert(out("lineitem_part") == ((4L, 4L, 10000L)))
    assert(out("lineitem_supplier") == ((4L, 4L, 10000L)))
    assert(out("orders_customer") == ((2L, 2L, 10000L)))
  }

  test("zorder_cells pins the Morton interleave and edge cells") {
    val dir = tmp()
    writeEvents(dir, Seq(
      (1L, 1000L, 1L, "t", 0.0), (2L, 2000L, 1L, "t", 10.0),
      (3L, 3000L, 3L, "t", 5.0)))
    // golden_stats.py tranche30 zorder: the max value caps at cell
    // 255; (128, 255) interleaves to 60074.
    val out = OpsQueries.zorderCells(spark, dir).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("xcell"), r.getAs[Long]("ycell"),
          r.getAs[Long]("zval"))).toMap
    assert(out == Map(
      1L -> (0L, 0L, 0L), 2L -> (255L, 0L, 21845L),
      3L -> (128L, 255L, 60074L)))
  }

  test("partition_skew pins the share-of-max and median ratio") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, "en", "web", "a" * 10), (2L, "en", "web", "b" * 20),
      (3L, "en", "wiki", "c" * 50), (4L, "de", "web", "d" * 5))
      .toDF("doc_id", "lang", "source", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = StatQueries.partitionSkew(spark, dir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("source")) ->
        (r.getAs[Long]("bytes"), r.getAs[Long]("share_of_max_bp"),
          r.getAs[Double]("max_over_median"))).toMap
    assert(out == Map(
      ("de", "web") -> (5L, 1000L, 1.666667),
      ("en", "web") -> (30L, 6000L, 1.666667),
      ("en", "wiki") -> (50L, 10000L, 1.666667)))
  }

  test("compaction_plan pins the exclusive-prefix file grouping") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, "a", "s1", 40000L), (2L, "a", "s2", 30000L),
      (3L, "b", "s1", 60000L))
      .toDF("doc_id", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // (b,s1) starts at cumulative 70000 -> 64 KiB group 1; (a,s2)
    // starts at 40000 and stays in group 0 even though it ENDS past
    // the boundary (exclusive-prefix packing).
    val out = StatQueries.compactionPlan(spark, dir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("source")) ->
        r.getAs[Long]("file_group")).toMap
    assert(out == Map(("a", "s1") -> 0L, ("a", "s2") -> 0L, ("b", "s1") -> 1L))
  }

  test("sortkey_advisor pins the cardinality-ascending ranking") {
    import spark.implicits._
    val dir = tmp()
    (1 to 6).map(i => (
      if (i <= 3) "A" else "R",       // returnflag: 2 distinct
      "O",                            // linestatus: 1
      s"1995-0${(i - 1) % 3 + 1}-01", // shipdate: 3
      (i % 4).toLong,                 // suppkey: 4
      (i % 5).toLong,                 // partkey: 5
      i.toDouble))                    // quantity: 6
      .toDF("l_returnflag", "l_linestatus", "d", "l_suppkey", "l_partkey",
        "l_quantity")
      .select(col("l_returnflag"), col("l_linestatus"),
        to_timestamp(col("d")).as("l_shipdate"), col("l_suppkey"),
        col("l_partkey"), col("l_quantity"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = StatQueries.sortkeyAdvisor(spark, dir).collect()
      .map(r => r.getAs[Int]("pos") ->
        (r.getAs[String]("col_name"), r.getAs[Long]("ndv")))
    assert(out.toSeq == Seq(
      1 -> ("l_linestatus", 1L), 2 -> ("l_returnflag", 2L),
      3 -> ("l_shipdate", 3L), 4 -> ("l_suppkey", 4L),
      5 -> ("l_partkey", 5L), 6 -> ("l_quantity", 6L)))
  }

  test("skew_profile pins the hot-key share and count entropy") {
    val dir = tmp()
    writeEvents(dir, Seq(
      (1L, 1000L, 1L, "t", 1.0), (2L, 2000L, 1L, "t", 1.0),
      (3L, 3000L, 1L, "t", 1.0), (4L, 4000L, 2L, "t", 1.0)))
    // golden_stats.py tranche30 skew_profile: entropy = ln 4 −
    // (3 ln 3)/4 = 0.562335.
    val r = one(OpsQueries.skewProfileUsers(spark, dir))
    assert(r.getAs[Long]("n_rows") == 4L)
    assert(r.getAs[Long]("n_keys") == 2L)
    assert(r.getAs[String]("top_key") == "1")
    assert(r.getAs[Double]("top_frac") == 0.75)
    assert(r.getAs[Double]("entropy_nats") == 0.562335)
  }

  test("broadcast_advisor pins the exact byte estimates") {
    import spark.implicits._
    val dir = tmp()
    Seq((0, "AFRICA")).toDF("r_regionkey", "r_name")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/region.parquet")
    Seq((0, "ALGERIA", 0)).toDF("n_nationkey", "n_name", "n_regionkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq((1L, "S1")).toDF("s_suppkey", "s_name")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq((1L, "C1", "BLD")).toDF("c_custkey", "c_name", "c_mktsegment")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1L, "p one", "B1", "T A")).toDF("p_partkey", "p_name", "p_brand",
      "p_type")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/part.parquet")
    // golden_stats.py tranche30 badvisor: 10/15/22/25/30 bytes.
    val out = StatQueries.queries("broadcast_advisor")(spark, dir).collect()
      .map(r => r.getAs[String]("table_name") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("est_bytes"),
          r.getAs[Boolean]("broadcastable"))).toMap
    assert(out == Map(
      "region" -> (1L, 10L, true), "nation" -> (1L, 15L, true),
      "supplier" -> (1L, 22L, true), "customer" -> (1L, 25L, true),
      "part" -> (1L, 30L, true)))
  }

  test("postings_compression pins the Elias-gamma bit accounting") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, "x"), (2L, "x y"), (3L, "x")).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // golden_stats.py tranche30 postings: x's posting list 1,2,3 ->
    // first id encodes id+1 (3 bits), unit gaps 1 bit each; y's lone
    // id 2 encodes 3 (3 bits): 8 gamma bits vs 256 raw = 9687 bp.
    val r = one(StatQueries.queries("postings_compression")(spark, dir))
    assert(r.getAs[String]("df_bucket") == "a_df_1_10")
    assert(r.getAs[Long]("n_postings") == 4L)
    assert(r.getAs[Long]("raw_bits") == 256L)
    assert(r.getAs[Long]("gamma_bits") == 8L)
    assert(r.getAs[Long]("savings_bp") == 9687L)
  }

  test("range_partition_plan pins the 32-way boundary shares") {
    import spark.implicits._
    val dir = tmp()
    (1 to 5).map(i => (i.toLong, i * 1.0)).toDF("o_orderkey", "o_totalprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // n=5 < 32 partitions: each row lands alone in pids 1..5 with
    // share 2000 bp and degenerate lo == hi bounds.
    val out = StatQueries.rangePartitionPlan(spark, dir).collect()
      .map(r => r.getAs[Int]("pid") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("lo_cents"),
          r.getAs[Long]("hi_cents"), r.getAs[Long]("share_bp")))
    assert(out.toSeq == (1 to 5).map(i =>
      i -> (1L, i * 100L, i * 100L, 2000L)))
  }

  // ------------------- privacy triple / RI / order stats (t31)

  test("ri_orphans pins the planted orphan per FK edge") {
    import spark.implicits._
    val dir = tmp()
    Seq(Tuple1(0L)).toDF("r_regionkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/region.parquet")
    Seq((0L, 0L)).toDF("n_nationkey", "n_regionkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq((1L, 0L)).toDF("c_custkey", "c_nationkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq(Tuple1(1L)).toDF("p_partkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/part.parquet")
    Seq(Tuple1(1L)).toDF("s_suppkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq((1L, 1L), (2L, 99L)).toDF("o_orderkey", "o_custkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 1L, 1L), (3L, 99L, 1L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = OpsQueries.riOrphans(spark, dir).collect()
      .map(r => r.getAs[String]("edge") ->
        (r.getAs[Long]("fk_rows"), r.getAs[Long]("orphans"))).toMap
    assert(out == Map(
      "customer.c_nationkey->nation" -> (1L, 0L),
      "lineitem.l_orderkey->orders" -> (2L, 1L),
      "lineitem.l_partkey->part" -> (2L, 1L),
      "lineitem.l_suppkey->supplier" -> (2L, 0L),
      "nation.n_regionkey->region" -> (1L, 0L),
      "orders.o_custkey->customer" -> (2L, 1L)))
  }

  test("fd_audit pins the per-dependency violation census") {
    import spark.implicits._
    val dir = tmp()
    Seq((0L, 0L), (1L, 0L)).toDF("n_nationkey", "n_regionkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq(("alpha", "B1", "T1"), ("alpha", "B2", "T1"))
      .toDF("p_name", "p_brand", "p_type")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/part.parquet")
    Seq((0L, "S1"), (0L, "S2")).toDF("c_nationkey", "c_mktsegment")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1L, "a"), (1L, "a")).toDF("o_custkey", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, "1995-01-01"), (1L, "1995-01-02")).toDF("l_orderkey", "d")
      .select(col("l_orderkey"), to_timestamp(col("d")).as("l_shipdate"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = OpsQueries.fdAudit(spark, dir).collect()
      .map(r => r.getAs[String]("fd") ->
        (r.getAs[Long]("n_lhs"), r.getAs[Long]("n_violating"),
          r.getAs[Long]("max_rhs"), r.getAs[Boolean]("holds"))).toMap
    assert(out("nation: n_nationkey -> n_regionkey") == ((2L, 0L, 1L, true)))
    assert(out("part: p_name -> p_brand") == ((1L, 1L, 2L, false)))
    assert(out("part: p_brand -> p_type") == ((2L, 0L, 1L, true)))
    assert(out("customer: c_nationkey -> c_mktsegment") == ((1L, 1L, 2L, false)))
    assert(out("orders: o_custkey -> o_orderpriority") == ((1L, 0L, 1L, true)))
    assert(out("lineitem: l_orderkey -> l_shipdate") == ((1L, 1L, 2L, false)))
  }

  test("weighted_median pins the running-weight election") {
    import spark.implicits._
    val dir = tmp()
    Seq(("A", 1.0, 1.0, 1L, 1), ("A", 4.0, 2.0, 1L, 2), ("A", 3.0, 1.0, 1L, 3),
      ("B", 45.0, 5.0, 2L, 1))
      .toDF("l_returnflag", "l_extendedprice", "l_quantity", "l_orderkey",
        "l_linenumber")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // Flag A units (1 w1, 2 w2, 3 w1): cumulative weight doubles to 6
    // at unit 2 >= total 4 -> weighted median 2.0.
    val out = OpsQueries.weightedMedian(spark, dir).collect()
      .map(r => r.getAs[String]("flag") ->
        (r.getAs[Double]("weighted_median"), r.getAs[Double]("total_weight")))
      .toMap
    assert(out == Map("A" -> (2.0, 4.0), "B" -> (9.0, 5.0)))
  }

  /** QI fixture shared by the k-anonymity / l-diversity audits. */
  private lazy val qiDir: String = {
    import spark.implicits._
    val dir = tmp()
    ((1 to 6).map(i => (i.toLong, 1L, "S1", 500.0)) ++
      Seq((7L, 1L, "S2", 500.0), (8L, 1L, "S2", 500.0)))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/customer.parquet")
    dir
  }

  test("k_anonymity pins the class sizes at the k=5 boundary") {
    val out = OpsQueries.kAnonymity(spark, qiDir).collect()
      .map(r => r.getAs[String]("c_mktsegment") ->
        (r.getAs[Long]("n"), r.getAs[Boolean]("at_risk"))).toMap
    assert(out == Map("S1" -> (6L, false), "S2" -> (2L, true)))
  }

  test("l_diversity pins the distinct-sensitive-value count") {
    val r = one(OpsQueries.lDiversity(spark, qiDir))
    assert(r.getAs[Long]("n") == 8L)
    assert(r.getAs[Long]("l_div") == 2L)
    assert(r.getAs[Boolean]("at_risk"))
  }

  test("t_closeness pins the exact-integer TVD per class") {
    import spark.implicits._
    val dir = tmp()
    (Seq.fill(4)((1L, "S1")) ++ Seq((2L, "S1"), (2L, "S2"), (2L, "S2"),
      (2L, "S2"), (3L, "S1"), (3L, "S2")))
      .zipWithIndex.map { case ((nk, sg), i) => (i + 1L, nk, sg, 100.0) }
      .toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // golden_stats.py tranche31 tclose: t = 0.4 / 0.35 / 0.1 against
    // the global 6:4 mix — incl. the null-fill for the S2-free class.
    val out = OpsQueries.tCloseness(spark, dir).collect()
      .map(r => r.getAs[Long]("c_nationkey") ->
        (r.getAs[Long]("n"), r.getAs[Double]("t_close"),
          r.getAs[Boolean]("at_risk"))).toMap
    assert(out == Map(
      1L -> (4L, 0.4, false), 2L -> (4L, 0.35, false), 3L -> (2L, 0.1, false)))
  }

  test("events_ohlc pins the struct-min/max open and close") {
    val dir = tmp()
    writeEvents(dir, Seq(
      (1L, 1000000L, 1L, "t", 5.0), (2L, 2000000L, 2L, "t", 9.0),
      (3L, 3000000L, 3L, "t", 2.0), (4L, 4000000L, 4L, "t", 7.0)))
    val r = one(StatQueries.eventsOhlc(spark, dir))
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Double]("open") == 5.0)
    assert(r.getAs[Double]("high") == 9.0)
    assert(r.getAs[Double]("low") == 2.0)
    assert(r.getAs[Double]("close") == 7.0)
  }

  test("events_peaks pins the strict-maximum and prominence gates") {
    val dir = tmp()
    countEvents(dir, 100L, Map("t" -> Seq(2, 2, 8, 2, 2, 2, 2, 2)))
    // golden_stats.py tranche31 peaks: only hour 102 is a strict
    // local max AND clears 1.5x the +-3h mean (8*2*6 = 96 > 18*3).
    val rows = StatQueries.eventsPeaks(spark, dir).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("hour_idx") == 102L)
    assert(rows(0).getAs[Long]("n") == 8L)
    assert(rows(0).getAs[Long]("pn") == 2L && rows(0).getAs[Long]("nn") == 2L)
    assert(rows(0).getAs[Double]("mean_7h") == 3.0)
  }

  test("events_eqdepth pins the ntile remainder layout") {
    val dir = tmp()
    valueEvents(dir, Map("t" -> (1 to 10).map(_.toDouble)))
    // ntile(8) over 10 rows: the remainder 2 lands on buckets 1-2.
    val out = OpsQueries.eventsEqdepth(spark, dir).collect()
      .map(r => r.getAs[Int]("bucket") ->
        (r.getAs[Long]("n"), r.getAs[Double]("lo"), r.getAs[Double]("hi")))
      .toMap
    assert(out(1) == ((2L, 1.0, 2.0)) && out(2) == ((2L, 3.0, 4.0)))
    (3 to 8).foreach { b =>
      assert(out(b) == ((1L, b + 2.0, b + 2.0)), s"bucket $b") }
  }

  test("events_moving_median pins the exact sorted-array medians") {
    val dir = tmp()
    countEvents(dir, 100L, Map("t" -> Seq(5, 2, 4, 1, 6, 3, 5, 2)))
    // golden_stats.py tranche31 movmed over [5,2,4,1,6,3,5,2].
    val exp = Seq(3.0, 4.0, 3.5, 4.0, 3.0, 3.5, 3.0, 4.0)
    val out = StatQueries.eventsMovingMedian(spark, dir).collect()
      .sortBy(_.getAs[Long]("h"))
      .map(_.getAs[Double]("med7"))
    assert(out.toSeq == exp)
  }

  test("pack_budget pins the per-bucket greedy bin boundaries") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, 1200), (9L, 1500), (17L, 900), (4L, 700))
      .map { case (id, n) => (id, Seq.fill(n)("w").mkString(" ")) }
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // golden_stats.py tranche28 pack: ids 1/9/17 share bucket 4
    // (2654435761 % 8 = 1): cum 0/1200/2700 -> doc 17 opens bin 1;
    // doc 4 sits alone in bucket 7.
    val out = OpsQueries.packBudget(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("bucket"), r.getAs[Long]("bin"),
          r.getAs[Long]("n_tokens"))).toMap
    assert(out == Map(
      1L -> (4L, 0L, 1200L), 9L -> (4L, 0L, 1500L),
      17L -> (4L, 1L, 900L), 4L -> (7L, 0L, 700L)))
  }
}
