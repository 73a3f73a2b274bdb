package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants of the data-quality / analytics pack on the sf0.001
  * tables: these hold for ANY generator output, so they complement the
  * value-exact DuckDB oracles rather than repeat them. */
class AnalyticsQuerySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("profile_table: one row per column, no nulls, n_rows constant, min<=max") {
    val p = OpsQueries.profileTable(spark, dir).collect()
    assert(p.length == 8)
    assert(p.map(_.getAs[Long]("n_rows")).distinct.length == 1)
    assert(p.forall(_.getAs[Long]("n_null") == 0L))
    assert(p.forall(r => r.getAs[Double]("min_val") <= r.getAs[Double]("max_val")))
    assert(p.forall(r => r.getAs[Long]("n_distinct") > 0L))
  }

  test("ri_orphans: all six FK edges audited, zero orphans on generator output") {
    val e = OpsQueries.riOrphans(spark, dir).collect()
    assert(e.length == 6)
    assert(e.forall(_.getAs[Long]("orphans") == 0L))
    assert(e.forall(_.getAs[Long]("fk_rows") > 0L))
  }

  test("rfm_segments: quartiles in 1..4, balanced within 1, segment = r*100+f*10+m") {
    val df = OpsQueries.rfmSegments(spark, dir)
    val rows = df.collect()
    for (c <- Seq("r", "f", "m")) {
      val vals = rows.map(_.getAs[Long](c))
      assert(vals.forall(v => v >= 1 && v <= 4), s"$c out of range")
      val sizes = vals.groupBy(identity).values.map(_.length)
      assert(sizes.max - sizes.min <= 1, s"$c quartiles unbalanced: $sizes")
    }
    assert(rows.forall(r => r.getAs[Long]("segment") ==
      r.getAs[Long]("r") * 100 + r.getAs[Long]("f") * 10 + r.getAs[Long]("m")))
  }

  test("benford_revenue: digits 1..9, shares sum to 1, expectation sums to 1") {
    val b = OpsQueries.benfordRevenue(spark, dir).collect()
    assert(b.map(_.getAs[Long]("digit")).toSeq == (1L to 9L))
    assert(math.abs(b.map(_.getAs[Double]("share")).sum - 1.0) < 1e-4)
    assert(math.abs(b.map(_.getAs[Double]("benford_p")).sum - 1.0) < 1e-4)
    assert(b.forall(_.getAs[Double]("chi2_term") >= 0.0))
  }

  test("part_best_supplier: one winner per part, positive price, recomputable argmin") {
    val r = OpsQueries.partBestSupplier(spark, dir)
    val rows = r.collect()
    assert(rows.map(_.getAs[Long]("l_partkey")).distinct.length == rows.length)
    assert(rows.forall(_.getAs[Double]("unit_price") > 0.0))
    assert(rows.forall(_.getAs[Long]("n_suppliers") >= 1L))
    // Independent recompute of the argmin for one part.
    val pk = rows.head.getAs[Long]("l_partkey")
    val best = graft.Tables.lineitem(spark, dir)
      .filter(col("l_partkey") === pk)
      .select(round(col("l_extendedprice") / col("l_quantity"), 6).as("u"),
        col("l_suppkey"))
      .orderBy(col("u"), col("l_suppkey")).limit(1).collect()(0)
    assert(rows.head.getAs[Long]("best_suppkey") == best.getAs[Long]("l_suppkey"))
  }

  test("lead_time: percentiles ordered p50<=p90<=p99") {
    val rows = OpsQueries.leadTime(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p50, p90, p99) = (r.getAs[Double]("p50"),
        r.getAs[Double]("p90"), r.getAs[Double]("p99"))
      assert(p50 <= p90 && p90 <= p99, s"$p50 $p90 $p99")
      assert(r.getAs[Long]("n") > 0L)
    }
  }

  test("supplier_hhi: bounds 1/n <= hhi <= 1 and top_share^2 <= hhi <= top_share") {
    val rows = OpsQueries.supplierHhi(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_suppliers").toDouble
      val hhi = r.getAs[Double]("hhi")
      val top = r.getAs[Double]("top_share")
      assert(hhi >= 1.0 / n - 1e-6 && hhi <= 1.0 + 1e-6, s"hhi $hhi n $n")
      assert(top * top <= hhi + 1e-6 && hhi <= top + 1e-6, s"hhi $hhi top $top")
    }
  }

  test("events_interarrival: nonnegative ordered gap percentiles") {
    val rows = OpsQueries.eventsInterarrival(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("p50_us") >= 0.0)
      assert(r.getAs[Double]("p50_us") <= r.getAs[Double]("p90_us"))
      assert(r.getAs[Double]("mean_us") > 0.0)
    }
  }

  test("events_ewma: seeds at the first observation, stays within series range") {
    val rows = OpsQueries.eventsEwma(spark, dir).collect()
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.values.foreach { ts =>
      val first = ts.minBy(_.getAs[Long]("hour_us"))
      assert(math.abs(first.getAs[Double]("ewma") -
        first.getAs[Long]("n_events").toDouble) < 1e-6)
      val xs = ts.map(_.getAs[Long]("n_events").toDouble)
      val (lo, hi) = (xs.min, xs.max)
      assert(ts.forall(r => r.getAs[Double]("ewma") >= lo - 1e-6 &&
        r.getAs[Double]("ewma") <= hi + 1e-6))
    }
  }

  test("k_anonymity: classes partition the customer table, flag matches size") {
    val rows = OpsQueries.kAnonymity(spark, dir).collect()
    val total = graft.Tables.customer(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    assert(rows.forall(r => r.getAs[Boolean]("at_risk") == (r.getAs[Long]("n") < 5)))
  }

  test("Bfs.distances: exact hop counts on a known graph, hop bound respected") {
    import spark.implicits._
    // Path 1-2-3-4-5-6 plus chord 1-4: dist(4)=1 via chord, dist(6)=3.
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (1L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("s", "t")
    val d = graft.ops.Bfs.distances(edges, "s", "t", 1L, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 2L, 6L -> 3L))
    // Tighter bound drops the far end of the path.
    val d2 = graft.ops.Bfs.distances(edges, "s", "t", 1L, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!d2.contains(6L) && d2(5L) == 2L)
  }

  test("doc_keywords: at most 3 ranked keywords per doc, scores descend") {
    val rows = OpsQueries.docKeywords(spark, dir).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.nonEmpty)
    byDoc.values.foreach { ks =>
      val sorted = ks.sortBy(_.getAs[Long]("rk"))
      assert(sorted.length <= 3)
      assert(sorted.map(_.getAs[Long]("rk")).toSeq == (1L to sorted.length))
      val scores = sorted.map(_.getAs[Double]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("events_theilsen: pair count matches the hourly series size") {
    val rows = OpsQueries.eventsTheilsen(spark, dir).collect()
    assert(rows.nonEmpty)
    val hours = graft.Tables.events(spark, dir)
      .groupBy(col("event_type"), expr("date_trunc('hour', ts)")).count()
      .groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val h = hours(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_pairs") == h * (h - 1) / 2)
      assert(!r.getAs[Double]("median_slope").isNaN)
    }
  }

  test("label_inertia: nonnegative SSE, vectors partition across labels") {
    val rows = DedupSimQueries.labelInertia(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("sse") >= 0.0))
    val total = graft.Tables.embeddings(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == total)
    rows.foreach { r =>
      val expected = r.getAs[Double]("sse") / r.getAs[Long]("n_vecs")
      assert(math.abs(r.getAs[Double]("avg_sse") - expected) < 1e-5)
    }
  }

  test("user_churn: day accounting is conserved against raw distinct counts") {
    val rows = OpsQueries.userChurn(spark, dir).collect()
      .map(r => r.getAs[Long]("day") ->
        (r.getAs[Long]("retained"), r.getAs[Long]("new_users"), r.getAs[Long]("churned"))).toMap
    val daily = graft.Tables.events(spark, dir)
      .select(expr("unix_micros(ts) div 86400000000").as("day"), col("user_id"))
      .distinct().groupBy("day").count()
      .collect().map(r => r.getAs[Long]("day") -> r.getAs[Long]("count")).toMap
    daily.foreach { case (d, n) =>
      val (ret, nw, _) = rows(d)
      assert(ret + nw == n, s"day $d: $ret+$nw != $n") // today's users split
      val prevN = daily.getOrElse(d - 1, 0L)
      assert(ret + rows(d)._3 == prevN, s"day $d: yesterday's users split")
    }
  }

  test("fanout_profile: histogram masses sum to the customer count") {
    val rows = OpsQueries.fanoutProfile(spark, dir).collect()
    val total = graft.Tables.customer(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == total)
    val orders = graft.Tables.orders(spark, dir).count()
    assert(rows.map(r => r.getAs[Long]("n_orders") * r.getAs[Long]("n_customers")).sum
      == orders)
  }

  test("vocab_coverage: oov rate bounded, zero for docs of common tokens only") {
    val rows = OpsQueries.vocabCoverage(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rate = r.getAs[Double]("oov_rate")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(r.getAs[Long]("n_oov") <= r.getAs[Long]("n_tokens"))
    }
  }

  test("doc_sentences: counts positive, mean <= max length") {
    val rows = OpsQueries.docSentences(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sentences") >= 1L)
      assert(r.getAs[Double]("mean_len") <= r.getAs[Long]("max_len") + 1e-9)
    }
  }

  test("forget_users: cascade removes exactly the flagged users' rows") {
    val rows = OpsQueries.forgetUsers(spark, dir).collect()
    assert(rows.forall(r => r.getAs[Long]("n_before") ==
      r.getAs[Long]("n_after") + r.getAs[Long]("n_removed")))
    // The 2% hash slice must actually flag someone at this SF.
    assert(rows.map(_.getAs[Long]("n_removed")).sum > 0)
  }

  test("scd2_lookup: at most one valid version per key at the probe instant") {
    val rows = OpsQueries.scd2Lookup(spark, dir).collect()
    assert(rows.nonEmpty)
    val keys = rows.map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")))
    assert(keys.distinct.length == keys.length, "duplicate key at probe time")
  }

  test("events_heatmap: grid within bounds, shares sum to 1") {
    val rows = OpsQueries.eventsHeatmap(spark, dir).collect()
    assert(rows.forall(r => (0L to 6L).contains(r.getAs[Long]("dow"))))
    assert(rows.forall(r => (0L to 23L).contains(r.getAs[Long]("hod"))))
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-3)
  }

  test("rollup_reuse: weekly counts equal a direct weekly aggregation") {
    val rows = OpsQueries.rollupReuse(spark, dir).collect()
      .map(r => (r.getAs[Long]("week"), r.getAs[String]("event_type")) ->
        r.getAs[Long]("n_events")).toMap
    val direct = graft.Tables.events(spark, dir)
      .groupBy(expr("(unix_micros(ts) div 86400000000) div 7").as("week"),
        col("event_type")).count()
      .collect().map(r => (r.getAs[Long]("week"), r.getAs[String]("event_type")) ->
        r.getAs[Long]("count")).toMap
    assert(rows == direct, "reuse path diverged from direct aggregation")
  }

  test("GeoMean aggregator: matches exp(mean log), merge is associative") {
    import graft.functions.GeoMean
    val xs = Seq(1.0, 2.0, 4.0, 8.0)
    val direct = xs.map(x => GeoMean.reduce(GeoMean.zero, x))
      .reduce(GeoMean.merge)
    assert(math.abs(GeoMean.finish(direct) - math.exp(
      xs.map(math.log).sum / 4)) < 1e-12)
    // Split-merge equals one-pass.
    val (l, r) = xs.splitAt(2)
    def fold(s: Seq[Double]) = s.foldLeft(GeoMean.zero)(GeoMean.reduce)
    assert(GeoMean.finish(GeoMean.merge(fold(l), fold(r))) ==
      GeoMean.finish(fold(xs)))
    assert(GeoMean.finish(GeoMean.zero).isNaN)
    // Through the registered UDAF, geometric <= arithmetic mean (AM-GM).
    val rows = OpsQueries.eventsGeomean(spark, dir).collect()
    val am = graft.Tables.events(spark, dir).filter(col("value") > 0)
      .groupBy("event_type").agg(avg("value"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach(r => assert(r.getAs[Double]("geo_mean") <=
      am(r.getAs[String]("event_type")) + 1e-9))
  }

  test("quantile_norm: rank order preserved within groups, range pinned to pool") {
    val rows = OpsQueries.quantileNorm(spark, dir).collect()
    val pool = rows.map(_.getAs[Double]("value"))
    val (lo, hi) = (pool.min, pool.max)
    assert(rows.forall { r =>
      val v = r.getAs[Double]("norm_value"); v >= lo && v <= hi })
    rows.groupBy(_.getAs[String]("event_type")).values.foreach { g =>
      val sorted = g.sortBy(r => (r.getAs[Double]("value"), r.getAs[Long]("event_id")))
      val norms = sorted.map(_.getAs[Double]("norm_value"))
      assert(norms.zip(norms.tail).forall { case (a, b) => a <= b },
        "normalization broke within-group order")
    }
  }

  test("user_cumulative: monotone, ends at the distinct-user count") {
    val rows = OpsQueries.userCumulative(spark, dir).collect()
    val cums = rows.map(_.getAs[Long]("cum_users"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
    val distinctUsers = graft.Tables.events(spark, dir)
      .select("user_id").distinct().count()
    assert(cums.last == distinctUsers)
    assert(rows.map(_.getAs[Long]("new_users")).sum == distinctUsers)
  }

  test("revenue_lorenz: 10 deciles, convex increasing shares ending at 1") {
    val rows = OpsQueries.revenueLorenz(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("decile")).toSeq == (1L to 10L))
    val shares = rows.map(_.getAs[Double]("cum_share"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
    assert(math.abs(shares.last - 1.0) < 1e-6)
    // Lorenz curve lies under the diagonal (bottom deciles own less).
    rows.init.foreach { r =>
      assert(r.getAs[Double]("cum_share") <= r.getAs[Long]("decile") / 10.0 + 1e-6)
    }
  }

  test("catalog_coverage: coverage consistent with never-ordered counts") {
    val rows = OpsQueries.catalogCoverage(spark, dir).collect()
    val totalParts = graft.Tables.part(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n_parts")).sum == totalParts)
    rows.foreach { r =>
      val (np, nn) = (r.getAs[Long]("n_parts"), r.getAs[Long]("n_never"))
      assert(nn <= np)
      assert(math.abs(r.getAs[Double]("coverage") - (np - nn).toDouble / np) < 1e-5)
    }
  }

  test("class_rebalance: every class downsampled to exactly the minority size") {
    val rows = OpsQueries.classRebalance(spark, dir).collect()
    val sizes = rows.groupBy(_.getAs[String]("event_type")).view.mapValues(_.length)
    val minOriginal = graft.Tables.events(spark, dir)
      .groupBy("event_type").count().agg(min("count")).head.getLong(0)
    assert(sizes.values.toSet == Set(minOriginal.toInt),
      s"unbalanced: ${sizes.toMap}")
  }

  test("dedup_survivorship: clusters partition the corpus, golden fields sane") {
    val rows = DedupSimQueries.dedupSurvivorship(spark, dir).collect()
    val corpusSize = 2 * graft.Tables.documents(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n_members")).sum == corpusSize)
    rows.foreach { r =>
      assert(r.getAs[Long]("record_id") >= r.getAs[Long]("cluster") ||
        r.getAs[Long]("record_id") == r.getAs[Long]("cluster"))
      assert(r.getAs[Long]("max_chars") > 0)
      assert(r.getAs[String]("golden_lang").nonEmpty)
    }
  }

  test("weighted_median: at least half the weight sits at or below the pick") {
    val rows = OpsQueries.weightedMedian(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flag = r.getAs[String]("flag")
      val wm = r.getAs[Double]("weighted_median")
      val li = graft.Tables.lineitem(spark, dir)
        .filter(col("l_returnflag") === flag)
        .select(round(col("l_extendedprice") / col("l_quantity"), 6).as("unit"),
          col("l_quantity").as("wt"))
      val tot = li.agg(sum("wt")).head.getDouble(0)
      val below = li.filter(col("unit") <= wm).agg(sum("wt")).head.getDouble(0)
      val above = li.filter(col("unit") >= wm).agg(sum("wt")).head.getDouble(0)
      assert(below * 2 >= tot && above * 2 >= tot, s"$flag: $below/$above of $tot")
    }
  }

  test("sim_hamming: planted sign-identical vector is its base's nearest neighbor") {
    import spark.implicits._
    val rows = DedupSimQueries.simHamming(spark, dir).collect()
    assert(rows.length == 15) // 3 probes × top-5
    rows.groupBy(_.getAs[Long]("probe_id")).values.foreach { g =>
      val hs = g.sortBy(_.getAs[Long]("rk")).map(_.getAs[Long]("hamming"))
      assert(hs.zip(hs.tail).forall { case (a, b) => a <= b })
      assert(hs.forall(h => h >= 0 && h <= 63))
    }
  }

  test("events_streaks: streak bounds are consistent") {
    val rows = OpsQueries.eventsStreaks(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("longest_streak") >= 1L)
      assert(r.getAs[Long]("n_streaks") >= 1L)
    }
  }

  test("target_encode: LOO identity (sum - own)/(n-1) holds exactly") {
    val rows = OpsQueries.targetEncode(spark, dir).limit(20).collect()
    assert(rows.nonEmpty)
    val o = graft.Tables.orders(spark, dir)
      .withColumn("cents", round(col("o_totalprice") * 100, 0).cast("long"))
    val stats = o.groupBy("o_orderpriority")
      .agg(sum("cents").as("sc"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val own = o.select("o_orderkey", "cents").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (sc, n) = stats(r.getAs[String]("o_orderpriority"))
      val expected = (sc - own(r.getAs[Long]("o_orderkey"))).toDouble / (n - 1) / 100.0
      assert(math.abs(r.getAs[Double]("loo_mean") - expected) < 1e-4)
    }
  }

  test("feature_hash: buckets within range, masses conserve the event count") {
    val rows = OpsQueries.featureHash(spark, dir).collect()
    assert(rows.forall(r => (0L until 64L).contains(r.getAs[Long]("bucket"))))
    assert(rows.map(_.getAs[Long]("n_rows")).sum ==
      graft.Tables.events(spark, dir).count())
    assert(rows.forall(r => r.getAs[Long]("n_pairs") <= r.getAs[Long]("n_rows")))
  }

  test("best_split: nine candidates, one winner, gains in [0, 1.4)") {
    val rows = OpsQueries.bestSplit(spark, dir).collect()
    assert(rows.length == 9)
    assert(rows.count(_.getAs[Boolean]("is_best")) == 1)
    rows.foreach { r =>
      val g = r.getAs[Double]("gain")
      assert(g >= -1e-9 && g < 1.4, s"gain $g") // ≤ ln 2 + slack
    }
    val best = rows.filter(_.getAs[Boolean]("is_best")).head.getAs[Double]("gain")
    assert(rows.forall(_.getAs[Double]("gain") <= best))
  }

  test("price_volume_mix: volume + price effects reconstruct the common-parts delta") {
    val r = OpsQueries.priceVolumeMix(spark, dir).collect()(0)
    val delta = r.getAs[Long]("delta_cents") / 100.0
    val reconstructed = r.getAs[Double]("volume_effect") + r.getAs[Double]("price_effect")
    assert(math.abs(delta - reconstructed) < math.max(1.0, math.abs(delta) * 1e-6),
      s"delta $delta vs $reconstructed")
    assert(r.getAs[Long]("n_parts") > 0)
  }

  test("new_repeat_revenue: one 'new' order per customer overall") {
    val rows = OpsQueries.newRepeatRevenue(spark, dir).collect()
    val nNew = rows.map(_.getAs[Long]("n_new")).sum
    val customers = graft.Tables.orders(spark, dir)
      .select("o_custkey").distinct().count()
    assert(nNew == customers)
    val totalOrders = graft.Tables.orders(spark, dir).count()
    assert(nNew + rows.map(_.getAs[Long]("n_repeat")).sum == totalOrders)
  }

  test("doc_readability: counts positive, formula recomputes") {
    val rows = OpsQueries.docReadability(spark, dir).limit(20).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, sn, sy) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_sents"),
        r.getAs[Long]("n_syl"))
      assert(w > 0 && sn >= 1 && sy >= 0)
      val expected = 206.835 - 1.015 * w.toDouble / sn - 84.6 * sy.toDouble / w
      assert(math.abs(r.getAs[Double]("flesch") - expected) < 1e-3)
    }
  }

  test("kwic_snippets: every snippet contains the probe term") {
    val rows = OpsQueries.kwicSnippets(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("snippet").toLowerCase.contains("vector")))
    assert(rows.forall(_.getAs[Long]("pos") >= 1L))
  }

  test("events_seasonal_anomaly: 5 ranked deviations per type, |z| descending") {
    val rows = OpsQueries.eventsSeasonalAnomaly(spark, dir).collect()
    rows.groupBy(_.getAs[String]("event_type")).values.foreach { g =>
      assert(g.length == 5)
      val zs = g.sortBy(_.getAs[Long]("rk")).map(r => math.abs(r.getAs[Double]("z")))
      assert(zs.zip(zs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("rank_movers: deltas descend, delta arithmetic consistent") {
    val rows = OpsQueries.rankMovers(spark, dir).collect()
    assert(rows.length == 10)
    val deltas = rows.map(_.getAs[Long]("delta"))
    assert(deltas.zip(deltas.tail).forall { case (a, b) => a >= b })
    assert(rows.forall(r => r.getAs[Long]("delta") ==
      r.getAs[Long]("rk_prev") - r.getAs[Long]("rk_last")))
  }

  test("repeat_latency: percentiles ordered, count matches multi-order customers") {
    val r = OpsQueries.repeatLatency(spark, dir).collect()(0)
    assert(r.getAs[Double]("p50") <= r.getAs[Double]("p90"))
    val multi = graft.Tables.orders(spark, dir)
      .groupBy("o_custkey").count().filter(col("count") >= 2).count()
    assert(r.getAs[Long]("n_repeat") == multi)
  }

  test("segment_brand_lift: lifts average to ~1 under the cell weights") {
    val rows = OpsQueries.segmentBrandLift(spark, dir).collect()
    assert(rows.nonEmpty)
    val tot = rows.map(_.getAs[Long]("n")).sum.toDouble
    val weighted = rows.map(r => r.getAs[Long]("n") * r.getAs[Double]("lift")).sum
    // Σ n·lift = Σ n·(n·T/(r·c)) ≥ T by Cauchy-Schwarz; equals T iff independent.
    assert(weighted >= tot - 1e-3, s"$weighted vs $tot")
    assert(rows.forall(_.getAs[Double]("lift") > 0.0))
  }

  test("events_percentile_series: band ordering p10<=p50<=p90 everywhere") {
    val rows = OpsQueries.eventsPercentileSeries(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("p10") <= r.getAs[Double]("p50"))
      assert(r.getAs[Double]("p50") <= r.getAs[Double]("p90"))
    }
  }

  test("vec_profile: positive norms, zero counts within dimension bound") {
    val rows = OpsQueries.vecProfile(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("mean_norm") > 0.0)
      assert(r.getAs[Long]("max_zero_components") >= 0L)
      assert(r.getAs[Long]("max_zero_components") <= 64L)
    }
  }

  test("corpus_datacard: one row, metrics consistent with the documents table") {
    val r = OpsQueries.corpusDatacard(spark, dir).collect()(0)
    val docs = graft.Tables.documents(spark, dir)
    assert(r.getAs[Long]("n_docs") == docs.count())
    assert(r.getAs[Long]("total_tokens") > 0)
    assert(r.getAs[Double]("mean_quality") > 0.0 && r.getAs[Double]("mean_quality") <= 1.0)
    assert(r.getAs[Double]("p50_chars") <= r.getAs[Double]("p90_chars"))
  }

  test("ab_ttest: both arms populated, near-even split, finite t") {
    val t = OpsQueries.abTtest(spark, dir).collect()
    assert(t.nonEmpty)
    t.foreach { r =>
      val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      assert(na > 0 && nb > 0)
      // The multiplicative hash splits users ~50/50; arms within 3x.
      assert(na < 3 * nb && nb < 3 * na, s"lopsided split $na vs $nb")
      assert(!r.getAs[Double]("t_stat").isNaN)
    }
  }
}
