package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame

/** Physical-plan contracts for the headline queries — the plans we
  * iterated to, pinned so a regression (lost pushdown, broadcast turned
  * shuffle, global sort replacing top-k) fails a test rather than a
  * benchmark. */
class PlanContractSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def finalPlan(df: DataFrame): String = {
    df.collect() // finalize AQE
    df.queryExecution.executedPlan.toString
  }

  test("dpp_scan's fact scan carries a dynamic-pruning partition filter") {
    // The only filter lives on the dim side of the join, so reading
    // fewer than all partitions REQUIRES runtime DPP subquery
    // injection — statically the fact scan is unfiltered.
    val tmp = java.nio.file.Files.createTempDirectory("graft_dpp_spec")
    try {
      import org.apache.spark.sql.functions._
      val ev = Tables.events(spark, dir).withColumn("day", to_date(col("ts")))
      ev.write.mode("overwrite").partitionBy("day").parquet(tmp.toString)
      val df = SourceQueries.dppJoin(spark, tmp.toString, ev)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("dynamicpruning"), plan.take(3000))
    } finally Scratch.deleteRecursively(tmp)
  }

  test("q6 filter reaches the parquet scan as PushedFilters") {
    val plan = finalPlan(Relational.q6Filter(spark, dir))
    assert(plan.contains("PushedFilters: ["), plan.take(2000))
    assert(plan.contains("l_shipdate") || plan.contains("l_discount"), plan.take(2000))
  }

  test("q2 join broadcasts the dimension side") {
    val plan = finalPlan(Relational.q2Join(spark, dir))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("q3 top-k uses TakeOrderedAndProject, not a global sort") {
    val plan = finalPlan(Relational.q3TopK(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("ngramJaccard's hot-shingle filter is a broadcast anti-join") {
    import spark.implicits._
    // The df-cap must never force the full inverted index through an
    // extra shuffle: the hot list is aggregation output (tiny), so the
    // anti-join has to broadcast it.
    val index = (1 to 2000).map(i => (i.toLong, (i % 37).toLong)).toDF("id", "shingle")
    val plan = finalPlan(graft.ops.Dedup.dfCapped(index, 10))
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      plan.take(2000))
  }

  test("decontam joins the corpus against a broadcast eval-shingle side") {
    // The eval side is DISTINCT shingles of a small benchmark — the
    // 100 TB corpus side must never shuffle for this join.
    val plan = finalPlan(OpsQueries.decontamScan(spark, dir))
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      plan.take(2000))
  }

  test("bm25 broadcasts the corpus constants; df rides a term-keyed exchange") {
    // The (N, avgdl) single row must broadcast, and the vocabulary df
    // aggregation must exchange on the term key (partial-agg shape).
    // The df JOIN strategy is deliberately NOT pinned: AQE sizes it at
    // runtime — broadcast at bench scale, shuffle at corpus scale — and
    // either is the right call for its scale.
    val plan = finalPlan(OpsQueries.textBm25(spark, dir))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      plan.take(3000))
    assert(plan.contains("hashpartitioning(term"), plan.take(3000))
  }

  test("temperature quota window stays group-limited by the target bound") {
    // The literal rn <= target conjunct must keep Spark's
    // WindowGroupLimit rewrite applicable — without it a skewed stratum
    // would fully sort instead of early-terminating at the bound.
    val plan = finalPlan(OpsQueries.sampleTemperature(spark, dir))
    assert(plan.contains("WindowGroupLimit"), plan.take(3000))
  }

  test("text stats stay in whole-stage codegen with no hash shuffle") {
    val plan = finalPlan(OpsQueries.textStats(spark, dir))
    // Codegen'd spans print as "*(n) Operator" in the physical plan.
    assert(plan.contains("*("), plan.take(2000))
    // orderBy for the oracle adds a range exchange; nothing else may shuffle.
    assert(!plan.contains("hashpartitioning"), plan.take(2000))
  }

  test("as-of join is one union-window pass — no join operator at all") {
    // The whole point of the union-window plan: the per-key time lookup
    // must come out as Window over one (key)-hash exchange of L ∪ R,
    // never as a join (a theta-join here would be a per-key nested loop).
    val plan = finalPlan(Relational.q8AsofJoin(spark, dir))
    assert(plan.contains("Window"), plan.take(3000))
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      plan.take(3000))
    assert(plan.contains("hashpartitioning(user_id"), plan.take(3000))
  }

  test("range join is an equi-join on (key, bucket), never a data nested loop") {
    val plan = finalPlan(Relational.q9RangeJoin(spark, dir))
    // The containment predicate must ride an equi-join keyed on
    // (user, bucket) — hash or sort-merge, AQE picks by size. The only
    // nested-loop joins allowed are the single-row width-scalar
    // broadcasts (the constant-join pattern): every BNLJ in the plan
    // must be a Cross build of the 1-row __w aggregate, never a join
    // between the two data sides.
    assert(plan.linesIterator.exists(l =>
        (l.contains("HashJoin") || l.contains("SortMergeJoin")) && l.contains("__b")),
      plan.take(3000))
    val bnlj = plan.linesIterator.filter(_.contains("BroadcastNestedLoopJoin")).toSeq
    assert(bnlj.forall(_.contains("Cross")), bnlj.mkString("\n"))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("chunking is exchange-free — pure narrow transforms") {
    // Tokenize + explode starts + slice must pipeline with the scan:
    // any Exchange here means the operator stopped parallelizing freely.
    val plan = finalPlan(
      graft.ops.Chunking.slidingWindows(
        graft.Tables.documents(spark, dir), "text", "doc_id", 64, 48))
    assert(!plan.contains("Exchange"), plan.take(3000))
    assert(plan.contains("*("), plan.take(2000))
  }

  test("LM scoring's only nested-loop joins are 1-row constant builds") {
    // The corpus total and OOV floor ride single-row broadcast constant
    // joins; the token→vocab join and per-doc mean may shuffle (AQE
    // sizes them), but no BNLJ may join two data sides.
    val plan = finalPlan(OpsQueries.lmScore(spark, dir))
    val bnlj = plan.linesIterator.filter(_.contains("BroadcastNestedLoopJoin")).toSeq
    assert(bnlj.forall(_.contains("Cross")), bnlj.mkString("\n"))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("semantic decontam never shuffles the corpus vectors") {
    // The eval side broadcasts; the corpus streams through the
    // threshold join unshuffled — only the post-join per-id aggregation
    // (and the oracle orderBy) may exchange, and no exchange may carry
    // the corpus vector column.
    val plan = finalPlan(OpsQueries.decontamSemantic(spark, dir))
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(!exchanges.exists(_.contains("__cv")),
      s"corpus vectors crossed an exchange:\n${exchanges.mkString("\n")}")
  }

  test("deterministic shuffle ranks via bounded per-bucket windows") {
    // Positions must come from the quantile-bucketed global-rank
    // machinery — a window partitioned on the bucket key — never a
    // single-partition global sort window.
    val plan = finalPlan(OpsQueries.corpusShuffle(spark, dir))
    assert(plan.contains("hashpartitioning(__graft_bucket"), plan.take(3000))
  }

  test("heavy hitters verifies via a broadcast semi-join on candidates") {
    // The MG candidate set is KBs; the exact recount must stream the
    // token stream past a BROADCAST semi-join — a shuffled semi-join
    // would move the whole stream for a 30-row filter.
    val plan = finalPlan(OpsQueries.heavyHittersTokens(spark, dir))
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      plan.take(3000))
  }

  test("tfidf scores only broadcast query-term postings") {
    // The query weight table (|terms| rows) and the (n_docs) constant
    // must broadcast; the postings table must never be shuffled twice
    // for them.
    val plan = finalPlan(OpsQueries.tfidfSearch(spark, dir))
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(plan.contains("TakeOrderedAndProject"),
      "top-k must not be a global sort:\n" + plan.take(3000))
  }

  test("PMI joins its df tables broadcast; the pair space is doc-keyed") {
    // Both df lookups are vocabulary-sized → broadcast; the only big
    // exchanges are the incidence distinct and the doc-keyed self-join.
    val plan = finalPlan(OpsQueries.tokenPmi(spark, dir))
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"),
      "token cross product leaked into the plan:\n" + plan.take(3000))
  }

  test("robust scale broadcasts both bounds tables, never the events") {
    // Median and MAD tables are |groups| rows; the events side must
    // reach both joins unshuffled.
    val plan = finalPlan(OpsQueries.robustScaleEvents(spark, dir))
    val shuffledJoins = plan.linesIterator
      .filter(_.contains("SortMergeJoin")).toSeq
    assert(shuffledJoins.isEmpty,
      s"bounds join went shuffle:\n${shuffledJoins.mkString("\n")}")
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
  }

  test("span removal never shuffles document bodies for the election") {
    // The gram election exchange carries (id, pos, 16-byte hash) rows;
    // text only moves on the final id-keyed cuts join. The projected
    // election stream must therefore drop the text column before its
    // exchange: no Exchange input in the plan may carry column `t`.
    val plan = finalPlan(
      graft.ops.Dedup.spanRemove(
        graft.Tables.documents(spark, dir), "text", "doc_id"))
    val exchanges = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.nonEmpty, plan.take(3000))
    assert(!exchanges.exists(_.contains(", t#")),
      s"election exchange carries text:\n${exchanges.mkString("\n")}")
  }

  test("interval coalescing hash-exchanges on the key only") {
    // Running-max, break-flag, island-id windows and the final groupBy
    // all share the user_id partitioning — the (user_id, _island)
    // aggregation rides the subset-key clustering, so every hash
    // exchange in the plan is keyed on user_id alone (the harness
    // orderBy adds only a range exchange).
    val plan = finalPlan(OpsQueries.intervalCoalesce(spark, dir))
    val hashEx = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.nonEmpty && hashEx.forall(_.contains("hashpartitioning(user_id")),
      s"off-key exchange:\n${hashEx.mkString("\n")}")
  }

  test("KS drift hash-exchanges on the group key only") {
    // The RANGE-CDF windows, the per-group totals window and the final
    // aggregation are all event_type-partitioned; the temporal-midpoint
    // constant rides a 1-row broadcast (its global agg is the only
    // SinglePartition), never a reshuffle of the feed on another key.
    val plan = finalPlan(OpsQueries.driftKs(spark, dir))
    val hashEx = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.nonEmpty && hashEx.forall(_.contains("hashpartitioning(event_type")),
      s"off-key exchange:\n${hashEx.mkString("\n")}")
  }

  test("rolling distinct broadcasts the day list over deduped pairs") {
    // The 7-day fan-out joins a tiny day list against (day, user)
    // pairs: the range join must be a broadcast nested loop (the day
    // side is dozens of rows), never a cartesian of raw events.
    val plan = finalPlan(OpsQueries.rollingDistinct(spark, dir))
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("vocab coverage joins tokens against a broadcast vocabulary") {
    // The top-1k vocab is aggregation output (tiny); the token stream
    // must never shuffle for the membership check.
    val plan = finalPlan(OpsQueries.vocabCoverage(spark, dir))
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
  }

  test("deletion cascade anti-joins against a broadcast forget list") {
    val plan = finalPlan(OpsQueries.forgetUsers(spark, dir))
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      plan.take(3000))
  }

  test("star join rides broadcast dims, no cartesian anywhere") {
    val plan = finalPlan(Relational.q17Star(spark, dir))
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("correlated EXISTS plans as a semi-join, never a fan-out join") {
    val plan = finalPlan(Relational.q18Exists(spark, dir))
    assert(plan.contains("LeftSemi"), plan.take(3000))
  }

  test("bucketed fact join aggregates without exchanging on the order key") {
    // The whole point of the layout: neither fact side re-shuffles on
    // the order key even under the rollup (the tiny post-join priority
    // aggregation is the only exchange). The memoized driver query
    // checkpoints its result, so the contract drives the same layout
    // directly. Broadcast is disabled to pin the co-located SMJ path —
    // the shape that matters at fact×fact scale.
    import java.nio.file.Files
    val base = Files.createTempDirectory("graft_bktplan")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      graft.sources.Bucketed.write(Tables.orders(spark, dir)
          .select("o_orderkey", "o_orderpriority"),
        "graft_bp_orders", s"$base/o", "o_orderkey", 8)
      graft.sources.Bucketed.write(Tables.lineitem(spark, dir)
          .select("l_orderkey", "l_extendedprice"),
        "graft_bp_lineitem", s"$base/l", "l_orderkey", 8)
      val q = graft.sources.Bucketed.read(spark, "graft_bp_orders")
        .join(graft.sources.Bucketed.read(spark, "graft_bp_lineitem"),
          org.apache.spark.sql.functions.col("o_orderkey") ===
            org.apache.spark.sql.functions.col("l_orderkey"))
        .groupBy("o_orderpriority").count()
      val plan = finalPlan(q)
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey") &&
        !plan.contains("Exchange hashpartitioning(l_orderkey"),
        plan.take(3000))
      assert(plan.contains("SortMergeJoin"), plan.take(3000))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_bp_orders")
      spark.sql("DROP TABLE IF EXISTS graft_bp_lineitem")
      Scratch.deleteRecursively(base)
    }
  }

  test("partitioned scan prunes to the day range at the source") {
    // The 7-day filter must land in PartitionFilters (directory
    // pruning), not as a post-scan data filter over the full history.
    // Same layout as the memoized driver query, driven directly.
    import java.nio.file.Files
    import org.apache.spark.sql.functions.{col, to_date}
    val base = Files.createTempDirectory("graft_partplan")
    try {
      Tables.events(spark, dir).withColumn("day", to_date(col("ts")))
        .write.mode("overwrite").partitionBy("day").parquet(base.toString)
      val back = spark.read.parquet(base.toString)
      val days = back.select("day").distinct().orderBy("day")
        .collect().map(_.getDate(0))
      val q = back.filter(col("day") === days(days.length / 2)).groupBy("day").count()
      val plan = finalPlan(q)
      assert(plan.contains("PartitionFilters: [") &&
        plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
          .contains("day"),
        plan.take(3000))
    } finally Scratch.deleteRecursively(base)
  }

  test("bloom_join probes the fact scan inside codegen, before the join") {
    // sf0.01: sf0.001 has no NATION_7 suppliers, which short-circuits the
    // empty-dim path and would test nothing.
    val plan = finalPlan(OpsQueries.bloomJoinQuery(spark, "/root/testdata/sf0.01"))
    // The codegen'd probe must survive into the physical plan as a Filter
    // conjunct (i.e., not be optimized away or pushed into a UDF wrapper).
    assert(plan.contains("bloom_might_contain"), plan.take(3000))
    val filterAt = plan.indexOf("bloom_might_contain")
    val joinAt = plan.indexOf("Join")
    assert(joinAt >= 0 && filterAt > joinAt,
      // executedPlan prints top-down: the probe filter must appear BELOW
      // (after, in text) the join it feeds.
      s"probe not below the join: filter@$filterAt join@$joinAt\n${plan.take(3000)}")
  }

  test("merge_apply compacts the feed via WindowGroupLimit, not a full per-key sort") {
    // latestWins inside applyChanges must keep the rn<=1 shape that
    // Spark rewrites to per-group top-1 with early termination — a
    // change feed at 100 TB cannot afford full per-key sorts.
    val plan = finalPlan(OpsQueries.mergeApply(spark, dir))
    assert(plan.contains("WindowGroupLimit"), plan.take(3000))
  }

  test("key_overlap's sketch aggregate is one pass with map-side partials") {
    val plan = finalPlan(OpsQueries.keyOverlapProfile(spark, dir))
    // Three HLL sketches must come from ONE aggregate (partial_ rows in
    // the partial aggregate print), never three scans.
    assert(plan.contains("partial_approx_count_distinct")
      || plan.contains("partial_hyperloglog"), plan.take(3000))
  }

  test("lev_prefilter's predicate is rewritten to the banded 3-arg levenshtein") {
    val plan = finalPlan(OpsQueries.levPrefilter(spark, dir))
    // ThresholdLevenshteinRule: levenshtein(a,b) <= 2 → levenshtein(a,b,2) >= 0
    // (the threshold prints as Some(2) in the physical plan string).
    assert(plan.contains("Some(2)) >= 0"),
      s"banded rewrite missing from the physical plan:\n${plan.take(3000)}")
  }

  test("t_closeness broadcasts the 5-row segment table onto the class grid") {
    val plan = finalPlan(OpsQueries.tCloseness(spark, dir))
    // The class × segment grid join must never shuffle the class side
    // on account of a constant-size dimension.
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      plan.take(3000))
  }

  test("corr_matrix reads lineitem ONCE for all six correlations") {
    val plan = finalPlan(OpsQueries.corrMatrix(spark, dir))
    val scans = plan.linesIterator.filter(_.contains("FileScan parquet"))
      .map(_.dropWhile(c => c == ' ' || c == '+' || c == '-' || c == ':')).toSeq.distinct
    assert(scans.length == 1, s"expected 1 distinct lineitem scan, got ${scans.length}\n${plan.take(3000)}")
    // All six co-moment states must partial-aggregate map-side.
    assert(plan.contains("partial_corr") || plan.contains("partial corr")
      || plan.linesIterator.count(_.contains("HashAggregate")) >= 2, plan.take(3000))
  }

  test("eval_bootstrap partial-aggregates the exploded resamples map-side") {
    val plan = finalPlan(OpsQueries.evalBootstrap(spark, dir))
    // The ×100 Poisson explode must collapse in a partial aggregate
    // BEFORE the (event_type, b) exchange — shuffling 100× the event
    // table would be the scale bug.
    assert(plan.contains("Generate explode"), plan.take(3000))
    val aggLines = plan.linesIterator.filter(_.contains("HashAggregate")).toSeq
    assert(aggLines.exists(_.contains("partial_")),
      s"no partial aggregate below the explode:\n${plan.take(3000)}")
  }

  test("prefixFilterJaccard never degenerates to a cartesian product") {
    val corpus = DedupSimQueries.withMutations(spark, dir)
    val plan = finalPlan(graft.ops.Dedup.prefixFilterJaccard(
      corpus, "text", "doc_id", 3, 0.6, 10))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("KMeans.assign is exchange-free: centroids ride as a literal, rows never shuffle") {
    val e = Tables.embeddings(spark, dir)
    val cents = graft.ops.KMeans.initCentroids(e, "vec_id", "embedding", 4)
    val plan = finalPlan(graft.ops.KMeans.assign(e, "vec_id", "embedding", cents))
    assert(!plan.contains("Exchange"),
      s"assignment must be a narrow scoring pass:\n${plan.take(3000)}")
  }

  test("knn_classify selects neighbors via the bounded-heap TopKPerGroup operator") {
    val plan = finalPlan(DedupSimQueries.knnClassify(spark, dir))
    assert(plan.contains("TopKPerGroup"),
      s"neighbor selection must use the custom heap operator, not a sort:\n${plan.take(3000)}")
    // The query batch must broadcast into the scoring product.
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      plan.take(3000))
  }

  test("skipGramPairs generates pairs narrowly — one exchange total, for the count") {
    val docs = Tables.documents(spark, dir)
    val plan = finalPlan(
      graft.ops.TextAnalysis.skipGramPairs(docs, "text", window = 3, minCount = 5L))
    // The AQE string prints the same node in both the Final and Initial
    // sections with different plan_ids — strip them before dedup.
    val exchanges = plan.linesIterator
      .filter(_.contains("Exchange"))
      .map(_.dropWhile(c => c == ' ' || c == '+' || c == '-' || c == ':')
        .replaceAll("\\[plan_id=\\d+\\]", ""))
      .toSeq.distinct
    assert(exchanges.length == 1,
      s"expected exactly the (w,c)-keyed count exchange, got ${exchanges.length}:\n${plan.take(3000)}")
    assert(plan.contains("partial_count") || plan.contains("partial_"),
      s"pair counting must partial-aggregate map-side:\n${plan.take(3000)}")
  }

  test("nearest as-of computes both direction frames in ONE Window over one sort") {
    val plan = finalPlan(Relational.q8cAsofNearest(spark, dir))
    // Both frame functions must land in a single Window operator (one
    // exchange + one sort serve both directions) — two Window nodes would
    // mean Spark re-sorted or re-exchanged between the frames. The AQE
    // plan string prints the node once per section (Final + Initial), so
    // compare distinct node texts, not raw line count.
    val windows = plan.linesIterator.filter(_.contains("Window ["))
      .map(_.dropWhile(c => c == ' ' || c == '+' || c == '-' || c == ':')).toSeq.distinct
    assert(windows.length == 1, s"expected 1 distinct Window node, got ${windows.length}\n${plan.take(3000)}")
    assert(windows.head.contains("__hb") && windows.head.contains("__hf"),
      s"the single Window must compute both direction hits:\n${windows.head}")
  }

  test("q23 disjunctive bands stay a broadcast HASH join with an OR residual") {
    // The equi-key (l_partkey = p_partkey) must be extracted from the
    // disjunction: a planner that ORs the whole predicate falls back to
    // BroadcastNestedLoopJoin — the 100 TB kill.
    val plan = finalPlan(Relational.q23Disjunct(spark, dir))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("NestedLoop"), plan.take(2000))
  }

  test("q24 dormant pushes the order-date filter into the orders scan") {
    val plan = finalPlan(Relational.q24Dormant(spark, dir))
    assert(plan.contains("LeftAnti"), plan.take(3000))
    // The 2000-01-01 dormancy cutoff must reach the parquet reader.
    assert(plan.contains("PushedFilters: [IsNotNull(o_custkey), GreaterThanOrEqual(o_orderdate")
      || plan.contains("GreaterThanOrEqual(o_orderdate"), plan.take(3000))
  }

  test("OHLC rollup is one hash aggregate: no Window sort in the plan") {
    // open/close via min/max(struct(ts,id,value)) — if a refactor
    // reintroduces row_number the candlestick stops being mergeable
    // (and stops working as streaming state).
    val plan = finalPlan(StatQueries.eventsOhlc(spark, dir))
    assert(!plan.contains("Window ["), plan.take(3000))
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"),
      plan.take(3000))
  }

  test("basket triples stay equi-joins on the basket key — never a cartesian") {
    val plan = finalPlan(StatQueries.basketTriples(spark, dir))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("er_damerau scores pairs via the native codegen expression, no UDF") {
    val plan = finalPlan(DedupSimQueries.erDamerau(spark, dir))
    assert(plan.contains("damerau_levenshtein"), plan.take(3000))
    assert(!plan.toLowerCase.contains("batchevalpython"), plan.take(2000))
  }

  test("zonemap audit scans events once: one bucket aggregate, no per-predicate rescan") {
    val plan = finalPlan(StatQueries.zonemapPrune(spark, dir))
    // Three predicate rows union 64-row aggregates — the fact scan may
    // appear once per union branch in the plan tree, but each branch
    // reads the same single bucket aggregate; no join back to raw rows.
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
  }

  test("adamic-adar's global top-k is a TakeOrdered, never a full sort") {
    val plan = finalPlan(OpsQueries.linkAdamicAdar(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
  }

  test("shapley terms stay broadcast joins over the 16-row census") {
    // The only full-data pass is the per-user mask groupBy; everything
    // after (zeta sums, value table, 32 terms) must ride broadcasts.
    val plan = finalPlan(StatQueries.shapleyAttribution(spark, dir))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
  }

  test("binseg argmax goes through the bounded-heap top-1 operator") {
    val plan = finalPlan(StatQueries.changepointBinseg(spark, dir))
    assert(plan.contains("TopKPerGroup"), plan.take(3000))
  }

  test("OLS reduces to one aggregate: no join, no window, no sort") {
    val plan = finalPlan(StatQueries.olsNormal(spark, dir))
    assert(!plan.contains("Join"), plan.take(3000))
    assert(!plan.contains("Window ["), plan.take(3000))
  }

  test("q28 profit rides broadcast part/supplier/nation dims") {
    // The fact side shuffles only for the orders join + final agg;
    // every dimension must arrive as a broadcast.
    val plan = finalPlan(Relational.q28Profit(spark, dir))
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("price_index reads the lineitem-orders join ONCE (conditional pivot)") {
    // Both years pivot out of one part-keyed aggregate — a per-year
    // self-join would double the fact scan.
    val plan = finalPlan(OpsQueries.priceIndex(spark, dir))
    val factScans = plan.linesIterator
      .filter(l => l.contains("FileScan parquet") && l.contains("lineitem"))
      .map(_.dropWhile(c => c == ' ' || c == '+' || c == '-' || c == ':'))
      .toSeq.distinct
    assert(factScans.length <= 1,
      s"expected one lineitem scan, got ${factScans.length}\n${plan.take(3000)}")
  }

  test("slope_one and link_jaccard never degenerate to a cartesian") {
    // The deviation/path pair spaces are equi-joins (user key; middle
    // vertex) — a lost key would explode them quadratically.
    // slope_one's one BroadcastNestedLoopJoin is the 1-row n_ratings
    // constant build (same pattern as LM scoring) — only a true
    // cartesian over data-sized inputs is forbidden.
    val p1 = finalPlan(CmfQueries.slopeOne(spark, dir))
    assert(!p1.contains("CartesianProduct"), p1.take(3000))
    val p2 = finalPlan(OpsQueries.linkJaccard(spark, dir))
    assert(!p2.contains("CartesianProduct")
      && !p2.contains("BroadcastNestedLoopJoin"), p2.take(3000))
    assert(p2.contains("TakeOrderedAndProject"), p2.take(3000))
  }

  test("MAD outliers and QTE medians ride bucketed per-group windows") {
    // Exact medians must come from ChronoSplit's quantile-bucketed
    // order stats — a plain per-type Window would sort whole groups in
    // single tasks at scale.
    val p1 = finalPlan(StatQueries.eventsMadOutliers(spark, dir))
    assert(p1.contains("__graft_bucket"), p1.take(3000))
    val p2 = finalPlan(StatQueries.abQte(spark, dir))
    assert(p2.contains("__graft_bucket"), p2.take(3000))
  }

  test("concurrency peak's running sum goes through the bucketed sweep") {
    val plan = finalPlan(StatQueries.concurrencyPeak(spark, dir))
    assert(plan.contains("__graft_bucket"), plan.take(3000))
    assert(!plan.contains("Window []"), plan.take(3000))
  }

  test("tail index's top-k set is a TakeOrdered, never a global sort") {
    val plan = finalPlan(StatQueries.eventsTailIndex(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
  }
}
