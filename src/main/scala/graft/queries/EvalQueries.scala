package graft.queries

import graft.Tables
import graft.eval.{RankingEvaluation, RegressionEvaluation}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver wiring for the evaluation pack (SURVEY §2 #15–16). Both queries
  * build a deterministic predictor from the TPC-H-ish tables in-query (so
  * the DuckDB oracle can reproduce it exactly) and run the graft evaluators
  * on it.
  */
object EvalQueries {

  private val interactionsCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  /** (custkey, partkey, spend, qty) interaction table. Materialized once
    * PER (session, dir) — previously each calling query re-executed the
    * join+agg and cut a fresh checkpoint; three ranking metrics consume
    * the same table (single-run-session memo, same convention as the
    * CmfQueries/DedupSimQueries caches). */
  private def interactions(s: SparkSession, dir: String): DataFrame =
    interactionsCache.getOrElseUpdate((s, dir),
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("u"), col("l_partkey").as("i"))
        .agg(sum("l_extendedprice").as("score"), sum("l_quantity").as("qty"))
        .localCheckpoint(true))

  /** #15 regression eval: predict l_quantity by the per-part mean quantity;
    * score the predictor with RMSE/MAE/MSE/R². */
  def evalRegression(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val perPart = li.groupBy("l_partkey").agg(avg("l_quantity").as("prediction"))
    val scored = li.select(col("l_partkey"), col("l_quantity").as("label"))
      .join(perPart, Seq("l_partkey"))
    RegressionEvaluation.evaluate(scored, "label", "prediction")
      .select(
        col("n"),
        round(col("mse"), 6).as("mse"),
        round(col("rmse"), 6).as("rmse"),
        round(col("mae"), 6).as("mae"),
        round(col("r2"), 6).as("r2"))
  }

  /** #16 ranking eval: rank each customer's parts by total spend; relevant
    * = parts with total quantity > 25; P/R/F1/NDCG/MAP @ {5, 10}. */
  def evalRanking(s: SparkSession, dir: String): DataFrame = {
    val inter = interactions(s, dir)
    val pred = inter.select("u", "i", "score")
    val truth = inter.filter(col("qty") > 25).select("u", "i")
    RankingEvaluation.evaluate(pred, truth, "u", "i", "score", Seq(5, 10))
      .select(
        col("k"),
        round(col("precision_at"), 6).as("precision_at"),
        round(col("recall_at"), 6).as("recall_at"),
        round(col("f1_at"), 6).as("f1_at"),
        round(col("ndcg_at"), 6).as("ndcg_at"),
        round(col("map_at"), 6).as("map_at"))
  }

  /** #16b mean per-user AUC-ROC on the same deterministic predictor and
    * truth set as #16 — the implicit-feedback metric (rank-sum form). */
  def evalAuc(s: SparkSession, dir: String): DataFrame = {
    val inter = interactions(s, dir)
    graft.eval.AucEvaluation.evaluate(
      inter.select("u", "i", "score"),
      inter.filter(col("qty") > 25).select("u", "i"),
      "u", "i", "score")
  }

  /** Events split at the time midpoint: side 0 trains the simple
    * predictors below, side 1 scores them — the same chronological
    * discipline the drift screens use. */
  private def timeSided(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).withColumn("ts_us", unix_micros(col("ts")))
    val mid = ev.agg(expr("(min(ts_us) + max(ts_us)) div 2").as("mid"))
    ev.crossJoin(broadcast(mid))
      .withColumn("side", when(col("ts_us") <= col("mid"), 0).otherwise(1))
  }

  /** #15b calibration audit (reliability diagram): a per-(type, hour)
    * mean-value predictor fit on the first time half is scored on the
    * second; test rows bin into prediction deciles (ntile over the
    * deterministic (prediction, event_id) order) and each bin reports
    * mean predicted vs mean observed — the gap IS the miscalibration.
    * Unseen (type, hour) cells fall back to the global train mean, so
    * every test row is scored. */
  def evalCalibration(s: SparkSession, dir: String): DataFrame = {
    val sided = timeSided(s, dir)
      .withColumn("hod", expr("(ts_us % 86400000000) div 3600000000"))
    val train = sided.filter(col("side") === 0)
    val cellMean = train.groupBy("event_type", "hod")
      .agg(avg("value").as("cell_pred"))
    val globalMean = train.agg(avg("value").as("global_pred"))
    // Checkpointed ONCE: withNtile's bucketed-rank machinery makes four
    // passes over its input (count, approx-quantile probe, bucket-count
    // collect, final window) — without the barrier each pass re-executed
    // the full score pipeline (two scans of events + the calibration
    // joins), 4× the work for identical rows (§5 multiply-consumed
    // subtree).
    val scored = sided.filter(col("side") === 1)
      .join(cellMean, Seq("event_type", "hod"), "left")
      .crossJoin(broadcast(globalMean))
      .withColumn("prediction", coalesce(col("cell_pred"), col("global_pred")))
      .localCheckpoint(true)
    // Exact ntile(10) via ChronoSplit.withNtile — the bucketed-rank
    // integer formula, identical to the oracle's ntile, with no
    // unpartitioned WindowExec over the scored rows (the prior global
    // ntile window sorted every prediction in one task).
    graft.ops.ChronoSplit.withNtile(scored, "prediction", "event_id", 10, "bin")
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        round(avg("prediction"), 6).as("mean_pred"),
        round(avg("value"), 6).as("mean_actual"))
      .orderBy("bin")
  }

  /** #15c Brier score + log-loss for a binary outcome (event is a
    * purchase): a per-user purchase-rate predictor fit on the first
    * time half scores the second (global train rate for unseen users).
    * Probabilities clamp to [1e-6, 1−1e-6] before the log — the
    * standard guard, pinned identically in the oracle. */
  def evalBrier(s: SparkSession, dir: String): DataFrame = {
    val sided = timeSided(s, dir)
      .withColumn("y", when(col("event_type") === "purchase", 1.0).otherwise(0.0))
    val train = sided.filter(col("side") === 0)
    val userRate = train.groupBy("user_id").agg(avg("y").as("user_p"))
    val globalRate = train.agg(avg("y").as("global_p"))
    val scored = sided.filter(col("side") === 1)
      .join(userRate, Seq("user_id"), "left")
      .crossJoin(broadcast(globalRate))
      .withColumn("p", coalesce(col("user_p"), col("global_p")))
      .withColumn("pc", least(greatest(col("p"), lit(1e-6)), lit(1.0 - 1e-6)))
    scored.agg(
      count(lit(1)).as("n_test"),
      round(avg("y"), 6).as("base_rate"),
      round(avg((col("p") - col("y")) * (col("p") - col("y"))), 6).as("brier"),
      round(avg(-(col("y") * log(col("pc"))
        + (lit(1.0) - col("y")) * log(lit(1.0) - col("pc")))), 6).as("logloss"))
  }

  /** #15d split-conformal prediction intervals per event type: fit a
    * per-type mean on the chronological first half, take the
    * ceil(0.9·(m+1))-th smallest absolute calibration residual as the
    * interval half-width (the finite-sample 90% guarantee), and audit
    * the empirical coverage on the held-out tail.
    *
    * Exactness: values become integer micros and residuals stay the
    * exact integer |v_us·n_train − sum_us| (|y − μ| scaled through by
    * n_train), so the quantile pick is an integer order statistic with
    * a pinned (residual, event_id) tie-break, and coverage is an exact
    * integer comparison — no float enters until the display divides.
    * Scale: the per-type order statistic runs through
    * [[graft.ops.ChronoSplit.withOrderStats]]' bucketed windows; model
    * and quantile tables are |event_type|-scale broadcasts. */
  def conformalInterval(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.ChronoSplit
    val ev = Tables.events(s, dir).select(
      col("event_id"), col("ts"), col("event_type"),
      round(col("value") * 1000000, 0).cast("long").as("v_us"))
    val Seq(train, calib, test) =
      ChronoSplit.split(ev, Seq(0.5, 0.25, 0.25), "ts", "event_id")
    val model = train.groupBy("event_type")
      .agg(count(lit(1)).as("n_train"), sum("v_us").as("sum_us"))
    val calR = calib.join(broadcast(model), "event_type")
      .withColumn("res", abs(col("v_us") * col("n_train") - col("sum_us")))
    val sizes = calR.groupBy("event_type").agg(count(lit(1)).as("n_calib"))
    val q = ChronoSplit.withOrderStats(calR, "res", "event_id",
        partitionCols = Seq("event_type"))
      .join(broadcast(sizes), "event_type")
      .filter(col(ChronoSplit.RankCol) === ceil((col("n_calib") + 1) * 0.9))
      .select(col("event_type"), col("res").as("q_scaled"), col("n_calib"))
    val cov = test.join(broadcast(model), "event_type")
      .join(broadcast(q), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_test"),
        sum(when(abs(col("v_us") * col("n_train") - col("sum_us"))
          <= col("q_scaled"), 1).otherwise(0)).as("n_cov"))
    model.join(broadcast(q), "event_type").join(broadcast(cov), "event_type")
      .select(col("event_type"), col("n_train"), col("n_calib"), col("n_test"),
        round(col("sum_us") / col("n_train") / lit(1000000.0), 6).as("mu"),
        round(col("q_scaled") / col("n_train") / lit(1000000.0), 6).as("half_width"),
        round(col("n_cov") / col("n_test"), 6).as("coverage"))
      .orderBy("event_type")
  }

  /** The binary purchase predictor shared by [[evalPrAuc]] and
    * [[evalLift]]: per-user train-half purchase rate (global rate for
    * unseen users) scoring the test half — the same chrono discipline
    * as [[evalBrier]], but keeping the rate as the exact integer pair
    * (s_u, n_u) so the float probability is one correctly-rounded
    * division on both engines. */
  private val purchaseScoredCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private def purchaseScored(s: SparkSession, dir: String): DataFrame =
    // Memoized + checkpointed per (session, dir): SIX ranking/calibration
    // metrics score this predictor; previously each re-ran the chrono
    // split + train aggregation + scoring join.
    purchaseScoredCache.getOrElseUpdate((s, dir), {
      val sided = timeSided(s, dir)
        .withColumn("y",
          when(col("event_type") === "purchase", 1L).otherwise(0L))
      val train = sided.filter(col("side") === 0)
      val userRate = train.groupBy("user_id")
        .agg(sum("y").as("s_u"), count(lit(1)).as("n_u"))
      val globalRate = train.agg(sum("y").as("s_g"), count(lit(1)).as("n_g"))
      sided.filter(col("side") === 1)
        .join(userRate, Seq("user_id"), "left")
        .crossJoin(broadcast(globalRate))
        .withColumn("p", coalesce(col("s_u") / col("n_u"), col("s_g") / col("n_g")))
        .withColumn("neg_p", -col("p"))
        .withColumn("p_base", col("s_g") / col("n_g"))
        .select("event_id", "y", "p", "neg_p", "p_base")
        .localCheckpoint(true)
    })

  /** #16d average precision (PR-AUC) of the chrono-split purchase
    * predictor: rank the test half by predicted probability (ties
    * broken by event_id), AP = mean over positives of precision@rank.
    * Each precision term rounds to integer ppm BEFORE the sum
    * (round-then-sum), so float addition order cannot move the digit.
    * Scale: the global rank runs through ChronoSplit's quantile-bucketed
    * order stats — no unpartitioned WindowExec over the scored rows. */
  def evalPrAuc(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.ChronoSplit
    val ranked = ChronoSplit.withOrderStats(
      purchaseScored(s, dir), "neg_p", "event_id", sumCols = Seq("y"))
    val rank = col(ChronoSplit.RankCol)
    val cum = col(ChronoSplit.cumCol("y"))
    ranked
      .withColumn("term_ppm",
        when(col("y") === 1L,
          round(cum * lit(1000000.0) / rank, 0).cast("long"))
          .otherwise(0L))
      .agg(count(lit(1)).as("n_test"), sum("y").as("n_pos"),
        sum("term_ppm").as("sum_ppm"))
      .select(col("n_test"), col("n_pos"),
        when(col("n_pos") > 0,
          round(col("sum_ppm") / lit(1000000.0) / col("n_pos"), 6))
          .as("avg_precision"),
        when(col("n_test") > 0,
          round(col("n_pos") / col("n_test"), 6)).as("base_rate"))
  }

  /** #16e cumulative gains / lift table: test rows in deciles of the
    * predicted purchase probability (exact bucketed ntile, (p DESC,
    * event_id) order); each decile reports its exact positive count,
    * the cumulative capture share, and lift vs the base rate — every
    * input to the two display divisions is an exact integer product.
    * The cumulative window runs over the 10-row decile aggregate. */
  def evalLift(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.ChronoSplit
    import org.apache.spark.sql.expressions.Window
    val byDecile = ChronoSplit.withNtile(
        purchaseScored(s, dir), "neg_p", "event_id", 10, "decile")
      .groupBy("decile")
      .agg(count(lit(1)).as("n"), sum("y").as("n_pos"))
    val tot = byDecile.agg(sum("n").as("n_tot"), sum("n_pos").as("pos_tot"))
    val w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    byDecile
      .withColumn("cum_n", sum("n").over(w))
      .withColumn("cum_pos", sum("n_pos").over(w))
      .crossJoin(broadcast(tot))
      .select(col("decile"), col("n"), col("n_pos"),
        when(col("pos_tot") > 0,
          round(col("cum_pos") / col("pos_tot"), 6)).as("cum_capture"),
        when(col("pos_tot") * col("cum_n") > 0,
          round(col("cum_pos") * col("n_tot") / (col("pos_tot") * col("cum_n")), 6))
          .as("cum_lift"))
      .orderBy("decile")
  }

  /** #16f confusion matrix + Matthews correlation of the purchase
    * predictor thresholded at the train base rate (predict 1 when the
    * user's train rate meets or beats the global train rate — the
    * "better than average" classifier). TP/FP/FN/TN are exact integer
    * tallies; precision/recall/F1 are single integer-ratio divisions;
    * MCC's numerator is an exact DECIMAL(38,0) product difference
    * (HUGEINT in the oracle) and its denominator one deterministic
    * double product chain under sqrt. Degenerate margins (a zero row
    * or column) surface as NULL rather than a divide-by-zero. */
  def evalMcc(s: SparkSession, dir: String): DataFrame = {
    val scored = purchaseScored(s, dir)
      .withColumn("pred", when(col("p") >= col("p_base"), 1L).otherwise(0L))
    scored.agg(
        sum(col("y") * col("pred")).as("tp"),
        sum((lit(1L) - col("y")) * col("pred")).as("fp"),
        sum(col("y") * (lit(1L) - col("pred"))).as("fn"),
        sum((lit(1L) - col("y")) * (lit(1L) - col("pred"))).as("tn"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        expr("case when tp + fp > 0 then round(cast(tp as double)/(tp + fp), 6) end")
          .as("precision"),
        expr("case when tp + fn > 0 then round(cast(tp as double)/(tp + fn), 6) end")
          .as("recall"),
        expr("case when 2*tp + fp + fn > 0 then round(cast(2*tp as double)/(2*tp + fp + fn), 6) end")
          .as("f1"),
        expr("""case when tp + fp > 0 and tp + fn > 0 and tn + fp > 0 and tn + fn > 0 then
          round(cast(cast(tp as decimal(38,0))*tn - cast(fp as decimal(38,0))*fn as double)
            / sqrt(cast(tp + fp as double)*(tp + fn)*(tn + fp)*(tn + fn)), 6) end""")
          .as("mcc"))
  }

  /** #16h expected calibration error + Murphy's Brier decomposition of
    * the purchase predictor — the "is the probability a probability"
    * readout on top of [[evalBrier]]'s scalar score:
    * Brier = REL − RES + UNC over 10 exact ntile bins of p. Per-row
    * probabilities round to NANO units before the per-bin sums, every
    * per-bin term (n_b·|gap|, n_b·gap², n_b·resgap²) rounds to nano
    * before its 10-way sum (round-then-sum), and UNC = ȳ(1−ȳ) is an
    * exact-rational double. The binning is the bucketed exact ntile —
    * no unpartitioned window over scored rows. */
  def evalEce(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.ChronoSplit
    val bins = ChronoSplit.withNtile(
        purchaseScored(s, dir), "p", "event_id", 10, "bin")
      .withColumn("p_nano", expr("cast(round(p*1e9, 0) as bigint)"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_b"), sum("y").as("sy"), sum("p_nano").as("sp"))
    val tot = bins.agg(sum("n_b").as("n"), sum("sy").as("sytot"))
    val terms = bins.crossJoin(broadcast(tot))
      .withColumn("gap", expr("sp/1e9/n_b - cast(sy as double)/n_b"))
      .withColumn("rgap", expr("cast(sy as double)/n_b - cast(sytot as double)/n"))
      .withColumn("ece_t", expr("cast(round(n_b*abs(gap)*1e9, 0) as bigint)"))
      .withColumn("rel_t", expr("cast(round(n_b*gap*gap*1e9, 0) as bigint)"))
      .withColumn("res_t", expr("cast(round(n_b*rgap*rgap*1e9, 0) as bigint)"))
    terms.groupBy("n", "sytot")
      .agg(sum("ece_t").as("se"), sum("rel_t").as("srel"), sum("res_t").as("sres"))
      .select(col("n").as("n_test"),
        expr("round(se/1e9/n, 6)").as("ece"),
        expr("round(srel/1e9/n, 6)").as("reliability"),
        expr("round(sres/1e9/n, 6)").as("resolution"),
        expr("""round(cast(sytot as double)/n*(1 - cast(sytot as double)/n), 6)""")
          .as("uncertainty"),
        expr("""round(srel/1e9/n - sres/1e9/n
          + cast(sytot as double)/n*(1 - cast(sytot as double)/n), 6)""")
          .as("brier_decomposed"))
  }

  /** #16i Kolmogorov-Smirnov separation of the purchase predictor's
    * score distributions (positives vs negatives) — the threshold-free
    * "can this score separate the classes at all" companion to
    * [[evalAuc]]: KS = max_t |F₁(t) − F₀(t)|. Scores group by their
    * exact one-division double; the CDF gap maximized is the EXACT
    * integer |C₁·N₀ − C₀·N₁| (cross-multiplied, no float CDFs), the
    * best threshold breaks ties toward the smallest score, and one
    * division happens at display. Cumulative class counts ride the
    * bucketed order stats over the DISTINCT-score table. */
  def evalKs(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.ChronoSplit
    val byScore = purchaseScored(s, dir)
      .groupBy("p")
      .agg(sum("y").as("c1"), sum(lit(1L) - col("y")).as("c0"))
    val cum = ChronoSplit.withOrderStats(byScore, "p", "p",
        sumCols = Seq("c1", "c0"), withRank = false)
      .withColumnRenamed(ChronoSplit.cumCol("c1"), "cc1")
      .withColumnRenamed(ChronoSplit.cumCol("c0"), "cc0")
    val tot = byScore.agg(sum("c1").as("n1"), sum("c0").as("n0"))
    val gaps = cum.crossJoin(broadcast(tot))
      .withColumn("gap", abs(col("cc1") * col("n0") - col("cc0") * col("n1")))
    val best = gaps.agg(max("gap").as("mg"))
    gaps.join(broadcast(best), col("gap") === col("mg"))
      .groupBy("n1", "n0", "mg")
      .agg(min("p").as("p_at"))
      .select(col("n1").as("n_pos"), col("n0").as("n_neg"),
        expr("""case when n1 > 0 and n0 > 0 then
          round(cast(mg as double)/(cast(n1 as double)*n0), 6) end""").as("ks"),
        expr("round(p_at, 6)").as("ks_at_p"))
  }

  /** #16j R-precision of the purchase predictor — precision at the
    * break-even depth R = |relevant|, the single-number ranking metric
    * that needs no k choice: rank the test half by (p DESC, event_id)
    * through the bucketed order stats, read the exact positive count
    * at depth R, divide once. */
  def evalRprecision(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.ChronoSplit
    val ranked = ChronoSplit.withOrderStats(
      purchaseScored(s, dir), "neg_p", "event_id", sumCols = Seq("y"))
    val r = ranked.agg(sum("y").as("n_pos"), count(lit(1)).as("n_test"))
    ranked.crossJoin(broadcast(r))
      .filter(col(ChronoSplit.RankCol) === col("n_pos"))
      .select(col("n_test"), col("n_pos"),
        expr(s"round(cast(${ChronoSplit.cumCol("y")} as double)/n_pos, 6)")
          .as("r_precision"))
  }

  /** #16k MRR@10 over the per-customer part ranking — "how deep does a
    * user scroll before the first hit", the navigational complement to
    * MAP's averaged precision: reciprocal of the FIRST relevant rank
    * within the top 10 (0 past it), averaged over customers with any
    * relevant item. Per-user reciprocals round to ppm before the mean
    * (round-then-sum); ranks are per-user windows. */
  def evalMrr(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val inter = interactions(s, dir)
    val truth = inter.filter(col("qty") > 25).select("u", "i")
    val ranked = inter.withColumn("rn", row_number().over(
      Window.partitionBy("u").orderBy(col("score").desc, col("i"))))
    val firstRel = ranked.join(truth, Seq("u", "i"))
      .filter(col("rn") <= 10)
      .groupBy("u").agg(min("rn").as("fr"))
    truth.select("u").distinct()
      .join(firstRel, Seq("u"), "left")
      .withColumn("rr_ppm", expr(
        "case when fr is not null then cast(round(1000000.0/fr) as bigint) else cast(0 as bigint) end"))
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("fr").isNotNull, 1L).otherwise(0L)).as("n_hit10"),
        expr("round(sum(rr_ppm)/1e6/count(1), 6)").as("mrr_at_10"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "eval_rprecision"  -> (evalRprecision _),
    "eval_mrr"         -> (evalMrr _),
    "eval_ks"          -> (evalKs _),
    "eval_ece"         -> (evalEce _),
    "eval_mcc"         -> (evalMcc _),
    "eval_regression"  -> (evalRegression _),
    "eval_ranking"     -> (evalRanking _),
    "eval_auc"         -> (evalAuc _),
    "eval_calibration" -> (evalCalibration _),
    "eval_brier"       -> (evalBrier _),
    "eval_pr_auc"      -> (evalPrAuc _),
    "eval_lift"        -> (evalLift _),
    "conformal_interval" -> (conformalInterval _),
  )

  /** Shared DuckDB CTE chain for the chrono-split purchase predictor —
    * the SQL mirror of [[purchaseScored]]. */
  private val purchaseScoredSql: String =
    """WITH sided AS (
      |  SELECT event_id, user_id,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
      |    CASE WHEN epoch_us(ts) <=
      |      (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 FROM events)
      |      THEN 0 ELSE 1 END AS side
      |  FROM events
      |), ur AS (
      |  SELECT user_id, sum(y)::BIGINT AS s_u, count(*)::BIGINT AS n_u
      |  FROM sided WHERE side = 0 GROUP BY 1
      |), gr AS (
      |  SELECT sum(y)::BIGINT AS s_g, count(*)::BIGINT AS n_g
      |  FROM sided WHERE side = 0
      |), scored AS (
      |  SELECT s.event_id, s.y, coalesce(s_u / n_u, s_g / n_g) AS p,
      |    s_g / n_g AS p_base
      |  FROM sided s LEFT JOIN ur USING (user_id) CROSS JOIN gr
      |  WHERE s.side = 1
      |)""".stripMargin

  val oracles: Map[String, String] = Map(
    // Same per-user (score DESC, i) rank; ppm round-then-sum.
    "eval_mrr" ->
      """WITH inter AS (
        |  SELECT o_custkey AS u, l_partkey AS i,
        |    sum(l_extendedprice) AS score, sum(l_quantity) AS qty
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2
        |), truth AS (SELECT u, i FROM inter WHERE qty > 25),
        |ranked AS (
        |  SELECT u, i, row_number() OVER (PARTITION BY u ORDER BY score DESC, i) AS rn
        |  FROM inter
        |), fr AS (
        |  SELECT r.u, min(r.rn) AS fr
        |  FROM ranked r JOIN truth t ON r.u = t.u AND r.i = t.i
        |  WHERE r.rn <= 10 GROUP BY 1
        |), us AS (SELECT DISTINCT u FROM truth)
        |SELECT count(*)::BIGINT AS n_users,
        |  sum(CASE WHEN fr.fr IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hit10,
        |  round(sum(CASE WHEN fr.fr IS NOT NULL
        |    THEN CAST(round(1000000.0/fr.fr) AS BIGINT) ELSE 0 END)/1e6/count(*), 6)
        |    AS mrr_at_10
        |FROM us LEFT JOIN fr ON us.u = fr.u""".stripMargin,
    // Same (p DESC, event_id) rank; exact positive count at depth R.
    "eval_rprecision" -> (purchaseScoredSql +
      """, ranked AS (
        |  SELECT y, row_number() OVER (ORDER BY p DESC, event_id) AS rn,
        |    sum(y) OVER (ORDER BY p DESC, event_id
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM scored
        |), r AS (
        |  SELECT sum(y)::BIGINT AS n_pos, count(*)::BIGINT AS n_test FROM scored
        |)
        |SELECT r.n_test, r.n_pos,
        |  round(CAST(ranked.cum AS DOUBLE)/r.n_pos, 6) AS r_precision
        |FROM ranked CROSS JOIN r WHERE ranked.rn = r.n_pos""".stripMargin),
    // Cross-multiplied integer CDF gap |C1·N0 − C0·N1| maximized
    // exactly; smallest-score tie-break; one display division.
    "eval_ks" -> (purchaseScoredSql +
      """, bys AS (
        |  SELECT p, sum(y)::BIGINT AS c1, sum(1 - y)::BIGINT AS c0
        |  FROM scored GROUP BY 1
        |), cum AS (
        |  SELECT p,
        |    sum(c1) OVER (ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS cc1,
        |    sum(c0) OVER (ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS cc0
        |  FROM bys
        |), tot AS (
        |  SELECT sum(c1)::BIGINT AS n1, sum(c0)::BIGINT AS n0 FROM bys
        |), gaps AS (
        |  SELECT p, abs(cc1*n0 - cc0*n1) AS gap, n1, n0
        |  FROM cum CROSS JOIN tot
        |), best AS (SELECT max(gap) AS mg FROM gaps)
        |SELECT n1 AS n_pos, n0 AS n_neg,
        |  CASE WHEN n1 > 0 AND n0 > 0 THEN
        |    round(CAST(mg AS DOUBLE)/(CAST(n1 AS DOUBLE)*n0), 6) END AS ks,
        |  round(min(p), 6) AS ks_at_p
        |FROM gaps JOIN best ON gap = mg
        |GROUP BY n1, n0, mg""".stripMargin),
    // Same exact ntile bins; nano round-then-sum per-bin terms; the
    // decomposition identity repeats the engine's chains.
    "eval_ece" -> (purchaseScoredSql +
      """, binned AS (
        |  SELECT y, CAST(round(p*1e9, 0) AS BIGINT) AS p_nano,
        |    ntile(10) OVER (ORDER BY p, event_id) AS bin
        |  FROM scored
        |), bins AS (
        |  SELECT bin, count(*)::BIGINT AS n_b, sum(y)::BIGINT AS sy,
        |    sum(p_nano)::BIGINT AS sp
        |  FROM binned GROUP BY 1
        |), tot AS (SELECT sum(n_b)::BIGINT AS n, sum(sy)::BIGINT AS sytot FROM bins),
        |terms AS (
        |  SELECT n, sytot, n_b,
        |    sp/1e9/n_b - CAST(sy AS DOUBLE)/n_b AS gap,
        |    CAST(sy AS DOUBLE)/n_b - CAST(sytot AS DOUBLE)/n AS rgap
        |  FROM bins CROSS JOIN tot
        |), ag AS (
        |  SELECT n, sytot,
        |    sum(CAST(round(n_b*abs(gap)*1e9, 0) AS BIGINT))::BIGINT AS se,
        |    sum(CAST(round(n_b*gap*gap*1e9, 0) AS BIGINT))::BIGINT AS srel,
        |    sum(CAST(round(n_b*rgap*rgap*1e9, 0) AS BIGINT))::BIGINT AS sres
        |  FROM terms GROUP BY 1, 2
        |)
        |SELECT n AS n_test, round(se/1e9/n, 6) AS ece,
        |  round(srel/1e9/n, 6) AS reliability,
        |  round(sres/1e9/n, 6) AS resolution,
        |  round(CAST(sytot AS DOUBLE)/n*(1 - CAST(sytot AS DOUBLE)/n), 6)
        |    AS uncertainty,
        |  round(srel/1e9/n - sres/1e9/n
        |    + CAST(sytot AS DOUBLE)/n*(1 - CAST(sytot AS DOUBLE)/n), 6)
        |    AS brier_decomposed
        |FROM ag""".stripMargin),
    // Exact integer confusion tallies; MCC numerator in HUGEINT, the
    // denominator one double product chain under sqrt; NULL guards on
    // degenerate margins mirror the engine's CASE.
    "eval_mcc" -> (purchaseScoredSql +
      """, pred AS (
        |  SELECT y, CASE WHEN p >= p_base THEN 1 ELSE 0 END::BIGINT AS pred
        |  FROM scored
        |), cm AS (
        |  SELECT sum(y * pred)::BIGINT AS tp,
        |    sum((1 - y) * pred)::BIGINT AS fp,
        |    sum(y * (1 - pred))::BIGINT AS fn,
        |    sum((1 - y) * (1 - pred))::BIGINT AS tn
        |  FROM pred
        |)
        |SELECT tp, fp, fn, tn,
        |  CASE WHEN tp + fp > 0 THEN round(CAST(tp AS DOUBLE)/(tp + fp), 6) END AS precision,
        |  CASE WHEN tp + fn > 0 THEN round(CAST(tp AS DOUBLE)/(tp + fn), 6) END AS recall,
        |  CASE WHEN 2*tp + fp + fn > 0 THEN round(CAST(2*tp AS DOUBLE)/(2*tp + fp + fn), 6) END AS f1,
        |  CASE WHEN tp + fp > 0 AND tp + fn > 0 AND tn + fp > 0 AND tn + fn > 0 THEN
        |    round(CAST(CAST(tp AS HUGEINT)*tn - CAST(fp AS HUGEINT)*fn AS DOUBLE)
        |      / sqrt(CAST(tp + fp AS DOUBLE)*(tp + fn)*(tn + fp)*(tn + fn)), 6) END AS mcc
        |FROM cm""".stripMargin),
    // Precision terms round to integer ppm before the sum, so the AP
    // hash cannot move with float addition order.
    "eval_pr_auc" -> (purchaseScoredSql +
      """, ranked AS (
        |  SELECT y, row_number() OVER (ORDER BY p DESC, event_id) AS rn,
        |    sum(y) OVER (ORDER BY p DESC, event_id
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM scored
        |)
        |SELECT count(*)::BIGINT AS n_test, sum(y)::BIGINT AS n_pos,
        |  CASE WHEN sum(y) > 0 THEN
        |    round(sum(CASE WHEN y = 1
        |      THEN CAST(round(cum * 1000000.0 / rn, 0) AS BIGINT)
        |      ELSE 0 END) / 1000000.0 / sum(y), 6) END AS avg_precision,
        |  CASE WHEN count(*) > 0 THEN
        |    round(sum(y) / count(*), 6) END AS base_rate
        |FROM ranked""".stripMargin),
    // Deciles via exact ntile; captures/lifts divide exact integer
    // products once at display.
    "eval_lift" -> (purchaseScoredSql +
      """, binned AS (
        |  SELECT y, ntile(10) OVER (ORDER BY p DESC, event_id)::BIGINT AS decile
        |  FROM scored
        |), byd AS (
        |  SELECT decile, count(*)::BIGINT AS n, sum(y)::BIGINT AS n_pos
        |  FROM binned GROUP BY 1
        |), tot AS (
        |  SELECT sum(n)::BIGINT AS n_tot, sum(n_pos)::BIGINT AS pos_tot FROM byd
        |), cum AS (
        |  SELECT decile, n, n_pos,
        |    sum(n) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_n,
        |    sum(n_pos) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_pos
        |  FROM byd
        |)
        |SELECT decile, n, n_pos,
        |  CASE WHEN pos_tot > 0 THEN
        |    round(cum_pos / pos_tot, 6) END AS cum_capture,
        |  CASE WHEN pos_tot * cum_n > 0 THEN
        |    round(cum_pos * n_tot / (pos_tot * cum_n), 6) END AS cum_lift
        |FROM cum CROSS JOIN tot ORDER BY decile""".stripMargin),
    // Residuals are the exact integer |v_us*n_train - sum_us|; the
    // chrono slices reproduce ChronoSplit.split's floor(cum-weight * n)
    // rank boundaries over (ts, event_id).
    "conformal_interval" ->
      """WITH r AS (
        |  SELECT event_id, event_type,
        |    CAST(round(value * 1000000, 0) AS BIGINT) AS v_us,
        |    row_number() OVER (ORDER BY epoch_us(ts), event_id) AS rn,
        |    count(*) OVER () AS n
        |  FROM events
        |), model AS (
        |  SELECT event_type, count(*)::BIGINT AS n_train,
        |    sum(v_us)::BIGINT AS sum_us
        |  FROM r WHERE rn <= floor(0.5 * n) GROUP BY 1
        |), calib AS (
        |  SELECT r.event_type, r.event_id,
        |    abs(r.v_us * m.n_train - m.sum_us) AS res
        |  FROM r JOIN model m USING (event_type)
        |  WHERE rn > floor(0.5 * n) AND rn <= floor(0.75 * n)
        |), q AS (
        |  SELECT event_type, res AS q_scaled, n_calib FROM (
        |    SELECT event_type, res,
        |      row_number() OVER (PARTITION BY event_type
        |        ORDER BY res, event_id) AS rk,
        |      count(*) OVER (PARTITION BY event_type) AS n_calib
        |    FROM calib)
        |  WHERE rk = ceil((n_calib + 1) * 0.9)
        |), cov AS (
        |  SELECT t.event_type, count(*)::BIGINT AS n_test,
        |    sum(CASE WHEN abs(t.v_us * m.n_train - m.sum_us) <= q.q_scaled
        |        THEN 1 ELSE 0 END)::BIGINT AS n_cov
        |  FROM (SELECT event_type, v_us FROM r WHERE rn > floor(0.75 * n)) t
        |  JOIN model m USING (event_type) JOIN q USING (event_type)
        |  GROUP BY 1
        |)
        |SELECT m.event_type, m.n_train, q.n_calib, c.n_test,
        |  round(m.sum_us / m.n_train / 1000000.0, 6) AS mu,
        |  round(q.q_scaled / m.n_train / 1000000.0, 6) AS half_width,
        |  round(c.n_cov / c.n_test, 6) AS coverage
        |FROM model m JOIN q USING (event_type) JOIN cov c USING (event_type)
        |ORDER BY event_type""".stripMargin,
    "eval_calibration" ->
      """WITH sided AS (
        |  SELECT *, epoch_us(ts) AS ts_us,
        |    (epoch_us(ts) % 86400000000) // 3600000000 AS hod,
        |    CASE WHEN epoch_us(ts) <=
        |      (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 FROM events)
        |      THEN 0 ELSE 1 END AS side
        |  FROM events
        |), cell AS (
        |  SELECT event_type, hod, avg(value) AS cell_pred
        |  FROM sided WHERE side = 0 GROUP BY 1, 2
        |), gm AS (SELECT avg(value) AS global_pred FROM sided WHERE side = 0),
        |scored AS (
        |  SELECT s.value, s.event_id,
        |    coalesce(cell_pred, global_pred) AS prediction
        |  FROM sided s
        |  LEFT JOIN cell ON cell.event_type = s.event_type AND cell.hod = s.hod
        |  CROSS JOIN gm
        |  WHERE s.side = 1
        |), binned AS (
        |  SELECT value, prediction,
        |    ntile(10) OVER (ORDER BY prediction, event_id)::BIGINT AS bin
        |  FROM scored
        |)
        |SELECT bin, count(*) AS n, round(avg(prediction), 6) AS mean_pred,
        |  round(avg(value), 6) AS mean_actual
        |FROM binned GROUP BY bin ORDER BY bin""".stripMargin,
    "eval_brier" ->
      """WITH sided AS (
        |  SELECT user_id,
        |    CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y,
        |    CASE WHEN epoch_us(ts) <=
        |      (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 FROM events)
        |      THEN 0 ELSE 1 END AS side
        |  FROM events
        |), ur AS (
        |  SELECT user_id, avg(y) AS user_p FROM sided WHERE side = 0 GROUP BY 1
        |), gr AS (SELECT avg(y) AS global_p FROM sided WHERE side = 0),
        |scored AS (
        |  SELECT y, coalesce(user_p, global_p) AS p,
        |    least(greatest(coalesce(user_p, global_p), 1e-6), 1.0 - 1e-6) AS pc
        |  FROM sided LEFT JOIN ur USING (user_id) CROSS JOIN gr
        |  WHERE side = 1
        |)
        |SELECT count(*) AS n_test, round(avg(y), 6) AS base_rate,
        |  round(avg((p - y) * (p - y)), 6) AS brier,
        |  round(avg(-(y * ln(pc) + (1.0 - y) * ln(1.0 - pc))), 6) AS logloss
        |FROM scored""".stripMargin,
    // AUC: rank sums and pair counts are exact (midranks are halves,
    // exact in binary), so the per-user values mirror exactly.
    "eval_auc" ->
      """WITH inter AS (
        |  SELECT o_custkey AS u, l_partkey AS i,
        |    sum(l_extendedprice) AS score, sum(l_quantity) AS qty
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2
        |), truth AS (
        |  SELECT u, i FROM inter WHERE qty > 25
        |), scored AS (
        |  -- mirror the Spark side's (u,i) pred dedup (max score). inter is
        |  -- already grouped by (u,i) so this is a no-op today, but it keeps
        |  -- the oracle faithful if the pred feed ever carries duplicates.
        |  SELECT r.u, r.i, max(r.score) AS score,
        |    max(CASE WHEN t.i IS NOT NULL THEN 1 ELSE 0 END) AS rel
        |  FROM inter r LEFT JOIN truth t ON r.u = t.u AND r.i = t.i
        |  GROUP BY r.u, r.i
        |), ranked AS (
        |  SELECT u, rel,
        |    rank() OVER (PARTITION BY u ORDER BY score ASC)
        |      + (count(*) OVER (PARTITION BY u, score) - 1) / 2.0 AS rnk
        |  FROM scored
        |), per_user AS (
        |  SELECT u, sum(rel)::BIGINT AS npos, count(*)::BIGINT AS n,
        |    sum(CASE WHEN rel = 1 THEN rnk ELSE 0 END) AS rsum
        |  FROM ranked GROUP BY u
        |)
        |SELECT count(*) AS n_users,
        |  round(avg((rsum - npos * (npos + 1) / 2.0) / (npos * (n - npos))), 6)
        |    AS mean_auc
        |FROM per_user WHERE npos > 0 AND npos < n""".stripMargin,
    "eval_regression" ->
      """WITH p AS (
        |  SELECT l_partkey, avg(l_quantity) AS prediction FROM lineitem GROUP BY 1
        |)
        |SELECT count(*) AS n,
        |  CASE WHEN count(*) > 0 THEN
        |    round(sum((prediction - l_quantity)^2) / count(*), 6) END AS mse,
        |  CASE WHEN count(*) > 0 THEN
        |    round(sqrt(sum((prediction - l_quantity)^2) / count(*)), 6) END AS rmse,
        |  CASE WHEN count(*) > 0 THEN
        |    round(sum(abs(prediction - l_quantity)) / count(*), 6) END AS mae,
        |  CASE WHEN count(*) > 0
        |      AND sum(l_quantity^2) - sum(l_quantity)^2 / count(*) <> 0 THEN
        |    round(1.0 - sum((prediction - l_quantity)^2)
        |      / (sum(l_quantity^2) - sum(l_quantity)^2 / count(*)), 6) END AS r2
        |FROM lineitem JOIN p USING (l_partkey)""".stripMargin,
    "eval_ranking" ->
      """WITH inter AS (
        |  SELECT o_custkey AS u, l_partkey AS i,
        |    sum(l_extendedprice) AS score, sum(l_quantity) AS qty
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2
        |), truth AS (
        |  SELECT u, i FROM inter WHERE qty > 25
        |), ranked AS (
        |  SELECT u, i, row_number() OVER (PARTITION BY u ORDER BY score DESC, i) AS rn
        |  FROM inter
        |), cum AS (
        |  SELECT r.u, r.rn,
        |    CASE WHEN t.i IS NOT NULL THEN 1 ELSE 0 END AS rel,
        |    sum(CASE WHEN t.i IS NOT NULL THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY r.u ORDER BY r.rn) AS cumhits
        |  FROM ranked r LEFT JOIN truth t ON r.u = t.u AND r.i = t.i
        |  WHERE r.rn <= 10
        |), nrel AS (
        |  SELECT u, count(*) AS nrel FROM truth GROUP BY u
        |), ks AS (SELECT unnest([5, 10]) AS k
        |), stats AS (
        |  SELECT n.u, ks.k, max(n.nrel) AS nrel,
        |    coalesce(sum(c.rel), 0) AS hits,
        |    coalesce(sum(c.rel / log2(c.rn + 1)), 0) AS dcg,
        |    coalesce(sum(c.rel * c.cumhits / c.rn), 0) AS apnum
        |  FROM nrel n CROSS JOIN ks
        |  LEFT JOIN cum c ON c.u = n.u AND c.rn <= ks.k
        |  GROUP BY n.u, ks.k
        |), idcg_tab AS (
        |  SELECT m.m, sum(1.0 / log2(i.i + 1)) AS idcg
        |  FROM (SELECT unnest([1,2,3,4,5,6,7,8,9,10]) AS m) m
        |  JOIN (SELECT unnest([1,2,3,4,5,6,7,8,9,10]) AS i) i ON i.i <= m.m
        |  GROUP BY m.m
        |), full_stats AS (
        |  SELECT s.*, t.idcg FROM stats s JOIN idcg_tab t ON t.m = least(s.nrel, s.k)
        |)
        |SELECT k,
        |  round(avg(hits / k), 6) AS precision_at,
        |  round(avg(hits / nrel), 6) AS recall_at,
        |  round(avg(CASE WHEN hits = 0 THEN 0
        |    ELSE 2.0 * (hits / k) * (hits / nrel) / ((hits / k) + (hits / nrel)) END), 6) AS f1_at,
        |  round(avg(dcg / idcg), 6) AS ndcg_at,
        |  round(avg(apnum / least(nrel, k)), 6) AS map_at
        |FROM full_stats GROUP BY k ORDER BY k""".stripMargin,
  )
}
