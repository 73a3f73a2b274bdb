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

  /** (custkey, partkey, spend, qty) interaction table. Materialized once
    * (localCheckpoint): the plan consumes it on two branches (predictions
    * and truth) and would otherwise recompute the join+agg per branch. */
  private def interactions(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("u"), col("l_partkey").as("i"))
      .agg(sum("l_extendedprice").as("score"), sum("l_quantity").as("qty"))
      .localCheckpoint(true)

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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "eval_regression" -> (evalRegression _),
    "eval_ranking"    -> (evalRanking _),
    "eval_auc"        -> (evalAuc _),
  )

  val oracles: Map[String, String] = Map(
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
        |  round(sum((prediction - l_quantity)^2) / count(*), 6) AS mse,
        |  round(sqrt(sum((prediction - l_quantity)^2) / count(*)), 6) AS rmse,
        |  round(sum(abs(prediction - l_quantity)) / count(*), 6) AS mae,
        |  round(1.0 - sum((prediction - l_quantity)^2)
        |      / (sum(l_quantity^2) - sum(l_quantity)^2 / count(*)), 6) AS r2
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
