package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mean per-user AUC-ROC for implicit-feedback ranking — the probability
  * that a user's relevant item outranks an irrelevant one, computed in
  * the rank-sum (Mann-Whitney U) form:
  *
  *   AUC_u = (Σ_{p∈pos} rank_p − |pos|·(|pos|+1)/2) / (|pos|·|neg|)
  *
  * with ranks ascending by score over the user's scored items and score
  * ties resolved by the standard midrank (every tied row takes the
  * average rank of its tie group) — so a tied positive/negative pair
  * contributes the textbook 0.5, and the metric is order- and
  * engine-deterministic without depending on item ids. Users with no
  * positives or no negatives carry no signal and are excluded.
  *
  * Scale shape: one left join onto the (small per-user) truth set, one
  * window rank per user, one aggregation — every arithmetic before the
  * final mean is exact (pair counts are integers and midrank sums are
  * binary-exact halves, both far below 2^53), so the per-user AUC
  * values are reproducible on any engine. Reference metric family: collective-als's
  * RankingMetrics.scala (P/R/NDCG/MAP); AUC completes it for
  * implicit-preference fits.
  */
object AucEvaluation {

  /** One-row result: (n_users, mean_auc) over users holding at least
    * one positive and one negative among their scored items. */
  def evaluate(
      pred: DataFrame,
      truth: DataFrame,
      userCol: String,
      itemCol: String,
      predCol: String): DataFrame = {
    // distinct: duplicated truth pairs (a raw interaction log) must not
    // multiply scored rows — same contract as RankingEvaluation.
    val t = truth.select(col(userCol).as("u"), col(itemCol).as("i"))
      .distinct()
      .withColumn("rel", lit(1L))
    // pred dedups too: duplicate (user, item) prediction rows (a scorer
    // run twice, a union'd log) would each be ranked and counted, skewing
    // rank sums and pair counts. max(score) keeps the dedup deterministic.
    // Cost: one (u,i)-keyed exchange with map-side partial aggregation
    // ahead of the user-keyed rank window — correctness of an eval metric
    // over untrusted input is worth the extra hop.
    val scored = pred
      .select(col(userCol).as("u"), col(itemCol).as("i"), col(predCol).as("score"))
      .groupBy("u", "i")
      .agg(max("score").as("score"))
      .join(t, Seq("u", "i"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0L)))
    // Midrank: rank() gives the tie group's first position; adding
    // (tie-group size − 1)/2 averages over the group. Halves are exact
    // in binary, so the rank sums stay engine-reproducible.
    val w = Window.partitionBy("u").orderBy(col("score").asc)
    val tieN = Window.partitionBy("u", "score")
    val perUser = scored
      .withColumn("rnk",
        rank().over(w) + (count(lit(1)).over(tieN) - lit(1L)) / lit(2.0))
      .groupBy("u")
      .agg(
        sum("rel").as("npos"),
        count(lit(1)).as("n"),
        sum(when(col("rel") === 1L, col("rnk")).otherwise(lit(0.0)))
          .as("rsum"))
      .withColumn("nneg", col("n") - col("npos"))
      .filter(col("npos") > 0 && col("nneg") > 0)
      .withColumn("auc",
        (col("rsum") - col("npos") * (col("npos") + lit(1L)) / lit(2.0)) /
          (col("npos") * col("nneg")))
    perUser.agg(count(lit(1)).as("n_users"), round(avg("auc"), 6).as("mean_auc"))
  }
}
