package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking evaluation: Precision / Recall / F1 / NDCG / MAP @ k
  * (SURVEY §2 #16), the metric family the reference's tests print
  * (`/root/reference/src/test/scala/com/github/jongwook/cmf/IHRALS.scala:49-55`).
  *
  * Pure window + aggregation pipeline — per-user ranking is one window
  * shuffle on the user key, every metric is a partial-aggregable sum, and
  * k only ever multiplies the *top-maxK* slice (not the full prediction
  * list), so the cost at 100 TB is one ranked pass over predictions plus
  * aggregations over |users| × |ks| rows. No collect, no UDFs (the IDCG
  * series is a codegen'd higher-order `aggregate` over `sequence`).
  *
  * Definitions (binary relevance; users = distinct users in `truth`):
  *   P@k    = |top-k ∩ rel| / k
  *   R@k    = |top-k ∩ rel| / |rel|
  *   F1@k   = harmonic mean of P@k, R@k (0 when no hits)
  *   NDCG@k = Σ_{i≤k, hit} 1/log2(i+1)  /  Σ_{i≤min(|rel|,k)} 1/log2(i+1)
  *   MAP@k  = mean over users of Σ_{i≤k, hit} (hits≤i / i) / min(|rel|, k)
  * Ties in score are broken by ascending item id for determinism.
  */
object RankingEvaluation {

  /** @param predictions (userCol, itemCol, scoreCol) — ranked per user by
    *                    score desc, item asc
    * @param truth       (userCol, itemCol) — the relevant items per user
    * @param ks          cutoffs; one output row per k:
    *                    (k, precision_at, recall_at, f1_at, ndcg_at, map_at)
    */
  def evaluate(
      predictions: DataFrame,
      truth: DataFrame,
      userCol: String,
      itemCol: String,
      scoreCol: String,
      ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ > 0), "ks must be positive")
    val spark = predictions.sparkSession
    import spark.implicits._
    val maxK = ks.max

    val u = col(userCol)
    val w = Window.partitionBy(u).orderBy(col(scoreCol).desc, col(itemCol))
    val ranked = predictions
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= maxK)
      .select(u.as("u"), col(itemCol).as("i"), col("rn"))

    val rel = truth.select(u.as("u"), col(itemCol).as("i")).distinct()
    val nrel = rel.groupBy("u").agg(count(lit(1)).as("nrel"))

    // Hit-flag + cumulative hits (for AP) on the top-maxK slice only.
    val cumW = Window.partitionBy("u").orderBy("rn")
    val hits = ranked
      .join(rel.withColumn("rel", lit(1)), Seq("u", "i"), "left")
      .na.fill(0, Seq("rel"))
      .withColumn("cumhits", sum("rel").over(cumW))

    // Fan out over cutoffs: rows (u, k, rn, rel, cumhits) with rn <= k.
    val ksDf = broadcast(ks.toDF("k"))
    val perUserK = nrel
      .crossJoin(ksDf)
      .join(hits.join(ksDf, col("rn") <= col("k"))
          .groupBy("u", "k")
          .agg(
            sum("rel").as("hits"),
            sum(col("rel") / log2(col("rn") + 1)).as("dcg"),
            sum(col("rel") * col("cumhits") / col("rn")).as("apnum")),
        Seq("u", "k"), "left")
      .na.fill(0, Seq("hits", "dcg", "apnum"))

    val m = least(col("nrel"), col("k")).cast("int")
    val idcg = aggregate(
      sequence(lit(1), m),
      lit(0.0),
      (acc, i) => acc + lit(1.0) / log2(i.cast("double") + 1))
    val p = col("hits") / col("k")
    val r = col("hits") / col("nrel")

    perUserK
      .withColumn("idcg", idcg)
      .groupBy("k")
      .agg(
        avg(p).as("precision_at"),
        avg(r).as("recall_at"),
        avg(when(col("hits") === 0, 0.0).otherwise(lit(2.0) * p * r / (p + r))).as("f1_at"),
        avg(col("dcg") / col("idcg")).as("ndcg_at"),
        avg(col("apnum") / m).as("map_at"))
      .orderBy("k")
  }
}
