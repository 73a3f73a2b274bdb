package graft.eval

import org.apache.spark.sql.DataFrame

/** Builder-style facade over [[RankingEvaluation]] mirroring the metric
  * API the reference's tests drive
  * (`/root/reference/src/test/scala/com/github/jongwook/cmf/IHRALS.scala:43-55`:
  * construct on (predicted, groundTruth), set column names, then
  * `precisionAt/recallAt/ndcgAt/mapAt(ks)`).
  *
  * Ground-truth relevance is membership in `groundTruth` (binary); rank
  * predictions by `predictionCol` descending. Each `*At(ks)` call with a
  * new `ks` runs one evaluation job (cached per distinct `ks`).
  */
class RankingMetrics(predictions: DataFrame, groundTruth: DataFrame) {

  private var userCol = "user"
  private var itemCol = "item"
  private var predictionCol = "prediction"

  def setUserCol(value: String): this.type = { userCol = value; this }
  def setItemCol(value: String): this.type = { itemCol = value; this }
  def setPredictionCol(value: String): this.type = { predictionCol = value; this }
  /** Accepted for reference-API compatibility; relevance here is binary
    * membership in the ground-truth set, so the rating column itself is
    * not consulted. */
  def setRatingCol(value: String): this.type = this

  private val cache =
    scala.collection.mutable.Map.empty[Seq[Int], Map[Int, Map[String, Double]]]

  private def eval(ks: Seq[Int]): Map[Int, Map[String, Double]] =
    cache.getOrElseUpdate(ks, {
      RankingEvaluation
        .evaluate(predictions, groundTruth, userCol, itemCol, predictionCol, ks)
        .collect()
        .map { r =>
          r.getAs[Int]("k") -> Seq("precision_at", "recall_at", "f1_at", "ndcg_at", "map_at")
            .map(m => m -> r.getAs[Double](m)).toMap
        }.toMap
    })

  private def metric(name: String)(ks: Seq[Int]): Seq[Double] = {
    val byK = eval(ks)
    ks.map(k => byK(k)(name))
  }

  def precisionAt(ks: Seq[Int]): Seq[Double] = metric("precision_at")(ks)
  def recallAt(ks: Seq[Int]): Seq[Double] = metric("recall_at")(ks)
  def f1At(ks: Seq[Int]): Seq[Double] = metric("f1_at")(ks)
  def ndcgAt(ks: Seq[Int]): Seq[Double] = metric("ndcg_at")(ks)
  def mapAt(ks: Seq[Int]): Seq[Double] = metric("map_at")(ks)
}

object RankingMetrics {
  def apply(predictions: DataFrame, groundTruth: DataFrame): RankingMetrics =
    new RankingMetrics(predictions, groundTruth)
}
