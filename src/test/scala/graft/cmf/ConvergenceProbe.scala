package graft.cmf

import graft.GraftSession
import graft.eval.RegressionEvaluation

/** Scratch diagnostic: RMSE vs iteration count on exact low-rank data. */
object ConvergenceProbe {
  /** Signed Gaussian factor — well-conditioned synthetic ground truth. */
  def signedFactor(seed: Long, id: Long, rank: Int): Array[Float] = {
    val out = new Array[Float](rank)
    var state = CollectiveALS.splitmix64(seed ^ CollectiveALS.splitmix64(id))
    var j = 0
    while (j < rank) {
      state = CollectiveALS.splitmix64(state)
      val u1 = ((state >>> 11) + 0.5) / (1L << 53).toDouble
      state = CollectiveALS.splitmix64(state)
      val u2 = ((state >>> 11) + 0.5) / (1L << 53).toDouble
      out(j) = (math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2) /
        math.sqrt(rank.toDouble)).toFloat
      j += 1
    }
    out
  }
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    import spark.implicits._
    val trueRank = 4
    val rows = for {
      u <- 0 until 120
      i <- 0 until 40
      if CollectiveALS.splitmix64(u * 10007L + i) % 4 == 0
    } yield {
      val fu = signedFactor(1L, u, trueRank)
      val fi = signedFactor(2L, i, trueRank)
      (u.toLong, i.toLong, fu.zip(fi).map { case (a, b) => a * b }.sum * 5.0f)
    }
    val ratings = rows.toDF("user", "item", "rating")
    for ((rk, reg, iters) <- Seq((4, 0.001, 40), (4, 0.001, 100), (4, 1e-6, 40), (8, 0.001, 20), (8, 1e-6, 20))) {
      val m = new CollectiveALS().setRank(rk).setMaxIter(iters)
        .setRegParam(reg).setSeed(7L).fit(ratings)
      val rmse = RegressionEvaluation.evaluate(m.predict(ratings), "rating", "prediction")
        .select("rmse").head.getDouble(0)
      println(s"PROBE rank=$rk reg=$reg iters=$iters rmse=$rmse")
    }
    spark.stop()
  }
}
