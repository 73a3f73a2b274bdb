package graft.cmf

import graft.GraftSession
import graft.queries.CmfQueries

/** Scratch timing probe: explicit ALS fit stages at sf0.1. */
object AlsPerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = "/root/testdata/sf0.1"
    val ratings = CmfQueries.custPartRatings(spark, dir)
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    time("ratings materialize")(ratings.count())
    for (iters <- Seq(1, 3)) {
      time(s"fit maxIter=$iters") {
        new CollectiveALS("cust", "part")
          .setRank(8).setMaxIter(iters).setRegParam(0.1).setSeed(42L)
          .fit(ratings)
      }
    }
    val model = new CollectiveALS("cust", "part")
      .setRank(8).setMaxIter(3).setRegParam(0.1).setSeed(42L).fit(ratings)
    time("predict + count")(model.predict(ratings).count())
    spark.stop()
  }
}
