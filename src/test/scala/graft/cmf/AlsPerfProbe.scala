package graft.cmf

import graft.GraftSession
import graft.queries.CmfQueries
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scratch timing probe: explicit ALS fit stages at sf0.1. */
object AlsPerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = "/root/testdata/sf0.1"
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val ratings = time("ratings localCheckpoint")(CmfQueries.custPartRatings(spark, dir))

    // Stage-by-stage replica of fit() internals (2-entity explicit).
    val data = ratings.select(
      col("cust").cast("long").as("leftId"),
      col("part").cast("long").as("rightId"),
      col("rating").cast("float").as("rating"))
    val byLeft = data.repartition(col("leftId")).persist(StorageLevel.MEMORY_AND_DISK)
    val byRight = byLeft.repartition(col("rightId")).persist(StorageLevel.MEMORY_AND_DISK)
    time("layout byLeft")(byLeft.count())
    time("layout byRight")(byRight.count())

    import spark.implicits._
    val k = 8
    def init(idsName: String, src: org.apache.spark.sql.DataFrame, s: Long) = time(s"init $idsName") {
      src.distinct().as[Long]
        .mapPartitions(it => it.map(id => (id, CollectiveALS.initFactor(s, id, k))))
        .toDF("id", "features").localCheckpoint(true)
    }
    var custF = init("cust", byLeft.select(col("leftId").as("id")), 1L)
    var partF = init("part", byRight.select(col("rightId").as("id")), 2L)

    val neUdaf = org.apache.spark.sql.functions.udaf(new NormalEqAggregator(k, false, 1.0))
    for (hs <- 0 until 4) {
      time(s"half-step $hs") {
        val f = partF.hint("shuffle_hash")
        val grouped = byRight.join(f, col("rightId") === f("id"))
          .select(col("leftId").as("id"), f("features").as("features"), col("rating"))
          .groupBy("id").agg(neUdaf(col("features"), col("rating"), lit(0)).as("ne"))
        val solved = grouped
          .select(col("id"), col("ne.ata"), col("ne.atb"), col("ne.n"))
          .as[(Long, Array[Double], Array[Double], Long)]
          .mapPartitions { iter =>
            val solver = new CholeskySolver(k)
            iter.map { case (id, ata, atb, n) => (id, solver.solve(ata, atb, n * 0.1)) }
          }
          .toDF("id", "features").localCheckpoint(true)
        custF = solved
      }
    }
    time("full fit maxIter=3") {
      new CollectiveALS("cust", "part")
        .setRank(8).setMaxIter(3).setRegParam(0.1).setSeed(42L)
        .fit(ratings)
    }
    spark.stop()
  }
}
