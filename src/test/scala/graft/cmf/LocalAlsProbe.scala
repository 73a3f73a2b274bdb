package graft.cmf

/** Pure-local ALS (no Spark) on the same fixture — isolates solver/math
  * from the distributed pipeline. */
object LocalAlsProbe {
  def main(args: Array[String]): Unit = {
    val trueRank = 4
    val rank = 4
    val reg = 0.001
    val nUsers = 120
    val nItems = 40
    val rows = for {
      u <- 0 until nUsers
      i <- 0 until nItems
      if CollectiveALS.splitmix64(u * 10007L + i) % 2 == 0
    } yield {
      val fu = ConvergenceProbe.signedFactor(1L, u, trueRank)
      val fi = ConvergenceProbe.signedFactor(2L, i, trueRank)
      (u, i, fu.zip(fi).map { case (a, b) => a * b }.sum * 5.0f)
    }
    val byUser = rows.groupBy(_._1)
    val byItem = rows.groupBy(_._2)
    val uf = Array.tabulate(nUsers)(u => CollectiveALS.initFactor(CollectiveALS.splitmix64(7L + 0), u, rank))
    val itf = Array.tabulate(nItems)(i => CollectiveALS.initFactor(CollectiveALS.splitmix64(7L + 1), i, rank))
    val solver = new CholeskySolver(rank)

    def solveSide(
        target: Array[Array[Float]],
        other: Array[Array[Float]],
        obs: Map[Int, Seq[(Int, Int, Float)]],
        pickOther: ((Int, Int, Float)) => Int,
        pickR: ((Int, Int, Float)) => Float): Unit = {
      obs.foreach { case (id, rs) =>
        val ne = NormalEq.zero(rank)
        rs.foreach { t =>
          val f = other(pickOther(t))
          NormalEq.addOuter(ne.ata, f, 1.0)
          NormalEq.axpy(ne.atb, f, pickR(t).toDouble)
          ne.n += 1
        }
        target(id) = solver.solve(ne.ata, ne.atb, ne.n * reg)
      }
    }

    def rmse(): Double = {
      val errs = rows.map { case (u, i, r) =>
        val p = uf(u).zip(itf(i)).map { case (a, b) => a * b }.sum
        val e = p - r; e * e
      }
      math.sqrt(errs.sum / errs.size)
    }

    for (iter <- 1 to 40) {
      solveSide(uf, itf, byUser, _._2, _._3)
      solveSide(itf, uf, byItem, _._1, _._3)
      if (Seq(1, 2, 5, 10, 20, 40).contains(iter)) println(s"LOCAL iter=$iter rmse=${rmse()}")
    }
  }
}
