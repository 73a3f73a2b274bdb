package graft.tools

import graft.GraftSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Throwaway diagnostic: the old per-iteration SMJ PageRank loop vs the
  * broadcast form now in [[graft.ops.PageRank]], compared bit-for-bit on
  * the ROUNDED rank outputs of both pagerank queries at the given SF
  * (double sums are order-sensitive in the last ulp — this verifies the
  * rounded values land identically under the new join strategy). */
object PrCheck {
  def oldRun(edges: DataFrame, iterations: Int, damping: Double): DataFrame = {
    val e = edges.select(col("s").cast("long").as("s"),
      col("t").cast("long").as("t")).localCheckpoint(true)
    val deg = e.groupBy("s").agg(count(lit(1)).as("d")).localCheckpoint(true)
    val n = deg.count().toDouble
    var p = deg.select(col("s").as("v"), lit(1.0 / n).as("p"))
    for (_ <- 1 to iterations) {
      p = e.join(p, col("s") === col("v"))
        .join(deg, "s")
        .groupBy(col("t"))
        .agg(sum(col("p") / col("d")).as("m"))
        .select(col("t").as("v"),
          (lit((1 - damping) / n) + lit(damping) * col("m")).as("p"))
        .localCheckpoint(true)
    }
    p
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = args(0)
    def edgesOf(q: String): DataFrame = q match {
      case "banded" =>
        val pairs = graft.queries.DedupSimQueries.bandedCosinePairs(spark, dir, 0.4)
          .select(col("vec_id_a").as("s"), col("vec_id_b").as("t"))
        pairs.unionAll(pairs.select(col("t").as("s"), col("s").as("t")))
      case "knn" =>
        val e = graft.Tables.embeddings(spark, dir)
        val topk = graft.queries.DedupSimQueries
          .embIvfIndex(spark, dir).search(e, "vec_id", "embedding", 5, 32)
        val fwd = topk.select(col("query_id").as("s"), col("neighbor_id").as("t"))
        fwd.unionAll(fwd.select(col("t").as("s"), col("s").as("t"))).distinct()
    }
    // scalastyle:off println
    Seq("banded", "knn").foreach { q =>
      val ed = edgesOf(q).localCheckpoint(true)
      val o = oldRun(ed, 5, 0.85)
        .select(col("v"), round(col("p"), 6).as("r")).localCheckpoint(true)
      val nw = graft.ops.PageRank.run(ed, "s", "t", 5)
        .select(col("v"), round(col("p"), 6).as("r")).localCheckpoint(true)
      println(s"$q: old=${o.count()} new=${nw.count()} " +
        s"oldMinusNew=${o.except(nw).count()} newMinusOld=${nw.except(o).count()}")
      // Also compare the RAW doubles for ulp drift visibility.
      val or = oldRun(ed, 5, 0.85).withColumnRenamed("p", "po")
      val nr = graft.ops.PageRank.run(ed, "s", "t", 5)
      val drift = or.join(nr, "v").filter(col("po") =!= col("p")).count()
      println(s"$q: raw-double drift rows = $drift")
    }
    // scalastyle:on println
    spark.stop()
  }
}
