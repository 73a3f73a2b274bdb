package graft.ops

import graft.GraftSession

/** Scratch probe: LSH-vs-exact diff for the DBSCAN eps-pair source
  * (planted-density families, threshold 0.9). */
object LshRecallProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val fam = graft.queries.DedupSimQueries
        .withDensityFamilies(spark, s"/root/testdata/$sf")
      val t0 = System.nanoTime()
      val exact = Dedup.embeddingCosine(fam, "embedding", "vec_id", 0.9)
        .select("vec_id_a", "vec_id_b").cache()
      val nExact = exact.count()
      val tExact = (System.nanoTime() - t0) / 1e9
      for ((p, b) <- Seq((256, 32), (256, 64))) {
        val t1 = System.nanoTime()
        val lsh = Dedup.embeddingCosineLsh(fam, "embedding", "vec_id", 0.9, p, b)
          .select("vec_id_a", "vec_id_b").cache()
        val nLsh = lsh.count()
        val t = (System.nanoTime() - t1) / 1e9
        val missed = exact.exceptAll(lsh).count()
        println(f"PROBE $sf th=0.9 p=$p b=$b exact=$nExact ($tExact%.1fs) " +
          f"lsh=$nLsh ($t%.1fs) missed=$missed")
        lsh.unpersist()
      }
      exact.unpersist()
    }
    spark.stop()
  }
}
