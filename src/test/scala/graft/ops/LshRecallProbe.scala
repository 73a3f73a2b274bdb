package graft.ops

import graft.{GraftSession, Tables}

/** Scratch probe: LSH-vs-exact pair-set diff and wall time for the
  * embedding-cosine pair sources at each sf, across candidate (planes,
  * bands) design points — recall evidence for the graph-query swap. */
object LshRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val sfs = Seq("sf0.001", "sf0.01", "sf0.1")
    val designs = Seq((256, 32), (256, 64), (512, 64))
    for (sf <- sfs; th <- Seq(0.35, 0.4)) {
      val e = Tables.embeddings(spark, s"/root/testdata/$sf")
      val t0 = System.nanoTime()
      val exact = Dedup.embeddingCosine(e, "embedding", "vec_id", th)
        .select("vec_id_a", "vec_id_b").cache()
      val nExact = exact.count()
      val tExact = (System.nanoTime() - t0) / 1e9
      for ((p, b) <- designs) {
        val t1 = System.nanoTime()
        val lsh = Dedup.embeddingCosineLsh(e, "embedding", "vec_id", th, p, b)
          .select("vec_id_a", "vec_id_b").cache()
        val nLsh = lsh.count()
        val t = (System.nanoTime() - t1) / 1e9
        val missed = exact.exceptAll(lsh).count()
        println(f"PROBE $sf th=$th p=$p b=$b exact=$nExact ($tExact%.1fs) " +
          f"lsh=$nLsh ($t%.1fs) missed=$missed")
        lsh.unpersist()
      }
      exact.unpersist()
    }
    spark.stop()
  }
}
