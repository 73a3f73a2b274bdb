package graft.ops

import graft.GraftSession
import graft.queries.DedupSimQueries
import org.apache.spark.sql.functions._

/** Scratch stage-timing probe for the near-dup pipelines at sf0.1. */
object DedupPerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    val corpus = DedupSimQueries.withMutations(spark, dir)
    time("corpus scan")(corpus.count())
    val withSh = corpus.select(col("doc_id").as("id"), Dedup.shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    time("shingles")(withSh.count())
    time("shingles x2")(withSh.count())
    import spark.implicits._
    val sigs = withSh.select("id", "sh").as[(Long, Seq[String])].mapPartitions { it =>
      it.flatMap { case (id, sh) =>
        val mins = Array.fill(32)(Long.MaxValue)
        sh.foreach { s =>
          val h0 = Hashing.xxh64(s, 42L)
          var i = 0
          while (i < 32) { val h = Hashing.xxh64(h0, i); if (h < mins(i)) mins(i) = h; i += 1 }
        }
        (0 until 8).map { b =>
          var key = 0x9E3779B97F4A7C15L
          var i = b * 4
          while (i < (b + 1) * 4) { key = Hashing.xxh64(mins(i), key); i += 1 }
          (id, b, key)
        }
      }
    }.toDF("id", "band", "bkey")
    time("signatures")(sigs.count())
    val cached = sigs.persist()
    time("signatures cached")(cached.count())
    val cand = cached.as("a").join(cached.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).dropDuplicates("id_a", "id_b")
    time("candidates (cached sigs)")(cand.count())
    time("full minhash")(Dedup.minHashLsh(corpus, "text", "doc_id", 3, 32, 8, 0.6).count())
    time("full simhash")(Dedup.simHash(DedupSimQueries.withLightMutations(spark, dir), "text", "doc_id", 3, 6).count())
    spark.stop()
  }
}
