package graft.ops

import graft.{GraftSession, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scratch probe: hyperplane signature cost — native array_dot vs the
  * aggregate+zip_with HOF dot, inside the transform(...) lambda. */
object LshDotProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = "/root/testdata/sf0.1"
    def hofDot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("v"))
      .localCheckpoint(true)
    val hp = Similarity.hyperplanes(64, 16, 7L)
    val hpLit = typedLit(hp)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name%-16s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (n=$n)")
    }
    for (_ <- 0 until 2) {
      time("sig-native") {
        e.withColumn("sig",
          transform(hpLit, p => when(Similarity.dot(col("v"), p) > 0, 1).otherwise(0)))
          .select(sum(aggregate(col("sig"), lit(0), (a, x) => a + x))).head.getLong(0)
      }
      time("sig-hof") {
        e.withColumn("sig",
          transform(hpLit, p => when(hofDot(col("v"), p) > 0, 1).otherwise(0)))
          .select(sum(aggregate(col("sig"), lit(0), (a, x) => a + x))).head.getLong(0)
      }
      time("lshTopK-full") {
        Similarity.lshTopK(
          e.filter(pmod(col("id"), lit(50)) === 0), e, "id", "v", 5, 16, 8).count()
      }
    }
    spark.stop()
  }
}
