package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Throwaway diagnostic: compare the r16-style (i ≠ j) ordered sims
  * table with the r17 mirrored (i < j) construction at a given SF —
  * counts and full anti-join both ways on (i, j, sim_u). */
object CfCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = args(0)
    val rc = graft.queries.CmfQueries.coratedCapped(spark, dir)
    val n2 = rc.groupBy("i").agg(sum(col("q") * col("q")).as("s2"))
      .localCheckpoint(true)
    val width = spark.sparkContext.defaultParallelism
    val a = rc.select(col("u"), col("i"), col("q")).repartition(width, col("u"))
    val b = rc.select(col("u"), col("i").as("j"), col("q").as("qj"))
      .repartition(width, col("u"))
    def withSim(dots: org.apache.spark.sql.DataFrame) = dots
      .join(n2.select(col("i"), col("s2").as("s2i")), "i")
      .join(n2.select(col("i").as("j"), col("s2").as("s2j")), "j")
      .withColumn("sim_u",
        round(col("dot") / (sqrt(col("s2i")) * sqrt(col("s2j"))) * 1000000, 0)
          .cast("long"))
      .filter(col("sim_u") > 0)
      .select("i", "j", "sim_u")
    val old = withSim(
      a.join(b, Seq("u")).filter(col("i") =!= col("j"))
        .groupBy("i", "j").agg(sum(col("q") * col("qj")).as("dot")))
      .localCheckpoint(true)
    val halfSims = withSim(
      a.join(b, Seq("u")).filter(col("i") < col("j"))
        .groupBy("i", "j").agg(sum(col("q") * col("qj")).as("dot")))
      .localCheckpoint(true)
    val mirrored = halfSims.unionByName(
      halfSims.select(col("j").as("i"), col("i").as("j"), col("sim_u")))
      .localCheckpoint(true)
    // scalastyle:off println
    println(s"OLD count=${old.count()}  MIRRORED count=${mirrored.count()}")
    println(s"old minus mirrored: ${old.except(mirrored).count()}")
    println(s"mirrored minus old: ${mirrored.except(old).count()}")
    // scalastyle:on println
    spark.stop()
  }
}
