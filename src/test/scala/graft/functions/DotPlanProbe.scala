package graft.functions

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Scratch probe: confirm ArrayDot participates in whole-stage codegen. */
object DotPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.select(col("vec_id"),
        graft.functions.array_dot(col("embedding"), col("embedding")).as("d"))
      .filter(col("d") > 0)
    q.explain("formatted")
    println("PROBE rows=" + q.count())
    spark.stop()
  }
}
