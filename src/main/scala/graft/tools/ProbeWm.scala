package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Stage-wise timing probe for the weighted_median pipeline. */
object ProbeWm {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = GraftSession.get()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      // scalastyle:off println
      println(f"STAGE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val li = Tables.lineitem(spark, dir).select(
      col("l_returnflag").as("flag"),
      round(col("l_extendedprice") / col("l_quantity"), 6).as("unit"),
      col("l_quantity").as("wt"),
      (col("l_orderkey") * 8 + col("l_linenumber")).as("tie"),
      col("l_quantity").cast("long").as("wq"))
    t("count_li")(li.count())
    val os = t("construct_orderstats")(
      graft.ops.ChronoSplit.withOrderStats(li, "unit", "tie",
        partitionCols = Seq("flag"), sumCols = Seq("wq"), withRank = false))
    t("exec_orderstats")(os.write.format("noop").mode("overwrite").save())
    val tot = li.groupBy("flag").agg(sum("wt").as("tot"))
    val cum = os.join(tot, "flag")
      .filter(col(graft.ops.ChronoSplit.cumCol("wq")) * 2 >= col("tot"))
    t("exec_filtered")(cum.write.format("noop").mode("overwrite").save())
    val fin = cum.groupBy("flag")
      .agg(min(struct(col("unit"), col("tie"))).as("f"), max("tot").as("tot"))
    t("exec_final")(fin.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
