package graft.tools

import graft.{GraftSession, SparkEntry}

/** Print the formatted physical plan of one query (debugging aid). */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val df = SparkEntry.queries(args(1))(spark, args(0))
    // scalastyle:off println
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    // scalastyle:on println
    spark.stop()
  }
}
