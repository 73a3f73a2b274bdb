import org.apache.spark.sql.functions._
object CrashProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = DegenerateProbe.fixture(spark)
    for (q <- args) {
      try { graft.SparkEntry.queries(q)(spark, dir).collect(); println(s"OK $q") }
      catch { case e: Throwable =>
        println(s"FAIL $q: " + Option(e.getMessage).getOrElse(e.getClass.getName).replace('\n',' ').take(300))
        val root = Option(e.getCause).getOrElse(e)
        root.getStackTrace.filter(_.getClassName.startsWith("graft")).take(5)
          .foreach(f => println(s"  at $f"))
      }
    }
  }
}
