import org.apache.spark.sql.functions._

/** Degenerate-corpus sweep: run every batch query against a 1-3-row
  * corpus and report queries that THROW (empty results are fine;
  * crashes on tiny/edge partitions are not). Not a ScalaTest suite —
  * a probe main, run on demand:
  *   sbt "Test/runMain DegenerateProbe"
  */
object DegenerateProbe {
  /** Writes the 1-3-row corpus and returns its dir. */
  def fixture(spark: org.apache.spark.sql.SparkSession): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("degen").toString

    def w(name: String)(df: org.apache.spark.sql.DataFrame): Unit =
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$name.parquet")

    w("region")(Seq((0, "AFRICA")).toDF("r_regionkey", "r_name"))
    w("nation")(Seq((0, "ALGERIA", 0)).toDF("n_nationkey", "n_name", "n_regionkey"))
    w("customer")(Seq((1L, "Customer#1", 0, 100.0, "BUILDING"),
      (2L, "Customer#2", 0, -5.0, "MACHINERY"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
    w("supplier")(Seq((1L, "Supplier#1", 0, 10.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal"))
    w("part")(Seq((1L, "blue part one", "Brand#1", "TYPE A", 5, 100.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"))
    w("orders")(Seq(
      (1L, 1L, "O", 100.0, "1995-03-01 00:00:00", "1-URGENT"),
      (2L, 2L, "F", 200.0, "1996-07-01 00:00:00", "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "d",
        "o_orderpriority")
      .withColumn("o_orderdate", to_timestamp(col("d"))).drop("d"))
    w("lineitem")(Seq(
      (1L, 1L, 1L, 1, 10.0, 100.0, 0.05, 0.02, "N", "O", "1995-03-05 00:00:00"),
      (2L, 1L, 1L, 2, 5.0, 50.0, 0.0, 0.01, "R", "F", "1996-07-05 00:00:00"))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "d")
      .withColumn("l_shipdate", to_timestamp(col("d"))).drop("d"))
    w("events")(Seq(
      (1L, 1000000L, 1L, "view", 10.0, "p"),
      (2L, 3600000000L, 1L, "purchase", 60.0, "p"),
      (3L, 90000000000L, 2L, "click", 99.0, "p"))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props"))
    w("documents")(Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "en", "web", 44L),
      (2L, "a b", "de", "wiki", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val v1 = Array.tabulate(64)(i => (i % 7).toFloat / 7f)
    val v2 = Array.tabulate(64)(i => ((i + 3) % 5).toFloat / 5f)
    w("embeddings")(Seq((1L, v1, 0), (2L, v2, 1))
      .toDF("vec_id", "embedding", "label"))
    dir
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = fixture(spark)
    val skip = args.headOption.getOrElse("stream_")
    var crashes = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!name.startsWith(skip)) {
        try {
          fn(spark, dir).collect()
        } catch {
          case e: Throwable =>
            crashes += 1
            val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
              .replace('\n', ' ').take(220)
            println(s"CRASH $name: $msg")
        }
      }
    }
    println(s"DEGENERATE SWEEP DONE crashes=$crashes")
  }
}
