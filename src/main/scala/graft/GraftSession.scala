package graft

import org.apache.spark.sql.SparkSession

/** Standard session factory: UTC, AQE, local-core-sized shuffle partitions,
  * and nanos-as-long parquet reads (the `events` table is TIMESTAMP(NANOS),
  * which vanilla Spark refuses). */
object GraftSession {
  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def get(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val s = builder(cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.register(s)
    s
  }
}
