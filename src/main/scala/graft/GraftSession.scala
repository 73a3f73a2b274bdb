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
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")

  def get(): SparkSession = {
    // Default to every core (the target environment is local[32]);
    // shuffle partitions track the core count per the sizing contract,
    // overridable independently for experiments.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val s = builder(cpus)
      .config("spark.sql.shuffle.partitions", shuffle)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.register(s)
    s
  }
}
