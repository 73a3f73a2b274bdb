package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers for co-located joins — the storage-layout half
  * of shuffle avoidance: two tables bucketed (and sort-ordered) by the
  * same key into the same bucket count join with NO exchange on either
  * side, because bucket pruning gives both scans the same hash
  * partitioning. At 100 TB this turns every recurring fact⋈fact join on
  * the bucket key from a full two-sided shuffle into a local merge.
  */
object Bucketed {

  /** Write `df` as a bucketed, per-bucket-sorted table registered in the
    * session catalog (external, at `path`). */
  def write(
      df: DataFrame,
      table: String,
      path: String,
      bucketCol: String,
      numBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
