package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed diff between two snapshot generations of the same logical
  * table — the audit a lake needs after every re-crawl/re-ingest:
  * which rows appeared, which vanished, which changed content.
  *
  * Scale shape: one full-outer shuffle join on the key (the minimum
  * any diff needs); content comparison collapses each side's compare
  * columns to a single md5 before the join, so wide rows ship 16
  * bytes, not their payload. Unchanged rows — the overwhelming
  * majority at 100 TB — are dropped immediately after the join.
  */
object Snapshot {

  /** (keyCols*, status) for every key whose membership or content
    * differs between `oldDf` and `newDf`: status ∈
    * {'added', 'removed', 'changed'}. Unchanged keys are absent. */
  def diff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    require(compareCols.nonEmpty, "at least one compare column")
    def fingered(df: DataFrame, tag: String) = df.select(
      keyCols.map(col) :+
        md5(concat_ws("", compareCols.map(c => col(c).cast("string")): _*))
          .as("_h" + tag): _*)
    fingered(oldDf, "o")
      .join(fingered(newDf, "n"), keyCols, "full_outer")
      .withColumn("status",
        when(col("_ho").isNull, lit("added"))
          .when(col("_hn").isNull, lit("removed"))
          .when(col("_ho") =!= col("_hn"), lit("changed")))
      .filter(col("status").isNotNull)
      .select(keyCols.map(col) :+ col("status"): _*)
  }
}
