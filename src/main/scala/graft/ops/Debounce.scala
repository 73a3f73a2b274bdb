package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key temporal debouncing: flag events that repeat within
  * `minGapUs` of the previous event of the same key — the telemetry
  * thinning that strips double-clicks, retry storms and sensor chatter
  * before rate metrics are computed over the feed.
  *
  * Scale shape: one exchange on the key columns, one lag window — the
  * same sessionization shape as [[Sessionize]], state one row deep.
  * Note the gap is measured against the previous RAW event, not the
  * previous kept one (single-pass semantics; chained-burst collapse
  * would need iterative or stateful passes).
  */
object Debounce {

  /** Input plus (gap_us, kept): gap to the previous same-key event
    * (null for the first) and whether the row survives debouncing —
    * first of its key, or gap > `minGapUs`. */
  def flag(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      tieCol: String,
      minGapUs: Long): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    require(minGapUs > 0, "gap must be positive")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__us"), col(tieCol))
    df.withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("gap_us", col("__us") - lag(col("__us"), 1).over(w))
      .withColumn("kept", col("gap_us").isNull || col("gap_us") > minGapUs)
      .drop("__us")
  }
}
