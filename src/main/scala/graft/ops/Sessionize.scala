package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: group each user's event stream into sessions
  * separated by inactivity longer than `gapUs` microseconds — the batch
  * half of the session pair (the incremental half is
  * [[graft.streaming.SessionStream]]; both produce identical sessions on
  * the same closed event set).
  *
  * Classic gaps-and-islands on windows: one shuffle partitioned by the
  * user key; the boundary flag is a `lag` diff and the session index a
  * running sum over the same window frame, so per-user state during
  * execution is O(1) (no buffering of the user's history). At 100 TB the
  * cost is exactly one exchange on user_id plus a sort within partitions —
  * the minimum any per-user ordered computation pays.
  */
object Sessionize {

  /** Events + `session_idx` (1-based, per user, chronological). Ties on
    * the timestamp break by `tieCol` for engine-reproducible boundaries. */
  def assign(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      gapUs: Long,
      tieCol: String): DataFrame =
    assignWithTs(events, userCol, tsCol, gapUs, tieCol).drop("__ts_us")

  /** [[assign]] keeping the internal `__ts_us` (epoch µs) column — for
    * [[sessions]]' aggregation. */
  private def assignWithTs(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      gapUs: Long,
      tieCol: String): DataFrame = {
    require(gapUs > 0, "gap must be positive")
    val w = Window.partitionBy(userCol).orderBy(col("__ts_us"), col(tieCol))
    // Pin the window exchange to cluster width when the scan arrives as
    // one split: AQE coalesces the tiny-byte exchange blind to the
    // session-window CPU above it; a no-op on a wide at-scale input.
    graft.Tables.fanOutBy(events, events, col(userCol))
      .withColumn("__ts_us", unix_micros(col(tsCol)))
      .withColumn("__new",
        when(coalesce(col("__ts_us") - lag("__ts_us", 1).over(w), lit(Long.MaxValue))
          > gapUs, 1).otherwise(0))
      .withColumn("session_idx",
        sum("__new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new")
  }

  /** One row per (user, session): start/end (epoch µs), event count, plus
    * any caller-supplied aggregations. */
  def sessions(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      gapUs: Long,
      tieCol: String,
      extraAggs: Column*): DataFrame =
    assignWithTs(events, userCol, tsCol, gapUs, tieCol)
      .groupBy(col(userCol), col("session_idx"))
      .agg(
        min("__ts_us").as("session_start_us"),
        (Seq(
          max("__ts_us").as("session_end_us"),
          count(lit(1)).as("n_events")) ++ extraAggs): _*)
}
