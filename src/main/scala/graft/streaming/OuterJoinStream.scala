package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Watermarked stream-stream LEFT OUTER join — the "views that never
  * converted" shape [[JoinStream]]'s inner join cannot give: every view
  * either attributes to a purchase within 30 minutes or, once the
  * watermark proves no purchase can still arrive, emits exactly once
  * with a null purchase.
  *
  * Scale notes: same state bound as the inner join (both sides
  * watermarked, event-time range in the condition → state is O(rows in
  * the 30-minute window)). The outer-specific behavior is the
  * null-emission discipline: an unmatched left row is held in state
  * until the watermark passes the end of its match window and only then
  * released with nulls — so outer results trail the watermark, they are
  * never specuatively emitted and retracted. Views whose window is
  * still open when the available-now drain freezes the watermark
  * (max event time − 1 h) stay unemitted; the batch oracle applies the
  * same cutoff.
  */
object OuterJoinStream {

  /** views ⟕ purchases on (same user, purchase within [view, view+30m]).
    * Works identically on static or streaming frames (modulo the
    * held-back tail, which only streaming has). */
  def attributed(views: DataFrame, purchases: DataFrame): DataFrame = {
    val v = views
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", "1 hour")
    val p = purchases
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    v.join(p, expr(
        "v_user = p_user AND p_ts >= v_ts AND p_ts <= v_ts + INTERVAL 30 MINUTES"),
        "left_outer")
      .select(col("view_id"), col("purchase_id"))
  }

  /** Drain the events parquet through the streaming left-outer join via
    * the [[Drain]] harness — the batch-equivalence path for the SQL
    * oracle (matched pairs unconditionally; null rows only for views
    * whose 30-minute window closed below the final watermark). */
  def runBatchEquivalent(spark: SparkSession, dir: String): DataFrame = {
    val events = Drain.events(spark, dir)
    Drain.toMemory(
      attributed(
        events.filter(col("event_type") === "view"),
        events.filter(col("event_type") === "purchase")),
      "append", "graft_outer_join")
  }
}
