package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Watermarked stream-stream inner join — the attribution shape: each
  * view event joins the same user's purchase events landing within the
  * next 30 minutes.
  *
  * Scale notes: this is the stateful streaming join done the way
  * Structured Streaming bounds it — both sides carry a watermark and
  * the join condition carries an event-time range, so Spark derives a
  * state watermark and evicts buffered rows once they can no longer
  * match: state is O(events inside the 30-minute join window), never
  * the whole stream. Inner-join matches emit as soon as both sides
  * arrive (no result holdback), so an available-now drain equals the
  * batch join.
  */
object JoinStream {

  /** views ⋈ purchases on (same user, purchase within [view, view+30m]).
    * Works identically on static or streaming frames. */
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
        "v_user = p_user AND p_ts >= v_ts AND p_ts <= v_ts + INTERVAL 30 MINUTES"))
      .select(col("view_id"), col("purchase_id"))
  }

  /** Drain the events parquet through the streaming self-join (view
    * side ⋈ purchase side of one source) via the [[Drain]] harness —
    * the batch-equivalence path for the SQL oracle. */
  def runBatchEquivalent(spark: SparkSession, dir: String): DataFrame = {
    val events = Drain.events(spark, dir)
    Drain.toMemory(
      attributed(
        events.filter(col("event_type") === "view"),
        events.filter(col("event_type") === "purchase")),
      "append", "graft_join")
  }
}
