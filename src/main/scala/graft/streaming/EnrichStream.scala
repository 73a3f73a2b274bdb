package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stream-static enrichment join: each arriving event joins the static
  * user dimension — the canonical Structured Streaming enrichment shape
  * next to [[EventStream]]'s windowed aggregation.
  *
  * Scale notes: the join itself is stateless (no watermark state — the
  * static side is re-planned per micro-batch, so dimension updates are
  * picked up); the dimension is broadcast, as a user table is small
  * next to an event stream; the downstream per-(nation, type)
  * aggregation holds O(#nations · #types) state — bounded regardless of
  * stream length. A production variant would window the aggregation;
  * the global grouping here keeps the drain harness oracle-comparable.
  */
object EnrichStream {

  /** The enrichment + aggregation: events joined to (c_custkey,
    * c_nationkey), counted per (nation, event type). Works identically
    * on a static or streaming `events` frame. */
  def enrichedAgg(events: DataFrame, users: DataFrame): DataFrame =
    events.join(broadcast(users), col("user_id") === col("c_custkey"))
      .groupBy("c_nationkey", "event_type")
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 6).as("sum_value"))

  /** Drain the events parquet through the streaming enrichment
    * ([[Drain]] harness) — the batch-equivalence path for the SQL
    * oracle. Complete output mode: the global aggregation re-emits
    * every group. */
  def runBatchEquivalent(spark: SparkSession, dir: String): DataFrame = {
    val users = graft.Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    Drain.toMemory(enrichedAgg(Drain.events(spark, dir), users),
      "complete", "graft_enrich")
  }
}
