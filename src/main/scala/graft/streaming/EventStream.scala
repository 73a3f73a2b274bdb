package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.LongType

/** Structured Streaming over the events table (SURVEY §2 #29): watermarked
  * tumbling-window aggregation, runnable either as a long-lived stream or
  * drained batch-equivalently for verification.
  *
  * Scale notes: the aggregation state is bounded by the watermark (late
  * data beyond 1 hour is dropped, closed windows are evicted), keys are
  * (window, event_type) so state is O(#types · #open windows), and the
  * query shape (groupBy window + agg) is the canonical incremental
  * hash-aggregation Structured Streaming plans with partial aggregation
  * per micro-batch.
  */
object EventStream {

  /** The streaming aggregation: hourly tumbling windows per event type. */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 6).as("sum_value"))
      .select(
        unix_timestamp(col("w.start")).as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Drain the events parquet through the streaming query with an
    * available-now trigger into a memory sink and return the final
    * result — the batch-equivalence harness for the SQL oracle. Uses
    * `complete` output mode so every window is emitted regardless of the
    * final watermark position. */
  def runBatchEquivalent(spark: SparkSession, dir: String): DataFrame = {
    val static = graft.Tables.events(spark, dir)
    // The file-stream source wants a directory to monitor; the testdata
    // table is a single parquet file, so monitor the sf dir filtered to it.
    val raw = spark.readStream
      .schema(spark.read.parquet(s"$dir/events.parquet").schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    // Same nanos→micros normalization as Tables.events.
    val events =
      if (raw.schema("ts").dataType == LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw
    val name = s"graft_stream_${System.nanoTime()}"
    val q = windowedAgg(events).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // Pin schema parity with the static path (documents the equivalence).
    require(static.schema("ts").dataType.typeName == "timestamp")
    spark.table(name)
  }
}
