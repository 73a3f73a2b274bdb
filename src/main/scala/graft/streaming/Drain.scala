package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Shared batch-equivalence harness for the streaming queries: one
  * events file-stream source and one available-now memory-sink drain,
  * so every streaming operator verifies through identical plumbing
  * instead of each copying (and drifting) its own.
  */
private[graft] object Drain {

  /** The events table as a file-stream source, with the same
    * nanos→micros ts normalization as `Tables.events` — stream and
    * batch sides of every equivalence check read identical schemas.
    * (The file source monitors a directory; the testdata table is a
    * single parquet file, so the sf dir is glob-filtered to it.) */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.readStream
      .schema(spark.read.parquet(s"$dir/events.parquet").schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    val out = raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // NTZ micros → TimestampType under the pinned-UTC session: epoch
      // micros are preserved exactly, matching Tables.events' batch side.
      case _: TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
    // Pin schema parity with the static path: every equivalence check
    // assumes both sides see TimestampType ts — fail here with a clear
    // message, not downstream as a confusing window mismatch.
    require(out.schema("ts").dataType.typeName == "timestamp",
      s"streaming events ts must normalize to timestamp, got ${out.schema("ts").dataType}")
    out
  }

  /** The documents table as a file-stream source — the ingest shape for
    * streaming corpus operators (dedup-on-arrival). Documents carry no
    * event time, so a deterministic synthetic ingest timestamp is derived
    * from doc_id (one second apart): watermark semantics are exercised
    * with a reproducible clock instead of wall time. The clock starts at
    * epoch+1s, NOT 0 — the engine's initial watermark is 0 and a row
    * sitting exactly on the watermark is dropped as late. */
  def documents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(spark.read.parquet(s"$dir/documents.parquet").schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
      .withColumn("ingest_ts", timestamp_micros((col("doc_id") + 1) * 1000000L))

  /** Run `df` to completion (available-now trigger) through a memory
    * sink and return the result. The sink's temp view is dropped after
    * the returned Dataset resolves — the catalog entry would otherwise
    * pin every drained result set in driver memory for the session
    * lifetime (one leaked table per bench/verify invocation). */
  def toMemory(df: DataFrame, mode: String, prefix: String): DataFrame = {
    val spark = df.sparkSession
    val name = s"${prefix}_${System.nanoTime()}"
    val q = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    // The finally arm covers the failure path: a query that throws from
    // awaitTermination would otherwise leak its handle and one memory-sink
    // catalog entry per failed drain. (On success the resolved Dataset
    // stays valid after the view is dropped.)
    try {
      q.awaitTermination()
      spark.table(name)
    } finally {
      // stop() can itself throw (e.g. the stream already died); isolate it
      // so the view is always dropped and a primary awaitTermination
      // failure is never masked by the cleanup.
      try { if (q.isActive) q.stop() }
      catch { case e: Exception => Console.err.println(s"[graft] drain stop($name) failed: $e") }
      // dropTempView can throw too (e.g. session state already torn down);
      // same isolation so it never masks a primary awaitTermination failure.
      try { spark.catalog.dropTempView(name) }
      catch { case e: Exception => Console.err.println(s"[graft] drain dropTempView($name) failed: $e") }
    }
  }
}
