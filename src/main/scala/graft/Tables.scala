package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Accessors for the driver-generated parquet tables in a scale-factor dir.
  * Plain `spark.read.parquet` so Catalyst owns pushdown/pruning decisions.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** `events.ts` has shipped under two parquet encodings — TIMESTAMP(NANOS)
    * (surfacing as Long under spark.sql.legacy.parquet.nanosAsLong) and
    * TIMESTAMP_MICROS with isAdjustedToUTC=false (surfacing as
    * TIMESTAMP_NTZ) — normalize both to a microsecond TimestampType column
    * here so downstream code sees one type. */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = apply(s, d, "events")
    df.schema("ts").dataType match {
      // `ts div 1000` (integral division) — a double-precision `/ 1000` would
      // lose sub-µs bits for epoch-nano magnitudes (~1.7e18 > 2^53) and drift
      // from the oracle's integer epoch_us.
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // The session timezone is pinned UTC (GraftSession), so the cast keeps
      // the stored epoch micros bit-exact — DuckDB oracles read the same
      // parquet as naive micros and are unaffected.
      case _: TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
