package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval ("range") join: pair each point row with every interval row of
  * the same key whose half-open window [start, end) contains the point —
  * sensor-reading-to-maintenance-window, event-to-campaign, trade-to-quote
  * band lookups. Spark plans a raw `t >= s AND t < e` theta-join as a
  * per-key nested loop (a cross product before the filter), which is
  * quadratic in the rows per key; this operator makes it an equi-join.
  *
  * Bucket blocking: time is tiled into fixed-width buckets at least as
  * wide as the longest interval, so every interval overlaps at most two
  * buckets (its start's and its end's). Intervals are exploded to one row
  * per covered bucket (≤2 rows — a constant fan-out, unlike exploding per
  * time unit), points map to exactly one bucket, and the join becomes a
  * plain shuffle hash join on (key, bucket) with the exact containment
  * predicate applied as a cheap post-filter. At 100 TB the cost is one
  * equi-exchange of ≈|P| + 2|I| rows; AQE's skew splitting applies to the
  * bucketed key like any other join, which a nested-loop theta-join never
  * benefits from.
  *
  * The bucket width is the max interval length, measured in one tiny
  * aggregate broadcast back as a single-row constant join (no collect, no
  * second pass over the data).
  */
object RangeJoin {

  /** Epoch µs tolerant of TIMESTAMP_NTZ parquet columns: with a UTC
    * session ([[graft.GraftSession]]) the cast is wall-clock-faithful;
    * on an already-TIMESTAMP column it is a no-op. */
  private def epochUs(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    unix_micros(c.cast(org.apache.spark.sql.types.TimestampType))

  /** Join `points` to the `intervals` whose [startTs, endTs) window of the
    * same key contains pointTs. Inner join; output = all point columns +
    * all interval columns (caller guarantees disjoint names).
    *
    * @param keys    equi-key column names present in both inputs
    * @param pointTs points' TimestampType column
    * @param startTs intervals' inclusive start (TimestampType)
    * @param endTs   intervals' exclusive end (TimestampType)
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      pointTs: String,
      startTs: String,
      endTs: String): DataFrame = {
    // Width = longest interval (µs), floored to 1 so zero-length inputs
    // can't divide by zero. One scalar row, broadcast onto both sides.
    val width = intervals
      .agg(greatest(max(epochUs(col(endTs)) - epochUs(col(startTs))), lit(1L))
        .as("__w"))
    val p = points
      .crossJoin(broadcast(width))
      .withColumn("__b", floor(epochUs(col(pointTs)) / col("__w")))
      .drop("__w")
    val i = intervals
      .crossJoin(broadcast(width))
      .withColumn("__b",
        explode(sequence(
          floor(epochUs(col(startTs)) / col("__w")),
          // end is exclusive: the last covered bucket is the one holding
          // end − 1 µs (an interval ending exactly on a bucket edge does
          // not reach into the next bucket).
          floor((epochUs(col(endTs)) - 1) / col("__w")))))
      .drop("__w")
    // Compare in epoch µs: the two sides may carry different timestamp
    // flavors (TIMESTAMP vs TIMESTAMP_NTZ), which don't coerce directly.
    p.join(i, keys :+ "__b")
      .filter(
        epochUs(col(pointTs)) >= epochUs(col(startTs)) &&
          epochUs(col(pointTs)) < epochUs(col(endTs)))
      .drop("__b")
  }
}
