package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key interval coalescing (the SQL "islands" problem): merge a
  * set of possibly-overlapping [start, end] intervals into maximal
  * disjoint islands — availability windows from lease events, covered
  * time from span logs, merged holds from retention markers.
  *
  * Scale shape: one exchange on the key; the running-max, break-flag
  * and island-id windows plus the final groupBy all share that
  * partitioning, so Catalyst plans a single shuffle followed by one
  * per-partition sort — no join, no self-comparison, state one row
  * deep. An interval that starts exactly where another ends
  * (s == prev_max) touches it and merges.
  */
object Intervals {

  /** (keyCols*, island_start, island_end, n_merged) — one row per
    * maximal island of transitively-overlapping intervals. Start/end
    * are any orderable numeric/timestamp columns; ties order by
    * (start, end) so the island assignment is deterministic. */
  def coalesce(
      df: DataFrame,
      keyCols: Seq[String],
      startCol: String,
      endCol: String): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    val byKey = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(startCol), col(endCol))
    // Greatest end seen among strictly-earlier intervals of the key:
    // a row whose start exceeds it opens a new island.
    val prevMax = max(col(endCol)).over(
      byKey.rowsBetween(Window.unboundedPreceding, -1))
    df
      .withColumn("_pmax", prevMax)
      .withColumn("_brk",
        when(col("_pmax").isNull || col(startCol) > col("_pmax"), 1L)
          .otherwise(0L))
      .withColumn("_island",
        sum(col("_brk")).over(byKey.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy((keyCols :+ "_island").map(col): _*)
      .agg(min(col(startCol)).as("island_start"),
        max(col(endCol)).as("island_end"),
        count(lit(1)).as("n_merged"))
      .drop("_island")
  }

  /** Per-key interval-INTERSECTION join — the temporal/validity join
    * (price history × promo windows, session × calendar grid): every
    * overlapping (a, b) interval pair sharing a key, with the
    * intersection span appended as (o_start, o_end). Half-open
    * [start, end) semantics: touching intervals (a_end == b_start) do
    * NOT match; represent closed intervals by passing end+1.
    *
    * Scale shape: an equi-join on the key with the overlap predicate in
    * the join condition — Catalyst plans a hash join on the key, so
    * work is Σ_key |a_k|·|b_k| within keys only, never a global range
    * cross product; AQE handles key skew. The four bound columns must
    * be distinctly named across the two sides. */
  def intersectJoin(
      a: DataFrame,
      b: DataFrame,
      keyCols: Seq[String],
      aStart: String, aEnd: String,
      bStart: String, bEnd: String): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    val bounds = Seq(aStart, aEnd, bStart, bEnd)
    require(bounds.distinct.size == 4,
      s"interval bound columns must be distinctly named, got $bounds")
    a.join(b, keyCols)
      .filter(col(aStart) < col(bEnd) && col(bStart) < col(aEnd))
      .withColumn("o_start", greatest(col(aStart), col(bStart)))
      .withColumn("o_end", least(col(aEnd), col(bEnd)))
  }
}
