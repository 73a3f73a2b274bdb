package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time ("as-of") join: each left row picks the single right row
  * with the greatest right timestamp ≤ the left timestamp (backward; ties
  * match) or the smallest right timestamp ≥ it (forward), per join key —
  * the lookup every feature-store / market-data / attribution pipeline
  * needs and vanilla Spark SQL lacks (an inequality theta-join plus
  * per-key argmax is a cross product before the window prunes it).
  *
  * Spark-first plan — the union-window trick, not a lookup structure:
  * tag both inputs, union them, and run ONE window partitioned by the key
  * and ordered by (time, tag): `last(right_payload, ignoreNulls)` over the
  * unbounded-preceding frame hands every left row the most recent right
  * payload in O(1) running state. Cost at 100 TB is a single exchange +
  * sort of |L|+|R| rows — the floor for any per-key ordered computation —
  * with no per-key quadratic pair space and no driver-side index. The
  * right payload travels as one struct column, so the exchange carries
  * each right row once regardless of how many left rows it will serve.
  *
  * Determinism: duplicate right rows at the same (key, time) are resolved
  * by the payload struct's own ordering (greatest struct wins — i.e.
  * lexicographic by the right side's column order). Cross-engine oracles
  * should pre-deduplicate the right side to one row per (key, time), as
  * engines differ in which duplicate their ASOF picks.
  *
  * Output: every left row (left join semantics) + the selected right
  * columns, null when no right row qualifies (or the match falls outside
  * `toleranceUs`).
  */
object AsOfJoin {

  /** Epoch µs tolerant of TIMESTAMP_NTZ parquet columns: with a UTC
    * session ([[graft.GraftSession]]) the cast is wall-clock-faithful;
    * on an already-TIMESTAMP column it is a no-op. */
  private def epochUs(c: Column): Column =
    unix_micros(c.cast(org.apache.spark.sql.types.TimestampType))

  /** Backward as-of join (most recent right row at-or-before left time).
    *
    * @param keys        equi-join key column names (present in both sides)
    * @param leftTs      left timestamp column (TimestampType)
    * @param rightTs     right timestamp column (TimestampType)
    * @param rightCols   right columns to carry onto the output (must not
    *                    collide with left column names)
    * @param toleranceUs max allowed (leftTs − rightTs) in µs; matches
    *                    farther back are nulled out. None = unbounded.
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      toleranceUs: Option[Long] = None): DataFrame =
    joined(left, right, keys, leftTs, rightTs, rightCols, toleranceUs, forward = false)

  /** Forward as-of join (earliest right row at-or-after left time). */
  def forward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      toleranceUs: Option[Long] = None): DataFrame =
    joined(left, right, keys, leftTs, rightTs, rightCols, toleranceUs, forward = true)

  /** Nearest as-of join: each left row picks the right row whose time is
    * CLOSEST to its own, in either direction, within `toleranceUs`
    * (backward wins exact distance ties — deterministic). One union +
    * ONE exchange-and-sort serves both directions: the backward hit is
    * `last(payload, ignoreNulls)` over the preceding frame and the
    * forward hit is `first(payload, ignoreNulls)` over the following
    * frame of the SAME window ordering, so the 100 TB cost stays the
    * single |L|+|R| sort — not two passes, and never a pair space. */
  def nearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      toleranceUs: Option[Long] = None): DataFrame = {
    require(rightCols.nonEmpty, "rightCols must name at least one column")
    val leftDup = rightCols.toSet.intersect(left.columns.toSet)
    require(leftDup.isEmpty, s"rightCols collide with left columns: $leftDup")

    val payload = struct((rightCols :+ rightTs).distinct.map(col): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        epochUs(col(rightTs)).as("__t"),
        lit(0).as("__tag"),
        payload.as("__m")): _*)
    val lStruct = struct(left.columns.map(col): _*)
    val lTagged = left.select(
      keys.map(col) ++ Seq(
        epochUs(col(leftTs)).as("__t"),
        lit(1).as("__tag"),
        lit(null).cast(r.schema("__m").dataType).as("__m"),
        lStruct.as("__l")): _*)
    val rTagged = r.select(
      col("*"),
      lit(null).cast(lTagged.schema("__l").dataType).as("__l"))

    // Right rows sort before left at equal time (tag 0 < 1): an exact-time
    // right row lands in the left row's PRECEDING frame, so a distance-0
    // match arrives via the backward hit — consistent with backward
    // winning ties. Both frames share (partition, order): one sort.
    val ord = Seq(col("__t"), col("__tag"), col("__m"))
    val wBack = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val withHits = rTagged
      .unionByName(lTagged)
      .withColumn("__hb", last(col("__m"), ignoreNulls = true).over(wBack))
      .withColumn("__hf", first(col("__m"), ignoreNulls = true).over(wFwd))
      .filter(col("__tag") === 1)

    val dBack = col("__t") - epochUs(col("__hb")(rightTs))
    val dFwd = epochUs(col("__hf")(rightTs)) - col("__t")
    def inTol(d: Column): Column =
      toleranceUs.map(t => d <= t).getOrElse(lit(true))
    val bOk = col("__hb").isNotNull && inTol(dBack)
    val fOk = col("__hf").isNotNull && inTol(dFwd)
    val hit = when(bOk && fOk, when(dBack <= dFwd, col("__hb")).otherwise(col("__hf")))
      .when(bOk, col("__hb"))
      .when(fOk, col("__hf"))
    val leftOut = left.columns.map(c => col("__l")(c).as(c))
    val rightOut = rightCols.map(c => hit.getField(c).as(c))
    withHits.select(leftOut ++ rightOut: _*)
  }

  private def joined(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      toleranceUs: Option[Long],
      forward: Boolean): DataFrame = {
    require(rightCols.nonEmpty, "rightCols must name at least one column")
    val leftDup = rightCols.toSet.intersect(left.columns.toSet)
    require(leftDup.isEmpty, s"rightCols collide with left columns: $leftDup")

    // Forward is backward on the negated time axis: flip the sign of the
    // ordering column and the two directions share one code path (and one
    // set of tie semantics: the right row at exactly the left time matches).
    val sign = if (forward) -1L else 1L
    val payload = struct((rightCols :+ rightTs).distinct.map(col): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        (epochUs(col(rightTs)) * sign).as("__t"),
        lit(0).as("__tag"),
        payload.as("__m")): _*)
    // Right rows sort before left rows at equal time (tag 0 < 1), so ties
    // match; among equal-time right rows the greatest payload struct wins.
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__tag"), col("__m"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Carry the whole left row as one struct so both union branches share
    // a schema: (keys, __t, __tag, __m right-payload, __l left-payload).
    val lStruct = struct(left.columns.map(col): _*)
    val lTagged = left.select(
      keys.map(col) ++ Seq(
        (epochUs(col(leftTs)) * sign).as("__t"),
        lit(1).as("__tag"),
        lit(null).cast(r.schema("__m").dataType).as("__m"),
        lStruct.as("__l")): _*)
    val rTagged = r.select(
      col("*"),
      lit(null).cast(lTagged.schema("__l").dataType).as("__l"))

    val withMatch = rTagged
      .unionByName(lTagged)
      .withColumn("__hit", last(col("__m"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)

    val inTol: Column = toleranceUs match {
      case Some(t) =>
        col("__hit").isNotNull &&
          (col("__t") - epochUs(col("__hit")(rightTs)) * sign) <= t
      case None => col("__hit").isNotNull
    }
    val hit = when(inTol, col("__hit"))
    val leftOut = left.columns.map(c => col("__l")(c).as(c))
    val rightOut = rightCols.map(c => hit.getField(c).as(c))
    withMatch.select(leftOut ++ rightOut: _*)
  }
}
