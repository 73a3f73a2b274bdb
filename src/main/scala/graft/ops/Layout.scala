package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout ordering for multi-column data skipping: map rows onto a
  * Z-order (Morton) space-filling curve over two columns, so files
  * written in curve order have tight min/max ranges on BOTH columns and
  * a scan filtered on either prunes most of them — the lake-layout
  * OPTIMIZE step for the two-predicate workload a single-column sort
  * can only serve on its leading key.
  *
  * Cells are equal-width per column over the global [min, max] (one
  * tiny bounds aggregation, broadcast into a pure projection — same
  * shape as the histogram operator; no global sort, no sampling pass),
  * and the curve value interleaves the cell bits. The actual layout
  * step is a range-repartition + within-partition sort on `zval` —
  * both shuffle-bounded, nothing driver-side.
  */
object Layout {

  /** Interleave the low `bits` bits of `x` (even positions) and `y`
    * (odd positions) — the Morton code. Pure long arithmetic, codegen
    * friendly. */
  def morton(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Append equal-width cell ids (`xcell`, `ycell` in [0, 2^bits)) and
    * the interleaved curve value `zval` for two numeric columns. A
    * zero-width column (constant) maps to cell 0. */
  def zorderCells(
      df: DataFrame,
      xCol: String,
      yCol: String,
      bits: Int = 8): DataFrame = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val cells = 1L << bits
    val bounds = df.agg(
      min(xCol).as("__xlo"), max(xCol).as("__xhi"),
      min(yCol).as("__ylo"), max(yCol).as("__yhi"))
    def cell(v: Column, lo: Column, hi: Column): Column =
      when(hi === lo, lit(0L)).otherwise(
        least(floor((v - lo) * cells / (hi - lo)), lit(cells - 1)).cast("long"))
    df.crossJoin(broadcast(bounds))
      .withColumn("xcell", cell(col(xCol), col("__xlo"), col("__xhi")))
      .withColumn("ycell", cell(col(yCol), col("__ylo"), col("__yhi")))
      .withColumn("zval", morton(col("xcell"), col("ycell"), bits))
      .drop("__xlo", "__xhi", "__ylo", "__yhi")
  }

  /** The layout step itself: rows range-partitioned and sorted by the
    * curve value — what a writer consumes to produce skippable files. */
  def zorderSort(df: DataFrame, xCol: String, yCol: String,
      bits: Int = 8, partitions: Int = 0): DataFrame = {
    val withZ = zorderCells(df, xCol, yCol, bits)
    val parts =
      if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    withZ.repartitionByRange(parts, col("zval"))
      .sortWithinPartitions("zval")
  }
}
