package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines (SURVEY §2
  * #32–33): stable hash slices (train/val/test cuts that stay disjoint
  * and reproducible as the corpus grows) and per-stratum quotas
  * (balanced mixes across languages/sources/labels).
  *
  * Both take a caller-supplied hash *column* rather than hard-coding a
  * hash: the driver queries use arithmetic multiplicative hashing (so
  * the DuckDB oracle can mirror it exactly), while production callers
  * would pass `xxhash64(key, seed)` — the operator semantics are
  * independent of the hash choice.
  */
object Sampling {

  /** Bucket space for [[hashSlice]] fractions: 1e6 buckets ≈ 1e-6
    * fraction granularity. */
  val Buckets: Long = 1000000L

  /** Rows whose deterministic bucket (hash mod 1e6) lies in
    * [lo·1e6, hi·1e6). Slices over the same hash with disjoint ranges
    * are disjoint, and adjacent ranges concatenate — the property that
    * makes hash-cut train/val/test splits leak-free and lets a pipeline
    * grow a sample ([0, 0.1) → [0, 0.2)) without resampling what it
    * already processed. Scale shape: a pure filter evaluated at the
    * scan — no shuffle, no state, works identically on a stream. */
  def hashSlice(df: DataFrame, hash: Column, lo: Double, hi: Double): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo <= hi, s"invalid slice [$lo, $hi)")
    val b = pmod(hash, lit(Buckets))
    df.filter(b >= (lo * Buckets).toLong && b < (hi * Buckets).toLong)
  }

  /** The [0, fraction) slice — a stable deterministic sample. */
  def hashSample(df: DataFrame, hash: Column, fraction: Double): DataFrame =
    hashSlice(df, hash, 0.0, fraction)

  /** At most `n` rows per stratum, chosen as the first `n` in
    * (order, then any further columns) — pass a hash column as the
    * order to make the quota a deterministic pseudo-random draw, or a
    * quality score to make it a best-of-stratum cut. One shuffle on the
    * stratum key; the window is bounded (row_number + filter compiles
    * to a per-group top-n, never materializing full-stratum state). */
  def stratifiedQuota(
      df: DataFrame,
      stratumCols: Seq[Column],
      order: Seq[Column],
      n: Int): DataFrame = {
    require(n > 0, "quota must be positive")
    require(stratumCols.nonEmpty && order.nonEmpty, "stratum and order required")
    val w = Window.partitionBy(stratumCols: _*).orderBy(order: _*)
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") <= n)
      .drop("__graft_rn")
  }
}
