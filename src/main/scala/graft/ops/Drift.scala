package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift screens between two labeled samples of the same
  * feature — the monitoring gate a training pipeline runs before
  * trusting a new data drop: has the value distribution moved since
  * the snapshot the model was fit on?
  *
  * Both statistics are exact, deterministic dataflows (no sampling, no
  * iteration), so an external SQL engine reproduces them bit-for-bit:
  *  - [[ks]]: the two-sample Kolmogorov-Smirnov statistic, computed at
  *    every observed value via RANGE cumulative windows (a logical
  *    frame includes ties, so the empirical CDFs are evaluated
  *    inclusively — the textbook definition).
  *  - [[psi]]: the population stability index over `bins` equal-width
  *    bins of the per-group value range, with +0.5 Laplace smoothing
  *    so empty bins stay finite.
  *
  * Scale shape: one exchange on the group key each; the CDF windows,
  * the per-group totals window and the final max share that
  * partitioning. Nothing is collected; group cardinality bounds state.
  */
object Drift {

  /** (groupCol, n_a, n_b, ks) per group: sup |F_a - F_b| over the
    * pooled observed values. `sideCol` must be 0 (sample a) or 1. */
  def ks(df: DataFrame, groupCol: String, valueCol: String, sideCol: String): DataFrame = {
    val cdf = Window.partitionBy(groupCol).orderBy(col(valueCol))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(groupCol)
    df
      .withColumn("_ia", when(col(sideCol) === 0, 1L).otherwise(0L))
      .withColumn("_ib", when(col(sideCol) === 1, 1L).otherwise(0L))
      .withColumn("_ca", sum("_ia").over(cdf))
      .withColumn("_cb", sum("_ib").over(cdf))
      .withColumn("_na", sum("_ia").over(whole))
      .withColumn("_nb", sum("_ib").over(whole))
      .groupBy(groupCol)
      .agg(max("_na").as("n_a"), max("_nb").as("n_b"),
        // One side empty (a group seen in only one sample): null KS,
        // not a divide-by-zero crash.
        round(max(when(col("_na") > 0 && col("_nb") > 0,
          abs(col("_ca") / col("_na") - col("_cb") / col("_nb")))), 6)
          .as("ks"))
  }

  /** (groupCol, psi) per group: Σ_bins (p_a − p_b) · ln(p_a / p_b)
    * with p = (count + 0.5) / (n + bins/2) over the COMPLETE bin grid
    * (empty bins contribute their smoothed term). Bins are equal-width
    * over the group's own [min, max]; a constant group degenerates to
    * one occupied bin. */
  def psi(df: DataFrame, groupCol: String, valueCol: String, sideCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, "need at least two bins")
    val whole = Window.partitionBy(groupCol)
    val binned = df
      .withColumn("_mn", min(col(valueCol)).over(whole))
      .withColumn("_mx", max(col(valueCol)).over(whole))
      .withColumn("_bin",
        when(col("_mx") === col("_mn"), lit(0L)).otherwise(
          least(floor((col(valueCol) - col("_mn")) * bins / (col("_mx") - col("_mn"))),
            lit(bins - 1L)).cast("long")))
      .groupBy(col(groupCol), col("_bin"))
      .agg(sum(when(col(sideCol) === 0, 1L).otherwise(0L)).as("_cnt_a"),
        sum(when(col(sideCol) === 1, 1L).otherwise(0L)).as("_cnt_b"))
    val totals = binned.groupBy(groupCol)
      .agg(sum("_cnt_a").as("_n_a"), sum("_cnt_b").as("_n_b"))
    val grid = totals.select(col(groupCol), col("_n_a"), col("_n_b"),
      explode(sequence(lit(0L), lit(bins - 1L))).as("_bin"))
    grid.join(binned, Seq(groupCol, "_bin"), "left")
      .withColumn("_pa",
        (coalesce(col("_cnt_a"), lit(0L)) + 0.5) / (col("_n_a") + bins * 0.5))
      .withColumn("_pb",
        (coalesce(col("_cnt_b"), lit(0L)) + 0.5) / (col("_n_b") + bins * 0.5))
      .groupBy(groupCol)
      .agg(round(sum((col("_pa") - col("_pb")) * log(col("_pa") / col("_pb"))), 6)
        .as("psi"))
  }
}
