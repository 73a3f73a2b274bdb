package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Numeric feature conditioning for training pipelines: distribution-
  * aware clipping of outliers before values feed a model or a reward /
  * quality signal.
  */
object Numeric {

  /** Winsorize `valueCol` per group: clip to the [loFrac, hiFrac]
    * exact quantiles of its own group — the standard outlier treatment
    * that (unlike dropping) keeps row counts and keys intact. Returns
    * `df` with `<valueCol>_w` appended.
    *
    * Scale shape: one exact-percentile aggregation per group (partial
    * aggregation collapses each partition first), a broadcast join of
    * the |groups|-row bounds table, and a pure clip projection — the
    * big side is never shuffled. Exact quantiles keep the operator
    * oracle-checkable; at extreme per-group cardinality swap in
    * [[Sketches.groupProfile]]'s approximate percentiles (same join
    * shape, approximate cut). */
  def winsorize(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      loFrac: Double = 0.05,
      hiFrac: Double = 0.95): DataFrame = {
    require(loFrac >= 0 && loFrac <= hiFrac && hiFrac <= 1,
      s"need 0 <= lo <= hi <= 1, got [$loFrac, $hiFrac]")
    require(groupCols.nonEmpty, "at least one group column")
    val bounds = df.groupBy(groupCols.map(col): _*)
      .agg(
        percentile(col(valueCol), lit(loFrac)).as("__graft_lo"),
        percentile(col(valueCol), lit(hiFrac)).as("__graft_hi"))
    df.join(broadcast(bounds), groupCols)
      .withColumn(valueCol + "_w",
        least(greatest(col(valueCol), col("__graft_lo")), col("__graft_hi")))
      .drop("__graft_lo", "__graft_hi")
  }

  /** Z-score standardize `valueCol` per group: (v − mean) / stddev with
    * the group's sample statistics — appended as `<valueCol>_z`, null
    * for groups with zero variance (a 0/0 z-score is undefined, and a
    * silent 0 would hide a degenerate feature). Same shape as
    * [[winsorize]]: one aggregation, one broadcast join, one
    * projection. */
  def standardize(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    val stats = df.groupBy(groupCols.map(col): _*)
      .agg(avg(col(valueCol)).as("__graft_mu"),
        stddev_samp(col(valueCol)).as("__graft_sd"))
    df.join(broadcast(stats), groupCols)
      .withColumn(valueCol + "_z",
        when(col("__graft_sd") > 0,
          (col(valueCol) - col("__graft_mu")) / col("__graft_sd")))
      .drop("__graft_mu", "__graft_sd")
  }

  /** Continuous-MLE power-law tail exponent (Clauset, Shalizi & Newman
    * 2009, eq. 3.1): α̂ = 1 + n / Σ ln(xᵢ/xmin) over values ≥ `xmin` —
    * the one-row corpus-health diagnostic for heavy-tailed size
    * distributions (document lengths, degree counts): α drifting
    * across snapshots flags a changed crawl mix before any downstream
    * metric moves. One partial-aggregable scan; returns
    * (n_used, alpha_hat). */
  def powerLawAlpha(df: DataFrame, valueCol: String, xmin: Double): DataFrame = {
    require(xmin > 0, "xmin must be positive")
    df.filter(col(valueCol) >= xmin)
      .agg(count(lit(1)).as("n_used"),
        sum(log(col(valueCol) / lit(xmin))).as("__graft_s"))
      .select(col("n_used"),
        round(lit(1.0) + col("n_used") / col("__graft_s"), 6).as("alpha_hat"))
  }

  /** Percent-rank calibration of `valueCol` within each group —
    * maps every group's score distribution onto [0, 1] so thresholds
    * compare ACROSS groups (the per-language quality-score problem: a
    * fixed cut on raw scores keeps different quantiles of different
    * languages; a cut on calibrated ranks keeps the same share of
    * each). Appended as `<valueCol>_pr`, exact percent_rank over the
    * (value, tieCol) total order — deterministic and externally
    * checkable; single-member groups calibrate to 0.0 (rank 0 of 0).
    *
    * Scale shape: one per-group sort (the honest cost of exact ranks);
    * the approximate swap at extreme group cardinality is a GK-sketch
    * CDF lookup (same contract, bounded rank error). */
  def percentRankCalibrate(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      tieCol: String): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(valueCol), col(tieCol))
    df.withColumn(valueCol + "_pr", percent_rank().over(w))
  }

  /** Robust scale `valueCol` per group: (v − median) / (1.4826 · MAD),
    * appended as `<valueCol>_r` — the outlier-insensitive sibling of
    * [[standardize]] (mean/stddev move with the outliers they're meant
    * to flag; median/MAD don't). 1.4826 ≈ 1/Φ⁻¹(3/4) makes the scale
    * estimate consistent with stddev under normality. Zero-MAD groups
    * (over half the values identical) go null like zero-variance
    * z-scores.
    *
    * Scale shape: two exact-percentile aggregations (median, then
    * median of |v − median|) — each partial-aggregable per group — and
    * two broadcast joins of |groups|-row tables; the big side is never
    * shuffled. Same approximate-percentile swap as [[winsorize]] at
    * extreme group cardinality. */
  def robustScale(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    val med = df.groupBy(groupCols.map(col): _*)
      .agg(percentile(col(valueCol), lit(0.5)).as("__graft_med"))
    val withMed = df.join(broadcast(med), groupCols)
    val mad = withMed.groupBy(groupCols.map(col): _*)
      .agg(percentile(abs(col(valueCol) - col("__graft_med")), lit(0.5))
        .as("__graft_mad"))
    withMed.join(broadcast(mad), groupCols)
      .withColumn(valueCol + "_r",
        when(col("__graft_mad") > 0,
          (col(valueCol) - col("__graft_med"))
            / (col("__graft_mad") * 1.4826)))
      .drop("__graft_med", "__graft_mad")
  }

  /** Leakage-safe quantile discretizer (fit/transform in one plan): bin
    * breaks are exact interpolated percentiles of the TRAIN slice only
    * (`trainPred`), then applied to EVERY row — the contract that keeps
    * test-set values out of boundary estimation. Output = input +
    * `bin` (count of breaks strictly below the value, 0..probs.length)
    * + `__breaks` (the fitted array, for auditing).
    *
    * Scale shape: the fit is one aggregate to a single row that rides a
    * broadcast constant join; the apply is a codegen'd fold over the
    * literal-sized break array — no driver collect, no shuffle beyond
    * the fit aggregate. Exact percentiles cost a sort of the train
    * slice's values inside the aggregate; swap `percentile` for
    * `percentile_approx` at corpus scale if the breaks may be sketched. */
  def quantileBins(
      df: DataFrame,
      valueCol: String,
      trainPred: Column,
      probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0 && p < 1),
      "probs must lie strictly inside (0,1)")
    val breaks = df.filter(trainPred)
      .agg(percentile(col(valueCol),
        array(probs.map(lit): _*)).as("__breaks"))
    df.crossJoin(broadcast(breaks))
      .withColumn("bin",
        aggregate(col("__breaks"), lit(0),
          (acc, b) => acc + when(col(valueCol) > b, 1).otherwise(0)))
  }
}
