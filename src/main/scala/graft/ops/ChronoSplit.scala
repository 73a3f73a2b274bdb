package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Chronological (rank-range) dataset splitting.
  *
  * Same semantics as the reference's `splitChronologically`
  * (`/root/reference/src/main/scala/com/github/jongwook/cmf/Utils.scala:11`):
  * rows are totally ordered by a time column and partitioned into contiguous
  * rank ranges proportional to the given weights, preserving the schema.
  *
  * Spark-first, scale-safe design: the reference global-sorts the whole
  * dataset and `zipWithIndex`es it. A naive DataFrame translation would be
  * `row_number()` over an un-partitioned window — a single-task sort that
  * dies at 100 TB. Instead we compute the exact global rank in two bounded
  * passes:
  *
  *   1. bucket every row by approximate time-quantile boundaries
  *      (`approxQuantile`, driver-side array of ≤`numBuckets` doubles);
  *      all rows with equal time land in the same bucket, so bucket order
  *      is consistent with (time, tie) order;
  *   2. count rows per bucket (tiny agg), prefix-sum the counts on the
  *      driver, and add the bucket offset to a *per-bucket*
  *      `row_number()` window — each window partition holds ~n/numBuckets
  *      rows, so no task ever sees more than a shard of the data.
  *
  * The resulting rank is exact and deterministic (ties broken by `tieCol`),
  * and every stage is a narrow agg or a bounded window — nothing global.
  */
object ChronoSplit {

  /** Split `df` into `weights.size` contiguous chronological slices.
    *
    * @param df       input; schema is preserved in each output slice
    * @param weights  relative sizes, e.g. Seq(0.8, 0.2); normalized by sum
    * @param timeCol  numeric or timestamp column defining chronology
    * @param tieCol   unique column breaking ties for a total order
    * @param numBuckets quantile-bucket fan-out for the bounded windows
    */
  def split(
      df: DataFrame,
      weights: Seq[Double],
      timeCol: String,
      tieCol: String,
      numBuckets: Int = 0): Seq[DataFrame] = {
    require(weights.nonEmpty && weights.forall(_ > 0), "weights must be positive")
    val n = df.agg(count(lit(1))).head().getLong(0)
    // Materialized once: every returned slice filters this table, and the
    // rank pipeline (quantile probe + bucket counts + window) should not
    // re-execute per slice consumed.
    val ranked = withGlobalRank(df, timeCol, tieCol,
      if (numBuckets > 0) numBuckets else adaptiveBuckets(n))
      .localCheckpoint(true)
    val sum = weights.sum
    // Cumulative row-count boundaries: slice i = ranks (k(i-1), k(i)].
    val ks = weights.scanLeft(0.0)(_ + _).map(c => math.floor(c / sum * n).toLong)
    ks.sliding(2).toSeq.map { case Seq(lo, hi) =>
      ranked
        .filter(col(RankCol) > lo && col(RankCol) <= hi)
        .drop(RankCol)
    }
  }

  /** Per-group chronological split — the leave-last-out protocol
    * recommender evaluation actually needs (a GLOBAL time cut puts
    * early-lifecycle users entirely in train and late joiners entirely
    * in test; cutting each user's own history keeps every user in
    * both). Returns the slices in weight order, each preserving the
    * schema; within a group the split is an integer-exact rank band
    * over (timeCol, tieCol) via [[Sampling.rankBand]] — one shuffle per
    * slice on the group key, no global sort anywhere. */
  def splitPerGroup(
      df: DataFrame,
      groupCol: String,
      weights: Seq[Double],
      timeCol: String,
      tieCol: String): Seq[DataFrame] = {
    require(weights.nonEmpty && weights.forall(_ > 0), "weights must be positive")
    // Rational boundaries over a common denominator keep the band
    // arithmetic integer-exact (weights like 0.8/0.2 → 8/10).
    val denom = 1000000L
    val sum = weights.sum
    val cuts = weights.scanLeft(0.0)(_ + _)
      .map(c => math.round(c / sum * denom))
    cuts.sliding(2).toSeq.map { case Seq(lo, hi) =>
      Sampling.rankBand(df, Seq(col(groupCol)),
        Seq(col(timeCol), col(tieCol)), lo, hi, denom)
    }
  }

  /** Rolling-origin (expanding-window) backtest folds — the time-series
    * cross-validation protocol: fold i trains on everything at-or-before
    * cutoff_i and tests on (cutoff_i, cutoff_(i+1)], with integer-µs
    * cutoffs dividing [min, max] into folds+1 equal spans. Returns the
    * input fanned out to (fold, role) rows — train rows replicate into
    * every later fold by construction (the window expands), so at scale
    * consumers should aggregate per fold in the same pass rather than
    * materialize the fan-out. Plan shape: one tiny bounds aggregate and
    * one fold-id range, both broadcast — the only shuffle is whatever
    * the consumer's own aggregation needs. */
  def rollingOrigin(df: DataFrame, timeCol: String, folds: Int): DataFrame = {
    require(folds > 0, "folds must be positive")
    val t = unix_micros(col(timeCol).cast(org.apache.spark.sql.types.TimestampType))
    val bounds = df.agg(min(t).as("__tmin"), max(t).as("__tmax"))
    val foldIds = df.sparkSession.range(1, folds + 1L).select(col("id").as("fold"))
    val k = folds + 1
    // Integer division keeps cutoffs engine-exact (a double span/k would
    // round differently across engines at epoch-µs magnitudes).
    val lo = expr(s"__tmin + ((__tmax - __tmin) * fold) div $k")
    val hi = expr(s"__tmin + ((__tmax - __tmin) * (fold + 1)) div $k")
    df.withColumn("__t", t)
      .crossJoin(broadcast(bounds))
      .crossJoin(broadcast(foldIds))
      .withColumn("role",
        when(col("__t") <= lo, lit("train"))
          .when(col("__t") <= hi, lit("test")))
      .filter(col("role").isNotNull)
      .drop("__t", "__tmin", "__tmax")
  }

  /** Bucket fan-out sized so each per-bucket window stays comfortably
    * in one task (~1M rows) while the bucket-assignment expression (one
    * pass over the literal cut array per row) stays cheap. */
  def adaptiveBuckets(n: Long): Int =
    math.min(4096L, math.max(32L, n / 1000000L)).toInt

  /** Column name used internally for the exact global rank (1-based). */
  val RankCol = "__graft_chrono_rank"

  /** `df` plus an exact 1-based global rank by (timeCol, tieCol), computed
    * without any single-partition stage. Exposed for testing. */
  def withGlobalRank(
      df: DataFrame,
      timeCol: String,
      tieCol: String,
      numBuckets: Int = 256): DataFrame = {
    val t = col(timeCol).cast("double")
    val probed = df.withColumn("__graft_t", t)
    // 1. approximate quantile boundaries of the time column (driver-side,
    //    numBuckets doubles — microscopic vs. the data).
    val fractions = (1 until numBuckets).map(_.toDouble / numBuckets).toArray
    val cuts = probed.stat
      .approxQuantile("__graft_t", fractions, 0.001)
      .distinct.sorted
    // 2. bucket id = #cuts strictly below t → equal t ⇒ equal bucket, and
    //    bucket order is consistent with t order. A single fold over the
    //    literal cut array — flat, unlike a numBuckets-deep CASE chain
    //    that would fall out of codegen.
    val bucket = aggregate(typedLit(cuts.toSeq), lit(0),
      (acc, c) => acc + when(t > c, 1).otherwise(0))
    val bucketed = probed.withColumn("__graft_bucket", bucket)
    // 3. per-bucket counts → driver prefix sums (≤ numBuckets rows),
    //    shipped back as an O(1)-lookup map literal.
    val counts = bucketed.groupBy("__graft_bucket").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val offsets: Map[Int, Long] = {
      var acc = 0L
      (0 to cuts.length).map { b =>
        val o = b -> acc; acc += counts.getOrElse(b, 0L); o
      }.toMap
    }
    val offsetCol = element_at(typedLit(offsets), col("__graft_bucket"))
    // 4. bounded per-bucket window + offset = exact global rank.
    val w = Window.partitionBy("__graft_bucket").orderBy(col(timeCol), col(tieCol))
    bucketed
      .withColumn(RankCol, row_number().over(w).cast("long") + offsetCol)
      .drop("__graft_t", "__graft_bucket")
  }
}
