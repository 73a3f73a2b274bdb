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

  /** Neyman (variance-optimal) stratified allocation: distribute a
    * total budget of `k` rows across strata proportionally to
    * N_h · σ_h — sampling variance for a fixed budget is minimized by
    * oversampling the big AND volatile strata (Neyman 1934), vs
    * [[stratifiedQuota]]'s flat per-stratum n.
    *
    * Exactness: per-stratum moments (n, Σv, Σv²) aggregate as exact
    * decimals, and N_h·σ_h = √(n·Σv² − (Σv)²) — an exact integer
    * radicand, so the per-stratum weight is one deterministic sqrt
    * (IEEE-correctly-rounded in any engine) rounded to an integer;
    * quotas are integer floor-division shares of the budget (they can
    * under-fill k by < #strata — the documented floor remainder).
    * Zero-variance strata get quota 0.
    *
    * Scale shape: one moment aggregation, a broadcast quota table, one
    * per-stratum rank filter — the same two-pass shape as the other
    * deterministic samplers. `valueCol` must be integer-valued (cents
    * etc.); `order` must totally order rows within a stratum. */
  def neymanQuota(
      df: DataFrame,
      stratumCol: String,
      valueCol: Column,
      k: Int,
      order: Seq[Column]): DataFrame = {
    require(k > 0, "budget must be positive")
    val d = valueCol.cast(org.apache.spark.sql.types.DataTypes.createDecimalType(18, 0))
    val m = df.groupBy(stratumCol).agg(
      count(lit(1)).as("__n"), sum(d).as("__s"), sum(d * d).as("__ssq"))
    val x = m.select(col(stratumCol),
      round(sqrt((col("__n") * col("__ssq") - col("__s") * col("__s"))
        .cast("double")), 0).cast("long").as("__x"))
    val tot = x.agg(sum("__x").as("__tot"))
    val quota = x.crossJoin(broadcast(tot))
      .select(col(stratumCol),
        expr(s"($k * __x) div __tot").cast("long").as("quota"))
    val w = Window.partitionBy(col(stratumCol)).orderBy(order: _*)
    df.join(broadcast(quota), stratumCol)
      .withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") <= col("quota"))
      .drop("__graft_rn")
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis A-ES,
    * "Weighted random sampling with a reservoir", IPL 97(5), 2006):
    * each row draws key = −ln(u)/w from a caller-supplied uniform
    * u ∈ (0, 1] and weight w > 0, and the k smallest keys form the
    * sample — distributed exactly as sequential weighted draws without
    * replacement. A deterministic hash-derived uniform makes the draw
    * reproducible on any engine (and on re-runs over a grown corpus the
    * surviving keys are stable, so the sample evolves incrementally
    * instead of reshuffling).
    *
    * Scale shape: one narrow projection then a global top-k —
    * Spark compiles orderBy+limit to TakeOrderedAndProject (per-partition
    * heaps, k rows to the driver-side merge), never a full sort of the
    * corpus. The key is exposed as `sample_key` for auditability. */
  def weightedSample(df: DataFrame, uniform: Column, weight: Column, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    df.withColumn("sample_key", -log(uniform) / weight)
      .orderBy(col("sample_key"))
      .limit(k)
  }

  /** Temperature-weighted mixture sample: stratum g receives a quota
    * proportional to w_g = ⌊√cnt_g⌋ — the classic T=2 mixture
    * re-weighting that upsamples tail strata relative to their raw share
    * (a stratum with 100× the documents gets only 10× the quota). The
    * floored shares are topped up largest-remainder-first so the quotas
    * sum to `target` exactly; the draw meets it whenever every stratum
    * holds at least its quota (a stratum smaller than its quota yields
    * what it has). Rows within a stratum are the first `quota` in
    * `order` (pass a hash column for an unbiased draw).
    *
    * Engine-reproducible by construction: counts are exact, IEEE sqrt
    * is correctly rounded so ⌊√cnt⌋ is the same integer on any engine,
    * and the whole quota split — div, mod, largest-remainder ranking
    * (stratum-key tiebreak) — is integer arithmetic with no double
    * accumulation anywhere.
    *
    * Scale shape: one count aggregation (map-side partial), two
    * |strata|-row side computations (the remainder ranking's global
    * window runs over strata, never data rows), a broadcast quota
    * table, and one per-stratum top-quota window over the data — the
    * same single shuffle as [[stratifiedQuota]], kept group-limited by
    * the literal `target` bound (quota ≤ target always). */
  def temperatureQuota(
      df: DataFrame,
      stratumCols: Seq[String],
      order: Seq[Column],
      target: Long): DataFrame = {
    require(target > 0, "target must be positive")
    require(stratumCols.nonEmpty && order.nonEmpty, "stratum and order required")
    val sc = stratumCols.map(col)
    val counts = df.groupBy(sc: _*)
      .agg(count(lit(1)).as("__graft_cnt"))
      .withColumn("__graft_w", floor(sqrt(col("__graft_cnt"))).cast("long"))
    val tot = counts.agg(sum("__graft_w").as("__graft_tw"))
    // The target·w product runs in DECIMAL(38,0): with Long arithmetic a
    // large target times a heavy stratum's weight (w = ⌊√cnt⌋ reaches
    // ~1e6 at 1e12-row strata) can exceed Long.MaxValue and Spark wraps
    // silently, corrupting every quota. The div/mod results are ≤ target
    // resp. < tw, so the BIGINT casts back are always exact.
    val based = counts.crossJoin(broadcast(tot))
      .withColumn("__graft_base", expr(
        s"CAST((CAST($target AS DECIMAL(38,0)) * __graft_w) div __graft_tw AS BIGINT)"))
      .withColumn("__graft_rem", expr(
        s"CAST((CAST($target AS DECIMAL(38,0)) * __graft_w) % __graft_tw AS BIGINT)"))
    // Largest-remainder top-up: the floored bases undershoot target by
    // exactly Σrem / Σw strata-rows; the strata with the largest
    // remainders take one extra row each so Σquota = target.
    val deficit = based.agg((lit(target) - sum("__graft_base")).as("__graft_deficit"))
    val quotas = based.crossJoin(broadcast(deficit))
      .withColumn("__graft_rrn", row_number().over(
        Window.orderBy(col("__graft_rem").desc +: sc: _*)))
      .withColumn("__graft_quota", col("__graft_base") +
        when(col("__graft_rrn") <= col("__graft_deficit"), lit(1L)).otherwise(lit(0L)))
      .select(sc :+ col("__graft_quota"): _*)
    val w = Window.partitionBy(sc: _*).orderBy(order: _*)
    df.join(broadcast(quotas), stratumCols)
      .withColumn("__graft_rn", row_number().over(w))
      // The literal conjunct (implied by quota <= target) keeps Spark's
      // WindowGroupLimit rewrite applicable: without a foldable bound
      // every row of a skewed stratum would be shuffled and sorted.
      .filter(col("__graft_rn") <= lit(target) &&
        col("__graft_rn") <= col("__graft_quota"))
      .drop("__graft_rn", "__graft_quota")
  }

  /** Percentile-band gate: keep rows whose per-stratum rank (by `order`,
    * ascending) lies in the fraction band (loNumer/denom, hiNumer/denom]
    * of the stratum size — e.g. (1, 9, 10) trims each stratum's bottom
    * and top decile, the distribution-relative form of quality pruning
    * (an absolute score threshold over- or under-prunes strata whose
    * score distributions differ). Band membership is decided in integer
    * arithmetic (rn·denom vs numer·n) — no floating-point boundary, so
    * the cut is engine-exact.
    *
    * Scale shape: one shuffle on the stratum key + a full per-stratum
    * sort (a mid-band cut needs true ranks — group-limit can't apply).
    * At extreme per-stratum cardinality, swap exact ranks for
    * [[Sketches.groupProfile]] percentile thresholds joined back as
    * filters — one pass, no sort, approximate cut. */
  def rankBand(
      df: DataFrame,
      stratumCols: Seq[Column],
      order: Seq[Column],
      loNumer: Long,
      hiNumer: Long,
      denom: Long): DataFrame = {
    require(denom > 0 && loNumer >= 0 && loNumer <= hiNumer && hiNumer <= denom,
      s"need 0 <= lo <= hi <= denom, got $loNumer/$denom..$hiNumer/$denom")
    require(stratumCols.nonEmpty && order.nonEmpty, "stratum and order required")
    val w = Window.partitionBy(stratumCols: _*).orderBy(order: _*)
    val cw = Window.partitionBy(stratumCols: _*)
    df.withColumn("__graft_rn", row_number().over(w).cast("long"))
      .withColumn("__graft_n", count(lit(1)).over(cw))
      .filter(col("__graft_rn") * denom > lit(loNumer) * col("__graft_n") &&
        col("__graft_rn") * denom <= lit(hiNumer) * col("__graft_n"))
      .drop("__graft_rn", "__graft_n")
  }

  /** Deterministic corpus shuffle: a stable pseudo-random total order
    * (`position`, 1-based) by (hash, tieCol) — the training-order
    * shuffle that interleaves sources/languages reproducibly, decoupled
    * from ingest order. Pass `xxhash64(key, seed)` in production; the
    * driver query uses arithmetic hashing so DuckDB mirrors it.
    *
    * Scale shape: positions come from [[ChronoSplit.withGlobalRank]] —
    * quantile-bucketed bounded windows plus driver prefix sums, never a
    * single-partition sort. */
  def deterministicShuffle(df: DataFrame, hash: Column, tieCol: String): DataFrame =
    ChronoSplit.withGlobalRank(
        df.withColumn("__graft_shuffle_key", hash), "__graft_shuffle_key", tieCol)
      .withColumnRenamed(ChronoSplit.RankCol, "position")
      .drop("__graft_shuffle_key")
}
