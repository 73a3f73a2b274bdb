package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Closed-form multivariate least squares via the normal equations.
  *
  * `events_regression` (#37i) fits per-group single-feature lines with
  * Spark's own `regr_slope`; this is the multi-feature companion: fit
  * `y ~ b0 + b1·x1 + b2·x2` over the WHOLE table with one aggregation
  * and a scalar Cramer solve — the distributed shape of classic
  * in-database ML (all data reduced to a constant-size moment vector,
  * model solved from the moments).
  *
  * Exactness discipline: the inputs must be integer-valued (cents,
  * quantities, basis points). Every moment (Σx, Σx², Σxy, Σy²) is
  * accumulated as DECIMAL(38,0) — exact integers, summation-order-free
  * — so both this engine and a SQL oracle computing the same moments
  * get bit-identical values; the 3×3 Cramer solve then runs on a
  * single row with a pinned operation order, so the derived doubles
  * agree too. At 100 TB the aggregation is one map-side-combined pass
  * (ten partial sums per partition merged associatively); nothing
  * downstream exceeds one row.
  */
object Regression {

  private def d(c: Column): Column = c.cast(DecimalType(18, 0))

  /** One-row OLS fit of `y ~ 1 + x1 + x2`.
    *
    * Output: `n, b0, b1, b2, r2` (coefficients and R² rounded to 6).
    * All three input columns must already be exact integer-valued
    * longs (the caller chooses the scaling, e.g. cents / basis
    * points). */
  def olsNormal2(df: DataFrame, y: String, x1: String, x2: String): DataFrame = {
    val m = df.agg(
      count(lit(1)).as("n"),
      sum(d(col(x1))).as("s1"),
      sum(d(col(x2))).as("s2"),
      sum(d(col(x1)) * d(col(x1))).as("s11"),
      sum(d(col(x1)) * d(col(x2))).as("s12"),
      sum(d(col(x2)) * d(col(x2))).as("s22"),
      sum(d(col(y))).as("sy"),
      sum(d(col(x1)) * d(col(y))).as("s1y"),
      sum(d(col(x2)) * d(col(y))).as("s2y"),
      sum(d(col(y)) * d(col(y))).as("syy"))
    // Scalar solve on the single moment row. The minors are shared
    // between det(A) and det(A0) exactly as written so the engine and
    // the oracle evaluate the same double expression tree.
    val solved = m.select(col("*"),
      (col("s11").cast("double") * col("s22").cast("double")
        - col("s12").cast("double") * col("s12").cast("double")).as("m00"),
      (col("s1").cast("double") * col("s22").cast("double")
        - col("s12").cast("double") * col("s2").cast("double")).as("m01"),
      (col("s1").cast("double") * col("s12").cast("double")
        - col("s11").cast("double") * col("s2").cast("double")).as("m02"))
    val det = col("n").cast("double") * col("m00") -
      col("s1").cast("double") * col("m01") +
      col("s2").cast("double") * col("m02")
    val det0 = col("sy").cast("double") * col("m00") -
      col("s1").cast("double") * (col("s1y").cast("double") * col("s22").cast("double")
        - col("s12").cast("double") * col("s2y").cast("double")) +
      col("s2").cast("double") * (col("s1y").cast("double") * col("s12").cast("double")
        - col("s11").cast("double") * col("s2y").cast("double"))
    val det1 = col("n").cast("double") * (col("s1y").cast("double") * col("s22").cast("double")
        - col("s12").cast("double") * col("s2y").cast("double")) -
      col("sy").cast("double") * col("m01") +
      col("s2").cast("double") * (col("s1").cast("double") * col("s2y").cast("double")
        - col("s1y").cast("double") * col("s2").cast("double"))
    val det2 = col("n").cast("double") * (col("s11").cast("double") * col("s2y").cast("double")
        - col("s1y").cast("double") * col("s12").cast("double")) -
      col("s1").cast("double") * (col("s1").cast("double") * col("s2y").cast("double")
        - col("s1y").cast("double") * col("s2").cast("double")) +
      col("sy").cast("double") * col("m02")
    solved
      // A singular design (collinear or too few rows) has det = 0 —
      // null coefficients instead of a divide-by-zero crash.
      .withColumn("b0", when(det =!= 0.0, det0 / det))
      .withColumn("b1", when(det =!= 0.0, det1 / det))
      .withColumn("b2", when(det =!= 0.0, det2 / det))
      // SSE via the normal-equations identity: Σy² − b·(X'y); SST from
      // the centered second moment. Both reuse the exact moments.
      .withColumn("sse", col("syy").cast("double")
        - col("b0") * col("sy").cast("double")
        - col("b1") * col("s1y").cast("double")
        - col("b2") * col("s2y").cast("double"))
      .withColumn("sst", col("syy").cast("double")
        - col("sy").cast("double") * col("sy").cast("double") / col("n").cast("double"))
      .select(col("n"),
        round(col("b0"), 6).as("b0"),
        round(col("b1"), 6).as("b1"),
        round(col("b2"), 6).as("b2"),
        when(col("sst") =!= 0.0,
          round(lit(1.0) - col("sse") / col("sst"), 6)).as("r2"))
  }
}
