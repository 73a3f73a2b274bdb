package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mahalanobis outlier scoring against the dataset's own empirical
  * distribution — the covariance-aware distance that catches outliers
  * correlated dimensions hide from per-component z-scores.
  *
  * Shape for 100 TB: ONE distributed pass collapses the data to the
  * (n, Σx, ΣxxΤ) moments ([[graft.functions.VecMomentsAgg]] — per
  * partition state is d²+d+1 doubles); mean/covariance/inverse are
  * derived on the driver (O(d³), constant); the inverse broadcasts
  * back as an array literal and each row is scored in ONE fused
  * codegen pass — `array_dot(c, array_mat_vec(Σ⁻¹, c))` with
  * c = x − μ — no UDF, no per-row allocation beyond the mat-vec
  * buffer. Exact certificate (spec-pinned): Σᵢ mahal²ᵢ = d·(n−1) by
  * trace identity, for any data.
  */
object Mahalanobis {

  /** `df` plus a `mahal2` column: (x−μ)ᵀ Σ⁻¹ (x−μ) against the
    * empirical moments of `vecCol` over `df` itself. */
  def score(df: DataFrame, vecCol: String): DataFrame = {
    val spark = df.sparkSession
    graft.functions.register(spark)
    val m = df.agg(graft.functions.vec_moments(col(vecCol)).as("m"))
      .select("m.n", "m.sums", "m.gram").head()
    val n = m.getLong(0)
    val sums = m.getSeq[Double](1).toArray
    val gram = m.getSeq[Double](2).toArray
    val d = sums.length
    require(n > d, s"need n > d rows for an invertible covariance (n=$n, d=$d)")
    val mu = sums.map(_ / n)
    val cov = Array.tabulate(d, d)((i, j) =>
      (gram(i * d + j) - sums(i) * sums(j) / n) / (n - 1))
    val inv = invert(cov)
    val centered = zip_with(col(vecCol).cast("array<double>"),
      typedlit(mu.toSeq), (x, c) => x - c)
    df.withColumn("__c", centered)
      .withColumn("mahal2", graft.functions.array_dot(col("__c"),
        graft.functions.array_mat_vec(typedlit(inv.flatten.toSeq), col("__c"))))
      .drop("__c")
  }

  /** ZCA whitening: `df` plus a `whitened` column W·(x−μ) with
    * W = Σ^(−1/2) (inverse of the Cholesky factor, so the whitened
    * sample has EXACTLY identity empirical covariance — the spec pins
    * it through a second [[graft.functions.VecMomentsAgg]] pass). Same
    * 100 TB shape as [[score]]: one distributed moments pass, O(d³)
    * driver linear algebra, one broadcast mat-vec codegen pass back
    * over the rows. Whitened embeddings make plain Euclidean/cosine
    * ANN behave like Mahalanobis ANN — the preprocessing that lets
    * every existing index operator become covariance-aware for free. */
  def whiten(df: DataFrame, vecCol: String): DataFrame = {
    val spark = df.sparkSession
    graft.functions.register(spark)
    val m = df.agg(graft.functions.vec_moments(col(vecCol)).as("m"))
      .select("m.n", "m.sums", "m.gram").head()
    val n = m.getLong(0)
    val sums = m.getSeq[Double](1).toArray
    val gram = m.getSeq[Double](2).toArray
    val d = sums.length
    require(n > d, s"need n > d rows for an invertible covariance (n=$n, d=$d)")
    val mu = sums.map(_ / n)
    val cov = Array.tabulate(d, d)((i, j) =>
      (gram(i * d + j) - sums(i) * sums(j) / n) / (n - 1))
    // Lower Cholesky Σ = L·Lᵀ, then W = L⁻¹ by forward substitution:
    // W·Σ·Wᵀ = I exactly (up to float), i.e. lower-triangular whitening.
    val l = cholesky(cov)
    val w = invertLowerTriangular(l)
    val centered = zip_with(col(vecCol).cast("array<double>"),
      typedlit(mu.toSeq), (x, c) => x - c)
    df.withColumn("whitened",
      graft.functions.array_mat_vec(typedlit(w.flatten.toSeq), centered))
  }

  /** Lower Cholesky factor of a symmetric positive-definite matrix;
    * loud on non-PD input. Driver-side, O(d³). */
  private[ops] def cholesky(a: Array[Array[Double]]): Array[Array[Double]] = {
    val d = a.length
    val l = Array.ofDim[Double](d, d)
    var i = 0
    while (i < d) {
      var j = 0
      while (j <= i) {
        var s = a(i)(j)
        var k = 0
        while (k < j) { s -= l(i)(k) * l(j)(k); k += 1 }
        if (i == j) {
          require(s > 1e-12, s"covariance not positive-definite at pivot $i")
          l(i)(i) = math.sqrt(s)
        } else l(i)(j) = s / l(j)(j)
        j += 1
      }
      i += 1
    }
    l
  }

  /** In-place-free inverse of a lower-triangular matrix by forward
    * substitution on unit columns. */
  private[ops] def invertLowerTriangular(l: Array[Array[Double]]): Array[Array[Double]] = {
    val d = l.length
    val inv = Array.ofDim[Double](d, d)
    var c = 0
    while (c < d) {
      var i = c
      while (i < d) {
        var s = if (i == c) 1.0 else 0.0
        var k = c
        while (k < i) { s -= l(i)(k) * inv(k)(c); k += 1 }
        inv(i)(c) = s / l(i)(i)
        i += 1
      }
      c += 1
    }
    inv
  }

  /** Gauss-Jordan inverse with partial pivoting — driver-side, O(d³)
    * on a constant-size matrix. Fails loudly on (near-)singular input:
    * a pseudo-inverse would silently change the statistic's meaning. */
  private[ops] def invert(a: Array[Array[Double]]): Array[Array[Double]] = {
    val d = a.length
    val m = Array.tabulate(d, 2 * d)((i, j) =>
      if (j < d) a(i)(j) else if (j - d == i) 1.0 else 0.0)
    var col = 0
    while (col < d) {
      var piv = col
      var i = col + 1
      while (i < d) { if (math.abs(m(i)(col)) > math.abs(m(piv)(col))) piv = i; i += 1 }
      require(math.abs(m(piv)(col)) > 1e-12,
        s"covariance is numerically singular at column $col — cannot invert")
      val t = m(col); m(col) = m(piv); m(piv) = t
      val p = m(col)(col)
      var j = 0
      while (j < 2 * d) { m(col)(j) /= p; j += 1 }
      i = 0
      while (i < d) {
        if (i != col && m(i)(col) != 0.0) {
          val f = m(i)(col)
          var k = 0
          while (k < 2 * d) { m(i)(k) -= f * m(col)(k); k += 1 }
        }
        i += 1
      }
      col += 1
    }
    Array.tabulate(d, d)((i, j) => m(i)(d + j))
  }
}
