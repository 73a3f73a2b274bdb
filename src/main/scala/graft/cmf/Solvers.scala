package graft.cmf

/** Local dense least-squares solvers over a packed [[NormalEq]] —
  * O(rank³) per entity id, executed inside `mapPartitions` with scratch
  * buffers reused across ids (zero allocation per solve beyond the
  * result).
  *
  * Pure Scala re-implementations of the behaviors the reference gets from
  * vendored Spark internals (`CholeskyDecomposition.scala`, `NNLS.scala`)
  * — written from the standard algorithms, not copied: plain Cholesky
  * factorization and cyclic projected coordinate descent for NNLS.
  */
sealed trait LeastSquaresSolver extends Serializable {
  /** Solve (AtA + λI) x = Atb. `ata` is packed upper column-major and is
    * NOT modified; returns a fresh Array[Float] of length rank. */
  def solve(ata: Array[Double], atb: Array[Double], lambda: Double): Array[Float]
}

/** Cholesky factorization solver for the unconstrained case. */
final class CholeskySolver(rank: Int) extends LeastSquaresSolver {
  private val a = new Array[Double](rank * rank) // full matrix scratch (L)
  private val y = new Array[Double](rank)

  override def solve(ata: Array[Double], atb: Array[Double], lambda: Double): Array[Float] = {
    Solvers.unpack(ata, a, rank, lambda)
    // In-place Cholesky: a := L (lower triangle).
    var j = 0
    while (j < rank) {
      var d = a(j * rank + j)
      var t = 0
      while (t < j) { val ljt = a(j * rank + t); d -= ljt * ljt; t += 1 }
      require(d > 0, s"matrix not positive definite (d=$d at $j); increase regParam")
      val ljj = math.sqrt(d)
      a(j * rank + j) = ljj
      var i = j + 1
      while (i < rank) {
        var s = a(i * rank + j)
        t = 0
        while (t < j) { s -= a(i * rank + t) * a(j * rank + t); t += 1 }
        a(i * rank + j) = s / ljj
        i += 1
      }
      j += 1
    }
    // Forward solve L y = b.
    var i = 0
    while (i < rank) {
      var s = atb(i)
      var t = 0
      while (t < i) { s -= a(i * rank + t) * y(t); t += 1 }
      y(i) = s / a(i * rank + i)
      i += 1
    }
    // Back solve Lᵀ x = y.
    val x = new Array[Float](rank)
    i = rank - 1
    while (i >= 0) {
      var s = y(i)
      var t = i + 1
      while (t < rank) { s -= a(t * rank + i) * y(t); t += 1 }
      y(i) = s / a(i * rank + i)
      x(i) = y(i).toFloat
      i -= 1
    }
    x
  }
}

/** Nonnegative least squares via cyclic projected coordinate descent:
  * x_j ← max(0, x_j + (b_j − A_j·x) / A_jj), swept until the largest
  * coordinate update is below tolerance. Deterministic; converges
  * linearly on the λ-regularized (strictly positive definite) systems
  * ALS produces. */
final class NnlsSolver(rank: Int, maxSweeps: Int = 500, tol: Double = 1e-12)
    extends LeastSquaresSolver {
  private val a = new Array[Double](rank * rank)
  private val xd = new Array[Double](rank)

  override def solve(ata: Array[Double], atb: Array[Double], lambda: Double): Array[Float] = {
    Solvers.unpack(ata, a, rank, lambda)
    java.util.Arrays.fill(xd, 0.0)
    var sweep = 0
    var maxDelta = Double.MaxValue
    while (sweep < maxSweeps && maxDelta > tol) {
      maxDelta = 0.0
      var j = 0
      while (j < rank) {
        var g = atb(j)
        var i = 0
        while (i < rank) { g -= a(j * rank + i) * xd(i); i += 1 }
        val nj = math.max(0.0, xd(j) + g / a(j * rank + j))
        val d = math.abs(nj - xd(j))
        if (d > maxDelta) maxDelta = d
        xd(j) = nj
        j += 1
      }
      sweep += 1
    }
    val x = new Array[Float](rank)
    var i = 0
    while (i < rank) { x(i) = xd(i).toFloat; i += 1 }
    x
  }
}

object Solvers {
  /** Expand packed upper (column-major) into a full symmetric row-major
    * matrix with λ added to the diagonal. */
  def unpack(packed: Array[Double], full: Array[Double], rank: Int, lambda: Double): Unit = {
    var j = 0
    var idx = 0
    while (j < rank) {
      var i = 0
      while (i <= j) {
        val v = packed(idx)
        full(i * rank + j) = v
        full(j * rank + i) = v
        idx += 1
        i += 1
      }
      full(j * rank + j) += lambda
      j += 1
    }
  }
}
