package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One-pass vector moment state: count, per-component sums, and the
  * full d×d Gram matrix (row-major), accumulated over an
  * `array<float>` column. */
case class VecMoments(n: Long, sums: Array[Double], gram: Array[Double])

/** Distributed second-moment (Gram/covariance) aggregation as a typed
  * [[Aggregator]] — the vector sibling of [[GeoMean]]. State is
  * (n, Σx, ΣxxΤ): mergeable by element-wise addition, so partial
  * aggregation collapses each partition to ONE d²+d+1-double buffer
  * before any exchange — the covariance of 10¹² vectors shuffles
  * kilobytes. Downstream: covariance/correlation matrices, PCA (driver
  * eigensolve of the d×d result), whitening, Mahalanobis gates.
  *
  * The full d×d Gram is kept instead of the upper triangle: the 2×
  * state cost at d=64 is 32 KB, and consumers get trivial (i,j) =
  * (idx div d, idx mod d) indexing instead of triangle-unpacking
  * arithmetic. Dimension is inferred from the first vector; a
  * mismatched length later is an error (data bug), null vectors are
  * skipped. Float components widen to double exactly, so engine
  * differences are only summation order (~1e-15 relative). */
object VecMomentsAgg extends Aggregator[Seq[Float], VecMoments, VecMoments] {

  override def zero: VecMoments = VecMoments(0L, Array.empty, Array.empty)

  override def reduce(b: VecMoments, x: Seq[Float]): VecMoments =
    if (x == null) b else VecMomentsOps.accumulate(b, x.toArray.map(_.toDouble))

  override def merge(a: VecMoments, b: VecMoments): VecMoments =
    VecMomentsOps.merge(a, b)

  override def finish(r: VecMoments): VecMoments = r

  override def bufferEncoder: Encoder[VecMoments] = Encoders.product[VecMoments]
  override def outputEncoder: Encoder[VecMoments] = Encoders.product[VecMoments]
}

/** [[VecMomentsAgg]] over `array<double>` input — the variant derived
  * columns (whitened/centered vectors) aggregate through without a
  * lossy float cast. */
object VecMomentsDoubleAgg extends Aggregator[Seq[Double], VecMoments, VecMoments] {
  override def zero: VecMoments = VecMoments(0L, Array.empty, Array.empty)
  override def reduce(b: VecMoments, x: Seq[Double]): VecMoments =
    if (x == null) b else VecMomentsOps.accumulate(b, x.toArray)
  override def merge(a: VecMoments, b: VecMoments): VecMoments =
    VecMomentsOps.merge(a, b)
  override def finish(r: VecMoments): VecMoments = r
  override def bufferEncoder: Encoder[VecMoments] = Encoders.product[VecMoments]
  override def outputEncoder: Encoder[VecMoments] = Encoders.product[VecMoments]
}

private[functions] object VecMomentsOps {

  def accumulate(b: VecMoments, xa: Array[Double]): VecMoments = {
    val d = xa.length
    val acc =
      if (b.n == 0L && b.sums.isEmpty)
        VecMoments(0L, new Array[Double](d), new Array[Double](d * d))
      else b
    require(acc.sums.length == d,
      s"vec_moments: dimension changed mid-aggregation (${acc.sums.length} -> $d)")
    var i = 0
    while (i < d) {
      val xi = xa(i)
      acc.sums(i) += xi
      var j = 0
      val row = i * d
      while (j < d) { acc.gram(row + j) += xi * xa(j); j += 1 }
      i += 1
    }
    VecMoments(acc.n + 1, acc.sums, acc.gram)
  }

  def merge(a: VecMoments, b: VecMoments): VecMoments = {
    if (a.n == 0L && a.sums.isEmpty) return b
    if (b.n == 0L && b.sums.isEmpty) return a
    require(a.sums.length == b.sums.length,
      s"vec_moments: merging different dimensions (${a.sums.length}, ${b.sums.length})")
    var i = 0
    while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
    var k = 0
    while (k < a.gram.length) { a.gram(k) += b.gram(k); k += 1 }
    VecMoments(a.n + b.n, a.sums, a.gram)
  }
}
