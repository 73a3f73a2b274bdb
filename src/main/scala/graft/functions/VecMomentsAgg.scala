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

/** Long-state vector moment buffer: exact integer (n, Σq, ΣqqΤ). */
case class VecMomentsL(n: Long, sums: Array[Long], gram: Array[Long])

/** [[VecMomentsAgg]] over a pre-quantized `array<long>` column with
  * EXACT integer accumulation — the oracle-grade variant. Doubles sum
  * order-dependently (last-ulp noise that can flip a `round(…, 6)`
  * digit between engines); longs do not: addition is associative, so
  * the result is bit-identical regardless of partitioning or merge
  * order. Consumers quantize components to a fixed grid first (e.g.
  * `round(v · 10⁴)`), aggregate here, and derive covariance from the
  * exact moments with a closed form mirrored in the oracle. Headroom:
  * with |q| ≤ 10⁴ the Gram cells overflow Long only past ~9·10¹⁰
  * rows per aggregation — beyond that, raise the grid coarseness or
  * pre-aggregate per shard. */
object VecMomentsIntAgg extends Aggregator[Seq[Long], VecMomentsL, VecMomentsL] {
  override def zero: VecMomentsL = VecMomentsL(0L, Array.empty, Array.empty)
  override def reduce(b: VecMomentsL, x: Seq[Long]): VecMomentsL = {
    if (x == null) return b
    val xa = x.toArray
    val d = xa.length
    val acc =
      if (b.n == 0L && b.sums.isEmpty)
        VecMomentsL(0L, new Array[Long](d), new Array[Long](d * d))
      else b
    require(acc.sums.length == d,
      s"vec_moments_int: dimension changed mid-aggregation (${acc.sums.length} -> $d)")
    var i = 0
    while (i < d) {
      val xi = xa(i)
      acc.sums(i) += xi
      var j = 0
      val row = i * d
      while (j < d) { acc.gram(row + j) += xi * xa(j); j += 1 }
      i += 1
    }
    VecMomentsL(acc.n + 1, acc.sums, acc.gram)
  }
  override def merge(a: VecMomentsL, b: VecMomentsL): VecMomentsL = {
    if (a.n == 0L && a.sums.isEmpty) return b
    if (b.n == 0L && b.sums.isEmpty) return a
    require(a.sums.length == b.sums.length,
      s"vec_moments_int: merging different dimensions (${a.sums.length}, ${b.sums.length})")
    var i = 0
    while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
    var k = 0
    while (k < a.gram.length) { a.gram(k) += b.gram(k); k += 1 }
    VecMomentsL(a.n + b.n, a.sums, a.gram)
  }
  override def finish(r: VecMomentsL): VecMomentsL = r
  override def bufferEncoder: Encoder[VecMomentsL] = Encoders.product[VecMomentsL]
  override def outputEncoder: Encoder[VecMomentsL] = Encoders.product[VecMomentsL]
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
