package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Geometric mean as a typed [[Aggregator]] — the custom-AGGREGATE
  * extension surface (scalar expressions are [[ArrayDot]] /
  * [[NfcNormalize]]; whole operators are `graft.plans`). State is the
  * mergeable (Σ ln x, n) pair, so partial aggregation and AQE-combined
  * shuffles work exactly like a built-in: `exp(Σ ln x / n)` only at
  * finish. Non-positive inputs are the caller's problem (filter first)
  * — silently skipping them here would hide data bugs. */
object GeoMean extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), x: Double): (Double, Long) =
    (b._1 + math.log(x), b._2 + 1)
  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(r: (Double, Long)): Double =
    if (r._2 == 0) Double.NaN else math.exp(r._1 / r._2)
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
