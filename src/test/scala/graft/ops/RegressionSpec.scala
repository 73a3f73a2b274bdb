package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row

class RegressionSpec extends SparkSpec {

  test("olsNormal2 recovers an exact linear relation with r2 = 1") {
    import spark.implicits._
    // y = 7 + 3*x1 - 2*x2, exactly — OLS must return the coefficients
    // and a perfect fit.
    val rows = for (x1 <- 0L to 9L; x2 <- 0L to 9L)
      yield (7L + 3 * x1 - 2 * x2, x1, x2)
    val df = rows.toDF("y", "x1", "x2")
    val Row(n: Long, b0: Double, b1: Double, b2: Double, r2: Double) =
      Regression.olsNormal2(df, "y", "x1", "x2").head()
    assert(n === 100L)
    assert(b0 === 7.0 && b1 === 3.0 && b2 === -2.0)
    assert(r2 === 1.0)
  }

  test("olsNormal2 matches a hand-solved noisy system") {
    import spark.implicits._
    // Small deterministic integer data; solve the normal equations
    // with the same closed form in plain Scala and compare.
    val data = Seq((5L, 1L, 2L), (9L, 2L, 1L), (12L, 3L, 3L),
      (20L, 5L, 2L), (14L, 4L, 4L), (8L, 2L, 3L))
    val df = data.toDF("y", "x1", "x2")
    val n = data.size.toDouble
    val s1 = data.map(_._2).sum.toDouble
    val s2 = data.map(_._3).sum.toDouble
    val s11 = data.map(t => t._2 * t._2).sum.toDouble
    val s12 = data.map(t => t._2 * t._3).sum.toDouble
    val s22 = data.map(t => t._3 * t._3).sum.toDouble
    val sy = data.map(_._1).sum.toDouble
    val s1y = data.map(t => t._2 * t._1).sum.toDouble
    val s2y = data.map(t => t._3 * t._1).sum.toDouble
    val m00 = s11 * s22 - s12 * s12
    val m01 = s1 * s22 - s12 * s2
    val m02 = s1 * s12 - s11 * s2
    val det = n * m00 - s1 * m01 + s2 * m02
    val b0e = (sy * m00 - s1 * (s1y * s22 - s12 * s2y)
      + s2 * (s1y * s12 - s11 * s2y)) / det
    val b1e = (n * (s1y * s22 - s12 * s2y) - sy * m01
      + s2 * (s1 * s2y - s1y * s2)) / det
    val b2e = (n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
      + sy * m02) / det
    val Row(_, b0: Double, b1: Double, b2: Double, r2: Double) =
      Regression.olsNormal2(df, "y", "x1", "x2").head()
    assert(math.abs(b0 - math.rint(b0e * 1e6) / 1e6) < 1e-9)
    assert(math.abs(b1 - math.rint(b1e * 1e6) / 1e6) < 1e-9)
    assert(math.abs(b2 - math.rint(b2e * 1e6) / 1e6) < 1e-9)
    assert(r2 > 0.9 && r2 <= 1.0)
  }
}
