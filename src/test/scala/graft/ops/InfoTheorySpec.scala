package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row

class InfoTheorySpec extends SparkSpec {

  test("mutualInfo is ~0 for independent columns and H(X) for X vs X") {
    import spark.implicits._
    // Perfectly independent: every (x, y) cell has identical count.
    val indep = (for (x <- 0 to 3; y <- 0 to 3; _ <- 1 to 5)
      yield (x.toString, y.toString)).toDF("xc", "yc")
    val Row(_, _, mi0: Double, _, _, nmi0: Double) =
      InfoTheory.mutualInfo(indep, "xc", "yc", "indep").head()
    assert(math.abs(mi0) < 1e-6, s"independent MI should be ~0, got $mi0")
    assert(math.abs(nmi0) < 1e-6)
    // Fully dependent: Y = X ⇒ MI = H(X) = ln 4, NMI = 1.
    val dep = (for (x <- 0 to 3; _ <- 1 to 5)
      yield (x.toString, x.toString)).toDF("xc", "yc")
    val Row(_, _, mi1: Double, hx: Double, _, nmi1: Double) =
      InfoTheory.mutualInfo(dep, "xc", "yc", "dep").head()
    assert(math.abs(mi1 - math.log(4.0)) < 1e-5, s"got $mi1")
    assert(math.abs(mi1 - hx) < 1e-5)
    assert(math.abs(nmi1 - 1.0) < 1e-5)
  }

  test("mutualInfo is symmetric in its arguments") {
    import spark.implicits._
    val df = Seq(("a", "p"), ("a", "p"), ("a", "q"), ("b", "q"),
      ("b", "q"), ("c", "p")).toDF("xc", "yc")
    val m1 = InfoTheory.mutualInfo(df, "xc", "yc", "f").head()
    val m2 = InfoTheory.mutualInfo(df, "yc", "xc", "r").head()
    assert(m1.getDouble(2) === m2.getDouble(2)) // mi
    assert(m1.getDouble(3) === m2.getDouble(4)) // h_x == other's h_y
  }
}
