package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Mahalanobis scoring: the exact trace identity Σ mahal² = d·(n−1)
  * (which holds for ANY data against its own empirical moments) is the
  * oracle; plus matrix-inverse correctness and the fused-expression
  * path on a hand-checkable 2-D case. */
class MahalanobisSpec extends SparkSpec {
  import spark.implicits._

  test("invert: A * A^-1 = I, singular input rejected") {
    val a = Array(Array(4.0, 2.0, 0.6), Array(2.0, 3.0, 0.2), Array(0.6, 0.2, 1.5))
    val inv = Mahalanobis.invert(a.map(_.clone()))
    for (i <- 0 until 3; j <- 0 until 3) {
      val e = (0 until 3).map(k => a(i)(k) * inv(k)(j)).sum
      assert(math.abs(e - (if (i == j) 1.0 else 0.0)) < 1e-10, s"($i,$j)=$e")
    }
    val sing = Array(Array(1.0, 2.0), Array(2.0, 4.0))
    intercept[IllegalArgumentException](Mahalanobis.invert(sing))
  }

  test("sum of squared distances equals d*(n-1) exactly (trace identity)") {
    val df = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val d = df.select(size(col("embedding"))).head.getInt(0)
    val n = df.count()
    val total = Mahalanobis.score(df, "embedding")
      .agg(sum("mahal2")).head.getDouble(0)
    val expected = d.toDouble * (n - 1)
    assert(math.abs(total - expected) / expected < 1e-9,
      s"sum=$total expected=$expected")
  }

  test("2-D hand case: isotropic unit covariance reduces to euclidean") {
    // Four points at (+-1, 0), (0, +-1) scaled: mean 0, cov = diag(2/3, 2/3);
    // mahal2(x) = |x|^2 * 3/2.
    val pts = Seq(Seq(1f, 0f), Seq(-1f, 0f), Seq(0f, 1f), Seq(0f, -1f))
    val out = Mahalanobis.score(pts.toDF("v"), "v")
      .select("mahal2").collect().map(_.getDouble(0))
    out.foreach(m => assert(math.abs(m - 1.5) < 1e-9, s"got $m"))
  }

  test("whiten: whitened sample has exactly zero mean and identity covariance") {
    val out = Mahalanobis.whiten(
        Tables.embeddings(spark, "/root/testdata/sf0.001"), "embedding")
      .select("whitened").collect().map(_.getSeq[Double](0).toArray)
    val n = out.length
    val d = out.head.length
    val mu = Array.tabulate(d)(i => out.map(_(i)).sum / n)
    mu.foreach(m => assert(math.abs(m) < 1e-9, s"mean $m"))
    for (i <- 0 until d by 7; j <- i until d by 11) {
      val c = out.map(v => (v(i) - mu(i)) * (v(j) - mu(j))).sum / (n - 1)
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(c - expect) < 1e-8, s"cov($i,$j)=$c")
    }
  }

  test("cholesky and triangular inverse agree with the Gauss-Jordan inverse") {
    val a = Array(Array(4.0, 2.0, 0.6), Array(2.0, 3.0, 0.2), Array(0.6, 0.2, 1.5))
    val l = Mahalanobis.cholesky(a.map(_.clone()))
    // L·Lᵀ = A
    for (i <- 0 until 3; j <- 0 until 3) {
      val e = (0 until 3).map(k => l(i)(k) * l(j)(k)).sum
      assert(math.abs(e - a(i)(j)) < 1e-10)
    }
    // (L⁻¹)ᵀ·L⁻¹ = A⁻¹
    val w = Mahalanobis.invertLowerTriangular(l)
    val inv = Mahalanobis.invert(a.map(_.clone()))
    for (i <- 0 until 3; j <- 0 until 3) {
      val e = (0 until 3).map(k => w(k)(i) * w(k)(j)).sum
      assert(math.abs(e - inv(i)(j)) < 1e-10)
    }
  }

  test("array_mat_vec: identity and permutation matrices round-trip; dim mismatch fails") {
    graft.functions.register(spark)
    val v = Seq(Seq(1f, 2f, 3f)).toDF("v")
    val id = typedlit(Seq(1.0, 0, 0, 0, 1.0, 0, 0, 0, 1.0))
    val perm = typedlit(Seq(0.0, 1.0, 0, 0, 0, 1.0, 1.0, 0, 0))
    val r = v.select(
      graft.functions.array_mat_vec(id, col("v")).as("i"),
      graft.functions.array_mat_vec(perm, col("v")).as("p")).head
    assert(r.getSeq[Double](0) == Seq(1.0, 2.0, 3.0))
    assert(r.getSeq[Double](1) == Seq(2.0, 3.0, 1.0))
    val bad = v.select(graft.functions.array_mat_vec(typedlit(Seq(1.0, 2.0)), col("v")))
    val e = intercept[Exception](bad.head)
    assert(e.getMessage.contains("array_mat_vec") ||
      Option(e.getCause).exists(_.getMessage.contains("array_mat_vec")))
  }
}
