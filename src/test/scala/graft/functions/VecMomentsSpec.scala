package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** VecMomentsAgg (typed Aggregator → UDAF): the one-pass (n, Σx, ΣxxΤ)
  * state must equal a hand-computed reference regardless of partition
  * layout (merge correctness), skip nulls, and reject dimension drift.
  */
class VecMomentsSpec extends SparkSpec {
  import spark.implicits._

  graft.functions.register(spark)

  private val vecs: Seq[Seq[Float]] =
    Seq(Seq(1f, 2f), Seq(3f, 5f), Seq(-2f, 0.5f), Seq(0f, 4f), Seq(7f, -1f))

  private def moments(numPartitions: Int): (Long, Seq[Double], Seq[Double]) = {
    val r = vecs.toDF("v").repartition(numPartitions)
      .agg(graft.functions.vec_moments(col("v")).as("m"))
      .select("m.n", "m.sums", "m.gram").head()
    (r.getLong(0), r.getSeq[Double](1), r.getSeq[Double](2))
  }

  test("moments equal the reference and are partition-invariant") {
    val d = 2
    val refSums = Array.fill(d)(0.0)
    val refGram = Array.fill(d * d)(0.0)
    for (v <- vecs; i <- 0 until d) {
      refSums(i) += v(i)
      for (j <- 0 until d) refGram(i * d + j) += v(i).toDouble * v(j)
    }
    for (p <- Seq(1, 3, 5)) {
      val (n, sums, gram) = moments(p)
      assert(n == vecs.length)
      sums.zip(refSums).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
      gram.zip(refGram).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
    }
  }

  test("vec_moments_int: exact integer moments, partition-invariant bit-for-bit") {
    val ivecs: Seq[Seq[Long]] =
      Seq(Seq(10L, 20L), Seq(30L, 50L), Seq(-20L, 5L), Seq(0L, 40L), Seq(70L, -10L))
    val d = 2
    val refSums = Array.fill(d)(0L)
    val refGram = Array.fill(d * d)(0L)
    for (v <- ivecs; i <- 0 until d) {
      refSums(i) += v(i)
      for (j <- 0 until d) refGram(i * d + j) += v(i) * v(j)
    }
    for (p <- Seq(1, 3, 5)) {
      val r = ivecs.toDF("v").repartition(p)
        .agg(graft.functions.vec_moments_int(col("v")).as("m"))
        .select("m.n", "m.sums", "m.gram").head()
      assert(r.getLong(0) == ivecs.length)
      assert(r.getSeq[Long](1) == refSums.toSeq)
      assert(r.getSeq[Long](2) == refGram.toSeq)
    }
  }

  test("null vectors are skipped; dimension drift is an error") {
    val withNull = (vecs :+ null).toDF("v")
      .agg(graft.functions.vec_moments(col("v")).as("m")).select("m.n").head()
    assert(withNull.getLong(0) == vecs.length)
    val drift = (vecs :+ Seq(1f, 2f, 3f)).toDF("v")
      .agg(graft.functions.vec_moments(col("v")))
    val e = intercept[Exception](drift.head())
    assert(e.getMessage != null)
  }

  test("embPca certificate: dominant eigenvalue beats the average, small residual") {
    val df = graft.queries.OpsQueries.embPca(spark, "/root/testdata/sf0.001").head()
    val (d, eig, evr, resid) =
      (df.getLong(1), df.getDouble(2), df.getDouble(3), df.getDouble(4))
    assert(eig > 0)
    // λ₁ ≥ tr(Σ)/d always; strict inequality on any non-isotropic data.
    assert(evr >= 1.0 / d - 1e-9, s"evr=$evr d=$d")
    assert(evr <= 1.0 + 1e-9)
    // Rayleigh-quotient residual: floors at the top-eigengap, which is
    // tiny on near-isotropic synthetic embeddings.
    assert(resid < 0.01, s"resid=$resid")
  }
}
