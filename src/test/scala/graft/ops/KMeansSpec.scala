package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Lloyd's-invariant and determinism checks for [[KMeans]]. */
class KMeansSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every row is assigned exactly once, to a live cluster") {
    val e = Tables.embeddings(spark, dir)
    val n = e.count()
    val cents = KMeans.fit(e, "vec_id", "embedding", k = 4, iters = 2)
    val a = KMeans.assign(e, "vec_id", "embedding", cents)
    assert(a.count() == n)
    assert(a.select("id").distinct().count() == n)
    val live = cents.map(_._1.toLong).toSet
    val used = a.select("cluster").distinct().collect().map(_.getLong(0)).toSet
    assert(used.subsetOf(live), s"assigned to dead clusters: ${used -- live}")
  }

  test("inertia is monotone non-increasing over Lloyd rounds") {
    val e = Tables.embeddings(spark, dir)
    // Inertia after each round; rounding at 6 dp can wiggle the last
    // decimal, so allow that epsilon and no more.
    val inertias = (0 to 3).map { it =>
      val cents = KMeans.fit(e, "vec_id", "embedding", k = 4, iters = it)
      KMeans.inertia(KMeans.assign(e, "vec_id", "embedding", cents))
    }
    inertias.sliding(2).foreach { case Seq(prev, next) =>
      assert(next <= prev + 1e-3, s"inertia increased: $inertias")
    }
    // And the fit actually improves on the raw seeds.
    assert(inertias.last < inertias.head)
  }

  test("fit is deterministic across invocations") {
    val e = Tables.embeddings(spark, dir)
    val c1 = KMeans.fit(e, "vec_id", "embedding", k = 3, iters = 2)
    val c2 = KMeans.fit(e, "vec_id", "embedding", k = 3, iters = 2)
    assert(c1.map(_._1).sameElements(c2.map(_._1)))
    c1.zip(c2).foreach { case ((_, a), (_, b)) => assert(a.sameElements(b)) }
  }

  test("k = 1 collapses to the (rounded) global centroid") {
    val e = Tables.embeddings(spark, dir)
    val cents = KMeans.fit(e, "vec_id", "embedding", k = 1, iters = 1)
    assert(cents.length == 1)
    val expected = e
      .select(posexplode(col("embedding").cast("array<double>")))
      .groupBy("pos").agg(round(avg("col"), 6).as("x"))
      .orderBy("pos").collect().map(_.getDouble(1))
    assert(cents(0)._2.sameElements(expected))
  }

  test("silhouette: s in [-1, 1], a is the own-cluster distance, separated clusters score high") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(0.0, 0.0)), (2L, Seq(0.1, 0.0)),
      (3L, Seq(10.0, 0.0)), (4L, Seq(10.1, 0.0))).toDF("id", "v")
    val cents: KMeans.Centroids =
      Array((0, Array(0.05, 0.0)), (1, Array(10.05, 0.0)))
    val rows = KMeans.silhouette(df, "id", "v", cents)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.forall { case (_, _, a, b, s) => s >= -1 && s <= 1 && a <= b })
    // Tight, well-separated clusters: every point near-perfectly placed.
    assert(rows.forall(_._5 > 0.99), rows.mkString(", "))
    assert(rows.filter(_._1 <= 2).forall(_._2 == 0L))
    assert(rows.filter(_._1 >= 3).forall(_._2 == 1L))
    // And the real-embeddings silhouette stays in range.
    val e = Tables.embeddings(spark, dir)
    val fitted = KMeans.fit(e, "vec_id", "embedding", k = 4, iters = 2)
    val sil = KMeans.silhouette(e, "vec_id", "embedding", fitted)
      .agg(org.apache.spark.sql.functions.min("s"),
        org.apache.spark.sql.functions.max("s")).collect()(0)
    assert(sil.getDouble(0) >= -1 && sil.getDouble(1) <= 1)
  }

  test("assignment picks the argmin centroid with ties to the lower id") {
    import spark.implicits._
    // Two identical centroids: every point must land on cluster 0.
    val df = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)))
      .toDF("id", "v")
    val cents: KMeans.Centroids =
      Array((0, Array(0.5, 0.5)), (1, Array(0.5, 0.5)))
    val a = KMeans.assign(df, "id", "v", cents).collect()
    assert(a.forall(_.getLong(1) == 0L))
  }
}
