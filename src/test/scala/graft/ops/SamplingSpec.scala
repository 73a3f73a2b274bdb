package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Deterministic-sampling contracts: slice disjointness/concatenation
  * (the leak-free split property), reproducibility, and exact stratum
  * quotas — with the production xxhash64 hash, not the oracle's
  * arithmetic one. */
class SamplingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("hash slices are disjoint, concatenate, and reproduce exactly") {
    val docs = Tables.documents(spark, dir)
    val h = xxhash64(col("doc_id"), lit(99L))
    val a = ids(Sampling.hashSlice(docs, h, 0.0, 0.3))
    val b = ids(Sampling.hashSlice(docs, h, 0.3, 1.0))
    assert((a & b).isEmpty, "slices overlap")
    assert((a | b) == ids(docs), "slices do not concatenate to the whole")
    // Growing a sample extends it — the [0, 0.3) rows are a subset of
    // [0, 0.6), so earlier processing is never resampled.
    val grown = ids(Sampling.hashSample(docs, h, 0.6))
    assert(a.subsetOf(grown))
    // Deterministic: a re-evaluation returns the identical id set.
    assert(ids(Sampling.hashSlice(docs, h, 0.0, 0.3)) == a)
    // The fraction is approximately honored (hash uniformity).
    val frac = a.size.toDouble / ids(docs).size
    assert(frac > 0.2 && frac < 0.4, s"fraction $frac far from 0.3")
  }

  test("temperatureQuota splits the target by sqrt-count weights") {
    import spark.implicits._
    // 400 vs 100 rows → weights 20 vs 10 → quotas 60 vs 30 of target 90.
    val df = ((1 to 400).map(i => ("a", i.toLong)) ++
      (1 to 100).map(i => ("b", i.toLong))).toDF("g", "id")
    val h = xxhash64(col("id"), lit(3L))
    val out = Sampling.temperatureQuota(df, Seq("g"), Seq(h, col("id")), 90L)
    val byG = out.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG == Map("a" -> 60L, "b" -> 30L), byG.toString)
    // Deterministic: a re-evaluation draws the identical rows.
    val again = Sampling.temperatureQuota(df, Seq("g"), Seq(h, col("id")), 90L)
    assert(out.exceptAll(again).count() == 0 && again.exceptAll(out).count() == 0)
  }

  test("temperatureQuota hits the target exactly when bases floor to zero") {
    import spark.implicits._
    // 200 strata × 100 rows: every base quota floors to 0 (w=10,
    // tw=2000, 100·10 div 2000 = 0); the largest-remainder top-up must
    // still draw exactly the target, one row from each of 100 strata
    // (remainders all tie at 1000 → stratum-key order decides).
    val df = (0 until 200).flatMap(g => (1 to 100).map(i =>
      (f"s$g%03d", (g * 1000 + i).toLong))).toDF("g", "id")
    val out = Sampling.temperatureQuota(df, Seq("g"), Seq(col("id")), 100L)
    assert(out.count() == 100L)
    val strata = out.select("g").distinct().as[String].collect().sorted
    assert(strata.length == 100 && strata.head == "s000" && strata.last == "s099")
  }

  test("temperatureQuota caps the draw at the stratum size") {
    import spark.implicits._
    // b holds a single row; whatever quota the split assigns it, the
    // draw returns the row it has — and a's draw equals its quota.
    val df = ((1 to 400).map(i => ("a", i.toLong)) :+ ("b", 9999L)).toDF("g", "id")
    // w_a=20, w_b=1, tw=21, target 100: base_a = 2000 div 21 = 95,
    // base_b = 100 div 21 = 4, deficit 1; rem_a = 5, rem_b = 16 → b +1
    // → quota_b = 5, but |b| = 1 → draw 1.
    val out = Sampling.temperatureQuota(df, Seq("g"), Seq(col("id")), 100L)
    val byG = out.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG == Map("a" -> 95L, "b" -> 1L), byG.toString)
  }

  test("stratifiedQuota returns min(n, |stratum|) rows per stratum") {
    val cust = Tables.customer(spark, dir)
    val h = xxhash64(col("c_custkey"), lit(5L))
    val out = Sampling.stratifiedQuota(
      cust, Seq(col("c_nationkey")), Seq(h, col("c_custkey")), 4)
    val got = out.groupBy("c_nationkey").count()
      .collect().map(r => r.getAs[Number](0).longValue -> r.getLong(1)).toMap
    val full = cust.groupBy("c_nationkey").count()
      .collect().map(r => r.getAs[Number](0).longValue -> r.getLong(1)).toMap
    assert(got.keySet == full.keySet, "a stratum disappeared")
    got.foreach { case (k, n) =>
      assert(n == math.min(4L, full(k)), s"stratum $k: $n of ${full(k)}")
    }
    // Deterministic draw: same hash, same rows.
    val again = Sampling.stratifiedQuota(
      cust, Seq(col("c_nationkey")), Seq(h, col("c_custkey")), 4)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(again == out.select("c_custkey").collect().map(_.getLong(0)).toSet)
  }

  test("weightedSample picks exactly the k smallest A-ES keys") {
    import spark.implicits._
    // Deterministic uniform from an arithmetic hash so the expected set
    // is computable locally with the same double arithmetic.
    val rows = (1L to 2000L).map(id => (id, 50L + (id * 37) % 400))
    val df = rows.toDF("id", "w")
    val h = pmod(col("id") * lit(2654435761L) + lit(7L), lit(1048576L))
    val u = (h + lit(1L)).cast("double") / lit(1048577.0)
    val out = Sampling.weightedSample(df, u, col("w").cast("double"), 100)
    val got = out.select("id").collect().map(_.getLong(0)).toSet
    val expect = rows.map { case (id, w) =>
      val hv = (id * 2654435761L + 7L) % 1048576L
      val uv = (hv + 1L).toDouble / 1048577.0
      (id, -math.log(uv) / w.toDouble)
    }.sortBy(_._2).take(100).map(_._1).toSet
    assert(got == expect)
    assert(out.count() == 100)
    // Heavier rows are over-represented: the sampled mean weight must
    // exceed the population mean (weighted-draw bias).
    val popMean = rows.map(_._2).sum.toDouble / rows.size
    val sampMean = rows.filter(r => got(r._1)).map(_._2).sum.toDouble / 100
    assert(sampMean > popMean, s"sample mean $sampMean <= population $popMean")
  }

  test("hashSlice rejects invalid ranges; quota rejects bad args") {
    val docs = Tables.documents(spark, dir)
    intercept[IllegalArgumentException] {
      Sampling.hashSlice(docs, col("doc_id"), 0.5, 0.2)
    }
    intercept[IllegalArgumentException] {
      Sampling.stratifiedQuota(docs, Seq(col("doc_id")), Seq(col("doc_id")), 0)
    }
  }
}
