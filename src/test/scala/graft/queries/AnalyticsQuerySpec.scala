package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants of the data-quality / analytics pack on the sf0.001
  * tables: these hold for ANY generator output, so they complement the
  * value-exact DuckDB oracles rather than repeat them. */
class AnalyticsQuerySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("profile_table: one row per column, no nulls, n_rows constant, min<=max") {
    val p = OpsQueries.profileTable(spark, dir).collect()
    assert(p.length == 8)
    assert(p.map(_.getAs[Long]("n_rows")).distinct.length == 1)
    assert(p.forall(_.getAs[Long]("n_null") == 0L))
    assert(p.forall(r => r.getAs[Double]("min_val") <= r.getAs[Double]("max_val")))
    assert(p.forall(r => r.getAs[Long]("n_distinct") > 0L))
  }

  test("ri_orphans: all six FK edges audited, zero orphans on generator output") {
    val e = OpsQueries.riOrphans(spark, dir).collect()
    assert(e.length == 6)
    assert(e.forall(_.getAs[Long]("orphans") == 0L))
    assert(e.forall(_.getAs[Long]("fk_rows") > 0L))
  }

  test("rfm_segments: quartiles in 1..4, balanced within 1, segment = r*100+f*10+m") {
    val df = OpsQueries.rfmSegments(spark, dir)
    val rows = df.collect()
    for (c <- Seq("r", "f", "m")) {
      val vals = rows.map(_.getAs[Long](c))
      assert(vals.forall(v => v >= 1 && v <= 4), s"$c out of range")
      val sizes = vals.groupBy(identity).values.map(_.length)
      assert(sizes.max - sizes.min <= 1, s"$c quartiles unbalanced: $sizes")
    }
    assert(rows.forall(r => r.getAs[Long]("segment") ==
      r.getAs[Long]("r") * 100 + r.getAs[Long]("f") * 10 + r.getAs[Long]("m")))
  }

  test("benford_revenue: digits 1..9, shares sum to 1, expectation sums to 1") {
    val b = OpsQueries.benfordRevenue(spark, dir).collect()
    assert(b.map(_.getAs[Long]("digit")).toSeq == (1L to 9L))
    assert(math.abs(b.map(_.getAs[Double]("share")).sum - 1.0) < 1e-4)
    assert(math.abs(b.map(_.getAs[Double]("benford_p")).sum - 1.0) < 1e-4)
    assert(b.forall(_.getAs[Double]("chi2_term") >= 0.0))
  }

  test("ab_ttest: both arms populated, near-even split, finite t") {
    val t = OpsQueries.abTtest(spark, dir).collect()
    assert(t.nonEmpty)
    t.foreach { r =>
      val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      assert(na > 0 && nb > 0)
      // The multiplicative hash splits users ~50/50; arms within 3x.
      assert(na < 3 * nb && nb < 3 * na, s"lopsided split $na vs $nb")
      assert(!r.getAs[Double]("t_stat").isNaN)
    }
  }
}
