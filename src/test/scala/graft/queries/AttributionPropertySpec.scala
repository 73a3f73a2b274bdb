package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantic properties of the round-11 statistics operators on the
  * sf0.001 testdata — invariants the DuckDB hash compare cannot
  * express (it checks equality, not correctness of the math). */
class AttributionPropertySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("shapley attribution satisfies the efficiency axiom") {
    // Σ_c φ(c) must equal v(grand coalition) − v(∅) — the Shapley
    // efficiency property — up to 32 half-nano rounding steps.
    val phi = StatQueries.shapleyAttribution(spark, dir)
    assert(phi.count() === 4L)
    val sumPhi = phi.agg(sum("phi_nano")).head().getLong(0) / 1e9
    val j = Tables.events(spark, dir).groupBy("user_id").agg(
      max(when(col("event_type") === "purchase", 1).otherwise(0)).as("conv"),
      (max(when(col("event_type") === "click", 1).otherwise(0))
        + max(when(col("event_type") === "error", 1).otherwise(0)) * 2
        + max(when(col("event_type") === "signup", 1).otherwise(0)) * 4
        + max(when(col("event_type") === "view", 1).otherwise(0)) * 8).as("mask"))
    val vFull = j.agg(avg("conv")).head().getDouble(0)
    val empty = j.filter(col("mask") === 0)
    val vEmpty =
      if (empty.isEmpty) 0.0 else empty.agg(avg("conv")).head().getDouble(0)
    assert(math.abs(sumPhi - (vFull - vEmpty)) < 1e-6,
      s"sum(phi)=$sumPhi vs v(C)-v(0)=${vFull - vEmpty}")
  }

  test("conformal intervals carry plausible finite-sample coverage") {
    val rows = EvalQueries.conformalInterval(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cov = r.getAs[Double]("coverage")
      val hw = r.getAs[Double]("half_width")
      // 90%-nominal split conformal on stationary synthetic data:
      // generous band that still catches an off-by-one quantile index
      // or a broken residual scale.
      assert(cov >= 0.75 && cov <= 1.0, s"coverage $cov out of band: $r")
      assert(hw > 0.0, s"degenerate interval: $r")
    }
  }

  test("lsh_plan recall is monotone in bands and inverse in rows-per-band") {
    val g = DedupSimQueries.lshPlan(spark, dir)
      .select("r", "b", "exp_recall").collect()
      .map(x => ((x.getInt(0), x.getInt(1)), x.getDouble(2))).toMap
    // More bands → more chances to collide (fixed r): recall rises.
    assert(g((2, 4)) <= g((2, 32)) + 1e-9)
    // More rows per band → stricter AND: recall falls (fixed b).
    assert(g((8, 8)) <= g((1, 8)) + 1e-9)
  }
}
