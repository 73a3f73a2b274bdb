package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The levenshtein-threshold optimizer rule: rewrite fires on
  * predicate shapes, leaves value projections alone, and preserves
  * results exactly. */
class ThresholdLevenshteinSpec extends SparkSpec {

  // Built over Range (not a literal LocalRelation) so the optimizer
  // can't constant-fold the filter away before the plan is inspected.
  private def docs = spark.range(0, 4).selectExpr(
    """CASE id WHEN 0 THEN 'kitten' WHEN 1 THEN 'flaw'
      |  WHEN 2 THEN 'abc' ELSE 'short' END AS a""".stripMargin,
    """CASE id WHEN 0 THEN 'sitting' WHEN 1 THEN 'lawn'
      |  WHEN 2 THEN 'abc' ELSE 'a-very-much-longer-string' END AS b""".stripMargin)
    // lev pairs: 3, 2, 0, 21

  test("lev <= k predicates rewrite to the thresholded form") {
    val q = docs.filter(levenshtein(col("a"), col("b")) <= 2)
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("levenshtein(") &&
      optimized.contains("Some(2)) >= 0"), optimized)
    assert(q.collect().map(_.getString(0)).sorted.toSeq == Seq("abc", "flaw"))
  }

  test("lev < k rewrites with k-1; reversed comparison rewrites too") {
    val lt = docs.filter(levenshtein(col("a"), col("b")) < 3)
    assert(lt.queryExecution.optimizedPlan.toString.contains("Some(2)) >= 0"))
    assert(lt.count() == 2)
    val rev = docs.filter(lit(3) >= levenshtein(col("a"), col("b")))
    assert(rev.queryExecution.optimizedPlan.toString.contains("Some(3)) >= 0"))
    assert(rev.count() == 3)
  }

  test("projected distance values are NOT rewritten") {
    val q = docs.select(levenshtein(col("a"), col("b")).as("lev"))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(!optimized.contains(">= 0"), optimized)
    assert(q.collect().map(_.getInt(0)).sorted.toSeq == Seq(0, 2, 3, 21))
  }

  test("already-thresholded and equality comparisons are left alone") {
    val eq = docs.filter(levenshtein(col("a"), col("b")) === 2)
    assert(!eq.queryExecution.optimizedPlan.toString.contains(">= 0"))
    assert(eq.count() == 1)
    val manual = docs.filter(levenshtein(col("a"), col("b"), 5) >= 0)
    assert(manual.count() == 3)
  }
}
