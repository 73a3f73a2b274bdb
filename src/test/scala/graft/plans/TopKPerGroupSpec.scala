package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom top-k-per-group operator: result equivalence against the
  * window formulation, plan shape (custom exec present, no window/full
  * sort), and the distribution contract. */
class TopKPerGroupSpec extends SparkSpec {

  private def sample = {
    import spark.implicits._
    // Deterministic multiplicative scramble: collisions in v exercise
    // the tiebreak; 7 groups × ~143 rows, k well under group size.
    (0L until 1000L).map(i => (i % 7, (i * 2654435761L) % 997L, i))
      .toDF("g", "v", "id")
  }

  test("matches the row_number window formulation exactly") {
    val custom = Graft.topKPerGroup(sample, Seq("g"), "v", 5,
        descending = true, tiebreak = Seq("id"))
      .select("g", "v", "id").orderBy("g", "v", "id")
      .collect().map(_.toSeq).toSeq
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
    val windowed = sample.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).select("g", "v", "id").orderBy("g", "v", "id")
      .collect().map(_.toSeq).toSeq
    assert(custom == windowed)
    assert(custom.length == 35)
  }

  test("ascending order and k larger than the group return whole groups") {
    val all = Graft.topKPerGroup(sample, Seq("g"), "v", 1000,
        descending = false, tiebreak = Seq("id"))
    assert(all.count() == 1000)
    val asc = Graft.topKPerGroup(sample, Seq("g"), "v", 1,
        descending = false, tiebreak = Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mins = sample.groupBy("g").agg(min("v")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(asc == mins)
  }

  test("plans as TopKPerGroupExec with one hash exchange and no window sort") {
    val q = Graft.topKPerGroup(sample, Seq("g"), "v", 3, tiebreak = Seq("id"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup ["), plan.take(2000))
    assert(!plan.contains("WindowExec") && !plan.contains("WindowGroupLimit"),
      plan.take(2000))
    assert(plan.contains("Exchange hashpartitioning(g"), plan.take(2000))
  }

  test("rejects unknown columns and bad k") {
    intercept[IllegalArgumentException](
      Graft.topKPerGroup(sample, Seq("nope"), "v", 3))
    intercept[IllegalArgumentException](
      Graft.topKPerGroup(sample, Seq("g"), "v", 0))
  }
}
