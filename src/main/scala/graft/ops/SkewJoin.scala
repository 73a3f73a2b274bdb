package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for power-law join keys — the manual salting pattern
  * for when AQE's runtime skew-join split isn't available (static plans,
  * pre-3.0 clusters) or insufficient (one key holding >> one partition).
  *
  * `saltedJoin(facts, dim, key, salts)` rewrites
  * `facts ⋈ dim ON key` as `facts+salt ⋈ dim×salts ON (key, salt)`: each
  * fact row gets a salt in [0, salts) — derived from the row position, so
  * it is arbitrary (not stable across re-partitioning) but
  * correctness-neutral: every salt value has its dim replica — the
  * (small) dim side is replicated `salts` times, and the hot key's rows
  * spread over `salts` reducers instead of one. Replication multiplies the dim-side
  * shuffle by `salts` — use for large-fact ⋈ small-dim joins where the
  * dim side is cheap to copy; equality with the unsalted join is exact
  * (inner and left joins preserve multiplicity: every fact row matches
  * exactly its own salt's dim replica).
  */
object SkewJoin {

  def saltedJoin(
      facts: DataFrame,
      dim: DataFrame,
      key: String,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(joinType == "inner" || joinType == "left" || joinType == "left_outer",
      s"salting preserves semantics for inner/left joins only, not $joinType")
    val salted = facts.withColumn("__graft_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val replicated = dim
      .withColumn("__graft_salt", explode(sequence(lit(0), lit(salts - 1))))
    salted
      .join(replicated, Seq(key, "__graft_salt"), joinType)
      .drop("__graft_salt")
  }

  /** Two-stage salted aggregation for power-law GROUP BY keys: stage 1
    * aggregates on (key, salt) — spreading a hot key's rows over `salts`
    * reducers — stage 2 merges the per-salt partials on the key alone.
    * Exact for decomposable aggregates (count and sum here, the common
    * pipeline profile); equality with the single-stage GROUP BY is the
    * oracle contract. Spark's map-side partial aggregation already
    * bounds *network* skew; the salt additionally bounds *reducer state*
    * skew — the case where one key's merged state (not its row stream)
    * exceeds a single task, which AQE cannot split. The stage-2 input is
    * |keys|×salts tiny partial rows, so the second shuffle is
    * negligible. Returns (key, n, sum_value). */
  def saltedAgg(
      df: DataFrame,
      key: String,
      value: org.apache.spark.sql.Column,
      salt: org.apache.spark.sql.Column,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    df.withColumn("__graft_salt", pmod(salt, lit(salts)))
      .groupBy(col(key), col("__graft_salt"))
      .agg(count(lit(1)).as("__graft_n"), sum(value).as("__graft_s"))
      .groupBy(col(key))
      .agg(sum("__graft_n").as("n"), sum("__graft_s").as("sum_value"))
  }
}
