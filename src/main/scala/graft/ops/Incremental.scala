package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: merge partial-aggregate
  * SNAPSHOTS instead of recomputing from raw rows — the pattern that
  * keeps a 100 TB corpus's rollup tables current from daily deltas.
  * Any algebraic aggregate decomposed into mergeable state (count,
  * sum; avg = sum/count at read time; min/max likewise) can ride it:
  * aggregate each new partition of data once, then fold KB-scale
  * snapshot tables — the raw corpus is touched exactly once per delta,
  * never re-scanned.
  */
object Incremental {

  /** Merge aggregate snapshots sharing the schema (keys…, metrics…):
    * union + one grouped sum per metric column, preserving names.
    * Correct for sum-mergeable state: counts, sums — and anything a
    * caller has encoded as such. */
  def mergeAggSnapshots(snapshots: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(snapshots.nonEmpty, "need at least one snapshot")
    require(keys.nonEmpty, "at least one key column")
    val schema = snapshots.head.columns.toSeq
    require(snapshots.forall(_.columns.toSeq == schema),
      "snapshots must share one schema")
    val metrics = schema.filterNot(keys.contains)
    require(metrics.nonEmpty, "no metric columns to merge")
    snapshots.reduce(_ unionAll _)
      .groupBy(keys.map(col): _*)
      .agg(sum(metrics.head).as(metrics.head),
        metrics.tail.map(m => sum(m).as(m)): _*)
  }
}
