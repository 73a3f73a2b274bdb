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

  /** Incremental JOIN-view maintenance — the join sibling of
    * [[mergeAggSnapshots]]: keep a materialized `fact ⋈ dim` current
    * under appended fact rows AND updated dim rows without rejoining
    * the full fact table.
    *
    *  - surviving rows: matview rows whose dim key did NOT change
    *    (anti-join against the changed-key list);
    *  - repaired rows: the fact part of invalidated matview rows, plus
    *    the appended facts, joined against the CURRENT dim.
    *
    * Scale shape: the repair join touches only facts of changed keys
    * plus the delta — at 100 TB the matview is re-scanned once (cheap
    * columnar filter on the key), the full fact table never. `dim` must
    * be current (post-update) and is typically broadcast-sized;
    * `changedKeys` is the CDC key list. `dimCols` names the matview
    * columns owned by the dim (dropped before re-joining). */
  def maintainJoin(
      matview: DataFrame,
      factDelta: DataFrame,
      dim: DataFrame,
      changedKeys: DataFrame,
      key: String,
      dimCols: Seq[String]): DataFrame = {
    require(dimCols.nonEmpty, "dimCols must name the dim-owned matview columns")
    require(matview.columns.contains(key) && dim.columns.contains(key),
      s"join key $key must exist in matview and dim")
    val keep = matview.join(broadcast(changedKeys), Seq(key), "left_anti")
    val invalidated = matview.join(broadcast(changedKeys), Seq(key), "left_semi")
      .drop(dimCols: _*)
    // No broadcast hint on the dim: AQE picks broadcast when it fits;
    // a forced hint would be wrong for a genuinely large dimension.
    invalidated.unionByName(factDelta)
      .join(dim, Seq(key))
      .select(keep.columns.map(col): _*)
      .unionByName(keep)
  }
}
