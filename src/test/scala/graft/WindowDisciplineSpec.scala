package graft

import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Guard-rail for the single-partition-window discipline: NO query in
  * the public surface may plan an unpartitioned `Window` whose input is
  * raw-table scale. At 100 TB an unpartitioned WindowExec funnels the
  * whole table through one task; the scale-safe alternative
  * ([[graft.ops.ChronoSplit.withOrderStats]]: quantile-bucketed bounded
  * windows + prefix offsets) exists precisely so no operator ever needs
  * one. Post-aggregate windows (hour/day/nation/decile axes — bounded
  * by calendar or catalog constants) are fine and NOT flagged: the walk
  * stops at any Aggregate/Limit, so only windows that can see
  * un-aggregated relation rows count as offenders.
  *
  * This spec exists so the NEXT hundred operators can't silently regrow
  * the family round 10's audit found (quantile_norm, watermark_audit,
  * ab_sprt, eval_calibration — all rewritten in round 11). */
class WindowDisciplineSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Can un-aggregated relation rows flow into this subtree's output?
    * Cuts: aggregation collapses cardinality to the group space;
    * limits bound it by a constant. LogicalRelation (file-backed) and
    * LogicalRDD (checkpointed intermediates, e.g. the planted
    * paragraph corpus) both count as raw sources. */
  private def rawReachable(p: LogicalPlan): Boolean = p match {
    case _: Aggregate => false
    case _: GlobalLimit | _: LocalLimit => false
    case _: LogicalRelation => true
    case l: LeafNode => l.getClass.getSimpleName == "LogicalRDD"
    case other => other.children.exists(rawReachable)
  }

  private def offendingWindows(p: LogicalPlan): Seq[Window] =
    p.collect {
      case w: Window if w.partitionSpec.isEmpty && rawReachable(w.child) => w
    }

  test("no query plans an unpartitioned Window over raw-table-scale input") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val bad =
          try offendingWindows(fn(spark, dir).queryExecution.optimizedPlan)
          catch {
            case e: Throwable =>
              fail(s"$name: query construction/planning failed: ${e.getMessage}")
          }
        if (bad.nonEmpty) Some(s"$name (${bad.size} window(s))") else None
    }
    assert(offenders.isEmpty,
      s"unpartitioned raw-scale Window in: ${offenders.mkString(", ")} — " +
        "use ChronoSplit.withOrderStats/withNtile (bucketed windows) instead")
  }
}
