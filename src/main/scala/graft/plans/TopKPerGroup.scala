package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Ascending, Descending, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.{DataFrame, SparkSessionExtensions}
import org.apache.spark.sql.graftshim.GraftSqlShim

/** Whole-operator Catalyst extension: top-k rows per group as a
  * first-class plan node — the (c) tier of the custom-operator ladder
  * (compose > custom expression > custom plan + strategy).
  *
  * Why a custom operator at all: the idiomatic
  * `row_number().over(Window.partitionBy(g).orderBy(o)) <= k` SORTS
  * every group in full — at 100 TB that is a total shuffle plus an
  * O(n log n) sort whose output is immediately discarded past rank k.
  * [[TopKPerGroupExec]] holds a k-bounded heap per group instead:
  * state is `groups-in-partition × k` rows, work is `n log k`, and the
  * only exchange is the hash partition on the group key that
  * [[ClusteredDistribution]] requests (Spark's EnsureRequirements
  * inserts it — the operator composes with AQE like any built-in).
  *
  * The ordering must be TOTAL (pass a unique tiebreak) for the kept
  * row set to be deterministic — same contract as every ranked oracle
  * in this engine.
  */
case class TopKPerGroupPlan(
    groupCols: Seq[Attribute],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(groupCols.nonEmpty, "need at least one group column")
  require(k >= 1, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupPlan =
    copy(child = newChild)
}

/** Plans [[TopKPerGroupPlan]] into [[TopKPerGroupExec]]. */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Per-partition bounded-heap top-k: one `PriorityQueue` of at most k
  * rows per group key (max-heap under the requested order, so the
  * worst retained row pops first). Rows are copied only while they are
  * heap-resident — evicted rows cost nothing. */
case class TopKPerGroupExec(
    groupCols: Seq[Attribute],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  // All rows of a group must co-locate; Spark inserts the (single)
  // hash exchange to satisfy this, or elides it when the child is
  // already partitioned on the key (e.g. a bucketed scan).
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupCols) :: Nil

  protected override def doExecute(): RDD[InternalRow] = {
    val limit = k
    val groupExprs = groupCols
    val sortOrder = order
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupExprs, childOutput)
      val ord = new LazilyGeneratedOrdering(sortOrder, childOutput)
      val heaps = scala.collection.mutable.HashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        val pq = heaps.get(key) match {
          case Some(q) => q
          case None =>
            val q = scala.collection.mutable.PriorityQueue.empty[InternalRow](ord)
            heaps.put(key.copy(), q)
            q
        }
        if (pq.size < limit) pq += row.copy()
        else if (ord.compare(row, pq.head) < 0) { pq.dequeue(); pq += row.copy() }
      }
      heaps.valuesIterator.flatMap(q => q.toArray.sorted(ord).iterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** `spark.sql.extensions` entry point registering the graft planner
  * strategies (set by `GraftSession`; any session can opt in with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => TopKPerGroupStrategy)
    ext.injectOptimizerRule(_ => ThresholdLevenshteinRule)
  }
}

/** Public DataFrame-level API over the custom plan nodes. */
object Graft {

  /** Top `k` rows of `df` per `groupCols`, ranked by `orderCol`
    * (descending by default) with `tiebreak` columns ascending —
    * `order + tiebreak` must form a total order for determinism. */
  def topKPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      orderCol: String,
      k: Int,
      descending: Boolean = true,
      tiebreak: Seq[String] = Nil): DataFrame = {
    val lp = df.queryExecution.analyzed
    def attr(n: String): Attribute = lp.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"column $n not in ${lp.output.map(_.name).mkString(", ")}"))
    val dir = if (descending) Descending else Ascending
    val order = SortOrder(attr(orderCol), dir) +:
      tiebreak.map(c => SortOrder(attr(c), Ascending))
    GraftSqlShim.ofRows(df.sparkSession,
      TopKPerGroupPlan(groupCols.map(attr), order, k, lp))
  }
}
