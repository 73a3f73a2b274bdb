package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Index of a value among sorted cut points — bucket = #cuts strictly
  * below the value — as a native codegen'd binary search over a
  * broadcast-referenced `double[]`.
  *
  * This is [[graft.ops.ChronoSplit.withOrderStats]]' bucket-assignment
  * primitive. The composable alternative — an `aggregate()` fold over a
  * cut-array literal — walks all N cuts per row through INTERPRETED
  * lambda evaluation, and worse: projection collapse inlines a computed
  * order column (e.g. `round(a/b, 6)`) into every one of the N
  * comparisons, so a 256-bucket fold re-evaluates the column 256× per
  * row (the round-11 weighted_median probe measured 87 s at sf0.1 from
  * exactly this). Here the child evaluates ONCE and the search is
  * log₂N native compares inside whole-stage codegen.
  *
  * Semantics: `Arrays.binarySearch` insertion point = number of cuts
  * strictly below v (cuts are distinct ascending; an exact hit at index
  * i returns i — the i cuts before it are all smaller). Monotone in v
  * and equal values always share a bucket, the two properties the
  * bucketed-window construction needs. NaN sorts above every cut
  * (Java double compare), matching `Double.compare` ordering. */
case class BucketIndex(child: Expression, cuts: Array[Double])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bucket_index needs a double input, got ${other.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    BucketIndex.bucketOf(v.asInstanceOf[Double], cuts)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cutsRef = ctx.addReferenceObj("cuts", cuts, "double[]")
    defineCodeGen(ctx, ev,
      v => s"graft.functions.BucketIndex.bucketOf($v, $cutsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BucketIndex =
    copy(child = newChild)

  override def prettyName: String = "bucket_index"
}

object BucketIndex {
  /** Number of cuts strictly below v (cuts distinct ascending). −0.0
    * normalizes to 0.0 first: SQL comparison treats them equal, and a
    * bucket split between them would break the equal-value ⇒
    * equal-bucket invariant the bucketed-window construction needs
    * (callers normalize the cuts the same way). */
  def bucketOf(v: Double, cuts: Array[Double]): Int = {
    val x = if (v == 0.0d) 0.0d else v
    val r = java.util.Arrays.binarySearch(cuts, x)
    if (r >= 0) r else -(r + 1)
  }
}
