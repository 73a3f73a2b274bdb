package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(key, filter_bytes)` — probe a serialized
  * [[org.apache.spark.util.sketch.BloomFilter]] with a long key, as a
  * native predicate with whole-stage codegen.
  *
  * This is the user-facing analogue of the planner's internal runtime
  * Bloom filter (Spark's `InjectRuntimeFilter` embeds its serialized
  * filter in the plan the same way): the filter ships as a foldable
  * BinaryType literal, is deserialized ONCE per expression instance via
  * a codegen reference object, and each probe is a primitive hash test —
  * no per-row deserialization and no UDF boxing. Used by
  * [[graft.ops.BloomJoin]] to drop non-joining fact rows before the
  * shuffle of a shuffled equi-join.
  *
  * Null semantics: null key → null (standard binary null propagation).
  * False positives at the filter's fpp; false negatives never.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, BinaryType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (LongType, BinaryType) =>
        TypeCheckResult.TypeCheckFailure(
          "bloom_might_contain needs a FOLDABLE binary filter argument " +
            "(the serialized filter is a plan-time constant, not per-row data)")
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain needs (bigint, binary), got " +
            s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  /** Deserialized once per expression instance — the foldable right side
    * makes the cache safe; codegen pins the same instance as a reference
    * object, so executors never re-parse the bits per row. */
  @transient private lazy val bloom: BloomFilter = {
    val bytes = right.eval(null).asInstanceOf[Array[Byte]]
    require(bytes != null, "bloom_might_contain filter bytes must not be null")
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(k: Any, unusedFilter: Any): Any =
    bloom.mightContainLong(k.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, (k, _) => s"$ref.mightContainLong($k)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bloom_might_contain"
}
