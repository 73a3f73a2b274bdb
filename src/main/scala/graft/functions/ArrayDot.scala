package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Σ aᵢ·bᵢ over two arrays (float or double elements) as a single native
  * expression with whole-stage codegen.
  *
  * The composable alternative — `aggregate(zip_with(a, b, _*_), 0d, _+_)`
  * — is also codegen'd but materializes the intermediate product array
  * and walks lambda-bound variables per element; this expression is one
  * fused primitive loop, which matters on the model-serving hot paths
  * (`CollectiveALSModel.predict`, ANN re-rank) where it runs per
  * (row × rank).
  *
  * Null semantics: null if either array is null (standard binary null
  * propagation); null *elements* contribute 0 (treated as missing).
  * Accumulation is double, left-to-right — engine-reproducible. If the
  * arrays differ in length, only the common prefix contributes.
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def elem(t: DataType): Option[DataType] = t match {
      case ArrayType(et @ (FloatType | DoubleType), _) => Some(et)
      case _ => None
    }
    (elem(left.dataType), elem(right.dataType)) match {
      case (Some(_), Some(_)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"array_dot needs array<float|double> inputs, got " +
            s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xa = a.asInstanceOf[ArrayData]
    val xb = b.asInstanceOf[ArrayData]
    val n = math.min(xa.numElements(), xb.numElements())
    val la = elemType(left) == DoubleType
    val lb = elemType(right) == DoubleType
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!xa.isNullAt(i) && !xb.isNullAt(i)) {
        val va = if (la) xa.getDouble(i) else xa.getFloat(i).toDouble
        val vb = if (lb) xb.getDouble(i) else xb.getFloat(i).toDouble
        acc += va * vb
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      def get(arr: String, e: Expression): String = elemType(e) match {
        case DoubleType => s"$arr.getDouble($i)"
        case _          => s"(double) $arr.getFloat($i)"
      }
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += ${get(a, left)} * ${get(b, right)};
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "array_dot"
}
