package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dense mat-vec `M·v` as a native expression with whole-stage codegen:
  * `left` is the matrix flattened row-major (`array<double>`, d² elements
  * — in practice a broadcast literal: a covariance inverse, a whitening
  * or projection matrix), `right` the vector (`array<float|double>`, d
  * elements). Returns `array<double>` of length d.
  *
  * With [[ArrayDot]] this closes per-row quadratic forms UDF-free:
  * `array_dot(c, array_mat_vec(M, c))` is the Mahalanobis distance² of a
  * centered vector — one fused d² loop per row inside codegen, no
  * intermediate product arrays beyond the single result buffer.
  *
  * d is taken from the vector side; the matrix must have exactly d²
  * elements (runtime error otherwise — a silently-truncated matrix
  * product is a wrong answer, not a convenience). Null *elements* in
  * the vector contribute 0 (missing-component semantics, matching
  * [[ArrayDot]]); a null matrix element poisons its output row to
  * preserve "null means unknown" for the weights themselves. */
case class ArrayMatVec(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val okM = left.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    val okV = right.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (okM && okV)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"array_mat_vec needs (array<double>, array<float|double>), got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  private def vecIsDouble: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def nullSafeEval(m: Any, v: Any): Any = {
    val xm = m.asInstanceOf[ArrayData]
    val xv = v.asInstanceOf[ArrayData]
    val d = xv.numElements()
    if (xm.numElements() != d * d)
      throw new IllegalArgumentException(
        s"array_mat_vec: matrix has ${xm.numElements()} elements, vector dim $d needs ${d * d}")
    val out = new Array[Any](d)
    val dbl = vecIsDouble
    var i = 0
    while (i < d) {
      var acc = 0.0
      var poisoned = false
      var j = 0
      while (j < d) {
        val k = i * d + j
        if (xm.isNullAt(k)) poisoned = true
        else if (!xv.isNullAt(j)) {
          val vj = if (dbl) xv.getDouble(j) else xv.getFloat(j).toDouble
          acc += xm.getDouble(k) * vj
        }
        j += 1
      }
      out(i) = if (poisoned) null else acc
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (m, v) => {
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val acc = ctx.freshName("acc")
      val poisoned = ctx.freshName("poisoned")
      val out = ctx.freshName("out")
      val getV = if (vecIsDouble) s"$v.getDouble($j)" else s"(double) $v.getFloat($j)"
      s"""
         |int $d = $v.numElements();
         |if ($m.numElements() != $d * $d) {
         |  throw new IllegalArgumentException(
         |    "array_mat_vec: matrix has " + $m.numElements() +
         |    " elements, vector dim " + $d + " needs " + ($d * $d));
         |}
         |Object[] $out = new Object[$d];
         |for (int $i = 0; $i < $d; $i++) {
         |  double $acc = 0.0;
         |  boolean $poisoned = false;
         |  for (int $j = 0; $j < $d; $j++) {
         |    int $k = $i * $d + $j;
         |    if ($m.isNullAt($k)) { $poisoned = true; }
         |    else if (!$v.isNullAt($j)) { $acc += $m.getDouble($k) * $getV; }
         |  }
         |  $out[$i] = $poisoned ? null : (Object) java.lang.Double.valueOf($acc);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayMatVec =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "array_mat_vec"
}
