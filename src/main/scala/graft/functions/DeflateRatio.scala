package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE compression ratio of a string column — compressed bytes /
  * raw UTF-8 bytes, the classic model-free redundancy signal (used by
  * CCNet/RedPajama-class corpus cleaners): boilerplate, repeated spans,
  * and template text compress far below ~1.0, while high-entropy text
  * stays near (or above) it. One static JVM call per row from inside
  * whole-stage codegen — no UDF serialization, no Python.
  *
  * Determinism: fixed Deflater(level 6, nowrap), single `deflate` pass —
  * byte-identical for a given input on a given JDK's zlib; the specs
  * assert ORDERING properties (repetitive < shuffled-unique) rather
  * than exact bytes, so a zlib version bump cannot break CI. Empty
  * strings report 1.0 (nothing to compress ≠ infinitely compressible);
  * null propagates. */
case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"deflate_ratio needs a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(s: Any): Any =
    DeflateRatio.ratio(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DeflateRatio.ratio($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)

  override def prettyName: String = "deflate_ratio"
}

object DeflateRatio {
  /** Static entry shared by interpreted eval and generated code. */
  def ratio(s: UTF8String): Double = {
    val raw = s.getBytes
    if (raw.length == 0) return 1.0
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](8192)
      var compressed = 0L
      while (!d.finished()) compressed += d.deflate(buf)
      compressed.toDouble / raw.length
    } finally d.end()
  }
}
