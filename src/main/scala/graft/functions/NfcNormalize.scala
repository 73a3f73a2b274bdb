package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression.
  *
  * Web-scale text arrives in mixed normalization forms (combining marks
  * vs precomposed characters — "é" vs "é"), which silently breaks
  * every byte-keyed operator downstream: exact dedup, fingerprints,
  * token joins. Normalizing at ingest makes content hashing
  * well-defined; Spark has no built-in for it (UDF would be the
  * fallback), so this is the custom-`Expression` path — the codegen body
  * is a single static call, keeping the projection inside whole-stage
  * codegen next to the md5/length expressions it feeds.
  *
  * NFC (not NFKC): canonical composition only — ligatures, width and
  * compatibility variants are preserved, so normalization never changes
  * what a human would consider distinct content.
  *
  * Null semantics: null in → null out (standard unary propagation).
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nfc_normalize needs a string input, got ${other.catalogString}")
    }

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.normalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {
  /** `Normalizer.isNormalized` is a cheap no-allocation scan with an
    * ASCII fast path — for the overwhelmingly-already-NFC corpus case we
    * return the input UTF8String untouched instead of round-tripping
    * through a JVM String copy. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
