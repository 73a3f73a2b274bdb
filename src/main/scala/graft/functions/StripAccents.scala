package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Accent/diacritic stripping (NFD decomposition + combining-mark
  * removal) as a native codegen'd expression.
  *
  * The search/dedup normalization that folds "café", "café" and
  * "cafe" to one token — matching DuckDB's `strip_accents` and the
  * ICU-style folding used by search engines for Latin-script matching.
  * Spark has no built-in (a UDF would break whole-stage codegen next to
  * the hash/tokenize expressions this feeds), so it takes the
  * custom-`Expression` path like [[NfcNormalize]]. Deliberately NOT
  * NFKC case folding: only category-M marks are dropped, letter
  * identity and case are untouched.
  *
  * Null semantics: null in → null out (standard unary propagation).
  */
case class StripAccents(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"strip_accents needs a string input, got ${other.catalogString}")
    }

  override def nullSafeEval(s: Any): Any =
    StripAccents.strip(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StripAccents.strip($c)")

  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)

  override def prettyName: String = "strip_accents"
}

object StripAccents {
  /** ASCII fast path: a pure-ASCII UTF8String has nothing to strip and
    * returns untouched (no JVM String round trip) — the common case for
    * web corpora after language filtering. */
  def strip(s: UTF8String): UTF8String = {
    if (isAscii(s)) return s
    val decomposed = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(decomposed.length)
    var i = 0
    while (i < decomposed.length) {
      val cp = decomposed.codePointAt(i)
      val t = Character.getType(cp)
      if (t != Character.NON_SPACING_MARK && t != Character.COMBINING_SPACING_MARK
        && t != Character.ENCLOSING_MARK)
        sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  private def isAscii(s: UTF8String): Boolean = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }
}
