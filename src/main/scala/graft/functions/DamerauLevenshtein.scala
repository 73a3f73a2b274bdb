package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** True (unrestricted) Damerau-Levenshtein edit distance as a native
  * codegen'd expression — Levenshtein extended with transposition of
  * adjacent characters, where a transposed pair may be further edited
  * ("CA"→"ABC" = 2, which the restricted OSA variant scores 3). Spark
  * ships only plain `levenshtein`; a Scala UDF here would break
  * whole-stage codegen on exactly the blocked-pair ER scoring loop.
  *
  * Algorithm: Lowrance-Wagner (1975) with the `da` last-occurrence
  * table, O(|a|·|b|) time. Comparison is per Unicode CODEPOINT (a
  * surrogate pair counts as ONE character — "😀" → "😁" is one
  * substitution), consistent with Spark's own builtin `levenshtein`.
  * The `er_damerau` oracle cross-checks digit-for-digit against
  * DuckDB's independent `damerau_levenshtein`; note that DuckDB's
  * implementation compares per UTF-8 BYTE (probe: its 'é' → 'a' = 2),
  * so the cross-engine agreement is a property of ASCII keys (where
  * byte = codepoint — what the oracle feeds), NOT of arbitrary text.
  * Score on normalized keys ([[NfcNormalize]], [[StripAccents]]) as ER
  * pipelines do anyway.
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, _: StringType) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"damerau_levenshtein needs two string inputs, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshtein.distance(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.DamerauLevenshtein.distance($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "damerau_levenshtein"
}

object DamerauLevenshtein {

  /** See [[DamerauLevenshtein]] for the pinned semantics. */
  def distance(ua: UTF8String, ub: UTF8String): Int = {
    val a = ua.toString.codePoints().toArray
    val b = ub.toString.codePoints().toArray
    val la = a.length
    val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    val inf = la + lb
    // (la+2) × (lb+2) matrix with the Lowrance-Wagner sentinel border.
    val w = lb + 2
    val d = new Array[Int]((la + 2) * w)
    d(0) = inf
    var i = 0
    while (i <= la) { d((i + 1) * w) = inf; d((i + 1) * w + 1) = i; i += 1 }
    var j = 0
    while (j <= lb) { d(j + 1) = inf; d(w + j + 1) = j; j += 1 }
    // Last row in `a` where each codepoint occurred (1-based; 0 = never).
    val da = new java.util.HashMap[Integer, Integer]()
    i = 1
    while (i <= la) {
      var db = 0 // last column in b matched on this row
      val ca = a(i - 1)
      j = 1
      while (j <= lb) {
        val cb = b(j - 1)
        val k = { val v = da.get(cb); if (v == null) 0 else v.intValue() }
        val l = db
        val cost = if (ca == cb) { db = j; 0 } else 1
        val sub = d(i * w + j) + cost
        val ins = d((i + 1) * w + j) + 1
        val del = d(i * w + j + 1) + 1
        val tra = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        var m = sub
        if (ins < m) m = ins
        if (del < m) m = del
        if (tra < m) m = tra
        d((i + 1) * w + j + 1) = m
        j += 1
      }
      da.put(ca, i)
      i += 1
    }
    d((la + 1) * w + lb + 1)
  }
}
