package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function

/** graft's native column functions (custom Catalyst expressions).
  * Call [[register]] once per session (GraftSession does); the Column
  * helpers resolve through the function registry — the public path to a
  * custom expression on Spark 4.
  */
package object functions {

  /** Σ aᵢ·bᵢ over two array<float|double> columns — fused codegen loop
    * ([[graft.functions.ArrayDot]]). */
  def array_dot(a: Column, b: Column): Column = call_function("array_dot", a, b)

  /** Unicode NFC normalization of a string column
    * ([[graft.functions.NfcNormalize]]). */
  def nfc_normalize(s: Column): Column = call_function("nfc_normalize", s)

  private def wrongArgs(name: String, expected: Int, actual: Int): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
      messageParameters = Map(
        "functionName" -> s"`$name`",
        "expectedNum" -> expected.toString,
        "actualNum" -> actual.toString,
        "docroot" -> "https://spark.apache.org/docs/latest"))

  /** Geometric mean of a positive double column
    * ([[graft.functions.GeoMean]], typed Aggregator → UDAF). */
  def geo_mean(x: Column): Column = call_function("geo_mean", x)

  /** Probe a serialized Bloom filter (foldable binary literal) with a
    * long key ([[graft.functions.BloomMightContain]]). */
  def bloom_might_contain(key: Column, filterBytes: Column): Column =
    call_function("bloom_might_contain", key, filterBytes)

  /** Accent/diacritic stripping (NFD + combining-mark removal) of a
    * string column ([[graft.functions.StripAccents]]). */
  def strip_accents(s: Column): Column = call_function("strip_accents", s)

  /** One-pass (n, Σx, ΣxxΤ) moments of an `array<float>` column
    * ([[graft.functions.VecMomentsAgg]], typed Aggregator → UDAF). */
  def vec_moments(v: Column): Column = call_function("vec_moments", v)

  /** Dense mat-vec `M·v` (row-major flattened matrix × vector,
    * [[graft.functions.ArrayMatVec]]). */
  def array_mat_vec(m: Column, v: Column): Column =
    call_function("array_mat_vec", m, v)

  /** [[vec_moments]] over an `array<double>` column
    * ([[graft.functions.VecMomentsDoubleAgg]]). */
  def vec_moments_double(v: Column): Column = call_function("vec_moments_double", v)

  /** Exact integer moments of a pre-quantized `array<long>` column
    * ([[graft.functions.VecMomentsIntAgg]]) — order-independent
    * accumulation for oracle-grade covariance. */
  def vec_moments_int(v: Column): Column = call_function("vec_moments_int", v)

  /** DEFLATE compression ratio of a string column
    * ([[graft.functions.DeflateRatio]]). */
  def deflate_ratio(s: Column): Column = call_function("deflate_ratio", s)

  /** Jaro-Winkler similarity of two string columns
    * ([[graft.functions.JaroWinklerSim]]). */
  def jaro_winkler(a: Column, b: Column): Column = call_function("jaro_winkler", a, b)

  /** True Damerau-Levenshtein edit distance of two string columns
    * ([[graft.functions.DamerauLevenshtein]]). */
  def damerau_levenshtein(a: Column, b: Column): Column =
    call_function("damerau_levenshtein", a, b)

  /** Register graft's expressions with a session's function registry
    * (idempotent); enables both the Column helpers above and SQL-text use. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("geo_mean", org.apache.spark.sql.functions.udaf(GeoMean))
    spark.udf.register("vec_moments",
      org.apache.spark.sql.functions.udaf(VecMomentsAgg,
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]()))
    spark.udf.register("vec_moments_double",
      org.apache.spark.sql.functions.udaf(VecMomentsDoubleAgg,
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()))
    spark.udf.register("vec_moments_int",
      org.apache.spark.sql.functions.udaf(VecMomentsIntAgg,
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
      (children: Seq[Expression]) => {
        if (children.length != 2) wrongArgs("array_dot", 2, children.length)
        ArrayDot(children(0), children(1))
      })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("array_mat_vec"),
      new ExpressionInfo(classOf[ArrayMatVec].getName, "array_mat_vec"),
      (children: Seq[Expression]) => {
        if (children.length != 2) wrongArgs("array_mat_vec", 2, children.length)
        ArrayMatVec(children(0), children(1))
      })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("deflate_ratio"),
      new ExpressionInfo(classOf[DeflateRatio].getName, "deflate_ratio"),
      (children: Seq[Expression]) => {
        if (children.length != 1) wrongArgs("deflate_ratio", 1, children.length)
        DeflateRatio(children(0))
      })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (children: Seq[Expression]) => {
        if (children.length != 1) wrongArgs("nfc_normalize", 1, children.length)
        NfcNormalize(children.head)
      })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerSim].getName, "jaro_winkler"),
      (children: Seq[Expression]) => {
        if (children.length != 2) wrongArgs("jaro_winkler", 2, children.length)
        JaroWinklerSim(children(0), children(1))
      })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("damerau_levenshtein"),
      new ExpressionInfo(classOf[DamerauLevenshtein].getName, "damerau_levenshtein"),
      (children: Seq[Expression]) => {
        if (children.length != 2) wrongArgs("damerau_levenshtein", 2, children.length)
        DamerauLevenshtein(children(0), children(1))
      })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_might_contain"),
      (children: Seq[Expression]) => {
        if (children.length != 2) wrongArgs("bloom_might_contain", 2, children.length)
        BloomMightContain(children(0), children(1))
      })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("strip_accents"),
      new ExpressionInfo(classOf[StripAccents].getName, "strip_accents"),
      (children: Seq[Expression]) => {
        if (children.length != 1) wrongArgs("strip_accents", 1, children.length)
        StripAccents(children.head)
      })
  }
}
