package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson-Lindenstrauss random projection with a DETERMINISTIC sign
  * matrix — the dimension-reduction step before a cheaper ANN index or
  * a pairwise-distance sweep: project d-dim embeddings to k ≪ d dims
  * with ±1 signs derived from md5(i:j) parity, so any worker (and the
  * SQL oracle) reconstructs the identical matrix with no shipped state
  * and no RNG seed coordination.
  *
  * Exactness: inputs quantize to an integer grid, each projected
  * coordinate is the exact long Σᵢ qᵢ·sign(i,j), and the JL distortion
  * audit compares exact integer squared distances — engine-identical
  * with no float accumulation anywhere. The sign matrix is a d×k
  * literal (a few KB) folded per row via codegen'd higher-order
  * functions: no explode, no shuffle, no UDF. */
object Projection {

  /** Parity-of-md5 sign for matrix cell (i, j): +1 / −1, mirrored in
    * SQL as ('0x' || substr(md5(i || ':' || j), 1, 15))::BIGINT % 2. */
  private[ops] def sign(i: Int, j: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$i:$j".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    if (new java.math.BigInteger(hex, 16).testBit(0)) -1L else 1L
  }

  /** `df` with `outCol` = the k-dim exact-integer projection of the
    * quantized `vecCol` (round(v·scale) per component). */
  def withProjection(
      df: DataFrame,
      vecCol: String,
      outCol: String,
      d: Int,
      k: Int,
      scale: Int = 10000): DataFrame = {
    require(d > 0 && k > 0, "need positive dimensions")
    val q = Classify.quantize(col(vecCol), scale)
    val projected = array((0 until k).map { j =>
      val signs = typedLit((0 until d).map(i => sign(i, j)))
      aggregate(zip_with(q, signs, (a, s) => a * s), lit(0L), (acc, x) => acc + x)
    }: _*)
    df.withColumn(outCol, projected)
  }

  /** JL distortion audit over a deterministic sample: for every sampled
    * pair, the exact integer squared distances in original (quantized)
    * and projected space, and the distortion ratio
    * (proj_d2 / k) / orig_d2 — the quantity the JL lemma bounds near 1.
    * Per-pair rows (no cross-row float aggregate: a mean of ratios
    * would re-introduce order-dependent summation). */
  def distortionAudit(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      d: Int,
      k: Int,
      sampleMod: Int,
      scale: Int = 10000): DataFrame = {
    val base = withProjection(
      df.filter(pmod(col(idCol), lit(sampleMod.toLong)) === 0)
        .select(col(idCol).as("id"), Classify.quantize(col(vecCol), scale).as("qv")),
      "qv", "pv", d, k, scale = 1) // qv is already quantized; scale 1 = identity
    def side(p: String) = base.select(
      col("id").as(s"${p}id"), col("qv").as(s"${p}qv"), col("pv").as(s"${p}pv"))
    def d2(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, x) => acc + x)
    side("a_").join(side("b_"), col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        d2(col("a_qv"), col("b_qv")).as("orig_d2"),
        d2(col("a_pv"), col("b_pv")).as("proj_d2"))
      .withColumn("distortion", round(
        col("proj_d2").cast("double") / lit(k.toDouble)
          / col("orig_d2").cast("double"), 6))
  }
}
