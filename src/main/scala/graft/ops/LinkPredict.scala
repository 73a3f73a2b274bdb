package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Adamic-Adar link prediction over an undirected edge list — "which
  * non-adjacent pairs share many rare neighbors": score(a, b) =
  * Σ_{w ∈ Γ(a) ∩ Γ(b)} 1 / ln(deg w). Common neighbors weighted by
  * rarity, the classic common-neighbor predictor that out-ranks plain
  * counts on hubby graphs.
  *
  * Exactness: each middle vertex contributes the INTEGER
  * round(10⁶ / ln deg) micro-score, summed exactly — float summation
  * order never touches the ranking (round-then-sum, the repo's
  * discipline for order-sensitive float accumulation).
  *
  * Scale shape: paths a–w–b enumerate by joining the symmetric edge
  * list to itself THROUGH the middle vertex, so the candidate space is
  * Σ_w deg(w)² — quadratic in hub degree, which is why vertices with
  * deg > maxHubDeg are excluded from the middle role (the same hot-key
  * cap as the inverted-index joins; a w with thousands of neighbors
  * carries a near-zero 1/ln(deg) weight anyway). Final top-k is a
  * distributed TakeOrdered, never a global sort.
  */
object LinkPredict {

  /** Top-k non-edges of `edges` (one row per undirected pair,
    * `aCol` < `bCol`) by Adamic-Adar micro-score.
    * Output: `a, b, n_common, aa_score_us`. */
  def adamicAdar(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      maxHubDeg: Int = 100,
      k: Int = 20): DataFrame = {
    val e = edges.select(col(aCol).as("ea"), col(bCol).as("eb"))
    val sym = e.select(col("ea").as("u"), col("eb").as("v"))
      .unionAll(e.select(col("eb").as("u"), col("ea").as("v")))
    // deg >= 2: a degree-1 vertex has no neighbor PAIR to connect, so
    // excluding it is lossless — and keeps ln(deg) away from ln 1 = 0
    // (ANSI divide-by-zero).
    val mid = sym.groupBy(col("v").as("w")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= 2 && col("deg") <= maxHubDeg)
      .select(col("w"),
        round(lit(1000000.0) / log(col("deg")), 0).cast("long").as("w_contrib"))
    val paths = sym.select(col("u").as("a"), col("v").as("w1"))
      .join(mid, col("w1") === col("w"))
      .join(sym.select(col("u").as("w2"), col("v").as("b")), col("w1") === col("w2"))
      .filter(col("a") < col("b"))
    paths.groupBy("a", "b")
      .agg(sum("w_contrib").as("aa_score_us"), count(lit(1)).as("n_common"))
      .join(e, col("a") === col("ea") && col("b") === col("eb"), "left_anti")
      .orderBy(col("aa_score_us").desc, col("a"), col("b"))
      .limit(k)
      .select("a", "b", "n_common", "aa_score_us")
  }

  /** Top-k non-edges by Jaccard neighbor overlap:
    * score = |Γa ∩ Γb| / (deg a + deg b − |Γa ∩ Γb|). The intersection
    * is counted through middle vertices with deg ∈ [2, maxHubDeg]
    * (the same hot-key cap as [[adamicAdar]] — hub middles explode the
    * path join quadratically); the union denominator uses the FULL
    * degrees. The score is one exact integer ratio rounded to ppm, so
    * the ranking never touches float accumulation.
    * Output: `a, b, n_common, deg_a, deg_b, jaccard_ppm`. */
  def jaccard(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      maxHubDeg: Int = 100,
      k: Int = 20): DataFrame = {
    val e = edges.select(col(aCol).as("ea"), col(bCol).as("eb"))
    val sym = e.select(col("ea").as("u"), col("eb").as("v"))
      .unionAll(e.select(col("eb").as("u"), col("ea").as("v")))
    val deg = sym.groupBy("u").agg(count(lit(1)).as("deg"))
    val mid = deg.filter(col("deg") >= 2 && col("deg") <= maxHubDeg)
      .select(col("u").as("w"))
    val paths = sym.select(col("u").as("a"), col("v").as("w1"))
      .join(mid, col("w1") === col("w"))
      .join(sym.select(col("u").as("w2"), col("v").as("b")), col("w1") === col("w2"))
      .filter(col("a") < col("b"))
    paths.groupBy("a", "b").agg(count(lit(1)).as("n_common"))
      .join(e, col("a") === col("ea") && col("b") === col("eb"), "left_anti")
      .join(deg.select(col("u").as("a"), col("deg").as("deg_a")), "a")
      .join(deg.select(col("u").as("b"), col("deg").as("deg_b")), "b")
      .withColumn("jaccard_ppm", expr(
        "cast(round(cast(n_common as double)*1000000/(deg_a + deg_b - n_common), 0) as bigint)"))
      .orderBy(col("jaccard_ppm").desc, col("a"), col("b"))
      .limit(k)
      .select("a", "b", "n_common", "deg_a", "deg_b", "jaccard_ppm")
  }
}
