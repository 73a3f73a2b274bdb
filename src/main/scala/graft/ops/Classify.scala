package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Nearest-centroid (Rocchio) classification over an embedding column —
  * the cheapest vector classifier and the natural audit companion to
  * [[Similarity]]'s kNN: one centroid per label instead of a neighbor
  * search per query.
  *
  * Oracle-grade determinism (the [[graft.functions.VecMomentsIntAgg]]
  * discipline): components quantize to a fixed integer grid, per-label
  * centroid SUMS stay exact longs (associative addition — bit-identical
  * under any partitioning), and the squared distance to a centroid is
  * derived as the exact integer Σᵢ(qᵢ·n − sᵢ)² divided by the exact n²
  * — two correctly-rounded double ops that both engines perform
  * identically, so even the argmin needs no rounding guard.
  *
  * Scale shape: the centroid table is |labels| rows (broadcast); the
  * only fact-scale work is one narrow pass over the evaluation vectors
  * against that broadcast — no shuffle beyond the label-keyed partial
  * aggregation of the training sums. Headroom: the integer score
  * (qᵢ·n − sᵢ)² stays inside Long while (2·scale·max|v|·n)²·d ≤ 2⁶³ —
  * per-label n up to ~3·10⁴ at the default 10⁴ grid. That is not a
  * scale limit on the DATA: centroids are means, so production trains
  * them on a bounded per-label sample (10⁴ rows pins a mean to ~1%),
  * and the classify pass over any number of eval rows is unaffected
  * by n. */
object Classify {

  /** Quantized copy of `vecCol`: round(v · scale) per component, long. */
  private[ops] def quantize(vecCol: Column, scale: Int): Column =
    transform(vecCol, v =>
      round(v.cast("double") * lit(scale.toDouble)).cast("long"))

  /** Confusion matrix (label_true, label_pred, n) of a nearest-centroid
    * classifier: centroids from `train`, scored on `eval`, both with
    * `vecCol` quantized to the 1/`scale` grid. Distance ties break to
    * the lowest label. */
  def centroidConfusion(
      train: DataFrame,
      eval_ : DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      scale: Int = 10000): DataFrame = {
    val q = quantize(col(vecCol), scale)
    // Per-label exact integer sums: explode to (label, i, q) then one
    // label×dim-keyed aggregate — partial aggregation collapses each
    // partition to |labels|·d rows before the exchange.
    val sums = train
      .select(col(labelCol).as("c_label"), posexplode(q).as(Seq("i", "qv")))
      .groupBy("c_label", "i").agg(sum("qv").as("s"))
      .groupBy("c_label").agg(
        count(lit(1)).as("d"),
        array_sort(collect_list(struct(col("i"), col("s")))).as("sv"))
      .select(col("c_label"),
        expr("transform(sv, x -> x.s)").as("s"))
    val n = train.groupBy(col(labelCol).as("c_label"))
      .agg(count(lit(1)).as("n"))
    val cents = sums.join(n, "c_label")
    // Exact integer score: Σ_i (q_i·n − s_i)², then /n² in double —
    // deterministic, so the argmin compares bit-identical values.
    val scored = eval_
      .select(col(idCol).as("id"), col(labelCol).as("label_true"), q.as("qv"))
      .crossJoin(broadcast(cents))
      .withColumn("num",
        aggregate(zip_with(col("qv"), col("s"),
            (a, b) => (a * col("n") - b) * (a * col("n") - b)),
          lit(0L), (acc, x) => acc + x))
      .withColumn("dist2",
        col("num").cast("double") / (col("n") * col("n")).cast("double"))
    scored
      .groupBy("id", "label_true")
      .agg(min(struct(col("dist2"), col("c_label"))).as("best"))
      .groupBy(col("label_true"), col("best.c_label").as("label_pred"))
      .agg(count(lit(1)).as("n"))
  }
}
