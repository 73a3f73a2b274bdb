package graft.ops

import graft.cmf.CollectiveALS.splitmix64
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (SURVEY §2 #23–24):
  * brute-force cosine top-k as the exact baseline, and random-hyperplane
  * LSH bucketing + exact re-rank as the sub-quadratic scale path.
  */
object Similarity {

  /** Σ aᵢ·bᵢ over two array<double> columns — native, sequential
    * left-to-right accumulation (engine-reproducible). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  private def normalized(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))

  /** Exact cosine top-k neighbors of each query over the corpus
    * (self-matches excluded): (query_id, neighbor_id, cosine, rank).
    *
    * Scale shape: queries × corpus with the (small) query side broadcast;
    * per-query ranking is TakeOrdered-style via a bounded window. Use for
    * modest query sets or as the ground truth for [[lshTopK]] recall. */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = normalized(queries, idCol, vecCol)
      .select(col("id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val c = normalized(corpus, idCol, vecCol)
    val scored = c.join(broadcast(q), col("qid") =!= col("id"))
      .withColumn("cosine", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("id").as("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /** Deterministic random hyperplanes: `planes` rows of `dim` signed
    * Gaussian components from a SplitMix64 stream. */
  def hyperplanes(dim: Int, planes: Int, seed: Long): Seq[Seq[Double]] =
    (0 until planes).map { p =>
      var state = splitmix64(seed + p)
      (0 until dim).map { _ =>
        state = splitmix64(state)
        val u1 = ((state >>> 11) + 0.5) / (1L << 53).toDouble
        state = splitmix64(state)
        val u2 = ((state >>> 11) + 0.5) / (1L << 53).toDouble
        math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
      }
    }

  /** Approximate cosine top-k via random-hyperplane LSH.
    *
    * Each vector gets a `planes`-bit sign signature; the bits split into
    * `bands` band keys; query and corpus rows meet only inside matching
    * (band, key) buckets (sub-quadratic — never the full cross product),
    * then exact cosine re-ranks the candidates. Output shape matches
    * [[bruteForceTopK]]; recall rises with `planes`/`bands` (collision
    * probability per plane is 1 − θ/π).
    */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      planes: Int = 16,
      bands: Int = 4,
      seed: Long = 7L): DataFrame = {
    require(planes % bands == 0, "planes must divide into bands")
    val r = planes / bands
    val hp = hyperplanes(dimOf(corpus, vecCol), planes, seed)
    val hpLit = typedLit(hp)
    def sig(v: Column): Column =
      transform(hpLit, p => when(dot(v, p) > 0, 1).otherwise(0))
    def banded(df: DataFrame, prefix: String): DataFrame =
      df.withColumn("sig", sig(col("v")))
        .select(col("id").as(prefix + "id"), col("v").as(prefix + "v"),
          col("nrm").as(prefix + "n"),
          posexplode(transform(sequence(lit(0), lit(bands - 1)),
            b => xxhash64(slice(col("sig"), b * r + lit(1), lit(r))))))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bkey")
    val q = banded(normalized(queries, idCol, vecCol), "q")
    val c = banded(normalized(corpus, idCol, vecCol), "c")
    val cand = q.join(c,
        q("band") === c("band") && q("bkey") === c("bkey") && col("qid") =!= col("cid"))
      .select("qid", "qv", "qn", "cid", "cv", "cn")
      .dropDuplicates("qid", "cid")
    val scored = cand.withColumn("cosine",
      dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("cid").as("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  private def dimOf(df: DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol))).head.getInt(0)
}
