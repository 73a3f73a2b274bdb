package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Lloyd's k-means over an `array<float|double>` column
  * (SURVEY §2 #51f) — the clustering operator proper, complementing the
  * k-means quantizer embedded in the IVF index (`Similarity.ivfTopK`).
  *
  * Engine-portable by construction (no RNG, no engine-specific hash):
  *  - init: the k rows whose `md5(id)` hex ranks lowest (ties by id)
  *    seed clusters 0..k-1 in that order — any engine reproduces the
  *    same seeds from the same table;
  *  - distance: `d2 = round(v·v − 2·v·c + c·c, 6)` with every dot a
  *    sequential left-to-right double accumulation (the fused
  *    [[graft.functions.ArrayDot]] codegen loop on the Spark side,
  *    `list_inner_product` in DuckDB) — same FP operation order, so the
  *    rounded distance is bit-identical across engines;
  *  - argmin ties break to the lowest cluster id;
  *  - update: per-dimension mean rounded to 6 dp (the repo's standard
  *    cross-engine summation-order guard), empty clusters drop.
  *
  * Scale shape (100 TB): the assignment step is NARROW — centroids ride
  * along as a k×dim literal (broadcast with the task binary), each row
  * scores k distances in one codegen `transform` and keeps the min; no
  * shuffle, no n×k row explosion. The update is ONE partially-aggregated
  * shuffle keyed by (cluster, dim) — k·dim cells cross the wire per
  * partition, k·dim doubles land on the driver per iteration. Points
  * never leave executors; driver state is the centroid table only. This
  * is the same communication bound as MLlib's KMeans aggregator.
  *
  * Reference scope: jongwook/collective-als has no clustering operator;
  * this extends the engine's embedding toolbox (SURVEY §2 training-data
  * pipeline additions).
  */
object KMeans {

  /** (cluster id, centroid) pairs; cluster ids are stable across
    * iterations (an id vanishes if its cluster empties). */
  type Centroids = Array[(Int, Array[Double])]

  /** Hash-ranked deterministic seeds: the k input vectors with the
    * lowest `(md5(id), id)` order, as clusters 0..k-1. */
  def initCentroids(df: DataFrame, idCol: String, vecCol: String, k: Int): Centroids = {
    require(k >= 1, s"k must be >= 1, got $k")
    df.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .orderBy(md5(col("id").cast("string")), col("id"))
      .limit(k)
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1).toArray) }
  }

  private def withScore(base: DataFrame, cents: Centroids): DataFrame = {
    // k×(dim+2) literal: (cluster, centroid, c·c). c·c is accumulated
    // sequentially here to match list_inner_product(c, c) downstream.
    val centLit: Column = typedlit(cents.toSeq.map { case (cid, c) =>
      (cid, c.toSeq, c.foldLeft(0.0)((s, x) => s + x * x))
    })
    base
      .withColumn("scored", array_sort(transform(centLit, c =>
        struct(
          round(col("vv") - lit(2.0) * Similarity.dot(col("v"), c.getField("_2"))
            + c.getField("_3"), 6).as("d2"),
          c.getField("_1").as("cluster")))))
      .withColumn("best", element_at(col("scored"), 1))
      .select(col("id"), col("v"), col("vv"),
        col("best").getField("cluster").as("cluster"),
        col("best").getField("d2").as("d2"))
  }

  private def prepared(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("vv", Similarity.dot(col("v"), col("v")))

  /** One update: per-dimension mean of each cluster's members, rounded
    * to 6 dp; k×dim cells to the driver. */
  private def updateCentroids(assigned: DataFrame): Centroids =
    assigned
      .select(col("cluster"), posexplode(col("v")))
      .groupBy("cluster", "pos")
      .agg(round(avg("col"), 6).as("x"))
      .collect()
      .groupBy(_.getInt(0))
      .toArray
      .map { case (cid, rows) =>
        (cid, rows.sortBy(_.getInt(1)).map(_.getDouble(2)))
      }
      .sortBy(_._1)

  /** `iters` full Lloyd rounds (assign + update) from the hash-ranked
    * seeds; returns the final centroid table. */
  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int): Centroids = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val base = prepared(df, idCol, vecCol)
    var cents = initCentroids(df, idCol, vecCol, k)
    var i = 0
    while (i < iters) {
      cents = updateCentroids(withScore(base, cents))
      i += 1
    }
    cents
  }

  /** Cluster assignment of every row under `cents`:
    * (id, cluster, d2) with the deterministic distance/tie discipline
    * documented above. */
  def assign(df: DataFrame, idCol: String, vecCol: String, cents: Centroids): DataFrame =
    withScore(prepared(df, idCol, vecCol), cents)
      .select(col("id"), col("cluster").cast("long").as("cluster"), col("d2"))

  /** fit + final assignment in one call (the driver-query surface). */
  def fitAssign(df: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int): DataFrame =
    assign(df, idCol, vecCol, fit(df, idCol, vecCol, k, iters))

  /** Total within-cluster inertia (Σ d2) of an assignment — Lloyd's
    * monotonicity witness for specs. */
  def inertia(assigned: DataFrame): Double =
    assigned.agg(sum("d2")).collect()(0).getDouble(0)

  /** Per-point simplified silhouette under `cents`
    * (a = d² to own centroid, b = min d² to any other,
    * s = round((b − a) / max(a, b), 6), 0 when both distances are 0):
    * the clustering-quality readout that needs only k distances per
    * point — same narrow literal-centroid scoring as [[assign]], no
    * pairwise point-point work (the full silhouette's O(n²) is exactly
    * what doesn't scale). Returns (id, cluster, a, b, s). */
  def silhouette(df: DataFrame, idCol: String, vecCol: String, cents: Centroids): DataFrame = {
    require(cents.length >= 2, "silhouette needs at least 2 clusters")
    val centLit: Column = typedlit(cents.toSeq.map { case (cid, c) =>
      (cid, c.toSeq, c.foldLeft(0.0)((s, x) => s + x * x))
    })
    prepared(df, idCol, vecCol)
      .withColumn("scored", array_sort(transform(centLit, c =>
        struct(
          round(col("vv") - lit(2.0) * Similarity.dot(col("v"), c.getField("_2"))
            + c.getField("_3"), 6).as("d2"),
          c.getField("_1").as("cluster")))))
      .select(col("id"),
        element_at(col("scored"), 1).getField("cluster").cast("long").as("cluster"),
        element_at(col("scored"), 1).getField("d2").as("a"),
        element_at(col("scored"), 2).getField("d2").as("b"))
      .withColumn("s",
        when(greatest(col("a"), col("b")) <= 0, lit(0.0))
          .otherwise(round((col("b") - col("a")) / greatest(col("a"), col("b")), 6)))
  }
}
