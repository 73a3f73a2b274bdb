package graft.queries

import org.apache.spark.sql.functions._

/** Round-15 golden-value tranche 37 — pico-graph topology constants
  * (derivations in `tools/golden_stats.py` tranche37): the double-sweep
  * diameter bound on a path, local bridges on a triangle-plus-tail, the
  * 3-truss peel on a bowtie with a pendant, and 3-hop harmonic
  * centrality on a cosine path. Hand-solvable graphs, constants derived
  * with no Spark/DuckDB expression sharing — a shared formula error in
  * the frontier joins or support recomputation fails here even when the
  * mirrored oracle is hash-green. */
class EdgeBranchSpec11 extends GoldenFixtures {

  /** lineitem where each undirected edge (a,b) is backed by exactly two
    * two-part orders — coocPairs (minCount=2) then yields exactly the
    * requested edge set with item_a < item_b. */
  private def writeCoocGraph(dir: String, edges: Seq[(Long, Long)]): Unit = {
    import spark.implicits._
    val rows = edges.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq((2L * i + 1, a), (2L * i + 1, b), (2L * i + 2, a), (2L * i + 2, b))
    }
    rows.toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
  }

  test("graph_diameter pins the double-sweep on a path") {
    val dir = tmp()
    writeCoocGraph(dir, Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    // golden_stats.py tranche37 diameter: start=min=1, farthest=5 at
    // dist 4, re-BFS eccentricity 4, both sweeps reach all 5 vertices.
    val r = one(StatQueries.graphDiameter(spark, dir))
    assert(r.getAs[Long]("start_v") == 1L)
    assert(r.getAs[Long]("peripheral_v") == 5L)
    assert(r.getAs[Long]("ecc_lower") == 4L)
    assert(r.getAs[Long]("n_reach_1") == 5L)
    assert(r.getAs[Long]("n_reach_2") == 5L)
  }

  test("graph_bridges pins the common-neighbor anti-join") {
    val dir = tmp()
    writeCoocGraph(dir,
      Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L)))
    // tranche37 bridges: only the two tail edges are local bridges;
    // triangle edges all close a common neighbor.
    val out = OpsQueries.graphBridges(spark, dir).collect()
      .map(r => (r.getAs[Long]("item_a"), r.getAs[Long]("item_b"),
        r.getAs[Long]("deg_a"), r.getAs[Long]("deg_b")))
    assert(out.toSeq == Seq((3L, 4L, 3L, 2L), (4L, 5L, 2L, 1L)))
  }

  test("graph_ktruss pins the bowtie supports and the pendant peel") {
    val dir = tmp()
    writeCoocGraph(dir,
      Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L)))
    // tranche37 ktruss: pendant (4,5) peels in round 1; the shared
    // bowtie edge (2,3) recomputes support 2, the rest 1.
    val out = StatQueries.graphKtruss(spark, dir).collect()
      .map(r => (r.getAs[Long]("item_a"), r.getAs[Long]("item_b")) ->
        r.getAs[Long]("support")).toMap
    assert(out == Map(
      (1L, 2L) -> 1L, (1L, 3L) -> 1L, (2L, 3L) -> 2L,
      (2L, 4L) -> 1L, (3L, 4L) -> 1L))
  }

  test("graph_harmonic pins the 3-hop micro-weight sums on a cosine path") {
    import spark.implicits._
    val dir = tmp()
    // Unit vectors at 0/60/120/180/240 degrees: consecutive cosine 0.5
    // (edge at threshold 0.35), every other pair <= -0.5 (no edge) —
    // the exact path P5; the banded-LSH source verifies candidates
    // exactly, so its edge set equals the exact one (LshRecallSpec is
    // the standing zero-miss gate).
    val vecs = (1 to 5).map { i =>
      val th = math.toRadians(60.0 * (i - 1))
      (i.toLong, i.toLong,
        Array(math.cos(th).toFloat, math.sin(th).toFloat, 0.0f, 0.0f))
    }
    vecs.toDF("vec_id", "label", "embedding")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // tranche37 harmonic: per-vertex (n1, n2, n3) and h.
    val out = DedupSimQueries.graphHarmonic(spark, dir).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("n1"), r.getAs[Long]("n2"), r.getAs[Long]("n3"),
          r.getAs[Double]("harmonic"))).toMap
    assert(out == Map(
      1L -> ((1L, 1L, 1L, 1.833333)), 2L -> ((2L, 1L, 1L, 2.833333)),
      3L -> ((2L, 2L, 0L, 3.0)), 4L -> ((2L, 1L, 1L, 2.833333)),
      5L -> ((1L, 1L, 1L, 1.833333))))
  }
}
