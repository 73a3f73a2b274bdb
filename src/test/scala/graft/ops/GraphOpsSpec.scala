package graft.ops

import graft.SparkSpec

class GraphOpsSpec extends SparkSpec {

  test("adamicAdar scores the square's diagonals with exact micro-contributions") {
    import spark.implicits._
    // Cycle 1-2-3-4-1: the only non-edges are the diagonals (1,3) and
    // (2,4); each has two common neighbors of degree 2.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("a", "b")
    val got = LinkPredict.adamicAdar(edges, "a", "b")
      .orderBy("a").collect()
    val contrib = math.rint(1000000.0 / math.log(2.0)).toLong
    assert(got.length === 2)
    assert(got(0).getLong(0) === 1L && got(0).getLong(1) === 3L)
    assert(got(0).getLong(2) === 2L && got(0).getLong(3) === 2 * contrib)
    assert(got(1).getLong(0) === 2L && got(1).getLong(1) === 4L)
  }

  test("adamicAdar excludes hub middles beyond maxHubDeg") {
    import spark.implicits._
    // Star 0-{1..5}: every leaf pair's only common neighbor is the
    // deg-5 hub; with maxHubDeg = 4 no candidate survives.
    val edges = (1L to 5L).map(i => (0L, i)).toDF("a", "b")
    assert(LinkPredict.adamicAdar(edges, "a", "b", maxHubDeg = 4).count() === 0)
  }

  test("labelPropagation is the deterministic synchronous modal vote") {
    import spark.implicits._
    // Path 1-2-3, three synchronous rounds by hand:
    //   l1 = {1→2, 2→1 (tie to min of {1,3}), 3→2}
    //   l2 = {1→1, 2→2, 3→1}
    //   l3 = {1→2, 2→1, 3→2}
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val got = LabelProp.communities(edges, "a", "b", iters = 3)
      .orderBy("v").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 2L), (2L, 1L), (3L, 2L)))
  }

  test("labelPropagation unifies a clique to its smallest label") {
    import spark.implicits._
    val clique = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val got = LabelProp.communities(clique.toDF("a", "b"), "a", "b", iters = 3)
      .collect().map(_.getLong(1)).toSet
    assert(got === Set(1L))
  }
}
