package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** LSH ANN recall against the exact brute-force baseline (worst-case
  * setting: the test embeddings are near-uniform random, where hyperplane
  * LSH has the least structure to exploit). */
class SimilaritySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("lshTopK achieves useful recall vs brute force on random vectors") {
    val e = Tables.embeddings(spark, dir)
    val qs = e.filter(pmod(col("vec_id"), lit(25)) === 0)
    val k = 10
    val brute = Similarity.bruteForceTopK(qs, e, "vec_id", "embedding", k)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.lshTopK(qs, e, "vec_id", "embedding", k,
        planes = 16, bands = 8)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ann.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.3, s"recall $recall (${ann.intersect(brute).size}/${brute.size})")
  }

  test("lshTopK is a strict candidate subset — top-1 cosine never exceeds brute force") {
    val e = Tables.embeddings(spark, dir)
    val qs = e.filter(pmod(col("vec_id"), lit(25)) === 0)
    val b1 = Similarity.bruteForceTopK(qs, e, "vec_id", "embedding", 1)
      .select("query_id", "cosine")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val a1 = Similarity.lshTopK(qs, e, "vec_id", "embedding", 1, 16, 8)
      .select("query_id", "cosine")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    a1.foreach { case (q, c) =>
      assert(c <= b1(q) + 1e-9, s"query $q: ann $c > brute ${b1(q)}")
    }
  }

  test("ivfTopK achieves useful recall and never beats brute-force top-1") {
    val e = Tables.embeddings(spark, dir)
    val qs = e.filter(pmod(col("vec_id"), lit(25)) === 0)
    val k = 10
    val brute = Similarity.bruteForceTopK(qs, e, "vec_id", "embedding", k)
      .select("query_id", "neighbor_id", "cosine")
      .collect()
    val bruteSet = brute.map(r => (r.getLong(0), r.getLong(1))).toSet
    val b1 = brute.filter(_ => true)
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getDouble(2)).max }
    val ivf = Similarity.ivfTopK(qs, e, "vec_id", "embedding", k,
        nlist = 16, nprobe = 6)
      .select("query_id", "neighbor_id", "cosine", "rank")
      .collect()
    val ivfSet = ivf.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivfSet.intersect(bruteSet).size.toDouble / bruteSet.size
    assert(recall >= 0.3, s"recall $recall")
    // Candidate-subset property: IVF's best cosine per query cannot
    // exceed the exact best.
    ivf.filter(_.getInt(3) == 1).foreach { r =>
      assert(r.getDouble(2) <= b1(r.getLong(0)) + 1e-9)
    }
  }

  test("LshIndex: reused and loaded indexes equal the one-shot lshTopK") {
    val e = Tables.embeddings(spark, dir)
    val qs = e.filter(pmod(col("vec_id"), lit(25)) === 0)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    val direct = rows(Similarity.lshTopK(qs, e, "vec_id", "embedding", 10, 16, 8))
    val idx = LshIndex.build(e, "vec_id", "embedding", 16, 8)
    assert(rows(idx.search(qs, "vec_id", "embedding", 10)) == direct)
    val path = java.nio.file.Files.createTempDirectory("graft_lsh").toString
    idx.save(path)
    val loaded = LshIndex.load(spark, path)
    assert(loaded.bands == 8 && loaded.planes == idx.planes)
    assert(rows(loaded.search(qs, "vec_id", "embedding", 10)) == direct)
  }

  test("IvfIndex: build once, search repeatedly, save/load round-trips") {
    val e = Tables.embeddings(spark, dir)
    val qs = e.filter(pmod(col("vec_id"), lit(25)) === 0)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    val direct = rows(
      Similarity.ivfTopK(qs, e, "vec_id", "embedding", 10, nlist = 16, nprobe = 6))
    val idx = IvfIndex.build(e, "vec_id", "embedding", nlist = 16)
    // Same seed -> same quantizer -> the one-shot path and the reused
    // index return identical rows; a second search hits the same index.
    assert(rows(idx.search(qs, "vec_id", "embedding", 10, 6)) == direct)
    assert(rows(idx.search(qs, "vec_id", "embedding", 10, 6)) == direct)
    val path = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    idx.save(path)
    val loaded = IvfIndex.load(spark, path)
    assert(loaded.nlist == idx.nlist)
    assert(rows(loaded.search(qs, "vec_id", "embedding", 10, 6)) == direct)
  }

  test("embeddingCosineLsh equals exact embeddingCosine at threshold 0.7") {
    import spark.implicits._
    // The sf0.001 embeddings plus tail-zeroed mutations (the
    // dedup_embedding_lsh corpus shape): planted pairs sit near cosine
    // 0.93, natural pairs far below 0.7. The LSH-blocked operator must
    // reproduce the exact operator's rows bit-for-bit — candidates are
    // verified with the same dot, so only a banding-dropped pair could
    // differ, and at (256, 32) that probability is ~3e-7 per pair.
    val e = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val corpus = e.unionAll(e.select(
      (col("vec_id") + 1000000).as("vec_id"),
      expr("concat(slice(embedding, 1, 56), array_repeat(cast(0.0 as float), 8))")
        .as("embedding")))
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = rows(Dedup.embeddingCosine(corpus, "embedding", "vec_id", 0.7))
    val lsh = rows(Dedup.embeddingCosineLsh(corpus, "embedding", "vec_id", 0.7))
    assert(exact.nonEmpty, "planted pairs should clear the 0.7 threshold")
    assert(lsh == exact,
      s"missing=${(exact -- lsh).take(3)} extra=${(lsh -- exact).take(3)}")
  }

  test("zero-norm vectors are excluded from rankings, not NaN-ranked first") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)), (3L, Seq(0.0f, 1.0f)),
      (4L, Seq(0.0f, 0.0f))) // zero vector: no direction, must not rank
      .toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(
      corpus.filter(col("vec_id") === 1), corpus, "vec_id", "embedding", 3)
      .collect()
    assert(!out.exists(_.getLong(1) == 4L), "zero vector appeared as a neighbor")
    assert(out.forall(r => !r.getDouble(2).isNaN))
    // A zero-vector query likewise produces no rows rather than NaN rows.
    val qz = Similarity.bruteForceTopK(
      corpus.filter(col("vec_id") === 4), corpus, "vec_id", "embedding", 3)
    assert(qz.count() == 0)
    // The LSH pair operator drops zero vectors too: NaN >= threshold is
    // TRUE under Spark's NaN ordering, so without the guard the zero
    // vector would emit NaN pairs the exact operator never emits.
    val lshPairs = Dedup.embeddingCosineLsh(corpus, "embedding", "vec_id", 0.5)
      .collect()
    assert(lshPairs.forall(r => !r.getDouble(2).isNaN))
    assert(!lshPairs.exists(r => r.getLong(0) == 4L || r.getLong(1) == 4L))
  }

  test("empty corpus: LSH and pair operators return empty, no crash") {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
    val qs = e.filter(pmod(col("vec_id"), lit(25)) === 0)
    val empty = e.filter(lit(false))
    assert(Similarity.lshTopK(qs, empty, "vec_id", "embedding", 5).count() == 0)
    assert(Dedup.embeddingCosineLsh(empty, "embedding", "vec_id", 0.5).count() == 0)
  }

  test("Pq: lossless grid encodes exactly and ADC equals exact inner product") {
    import spark.implicits._
    // Every subvector sits exactly on one of k=2 per-subspace points, so
    // k-means recovers the points exactly, quantization error is zero,
    // and ADC scores ARE the exact inner products — top-k must equal a
    // hand-computed brute force.
    val vecs = (0L until 16L).map { id =>
      val a = if ((id & 1L) == 1L) 2.0 else 0.5
      val b = if ((id & 2L) == 2L) 3.0 else 1.0
      (id, Array(a, a, b, b))
    }
    val df = vecs.toDF("vec_id", "v")
    val model = Pq.train(df, "vec_id", "v", m = 2, k = 2, seed = 11L)
    val codes = Pq.encode(df, "vec_id", "v", model)
    // encode→decode must reproduce every vector exactly
    val roundTrip = codes.collect().map(r =>
      r.getLong(0) -> model.decode(r.getSeq[Int](1))).toMap
    vecs.foreach { case (id, v) =>
      assert(roundTrip(id).toSeq == v.toSeq, s"lossy roundtrip for $id")
    }
    val queries = df.filter(col("vec_id") < 2)
    val got = Pq.searchAdc(queries, "vec_id", "v", codes, "vec_id", model, topK = 4)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    for ((qid, qv) <- vecs.take(2)) {
      val expect = vecs
        .map { case (id, v) => (id, v.zip(qv).map { case (x, y) => x * y }.sum) }
        .sortBy { case (id, s) => (-s, id) }
        .take(4)
      expect.zipWithIndex.foreach { case ((id, s), i) =>
        val (gid, gs) = got((qid, i + 1))
        assert(gid == id && math.abs(gs - s) < 1e-9,
          s"query $qid rank ${i + 1}: got ($gid, $gs) want ($id, $s)")
      }
    }
  }

  test("Pq: a corpus-sized query batch fails fast instead of OOMing the driver") {
    import spark.implicits._
    val model = new Pq.PqModel(1, 2, 1, Array(Array(Array(0.0), Array(1.0))))
    val over = spark.range(Pq.MaxQueryBatch + 5L)
      .select(col("id").as("vec_id"), array(lit(0.5)).as("v"))
    val codes = Seq((0L, Array(0))).toDF("vec_id", "codes")
    val e = intercept[IllegalArgumentException] {
      Pq.searchAdc(over, "vec_id", "v", codes, "vec_id", model, topK = 1)
    }
    assert(e.getMessage.contains("query batch larger than"), e.getMessage)
    // Within the cap: same shape goes through.
    val ok = Pq.searchAdc(over.limit(3), "vec_id", "v", codes, "vec_id", model, 1)
    assert(ok.count() == 3)
  }

  test("Vectors.meanPool: element-wise means, dims stay ordered") {
    import spark.implicits._
    val df = Seq(
      ("a", Array(1.0f, 10.0f, 100.0f)),
      ("a", Array(3.0f, 30.0f, 300.0f)),
      ("b", Array(5.0f, 6.0f, 7.0f))
    ).toDF("g", "v")
    val got = Vectors.meanPool(df, "g", "v")
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(got("a") == Seq(2.0, 20.0, 200.0))
    assert(got("b") == Seq(5.0, 6.0, 7.0))
  }

  test("IvfPq: exhaustive probe on a lossless grid equals exact cosine top-k") {
    import spark.implicits._
    // After unit normalization each subspace takes 4 distinct values
    // (2 raw values × 2 vector norms), so k=4 per-subspace centroids
    // recover them exactly: zero quantization error, and exhaustive
    // probing (nprobe = nlist) removes the cell approximation — the
    // composed index must reproduce exact cosine ranking.
    val vecs = (0L until 16L).map { id =>
      val a = if ((id & 1L) == 1L) 2.0 else 0.5
      val b = if ((id & 2L) == 2L) 3.0 else 1.0
      (id, Array(a, a, b, b))
    }
    val df = vecs.toDF("vec_id", "v")
    val index = Pq.buildIvfPq(df, "vec_id", "v", nlist = 2, m = 2, k = 4, seed = 3L)
    val got = index.search(df.filter(col("vec_id") < 2), "vec_id", "v",
      topK = 4, nprobe = 2)
    val byQ = got.collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    for ((qid, qv) <- vecs.take(2)) {
      val uq = unit(qv)
      val expect = vecs
        .map { case (id, v) =>
          (id, unit(v).zip(uq).map { case (x, y) => x * y }.sum)
        }
        .sortBy { case (id, s) => (-s, id) }
        .take(4)
      expect.zipWithIndex.foreach { case ((id, s), i) =>
        val (gid, gs) = byQ((qid, i + 1))
        assert(gid == id && math.abs(gs - s) < 1e-9,
          s"query $qid rank ${i + 1}: got ($gid, $gs) want ($id, $s)")
      }
    }
    // pruned probing returns a subset of the exhaustive candidates
    val pruned = index.search(df.filter(col("vec_id") < 2), "vec_id", "v",
        topK = 4, nprobe = 1)
      .select("query_id", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = got.select("query_id", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pruned.nonEmpty && pruned.forall { case (q, _) => full.exists(_._1 == q) })
  }

  test("IvfIndex.add: incremental rows assign like a fresh build and search exactly") {
    val e = Tables.embeddings(spark, dir)
    val a = e.filter(pmod(col("vec_id"), lit(3)) =!= 0)
    val b = e.filter(pmod(col("vec_id"), lit(3)) === 0)
    val idx = IvfIndex.build(a, "vec_id", "embedding", nlist = 8, seed = 7L)
    val grown = idx.add(b, "vec_id", "embedding")

    // Nothing lost, nothing doubled: the grown cells table is a
    // partition of A ∪ B.
    assert(grown.assigned.count() == e.count())
    assert(grown.assigned.select("cid").distinct().count() == e.count())

    // Added rows landed in their argmin-distance cell (driver recompute
    // against the frozen centroids).
    val cents = idx.centroids.map { case (c, n2) => (c.toArray, n2) }
    val added = grown.assigned
      .join(b.select(col("vec_id").as("cid")), Seq("cid"), "left_semi")
      .collect()
    added.foreach { r =>
      val v = r.getSeq[Double](1).toArray
      val n = r.getDouble(2)
      val u = v.map(_ / n)
      val best = cents.zipWithIndex.map { case ((c, n2), i) =>
        (2.0 * c.zip(u).map { case (x, y) => x * y }.sum - n2, i)
      }.maxBy { case (s, i) => (s, -i) }._2
      assert(r.getInt(3) == best, s"row ${r.getLong(0)}: cell ${r.getInt(3)} != $best")
    }

    // Exhaustive probe over the grown index = brute force over A ∪ B:
    // the add path left a true partition behind.
    val qs = e.filter(pmod(col("vec_id"), lit(25)) === 0)
    val brute = Similarity.bruteForceTopK(qs, e, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    val got = grown.search(qs, "vec_id", "embedding", 5, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    assert(got == brute)
  }

  test("IvfPqIndex.add: grown lossless grid still searches exactly") {
    import spark.implicits._
    def grid(ids: Range): Seq[(Long, Array[Double])] = ids.map { i =>
      val id = i.toLong
      val a = if ((id & 1L) == 1L) 2.0 else 0.5
      val b = if ((id & 2L) == 2L) 3.0 else 1.0
      (id, Array(a, a, b, b))
    }
    val a = grid(0 until 16).toDF("vec_id", "v")
    val b = grid(16 until 32).toDF("vec_id", "v")
    val idx = Pq.buildIvfPq(a, "vec_id", "v", nlist = 2, m = 2, k = 4, seed = 3L)
    val grown = idx.add(b, "vec_id", "v")
    assert(grown.codedCells.count() == 32)

    val all = grid(0 until 32)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val queries = a.filter(col("vec_id") < 2)
    val byQ = grown.search(queries, "vec_id", "v", topK = 6, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    for ((qid, qv) <- all.take(2)) {
      val uq = unit(qv)
      val expect = all
        .map { case (id, v) => (id, unit(v).zip(uq).map { case (x, y) => x * y }.sum) }
        .sortBy { case (id, s) => (-s, id) }
        .take(6)
      expect.zipWithIndex.foreach { case ((id, s), i) =>
        val (gid, gs) = byQ((qid, i + 1))
        assert(gid == id && math.abs(gs - s) < 1e-9,
          s"query $qid rank ${i + 1}: got ($gid, $gs) want ($id, $s)")
      }
    }
  }

  test("brute force ranks are contiguous and scores non-increasing") {
    val e = Tables.embeddings(spark, dir)
    val qs = e.filter(pmod(col("vec_id"), lit(25)) === 0)
    val out = Similarity.bruteForceTopK(qs, e, "vec_id", "embedding", 5)
    val perQuery = out.groupBy("query_id")
      .agg(count(lit(1)).as("n"), max("rank").as("mx")).collect()
    perQuery.foreach { r =>
      assert(r.getLong(1) == 5 && r.getInt(2) == 5)
    }
    val bad = out.withColumn("prev", lag("cosine", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id").orderBy("rank")))
      .filter(col("prev").isNotNull && col("cosine") > col("prev"))
      .count()
    assert(bad == 0)
  }
}
