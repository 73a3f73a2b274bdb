package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Property-style invariants for the splitting/sessionization/salting
  * operators — seeded randomized inputs, exact structural laws. */
class PropertySpec extends SparkSpec {

  import spark.implicits._

  /** (id, user, second) event rows. */
  private def randomEvents(rnd: Random): Seq[(Long, Long, Long)] = {
    val n = 1 + rnd.nextInt(120)
    (0 until n).map(i => (i.toLong, 1L + rnd.nextInt(5), rnd.nextInt(50).toLong))
  }

  test("morton code is a bijection on the cell grid and preserves locality") {
    // bijectivity over the full 2^6 × 2^6 grid at 6 bits
    val bits = 6
    val cells = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val zs = cells.toDF("x", "y")
      .select(Layout.morton(col("x"), col("y"), bits).as("z"))
      .collect().map(_.getLong(0))
    assert(zs.toSet.size == cells.size, "interleave must not collide")
    assert(zs.min == 0L && zs.max == (1L << (2 * bits)) - 1,
      "curve values fill exactly [0, 4^bits)")
    // one-step curve neighbors are grid-close (the locality the layout
    // exists for): consecutive z differ by one cell in >= half of steps
    val byZ = cells.zip(zs).sortBy(_._2).map(_._1)
    val adjacent = byZ.sliding(2).count { case Seq((x1, y1), (x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) == 1
    }
    assert(adjacent * 2 >= byZ.length - 1, s"only $adjacent adjacent steps")
  }

  test("ngramJaccard: a non-binding df cap is a no-op; caps only shrink pairs") {
    val rnd = new Random(11)
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    val docs = (0 until 40).map { i =>
      (i.toLong, (0 until 12).map(_ => words(rnd.nextInt(words.length))).mkString(" "))
    }.toDF("id", "text")
    def pairs(cap: Int): Set[(Long, Long)] =
      Dedup.ngramJaccard(docs, "text", "id", 3, 0.2, maxShingleDf = cap)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairs(Int.MaxValue)
    // A cap above every shingle's df changes nothing.
    assert(pairs(1000) == uncapped)
    // Tighter caps only remove meeting opportunities — candidate sets
    // shrink monotonically (pair *scores* shift with the shingle space,
    // so containment is on the detected pair sets at a fixed threshold
    // only when the dropped shingles are shared noise; assert the weaker
    // but universal law: the empty cap kills everything).
    assert(pairs(0).isEmpty)
  }

  test("ChronoSplit: slices partition the rows, sizes match rank ranges, no leakage") {
    val rnd = new Random(7)
    for (round <- 0 until 5) {
      val rows = randomEvents(rnd)
      val nSlices = 1 + rnd.nextInt(4)
      val df = rows.toDF("id", "u", "t")
      val weights = (1 to nSlices).map(_.toDouble)
      val slices = ChronoSplit.split(df, weights, "t", "id")
      val n = rows.size.toLong
      // Exact rank-range sizes.
      val sum = weights.sum
      val ks = weights.scanLeft(0.0)(_ + _).map(c => math.floor(c / sum * n).toLong)
      val wantSizes = ks.sliding(2).map { case Seq(lo, hi) => hi - lo }.toSeq
      assert(slices.map(_.count()) == wantSizes, s"round $round")
      // Disjoint cover.
      val ids = slices.flatMap(_.select("id").collect().map(_.getLong(0)))
      assert(ids.length == n && ids.toSet.size == n, s"round $round")
      // Chronological: every row in slice i precedes every row in slice
      // i+1 under the (t, id) total order.
      val keyOf = rows.map(r => r._1 -> ((r._3, r._1))).toMap
      val sliceKeys = slices.map(_.select("id").collect().map(r => keyOf(r.getLong(0))))
      sliceKeys.zip(sliceKeys.drop(1)).foreach { case (prev, next) =>
        (prev.maxOption, next.minOption) match {
          case (Some(mx), Some(mn)) =>
            assert(Ordering[(Long, Long)].lt(mx, mn), s"round $round: $mx !< $mn")
          case _ => ()
        }
      }
    }
  }

  test("Sessionize: session membership <=> gap threshold; indexes contiguous") {
    val rnd = new Random(11)
    for (round <- 0 until 5) {
      val rows = randomEvents(rnd)
      val gapUs = (1L + rnd.nextInt(20)) * 1000000L
      val df = rows.toDF("id", "u", "tsec")
        .withColumn("ts", timestamp_micros(col("tsec") * 1000000L))
      val out = Sessionize.assign(df, "u", "ts", gapUs, "id")
      // Internal helper columns must not leak into the public output.
      assert(out.columns.toSet == Set("id", "u", "tsec", "ts", "session_idx"))
      val assigned = out
        .select(col("u"), col("id"), unix_micros(col("ts")), col("session_idx"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(assigned.length == rows.size)
      assigned.groupBy(_._1).foreach { case (_, evs) =>
        val byTime = evs.sortBy(e => (e._3, e._2))
        byTime.sliding(2).foreach {
          case Array(a, b) =>
            val sameSession = a._4 == b._4
            val withinGap = b._3 - a._3 <= gapUs
            assert(sameSession == withinGap,
              s"round $round: gap ${b._3 - a._3} vs $gapUs, sessions ${a._4}->${b._4}")
          case _ => ()
        }
        val idxs = byTime.map(_._4)
        assert(idxs.head == 1L)
        idxs.sliding(2).foreach {
          case Array(a, b) => assert(b == a || b == a + 1)
          case _ => ()
        }
      }
    }
  }

  test("SkewJoin: salted inner join equals plain join for any salt count") {
    val rnd = new Random(13)
    for (round <- 0 until 5) {
      val facts = (0 until 60).map(i => (rnd.nextInt(6).toLong, i.toLong))
        .toDF("k", "payload")
      val salts = 1 + rnd.nextInt(16)
      val dim = Seq((0L, "x"), (1L, "y"), (5L, "z")).toDF("k", "label")
      val want = facts.join(dim, Seq("k"))
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
      val got = SkewJoin.saltedJoin(facts, dim, "k", salts)
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
      assert(got == want, s"round $round (salts=$salts)")
    }
  }

  test("paragraphDedup is idempotent: a deduped corpus passes through unchanged") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val paras = Vector.tabulate(12)(i => s"para $i " + ("x" * rnd.nextInt(8)))
    val docs = Seq.tabulate(30) { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(4))(paras(rnd.nextInt(12))).mkString("\n\n"))
    }.toDF("doc_id", "text")
    val once = Dedup.paragraphDedup(docs, "text", "doc_id")
    val twice = Dedup.paragraphDedup(
      once.select(col("doc_id"), col("clean_text").as("text")), "text", "doc_id")
    val a = once.select("doc_id", "clean_text", "n_kept")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val b = twice.select("doc_id", "clean_text", "n_kept")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(a == b, "second pass must be the identity")
    assert(twice.agg(sum("n_dropped")).head.getLong(0) == 0L)
  }

  test("exactKeep is idempotent and its survivors are distinct by content") {
    import spark.implicits._
    val docs = (0 until 200).map(i => (i.toLong, s"content ${i % 60}"))
      .toDF("doc_id", "text")
    val once = Dedup.exactKeep(docs, "text", "doc_id")
    assert(once.count() == 60)
    val twice = Dedup.exactKeep(once, "text", "doc_id")
    val a = once.collect().map(_.toSeq).sortBy(_.toString).toSeq
    val b = twice.collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(a == b, "dedup of a deduped corpus must be the identity")
  }

  test("rankBand: band sizes are exact and bands partition the stratum") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    for (n <- Seq(1, 7, 10, 97)) {
      val df = (1 to n).map(i => ("g", i, rnd.nextInt(1000))).toDF("g", "id", "s")
      val lo = Sampling.rankBand(df, Seq(col("g")), Seq(col("s"), col("id")), 0, 3, 10)
      val mid = Sampling.rankBand(df, Seq(col("g")), Seq(col("s"), col("id")), 3, 8, 10)
      val hi = Sampling.rankBand(df, Seq(col("g")), Seq(col("s"), col("id")), 8, 10, 10)
      // integer-exact sizes: floor boundaries partition 1..n
      assert(lo.count() == (3L * n) / 10)
      assert(mid.count() == (8L * n) / 10 - (3L * n) / 10)
      assert(hi.count() == n - (8L * n) / 10)
      val union = lo.unionAll(mid).unionAll(hi).select("id")
      assert(union.distinct().count() == n && union.count() == n,
        s"bands must partition exactly (n=$n)")
    }
  }
}
