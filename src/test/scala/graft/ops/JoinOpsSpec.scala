package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** As-of and range join semantics on crafted micro-tables where every
  * boundary case is hand-checkable: ties at equal timestamps, tolerance
  * cut-offs, keys with no match, intervals straddling bucket edges, and
  * the half-open [start, end) containment rule. */
class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  /** (key, epoch-second) rows → DataFrame with a real TimestampType col. */
  private def tsDf(name: String, rows: Seq[(Long, Long, Long)]): DataFrame =
    rows.toDF("k", "sec", name)
      .withColumn("t", timestamp_seconds(col("sec"))).drop("sec")

  test("AsOfJoin.backward picks latest at-or-before, per key, ties match") {
    val left = tsDf("lv", Seq((1L, 100L, 10L), (1L, 205L, 11L), (1L, 99L, 12L),
      (2L, 100L, 20L), (3L, 100L, 30L)))
    val right = tsDf("rv", Seq((1L, 100L, 1L), (1L, 200L, 2L), (2L, 150L, 3L)))
      .withColumnRenamed("t", "rt")
    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "rt", Seq("rv"))
      .select("k", "lv", "rv").collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toSet
    assert(out == Set(
      (1L, 10L, 1L),   // exact tie: right@100 matches left@100
      (1L, 11L, 2L),   // latest of {100, 200} before 205
      (1L, 12L, -1L),  // 99 precedes every right row → null
      (2L, 20L, -1L),  // right@150 is AFTER left@100 → null
      (3L, 30L, -1L))) // key absent on right → null
  }

  test("AsOfJoin.forward picks earliest at-or-after; tolerance nulls far matches") {
    val left = tsDf("lv", Seq((1L, 100L, 10L), (1L, 150L, 11L), (1L, 250L, 12L)))
    val right = tsDf("rv", Seq((1L, 100L, 1L), (1L, 200L, 2L), (1L, 1000L, 3L)))
      .withColumnRenamed("t", "rt")
    val out = AsOfJoin.forward(left, right, Seq("k"), "t", "rt", Seq("rv"),
        toleranceUs = Some(300L * 1000000))
      .select("lv", "rv").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet
    assert(out == Set(
      (10L, 1L),   // exact tie at 100 matches forward too
      (11L, 2L),   // earliest ≥150 is 200, 50 s ahead — inside tolerance
      (12L, -1L))) // earliest ≥250 is 1000, 750 s ahead — tolerance-nulled
  }

  test("AsOfJoin duplicate right rows at equal (key, time): greatest payload wins") {
    val left = tsDf("lv", Seq((1L, 100L, 10L)))
    val right = tsDf("rv", Seq((1L, 100L, 7L), (1L, 100L, 9L), (1L, 100L, 8L)))
      .withColumnRenamed("t", "rt")
    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "rt", Seq("rv"))
      .select("rv").as[Long].collect()
    assert(out.toSeq == Seq(9L))
  }

  test("AsOfJoin.nearest picks the closer direction; backward wins ties; tolerance caps both") {
    val left = tsDf("lv", Seq(
      (1L, 100L, 10L),  // right@90 (d=10) vs right@200 (d=100) → backward 1
      (1L, 180L, 11L),  // right@90 (d=90) vs right@200 (d=20)  → forward 2
      (1L, 145L, 12L),  // exact tie d=55 both ways → backward wins → 1
      (1L, 900L, 13L),  // nearest is 200, 700 s back — tolerance-nulled
      (2L, 100L, 20L))) // key absent on right → null
    val right = tsDf("rv", Seq((1L, 90L, 1L), (1L, 200L, 2L), (1L, 210L, 3L)))
      .withColumnRenamed("t", "rt")
    val out = AsOfJoin.nearest(left, right, Seq("k"), "t", "rt", Seq("rv"),
        toleranceUs = Some(300L * 1000000))
      .select("lv", "rv").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet
    assert(out == Set(
      (10L, 1L), (11L, 2L), (12L, 1L), (13L, -1L), (20L, -1L)))
  }

  test("AsOfJoin.nearest exact-time right row matches at distance zero") {
    val left = tsDf("lv", Seq((1L, 100L, 10L)))
    val right = tsDf("rv", Seq((1L, 100L, 1L), (1L, 101L, 2L)))
      .withColumnRenamed("t", "rt")
    val out = AsOfJoin.nearest(left, right, Seq("k"), "t", "rt", Seq("rv"))
      .select("rv").as[Long].collect()
    assert(out.toSeq == Seq(1L))
  }

  test("BloomJoin.inner equals the plain inner join (no false negatives)") {
    val fact = (1L to 2000L).map(i => (i, i % 97)).toDF("row_id", "k")
    val dim = Seq((3L, "a"), (11L, "b"), (96L, "c"), (500L, "zz")).toDF("k", "v")
    val got = BloomJoin.inner(fact, dim, "k")
      .select("row_id", "k", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val want = fact.join(dim, Seq("k"), "inner")
      .select("row_id", "k", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("BloomJoin empty dim yields empty result without a filter build") {
    val fact = (1L to 10L).map(i => (i, i)).toDF("row_id", "k")
    val dim = Seq.empty[(Long, String)].toDF("k", "v")
    assert(BloomJoin.inner(fact, dim, "k").count() == 0L)
  }

  test("bloom_might_contain: no false negatives, nulls propagate, non-foldable filter rejected") {
    val keys = (1L to 500L).map(i => i * 7L)
    val bloom = keys.toDF("k").stat.bloomFilter("k", 500, 0.01)
    val out = new java.io.ByteArrayOutputStream()
    bloom.writeTo(out)
    val bytes = out.toByteArray
    val probed = Seq[java.lang.Long](7L, 14L, 21L, null)
      .toDF("k")
      .select(col("k"), graft.functions.bloom_might_contain(col("k"), lit(bytes)).as("hit"))
      .collect()
      .map(r => (Option(r.get(0)), if (r.isNullAt(1)) null else r.getBoolean(1)))
    assert(probed.collect { case (Some(_), h) => h }.forall(_ == true),
      "members must always probe true")
    assert(probed.collect { case (None, h) => h }.forall(_ == null),
      "null key must produce null, not false")
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq((1L, bytes)).toDF("k", "b")
        .select(graft.functions.bloom_might_contain(col("k"), col("b")))
        .collect()
    }
  }

  test("AsOfJoin rejects right columns colliding with left names") {
    val left = tsDf("v", Seq((1L, 100L, 10L)))
    val right = tsDf("v", Seq((1L, 100L, 1L))).withColumnRenamed("t", "rt")
    intercept[IllegalArgumentException] {
      AsOfJoin.backward(left, right, Seq("k"), "t", "rt", Seq("v"))
    }
  }

  test("RangeJoin half-open containment across bucket boundaries") {
    // Intervals: width up to 100 s → bucket width 100 s.
    val intervals = Seq(
      (1L, 50L, 150L, 100L),  // straddles the 100 s bucket edge
      (1L, 200L, 300L, 101L), // aligned exactly on bucket edges
      (2L, 0L, 10L, 200L))    // other key
      .toDF("k", "s", "e", "iid")
      .withColumn("ws", timestamp_seconds(col("s")))
      .withColumn("we", timestamp_seconds(col("e"))).drop("s", "e")
    val points = Seq(
      (1L, 50L, 1L),   // == start → in (inclusive)
      (1L, 149L, 2L),  // inside, second bucket of interval 100
      (1L, 150L, 3L),  // == end → OUT (exclusive)
      (1L, 250L, 4L),  // inside interval 101
      (1L, 300L, 5L),  // == end of 101 → out
      (2L, 5L, 6L),    // in interval 200, other key
      (2L, 250L, 7L))  // key 2 has no window there
      .toDF("k", "sec", "pid")
      .withColumn("t", timestamp_seconds(col("sec"))).drop("sec")
    val got = RangeJoin.pointInInterval(points, intervals, Seq("k"), "t", "ws", "we")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 100L), (2L, 100L), (4L, 101L), (6L, 200L)))
  }

  test("RangeJoin bucketed plan equals the naive theta-join on random data") {
    val rnd = new scala.util.Random(7)
    val points = Seq.tabulate(400)(i => (rnd.nextInt(5).toLong, rnd.nextInt(10000).toLong, i.toLong))
      .toDF("k", "sec", "pid")
      .withColumn("t", timestamp_seconds(col("sec"))).drop("sec")
    val intervals = Seq.tabulate(120) { i =>
      val s = rnd.nextInt(10000); (rnd.nextInt(5).toLong, s.toLong, (s + rnd.nextInt(700)).toLong, i.toLong)
    }.toDF("k", "s", "e", "iid")
      .withColumn("ws", timestamp_seconds(col("s")))
      .withColumn("we", timestamp_seconds(col("e"))).drop("s", "e")
    val fast = RangeJoin.pointInInterval(points, intervals, Seq("k"), "t", "ws", "we")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(intervals, Seq("k"))
      .filter(col("t") >= col("ws") && col("t") < col("we"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == naive && fast.nonEmpty)
  }

  test("saltedAgg equals the single-stage GROUP BY on skewed keys") {
    // Power-law: one hot key with 5000 rows, a tail of 50-row keys.
    val rows = (1 to 5000).map(i => ("hot", i * 0.5)) ++
      (1 to 20).flatMap(k => (1 to 50).map(i => (s"k$k", i * 1.25)))
    val df = rows.toDF("g", "v")
    val salted = SkewJoin.saltedAgg(df, "g", col("v"),
      xxhash64(monotonically_increasing_id()), 8)
    val plain = df.groupBy("g")
      .agg(count(lit(1)).as("n"), sum("v").as("sum_value"))
    val s = salted.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val p = plain.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(s.keySet == p.keySet)
    s.foreach { case (k, (n, sv)) =>
      assert(n == p(k)._1, s"count mismatch at $k")
      assert(math.abs(sv - p(k)._2) < 1e-6 * math.abs(p(k)._2), s"sum mismatch at $k")
    }
    intercept[IllegalArgumentException] {
      SkewJoin.saltedAgg(df, "g", col("v"), col("v"), 0)
    }
  }
}
