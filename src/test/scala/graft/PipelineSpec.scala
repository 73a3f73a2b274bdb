package graft

import graft.cmf.CollectiveALS
import graft.eval.{RankingMetrics, RegressionEvaluation}
import graft.ops.{ChronoSplit, Dedup, Sessionize, TextAnalysis}
import org.apache.spark.sql.functions._

/** End-to-end composition: the operators chained the way a real
  * training-data pipeline chains them, on the sf0.001 tables. */
class PipelineSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("document pipeline: quality filter -> near-dup keep-one -> token stats") {
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val withDups = docs.unionAll(docs.select(
      (col("doc_id") + 1000000).as("doc_id"),
      expr("substring(text, 1, greatest(length(text) - 40, 1))").as("text")))

    // 1. quality gate
    val quality = withDups
      .withColumn("q", TextAnalysis.qualityScore(col("text")))
      .filter(col("q") >= 0.3)
    val nQuality = quality.count()
    assert(nQuality > 0 && nQuality <= withDups.count())

    // 2. near-dup detection + keep-one
    val pairs = Dedup.minHashLsh(quality, "text", "doc_id", 3, 32, 8, 0.6)
    val kept = Dedup.keepRepresentatives(quality, pairs, "doc_id", "doc_id_a", "doc_id_b")
    val nKept = kept.count()
    assert(nKept < nQuality, s"no dups removed ($nKept of $nQuality)")

    // 3. token budget over the surviving corpus
    val stats = kept.select(
      col("doc_id"),
      TextAnalysis.wsTokenCount(col("text")).as("n_tokens"))
    val totalTokens = stats.agg(sum("n_tokens")).head.getLong(0)
    assert(totalTokens > 0)
    assert(stats.filter(col("n_tokens") <= 0).count() == 0)
  }

  test("training-data build: decontam -> dedup -> slice -> pack, leak-free") {
    import graft.ops.{Decontaminate, Packing, Sampling}
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    // Benchmark to protect: substring slices of every 10th doc.
    val evalSet = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select(expr("substring(text, 10, 120)").as("text"))

    // 1. decontaminate
    val clean = Decontaminate.removeContaminated(
      docs, "text", "doc_id", evalSet, "text", n = 5)
    assert(clean.count() < docs.count(), "leaked docs must be removed")
    // No surviving doc shares a 5-gram with the benchmark.
    assert(Decontaminate.contaminated(
      clean, "text", "doc_id", evalSet, "text", n = 5).count() == 0)

    // 2. exact dedup (idempotent on the already-unique corpus)
    val deduped = Dedup.exactKeep(clean, "text", "doc_id")
    assert(deduped.count() == clean.count())

    // 3. disjoint train/val slices
    val h = xxhash64(col("doc_id"), lit(1L))
    val train = Sampling.hashSlice(deduped, h, 0.0, 0.9)
    val valSet = Sampling.hashSlice(deduped, h, 0.9, 1.0)
    assert(train.count() + valSet.count() == deduped.count())
    assert(train.join(valSet, Seq("doc_id"), "left_semi").count() == 0)

    // 4. pack the train slice into ~1000-token bins
    val packed = Packing.packByBudget(train, "doc_id",
      TextAnalysis.wsTokenCount(col("text")), 1000L, xxhash64(col("doc_id")), 4)
    assert(packed.count() == train.count())
    assert(packed.agg(min("n_tokens")).head.getLong(0) >= 0)
  }

  test("leak-free split never separates a near-dup pair") {
    val split = queries.DedupSimQueries.splitLeakfree(spark, dir)
      .select(col("doc_id"), col("split"))
    val pairs = queries.DedupSimQueries.ngramPairs(spark, dir)
    // Every detected near-dup pair lands on one side of the boundary
    // (labels make whole components share a split, so transitive chains
    // are covered by construction — this pins the direct pairs).
    val straddling = pairs
      .join(split.select(col("doc_id").as("doc_id_a"), col("split").as("sa")), "doc_id_a")
      .join(split.select(col("doc_id").as("doc_id_b"), col("split").as("sb")), "doc_id_b")
      .filter(col("sa") =!= col("sb"))
    assert(straddling.count() == 0)
    // The 80/20 hash actually splits (both sides populated).
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.getOrElse("train", 0L) > 0 && counts.getOrElse("test", 0L) > 0)
  }

  test("event pipeline: sessionize -> chronological split") {
    val events = Tables.events(spark, dir)
    val sessions = Sessionize.sessions(
      events, "user_id", "ts", 30L * 60 * 1000000, "event_id",
      sum("value").as("sum_value"))
    val n = sessions.count()
    assert(n > 0)
    // Session ends never precede starts; counts are positive.
    assert(sessions.filter(col("session_end_us") < col("session_start_us")).count() == 0)
    assert(sessions.filter(col("n_events") <= 0).count() == 0)

    val Seq(train, test) = ChronoSplit.split(events, Seq(0.8, 0.2), "ts", "event_id")
    val cut = train.agg(max("ts")).head.getTimestamp(0)
    assert(test.filter(col("ts") < cut).count() == 0, "temporal leakage")
  }

  test("recommendation pipeline: fit -> predict -> regression + ranking eval") {
    val ratings = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("cust"), col("l_partkey").as("part"))
      .agg(sum("l_quantity").cast("float").as("rating"))
      .localCheckpoint(true)
    val model = new CollectiveALS("cust", "part")
      .setRank(8).setMaxIter(5).setRegParam(0.1).setSeed(42L)
      .fit(ratings)
    val scored = model.predict(ratings)
    val rmse = RegressionEvaluation.evaluate(scored, "rating", "prediction")
      .select("rmse").head.getDouble(0)
    assert(rmse.isFinite && rmse < 30, s"rmse $rmse") // ratings are ~10-60 qty sums
    val truth = ratings.filter(col("rating") > 25).select("cust", "part")
    val m = RankingMetrics(scored.select("cust", "part", "prediction"), truth)
      .setUserCol("cust").setItemCol("part").setPredictionCol("prediction")
    val Seq(p5) = m.precisionAt(Seq(5))
    assert(p5 > 0.0 && p5 <= 1.0, s"p@5 $p5")
  }
}
