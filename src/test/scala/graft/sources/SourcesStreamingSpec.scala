package graft.sources

import graft.{SparkSpec, Tables}
import graft.streaming.EventStream
import java.nio.file.Files

case class Rating(userId: Int, movieId: Int, rating: Float, timestamp: Long)

case class Doc(ts: java.sql.Timestamp, doc_id: Long, text: String)

/** TypedCsv round-trip + streaming/batch equivalence. */
class SourcesStreamingSpec extends SparkSpec {
  import spark.implicits._

  test("checkpointed restart processes only new files, exactly once") {
    // The incremental-ingest contract a production pipeline relies on:
    // a restarted stream with the same checkpoint must pick up where it
    // stopped — old files never reprocessed, new files never missed.
    val base = Files.createTempDirectory("graft_ckpt")
    val src = base.resolve("src").toString
    val sink = base.resolve("sink").toString
    val ckpt = base.resolve("ckpt").toString
    def drainOnce(): Unit = {
      val q = spark.readStream
        .schema("id LONG, v STRING")
        .parquet(src)
        .writeStream
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    (0L until 100L).map(i => (i, s"a$i")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(src)
    drainOnce()
    assert(spark.read.parquet(sink).count() == 100)
    (100L until 150L).map(i => (i, s"b$i")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(src)
    drainOnce()
    val out = spark.read.parquet(sink)
    assert(out.count() == 150, "restart must add only the new file's rows")
    assert(out.select("id").distinct().count() == 150, "no duplicates")
  }

  test("TypedCsv reads a MovieLens-style CSV into a typed Dataset") {
    val dir = Files.createTempDirectory("graft_csv")
    val f = dir.resolve("ratings.csv")
    Files.writeString(f,
      """userId,movieId,rating,timestamp
        |1,31,2.5,1260759144
        |1,1029,3.0,1260759179
        |7,50,4.5,851866703
        |""".stripMargin)
    val ds = TypedCsv.read[Rating](spark, f.toString)
    val rows = ds.collect().sortBy(r => (r.userId, r.movieId))
    assert(rows.length == 3)
    assert(rows(0) == Rating(1, 31, 2.5f, 1260759144L))
    assert(rows(2) == Rating(7, 50, 4.5f, 851866703L))
    // Typed filter works through the encoder.
    assert(ds.filter(_.rating >= 3.0f).count() == 2)
  }

  test("TypedOrc binds columns by name, surviving physical reorder") {
    val dir = Files.createTempDirectory("graft_orc")
    // Write with columns physically reordered vs the case class — the
    // typed read must bind by name, not position.
    Seq((1260759144L, 2.5f, 31, 1), (851866703L, 4.5f, 50, 7))
      .toDF("timestamp", "rating", "movieId", "userId")
      .coalesce(1).write.mode("overwrite").orc(dir.toString)
    val rows = TypedOrc.read[Rating](spark, dir.toString)
      .collect().sortBy(_.userId)
    assert(rows.toSeq == Seq(
      Rating(1, 31, 2.5f, 1260759144L), Rating(7, 50, 4.5f, 851866703L)))
    // Typed filter works through the encoder (pushdown-eligible plan).
    assert(TypedOrc.read[Rating](spark, dir.toString)
      .filter(_.rating >= 3.0f).count() == 1)
  }

  test("TypedJsonl reads well-formed lines and quarantines corrupt ones") {
    val dir = Files.createTempDirectory("graft_jsonl")
    val f = dir.resolve("ratings.jsonl")
    // line 3 is truncated JSON (syntax reject); line 5 is valid JSON
    // missing required fields (null-field reject — would crash the
    // non-nullable encoder if kept).
    Files.writeString(f,
      """{"userId": 1, "movieId": 31, "rating": 2.5, "timestamp": 1260759144}
        |{"userId": 1, "movieId": 1029, "rating": 3.0, "timestamp": 1260759179}
        |{"userId": 7, "movieId": 50, "rating": 4.5, "timestamp": 851866703
        |{"userId": 9, "movieId": 60, "rating": 1.0, "timestamp": 851866999}
        |{"userId": 5, "movieId": 77}
        |""".stripMargin)
    val ds = TypedJsonl.read[Rating](spark, f.toString)
    assert(ds.collect().map(_.userId).sorted.toSeq == Seq(1, 1, 9))
    val (good, bad) = TypedJsonl.readWithCorrupt[Rating](spark, f.toString)
    assert(good.count() == 3 && bad.count() == 2)
    val lines = bad.collect().map(_.getString(0))
    assert(lines.exists(_.contains("851866703"))) // raw text of the syntax reject
    assert(lines.exists(_.contains("77")))        // re-serialized null-field reject
    // Typed filter works through the encoder.
    assert(good.filter(_.rating >= 3.0f).count() == 1)
  }

  test("bucketed tables join without an exchange on either side") {
    import org.apache.spark.sql.functions.col
    val base = Files.createTempDirectory("graft_buckets")
    val left = spark.range(0, 10000).selectExpr("id AS k", "id * 2 AS a")
    val right = spark.range(0, 10000).selectExpr("id AS k", "id * 3 AS b")
    Bucketed.write(left, "graft_bkt_left", s"$base/l", "k", 8)
    Bucketed.write(right, "graft_bkt_right", s"$base/r", "k", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketed.read(spark, "graft_bkt_left")
        .join(Bucketed.read(spark, "graft_bkt_right"), Seq("k"))
      assert(joined.count() == 10000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // Control: the same join on plain (unbucketed) data does shuffle.
      val unbucketed = left.join(right, Seq("k"))
      unbucketed.count()
      assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_left")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_right")
    }
  }

  test("streaming windowed agg equals the batch aggregation") {
    val dir = "/root/testdata/sf0.001"
    val streamed = EventStream.runBatchEquivalent(spark, dir)
      .orderBy("window_start", "event_type")
      .collect().map(_.toSeq).toSeq
    val batch = EventStream.windowedAgg(Tables.events(spark, dir))
      .orderBy("window_start", "event_type")
      .collect().map(_.toSeq).toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("stream-static enrichment equals the batch join") {
    import graft.streaming.EnrichStream
    val dir = "/root/testdata/sf0.001"
    val users = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val streamed = EnrichStream.runBatchEquivalent(spark, dir)
      .orderBy("c_nationkey", "event_type").collect().map(_.toSeq).toSeq
    val batch = EnrichStream.enrichedAgg(Tables.events(spark, dir), users)
      .orderBy("c_nationkey", "event_type").collect().map(_.toSeq).toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("stream-stream attribution join equals the batch join") {
    import graft.streaming.JoinStream
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val events = Tables.events(spark, dir)
    val streamed = JoinStream.runBatchEquivalent(spark, dir)
      .orderBy("view_id", "purchase_id").collect().map(_.toSeq).toSeq
    val batch = JoinStream.attributed(
        events.filter(col("event_type") === "view"),
        events.filter(col("event_type") === "purchase"))
      .orderBy("view_id", "purchase_id").collect().map(_.toSeq).toSeq
    assert(streamed.nonEmpty, "no attribution pairs in testdata — vacuous test")
    assert(streamed == batch)
  }

  test("hashSlice is stream-safe: the streaming slice equals the batch slice") {
    import graft.ops.Sampling
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, lit, xxhash64}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def h = xxhash64(col("id"), lit(3L))
    val input = MemoryStream[Long]
    val q = Sampling.hashSlice(input.toDS().toDF("id"), h, 0.0, 0.5)
      .writeStream.format("memory").queryName("graft_slice")
      .outputMode("append").start()
    try {
      input.addData(1L to 500L: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("graft_slice").collect().map(_.getLong(0)).toSet
    val batch = Sampling.hashSlice((1L to 500L).toDF("id"), h, 0.0, 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("stateful streaming sessionization emits exactly the batch sessions") {
    import graft.ops.Sessionize
    import graft.streaming.SessionStream
    import graft.streaming.SessionStream.SEvent
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, sum}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // Base offset keeps the earliest event strictly above the engine's
    // initial watermark (0), which drops rows at exactly the boundary.
    def ev(u: Long, sec: Long, v: Double) =
      SEvent(u, new java.sql.Timestamp((1000L + sec) * 1000L), v)
    val gapUs = 60L * 1000000 // 1-minute inactivity gap

    val input = MemoryStream[SEvent]
    val q = SessionStream
      .sessions(input.toDS().withWatermark("ts", "10 seconds"), gapUs)
      .writeStream.format("memory").queryName("graft_sessions")
      .outputMode("append").start()
    try {
      // Two interleaved users; user 1 arrives out of order within the
      // watermark delay.
      input.addData(ev(1, 30, 1.5), ev(2, 5, 2.0), ev(1, 0, 1.0))
      q.processAllAvailable()
      // User 1's session extends across the micro-batch boundary; user 2
      // goes idle past the gap → a second session.
      input.addData(ev(1, 80, 2.5), ev(2, 300, 4.0))
      q.processAllAvailable()
      // Sentinel pushes the watermark far ahead so every real session closes.
      input.addData(ev(99, 100000, 0.0))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("graft_sessions")
      .filter(col("user_id") =!= 99L)
      .select("user_id", "session_start_us", "session_end_us", "n_events", "sum_value")
      .orderBy("user_id", "session_start_us")
      .collect().map(_.toSeq).toSeq

    val batchEvents = Seq(
      ev(1, 30, 1.5), ev(2, 5, 2.0), ev(1, 0, 1.0), ev(1, 80, 2.5), ev(2, 300, 4.0)).toDF()
    val batch = Sessionize
      .sessions(batchEvents, "user_id", "ts", gapUs, "user_id", sum("value").as("sum_value"))
      .select("user_id", "session_start_us", "session_end_us", "n_events", "sum_value")
      .orderBy("user_id", "session_start_us")
      .collect().map(_.toSeq).toSeq

    // user 1: one session 0–80s (3 events); user 2: two singleton sessions.
    assert(batch.length == 3, s"batch sessions: $batch")
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
  }

  test("streaming upsert: latest wins across batches, stale arrivals dropped") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.UpsertStream
    import graft.streaming.UpsertStream.Revision
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Revision]
    val q = UpsertStream.latest(in.toDS())
      .writeStream.outputMode("update").format("memory")
      .queryName("graft_ups_test").start()
    try {
      in.addData(Revision(1, 10, 0, 1.0), Revision(2, 5, 0, 2.0))
      q.processAllAvailable()
      // key 1 gets a STALE revision (older ver — must emit nothing),
      // key 2 a fresh one (must emit), key 3 two in-batch (one emission)
      in.addData(Revision(1, 5, 1, 99.0), Revision(2, 9, 0, 4.0),
        Revision(3, 7, 0, 6.0), Revision(3, 7, 1, 8.0))
      q.processAllAvailable()
      val log = spark.table("graft_ups_test").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      assert(log.count(_._1 == 1) == 1, "stale arrival must not re-emit key 1")
      assert(log.filter(_._1 == 1).head == ((1L, 10L, 0L, 1.0)))
      assert(log.filter(_._1 == 2).map(t => (t._2, t._4)).sorted.toSeq ==
        Seq((5L, 2.0), (9L, 4.0)), "fresh revision re-emits key 2")
      assert(log.filter(_._1 == 3).toSeq == Seq((3L, 7L, 1L, 8.0)),
        "same-version collision resolves by seq, one emission")
    } finally {
      q.stop(); spark.catalog.dropTempView("graft_ups_test")
    }
  }

  test("streaming exact dedup keeps one row per distinct content") {
    import graft.streaming.StreamDedup
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def doc(sec: Long, id: Long, text: String) =
      Doc(new java.sql.Timestamp((1000L + sec) * 1000L), id, text)

    val input = MemoryStream[Doc]
    val q = StreamDedup
      .exactKeep(input.toDF().withWatermark("ts", "1 hour"), "text")
      .writeStream.format("memory").queryName("graft_stream_dedup")
      .outputMode("append").start()
    try {
      input.addData(doc(0, 1, "alpha beta"), doc(1, 2, "gamma"), doc(2, 3, "alpha  beta"))
      q.processAllAvailable()
      // Re-arrivals within the watermark horizon are dropped across batches.
      input.addData(doc(10, 4, "GAMMA"), doc(12, 5, "delta"))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.table("graft_stream_dedup").collect()
    // Normalization folds case/whitespace: "alpha  beta"≡"alpha beta",
    // "GAMMA"≡"gamma" — three distinct contents survive.
    assert(out.length == 3, s"got ${out.toSeq}")
    assert(out.map(_.getAs[Long]("doc_id")).toSet.subsetOf(Set(1L, 2L, 3L, 5L)))
    assert(out.exists(_.getAs[Long]("doc_id") == 5L))
  }

  test("file-stream restart from checkpoint is exactly-once, never reprocesses") {
    // The recovery contract a production ingest lives on: offsets are
    // committed in the checkpoint, so a crash/restart resumes at the
    // first unprocessed file — already-processed input is never emitted
    // twice and new input is never skipped.
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val base = Files.createTempDirectory("graft_recov")
    val (src, sink, chk) =
      (base.resolve("src"), base.resolve("sink"), base.resolve("chk"))
    Files.createDirectories(src)
    def feed(range: Range): Unit =
      range.map(_.toLong).toDF("id").coalesce(1)
        .write.mode("append").parquet(src.toString)
    def drain(): Unit = {
      val q = spark.readStream.schema("id LONG").parquet(src.toString)
        .withColumn("doubled", col("id") * 2)
        .writeStream.format("parquet")
        .option("path", sink.toString)
        .option("checkpointLocation", chk.toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    try {
      feed(0 until 100); feed(100 until 200)
      drain()
      assert(spark.read.parquet(sink.toString).count() == 200)
      feed(200 until 300)
      drain() // fresh query handle, same checkpoint: resumes, not replays
      val out = spark.read.parquet(sink.toString)
      assert(out.count() == 300, "restart reprocessed or skipped input")
      assert(out.select("id").distinct().count() == 300, "duplicate ids after restart")
      assert(out.filter(col("doubled") =!= col("id") * 2).count() == 0)
    } finally {
      import scala.jdk.CollectionConverters._
      Files.walk(base).iterator().asScala.toSeq.reverse
        .foreach(f => Files.deleteIfExists(f))
    }
  }
}
