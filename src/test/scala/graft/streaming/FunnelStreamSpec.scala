package graft.streaming

import graft.SparkSpec
import graft.streaming.FunnelStream.FEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Unit-level semantics of the three-stage funnel matcher: chain
  * freezing at signup + 2W, earliest-stage election, partial chains
  * suppressed, duplicate signup instants collapsed. The sf-corpus
  * batch-equivalence is the `stream_funnel` driver oracle; these pin
  * the boundary behaviors a whole-corpus hash can mask. */
class FunnelStreamSpec extends SparkSpec {

  private val W = 60L * 1000000 // 1-minute stage window

  private def run(events: Seq[FEvent]): Seq[Seq[Any]] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[FEvent]
    val q = FunnelStream
      .matches(input.toDS().withWatermark("ts", "10 seconds"), W)
      .writeStream.format("memory").queryName("graft_funnel_spec")
      .outputMode("append").start()
    try {
      input.addData(events: _*)
      q.processAllAvailable()
      // Sentinel pushes the watermark past every chain's 2W deadline.
      input.addData(FEvent(99, ts(100000), "signup"))
      q.processAllAvailable()
    } finally q.stop()
    spark.table("graft_funnel_spec")
      .filter(org.apache.spark.sql.functions.col("user_id") =!= 99L)
      .orderBy("user_id", "signup_ts_us")
      .collect().map(_.toSeq.toList).toSeq
  }

  private def ts(sec: Long) = new java.sql.Timestamp((1000L + sec) * 1000L)
  private def us(sec: Long) = (1000L + sec) * 1000000L

  test("full chain emits once with the earliest view and purchase") {
    val out = run(Seq(
      FEvent(1, ts(0), "signup"),
      FEvent(1, ts(30), "view"), FEvent(1, ts(40), "view"),
      FEvent(1, ts(50), "purchase"), FEvent(1, ts(55), "purchase")))
    assert(out == Seq(List(1L, us(0), us(30), us(50), us(50) - us(0))), out)
  }

  test("a chain missing its view or its purchase emits nothing") {
    val out = run(Seq(
      FEvent(1, ts(0), "signup"), FEvent(1, ts(30), "purchase"),
      FEvent(2, ts(0), "signup"), FEvent(2, ts(30), "view")))
    assert(out.isEmpty, out)
  }

  test("each stage must land within W of the previous stage") {
    val out = run(Seq(
      // view at 70s > signup + 60s: too late for user 1.
      FEvent(1, ts(0), "signup"), FEvent(1, ts(70), "view"),
      FEvent(1, ts(80), "purchase"),
      // view in window, purchase 75s after the view: too late for 2.
      FEvent(2, ts(0), "signup"), FEvent(2, ts(30), "view"),
      FEvent(2, ts(105), "purchase"),
      // purchase BEFORE the view cannot close user 3's chain.
      FEvent(3, ts(0), "signup"), FEvent(3, ts(40), "view"),
      FEvent(3, ts(20), "purchase")))
    assert(out.isEmpty, out)
  }

  test("duplicate signup instants collapse to one chain") {
    val out = run(Seq(
      FEvent(1, ts(0), "signup"), FEvent(1, ts(0), "signup"),
      FEvent(1, ts(10), "view"), FEvent(1, ts(20), "purchase")))
    assert(out == Seq(List(1L, us(0), us(10), us(20), us(20) - us(0))), out)
  }

  test("two separate signups each match their own chain") {
    val out = run(Seq(
      FEvent(1, ts(0), "signup"), FEvent(1, ts(10), "view"),
      FEvent(1, ts(20), "purchase"),
      FEvent(1, ts(200), "signup"), FEvent(1, ts(230), "view"),
      FEvent(1, ts(250), "purchase")))
    assert(out == Seq(
      List(1L, us(0), us(10), us(20), us(20) - us(0)),
      List(1L, us(200), us(230), us(250), us(250) - us(200))), out)
  }
}
