package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming three-stage funnel CEP: per user, match
  * "signup → first view within W → first purchase within W of that
  * view" with `flatMapGroupsWithState` and event-time timeouts — the
  * stateful-streaming big sibling of [[PatternStream]]'s two-stage
  * match and the streaming half of the batch `q10_funnel` family.
  *
  * Determinism contract: a signup's chain is frozen exactly when the
  * watermark passes `signup + 2W` (the latest possible chain purchase
  * is at `signup + 2W`; anything later would be late and dropped), so
  * each distinct signup instant emits at most one fully-matched chain
  * exactly once: the earliest in-window view, then the earliest
  * purchase in that view's window.
  *
  * State per user is three integer lists bounded by the watermark
  * horizon: open signups (awaiting their 2W deadline), and views /
  * purchases newer than `min(watermark, earliest open signup)` —
  * anything older can complete no open or future chain (a signup
  * admitted later has ts ≥ watermark, and chains need v > s, p > v).
  */
object FunnelStream {

  case class FEvent(user_id: Long, ts: java.sql.Timestamp, event_type: String)

  case class FunnelState(signups: Seq[Long], views: Seq[Long], purchases: Seq[Long])

  case class FunnelMatch(
      user_id: Long,
      signup_ts_us: Long,
      view_ts_us: Long,
      purchase_ts_us: Long,
      total_latency_us: Long)

  /** signup→view→purchase chains over a watermarked event stream;
    * each stage must follow the previous strictly within `windowUs`. */
  def matches(events: Dataset[FEvent], windowUs: Long): Dataset[FunnelMatch] = {
    require(windowUs > 0, "window must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, evs: Iterator[FEvent], state: GroupState[FunnelState]) =>
          val st = state.getOption.getOrElse(FunnelState(Nil, Nil, Nil))
          val inc = evs.toSeq
          def us(e: FEvent): Long =
            e.ts.getTime * 1000L + (e.ts.getNanos / 1000L) % 1000L
          // Duplicate signup instants collapse (one chain per distinct
          // trigger instant), pinned in the oracle as SELECT DISTINCT.
          val signups =
            (st.signups ++ inc.filter(_.event_type == "signup").map(us)).distinct
          val views = st.views ++ inc.filter(_.event_type == "view").map(us)
          val purchases =
            st.purchases ++ inc.filter(_.event_type == "purchase").map(us)
          val wmUs = state.getCurrentWatermarkMs * 1000L
          val (closed, open) = signups.partition(s => s + 2 * windowUs < wmUs)
          val out = closed.flatMap { s =>
            val vWin = views.filter(v => v > s && v <= s + windowUs)
            if (vWin.isEmpty) None
            else {
              val v = vWin.min
              val pWin = purchases.filter(p => p > v && p <= v + windowUs)
              if (pWin.isEmpty) None
              else Some(FunnelMatch(uid, s, v, pWin.min, pWin.min - s))
            }
          }
          val floor = if (open.isEmpty) wmUs else math.min(wmUs, open.min)
          val keepV = views.filter(_ > floor)
          val keepP = purchases.filter(_ > floor)
          if (open.isEmpty && keepV.isEmpty && keepP.isEmpty) {
            state.remove()
          } else {
            state.update(FunnelState(open, keepV, keepP))
            val deadlineMs =
              (open.map(_ + 2 * windowUs) ++ keepV ++ keepP).min / 1000L + 1L
            state.setTimeoutTimestamp(
              math.max(deadlineMs, state.getCurrentWatermarkMs + 1L))
          }
          out.iterator
      }
  }

  /** Driver batch-equivalence entry: signup → view → purchase, each
    * stage within 1 hour, over the events file stream (1-hour
    * watermark delay). The final watermark is
    * `(max_ts_ms − 3 600 000) · 1000` µs; a signup's chain is in the
    * output iff `signup + 2h < wm` and both stages match — exactly the
    * cutoff the batch oracle applies. */
  def runBatchEquivalent(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val evs = Drain.events(spark, dir)
      .filter(col("event_type").isin("signup", "view", "purchase"))
      .select(col("user_id"), col("ts"), col("event_type"))
      .withWatermark("ts", "1 hour")
      .as[FEvent]
    Drain.toMemory(matches(evs, 3600L * 1000000).toDF(), "append", "graft_funnel")
  }
}
