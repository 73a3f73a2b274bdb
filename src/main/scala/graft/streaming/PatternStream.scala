package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sequence-pattern detection (CEP): per user, match
  * "trigger event A followed by event B within a time window" — here
  * signup → first purchase within one hour — with
  * `flatMapGroupsWithState` and event-time timeouts. The streaming
  * half of the batch funnel family (`q10_funnel` / `funnel_ttc`).
  *
  * Determinism contract: a signup's match set is frozen exactly when
  * the watermark passes `signup + window` (any still-missing purchase
  * in the window would be late and dropped), so each signup emits at
  * most one row — the earliest in-window purchase — exactly once.
  *
  * State per user is two integer lists: open signups (awaiting their
  * window to close) and purchases that could still match a
  * future-arriving signup. A purchase p is retained only while
  * `p > min(watermark, earliest open signup)` — anything older can
  * match nothing (a signup admitted later has ts ≥ watermark, and
  * matches need p > s) — so state is bounded by the watermark horizon,
  * not the stream length.
  */
object PatternStream {

  case class PEvent(user_id: Long, ts: java.sql.Timestamp, event_type: String)

  case class PendState(signups: Seq[Long], purchases: Seq[Long])

  case class PatternMatch(
      user_id: Long,
      signup_ts_us: Long,
      purchase_ts_us: Long,
      latency_us: Long)

  /** A→B matches over a watermarked event stream. `windowUs` is the
    * match window (B strictly after A, at most windowUs later). */
  def matches(events: Dataset[PEvent], windowUs: Long): Dataset[PatternMatch] = {
    require(windowUs > 0, "window must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[PendState, PatternMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, evs: Iterator[PEvent], state: GroupState[PendState]) =>
          val st = state.getOption.getOrElse(PendState(Nil, Nil))
          val inc = evs.toSeq
          def us(e: PEvent): Long =
            e.ts.getTime * 1000L + (e.ts.getNanos / 1000L) % 1000L
          // Duplicate signup timestamps collapse (one match per distinct
          // trigger instant), pinned in the oracle as SELECT DISTINCT.
          val signups =
            (st.signups ++ inc.filter(_.event_type == "signup").map(us)).distinct
          val purchases =
            st.purchases ++ inc.filter(_.event_type == "purchase").map(us)
          val wmUs = state.getCurrentWatermarkMs * 1000L
          val (closed, open) = signups.partition(s => s + windowUs < wmUs)
          val out = closed.flatMap { s =>
            val inWin = purchases.filter(p => p > s && p <= s + windowUs)
            if (inWin.isEmpty) None
            else Some(PatternMatch(uid, s, inWin.min, inWin.min - s))
          }
          val floor = if (open.isEmpty) wmUs else math.min(wmUs, open.min)
          val keepP = purchases.filter(_ > floor)
          if (open.isEmpty && keepP.isEmpty) {
            state.remove()
          } else {
            state.update(PendState(open, keepP))
            // Wake when the earliest deadline passes the watermark; the
            // engine requires a timeout strictly beyond the current one.
            val deadlineMs =
              (open.map(_ + windowUs) ++ keepP).min / 1000L + 1L
            state.setTimeoutTimestamp(
              math.max(deadlineMs, state.getCurrentWatermarkMs + 1L))
          }
          out.iterator
      }
  }

  /** Driver batch-equivalence entry: signup → purchase within 1 hour
    * over the events file stream (1-hour watermark delay). The final
    * watermark is `(max_ts_ms − 3 600 000) · 1000` µs; a signup's row
    * is in the output iff `signup + 1h < wm` and an in-window purchase
    * exists — exactly the cutoff the batch oracle applies. */
  def runBatchEquivalent(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val evs = Drain.events(spark, dir)
      .filter(col("event_type").isin("signup", "purchase"))
      .select(col("user_id"), col("ts"), col("event_type"))
      .withWatermark("ts", "1 hour")
      .as[PEvent]
    Drain.toMemory(matches(evs, 3600L * 1000000).toDF(), "append", "graft_pattern")
  }
}
