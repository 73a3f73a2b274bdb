package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental gap-based sessionization over an event stream — the
  * Structured Streaming half of the session pair (batch half:
  * [[graft.ops.Sessionize]]), built on `flatMapGroupsWithState` with
  * event-time timeouts.
  *
  * State per user is the set of still-open sessions (normally one; briefly
  * more under out-of-order arrival inside the watermark delay), each a
  * packed (start, end, count, sum) — O(1) per user, independent of session
  * length. A session closes, is emitted, and leaves state as soon as the
  * watermark passes its end by more than the gap; users with no open
  * session hold no state. Late events beyond the watermark are dropped by
  * the engine before they reach the state function, matching the batch
  * semantics on the closed event set.
  */
object SessionStream {

  /** Input event: event-time timestamp + a summed metric. */
  case class SEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)

  /** An open (or just-closed) session, times in epoch µs. */
  case class SessionRec(
      session_start_us: Long,
      session_end_us: Long,
      n_events: Long,
      sum_value: Double)

  case class OpenSessions(open: Seq[SessionRec])

  /** Emitted row for a closed session. */
  case class ClosedSession(
      user_id: Long,
      session_start_us: Long,
      session_end_us: Long,
      n_events: Long,
      sum_value: Double)

  /** Driver batch-equivalence entry: sessionize the events file stream
    * (30-minute gap, 1-hour watermark delay) and return every session
    * the FINAL watermark closes. The engine's watermark is
    * deterministic — `wm_us = (max_ts_us div 1000 − 3 600 000) · 1000`
    * (event-time stats truncate to milliseconds) — and a session emits
    * iff `session_end_us + gap_us < wm_us`, so the batch oracle applies
    * the identical integer cutoff to the gap-sessionized table. Tail
    * sessions the watermark never passes stay open by design (they'd
    * emit on the next day's data in production). */
  def runBatchEquivalent(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val evs = Drain.events(spark, dir)
      .select(col("user_id"), col("ts"), col("value"))
      .withWatermark("ts", "1 hour")
      .as[SEvent]
    Drain.toMemory(sessions(evs, 30L * 60 * 1000000).toDF(), "append", "graft_ssess")
  }

  /** Sessionize `events` with inactivity gap `gapUs` (µs); the stream must
    * carry a watermark on `ts` (set `withWatermark` upstream — it bounds
    * both lateness and how long sessions stay open past their last event).
    * Emits each session exactly once, when the watermark closes it. */
  def sessions(events: Dataset[SEvent], gapUs: Long): Dataset[ClosedSession] = {
    require(gapUs > 0, "gap must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSessions, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, evs: Iterator[SEvent], state: GroupState[OpenSessions]) =>
          val existing = state.getOption.map(_.open).getOrElse(Seq.empty)
          val incoming = evs.map { e =>
            val us = e.ts.getTime * 1000L + (e.ts.getNanos / 1000L) % 1000L
            SessionRec(us, us, 1L, e.value)
          }.toSeq
          // Merge intervals: sort by start, fold neighbors within gap.
          val merged = (existing ++ incoming)
            .sortBy(s => (s.session_start_us, s.session_end_us))
            .foldLeft(List.empty[SessionRec]) { (acc, s) =>
              acc match {
                case h :: t if s.session_start_us - h.session_end_us <= gapUs =>
                  SessionRec(
                    h.session_start_us,
                    math.max(h.session_end_us, s.session_end_us),
                    h.n_events + s.n_events,
                    h.sum_value + s.sum_value) :: t
                case _ => s :: acc
              }
            }
            .reverse
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (closed, open) = merged.partition(_.session_end_us + gapUs < wmUs)
          if (open.nonEmpty) {
            state.update(OpenSessions(open))
            // Wake when the earliest open session could close (must be
            // strictly past the current watermark).
            val wakeMs = (open.map(_.session_end_us).min + gapUs) / 1000L + 1L
            state.setTimeoutTimestamp(math.max(wakeMs, state.getCurrentWatermarkMs() + 1L))
          } else {
            state.remove()
          }
          closed.iterator.map(s =>
            ClosedSession(uid, s.session_start_us, s.session_end_us, s.n_events, s.sum_value))
      }
  }
}
