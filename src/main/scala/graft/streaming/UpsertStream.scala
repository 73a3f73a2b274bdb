package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming latest-wins upsert — the incremental counterpart of
  * [[graft.ops.Upsert.latestWins]] for CDC feeds and re-crawls: per-key
  * state holds only the current winning (version, seq, value) tuple,
  * and a batch emits a key only when its winner CHANGED — the
  * change-log a downstream materialization applies, not a
  * full-snapshot rewrite.
  *
  * State is O(#live keys) × one record, independent of update volume;
  * the comparison tuple (version, then seq) matches the batch
  * operator's (versionCol, tieCols) ordering so stream and batch agree
  * on every winner. Keys are never evicted by this operator — a CDC
  * key set is the table's key set, bounded by the table, not the
  * stream; pair with a TTL timeout when keys are genuinely transient.
  */
object UpsertStream {

  /** One keyed revision: `ver` is the event-time version (epoch µs),
    * `seq` breaks exact-version collisions (ingest sequence). */
  case class Revision(key: Long, ver: Long, seq: Long, value: Double)

  /** Change-log of winners: emits a key's current latest revision in
    * every micro-batch where it changed (update output mode). */
  def latest(updates: Dataset[Revision]): Dataset[Revision] = {
    val spark = updates.sparkSession
    import spark.implicits._
    updates
      .groupByKey(_.key)
      .flatMapGroupsWithState[Revision, Revision](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: Long, revs: Iterator[Revision], state: GroupState[Revision]) =>
          val incoming = revs.maxBy(r => (r.ver, r.seq))
          state.getOption match {
            case Some(cur)
                if Ordering[(Long, Long)].gteq((cur.ver, cur.seq),
                  (incoming.ver, incoming.seq)) =>
              Iterator.empty // stale arrivals: winner unchanged, emit nothing
            case _ =>
              state.update(incoming)
              Iterator(incoming)
          }
      }
  }

  /** Drain the documents table as a CDC feed ([[Drain]] harness): every
    * document arrives twice — the original revision and a "re-crawl"
    * one hour later with changed metadata — and the streaming upsert's
    * change-log must compact to exactly the re-crawled values. The
    * final `groupBy key → max (ver, seq)` fold is the read-side
    * materialization a change-log consumer applies; with a
    * single-batch drain the log already holds one row per key, so the
    * fold is a no-op that keeps the check honest under multi-batch
    * replays. */
  def runBatchEquivalent(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Drain.documents(spark, dir)
    def revs(tsOffsetS: Long, seq: Long, valueBump: Long) =
      docs.select(
        col("doc_id").as("key"),
        ((col("doc_id") + 1 + tsOffsetS) * 1000000L).as("ver"),
        lit(seq).as("seq"),
        (col("n_chars") + valueBump).cast("double").as("value"))
    val feed = revs(0, 0, 0).unionAll(revs(3600, 1, 1000))
    val log = latest(feed.as[Revision])
    Drain.toMemory(log.toDF(), "update", "graft_supsert")
      .groupBy("key")
      .agg(max(struct(col("ver"), col("seq"), col("value"))).as("w"))
      .select(col("key").as("doc_id"), col("w.ver").as("ver_us"),
        col("w.value").as("latest_value"))
  }
}
