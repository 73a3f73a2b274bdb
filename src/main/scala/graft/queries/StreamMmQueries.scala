package graft.queries

import graft.Tables
import graft.ops.Multimodal
import graft.streaming.EventStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver wiring for streaming + multimodal (SURVEY §2 #29–30). The
  * streaming query is drained batch-equivalently (available-now trigger,
  * memory sink) so DuckDB can oracle the same aggregation; the multimodal
  * stub's integer arithmetic is likewise SQL-reproducible.
  */
object StreamMmQueries {

  /** #29 watermarked hourly tumbling-window aggregation over events,
    * executed through Structured Streaming. */
  def streamWindowAgg(s: SparkSession, dir: String): DataFrame =
    EventStream.runBatchEquivalent(s, dir)
      .orderBy("window_start", "event_type")

  /** #30 binary payload → per-partition stub decode → features. */
  def multimodalFeatures(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(
        Multimodal.withPayload(Tables.documents(s, dir), "doc_id", "text"))
      .toDF()
      .orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_window_agg"   -> (streamWindowAgg _),
    "multimodal_features" -> (multimodalFeatures _),
  )

  val oracles: Map[String, String] = Map(
    "stream_window_agg" ->
      """SELECT epoch(date_trunc('hour', ts))::BIGINT AS window_start,
        |  event_type, count(*) AS n_events, round(sum(value), 6) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    "multimodal_features" ->
      """SELECT doc_id,
        |  octet_length(encode(text))::BIGINT AS n_bytes,
        |  (octet_length(encode(text))::BIGINT * 2654435761) % 1024 AS width,
        |  (octet_length(encode(text))::BIGINT * 97 + ascii(substring(text, 1, 1))) % 768 AS height,
        |  octet_length(encode(text))::BIGINT % 30 + 1 AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
