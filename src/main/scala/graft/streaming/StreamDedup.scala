package graft.streaming

import graft.ops.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the incremental counterpart of
  * [[graft.ops.Dedup.exact]] for ingest pipelines: keep the first arrival
  * of each distinct content, drop re-arrivals.
  *
  * Built on `dropDuplicatesWithinWatermark` keyed by the 128-bit content
  * fingerprint (same normalization + hash as the batch operator, so batch
  * and stream agree on what "identical" means). The watermark bounds the
  * dedup state: a key is only held as long as a duplicate could still
  * arrive within the allowed lateness, after which the engine evicts it —
  * state is O(#distinct keys per watermark horizon), not O(stream). The
  * shuffle key is the 16-byte hash, never the document body, so the
  * exchange volume at 100 TB/day ingest is O(#docs · 16 B).
  */
object StreamDedup {

  /** First-arrival rows of the stream, exact-content-deduplicated within
    * the watermark horizon. `df` must be a streaming DataFrame with a
    * watermark already set on its event-time column. */
  def exactKeep(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("__graft_fp", TextAnalysis.fingerprint(col(textCol)))
      .dropDuplicatesWithinWatermark("__graft_fp")
      .drop("__graft_fp")
}
