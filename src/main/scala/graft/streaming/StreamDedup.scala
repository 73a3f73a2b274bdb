package graft.streaming

import graft.ops.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Drain the documents table through the streaming dedup ([[Drain]]
    * harness) with every document arriving TWICE (self-union of the
    * source — the re-ingest shape): the dedup state must collapse each
    * content back to exactly one row.
    *
    * The drained rows are aggregated per content fingerprint —
    * (min kept doc_id, fp, n_kept) — the same derivation the oracle
    * states over the base corpus, so the check does not assume the
    * generator never plants an intra-corpus exact duplicate: if one
    * appears, both sides still emit one row per distinct content and
    * n_kept still certifies the collapse. (doc_id remains comparable
    * because re-arrivals of a content are byte-identical and the
    * single-file drain arrives in doc_id order, so the kept
    * representative is the min id — matching the oracle's min.) */
  def runBatchEquivalent(spark: SparkSession, dir: String): DataFrame = {
    val docs = Drain.documents(spark, dir).withWatermark("ingest_ts", "1 hour")
    val deduped = exactKeep(docs.unionAll(docs), "text")
    Drain.toMemory(deduped, "append", "graft_sdedup")
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp_md5"))
      .groupBy("fp_md5")
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_kept"))
      .select("doc_id", "fp_md5", "n_kept")
  }
}
