package graft.streaming

import graft.ops.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming ingest cleaning — the composition a corpus pipeline runs
  * on arrival: stateless quality gates (token floor + quality score,
  * the same gates as the batch `corpus_clean`) in front of the
  * watermark-bounded exact dedup. Gating BEFORE dedup is the right
  * order at scale: rejected documents never enter the dedup state, so
  * state size tracks the accepted corpus, not the firehose.
  */
object CleanStream {

  /** The streaming clean: quality-gate then first-arrival dedup. `df`
    * must be a streaming DataFrame with a watermark already set. */
  def clean(df: DataFrame, textCol: String): DataFrame =
    StreamDedup.exactKeep(
      df.filter(TextAnalysis.wsTokenCount(col(textCol)) >= 30 &&
        round(TextAnalysis.qualityScore(col(textCol)), 6) >= 0.65),
      textCol)

  /** Drain the documents table through the clean with every document
    * arriving twice (re-ingest shape, as in
    * [[StreamDedup.runBatchEquivalent]]): the result must be exactly
    * the gated distinct corpus. */
  def runBatchEquivalent(spark: SparkSession, dir: String): DataFrame = {
    val docs = Drain.documents(spark, dir).withWatermark("ingest_ts", "1 hour")
    Drain.toMemory(clean(docs.unionAll(docs), "text"), "append", "graft_sclean")
  }
}
