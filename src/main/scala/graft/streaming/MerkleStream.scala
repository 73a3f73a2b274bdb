package graft.streaming

import graft.ops.Integrity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming incremental table fingerprint — the continuous counterpart
  * of [[graft.ops.Integrity.merkleChecksum]]'s leaf level: each
  * micro-batch XORs its rows' 60-bit md5 hashes into per-bucket state,
  * so a replica's integrity digest stays current DURING ingest instead
  * of requiring a full-table rescan after it. XOR is commutative,
  * associative and self-inverse, which makes the aggregation state
  * exactly 16 (bucket → 8-byte digest, row count) rows regardless of
  * stream length — and means a retracted row could even be *removed*
  * from the digest by re-XORing it, the property plain hashes lack.
  */
object MerkleStream {

  /** Per-bucket (n_rows, checksum) over a streaming DataFrame: the same
    * md5-keyed bucketing and row hash as the batch Merkle leaves, as a
    * complete-mode streaming aggregate. */
  def leafDigests(df: DataFrame, keyCol: String, cols: Seq[String],
      nBuckets: Int = 16): DataFrame =
    df.withColumn("__graft_b",
        pmod(conv(substring(md5(col(keyCol).cast("string")), 1, 15), 16, 10)
          .cast("long"), lit(nBuckets.toLong)))
      .withColumn("__graft_h", Integrity.rowHash(cols))
      .groupBy(col("__graft_b").as("bucket"))
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(__graft_h)").as("checksum"))

  /** Drain the documents table through the streaming digest and return
    * the final per-bucket leaves — which must equal the batch
    * [[Integrity.merkleChecksum]] leaf level over the same corpus
    * (the oracle recomputes that in SQL): incremental maintenance and
    * full recompute converge on identical digests. */
  def runBatchEquivalent(spark: SparkSession, dir: String): DataFrame = {
    val docs = Drain.documents(spark, dir)
      .drop("ingest_ts")
    val leaves = leafDigests(docs, "doc_id",
      Seq("doc_id", "text", "lang", "source", "n_chars"))
    Drain.toMemory(leaves, "complete", "graft_smerkle")
  }
}
