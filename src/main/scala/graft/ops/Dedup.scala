package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (SURVEY §2 #18–22).
  *
  * Scale discipline: no operator here ever forms the O(n²) global pair
  * space. Exact dedup groups by a 128-bit content hash (so the shuffle
  * carries 16-byte keys, not document bodies); near-dup detection always
  * blocks candidate pairs by a bucket key (minhash band, simhash prefix,
  * hyperplane signature) and verifies only within buckets.
  */
object Dedup {

  /** Exact deduplication by content hash.
    *
    * Groups on `md5(normalized text)` — the shuffle key is 32 hex chars
    * regardless of document size, so at 100 TB the exchange volume is
    * O(#docs · 16 B), not O(corpus). A 128-bit hash makes accidental
    * collisions (~n²/2¹²⁸) irrelevant at any achievable corpus size.
    *
    * Returns one row per distinct content: the representative (minimum)
    * id, the copy count, and the content hash.
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(TextAnalysis.fingerprint(col(textCol)).as("content_md5"), col(idCol))
      .groupBy("content_md5")
      .agg(min(idCol).as(idCol), count(lit(1)).as("n_copies"))

  /** Rows of `df` surviving exact dedup (first-id-wins), full schema. */
  def exactKeep(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keep = exact(df, textCol, idCol).select(col(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }
}
