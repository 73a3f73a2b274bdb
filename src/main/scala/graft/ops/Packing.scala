package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget document packing (SURVEY §2 #34): assign documents to
  * training-sequence bins of ~`budget` tokens, the step between a
  * cleaned corpus and fixed-length batch construction.
  *
  * Scale shape: documents hash into `numBuckets` independent buckets and
  * are packed *within* each bucket by a running token sum over a
  * bucket-partitioned window — one shuffle on the bucket key, sequential
  * work only within a bucket (set numBuckets ≈ a few × cluster cores;
  * packing quality is per-bin and unaffected by the bucket split). The
  * greedy rule is streaming first-fit in id order: a document lands in
  * the bin where its cumulative offset starts, so a bin overflows its
  * budget by at most one document (the standard pack-then-truncate/pad
  * contract) and never splits a document.
  */
object Packing {

  /** Returns (idCol, bucket, bin, n_tokens): `bin` is the per-bucket
    * sequence index floor((cumsum − tokens) / budget). `tokens` is a
    * caller-supplied count column ([[TextAnalysis.wsTokenCount]], a
    * real tokenizer's count, …); `bucketHash` an arbitrary deterministic
    * hash column (kept caller-supplied so exact oracles can mirror it). */
  def packByBudget(
      df: DataFrame,
      idCol: String,
      tokens: Column,
      budget: Long,
      bucketHash: Column,
      numBuckets: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(numBuckets > 0, "numBuckets must be positive")
    val w = Window.partitionBy(col("bucket")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), pmod(bucketHash, lit(numBuckets.toLong)).as("bucket"),
        tokens.cast("long").as("n_tokens"))
      .withColumn("cum", sum("n_tokens").over(w))
      .select(col(idCol), col("bucket"),
        floor((col("cum") - col("n_tokens")) / lit(budget.toDouble)).as("bin"),
        col("n_tokens"))
  }
}
