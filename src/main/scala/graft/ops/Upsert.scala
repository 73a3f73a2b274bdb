package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot compaction for incrementally-updated corpora: collapse a
  * log of keyed revisions (CDC feed, re-crawls, re-ingested documents)
  * to each key's latest version — the read-side "upsert" a plain
  * parquet lake needs before training can treat it as a table.
  *
  * Scale shape: delegates to [[Sampling.stratifiedQuota]] with quota 1 —
  * one exchange on the key, and the rn ≤ 1 window compiles to Spark's
  * WindowGroupLimit (per-group top-1 with early termination), never a
  * full per-key sort. Pass `tieCols` to make the winner deterministic
  * when versions can collide (e.g. an ingest sequence number).
  */
object Upsert {

  /** One row per distinct key: the row with the greatest
    * (versionCol, tieCols...) tuple. */
  def latestWins(
      df: DataFrame,
      keyCols: Seq[String],
      versionCol: String,
      tieCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    val order: Seq[Column] = (versionCol +: tieCols).map(c => col(c).desc)
    Sampling.stratifiedQuota(df, keyCols.map(col), order, 1)
  }

  /** Type-2 slowly-changing-dimension history: every revision of a key
    * becomes a versioned row with its validity interval —
    * `valid_from` = its own version, `valid_to` = the next revision's
    * version (null while current), plus an `is_current` flag. The
    * write-side complement of [[latestWins]]: latest-wins reads the
    * current state, SCD2 keeps the full history queryable by as-of
    * time (`valid_from <= t AND (valid_to IS NULL OR t < valid_to)`).
    *
    * One exchange on the key; the lead window is the only pass.
    * `tieCols` break version collisions so interval boundaries are
    * deterministic.
    */
  def scd2(
      df: DataFrame,
      keyCols: Seq[String],
      versionCol: String,
      tieCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy((versionCol +: tieCols).map(col): _*)
    df
      .withColumn("valid_from", col(versionCol))
      .withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
