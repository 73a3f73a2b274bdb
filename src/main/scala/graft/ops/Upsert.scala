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

  /** Lakehouse MERGE (write-side apply-changes): fold a keyed change
    * feed onto a base snapshot, producing the next snapshot —
    * `op = "delete"` removes the key, any other op upserts the change
    * row's payload (insert if absent, replace if present), untouched
    * base keys pass through. The feed is compacted to one change per
    * key first ([[latestWins]] on `versionCol`/`tieCols`), so a batch
    * carrying several revisions of a key applies only its newest.
    *
    * `changes` must carry every `base` column plus `opCol`; the result
    * has exactly `base`'s columns. Scale shape: one WindowGroupLimit
    * exchange to compact the feed (bounded by feed size, typically ≪
    * base) + one key-keyed full-outer join — the two-shuffle floor for
    * keyed merge, with no driver state; at 100 TB both sides
    * co-partition on the key so the join reuses the compaction's
    * exchange. */
  def applyChanges(
      base: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      opCol: String,
      versionCol: String,
      tieCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    val missing = (base.columns :+ opCol).toSet -- changes.columns.toSet
    require(missing.isEmpty, s"changes side lacks columns: $missing")
    val payloadCols = base.columns.filterNot(keyCols.contains)
    val latest = latestWins(changes, keyCols, versionCol, tieCols)
      .select(keyCols.map(col) ++ Seq(col(opCol).as("__op"),
        struct(payloadCols.map(col): _*).as("__cp")): _*)
    val b = base.select(keyCols.map(col) :+
      struct(payloadCols.map(col): _*).as("__bp"): _*)
    b.join(latest, keyCols, "full_outer")
      // Rows only in base have a null __op and must survive; only an
      // explicit delete drops the key.
      .filter(col("__op").isNull || col("__op") =!= "delete")
      .withColumn("__p", when(col("__op").isNotNull, col("__cp")).otherwise(col("__bp")))
      .select(keyCols.map(col) ++ payloadCols.map(c => col("__p")(c).as(c)): _*)
  }
}
