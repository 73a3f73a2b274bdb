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
}
