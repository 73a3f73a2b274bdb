package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Order-independent table fingerprints — the migration/replication
  * validation primitive: after copying, compacting, re-partitioning or
  * re-encoding a 100 TB table, compare one row of (n_rows, checksum)
  * per group instead of re-reading both sides row-by-row. The checksum
  * is the XOR of per-row 60-bit md5 hashes: commutative and
  * associative, so it is invariant under row order and partitioning,
  * partial-aggregable (each partition folds to 8 bytes before the
  * exchange), and any single-row difference flips it with probability
  * 1 − 2⁻⁶⁰.
  *
  * Canonical row form: columns cast to strings, nulls replaced by the
  * `\N` sentinel, joined with `|`. (A literal string `\N` therefore
  * collides with NULL — the classic dump-format tradeoff; choose a
  * different sentinel via the `nullAs` parameter when `\N` can occur
  * in data.) md5 keeps the fingerprint reproducible by ANY engine —
  * the point of a cross-system validation primitive — rather than a
  * Spark-private hash.
  */
object Integrity {

  /** 60-bit row hash of the canonicalized columns (15 hex chars of
    * md5 — stays inside a signed 64-bit value on every engine). */
  private def rowHash(cols: Seq[String], nullAs: String): Column =
    conv(substring(md5(concat_ws("|",
      cols.map(c => coalesce(col(c).cast("string"), lit(nullAs))): _*)),
      1, 15), 16, 10).cast("long")

  /** One (n_rows, checksum) row for the whole table. */
  def tableChecksum(df: DataFrame, cols: Seq[String],
      nullAs: String = "\\N"): DataFrame = {
    require(cols.nonEmpty, "at least one column")
    df.select(rowHash(cols, nullAs).as("__graft_h"))
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(__graft_h)").as("checksum"))
  }

  /** Per-group (n_rows, checksum) rows — compare partitions of a
    * replicated table independently, so one mismatch localizes to its
    * group instead of invalidating the whole copy. */
  def groupChecksum(df: DataFrame, groupCols: Seq[String],
      cols: Seq[String], nullAs: String = "\\N"): DataFrame = {
    require(groupCols.nonEmpty && cols.nonEmpty, "need group and value columns")
    df.withColumn("__graft_h", rowHash(cols, nullAs))
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(__graft_h)").as("checksum"))
  }
}
