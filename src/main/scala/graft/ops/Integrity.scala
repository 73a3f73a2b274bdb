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
    * md5 — stays inside a signed 64-bit value on every engine). Public:
    * the streaming incremental fingerprint keeps per-bucket state with
    * the SAME row hash, so batch and stream digests are comparable. */
  def rowHash(cols: Seq[String], nullAs: String = "\\N"): Column =
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

  /** Two-level Merkle fingerprint: rows hash into `nBuckets` leaves by
    * the md5 of their key (stable under repartitioning — the bucket is
    * data-derived, never layout-derived), each leaf folds to
    * (n_rows, checksum), and the root folds the re-hashed leaf digests.
    * Replication protocol: compare roots first (one row); on mismatch
    * compare the `nBuckets` leaves and re-sync only the buckets that
    * differ — 1/nBuckets of the table instead of all of it. Long form:
    * level 1 = leaves, level 0 = the root (bucket −1). The leaf level
    * is ALWAYS exactly nBuckets rows: buckets with no rows emit
    * (n_rows = 0, checksum = 0) via a generated spine, so a bucket
    * that is empty on one replica and non-empty on the other diffs as
    * a leaf mismatch instead of silently vanishing from the compare. */
  def merkleChecksum(df: DataFrame, keyCol: String, cols: Seq[String],
      nBuckets: Int = 16, nullAs: String = "\\N"): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val bucketed = df.withColumn("__graft_b",
      pmod(conv(substring(md5(col(keyCol).cast("string")), 1, 15), 16, 10)
        .cast("long"), lit(nBuckets.toLong)))
    val spine = df.sparkSession.range(0, nBuckets.toLong)
      .select(col("id").as("bucket"))
    val leaves = spine
      .join(broadcast(groupChecksum(bucketed, Seq("__graft_b"), cols, nullAs)
        .withColumnRenamed("__graft_b", "bucket")), Seq("bucket"), "left")
      .withColumn("n_rows", coalesce(col("n_rows"), lit(0L)))
      .withColumn("checksum", coalesce(col("checksum"), lit(0L)))
    val root = leaves
      .select(col("n_rows"),
        conv(substring(md5(concat_ws(":",
          col("bucket"), col("n_rows"), col("checksum"))), 1, 15), 16, 10)
          .cast("long").as("__graft_leaf"))
      .agg(sum("n_rows").as("n_rows"), expr("bit_xor(__graft_leaf)").as("checksum"))
      .select(lit(0).as("level"), lit(-1L).as("bucket"),
        col("n_rows"), col("checksum"))
    leaves
      .select(lit(1).as("level"), col("bucket"), col("n_rows"), col("checksum"))
      .unionAll(root)
  }
}
