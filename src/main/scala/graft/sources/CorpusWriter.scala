package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Output sizing for corpus writes — the other half of the small-files
  * problem: a 100 TB pipeline that writes however many partitions its
  * last shuffle happened to have produces either millions of KB-sized
  * files (metadata pressure on every subsequent scan) or a handful of
  * unsplittable monsters. Both writers here make the file count an
  * explicit, data-derived choice.
  */
object CorpusWriter {

  /** Write `df` as parquet with ~`rowsPerFile` rows per output file:
    * one count pass sizes the repartition (round-robin, so files come
    * out even) and the writer emits exactly that many parts. Returns
    * the file count chosen. */
  def writeSized(df: DataFrame, path: String, rowsPerFile: Long): Int = {
    require(rowsPerFile > 0, "rowsPerFile must be positive")
    val n = df.count()
    val files = math.max(1L, (n + rowsPerFile - 1) / rowsPerFile).toInt
    df.repartition(files).write.mode("overwrite").parquet(path)
    files
  }

  /** Write `df` hive-partitioned by `partitionCols` with one file per
    * partition value combination (each partition's rows are hash-routed
    * to a single writer task via a repartition on the same columns) —
    * the layout that lets every later per-language / per-source scan
    * prune directories instead of reading the corpus. For partitions
    * too large for one file, compose with [[writeSized]] per slice. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "at least one partition column")
    df.repartition(partitionCols.map(col): _*)
      .write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }
}
