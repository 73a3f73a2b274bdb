package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Line-delimited plain-text ingestion — the rawest corpus interchange
  * format (one record per line, delimiter conventions owned by the
  * pipeline, not the format). `spark.read.text` keeps the scan
  * vectorized and trivially splittable: a 100 TB line corpus fans out
  * by HDFS/S3 block with zero parsing state, which is why web-scale
  * text dumps ship this way. Writers must escape embedded newlines
  * before [[write]] — the format has no quoting dialect to do it for
  * them (that property is what keeps the reader stateless).
  */
object TypedText {

  /** Read `path` as one `value: string` row per line. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** Write `lineCol` (must be newline-free) as a text file tree. */
  def write(df: DataFrame, lineCol: String, path: String): Unit =
    df.select(col(lineCol)).write.mode("overwrite").text(path)
}
