package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixed-width record ingestion — the mainframe/EDI interchange shape
  * (COBOL copybooks, NACHA, legacy bank extracts): every field owns a
  * fixed character slice of the line, no delimiter, no quoting. The
  * reader is a stateless per-line substring slice over `spark.read
  * .text`, so a 100 TB extract splits by storage block exactly like
  * any line corpus — layout drives the projection, and unused trailing
  * fields never materialize (column pruning at the parse).
  */
object FixedWidth {

  /** One field of the layout: `width` characters, `dataType` a Spark
    * cast target ("long", "string", "double", …). Strings are
    * right-padded on write and trimmed on read; numbers left-padded. */
  case class Field(name: String, width: Int, dataType: String)

  /** Parse `path` (line text) with `layout`, slicing fields at their
    * cumulative offsets. Blank-padded values trim before the cast;
    * a field that fails its cast surfaces as null (ANSI-safe
    * try_cast), never an exception — a torn record in a huge extract
    * must not kill the job. */
  def read(spark: SparkSession, path: String, layout: Seq[Field]): DataFrame = {
    val offsets = layout.scanLeft(1)((off, f) => off + f.width)
    val cols: Seq[Column] = layout.zip(offsets).map { case (f, off) =>
      val raw = trim(substring(col("value"), off, f.width))
      (if (f.dataType == "string") raw
       else expr(s"try_cast(trim(substring(value, $off, ${f.width})) AS ${f.dataType})"))
        .as(f.name)
    }
    spark.read.text(path).select(cols: _*)
  }

  /** Write `df`'s `layout` columns as fixed-width lines (numbers
    * left-padded with spaces, strings right-padded). Values longer
    * than their field width are rejected up front — silent truncation
    * would corrupt the record, the classic fixed-width failure. */
  def write(df: DataFrame, layout: Seq[Field], path: String): Unit = {
    val over = layout.map(f =>
      sum(when(length(col(f.name).cast("string")) > f.width, 1).otherwise(0)))
      .reduce(_ + _)
    require(df.agg(over).head().getLong(0) == 0L,
      "value wider than its fixed-width field")
    val line = concat(layout.map { f =>
      if (f.dataType == "string") rpad(col(f.name).cast("string"), f.width, " ")
      else lpad(col(f.name).cast("string"), f.width, " ")
    }: _*)
    df.select(line.as("line")).write.mode("overwrite").text(path)
  }
}
