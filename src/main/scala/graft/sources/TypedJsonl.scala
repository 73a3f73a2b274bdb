package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, struct, to_json}

import scala.reflect.runtime.universe.TypeTag

/** Typed JSONL ingestion — the other corpus format next to
  * [[TypedCsv]]: one JSON document per line, the dominant interchange
  * shape for web-scale training corpora. The case-class encoder
  * supplies the schema up front, so Spark's JSON reader never runs its
  * sampling-based schema inference pass (a full extra scan at 100 TB)
  * and column pruning reaches the parser.
  *
  * Malformed input is quarantined, not fatal — and "malformed" covers
  * BOTH failure shapes: JSON-syntax errors (PERMISSIVE routes them to a
  * corrupt-record column) and syntactically-valid lines missing a
  * required field (the parser keeps those as nulls, which would crash
  * the non-nullable case-class encoder mid-scan; they are classified by
  * a null-check over every field the encoder marks non-nullable).
  */
object TypedJsonl {

  private val CorruptCol = "_corrupt_record"

  private def requiredCols[T <: Product](enc: Encoder[T]): Seq[Column] =
    enc.schema.fields.filter(!_.nullable).map(f => col(f.name)).toSeq

  /** Read `path` as Dataset[T], dropping malformed lines — both
    * syntax-level rejects (DROPMALFORMED) and rows whose required
    * fields parsed to null. */
  def read[T <: Product: TypeTag](spark: SparkSession, path: String): Dataset[T] = {
    implicit val enc: Encoder[T] = Encoders.product[T]
    val df = spark.read
      .option("mode", "DROPMALFORMED")
      .schema(enc.schema)
      .json(path)
    requiredCols(enc).foldLeft(df)((d, c) => d.filter(c.isNotNull)).as[T]
  }

  /** Read `path` keeping rejects: (well-formed rows as Dataset[T], one
    * string per rejected line — the raw text for syntax failures, the
    * re-serialized parse for null-required-field rows, whose raw text
    * the parser does not retain). Both frames are projections of one
    * PERMISSIVE scan plan; no caching, so repeated ingestion calls pin
    * nothing in executor storage (consuming both sides costs two file
    * passes — cache at the call site if that matters). */
  def readWithCorrupt[T <: Product: TypeTag](
      spark: SparkSession,
      path: String): (Dataset[T], DataFrame) = {
    implicit val enc: Encoder[T] = Encoders.product[T]
    val schema = enc.schema.add(CorruptCol, "string")
    val raw = spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .schema(schema)
      .json(path)
    // Referencing the data columns here (not only the corrupt column)
    // keeps the plan outside Spark's corrupt-record-only query
    // restriction, so no materialization is needed.
    val isBad = requiredCols(enc)
      .foldLeft(col(CorruptCol).isNotNull)((acc, c) => acc || c.isNull)
    val good = raw.filter(!isBad).drop(CorruptCol).as[T]
    val bad = raw.filter(isBad)
      .select(coalesce(col(CorruptCol),
        to_json(struct(enc.schema.fieldNames.map(col).toSeq: _*))).as("line"))
    (good, bad)
  }
}
