package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions.col

import scala.reflect.runtime.universe.TypeTag

/** Typed JSONL ingestion — the other corpus format next to
  * [[TypedCsv]]: one JSON document per line, the dominant interchange
  * shape for web-scale training corpora. The case-class encoder
  * supplies the schema up front, so Spark's JSON reader never runs its
  * sampling-based schema inference pass (a full extra scan at 100 TB)
  * and column pruning reaches the parser.
  *
  * Malformed lines are quarantined, not fatal: PERMISSIVE mode routes
  * them to a corrupt-record column, and [[readWithCorrupt]] exposes the
  * split so a pipeline can count/inspect rejects instead of silently
  * dropping them (DROPMALFORMED) or dying mid-scan (FAILFAST).
  */
object TypedJsonl {

  private val CorruptCol = "_corrupt_record"

  /** Read `path` as Dataset[T], dropping malformed lines. */
  def read[T <: Product: TypeTag](spark: SparkSession, path: String): Dataset[T] = {
    implicit val enc: Encoder[T] = Encoders.product[T]
    spark.read
      .option("mode", "DROPMALFORMED")
      .schema(enc.schema)
      .json(path)
      .as[T]
  }

  /** Read `path` keeping rejects: (well-formed rows as Dataset[T],
    * raw text of malformed lines). Spark requires the corrupt column
    * to be cached/materialized-safe: both returned frames are plain
    * projections of one PERMISSIVE scan. */
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
      .cache() // one scan; Spark forbids filtering the corrupt column on a raw scan
    val good = raw.filter(col(CorruptCol).isNull)
      .drop(CorruptCol)
      .as[T]
    val bad = raw.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("line"))
    (good, bad)
  }
}
