package graft.sources

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}

import scala.reflect.runtime.universe.TypeTag

/** Typed CSV ingestion (SURVEY §2 #17) — the MovieLens-style case-class
  * loading the reference's tests do by hand
  * (`/root/reference/src/test/scala/com/github/jongwook/cmf/MovieLens.scala:26-31`),
  * re-expressed as `spark.read.schema(derived).csv(...).as[T]`: the
  * case-class encoder supplies the column names and types, so parsing,
  * projection, and predicate pushdown stay inside Spark's vectorized CSV
  * reader — no row-by-row parsing helpers.
  */
object TypedCsv {

  /** Read `path` as a Dataset[T]; columns are matched to the case class
    * by position against the derived schema, with header skipping on. */
  def read[T <: Product: TypeTag](
      spark: SparkSession,
      path: String,
      header: Boolean = true,
      delimiter: String = ","): Dataset[T] = {
    implicit val enc: Encoder[T] = Encoders.product[T]
    spark.read
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .schema(enc.schema)
      .csv(path)
      .as[T]
  }
}
