package graft.sources

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}

import scala.reflect.runtime.universe.TypeTag

/** Typed ORC ingestion — the columnar sibling of [[TypedCsv]] /
  * [[TypedJsonl]] for the other splittable format a lake actually
  * contains: the case-class encoder supplies the expected schema, so
  * column pruning and predicate pushdown reach Spark's vectorized ORC
  * reader, and a file whose physical schema drifted from the contract
  * fails loudly at read time instead of silently reshaping downstream.
  */
object TypedOrc {

  /** Read `path` as a Dataset[T]; columns are matched by NAME against
    * the derived schema (ORC files carry their own schema — positional
    * matching would silently mis-bind reordered columns). */
  def read[T <: Product: TypeTag](spark: SparkSession, path: String): Dataset[T] = {
    implicit val enc: Encoder[T] = Encoders.product[T]
    spark.read
      .schema(enc.schema)
      .orc(path)
      .as[T]
  }
}
