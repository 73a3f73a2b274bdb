package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Avro BINARY-WIRE roundtrip over an in-plan payload column — the
  * schema-first serialization exercise for pipelines whose exchange
  * format is Avro-encoded messages rather than parquet files (the
  * spark-avro DataSource is not on this classpath; the wire format
  * itself, Avro 1.12's `BinaryEncoder`/`BinaryDecoder`, is). Encoding
  * and decoding both happen per partition against the vendored Avro
  * runtime — a foreign implementation of the zigzag-varint spec — and
  * the payload LENGTH is independently derivable from the public spec
  * (zigzag-varint longs, length-prefixed UTF-8 strings), which is what
  * the DuckDB oracle recomputes. */
object AvroCodec {

  private val schemaJson =
    """{"type":"record","name":"Doc","fields":[
      |{"name":"id","type":"long"},
      |{"name":"lang","type":"string"},
      |{"name":"n","type":"long"}]}""".stripMargin

  /** Encode (doc_id, lang, n_chars) rows to Avro binary and decode
    * them back in the same pass; emits the decoded fields plus the
    * wire size so a mismatch in EITHER direction surfaces. */
  def roundtrip(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("lang"),
        col("n_chars").cast("long"))
      .as[(Long, String, Long)]
      .mapPartitions { it =>
        val schema = new Schema.Parser().parse(schemaJson)
        val writer = new GenericDatumWriter[GenericRecord](schema)
        val reader = new GenericDatumReader[GenericRecord](schema)
        it.map { case (id, lang, n) =>
          val rec = new GenericData.Record(schema)
          rec.put("id", id)
          rec.put("lang", lang)
          rec.put("n", n)
          val out = new java.io.ByteArrayOutputStream()
          val enc = EncoderFactory.get().binaryEncoder(out, null)
          writer.write(rec, enc)
          enc.flush()
          val bytes = out.toByteArray
          val dec = DecoderFactory.get().binaryDecoder(bytes, null)
          val back = reader.read(null, dec)
          (back.get("id").asInstanceOf[Long], back.get("lang").toString,
            back.get("n").asInstanceOf[Long], bytes.length.toLong)
        }
      }
      .toDF("doc_id", "lang", "n_chars", "payload_bytes")
  }
}
