package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal binary-column pipeline (SURVEY §2 #30).
  *
  * Media (image/audio/video) travels as an opaque `binary` payload column
  * plus a typed metadata struct; decode / feature-extraction runs as a
  * typed `mapPartitions` over the payload bytes — the Spark-side plumbing
  * (schema, per-partition batching, JVM-side byte access) is real and the
  * partition shape is exactly what a native decoder (or a Pandas-UDF
  * analogue) would see. The decode step itself is a clearly-marked
  * deterministic STUB (this container ships no image/audio codecs): it
  * derives pseudo width/height/frame-count features from the byte stream
  * with pure integer arithmetic, which keeps the whole pipeline
  * oracle-checkable.
  */
object Multimodal {

  case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      width: Long,
      height: Long,
      n_frames: Long)

  /** Attach the opaque payload + metadata struct to a text corpus (the
    * testdata has no real media column, so documents stand in as payloads). */
  def withPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("txt").as("format"),
        octet_length(col(textCol)).cast("long").as("n_bytes")).as("meta"))

  /** STUB decoder: deterministic pseudo-features from the raw bytes.
    * A real deployment swaps this body for an actual codec; the
    * signature — bytes in, fixed-width features out, executed
    * per-partition — is the production shape. */
  def decodeStub(id: Long, payload: Array[Byte]): MediaFeatures = {
    val n = payload.length.toLong
    val first = if (payload.nonEmpty) (payload(0) & 0xff).toLong else 0L
    MediaFeatures(
      doc_id = id,
      n_bytes = n,
      width = (n * 2654435761L) % 1024L,
      height = (n * 97L + first) % 768L,
      n_frames = n % 30L + 1L)
  }

  /** Per-partition feature extraction over (id, payload) rows. */
  def extractFeatures(withPayloadDf: DataFrame): Dataset[MediaFeatures] = {
    val spark = withPayloadDf.sparkSession
    import spark.implicits._
    withPayloadDf
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it => it.map { case (id, bytes) => decodeStub(id, bytes) } }
  }
}
