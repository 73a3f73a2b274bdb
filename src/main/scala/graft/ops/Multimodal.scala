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

  /** STUB frame sampler: `n` evenly-spaced byte windows standing in for
    * decoded video frames. The Spark shape is the production one — one
    * payload row fans out to (doc_id, frame_idx, frame: binary) rows from
    * a per-partition iterator, so a real decoder drops in by replacing
    * the slice with codec output. Frame count never exceeds the payload's
    * pseudo frame count ([[decodeStub]]). */
  def sampleFrames(withPayloadDf: DataFrame, n: Int): DataFrame = {
    require(n > 0)
    val spark = withPayloadDf.sparkSession
    import spark.implicits._
    withPayloadDf
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val frames = math.min(n.toLong, decodeStub(id, bytes).n_frames).toInt
          val len = math.max(bytes.length / math.max(frames, 1), 1)
          (0 until frames).map { f =>
            val from = math.min(f * len, math.max(bytes.length - 1, 0))
            val until = math.min(from + len, bytes.length)
            (id, f, java.util.Arrays.copyOfRange(bytes, from, until))
          }
        }
      }
      .toDF("doc_id", "frame_idx", "frame")
  }

  /** STUB resize: replace each payload with a deterministic `w`·`h`/64
    * byte digest-stream (a real implementation swaps the loop body for a
    * scaler); metadata struct is rewritten to the new geometry — the
    * schema-evolution half is the part Spark owns either way. */
  def resize(withPayloadDf: DataFrame, w: Int, h: Int): DataFrame = {
    require(w > 0 && h > 0)
    val spark = withPayloadDf.sparkSession
    import spark.implicits._
    val outLen = math.max(w * h / 64, 1)
    withPayloadDf
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val out = new Array[Byte](outLen)
          var state = id ^ 0x9E3779B97F4A7C15L
          var i = 0
          while (i < outLen) {
            val src = if (bytes.nonEmpty) bytes(((i.toLong * bytes.length) / outLen).toInt) else 0
            state = state * 6364136223846793005L + src
            out(i) = (state >>> 56).toByte
            i += 1
          }
          (id, out)
        }
      }
      .toDF("doc_id", "payload")
      .withColumn("meta", struct(
        lit("resized").as("format"),
        lit(outLen.toLong).as("n_bytes"),
        lit(w.toLong).as("width"),
        lit(h.toLong).as("height")))
  }
}
