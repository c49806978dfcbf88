package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.7 `multimodal_meta`).
  *
  * Media payloads are opaque `binary` columns with a typed metadata struct —
  * the schema/partitioning/batching layer is real; the codec itself is a
  * clearly-marked deterministic stub (no image/audio libraries in this
  * environment). Swapping `decodeStub` for a real decoder keeps every plan
  * shape unchanged.
  */
object Multimodal {

  case class MediaMeta(width: Int, height: Int, channels: Int, format: String)
  case class MediaRecord(media_id: Long, payload: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(media_id: Long, payload_len: Int, first_byte: Int,
                           width: Int, height: Int, brightness: Double)

  /** Attach a binary payload + typed metadata to a text corpus (stand-in for
    * reading real media files; schema and partitioning are what matter).
    */
  def asMediaTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("payload"),
      struct(
        (length(col(textCol)) % 640).cast("int").as("width"),
        ((col(idCol) * 37) % 480).cast("int").as("height"),
        lit(3).as("channels"),
        lit("raw").as("format")).as("meta"))

  /** STUB decoder — deterministic fake features from the payload bytes.
    * Real implementation would decode the codec here (per-partition batch,
    * same signature); everything upstream/downstream of this call is
    * production plumbing.
    */
  def decodeStub(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map { r =>
        val len = r.payload.length
        val first = if (len > 0) r.payload(0) & 0xFF else 0
        // fake "brightness": mean of the first 16 bytes (deterministic)
        val n = math.min(16, len)
        val bright =
          if (n == 0) 0.0
          else r.payload.take(n).map(b => (b & 0xFF).toDouble).sum / n
        MediaFeatures(r.media_id, len, first, r.meta.width, r.meta.height, bright)
      }
    }
  }

  /** Column-only feature extraction (codegen path used by the oracle query —
    * byte-for-byte the same features as [[decodeStub]]).
    */
  def featuresExpr(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      length(col("payload")).as("payload_len"),
      coalesce(call_function("ascii",
        col("payload").cast("string").substr(lit(1), lit(1))), lit(0)).as("first_byte"),
      col("meta.width").as("width"),
      col("meta.height").as("height"))
}
