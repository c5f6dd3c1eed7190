package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One multimodal payload: opaque bytes + mime + typed metadata. */
case class MediaCell(data: Array[Byte], mime: String, meta: Map[String, String])

/** A decoded/feature-extracted payload (stub features — see below). */
case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Int,
    byte_mean: Double, head: Array[Byte])

/** Multimodal columns (SURVEY.md §2.1 K7, builder brief): media as an
  * opaque `BinaryType` struct `{data, mime, meta}` flowing through the
  * relational engine untouched, with decode/feature-extraction as a typed
  * `mapPartitions` stage.
  *
  * STUB NOTE: the image/audio codecs aren't in this container, so
  * [[decodeFeatures]] runs a clearly-marked deterministic fake (byte stats
  * over the payload) in place of a real decoder. The Spark-side plumbing —
  * struct schema, binary encoders, per-partition batch iteration, feature
  * schema — is real and is what a production decoder would plug into.
  */
object Multimodal {

  /** Wrap documents as media cells: payload = UTF-8 bytes of the text
    * (stand-in for image/audio bytes), mime keyed off the source, meta as
    * a typed string map.
    */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      struct(
        encode(col("text"), "UTF-8").as("data"),
        when(pmod(col("doc_id"), lit(3)) === 0, "image/png")
          .when(pmod(col("doc_id"), lit(3)) === 1, "audio/wav")
          .otherwise("video/mp4").as("mime"),
        map(
          lit("lang"), col("lang"),
          lit("n_chars"), col("n_chars").cast("string")).as("meta"))
        .as("media"))

  /** Per-partition decode/feature-extract over the opaque payloads.
    * Iterates cells in partition-sized batches exactly as a codec UDF
    * would; the feature computation is the deterministic stub.
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media
      .select(
        col("doc_id"),
        col("media.data").as("data"),
        col("media.mime").as("mime"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { cells =>
        cells.map { case (id, bytes, mime) =>
          // ---- STUB: real impl would decode `bytes` with a codec here ----
          val mean =
            if (bytes.isEmpty) 0.0
            else bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / bytes.length
          MediaFeatures(id, mime, bytes.length, mean, bytes.take(4))
        }
      }
  }
}
