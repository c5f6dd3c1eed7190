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

  /** "Resize" stub for image payloads: caps the payload at `maxBytes` and
    * stamps the meta map. The byte-truncation stands in for a real
    * image-scaling codec; the struct surgery (payload rewrite + meta
    * update, mime-gated) is the real pipeline shape.
    */
  def resizeImages(media: DataFrame, maxBytes: Int): DataFrame = {
    val m = col("media")
    val resized = struct(
      // ---- STUB: a real impl decodes, scales, re-encodes here ----
      expr(s"substring(media.data, 1, $maxBytes)").as("data"),
      m.getField("mime").as("mime"),
      map_concat(m.getField("meta"),
        map(lit("resized"), lit("true"))).as("meta"))
    media.withColumn("media",
      when(m.getField("mime").startsWith("image/")
        && length(m.getField("data")) > maxBytes, resized).otherwise(m))
  }

  /** Frame sampling for video payloads: split the payload into fixed-size
    * "frames" and keep every `everyNth` one, one output row per kept frame
    * (frame_idx, frame bytes). The fixed-size chunking is the stub standing
    * in for codec frame extraction; the explode-per-frame row shape,
    * mime gating, and bounded frame arrays are the real plumbing.
    */
  def frameSample(media: DataFrame, frameBytes: Int, everyNth: Int): DataFrame = {
    require(frameBytes > 0 && everyNth > 0)
    val data = col("media.data")
    val nFrames = ceil(length(data).cast("double") / frameBytes).cast("int")
    // empty-payload guard: sequence(0, -1) would infer step -1
    val frames = when(nFrames > 0,
      transform(
        sequence(lit(0), nFrames - 1),
        i => data.substr(i * frameBytes + 1, lit(frameBytes))))
      .otherwise(array().cast("array<binary>"))
    media
      .filter(col("media.mime") === "video/mp4")
      .select(
        col("doc_id"),
        posexplode(filter(frames, (_, i) => i % everyNth === 0)))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame")
      .withColumn("frame_bytes", length(col("frame")))
  }

  /** Windowed RMS over audio payloads: split the payload into fixed-size
    * windows and emit one (doc_id, win_idx, rms, n) row per window — the
    * PCM loudness-analysis shape (silence trimming, VAD pre-filters, clip
    * detection all consume exactly this surface). The byte-level RMS is
    * the stub standing in for real PCM decoding; the mime gating,
    * bounded per-row window explosion, and per-window aggregate shape are
    * the real plumbing. Codegen-friendly: higher-order `transform` +
    * `aggregate` over the split payload, no UDF.
    */
  def audioWindows(media: DataFrame, windowBytes: Int): DataFrame = {
    require(windowBytes > 0)
    val data = col("media.data")
    val nWin = ceil(length(data).cast("double") / windowBytes).cast("int")
    val wins = when(nWin > 0,
      transform(
        sequence(lit(0), nWin - 1),
        i => data.substr(i * windowBytes + 1, lit(windowBytes))))
      .otherwise(array().cast("array<binary>"))
    media
      .filter(col("media.mime").startsWith("audio/"))
      .select(col("doc_id"), posexplode(wins))
      .withColumnRenamed("pos", "win_idx")
      // ---- STUB: real impl decodes PCM samples; bytes stand in ----
      .select(
        col("doc_id"), col("win_idx"),
        round(sqrt(
          aggregate(
            transform(split_binary_bytes(col("col")), b => b * b),
            lit(0.0), (acc, x) => acc + x) /
            greatest(length(col("col")), lit(1))), 4).as("rms"),
        length(col("col")).as("n"))
  }

  /** Byte values (0-255) of a binary column as an int array — the
    * decode-free sample surface [[audioWindows]] aggregates over.
    */
  private def split_binary_bytes(bin: org.apache.spark.sql.Column) =
    transform(sequence(lit(1), length(bin)), i => unhexByte(bin, i))

  /** One payload byte as an unsigned int via substr + position — kept as a
    * named helper so the intent ("sample i of the waveform") reads.
    */
  private def unhexByte(bin: org.apache.spark.sql.Column,
      i: org.apache.spark.sql.Column) =
    conv(hex(bin.substr(i, lit(1))), 16, 10).cast("int")

  /** Media payload → dense unit embedding (dim 64): the encoder bridge
    * between the multimodal surface and the vector-dedup/ANN tier — the
    * composed shape a production pipeline runs (decode → embed →
    * sign-LSH near-dedup, see k27). Per-partition typed iteration, the
    * exact seam a real CLIP/wav2vec encoder batch would plug into.
    *
    * STUB NOTE: the "encoder" is a deterministic seeded byte-hash
    * projection (MurmurHash3 of the payload per dimension, normalized).
    * It preserves the one property the downstream contract needs and the
    * k27 oracle checks: byte-identical payloads embed identically
    * (cosine 1), distinct payloads land near-orthogonal (cosine ≈ 0 at
    * dim 64), so near-dup pairs over these embeddings ARE the exact
    * payload-dup pairs.
    */
  def embedMedia(spark: SparkSession, media: DataFrame, dim: Int = 64): DataFrame = {
    import spark.implicits._
    media
      .select(col("doc_id"), col("media.data").as("data"))
      .as[(Long, Array[Byte])]
      .mapPartitions { cells =>
        cells.map { case (id, bytes) =>
          // ---- STUB: a real encoder forward pass replaces this ----
          val raw = Array.tabulate(dim) { j =>
            scala.util.hashing.MurmurHash3.bytesHash(bytes, j).toFloat /
              Int.MaxValue.toFloat
          }
          val norm = math.sqrt(raw.foldLeft(0.0)((a, x) => a + x.toDouble * x)).toFloat
          (id, raw.map(x => if (norm == 0f) 0f else x / norm))
        }
      }
      .toDF("doc_id", "embedding")
  }

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
