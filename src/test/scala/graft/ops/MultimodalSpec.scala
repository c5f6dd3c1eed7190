package graft.ops

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** K7: the multimodal struct schema and the typed decode/feature stage. */
class MultimodalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private lazy val docs = Tables.load(spark, TestSpark.sf, "documents")
  private lazy val media = Multimodal.asMedia(docs)

  test("media struct has the canonical {data BINARY, mime STRING, meta MAP} shape") {
    val mediaField = media.schema("media").dataType.asInstanceOf[StructType]
    assert(mediaField("data").dataType == BinaryType)
    assert(mediaField("mime").dataType == StringType)
    assert(mediaField("meta").dataType == MapType(StringType, StringType))
  }

  test("payload bytes survive the struct round-trip") {
    val r = media.select(col("doc_id"), col("media.data").as("d")).head()
    assert(r.getAs[Array[Byte]]("d").nonEmpty)
  }

  test("decodeFeatures (stub codec) is deterministic and batch-shaped") {
    val f1 = Multimodal.decodeFeatures(spark, media).orderBy("doc_id").collect()
    val f2 = Multimodal.decodeFeatures(spark, media).orderBy("doc_id").collect()
    assert(f1.length == media.count())
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.doc_id == b.doc_id && a.n_bytes == b.n_bytes &&
        a.byte_mean == b.byte_mean)
    }
    assert(f1.forall(f => f.n_bytes > 0 && f.byte_mean > 0 && f.head.length == 4))
  }

  test("meta map carries typed metadata") {
    val r = media.select(element_at(col("media.meta"), "lang").as("lang")).head()
    assert(Seq("de", "en", "es", "fr", "zh").contains(r.getString(0)))
  }

  test("resizeImages caps only oversized image payloads and stamps meta") {
    val resized = Multimodal.resizeImages(media, maxBytes = 50)
    val images = resized.filter(col("media.mime") === "image/png")
    assert(images.filter(length(col("media.data")) > 50).count() == 0)
    val stamped = images
      .filter(element_at(col("media.meta"), "resized") === "true").count()
    assert(stamped > 0)
    // non-image payloads untouched
    val audio = resized.filter(col("media.mime") === "audio/wav")
    assert(audio.filter(element_at(col("media.meta"), "resized").isNotNull)
      .count() == 0)
  }

  test("frameSample emits every nth fixed-size chunk of video payloads") {
    val frames = Multimodal.frameSample(media, frameBytes = 32, everyNth = 2)
    assert(frames.count() > 0)
    val r = frames.head()
    assert(r.getAs[Int]("frame_bytes") <= 32)
    // frame indices are the kept (0, 2, 4, ...) positions re-enumerated
    val perDoc = frames.groupBy("doc_id").agg(count(lit(1)).as("n"),
      max("frame_idx").as("mx")).head()
    assert(perDoc.getAs[Int]("mx") == perDoc.getAs[Long]("n").toInt - 1)
    // only video mime contributes
    val videoDocs = media.filter(col("media.mime") === "video/mp4")
      .select("doc_id").distinct().count()
    assert(frames.select("doc_id").distinct().count() == videoDocs)
  }

  test("A8: CSV sink round-trips a projection") {
    val dir = "target/scale/csv_sink"
    graft.streaming.StreamInput.deleteRecursively(java.nio.file.Paths.get(dir))
    val src = media.select(col("doc_id"), col("media.mime").as("mime"))
    src.write.option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .schema("doc_id LONG, mime STRING").csv(dir)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty)
  }

  test("audioWindows: per-window byte-RMS over audio payloads only, exact on a known payload") {
    import spark.implicits._
    val w = 4
    val out = Multimodal.audioWindows(media, w)
    // only audio mimes contribute
    val audioDocs = media.filter(col("media.mime").startsWith("audio/"))
      .select("doc_id").distinct().count()
    assert(out.select("doc_id").distinct().count() == audioDocs && audioDocs > 0)
    // per-doc window count is ceil(payload/W) and indices are dense 0..n-1
    val sizes = media.filter(col("media.mime").startsWith("audio/"))
      .select(col("doc_id"), length(col("media.data")).as("len"))
      .as[(Long, Int)].collect().toMap
    val perDoc = out.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("win_idx").as("mx"))
      .as[(Long, Long, Int)].collect()
    perDoc.foreach { case (id, n, mx) =>
      assert(n == (sizes(id) + w - 1) / w && mx == n - 1, s"doc $id")
    }
    // exact RMS on one hand-computed payload: bytes of "abcd" = 97..100
    val one = Multimodal.asMedia(
      Seq((1L, "abcd", "en", 4)).toDF("doc_id", "text", "lang", "n_chars"))
      .withColumn("media", struct(
        col("media.data").as("data"), lit("audio/wav").as("mime"),
        col("media.meta").as("meta")))
    val rms = Multimodal.audioWindows(one, 4)
      .select("rms").as[Double].collect().head
    val expected = math.sqrt((97.0*97 + 98*98 + 99*99 + 100*100) / 4)
    assert(math.abs(rms - math.rint(expected * 10000) / 10000) < 1e-9,
      s"rms $rms != $expected")
  }

  test("embedMedia (stub encoder): unit vectors, payload-determined, distinct payloads separate") {
    // the three properties the k27 media→embedding→near-dedup oracle
    // relies on: unit norm, byte-identical payloads embed identically,
    // distinct payloads land far from the 0.95 pair threshold
    val emb = Multimodal.embedMedia(spark, media)
    val rows = emb.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    assert(rows.valuesIterator.forall { v =>
      math.abs(v.foldLeft(0.0)((a, x) => a + x.toDouble * x) - 1.0) < 1e-5
    }, "embeddings must be unit-norm")
    val again = Multimodal.embedMedia(spark, media).collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    assert(rows.keySet == again.keySet &&
      rows.forall { case (k, v) => v.sameElements(again(k)) },
      "encoder must be deterministic")
    def cos(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).foldLeft(0.0)((s, p) => s + p._1.toDouble * p._2)
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val ids = rows.keySet.toSeq.sorted.take(40)
    for (a <- ids; b <- ids if a < b) {
      val c = cos(rows(a), rows(b))
      if (texts(a) == texts(b))
        assert(c > 0.9999, s"equal payloads ($a,$b) must embed identically")
      else assert(c < 0.9, s"distinct payloads ($a,$b) too close: $c")
    }
  }
}
