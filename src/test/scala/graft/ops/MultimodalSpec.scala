package graft.ops

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** K7: the multimodal struct schema and the typed decode/feature stage. */
class MultimodalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private lazy val media =
    Multimodal.asMedia(Tables.load(spark, TestSpark.sf, "documents"))

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
}
