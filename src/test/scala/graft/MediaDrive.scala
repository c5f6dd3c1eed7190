package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal

/** Ad-hoc drive of the multimodal ops through the public API:
  * `sbt "Test/runMain graft.MediaDrive"`.
  */
object MediaDrive {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val media = Multimodal.asMedia(Tables.load(spark, TestSpark.sf, "documents"))

    val resized = Multimodal.resizeImages(media, maxBytes = 50)
    println("== resize: per-mime max payload bytes ==")
    resized.groupBy(col("media.mime")).agg(max(length(col("media.data"))))
      .orderBy("mime").show(truncate = false)

    println("== frameSample(32 bytes, every 2nd): first rows ==")
    Multimodal.frameSample(media, 32, 2).orderBy("doc_id", "frame_idx")
      .show(5, truncate = 40)
  }
}
