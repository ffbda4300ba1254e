package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Multimodal

/** Pins the behavior of the stubbed decode path (the one registered
  * query with no oracle — mm_features is rows-only by design, so its
  * contract lives here): idempotence, null-payload safety, and the
  * exact feature <-> payload-byte relation of the stub. */
class MultimodalSpec extends SparkSpec {

  private def mediaDocs = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("source", StringType),
      StructField("n_chars", LongType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "hello world", "en", "web", 11L),
        Row(2L, null, "en", "web", 0L), // null payload
        Row(3L, "café ☃", "fr", "web", 6L))), // multibyte UTF-8
      schema)
  }

  test("extractFeatures: a null payload survives with zero features") {
    val f = Multimodal.extractFeatures(Multimodal.toMedia(mediaDocs))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(f(2L).getLong(1) == 0L)
    assert(f(2L).getSeq[Float](2).size == Multimodal.FeatureDim)
    assert(f(2L).getSeq[Float](2).forall(_ == 0f))
  }

  test("extractFeatures is deterministic (idempotent re-run)") {
    val m = Multimodal.toMedia(mediaDocs)
    val a = Multimodal.extractFeatures(m).collect().map(_.toString).sorted
    val b = Multimodal.extractFeatures(m).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("features are the mod-1000 byte-lane sums of the UTF-8 payload") {
    val f = Multimodal.extractFeatures(Multimodal.toMedia(mediaDocs))
      .collect().map(r => r.getLong(0) -> r).toMap
    Seq(1L, 3L).foreach { id =>
      val text = mediaDocs.where(col("doc_id") === id)
        .collect()(0).getString(1)
      val bytes = text.getBytes("UTF-8")
      assert(f(id).getLong(1) == bytes.length.toLong)
      val lanes = new Array[Long](Multimodal.FeatureDim)
      bytes.zipWithIndex.foreach { case (b, i) =>
        lanes(i % Multimodal.FeatureDim) += (b & 0xff)
      }
      val expect = lanes.map(v => (v % 1000).toFloat / 1000f).toSeq
      assert(f(id).getSeq[Float](2) == expect, s"doc $id")
    }
  }

  test("resizePayload emits exactly nBytes for every row, null included") {
    Multimodal.resizePayload(Multimodal.toMedia(mediaDocs), nBytes = 16)
      .collect()
      .foreach(r => assert(r.getAs[Array[Byte]]("payload").length == 16))
  }
}
