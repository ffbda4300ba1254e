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

  // ---- real JDK-codec decode path ------------------------------------

  /** Expected image stats straight from the pixel FORMULA — never from
    * the encoder's bytes, so the test pins the whole encode -> platform
    * codec -> pixel-read round trip. */
  private def expectedImage(id: Long): (Long, Long, Long, Long, Long) = {
    val w = 4 + (id % 5).toInt; val h = 3 + (id % 4).toInt
    var s0 = 0L; var s1 = 0L; var s2 = 0L
    for (y <- 0 until h; x <- 0 until w) {
      s0 += (id * 31 + x * 7 + y * 13) % 256
      s1 += (id * 17 + x * 11 + y * 5) % 256
      s2 += (y.toLong * w + x + 1) * ((id * 23 + x * 3 + y * 19) % 256)
    }
    (w.toLong, h.toLong, s0, s1, s2)
  }

  private def expectedAudio(id: Long): (Long, Long, Long, Long) = {
    val n = 40 + (id % 25).toInt
    var s0 = 0L; var s1 = 0L; var s2 = 0L
    for (i <- 0 until n) {
      val v = (id * 7919 + i * 104729L) % 65536 - 32768
      s0 += v; s1 += math.abs(v); s2 += (i + 1).toLong * v
    }
    (n.toLong, s0, s1, s2)
  }

  test("decodeFeatures: BMP pixels decoded by javax.imageio match the " +
      "generation formula, including the position-weighted sum") {
    val ids = Seq(0L, 3L, 6L, 9L, 12L) // every width mod-4 padding class
    val out = Multimodal.decodeFeatures(
      Multimodal.syntheticMedia(docsDfIds(ids)))
      .collect().map(r => r.getLong(0) -> r).toMap
    ids.foreach { id =>
      val (w, h, s0, s1, s2) = expectedImage(id)
      val r = out(id)
      assert(r.getString(1) == "image", s"doc $id kind")
      assert(r.getLong(2) == w && r.getLong(3) == h, s"doc $id dims")
      assert(r.getLong(4) == w * h, s"doc $id n_units")
      assert(r.getLong(5) == s0 && r.getLong(6) == s1 &&
        r.getLong(7) == s2, s"doc $id sums")
    }
  }

  test("decodeFeatures: PNG pixels survive the encode->zlib->decode " +
      "round trip and match the generation formula") {
    val ids = Seq(0L, 1L, 2L, 7L, 29L) // several (w, h) classes
    val out = Multimodal.decodeFeatures(
      Multimodal.syntheticPngMedia(docsDfIds(ids)))
      .collect().map(r => r.getLong(0) -> r).toMap
    ids.foreach { id =>
      val w = 3 + (id % 6); val h = 2 + (id % 5)
      var s0 = 0L; var s1 = 0L; var s2 = 0L
      for (y <- 0L until h; x <- 0L until w) {
        s0 += (id * 29 + x * 5 + y * 17) % 256
        s1 += (id * 13 + x * 19 + y * 7) % 256
        s2 += (y * w + x + 1) * ((id * 37 + x * 2 + y * 11) % 256)
      }
      val r = out(id)
      assert(r.getString(1) == "image", s"doc $id kind")
      assert(r.getLong(2) == w && r.getLong(3) == h, s"doc $id dims")
      assert(r.getLong(4) == w * h, s"doc $id n_units")
      assert(r.getLong(5) == s0 && r.getLong(6) == s1 &&
        r.getLong(7) == s2, s"doc $id sums")
    }
  }

  test("decodeFeatures: WAV samples decoded by javax.sound.sampled " +
      "match the generation formula in order") {
    val ids = Seq(1L, 4L, 7L, 25L)
    val out = Multimodal.decodeFeatures(
      Multimodal.syntheticMedia(docsDfIds(ids)))
      .collect().map(r => r.getLong(0) -> r).toMap
    ids.foreach { id =>
      val (n, s0, s1, s2) = expectedAudio(id)
      val r = out(id)
      assert(r.getString(1) == "audio", s"doc $id kind")
      assert(r.isNullAt(2) && r.isNullAt(3), s"doc $id dims null")
      assert(r.getLong(4) == n, s"doc $id n_units")
      assert(r.getLong(5) == s0 && r.getLong(6) == s1 &&
        r.getLong(7) == s2, s"doc $id sums")
    }
  }

  test("decodeFeatures: unknown media types take the stub arm; empty " +
      "payloads yield the empty kind") {
    val out = Multimodal.decodeFeatures(
      Multimodal.syntheticMedia(docsDfIds(Seq(2L, 5L))))
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 2's payload is its UTF-8 text; stub lanes are byte sums
    // mod 1000
    val bytes = "doc 2 text".getBytes("UTF-8")
    assert(out(2L).getString(1) == "stub")
    assert(out(2L).getLong(4) == bytes.length.toLong)
    val lanes = new Array[Long](Multimodal.FeatureDim)
    bytes.zipWithIndex.foreach { case (b, i) =>
      lanes(i % Multimodal.FeatureDim) += (b & 0xff)
    }
    assert(out(2L).getLong(5) == lanes(0) % 1000)
    assert(out(2L).getLong(6) == lanes(1) % 1000)
    assert(out(2L).getLong(7) == lanes(2) % 1000)
    // a null text in the stub arm becomes an empty payload
    assert(out(5L).getString(1) == "empty")
    assert(out(5L).getLong(4) == 0L)
  }

  test("resizeImages: identity dims reproduce the decode statistics; " +
    "sampleAudioFrames every=1 reproduces full decode with ordinal weights") {
    // id 17: PNG dims w = 3 + 17%6 = 8, h = 2 + 17%5 = 4 — resizing
    // to (8, 4) is the identity mapping, so every statistic matches
    // the straight decode row
    val docs = docsDfIds(Seq(17L))
    val media = Multimodal.syntheticPngMedia(docs)
    val dec = Multimodal.decodeFeatures(media).collect().head
    val rez = Multimodal.resizeImages(media, outW = 8, outH = 4)
      .collect().head
    for (i <- 2 to 7)
      assert(rez.get(i) == dec.get(i), s"field $i differs: $rez vs $dec")
    // a genuine downscale touches fewer units and stays decodable
    val small = Multimodal.resizeImages(media, outW = 2, outH = 2)
      .collect().head
    assert(small.getLong(4) == 4L && small.getString(1) == "image")
    // audio: every=1 keeps all samples; ordinal weight == (i+1) so it
    // equals the decode row's position-weighted sum
    val aud = Multimodal.syntheticMedia(docsDfIds(Seq(1L)))
    val adec = Multimodal.decodeFeatures(aud)
      .collect().find(_.getString(1) == "audio").get
    val all = Multimodal.sampleAudioFrames(aud, every = 1).collect().head
    assert(all.getLong(2) == adec.getLong(4)) // n_units
    assert(all.getLong(3) == adec.getLong(5)) // s0
    assert(all.getLong(4) == adec.getLong(6)) // s1
    assert(all.getLong(5) == adec.getLong(7)) // s2
    // every=4 keeps ceil(n/4) samples
    val q = Multimodal.sampleAudioFrames(aud, every = 4).collect().head
    assert(q.getLong(2) == (adec.getLong(4) + 3) / 4)
  }

  test("imageHash: well-formed bands; imageDupPairs finds identical " +
    "images and nothing else") {
    // the PNG formulas depend on doc_id only through mod 6/5/256, so
    // ids congruent mod lcm(30, 256) = 3840 carry IDENTICAL images:
    // (1, 3841) must pair at Hamming 0; id 7 pairs with nothing
    val media = Multimodal.syntheticPngMedia(
      docsDfIds(Seq(1L, 7L, 3841L)))
    val h = Multimodal.imageHash(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(h.size == 3 && h.values.forall(_.getString(1) == "image"))
    h.values.foreach { r =>
      val nSet = r.getAs[Long]("n_set")
      assert(nSet > 0L && nSet < 64L) // mean-threshold: never all/none
      (2 to 5).foreach(i =>
        assert(r.getLong(i) >= 0L && r.getLong(i) <= 0xffffL))
    }
    assert((2 to 6).forall(i => h(1L).getLong(i) == h(3841L).getLong(i)))
    val pairs = Multimodal.imageDupPairs(media).collect()
    assert(pairs.length == 1)
    assert(pairs(0).getLong(0) == 1L && pairs(0).getLong(1) == 3841L)
    assert(pairs(0).getAs[Long]("hamming") == 0L)
  }

  test("audioHash: identical streams share a fingerprint; " +
    "audioDupPairs finds exactly them") {
    import org.apache.spark.sql.functions.col
    // ids 1 and 4 are the audio arm (id % 3 == 1); re-id the same
    // payloads +1000 — each original must pair with its copy and
    // (16-bit hash space, two independent streams) nothing else
    val a = Multimodal.syntheticMedia(docsDfIds(Seq(1L, 4L)))
      .where(col("media_type").startsWith("audio/"))
    val media = a.unionByName(a.withColumn("doc_id", col("doc_id") + 1000L))
    val h = Multimodal.audioHash(media).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("h")).toMap
    assert(h(1L) == h(1001L) && h(4L) == h(1004L))
    val pairs = Multimodal.audioDupPairs(media).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 1001L), (4L, 1004L)))
  }

  /** Docs frame with the given ids: text "doc <id> text" except id 5,
    * which carries a null text (the empty-payload arm). */
  private def docsDfIds(ids: Seq[Long]) = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("source", StringType),
      StructField("n_chars", LongType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(ids.map(id =>
        Row(id, if (id == 5L) null else s"doc $id text", "en", "web",
          10L))),
      schema)
  }
}
