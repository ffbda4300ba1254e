package graft.operators

import graft.operators.Stage.PinOps

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` payloads with
  * typed metadata, processed in partition-sized batches.
  *
  * The decode step is a STUB — image/audio codecs are not present in
  * this environment, so [[featureStub]] is a deterministic fake. What
  * is real (and what matters for the engine): the schema contract
  * (binary payload + metadata struct), the batch-iterator execution
  * shape (`mapPartitions` — the Scala analog of `mapInPandas` batches:
  * one iterator per partition, constant memory), and the partitioning
  * (payloads never shuffle; features derive in place).
  */
object Multimodal extends MmIndexOps {

  /** JDK ImageIO defaults to a FILE-backed stream cache: one temp
    * file is created and deleted in java.io.tmpdir PER decoded (and
    * encoded) image, which at corpus scale turns every decode into
    * /tmp metadata traffic — measured on the bench as media serve
    * rows swinging ~2x with /tmp residue while their plan metrics
    * stayed identical. The payloads here are in-memory byte arrays,
    * so the cache buys nothing; keep it in memory. The setter is
    * JVM-global and idempotent, ensured once per executor JVM on
    * first use (the helper is called inside the mapPartitions
    * closures, so a real cluster's executors each apply it). */
  private object ImageIOTuning {
    @volatile private var done = false
    def ensure(): Unit = if (!done) {
      javax.imageio.ImageIO.setUseCache(false)
      done = true
    }
  }

  /** In-memory image decode via the platform codecs (see
    * [[ImageIOTuning]]); null for an undecodable payload, matching
    * `ImageIO.read`. */
  private[operators] def decodeImage(bytes: Array[Byte])
      : java.awt.image.BufferedImage = {
    ImageIOTuning.ensure()
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
  }

  /** Wrap a text corpus as media rows: (doc_id, media_type,
    * payload: binary, meta struct) — the multimodal data model. */
  def toMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      lit("text/plain").as("media_type"),
      col("text").cast("binary").as("payload"),
      struct(
        col("source"),
        col("lang"),
        // byte length of the UTF-8 payload (length() on binary counts
        // bytes; on the string it would count characters)
        length(col("text").cast("binary")).cast("long").as("n_bytes"))
        .as("meta"))

  /** Width of the stub feature vector — public so registered queries
    * that flatten the vector to scalar columns cannot silently drift
    * (getItem past the array end yields NULL, not an error). */
  val FeatureDim = 8

  /** The stub's exact-integer core: per-lane byte sums mod 1000. Split
    * out so the unknown-format arm of [[decodeFeatures]] can emit the
    * lanes as exact longs without a float round trip. */
  private[operators] def stubMills(bytes: Array[Byte]): Array[Long] = {
    val acc = new Array[Long](FeatureDim)
    var i = 0
    while (i < bytes.length) {
      acc(i % FeatureDim) += (bytes(i) & 0xff)
      i += 1
    }
    acc.map(_ % 1000)
  }

  /** STUB decode/feature-extract — retained as the UNKNOWN-format arm
    * (media types with no JDK codec; see [[decodeFeatures]] for the
    * real BMP/WAV decodes). This deterministic fake folds payload
    * bytes into a fixed-size float vector so the full pipeline
    * (schema, batching, downstream similarity) is exercised
    * end-to-end. */
  private[operators] def featureStub(bytes: Array[Byte]): Array[Float] =
    stubMills(bytes).map(_.toFloat / 1000f)

  private val featuresSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("feature", ArrayType(FloatType))))

  /** Batch feature extraction over media rows via mapPartitions: one
    * iterator per partition (never materializes a partition in memory),
    * binary in, feature vector out. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featuresSchema)
    media.select(col("doc_id"), col("payload"))
      .mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          // a null payload (null source text) must not kill the task
          val bytes = Option(r.getAs[Array[Byte]]("payload"))
            .getOrElse(Array.emptyByteArray)
          Row(r.getLong(0), bytes.length.toLong, featureStub(bytes))
        }
      }(enc)
  }

  // --------------------------------------------------------------------
  // REAL decode path: JDK-only codecs. The "no codec libs in this
  // environment" constraint only covers NATIVE codecs — the JDK itself
  // ships javax.imageio (BMP/PNG) and javax.sound.sampled (WAV), so
  // the decode step is genuinely real for those formats: the payload
  // bytes are parsed by the platform codec, and the features are
  // statistics of the DECODED pixels/samples. The synthetic payloads
  // below derive every pixel/sample from (doc_id, position) by pure
  // integer formulas, so an oracle can replay the statistics from the
  // formulas WITHOUT a codec — any misparse (row padding, bottom-up
  // row order, channel order, endianness) breaks the match.
  // --------------------------------------------------------------------

  /** Deterministic 24-bit BMP: width 4 + id%5, height 3 + id%4 (widths
    * 4..8 exercise the 4-byte row-padding rule: w*3 mod 4 cycles every
    * value). File rows are bottom-up per the BMP spec; the pixel at
    * IMAGE coordinates (x, y), y = 0 the top row, has channels
    *   R = (id*31 + x*7  + y*13) % 256
    *   G = (id*17 + x*11 + y*5)  % 256
    *   B = (id*23 + x*3  + y*19) % 256. */
  private[operators] def bmpBytes(id: Long): Array[Byte] = {
    require(id >= 0, s"doc id must be non-negative, got $id")
    val w = 4 + (id % 5).toInt
    val h = 3 + (id % 4).toInt
    val rowBytes = w * 3
    val pad = (4 - rowBytes % 4) % 4
    val imgSize = (rowBytes + pad) * h
    val buf = java.nio.ByteBuffer.allocate(54 + imgSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + imgSize)
      .putShort(0).putShort(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(imgSize).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    var fy = 0
    while (fy < h) {
      val y = h - 1 - fy // file rows bottom-up
      var x = 0
      while (x < w) {
        buf.put(((id * 23 + x * 3 + y * 19) % 256).toByte) // B
        buf.put(((id * 17 + x * 11 + y * 5) % 256).toByte) // G
        buf.put(((id * 31 + x * 7 + y * 13) % 256).toByte) // R
        x += 1
      }
      var p = 0
      while (p < pad) { buf.put(0.toByte); p += 1 }
      fy += 1
    }
    buf.array()
  }

  /** Deterministic RGB PNG: width 3 + id%6, height 2 + id%5; the
    * pixel at (x, y) has channels
    *   R = (id*29 + x*5  + y*17) % 256
    *   G = (id*13 + x*19 + y*7)  % 256
    *   B = (id*37 + x*2  + y*11) % 256.
    * The bytes are produced by the JDK's own PNG ENCODER
    * (javax.imageio) — zlib-compressed IDAT, nothing hand-rolled —
    * and the decode side reads them back through the same platform
    * codec; the oracle replays the statistics from the formulas, so
    * the round trip through real compression is what's verified. */
  private[operators] def pngBytes(id: Long): Array[Byte] = {
    require(id >= 0, s"doc id must be non-negative, got $id")
    val w = 3 + (id % 6).toInt
    val h = 2 + (id % 5).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((id * 29 + x * 5 + y * 17) % 256).toInt
        val g = ((id * 13 + x * 19 + y * 7) % 256).toInt
        val b = ((id * 37 + x * 2 + y * 11) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    ImageIOTuning.ensure() // in-memory encode, no temp-file cache
    require(javax.imageio.ImageIO.write(img, "png", out),
      "JDK PNG writer unavailable")
    out.toByteArray
  }

  /** All-PNG media frame over the documents table — the [[syntheticMedia]]
    * shape with every row carrying a real PNG payload (the BMP/WAV/stub
    * arm split keys on doc_id % 3 and is pinned by its own oracle; this
    * frame exercises the PNG decode arm on every doc). */
  def syntheticPngMedia(docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    docs.select(col("doc_id"))
      .mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          val id = r.getLong(0)
          Row(id, "image/png", pngBytes(id))
        }
      }(enc)
  }

  /** Deterministic PCM16 mono WAV at 8 kHz: 40 + id%25 samples,
    * sample(i) = (id*7919 + i*104729) % 65536 - 32768 (signed 16-bit,
    * little-endian per the WAV spec). */
  private[operators] def wavBytes(id: Long): Array[Byte] = {
    require(id >= 0, s"doc id must be non-negative, got $id")
    val n = 40 + (id % 25).toInt
    val dataLen = n * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1)
      .putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) {
      buf.putShort((((id * 7919 + i * 104729L) % 65536) - 32768).toShort)
      i += 1
    }
    buf.array()
  }

  private val mediaSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media_type", StringType),
    StructField("payload", BinaryType)))

  /** Synthetic media corpus over the documents table: doc_id mod 3
    * picks the arm — 0 a real BMP image, 1 a real WAV clip, 2 the
    * doc's UTF-8 text as an unknown media type (the stub arm). Payload
    * construction is imperative byte assembly, so it runs in the
    * sanctioned mapPartitions batch-iterator shape like
    * [[extractFeatures]]; payloads are built in place and never
    * shuffle. */
  def syntheticMedia(docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    docs.select(col("doc_id"), col("text"))
      .mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          val id = r.getLong(0)
          (id % 3) match {
            case 0 => Row(id, "image/bmp", bmpBytes(id))
            case 1 => Row(id, "audio/wav", wavBytes(id))
            case _ => Row(id, "text/plain",
              Option(r.getString(1)).map(_.getBytes("UTF-8"))
                .getOrElse(Array.emptyByteArray))
          }
        }
      }(enc)
  }

  private val decodeSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("kind", StringType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("n_units", LongType),
    StructField("s0", LongType),
    StructField("s1", LongType),
    StructField("s2", LongType)))

  /** Format-agnostic image decode: javax.imageio sniffs the container
    * (BMP and PNG readers both ship in the JDK) and the statistics
    * are of the DECODED pixels. */
  private def decodeImageRow(id: Long, bytes: Array[Byte]): Row = {
    val img = decodeImage(bytes)
    if (img == null) Row(id, "decode_error", null, null, 0L, 0L, 0L, 0L)
    else {
      val w = img.getWidth
      val h = img.getHeight
      var s0 = 0L; var s1 = 0L; var s2 = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          s0 += (rgb >> 16) & 0xff
          s1 += (rgb >> 8) & 0xff
          // position-weighted blue sum: orientation- and
          // padding-sensitive, unlike a plain channel sum (a
          // vertically-flipped or misaligned decode still sums to the
          // same pixel multiset)
          s2 += (y.toLong * w + x + 1) * (rgb & 0xff)
          x += 1
        }
        y += 1
      }
      Row(id, "image", w.toLong, h.toLong, w.toLong * h, s0, s1, s2)
    }
  }

  private def decodeWavRow(id: Long, bytes: Array[Byte]): Row = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val fmt = ais.getFormat
      require(!fmt.isBigEndian && fmt.getSampleSizeInBits == 16 &&
        fmt.getChannels == 1,
        s"unexpected WAV format $fmt — the decode below parses " +
          "little-endian 16-bit mono PCM")
      val data = ais.readAllBytes()
      val n = data.length / 2
      var s0 = 0L; var s1 = 0L; var s2 = 0L
      var i = 0
      while (i < n) {
        // hi byte sign-extends (byte -> int), lo is unsigned
        val v = (data(2 * i + 1).toInt << 8) | (data(2 * i) & 0xff)
        s0 += v
        s1 += math.abs(v)
        // position-weighted sum pins sample ORDER, not just the
        // multiset (an endianness or offset misparse breaks it)
        s2 += (i + 1).toLong * v
        i += 1
      }
      Row(id, "audio", null, null, n.toLong, s0, s1, s2)
    } finally ais.close()
  }

  /** REAL decode/feature-extract over media rows, dispatched by media
    * type: BMP/PNG via javax.imageio (decoded pixel statistics: R-sum,
    * G-sum, position-weighted B-sum), WAV via javax.sound.sampled
    * (decoded sample statistics: sum, abs-sum, position-weighted sum),
    * anything else through [[featureStub]]'s integer lanes (the
    * unknown-format arm — a real deployment plugs its native codec in
    * here). Same execution shape as [[extractFeatures]]: one iterator
    * per partition, payload bytes never shuffle, features derive in
    * place. An empty or null payload yields the `empty` kind rather
    * than killing the task. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(decodeSchema)
    media.select(col("doc_id"), col("media_type"), col("payload"))
      .mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          val id = r.getLong(0)
          // positional access: a row arriving from a chained
          // mapPartitions (e.g. syntheticMedia) is schema-less
          val bytes = Option(r.getAs[Array[Byte]](2))
            .getOrElse(Array.emptyByteArray)
          if (bytes.isEmpty) Row(id, "empty", null, null, 0L, 0L, 0L, 0L)
          else r.getString(1) match {
            case "image/bmp" | "image/png" => decodeImageRow(id, bytes)
            case "audio/wav" => decodeWavRow(id, bytes)
            case _ =>
              val m = stubMills(bytes)
              Row(id, "stub", null, null, bytes.length.toLong,
                m(0), m(1), m(2))
          }
        }
      }(enc)
  }

  /** REAL nearest-neighbor image resize to a fixed (outW, outH) — the
    * vision-preprocessing normalization every multimodal training
    * pipeline runs before batching (models take one input
    * resolution): decode via javax.imageio, then target pixel (x, y)
    * samples source pixel (x*w div outW, y*h div outH) — an INTEGER
    * mapping, so the resized-raster statistics replay codec-free from
    * the payload formulas (the mm_resize oracle). Emits the
    * [[decodeFeatures]] statistic shape over the RESIZED raster;
    * non-image rows filter out (resize is an image transform); bytes
    * never shuffle, output is 8 scalars per row. */
  def resizeImages(media: DataFrame, outW: Int = 8,
      outH: Int = 8): DataFrame = {
    require(outW >= 1 && outH >= 1,
      s"output dims must be positive, got ${outW}x$outH")
    val enc = org.apache.spark.sql.Encoders.row(decodeSchema)
    media.select(col("doc_id"), col("media_type"), col("payload"))
      .where(col("media_type").startsWith("image/"))
      .mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          val id = r.getLong(0)
          val bytes = Option(r.getAs[Array[Byte]](2))
            .getOrElse(Array.emptyByteArray)
          val img = if (bytes.isEmpty) null
            else decodeImage(bytes)
          if (img == null)
            Row(id, "decode_error", null, null, 0L, 0L, 0L, 0L)
          else {
            val w = img.getWidth
            val h = img.getHeight
            var s0 = 0L; var s1 = 0L; var s2 = 0L
            var y = 0
            while (y < outH) {
              val sy = y * h / outH
              var x = 0
              while (x < outW) {
                val sx = x * w / outW
                val rgb = img.getRGB(sx, sy)
                s0 += (rgb >> 16) & 0xff
                s1 += (rgb >> 8) & 0xff
                // position-weighted blue sum over the TARGET raster:
                // pins the resize mapping, not just the sampled
                // pixel multiset
                s2 += (y.toLong * outW + x + 1) * (rgb & 0xff)
                x += 1
              }
              y += 1
            }
            Row(id, "image", outW.toLong, outH.toLong,
              outW.toLong * outH, s0, s1, s2)
          }
        }
      }(enc)
  }

  private val imageHashSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("kind", StringType),
    StructField("b0", LongType),
    StructField("b1", LongType),
    StructField("b2", LongType),
    StructField("b3", LongType),
    StructField("n_set", LongType)))

  /** Perceptual average-hash (aHash) of every image payload — the
    * image-modality member of the dedup family: decode, nearest-
    * neighbor map to an 8x8 raster ([[resizeImages]]' integer
    * mapping), integer-gray each target pixel ((r+g+b) div 3), and
    * set bit j = y*8+x when gray exceeds the integer mean. The 64
    * bits surface as FOUR 16-bit band values (b0..b3, rows 0-1 /
    * 2-3 / 4-5 / 6-7) instead of one 64-bit word: no sign-bit
    * overflow in either engine, and the bands are exactly the LSH
    * blocking key [[imageDupPairs]] joins on. All arithmetic is
    * integer (floor division only, every operand non-negative), so
    * the oracle replays hashes from the payload formulas codec-free.
    * Pure per-row decode — no shuffle. */
  def imageHash(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(imageHashSchema)
    media.select(col("doc_id"), col("media_type"), col("payload"))
      .where(col("media_type").startsWith("image/"))
      .mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          val id = r.getLong(0)
          val bytes = Option(r.getAs[Array[Byte]](2))
            .getOrElse(Array.emptyByteArray)
          val img = if (bytes.isEmpty) null
            else decodeImage(bytes)
          if (img == null) Row(id, "decode_error", null, null, null,
            null, 0L)
          else {
            val w = img.getWidth
            val h = img.getHeight
            val gray = new Array[Long](64)
            var sum = 0L
            var y = 0
            while (y < 8) {
              val sy = y * h / 8
              var x = 0
              while (x < 8) {
                val sx = x * w / 8
                val rgb = img.getRGB(sx, sy)
                val g = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
                  (rgb & 0xff)) / 3
                gray(y * 8 + x) = g
                sum += g
                x += 1
              }
              y += 1
            }
            val mean = sum / 64
            val bands = new Array[Long](4)
            var nSet = 0L
            var j = 0
            while (j < 64) {
              if (gray(j) > mean) {
                bands(j / 16) |= 1L << (j % 16)
                nSet += 1
              }
              j += 1
            }
            Row(id, "image", bands(0), bands(1), bands(2), bands(3),
              nSet)
          }
        }
      }(enc)
  }

  /** Image near-duplicate pairs by banded aHash: candidates share any
    * of the four 16-bit hash bands (by pigeonhole, every pair at
    * Hamming distance <= 3 shares a band — the default threshold's
    * recall is GUARANTEED; raising `maxHamming` past 3 trades recall
    * for reach, the [[graft.operators.TextOps.nearDupNgramJaccard]]
    * blocking caveat), verified by the exact Hamming distance
    * (bit_count of the XOR-ed bands). Candidate volume is per-band-
    * bucket, never image-quadratic. */
  def imageDupPairs(media: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0, s"maxHamming must be >= 0, got $maxHamming")
    val h = imageHash(media).where(col("kind") === "image")
      .select(col("doc_id"),
        array(col("b0"), col("b1"), col("b2"), col("b3")).as("bs"))
      .pinned
    val banded = h.select(col("doc_id"), col("bs"),
      posexplode(col("bs")).as(Seq("band_idx", "band_val")))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.bs").as("bs_a"), col("b.bs").as("bs_b"))
      .distinct()
    cand
      .withColumn("hamming", aggregate(
        zip_with(col("bs_a"), col("bs_b"),
          (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
        lit(0L), (acc, x) => acc + x))
      .where(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  private val audioHashSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("kind", StringType),
    StructField("h", LongType),
    StructField("n_set", LongType)))

  /** Segment-energy audio fingerprint — the audio-modality dedup key
    * next to [[imageHash]]: the decoded PCM stream splits into 16
    * contiguous segments (sample i belongs to segment (i*16) div n —
    * the same nearest-neighbor floor mapping as the image raster),
    * each segment's energy is its exact abs-sample sum, and bit j is
    * set when e_j * 16 > total (cross-multiplied mean comparison — no
    * division at all). Silence hashes to 0; all-integer, so the
    * oracle replays every fingerprint from the payload formulas with
    * zero codec code. Pure per-row decode — no shuffle. */
  def audioHash(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(audioHashSchema)
    media.select(col("doc_id"), col("media_type"), col("payload"))
      .where(col("media_type").startsWith("audio/"))
      .mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          val id = r.getLong(0)
          val bytes = Option(r.getAs[Array[Byte]](2))
            .getOrElse(Array.emptyByteArray)
          if (bytes.isEmpty) Row(id, "decode_error", null, 0L)
          else {
            val ais = javax.sound.sampled.AudioSystem
              .getAudioInputStream(
                new java.io.ByteArrayInputStream(bytes))
            try {
              val fmt = ais.getFormat
              require(!fmt.isBigEndian &&
                fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
                s"unexpected WAV format $fmt")
              val data = ais.readAllBytes()
              val n = data.length / 2
              val e = new Array[Long](16)
              var total = 0L
              var i = 0
              while (i < n) {
                val v = (data(2 * i + 1).toInt << 8) |
                  (data(2 * i) & 0xff)
                val a = math.abs(v).toLong
                e(i * 16 / n) += a
                total += a
                i += 1
              }
              var h = 0L
              var nSet = 0L
              var j = 0
              while (j < 16) {
                if (e(j) * 16 > total) { h |= 1L << j; nSet += 1 }
                j += 1
              }
              Row(id, "audio", h, nSet)
            } finally ais.close()
          }
        }
      }(enc)
  }

  /** Audio exact-fingerprint duplicate pairs: docs sharing an
    * identical 16-bit [[audioHash]] — the blocking-key dedup for the
    * audio modality (a 16-bit key is deliberately coarse: it is the
    * CANDIDATE generator; a production pipeline verifies candidates
    * against the stored streams, exactly as the text routes verify
    * banded candidates with exact Jaccard). Hash-keyed shuffle,
    * per-bucket pairs, never audio-quadratic. */
  def audioDupPairs(media: DataFrame): DataFrame = {
    val h = audioHash(media).where(col("kind") === "audio")
    h.as("a").join(h.as("b"),
        col("a.h") === col("b.h") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.h").as("h"))
  }

  private val frameSampleSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("kind", StringType),
    StructField("n_units", LongType),
    StructField("s0", LongType),
    StructField("s1", LongType),
    StructField("s2", LongType)))

  /** REAL decoded-domain frame sampling — the video-frame-sampling
    * shape applied to the audio arm (a clip's "frames" are its PCM
    * samples): decode via javax.sound.sampled and keep every
    * `every`-th sample, with statistics position-weighted by the KEPT
    * ordinal so the match pins selection AND order, not just the
    * surviving multiset. Audio rows only (frame sampling is a
    * time-series transform); complements the byte-level
    * [[sampleFrames]], which exercises the plan shape without a
    * codec. */
  def sampleAudioFrames(media: DataFrame, every: Int = 4): DataFrame = {
    require(every >= 1, s"every must be >= 1, got $every")
    val enc = org.apache.spark.sql.Encoders.row(frameSampleSchema)
    media.select(col("doc_id"), col("media_type"), col("payload"))
      .where(col("media_type") === "audio/wav")
      .mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          val id = r.getLong(0)
          val bytes = Option(r.getAs[Array[Byte]](2))
            .getOrElse(Array.emptyByteArray)
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val fmt = ais.getFormat
            require(!fmt.isBigEndian && fmt.getSampleSizeInBits == 16 &&
              fmt.getChannels == 1,
              s"unexpected WAV format $fmt")
            val data = ais.readAllBytes()
            val n = data.length / 2
            var s0 = 0L; var s1 = 0L; var s2 = 0L
            var j = 0L
            var i = 0
            while (i < n) {
              if (i % every == 0) {
                j += 1
                val v = (data(2 * i + 1).toInt << 8) | (data(2 * i) & 0xff)
                s0 += v
                s1 += math.abs(v)
                s2 += j * v
              }
              i += 1
            }
            Row(id, "audio", j, s0, s1, s2)
          } finally ais.close()
        }
      }(enc)
  }

  /** Fixed-size payload resize: truncate to nBytes, or right-pad with
    * zero bytes — the byte-level analog of resize-to-fixed-dims (a real
    * deployment resamples pixels inside the decode stub; the engine
    * concerns are the schema contract — output payloads are EXACTLY
    * nBytes — and the transform staying a per-row codegen'd binary
    * expression that never shuffles the payload). */
  def resizePayload(media: DataFrame, nBytes: Int = 64): DataFrame =
    media.select(
      col("doc_id"), col("media_type"),
      // null payloads resize to nBytes of zeros — the exactly-nBytes
      // contract holds for every row (extractFeatures makes the same
      // null-payload promise)
      expr(s"rpad(substring(coalesce(payload, x''), 1, $nBytes), $nBytes, x'00')")
        .as("payload"),
      col("meta"))

  /** Frame sampling: split a payload into fixed-size "frames" and keep
    * every strideth one — the video-frame-sample plan shape (explode of
    * a bounded sequence; per-row work stays on the row's partition). */
  def sampleFrames(media: DataFrame, frameBytes: Int = 32,
      stride: Int = 4): DataFrame = {
    val step = frameBytes.toLong * stride
    media.select(col("doc_id"), col("payload"),
        length(col("payload")).cast("long").as("n_bytes"))
      .where(col("n_bytes") > 0) // empty payloads have no frames
      .select(col("doc_id"), col("payload"),
        explode(sequence(lit(0L),
          expr(s"(n_bytes - 1) div $step"))).as("frame_idx"))
      .select(col("doc_id"),
        (col("frame_idx") * stride).as("frame_no"),
        expr(s"substring(payload, cast(frame_idx * $step + 1 as int), $frameBytes)")
          .as("frame_bytes"))
  }
}
