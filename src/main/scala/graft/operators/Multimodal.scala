package graft.operators

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
object Multimodal {

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

  /** STUB decode/feature-extract: a real deployment decodes the bytes
    * (image resize, audio spectrogram, ...) with a native library. This
    * deterministic fake folds payload bytes into a fixed-size float
    * vector so the full pipeline (schema, batching, downstream
    * similarity) is exercised end-to-end. */
  private[operators] def featureStub(bytes: Array[Byte]): Array[Float] = {
    val acc = new Array[Long](FeatureDim)
    var i = 0
    while (i < bytes.length) {
      acc(i % FeatureDim) += (bytes(i) & 0xff)
      i += 1
    }
    acc.map(v => (v % 1000).toFloat / 1000f)
  }

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
