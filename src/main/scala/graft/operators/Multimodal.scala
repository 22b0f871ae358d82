package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` content plus
  * typed metadata, with decode / feature-extraction / frame-sampling as
  * partition-parallel operators.
  *
  * The decode step is a clearly-marked STUB (this environment has no
  * media codecs): it derives deterministic fake features from the md5
  * of the content bytes. Everything AROUND the stub — the schema, the
  * typed `mapPartitions` batch shape with per-partition codec init, the
  * metadata-driven frame sampling, the size-balanced repartitioning —
  * is the real Spark plumbing a 100 TB media pipeline needs; a real
  * codec replaces ONLY the body of the `map` below.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String,
                            content: Array[Byte], n_frames: Int)

  final case class MediaFeatures(media_id: Long, kind: String,
                                 n_bytes: Long, f0: Double, f1: Double,
                                 f2: Double, f3: Double)

  /** Wrap the documents table as a media table (text bytes standing in
    * for encoded media; kind round-robins over the three modalities).
    */
  def fromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      expr("CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END")
        .as("kind"),
      encode(col("text"), "UTF-8").as("content"),
      (pmod(col("n_chars"), lit(100)) + 1).cast("int").as("n_frames"))
      .as[MediaRow]
  }

  /** STUB DECODE — deterministic fake: md5-derived features. A real
    * implementation opens the codec once per partition (exactly where
    * `MessageDigest` is initialized here) and decodes each blob. The
    * operator is a pure narrow map: zero shuffles, scales with splits.
    */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition "codec" init — the expensive setup a real decoder
      // (libjpeg/ffmpeg handle) would do once per task, not per row
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { m =>
        val h = md.digest(m.content)
        def f(i: Int): Double = (h(i) & 0xff) / 255.0
        MediaFeatures(m.media_id, m.kind, m.content.length.toLong,
          f(0), f(1), f(2), f(3))
      }
    }
  }

  /** Metadata-driven frame sampling: one output row per sampled frame
    * index, `step` apart — the batch shape a video pipeline feeds to a
    * per-frame model. Pure per-row generate (explode), no shuffle.
    */
  def frameSample(media: Dataset[MediaRow], step: Int): DataFrame =
    media.toDF().select(
      col("media_id"), col("kind"),
      explode(sequence(lit(0), col("n_frames") - 1, lit(step)))
        .as("frame_idx"))

  final case class ResizedMedia(media_id: Long, kind: String,
                                src_bytes: Long, dst_bytes: Long,
                                content: Array[Byte])

  /** STUB RESIZE — the transcode/downscale verb of the modality set
    * (image resize, audio resample, video re-encode). The stub derives
    * the "resized" payload deterministically: the first
    * `ceil(len / factor)` bytes of the source (a real implementation
    * replaces only that line with the codec's scaled re-encode; the
    * per-partition init sits exactly where a real transcoder's context
    * would). Shape is the same zero-shuffle narrow map as
    * [[decodeFeatures]] — at 100 TB resize cost is pure CPU on the
    * scan, and the output column is smaller than the input, so the
    * stage SHRINKS the data in flight.
    */
  def resizeStub(media: Dataset[MediaRow], factor: Int): Dataset[ResizedMedia] = {
    require(factor >= 1, "factor must be >= 1")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val dstLen = (m.content.length + factor - 1) / factor
        ResizedMedia(m.media_id, m.kind, m.content.length.toLong,
          dstLen.toLong, m.content.take(dstLen))
      }
    }
  }

  /** Balance partitions by payload size so one executor doesn't draw
    * all the 4K videos while another gets thumbnails: range-partition
    * on content length. At 100 TB this is the difference between a
    * straggler-free stage and a 10x tail.
    */
  def sizeBalanced(media: Dataset[MediaRow], partitions: Int): Dataset[MediaRow] =
    media.repartitionByRange(partitions, length(col("content")))
}
