package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` content plus
  * typed metadata, with decode / feature-extraction / frame-sampling as
  * partition-parallel operators.
  *
  * The IMAGE modality decodes for real ([[decodeImages]] — JDK
  * `javax.imageio`, PNG/JPEG/GIF/BMP, no external dependency). The
  * audio/video decode step remains a clearly-marked STUB (this
  * environment has no media codecs): [[decodeFeatures]] derives
  * deterministic fake features from the md5 of the content bytes.
  * Everything AROUND the stub — the schema, the typed `mapPartitions`
  * batch shape with per-partition codec init, the metadata-driven
  * frame sampling, the size-balanced repartitioning — is the real
  * Spark plumbing a 100 TB media pipeline needs; a real codec replaces
  * ONLY the body of the `map` (exactly as [[decodeImages]] does for
  * images).
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

  final case class ImageFeatures(media_id: Long, kind: String,
                                 n_bytes: Long, decoded: Boolean,
                                 width: Int, height: Int,
                                 mean_r: Double, mean_g: Double,
                                 mean_b: Double)

  /** REAL image decode for `kind='image'` via the JDK's built-in
    * `javax.imageio` (PNG/JPEG/GIF/BMP — no external codec needed):
    * width, height, and channel-mean RGB (0..1) per decodable blob.
    * Rows that are not images, or whose bytes don't decode (no
    * recognizable magic — `ImageIO.read` returns null), fall through
    * to `decoded=false` sentinel features, so one pass over a mixed
    * media table cleanly splits real decodes from passthroughs.
    *
    * Same zero-shuffle narrow-map shape as [[decodeFeatures]]; the
    * per-partition init disables ImageIO's temp-FILE cache (decode
    * stays in-memory on executors — a disk write per blob would be a
    * 100 TB-scale own goal). The audio/video modalities remain
    * honestly stubbed ([[decodeFeatures]]); this is the one modality
    * the JDK can decode for real.
    */
  def decodeImages(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // per-partition codec init
      rows.map { m =>
        val img =
          if (m.kind == "image")
            try Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(m.content)))
            catch { case _: java.io.IOException => None }
          else None
        img match {
          case Some(i) if i.getWidth > 0 && i.getHeight > 0 =>
            var r = 0L; var g = 0L; var b = 0L
            var y = 0
            while (y < i.getHeight) {
              var x = 0
              while (x < i.getWidth) {
                val p = i.getRGB(x, y)
                r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
                x += 1
              }
              y += 1
            }
            val n = i.getWidth.toLong * i.getHeight * 255L
            ImageFeatures(m.media_id, m.kind, m.content.length.toLong,
              decoded = true, i.getWidth, i.getHeight,
              r.toDouble / n, g.toDouble / n, b.toDouble / n)
          case _ =>
            ImageFeatures(m.media_id, m.kind, m.content.length.toLong,
              decoded = false, -1, -1, -1.0, -1.0, -1.0)
        }
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
