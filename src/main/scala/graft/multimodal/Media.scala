package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample operators implemented as typed `mapPartitions` over
  * case-class Datasets (the Scala analog of batched pandas UDFs: one
  * fused per-partition pass, no per-row JVM boundary).
  *
  * IMAGE decode is REAL: `javax.imageio.ImageIO` ships PNG/JPEG/BMP/GIF
  * readers in JDK 17 (zero extra jars), so an image payload is decoded
  * to its raster on the executor and featurized from actual pixels
  * (per-channel means + a luma histogram); resize runs a real
  * nearest-neighbor raster downsample and re-encodes PNG. A payload
  * ImageIO cannot decode (e.g. this testdata's text-byte stand-ins),
  * and the audio/video kinds — for which the JDK has no codec — fall
  * back to the deterministic byte-hash fake, clearly marked per row by
  * `decoded = false` in the feature output. Everything around the codec
  * is real and scale-true either way: schema, partitioning, batch
  * shape, feature-vector output, explode of sampled frames.
  */
object Media {

  /** One media asset: opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long, kind: String, bytes: Array[Byte],
      width: Int, height: Int, sample_rate: Int, duration_ms: Long)

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Int, decoded: Boolean,
      feature: Array[Float])

  final case class Frame(
      media_id: Long, frame_idx: Int, ts_ms: Long, frame_bytes: Array[Byte])

  val FeatureDim = 8

  /** Deterministic media table derived from `documents` (payload = UTF-8
    * text bytes): a stand-in with the exact schema/partitioning a real
    * binary ingest would produce.
    */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        col("doc_id").as("media_id"),
        // deterministic kind assignment from the id
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("bytes"),
        (pmod(col("doc_id"), lit(8)) * 160 + 320).cast("int").as("width"),
        (pmod(col("doc_id"), lit(8)) * 90 + 180).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (col("n_chars") * 40).as("duration_ms"))
      .as[MediaRow]
  }

  /** FALLBACK decode for payloads the JDK has no codec for (audio,
    * video, undecodable image bytes): deterministic rolling-state
    * "embedding" of the payload. The per-partition batch shape is the
    * same one the real image path uses, so swapping in a future codec
    * is a per-row branch, not a rewrite.
    */
  private def fakeDecode(bytes: Array[Byte]): Array[Float] = {
    val acc = new Array[Long](FeatureDim)
    var state = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < bytes.length) {
      state = (state ^ bytes(i)) * 0x100000001B3L
      acc(i % FeatureDim) += (state >>> 40)
      i += 1
    }
    acc.map(v => (v % 1000000L).toFloat / 1000000.0f)
  }

  /** Real image decode via the JDK's bundled readers (PNG/JPEG/BMP/GIF
    * in JDK 17). Returns None for bytes no installed reader accepts —
    * the caller falls back to [[fakeDecode]] and flags the row. The
    * ImageIO disk cache is disabled once per JVM: executor-side decode
    * must not synchronize on temp-file creation.
    */
  private[multimodal] def decodeImage(
      bytes: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    javax.imageio.ImageIO.setUseCache(false)
    if (bytes == null || bytes.isEmpty) None
    else
      try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes)))
      catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Real pixel statistics for a decoded raster, FeatureDim = 8 wide:
    * [meanR, meanG, meanB, meanLuma, lumaHist0..3] with the histogram
    * as fractions over 4 equal 64-value luma bins. Sums accumulate in
    * integer/long arithmetic over the raster in row-major order, so the
    * features are exact (assertable to the bit in specs) and identical
    * on every platform. Luma is integer BT.601: (299R+587G+114B)/1000.
    */
  private[multimodal] def imageFeatures(
      img: java.awt.image.BufferedImage): Array[Float] = {
    val w = img.getWidth
    val h = img.getHeight
    var sumR = 0L
    var sumG = 0L
    var sumB = 0L
    val hist = new Array[Long](4)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >>> 16) & 0xff
        val g = (rgb >>> 8) & 0xff
        val b = rgb & 0xff
        sumR += r; sumG += g; sumB += b
        hist(((299 * r + 587 * g + 114 * b) / 1000) >> 6) += 1
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    Array(
      (sumR.toDouble / n).toFloat,
      (sumG.toDouble / n).toFloat,
      (sumB.toDouble / n).toFloat,
      ((299.0 * sumR + 587.0 * sumG + 114.0 * sumB) / (1000.0 * n)).toFloat,
      (hist(0).toDouble / n).toFloat,
      (hist(1).toDouble / n).toFloat,
      (hist(2).toDouble / n).toFloat,
      (hist(3).toDouble / n).toFloat)
  }

  /** Feature extraction: one fused partition pass, codegen-friendly
    * upstream, typed output with an `array<float>` feature column ready
    * for the Similarity operators. Image payloads are decoded for real
    * (JDK ImageIO) and featurized from pixels; anything undecodable —
    * and the codec-less audio/video kinds — takes the byte-hash
    * fallback, marked `decoded = false`.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val img = if (m.kind == "image") decodeImage(m.bytes) else None
        img match {
          case Some(i) => MediaFeatures(
            m.media_id, m.kind, m.bytes.length, decoded = true,
            imageFeatures(i))
          case None => MediaFeatures(
            m.media_id, m.kind, m.bytes.length, decoded = false,
            fakeDecode(m.bytes))
        }
      }
    }
  }

  /** Per-image luma histogram at an arbitrary bin count over REAL
    * decoded pixels — the profiling companion to [[extractFeatures]]'s
    * fixed 4 bins. One row per (media_id, bin) with exact long counts;
    * undecodable/non-image rows emit nothing. Narrow map, zero shuffle.
    */
  def lumaHistogram(media: Dataset[MediaRow], bins: Int): DataFrame = {
    require(bins > 0, "lumaHistogram: bins must be positive")
    val session = media.sparkSession
    import session.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        (if (m.kind == "image") decodeImage(m.bytes) else None) match {
          case None => Iterator.empty
          case Some(img) =>
            val counts = new Array[Long](bins)
            val w = img.getWidth
            val h = img.getHeight
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                val luma = (299 * ((rgb >>> 16) & 0xff) +
                  587 * ((rgb >>> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
                counts(math.min(bins - 1, luma * bins / 256)) += 1L
                x += 1
              }
              y += 1
            }
            (0 until bins).iterator
              .map(b => (m.media_id, b, counts(b)))
        }
      }
    }.toDF("media_id", "bin", "n_pixels")
  }

  /** Resize (image kind): fit-within-box aspect-preserving
    * nearest-neighbor downsample. A decodable payload is resized on its
    * REAL raster (JDK ImageIO decode → per-pixel primitive loop →
    * deterministic PNG re-encode), with the true decoded dimensions
    * driving the scale arithmetic. An undecodable image payload falls
    * back to the byte-grid stand-in over its metadata dimensions (same
    * fused partition pass, same scale arithmetic). Non-image rows and
    * already-fitting images pass through untouched.
    */
  def resize(media: Dataset[MediaRow], maxW: Int, maxH: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    require(maxW > 0 && maxH > 0, "resize: empty target box")

    def fitted(w: Int, h: Int): (Int, Int) = {
      val scale = math.min(maxW.toDouble / w, maxH.toDouble / h)
      (math.max(1, math.floor(w * scale).toInt),
        math.max(1, math.floor(h * scale).toInt))
    }

    media.mapPartitions { rows =>
      rows.map { m =>
        lazy val img = decodeImage(m.bytes)
        if (m.kind != "image") m
        else img match {
          case Some(src) if src.getWidth > maxW || src.getHeight > maxH =>
            val (nw, nh) = fitted(src.getWidth, src.getHeight)
            val dst = new java.awt.image.BufferedImage(
              nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < nh) {
              val sy = y * src.getHeight / nh
              var x = 0
              while (x < nw) {
                dst.setRGB(x, y, src.getRGB(x * src.getWidth / nw, sy))
                x += 1
              }
              y += 1
            }
            val out = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(dst, "png", out)
            m.copy(bytes = out.toByteArray, width = nw, height = nh)
          case Some(_) => m // real raster already fits
          case None if m.width <= maxW && m.height <= maxH => m
          case None =>
            val (nw, nh) = fitted(m.width, m.height)
            val src = m.bytes
            val buf = new Array[Byte](nw * nh)
            if (src.nonEmpty) {
              var y = 0
              var idx = 0
              while (y < nh) {
                val sy = y * m.height / nh
                var x = 0
                while (x < nw) {
                  val sx = x * m.width / nw
                  buf(idx) = src((sy * m.width + sx) % src.length)
                  x += 1
                  idx += 1
                }
                y += 1
              }
            }
            m.copy(bytes = buf, width = nw, height = nh)
        }
      }
    }
  }

  /** Frame sampling (video kind): emit one frame row per second of
    * duration, capped — the generator-shaped operator (explode analog)
    * done with mapPartitions + flatMap.
    */
  def sampleFrames(media: Dataset[MediaRow], maxFrames: Int = 8): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").mapPartitions { rows =>
      rows.flatMap { m =>
        val n = math.min(maxFrames, math.max(1, (m.duration_ms / 1000L).toInt))
        (0 until n).iterator.map { i =>
          val ts = i.toLong * m.duration_ms / n
          // STUB frame payload: deterministic slice of the source bytes
          val from = if (m.bytes.isEmpty) 0 else (ts % m.bytes.length).toInt
          val len = math.min(16, m.bytes.length - from)
          Frame(m.media_id, i, ts, m.bytes.slice(from, from + len))
        }
      }
    }
  }
}
