package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample operators implemented as typed `mapPartitions` over
  * case-class Datasets (the Scala analog of batched pandas UDFs: one
  * fused per-partition pass, no per-row JVM boundary).
  *
  * The actual codec step is a STUB — no image/audio libraries exist in
  * this environment — replaced by a deterministic byte-level fake
  * (xxhash-style rolling state over the payload). Everything around it is
  * real and scale-true: schema, partitioning, batch shape, feature-vector
  * output, explode of sampled frames.
  */
object Media {

  /** One media asset: opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long, kind: String, bytes: Array[Byte],
      width: Int, height: Int, sample_rate: Int, duration_ms: Long)

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Int, feature: Array[Float])

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

  /** STUB decode: deterministic rolling-state "embedding" of the payload.
    * A real implementation would decode pixels/samples here; the
    * per-partition batch shape (iterate rows, reuse buffers, emit typed
    * rows) is exactly what a codec-backed version needs.
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

  /** Feature extraction: one fused partition pass, codegen-friendly
    * upstream, typed output with an `array<float>` feature column ready
    * for the Similarity operators.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        MediaFeatures(m.media_id, m.kind, m.bytes.length, fakeDecode(m.bytes))
      }
    }
  }

  /** Resize (image kind): fit-within-box nearest-neighbor downsample.
    * STUB codec like [[fakeDecode]] — the payload is treated as a
    * row-major width×height byte grid (index wrapped to the real
    * length) — but the plumbing is real: aspect-preserving scale
    * arithmetic, a per-pixel primitive loop, new payload + metadata
    * emitted in the same fused partition pass a codec-backed resize
    * would use. Non-image rows and already-fitting images pass through
    * untouched.
    */
  def resize(media: Dataset[MediaRow], maxW: Int, maxH: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    require(maxW > 0 && maxH > 0, "resize: empty target box")
    media.mapPartitions { rows =>
      rows.map { m =>
        if (m.kind != "image" || (m.width <= maxW && m.height <= maxH)) m
        else {
          val scale = math.min(
            maxW.toDouble / m.width, maxH.toDouble / m.height)
          val nw = math.max(1, math.floor(m.width * scale).toInt)
          val nh = math.max(1, math.floor(m.height * scale).toInt)
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
