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
  * nearest-neighbor raster downsample and re-encodes PNG.
  *
  * AUDIO decode is REAL too: `javax.sound.sampled.AudioSystem` ships
  * WAV/AIFF/AU parsers in JDK 17, so an audio payload is parsed to its
  * PCM samples on the executor (converted to 16-bit signed, mixed to
  * mono) and featurized from actual waveform statistics; resampleAudio
  * runs a real nearest-neighbor sample-rate change and re-encodes WAV.
  *
  * A payload neither codec accepts (e.g. this testdata's text-byte
  * stand-ins), and the video kind — for which the JDK has no codec —
  * fall back to the deterministic byte-hash fake, clearly marked per
  * row by `decoded = false` in the feature output. Everything around
  * the codecs is real and scale-true either way: schema, partitioning,
  * batch shape, feature-vector output, explode of sampled frames.
  */
object Media {

  /** One media asset: opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long, kind: String, bytes: Array[Byte],
      width: Int, height: Int, sample_rate: Int, duration_ms: Long)

  /** `channels` is the SOURCE channel count the feature pass saw for
    * decoded audio (2 = the waveform stats describe a stereo payload's
    * truncating-average mixdown — detectable downstream instead of a
    * silent collapse); 0 for non-audio and undecoded rows, where no
    * channel layout was ever parsed.
    */
  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Int, decoded: Boolean,
      feature: Array[Float], channels: Int)

  final case class Frame(
      media_id: Long, frame_idx: Int, ts_ms: Long, frame_bytes: Array[Byte])

  val FeatureDim = 8

  /** Deterministic media table derived from `documents` (payload = UTF-8
    * text bytes): a stand-in with the exact schema/partitioning a real
    * binary ingest would produce.
    */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.common.Tables.readParquet(spark, s"$sfDir/documents.parquet")
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

  /** Deterministic real PNG: a w×h raster whose pixel (x, y) channels
    * are a splitmix-style hash of (seed, x, y) — every byte of the
    * payload is reproducible from the id, and the JDK PNG writer is
    * deterministic for a given raster.
    */
  private[graft] def generatePng(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var z = seed + (y.toLong * w + x) * 0x9E3779B97F4A7C15L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        img.setRGB(x, y, ((z ^ (z >>> 31)) & 0xFFFFFF).toInt)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Deterministic real mono WAV: n 16-bit samples hashed from
    * (seed, i), same reproducibility contract as [[generatePng]].
    */
  private[graft] def generateWav(seed: Long, rate: Int,
      n: Int): Array[Byte] = {
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      var z = seed + i.toLong * 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      val v = ((z >>> 16) & 0xFFFF).toInt - 32768
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      rate.toFloat, 16, 1, 2, rate.toFloat, false)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** [[mediaFromDocuments]] with REAL payloads on the deterministic
    * media_id % 5 == 0 slice: a generated PNG for images, a generated
    * WAV for audio, a GFV1 PNG-frame container for video; every other
    * row keeps the document-text stand-in bytes (which no codec
    * accepts). The expected decode outcome is therefore a pure
    * function of the id — which is what lets the decode-health audit
    * (q90) be ORACLE-CHECKED: the DuckDB mirror predicts each row's
    * flag from the id rule while the engine earns it by actually
    * running its codecs.
    */
  def mediaWithRealPayloads(spark: SparkSession,
      sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    mediaFromDocuments(spark, sfDir).mapPartitions { rows =>
      rows.map { m =>
        if (m.media_id % 5 != 0) m
        else m.kind match {
          case "image" => m.copy(bytes = generatePng(m.media_id, 16, 16))
          case "audio" =>
            m.copy(bytes = generateWav(m.media_id, m.sample_rate, 320))
          case _ => m.copy(bytes = encodeVideoContainer(
            (0 until 3).map(f => generatePng(m.media_id * 31 + f, 8, 8))))
        }
      }
    }
  }

  /** FALLBACK decode for payloads no JDK codec accepts (the video
    * kind, undecodable image/audio bytes): deterministic rolling-state
    * "embedding" of the payload. The per-partition batch shape is the
    * same one the real image and audio paths use, so swapping in a
    * future codec is a per-row branch, not a rewrite.
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

  /** Once-per-JVM ImageIO configuration: the disk cache is disabled
    * lazily on first decode on each executor — executor-side decode
    * must not synchronize on temp-file creation, and the static setter
    * should not be re-invoked per row.
    */
  private object ImageIOConfig {
    lazy val init: Unit = javax.imageio.ImageIO.setUseCache(false)
  }

  /** Real image decode via the JDK's bundled readers (PNG/JPEG/BMP/GIF
    * in JDK 17). Returns None for bytes no installed reader accepts —
    * the caller falls back to [[fakeDecode]] and flags the row.
    */
  private[multimodal] def decodeImage(
      bytes: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    ImageIOConfig.init
    if (bytes == null || bytes.isEmpty) None
    else
      try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes)))
      catch { case scala.util.control.NonFatal(_) => None }
  }

  // ---- Video container ----
  // The JDK ships no video codec, so the engine DEFINES its video
  // payload convention instead of faking one: a conforming payload is
  // "GFV1" + int32 frame count + per frame (int32 length + PNG bytes),
  // all big-endian — length-prefixed concatenated stills. That turns
  // video into a modality the existing REAL image codec serves:
  // sampleFrames emits actual rasters and extractFeatures featurizes
  // actual pixels, zero new jars. Non-conforming payloads (like this
  // testdata's text stand-ins) still take the byte-hash fallback,
  // flagged decoded=false per row.

  private val VideoMagic = Array[Byte]('G', 'F', 'V', '1')
  private[graft] val MaxVideoFrames = 4096

  /** Build a conforming video payload from PNG frame bytes. */
  private[graft] def encodeVideoContainer(
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty && frames.length <= MaxVideoFrames,
      s"video container: 1..$MaxVideoFrames frames")
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.write(VideoMagic)
    dos.writeInt(frames.length)
    frames.foreach { f => dos.writeInt(f.length); dos.write(f) }
    dos.flush()
    out.toByteArray
  }

  /** Split a conforming payload into its frame payloads; None for
    * anything malformed (bad magic, counts or lengths out of range,
    * trailing garbage) — the caller falls back and flags the row.
    */
  private[graft] def parseVideoContainer(
      bytes: Array[Byte]): Option[Array[Array[Byte]]] =
    try {
      if (bytes == null || bytes.length < VideoMagic.length + 4) None
      else if (!java.util.Arrays.equals(
        java.util.Arrays.copyOf(bytes, VideoMagic.length), VideoMagic)) None
      else {
        val dis = new java.io.DataInputStream(
          new java.io.ByteArrayInputStream(
            bytes, VideoMagic.length, bytes.length - VideoMagic.length))
        val n = dis.readInt()
        if (n < 1 || n > MaxVideoFrames) None
        else {
          val frames = new Array[Array[Byte]](n)
          var i = 0
          var ok = true
          while (ok && i < n) {
            val len = dis.readInt()
            if (len < 0 || len > dis.available()) ok = false
            else {
              val f = new Array[Byte](len)
              dis.readFully(f)
              frames(i) = f
              i += 1
            }
          }
          if (ok && dis.available() == 0) Some(frames) else None
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

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

  /** Decoded audio: mono 16-bit signed samples (multi-channel payloads
    * are mixed down by truncating-average) plus the source rate and the
    * SOURCE channel count the mixdown collapsed (1 = was already mono).
    */
  private[graft] final case class AudioClip(
      sampleRate: Float, samples: Array[Int], channels: Int)

  /** Raw decoded PCM: 16-bit signed samples interleaved by frame with
    * the CHANNEL LAYOUT PRESERVED, plus rate and channel count — the
    * lossless decode [[resampleAudio]] works on.
    */
  private[graft] final case class AudioPcm(
      sampleRate: Float, channels: Int, interleaved: Array[Int])

  /** Real audio parse via the JDK's bundled readers (WAV/AIFF/AU in
    * JDK 17). Non-16-bit-PCM encodings (8-bit, float, U-law…) are
    * converted through `AudioSystem` before sampling; the channel
    * layout is kept as-is. Returns None for bytes no installed reader
    * accepts — the caller falls back to [[fakeDecode]] and flags the
    * row.
    */
  private[graft] def decodeAudioPcm(bytes: Array[Byte]): Option[AudioPcm] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    if (bytes == null || bytes.isEmpty) return None
    try {
      val raw = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val f = raw.getFormat
      val wanted = new AudioFormat(
        AudioFormat.Encoding.PCM_SIGNED, f.getSampleRate, 16,
        f.getChannels, f.getChannels * 2, f.getSampleRate, false)
      val pcm =
        if (f.matches(wanted)) raw
        else AudioSystem.getAudioInputStream(wanted, raw)
      val data = pcm.readAllBytes()
      val ch = wanted.getChannels
      val n = data.length / 2
      val samples = new Array[Int](n)
      var i = 0
      while (i < n) {
        samples(i) = (data(2 * i) & 0xff) | (data(2 * i + 1) << 8) // LE
        i += 1
      }
      Some(AudioPcm(wanted.getSampleRate, ch, samples))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Mono view for FEATURE extraction: multi-channel payloads mix down
    * by truncating-average (features describe the combined waveform;
    * the mixdown never feeds back into a re-encode — [[resampleAudio]]
    * preserves the channel layout from [[decodeAudioPcm]]).
    */
  private[graft] def decodeAudio(bytes: Array[Byte]): Option[AudioClip] =
    decodeAudioPcm(bytes).map { pcm =>
      val ch = pcm.channels
      val frames = pcm.interleaved.length / ch
      val mono = new Array[Int](frames)
      var i = 0
      while (i < frames) {
        var sum = 0
        var c = 0
        while (c < ch) { sum += pcm.interleaved(i * ch + c); c += 1 }
        mono(i) = sum / ch
        i += 1
      }
      AudioClip(pcm.sampleRate, mono, ch)
    }

  /** Real waveform statistics for decoded audio, FeatureDim = 8 wide:
    * [meanAbs, rms, peak, zeroCrossRate, energyQ0..Q3] — amplitudes
    * normalized by 2^15, the energy histogram as each time-quarter's
    * share of total squared amplitude. Sums accumulate in long
    * arithmetic over the samples in order, so the features are exact
    * (assertable to the bit in specs) and identical on every platform.
    */
  private[graft] def audioFeatures(clip: AudioClip): Array[Float] = {
    val s = clip.samples
    val n = s.length
    if (n == 0) return new Array[Float](FeatureDim)
    var sumAbs = 0L
    var sumSq = 0L
    var peak = 0L
    var crossings = 0L
    val quarters = new Array[Long](4)
    var i = 0
    while (i < n) {
      val v = s(i).toLong
      val a = math.abs(v)
      sumAbs += a
      sumSq += v * v
      if (a > peak) peak = a
      if (i > 0 && (s(i) < 0) != (s(i - 1) < 0)) crossings += 1
      quarters(math.min(3, i * 4 / n)) += v * v
      i += 1
    }
    val full = 32768.0
    Array(
      (sumAbs.toDouble / n / full).toFloat,
      (math.sqrt(sumSq.toDouble / n) / full).toFloat,
      (peak.toDouble / full).toFloat,
      (if (n > 1) crossings.toDouble / (n - 1) else 0.0).toFloat,
      (if (sumSq > 0) quarters(0).toDouble / sumSq else 0.0).toFloat,
      (if (sumSq > 0) quarters(1).toDouble / sumSq else 0.0).toFloat,
      (if (sumSq > 0) quarters(2).toDouble / sumSq else 0.0).toFloat,
      (if (sumSq > 0) quarters(3).toDouble / sumSq else 0.0).toFloat)
  }

  /** Feature extraction: one fused partition pass, codegen-friendly
    * upstream, typed output with an `array<float>` feature column ready
    * for the Similarity operators. Image payloads are decoded for real
    * (JDK ImageIO) and featurized from pixels; audio payloads are
    * parsed for real (JDK AudioSystem) and featurized from waveform
    * statistics; anything undecodable — and the codec-less video kind
    * — takes the byte-hash fallback, marked `decoded = false`.
    */
  /** Mean-pooled per-frame pixel features of a conforming video
    * payload; None unless the container parses AND every frame
    * decodes (a partially-decodable clip is flagged, not averaged
    * over a silent subset). Pooling accumulates in double over frames
    * in container order — deterministic and spec-assertable exactly.
    */
  private[graft] def videoFeatures(
      bytes: Array[Byte]): Option[Array[Float]] =
    parseVideoContainer(bytes).flatMap { frames =>
      val decoded = frames.map(decodeImage)
      if (decoded.exists(_.isEmpty)) None
      else {
        val acc = new Array[Double](FeatureDim)
        decoded.foreach { img =>
          val f = imageFeatures(img.get)
          var i = 0
          while (i < FeatureDim) { acc(i) += f(i); i += 1 }
        }
        Some(acc.map(v => (v / frames.length).toFloat))
      }
    }

  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        // (feature, source channel count) — channels nonzero only where
        // a channel layout was actually parsed (decoded audio)
        val real: Option[(Array[Float], Int)] = m.kind match {
          case "image" => decodeImage(m.bytes).map(i => (imageFeatures(i), 0))
          case "audio" =>
            decodeAudio(m.bytes).map(c => (audioFeatures(c), c.channels))
          case "video" => videoFeatures(m.bytes).map(f => (f, 0))
          case _ => None
        }
        real match {
          case Some((feature, ch)) => MediaFeatures(
            m.media_id, m.kind, m.bytes.length, decoded = true, feature, ch)
          case None => MediaFeatures(
            m.media_id, m.kind, m.bytes.length, decoded = false,
            fakeDecode(m.bytes), channels = 0)
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

  /** Resample (audio kind): real nearest-neighbor sample-rate change on
    * the DECODED waveform, re-encoded as 16-bit WAV with the source's
    * CHANNEL LAYOUT PRESERVED — a stereo payload stays stereo, every
    * channel resampled on the same frame grid (no silent mixdown; the
    * mono mixdown exists only inside feature extraction). Decodable
    * payloads already at the target rate, undecodable payloads, and
    * non-audio rows pass through untouched (the undecodable ones stay
    * flagged downstream by [[extractFeatures]]). Same fused partition
    * pass as every other media operator.
    */
  def resampleAudio(media: Dataset[MediaRow], targetRate: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    require(targetRate > 0, "resampleAudio: target rate must be positive")
    media.mapPartitions { rows =>
      rows.map { m =>
        if (m.kind != "audio") m
        else decodeAudioPcm(m.bytes) match {
          case None => m
          case Some(pcm) if pcm.sampleRate.round == targetRate => m
          case Some(pcm) =>
            val ch = pcm.channels
            val srcN = pcm.interleaved.length / ch
            val dstN = math.max(1,
              (srcN.toLong * targetRate / pcm.sampleRate.round).toInt)
            val data = new Array[Byte](dstN * ch * 2)
            var i = 0
            while (i < dstN) {
              val src = (i.toLong * srcN / dstN).toInt
              var c = 0
              while (c < ch) {
                val v = pcm.interleaved(src * ch + c)
                val off = (i * ch + c) * 2
                data(off) = (v & 0xff).toByte
                data(off + 1) = ((v >> 8) & 0xff).toByte
                c += 1
              }
              i += 1
            }
            val fmt = new javax.sound.sampled.AudioFormat(
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
              targetRate.toFloat, 16, ch, ch * 2, targetRate.toFloat, false)
            val out = new java.io.ByteArrayOutputStream()
            javax.sound.sampled.AudioSystem.write(
              new javax.sound.sampled.AudioInputStream(
                new java.io.ByteArrayInputStream(data), fmt, dstN.toLong),
              javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
            m.copy(bytes = out.toByteArray, sample_rate = targetRate,
              duration_ms = dstN * 1000L / targetRate)
        }
      }
    }
  }

  /** Frame sampling (video kind): the generator-shaped operator
    * (explode analog) done with mapPartitions + flatMap.
    *
    * A CONFORMING payload (see [[parseVideoContainer]]) emits REAL
    * frames: up to maxFrames stills sampled evenly across the
    * container in order (stride sampling, the standard decode-budget
    * policy), each frame row carrying the still's actual PNG bytes —
    * ready for [[decodeImage]]/the image feature path downstream.
    * Timestamps spread the sampled frames across the clip's metadata
    * duration. A non-conforming payload keeps the deterministic
    * byte-slice stand-in (one pseudo-frame per second of duration,
    * capped) so the operator's shape is total either way.
    */
  def sampleFrames(media: Dataset[MediaRow], maxFrames: Int = 8): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").mapPartitions { rows =>
      rows.flatMap { m =>
        parseVideoContainer(m.bytes) match {
          case Some(frames) =>
            val n = math.min(maxFrames, frames.length)
            (0 until n).iterator.map { i =>
              val src = i * frames.length / n
              Frame(m.media_id, i, i.toLong * m.duration_ms / n, frames(src))
            }
          case None =>
            val n = math.min(maxFrames,
              math.max(1, (m.duration_ms / 1000L).toInt))
            (0 until n).iterator.map { i =>
              val ts = i.toLong * m.duration_ms / n
              // stand-in payload: deterministic slice of the source bytes
              val from = if (m.bytes.isEmpty) 0 else (ts % m.bytes.length).toInt
              val len = math.min(16, m.bytes.length - from)
              Frame(m.media_id, i, ts, m.bytes.slice(from, from + len))
            }
        }
      }
    }
  }
}
