package graft

import graft.multimodal.Media
import graft.multimodal.Media.MediaRow
import org.scalatest.funsuite.AnyFunSuite

/** The REAL media codec paths: deterministic PNGs and WAVs generated
  * in-test, decoded distributed (executor-side ImageIO / AudioSystem),
  * with pixel and waveform statistics asserted EXACTLY — integer
  * accumulation over rasters and samples makes the expected values
  * computable by hand.
  */
class MediaCodecSpec extends AnyFunSuite with SparkSpec {

  /** Encode a raster via the same JDK writer production bytes would
    * come from: pixels(y)(x) = (r, g, b).
    */
  private def png(pixels: Array[Array[(Int, Int, Int)]]): Array[Byte] = {
    val h = pixels.length
    val w = pixels(0).length
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = pixels(y)(x)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def solid(w: Int, h: Int, rgb: (Int, Int, Int)) =
    png(Array.fill(h, w)(rgb))

  private def mediaRow(id: Long, kind: String, bytes: Array[Byte],
      w: Int, h: Int) =
    MediaRow(id, kind, bytes, w, h, 16000, 1000L)

  test("solid-color PNG decodes to exact per-channel means and luma histogram") {
    import spark.implicits._
    // luma of (200,100,50) = (299*200 + 587*100 + 114*50)/1000 = 124 → bin 1
    val media = Seq(
      mediaRow(1L, "image", solid(8, 6, (200, 100, 50)), 8, 6),
      // text bytes: undecodable → byte-hash fallback, flagged
      mediaRow(2L, "image", "not a png".getBytes("UTF-8"), 3, 3),
      // audio kind with non-audio payload: parse fails → fallback
      mediaRow(3L, "audio", solid(4, 4, (1, 2, 3)), 4, 4)
    ).toDS()
    val feats = Media.extractFeatures(media).collect()
      .map(f => f.media_id -> f).toMap
    assert(feats(1L).decoded)
    assert(feats(1L).feature.toSeq ==
      Seq(200f, 100f, 50f, 124.2f, 0f, 1f, 0f, 0f))
    assert(!feats(2L).decoded && !feats(3L).decoded)
    assert(feats.values.forall(_.feature.length == Media.FeatureDim))
  }

  test("half-black/half-white PNG: exact split means and histogram extremes") {
    import spark.implicits._
    val pixels = Array.tabulate(4, 4)((y, _) =>
      if (y < 2) (0, 0, 0) else (255, 255, 255))
    val media = Seq(mediaRow(7L, "image", png(pixels), 4, 4)).toDS()
    val f = Media.extractFeatures(media).collect().head
    assert(f.decoded)
    // means are exactly 127.5; luma 0 → bin 0, luma 255 → bin 3
    assert(f.feature.toSeq ==
      Seq(127.5f, 127.5f, 127.5f, 127.5f, 0.5f, 0f, 0f, 0.5f))
  }

  test("lumaHistogram counts real pixels at arbitrary bin counts") {
    import spark.implicits._
    val pixels = Array.tabulate(6, 8)((y, _) =>
      if (y < 3) (0, 0, 0) else (255, 255, 255))
    val media = Seq(
      mediaRow(1L, "image", png(pixels), 8, 6),
      mediaRow(2L, "image", "junk".getBytes("UTF-8"), 2, 2), // no rows
      mediaRow(3L, "video", png(pixels), 8, 6) // non-image: no rows
    ).toDS()
    val hist = Media.lumaHistogram(media, bins = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(hist == Map((1L, 0) -> 24L, (1L, 1) -> 24L))
  }

  test("resize downsamples the real raster nearest-neighbor and re-encodes") {
    import spark.implicits._
    // a gradient so nearest-neighbor picks are distinguishable:
    // pixel (x, y) = (x*2, y*4, 7)
    val srcPix = Array.tabulate(50, 100)((y, x) => (x * 2, y * 4, 7))
    val media = Seq(mediaRow(5L, "image", png(srcPix), 100, 50)).toDS()
    val out = Media.resize(media, maxW = 40, maxH = 40).collect().head
    // scale = min(40/100, 40/50) = 0.4 → 40 x 20
    assert(out.width == 40 && out.height == 20)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.bytes))
    assert(img.getWidth == 40 && img.getHeight == 20)
    for (y <- 0 until 20; x <- 0 until 40) {
      val (sx, sy) = (x * 100 / 40, y * 50 / 20)
      val expect = (srcPix(sy)(sx)._1 << 16) |
        (srcPix(sy)(sx)._2 << 8) | srcPix(sy)(sx)._3
      assert((img.getRGB(x, y) & 0xffffff) == expect,
        s"pixel ($x,$y) != source ($sx,$sy)")
    }
    // deterministic re-encode: same input → same bytes
    val again = Media.resize(media, maxW = 40, maxH = 40).collect().head
    assert(out.bytes sameElements again.bytes)
  }

  test("resize trusts the DECODED dims, not the metadata, for real images") {
    import spark.implicits._
    // metadata lies (says 1000x1000); the real raster is 10x10 and fits
    val media = Seq(
      mediaRow(9L, "image", solid(10, 10, (5, 5, 5)), 1000, 1000)).toDS()
    val out = Media.resize(media, maxW = 20, maxH = 20).collect().head
    assert(out.bytes sameElements media.collect().head.bytes,
      "a fitting real raster must pass through untouched")
  }

  // ---- audio: JDK AudioSystem (WAV) ----

  /** Encode interleaved 16-bit PCM via the same JDK writer production
    * bytes would come from: samples(channel)(i).
    */
  private def wav(sampleRate: Float, samples: Array[Array[Int]]): Array[Byte] = {
    import javax.sound.sampled._
    val ch = samples.length
    val n = samples(0).length
    val data = new Array[Byte](n * ch * 2)
    for (i <- 0 until n; c <- 0 until ch) {
      val off = (i * ch + c) * 2
      data(off) = (samples(c)(i) & 0xff).toByte
      data(off + 1) = ((samples(c)(i) >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      sampleRate, 16, ch, ch * 2, sampleRate, false)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, n.toLong),
      AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  private def audioRow(id: Long, bytes: Array[Byte], rate: Int = 16000) =
    MediaRow(id, "audio", bytes, 0, 0, rate, 1000L)

  test("constant-amplitude WAV decodes to exact waveform statistics") {
    import spark.implicits._
    // 16000 samples of +16384: meanAbs = rms = peak = 16384/32768 = 0.5,
    // no sign changes, each time quarter holds exactly 1/4 of the energy
    val const = wav(16000f, Array(Array.fill(16000)(16384)))
    val media = Seq(
      audioRow(1L, const),
      audioRow(2L, "not audio".getBytes("UTF-8"))).toDS()
    val feats = Media.extractFeatures(media).collect()
      .map(f => f.media_id -> f).toMap
    assert(feats(1L).decoded)
    assert(feats(1L).feature.toSeq ==
      Seq(0.5f, 0.5f, 0.5f, 0f, 0.25f, 0.25f, 0.25f, 0.25f))
    assert(feats(1L).channels == 1, "mono source must report 1 channel")
    assert(!feats(2L).decoded)
    assert(feats(2L).channels == 0,
      "undecoded row never parsed a channel layout")
  }

  test("alternating-sign WAV: zero-crossing rate is exactly 1") {
    import spark.implicits._
    // +/-8192 alternating: every adjacent pair crosses zero
    val sq = wav(8000f,
      Array(Array.tabulate(8000)(i => if (i % 2 == 0) 8192 else -8192)))
    val f = Media.extractFeatures(Seq(audioRow(3L, sq, 8000)).toDS())
      .collect().head
    assert(f.decoded)
    assert(f.feature.toSeq ==
      Seq(0.25f, 0.25f, 0.25f, 1f, 0.25f, 0.25f, 0.25f, 0.25f))
  }

  test("stereo WAV mixes down by truncating average before featurizing") {
    import spark.implicits._
    // L = +2000, R = +1000 constant → mono 1500
    val stereo = wav(16000f,
      Array(Array.fill(400)(2000), Array.fill(400)(1000)))
    val f = Media.extractFeatures(Seq(audioRow(4L, stereo)).toDS())
      .collect().head
    assert(f.decoded)
    assert(f.feature(0) == 1500f / 32768f && f.feature(2) == 1500f / 32768f)
    assert(f.channels == 2,
      "mixed-down stereo must surface its source channel count")
  }

  test("resampleAudio preserves the channel layout: stereo stays stereo, per-channel exact") {
    import spark.implicits._
    // L is a ramp, R a constant — distinguishable after resampling
    val stereo = wav(16000f, Array(
      Array.tabulate(1600)(i => i * 20 - 8000), Array.fill(1600)(1000)))
    val out = Media.resampleAudio(
      Seq(audioRow(10L, stereo)).toDS(), targetRate = 8000).collect().head
    assert(out.sample_rate == 8000)
    val pcm = Media.decodeAudioPcm(out.bytes).get
    assert(pcm.channels == 2, "stereo payload must re-encode as stereo")
    val frames = pcm.interleaved.length / 2
    assert(frames == 800)
    // nearest-neighbor on the FRAME grid: output frame i is source
    // frame 2i, both channels
    for (i <- 0 until frames) {
      assert(pcm.interleaved(2 * i) == 2 * i * 20 - 8000, s"L[$i]")
      assert(pcm.interleaved(2 * i + 1) == 1000, s"R[$i]")
    }
  }

  // ---- video: GFV1 PNG-frame container ----

  private def videoRow(id: Long, bytes: Array[Byte], durationMs: Long) =
    MediaRow(id, "video", bytes, 0, 0, 0, durationMs)

  test("video container round-trips: sampleFrames emits the REAL PNG frames") {
    import spark.implicits._
    val frames = Seq(
      solid(8, 8, (30, 60, 90)), solid(8, 8, (60, 90, 120)),
      solid(8, 8, (90, 120, 150)))
    val container = Media.encodeVideoContainer(frames)
    val media = Seq(videoRow(1L, container, 3000L)).toDS()
    val out = Media.sampleFrames(media).collect().sortBy(_.frame_idx)
    assert(out.length == 3)
    out.zipWithIndex.foreach { case (f, i) =>
      assert(f.frame_bytes sameElements frames(i), s"frame $i bytes")
      assert(f.ts_ms == i * 1000L)
      // the emitted frame is a decodable still with the exact raster
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(f.frame_bytes))
      assert(img.getWidth == 8 && img.getHeight == 8)
    }
  }

  test("sampleFrames stride-samples a long container under the frame budget") {
    import spark.implicits._
    val frames = (0 until 6).map(i => solid(4, 4, (i * 40, 0, 0)))
    val media = Seq(
      videoRow(2L, Media.encodeVideoContainer(frames), 6000L)).toDS()
    val out = Media.sampleFrames(media, maxFrames = 3).collect()
      .sortBy(_.frame_idx)
    // 6 frames into a 3-frame budget: sources 0, 2, 4
    assert(out.length == 3)
    out.zipWithIndex.foreach { case (f, i) =>
      assert(f.frame_bytes sameElements frames(i * 2), s"frame $i source")
    }
  }

  test("video features mean-pool REAL per-frame pixel stats, decoded=true") {
    import spark.implicits._
    val frames = Seq(
      solid(8, 8, (30, 60, 90)), solid(8, 8, (60, 90, 120)),
      solid(8, 8, (90, 120, 150)))
    val container = Media.encodeVideoContainer(frames)
    // per-frame features via the (already spec'd) image path, pooled
    // with the same double-accumulate / divide arithmetic
    val perFrame = Media.extractFeatures(
      frames.zipWithIndex.map { case (b, i) =>
        mediaRow(i.toLong, "image", b, 8, 8)
      }.toDS()).collect().sortBy(_.media_id).map(_.feature)
    val expected = Array.tabulate(Media.FeatureDim) { i =>
      (perFrame.map(_(i).toDouble).sum / perFrame.length).toFloat
    }
    val media = Seq(
      videoRow(3L, container, 3000L),
      videoRow(4L, "not a container".getBytes("UTF-8"), 3000L),
      // conforming container with an undecodable frame: flagged, not
      // averaged over a silent subset
      videoRow(5L, Media.encodeVideoContainer(
        Seq(solid(4, 4, (1, 2, 3)), "junk".getBytes("UTF-8"))), 2000L)
    ).toDS()
    val feats = Media.extractFeatures(media).collect()
      .map(f => f.media_id -> f).toMap
    assert(feats(3L).decoded)
    assert(feats(3L).feature.toSeq == expected.toSeq)
    assert(!feats(4L).decoded && !feats(5L).decoded)
  }

  test("q90 media table: the id-rule slice really decodes, the rest really doesn't") {
    val media = Media.mediaWithRealPayloads(spark, Sf)
    val feats = Media.extractFeatures(media).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.decoded == (f.media_id % 5 == 0),
        s"media ${f.media_id} (${f.kind}): decoded=${f.decoded}")
    }
  }

  test("resampleAudio halves the rate nearest-neighbor and re-encodes WAV") {
    import spark.implicits._
    val src = wav(16000f, Array(Array.tabulate(1600)(i => i * 10 - 8000)))
    val media = Seq(
      audioRow(5L, src),
      audioRow(6L, "junk".getBytes("UTF-8")), // undecodable: untouched
      MediaRow(7L, "video", src, 0, 0, 16000, 1000L)).toDS()
    val out = Media.resampleAudio(media, targetRate = 8000).collect()
      .map(m => m.media_id -> m).toMap
    assert(out(5L).sample_rate == 8000 && out(5L).duration_ms == 100L)
    val clip = Media.decodeAudio(out(5L).bytes).get
    assert(clip.sampleRate == 8000f && clip.samples.length == 800)
    // nearest-neighbor: output sample i picks source sample 2i
    assert(clip.samples.toSeq == (0 until 800).map(i => 2 * i * 10 - 8000))
    assert(out(6L).bytes sameElements "junk".getBytes("UTF-8"))
    assert(out(7L).bytes sameElements src)
    // already at target rate: payload passes through untouched
    val same = Media.resampleAudio(Seq(audioRow(8L, src)).toDS(), 16000)
      .collect().head
    assert(same.bytes sameElements src)
  }
}
