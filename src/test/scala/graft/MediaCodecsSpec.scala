package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.io.MediaCodecs.{PngCodec, VideoContainer, WavCodec}
import graft.operators.Multimodal

/** The media codecs must be REAL: round-trip their own output, parse
  * foreign-encoded files (javax.imageio PNGs use adaptive scanline filters
  * and real deflate — nothing like our canonical encoder's output), and
  * keep the encoded sizes on the closed forms the oracle computes. */
class MediaCodecsSpec extends AnyFunSuite {

  test("PNG round-trip: encode → decode returns the exact pixels") {
    val w = 21; val h = 13
    val px = Array.tabulate(w * h * 3)(i => ((i * 7 + 3) % 256).toByte)
    val img = PngCodec.decode(PngCodec.encode(w, h, px))
    assert(img.width === w && img.height === h && img.channels === 3)
    assert(img.pixels.toSeq === px.toSeq)
  }

  test("decoder parses a PNG from a foreign encoder (javax.imageio)") {
    val w = 20; val h = 11
    val bi = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      bi.setRGB(x, y,
        (((x * 31 + y * 17) % 256) << 16) | (((x * 5 + y * 3) % 256) << 8) | ((x + y) % 256))
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "png", baos))
    val img = PngCodec.decode(baos.toByteArray)
    assert(img.width === w && img.height === h)
    for (y <- 0 until h; x <- 0 until w) {
      val base = (y * w + x) * img.channels
      assert((img.pixels(base) & 0xff) === (x * 31 + y * 17) % 256, s"R at ($x,$y)")
      assert((img.pixels(base + 1) & 0xff) === (x * 5 + y * 3) % 256, s"G at ($x,$y)")
      assert((img.pixels(base + 2) & 0xff) === (x + y) % 256, s"B at ($x,$y)")
    }
  }

  test("WAV round-trip, and the chunk walk skips an inserted LIST chunk") {
    val samples = Array.tabulate(300)(t => ((t * 13) % 256).toShort)
    val wav = WavCodec.encode(8000, samples)
    val a = WavCodec.decode(wav)
    assert(a.channels === 1 && a.rate === 8000)
    assert(a.samples.toSeq === samples.map(_.toInt).toSeq)
    // splice a LIST chunk between fmt (ends at byte 36) and data — a real
    // in-the-wild layout the decoder must walk past
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val spliced = wav.take(36) ++ list ++ wav.drop(36)
    assert(WavCodec.decode(spliced).samples.toSeq === samples.map(_.toInt).toSeq)
  }

  test("video container round-trips real PNG frames") {
    val frames = (0 until 3).map(f =>
      PngCodec.encode(8, 4, Array.tabulate(8 * 4 * 3)(i => ((i + f * 7) % 256).toByte)))
    val dec = VideoContainer.decode(VideoContainer.encode(frames))
    assert(dec.length === 3)
    (0 until 3).foreach(f => assert(dec(f).toSeq === frames(f).toSeq))
  }

  test("corrupt or truncated inputs fail cleanly, not with index errors or loops") {
    val png = PngCodec.encode(10, 6, Array.tabulate(10 * 6 * 3)(i => (i % 256).toByte))
    intercept[IllegalArgumentException](PngCodec.decode(png.take(60)))
    val wav = WavCodec.encode(8000, Array.tabulate(100)(t => t.toShort))
    intercept[IllegalArgumentException](WavCodec.decode(wav.take(50)))
    val vid = VideoContainer.encode(Seq(png))
    // corrupt the first frame's length prefix to a huge value
    val bad = vid.clone(); bad(8) = 0x7f.toByte
    intercept[IllegalArgumentException](VideoContainer.decode(bad))
    intercept[IllegalArgumentException](VideoContainer.decode(vid.take(10)))
  }

  test("synthesized payload sizes match the oracle's closed forms") {
    for (id <- Seq(0L, 1L, 2L, 3L, 50L, 499L, 1234L)) {
      val n = Multimodal.payload(id).length
      val exp = (id % 3) match {
        case 0 => Multimodal.imageH(id) * (1 + 3 * Multimodal.imageW(id)) + 68
        case 1 => 44 + 2 * Multimodal.audioSamples(id)
        case _ => 8 + Multimodal.videoFrames(id) *
          (4 + Multimodal.videoH(id) * (1 + 3 * Multimodal.videoW(id)) + 68)
      }
      assert(n === exp, s"id=$id")
    }
  }

  test("decoded pixel/sample values equal the synthesis formula (decode is lossless)") {
    // image id 3: PNG inflate+defilter must hand back byteAt exactly
    val img = PngCodec.decode(Multimodal.payload(3L))
    assert(img.pixels.indices.forall(i => (img.pixels(i) & 0xff) == Multimodal.byteAt(3L, 0, i)))
    // audio id 4: PCM samples
    val a = WavCodec.decode(Multimodal.payload(4L))
    assert(a.samples.indices.forall(t => a.samples(t) == Multimodal.byteAt(4L, 0, t)))
    // video id 5: frame 2's pixels carry the frame index
    val f2 = PngCodec.decode(VideoContainer.decode(Multimodal.payload(5L))(2))
    assert(f2.pixels.indices.forall(i => (f2.pixels(i) & 0xff) == Multimodal.byteAt(5L, 2, i)))
  }
}
