package graft.io

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.nio.ByteOrder.LITTLE_ENDIAN
import java.nio.charset.StandardCharsets.US_ASCII
import java.util.zip.{Adler32, CRC32, Inflater}

/** Real media codecs for the multimodal pipeline stages — pure JVM, no
  * external libraries.
  *
  * The DECODE side is fully general: [[PngCodec.decode]] walks chunks,
  * verifies every CRC, inflates any zlib stream, and undoes all five PNG
  * filter types, so it parses PNGs from foreign encoders (javax.imageio is
  * exercised in tests), not just its own output. [[WavCodec.decode]] walks
  * RIFF chunks (tolerating extras like LIST/fact) and reads 16-bit PCM.
  *
  * The ENCODE side is deliberately canonical: scanline filter 0 and a zlib
  * stream made of STORED deflate blocks — still a valid stream for any
  * inflater, but one whose length is a CLOSED-FORM function of the payload
  * (2 + 5·ceil(n/65535) + n + 4), which keeps the correctness oracle's
  * n_bytes computable in plain SQL while the bytes stay honest.
  */
object MediaCodecs {

  // ---------------------------------------------------------------- PNG ----

  object PngCodec {

    private val Signature: Array[Byte] =
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    /** Decoded image: `pixels` is defiltered row-major interleaved
      * (h × w × channels) — 3 for RGB (color type 2), 4 for RGBA (6). */
    case class Image(width: Int, height: Int, channels: Int, pixels: Array[Byte])

    /** Encode 8-bit RGB pixels as a real PNG (signature, IHDR, one IDAT of
      * stored-block zlib, IEND — all CRCs genuine). */
    def encode(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
      require(rgb.length == w * h * 3, s"need ${w * h * 3} RGB bytes, got ${rgb.length}")
      val stride = w * 3
      val raw = new Array[Byte](h * (1 + stride)) // filter byte 0 per scanline
      var y = 0
      while (y < h) {
        System.arraycopy(rgb, y * stride, raw, y * (1 + stride) + 1, stride)
        y += 1
      }
      val ihdr = ByteBuffer.allocate(13)
        .putInt(w).putInt(h)
        .put(8.toByte)  // bit depth
        .put(2.toByte)  // color type: truecolor RGB
        .put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
        .array()
      val out = new ByteArrayOutputStream()
      out.write(Signature, 0, Signature.length)
      writeChunk(out, "IHDR", ihdr)
      writeChunk(out, "IDAT", zlibStored(raw))
      writeChunk(out, "IEND", Array.emptyByteArray)
      out.toByteArray
    }

    /** Parse any 8-bit RGB/RGBA PNG: chunk walk with CRC verification,
      * multi-IDAT concatenation, real inflate, all 5 filter types undone. */
    def decode(png: Array[Byte]): Image = {
      require(png.length > 8 && Signature.indices.forall(i => png(i) == Signature(i)),
        "not a PNG (bad signature)")
      var w = 0; var h = 0; var colorType = -1
      val idat = new ByteArrayOutputStream()
      var pos = 8
      while (pos + 12 <= png.length) {
        val len = be32(png, pos)
        // corrupt/truncated input must fail cleanly (and a huge or negative
        // length field must not walk the cursor backwards)
        require(len >= 0 && pos + 12 + len <= png.length,
          s"corrupt PNG: chunk length $len at offset $pos overruns ${png.length} bytes")
        val typ = new String(png, pos + 4, 4, US_ASCII)
        val crc = new CRC32()
        crc.update(png, pos + 4, 4 + len)
        require(crc.getValue.toInt == be32(png, pos + 8 + len), s"bad CRC in $typ chunk")
        typ match {
          case "IHDR" =>
            w = be32(png, pos + 8); h = be32(png, pos + 12)
            val bitDepth = png(pos + 16) & 0xff
            colorType = png(pos + 17) & 0xff
            require(bitDepth == 8, s"unsupported bit depth $bitDepth")
            require(colorType == 2 || colorType == 6, s"unsupported color type $colorType")
            require((png(pos + 18) & 0xff) == 0 && (png(pos + 20) & 0xff) == 0,
              "unsupported compression/interlace")
          case "IDAT" => idat.write(png, pos + 8, len)
          case _      => () // ancillary chunks skipped
        }
        pos += 12 + len
      }
      require(colorType >= 0 && idat.size() > 0, "missing IHDR or IDAT")
      val bpp = if (colorType == 6) 4 else 3
      val raw = inflate(idat.toByteArray, h * (1 + w * bpp))
      Image(w, h, bpp, defilter(raw, w, h, bpp))
    }

    private def writeChunk(out: ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
      val t = typ.getBytes(US_ASCII)
      out.write(ByteBuffer.allocate(4).putInt(data.length).array(), 0, 4)
      out.write(t, 0, 4)
      out.write(data, 0, data.length)
      val crc = new CRC32()
      crc.update(t); crc.update(data)
      out.write(ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array(), 0, 4)
    }

    private def zlibStored(raw: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      out.write(0x78); out.write(0x01) // CMF/FLG, (0x7801 % 31 == 0)
      var off = 0
      do {
        val len = math.min(65535, raw.length - off)
        out.write(if (off + len == raw.length) 1 else 0) // BFINAL + BTYPE=00
        out.write(len & 0xff); out.write((len >> 8) & 0xff)
        out.write(~len & 0xff); out.write((~len >> 8) & 0xff)
        out.write(raw, off, len)
        off += len
      } while (off < raw.length)
      val ad = new Adler32()
      ad.update(raw)
      out.write(ByteBuffer.allocate(4).putInt(ad.getValue.toInt).array(), 0, 4)
      out.toByteArray
    }

    private def inflate(z: Array[Byte], expected: Int): Array[Byte] = {
      val inf = new Inflater()
      inf.setInput(z)
      val out = new Array[Byte](expected)
      var n = 0
      while (n < expected && !inf.finished()) {
        val k = inf.inflate(out, n, expected - n)
        require(k > 0 || inf.finished(), "truncated zlib stream")
        n += k
      }
      inf.end()
      require(n == expected, s"decoded $n of $expected raw bytes")
      out
    }

    /** Undo PNG scanline filtering (types 0–4: None/Sub/Up/Average/Paeth). */
    private def defilter(raw: Array[Byte], w: Int, h: Int, bpp: Int): Array[Byte] = {
      val stride = w * bpp
      val out = new Array[Byte](h * stride)
      var y = 0
      while (y < h) {
        val ft = raw(y * (stride + 1)) & 0xff
        val rowIn = y * (stride + 1) + 1
        val rowOut = y * stride
        var x = 0
        while (x < stride) {
          val rw = raw(rowIn + x) & 0xff
          val a = if (x >= bpp) out(rowOut + x - bpp) & 0xff else 0
          val b = if (y > 0) out(rowOut - stride + x) & 0xff else 0
          val c = if (x >= bpp && y > 0) out(rowOut - stride + x - bpp) & 0xff else 0
          val v = ft match {
            case 0 => rw
            case 1 => rw + a
            case 2 => rw + b
            case 3 => rw + (a + b) / 2
            case 4 => rw + paeth(a, b, c)
            case _ => throw new IllegalArgumentException(s"unknown PNG filter $ft")
          }
          out(rowOut + x) = (v & 0xff).toByte
          x += 1
        }
        y += 1
      }
      out
    }

    private def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
  }

  // ---------------------------------------------------------------- WAV ----

  object WavCodec {

    case class Audio(channels: Int, rate: Int, samples: Array[Int])

    /** Encode mono 16-bit PCM as a canonical RIFF/WAVE file. */
    def encode(rate: Int, samples: Array[Short]): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = ByteBuffer.allocate(44 + dataLen).order(LITTLE_ENDIAN)
      bb.put("RIFF".getBytes(US_ASCII)).putInt(36 + dataLen).put("WAVE".getBytes(US_ASCII))
      bb.put("fmt ".getBytes(US_ASCII)).putInt(16)
        .putShort(1)              // PCM
        .putShort(1)              // mono
        .putInt(rate)
        .putInt(rate * 2)         // byte rate
        .putShort(2)              // block align
        .putShort(16)             // bits per sample
      bb.put("data".getBytes(US_ASCII)).putInt(dataLen)
      var i = 0
      while (i < samples.length) { bb.putShort(samples(i)); i += 1 }
      bb.array()
    }

    /** Parse a RIFF/WAVE file: chunk walk (extra chunks like LIST/fact are
      * skipped, odd-length chunks padded per RIFF), 16-bit PCM samples. */
    def decode(bytes: Array[Byte]): Audio = {
      val bb = ByteBuffer.wrap(bytes).order(LITTLE_ENDIAN)
      require(tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "WAVE", "not a RIFF/WAVE file")
      var channels = 0; var rate = 0; var samples: Array[Int] = null
      var pos = 12
      while (pos + 8 <= bytes.length) {
        val id = tag(bytes, pos)
        val len = bb.getInt(pos + 4)
        require(len >= 0 && pos + 8 + len <= bytes.length,
          s"corrupt WAV: chunk '$id' length $len at offset $pos overruns ${bytes.length} bytes")
        id match {
          case "fmt " =>
            require(len >= 16, s"corrupt WAV: fmt chunk too short ($len)")
            require(bb.getShort(pos + 8) == 1, "only PCM supported")
            channels = bb.getShort(pos + 10)
            rate = bb.getInt(pos + 12)
            require(bb.getShort(pos + 22) == 16, "only 16-bit samples supported")
          case "data" =>
            val n = len / 2
            samples = new Array[Int](n)
            var i = 0
            while (i < n) { samples(i) = bb.getShort(pos + 8 + 2 * i).toInt; i += 1 }
          case _ => () // LIST, fact, ... skipped
        }
        pos += 8 + len + (len & 1) // RIFF chunks are word-aligned
      }
      require(channels > 0 && samples != null, "missing fmt or data chunk")
      Audio(channels, rate, samples)
    }

    private def tag(bytes: Array[Byte], at: Int): String = new String(bytes, at, 4, US_ASCII)
  }

  // ---------------------------------------------- video frame container ----

  /** Minimal frame container for the video stage: "GRFV" magic, big-endian
    * frame count, then length-prefixed frames — each frame a REAL PNG. The
    * MJPEG shape (intra-only, every frame independently decodable) without
    * an inter-frame codec, which no pure-JVM library provides. */
  object VideoContainer {

    private val Magic = "GRFV".getBytes(US_ASCII)

    def encode(frames: Seq[Array[Byte]]): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      out.write(Magic, 0, 4)
      out.write(ByteBuffer.allocate(4).putInt(frames.length).array(), 0, 4)
      frames.foreach { f =>
        out.write(ByteBuffer.allocate(4).putInt(f.length).array(), 0, 4)
        out.write(f, 0, f.length)
      }
      out.toByteArray
    }

    def decode(bytes: Array[Byte]): Seq[Array[Byte]] = {
      require(bytes.length >= 8 && Magic.indices.forall(i => bytes(i) == Magic(i)),
        "not a GRFV container")
      val n = be32(bytes, 4)
      require(n >= 0, s"corrupt container: negative frame count $n")
      var pos = 8
      (0 until n).map { _ =>
        require(pos + 4 <= bytes.length, s"corrupt container: truncated at frame offset $pos")
        val len = be32(bytes, pos)
        require(len >= 0 && pos + 4 + len <= bytes.length,
          s"corrupt container: frame length $len at offset $pos overruns ${bytes.length} bytes")
        val f = java.util.Arrays.copyOfRange(bytes, pos + 4, pos + 4 + len)
        pos += 4 + len
        f
      }
    }
  }

  private def be32(bytes: Array[Byte], at: Int): Int =
    ((bytes(at) & 0xff) << 24) | ((bytes(at + 1) & 0xff) << 16) |
      ((bytes(at + 2) & 0xff) << 8) | (bytes(at + 3) & 0xff)
}
