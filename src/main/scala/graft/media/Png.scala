package graft.media

import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM PNG codec (RFC 2083) for the multimodal pipelines: a REAL
  * decoder — signature + chunk walk with CRC verification, zlib
  * inflate of the IDAT stream, and per-row unfiltering of all five
  * filter types (None/Sub/Up/Average/Paeth) — for 8-bit greyscale
  * (color type 0), RGB (2), and RGBA (6) non-interlaced images, plus a
  * minimal encoder used to build payloads. Decoding is bit-exact and
  * total: malformed containers fail loudly, never return garbage
  * pixels. PngSpec cross-checks decode against the JDK's ImageIO
  * writer (which picks its own row filters), so every filter path is
  * exercised against an independent implementation.
  *
  * This backs the m-suite queries (m02 wraps its frame bytes in a real
  * PNG and decodes it back on executors) — the part of the brief the
  * reference has no analog for (multimodal columns; xarray-beam is
  * numeric-array-only).
  */
object Png {

  final case class Image(width: Int, height: Int, channels: Int,
                         pixels: Array[Byte]) {
    require(pixels.length == width * height * channels,
      s"pixel buffer ${pixels.length} != $width x $height x $channels")
  }

  private val SIGNATURE =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

  private def colorType(channels: Int): Int = channels match {
    case 1 => 0
    case 3 => 2
    case 4 => 6
    case n => throw new IllegalArgumentException(
      s"unsupported channel count $n (grey=1, rgb=3, rgba=4)")
  }

  private def channelsOf(colorType: Int): Int = colorType match {
    case 0 => 1
    case 2 => 3
    case 6 => 4
    case other => throw new IllegalArgumentException(
      s"unsupported PNG color type $other (grey/rgb/rgba only)")
  }

  // ------------------------------------------------------------- encode

  /** Encode an 8-bit image as a non-interlaced PNG. `filter` picks the
    * row filter byte (0-4) applied uniformly — the decoder must accept
    * any of them, so the spec round-trips each. */
  def encode(img: Image, filter: Int = 0, level: Int = 6): Array[Byte] = {
    require(filter >= 0 && filter <= 4, s"filter must be 0..4, got $filter")
    val bpp = img.channels
    val stride = img.width * bpp
    val raw = new Array[Byte]((stride + 1) * img.height)
    var y = 0
    while (y < img.height) {
      raw(y * (stride + 1)) = filter.toByte
      var x = 0
      while (x < stride) {
        val cur = img.pixels(y * stride + x) & 0xff
        val left = if (x >= bpp) img.pixels(y * stride + x - bpp) & 0xff else 0
        val up = if (y > 0) img.pixels((y - 1) * stride + x) & 0xff else 0
        val ul = if (x >= bpp && y > 0) img.pixels((y - 1) * stride + x - bpp) & 0xff else 0
        val enc = filter match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, ul)
        }
        raw(y * (stride + 1) + 1 + x) = enc.toByte
        x += 1
      }
      y += 1
    }
    val deflater = new Deflater(level)
    deflater.setInput(raw)
    deflater.finish()
    val zOut = new java.io.ByteArrayOutputStream()
    val zBuf = new Array[Byte](8192)
    while (!deflater.finished()) zOut.write(zBuf, 0, deflater.deflate(zBuf))
    deflater.end()

    val out = new java.io.ByteArrayOutputStream()
    out.write(SIGNATURE, 0, SIGNATURE.length)
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(img.width).putInt(img.height)
      .put(8.toByte).put(colorType(img.channels).toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive, no interlace
    writeChunk(out, "IHDR", ihdr.array())
    writeChunk(out, "IDAT", zOut.toByteArray)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def writeChunk(out: java.io.ByteArrayOutputStream, tag: String,
                         body: Array[Byte]): Unit = {
    val hdr = java.nio.ByteBuffer.allocate(8)
    hdr.putInt(body.length)
    hdr.put(tag.getBytes("US-ASCII"))
    out.write(hdr.array(), 0, 8)
    out.write(body, 0, body.length)
    val crc = new CRC32()
    crc.update(tag.getBytes("US-ASCII"))
    crc.update(body)
    val tail = java.nio.ByteBuffer.allocate(4)
    tail.putInt(crc.getValue.toInt)
    out.write(tail.array(), 0, 4)
  }

  // ------------------------------------------------------------- decode

  /** Decode a PNG byte stream. Fails loudly (IllegalArgumentException)
    * on a bad signature, chunk CRC mismatch, unsupported bit depth /
    * color type / interlacing, or truncated pixel data. */
  def decode(png: Array[Byte]): Image = {
    require(png.length >= 8 && SIGNATURE.indices.forall(i => png(i) == SIGNATURE(i)),
      "not a PNG: bad signature")
    val buf = java.nio.ByteBuffer.wrap(png, 8, png.length - 8)
    var width = -1
    var height = -1
    var channels = -1
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd) {
      require(buf.remaining() >= 12, "truncated PNG: missing chunk header")
      val len = buf.getInt
      require(len >= 0 && len <= buf.remaining() - 8,
        s"truncated PNG: chunk length $len exceeds remaining bytes")
      val tagBytes = new Array[Byte](4)
      buf.get(tagBytes)
      val tag = new String(tagBytes, "US-ASCII")
      val body = new Array[Byte](len)
      buf.get(body)
      val expected = buf.getInt
      val crc = new CRC32()
      crc.update(tagBytes)
      crc.update(body)
      require(crc.getValue.toInt == expected, s"PNG chunk $tag CRC mismatch")
      tag match {
        case "IHDR" =>
          val b = java.nio.ByteBuffer.wrap(body)
          width = b.getInt
          height = b.getInt
          val depth = b.get() & 0xff
          val ct = b.get() & 0xff
          val interlace = { b.get(); b.get(); b.get() & 0xff } // skip comp/filter
          require(depth == 8, s"unsupported PNG bit depth $depth (8 only)")
          require(interlace == 0, "interlaced PNG not supported")
          channels = channelsOf(ct)
          require(width > 0 && height > 0, s"bad PNG dims $width x $height")
        case "IDAT" => idat.write(body, 0, len)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunks skipped (CRC still verified)
      }
    }
    require(width > 0, "PNG missing IHDR")

    val bpp = channels
    val stride = width * bpp
    val raw = new Array[Byte]((stride + 1) * height)
    val inflater = new Inflater()
    inflater.setInput(idat.toByteArray)
    var off = 0
    while (!inflater.finished() && off < raw.length) {
      val n = inflater.inflate(raw, off, raw.length - off)
      require(n > 0 || inflater.finished(),
        "truncated or corrupt PNG pixel stream")
      off += n
    }
    inflater.end()
    require(off == raw.length,
      s"PNG pixel stream has $off bytes, expected ${raw.length}")

    val px = new Array[Byte](stride * height)
    var y = 0
    while (y < height) {
      val f = raw(y * (stride + 1)) & 0xff
      require(f <= 4, s"bad PNG row filter $f")
      var x = 0
      while (x < stride) {
        val v = raw(y * (stride + 1) + 1 + x) & 0xff
        val left = if (x >= bpp) px(y * stride + x - bpp) & 0xff else 0
        val up = if (y > 0) px((y - 1) * stride + x) & 0xff else 0
        val ul = if (x >= bpp && y > 0) px((y - 1) * stride + x - bpp) & 0xff else 0
        val dec = f match {
          case 0 => v
          case 1 => v + left
          case 2 => v + up
          case 3 => v + (left + up) / 2
          case 4 => v + paeth(left, up, ul)
        }
        px(y * stride + x) = dec.toByte
        x += 1
      }
      y += 1
    }
    Image(width, height, channels, px)
  }

  /** Paeth predictor (RFC 2083 §6.6). */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a)
    val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }
}
