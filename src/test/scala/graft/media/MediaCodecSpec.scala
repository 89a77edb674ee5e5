package graft.media

import org.scalatest.funsuite.AnyFunSuite

/** The PNG/WAV codecs behind the m-suite multimodal queries: real
  * decoders, so they get real tests — exhaustive filter round-trips,
  * an independent-implementation cross-check (the JDK's ImageIO PNG
  * writer picks its own per-row filters), and loud-failure cases. */
class MediaCodecSpec extends AnyFunSuite {

  private def pix(n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 37 + (i * i) % 251) % 256).toByte)

  test("PNG round-trip: every filter type, every supported color type") {
    for {
      (w, h, ch) <- Seq((7, 5, 1), (16, 4, 3), (3, 9, 4), (1, 1, 1))
      filter <- 0 to 4
    } {
      val img = Png.Image(w, h, ch, pix(w * h * ch))
      val out = Png.decode(Png.encode(img, filter = filter))
      assert(out.width == w && out.height == h && out.channels == ch,
        s"dims for filter=$filter ch=$ch")
      assert(out.pixels.toSeq == img.pixels.toSeq,
        s"pixels for filter=$filter ${w}x${h}x$ch")
    }
  }

  test("PNG decode cross-checks against the JDK ImageIO writer") {
    // ImageIO writes real-world PNGs (its own filter choices, its own
    // chunk layout) — our decoder must read them bit-exactly.
    import java.awt.image.BufferedImage
    val w = 23
    val h = 11
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    val ps = pix(w * h * 3)
    var i = 0
    while (i < w * h) {
      val r = ps(i * 3) & 0xff
      val g = ps(i * 3 + 1) & 0xff
      val b = ps(i * 3 + 2) & 0xff
      bi.setRGB(i % w, i / w, (r << 16) | (g << 8) | b)
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "png", bos))
    val img = Png.decode(bos.toByteArray)
    assert(img.width == w && img.height == h && img.channels == 3)
    i = 0
    while (i < w * h) {
      val rgb = bi.getRGB(i % w, i / w)
      assert((img.pixels(i * 3) & 0xff) == ((rgb >> 16) & 0xff), s"r at $i")
      assert((img.pixels(i * 3 + 1) & 0xff) == ((rgb >> 8) & 0xff), s"g at $i")
      assert((img.pixels(i * 3 + 2) & 0xff) == (rgb & 0xff), s"b at $i")
      i += 1
    }
    // and ImageIO reads OUR encoder's output
    val ours = Png.encode(Png.Image(w, h, 3, ps), filter = 4)
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(ours))
    assert(back.getWidth == w && back.getHeight == h)
    i = 0
    while (i < w * h) {
      val rgb = back.getRGB(i % w, i / w)
      assert((rgb & 0xffffff) ==
        (((ps(i * 3) & 0xff) << 16) | ((ps(i * 3 + 1) & 0xff) << 8) |
          (ps(i * 3 + 2) & 0xff)), s"ImageIO readback at $i")
      i += 1
    }
  }

  test("PNG malformed containers fail loudly") {
    val good = Png.encode(Png.Image(4, 4, 1, pix(16)))
    // bad signature
    val sig = good.clone(); sig(0) = 0x42
    assert(intercept[IllegalArgumentException](Png.decode(sig))
      .getMessage.contains("signature"))
    // flipped pixel byte inside IDAT -> CRC mismatch
    val corrupt = good.clone()
    corrupt(good.length - 16) = (corrupt(good.length - 16) ^ 0x7f).toByte
    assert(intercept[IllegalArgumentException](Png.decode(corrupt))
      .getMessage.contains("CRC"))
    // truncated stream
    assert(intercept[IllegalArgumentException](
      Png.decode(good.take(good.length - 10))).getMessage.contains("truncated"))
    // 16-bit depth rejected (hand-patch IHDR depth byte + fix its CRC)
    val deep = good.clone()
    deep(8 + 8 + 8) = 16.toByte // sig(8) + len/tag(8) + w/h(8) -> depth
    val crc = new java.util.zip.CRC32()
    crc.update(deep, 12, 4 + 13)
    val cb = java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array()
    System.arraycopy(cb, 0, deep, 29, 4)
    assert(intercept[IllegalArgumentException](Png.decode(deep))
      .getMessage.contains("depth"))
  }

  test("WAV round-trip: 8/16-bit, mono/stereo, unknown chunks skipped") {
    val m8 = Wav.Audio(8000, 1, 8, Array.tabulate(321)(i => (i * 7) % 256))
    val d8 = Wav.decode(Wav.encode(m8))
    assert(d8.sampleRate == 8000 && d8.channels == 1 && d8.bitsPerSample == 8)
    assert(d8.samples.toSeq == m8.samples.toSeq)
    val s16 = Wav.Audio(44100, 2, 16,
      Array.tabulate(500)(i => ((i * 131) % 65536) - 32768))
    val d16 = Wav.decode(Wav.encode(s16))
    assert(d16.sampleRate == 44100 && d16.channels == 2 && d16.bitsPerSample == 16)
    assert(d16.samples.toSeq == s16.samples.toSeq)
    // splice an unknown odd-length chunk between fmt and data: the
    // parser must skip it (word-aligned) and still find the data
    val enc = Wav.encode(m8)
    val extra = java.nio.ByteBuffer.allocate(8 + 3 + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    extra.put("LIST".getBytes("US-ASCII")).putInt(3)
      .put(Array[Byte](1, 2, 3, 0))
    val spliced = new java.io.ByteArrayOutputStream()
    spliced.write(enc, 0, 36)               // RIFF..fmt chunk end
    spliced.write(extra.array())
    spliced.write(enc, 36, enc.length - 36) // data chunk
    val sp = spliced.toByteArray
    // fix the RIFF length for the inserted bytes
    val bb = java.nio.ByteBuffer.wrap(sp).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, sp.length - 8)
    assert(Wav.decode(sp).samples.toSeq == m8.samples.toSeq)
  }

  test("WAV malformed containers fail loudly") {
    val good = Wav.encode(Wav.Audio(8000, 1, 8, Array.tabulate(64)(_ % 256)))
    assert(intercept[IllegalArgumentException](
      Wav.decode("JUNK".getBytes ++ good.drop(4))).getMessage.contains("RIFF"))
    val trunc = intercept[IllegalArgumentException](Wav.decode(good.take(30)))
    assert(trunc.getMessage.contains("truncated") ||
      trunc.getMessage.contains("RIFF length"))
    // non-PCM format code
    val alaw = good.clone()
    alaw(20) = 6 // fmt audioFormat -> A-law
    assert(intercept[IllegalArgumentException](Wav.decode(alaw))
      .getMessage.contains("PCM"))
  }
}
