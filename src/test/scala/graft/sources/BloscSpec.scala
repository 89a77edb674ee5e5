package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

class BloscSpec extends AnyFunSuite {

  private def patterned(n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i / 7) % 251).toByte)

  private def randomBytes(n: Int, seed: Long): Array[Byte] = {
    val r = new scala.util.Random(seed)
    val a = new Array[Byte](n)
    r.nextBytes(a)
    a
  }

  for (cname <- Seq("lz4", "zstd", "zlib");
       typesize <- Seq(1, 2, 4, 8);
       shuffle <- Seq(true, false)) {
    test(s"roundtrip $cname typesize=$typesize shuffle=$shuffle") {
      for (n <- Seq(0, 1, 5, 256, 4096, 100000)) {
        val data = patterned(n)
        val enc = Blosc.encode(data, typesize, cname, shuffle = shuffle)
        assert(Blosc.decode(enc).sameElements(data), s"n=$n")
      }
    }
  }

  test("multi-block buffer (> 1 MiB) with leftover block") {
    // 2.5 MiB of compressible doubles: 3 blocks, last one short and
    // therefore unsplit — exercises the leftover-stream path both ways.
    val n = (2.5 * (1 << 20)).toInt / 8 * 8
    val data = patterned(n)
    val enc = Blosc.encode(data, 8, "lz4", shuffle = true)
    assert(enc.length < n / 2, "compressible data should compress")
    assert(Blosc.decode(enc).sameElements(data))
  }

  test("incompressible data falls back to memcpy mode") {
    val data = randomBytes(4096, seed = 7)
    val enc = Blosc.encode(data, 4, "lz4", shuffle = true)
    assert(enc.length == data.length + 16, "memcpy frame = nbytes + header")
    assert((enc(2) & 0x02) != 0, "memcpy flag set")
    assert(Blosc.decode(enc).sameElements(data))
  }

  test("shuffle transpose is an exact inverse incl. remainder bytes") {
    for (typesize <- Seq(2, 3, 4, 8); n <- Seq(6, 7, 17, 64, 1000)) {
      val data = randomBytes(n, seed = n * typesize)
      val sh = new Array[Byte](n)
      val back = new Array[Byte](n)
      Blosc.shuffleBytes(typesize, data, 0, n, sh)
      Blosc.unshuffle(typesize, sh, n, back, 0)
      assert(back.sameElements(data), s"typesize=$typesize n=$n")
    }
  }

  test("decodes a hand-assembled unsplit zlib frame (not our encoder's shape)") {
    // Frame laid out straight from the container spec: 3 blocks of 16
    // bytes + an 8-byte leftover, zlib codec, no shuffle, dont-split.
    val data = patterned(56)
    val blocksize = 16
    val streams = data.grouped(blocksize).map { block =>
      val d = new java.util.zip.Deflater(5)
      d.setInput(block); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](256)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      val z = out.toByteArray
      if (z.length >= block.length) (block.length, block) else (z.length, z)
    }.toSeq
    val headerLen = 16 + 4 * streams.length
    val total = headerLen + streams.map(4 + _._1).sum
    val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(2.toByte).put(1.toByte)
      .put(((3 << 5) | 0x10).toByte) // zlib, dont-split
      .put(1.toByte)
    bb.putInt(data.length).putInt(blocksize).putInt(total)
    var off = headerLen
    streams.foreach { case (len, _) => bb.putInt(off); off += 4 + len }
    streams.foreach { case (len, bytes) => bb.putInt(len); bb.put(bytes, 0, len) }
    assert(Blosc.decode(bb.array()).sameElements(data))
  }

  test("hand-assembled split+shuffle lz4 frame with a stored stream") {
    // typesize=2 over 512 bytes, single block, split into 2 lane
    // streams: lane 0 lz4-compressed, lane 1 deliberately stored
    // (cbytes == neblock) — the incompressible-stream marker.
    val n = 512
    val data = Array.tabulate(n)(i => ((i / 16) % 7).toByte)
    val typesize = 2
    val sh = new Array[Byte](n)
    Blosc.shuffleBytes(typesize, data, 0, n, sh)
    val neblock = n / typesize
    val lz = net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor()
    val c0buf = new Array[Byte](lz.maxCompressedLength(neblock))
    val c0len = lz.compress(sh, 0, neblock, c0buf, 0, c0buf.length)
    assert(c0len < neblock, "lane 0 must actually compress for this test")
    val headerLen = 16 + 4
    val total = headerLen + (4 + c0len) + (4 + neblock)
    val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(2.toByte).put(1.toByte)
      .put(((1 << 5) | 0x01).toByte) // lz4, byte-shuffle, split
      .put(typesize.toByte)
    bb.putInt(n).putInt(n).putInt(total)
    bb.putInt(headerLen)
    bb.putInt(c0len); bb.put(c0buf, 0, c0len)
    bb.putInt(neblock); bb.put(sh, neblock, neblock)
    assert(Blosc.decode(bb.array()).sameElements(data))
  }

  test("split-without-shuffle frame decodes (dont-split bit is the authority)") {
    // c-blosc's split decision is independent of shuffling: an lz4
    // frame with shuffle off can still split into typesize streams
    // (bit4 = 0). Streams are then consecutive raw lanes of the block.
    val n = 512
    val data = Array.tabulate(n)(i => ((i / 16) % 7).toByte)
    val typesize = 2
    val neblock = n / typesize
    val lz = net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor()
    val streams = (0 until typesize).map { s =>
      val buf = new Array[Byte](lz.maxCompressedLength(neblock))
      val len = lz.compress(data, s * neblock, neblock, buf, 0, buf.length)
      java.util.Arrays.copyOf(buf, len)
    }
    val headerLen = 16 + 4
    val total = headerLen + streams.map(4 + _.length).sum
    val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(2.toByte).put(1.toByte)
      .put((1 << 5).toByte) // lz4, NO shuffle, split (bit4 clear)
      .put(typesize.toByte)
    bb.putInt(n).putInt(n).putInt(total)
    bb.putInt(headerLen)
    streams.foreach { st => bb.putInt(st.length); bb.put(st) }
    assert(Blosc.decode(bb.array()).sameElements(data))
  }

  test("corrupted frames fail loudly, never return wrong-sized data") {
    val r = new scala.util.Random(1234)
    val good = Blosc.encode(patterned(4096), 4, "lz4", shuffle = true)
    var checked = 0
    (0 until 300).foreach { _ =>
      val frame = good.clone()
      // flip 1-4 random bytes anywhere in the frame
      (0 to r.nextInt(4)).foreach { _ =>
        frame(r.nextInt(frame.length)) = r.nextInt(256).toByte
      }
      try {
        val out = Blosc.decode(frame)
        // a decode that survives corruption must still honor nbytes
        val nbytes = java.nio.ByteBuffer.wrap(frame)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(4)
        assert(out.length == nbytes)
        checked += 1
      } catch {
        case _: IllegalArgumentException | _: IllegalStateException |
             _: net.jpountz.lz4.LZ4Exception |
             _: ArrayIndexOutOfBoundsException => checked += 1
      }
    }
    assert(checked == 300)
  }

  test("bit-shuffle and blosclz are rejected with explicit errors") {
    // header(16) + one bstart(4) + one stream header cb=0(4): enough
    // structure to reach the codec dispatch.
    val frame = new Array[Byte](24)
    val bb = ByteBuffer.wrap(frame).order(ByteOrder.LITTLE_ENDIAN)
    frame(0) = 2; frame(2) = 0x04; frame(3) = 4 // bitshuffle flag
    bb.putInt(4, 16); bb.putInt(8, 16); bb.putInt(12, 24)
    bb.putInt(16, 20) // bstart → stream at offset 20, cb = 0
    val e1 = intercept[IllegalArgumentException](Blosc.decode(frame))
    assert(e1.getMessage.contains("bit-shuffle"))
    frame(2) = 0x10 // dont-split, codec 0 = blosclz
    val e2 = intercept[IllegalArgumentException](Blosc.decode(frame))
    assert(e2.getMessage.contains("blosclz"))
  }
}
