package graft.media

/** Pure-JVM RIFF/WAVE codec for the multimodal audio pipelines: a REAL
  * parser — RIFF header validation, chunk walk (unknown chunks skipped,
  * word-aligned), fmt parsing, PCM 8-bit (unsigned) and 16-bit LE
  * (signed) in any channel count — plus a minimal writer used to build
  * payloads. Decoding fails loudly on malformed containers; samples
  * come back channel-interleaved exactly as stored.
  *
  * This backs m01/m03 (payloads wrapped in a real WAV container and
  * parsed back on executors) — multimodal plumbing the reference has no
  * analog for.
  */
object Wav {

  final case class Audio(sampleRate: Int, channels: Int, bitsPerSample: Int,
                         /** interleaved; 8-bit: unsigned 0..255 stored as
                           * Int 0..255; 16-bit: signed -32768..32767 */
                         samples: Array[Int]) {
    def nFrames: Int = samples.length / channels
  }

  // ------------------------------------------------------------- encode

  def encode(a: Audio): Array[Byte] = {
    require(a.bitsPerSample == 8 || a.bitsPerSample == 16,
      s"PCM 8/16-bit only, got ${a.bitsPerSample}")
    require(a.channels >= 1, "need at least one channel")
    require(a.samples.length % a.channels == 0,
      "sample count must be a whole number of frames")
    val bytesPerSample = a.bitsPerSample / 8
    val dataLen = a.samples.length * bytesPerSample
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
    buf.putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII"))
    buf.putInt(16)                       // PCM fmt chunk size
    buf.putShort(1)                      // audio format: PCM
    buf.putShort(a.channels.toShort)
    buf.putInt(a.sampleRate)
    buf.putInt(a.sampleRate * a.channels * bytesPerSample) // byte rate
    buf.putShort((a.channels * bytesPerSample).toShort)    // block align
    buf.putShort(a.bitsPerSample.toShort)
    buf.put("data".getBytes("US-ASCII"))
    buf.putInt(dataLen)
    var i = 0
    while (i < a.samples.length) {
      if (a.bitsPerSample == 8) buf.put((a.samples(i) & 0xff).toByte)
      else buf.putShort(a.samples(i).toShort)
      i += 1
    }
    buf.array()
  }

  // ------------------------------------------------------------- decode

  /** Parse a WAV byte stream. Fails loudly on a bad RIFF/WAVE header,
    * non-PCM format, missing fmt/data chunks, or truncated data. */
  def decode(wav: Array[Byte]): Audio = {
    require(wav.length >= 12, "truncated WAV: no RIFF header")
    val buf = java.nio.ByteBuffer.wrap(wav)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val riff = new Array[Byte](4)
    buf.get(riff)
    require(new String(riff, "US-ASCII") == "RIFF", "not a WAV: missing RIFF")
    val riffLen = buf.getInt
    require(riffLen >= 4 && riffLen <= wav.length - 8,
      s"bad RIFF length $riffLen for ${wav.length}-byte stream")
    val wave = new Array[Byte](4)
    buf.get(wave)
    require(new String(wave, "US-ASCII") == "WAVE", "not a WAV: missing WAVE")

    var channels = -1
    var sampleRate = -1
    var bits = -1
    var data: Array[Byte] = null
    while (buf.remaining() >= 8 && data == null) {
      val tagBytes = new Array[Byte](4)
      buf.get(tagBytes)
      val tag = new String(tagBytes, "US-ASCII")
      val len = buf.getInt
      require(len >= 0 && len <= buf.remaining(),
        s"truncated WAV: chunk $tag claims $len bytes, ${buf.remaining()} left")
      tag match {
        case "fmt " =>
          require(len >= 16, s"fmt chunk too short: $len")
          val fmtEnd = buf.position() + len
          val audioFormat = buf.getShort & 0xffff
          require(audioFormat == 1, s"only PCM supported, got format $audioFormat")
          channels = buf.getShort & 0xffff
          sampleRate = buf.getInt
          buf.getInt        // byte rate (derived)
          buf.getShort      // block align (derived)
          bits = buf.getShort & 0xffff
          require(bits == 8 || bits == 16, s"PCM 8/16-bit only, got $bits")
          require(channels >= 1, "need at least one channel")
          buf.position(fmtEnd + (len & 1)) // skip extensions + pad byte
        case "data" =>
          require(bits > 0, "WAV data chunk before fmt chunk")
          data = new Array[Byte](len)
          buf.get(data)
        case _ => // skip unknown chunk (LIST, fact, ...) + pad byte
          buf.position(buf.position() + len + (len & 1))
      }
    }
    require(data != null, "WAV missing data chunk")
    val bytesPerSample = bits / 8
    require(data.length % (bytesPerSample * channels) == 0,
      s"WAV data length ${data.length} is not a whole number of frames")
    val n = data.length / bytesPerSample
    val samples = new Array[Int](n)
    var i = 0
    if (bits == 8) {
      while (i < n) { samples(i) = data(i) & 0xff; i += 1 }
    } else {
      val db = java.nio.ByteBuffer.wrap(data)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      while (i < n) { samples(i) = db.getShort.toInt; i += 1 }
    }
    Audio(sampleRate, channels, bits, samples)
  }
}
