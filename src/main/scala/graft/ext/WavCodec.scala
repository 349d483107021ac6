package graft.ext

/** Dependency-free WAV (RIFF/WAVE) codec — the real audio-decode step
  * behind qm04's audio-features stage. Like [[BmpCodec]] for images, WAV
  * is the audio format a container with no media libraries can honestly
  * decode: a RIFF container with a fixed `fmt ` chunk and raw PCM in the
  * `data` chunk.
  *
  * Scope: 16-bit signed little-endian PCM (format code 1), any channel
  * count and sample rate. Chunk walking is spec-faithful: unknown chunks
  * (LIST/INFO, fact, cue …) are skipped, odd-sized chunks consume their
  * pad byte, and `fmt ` must precede `data`. Anything else — float PCM,
  * ADPCM, 8/24-bit, missing chunks — throws IllegalArgumentException; a
  * decoder that silently guessed would be worse than none.
  *
  * All fields little-endian per the RIFF spec.
  */
object WavCodec {

  /** Decoded audio: `samples(ch)(i)` is sample i of channel ch (PCM
    * de-interleaved), so per-channel feature extraction never re-strides. */
  final case class Wav(sampleRate: Int, channels: Int, samples: Array[Array[Short]]) {
    def numSamples: Int = if (samples.isEmpty) 0 else samples(0).length
  }

  /** Encode channel-major 16-bit PCM as a canonical 44-byte-header WAV
    * (RIFF → fmt → data, samples interleaved frame by frame). */
  def encode(sampleRate: Int, samples: Array[Array[Short]]): Array[Byte] = {
    val channels = samples.length
    require(channels > 0, "need at least one channel")
    val n = samples(0).length
    require(samples.forall(_.length == n), "channels must be equal length")
    require(sampleRate > 0, s"bad sample rate $sampleRate")
    val dataSize = 2 * channels * n
    val b = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII"))
    b.putInt(36 + dataSize) // rest-of-file size
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII"))
    b.putInt(16)                 // PCM fmt chunk size
    b.putShort(1)                // format code: integer PCM
    b.putShort(channels.toShort)
    b.putInt(sampleRate)
    b.putInt(sampleRate * channels * 2) // byte rate
    b.putShort((channels * 2).toShort)  // block align
    b.putShort(16)               // bits per sample
    b.put("data".getBytes("US-ASCII"))
    b.putInt(dataSize)
    var i = 0
    while (i < n) {
      var ch = 0
      while (ch < channels) { b.putShort(samples(ch)(i)); ch += 1 }
      i += 1
    }
    b.array()
  }

  /** Decode a 16-bit PCM WAV, walking the RIFF chunk list. */
  def decode(bytes: Array[Byte]): Wav = {
    require(bytes.length >= 12, s"truncated WAV: ${bytes.length} bytes")
    val b = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourCC(off: Int): String =
      new String(bytes, off, 4, "US-ASCII")
    require(fourCC(0) == "RIFF", "bad RIFF magic")
    require(fourCC(8) == "WAVE", "not a WAVE file")
    var off = 12
    var sampleRate = -1
    var channels = -1
    var dataOff = -1
    var dataLen = -1
    while (off + 8 <= bytes.length && (sampleRate < 0 || dataOff < 0)) {
      val id = fourCC(off)
      val size = b.getInt(off + 4)
      require(size >= 0, s"bad chunk size $size for '$id'")
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too small: $size")
          val fmt = b.getShort(off + 8)
          require(fmt == 1, s"unsupported format code $fmt (integer PCM only)")
          channels = b.getShort(off + 10)
          sampleRate = b.getInt(off + 12)
          val bits = b.getShort(off + 22)
          require(bits == 16, s"unsupported bits/sample $bits (16-bit only)")
          require(channels > 0 && sampleRate > 0,
            s"bad fmt: $channels ch @ $sampleRate Hz")
        case "data" =>
          require(sampleRate > 0, "data chunk before fmt")
          dataOff = off + 8
          dataLen = size
        case _ => // LIST, fact, cue, … — skip
      }
      off += 8 + size + (size & 1) // odd chunks carry a pad byte
    }
    require(sampleRate > 0, "missing fmt chunk")
    require(dataOff >= 0, "missing data chunk")
    require(dataOff + dataLen <= bytes.length, "PCM data truncated")
    val frameBytes = 2 * channels
    require(dataLen % frameBytes == 0,
      s"data size $dataLen not a multiple of frame size $frameBytes")
    val n = dataLen / frameBytes
    val out = Array.fill(channels)(new Array[Short](n))
    var i = 0
    while (i < n) {
      var ch = 0
      while (ch < channels) {
        out(ch)(i) = b.getShort(dataOff + (i * channels + ch) * 2)
        ch += 1
      }
      i += 1
    }
    Wav(sampleRate, channels, out)
  }
}
