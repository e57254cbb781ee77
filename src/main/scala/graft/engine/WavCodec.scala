package graft.engine

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM WAV (RIFF/WAVE, 16-bit PCM) encoder/decoder — the audio
  * twin of [[BmpCodec]]. RIFF is a chunked container: a 12-byte RIFF
  * header, then tagged chunks; a canonical PCM file carries an
  * `fmt ` chunk (format 1 = integer PCM, channel count, sample rate,
  * block align) and a `data` chunk of little-endian interleaved
  * samples. [[decode]] WALKS the chunk list rather than assuming
  * fixed offsets, so files with extra chunks (LIST/INFO metadata —
  * common in the wild) parse correctly; encode writes the canonical
  * 44-byte-header form.
  */
object WavCodec {

  /** Decoded clip: interleaved 16-bit samples (frame-major:
    * frame i channel c = samples(i * channels + c)). */
  final case class Wav(sampleRate: Int, channels: Int,
      samples: Array[Short])

  def headerBytes: Int = 44

  def fileSize(nSamples: Int): Int = headerBytes + 2 * nSamples

  /** Encode interleaved 16-bit PCM as a canonical WAV file. */
  def encode(sampleRate: Int, channels: Int,
      samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0, "bad format")
    require(samples.length % channels == 0,
      s"${samples.length} samples not a multiple of $channels channels")
    val dataBytes = 2 * samples.length
    val out = new Array[Byte](headerBytes + dataBytes)
    val bb = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM integer
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort) // block align
      .putShort(16) // bits/sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    var i = 0
    while (i < samples.length) { bb.putShort(samples(i)); i += 1 }
    out
  }

  /** Parse a 16-bit PCM WAV by walking its chunk list. */
  def decode(bytes: Array[Byte]): Wav = {
    require(bytes.length >= 12, s"truncated RIFF: ${bytes.length} B")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int): String =
      new String(bytes, off, 4, "US-ASCII")
    require(tag(0) == "RIFF" && tag(8) == "WAVE",
      s"not a RIFF/WAVE file: '${tag(0)}'/'${tag(8)}'")
    var off = 12
    var sampleRate = -1
    var channels = -1
    var dataOff = -1
    var dataLen = -1
    while (off + 8 <= bytes.length && (sampleRate < 0 || dataOff < 0)) {
      val id = tag(off)
      val len = bb.getInt(off + 4)
      require(len >= 0 && off + 8 + len <= bytes.length,
        s"chunk '$id' overruns the file")
      id match {
        case "fmt " =>
          val fmt = bb.getShort(off + 8)
          require(fmt == 1, s"unsupported WAV format $fmt (PCM only)")
          channels = bb.getShort(off + 10)
          sampleRate = bb.getInt(off + 12)
          val bits = bb.getShort(off + 22)
          require(bits == 16, s"unsupported bit depth $bits (16-bit only)")
        case "data" =>
          dataOff = off + 8
          dataLen = len
        case _ => // unknown chunk (LIST, fact, …): skip
      }
      off += 8 + len + (len & 1) // chunks are word-aligned
    }
    require(sampleRate > 0, "missing fmt chunk")
    require(dataOff >= 0, "missing data chunk")
    require(dataLen % 2 == 0, "odd PCM16 data length")
    val samples = new Array[Short](dataLen / 2)
    var i = 0
    while (i < samples.length) {
      samples(i) = bb.getShort(dataOff + 2 * i)
      i += 1
    }
    require(samples.length % channels == 0,
      "data length not a multiple of the frame size")
    Wav(sampleRate, channels, samples)
  }

  /** Integer decimation resample (keep every `factor`-th frame,
    * all channels) — the closed-form-checkable downsampling stage;
    * production resamplers add a low-pass, the selection arithmetic
    * is what an oracle can pin. */
  def decimate(wav: Wav, factor: Int): Wav = {
    require(factor >= 1, s"bad factor $factor")
    val frames = wav.samples.length / wav.channels
    val outFrames = (frames + factor - 1) / factor
    val out = new Array[Short](outFrames * wav.channels)
    var f = 0
    while (f < outFrames) {
      var c = 0
      while (c < wav.channels) {
        out(f * wav.channels + c) =
          wav.samples(f * factor * wav.channels + c)
        c += 1
      }
      f += 1
    }
    Wav(wav.sampleRate / factor, wav.channels, out)
  }
}
