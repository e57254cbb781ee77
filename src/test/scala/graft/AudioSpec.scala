package graft

import graft.engine.WavCodec
import graft.operators.MultimodalOps

/** The WAV codec's contract: golden-bytes header, round-trip,
  * chunk-walk robustness, decimation arithmetic, and decode-vs-raster
  * recomputation on the fixture clips. */
class AudioSpec extends SparkSpec {

  test("golden bytes: canonical 44-byte header fields are exact") {
    val bytes = WavCodec.encode(8000, 1, Array[Short](100, -100, 0))
    assert(bytes.length == 44 + 6)
    assert(new String(bytes, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(bytes, 8, 4, "US-ASCII") == "WAVE")
    assert(new String(bytes, 12, 4, "US-ASCII") == "fmt ")
    assert(new String(bytes, 36, 4, "US-ASCII") == "data")
    def le32(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
      ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    def le16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    assert(le32(4) == 36 + 6, "RIFF size")
    assert(le16(20) == 1, "PCM format tag")
    assert(le16(22) == 1, "channels")
    assert(le32(24) == 8000, "sample rate")
    assert(le32(28) == 16000, "byte rate")
    assert(le16(32) == 2, "block align")
    assert(le16(34) == 16, "bits per sample")
    assert(le32(40) == 6, "data length")
    assert(le16(44) == 100 && le16(46) == ((-100) & 0xffff))
  }

  test("round-trip identity for mono and stereo") {
    for (ch <- Seq(1, 2)) {
      val samples = Array.tabulate[Short](30 * ch)(i =>
        ((i * 997) % 30000 - 15000).toShort)
      val w = WavCodec.decode(WavCodec.encode(44100, ch, samples))
      assert(w.sampleRate == 44100 && w.channels == ch)
      assert(w.samples.toSeq == samples.toSeq)
    }
  }

  test("decode walks unknown chunks instead of assuming offsets") {
    val base = WavCodec.encode(8000, 1, Array[Short](7, 8, 9))
    // splice a LIST chunk (odd length → word-aligned pad) between
    // fmt and data, as metadata-writing tools do
    val listBody = "INFOxyz".getBytes("US-ASCII") // 7 bytes, pad to 8
    val out = java.nio.ByteBuffer
      .allocate(base.length + 8 + listBody.length + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put(base, 0, 36) // RIFF..fmt chunk
    out.put("LIST".getBytes("US-ASCII")).putInt(listBody.length)
      .put(listBody).put(0.toByte)
    out.put(base, 36, base.length - 36) // data chunk
    val arr = out.array()
    // fix the RIFF size field
    java.nio.ByteBuffer.wrap(arr).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, arr.length - 8)
    val w = WavCodec.decode(arr)
    assert(w.samples.toSeq == Seq[Short](7, 8, 9))
  }

  test("decode rejects malformed input with descriptive errors") {
    intercept[IllegalArgumentException](WavCodec.decode(Array[Byte](1)))
    val ok = WavCodec.encode(8000, 1, Array[Short](1))
    val bad = ok.clone(); bad(0) = 'X'.toByte
    intercept[IllegalArgumentException](WavCodec.decode(bad))
    val nonPcm = ok.clone(); nonPcm(20) = 3 // IEEE float tag
    intercept[IllegalArgumentException](WavCodec.decode(nonPcm))
  }

  test("decimation keeps exactly every k-th frame, all channels") {
    val stereo = Array.tabulate[Short](20)(_.toShort) // 10 frames × 2ch
    val out = WavCodec.decimate(WavCodec.Wav(9000, 2, stereo), 3)
    assert(out.sampleRate == 3000 && out.channels == 2)
    // kept frames 0, 3, 6, 9 → samples (0,1),(6,7),(12,13),(18,19)
    assert(out.samples.toSeq == Seq[Short](0, 1, 6, 7, 12, 13, 18, 19))
  }

  test("fixture clips decode to stats matching direct recomputation") {
    import spark.implicits._
    val row = MultimodalOps.audioDecode(spark, sf)
      .filter($"doc_id" === 11L).collect()(0)
    val payload = MultimodalOps.audio(spark, sf)
      .filter($"doc_id" === 11L).collect()(0).getAs[Array[Byte]]("payload")
    val w = WavCodec.decode(payload)
    val frames = w.samples.length / w.channels
    assert(row.getAs[Long]("n_frames") == frames)
    assert(row.getAs[Int]("n_bytes") == payload.length)
    var sum = 0L
    for (f <- 0 until frames) sum += w.samples(f * w.channels)
    assert(row.getAs[Long]("sum_ch0") == sum)
    assert(row.getAs[Int]("first_sample") == w.samples(0).toInt)
  }
}
