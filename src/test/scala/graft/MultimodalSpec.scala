package graft

import org.apache.spark.sql.functions._
import graft.engine.BmpCodec
import graft.operators.MultimodalOps

/** The real BMP codec's contract: byte-exact encode/decode against a
  * hand-crafted golden file, round-trip identity, row-order handling,
  * the NN resize kernel, and the decoded-pixel pHash's robustness on
  * genuine near-duplicate images. */
class MultimodalSpec extends SparkSpec {

  private def px(vals: Int*): Array[Byte] = vals.map(_.toByte).toArray

  test("golden bytes: hand-crafted 2x2 BMP encodes and decodes byte-exactly") {
    // 2×2, 24-bit: row stride 3·2=6 → padded to 8 (2 pad bytes/row).
    // Top-down pixels (BGR): (10,20,30)(40,50,60) / (70,80,90)(100,110,120)
    val pixels = px(10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
    val bytes = BmpCodec.encode(2, 2, pixels)
    assert(bytes.length == 54 + 8 * 2)
    // header fields at their DIB offsets, little-endian
    assert(bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte)
    def le32(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
      ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    assert(le32(2) == 70, "file size")
    assert(le32(10) == 54, "data offset")
    assert(le32(14) == 40, "info header size")
    assert(le32(18) == 2 && le32(22) == 2, "dims")
    assert((bytes(28) & 0xff) == 24, "bpp")
    // bottom-up: file row 0 is the BOTTOM image row (70,80,90,100,…)
    assert(bytes.slice(54, 60).toSeq == px(70, 80, 90, 100, 110, 120).toSeq)
    assert(bytes(60) == 0 && bytes(61) == 0, "row padding")
    assert(bytes.slice(62, 68).toSeq == px(10, 20, 30, 40, 50, 60).toSeq)
    val back = BmpCodec.decode(bytes)
    assert(back.width == 2 && back.height == 2)
    assert(back.pixels.toSeq == pixels.toSeq)
  }

  test("round-trip identity incl. odd widths (padding) and 1-pixel edge") {
    for ((w, h) <- Seq((1, 1), (3, 2), (5, 7), (76, 60))) {
      val pixels = Array.tabulate(3 * w * h)(i => ((i * 37 + 11) % 256).toByte)
      val back = BmpCodec.decode(BmpCodec.encode(w, h, pixels))
      assert(back.width == w && back.height == h)
      assert(back.pixels.toSeq == pixels.toSeq, s"round-trip ${w}x$h")
      assert(BmpCodec.encode(w, h, pixels).length == BmpCodec.fileSize(w, h))
    }
  }

  test("top-down (negative height) BMPs decode to the same raster") {
    val pixels = Array.tabulate(3 * 3 * 2)(i => (i + 1).toByte)
    val up = BmpCodec.encode(3, 2, pixels)
    // flip the height sign and re-order rows to top-down by hand
    val down = up.clone()
    val bb = java.nio.ByteBuffer.wrap(down)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(22, -2)
    val rb = BmpCodec.rowBytes(3)
    System.arraycopy(up, 54 + rb, down, 54, rb)
    System.arraycopy(up, 54, down, 54 + rb, rb)
    assert(BmpCodec.decode(down).pixels.toSeq == pixels.toSeq)
  }

  test("decode rejects malformed input with descriptive errors") {
    intercept[IllegalArgumentException](BmpCodec.decode(Array[Byte](1, 2, 3)))
    val ok = BmpCodec.encode(2, 2, new Array[Byte](12))
    val badMagic = ok.clone(); badMagic(0) = 'X'.toByte
    intercept[IllegalArgumentException](BmpCodec.decode(badMagic))
    val truncated = ok.slice(0, ok.length - 4)
    intercept[IllegalArgumentException](BmpCodec.decode(truncated))
  }

  test("nearest-neighbor resize samples the exact floored source pixel") {
    // 4×4 image whose B channel encodes (x + 10·y) — sample positions
    // are then directly readable from the resized values
    val pixels = new Array[Byte](3 * 16)
    for (y <- 0 until 4; x <- 0 until 4) pixels((y * 4 + x) * 3) =
      (x + 10 * y).toByte
    val out = BmpCodec.resizeNearest(BmpCodec.Bmp(4, 4, pixels), 2, 2)
    // sx = ox·4/2 ∈ {0, 2}, sy likewise → B values 0, 2, 20, 22
    assert(out.pixels.grouped(3).map(_(0).toInt).toSeq == Seq(0, 2, 20, 22))
    // identity when out dims = in dims
    val id = BmpCodec.resizeNearest(BmpCodec.Bmp(4, 4, pixels), 4, 4)
    assert(id.pixels.toSeq == pixels.toSeq)
  }

  test("fixture images are real BMPs and payloads never enter a shuffle") {
    import spark.implicits._
    val one = MultimodalOps.images(spark, sf).orderBy($"doc_id").limit(1)
      .collect()(0)
    val img = BmpCodec.decode(one.getAs[Array[Byte]]("payload"))
    assert(img.width >= 16 && img.height >= 16)
    val plan = MultimodalOps.decoded(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("repartition"),
      s"unexpected repartition in decode plan:\n$plan")
  }

  test("decoded stats match direct recomputation from the raster") {
    import spark.implicits._
    val row = MultimodalOps.multimodalDecode(spark, sf)
      .filter($"doc_id" === 7L).collect()(0)
    val payload = MultimodalOps.images(spark, sf)
      .filter($"doc_id" === 7L).collect()(0).getAs[Array[Byte]]("payload")
    val img = BmpCodec.decode(payload)
    val sums = Array(0L, 0L, 0L)
    for (i <- 0 until img.width * img.height; c <- 0 until 3)
      sums(c) += img.pixels(i * 3 + c) & 0xffL
    assert(row.getAs[Long]("sum_b") == sums(0))
    assert(row.getAs[Long]("sum_g") == sums(1))
    assert(row.getAs[Long]("sum_r") == sums(2))
    assert(row.getAs[Int]("n_bytes") == payload.length)
    val row0 = (0 until img.width).map(x => img.pixels(x * 3) & 0xffL).sum
    assert(row.getAs[Long]("row0_sum_b") == row0,
      "row-0 checksum must be the TOP row (bottom-up flip applied)")
  }

  test("frame sampling covers every payload byte exactly once") {
    import spark.implicits._
    val frames = MultimodalOps.multimodalFrames(spark, sf)
    val tot = frames.groupBy($"doc_id").agg(sum($"frame_len").as("n"))
    val docs = MultimodalOps.images(spark, sf)
      .select($"doc_id", length($"payload").as("n_bytes"))
    val bad = tot.join(docs, "doc_id").filter($"n" =!= $"n_bytes").count()
    assert(bad == 0, "frame lengths must partition the payload")
  }

  test("resize plan fits the box and preserves aspect within integer rounding") {
    import spark.implicits._
    val r = MultimodalOps.multimodalResize(spark, sf)
    assert(r.filter($"out_w" > 64 || $"out_h" > 64).count() == 0,
      "resized dims must fit the 64-box")
    assert(r.filter($"out_w" < 1 || $"out_h" < 1).count() == 0)
    assert(r.filter($"width" <= 64 && $"height" <= 64 &&
      ($"out_w" =!= $"width" || $"out_h" =!= $"height")).count() == 0)
    val bad = r.filter($"width" > 64 || $"height" > 64)
      .filter(abs($"out_w" * $"height" - $"out_h" * $"width") >
        greatest($"width", $"height"))
      .count()
    assert(bad == 0, "aspect drift beyond integer rounding")
  }

  test("image pHash is robust to small perturbations, far for distinct images") {
    def hamming(a: Array[Long], b: Array[Long]): Int =
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
    val w = 32; val h = 24
    val base = Array.tabulate(3 * w * h) { i =>
      val p = i / 3; (((p % w) * 7 + (p / w) * 13) % 256).toByte
    }
    val img = BmpCodec.Bmp(w, h, base)
    // perturb 1 % of bytes by ±1 — a re-encode-grade change
    val pert = base.clone()
    for (i <- 0 until pert.length by 100) pert(i) = (pert(i) + 1).toByte
    val near = hamming(MultimodalOps.imagePhashKernel(img),
      MultimodalOps.imagePhashKernel(BmpCodec.Bmp(w, h, pert)))
    assert(near <= 3, s"near-dup hamming $near should be tiny")
    // a genuinely different image (inverted gradient) lands far away
    val other = Array.tabulate(3 * w * h) { i =>
      val p = i / 3; (255 - ((p % w) * 11 + (p / w) * 3) % 256).toByte
    }
    val far = hamming(MultimodalOps.imagePhashKernel(img),
      MultimodalOps.imagePhashKernel(BmpCodec.Bmp(w, h, other)))
    assert(far >= 8, s"distinct-image hamming $far should be large")
  }
}
