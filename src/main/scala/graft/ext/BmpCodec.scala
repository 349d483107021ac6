package graft.ext

/** Dependency-free BMP (Windows bitmap) codec — the real image-decode step
  * behind qm02's decode-features stage (this container ships no media
  * libraries, so the format honest-to-decode with pure JVM code is BMP;
  * the mapPartitions plumbing around it is codec-agnostic).
  *
  * Scope: 24-bit uncompressed (BI_RGB) bitmaps with BITMAPINFOHEADER —
  * the overwhelmingly common on-disk form. Handles 4-byte row padding and
  * both row orders (positive biHeight = bottom-up, the standard; negative
  * = top-down). Anything else (palettes, 16/32 bpp, RLE, V4/V5 headers'
  * extra fields are tolerated but their compression modes are not) throws
  * IllegalArgumentException — a decoder that silently guessed would be
  * worse than none.
  *
  * All fields are little-endian per the spec.
  */
object BmpCodec {

  /** A decoded image: `width`×`height`, `pixels(y*width + x)` = 0xRRGGBB,
    * row-major, top-down regardless of the file's row order. */
  final case class Bmp(width: Int, height: Int, pixels: Array[Int])

  private def rowSize(width: Int): Int = ((3 * width + 3) / 4) * 4

  /** Encode `pixels` (row-major top-down 0xRRGGBB) as a standard bottom-up
    * 24-bit BMP. */
  def encode(width: Int, height: Int, pixels: Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0 && pixels.length == width * height,
      s"pixels must be width*height = ${width * height}")
    val stride = rowSize(width)
    val dataSize = stride * height
    val fileSize = 54 + dataSize
    val b = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // BITMAPFILEHEADER
    b.put('B'.toByte).put('M'.toByte)
    b.putInt(fileSize)
    b.putInt(0)       // reserved
    b.putInt(54)      // pixel data offset
    // BITMAPINFOHEADER
    b.putInt(40)      // header size
    b.putInt(width)
    b.putInt(height)  // positive: bottom-up
    b.putShort(1)     // planes
    b.putShort(24)    // bpp
    b.putInt(0)       // BI_RGB
    b.putInt(dataSize)
    b.putInt(2835).putInt(2835) // 72 dpi
    b.putInt(0).putInt(0)       // palette counts
    var y = height - 1 // bottom-up: last image row first in the file
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val p = pixels(y * width + x)
        // BMP stores BGR
        b.put((p & 0xFF).toByte)
        b.put(((p >> 8) & 0xFF).toByte)
        b.put(((p >> 16) & 0xFF).toByte)
        x += 1
      }
      var pad = stride - 3 * width
      while (pad > 0) { b.put(0.toByte); pad -= 1 }
      y -= 1
    }
    b.array()
  }

  /** Decode a 24-bit uncompressed BMP. */
  def decode(bytes: Array[Byte]): Bmp = {
    require(bytes.length >= 54, s"truncated BMP: ${bytes.length} bytes")
    val b = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(b.get(0) == 'B' && b.get(1) == 'M', "bad BMP magic")
    val dataOffset = b.getInt(10)
    val dibSize = b.getInt(14)
    require(dibSize >= 40, s"unsupported DIB header size $dibSize")
    val width = b.getInt(18)
    val rawHeight = b.getInt(22)
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    require(width > 0 && height > 0, s"bad dimensions ${width}x$rawHeight")
    require(b.getShort(26) == 1, "planes must be 1")
    val bpp = b.getShort(28)
    require(bpp == 24, s"unsupported bpp $bpp (24-bit only)")
    require(b.getInt(30) == 0, "compressed BMP unsupported (BI_RGB only)")
    val stride = rowSize(width)
    require(bytes.length >= dataOffset + stride * height,
      "pixel data truncated")
    val pixels = new Array[Int](width * height)
    var row = 0
    while (row < height) {
      // file row `row` is image row `row` when top-down, else mirrored
      val y = if (topDown) row else height - 1 - row
      val base = dataOffset + row * stride
      var x = 0
      while (x < width) {
        val o = base + 3 * x
        val blue = bytes(o) & 0xFF
        val green = bytes(o + 1) & 0xFF
        val red = bytes(o + 2) & 0xFF
        pixels(y * width + x) = (red << 16) | (green << 8) | blue
        x += 1
      }
      row += 1
    }
    Bmp(width, height, pixels)
  }
}
