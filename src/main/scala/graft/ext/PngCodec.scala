package graft.ext

import java.util.zip.{CRC32, DataFormatException, Deflater, Inflater}

/** Dependency-free PNG codec — moves the "real codec" line from
  * interchange formats (BMP/WAV/Y4M) to a format multimodal corpora
  * actually arrive in. PNG is zlib-compressed filtered scanlines, and the
  * JDK ships the zlib half (`java.util.zip.Deflater`/`Inflater`), so a
  * complete 8-bit truecolor decoder needs no external library.
  *
  * Scope: 8-bit/channel RGB (color type 2), non-interlaced — the plain
  * truecolor form. The decoder implements the full filter set (None/Sub/
  * Up/Average/Paeth, PNG spec §9) and verifies every chunk CRC; the
  * encoder cycles filters per row (`row % 5`) so a round trip exercises
  * every defilter path, not just the trivial one. Anything out of scope —
  * bad signature or CRC, palette/gray/alpha color types, 16-bit depth,
  * interlacing, truncated or trailing-garbage streams, a corrupt zlib
  * body, an inflated size that disagrees with IHDR — throws
  * IllegalArgumentException: a decoder that silently guessed would be
  * worse than none.
  *
  * All multi-byte integers are big-endian per the spec (the mirror of
  * BMP's little-endian; both are exercised in the gates).
  */
object PngCodec {

  /** A decoded image: `width`×`height`, `pixels(y*width + x)` = 0xRRGGBB,
    * row-major, top-down (PNG's native row order). */
  final case class Png(width: Int, height: Int, pixels: Array[Int])

  private val Signature =
    Array(137, 80, 78, 71, 13, 10, 26, 10).map(_.toByte)

  private def u8(b: Byte): Int = b & 0xFF

  /** a=left, b=up, c=upper-left — PNG spec §9.4. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def chunk(out: java.io.ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    val len = java.nio.ByteBuffer.allocate(4).putInt(data.length).array()
    out.write(len)
    val t = typ.getBytes("US-ASCII")
    out.write(t)
    out.write(data)
    val crc = new CRC32
    crc.update(t); crc.update(data)
    out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
  }

  /** Encode `pixels` (row-major top-down 0xRRGGBB) as an 8-bit truecolor
    * PNG, filter type cycling `row % 5`. */
  def encode(width: Int, height: Int, pixels: Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0 && pixels.length == width * height,
      s"pixels must be width*height = ${width * height}")
    val bpp = 3
    val stride = width * bpp
    // unfiltered scanline bytes, then filter each row per spec §9
    val rows = Array.tabulate(height) { y =>
      val r = new Array[Byte](stride)
      var x = 0
      while (x < width) {
        val p = pixels(y * width + x)
        r(bpp * x) = ((p >> 16) & 0xFF).toByte
        r(bpp * x + 1) = ((p >> 8) & 0xFF).toByte
        r(bpp * x + 2) = (p & 0xFF).toByte
        x += 1
      }
      r
    }
    val raw = new Array[Byte]((stride + 1) * height)
    var y = 0
    while (y < height) {
      val ft = y % 5
      raw(y * (stride + 1)) = ft.toByte
      val cur = rows(y)
      val prior = if (y > 0) rows(y - 1) else null
      var i = 0
      while (i < stride) {
        val orig = u8(cur(i))
        val left = if (i >= bpp) u8(cur(i - bpp)) else 0
        val up = if (prior != null) u8(prior(i)) else 0
        val upLeft = if (prior != null && i >= bpp) u8(prior(i - bpp)) else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, upLeft)
        }
        raw(y * (stride + 1) + 1 + i) = ((orig - pred) & 0xFF).toByte
        i += 1
      }
      y += 1
    }
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION)
    deflater.setInput(raw); deflater.finish()
    val zOut = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) zOut.write(buf, 0, deflater.deflate(buf))
    deflater.end()

    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature)
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type: truecolor
      .put(0.toByte)  // compression: deflate
      .put(0.toByte)  // filter method: adaptive (per-row types)
      .put(0.toByte)  // interlace: none
      .array()
    chunk(out, "IHDR", ihdr)
    chunk(out, "IDAT", zOut.toByteArray)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Decode an 8-bit truecolor non-interlaced PNG. */
  def decode(bytes: Array[Byte]): Png = {
    require(bytes.length >= Signature.length + 12, "truncated PNG")
    require(java.util.Arrays.equals(
      java.util.Arrays.copyOf(bytes, 8), Signature), "bad PNG signature")
    val b = java.nio.ByteBuffer.wrap(bytes) // big-endian by default
    b.position(8)
    var width = -1; var height = -1
    val idat = new java.io.ByteArrayOutputStream()
    var sawIhdr = false; var sawIend = false
    while (!sawIend) {
      require(b.remaining() >= 8, "truncated chunk header")
      val len = b.getInt()
      require(len >= 0 && b.remaining().toLong >= len.toLong + 8,
        s"truncated chunk: declared $len, ${b.remaining()} left")
      val typBytes = new Array[Byte](4); b.get(typBytes)
      val typ = new String(typBytes, "US-ASCII")
      val data = new Array[Byte](len); b.get(data)
      val crc = new CRC32
      crc.update(typBytes); crc.update(data)
      require(b.getInt() == crc.getValue.toInt, s"bad CRC in $typ chunk")
      typ match {
        case "IHDR" =>
          require(!sawIhdr, "duplicate IHDR")
          require(len == 13, s"bad IHDR length $len")
          val h = java.nio.ByteBuffer.wrap(data)
          width = h.getInt(); height = h.getInt()
          require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
          // (stride+1)*height below must not overflow Int (a hostile
          // IHDR like 715m×3 would otherwise turn into a negative-size
          // or multi-GB allocation instead of this decoder's
          // IllegalArgumentException contract). 1 GiB of raw scanline
          // bytes is far beyond any thumbnail this path serves.
          require((width.toLong * 3 + 1) * height.toLong <= (1L << 30),
            s"image too large to decode: ${width}x$height")
          require(h.get() == 8, "unsupported bit depth (8-bit only)")
          require(h.get() == 2, "unsupported color type (truecolor RGB only)")
          require(h.get() == 0, "unknown compression method")
          require(h.get() == 0, "unknown filter method")
          require(h.get() == 0, "interlaced PNG unsupported")
          sawIhdr = true
        case "IDAT" =>
          require(sawIhdr, "IDAT before IHDR")
          idat.write(data)
        case "IEND" => sawIend = true
        case _ => // ancillary chunks (tEXt, pHYs, …) tolerated, skipped
      }
    }
    require(sawIhdr, "missing IHDR")
    require(b.remaining() == 0, "trailing bytes after IEND")

    val bpp = 3
    val stride = width * bpp
    val raw = new Array[Byte]((stride + 1) * height)
    val inflater = new Inflater()
    inflater.setInput(idat.toByteArray)
    var off = 0
    try {
      while (off < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, off, raw.length - off)
        require(!inflater.needsDictionary,
          "preset-dictionary zlib (FDICT) unsupported")
        // n==0 without finishing means the stream can make no progress:
        // either it wants more input (truncated) or it is stuck (corrupt).
        // Either way, IllegalArgumentException — never a spin.
        require(n > 0 || inflater.finished(), "truncated zlib stream")
        off += n
      }
      require(off == raw.length && inflater.finished() &&
        inflater.getRemaining == 0,
        s"zlib payload size mismatch: got $off, want ${raw.length}")
    } catch {
      case e: DataFormatException =>
        throw new IllegalArgumentException(s"corrupt zlib stream: ${e.getMessage}")
    } finally inflater.end()

    // defilter in place, row by row (each row's predictor reads the
    // RECONSTRUCTED prior row, spec §9)
    val pixels = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val ft = u8(raw(y * (stride + 1)))
      require(ft <= 4, s"bad filter type $ft in row $y")
      val base = y * (stride + 1) + 1
      val priorBase = (y - 1) * (stride + 1) + 1
      var i = 0
      while (i < stride) {
        val left = if (i >= bpp) u8(raw(base + i - bpp)) else 0
        val up = if (y > 0) u8(raw(priorBase + i)) else 0
        val upLeft = if (y > 0 && i >= bpp) u8(raw(priorBase + i - bpp)) else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, upLeft)
        }
        raw(base + i) = ((u8(raw(base + i)) + pred) & 0xFF).toByte
        i += 1
      }
      var x = 0
      while (x < width) {
        pixels(y * width + x) =
          (u8(raw(base + bpp * x)) << 16) |
          (u8(raw(base + bpp * x + 1)) << 8) |
          u8(raw(base + bpp * x + 2))
        x += 1
      }
      y += 1
    }
    Png(width, height, pixels)
  }
}
