package graft.ext

/** Dependency-free Y4M (YUV4MPEG2) codec — the real video-decode step
  * behind qm05's frame-sampling stage. Y4M is the uncompressed-video
  * interchange format of the mjpegtools/x264/ffmpeg world: a one-line
  * ASCII header, then `FRAME\n`-delimited raw planar YUV — exactly the
  * format a container with no media libraries can honestly decode.
  *
  * Scope: C444 (full-resolution U/V planes, so every plane is
  * width×height bytes and no chroma resampling ambiguity enters a gated
  * result). Required header tags: W, H, F; interlace/aspect tags are
  * tolerated, unknown X- extensions skipped. Anything else — C420*,
  * C422, mono, a frame short of data — throws IllegalArgumentException.
  */
object Y4mCodec {

  /** Decoded stream: each frame is width*height*3 bytes, the Y plane
    * followed by full-res U and V planes (C444), values 0–255 unsigned. */
  final case class Y4m(
      width: Int, height: Int,
      fpsNum: Int, fpsDen: Int,
      frames: Array[Array[Byte]])

  private val MAGIC = "YUV4MPEG2"
  private val FRAME = "FRAME"

  /** Encode planar C444 frames (each `width*height*3` bytes, Y then U
    * then V) with the canonical progressive 1:1-aspect header. */
  def encode(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
             frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(fpsNum > 0 && fpsDen > 0, s"bad frame rate $fpsNum:$fpsDen")
    val frameSize = width * height * 3
    require(frames.forall(_.length == frameSize),
      s"each C444 frame must be $frameSize bytes")
    val header = s"$MAGIC W$width H$height F$fpsNum:$fpsDen Ip A1:1 C444\n"
      .getBytes("US-ASCII")
    val frameHdr = s"$FRAME\n".getBytes("US-ASCII")
    val out = java.nio.ByteBuffer.allocate(
      header.length + frames.size * (frameHdr.length + frameSize))
    out.put(header)
    frames.foreach { f => out.put(frameHdr); out.put(f) }
    out.array()
  }

  /** Decode a C444 Y4M stream: parse the tagged header line, then walk
    * `FRAME` markers until the bytes run out. */
  def decode(bytes: Array[Byte]): Y4m = {
    val nl = bytes.indexOf('\n'.toByte)
    require(nl > 0, "missing Y4M header line")
    val header = new String(bytes, 0, nl, "US-ASCII")
    val parts = header.split(' ')
    require(parts.nonEmpty && parts(0) == MAGIC, "bad YUV4MPEG2 magic")
    var width = -1; var height = -1; var fpsNum = -1; var fpsDen = -1
    var colorspace = "C420jpeg" // the spec default when the tag is absent
    parts.drop(1).filter(_.nonEmpty).foreach { tag =>
      (tag.charAt(0), tag.substring(1)) match {
        case ('W', v) => width = v.toInt
        case ('H', v) => height = v.toInt
        case ('F', v) =>
          val nd = v.split(':')
          require(nd.length == 2, s"malformed F frame-rate tag '$tag' (want F<num>:<den>)")
          fpsNum = nd(0).toInt; fpsDen = nd(1).toInt
        case ('C', _) => colorspace = tag
        case ('I', _) | ('A', _) | ('X', _) => // interlace/aspect/extension
        case _ =>
          throw new IllegalArgumentException(s"unknown Y4M header tag '$tag'")
      }
    }
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(fpsNum > 0 && fpsDen > 0, "missing or bad F frame-rate tag")
    require(colorspace == "C444",
      s"unsupported colorspace $colorspace (C444 only)")
    val frameSize = width * height * 3
    val frames = Array.newBuilder[Array[Byte]]
    var off = nl + 1
    while (off < bytes.length) {
      // FRAME marker line (parameters after FRAME are tolerated, skipped)
      var lineEnd = off
      while (lineEnd < bytes.length && bytes(lineEnd) != '\n'.toByte) lineEnd += 1
      require(lineEnd < bytes.length, "truncated FRAME marker")
      val marker = new String(bytes, off, lineEnd - off, "US-ASCII")
      require(marker == FRAME || marker.startsWith(FRAME + " "),
        s"bad frame marker '$marker'")
      val dataStart = lineEnd + 1
      require(dataStart + frameSize <= bytes.length,
        s"frame data truncated: need $frameSize bytes at offset $dataStart")
      frames += java.util.Arrays.copyOfRange(bytes, dataStart, dataStart + frameSize)
      off = dataStart + frameSize
    }
    Y4m(width, height, fpsNum, fpsDen, frames.result())
  }
}
