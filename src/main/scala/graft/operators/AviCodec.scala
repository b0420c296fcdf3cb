package graft.operators

/** Real video codec for uncompressed AVI — the video analog of
  * [[ImageCodec]]/[[WavCodec]]: an AVI file is a RIFF container
  * (`RIFF…AVI `) holding a `hdrl` header LIST (`avih` main header, one
  * `strl` stream LIST with `strh`/`strf`) and a `movi` LIST whose `00db`
  * chunks each carry one uncompressed 24-bit DIB frame — the exact BMP
  * raster (bottom-up, BGR, 4-byte-padded rows), so frame decode is pure
  * arithmetic with no codec library (OpenDML/AVI RIFF spec; DIB raster
  * per the BMP spec).
  *
  * Compressed video (H.264/VP9/AV1) genuinely needs codec libraries this
  * environment does not ship; [[Multimodal.sampleFrames]]'s byte-window
  * stub remains the labeled stand-in for those.
  */
object AviCodec {

  /** A decoded clip: per-frame pixels in logical row-major top-down RGB
    * order (the [[ImageCodec.DecodedImage]] convention).
    */
  final case class DecodedVideo(width: Int, height: Int,
                                frames: Array[Array[Byte]])

  def isAvi(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' '

  private def rowSize(width: Int): Int = Riff.dibRowSize(width)

  /** Encode an uncompressed 24-bit AVI: `pix(f, i)` is byte `i` of frame
    * `f`'s logical top-down RGB stream. Minimal spec-complete layout:
    * hdrl(avih + strl(strh 'vids'/'DIB ' + strf BITMAPINFOHEADER)) +
    * movi(one `00db` DIB raster per frame).
    */
  def encodeAvi24(width: Int, height: Int, nFrames: Int, fps: Int,
                  pix: (Int, Int) => Byte): Array[Byte] = {
    require(width > 0 && height > 0 && nFrames > 0 && fps > 0,
      s"encodeAvi24: bad args ${width}x$height frames=$nFrames fps=$fps")
    val frameBytes = rowSize(width) * height
    // sizes: each movi frame chunk is 8 + frameBytes (frameBytes is
    // 4-aligned so no pad byte); fixed header sizes per the spec
    val strlSize = 4 + (8 + 56) + (8 + 40)        // 'strl' + strh + strf
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)  // 'hdrl' + avih + LIST strl
    val moviSize = 4 + nFrames * (8 + frameBytes)
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val out = new Array[Byte](8 + riffSize)
    var p = 0
    def tag(s: String): Unit = { Riff.putTag(out, p, s); p += 4 }
    def le32(v: Int): Unit = { Riff.putLe32(out, p, v); p += 4 }
    def le16(v: Int): Unit = { Riff.putLe16(out, p, v); p += 2 }
    tag("RIFF"); le32(riffSize); tag("AVI ")
    tag("LIST"); le32(hdrlSize); tag("hdrl")
    tag("avih"); le32(56)
    le32(1000000 / fps)          // microseconds per frame
    le32(frameBytes * fps)       // max bytes per second
    le32(0)                      // padding granularity
    le32(0)                      // flags: no idx1 index (decoder scans movi)
    le32(nFrames); le32(0); le32(1) // totalFrames, initialFrames, streams
    le32(frameBytes)             // suggested buffer
    le32(width); le32(height)
    le32(0); le32(0); le32(0); le32(0) // reserved
    tag("LIST"); le32(strlSize); tag("strl")
    tag("strh"); le32(56)
    tag("vids"); tag("DIB ")
    le32(0); le16(0); le16(0)    // flags, priority, language
    le32(0)                      // initial frames
    le32(1); le32(fps)           // scale / rate → fps
    le32(0); le32(nFrames)       // start, length (in frames)
    le32(frameBytes)             // suggested buffer
    le32(-1)                     // quality (default)
    le32(0)                      // sample size (varies)
    le16(0); le16(0); le16(width); le16(height) // rcFrame
    tag("strf"); le32(40)
    le32(40); le32(width); le32(height)
    le16(1); le16(24)            // planes, bpp
    le32(0)                      // BI_RGB
    le32(frameBytes)
    le32(2835); le32(2835); le32(0); le32(0)
    tag("LIST"); le32(moviSize); tag("movi")
    var f = 0
    while (f < nFrames) {
      tag("00db"); le32(frameBytes)
      val frame = f
      ImageCodec.encodeDibRaster(width, height, i => pix(frame, i), out, p)
      p += frameBytes
      f += 1
    }
    assert(p == out.length, s"avi encoder layout bug: wrote $p of ${out.length}")
    out
  }

  /** Decode an uncompressed AVI: chunk-scan to the `strf`
    * BITMAPINFOHEADER for dimensions, then collect every `00db`/`00dc`
    * frame chunk in the `movi` LIST in file order. Throws
    * IllegalArgumentException on anything malformed or compressed.
    */
  def decodeAvi24(b: Array[Byte]): DecodedVideo = {
    require(isAvi(b), "avi: missing RIFF/AVI signature")
    def le16(i: Int): Int = Riff.le16(b, i)
    def le32(i: Int): Int = Riff.le32(b, i)
    def fourcc(i: Int): String = Riff.tag(b, i)
    var width = -1; var height = -1
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)] // (offset, declared size)
    // Iterative depth-first in-order LIST walk. Recursion depth here would
    // be attacker-controlled — a blob of nested LISTs (~length/12 deep)
    // raises StackOverflowError, a fatal JVM error, instead of the
    // documented IllegalArgumentException. The continuation stack holds
    // suspended (resume, end) positions in enclosing lists, so traversal
    // order (and thus frame order and first-strf selection) is identical
    // to the recursive form: descend into a LIST immediately, resume the
    // parent after it.
    def walk(start: Int, end0: Int): Unit = {
      val resume = scala.collection.mutable.Stack.empty[(Int, Int)]
      var p = start
      var end = end0
      while (p + 8 <= end || resume.nonEmpty) {
        if (p + 8 > end) {
          val (rp, re) = resume.pop(); p = rp; end = re
        } else {
          val tag = fourcc(p)
          val size = le32(p + 4)
          require(size >= 0 && p + 8 + size.toLong <= end,
            s"avi: chunk '$tag' size $size overruns its parent list")
          val next = p + 8 + size + (size & 1) // chunks are word-aligned
          if (tag == "LIST") {
            resume.push((next, end)) // suspend parent, descend now
            end = p + 8 + size
            p += 12 // skip the list type fourcc
          } else {
            if (tag == "strf" && width < 0 && size >= 40) {
              require(le16(p + 8 + 14) == 24, s"avi: only 24-bit DIB frames supported")
              require(le32(p + 8 + 16) == 0, s"avi: only uncompressed (BI_RGB) frames supported")
              width = le32(p + 8 + 4)
              height = le32(p + 8 + 8)
              require(width > 0 && height > 0 && width <= (1 << 20) && height <= (1 << 20),
                s"avi: implausible dims ${width}x$height")
            } else if (tag == "00db" || tag == "00dc") frames += ((p + 8, size))
            p = next
          }
        }
      }
    }
    walk(12, b.length)
    require(width > 0, "avi: no 'strf' video format chunk found")
    require(frames.nonEmpty, "avi: no frame chunks found")
    val fb = rowSize(width) * height
    val decoded = frames.map { case (off, declared) =>
      // the chunk's own declared size is the frame extent — comparing
      // against b.length alone would let a short frame chunk silently
      // decode the NEXT chunk's bytes as pixels
      require(declared == fb,
        s"avi: frame chunk declares $declared bytes, expected $fb for ${width}x$height")
      ImageCodec.decodeDibRaster(b, off, width, height)
    }.toArray
    DecodedVideo(width, height, decoded)
  }
}
