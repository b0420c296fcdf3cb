package graft.operators

/** Real video codec for AVI — the video analog of
  * [[ImageCodec]]/[[WavCodec]]: an AVI file is a RIFF container
  * (`RIFF…AVI `) holding a `hdrl` header LIST (`avih` main header, one
  * `strl` stream LIST with `strh`/`strf`) and a `movi` LIST of frame
  * chunks. Two real frame formats:
  *
  *  - uncompressed 24-bit DIB (`00db` chunks, biCompression=BI_RGB): the
  *    exact BMP raster (bottom-up, BGR, 4-byte-padded rows) — pure
  *    arithmetic (OpenDML/AVI RIFF spec; DIB raster per the BMP spec);
  *  - Motion JPEG (`00dc` chunks, biCompression='MJPG'): each frame chunk
  *    is a complete baseline JPEG decoded through [[JpegCodec]] — a REAL
  *    LOSSY VIDEO format (every frame pays JPEG's forward DCT +
  *    quantization + Huffman entropy coding), and the first lossy rung of
  *    the video ladder: intra-only, which is exactly what makes it
  *    tractable without the inter-prediction machinery of H.264-class
  *    codecs. MJPEG's random-access property (every frame independently
  *    decodable) is also the 100 TB splittability story — a frame chunk
  *    boundary is a valid split point, like a parquet row group.
  *
  * Inter-predicted codecs (H.264/VP9/AV1) remain the labeled stand-ins in
  * [[Multimodal.sampleFrames]]: unbudgeted spec work, not impossible —
  * the MJPEG rung reuses this repo's own from-scratch JPEG entropy coder.
  */
object AviCodec {

  /** 'MJPG' as the little-endian biCompression value. */
  private val FourccMjpg: Int =
    'M'.toInt | ('J'.toInt << 8) | ('P'.toInt << 16) | ('G'.toInt << 24)

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

  /** Encode a Motion-JPEG AVI: `frames(f)` is frame `f` as a complete
    * baseline JPEG blob (produce them with [[JpegCodec.encodeJpeg]] at the
    * declared dimensions — the decoder cross-checks every frame's SOF dims
    * against the strf header). Container layout mirrors [[encodeAvi24]]
    * with handler/biCompression 'MJPG' and variable-size `00dc` chunks
    * (word-aligned per the RIFF rule, which is load-bearing here: JPEG
    * blobs are odd-sized roughly half the time).
    */
  def encodeAviMjpeg(width: Int, height: Int, fps: Int,
                     frames: Array[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && fps > 0 && frames != null && frames.nonEmpty,
      s"encodeAviMjpeg: bad args ${width}x$height fps=$fps")
    frames.foreach(f => require(f != null && JpegCodec.isJpeg(f),
      "encodeAviMjpeg: every frame must be a JPEG blob"))
    val nFrames = frames.length
    val maxFrame = frames.map(_.length).max
    val strlSize = 4 + (8 + 56) + (8 + 40)
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
    val moviSize = 4 + frames.map(f => 8 + f.length + (f.length & 1)).sum
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val out = new Array[Byte](8 + riffSize)
    var p = 0
    def tag(s: String): Unit = { Riff.putTag(out, p, s); p += 4 }
    def le32(v: Int): Unit = { Riff.putLe32(out, p, v); p += 4 }
    def le16(v: Int): Unit = { Riff.putLe16(out, p, v); p += 2 }
    tag("RIFF"); le32(riffSize); tag("AVI ")
    tag("LIST"); le32(hdrlSize); tag("hdrl")
    tag("avih"); le32(56)
    le32(1000000 / fps)
    le32(maxFrame * fps)
    le32(0); le32(0)
    le32(nFrames); le32(0); le32(1)
    le32(maxFrame)
    le32(width); le32(height)
    le32(0); le32(0); le32(0); le32(0)
    tag("LIST"); le32(strlSize); tag("strl")
    tag("strh"); le32(56)
    tag("vids"); tag("MJPG")
    le32(0); le16(0); le16(0)
    le32(0)
    le32(1); le32(fps)
    le32(0); le32(nFrames)
    le32(maxFrame)
    le32(-1)
    le32(0)
    le16(0); le16(0); le16(width); le16(height)
    tag("strf"); le32(40)
    le32(40); le32(width); le32(height)
    le16(1); le16(24)
    le32(FourccMjpg)
    le32(maxFrame)
    le32(2835); le32(2835); le32(0); le32(0)
    tag("LIST"); le32(moviSize); tag("movi")
    frames.foreach { f =>
      tag("00dc"); le32(f.length)
      System.arraycopy(f, 0, out, p, f.length)
      p += f.length
      if ((f.length & 1) == 1) { out(p) = 0; p += 1 }
    }
    assert(p == out.length, s"mjpeg avi encoder layout bug: wrote $p of ${out.length}")
    out
  }

  /** Decode an uncompressed AVI: chunk-scan to the `strf`
    * BITMAPINFOHEADER for dimensions, then collect every `00db`/`00dc`
    * frame chunk in the `movi` LIST in file order. Throws
    * IllegalArgumentException on anything malformed or compressed.
    */
  def decodeAvi24(b: Array[Byte]): DecodedVideo = decodeImpl(b, allowMjpeg = false)

  /** Decode an AVI of either supported frame format — uncompressed 24-bit
    * DIB or Motion JPEG (routed on strf's biCompression). Frames come back
    * in the [[DecodedVideo]] convention regardless of source format:
    * top-down row-major RGB, with grayscale JPEG frames expanded to
    * RGB by channel replication so a clip's frames are uniform.
    */
  def decodeAviVideo(b: Array[Byte]): DecodedVideo = decodeImpl(b, allowMjpeg = true)

  private def decodeImpl(b: Array[Byte], allowMjpeg: Boolean): DecodedVideo = {
    require(isAvi(b), "avi: missing RIFF/AVI signature")
    def le16(i: Int): Int = Riff.le16(b, i)
    def le32(i: Int): Int = Riff.le32(b, i)
    def fourcc(i: Int): String = Riff.tag(b, i)
    var width = -1; var height = -1; var compression = 0
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
              compression = le32(p + 8 + 16)
              if (compression == FourccMjpg)
                require(allowMjpeg,
                  "avi: MJPG frames — use decodeAviVideo, decodeAvi24 is the raw-DIB path")
              else {
                require(compression == 0,
                  s"avi: unsupported biCompression 0x${compression.toHexString} " +
                    "(only BI_RGB and 'MJPG' are implemented)")
                require(le16(p + 8 + 14) == 24, s"avi: only 24-bit DIB frames supported")
              }
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
    val decoded =
      if (compression == FourccMjpg) frames.map { case (off, declared) =>
        val img = JpegCodec.decodeJpeg(
          java.util.Arrays.copyOfRange(b, off, off + declared))
        // strf is the clip contract; a frame whose own SOF disagrees is
        // corrupt, not a resize
        require(img.width == width && img.height == height,
          s"avi: MJPG frame is ${img.width}x${img.height}, strf declares ${width}x$height")
        if (img.channels == 3) img.pixels
        else {
          require(img.channels == 1, s"avi: MJPG frame has ${img.channels} channels")
          val rgb = new Array[Byte](img.pixels.length * 3)
          var i = 0
          while (i < img.pixels.length) {
            val v = img.pixels(i)
            rgb(3 * i) = v; rgb(3 * i + 1) = v; rgb(3 * i + 2) = v
            i += 1
          }
          rgb
        }
      }.toArray
      else {
        val fb = rowSize(width) * height
        frames.map { case (off, declared) =>
          // the chunk's own declared size is the frame extent — comparing
          // against b.length alone would let a short frame chunk silently
          // decode the NEXT chunk's bytes as pixels
          require(declared == fb,
            s"avi: frame chunk declares $declared bytes, expected $fb for ${width}x$height")
          ImageCodec.decodeDibRaster(b, off, width, height)
        }.toArray
      }
    DecodedVideo(width, height, decoded)
  }
}
