package graft.operators

import java.util.zip.{CRC32, DataFormatException, Deflater, Inflater}

import graft.operators.ImageCodec.DecodedImage

/** Real PNG codec with zero non-JDK dependencies: PNG's entropy coder is
  * zlib DEFLATE, which ships in every JDK (`java.util.zip.Inflater` /
  * `Deflater`), so "compressed container" does not mean "needs a codec
  * library" here — unlike JPEG (Huffman+DCT) and WebP (VP8), which do.
  *
  * Supported profile (PNG spec, W3C/ISO 15948): non-interlaced, bit
  * depths 8 and 16 (16 for the non-palette types — the filter algebra is
  * identical, just over 2-byte big-endian samples; decode returns the
  * high-order byte of each 16-bit sample, which is EXACT for content
  * produced by the spec's 8→16 scaling v·257 and the standard
  * approximation otherwise), all five color types — 0 (grayscale, 1
  * channel), 2 (truecolor RGB, 3), 3 (palette — indices expanded through
  * PLTE to RGB on decode), 4 (gray+alpha, 2) and 6 (truecolor+alpha RGBA,
  * 4). Decode is the full pipeline: signature + chunk walk with CRC-32
  * verification (§5.3), IDAT concatenation across chunks (§11.2.4), zlib
  * inflate, then per-row filter reconstruction for all five filter types —
  * None/Sub/Up/Average/Paeth (§9.2). The encoder is the exact inverse for
  * the non-palette types (at depth 16 it stores each 8-bit sample as
  * v·257, so encode→decode round-trips bit-exact at either depth) and
  * deliberately VARIES the filter per row, so a round-trip exercises every
  * reconstruction branch, not just filter 0. Chunk-walk strictness per
  * §5.3.2/§11.2.3: an UNRECOGNIZED CRITICAL chunk (bit 5 of the first tag
  * byte clear) is a loud reject — only ancillary chunks are skippable —
  * and PLTE must appear exactly once, before the first IDAT, and only for
  * the color types the spec allows it with. Not supported (rejected
  * loudly): bit depths 1/2/4, Adam7 interlace, and palette transparency
  * (tRNS alpha entries).
  *
  * Robustness contract (same as the other codecs): any malformed,
  * truncated, or unsupported blob raises IllegalArgumentException — never
  * a raw ArrayIndexOutOfBounds / DataFormatException / OutOfMemoryError —
  * so tolerant callers ([[Multimodal.decodeFeatures]]'s fallback) can
  * contain it. Inflated size is pre-bounded by the header's declared
  * dimensions (≤ 2^28 raw bytes), so a decompression bomb fails the bound
  * check instead of allocating.
  *
  * Reference behavior anchor: the reference pipeline ships media URLs as
  * opaque strings (reddit-ETL-Pipeline/airflow/extraction/
  * extract-from-reddit.py:34 `url` field); decoding the referenced bytes
  * is the training-pipeline extension surface, same as the other codecs.
  */
object PngCodec {

  private val Signature: Array[Byte] =
    Array(0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  /** Max raw (inflated) image bytes: 256 MiB. Dimensions that inflate past
    * this are rejected BEFORE any allocation sized by attacker data.
    */
  private val MaxRawBytes: Long = 1L << 28

  def isPng(b: Array[Byte]): Boolean =
    b != null && b.length >= 8 && {
      var i = 0
      while (i < 8 && b(i) == Signature(i)) i += 1
      i == 8
    }

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  /** Bytes per pixel as STORED in the filtered scanlines (palette rows
    * store one index byte per pixel, expanded to RGB only after
    * reconstruction).
    */
  private def storedChannelsOf(colorType: Int): Int = colorType match {
    case 0 => 1 // grayscale
    case 2 => 3 // truecolor
    case 3 => 1 // palette indices
    case 4 => 2 // gray + alpha
    case 6 => 4 // truecolor + alpha
    case ct => throw new IllegalArgumentException(
      s"png: color type $ct is not defined by the spec (0/2/3/4/6)")
  }

  /** Decode a PNG to logical row-major top-down channel-interleaved
    * pixels. Throws IllegalArgumentException on anything malformed,
    * truncated, CRC-corrupt, or outside the supported profile.
    */
  def decodePng(b: Array[Byte]): DecodedImage = {
    require(isPng(b), "png: missing 8-byte signature")
    try decodeChecked(b)
    catch {
      // inflate errors and any bounds slip surface as the documented IAE
      case e: DataFormatException =>
        throw new IllegalArgumentException(s"png: corrupt DEFLATE stream: ${e.getMessage}")
      case e: IndexOutOfBoundsException =>
        throw new IllegalArgumentException(s"png: truncated blob: ${e.getMessage}")
      case e: NegativeArraySizeException =>
        throw new IllegalArgumentException(s"png: negative length field: ${e.getMessage}")
    }
  }

  private def decodeChecked(b: Array[Byte]): DecodedImage = {
    // ---- chunk walk: IHDR must be first; concatenate IDAT; stop at IEND
    var p = 8
    var width = -1; var height = -1; var channels = -1; var colorType = -1
    var bytesPerSample = 1
    var palette: Array[Byte] = null
    var seenIhdr = false; var seenIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!seenIend) {
      require(p + 8 <= b.length, "png: truncated chunk header")
      val len = be32(b, p)
      require(len >= 0, s"png: chunk length $len out of range")
      val dataOff = p + 8
      require(dataOff + len.toLong + 4 <= b.length,
        s"png: chunk at $p declares $len bytes past end of blob")
      val tag = new String(b, p + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      // CRC-32 over chunk type + data (§5.3) — a corrupt blob fails loudly
      // here instead of mis-decoding
      val crc = new CRC32()
      crc.update(b, p + 4, 4 + len)
      require(crc.getValue.toInt == be32(b, dataOff + len),
        s"png: CRC mismatch on '$tag' chunk")
      tag match {
        case "IHDR" =>
          require(!seenIhdr, "png: duplicate IHDR")
          require(len == 13, s"png: IHDR length $len, spec requires 13")
          width = be32(b, dataOff)
          height = be32(b, dataOff + 4)
          val bitDepth = b(dataOff + 8) & 0xff
          colorType = b(dataOff + 9) & 0xff
          val compression = b(dataOff + 10) & 0xff
          val filterMethod = b(dataOff + 11) & 0xff
          val interlace = b(dataOff + 12) & 0xff
          channels = storedChannelsOf(colorType)
          require(bitDepth == 8 || (bitDepth == 16 && colorType != 3),
            s"png: bit depth $bitDepth unsupported for color type $colorType (8, or 16 non-palette)")
          bytesPerSample = bitDepth / 8
          require(compression == 0, s"png: compression method $compression, spec defines 0 only")
          require(filterMethod == 0, s"png: filter method $filterMethod, spec defines 0 only")
          require(interlace == 0, "png: Adam7 interlace unsupported (non-interlaced only)")
          require(width > 0 && height > 0 && width <= (1 << 20) && height <= (1 << 20),
            s"png: implausible dims ${width}x$height")
          // bound the LARGER of the stored raster (2 bytes/sample at depth
          // 16) and its post-palette RGB expansion, so neither allocation
          // is attacker-sized
          val effC = math.max(channels * bytesPerSample, if (colorType == 3) 3 else 0)
          require(width.toLong * height * effC + height <= MaxRawBytes,
            s"png: declared raster ${width}x${height}x$effC exceeds the $MaxRawBytes-byte bound")
          seenIhdr = true
        case "IDAT" =>
          require(seenIhdr, "png: IDAT before IHDR")
          idat.write(b, dataOff, len)
        case "PLTE" =>
          require(seenIhdr, "png: PLTE before IHDR")
          // §11.2.3: exactly one PLTE, before the first IDAT, and never in
          // a grayscale image — a stray palette must not silently recolor
          require(palette == null, "png: duplicate PLTE chunk")
          require(idat.size == 0, "png: PLTE after first IDAT")
          require(colorType == 2 || colorType == 3 || colorType == 6,
            s"png: PLTE not permitted for grayscale color type $colorType")
          require(len > 0 && len % 3 == 0 && len <= 768,
            s"png: PLTE length $len not a multiple of 3 in 3..768")
          palette = java.util.Arrays.copyOfRange(b, dataOff, dataOff + len)
        case "tRNS" =>
          // palette alpha would silently decode to wrong (opaque) pixels —
          // outside the supported profile, so reject rather than mis-decode
          throw new IllegalArgumentException("png: tRNS transparency unsupported")
        case "IEND" => seenIend = true
        case _ =>
          // §5.3.2: bit 5 of the first tag byte distinguishes ancillary
          // (lowercase, safely skippable — tEXt, pHYs, …) from critical
          // chunks, which a decoder that doesn't understand them must NOT
          // ignore: skipping one would mis-decode, so reject loudly.
          require((b(p + 4) & 0x20) != 0,
            s"png: unrecognized critical chunk '$tag'")
      }
      p = dataOff + len + 4
    }
    require(seenIhdr, "png: no IHDR chunk")
    require(idat.size > 0, "png: no IDAT data")
    require(colorType != 3 || palette != null, "png: palette image without PLTE chunk")

    // ---- zlib inflate to exactly height·(1 + rowBytes) filtered bytes
    val rowBytes = width * channels * bytesPerSample
    val raw = new Array[Byte]((rowBytes + 1) * height)
    val inf = new Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var got = 0
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        require(n > 0 || inf.finished(),
          "png: DEFLATE stream ended prematurely or needs a preset dictionary")
        got += n
      }
      require(got == raw.length,
        s"png: inflated $got bytes, header promises ${raw.length}")
      // a stream that keeps producing past the promised size means the
      // header lies about the raster — reject rather than silently truncate
      if (!inf.finished()) {
        val probe = new Array[Byte](1)
        require(inf.inflate(probe) == 0,
          "png: DEFLATE stream inflates past the header-promised size")
      }
    } finally inf.end()

    // ---- per-row filter reconstruction (§9.2) — bytewise at either
    // depth; bpp is the byte distance to the pixel on the left (§9.2's
    // "bpp" is defined in bytes, rounding up, so 2·channels at depth 16)
    val pixels = new Array[Byte](rowBytes * height)
    val bpp = channels * bytesPerSample
    var y = 0
    while (y < height) {
      val f = raw(y * (rowBytes + 1)) & 0xff
      val src = y * (rowBytes + 1) + 1
      val dst = y * rowBytes
      var x = 0
      while (x < rowBytes) {
        val cur = raw(src + x) & 0xff
        val a = if (x >= bpp) pixels(dst + x - bpp) & 0xff else 0 // left
        val up = if (y > 0) pixels(dst - rowBytes + x) & 0xff else 0 // above
        val recon = f match {
          case 0 => cur
          case 1 => cur + a
          case 2 => cur + up
          case 3 => cur + ((a + up) >> 1)
          case 4 =>
            val c = if (x >= bpp && y > 0) pixels(dst - rowBytes + x - bpp) & 0xff else 0
            // Paeth predictor (§9.4): nearest of a/up/c to p = a+up-c,
            // ties broken a, then up, then c
            val pp = a + up - c
            val pa = math.abs(pp - a); val pb = math.abs(pp - up); val pc = math.abs(pp - c)
            cur + (if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c)
          case other => throw new IllegalArgumentException(
            s"png: filter type $other on row $y, spec defines 0-4")
        }
        pixels(dst + x) = recon.toByte
        x += 1
      }
      y += 1
    }
    // depth 16 → logical 8-bit: samples are big-endian (§7.1), so the
    // high-order byte is byte 0 of each pair — exact for v·257-scaled
    // content, the standard truncation otherwise
    val samples =
      if (bytesPerSample == 1) pixels
      else {
        val out = new Array[Byte](width * height * channels)
        var i = 0
        while (i < out.length) { out(i) = pixels(i << 1); i += 1 }
        out
      }
    if (colorType != 3) DecodedImage("png", width, height, channels, samples)
    else {
      // palette expansion: index bytes → RGB triples through PLTE. An
      // index past the palette is corrupt data, not a blank pixel.
      val nEntries = palette.length / 3
      val rgb = new Array[Byte](width * height * 3)
      var i = 0
      while (i < pixels.length) {
        val idx = pixels(i) & 0xff
        require(idx < nEntries,
          s"png: palette index $idx out of range (palette has $nEntries entries)")
        rgb(i * 3) = palette(idx * 3)
        rgb(i * 3 + 1) = palette(idx * 3 + 1)
        rgb(i * 3 + 2) = palette(idx * 3 + 2)
        i += 1
      }
      DecodedImage("png", width, height, 3, rgb)
    }
  }

  /** Encode logical pixels as a real PNG. `filterOf(row)` picks the
    * per-row filter type (0-4) — the encoder computes the filtered bytes
    * exactly per §9.2, so ANY choice round-trips; varying it per row makes
    * a single image exercise every reconstruction branch. At
    * `bitDepth = 16` each logical 8-bit sample v is stored as the 16-bit
    * big-endian value v·257 (the spec's exact 8→16 scaling, both bytes =
    * v), so [[decodePng]]'s high-byte conversion returns it bit-exact.
    * Compression level 6 (Deflater default); output readable by any
    * standards-conformant PNG reader.
    */
  def encodePng(width: Int, height: Int, channels: Int, pix: Int => Byte,
                filterOf: Int => Int = _ % 5, bitDepth: Int = 8): Array[Byte] = {
    require(width > 0 && height > 0, s"encodePng: bad dims ${width}x$height")
    require(bitDepth == 8 || bitDepth == 16,
      s"encodePng: bit depth $bitDepth unsupported (8/16)")
    val colorType = channels match {
      case 1 => 0
      case 2 => 4 // gray + alpha
      case 3 => 2
      case 4 => 6
      case c => throw new IllegalArgumentException(
        s"encodePng: $c channels unsupported (1/2/3/4)")
    }
    val bps = bitDepth / 8
    // same raster bound as decode: near-Int-overflow dims must fail loudly
    // here, not wrap (rowBytes+1)·height into a NegativeArraySizeException
    require(width.toLong * height * channels * bps + height <= MaxRawBytes,
      s"encodePng: raster ${width}x${height}x$channels@$bitDepth exceeds the $MaxRawBytes-byte bound")
    val rowBytes = width * channels * bps
    val bpp = channels * bps
    // the unfiltered byte at stream offset k: at depth 16 both bytes of a
    // sample equal the logical value (v·257 big-endian), so k maps to
    // logical sample k/2
    def srcByte(k: Int): Int = pix(if (bps == 2) k >> 1 else k) & 0xff
    // filter every row per the chosen type
    val raw = new Array[Byte]((rowBytes + 1) * height)
    var y = 0
    while (y < height) {
      val f = filterOf(y)
      require(f >= 0 && f <= 4, s"encodePng: filter $f out of range for row $y")
      raw(y * (rowBytes + 1)) = f.toByte
      val dst = y * (rowBytes + 1) + 1
      var x = 0
      while (x < rowBytes) {
        val cur = srcByte(y * rowBytes + x)
        val a = if (x >= bpp) srcByte(y * rowBytes + x - bpp) else 0
        val up = if (y > 0) srcByte((y - 1) * rowBytes + x) else 0
        val filtered = f match {
          case 0 => cur
          case 1 => cur - a
          case 2 => cur - up
          case 3 => cur - ((a + up) >> 1)
          case _ =>
            val c = if (x >= bpp && y > 0) srcByte((y - 1) * rowBytes + x - bpp) else 0
            val pp = a + up - c
            val pa = math.abs(pp - a); val pb = math.abs(pp - up); val pc = math.abs(pp - c)
            cur - (if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c)
        }
        raw(dst + x) = filtered.toByte
        x += 1
      }
      y += 1
    }
    // zlib-deflate the filtered stream (Deflater's default wrapper IS zlib)
    val def_ = new Deflater(Deflater.DEFAULT_COMPRESSION)
    val compressed = try {
      def_.setInput(raw); def_.finish()
      val buf = new Array[Byte](math.max(64, raw.length / 2))
      val out = new java.io.ByteArrayOutputStream()
      while (!def_.finished()) {
        val n = def_.deflate(buf)
        out.write(buf, 0, n)
      }
      out.toByteArray
    } finally def_.end()

    val out = new java.io.ByteArrayOutputStream(
      8 + 25 + (12 + compressed.length) + 12)
    out.write(Signature)
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, width); putBe32(ihdr, 4, height)
    ihdr(8) = bitDepth.toByte; ihdr(9) = colorType.toByte // compression/filter/interlace = 0
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "IDAT", compressed)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def putBe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
  }

  private def writeChunk(out: java.io.ByteArrayOutputStream, tag: String,
                         data: Array[Byte]): Unit = {
    val len = new Array[Byte](4); putBe32(len, 0, data.length)
    out.write(len)
    val tagBytes = tag.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    out.write(tagBytes)
    out.write(data)
    val crc = new CRC32()
    crc.update(tagBytes); crc.update(data)
    val crcBytes = new Array[Byte](4); putBe32(crcBytes, 0, crc.getValue.toInt)
    out.write(crcBytes)
  }
}
