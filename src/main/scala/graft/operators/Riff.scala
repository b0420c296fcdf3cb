package graft.operators

/** Little-endian byte primitives shared by the RIFF-family codecs
  * ([[ImageCodec]] BMP, [[WavCodec]], [[AviCodec]]) — one implementation
  * of the load-bearing read/write helpers instead of a copy per codec.
  */
private[operators] object Riff {
  def le16(b: Array[Byte], i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  def le32(b: Array[Byte], i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
    ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  def putLe16(out: Array[Byte], off: Int, v: Int): Unit = {
    out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
  }

  def putLe32(out: Array[Byte], off: Int, v: Int): Unit = {
    out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    out(off + 2) = ((v >> 16) & 0xff).toByte; out(off + 3) = ((v >> 24) & 0xff).toByte
  }

  def putTag(out: Array[Byte], off: Int, s: String): Unit =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      .zipWithIndex.foreach { case (b, i) => out(off + i) = b }

  def tag(b: Array[Byte], i: Int): String =
    new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** The padded-DIB-row byte width — BMP files and AVI DIB frames share
    * this one load-bearing formula.
    */
  def dibRowSize(width: Int): Int = ((3 * width + 3) / 4) * 4

  /** Parsed WAVE chunk layout: the format fields every WAV-family decoder
    * needs, plus the `fact` frame count non-PCM formats carry.
    */
  final case class WaveChunks(audioFormat: Int, channels: Int, sampleRate: Int,
                              blockAlign: Int, bits: Int, extra: Array[Byte],
                              dataOff: Int, dataLen: Int,
                              factSamples: Option[Int])

  /** Chunk-scan a RIFF/WAVE blob to its fmt/data/fact facts — the shared
    * walk behind [[WavCodec]] (PCM), [[G711Codec]] (μ-law) and
    * [[AdpcmCodec]] (IMA). Unknown chunks skip with their odd-size pad
    * byte; malformed layouts throw, never misparse.
    */
  def scanWave(b: Array[Byte]): WaveChunks = {
    require(WavCodec.isWav(b), "wav: missing RIFF/WAVE signature")
    var fmtOff = -1; var fmtLen = -1
    var dataOff = -1; var dataLen = -1
    var fact: Option[Int] = None
    var p = 12
    while (p + 8 <= b.length) {
      val t = tag(b, p)
      val size = le32(b, p + 4)
      require(size >= 0 && p + 8 + size.toLong <= b.length,
        s"wav: chunk '$t' size $size overruns the ${b.length}-byte blob")
      if (t == "fmt ") {
        require(size >= 16, s"wav: 'fmt ' chunk too short ($size bytes, need 16)")
        fmtOff = p + 8; fmtLen = size
      } else if (t == "data") { dataOff = p + 8; dataLen = size }
      else if (t == "fact") {
        require(size >= 4, s"wav: 'fact' chunk too short ($size bytes)")
        fact = Some(le32(b, p + 8))
      }
      p += 8 + size + (size & 1)
    }
    require(fmtOff >= 0, "wav: no 'fmt ' chunk")
    require(dataOff >= 0, "wav: no 'data' chunk")
    val extra =
      if (fmtLen > 16) java.util.Arrays.copyOfRange(b, fmtOff + 16, fmtOff + fmtLen)
      else Array.emptyByteArray
    WaveChunks(le16(b, fmtOff), le16(b, fmtOff + 2), le32(b, fmtOff + 4),
      le16(b, fmtOff + 12), le16(b, fmtOff + 14), extra, dataOff, dataLen, fact)
  }
}
