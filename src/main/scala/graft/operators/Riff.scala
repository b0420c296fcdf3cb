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
}
