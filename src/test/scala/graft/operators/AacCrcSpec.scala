package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** CRC-protected ADTS frames: protection_absent = 0 inserts a 16-bit
  * crc_check (real ISO CRC-16 polynomial, all-ones init; covered region
  * pinned to header + raw-data bytes) between the header and the
  * raw_data_block. Protection must be PCM-transparent, damage must
  * reject loudly, and protected multi-block frames (which the spec
  * gives per-block position tables) stay a loud rejection.
  */
class AacCrcSpec extends AnyFunSuite {

  private def frameOf(d: Long, f: Int): AacCodec.AacFrame = {
    val pos = ((37 * d + 911 * f) % 1024).toInt
    val cb = (1 + (d + f) % 11).toInt
    val mag =
      if (cb == 11) (16 + d % 40).toInt
      else (1 + (d + f) % AacCodec.cbLav(cb)).toInt
    val v = if ((d + f) % 2 == 1) -mag else mag
    AacCodec.AacFrame(
      globalGain = (20 + (29 * d + 7 * f) % 200).toInt,
      lines = Seq((pos, v, cb)),
      sfDelta = ((d + 3 * f) % 41 - 20).toInt)
  }

  test("CRC frames are PCM-transparent") {
    for (d <- 0L until 16L) {
      val nf = (1 + d % 2).toInt
      val a = AacCodec.decode(Multimodal.aacCrcStream(d))
      val b = AacCodec.decode(AacCodec.encode((0 until nf).map(frameOf(d, _))))
      assert(a.nFrames == nf)
      assert(a.pcm.toSeq == b.pcm.toSeq, s"d=$d")
    }
  }

  test("damage rejects loudly; multi-block protection is refused") {
    val s0 = Multimodal.aacCrcStream(4)
    val body = s0.clone()
    body(10) = (body(10) ^ 0x04).toByte // inside the raw data block
    assertThrows[IllegalArgumentException](AacCodec.decode(body))
    val crc = s0.clone()
    crc(7) = (crc(7) ^ 0x01).toByte // the crc_check field
    assertThrows[IllegalArgumentException](AacCodec.decode(crc))
  }
}
