package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** CRC-protected MPEG-1 Layer III frames: the real ISO 11172-3 CRC-16
  * (generator x^16 + x^15 + x^2 + 1, all-ones initial state) over
  * header bits 16..31 plus the side information. Protection must be
  * PCM-transparent, and any damage to the covered region — or to the
  * CRC field itself — must reject loudly instead of desyncing.
  */
class Mp3CrcSpec extends AnyFunSuite {

  test("CRC frames are PCM-transparent") {
    for (d <- 0L until 16L) {
      val a = MpegAudio.decode(Multimodal.mp3CrcStream(d))
      assert(a.layer == 3 && a.channels == 1 && a.nFrames == 1 + d % 2)
      // transparency vs the unprotected coding of the same plan
      val b = MpegAudio.decode(mp3PlainStream(d))
      assert(a.pcm.toSeq == b.pcm.toSeq, s"d=$d")
    }
  }

  private def mp3PlainStream(d: Long): Array[Byte] = {
    def gran(gi: Int): MpegAudio.L3Granule = {
      val pos = ((17 + 37 * d + 101 * gi) % 576).toInt
      val esc = (d + gi) % 3 == 0
      val v = if (esc) (15 + (d % 2)).toInt else (1 + ((d + 3 * gi) % 13)).toInt
      val signed = if ((d + 5 * gi) % 2 == 1) -v else v
      val sc = ((d + gi) % 16).toInt
      val tsel =
        if (esc) Array((16 + d % 16).toInt, (16 + (d + 1) % 16).toInt,
          (16 + (d + 2) % 16).toInt)
        else Array((12 + d % 3).toInt, (12 + (d + 1) % 3).toInt,
          (12 + (d + 2) % 3).toInt)
      val bigValues = pos / 2 + 1
      MpegAudio.L3Granule(
        lines = Seq((pos, signed)),
        globalGain = ((29 * d + 7 * gi) % 256).toInt,
        scalefacCompress = sc,
        tableSelect = tsel,
        region0Count = (d % 6).toInt, region1Count = (d % 4).toInt,
        preflag = ((d / 2 + gi) % 2).toInt,
        scalefacScale = ((d / 4 + gi) % 2).toInt,
        count1Table = (d % 2).toInt,
        count1Quads = math.min((d % 5).toInt, (576 - 2 * bigValues) / 4),
        stuffBits = (3 * ((d + gi) % 2)).toInt,
        scalefac = band => {
          val slen = if (band <= 10) sc >> 2 else sc & 3
          ((3 * d + band + gi) % (1L << slen)).toInt
        })
    }
    val nf = 1 + (d % 2).toInt
    val bos = new java.io.ByteArrayOutputStream()
    var f = 0
    while (f < nf) {
      val fr = MpegAudio.encodeL3Frame((d % 16).toInt,
        Array(gran(2 * f), gran(2 * f + 1)))
      bos.write(fr, 0, fr.length)
      f += 1
    }
    bos.toByteArray
  }

  test("damage to the covered region rejects loudly") {
    val s0 = Multimodal.mp3CrcStream(3)
    // side info starts at byte 6 (header 4 + CRC 2): flip one bit
    val sideTampered = s0.clone()
    sideTampered(8) = (sideTampered(8) ^ 0x10).toByte
    assertThrows[IllegalArgumentException](MpegAudio.decode(sideTampered))
    // the CRC field itself
    val crcTampered = s0.clone()
    crcTampered(5) = (crcTampered(5) ^ 0x01).toByte
    assertThrows[IllegalArgumentException](MpegAudio.decode(crcTampered))
  }
}
