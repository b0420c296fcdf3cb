package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** MPEG-1 Layer III BIT RESERVOIR under fixed-rate framing, graded
  * against an independent linearity replay AND against the reservoir's
  * defining property: framing is transparent — the same granules coded
  * free-format (main data inline) must decode to identical PCM. Every
  * frame after the first points back into earlier physical segments
  * via main_data_begin; a decoder that reads main data inline (or
  * mis-seeks the reservoir) desyncs every granule after frame 0.
  */
class Mp3ResvSpec extends AnyFunSuite {

  private def expected(d: Long): Array[Long] = {
    val totalSteps = 8 * 18
    val pcm = new Array[Long](totalSteps * 32)
    for (gi <- 0 until 8) {
      val pos = ((13 + 29 * d + 101 * gi) % 32).toInt
      val v = (1 + (d + 3 * gi) % 13).toInt
      val neg = (d + 5 * gi) % 2 == 1
      val gain = 1 + ((29 * d + 7 * gi) % 256) % 9
      val sc = ((d + gi) % 16).toInt
      val sscale = ((d / 4 + gi) % 2).toInt
      val band = pos / 26
      val slen = if (band <= 10) sc >> 2 else sc & 3
      val sfRaw = (3 * d + band + gi) % (1L << slen)
      val pre = ((d / 2 + gi) % 2).toInt
      val sfv = sfRaw + (if (pre == 1) band % 3 else 0)
      val att = 1 + ((3 * sfv * (1 + sscale)) % 11)
      val mag = v.toLong * (v + 2) * gain * att
      val xr = if (neg) -mag else mag
      val sb = pos / 18
      val k = pos % 18
      val alias =
        if (k >= 10 && sb < 31)
          Seq((sb, k, 2L + (17 - k) % 3), (sb + 1, 17 - k, 1L + (17 - k) % 2))
        else if (k <= 7 && sb >= 1)
          Seq((sb, k, 2L + k % 3), (sb - 1, 17 - k, -(1L + k % 2)))
        else Seq((sb, k, 1L))
      for ((sbp, kp, w0) <- alias; p <- 0 until 36) {
        val gs = if (p < 18) gi * 18 + p else (gi + 1) * 18 + (p - 18)
        if (gs < totalSteps) {
          val ss = gs % 18
          val sgn = if (sbp % 2 == 1 && ss % 2 == 1) -1L else 1L
          val tval = xr * w0 * (((7 * p + 11 * kp + 3) % 23) - 11) *
            (1 + ((5 * p + 2) % 9)) * sgn
          for (m <- 0 to 15; if gs + m < totalSteps; i <- 0 until 32)
            pcm((gs + m) * 32 + i) +=
              tval * MpegAudio.nTab((m % 2) * 32 + i, sbp) * MpegAudio.dTab(m * 32 + i)
        }
      }
    }
    pcm
  }

  test("reservoir stream matches the independent replay") {
    for (d <- 0L until 24L) {
      val out = MpegAudio.decode(Multimodal.mp3ResvStream(d))
      assert(out.layer == 3 && out.channels == 1 && out.nFrames == 4)
      assert(out.pcm.length == 4608)
      assert(out.pcm.toSeq == expected(d).toSeq, s"d=$d")
    }
  }

  test("framing is transparent: reservoir equals free-format PCM") {
    for (d <- 0L until 8L) {
      def gran(gi: Int): MpegAudio.L3Granule = {
        val pos = ((13 + 29 * d + 101 * gi) % 32).toInt
        val v = (1 + (d + 3 * gi) % 13).toInt
        val sc = ((d + gi) % 16).toInt
        MpegAudio.L3Granule(
          lines = Seq((pos, if ((d + 5 * gi) % 2 == 1) -v else v)),
          globalGain = ((29 * d + 7 * gi) % 256).toInt,
          scalefacCompress = sc,
          tableSelect = Array((12 + d % 3).toInt, (12 + (d + 1) % 3).toInt,
            (12 + (d + 2) % 3).toInt),
          region0Count = (d % 6).toInt, region1Count = (d % 4).toInt,
          preflag = ((d / 2 + gi) % 2).toInt,
          scalefacScale = ((d / 4 + gi) % 2).toInt,
          count1Table = (d % 2).toInt, count1Quads = 0,
          stuffBits = (3 * ((d + gi) % 2)).toInt,
          scalefac = band => {
            val slen = if (band <= 10) sc >> 2 else sc & 3
            ((3 * d + band + gi) % (1L << slen)).toInt
          })
      }
      val free = new java.io.ByteArrayOutputStream()
      for (f <- 0 until 4) {
        val fr = MpegAudio.encodeL3Frame(0, Array(gran(2 * f), gran(2 * f + 1)))
        free.write(fr, 0, fr.length)
      }
      val a = MpegAudio.decode(free.toByteArray).pcm
      val b = MpegAudio.decode(Multimodal.mp3ResvStream(d)).pcm
      assert(a.toSeq == b.toSeq, s"d=$d")
    }
  }

  test("the reservoir really engages and free format rejects it") {
    // every frame after the first must carry a nonzero main_data_begin
    val stream = Multimodal.mp3ResvStream(5)
    val frameBytes = 144 * 40 * 1000 / 44100 // d=5 -> bitrate index 2
    for (n <- 1 until 4) {
      val off = n * frameBytes + 4 // first side-info byte: mdb bits 0..7
      assert((stream(off) & 0xff) != 0, s"frame $n main_data_begin is zero")
    }
    // a free-format frame with a nonzero main_data_begin must reject
    val freeFrame = MpegAudio.encodeL3Frame(0, Array.fill(2)(
      MpegAudio.L3Granule(lines = Seq((10, 3)), globalGain = 40,
        scalefacCompress = 0,
        tableSelect = Array(12, 13, 14), region0Count = 2, region1Count = 2,
        preflag = 0, scalefacScale = 0, count1Table = 0, count1Quads = 0,
        stuffBits = 0, scalefac = _ => 0)))
    val tampered = freeFrame.clone()
    tampered(4) = (tampered(4) | 0x80).toByte // main_data_begin high bit
    assertThrows[IllegalArgumentException](MpegAudio.decode(tampered))
  }
}
