package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** MPEG-1 Layer III window switching — START / SHORT / STOP blocks —
  * graded against an independent linearity replay: the short granule's
  * transmitted-order line is mapped by hand through the reordering, the
  * per-window scalefactor + subblock gain, the 12-point filterbank with
  * the in-granule 6+6w window overlap, and the transitions' piecewise
  * windows; then through the same polyphase algebra the mono spec
  * pinned. Plus the loud-reject surface for the syntax the profile
  * still excludes.
  */
class Mp3ShortSpec extends AnyFunSuite {

  /** Replay of the 4-granule long/START/SHORT/STOP walk. */
  private def expected(d: Long): Array[Long] = {
    val totalSteps = 4 * 18
    val pcm = new Array[Long](totalSteps * 32)
    for (gi <- 0 until 4) {
      val bt = gi
      val pos = ((17 + 37 * d + 101 * gi) % 576).toInt
      val v = (1 + (d + 3 * gi) % 13).toInt
      val neg = (d + 5 * gi) % 2 == 1
      val gg = ((29 * d + 7 * gi) % 256).toInt
      val sc = ((d + gi) % 16).toInt
      val sscale = ((d / 4 + gi) % 2).toInt
      val gain = 1 + gg % 9
      def emit(sbp: Int, tval: Long, gs: Int): Unit = {
        if (gs < totalSteps) {
          for (m <- 0 to 15; if gs + m < totalSteps; i <- 0 until 32)
            pcm((gs + m) * 32 + i) +=
              tval * MpegAudio.nTab((m % 2) * 32 + i, sbp) * MpegAudio.dTab(m * 32 + i)
        }
      }
      if (bt == 2) {
        // short: transmitted t -> (band, window, line) -> subband slot
        val s = pos / 48
        val w = (pos % 48) / 16
        val f = 16 * s + pos % 16
        val sb = f / 6
        val i = f % 6
        val slen = if (s <= 5) sc >> 2 else sc & 3
        val sfv = ((d + 2 * w + s) % (1L << slen)).toInt
        val att = 1 + ((3L * sfv * (1 + sscale)) % 11)
        val subg = 1 + (5L * ((d + w + gi) % 8)) % 7
        val mag = v.toLong * (v + 2) * gain * att * subg
        val xr = if (neg) -mag else mag
        // no aliasing for short blocks; 12-point IMDCT at offset 6 + 6w
        for (p <- 0 until 12) {
          val s36 = 6 + 6 * w + p
          val gs = if (s36 < 18) gi * 18 + s36 else (gi + 1) * 18 + s36 - 18
          if (gs < totalSteps) {
            val ss = gs % 18
            val sgn = if (sb % 2 == 1 && ss % 2 == 1) -1L else 1L
            val tval = xr * ((19 * p + 7 * i + 3) % 17 - 8) *
              (1 + (5 * p) % 11) * sgn
            emit(sb, tval, gs)
          }
        }
      } else {
        // long-class (0 / START / STOP): the mono replay with the
        // block-type window; scfsi = 0 so no reuse indirection
        val band = math.min(pos / 26, 21)
        val slen = if (band <= 10) sc >> 2 else sc & 3
        val sfRaw = if (band > 20) 0L else (3 * d + band + gi) % (1L << slen)
        val pre = ((d / 2 + gi) % 2).toInt
        val sfv = sfRaw + (if (pre == 1) band % 3 else 0)
        val att = 1 + ((3 * sfv * (1 + sscale)) % 11)
        val mag = v.toLong * (v + 2) * gain * att
        val xr = if (neg) -mag else mag
        val sb = pos / 18
        val k = pos % 18
        def winSeq(p: Int): Long = bt match {
          case 0 => 1 + ((5 * p + 2) % 9)
          case 1 =>
            if (p < 18) 1 + ((5 * p + 2) % 9)
            else if (p < 24) 7
            else if (p < 30) 1 + (5 * (11 - (p - 24))) % 11
            else 0
          case _ =>
            if (p < 6) 0
            else if (p < 12) 1 + (5 * (p - 6)) % 11
            else if (p < 18) 7
            else 1 + ((5 * p + 2) % 9)
        }
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
              winSeq(p) * sgn
            emit(sbp, tval, gs)
          }
        }
      }
    }
    pcm
  }

  test("long/START/SHORT/STOP walk matches the independent replay") {
    for (d <- 0L until 24L) {
      val out = MpegAudio.decode(Multimodal.mp3SwitchStream(d))
      assert(out.layer == 3 && out.channels == 1 && out.nFrames == 2)
      assert(out.pcm.length == 2304)
      assert(out.pcm.toSeq == expected(d).toSeq, s"d=$d")
    }
  }

  test("loud rejects: mixed flag, reserved block_type, scfsi/stereo with short") {
    def shortGran(bt: Int): MpegAudio.L3Granule = MpegAudio.L3Granule(
      lines = Seq((100, 3)), globalGain = 40, scalefacCompress = 15,
      tableSelect = Array(12, 13, 14), region0Count = 2, region1Count = 2,
      preflag = 0, scalefacScale = 0, count1Table = 0, count1Quads = 0,
      stuffBits = 0, scalefac = _ => 0, blockType = bt,
      subblockGain = _ => 1, scalefacS = (_, _) => 1)
    // mixed_block_flag bit (frame bit 86) flipped on a START granule:
    // mixed blocks require block_type 2 (short), so this still rejects
    val startFrame = MpegAudio.encodeL3Frame(0, Array(shortGran(1), shortGran(1)))
    val mixedStart = startFrame.clone()
    mixedStart(10) = (mixedStart(10) ^ 0x02).toByte
    assertThrows[IllegalArgumentException](MpegAudio.decode(mixedStart))
    // block_type 01 -> 00 (reserved) on a START granule 0
    val reserved = startFrame.clone()
    reserved(10) = (reserved(10) ^ 0x04).toByte
    assertThrows[IllegalArgumentException](MpegAudio.decode(reserved))
    // scfsi reuse with a short granule is rejected at encode time
    assertThrows[IllegalArgumentException](
      MpegAudio.encodeL3Frame(5, Array(shortGran(2), shortGran(2))))
    // ...and in the stereo encoder too
    assertThrows[IllegalArgumentException](
      MpegAudio.encodeL3Stereo(Array(5, 0),
        Array(Array(shortGran(2), shortGran(2)), Array(shortGran(2), shortGran(2)))))
    // intensity stereo over window-switching granules stays a loud
    // rejection (the positional region derives from long band bounds)
    assertThrows[IllegalArgumentException](
      MpegAudio.encodeL3Stereo(Array(0, 0),
        Array(Array(shortGran(2), shortGran(2)), Array(shortGran(2), shortGran(2))),
        joint = true, modeExt = 1))
  }

  test("block type is value-visible: START and STOP windows differ") {
    def gran(bt: Int): MpegAudio.L3Granule = MpegAudio.L3Granule(
      lines = Seq((40, 5)), globalGain = 40, scalefacCompress = 0,
      tableSelect = Array(12, 13, 14), region0Count = 2, region1Count = 2,
      preflag = 0, scalefacScale = 0, count1Table = 0, count1Quads = 0,
      stuffBits = 0, scalefac = _ => 0, blockType = bt,
      subblockGain = _ => 0, scalefacS = (_, _) => 0)
    val a = MpegAudio.decode(MpegAudio.encodeL3Frame(0, Array(gran(1), gran(1)))).pcm
    val b = MpegAudio.decode(MpegAudio.encodeL3Frame(0, Array(gran(3), gran(3)))).pcm
    assert(a.toSeq != b.toSeq)
  }
}
