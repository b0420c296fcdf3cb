package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** MPEG-1 Layer I/II: bit I/O, framing, scfsi semantics, grouped codes,
  * filterbank structure (FIFO continuity across frames), and the
  * malformed-input surface.
  */
class MpegAudioSpec extends AnyFunSuite {

  private def l1Frame(d: Long, f: Int): MpegAudio.L1Frame = {
    val k0 = ((d + 5 * f) % 32).toInt
    val allocN = (1 + ((d + f) % 13)).toInt
    val n = (1 << (allocN + 1)) - 1
    val alloc = Array.fill(32)(0); alloc(k0) = allocN
    val sf = Array.fill(32)(0); sf(k0) = ((d + 7 * f) % 64).toInt
    val raw = Array.tabulate(12, 32)((gg, sb) =>
      if (sb == k0) ((5 * d + 7 * (12 * f + gg) + 3) % n).toInt else 0)
    MpegAudio.L1Frame(alloc, sf, raw)
  }

  test("bit I/O: writer and reader are inverses across byte boundaries") {
    val bw = new MpegAudio.BitWriter
    val vals = Seq((0x7ffL, 11), (3L, 2), (0L, 1), (0x3fL, 6), (1L, 1), (1023L, 10), (0L, 5))
    vals.foreach { case (v, b) => bw.put(v, b) }
    val bytes = bw.bytes()
    val br = new MpegAudio.BitReader(bytes, 0)
    vals.foreach { case (v, b) => assert(br.get(b) == v, s"$v/$b") }
  }

  test("layer I: a decoded frame's PCM matches the closed-form filterbank sum") {
    for (d <- Seq(0L, 2L, 8L, 44L)) {
      val bytes = MpegAudio.encodeL1Frame(l1Frame(d, 0)) ++
        MpegAudio.encodeL1Frame(l1Frame(d, 1))
      val out = MpegAudio.decode(bytes)
      assert(out.layer == 1 && out.nFrames == 2 && out.pcm.length == 768)
      // closed-form replay: the 16-tap FIFO convolution per output sample
      def sOf(g: Int): (Int, Long) = {
        val f = g / 12
        val k0 = ((d + 5 * f) % 32).toInt
        val allocN = (1 + ((d + f) % 13)).toInt
        val n = (1 << (allocN + 1)) - 1
        val raw = (5 * d + 7 * g + 3) % n
        val sf = (d + 7 * f) % 64
        (k0, (2 * raw + 1 - n) * (1 + (3 * sf) % 13))
      }
      for (g <- 0 until 24; i <- 0 until 32) {
        var want = 0L
        for (m <- 0 to math.min(15, g)) {
          val (k0, sv) = sOf(g - m)
          val vi = (m % 2) * 32 + i
          want += MpegAudio.dTab(m * 32 + i) * MpegAudio.nTab(vi, k0) * sv
        }
        assert(out.pcm(g * 32 + i) == want, s"d=$d pcm($g,$i)")
      }
    }
  }

  test("layer II: scfsi patterns share scalefactors across parts exactly") {
    // same codes, four scfsi patterns: parts must pick the right SF
    for (pat <- 0 to 3) {
      val k0 = 3
      val alloc = Array.fill(MpegAudio.L2SbLimit)(0); alloc(k0) = 5 // 31 levels
      val scfsi = Array.fill(MpegAudio.L2SbLimit)(0); scfsi(k0) = pat
      val sf = Array.fill(MpegAudio.L2SbLimit, 3)(0)
      sf(k0)(0) = 10; sf(k0)(1) = 20; sf(k0)(2) = 30
      val raw = Array.tabulate(36, MpegAudio.L2SbLimit)((g, sb) =>
        if (sb == k0) (g * 7 + 1) % 31 else 0)
      val out = MpegAudio.decode(MpegAudio.encodeL2Frame(
        MpegAudio.L2Frame(alloc, scfsi, sf, raw)))
      assert(out.layer == 2 && out.pcm.length == 1152)
      def sfPart(p: Int): Int = pat match {
        case 0 => Seq(10, 20, 30)(p)
        case 1 => Seq(10, 10, 20)(p)
        case 2 => 10
        case _ => Seq(10, 20, 20)(p)
      }
      for (g <- 0 until 36; i <- 0 until 32) {
        var want = 0L
        for (m <- 0 to math.min(15, g)) {
          val sg = g - m
          val n = 31
          val sv = (2L * ((sg * 7 + 1) % 31) + 1 - n) *
            (1 + (3 * sfPart(sg / 12)) % 13)
          want += MpegAudio.dTab(m * 32 + i) *
            MpegAudio.nTab((m % 2) * 32 + i, k0) * sv
        }
        assert(out.pcm(g * 32 + i) == want, s"pat=$pat pcm($g,$i)")
      }
    }
  }

  test("layer II: grouped 3/5/9-level triplets unpack in s0,s1,s2 order") {
    for (allocV <- Seq(1, 2, 4)) {
      val (n, grouped, _) = MpegAudio.l2Class(allocV)
      assert(grouped)
      val k0 = 0
      val alloc = Array.fill(MpegAudio.L2SbLimit)(0); alloc(k0) = allocV
      val scfsi = Array.fill(MpegAudio.L2SbLimit)(2) // one SF
      val sf = Array.fill(MpegAudio.L2SbLimit, 3)(0)
      val raw = Array.tabulate(36, MpegAudio.L2SbLimit)((g, sb) =>
        if (sb == k0) (g * 2 + 1) % n else 0)
      val out = MpegAudio.decode(MpegAudio.encodeL2Frame(
        MpegAudio.L2Frame(alloc, scfsi, sf, raw)))
      // replay granule 0..2 only (taps reach back within the frame)
      for (g <- 0 until 36; i <- 0 until 32) {
        var want = 0L
        for (m <- 0 to math.min(15, g)) {
          val sg = g - m
          val sv = (2L * ((sg * 2 + 1) % n) + 1 - n) * MpegAudio.sfTab(0)
          want += MpegAudio.dTab(m * 32 + i) *
            MpegAudio.nTab((m % 2) * 32 + i, k0) * sv
        }
        assert(out.pcm(g * 32 + i) == want, s"alloc=$allocV pcm($g,$i)")
      }
    }
  }

  test("filterbank FIFO carries across frames: two-frame stream != frames decoded separately") {
    val bytes2 = MpegAudio.encodeL1Frame(l1Frame(6L, 0)) ++
      MpegAudio.encodeL1Frame(l1Frame(6L, 1))
    val joint = MpegAudio.decode(bytes2)
    val second = MpegAudio.decode(MpegAudio.encodeL1Frame(l1Frame(6L, 1)))
    // the second frame's early granules see the first frame's FIFO tail
    val jointSecond = joint.pcm.slice(384, 768)
    assert(!jointSecond.sameElements(second.pcm),
      "frame 2 must be shaped by frame 1's filterbank state")
    // ...but once the 16-granule FIFO has flushed, they agree
    assert(jointSecond.slice(512, 768 - 384).sameElements(
      second.pcm.slice(512, 768 - 384) /* same region */) ||
      jointSecond.drop(16 * 32).sameElements(second.pcm.drop(16 * 32)),
      "after 16 granules the FIFO histories converge")
  }

  test("stereo: channels decode independently and interleave sample-major") {
    // channel 0 = the mono fixture; channel 1 carries distinct signal —
    // the stereo stream's deinterleaved channel 0 must equal the mono
    // decode of the same per-channel data
    def alloc(ch: Int, sb: Int) = if (sb == 3 + 2 * ch) 5 else 0
    def sf(ch: Int, sb: Int) = if (sb == 3 + 2 * ch) 10 + 20 * ch else 0
    def raw(g: Int, ch: Int, sb: Int) =
      if (sb == 3 + 2 * ch) (g * 7 + 1 + 5 * ch) % ((1 << 6) - 1) else 0
    val st = MpegAudio.decode(MpegAudio.encodeL1Stereo(alloc, sf, raw))
    assert(st.layer == 1 && st.channels == 2 && st.pcm.length == 768)
    for (ch <- 0 to 1) {
      val a1 = Array.fill(32)(0); a1(3 + 2 * ch) = 5
      val s1 = Array.fill(32)(0); s1(3 + 2 * ch) = 10 + 20 * ch
      val r1 = Array.tabulate(12, 32)((g, sb) => raw(g, ch, sb))
      val mono = MpegAudio.decode(MpegAudio.encodeL1Frame(MpegAudio.L1Frame(a1, s1, r1)))
      for (t <- 0 until 384)
        assert(st.pcm(2 * t + ch) == mono.pcm(t), s"ch=$ch t=$t")
    }
    // Layer II stereo round-trips too (scfsi + grouping per channel)
    val st2 = MpegAudio.decode(MpegAudio.encodeL2Stereo(
      (ch, sb) => if (sb == ch) 2 else 0, // grouped 5-level class
      (ch, sb) => if (sb == ch) ch else 0,
      (ch, sb, i) => 7 * (i + 1) + ch,
      (g, ch, sb) => if (sb == ch) (g + 2 * ch) % 5 else 0))
    assert(st2.layer == 2 && st2.channels == 2 && st2.pcm.length == 2304)
  }

  test("malformed: every corruption fails loudly") {
    val good = MpegAudio.encodeL1Frame(l1Frame(0L, 0))
    // lost sync
    val badSync = good.clone(); badSync(0) = 0x12
    intercept[IllegalArgumentException](MpegAudio.decode(badSync))
    // truncated mid-frame
    intercept[IllegalArgumentException](
      MpegAudio.decode(java.util.Arrays.copyOf(good, good.length - 4)))
    // empty stream
    intercept[IllegalArgumentException](MpegAudio.decode(Array.emptyByteArray))
    // layer III bits
    val l3 = good.clone()
    // header bits: sync(11) ver(2) layer(2): layer bits sit at bits 13-14
    // byte1 = [sync3][ver2][layer2][prot1]: set layer bits to 01 (III)
    l3(1) = ((l3(1) & ~0x06) | 0x02).toByte
    intercept[IllegalArgumentException](MpegAudio.decode(l3))
    // stereo mode
    val st = good.clone()
    st(3) = (st(3) & ~0xc0).toByte // mode 00 = stereo
    intercept[IllegalArgumentException](MpegAudio.decode(st))
    // mixed layers in one stream
    val l2 = {
      val alloc = Array.fill(MpegAudio.L2SbLimit)(0); alloc(0) = 3
      val scfsi = Array.fill(MpegAudio.L2SbLimit)(2)
      val sf = Array.fill(MpegAudio.L2SbLimit, 3)(0)
      val raw = Array.fill(36, MpegAudio.L2SbLimit)(0)
      MpegAudio.encodeL2Frame(MpegAudio.L2Frame(alloc, scfsi, sf, raw))
    }
    intercept[IllegalArgumentException](MpegAudio.decode(good ++ l2))
  }
}
