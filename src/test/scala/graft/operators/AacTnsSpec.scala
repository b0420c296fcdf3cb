package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** AAC-LC TNS (§4.6.9), graded two independent ways: the five fixture
  * shapes against CLOSED-FORM spectral runs derived by hand from the
  * all-pole recursion (then pushed through an independently written
  * requant + IMDCT replay), and a generic random-coefficient filter
  * against a plainly-recursive reference implementation. Plus the
  * syntax surface: the new 4.4.2.1 presence flags and the loud rejects.
  */
class AacTnsSpec extends AnyFunSuite {

  /** Independent full-chain replay for a single long frame whose
    * requantized spectrum is `spec`: PCM(p) = Σ_k spec(k)·cos(p,k)·win(p)
    * (first 1024 samples; zero prior overlap).
    */
  private def imdctPcm(spec: Array[Long]): Array[Long] =
    Array.tabulate(1024) { p =>
      var s = 0L
      var k = 0
      while (k < 1024) {
        if (spec(k) != 0) s += spec(k) * AacCodec.aacCos(p, k) * AacCodec.aacWin(p)
        k += 1
      }
      s
    }

  test("fixture shapes: five closed-form TNS spectral runs, sample-exact") {
    for (d <- 0L until 10L) {
      val r = (d % 5).toInt
      val mag = (1 + d % 4).toInt
      val sf = (20 + (29 * d) % 200).toInt + ((d % 41) - 20).toInt
      val x0 = AacCodec.aacPow43(mag) * AacCodec.aacGain(sf) *
        (if (d % 2 == 1) -1 else 1)
      // hand-derived runs over the region [960, 1024)
      val spec = new Array[Long](1024)
      r match {
        case 0 => for (k <- 970 until 1024) spec(k) = x0
        case 1 => for (k <- 960 until 1024) spec(k) = if ((k - 960) % 2 == 0) x0 else -x0
        case 2 => for (k <- 961 until 1024 by 2) spec(k) = x0
        case 3 => for (k <- 1014 until 1024)
          spec(k) = x0 * (if ((k - 1014) % 2 == 1) -1 else 1) * (1L << (k - 1014))
        case _ => for (k <- 960 to 1000) spec(k) = x0
      }
      val want = imdctPcm(spec)
      val frames = Multimodal.withAacTnsMediaBytes(d)
      val got = AacCodec.decode(frames)
      assert(got.nFrames == 1 && got.pcm.length == 1024)
      assert(got.pcm.toSeq == want.toSeq, s"d=$d shape $r")
    }
  }

  test("generic filter: random coefficients vs a plainly-recursive reference") {
    val rnd = new scala.util.Random(4217)
    for (_ <- 0 until 40) {
      val order = 1 + rnd.nextInt(3)
      val coefs = Seq.fill(order)(rnd.nextInt(3) - 1) // |a| <= 1 keeps Longs exact
      val dir = rnd.nextInt(2)
      val len = 1 // one sfb: growth over 32 lines stays far inside Long
      val base = 992
      val n0 = base + rnd.nextInt(8)
      val mag = 1 + rnd.nextInt(4)
      val v = if (rnd.nextBoolean()) -mag else mag
      val gg = 20 + rnd.nextInt(200)
      val fr = AacCodec.AacFrame(globalGain = gg, lines = Seq((n0, v, 6)),
        sfDelta = 0, tns = Seq((len, dir, coefs)))
      val got = AacCodec.decode(AacCodec.encode(Seq(fr)))
      // reference: memoized recursion straight off the spec text
      val x0 = AacCodec.aacPow43(mag) * AacCodec.aacGain(gg) * (if (v < 0) -1 else 1)
      val start = base; val end = 1024
      val memo = scala.collection.mutable.Map.empty[Int, Long]
      def xAt(n: Int): Long = if (n == n0) x0 else 0L
      def y(n: Int): Long = memo.getOrElseUpdate(n, {
        var acc = xAt(n)
        for (j <- 1 to order) {
          val m = if (dir == 0) n - j else n + j
          if (m >= start && m < end) acc -= coefs(j - 1) * y(m)
        }
        acc
      })
      val spec = new Array[Long](1024)
      for (k <- start until end) spec(k) = y(k)
      assert(got.pcm.toSeq == imdctPcm(spec).toSeq,
        s"order=$order coefs=$coefs dir=$dir n0=$n0")
    }
  }

  test("short-window TNS: per-window regions, closed-form shapes") {
    for (d <- 0L until 20L) {
      val r = (d % 5).toInt
      val w = (d % 4).toInt
      val mag = (1 + d % 4).toInt
      val sf = (20 + (29 * d) % 200).toInt + ((d % 41) - 20).toInt
      val x0 = AacCodec.aacPow43(mag) * AacCodec.aacGain(sf) *
        (if (d % 2 == 1) -1 else 1)
      // expected spectrum: the filter's run inside window w, lines 104..127
      val spec = new Array[Long](1024)
      def at(off: Int, v: Long): Unit = spec(w * 128 + off) = v
      r match {
        case 0 => for (o <- 110 to 127) at(o, x0)
        case 1 => for (o <- 104 to 127) at(o, if ((o - 104) % 2 == 0) x0 else -x0)
        case 2 => for (o <- 105 to 127 by 2) at(o, x0)
        case 3 => for (o <- 122 to 127)
          at(o, x0 * (if ((o - 122) % 2 == 1) -1 else 1) * (1L << (o - 122)))
        case _ => for (o <- 104 to 115) at(o, x0)
      }
      // independent short-filterbank replay (first 1024 samples)
      val want = new Array[Long](1024)
      for (wd <- 0 until 8; k <- 0 until 128; if spec(wd * 128 + k) != 0;
           p <- 0 until 256) {
        val t = 448 + 128 * wd + p
        if (t < 1024)
          want(t) += spec(wd * 128 + k) * AacCodec.aacCosS(p, k) * AacCodec.aacWinS(p)
      }
      val got = AacCodec.decode(Multimodal.aacTnsShortStreamBytes(d))
      assert(got.nFrames == 1 && got.pcm.length == 1024)
      assert(got.pcm.toSeq == want.toSeq, s"d=$d shape $r window $w")
    }
  }

  test("syntax surface: zero flags decode as before; rejects are loud") {
    // a no-TNS frame still round-trips (the three new flags ride along)
    val fr = AacCodec.AacFrame(globalGain = 40, lines = Seq((100, 2, 6)), sfDelta = 3)
    val out = AacCodec.decode(AacCodec.encode(Seq(fr)))
    assert(out.nFrames == 1 && out.pcm.exists(_ != 0))
    // a short-frame TNS order beyond the 3-bit LC bound is rejected
    val shortFr = AacCodec.AacFrame(globalGain = 40, lines = Seq((17, 2, 6)),
      sfDelta = 0, shortSeq = true, tns = Seq((1, 0, Seq.fill(8)(1))))
    assertThrows[IllegalArgumentException](AacCodec.encode(Seq(shortFr)))
    // order beyond the LC limit is rejected at decode time
    val big = AacCodec.AacFrame(globalGain = 40, lines = Seq((970, 2, 6)),
      sfDelta = 0, tns = Seq((2, 0, Seq.fill(13)(1))))
    assertThrows[IllegalArgumentException](AacCodec.decode(AacCodec.encode(Seq(big))))
  }
}
