package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** AAC-LC pulse_data (4.4.2.7), graded against an independent replay
  * written separately from the codec: amplitudes add to the QUANTIZED
  * coefficients before requantization — sign-matched on the coded line
  * (q > 0 gains +amp, q < 0 gains -amp) and negative on zero lines
  * (the else branch) — with additive offset chaining from
  * pulse_start_sfb's first line. The modified values then ride the
  * normal requantization and long-window IMDCT overlap chain.
  */
class AacPulseSpec extends AnyFunSuite {

  private def expected(d: Long): Array[Long] = {
    val nf = (1 + d % 2).toInt
    val pcm = new Array[Long](1024 * nf)
    for (f <- 0 until nf) {
      val band = (2 + (d + f) % 20).toInt
      val posIn = ((7 * d + 3 * f) % 20).toInt
      val pos = band * 32 + posIn
      val cb = (1 + (d + f) % 11).toInt
      val mag =
        if (cb == 11) (16 + d % 40).toInt
        else (1 + (d + f) % AacCodec.cbLav(cb)).toInt
      val v = if ((d + f) % 2 == 1) -mag else mag
      val nPulse = (1 + (d + f) % 3).toInt
      val sf = 20 + (29 * d + 7 * f) % 200 + ((d + 3 * f) % 41 - 20)
      val gain = 1 + (5 * sf) % 13
      // quantized values after the pulse adds
      val amp0 = (1 + (3 * d + f) % 15).toInt
      val q0 = if (v > 0) v + amp0 else v - amp0
      val qs = scala.collection.mutable.ArrayBuffer((pos, q0))
      var k = pos
      for (j <- 1 until nPulse) {
        k += 4 + j
        qs += ((k, -(1 + (3 * d + 5 * j + f) % 15).toInt))
      }
      for ((kp, q) <- qs; if q != 0) {
        val xr = (if (q < 0) -1L else 1L) * math.abs(q).toLong *
          (math.abs(q) + 2) * gain
        for (p <- 0 until 2048) {
          val t = if (p < 1024) f * 1024 + p else (f + 1) * 1024 + p - 1024
          if (t < pcm.length) {
            pcm(t) += xr * (((13 * p + 7 * kp + 5) % 29) - 14) *
              (1 + (3 * p) % 17)
          }
        }
      }
    }
    pcm
  }

  test("pulse adds match the independent replay") {
    for (d <- 0L until 24L) {
      val out = AacCodec.decode(Multimodal.aacPulseStream(d))
      assert(out.nFrames == 1 + d % 2)
      assert(out.pcm.toSeq == expected(d).toSeq, s"d=$d")
    }
  }

  test("pulses are value-visible and loud-rejected on short frames") {
    // same frame with and without the pulses must differ
    val base = AacCodec.AacFrame(globalGain = 40,
      lines = Seq((100, 2, 3)), sfDelta = 0)
    val withPulse = base.copy(pulseStartSfb = 3, pulses = Seq((4, 5)))
    val a = AacCodec.decode(AacCodec.encode(Seq(base))).pcm
    val b = AacCodec.decode(AacCodec.encode(Seq(withPulse))).pcm
    assert(a.toSeq != b.toSeq)
    // encoder refuses pulses on EIGHT_SHORT frames
    assertThrows[IllegalArgumentException](AacCodec.encode(Seq(
      AacCodec.AacFrame(globalGain = 40, lines = Seq((100, 2, 3)),
        sfDelta = 0, shortSeq = true, pulseStartSfb = 3,
        pulses = Seq((4, 5))))))
    // a pulse pointing into a zero (codebook 0) section is rejected
    assertThrows[IllegalArgumentException](AacCodec.decode(AacCodec.encode(Seq(
      base.copy(pulseStartSfb = 7, pulses = Seq((0, 5)))))))
  }
}
