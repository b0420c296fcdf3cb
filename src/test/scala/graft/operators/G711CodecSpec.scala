package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** G.711 μ-law: full-domain companding properties (all 65536 samples and
  * all 256 codes — the domains are small enough to sweep exhaustively,
  * so every property is checked everywhere, not sampled).
  */
class G711CodecSpec extends AnyFunSuite {

  test("round-trip error is amplitude-proportional and bounded everywhere") {
    var maxErr = 0
    var s = -32768
    while (s <= 32767) {
      val d = G711Codec.ulawDecode(G711Codec.ulawEncode(s.toShort)).toInt
      val err = math.abs(d - s)
      if (err > maxErr) maxErr = err
      // segment-local bound: quantization step is 2^(e+3), error ≤ half of
      // it plus the clip loss at the very top of the range
      if (math.abs(s) <= 32635)
        assert(err <= 516, s"sample $s decoded to $d (err $err)")
      s += 1
    }
    assert(maxErr <= 644, s"global max error $maxErr") // clip region: -32768→-32124
  }

  test("decode is odd-symmetric") {
    var s = -32767
    while (s <= 32767) {
      val pos = G711Codec.ulawDecode(G711Codec.ulawEncode(s.toShort)).toInt
      val neg = G711Codec.ulawDecode(G711Codec.ulawEncode((-s).toShort)).toInt
      assert(pos == -neg, s"asymmetry at $s: $pos vs $neg")
      s += 1
    }
  }

  test("every non-zero code is a fixed point of encode∘decode") {
    (0 until 256).foreach { u =>
      val d = G711Codec.ulawDecode(u.toByte)
      if (d != 0) assert((G711Codec.ulawEncode(d) & 0xff) == u,
        s"code $u decoded to $d which re-encoded to ${G711Codec.ulawEncode(d) & 0xff}")
      else assert(u == 0x7f || u == 0xff, s"unexpected zero-decoding code $u")
    }
  }

  test("decode magnitude is monotone in the code within each sign") {
    // codes are complemented: within one sign, a numerically smaller raw
    // byte means larger magnitude; sweep decoded magnitudes sorted
    val mags = (0 until 128).map(u => G711Codec.ulawDecode(u.toByte).toInt)
    assert(mags == mags.sorted.reverse || mags == mags.sorted,
      "positive-code magnitudes are not monotone")
  }

  test("WAV container round-trips companded samples, odd n padded") {
    def sig(i: Int): Short = (((i * 1103) % 65536) - 32768).toShort
    Seq(0, 1, 63, 64).foreach { n =>
      val wav = G711Codec.encodeWavUlaw(8000, n, sig)
      assert(wav.length == 58 + n + (n & 1), s"n=$n container size ${wav.length}")
      val dec = G711Codec.decodeWavUlaw(wav)
      assert(dec.sampleRate == 8000 && dec.channels == 1)
      assert(dec.samples.length == n)
      (0 until n).foreach { i =>
        assert(dec.samples(i) == G711Codec.ulawDecode(G711Codec.ulawEncode(sig(i))))
      }
    }
  }

  test("malformed containers are rejected loudly") {
    val ok = G711Codec.encodeWavUlaw(8000, 16, _ => 100.toShort)
    intercept[IllegalArgumentException] { // PCM format tag routed here
      G711Codec.decodeWavUlaw(WavCodec.encodePcm16(8000, 4, _ => 1.toShort))
    }
    intercept[IllegalArgumentException] { // truncated data chunk
      G711Codec.decodeWavUlaw(ok.take(60))
    }
    intercept[IllegalArgumentException] { // wrong law: A-law blob on μ-law path
      G711Codec.decodeWavUlaw(G711Codec.encodeWavAlaw(8000, 4, _ => 1.toShort))
    }
  }

  test("A-law round-trip error is bounded everywhere; decode is never 0") {
    var maxErr = 0
    var s = -32768
    while (s <= 32767) {
      val d = G711Codec.alawDecode(G711Codec.alawEncode(s.toShort)).toInt
      val err = math.abs(d - s)
      if (err > maxErr) maxErr = err
      assert(d != 0, s"A-law decoded $s to exact 0 (smallest magnitude is 8)")
      s += 1
    }
    // top segment: 13-bit step 64 → 16-bit step 1024, half-step ±512,
    // plus the floor(s/8) operand loss of up to 7
    assert(maxErr <= 519, s"global max A-law error $maxErr")
  }

  test("every A-law code is a fixed point of encode∘decode") {
    (0 until 256).foreach { a =>
      val d = G711Codec.alawDecode(a.toByte)
      assert((G711Codec.alawEncode(d) & 0xff) == a,
        s"code $a decoded to $d which re-encoded to ${G711Codec.alawEncode(d) & 0xff}")
    }
  }

  test("A-law WAV container round-trips companded samples") {
    def sig(i: Int): Short = (((i * 2741) % 65536) - 32768).toShort
    val n = 101
    val wav = G711Codec.encodeWavAlaw(8000, n, sig)
    assert(wav.length == 58 + n + 1)
    val dec = G711Codec.decodeWavAlaw(wav)
    assert(dec.samples.length == n)
    (0 until n).foreach { i =>
      assert(dec.samples(i) == G711Codec.alawDecode(G711Codec.alawEncode(sig(i))))
    }
  }
}
