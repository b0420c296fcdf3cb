package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** VP8 segmentation (RFC 6386 §9.3) + mode/ref loop-filter deltas
  * (§9.4): the per-MB segment map drives per-segment quantizers and
  * per-segment loop-filter levels, and the ref/mode deltas adjust the
  * level before the final clamp. Replayed independently here: the
  * quantizer rung must land pixel-exact on the steered targets, and the
  * per-segment-level filters must match the same closed-form edge math
  * the base loop-filter specs pin — evaluated with the OWNING MB's
  * limits, which now differ across stripes.
  */
class Vp8SegmentSpec extends AnyFunSuite {

  private def cS(v: Int): Int = math.max(-128, math.min(127, v))

  private def lfLims(level: Int, sh: Int): Int = {
    var il = level
    if (sh > 0) {
      il >>= (if (sh > 4) 2 else 1)
      if (il > 9 - sh) il = 9 - sh
    }
    if (il < 1) il = 1
    (level + 2) * 2 + il
  }

  private def simplePair(pv: Int, qv: Int, mbLim: Int): (Int, Int) = {
    val sp = pv - 128; val sq = qv - 128; val dd = sp - sq
    if (math.abs(dd) * 2 + math.abs(dd) / 2 <= mbLim) {
      val a = cS(cS(dd) - 3 * dd)
      (cS(sp + (cS(a + 3) >> 3)) + 128, cS(sq - (cS(a + 4) >> 3)) + 128)
    } else (pv, qv)
  }

  private def normalSix(pv: Int, qv: Int, mbLim: Int): (Seq[Int], Seq[Int]) = {
    val sp = pv - 128; val sq = qv - 128; val dd = sp - sq
    if (math.abs(dd) * 2 + math.abs(dd) / 2 <= mbLim) {
      val wv = cS(cS(dd) - 3 * dd)
      val a27 = cS((27 * wv + 63) >> 7)
      val a18 = cS((18 * wv + 63) >> 7)
      val a9 = cS((9 * wv + 63) >> 7)
      (Seq(cS(sp + a9) + 128, cS(sp + a18) + 128, cS(sp + a27) + 128),
        Seq(cS(sq - a27) + 128, cS(sq - a18) + 128, cS(sq - a9) + 128))
    } else (Seq(pv, pv, pv), Seq(qv, qv, qv))
  }

  /** Independent per-MB effective level: segment feature (abs/delta,
    * clamped 0..63) plus the enabled §9.4 deltas, clamped again.
    */
  private def eLvl(absMode: Boolean, segLvl: Int, frameLvl: Int, deltas: Int): Int = {
    val base = if (absMode) segLvl else frameLvl + segLvl
    math.max(0, math.min(63, math.max(0, math.min(63, base)) + deltas))
  }

  /** Expected value at stripe-offset (j, o) of an `n`-stripe frame with
    * PER-STRIPE filter levels: each MB edge is filtered with the OWNING
    * (processing) MB's limits — stripe j owns the (j−1, j) edge.
    */
  private def expStripe(tOf: Int => Int, j: Int, o: Int, smb: Int, n: Int,
                        lvlOf: Int => Int, shp: Int, luma: Boolean,
                        simple: Boolean): Int = {
    val tv = tOf(j)
    if (simple) {
      if (!luma) tv
      else if (j > 0 && o == 0 && lvlOf(j) > 0)
        simplePair(tOf(j - 1), tv, lfLims(lvlOf(j), shp))._2
      else if (j < n - 1 && o == smb - 1 && lvlOf(j + 1) > 0)
        simplePair(tv, tOf(j + 1), lfLims(lvlOf(j + 1), shp))._1
      else tv
    } else {
      if (j > 0 && o <= 2 && lvlOf(j) > 0)
        normalSix(tOf(j - 1), tv, lfLims(lvlOf(j), shp))._2(o)
      else if (j < n - 1 && smb - 1 - o <= 2 && lvlOf(j + 1) > 0)
        normalSix(tv, tOf(j + 1), lfLims(lvlOf(j + 1), shp))._1(2 - (smb - 1 - o))
      else tv
    }
  }

  test("per-segment quantizers: steered reconstruction is pixel-exact on the map") {
    for (d <- 0L until 24L; nc <- 0L until 2L) {
      val (w, webp) = Multimodal.vp8SegmentFrame(d, nc)
      val fr = Vp8Codec.decodeWebp(webp)
      assert(fr.width == w && fr.height == 16)
      def yT(m: Int) = ((31 * d + 13 * m) % 256).toInt
      def uT(m: Int) = ((91 * d + 7 * m) % 256).toInt
      def vT(m: Int) = ((53 * d + 11 * m) % 256).toInt
      for (y <- 0 until 16; x <- 0 until w)
        assert((fr.y(y * w + x) & 0xff) == yT(x / 16), s"y ($x,$y) d=$d nc=$nc")
      for (y <- 0 until 8; x <- 0 until w / 2) {
        assert((fr.u(y * (w / 2) + x) & 0xff) == uT(x / 8), s"u ($x,$y) d=$d")
        assert((fr.v(y * (w / 2) + x) & 0xff) == vT(x / 8), s"v ($x,$y) d=$d")
      }
    }
  }

  test("per-segment loop-filter levels + intra ref delta on key frames, both axes") {
    for (d <- 0L until 32L; nc <- 0L until 2L) {
      val (w, h, webp) = Multimodal.vp8SegLfFrame(d, nc)
      val fr = Vp8Codec.decodeWebp(webp)
      val v = (d % 4).toInt
      val colStripe = v % 2 == 0
      val simple = v < 2
      val n = (2 + nc % 2).toInt
      def tOf(pl: Int, j: Int): Int =
        if (simple) pl match {
          case 0 => ((31 * d + 29 * j) % 256).toInt
          case 1 => ((91 * d + 17 * j) % 256).toInt
          case _ => ((53 * d + 23 * j) % 256).toInt
        }
        else pl match {
          case 0 => (30 + (31 * d) % 170 + ((j + d) % 2) * (1 + d % 24)).toInt
          case 1 => (25 + (91 * d) % 180 + ((j + d) % 2) * (1 + (d + 7) % 24)).toInt
          case _ => (20 + (53 * d) % 190 + ((j + d) % 2) * (1 + (d + 13) % 24)).toInt
        }
      val absMode = (d / 4) % 2 == 0
      val frameLvl = (10 + (5 * d) % 30).toInt
      val lfLvl =
        if (absMode)
          Array((1 + d % 40).toInt, (1 + (3 * d + 17) % 40).toInt)
        else
          Array(-((d % 10).toInt), ((3 * d + 5) % 15).toInt)
      val rd0 = ((d % 13) - 6).toInt
      val shp = (d % 8).toInt
      def lvlOf(j: Int): Int = eLvl(absMode, lfLvl(j % 2), frameLvl, rd0)
      def expAt(pl: Int, x: Int, y: Int, smb: Int): Int = {
        val s = if (colStripe) x else y
        expStripe(tOf(pl, _), s / smb, s % smb, smb, n, lvlOf, shp,
          luma = pl == 0, simple = simple)
      }
      for (y <- 0 until h; x <- 0 until w)
        assert((fr.y(y * w + x) & 0xff) == expAt(0, x, y, 16),
          s"y ($x,$y) d=$d nc=$nc")
      for (y <- 0 until h / 2; x <- 0 until w / 2) {
        assert((fr.u(y * (w / 2) + x) & 0xff) == expAt(1, x, y, 8), s"u ($x,$y) d=$d")
        assert((fr.v(y * (w / 2) + x) & 0xff) == expAt(2, x, y, 8), s"v ($x,$y) d=$d")
      }
    }
  }

  test("inter segmentation: map in the inter header, quantizer + LF + ref/mode deltas") {
    for (d <- 0L until 24L; nc <- 0L until 2L) {
      val (w, frames) = Multimodal.vp8SegInterFrames(d, nc)
      val dec = Vp8Codec.decodeIvf(Vp8Codec.encodeIvf(w, 16, frames))
      assert(dec.length == 2)
      val n = w / 16
      val simple = d % 2 == 0
      def kt(pl: Int): Int = pl match {
        case 0 => ((37 * d) % 256).toInt
        case 1 => ((17 * d + 5) % 256).toInt
        case _ => ((41 * d + 9) % 256).toInt
      }
      def tOf(pl: Int, j: Int): Int =
        if (simple) pl match {
          case 0 => ((31 * d + 29 * j) % 256).toInt
          case 1 => ((91 * d + 17 * j) % 256).toInt
          case _ => ((53 * d + 23 * j) % 256).toInt
        }
        else pl match {
          case 0 => (30 + (31 * d) % 170 + ((j + d) % 2) * (1 + d % 24)).toInt
          case 1 => (25 + (91 * d) % 180 + ((j + d) % 2) * (1 + (d + 7) % 24)).toInt
          case _ => (20 + (53 * d) % 190 + ((j + d) % 2) * (1 + (d + 13) % 24)).toInt
        }
      val absMode = (d / 4) % 2 == 0
      val frameLvl = (10 + (7 * d) % 30).toInt
      val lfLvl =
        if (absMode)
          Array((1 + (3 * d) % 40).toInt, (1 + (5 * d + 9) % 40).toInt)
        else
          Array(-((d % 9).toInt), ((2 * d + 3) % 14).toInt)
      val rd1 = ((d % 11) - 5).toInt
      val md1 = ((d % 9) - 4).toInt
      val shp = ((d / 2) % 8).toInt
      def lvlOf(j: Int): Int = eLvl(absMode, lfLvl(j % 2), frameLvl, rd1 + md1)
      // key frame untouched
      for (y <- 0 until 16; x <- 0 until w)
        assert((dec(0).y(y * w + x) & 0xff) == kt(0), s"kf d=$d")
      def expAt(pl: Int, x: Int, smb: Int): Int =
        expStripe(tOf(pl, _), x / smb, x % smb, smb, n, lvlOf, shp,
          luma = pl == 0, simple = simple)
      for (y <- 0 until 16; x <- 0 until w)
        assert((dec(1).y(y * w + x) & 0xff) == expAt(0, x, 16),
          s"f2 y ($x,$y) d=$d nc=$nc")
      for (y <- 0 until 8; x <- 0 until w / 2) {
        assert((dec(1).u(y * (w / 2) + x) & 0xff) == expAt(1, x, 8), s"f2 u ($x,$y) d=$d")
        assert((dec(1).v(y * (w / 2) + x) & 0xff) == expAt(2, x, 8), s"f2 v ($x,$y) d=$d")
      }
    }
  }

  /** Build a raw key-frame prefix whose bool-coded first partition is
    * exactly `body`'s output — enough to reach the header requires.
    */
  private def rawKeyHeader(body: Vp8Codec.BoolEncoder => Unit): Array[Byte] = {
    val enc = new Vp8Codec.BoolEncoder
    body(enc)
    val part0 = enc.flush()
    val tag = part0.length << 5
    val out = new java.io.ByteArrayOutputStream()
    out.write(tag & 0xff); out.write((tag >> 8) & 0xff); out.write((tag >> 16) & 0xff)
    out.write(0x9d); out.write(0x01); out.write(0x2a)
    out.write(16); out.write(0) // width 16
    out.write(16); out.write(0) // height 16
    out.write(part0, 0, part0.length)
    out.toByteArray
  }

  test("persisted segment map and persisted lf deltas are rejected loudly") {
    val noMap = rawKeyHeader { e =>
      e.putLiteral(0, 1) // color space
      e.putLiteral(0, 1) // clamping
      e.putLiteral(1, 1) // segmentation enabled
      e.putLiteral(0, 1) // update_mb_segmentation_map = 0
      e.putLiteral(0, 1) // update_segment_feature_data = 0
    }
    val ex1 = intercept[IllegalArgumentException](Vp8Codec.decodeFrame(noMap))
    assert(ex1.getMessage.contains("persisted segment map"))
    val noUpd = rawKeyHeader { e =>
      e.putLiteral(0, 1) // color space
      e.putLiteral(0, 1) // clamping
      e.putLiteral(0, 1) // segmentation disabled
      e.putLiteral(0, 1) // filter type
      e.putLiteral(0, 6) // filter level
      e.putLiteral(0, 3) // sharpness
      e.putLiteral(1, 1) // loop_filter_adj_enable
      e.putLiteral(0, 1) // mode_ref_lf_delta_update = 0
    }
    val ex2 = intercept[IllegalArgumentException](Vp8Codec.decodeFrame(noUpd))
    assert(ex2.getMessage.contains("persisted deltas"))
  }
}
