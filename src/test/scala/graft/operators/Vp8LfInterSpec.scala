package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** VP8 in-loop filter on INTER frames: the header's filter_type /
  * loop_filter_level / sharpness now parse (instead of requiring level
  * 0) and the shared RFC 6386 filter runs after inter reconstruction.
  * Graded against the same closed-form edge math the key-frame tests
  * pin, replayed independently here over the inter stripes; the key
  * frame must come through untouched.
  */
class Vp8LfInterSpec extends AnyFunSuite {

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

  test("inter frames run the in-loop filter; key frames stay untouched") {
    for (d <- 0L until 24L; nc <- 0L until 2L) {
      val (w, frames) = Multimodal.vp8LfInterFrames(d, nc)
      val dec = Vp8Codec.decodeIvf(Vp8Codec.encodeIvf(w, 16, frames))
      assert(dec.length == 2)
      val mbW = w / 16
      val simple = d % 2 == 0
      val lvl = (1 + d % 63).toInt
      val shp = ((d / 2) % 8).toInt
      val lim = lfLims(lvl, shp)
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
      // key frame untouched (its own level is 0)
      for (y <- 0 until 16; x <- 0 until w)
        assert((dec(0).y(y * w + x) & 0xff) == kt(0), s"kf d=$d")
      // inter frame: per-column expectation from the closed-form edges
      def expCol(pl: Int, x: Int, mbPx: Int): Int = {
        val j = x / mbPx
        val o = x % mbPx
        val tv = tOf(pl, j)
        if (simple) {
          if (pl != 0) tv // luma only
          else if (j > 0 && o == 0) simplePair(tOf(pl, j - 1), tv, lim)._2
          else if (j < mbW - 1 && o == mbPx - 1) simplePair(tv, tOf(pl, j + 1), lim)._1
          else tv
        } else {
          if (j > 0 && o <= 2) normalSix(tOf(pl, j - 1), tv, lim)._2(o)
          else if (j < mbW - 1 && mbPx - 1 - o <= 2)
            normalSix(tv, tOf(pl, j + 1), lim)._1(2 - (mbPx - 1 - o))
          else tv
        }
      }
      for (y <- 0 until 16; x <- 0 until w)
        assert((dec(1).y(y * w + x) & 0xff) == expCol(0, x, 16),
          s"f2 y ($x,$y) d=$d nc=$nc")
      for (y <- 0 until 8; x <- 0 until w / 2) {
        assert((dec(1).u(y * (w / 2) + x) & 0xff) == expCol(1, x, 8), s"f2 u ($x,$y) d=$d")
        assert((dec(1).v(y * (w / 2) + x) & 0xff) == expCol(2, x, 8), s"f2 v ($x,$y) d=$d")
      }
    }
  }
}
