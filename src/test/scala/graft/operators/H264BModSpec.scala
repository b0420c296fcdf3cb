package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** B-slice reference-list modification (7.3.3.1 on B slices): per-list
  * idc-0 commands permute the two-picture POC defaults independently.
  * Replayed per pixel from the [[Multimodal.h264BPlan]] closed forms:
  * with list 0 swapped the B_L0 stripes read the IDR tiles, with list 1
  * swapped the shifted B_L1 stripes land on the P frame (tile value +
  * the per-MB steered delta of the SOURCE macroblock), single swaps
  * collapse the Bi average onto one picture, and the double swap leaves
  * Bi unchanged (the average is symmetric) while moving both one-sided
  * classes.
  */
class H264BModSpec extends AnyFunSuite {

  test("B list modification: all three variants replay per pixel") {
    for (d <- 0L until 18L) {
      val v = (d % 3).toInt
      val frames = H264Codec.decodeSequence(H264Codec.encodeInter(
        Multimodal.h264BModPlan(d), cabac = d % 4 == 3))
      assert(frames.length == 3, s"d=$d")
      val w = 32; val h = 64
      val mbW = w / 16
      val tCols = mbW / 2
      def tileOf(mb: Int): Int = ((mb / mbW) / 2) * tCols + (mb % mbW) / 2
      def dl(mb: Int): Int =
        (if ((d + 3 * mb) % 2 == 0) 1 else -1) * (1 + ((d + mb) % 6)).toInt
      // IDR (frame 1) per-tile constants; P (frame 2) per-MB values
      def f1v(pl: Int, tile: Int): Int = pl match {
        case 0 => ((37 * d + 23 * tile) % 208 + 24).toInt
        case 1 => ((91 * d + 13 * tile) % 240 + 8).toInt
        case _ => ((53 * d + 17 * tile) % 240 + 8).toInt
      }
      def f2v(pl: Int, mb: Int): Int = pl match {
        case 0 => f1v(0, tileOf(mb)) + 4 * dl(mb)
        case 1 => ((91 * d + 23 * mb) % 240 + 8).toInt
        case _ => ((53 * d + 27 * mb) % 240 + 8).toInt
      }
      def expected(fi: Int, pl: Int, x: Int, y: Int): Int = {
        val span = if (pl == 0) 16 else 8
        val r = y / span; val c = x / span
        val mb = r * mbW + c
        if (fi == 0) f1v(pl, tileOf(mb))
        else if (fi == 1) f2v(pl, mb)
        else {
          val cls = ((c + d + r) % 4).toInt
          // B_L1 stripes shift one tile row (up unless in MB row 0)
          val sy = (if (r > 0) -1 else 1) * span
          val smb = ((y + sy) / span) * mbW + c
          cls match {
            case 0 => if (v != 1) f1v(pl, tileOf(mb)) else f2v(pl, mb)
            case 1 =>
              if (v != 0) f2v(pl, smb) else f1v(pl, tileOf(smb))
            case 2 => v match {
              case 0 => f1v(pl, tileOf(mb))
              case 1 => f2v(pl, mb)
              case _ => (f1v(pl, tileOf(mb)) + f2v(pl, mb) + 1) / 2
            }
            case _ => pl match {
              case 0 => ((43 * d + 19 * mb) % 208 + 24).toInt
              case 1 => ((91 * d + 29 * mb) % 240 + 8).toInt
              case _ => ((53 * d + 31 * mb) % 240 + 8).toInt
            }
          }
        }
      }
      for (fi <- 0 until 3) {
        val fr = frames(fi)
        for (y <- 0 until h; x <- 0 until w)
          assert((fr.y(y * w + x) & 0xff) == expected(fi, 0, x, y),
            s"d=$d v=$v f=$fi y($x,$y)")
        for (y <- 0 until h / 2; x <- 0 until w / 2) {
          assert((fr.u(y * (w / 2) + x) & 0xff) == expected(fi, 1, x, y),
            s"d=$d v=$v f=$fi u($x,$y)")
          assert((fr.v(y * (w / 2) + x) & 0xff) == expected(fi, 2, x, y),
            s"d=$d v=$v f=$fi v($x,$y)")
        }
      }
    }
  }
}
