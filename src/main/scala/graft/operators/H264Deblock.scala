package graft.operators

/** H.264 in-loop deblocking filter (ISO/IEC 14496-10 §8.7) for the
  * frame-macroblock 4:2:0 profile coded by [[H264Codec]] — the filter
  * every real H.264 stream runs and the one piece of the decode loop
  * that was previously pinned off (`disable_deblocking_filter_idc = 1`).
  *
  * STRUCTURE is spec-exact:
  *
  *  - macroblocks in raster order; per MB all VERTICAL edges left to
  *    right, then all HORIZONTAL edges top to bottom, filtering in place
  *    so later edges read already-filtered samples, while within one
  *    edge line every output is computed from that line's input values;
  *  - luma edges every 4 samples (the MB boundary edge only when a
  *    neighbour exists — no frame-border filtering), chroma edges every
  *    8 luma samples (chroma offsets 0 and 4), chroma boundary strength
  *    taken from the co-located luma cells;
  *  - boundary strength (§8.7.2.1, frame MBs): 4 when either side lies
  *    in an intra MB and the edge is an MB boundary, 3 for intra on an
  *    internal edge, 2 when either 4x4 luma block carries non-zero
  *    transform coefficient levels, 1 on reference or
  *    ≥4-quarter-pel motion-vector difference, else 0 (no filtering);
  *  - the §8.7.2.3/8.7.2.4 sample filters: the bS<4 clipped delta
  *    `Clip3(±tC, ((q0−p0)·4 + (p1−q1) + 4) >> 3)` with the ap/aq
  *    increments and the luma-only p1/q1 refinement clipped to ±tC0,
  *    chroma `tC = tC0 + 1`; the bS=4 strong/weak split under
  *    `|p0−q0| < (α>>2)+2` with the 3-tap fallback, chroma always the
  *    3-tap form;
  *  - QP handling: the edge uses the average `(QPp + QPq + 1) >> 1`,
  *    I_PCM macroblocks count as QP 0 (which zeroes α and so exempts
  *    PCM samples from filtering — the spec's PCM-exactness guarantee),
  *    chroma maps through [[H264Codec.chromaQp]], and the slice header
  *    offsets `slice_{alpha_c0,beta}_offset_div2 << 1` shift indexA/B.
  *
  * PINNED CONSTANTS, stated honestly (the [[MpegAudio]] discipline):
  * `alphaTab`/`betaTab` carry Table 8-16's published thresholds
  * (zero below index 16 — small-QP content is never filtered — the
  * ~0.8·2^(i/6) alpha growth, the 255 cap); tC0 is pinned to the
  * documented deterministic map `tC0(bS, i) = (bS·(α(i)+8)) >> 4`
  * (zero exactly where α is zero, monotone in bS and i) rather than
  * Table 8-17's literal rows — a tables-only swap away from interop,
  * and every filtered sample stays an exact integer function of the
  * bitstream, replayed closed-form by the `q_h264_deblock` oracle.
  *
  * Reference behavior studied from reddit-ETL-Pipeline (none — this is
  * an extension-ladder rung; the reference pipeline has no media path).
  */
private[operators] object H264Deblock {
  import H264Codec.MotionGrid

  /** Table 8-16 α(indexA): filtering threshold on |p0−q0|. */
  private[operators] val alphaTab: Array[Int] = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20, 22, 25, 28,
    32, 36, 40, 45, 50, 56, 63, 71, 80, 90, 101, 113, 127, 144, 162, 182,
    203, 226, 255, 255)

  /** Table 8-16 β(indexB): side-flatness threshold on |p1−p0|, |q1−q0|. */
  private[operators] val betaTab: Array[Int] = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8,
    9, 9, 10, 10, 11, 11, 12, 12, 13, 13, 14, 14, 15, 15, 16, 16,
    17, 17, 18, 18)

  /** Pinned tC0 map (stands in for Table 8-17; see object doc). */
  private[operators] def tc0Of(bS: Int, idx: Int): Int =
    if (alphaTab(idx) == 0) 0 else (bS * (alphaTab(idx) + 8)) >> 4

  /** Per-slice filter inputs gathered while (de)coding: intra/PCM flags
    * and luma QP per MB, plus a non-zero-luma-coefficient flag per 4x4
    * cell. Motion (mv/ref per cell) rides the existing [[MotionGrid]].
    */
  private[operators] final class DeblockMeta(val mbW: Int, val mbH: Int) {
    val intraMb = new Array[Boolean](mbW * mbH)
    val pcmMb = new Array[Boolean](mbW * mbH)
    val qpMb = new Array[Int](mbW * mbH)
    val nz = new Array[Boolean](mbW * 4 * mbH * 4)
    def markNz(gx: Int, gy: Int): Unit = nz(gy * (mbW * 4) + gx) = true
  }

  private def clip3(lo: Int, hi: Int, v: Int): Int =
    if (v < lo) lo else if (v > hi) hi else v
  private def clip255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** §8.7.2.1 boundary strength for the edge between luma cells
    * (gxP,gyP) | (gxQ,gyQ). `mg` may be null for all-intra slices;
    * `mg1` is the list-1 grid of a B slice (null elsewhere). Picture
    * identity in this profile: a list-0 cell's stored refIdx IS the
    * decode-order picture index (0 = newest reference, 1 = the one
    * before), and every list-1 cell references picture 1 — so the
    * different-pictures / different-mv-count / per-picture ≥4-qpel
    * rules all reduce to comparisons over (pic -> mv) maps.
    */
  private[operators] def strength(meta: DeblockMeta, mg: MotionGrid,
                                  mg1: MotionGrid,
                                  gxP: Int, gyP: Int, gxQ: Int, gyQ: Int,
                                  mbBoundary: Boolean): Int = {
    val mbP = (gyP / 4) * meta.mbW + gxP / 4
    val mbQ = (gyQ / 4) * meta.mbW + gxQ / 4
    if (meta.intraMb(mbP) || meta.intraMb(mbQ)) { if (mbBoundary) 4 else 3 }
    else {
      val gw = meta.mbW * 4
      val iP = gyP * gw + gxP
      val iQ = gyQ * gw + gxQ
      if (meta.nz(iP) || meta.nz(iQ)) 2
      else {
        // (picture -> mv) map of a cell: list 0 contributes picture
        // mg.ref (0 or 1), list 1 contributes picture 1
        def pics(i: Int): Map[Int, (Int, Int)] = {
          var m = Map.empty[Int, (Int, Int)]
          if (mg.ref(i) >= 0) m += (mg.ref(i) -> ((mg.mvx(i), mg.mvy(i))))
          if (mg1 != null && mg1.ref(i) >= 0) m += (1 -> ((mg1.mvx(i), mg1.mvy(i))))
          m
        }
        val p = pics(iP)
        val q = pics(iQ)
        def far(a: (Int, Int), b: (Int, Int)): Boolean =
          math.abs(a._1 - b._1) >= 4 || math.abs(a._2 - b._2) >= 4
        if (p.keySet != q.keySet) 1
        else if (p.exists { case (pic, mv) => far(mv, q(pic)) }) 1
        else 0
      }
    }
  }

  /** One luma line across an edge: q0 at `i0`, sample step `s` (1 for a
    * vertical edge, plane width for a horizontal one). All outputs are
    * computed from the values loaded here — the spec's simultaneous
    * per-line semantics.
    */
  private def lumaLine(pl: Array[Byte], i0: Int, s: Int, bS: Int,
                       alpha: Int, beta: Int, tc0v: Int): Unit = {
    val p0 = pl(i0 - s) & 0xff
    val q0 = pl(i0) & 0xff
    val p1 = pl(i0 - 2 * s) & 0xff
    val q1 = pl(i0 + s) & 0xff
    val p2 = pl(i0 - 3 * s) & 0xff
    val q2 = pl(i0 + 2 * s) & 0xff
    if (math.abs(p0 - q0) < alpha && math.abs(p1 - p0) < beta &&
      math.abs(q1 - q0) < beta) {
      val ap = math.abs(p2 - p0)
      val aq = math.abs(q2 - q0)
      if (bS == 4) {
        val strongCut = (alpha >> 2) + 2
        if (ap < beta && math.abs(p0 - q0) < strongCut) {
          val p3 = pl(i0 - 4 * s) & 0xff
          pl(i0 - s) = ((p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3).toByte
          pl(i0 - 2 * s) = ((p2 + p1 + p0 + q0 + 2) >> 2).toByte
          pl(i0 - 3 * s) = ((2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3).toByte
        } else
          pl(i0 - s) = ((2 * p1 + p0 + q1 + 2) >> 2).toByte
        if (aq < beta && math.abs(p0 - q0) < strongCut) {
          val q3 = pl(i0 + 3 * s) & 0xff
          pl(i0) = ((q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3).toByte
          pl(i0 + s) = ((q2 + q1 + q0 + p0 + 2) >> 2).toByte
          pl(i0 + 2 * s) = ((2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3).toByte
        } else
          pl(i0) = ((2 * q1 + q0 + p1 + 2) >> 2).toByte
      } else {
        val tc = tc0v + (if (ap < beta) 1 else 0) + (if (aq < beta) 1 else 0)
        val delta = clip3(-tc, tc, (((q0 - p0) << 2) + (p1 - q1) + 4) >> 3)
        pl(i0 - s) = clip255(p0 + delta).toByte
        pl(i0) = clip255(q0 - delta).toByte
        if (ap < beta)
          pl(i0 - 2 * s) =
            (p1 + clip3(-tc0v, tc0v, (p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1)).toByte
        if (aq < beta)
          pl(i0 + s) =
            (q1 + clip3(-tc0v, tc0v, (q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1)).toByte
      }
    }
  }

  /** One chroma line: only p0/q0 move; bS=4 is always the 3-tap form and
    * bS<4 uses `tC = tC0 + 1` with no side refinement.
    */
  private def chromaLine(pl: Array[Byte], i0: Int, s: Int, bS: Int,
                         alpha: Int, beta: Int, tc0v: Int): Unit = {
    val p0 = pl(i0 - s) & 0xff
    val q0 = pl(i0) & 0xff
    val p1 = pl(i0 - 2 * s) & 0xff
    val q1 = pl(i0 + s) & 0xff
    if (math.abs(p0 - q0) < alpha && math.abs(p1 - p0) < beta &&
      math.abs(q1 - q0) < beta) {
      if (bS == 4) {
        pl(i0 - s) = ((2 * p1 + p0 + q1 + 2) >> 2).toByte
        pl(i0) = ((2 * q1 + q0 + p1 + 2) >> 2).toByte
      } else {
        val tc = tc0v + 1
        val delta = clip3(-tc, tc, (((q0 - p0) << 2) + (p1 - q1) + 4) >> 3)
        pl(i0 - s) = clip255(p0 + delta).toByte
        pl(i0) = clip255(q0 - delta).toByte
      }
    }
  }

  /** Filter a reconstructed frame in place. `offA`/`offB` are the
    * already-doubled slice offsets (FilterOffsetA/B). Shared verbatim by
    * the encoder's reconstruction loop and the decoder, so reference
    * frames stay bit-identical on both sides.
    */
  private[operators] def filterFrame(y: Array[Byte], u: Array[Byte], v: Array[Byte],
                                     w: Int, h: Int, meta: DeblockMeta,
                                     mg: MotionGrid, chromaQpOff: Int,
                                     offA: Int, offB: Int,
                                     mg1: MotionGrid = null): Unit = {
    val mbW = w / 16
    val mbH = h / 16
    val cw = w / 2
    def qpL(mb: Int): Int = if (meta.pcmMb(mb)) 0 else meta.qpMb(mb)
    def qpC(mb: Int): Int = H264Codec.chromaQp(clip3(0, 51, qpL(mb) + chromaQpOff))
    var mbr = 0
    while (mbr < mbH) {
      var mbc = 0
      while (mbc < mbW) {
        val mb = mbr * mbW + mbc
        // vertical then horizontal; dir 0 = vertical (step 1 along a row)
        var dir = 0
        while (dir < 2) {
          val vertical = dir == 0
          // ---- luma: edges every 4 samples, boundary edge only with a neighbour
          var e = if ((if (vertical) mbc else mbr) > 0) 0 else 1
          while (e <= 3) {
            var seg = 0
            while (seg < 4) {
              val (gxP, gyP, gxQ, gyQ) =
                if (vertical) (mbc * 4 + e - 1, mbr * 4 + seg, mbc * 4 + e, mbr * 4 + seg)
                else (mbc * 4 + seg, mbr * 4 + e - 1, mbc * 4 + seg, mbr * 4 + e)
              val bS = strength(meta, mg, mg1, gxP, gyP, gxQ, gyQ, e == 0)
              if (bS > 0) {
                val mbP = (gyP / 4) * mbW + gxP / 4
                val qpAv = (qpL(mbP) + qpL(mb) + 1) >> 1
                val idxA = clip3(0, 51, qpAv + offA)
                val alpha = alphaTab(idxA)
                val beta = betaTab(clip3(0, 51, qpAv + offB))
                val t0 = tc0Of(bS, idxA)
                var k = 0
                while (k < 4) {
                  val i0 =
                    if (vertical) (mbr * 16 + seg * 4 + k) * w + mbc * 16 + e * 4
                    else (mbr * 16 + e * 4) * w + mbc * 16 + seg * 4 + k
                  lumaLine(y, i0, if (vertical) 1 else w, bS, alpha, beta, t0)
                  k += 1
                }
              }
              seg += 1
            }
            e += 1
          }
          // ---- chroma: edges at chroma offsets 0 and 4 (luma 0 and 8),
          // strength from the co-located luma cells, per chroma line
          var ce = if ((if (vertical) mbc else mbr) > 0) 0 else 1
          while (ce <= 1) {
            var k = 0
            while (k < 8) {
              val (gxP, gyP, gxQ, gyQ) =
                if (vertical)
                  (mbc * 4 + ce * 2 - 1, mbr * 4 + k / 2, mbc * 4 + ce * 2, mbr * 4 + k / 2)
                else
                  (mbc * 4 + k / 2, mbr * 4 + ce * 2 - 1, mbc * 4 + k / 2, mbr * 4 + ce * 2)
              val bS = strength(meta, mg, mg1, gxP, gyP, gxQ, gyQ, ce == 0)
              if (bS > 0) {
                val mbP = (gyP / 4) * mbW + gxP / 4
                val qpAv = (qpC(mbP) + qpC(mb) + 1) >> 1
                val idxA = clip3(0, 51, qpAv + offA)
                val alpha = alphaTab(idxA)
                val beta = betaTab(clip3(0, 51, qpAv + offB))
                val t0 = tc0Of(bS, idxA)
                val i0 =
                  if (vertical) (mbr * 8 + k) * cw + mbc * 8 + ce * 4
                  else (mbr * 8 + ce * 4) * cw + mbc * 8 + k
                chromaLine(u, i0, if (vertical) 1 else cw, bS, alpha, beta, t0)
                chromaLine(v, i0, if (vertical) 1 else cw, bS, alpha, beta, t0)
              }
              k += 1
            }
            ce += 1
          }
          dir += 1
        }
        mbc += 1
      }
      mbr += 1
    }
  }
}
