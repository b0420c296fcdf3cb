package graft.operators

/** H.264/AVC (ITU-T H.264 / ISO 14496-10) codec in pure JDK — the entry
  * rung of the last named lossy-video class: the NAL/RBSP TRANSPORT and
  * PARAMETER-SET machinery is implemented for real (Annex B start codes,
  * emulation-prevention three-byte insertion/removal, exp-Golomb ue/se,
  * SPS/PPS parsing with the full field walk, IDR slice headers with the
  * dec_ref_pic_marking syntax), and the macroblock layer decodes I_PCM
  * (mb_type 25: pcm alignment + raw 4:2:0 samples) — the one macroblock
  * mode whose reconstruction is exact by construction. CAVLC residual
  * decoding and intra prediction are the next rung and are REJECTED
  * loudly (any non-I_PCM mb_type), never misdecoded.
  *
  * Everything here follows the spec's structure; there are no pinned
  * stand-ins — exp-Golomb, the EP-byte rule (00 00 0x with x ≤ 3), and
  * the I_PCM sample walk are bit-exact per the standard, so this codec
  * would interoperate on its profile subset.
  *
  * Cited reference behavior: the reference repo ingests media only as
  * opaque URLs (SURVEY §2.1); the codec ladder is parity-plus for the
  * 100 TB multimodal pipeline.
  */
object H264Codec {

  // ---- bit I/O ---------------------------------------------------------------

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var nAcc = 0
    def put(v: Long, bits: Int): Unit = {
      require(bits >= 0 && bits <= 32 && v >= 0 && (bits == 32 || v < (1L << bits)))
      var i = bits - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1L).toInt
        nAcc += 1
        if (nAcc == 8) { out.write(acc); acc = 0; nAcc = 0 }
        i -= 1
      }
    }
    def ue(v: Int): Unit = {
      require(v >= 0)
      val code = v + 1
      val n = 32 - Integer.numberOfLeadingZeros(code)
      put(0, n - 1)
      put(code.toLong, n)
    }
    def se(v: Int): Unit = ue(if (v <= 0) -2 * v else 2 * v - 1)
    def alignZero(): Unit = if (nAcc > 0) put(0, 8 - nAcc)
    /** rbsp_trailing_bits: stop bit + zero alignment. */
    def trailing(): Unit = { put(1, 1); alignZero() }
    def putByte(b: Int): Unit = { require(nAcc == 0); out.write(b & 0xff) }
    def bytes(): Array[Byte] = { require(nAcc == 0, "h264: unterminated RBSP"); out.toByteArray }
  }

  private final class BitReader(buf: Array[Byte]) {
    private var pos = 0
    private var bit = 0
    def get(bits: Int): Int = {
      var v = 0
      var i = 0
      while (i < bits) {
        require(pos < buf.length, "h264: RBSP truncated")
        v = (v << 1) | ((buf(pos) >> (7 - bit)) & 1)
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        i += 1
      }
      v
    }
    def ue(): Int = {
      var zeros = 0
      while (get(1) == 0) {
        zeros += 1
        require(zeros <= 31, "h264: exp-Golomb code too long")
      }
      (1 << zeros) - 1 + (if (zeros == 0) 0 else get(zeros))
    }
    def se(): Int = {
      val k = ue()
      if (k % 2 == 0) -(k / 2) else (k + 1) / 2
    }
    def alignByte(): Unit = {
      while (bit != 0) require(get(1) == 0, "h264: nonzero pcm alignment bit")
    }
    def readByte(): Int = { require(bit == 0); get(8) }
    /** rbsp_trailing_bits + cabac_zero_word-free tail. */
    def trailing(): Unit = {
      require(get(1) == 1, "h264: missing rbsp_stop_one_bit")
      while (bit != 0) require(get(1) == 0, "h264: nonzero rbsp alignment bit")
      while (pos < buf.length) require(get(8) == 0, "h264: trailing garbage after RBSP stop")
    }
  }

  // ---- NAL transport (Annex B) -------------------------------------------------

  /** RBSP → EBSP: insert the emulation-prevention byte 0x03 whenever two
    * zero bytes are followed by 0x00..0x03 (spec 7.4.1.1).
    */
  private[operators] def escapeRbsp(rbsp: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(rbsp.length + 8)
    var zeros = 0
    var i = 0
    while (i < rbsp.length) {
      val b = rbsp(i) & 0xff
      if (zeros == 2 && b <= 3) { out.write(3); zeros = 0 }
      out.write(b)
      zeros = if (b == 0) zeros + 1 else 0
      i += 1
    }
    out.toByteArray
  }

  /** EBSP → RBSP: drop 0x03 after two zero bytes. */
  private[operators] def unescapeRbsp(ebsp: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(ebsp.length)
    var zeros = 0
    var i = 0
    while (i < ebsp.length) {
      val b = ebsp(i) & 0xff
      if (zeros == 2 && b == 3) {
        require(i + 1 >= ebsp.length || (ebsp(i + 1) & 0xff) <= 3,
          "h264: emulation-prevention byte not followed by 00..03")
        zeros = 0
      } else {
        out.write(b)
        zeros = if (b == 0) zeros + 1 else 0
      }
      i += 1
    }
    out.toByteArray
  }

  private def nal(refIdc: Int, nalType: Int, rbsp: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(rbsp.length + 8)
    out.write(0); out.write(0); out.write(0); out.write(1) // start code
    out.write((refIdc << 5) | nalType) // forbidden_zero_bit = 0
    val esc = escapeRbsp(rbsp)
    out.write(esc, 0, esc.length)
    out.toByteArray
  }

  /** Split an Annex B stream into (nal_ref_idc, nal_unit_type, RBSP). */
  private[operators] def splitNals(b: Array[Byte]): Seq[(Int, Int, Array[Byte])] = {
    val nals = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Array[Byte])]
    var i = 0
    def isStart3(j: Int) = j + 3 <= b.length &&
      b(j) == 0 && b(j + 1) == 0 && b(j + 2) == 1
    // leading start code (3- or 4-byte form)
    while (i < b.length && !isStart3(i)) {
      require(b(i) == 0, "h264: garbage before the first start code")
      i += 1
    }
    require(i < b.length, "h264: no NAL units")
    while (i < b.length) {
      i += 3 // skip 00 00 01
      val hdr = b(i) & 0xff
      require((hdr & 0x80) == 0, "h264: forbidden_zero_bit set")
      val refIdc = (hdr >> 5) & 3
      val nalType = hdr & 0x1f
      i += 1
      val start = i
      while (i < b.length && !isStart3(i) && !(i + 3 < b.length && b(i) == 0 && isStart3(i + 1)))
        i += 1
      var end = i
      if (i < b.length && !isStart3(i)) { end = i; i += 1 } // the 4-byte form's extra 0
      nals += ((refIdc, nalType, unescapeRbsp(java.util.Arrays.copyOfRange(b, start, end))))
    }
    nals.toSeq
  }

  // ---- parameter sets ------------------------------------------------------------

  final case class Sps(profile: Int, level: Int, widthMbs: Int, heightMbs: Int,
                       log2MaxFrameNum: Int, log2MaxPoc: Int)
  final case class Pps(entropyCabac: Boolean, picInitQp: Int)

  private def writeSps(w: Int, h: Int): Array[Byte] = {
    val bw = new BitWriter
    bw.put(66, 8) // profile_idc: Baseline
    bw.put(0, 8) // constraint flags + reserved
    bw.put(30, 8) // level_idc 3.0
    bw.ue(0) // sps id
    bw.ue(4) // log2_max_frame_num_minus4 → 8
    bw.ue(0) // pic_order_cnt_type 0
    bw.ue(4) // log2_max_pic_order_cnt_lsb_minus4 → 8
    bw.ue(1) // max_num_ref_frames
    bw.put(0, 1) // gaps_in_frame_num_value_allowed
    bw.ue(w / 16 - 1) // pic_width_in_mbs_minus1
    bw.ue(h / 16 - 1) // pic_height_in_map_units_minus1
    bw.put(1, 1) // frame_mbs_only_flag
    bw.put(1, 1) // direct_8x8_inference
    bw.put(0, 1) // frame_cropping_flag
    bw.put(0, 1) // vui_parameters_present
    bw.trailing()
    bw.bytes()
  }

  private def writePps(): Array[Byte] = {
    val bw = new BitWriter
    bw.ue(0) // pps id
    bw.ue(0) // sps id
    bw.put(0, 1) // entropy_coding_mode: CAVLC
    bw.put(0, 1) // bottom_field_pic_order_in_frame_present
    bw.ue(0) // num_slice_groups_minus1
    bw.ue(0) // num_ref_idx_l0_default_active_minus1
    bw.ue(0) // num_ref_idx_l1_default_active_minus1
    bw.put(0, 1) // weighted_pred_flag
    bw.put(0, 2) // weighted_bipred_idc
    bw.se(0) // pic_init_qp_minus26
    bw.se(0) // pic_init_qs_minus26
    bw.se(0) // chroma_qp_index_offset
    bw.put(1, 1) // deblocking_filter_control_present
    bw.put(0, 1) // constrained_intra_pred
    bw.put(0, 1) // redundant_pic_cnt_present
    bw.trailing()
    bw.bytes()
  }

  private[operators] def parseSps(rbsp: Array[Byte]): Sps = {
    val br = new BitReader(rbsp)
    val profile = br.get(8)
    br.get(8) // constraints
    val level = br.get(8)
    require(br.ue() == 0, "h264: multiple SPS ids outside this profile")
    val lmfn = br.ue() + 4
    val poct = br.ue()
    require(poct == 0, "h264: pic_order_cnt_type != 0 outside this profile")
    val lmpoc = br.ue() + 4
    br.ue() // max_num_ref_frames
    br.get(1) // gaps allowed
    val wMbs = br.ue() + 1
    val hMbs = br.ue() + 1
    require(br.get(1) == 1, "h264: interlaced (frame_mbs_only=0) outside this profile")
    br.get(1) // direct_8x8
    require(br.get(1) == 0, "h264: frame cropping outside this profile")
    require(br.get(1) == 0, "h264: VUI outside this profile")
    br.trailing()
    Sps(profile, level, wMbs, hMbs, lmfn, lmpoc)
  }

  private[operators] def parsePps(rbsp: Array[Byte]): Pps = {
    val br = new BitReader(rbsp)
    require(br.ue() == 0 && br.ue() == 0, "h264: multiple parameter sets outside this profile")
    val cabac = br.get(1) == 1
    require(!cabac, "h264: CABAC outside this profile (CAVLC headers only)")
    br.get(1) // bottom_field_pic_order
    require(br.ue() == 0, "h264: slice groups (FMO) outside this profile")
    br.ue(); br.ue() // ref idx defaults
    br.get(1); br.get(2) // weighted pred
    val qp = 26 + br.se()
    br.se(); br.se() // qs, chroma offset
    br.get(1); br.get(1); br.get(1)
    br.trailing()
    Pps(cabac, qp)
  }

  // ---- encode ---------------------------------------------------------------------

  /** Encode one IDR frame of I_PCM macroblocks: `yOf/uOf/vOf` give each
    * pixel (luma: frame coords; chroma: half-res coords). Returns a full
    * Annex B stream (SPS + PPS + IDR slice).
    */
  def encode(w: Int, h: Int, yOf: (Int, Int) => Int,
             uOf: (Int, Int) => Int, vOf: (Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0 && w % 16 == 0 && h % 16 == 0,
      "h264: this profile codes full-MB frames (no cropping)")
    val bw = new BitWriter
    // slice header (IDR, slice_type 7 = I, all-picture slice)
    bw.ue(0) // first_mb_in_slice
    bw.ue(7) // slice_type: I (the 5..9 "all slices in picture" form)
    bw.ue(0) // pps id
    bw.put(0, 8) // frame_num (log2 8)
    bw.ue(0) // idr_pic_id
    bw.put(0, 8) // pic_order_cnt_lsb (log2 8)
    // dec_ref_pic_marking (IDR): no_output_of_prior_pics, long_term_reference
    bw.put(0, 1)
    bw.put(0, 1)
    bw.se(0) // slice_qp_delta
    bw.ue(0) // disable_deblocking_filter_idc (control present in PPS)
    bw.se(0) // slice_alpha_c0_offset_div2
    bw.se(0) // slice_beta_offset_div2
    var mb = 0
    val mbW = w / 16
    while (mb < mbW * (h / 16)) {
      val mx = (mb % mbW) * 16
      val my = (mb / mbW) * 16
      bw.ue(25) // mb_type: I_PCM
      bw.alignZero() // pcm_alignment_zero_bit*
      var i = 0
      while (i < 256) { bw.putByte(yOf(mx + i % 16, my + i / 16)); i += 1 }
      i = 0
      while (i < 64) { bw.putByte(uOf(mx / 2 + i % 8, my / 2 + i / 8)); i += 1 }
      i = 0
      while (i < 64) { bw.putByte(vOf(mx / 2 + i % 8, my / 2 + i / 8)); i += 1 }
      mb += 1
    }
    bw.trailing()
    val out = new java.io.ByteArrayOutputStream()
    Seq(nal(3, 7, writeSps(w, h)), nal(3, 8, writePps()),
      nal(3, 5, bw.bytes())).foreach(n => out.write(n, 0, n.length))
    out.toByteArray
  }

  // ---- decode ----------------------------------------------------------------------

  final case class H264Frame(width: Int, height: Int, y: Array[Byte],
                             u: Array[Byte], v: Array[Byte])

  /** Annex B sniff: a leading 3- or 4-byte start code. */
  def isAnnexB(b: Array[Byte]): Boolean =
    b != null && b.length >= 5 && b(0) == 0 && b(1) == 0 &&
      ((b(2) == 0 && b(3) == 1) || b(2) == 1)

  def decode(b: Array[Byte]): H264Frame = {
    val nals = splitNals(b)
    require(nals.map(_._2) == Seq(7, 8, 5),
      "h264: this profile expects exactly SPS, PPS, one IDR slice")
    val sps = parseSps(nals(0)._3)
    parsePps(nals(1)._3)
    val w = sps.widthMbs * 16
    val h = sps.heightMbs * 16
    val y = new Array[Byte](w * h)
    val u = new Array[Byte]((w / 2) * (h / 2))
    val v = new Array[Byte]((w / 2) * (h / 2))
    val br = new BitReader(nals(2)._3)
    require(br.ue() == 0, "h264: slices not starting at MB 0 outside this profile")
    val sliceType = br.ue()
    require(sliceType == 2 || sliceType == 7, "h264: non-I slice in an IDR picture")
    require(br.ue() == 0, "h264: unknown PPS id")
    br.get(sps.log2MaxFrameNum) // frame_num
    br.ue() // idr_pic_id
    br.get(sps.log2MaxPoc) // poc lsb
    br.get(1); br.get(1) // dec_ref_pic_marking (IDR form)
    br.se() // slice_qp_delta
    val disableDeblock = br.ue() // deblocking control present in our PPS
    if (disableDeblock != 1) { br.se(); br.se() }
    var mb = 0
    val mbW = w / 16
    while (mb < mbW * (h / 16)) {
      val mbType = br.ue()
      require(mbType == 25,
        s"h264: mb_type $mbType — this rung decodes I_PCM only (CAVLC residual is the next rung)")
      br.alignByte()
      val mx = (mb % mbW) * 16
      val my = (mb / mbW) * 16
      var i = 0
      while (i < 256) {
        y((my + i / 16) * w + mx + i % 16) = br.readByte().toByte
        i += 1
      }
      i = 0
      while (i < 64) {
        u((my / 2 + i / 8) * (w / 2) + mx / 2 + i % 8) = br.readByte().toByte
        i += 1
      }
      i = 0
      while (i < 64) {
        v((my / 2 + i / 8) * (w / 2) + mx / 2 + i % 8) = br.readByte().toByte
        i += 1
      }
      mb += 1
    }
    br.trailing()
    H264Frame(w, h, y, u, v)
  }
}
