package graft.operators

/** The CABAC arithmetic-coding engine (ITU-T H.264 9.3): context-adaptive
  * binary arithmetic coding with the spec's 9-bit range machinery —
  * range subdivision by a state-indexed LPS table, MPS/LPS probability
  * state transitions with the MPS flip at state 0, renormalization one
  * bit at a time (encoder side with the PutBit / bitsOutstanding carry
  * scheme and the first-bit suppression), the BYPASS path for
  * near-uniform bins, the TERMINATE decision used by end_of_slice_flag
  * and the I_PCM escape, and the encoder flush that seeds the rbsp stop
  * bit. The ENGINE STRUCTURE is spec-exact; the numeric tables —
  * rangeTabLPS and the LPS state transition — are documented PINNED
  * IMPLEMENTATION VALUES (the repo's codec discipline): any monotone
  * table pair that keeps 2 <= rangeLPS < range preserves correctness of
  * the arithmetic, and a tables-only swap restores interop.
  *
  * Context state is held by the caller as (pStateIdx, valMPS) pairs in a
  * flat array; context NUMBERING and initialization (all contexts start
  * at state 0 / MPS 0) are likewise documented implementation values —
  * the spec's neighbor-dependent ctxIdxInc derivations are implemented
  * structurally by the syntax layer in [[H264Codec]].
  */
private[operators] object H264Cabac {

  /** Pinned rangeTabLPS: monotone in the quarter index and decaying in
    * the probability state; always in [2, 112] so the MPS range keeps
    * its renormalization headroom.
    */
  val lpsTab: Array[Array[Int]] = Array.tabulate(64, 4) { (s, q) =>
    math.max(2, ((q + 4) * 64) >> (2 + s / 6))
  }

  def mpsTrans(s: Int): Int = math.min(62, s + 1)

  /** Pinned LPS transition: a 3/4 fallback, floored at 0 (where the MPS
    * flips per the spec rule).
    */
  def lpsTrans(s: Int): Int = (s * 3) / 4

  /** Encoder: emits bits through `putBit` (the caller appends them to
    * the byte-aligned slice buffer).
    */
  final class Enc(putRaw: Int => Unit) {
    private var low = 0
    private var range = 510
    private var outstanding = 0
    private var firstBit = true

    private def putBit(b: Int): Unit = {
      if (firstBit) firstBit = false else putRaw(b)
      while (outstanding > 0) { putRaw(1 - b); outstanding -= 1 }
    }

    private def renorm(): Unit = {
      while (range < 256) {
        if (low >= 512) { putBit(1); low -= 512 }
        else if (low < 256) putBit(0)
        else { outstanding += 1; low -= 256 }
        low <<= 1
        range <<= 1
      }
    }

    /** Encode one context-coded bin; `st` holds (pStateIdx, valMPS). */
    def bin(st: Array[Int], ctx: Int, b: Int): Unit = {
      val s = st(2 * ctx); val mps = st(2 * ctx + 1)
      val rLps = lpsTab(s)((range >> 6) & 3)
      range -= rLps
      if (b != mps) {
        low += range
        range = rLps
        if (s == 0) st(2 * ctx + 1) = 1 - mps
        st(2 * ctx) = lpsTrans(s)
      } else st(2 * ctx) = mpsTrans(s)
      renorm()
    }

    def bypass(b: Int): Unit = {
      low <<= 1
      if (b == 1) low += range
      if (low >= 1024) { putBit(1); low -= 1024 }
      else if (low < 512) putBit(0)
      else { outstanding += 1; low -= 512 }
    }

    def terminate(b: Int): Unit = {
      range -= 2
      if (b == 1) { low += range; range = 2; flush() }
      else renorm()
    }

    /** Final flush (9.3.4.6): renormalize the last two bits out and seed
      * the rbsp stop bit.
      */
    private def flush(): Unit = {
      renorm()
      putBit((low >> 9) & 1)
      putRaw((low >> 8) & 1)
      putRaw(1) // the stop bit the rbsp trailer expects
    }

    /** Reset after an I_PCM escape (the spec re-initializes the engine
      * after the PCM samples).
      */
    def reinit(): Unit = {
      low = 0; range = 510; outstanding = 0; firstBit = true
    }
  }

  /** Decoder over a bit source; reads past-the-end as zero bits (the
    * engine reads ahead of the true entropy content, so the final
    * renormalizations may touch padding).
    */
  final class Dec(nextBit: () => Int) {
    private var range = 510
    private var offset = 0
    init()

    private def init(): Unit = {
      range = 510
      offset = 0
      var i = 0
      while (i < 9) { offset = (offset << 1) | nextBit(); i += 1 }
      require(offset < 510, "h264: invalid CABAC initialization value")
    }

    def bin(st: Array[Int], ctx: Int): Int = {
      val s = st(2 * ctx); val mps = st(2 * ctx + 1)
      val rLps = lpsTab(s)((range >> 6) & 3)
      range -= rLps
      val out =
        if (offset >= range) {
          offset -= range
          range = rLps
          if (s == 0) st(2 * ctx + 1) = 1 - mps
          st(2 * ctx) = lpsTrans(s)
          1 - mps
        } else { st(2 * ctx) = mpsTrans(s); mps }
      while (range < 256) { range <<= 1; offset = (offset << 1) | nextBit() }
      out
    }

    def bypass(): Int = {
      offset = (offset << 1) | nextBit()
      if (offset >= range) { offset -= range; 1 } else 0
    }

    def terminate(): Int = {
      range -= 2
      if (offset >= range) 1
      else {
        while (range < 256) { range <<= 1; offset = (offset << 1) | nextBit() }
        0
      }
    }

    /** Re-initialize after the I_PCM samples (byte alignment is done by
      * the caller on the underlying reader first).
      */
    def reinit(): Unit = init()
  }
}
