package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Row-level hash kernels, callable from both interpreted eval and
  * generated code (static call — no boxing, no closure).
  */
object HashUtil {

  /** xxhash64 of a UTF8String, same algorithm/seed as Spark's xxhash64(). */
  def xx64(s: UTF8String, seed: Long): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      s, org.apache.spark.sql.types.StringType, seed)

  /** 64-bit SimHash over a token array: per-token xxhash64, ±1 vote per bit,
    * sign of each vote → signature bit.
    */
  def simhash64(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = xx64(tokens.getUTF8String(i), 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Rabin-Karp rolling polynomial hash (base 1000003, mod 2⁶⁴ wraparound)
    * over the UTF-8 bytes — a classic document fingerprint.
    */
  def rollingHash64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) {
      h = h * 1000003L + (bytes(i) & 0xff)
      i += 1
    }
    h
  }
}
