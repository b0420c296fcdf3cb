package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType}

/** Product-quantization kernels (PQ8): the standard 100 TB ANN memory
  * layout — a d-dim float vector becomes `m` one-byte centroid indexes
  * (one per d/m-dim subspace), an `m`-byte code in place of 4·d vector
  * bytes. Search is ASYMMETRIC: the query stays float; its distance to a
  * code is looked up from a per-query table of query-subvector ×
  * sub-centroid distances, so scanning a code costs `m` array reads + adds
  * (Jégou et al., "Product Quantization for Nearest Neighbor Search",
  * IEEE TPAMI 2011 — public method).
  *
  * The codebook rides into codegen as a reference object (one flat
  * `float[]`, row-major `[subspace][centroid][subdim]`), never as 16k plan
  * literals. All loops are tight primitive loops over that array.
  */
object PqKernels {

  /** Encode one vector: per subspace, the index of the L2-nearest
    * sub-centroid (ties toward the lowest index — deterministic on any
    * engine). Output: `m` bytes.
    */
  def encode(v: ArrayData, cb: Array[Float], m: Int, subDim: Int, k: Int): Array[Byte] = {
    if (v.numElements() != m * subDim)
      throw new IllegalArgumentException(
        s"pq_encode: vector has ${v.numElements()} dims, codebook expects ${m * subDim}")
    val out = new Array[Byte](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < k) {
        val base = (s * k + j) * subDim
        var d = 0.0
        var t = 0
        while (t < subDim) {
          val diff = v.getFloat(s * subDim + t).toDouble - cb(base + t).toDouble
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      out(s) = best.toByte
      s += 1
    }
    out
  }

  /** Per-query ADC lookup table: entry `s·k + j` = ||q_s − c_sj||² as a
    * float. Built ONCE per query row (the query relation is broadcast-class
    * small); every scanned code then costs `m` lookups, not `m·subDim`
    * multiplies.
    */
  def lut(q: ArrayData, cb: Array[Float], m: Int, subDim: Int, k: Int): ArrayData = {
    if (q.numElements() != m * subDim)
      throw new IllegalArgumentException(
        s"pq_lut: query has ${q.numElements()} dims, codebook expects ${m * subDim}")
    val out = new Array[Float](m * k)
    var s = 0
    while (s < m) {
      var j = 0
      while (j < k) {
        val base = (s * k + j) * subDim
        var d = 0.0
        var t = 0
        while (t < subDim) {
          val diff = q.getFloat(s * subDim + t).toDouble - cb(base + t).toDouble
          d += diff * diff
          t += 1
        }
        out(s * k + j) = d.toFloat
        j += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Asymmetric distance: sum over subspaces of the LUT entry the code
    * byte selects. Double accumulation, left-to-right.
    */
  def adc(lut: ArrayData, codes: Array[Byte], k: Int): Double = {
    val m = codes.length
    var acc = 0.0
    var s = 0
    while (s < m) {
      acc += lut.getFloat(s * k + (codes(s) & 0xff)).toDouble
      s += 1
    }
    acc
  }
}

/** array<float> vector → m-byte PQ code against a driver-trained codebook
  * (codegen'd; the codebook is a referenced object, not plan literals).
  */
case class PqEncodeExpr(child: Expression, codebook: Array[Float],
                        m: Int, subDim: Int, k: Int) extends UnaryExpression {
  require(k >= 1 && k <= 256, s"pq_encode: k must be 1..256 for byte codes, got $k")
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes() = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_encode needs array<float>, got ${other.catalogString}")
    }
  }
  override protected def nullSafeEval(input: Any): Any =
    PqKernels.encode(input.asInstanceOf[ArrayData], codebook, m, subDim, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "float[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.PqKernels.encode($c, $cb, $m, $subDim, $k)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** array<float> query → flat m·k ADC lookup table (codegen'd). */
case class PqLutExpr(child: Expression, codebook: Array[Float],
                     m: Int, subDim: Int, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def checkInputDataTypes() = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_lut needs array<float>, got ${other.catalogString}")
    }
  }
  override protected def nullSafeEval(input: Any): Any =
    PqKernels.lut(input.asInstanceOf[ArrayData], codebook, m, subDim, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "float[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.PqKernels.lut($c, $cb, $m, $subDim, $k)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqLutExpr =
    copy(child = newChild)
}

/** (lut array<float>, codes binary) → asymmetric distance (codegen'd). */
case class PqAdcExpr(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc needs (array<float> lut, binary codes), got ${l.catalogString}, ${r.catalogString}")
    }
  }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    PqKernels.adc(a.asInstanceOf[ArrayData], b.asInstanceOf[Array[Byte]], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.PqKernels.adc($a, $b, $k)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqAdcExpr =
    copy(left = newLeft, right = newRight)
}
