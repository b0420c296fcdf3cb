package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Vector math kernels for `array<float>` embeddings.
  *
  * Accumulation is double-precision left-to-right — the exact order the
  * equivalent `aggregate(zip_with(...))` fold uses — so swapping the
  * interpreted HOF composition for these codegen'd kernels is
  * bit-for-bit result-preserving (the DuckDB oracle queries keep matching).
  */
object VectorKernels {

  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0d
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** cosine(a,b) with the [[graft.operators.Similarity.cosine]] zero-vector
    * convention (denominator 0 → 0.0).
    */
  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val denom = math.sqrt(dotF(a, a) * dotF(b, b))
    if (denom == 0.0d) 0.0d else dotF(a, b) / denom
  }
}

/** Codegen'd cosine over two array<float> columns. */
case class CosineF32Expr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_f32 needs two array<float>, got ${l.catalogString}, ${r.catalogString}")
    }
  }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosineF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VectorKernels.cosineF($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineF32Expr =
    copy(left = newLeft, right = newRight)
}
