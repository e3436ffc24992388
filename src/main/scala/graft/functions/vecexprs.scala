package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Embedding quantization kernels. Symmetric per-vector int8: scale =
 * max|v| / 127, q_i = round-half-away(v_i / scale). Stored as a REAL
 * byte array (1 byte/element in UnsafeArrayData — 4x smaller than the
 * float input), so a quantized 100 TB corpus scans 4x faster and the
 * candidate-generation pass runs on integers.
 *
 * The arithmetic is pinned for oracle replay: f32→f64 widening is
 * exact, and floor(|v|/s + 0.5) * sign(v) is the same IEEE-754 double
 * sequence DuckDB's list lambdas evaluate — so quantized scores are
 * hash-comparable, not just approximately equal. Cosine over
 * quantized vectors needs NO dequantization at all: the per-vector
 * scales cancel, leaving exact integer dot/norm sums and one final
 * double division.
 */
object VecKernels {

  /** Symmetric int8 quantization of a float vector (zero vector → zeros). */
  def int8Quantize(vec: ArrayData): ArrayData = {
    val n = vec.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(vec.getFloat(i).toDouble)
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val out = new Array[Byte](n)
    if (maxAbs > 0) {
      val scale = maxAbs / 127.0
      i = 0
      while (i < n) {
        val v = vec.getFloat(i).toDouble
        out(i) = (math.floor(math.abs(v) / scale + 0.5) * math.signum(v)).toByte
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  /** Scale needed to dequantize [[int8Quantize]] output (max|v| / 127). */
  def int8Scale(vec: ArrayData): Double = {
    val n = vec.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(vec.getFloat(i).toDouble)
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    maxAbs / 127.0
  }

  /** Cosine of two quantized byte vectors: exact integer sums, one
   *  double division (scales cancel). Zero-norm input → 0.0. */
  def quantCos(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0L
    var na = 0L
    var nb = 0L
    var i = 0
    while (i < n) {
      val x = a.getByte(i).toLong
      val y = b.getByte(i).toLong
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0L || nb == 0L) 0.0
    else dot / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }
}

/** int8_quantize(array<float>) -> array<tinyint> (codegen static call). */
case class Int8QuantizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "int8_quantize"

  override protected def nullSafeEval(vec: Any): Any =
    VecKernels.int8Quantize(vec.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, e =>
      s"${ev.value} = graft.functions.VecKernels.int8Quantize($e);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** int8_scale(array<float>) -> double: the dequantization scale. */
case class Int8ScaleExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "int8_scale"

  override protected def nullSafeEval(vec: Any): Any =
    VecKernels.int8Scale(vec.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, e => s"graft.functions.VecKernels.int8Scale($e)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** quant_cos(array<tinyint>, array<tinyint>) -> double. */
case class QuantCosExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "quant_cos"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.quantCos(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecKernels.quantCos($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
