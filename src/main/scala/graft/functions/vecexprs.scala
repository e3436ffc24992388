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

  /** Squared L2 between two float vectors: widen-to-double BEFORE
   *  subtracting, left-to-right accumulation — the exact arithmetic
   *  of `aggregate(zip_with(...))` and of the DuckDB list-fold
   *  oracle, so distances hash-compare across engines. */
  def l2Sq(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  /** PQ subspace distances: for each of the m subspaces and each of
   *  the ksub codewords (cb is the [ksub][dim] sample matrix,
   *  row-major), squared L2 between the vector's subslice and the
   *  codeword's — output flat array of m*ksub doubles indexed
   *  s*ksub + j, same accumulation order as [[l2Sq]]. */
  def pqSubDists(vec: ArrayData, cb: Array[Float], m: Int): ArrayData = {
    val dim = vec.numElements()
    val dsub = dim / m
    val ksub = if (dim == 0) 0 else cb.length / dim
    val out = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      var j = 0
      while (j < ksub) {
        var acc = 0.0
        var i = 0
        while (i < dsub) {
          val p = s * dsub + i
          val d = vec.getFloat(p).toDouble - cb(j * dim + p).toDouble
          acc += d * d
          i += 1
        }
        out(s * ksub + j) = acc
        j += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  /** PQ asymmetric distance: sum over subspaces s = 0..m-1, in order,
   *  of squared L2 between the query's exact subvector and the
   *  codeword `codes[s]` — the query never touches corpus floats. */
  def pqAdc(q: ArrayData, codes: ArrayData, cb: Array[Float], m: Int): Double = {
    val dim = q.numElements()
    val dsub = dim / m
    var acc = 0.0
    var s = 0
    while (s < m) {
      val j = codes.getInt(s)
      var sub = 0.0
      var i = 0
      while (i < dsub) {
        val p = s * dsub + i
        val d = q.getFloat(p).toDouble - cb(j * dim + p).toDouble
        sub += d * d
        i += 1
      }
      acc += sub
      s += 1
    }
    acc
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

/** l2_sq(array<float>, array<float>) -> double: squared L2 distance. */
case class L2SqExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_sq"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.l2Sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecKernels.l2Sq($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** pq_sub_dists(array<float>) -> array<double>: per-(subspace,
 *  codeword) squared L2, the inlined-codebook PQ encode kernel.
 *  The codebook is a ksub x dim constant (a few KB — safe to carry
 *  in the expression tree, unlike MB-scale filter state). */
case class PqSubDistsExpr(child: Expression, cb: Seq[Float], m: Int) extends UnaryExpression {
  private lazy val cbArr = cb.toArray
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_sub_dists"

  override protected def nullSafeEval(vec: Any): Any =
    VecKernels.pqSubDists(vec.asInstanceOf[ArrayData], cbArr, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqcb", cbArr, "float[]")
    nullSafeCodeGen(ctx, ev, e =>
      s"${ev.value} = graft.functions.VecKernels.pqSubDists($e, $ref, $m);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** pq_adc(array<float> query, array<int> codes) -> double: asymmetric
 *  PQ distance against the inlined codebook, subspaces accumulated in
 *  fixed s-order. */
case class PqAdcExpr(left: Expression, right: Expression, cb: Seq[Float], m: Int)
    extends BinaryExpression {
  private lazy val cbArr = cb.toArray
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(q: Any, codes: Any): Any =
    VecKernels.pqAdc(q.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData], cbArr, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqcb", cbArr, "float[]")
    defineCodeGen(ctx, ev, (q, c) => s"graft.functions.VecKernels.pqAdc($q, $c, $ref, $m)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
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
