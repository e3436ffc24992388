package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Ordered-series kernels: sequential folds that SQL window functions
 *  cannot express (each output depends on the previous OUTPUT, not a
 *  previous input). */
object SeriesKernels {

  /** Integer exponential smoothing over a non-negative series:
   *  y(0) = x(0), y(t) = (a100*x(t) + (100-a100)*y(t-1)) / 100 —
   *  all-integer, so the fold is bit-replayable on any engine
   *  (truncating and flooring division agree on non-negatives). */
  def ewma(xs: ArrayData, a100: Int): ArrayData = {
    val n = xs.numElements()
    val out = new Array[Long](n)
    var i = 0
    var prev = 0L
    while (i < n) {
      val x = xs.getLong(i)
      prev = if (i == 0) x else (a100 * x + (100L - a100) * prev) / 100L
      out(i) = prev
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** ewma(array<long>) -> array<long> smoothed series (codegen static
 *  call; the smoothing constant is plan-time geometry). */
case class EwmaExpr(child: Expression, a100: Int) extends UnaryExpression {
  require(a100 >= 1 && a100 <= 99, s"EwmaExpr: a100 must be in [1,99], got $a100")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ewma"

  override protected def nullSafeEval(xs: Any): Any =
    SeriesKernels.ewma(xs.asInstanceOf[ArrayData], a100)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xs =>
      s"${ev.value} = graft.functions.SeriesKernels.ewma($xs, $a100);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
