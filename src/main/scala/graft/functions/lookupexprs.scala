package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Sorted non-overlapping interval table for broadcast point lookups:
 *  parallel arrays (los sorted ascending, his exclusive, ids). */
final case class IntervalTable(los: Array[Long], his: Array[Long], ids: Array[Long])
  extends Serializable

object LookupKernels {
  /** Greatest lo <= v by binary search, then the half-open bound
   *  check; -1 when no interval covers v. */
  def intervalLookup(v: Long, t: IntervalTable): Long = {
    var lo = 0
    var hi = t.los.length - 1
    var ans = -1
    while (lo <= hi) {
      val m = (lo + hi) >>> 1
      if (t.los(m) <= v) { ans = m; lo = m + 1 } else hi = m - 1
    }
    if (ans >= 0 && v < t.his(ans)) t.ids(ans) else -1L
  }
}

/** interval_lookup(value) over a bound interval table — the id of the
 *  covering interval, -1 when uncovered, null for null input. As with
 *  [[BloomProbeExpr]], the table rides a Broadcast handle, not the
 *  expression tree: binary search per row, zero shuffle — the
 *  map-only alternative to a range join when the interval side is a
 *  small dimension (IP->ASN, price bands, SLA tiers). */
case class IntervalLookupExpr(child: Expression, tableBc: Broadcast[IntervalTable])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "interval_lookup"

  @transient private lazy val table: IntervalTable = tableBc.value

  override protected def nullSafeEval(v: Any): Any =
    LookupKernels.intervalLookup(v.asInstanceOf[Long], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("intervalBc", tableBc,
      classOf[Broadcast[IntervalTable]].getName)
    val t = ctx.addMutableState("graft.functions.IntervalTable", "intervalTable",
      v => s"$v = (graft.functions.IntervalTable) $bc.value();", forceInline = true)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.LookupKernels.intervalLookup($v, $t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
