package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

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

/** Sorted-by-lo, possibly-OVERLAPPING closed-interval table for
 *  broadcast interval-overlap probes. `maxLen` (max of hi-lo+1)
 *  bounds the back-scan: any interval reaching a query's lo must
 *  start at or after qLo - maxLen + 1. */
final case class OverlapTable(los: Array[Long], his: Array[Long], maxLen: Long)
  extends Serializable

object OverlapKernels {
  private val empty: ArrayData = UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)

  /** Ordinals (positions in the sorted table) of every interval
   *  [los(i), his(i)] intersecting the CLOSED query [qLo, qHi]:
   *  binary-search the lo-prefix reachable from qHi, back off by
   *  maxLen for the scan start, filter on hi >= qLo. Exact — no
   *  residual filter needed. O(log n + window) per row. */
  def overlapOrdinals(qLo: Long, qHi: Long, t: OverlapTable): ArrayData = {
    val n = t.los.length
    if (qHi < qLo || n == 0) return empty
    // last index with lo <= qHi
    var lo = 0; var hi = n - 1; var end = -1
    while (lo <= hi) {
      val m = (lo + hi) >>> 1
      if (t.los(m) <= qHi) { end = m; lo = m + 1 } else hi = m - 1
    }
    if (end < 0) return empty
    // first index that can still reach qLo (clamped against underflow)
    val from = if (qLo < Long.MinValue + t.maxLen) Long.MinValue else qLo - t.maxLen + 1
    var lo2 = 0; var hi2 = end; var start = end + 1
    while (lo2 <= hi2) {
      val m = (lo2 + hi2) >>> 1
      if (t.los(m) >= from) { start = m; hi2 = m - 1 } else lo2 = m + 1
    }
    var i = start; var cnt = 0
    while (i <= end) { if (t.his(i) >= qLo) cnt += 1; i += 1 }
    if (cnt == 0) return empty
    val out = new Array[Long](cnt)
    i = start; var j = 0
    while (i <= end) { if (t.his(i) >= qLo) { out(j) = i; j += 1 }; i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** overlap_ordinals(lo, hi) over a bound [[OverlapTable]] — the array
 *  of table ordinals whose closed intervals intersect [lo, hi] (empty
 *  when none, null on null input, empty when hi < lo). The table
 *  rides a Broadcast handle, not the expression tree. Backs
 *  [[graft.operators.Temporal.overlapJoin]]'s degenerate-small-side
 *  fast path: explode(ordinals) + a broadcast equi-join on the
 *  ordinal = a map-only plan, where the general path pays two guard
 *  jobs plus an explode + hash shuffle on bucket ids. */
case class OverlapOrdinalsExpr(left: Expression, right: Expression,
                               tableBc: Broadcast[OverlapTable])
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "overlap_ordinals"

  @transient private lazy val table: OverlapTable = tableBc.value

  override protected def nullSafeEval(l: Any, r: Any): Any =
    OverlapKernels.overlapOrdinals(l.asInstanceOf[Long], r.asInstanceOf[Long], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("overlapBc", tableBc,
      classOf[Broadcast[OverlapTable]].getName)
    val t = ctx.addMutableState("graft.functions.OverlapTable", "overlapTable",
      v => s"$v = (graft.functions.OverlapTable) $bc.value();", forceInline = true)
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.OverlapKernels.overlapOrdinals($l, $r, $t);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
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
