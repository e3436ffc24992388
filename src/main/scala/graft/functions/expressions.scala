package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.util.ArrayData

/**
 * Native Catalyst expressions for the HEALPix primitives — codegen'd
 * static calls into [[graft.healpix.Healpix]], so spatial operators
 * stay inside whole-stage codegen (no UDF/serialization overhead on
 * the 100 TB hot path).
 *
 * Re-expresses healpy usage of the reference (hipscat/util.py:24,
 * catalog.py:93) as Spark-native expressions.
 */

/** gc_dist(ra1, dec1, ra2, dec2) -> degrees (codegen static call; oracle-parity op order). */
case class GcDistExpr(first: Expression, second: Expression, third: Expression, fourth: Expression)
    extends QuaternaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "gc_dist"

  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    graft.healpix.Healpix.gcDistDeg(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) =>
      s"${ev.value} = graft.healpix.Healpix.gcDistDeg($a, $b, $c, $d);")

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression, d: Expression): Expression =
    copy(first = a, second = b, third = c, fourth = d)
}

/** hpix(ra, dec, order) -> NEST pixel id (LongType). */
case class HpixExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "hpix"

  override protected def nullSafeEval(ra: Any, dec: Any, order: Any): Any =
    graft.healpix.Healpix.ang2pixNest(order.asInstanceOf[Int], ra.asInstanceOf[Double], dec.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ra, dec, order) =>
      s"${ev.value} = graft.healpix.Healpix.ang2pixNest($order, $ra, $dec);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/**
 * hpix_cover(ra, dec, order, radiusDeg) -> Array[Long] of all pixels
 * at `order` whose region may lie within `radiusDeg` of the point.
 * Used to explode the smaller side of a cross-match into margin
 * pixels (bounded explode — typically 1-4 pixels for radius << pixel
 * size); the engine's exact distance filter culls false candidates.
 */
case class HpixCoverExpr(first: Expression, second: Expression, third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hpix_cover"

  override protected def nullSafeEval(ra: Any, dec: Any, order: Any, radius: Any): Any =
    ArrayData.toArrayData(graft.healpix.Healpix.queryDiscCover(
      order.asInstanceOf[Int], ra.asInstanceOf[Double], dec.asInstanceOf[Double], radius.asInstanceOf[Double]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ra, dec, order, radius) =>
      s"${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(" +
        s"graft.healpix.Healpix.queryDiscCover($order, $ra, $dec, $radius));")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}

/**
 * hpix_center_ra/dec(pix, order) -> pixel-center coordinate in
 * degrees (pix2angNest — the inverse of HpixExpr). The map-space
 * face of the spatial family: counts-map smoothing and any
 * pixel-level statistic that needs geometry back from a pixel id
 * (healpy pix2ang parity).
 */
case class HpixCenterRaExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "hpix_center_ra"
  override protected def nullSafeEval(pix: Any, order: Any): Any =
    graft.healpix.Healpix.pixCenterRa(order.asInstanceOf[Int], pix.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (pix, order) =>
      s"${ev.value} = graft.healpix.Healpix.pixCenterRa($order, $pix);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class HpixCenterDecExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "hpix_center_dec"
  override protected def nullSafeEval(pix: Any, order: Any): Any =
    graft.healpix.Healpix.pixCenterDec(order.asInstanceOf[Int], pix.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (pix, order) =>
      s"${ev.value} = graft.healpix.Healpix.pixCenterDec($order, $pix);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/**
 * hpix_neighbors(pix, order) -> Array[Long]: the 8-connected NEST
 * neighborhood (7 at three-valent face corners), sorted — healpy
 * get_all_neighbours parity via [[graft.healpix.Healpix.neighborsNest]].
 * Map-only; the geometric probe work is per-evaluation constant.
 */
case class HpixNeighborsExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hpix_neighbors"
  override protected def nullSafeEval(pix: Any, order: Any): Any =
    ArrayData.toArrayData(graft.healpix.Healpix.neighborsNest(
      order.asInstanceOf[Int], pix.asInstanceOf[Long]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (pix, order) =>
      s"${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(" +
        s"graft.healpix.Healpix.neighborsNest($order, $pix));")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
