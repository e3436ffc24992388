package graft.functions

import graft.healpix.Healpix
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Ingest-path kernels: partition assignment against a broadcast
 * adaptive-partition grid (order-k pixel -> assigned order), fully
 * inside WholeStageCodegen. These replace the r1 per-row Scala UDFs
 * (boxed, codegen-breaking) on the one path every ingested row — all
 * 100 TB — must cross. The grid rides as a Broadcast handle (cheap to
 * serialize per task; the int array ships once per executor).
 */
object GridKernels {

  /** Packed partition pixel (assignedOrder << 48) | partitionPix, or -1 if the grid has no entry. */
  def packedPartitionPixel(ra: Double, dec: Double, orderK: Int, grid: Array[Int]): Long = {
    val pixK = Healpix.ang2pixNest(orderK, ra, dec)
    val o = grid(pixK.toInt)
    if (o < 0) -1L
    else (o.toLong << 48) | (pixK >> (2 * (orderK - o)))
  }

  /**
   * Packed FOREIGN partition pixels within `marginDeg` of the point
   * (the neighbor-cache explode set): disc-cover pixels mapped
   * through the grid, distinct, minus the point's own partition
   * pixel. Bounded: a margin disc covers 1-4 order-k pixels.
   */
  def marginPixels(ra: Double, dec: Double, orderK: Int, marginDeg: Double, grid: Array[Int]): ArrayData = {
    val own = packedPartitionPixel(ra, dec, orderK, grid)
    val cover = Healpix.queryDiscCover(orderK, ra, dec, marginDeg)
    val out = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < cover.length) {
      val pk = cover(i)
      val o = grid(pk.toInt)
      if (o >= 0) {
        val packed = (o.toLong << 48) | (pk >> (2 * (orderK - o)))
        if (packed != own) out.add(packed)
      }
      i += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = it.next(); k += 1 }
    new GenericArrayData(arr)
  }
}

/**
 * packed_partition_pixel(ra, dec) -> (order << 48) | pix against a
 * broadcast grid; -1 where the grid is empty (no partition).
 */
case class PackedPartitionPixelExpr(left: Expression, right: Expression,
                                    orderK: Int, grid: Broadcast[Array[Int]])
  extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "packed_partition_pixel"

  override protected def nullSafeEval(ra: Any, dec: Any): Any =
    GridKernels.packedPartitionPixel(ra.asInstanceOf[Double], dec.asInstanceOf[Double], orderK, grid.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val g = ctx.addReferenceObj("grid", grid, classOf[Broadcast[Array[Int]]].getName)
    defineCodeGen(ctx, ev, (ra, dec) =>
      s"graft.functions.GridKernels.packedPartitionPixel($ra, $dec, $orderK, (int[])$g.value())")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** margin_pixels(ra, dec) -> array<long> of packed foreign partition pixels within the margin. */
case class MarginPixelsExpr(left: Expression, right: Expression,
                            orderK: Int, marginDeg: Double, grid: Broadcast[Array[Int]])
  extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "margin_pixels"

  override protected def nullSafeEval(ra: Any, dec: Any): Any =
    GridKernels.marginPixels(ra.asInstanceOf[Double], dec.asInstanceOf[Double], orderK, marginDeg, grid.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val g = ctx.addReferenceObj("grid", grid, classOf[Broadcast[Array[Int]]].getName)
    nullSafeCodeGen(ctx, ev, (ra, dec) =>
      s"${ev.value} = graft.functions.GridKernels.marginPixels($ra, $dec, $orderK, $marginDeg, (int[])$g.value());")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
