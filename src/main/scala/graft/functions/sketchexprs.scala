package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/**
 * Sketch probe kernels. The Bloom membership test is a pure function
 * of (id, filter words): one codegen'd expression keeps the whole
 * k-probe loop inside WholeStageCodegen — the Column-composed
 * equivalent (k x two two-round mixer trees) grows past Janino's
 * method limits and silently falls back to interpreted eval, the
 * exact failure mode that doesn't survive a 100 TB map-only filter
 * pass.
 */
object SketchKernels {
  final val KnuthC = 2654435761L
  final val BloomSalt = 0x9e3779b9L
  private final val M32 = (1L << 32) - 1

  /** JVM twin of Sampling.knuthHash (overflow-safe 16-bit split,
   *  high-word fold) — must stay bit-identical to the Column form
   *  and its DuckDB SQL twin. */
  def knuth(id: Long): Long = {
    val f = id ^ (id >>> 32)
    val m = f & M32 // f mod 2^32 for any sign pattern of the folded word
    val hi = ((m >>> 16) * KnuthC) & M32
    ((hi << 16) + (m & 0xffffL) * KnuthC) & M32
  }

  /** Two-round mixer (Sketch.mixCol twin). */
  def mix2(id: Long): Long = {
    val h = knuth(id)
    knuth(h ^ (h >>> 16))
  }

  /** Is `item` among `unit`'s m negative-sampling draws
   *  (knuth(unit*m + j) % n for j in [0, m))? The m-iteration loop is
   *  ONE compiled kernel call per row — the expression-tree form of
   *  the same test (m inlined hash subtrees) fell out of whole-stage
   *  codegen and measured 25x slower (Sampling.negativeSample doc). */
  def negHit(unit: Long, item: Long, m: Int, n: Long): Boolean = {
    var j = 0L
    while (j < m) {
      if (knuth(unit * m + j) % n == item) return true
      j += 1
    }
    false
  }

  /** The k probed bit positions of an id (build-side explode input). */
  def bloomBits(id: Long, logM: Int, k: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val h1 = mix2(id)
    val h2 = mix2(id ^ BloomSalt)
    val mask = (1L << logM) - 1
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.tabulate(k)(j => (h1 + j * h2) & mask))
  }

  /** Build-side twin of [[bloomProbe]]: set the k bits of an id in a
   *  caller-owned dense word array (Sketch.bloomBuildDense's
   *  per-partition accumulator). Same mixers, same geometry. */
  def bloomSet(words: Array[Long], id: Long, logM: Int, k: Int): Unit = {
    val h1 = mix2(id)
    val h2 = mix2(id ^ BloomSalt)
    val mask = (1L << logM) - 1
    var j = 0
    while (j < k) {
      val bit = (h1 + j * h2) & mask
      words((bit >>> 6).toInt) |= 1L << (bit & 63L).toInt
      j += 1
    }
  }

  /** All-k-bits-set Bloom membership test. */
  def bloomProbe(id: Long, words: Array[Long], logM: Int, k: Int): Boolean = {
    val h1 = mix2(id)
    val h2 = mix2(id ^ BloomSalt)
    val mask = (1L << logM) - 1
    var j = 0
    while (j < k) {
      val bit = (h1 + j * h2) & mask // h1,h2 < 2^32, k <= 8: no overflow; & = mod for power-of-two m
      if (((words((bit >>> 6).toInt) >>> (bit & 63L).toInt) & 1L) == 0L) return false
      j += 1
    }
    true
  }
}

/** bloom_bits(id) — the k probed bit positions, for the build-side
  * explode. Same kernel arithmetic as the probe. */
case class BloomBitsExpr(child: Expression, logM: Int, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bloom_bits"

  override protected def nullSafeEval(id: Any): Any =
    SketchKernels.bloomBits(id.asInstanceOf[Long], logM, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, id =>
      s"${ev.value} = graft.functions.SketchKernels.bloomBits($id, $logM, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** neg_hit(unit, item) — is `item` among `unit`'s m negative-sampling
  * candidate draws? One kernel call per row (the m-iteration loop
  * compiled once, not inlined m times into the expression tree).
  * Backs [[graft.operators.Sampling.negativeSample]]'s MAP-ONLY
  * interaction-sliver filter. */
case class NegHitExpr(left: Expression, right: Expression, m: Int, nItems: Long)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "neg_hit"

  override protected def nullSafeEval(unit: Any, item: Any): Any =
    SketchKernels.negHit(unit.asInstanceOf[Long], item.asInstanceOf[Long], m, nItems)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (u, it) =>
      s"${ev.value} = graft.functions.SketchKernels.negHit($u, $it, $m, ${nItems}L);")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** bloom_probe(id) over a bound filter — boolean, null for null id.
  * The filter words ride a `Broadcast[Array[Long]]`, NOT the
  * expression tree: the expression (serialized per task binding,
  * walked by canonicalization) carries only the broadcast handle —
  * a few hundred bytes regardless of logM — while the word array
  * ships once per executor via the block manager. At logM=30 that
  * is the difference between 128 MB per task and 128 MB per
  * executor. Two probes of the SAME broadcast still canonicalize
  * together (reference equality on the handle); equal-content but
  * separately-broadcast filters intentionally don't — comparing
  * 2^24-word arrays structurally is the cost this design removes. */
case class BloomProbeExpr(child: Expression, wordsBc: Broadcast[Array[Long]], logM: Int, k: Int)
    extends UnaryExpression {
  require(logM >= 6 && logM <= 30, s"BloomProbeExpr: logM must be in [6, 30] (got $logM)")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_probe"

  @transient private lazy val wordsArr: Array[Long] = {
    val w = wordsBc.value
    require(w.length == 1 << (logM - 6),
      s"BloomProbeExpr: ${w.length} words but logM=$logM implies ${1 << (logM - 6)}")
    w
  }

  override protected def nullSafeEval(id: Any): Any =
    SketchKernels.bloomProbe(id.asInstanceOf[Long], wordsArr, logM, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("bloomBc", wordsBc, classOf[Broadcast[Array[Long]]].getName)
    // fetch the broadcast value once per task (mutable state), not per row
    val w = ctx.addMutableState("long[]", "bloomWords",
      v => s"$v = (long[]) $bc.value();", forceInline = true)
    nullSafeCodeGen(ctx, ev, id =>
      s"${ev.value} = graft.functions.SketchKernels.bloomProbe($id, $w, $logM, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
