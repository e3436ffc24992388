package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Per-row signature kernels: a document's MinHash / SimHash is a
 * pure function of its shingle/token array, so computing it inside
 * one codegen'd expression removes the explode + 64-aggregate
 * shuffle entirely (signature generation becomes a map-only stage —
 * the only shuffle left in near-dup detection is the band bucket
 * join). This is the shape that survives 100 TB: O(tokens) work per
 * row, no row multiplication.
 */
object SigKernels {

  /** FNV-1a 64 with an avalanche finisher (splitmix64). Self-contained, stable. */
  def hash64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    // splitmix64 finisher
    h += 0x9e3779b97f4a7c15L
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  /** Seeded odd multipliers/offsets for the universal-hash permutations. */
  private def mixers(numPerms: Int): (Array[Long], Array[Long]) = {
    val rnd = new java.util.Random(0x5eed
      * 1234567L)
    val a = new Array[Long](numPerms)
    val b = new Array[Long](numPerms)
    var i = 0
    while (i < numPerms) { a(i) = rnd.nextLong() | 1L; b(i) = rnd.nextLong(); i += 1 }
    (a, b)
  }
  private val (mixA, mixB) = mixers(256) // supports numPerms <= 256

  /** MinHash signature over a string array: one base hash per element, cheap mixes per permutation. */
  def minhashSig(elems: ArrayData, numPerms: Int): ArrayData = {
    require(numPerms >= 1 && numPerms <= 256, s"numPerms must be in [1, 256], got $numPerms")
    val sig = new Array[Long](numPerms)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = elems.numElements()
    var i = 0
    while (i < n) {
      val h = hash64(elems.getUTF8String(i))
      var j = 0
      while (j < numPerms) {
        val g = mixA(j) * h + mixB(j)
        if (g < sig(j)) sig(j) = g
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Sorted distinct 64-bit hashes of a string array (for merge-based set ops). */
  def sortedHashes(elems: ArrayData): ArrayData = {
    val n = elems.numElements()
    val h = new Array[Long](n)
    var i = 0
    while (i < n) { h(i) = hash64(elems.getUTF8String(i)); i += 1 }
    java.util.Arrays.sort(h)
    // dedup in place (collisions aside, inputs are usually distinct already)
    var w = 0
    i = 0
    while (i < n) {
      if (w == 0 || h(i) != h(w - 1)) { h(w) = h(i); w += 1 }
      i += 1
    }
    new GenericArrayData(if (w == n) h else java.util.Arrays.copyOf(h, w))
  }

  /** |A ∩ B| of two sorted long arrays by linear merge. */
  def intersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** As [[intersectCount]], against a plain sorted long[] (executor-
   *  side broadcast value). The row side is typically much smaller
   *  than the broadcast side, so each row binary-searches forward
   *  through b instead of merging past millions of elements. */
  def intersectCountArr(a: ArrayData, b: Array[Long]): Int = {
    val na = a.numElements()
    var i = 0; var lo = 0; var c = 0
    while (i < na && lo < b.length) {
      val x = a.getLong(i)
      var hi = b.length // first index in [lo, len) with b(idx) >= x
      var l = lo
      while (l < hi) {
        val mid = (l + hi) >>> 1
        if (b(mid) < x) l = mid + 1 else hi = mid
      }
      if (l < b.length && b(l) == x) { c += 1; lo = l + 1 } else lo = l
      i += 1
    }
    c
  }

  /** Positional equal-element count of two equal-length long arrays. */
  def matchCount(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0; var c = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  /**
   * Order-sensitive document fingerprint: two rolling polynomial
   * hashes over the Unicode code points (h1: *131 mod 1e9+7,
   * h2: *257 mod 998244353) packed as h1 * 2^31 + h2 (~2^60
   * collision space). All intermediate values stay far below 2^63,
   * so the SAME arithmetic runs exactly in DuckDB BIGINTs — making
   * the fingerprint oracle-checkable (unlike xxhash64).
   */
  def fingerprint64(s: UTF8String): Long = {
    val str = s.toString
    var h1 = 0L
    var h2 = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h1 = (h1 * 131 + cp) % 1000000007L
      h2 = (h2 * 257 + cp) % 998244353L
      i += Character.charCount(cp)
    }
    h1 * 2147483648L + h2
  }

  /** 64-bit SimHash over a string array (sign of per-bit weighted counts). */
  def simhash(elems: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = elems.numElements()
    var i = 0
    while (i < n) {
      val h = hash64(elems.getUTF8String(i))
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}

/** sorted_hashes(array<string>) -> sorted array<long> of distinct element hashes. */
case class SortedHashesExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sorted_hashes"

  override protected def nullSafeEval(elems: Any): Any =
    SigKernels.sortedHashes(elems.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, e =>
      s"${ev.value} = graft.functions.SigKernels.sortedHashes($e);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * intersect_count_bc(sortedA) -> int against a BROADCAST sorted long[]
 * — the benchmark/reference set stays out of the expression tree
 * (a typedLit literal would be re-serialized with every task binding
 * and walked by plan canonicalization/codegen; broadcasts ship once
 * per executor, like the partition-grid kernels).
 */
case class IntersectCountBcExpr(child: Expression,
                                bench: org.apache.spark.broadcast.Broadcast[Array[Long]])
  extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "intersect_count_bc"

  override protected def nullSafeEval(a: Any): Any =
    SigKernels.intersectCountArr(a.asInstanceOf[ArrayData], bench.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("bench", bench,
      classOf[org.apache.spark.broadcast.Broadcast[Array[Long]]].getName)
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.SigKernels.intersectCountArr($a, (long[])$b.value())")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** intersect_count(sortedA, sortedB) -> int via linear merge (no per-pair hash sets). */
case class IntersectCountExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SigKernels.intersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SigKernels.intersectCount($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** match_count(sigA, sigB) -> int: positional equality count (signature agreement). */
case class MatchCountExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "match_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SigKernels.matchCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SigKernels.matchCount($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** minhash_sig(array<string>, numPerms) -> array<long> (codegen static call). */
case class MinHashSigExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(elems: Any, numPerms: Any): Any =
    SigKernels.minhashSig(elems.asInstanceOf[ArrayData], numPerms.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (e, n) =>
      s"${ev.value} = graft.functions.SigKernels.minhashSig($e, $n);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** fingerprint64(string) -> long: portable rolling polynomial hash (codegen static call). */
case class Fingerprint64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint64"

  override protected def nullSafeEval(s: Any): Any =
    SigKernels.fingerprint64(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, e => s"graft.functions.SigKernels.fingerprint64($e)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** simhash(array<string>) -> long (codegen static call). */
case class SimHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override protected def nullSafeEval(elems: Any): Any =
    SigKernels.simhash(elems.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, e => s"graft.functions.SigKernels.simhash($e)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
