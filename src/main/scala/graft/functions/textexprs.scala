package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Codegen'd text/vector kernels for the hot paths of the dedup and
 * similarity operators. Spark's higher-order functions (transform /
 * aggregate lambdas) run interpreted per element — profiled 5-10x
 * slower than these single-pass static kernels on sf0.1.
 */
object TextKernels {

  /**
   * Distinct word n-gram shingles of an (already normalized,
   * single-space separated) text. Shingles are substrings between
   * token boundaries — no per-shingle array slicing or joining.
   */
  def wordShingles(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    if (s.isEmpty) return new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
    // token start offsets
    var starts = new Array[Int](16)
    var nTok = 0
    var i = 0
    var atStart = true
    while (i < s.length) {
      if (atStart) {
        if (nTok == starts.length) starts = java.util.Arrays.copyOf(starts, nTok * 2)
        starts(nTok) = i
        nTok += 1
        atStart = false
      }
      if (s.charAt(i) == ' ') atStart = true
      i += 1
    }
    val nSh = math.max(1, nTok - n + 1)
    val seen = new java.util.LinkedHashSet[String](nSh * 2)
    var j = 0
    while (j < nSh) {
      val from = starts(j)
      val until =
        if (j + n - 1 < nTok - 1) starts(j + n) - 1 // up to char before the next token's leading space
        else s.length
      seen.add(s.substring(from, until))
      j += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  /**
   * Per-row repetition statistics of a token array in ONE pass:
   * [nTokens, nDistinctTokens, nBigrams, topBigramCount]. Token and
   * bigram identity is by 64-bit hash (sort + run-count — no boxing,
   * no per-row hash map); a collision merging two identities is
   * ~2^-64-scale, the same accepted risk as the shingle pipeline.
   */
  def repetitionStats(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    val h = new Array[Long](n)
    var i = 0
    while (i < n) { h(i) = SigKernels.hash64(tokens.getUTF8String(i)); i += 1 }
    val hs = h.clone()
    java.util.Arrays.sort(hs)
    var distinct = 0
    i = 0
    while (i < n) { if (i == 0 || hs(i) != hs(i - 1)) distinct += 1; i += 1 }
    val nb = math.max(0, n - 1)
    val bg = new Array[Long](nb)
    i = 0
    while (i < nb) {
      // order-sensitive combine + splitmix finisher (h(a)+h(b) swaps collide otherwise)
      var x = h(i) * 0x9e3779b97f4a7c15L + h(i + 1)
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      bg(i) = x ^ (x >>> 31)
      i += 1
    }
    java.util.Arrays.sort(bg)
    var top = 0
    var run = 0
    i = 0
    while (i < nb) {
      if (i == 0 || bg(i) != bg(i - 1)) run = 1 else run += 1
      if (run > top) top = run
      i += 1
    }
    new GenericArrayData(Array[Long](n, distinct, nb, top))
  }

  /**
   * Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken
   * 2003 — the MOSS algorithm) over an already-normalized,
   * single-space text: hash every k-token gram with the portable
   * mod-prime polynomial (the `h1` lane of [[SigKernels.fingerprint64]],
   * < 2^30 so `(pos << 32) | fp` packs into one long and DuckDB
   * BIGINT arithmetic replays it), then keep the RIGHTMOST MINIMUM
   * of every w-gram window, recording each pick once. The winnowing
   * guarantee: any copied span of >= w + k - 1 tokens shares at
   * least one fingerprint, at an expected density of ~2/(w+1) of
   * the gram hashes. Fewer than k tokens -> one whole-text gram.
   */
  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    val s = text.toString
    var starts = new Array[Int](16)
    var nTok = 0
    var i = 0
    var atStart = true
    while (i < s.length) {
      if (atStart) {
        if (nTok == starts.length) starts = java.util.Arrays.copyOf(starts, nTok * 2)
        starts(nTok) = i
        nTok += 1
        atStart = false
      }
      if (s.charAt(i) == ' ') atStart = true
      i += 1
    }
    val m = if (nTok >= k) nTok - k + 1 else 1
    val fps = new Array[Long](m)
    var j = 0
    while (j < m) {
      val from = if (nTok == 0) 0 else starts(j)
      val until =
        if (j + k - 1 < nTok - 1) starts(j + k) - 1 // char before the next token's leading space
        else s.length
      var h = 0L
      var p = from
      while (p < until) {
        val cp = s.codePointAt(p)
        h = (h * 131 + cp) % 1000000007L
        p += Character.charCount(cp)
      }
      fps(j) = h
      j += 1
    }
    val nWin = math.max(1, m - w + 1)
    val out = new Array[Long](nWin) // picks are monotone; <= one per window
    var nOut = 0
    var lastPos = -1
    j = 0
    while (j < nWin) {
      val end = math.min(j + w, m)
      var best = Long.MaxValue
      var bestPos = -1
      var t = j
      while (t < end) {
        if (fps(t) <= best) { best = fps(t); bestPos = t } // <=: rightmost wins ties
        t += 1
      }
      if (bestPos != lastPos) {
        out(nOut) = (bestPos.toLong << 32) | best
        nOut += 1
        lastPos = bestPos
      }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, nOut))
  }

  /** Dot product of two float vectors, double accumulation. */
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    dot
  }

  /** Cosine similarity of two float vectors, one pass, double accumulation. */
  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Jaro similarity, matching the DuckDB reference variant exactly
   *  (validated on 5500 cases): either side empty -> 0, equal -> 1,
   *  match window floor(max/2)-1 clamped at 0, transpositions
   *  halved by integer division. */
  def jaro(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    if (a == b) return 1.0
    val w = math.max(math.max(la, lb) / 2 - 1, 0)
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      var j = math.max(0, i - w)
      val hi = math.min(lb, i + w + 1)
      var done = false
      while (!done && j < hi) {
        if (!mb(j) && b.charAt(j) == a.charAt(i)) { ma(i) = true; mb(j) = true; m += 1; done = true }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val tr = t / 2
    (m.toDouble / la + m.toDouble / lb + (m - tr).toDouble / m) / 3.0
  }

  /** Jaro-Winkler: the Jaro score boosted by the common prefix
   *  (<= 4 chars, p = 0.1) only above the 0.7 threshold (strict >),
   *  matching DuckDB's jaro_winkler_similarity bit-for-bit on the
   *  validation sweep. */
  def jaroWinkler(ua: UTF8String, ub: UTF8String): Double = {
    val j = jaro(ua, ub)
    if (j <= 0.7) return j
    val a = ua.toString
    val b = ub.toString
    val n = math.min(4, math.min(a.length, b.length))
    var l = 0
    while (l < n && a.charAt(l) == b.charAt(l)) l += 1
    j + l * 0.1 * (1 - j)
  }

  /** Exact Levenshtein distance via the block-wise bit-parallel Myers
   *  algorithm (Myers 1999; Hyyrö's block formulation — the edlib
   *  kernel shape): O(n * ceil(m/64)) word operations instead of the
   *  banded DP's O(n * min(m, 2k+1)) cell operations, ~6x measured on
   *  the 80-char near-dup prefixes. Operates on BYTES, which equals
   *  Spark's codepoint semantics exactly when both inputs are pure
   *  ASCII — non-ASCII inputs fall back to UTF8String's banded DP
   *  (same result, the callers ASCII-project first so this is cold).
   *  Returns -1 when the distance exceeds maxDist (the Spark
   *  levenshtein(l, r, k) contract). Blocks chain only through the
   *  horizontal +-1 carry (hin/hout); the score is read at bit
   *  (m-1) % 64 of the last block BEFORE the shift, so no pattern
   *  padding is needed (high garbage bits never flow downward: the
   *  in-block addition and the shifts both propagate upward only). */
  def bitLevenshtein(ua: UTF8String, ub: UTF8String, maxDist: Int): Int = {
    val a = ua.getBytes
    val b = ub.getBytes
    var i = 0
    while (i < a.length) { if (a(i) < 0) return ua.levenshteinDistance(ub, maxDist); i += 1 }
    i = 0
    while (i < b.length) { if (b(i) < 0) return ua.levenshteinDistance(ub, maxDist); i += 1 }
    // pattern = the shorter side (fewer blocks per text column)
    val (p, t) = if (a.length <= b.length) (a, b) else (b, a)
    val m = p.length
    val n = t.length
    if (m == 0) return if (n <= maxDist) n else -1
    if (n - m > maxDist) return -1 // length gap lower-bounds the distance
    val w = (m + 63) >>> 6
    val peq = new Array[Long](128 * w)
    i = 0
    while (i < m) { peq((p(i) & 0x7f) * w + (i >>> 6)) |= 1L << (i & 63); i += 1 }
    val vp = new Array[Long](w)
    val vn = new Array[Long](w)
    java.util.Arrays.fill(vp, -1L)
    var score = m
    val lastBlock = w - 1
    val scoreBit = 1L << ((m - 1) & 63)
    var j = 0
    while (j < n) {
      val cBase = (t(j) & 0x7f) * w
      var hIn = 1 // the top boundary row contributes +1 into block 0
      var k = 0
      while (k <= lastBlock) {
        var eq = peq(cBase + k)
        val pv = vp(k)
        val mv = vn(k)
        val xv = eq | mv
        if (hIn < 0) eq |= 1L // incoming -1 behaves as a diagonal match
        val xh = (((eq & pv) + pv) ^ pv) | eq
        var ph = mv | ~(xh | pv)
        var mh = pv & xh
        if (k == lastBlock) {
          if ((ph & scoreBit) != 0L) score += 1
          else if ((mh & scoreBit) != 0L) score -= 1
        }
        val hOut = (if ((ph & Long.MinValue) != 0L) 1 else 0) -
          (if ((mh & Long.MinValue) != 0L) 1 else 0)
        ph <<= 1
        mh <<= 1
        if (hIn > 0) ph |= 1L
        else if (hIn < 0) mh |= 1L
        vp(k) = mh | ~(xv | ph)
        vn(k) = ph & xv
        hIn = hOut
        k += 1
      }
      j += 1
    }
    if (score <= maxDist) score else -1
  }

  /** NFC normalization with an ASCII bypass: ASCII is closed under
   *  NFC, so the (typical) all-ASCII document returns the original
   *  UTF8String without materializing a java.lang.String. */
  def nfcNormalize(text: UTF8String): UTF8String = {
    val bytes = text.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) { ascii = bytes(i) >= 0; i += 1 }
    if (ascii) text
    else {
      val s = text.toString
      if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
      else UTF8String.fromString(
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    }
  }
}

/** nfc_normalize(text) -> text in Unicode Normalization Form C.
 *  Spark has no built-in NFC; this stays inside whole-stage codegen
 *  via a static kernel call. A pure-ASCII fast path returns the input
 *  UTF8String untouched (no String round-trip) — the dominant case in
 *  web-scale corpora. */
case class NfcNormalizeExpr(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(text: Any): Any =
    TextKernels.nfcNormalize(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.TextKernels.nfcNormalize($t);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** bit_levenshtein(a, b, maxDist) -> int distance, -1 when over
 *  maxDist (the Spark levenshtein(l, r, k) contract) — block-wise
 *  bit-parallel Myers kernel, exact; ASCII fast path with a
 *  UTF8String banded-DP fallback for non-ASCII inputs. */
case class BitLevenshteinExpr(left: Expression, right: Expression, maxDist: Int)
  extends BinaryExpression {
  require(maxDist >= 0, s"bit_levenshtein: maxDist must be >= 0, got $maxDist")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bit_levenshtein"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.bitLevenshtein(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], maxDist)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.TextKernels.bitLevenshtein($a, $b, $maxDist);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** jaro_winkler(a, b) -> double in [0,1] (codegen static call) —
 *  entity-resolution scoring, DuckDB-variant-exact. */
case class JaroWinklerExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.TextKernels.jaroWinkler($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** shingles(normalizedText, n) -> array<string> (codegen static call). */
case class WordShinglesExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(text: Any, n: Any): Any =
    TextKernels.wordShingles(text.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"${ev.value} = graft.functions.TextKernels.wordShingles($t, $n);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** repetition_stats(array<string>) -> array<long> [nTokens, nDistinct, nBigrams, topBigramCount]. */
case class RepetitionStatsExpr(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "repetition_stats"

  override protected def nullSafeEval(tokens: Any): Any =
    TextKernels.repetitionStats(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.TextKernels.repetitionStats($t);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** winnow(normalizedText) -> array<long> of (pos << 32 | gramFp) picks
 *  (codegen static call; k and w are plan-time geometry, not children). */
case class WinnowExpr(child: Expression, k: Int, w: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow"

  override protected def nullSafeEval(text: Any): Any =
    TextKernels.winnow(text.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.TextKernels.winnow($t, $k, $w);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** dot(array<float>, array<float>) -> double (codegen static call). */
case class DotProductExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.dotF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.TextKernels.dotF($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine_sim(array<float>, array<float>) -> double (codegen static call). */
case class CosineSimExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.cosineF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.TextKernels.cosineF($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
