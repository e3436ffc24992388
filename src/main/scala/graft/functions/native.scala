package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}

/**
 * Column-API facade over the graft codegen kernels — one named
 * constructor per custom Catalyst expression (these also exist as
 * SQL functions via [[graft.plans.GraftExtensions]]).
 */
object native {
  private def c1(f: org.apache.spark.sql.catalyst.expressions.Expression => org.apache.spark.sql.catalyst.expressions.Expression)(a: Column): Column =
    GraftBridge.column(f(GraftBridge.expression(a)))
  private def c2(f: (org.apache.spark.sql.catalyst.expressions.Expression, org.apache.spark.sql.catalyst.expressions.Expression) => org.apache.spark.sql.catalyst.expressions.Expression)(a: Column, b: Column): Column =
    GraftBridge.column(f(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Distinct word n-grams of normalized text (WordShinglesExpr). */
  def wordShingles(normText: Column, n: Column): Column = c2(WordShinglesExpr.apply)(normText, n)
  /** Cosine similarity of float vectors (CosineSimExpr). */
  def cosineSim(a: Column, b: Column): Column = c2(CosineSimExpr.apply)(a.cast("array<float>"), b.cast("array<float>"))
  /** Dot product of float vectors (DotProductExpr). */
  def dot(a: Column, b: Column): Column = c2(DotProductExpr.apply)(a.cast("array<float>"), b.cast("array<float>"))
  /** MinHash signature of a shingle array (MinHashSigExpr). */
  def minhashSig(shingles: Column, numPerms: Column): Column = c2(MinHashSigExpr.apply)(shingles, numPerms)
  /** 64-bit SimHash of a token array (SimHashExpr). */
  def simhash(tokens: Column): Column = c1(SimHashExpr.apply)(tokens)
  /** Portable rolling polynomial fingerprint of a string (Fingerprint64Expr). */
  def fingerprint64(text: Column): Column = c1(Fingerprint64Expr.apply)(text)

  /** Unicode NFC normalization (NfcNormalizeExpr, ASCII bypass). */
  def nfcNormalize(text: Column): Column = c1(NfcNormalizeExpr.apply)(text)

  /** Integer exponential smoothing of an ordered series (EwmaExpr). */
  def ewma(series: Column, a100: Int): Column =
    c1(e => EwmaExpr(e, a100))(series)

  /** Jaro-Winkler similarity (JaroWinklerExpr, DuckDB-variant-exact). */
  def jaroWinkler(a: Column, b: Column): Column = c2(JaroWinklerExpr.apply)(a, b)
  /** Thresholded exact Levenshtein distance (BitLevenshteinExpr —
   *  bit-parallel Myers, -1 over maxDist; Spark-levenshtein-exact). */
  def bitLevenshtein(a: Column, b: Column, maxDist: Int): Column =
    GraftBridge.column(BitLevenshteinExpr(
      GraftBridge.expression(a), GraftBridge.expression(b), maxDist))
  /** Winnowing picks (pos << 32 | gramFp) of normalized text (WinnowExpr). */
  def winnow(normText: Column, k: Int, w: Int): Column =
    GraftBridge.column(WinnowExpr(GraftBridge.expression(normText), k, w))
  /** Sorted distinct element hashes (SortedHashesExpr). */
  def sortedHashes(elems: Column): Column = c1(SortedHashesExpr.apply)(elems)
  /** Linear-merge intersection count of sorted hash arrays (IntersectCountExpr). */
  def intersectCount(a: Column, b: Column): Column = c2(IntersectCountExpr.apply)(a, b)
  /** Intersection count against a broadcast sorted long[] (IntersectCountBcExpr). */
  def intersectCountBc(a: Column, bench: org.apache.spark.broadcast.Broadcast[Array[Long]]): Column =
    GraftBridge.column(IntersectCountBcExpr(GraftBridge.expression(a), bench))
  /** Positional signature agreement count (MatchCountExpr). */
  def matchCount(a: Column, b: Column): Column = c2(MatchCountExpr.apply)(a, b)
  /** One-pass repetition stats of a token array (RepetitionStatsExpr). */
  def repetitionStats(tokens: Column): Column = c1(RepetitionStatsExpr.apply)(tokens)
  /** Symmetric per-vector int8 quantization (Int8QuantizeExpr). */
  def int8Quantize(vec: Column): Column = c1(Int8QuantizeExpr.apply)(vec.cast("array<float>"))
  /** Dequantization scale max|v|/127 (Int8ScaleExpr). */
  def int8Scale(vec: Column): Column = c1(Int8ScaleExpr.apply)(vec.cast("array<float>"))
  /** Cosine of two quantized byte vectors (QuantCosExpr). */
  def quantCos(a: Column, b: Column): Column = c2(QuantCosExpr.apply)(a, b)
  /** Squared L2 distance of float vectors (L2SqExpr). */
  def l2Sq(a: Column, b: Column): Column = c2(L2SqExpr.apply)(a.cast("array<float>"), b.cast("array<float>"))
  /** Per-(subspace, codeword) squared L2 against an inlined PQ codebook (PqSubDistsExpr). */
  def pqSubDists(vec: Column, cb: Seq[Float], m: Int): Column =
    GraftBridge.column(PqSubDistsExpr(GraftBridge.expression(vec.cast("array<float>")), cb, m))
  /** Asymmetric PQ distance query-to-codes against an inlined codebook (PqAdcExpr). */
  def pqAdc(q: Column, codes: Column, cb: Seq[Float], m: Int): Column =
    GraftBridge.column(PqAdcExpr(GraftBridge.expression(q.cast("array<float>")),
      GraftBridge.expression(codes), cb, m))

  /** Packed (order << 48 | pix) partition assignment against a broadcast grid (PackedPartitionPixelExpr). */
  def packedPartitionPixel(ra: Column, dec: Column, orderK: Int,
                           grid: org.apache.spark.broadcast.Broadcast[PartitionGrid]): Column =
    GraftBridge.column(PackedPartitionPixelExpr(
      GraftBridge.expression(ra.cast("double")), GraftBridge.expression(dec.cast("double")), orderK, grid))

  /** Packed foreign partition pixels within a margin disc (MarginPixelsExpr);
   *  `exact` trims to the true boundary-distance band. */
  def marginPixels(ra: Column, dec: Column, orderK: Int, marginDeg: Double,
                   grid: org.apache.spark.broadcast.Broadcast[PartitionGrid],
                   exact: Boolean = false): Column =
    GraftBridge.column(MarginPixelsExpr(
      GraftBridge.expression(ra.cast("double")), GraftBridge.expression(dec.cast("double")), orderK, marginDeg, grid, exact))
}
