package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Embedding quantization for ANN at corpus scale: int8 vectors are 4x
 * smaller than float32, so the candidate-generation scan reads a
 * quarter of the bytes and the scoring loop runs on integers. The
 * standard two-stage search — score everything quantized, exact-rerank
 * only the short candidate list — keeps full-precision work bounded by
 * k * refineFactor per query instead of corpus size.
 */
object Quantize {

  /** Adds `qvecCol` (array<tinyint>, symmetric per-vector int8) and
   *  `scaleCol` (the dequantization scale max|v|/127). Map-only. */
  def withQuantized(df: DataFrame, vecCol: String,
                    qvecCol: String = "qvec", scaleCol: String = "qscale"): DataFrame =
    df.withColumn(qvecCol, graft.functions.native.int8Quantize(col(vecCol)))
      .withColumn(scaleCol, graft.functions.native.int8Scale(col(vecCol)))

  /**
   * Two-stage quantized ANN: rank the corpus by quantized cosine
   * (integer dot — the per-vector scales cancel, so no dequantization
   * happens at all), keep the top k * refineFactor candidates per
   * query, exact-rerank those by float cosine. Queries are broadcast;
   * the corpus is scanned once and never shuffled — the only Exchange
   * is the ranking window's, carrying (q_id, corpus_id, scores).
   */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame,
                    corpusId: String, corpusVec: String,
                    queryId: String, queryVec: String,
                    k: Int, refineFactor: Int = 4): DataFrame = {
    require(k >= 1 && refineFactor >= 1, s"k and refineFactor must be >= 1: $k, $refineFactor")
    val qc = corpus.select(col(corpusId), graft.functions.native.int8Quantize(col(corpusVec)).as("__cq"))
    val qq = queries.select(col(queryId), graft.functions.native.int8Quantize(col(queryVec)).as("__qq"))
    // the ranking shuffle carries ONLY (query id, corpus id, score) —
    // neither the float vectors nor the byte vectors ride the window
    // Exchange (the quantized scan is a map-only pass over the corpus)
    val scored = qc.crossJoin(broadcast(qq))
      .withColumn("qcos", graft.functions.native.quantCos(col("__cq"), col("__qq")))
      .select(col(queryId), col(corpusId), col("qcos"))
    // per-partition bounded-heap combiner before the candidate window:
    // without it the window sorts |corpus| rows on one task per query
    // (the combiner is lossless — same (round, 9) desc + id ordering)
    val preQ = TopK.maybePartitionTopK(scored, queryId, corpusId, "qcos",
      k * refineFactor, ascending = false)
    val wq = Window.partitionBy(col(queryId)).orderBy(round(col("qcos"), 9).desc, col(corpusId).asc)
    val cand = preQ.withColumn("qrn", row_number().over(wq))
      .filter(col("qrn") <= k * refineFactor)
      .select(col(queryId), col(corpusId))
    // exact rerank touches full-precision vectors only for the bounded
    // candidate set (nQueries * k * refineFactor rows): broadcast the
    // candidate ids against one more corpus scan, never a corpus shuffle
    val withVecs = corpus.select(col(corpusId), col(corpusVec))
      .join(broadcast(cand), corpusId)
      .join(broadcast(queries.select(col(queryId), col(queryVec))), queryId)
      .withColumn("cos", Dedup.cosine(col(corpusVec), col(queryVec)))
    val w = Window.partitionBy(col(queryId)).orderBy(round(col("cos"), 9).desc, col(corpusId).asc)
    withVecs.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col(queryId), col(corpusId), col("cos"), col("rn"))
  }

  // ------------------------------------------------------------ product quantization

  /** The [m][ksub][dsub] codebook flattened to the [ksub][dim]
   *  row-major sample matrix the native kernels index. */
  private def flatCodebook(codebook: Seq[Seq[Seq[Float]]]): Seq[Float] = {
    val m = codebook.length
    val ksub = codebook.head.length
    val dsub = codebook.head.head.length
    val dim = m * dsub
    val flat = new Array[Float](ksub * dim)
    for (s <- 0 until m; j <- 0 until ksub; i <- 0 until dsub)
      flat(j * dim + s * dsub + i) = codebook(s)(j)(i)
    flat.toSeq
  }

  /**
   * Sampled product-quantization codebook: `ksub` corpus vectors are
   * drawn by the same deterministic Knuth-hash sample the IVF/k-means
   * paths use, and each is sliced into `m` subvectors — codeword j of
   * subspace s is sample j's s-th slice. Returns [m][ksub][dim/m].
   * Driver-side state is m * ksub * dim/m = ksub * dim floats — tiny
   * and independent of corpus size. At 100 TB you'd refine these with
   * [[Ann.kmeansCodebook]] per subspace on a sample; the encode/ADC
   * machinery below is identical either way.
   */
  def pqCodebook(corpus: DataFrame, corpusId: String, corpusVec: String,
                 m: Int = 4, ksub: Int = 16): Seq[Seq[Seq[Float]]] = {
    require(m >= 1 && ksub >= 2, s"need m >= 1, ksub >= 2 (got $m, $ksub)")
    Sampling.requireIntegralId(corpus, corpusId, "pq codebook sample")
    val rows = corpus
      .withColumn("__h", Sampling.knuthHash(col(corpusId)))
      .orderBy(col("__h"), col(corpusId)).limit(ksub)
      .select(col(corpusVec)).collect().map(_.getSeq[Float](0))
    require(rows.nonEmpty, "pqCodebook: empty corpus")
    val dim = rows.head.length
    require(dim % m == 0, s"pqCodebook: dim $dim not divisible by m $m")
    val dsub = dim / m
    Seq.tabulate(m)(s => rows.map(v => v.slice(s * dsub, (s + 1) * dsub).toSeq).toSeq)
  }

  /**
   * MAP-ONLY PQ encode: per subspace, nearest codeword by squared L2
   * (round-9 tie-broken on the lower codeword id — the argmin is the
   * same sorted-struct trick as IVF assignment, no shuffle, codebook
   * inlined). Adds `codesCol` as array<int> of length m. The encoded
   * corpus stores m bytes-worth of codes per vector instead of
   * 4*dim bytes of float32 — at dim=64, m=4 that is a 64x smaller
   * scan for candidate generation.
   */
  def pqEncode(df: DataFrame, vecCol: String, codebook: Seq[Seq[Seq[Float]]],
               codesCol: String = "pq_codes"): DataFrame = {
    val m = codebook.length
    val ksub = codebook.head.length
    // distances come from ONE native kernel call per row (codegen'd,
    // the hot loop of the whole encode); only the m argmins over the
    // returned m*ksub array stay in Column land, so the round-9 +
    // lower-j tie-break is the same expression the oracle replays
    val withD = df.withColumn("__pqd",
      graft.functions.native.pqSubDists(col(vecCol), flatCodebook(codebook), m))
    val codes = array(codebook.indices.map { s =>
      val sorted = array_sort(transform(sequence(lit(0), lit(ksub - 1)),
        j => struct(round(element_at(col("__pqd"), j + s * ksub + 1), 9).as("d"), j.as("j"))))
      element_at(sorted, 1).getField("j")
    }: _*)
    withD.withColumn(codesCol, codes).drop("__pqd")
  }

  /**
   * PQ ANN with asymmetric distance computation (ADC): the corpus is
   * scanned as codes only (never the float vectors), each query
   * scores a row as the sum over subspaces of squared L2 between the
   * query's EXACT subvector and the row's reconstructed codeword —
   * the classic Jegou et al. 2011 search shape. Top k*refineFactor
   * candidates per query by ADC are exact-reranked by full squared
   * L2. Queries and candidate ids broadcast; the corpus never
   * shuffles — the only Exchange carries (q_id, corpus_id, adc).
   * Output: (queryId, corpusId, l2, rn), l2 = exact squared distance.
   */
  def pqTopK(corpus: DataFrame, queries: DataFrame,
             corpusId: String, corpusVec: String,
             queryId: String, queryVec: String,
             k: Int, m: Int = 4, ksub: Int = 16, refineFactor: Int = 4): DataFrame = {
    require(k >= 1 && refineFactor >= 1, s"k and refineFactor must be >= 1: $k, $refineFactor")
    val cb = pqCodebook(corpus, corpusId, corpusVec, m, ksub)
    val enc = pqEncode(corpus.select(col(corpusId), col(corpusVec)), corpusVec, cb)
      .select(col(corpusId), col("pq_codes"))
    // ADC is one native kernel call per (row, query) — subspace
    // distances accumulate in fixed s = 0..m-1 order inside the
    // kernel (reproducible double sums, same fold as the oracle)
    val scored = enc.crossJoin(broadcast(queries.select(col(queryId), col(queryVec))))
      .withColumn("adc",
        graft.functions.native.pqAdc(col(queryVec), col("pq_codes"), flatCodebook(cb), cb.length))
      .select(col(queryId), col(corpusId), col("adc"))
    // same bounded-heap combiner as quantizedTopK's candidate stage
    // (ascending: ADC is a distance)
    val preQ = TopK.maybePartitionTopK(scored, queryId, corpusId, "adc",
      k * refineFactor, ascending = true)
    val wq = Window.partitionBy(col(queryId)).orderBy(round(col("adc"), 9).asc, col(corpusId).asc)
    val cand = preQ.withColumn("qrn", row_number().over(wq))
      .filter(col("qrn") <= k * refineFactor)
      .select(col(queryId), col(corpusId))
    val withVecs = corpus.select(col(corpusId), col(corpusVec))
      .join(broadcast(cand), corpusId)
      .join(broadcast(queries.select(col(queryId), col(queryVec))), queryId)
      .withColumn("l2", graft.functions.native.l2Sq(col(corpusVec), col(queryVec)))
    val w = Window.partitionBy(col(queryId)).orderBy(round(col("l2"), 9).asc, col(corpusId).asc)
    withVecs.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col(queryId), col(corpusId), col("l2"), col("rn"))
  }

  /**
   * Composed IVF+PQ ANN — the standard billion-scale recipe (Jegou et
   * al. 2011 IVFADC): IVF cell pruning bounds WHICH rows each query
   * scores, PQ codes bound WHAT the scoring scan reads, and an exact
   * rerank of the k·refineFactor survivors restores full precision.
   * Both halves are this library's existing machinery composed:
   * [[Ann.ivfAssignWith]] (map-only nearest-centroid cell id) +
   * [[pqEncode]] (map-only m-code encode) run in ONE corpus pass;
   * queries probe their `nprobe` nearest cells ([[Ann
   * .nearestCellStructs]], map-only + broadcast); ADC scores only the
   * probed cells' code rows via the same native kernel as [[pqTopK]].
   *
   * Scale shape: the corpus never shuffles — cell assignment and
   * encode are map-only, candidate generation is a broadcast hash
   * join on the cell id, and the only Exchange carries
   * (queryId, corpusId, adc) into the bounded top-k window. Per
   * query the ADC scan touches ~nprobe/nCells of the corpus and
   * reads m codes per row instead of 4·dim vector bytes — the two
   * multiplicative savings that make the composition the
   * billion-scale default. Output: (queryId, corpusId, l2, rn) with
   * l2 the exact squared distance of the reranked survivors.
   */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame,
                corpusId: String, corpusVec: String,
                queryId: String, queryVec: String,
                k: Int, nCells: Int = 16, nprobe: Int = 4,
                m: Int = 4, ksub: Int = 16, refineFactor: Int = 4): DataFrame = {
    require(k >= 1 && refineFactor >= 1, s"k and refineFactor must be >= 1: $k, $refineFactor")
    require(nprobe >= 1 && nprobe <= nCells, s"need 1 <= nprobe <= nCells: $nprobe, $nCells")
    val cells = Ann.collectCodebook(corpus, corpusId, corpusVec, nCells)
    val cb = pqCodebook(corpus, corpusId, corpusVec, m, ksub)
    // ONE corpus pass: cell id + PQ codes, both map-only
    val enc = pqEncode(Ann.ivfAssignWith(corpus, corpusVec, cells)
        .select(col(corpusId), col("__cid"), col(corpusVec)), corpusVec, cb)
      .select(col(corpusId), col("__cid"), col("pq_codes"))
    val probed = queries
      .withColumn("__cell",
        explode(slice(Ann.nearestCellStructs(col(queryVec), cells), 1, nprobe)))
      .select(col("__cell.cid").as("__cid"), col(queryId), col(queryVec))
    // a corpus row lives in exactly one cell and a query probes
    // distinct cells, so each (query, row) pair scores at most once
    val scored = enc.join(broadcast(probed), "__cid")
      .withColumn("adc",
        graft.functions.native.pqAdc(col(queryVec), col("pq_codes"), flatCodebook(cb), m))
      .select(col(queryId), col(corpusId), col("adc"))
    val preQ = TopK.maybePartitionTopK(scored, queryId, corpusId, "adc",
      k * refineFactor, ascending = true)
    val wq = Window.partitionBy(col(queryId)).orderBy(round(col("adc"), 9).asc, col(corpusId).asc)
    val cand = preQ.withColumn("qrn", row_number().over(wq))
      .filter(col("qrn") <= k * refineFactor)
      .select(col(queryId), col(corpusId))
    val withVecs = corpus.select(col(corpusId), col(corpusVec))
      .join(broadcast(cand), corpusId)
      .join(broadcast(queries.select(col(queryId), col(queryVec))), queryId)
      .withColumn("l2", graft.functions.native.l2Sq(col(corpusVec), col(queryVec)))
    val w = Window.partitionBy(col(queryId)).orderBy(round(col("l2"), 9).asc, col(corpusId).asc)
    withVecs.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col(queryId), col(corpusId), col("l2"), col("rn"))
  }
}
