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
    val wq = Window.partitionBy(col(queryId)).orderBy(round(col("qcos"), 9).desc, col(corpusId).asc)
    val cand = scored.withColumn("qrn", row_number().over(wq))
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
}
