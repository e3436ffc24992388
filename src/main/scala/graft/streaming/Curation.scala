package graft.streaming

import org.apache.spark.sql.DataFrame

/**
 * Streaming face of the curation signal stages: language ID, quality
 * score, and repetition stats are all per-row EXPRESSIONS, so the
 * exact batch operator ([[graft.operators.TextAnalysis.signalFilter]],
 * the signal stage of `pipeline_c4`) applies to a streaming DataFrame
 * unchanged — no state, no watermark, no shuffle; every micro-batch
 * is scored and thresholded map-only as it lands. This is the
 * continuous-ingest front half of the curation pipeline; the stateful
 * back half — dedup against history — is the incremental-dedup
 * streaming face exercised in `StreamingSpec`.
 *
 * ScalaTest asserts stream output == the batch operator on the same
 * files.
 */
object Curation {

  /** Alias of the batch operator, callable on a streaming frame. */
  def signalFilter(docs: DataFrame, minQualityE4: Long, maxDupRatioE4: Long,
                   lang: String): DataFrame =
    graft.operators.TextAnalysis.signalFilter(docs, minQualityE4, maxDupRatioE4, lang)

  /** Streaming centroid-classifier scoring: the inline (shuffle-free)
   *  scorer is a stateless projection over a frozen
   *  [[graft.operators.Classify.CentroidWeights]] literal, so it
   *  applies to a streaming frame unchanged — train offline on the
   *  curated batch corpus, score every arriving micro-batch map-only
   *  (the quality-classifier deployment shape: model updates are a
   *  redeploy, never stream state). */
  def classifyStream(docs: DataFrame, idCol: String, textCol: String,
                     cw: graft.operators.Classify.CentroidWeights): DataFrame =
    graft.operators.Classify.scoreCentroidInline(docs, idCol, textCol, cw)
}
