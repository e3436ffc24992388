package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{TextAnalysis, Validate}

/**
 * Streaming face of the release pipeline's STATELESS front half
 * (`pipeline_release`'s stages 2, 3 and the row-level slice of the
 * validation suite): language ID + quality + repetition signals, the
 * threshold cut, row-level data-quality predicates, and PII redaction
 * are all per-row expressions, so the exact batch operators apply to a
 * streaming DataFrame unchanged — no state, no watermark, no shuffle;
 * every arriving micro-batch is scored, gated and redacted map-only.
 *
 * The STATEFUL back half stays batch by design and is refused loudly
 * here: near-dup dedup, Unique/RefIntegrity checks, the k-anonymity
 * suppression gate and the leakage-safe split are whole-corpus
 * aggregates — on a stream they would need unbounded state and their
 * answers CHANGE as data arrives (a group that is k-anonymous today
 * was not yesterday), so the honest deployment is gate-on-stream,
 * anonymize-on-the-materialized-release. ScalaTest asserts
 * stream == batch on the same files and the loud refusals.
 */
object ReleaseGate {

  /** Stateless release gating: signal thresholds -> row-level check
   *  predicates (violating rows DROP — the gate face of
   *  [[Validate.validate]]'s counters) -> PII redaction of `textCol`.
   *  Only NotNull / InRange / Accepted / Matches are accepted;
   *  Unique / RefIntegrity are stateful and refused loudly. Keeps
   *  every input column and appends the signal + redaction columns. */
  def apply(docs: DataFrame, minQualityE4: Long, maxDupRatioE4: Long, lang: String,
            checks: Seq[Validate.Check] = Nil, textCol: String = "text"): DataFrame = {
    checks.foreach {
      case _: Validate.NotNull | _: Validate.InRange | _: Validate.Accepted |
           _: Validate.Matches =>
      case other => throw new IllegalArgumentException(
        s"ReleaseGate: '${other.name}' on '${other.column}' is a STATEFUL check " +
          "(whole-corpus aggregate) — run it in Validate.validate on the " +
          "materialized batch release, not on the stream")
    }
    val scored = TextAnalysis.withRepetitionStats(
      TextAnalysis.withQuality(TextAnalysis.withLangId(docs, textCol), textCol), textCol)
    val gated = checks.foldLeft(
      scored.filter(col("pred_lang") === lang &&
        col("quality_score_e4") >= minQualityE4 &&
        col("dup_token_ratio_e4") <= maxDupRatioE4)) {
      (cur, c) => cur.filter(!Validate.violation(c))
    }
    TextAnalysis.redactPii(gated, textCol)
  }

  /** The k-anonymity suppression gate is NOT streamable: group counts
   *  over the released corpus are unbounded state whose verdicts flip
   *  as data arrives (a suppressed group becomes releasable once its
   *  k-th member lands — emitted rows cannot be recalled). Refuses a
   *  streaming frame loudly; delegates batch frames to the same
   *  HAVING-gate shape `pipeline_release` uses. */
  def kAnonymityGate(released: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    require(!released.isStreaming,
      "ReleaseGate.kAnonymityGate: k-anonymity is a whole-corpus aggregate — " +
        "materialize the streamed release first (the gate-on-stream, " +
        "anonymize-on-release deployment), then run this on the batch frame")
    require(k >= 1 && qiCols.nonEmpty, s"need k >= 1 and QI columns (got k=$k, $qiCols)")
    val ok = released.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("__qn")).filter(col("__qn") >= k)
      .select(qiCols.map(col): _*)
    released.join(broadcast(ok), qiCols)
  }
}
