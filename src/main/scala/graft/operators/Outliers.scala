package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Robust per-group outlier detection — the data-quality monitor for
 * event/metric streams at scale (wild values from broken emitters,
 * unit mix-ups, fat fingers). Uses the modified z-score of Iglewicz &
 * Hoaglin 1993, `z = 0.6745 * (x - median) / MAD`, which tolerates up
 * to 50% contamination — mean/stddev z-scores mask exactly the
 * outliers they're meant to find (the outliers inflate the stddev).
 *
 * Determinism contract: the caller supplies an already-integer value
 * column (scale floats to fixed-point first, the [[Sketch.histBins]]
 * convention). Internally every quantity stays integral — values are
 * doubled so exact-percentile midpoints are whole numbers, and the
 * flag/score use cross-multiplied integer comparisons
 * (`13490 * d > T_e4 * mad4`) instead of IEEE division, so Spark and
 * the DuckDB oracle agree bit for bit.
 *
 * Scale shape: two exact-percentile aggregations over (group, value)
 * — map-side partial, output bounded by group count — then the tiny
 * stats table broadcasts back onto the corpus for a MAP-ONLY scoring
 * pass. Nothing corpus-sized shuffles. (Unbounded group cardinality
 * would make `percentile`'s per-group state the concern — for that
 * regime use [[Sketch.histSketch]] quantiles as the median/MAD
 * source instead.)
 */
object Outliers {

  /** Per-group robust location/scale: (grp, n, med2, mad4) in scaled
   *  integer units — med2 = median of DOUBLED values (midpoints of
   *  even integers are whole, so the exact percentile is integral)
   *  and mad4 = median of the doubled absolute deviations
   *  |2v - med2| * 2 = 4 x the MAD of the original values, integral
   *  by the same doubling argument. Every quantity stays a whole
   *  number; nothing is truncated. */
  def robustStats(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    Sampling.requireIntegralId(df, valueCol, "robustStats")
    val meds = df
      .select(col(groupCol).as("grp"), (col(valueCol) * 2L).as("u"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"), round(expr("percentile(u, 0.5)")).cast("long").as("med2"))
    df.select(col(groupCol).as("grp"), (col(valueCol) * 2L).as("u"))
      .join(broadcast(meds), "grp")
      .select(col("grp"), col("n"), col("med2"), (abs(col("u") - col("med2")) * 2L).as("d2"))
      .groupBy("grp", "n", "med2")
      .agg(round(expr("percentile(d2, 0.5)")).cast("long").as("mad4"))
  }

  /**
   * Outlier rows: |modified z| > threshold, decided in integers.
   * With d = |2v - med2| (so |v - median| = d/2 and MAD = mad4/4),
   * z = 0.6745 * (d/2) / (mad4/4) = 1.349 * d / mad4, and z > T
   * cross-multiplies to `13490 * d > zThresholdE4 * mad4` — no IEEE
   * division in the decision. Emits (grp, id, val, z_e4) with
   * z_e4 = `(13490 * d) div mad4`. Groups with MAD = 0 (a majority
   * of identical values) emit no rows — scale degenerates there, and
   * flagging "everything not equal to the mode" is a different
   * operator; callers can read mad4 = 0 off [[robustStats]].
   * Assumes |scaled values| < 2^45 so `d * 13490` cannot overflow.
   */
  def robustOutliers(df: DataFrame, groupCol: String, idCol: String, valueCol: String,
                     zThresholdE4: Long = 35000L): DataFrame = {
    // batch == the streaming face scoring against self-derived stats,
    // BY CONSTRUCTION — one scoring pipeline, not two hand-synced copies.
    // The three passes (median, MAD, scoring) would each re-decode the
    // source; pin the slim (grp, id, val) projection once so they read
    // the checkpointed three-column frame instead (the broadcast
    // decisions downstream are explicit hints, so the lost planner
    // stats are irrelevant — the gcPersist contract).
    val slim = CacheUtil.gcPersist(
      df.select(col(groupCol), col(idCol), col(valueCol)))
    scoreStream(slim, robustStats(slim, groupCol, valueCol), groupCol, idCol, valueCol, zThresholdE4)
  }

  /**
   * Streaming face: score an event STREAM against robust stats
   * computed once from history ([[robustStats]] on a static frame) —
   * a stream-static broadcast join plus the same integer decision,
   * so the scoring pass stays stateless and map-only per micro-batch
   * (no watermark, no state store; the stats table is the only
   * "model" and it ships once per executor). The batch/stream parity
   * is exact by construction: identical expressions over identical
   * stats (asserted in StreamingSpec).
   */
  def scoreStream(stream: DataFrame, stats: DataFrame,
                  groupCol: String, idCol: String, valueCol: String,
                  zThresholdE4: Long = 35000L): DataFrame = {
    require(zThresholdE4 > 0, s"zThresholdE4 must be positive (got $zThresholdE4)")
    stream.select(col(groupCol).as("grp"), col(idCol), col(valueCol).as("val"))
      .join(broadcast(stats), "grp")
      .withColumn("__d", abs(col("val") * 2L - col("med2")))
      .filter(col("mad4") > 0 && col("__d") * 13490L > lit(zThresholdE4) * col("mad4"))
      .withColumn("z_e4", expr("(__d * 13490) div mad4"))
      .select(col("grp"), col(idCol), col("val"), col("z_e4"))
  }

  /**
   * Per-group winsorization (percentile clipping — the feature-
   * cleaning sibling of [[robustOutliers]]: instead of FLAGGING tail
   * values, clamp them to the [pLo, pHi] exact percentiles so
   * downstream aggregates/models see a bounded range). Same
   * determinism contract: integer value column in, thresholds
   * rounded to whole integers (dyadic midpoints — engine-policy-
   * free), clipped values stay integral. Same scale shape: one
   * bounded percentile aggregate, stats broadcast back, MAP-ONLY
   * clipping pass. Output: input columns + `lo`, `hi`, `clipped`.
   */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
                pLo: Double, pHi: Double): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi,
      s"winsorize: need 0 <= pLo < pHi <= 1, got ($pLo, $pHi)")
    Sampling.requireIntegralId(df, valueCol, "winsorize")
    val stats = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("__g"))
      .agg(round(expr(s"percentile($valueCol, $pLo)")).cast("long").as("lo"),
        round(expr(s"percentile($valueCol, $pHi)")).cast("long").as("hi"))
    df.join(broadcast(stats), col(groupCol) === col("__g"), "left")
      .drop("__g")
      .withColumn("clipped",
        when(col(valueCol).isNull, lit(null).cast("long"))
          .otherwise(greatest(col("lo"), least(col("hi"), col(valueCol).cast("long")))))
  }

  /** DuckDB twin of [[robustOutliers]] — quantile_cont matches
   *  Spark's exact `percentile` interpolation, and the scaled-unit
   *  integer arithmetic carries over verbatim. */
  def robustOutliersSql(table: String, groupCol: String, idCol: String, valueExpr: String,
                        zThresholdE4: Long = 35000L): String = {
    s"""WITH v AS (
      SELECT $groupCol AS grp, $idCol, CAST($valueExpr AS BIGINT) AS val,
        CAST($valueExpr AS BIGINT) * 2 AS u FROM $table),
    meds AS (
      SELECT grp, count(*) AS n, CAST(round(quantile_cont(u, 0.5)) AS BIGINT) AS med2
      FROM v GROUP BY grp),
    mads AS (
      SELECT v.grp, CAST(round(quantile_cont(abs(v.u - m.med2) * 2, 0.5)) AS BIGINT) AS mad4
      FROM v JOIN meds m USING (grp) GROUP BY v.grp)
    SELECT v.grp, v.$idCol, v.val, (abs(v.u - m.med2) * 13490) // d.mad4 AS z_e4
    FROM v JOIN meds m USING (grp) JOIN mads d USING (grp)
    WHERE d.mad4 > 0 AND abs(v.u - m.med2) * 13490 > $zThresholdE4 * d.mad4"""
  }
}
