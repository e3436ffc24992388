package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Time-domain lightcurve analysis — the science the reference's
 * lightcurve stack exists to serve (astronomy-commons/lsd2 stores
 * per-object photometry series; `catalog.py`'s cross-match output
 * feeds period-search and variability pipelines downstream). Both
 * operators here are the canonical ones from that literature,
 * re-expressed as single-shuffle Spark aggregates:
 *
 *  - [[lombScargle]]: the Lomb–Scargle periodogram (Lomb 1976,
 *    Scargle 1982) — least-squares spectral power of an UNEVENLY
 *    sampled series at a grid of trial frequencies. The classic
 *    phase-invariant form with the tau offset; uses the algebraic
 *    identity Σcos²(ω(t−τ)) = (n + R)/2, Σsin² = (n − R)/2 with
 *    R = |Σe^{2iωt}| so ONE aggregate pass over the
 *    (row × frequency) expansion yields every power value — no
 *    second τ-shifted pass over the data.
 *  - [[structureFunction]]: the first-order variability structure
 *    function SF(Δt) = ⟨(y(t+Δt) − y(t))²⟩ (Simonetti et al. 1985,
 *    the AGN/quasar variability workhorse) over day-binned lags,
 *    bounded to `maxLagDays` so the per-key self-join never goes
 *    quadratic in the series length beyond the lag horizon.
 *
 * Scale shape: lombScargle is a map-only ×nFreq row expansion (no
 * shuffle to build it) into one combinable hash aggregate on
 * (key, frequency) — the per-key mean join broadcasts a tiny stats
 * table. structureFunction shuffles each side once on the key; pair
 * formation happens inside the co-located groups and the lag bound
 * caps the blowup. Neither touches the driver.
 */
object Lightcurve {

  /** Microseconds per day, as the double divisor both engines use. */
  private val UsPerDay = 86400000000.0

  /**
   * Lomb–Scargle periodogram power for every key at trial
   * frequencies f_k = k / `freqDenom` cycles/day, k = 1..`nFreq`.
   *
   * Returns (keyCol, fk, n, power): `fk` the frequency index k,
   * `n` the series length, `power` the normalized periodogram
   * P(ω) = [ (Σy'cos ω(t−τ))²/Σcos²ω(t−τ)
   *        + (Σy'sin ω(t−τ))²/Σsin²ω(t−τ) ] / 2σ²
   * with y' = y − ȳ, σ² the sample variance, and τ the Scargle
   * phase origin tan(2ωτ) = Σsin 2ωt / Σcos 2ωt that makes the
   * value invariant to a global time shift.
   *
   * `epochUs` anchors t = (unix_micros − epochUs)/86400e6 days;
   * pick an epoch near the data so ωt stays small and trig argument
   * reduction is exact replay territory for any libm. Keys with
   * fewer than `minPoints` observations are dropped (a 2-parameter
   * sinusoid fit on fewer points is noise, and σ² needs n ≥ 2).
   */
  def lombScargle(df: DataFrame, keyCol: String, timeCol: String, valueCol: String,
                  nFreq: Int = 20, freqDenom: Double = 10.0,
                  epochUs: Long = 1704067200000000L, // 2024-01-01T00:00:00Z
                  minPoints: Int = 8): DataFrame = {
    require(nFreq >= 1, s"lombScargle: nFreq must be >= 1, got $nFreq")
    require(minPoints >= 2, s"lombScargle: minPoints must be >= 2 (sample variance), got $minPoints")
    val base = df.select(col(keyCol).as("__k"),
      ((unix_micros(col(timeCol)) - epochUs).cast("double") / UsPerDay).as("__t"),
      col(valueCol).cast("double").as("__y"))
    // per-key mean as an explicit sum/count (identical arithmetic in
    // any replaying engine; avg() aggregation policies differ)
    val stats = base.groupBy("__k")
      .agg(sum("__y").as("__sy"), count(lit(1)).as("__n"))
    val ctr = base.join(broadcast(stats), "__k")
      .withColumn("__yc", col("__y") - col("__sy") / col("__n"))
    // ×nFreq expansion stays map-side: explode of a literal range
    val ex = ctr.withColumn("__fk", explode(sequence(lit(1L), lit(nFreq.toLong))))
      .withColumn("__w", lit(2.0 * math.Pi) * (col("__fk") / lit(freqDenom)))
    val wt = col("__w") * col("__t")
    val agg = ex.groupBy("__k", "__fk")
      .agg(count(lit(1)).as("n"),
        sum(col("__yc") * cos(wt)).as("c"),
        sum(col("__yc") * sin(wt)).as("s"),
        sum(cos(lit(2) * col("__w") * col("__t"))).as("c2"),
        sum(sin(lit(2) * col("__w") * col("__t"))).as("s2"),
        sum(col("__yc") * col("__yc")).as("ss"))
    val ta = atan2(col("s2"), col("c2")) / lit(2) // = ωτ
    val r = sqrt(col("c2") * col("c2") + col("s2") * col("s2"))
    val ct = col("c") * cos(ta) + col("s") * sin(ta)   // Σy'cos ω(t−τ)
    val st = col("s") * cos(ta) - col("c") * sin(ta)   // Σy'sin ω(t−τ)
    val power = (ct * ct / ((col("n") + r) / lit(2)) +
        st * st / ((col("n") - r) / lit(2))) /
      (lit(2) * (col("ss") / (col("n") - lit(1))))
    agg.filter(col("n") >= minPoints)
      .select(col("__k").as(keyCol), col("__fk").as("fk"), col("n"), power.as("power"))
  }

  /**
   * First-order structure function over day-binned lags: for every
   * key, SF(lag) = mean squared value difference across all
   * observation pairs whose time gap falls in [lag, lag+1) days,
   * lag = 0..maxLagDays−1. Returns (keyCol, lag_days, n_pairs,
   * sum_d2, sf): the raw pair count and squared-difference sum (the
   * MERGEABLE partials — two runs over disjoint epochs combine by
   * adding both) plus sf = sum_d2/n_pairs for convenience. Pairs are
   * ordered strictly (later minus earlier, equal timestamps
   * excluded) so the pair set is well-defined regardless of row
   * order.
   *
   * The lag bound is the scale contract: per key the join emits only
   * pairs within the horizon, so cost is O(series × density×maxLag),
   * not O(series²) — at 100 TB the horizon keeps the blowup constant
   * per row while the equi-join on the key stays a plain shuffle.
   */
  def structureFunction(df: DataFrame, keyCol: String, timeCol: String, valueCol: String,
                        maxLagDays: Int = 5): DataFrame = {
    require(maxLagDays >= 1, s"structureFunction: maxLagDays must be >= 1, got $maxLagDays")
    // an INTEGRAL value column keeps long arithmetic end to end:
    // sum_d2 is then an exact BIGINT sum (the q_structfunc oracle's
    // exactness contract) with overflow ERRORING under ANSI instead
    // of silently losing precision past 2^53 the way a double sum
    // does (ADVICE r10). Fractional inputs keep the double path.
    val integral = {
      import org.apache.spark.sql.types._
      Seq(ByteType, ShortType, IntegerType, LongType).contains(df.schema(valueCol).dataType)
    }
    val e = df.select(col(keyCol).as("__k"), unix_micros(col(timeCol)).as("__us"),
      col(valueCol).cast(if (integral) "long" else "double").as("__y"))
    val a = e.select(col("__k"), col("__us").as("__usa"), col("__y").as("__ya"))
    val b = e.select(col("__k"), col("__us").as("__usb"), col("__y").as("__yb"))
    val maxLagUs = maxLagDays * 86400000000L
    a.join(b, Seq("__k"))
      .filter(col("__usb") > col("__usa") && col("__usb") - col("__usa") < maxLagUs)
      .withColumn("__lag", expr(s"(__usb - __usa) div 86400000000"))
      .withColumn("__d2", (col("__yb") - col("__ya")) * (col("__yb") - col("__ya")))
      .groupBy(col("__k"), col("__lag"))
      .agg(count(lit(1)).as("n_pairs"), sum("__d2").as("sum_d2"))
      .select(col("__k").as(keyCol), col("__lag").as("lag_days"), col("n_pairs"),
        col("sum_d2"), (col("sum_d2") / col("n_pairs")).as("sf"))
  }
}
