package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{ByteType, DecimalType, IntegerType, LongType, ShortType}

/**
 * Grouped exact statistics beyond the sketch/percentile families —
 * closed-form model fits whose moment sums stay INTEGER-exact, so a
 * SQL oracle replays them bit-for-bit (a float implementation of the
 * same math could never hash-match across engines).
 */
object Stats {

  /**
   * Per-group ordinary-least-squares trend slope (metric drift
   * detection: is this series rising or falling, and how fast) in
   * EXACT decimal arithmetic. With integer inputs x (e.g. epoch
   * seconds, offset to a fixed origin) and y (e.g. cents):
   *
   *   slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)
   *
   * All five moments (n, Sx, Sy, Sxy, Sxx) accumulate as
   * DECIMAL(38,0) — order-independent integer sums — and the slope is
   * emitted as `slope_e9` (truncated toward zero after scaling by
   * 1e9) with the SIGN factored out of the division, so truncating
   * and flooring integer division agree on any engine. Groups with
   * zero x-variance yield null.
   *
   * Scale shape: ONE map-side-combined aggregate over the corpus —
   * the whole fit is five mergeable sums per group; nothing else
   * moves. Caller keeps |x| small (offset to the window of interest):
   * exactness needs n * Sxx * 1e9 within 38 digits.
   */
  def groupedTrend(df: DataFrame, keyCols: Seq[String], xCol: String, yCol: String): DataFrame = {
    require(keyCols.nonEmpty, "groupedTrend: at least one key column")
    val dec = DecimalType(38, 0)
    df.groupBy(keyCols.map(col): _*)
      .agg(count(col(yCol)).as("n"),
        sum(when(col(yCol).isNotNull, col(xCol)).cast(dec)).as("sx"),
        sum(col(yCol).cast(dec)).as("sy"),
        sum((col(xCol).cast(dec) * col(yCol).cast(dec))).as("sxy"),
        sum(when(col(yCol).isNotNull, col(xCol).cast(dec) * col(xCol).cast(dec))).as("sxx"))
      .withColumn("__num", col("n").cast(dec) * col("sxy") - col("sx") * col("sy"))
      .withColumn("__den", col("n").cast(dec) * col("sxx") - col("sx") * col("sx"))
      .withColumn("slope_e9",
        when(col("__den") === 0 || col("__den").isNull, lit(null).cast("long"))
          .otherwise(when(col("__num") < 0,
            -expr("((-__num) * 1000000000) div __den"))
            .otherwise(expr("(__num * 1000000000) div __den"))))
      .select((keyCols.map(col) :+ col("n") :+ col("slope_e9")): _*)
  }

  /**
   * Per-group Theil-Sen robust trend slope (Theil 1950; Sen 1968):
   * the MEDIAN of all pairwise slopes (y_j - y_i)/(x_j - x_i) over
   * x_i < x_j. Up to ~29% outliers cannot move it, where a single
   * wild point drags the OLS fit ([[groupedTrend]]) arbitrarily far
   * — the robust twin every metric-drift monitor wants next to the
   * parametric one. Exact integer arithmetic end to end: integral
   * x/y enforced, each pairwise slope e9-scaled and truncated
   * toward zero with the sign factored out of the division (so
   * floor-div and truncate-div engines agree), and the reported
   * slope is the exact LOWER median — rank (m+1) div 2 of the m
   * ascending slope values, an order statistic over BIGINTs with no
   * interpolation, bit-identical on any engine. |dy| * 1e9 must fit
   * a signed 64-bit value (|dy| < 9.2e9 — document the unit scale
   * at the call site).
   *
   * Scale shape: pairs come from an equi-join on the group key, so
   * the cost is Σ_g C(n_g, 2) — the caller aggregates to a bounded
   * grain FIRST (e.g. one point per day: n_g <= calendar span
   * regardless of raw volume; q_theilsen does exactly that). The
   * median is a per-group window over those bounded pairs — never a
   * global sort. Equal-x pairs are excluded (standard Theil-Sen);
   * groups with fewer than 2 distinct x values emit nothing.
   */
  def theilSen(df: DataFrame, keyCols: Seq[String], xCol: String, yCol: String): DataFrame = {
    require(keyCols.nonEmpty, "theilSen: at least one key column")
    Seq(xCol, yCol).foreach { c =>
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(df.schema(c).dataType),
        s"theilSen: $c must be integral for exact slopes, got ${df.schema(c).dataType}")
    }
    val base = df
      .select((keyCols.map(col) :+ col(xCol).cast("long").as("__x") :+ col(yCol).cast("long").as("__y")): _*)
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    val l = base.select((keyCols.map(col) :+ col("__x").as("__x1") :+ col("__y").as("__y1")): _*)
    val r = base.select((keyCols.map(col) :+ col("__x").as("__x2") :+ col("__y").as("__y2")): _*)
    val pairs = l.join(r, keyCols)
      .filter(col("__x1") < col("__x2"))
      .withColumn("__dy", col("__y2") - col("__y1"))
      .withColumn("__dx", col("__x2") - col("__x1"))
      .withColumn("__slope_e9",
        when(col("__dy") < 0, -expr("((-__dy) * 1000000000) div __dx"))
          .otherwise(expr("(__dy * 1000000000) div __dx")))
    val byKey = Window.partitionBy(keyCols.map(col): _*)
    pairs
      .withColumn("__rn", row_number().over(byKey.orderBy(col("__slope_e9").asc)))
      .withColumn("__m", count(lit(1)).over(byKey))
      .filter(col("__rn") === expr("(__m + 1) div 2"))
      .select((keyCols.map(col) :+ col("__m").as("n_pairs") :+ col("__slope_e9").as("ts_slope_e9")): _*)
  }

  /**
   * CUPED variance-reduced A/B comparison (Deng et al. 2013): the
   * experiment-analysis workhorse — each unit's post-period metric is
   * adjusted by its own pre-period covariate, shrinking variance
   * without biasing the effect (theta is pooled across variants).
   * EXACT fixed-point arithmetic end to end: one map-side-combined
   * aggregate collects {n, Sx, Sy, Sxy, Sxx} globally and per
   * variant; theta_e6 = trunc(1e6 * (n*Sxy - Sx*Sy) / (n*Sxx -
   * Sx^2)) and the adjusted mean adj_e6 = trunc((Syv*n*1e6 -
   * theta_e6*(Sxv*n - Sx*nv)) / (nv*n)) both run in DECIMAL(38)
   * (products overflow int64 at ~30k units) with the sign-safe
   * negate-div-negate pattern ([[theilSen]]'s trick) so Spark `div`
   * and DuckDB `//` agree on negative numerators. theta is null
   * when the pre-period has zero variance.
   *
   * Input: one row per unit with an integer 0/1 variant and integral
   * pre/post metrics (cents). Output: one row per variant with the
   * integer sums, the pooled theta_e6, and raw/adjusted e6-scaled
   * means. Scale shape: ONE aggregate over units + a 2-row join —
   * nothing unit-cardinality-sized leaves the executors.
   */
  def cuped(units: DataFrame, variantCol: String, preCol: String, postCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val g = units.agg(
      count(lit(1)).as("n"),
      sum(col(preCol)).as("sx"), sum(col(postCol)).as("sy"),
      sum(col(preCol).cast(dec) * col(postCol).cast(dec)).as("sxy"),
      sum(col(preCol).cast(dec) * col(preCol).cast(dec)).as("sxx"))
    val v = units.groupBy(col(variantCol).as("variant"))
      .agg(count(lit(1)).as("n_units"),
        sum(col(preCol)).as("sum_pre"), sum(col(postCol)).as("sum_post"))
    v.crossJoin(broadcast(g))
      .withColumn("__num",
        col("n").cast(dec) * col("sxy") - col("sx").cast(dec) * col("sy").cast(dec))
      .withColumn("__den",
        col("n").cast(dec) * col("sxx") - col("sx").cast(dec) * col("sx").cast(dec))
      .withColumn("theta_e6",
        when(col("__den") === 0, lit(null).cast("long"))
          .otherwise(expr("""CASE WHEN __num < 0
            THEN -(((-__num) * 1000000) div __den)
            ELSE (__num * 1000000) div __den END""")))
      .withColumn("raw_mean_e6", expr("(sum_post * 1000000) div n_units"))
      .withColumn("__anum",
        col("sum_post").cast(dec) * col("n").cast(dec) * lit(1000000L).cast(dec)
          - col("theta_e6").cast(dec) *
            (col("sum_pre").cast(dec) * col("n").cast(dec)
              - col("sx").cast(dec) * col("n_units").cast(dec)))
      .withColumn("adj_mean_e6", expr("""CASE WHEN theta_e6 IS NULL THEN NULL
        WHEN __anum < 0 THEN -(((-__anum)) div (CAST(n_units AS DECIMAL(38,0)) * n))
        ELSE __anum div (CAST(n_units AS DECIMAL(38,0)) * n) END"""))
      .select("variant", "n_units", "sum_pre", "sum_post",
        "theta_e6", "raw_mean_e6", "adj_mean_e6")
  }

  /**
   * Mann-Whitney U rank-sum test (two-sided, tie-corrected) — the
   * NONPARAMETRIC A/B comparison next to [[chiSquare2x2]] (binary)
   * and [[cuped]] (parametric means): does one variant's metric
   * distribution stochastically dominate the other's, no normality
   * assumed. Exact integer core: per distinct value the (na, nb)
   * counts, the cumulative walk via [[Rank.prefixSums]] (never a
   * single-task window), and the tie-aware identity
   * u2 = sum_g na_g * (2 * nb_below_g + nb_g)  (= 2U, ties count
   * half). The normal approximation z = (U - n1*n2/2) / sqrt(var)
   * with the standard tie correction var = n1*n2/12 * ((n+1) -
   * sum(t^3 - t)/(n*(n-1))) is computed as one fixed double
   * expression tree over the exact integers (sum(t^3 - t)
   * accumulates in DECIMAL(38)) and rounded at 6 dp — identical on
   * both engines. z is null when every value is tied (zero
   * variance). Output: ONE row {n_a, n_b, u2_a, z}.
   */
  def mannWhitney(df: DataFrame, valueCol: String, inACol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val g = df.groupBy(col(valueCol).cast("long").as("__v"))
      .agg(sum(when(col(inACol), 1L).otherwise(0L)).as("__na"),
        sum(when(!col(inACol), 1L).otherwise(0L)).as("__nb"))
    val cum = Rank.prefixSums(g, Seq(col("__v")), Seq("__nb"))
    cum.agg(
        sum("__na").as("n_a"), sum("__nb").as("n_b"),
        sum(col("__na") * (lit(2L) * (col("cum___nb") - col("__nb")) + col("__nb")))
          .cast("long").as("u2_a"),
        sum((col("__na") + col("__nb")).cast(dec) * (col("__na") + col("__nb")).cast(dec)
          * (col("__na") + col("__nb")).cast(dec)
          - (col("__na") + col("__nb")).cast(dec)).as("__t3"))
      .withColumn("__n", col("n_a") + col("n_b"))
      .withColumn("__var",
        col("n_a").cast("double") * col("n_b").cast("double") / 12.0 *
          ((col("__n").cast("double") + 1.0) -
            col("__t3").cast("double") /
              (col("__n").cast("double") * (col("__n").cast("double") - 1.0))))
      .withColumn("z",
        when(col("__var") <= 0.0, lit(null).cast("double"))
          .otherwise(round(
            (col("u2_a").cast("double") / 2.0 -
              col("n_a").cast("double") * col("n_b").cast("double") / 2.0) /
              sqrt(col("__var")), 6)))
      .select("n_a", "n_b", "u2_a", "z")
  }

  /**
   * 2-D Pareto frontier (skyline): rows not dominated by any other —
   * dominated means another row has xCol <= (minimize) AND yCol >=
   * (maximize) with at least one strict. Distributed shape: the
   * corpus shuffles ONCE (groupBy x for the per-x maxima); the
   * per-x max table is bounded by |distinct x| (a date/bucket
   * column by construction), so its prefix-max window and the
   * broadcast join back are small-table work — no corpus-wide
   * global-order window anywhere.
   *
   * Survival rule derived from dominance: a row survives iff its y
   * equals its x-group max (same-x higher y strictly dominates) AND
   * strictly exceeds every smaller-x group's max (equal y at
   * smaller x dominates via the strict x).
   */
  def paretoFront2d(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val gmax = df.groupBy(col(xCol).as("__x")).agg(max(col(yCol)).as("__gm"))
    val wPrefix = org.apache.spark.sql.expressions.Window
      .orderBy("__x").rowsBetween(Long.MinValue, -1)
    val frontier = gmax
      .withColumn("__pm", max("__gm").over(wPrefix))
      .filter(col("__pm").isNull || col("__gm") > col("__pm"))
      .select(col("__x"), col("__gm"))
    df.join(broadcast(frontier),
      col(xCol) === col("__x") && col(yCol) === col("__gm"))
      .drop("__x", "__gm")
  }

  /**
   * Pearson chi-square statistic (no continuity correction) of a 2x2
   * contingency table — the A/B conversion test — in EXACT integer
   * arithmetic:
   *
   *   chi2 = N * (ad - bc)^2 / ((a+b)(c+d)(a+c)(b+d))
   *
   * Input: one row per unit with a binary variant column (0/1) and a
   * binary success column (0/1). Output is ONE row: the four cell
   * counts, N, and `chi2_e6` = floor(chi2 * 1e6) (numerator is a
   * square — both operands positive, trunc == floor on any engine).
   * Null when any margin is zero (the statistic is undefined).
   * Counts accumulate in one map-side-combined aggregate; the
   * N*(ad-bc)^2*1e6 product runs in DECIMAL(38) (overflows int64
   * beyond ~30k units).
   */
  def chiSquare2x2(df: DataFrame, variantCol: String, successCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    def cell(v: Int, s: Int) =
      sum(when(col(variantCol) === v && col(successCol) === s, 1L).otherwise(0L))
    df.agg(
        cell(0, 1).as("conv_a"), cell(0, 0).as("miss_a"),
        cell(1, 1).as("conv_b"), cell(1, 0).as("miss_b"))
      .withColumn("n", col("conv_a") + col("miss_a") + col("conv_b") + col("miss_b"))
      .withColumn("__det",
        col("conv_a").cast(dec) * col("miss_b").cast(dec)
          - col("miss_a").cast(dec) * col("conv_b").cast(dec))
      .withColumn("__den",
        (col("conv_a") + col("miss_a")).cast(dec) * (col("conv_b") + col("miss_b")).cast(dec)
          * (col("conv_a") + col("conv_b")).cast(dec) * (col("miss_a") + col("miss_b")).cast(dec))
      .withColumn("chi2_e6",
        when(col("__den") === 0, lit(null).cast("long"))
          .otherwise(expr("(n * __det * __det * 1000000) div __den")))
      .select("conv_a", "miss_a", "conv_b", "miss_b", "n", "chi2_e6")
  }
}
