package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Declarative data-quality validation (the Deequ/expectations shape):
 * a check suite compiled into the FEWEST possible passes over the
 * data — every row-level check (null, range, accepted set, regex)
 * becomes one conditional-sum aggregate in a SINGLE map-only scan
 * (one job for the whole suite, map-side combined to one row);
 * uniqueness adds one key-grouped aggregate per checked key; foreign
 * keys add one broadcast anti-join count per reference. Output is a
 * small (check, column, n_violations, n_rows, pass) report — the
 * gate a 100 TB ingest runs BEFORE publishing a snapshot, where a
 * second full scan per check would be the difference between one
 * pass and twenty.
 */
object Validate {

  sealed trait Check { def name: String; def column: String }
  /** Column must contain no NULLs. */
  final case class NotNull(column: String) extends Check { val name = "not_null" }
  /** Non-null values must lie in [lo, hi]. */
  final case class InRange(column: String, lo: Double, hi: Double) extends Check { val name = "in_range" }
  /** Non-null values must be one of `values`. */
  final case class Accepted(column: String, values: Seq[String]) extends Check { val name = "accepted" }
  /** Non-null values must match the (Java∩RE2-safe) regex. */
  final case class Matches(column: String, regex: String) extends Check { val name = "matches" }
  /** Column must be unique across the table (NULLs exempt). */
  final case class Unique(column: String) extends Check { val name = "unique" }
  /** Non-null values must exist in `refCol` of `ref` (foreign key;
   *  ref is broadcast — keep it dimension-sized). */
  final case class RefIntegrity(column: String, ref: DataFrame, refCol: String) extends Check { val name = "ref_integrity" }

  /** Violation predicate for a row-level check (NULL-exempt except
   *  NotNull itself — the usual SQL-constraint semantics). Exposed to
   *  the streaming release gate: row-level checks are per-row
   *  EXPRESSIONS, so they apply to a streaming frame unchanged. */
  private[graft] def violation(c: Check): Column = c match {
    case NotNull(col0) => col(col0).isNull
    case InRange(col0, lo, hi) =>
      col(col0).isNotNull && (col(col0).cast("double") < lo || col(col0).cast("double") > hi)
    case Accepted(col0, vs) =>
      col(col0).isNotNull && !col(col0).cast("string").isin(vs: _*)
    case Matches(col0, re) =>
      col(col0).isNotNull && !col(col0).cast("string").rlike(re)
    case _ => throw new IllegalStateException(s"not a row-level check: $c")
  }

  /**
   * Run the suite: returns one row per check —
   * (check, column, n_violations, n_rows, pass) — ordered as given.
   *
   * ONE job for the whole suite (the r14 verdict's q_validate item —
   * the old shape paid a separate scan each for the row aggregate,
   * the uniqueness rollup, and TWO RefIntegrity counts): every
   * RefIntegrity becomes a broadcast LEFT join presence flag
   * (map-only — orphans = non-null fact keys whose ref side is
   * null), every row-level check a conditional sum, and when a
   * Unique check is present those sums ride a CollectMetrics
   * (`observe`) node UNDER its grouped aggregate — the scan's rows
   * flow through the metrics collector on their way into the
   * NARROW (key, count) uniqueness shuffle, so the whole suite is
   * one scan and the shuffle stays two columns wide (routing the
   * sums through the grouped aggregate itself was measured to give
   * the scan saving back in shuffle width). Additional Unique
   * checks beyond the first each pay one more grouped aggregate (a
   * second shuffle key needs a second hash).
   */
  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "Validate.validate: empty check suite")
    // exhaustiveness up front: a future Check subtype that is neither
    // row-level, Unique, nor RefIntegrity must fail HERE with a named
    // error, not as a NoSuchElementException at result assembly
    checks.foreach {
      case _: NotNull | _: InRange | _: Accepted | _: Matches | _: Unique | _: RefIntegrity =>
      case other => throw new IllegalStateException(
        s"Validate.validate: unhandled check type ${other.getClass.getSimpleName} " +
          s"('${other.name}' on '${other.column}') — teach validate() its aggregation route")
    }
    val spark = df.sparkSession
    val rowChecks = checks.filter {
      case _: NotNull | _: InRange | _: Accepted | _: Matches => true
      case _ => false
    }
    val uniqueChecks = checks.collect { case u: Unique => u }
    val fkChecks = checks.collect { case f: RefIntegrity => f }
    // map-only presence flags for every FK (ref sides stay dimension-
    // sized by contract; names prefixed to dodge collisions)
    val annotated = fkChecks.zipWithIndex.foldLeft(df) { case (cur, (f, i)) =>
      cur.join(broadcast(f.ref.select(col(f.refCol).as(s"__ref$i")).distinct()),
        col(f.column) === col(s"__ref$i"), "left")
    }
    // flat metric list: one violation sum per row check; (orphans,
    // non-null count) per FK — identical in both routes below
    val metricCols: Seq[Column] =
      rowChecks.map(c => sum(when(violation(c), 1L).otherwise(0L))) ++
        fkChecks.zipWithIndex.flatMap { case (f, i) => Seq(
          sum(when(col(f.column).isNotNull && col(s"__ref$i").isNull, 1L).otherwise(0L)),
          sum(when(col(f.column).isNotNull, 1L).otherwise(0L))) }
    // coalesce: sums over an EMPTY table are NULL, and an empty
    // snapshot/partition is a legitimate gate input
    val namedMetrics = count(lit(1)).as("n") +:
      metricCols.zipWithIndex.map { case (m, i) => coalesce(m, lit(0L)).as(s"m$i") }
    val (metricRow, uniqueHead) = uniqueChecks.headOption match {
      case None =>
        (annotated.agg(namedMetrics.head, namedMetrics.tail: _*).first(), None)
      case Some(u) =>
        val obs = new org.apache.spark.sql.Observation()
        val observed = annotated.observe(obs, namedMetrics.head, namedMetrics.tail: _*)
        val r = observed.groupBy(col(u.column).as("__k"))
          .agg(count(lit(1)).as("__c"))
          .agg(coalesce(sum(when(col("__k").isNotNull && col("__c") > 1, col("__c") - 1))
              .cast("long"), lit(0L)),
            coalesce(sum(when(col("__k").isNotNull, col("__c"))).cast("long"), lit(0L)))
          .first()
        val m = obs.get // blocks until the action above registered its metrics
        // PropagateEmptyRelation can eliminate the CollectMetrics node
        // when the input is provably empty — every metric is then 0
        (Row.fromSeq(namedMetrics.indices.map(i =>
          m.getOrElse(if (i == 0) "n" else s"m${i - 1}", 0L))),
          Some((r.getLong(0), r.getLong(1))))
    }
    val n = metricRow.getLong(0)
    val rowResults: Map[Check, (Long, Long)] =
      rowChecks.zipWithIndex.map { case (c, i) => c -> (metricRow.getLong(1 + i), n) }.toMap
    val fkResults: Map[Check, (Long, Long)] =
      fkChecks.zipWithIndex.map { case (f, i) =>
        val b = 1 + rowChecks.length + 2 * i
        (f: Check) -> (metricRow.getLong(b), metricRow.getLong(b + 1))
      }.toMap
    val uniqueResults: Map[Check, (Long, Long)] =
      uniqueChecks.headOption.map(u => (u: Check) -> uniqueHead.get).toMap ++
        uniqueChecks.drop(1).map { u =>
          val r = df.filter(col(u.column).isNotNull)
            .groupBy(col(u.column))
            .agg(count(lit(1)).as("c"))
            .agg(coalesce(sum(when(col("c") > 1, col("c") - 1)).cast("long"), lit(0L)),
              coalesce(sum("c").cast("long"), lit(0L)))
            .first()
          (u: Check) -> (r.getLong(0), r.getLong(1))
        }.toMap
    val all = rowResults ++ fkResults ++ uniqueResults
    val rows = checks.map { c =>
      val (viol, n) = all(c)
      Row(c.name, c.column, viol, n, if (viol == 0) 1L else 0L)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("check", org.apache.spark.sql.types.StringType, false),
        org.apache.spark.sql.types.StructField("column", org.apache.spark.sql.types.StringType, false),
        org.apache.spark.sql.types.StructField("n_violations", org.apache.spark.sql.types.LongType, false),
        org.apache.spark.sql.types.StructField("n_rows", org.apache.spark.sql.types.LongType, false),
        org.apache.spark.sql.types.StructField("pass", org.apache.spark.sql.types.LongType, false))))
  }

  /**
   * Streaming face: per-event-time-window violation counts for the
   * ROW-LEVEL checks — the live data-quality monitor over an ingest
   * stream. The violation predicates are the SAME stateless Column
   * expressions the batch suite compiles to, inside one windowed
   * aggregation (bounded state: one row per window x check set; add
   * a watermark upstream for state cleanup). Uniqueness/foreign-key
   * checks are batch-only by nature (unbounded state) and are
   * refused loudly. Output: window, n_rows, plus one
   * `<check>_<column>` violation-count column per check — wide
   * format so batch parity is a row-for-row comparison.
   */
  def validateStream(stream: DataFrame, timeCol: String, windowDur: String,
                     checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "Validate.validateStream: empty check suite")
    checks.foreach {
      case _: NotNull | _: InRange | _: Accepted | _: Matches => ()
      case c => throw new IllegalArgumentException(
        s"Validate.validateStream: ${c.name} needs unbounded state — batch-only " +
          "(run it on the stored snapshot instead)")
    }
    val aggs = checks.map(c =>
      sum(when(violation(c), 1L).otherwise(0L)).as(s"${c.name}_${c.column}"))
    stream.groupBy(window(col(timeCol), windowDur))
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /**
   * One-pass column profiler (the Deequ-profiling shape): null
   * counts for every profiled column plus min/max/mean for numerics
   * (6-dp rounded — the cross-engine float convention), lexicographic
   * min/max for strings, and epoch-micros min/max for timestamps —
   * ALL columns in ONE map-side-combined aggregate scan. Output is
   * long-format: (column, n_rows, n_nulls, min_num, max_num,
   * mean_num, min_str, max_str) with NULLs where a metric doesn't
   * apply to the type. Distinct counts are deliberately absent —
   * that's the sketch family's job ([[Sketch.hllDistinct]] /
   * [[Sketch.kmvDistinct]]), mergeable and corpus-scale, where a
   * per-column exact multi-distinct would Expand the scan per
   * column.
   */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "Validate.profile: no columns to profile")
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val schema = df.schema
    cols.foreach(c => require(schema.fieldNames.contains(c),
      s"Validate.profile: no such column '$c' (have ${schema.fieldNames.mkString(", ")})"))
    def isNum(dt: DataType) = dt match {
      case _: NumericType => true
      case _ => false
    }
    def isTs(dt: DataType) = dt match {
      case _: TimestampType | _: TimestampNTZType => true
      case _ => false
    }
    val aggs: Seq[Column] = cols.flatMap { c =>
      val dt = schema(c).dataType
      val base = Seq(coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
        .as(s"__nulls_$c"))
      val num: Seq[Column] =
        if (isNum(dt)) Seq(
          round(min(col(c)).cast("double"), 6).as(s"__minn_$c"),
          round(max(col(c)).cast("double"), 6).as(s"__maxn_$c"),
          round(avg(col(c).cast("double")), 6).as(s"__mean_$c"))
        else if (isTs(dt)) Seq(
          unix_micros(min(col(c)).cast("timestamp")).cast("double").as(s"__minn_$c"),
          unix_micros(max(col(c)).cast("timestamp")).cast("double").as(s"__maxn_$c"),
          lit(null).cast("double").as(s"__mean_$c"))
        else Seq(lit(null).cast("double").as(s"__minn_$c"),
          lit(null).cast("double").as(s"__maxn_$c"),
          lit(null).cast("double").as(s"__mean_$c"))
      val str: Seq[Column] = dt match {
        case StringType => Seq(min(col(c)).as(s"__mins_$c"), max(col(c)).as(s"__maxs_$c"))
        case _ => Seq(lit(null).cast("string").as(s"__mins_$c"),
          lit(null).cast("string").as(s"__maxs_$c"))
      }
      base ++ num ++ str
    }
    val r = df.agg(count(lit(1)).as("__n"), aggs: _*).first()
    val n = r.getLong(0)
    def d(i: Int): Any = if (r.isNullAt(i)) null else r.getDouble(i)
    def s(i: Int): Any = if (r.isNullAt(i)) null else r.getString(i)
    val rows = cols.zipWithIndex.map { case (c, ci) =>
      val base = 1 + ci * 6
      Row(c, n, r.getLong(base), d(base + 1), d(base + 2), d(base + 3), s(base + 4), s(base + 5))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("column", StringType, false),
        StructField("n_rows", LongType, false),
        StructField("n_nulls", LongType, false),
        StructField("min_num", DoubleType, true),
        StructField("max_num", DoubleType, true),
        StructField("mean_num", DoubleType, true),
        StructField("min_str", StringType, true),
        StructField("max_str", StringType, true))))
  }
}
