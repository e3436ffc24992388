package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Schema-agnostic adapter for the driver-generated `events.parquet`.
 *
 * The testdata generator has shipped the `ts` column in two different
 * physical encodings across rounds: parquet TIMESTAMP(NANOS) (which
 * Spark only surfaces as a raw nano `LongType` under
 * `spark.sql.legacy.parquet.nanosAsLong`) and TIMESTAMP_MICROS with
 * isAdjustedToUTC=false (which Spark reads natively as
 * TIMESTAMP_NTZ). Every consumer goes through this object, which
 * branches on the SCANNED dtype, so a future nanos<->micros flip in
 * the testdata cannot break the query surface again.
 *
 * Two canonical views, chosen per operator semantics:
 *  - [[normalizeTs]]: `ts` as `TimestampType` (micro precision; the
 *    session timezone is pinned to UTC by every entry point, so an
 *    NTZ wall-clock and the instant coincide). For windowing,
 *    date_format, sessionization.
 *  - [[rawNanosTs]]: `ts` as epoch **nanoseconds** (BIGINT) — exactly
 *    what DuckDB's `epoch_ns(ts)` yields for micros-stored data
 *    (micros * 1000), so nano-literal cutoffs and tie-breaks keep
 *    bit-exact oracle parity regardless of the on-disk encoding.
 */
object EventsTable {

  /**
   * Scan the events table. The legacy nanos flag is a no-op for
   * micros/NTZ files but REQUIRED for a TIMESTAMP(NANOS) file to scan
   * at all (Spark 4 otherwise refuses the annotation) — setting it
   * unconditionally is what keeps the LongType branch reachable.
   */
  def read(s: SparkSession, path: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(path)
  }

  /** `ts` normalized to TimestampType, whatever the on-disk encoding. */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => // raw epoch nanos -> truncate to micros
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case TimestampNTZType => // UTC session: same instant, typed
      df.withColumn("ts", col("ts").cast(TimestampType))
    case TimestampType => df
    case other =>
      throw new IllegalArgumentException(
        s"events.ts: unsupported on-disk type $other (expected INT64 nanos or TIMESTAMP)")
  }

  /** `ts` as raw epoch nanos (BIGINT), whatever the on-disk encoding. */
  def rawNanosTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => df
    case TimestampNTZType | TimestampType =>
      df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
    case other =>
      throw new IllegalArgumentException(
        s"events.ts: unsupported on-disk type $other (expected INT64 nanos or TIMESTAMP)")
  }

  /**
   * One far-future row (default +`days` past the max event) matching
   * the ON-DISK events schema — written next to real files by the
   * streaming tests to push the watermark past every real session.
   * Built against the scanned dtype so it round-trips through the
   * same schema the file source infers.
   */
  def farFutureSentinel(s: SparkSession, path: String, days: Int = 1): DataFrame = {
    val ev = read(s, path)
    val shifted = ev.schema("ts").dataType match {
      case LongType => max(col("ts")) + lit(days * 86400L * 1000000000L)
      case _        => max(col("ts")) + expr(s"INTERVAL $days DAYS")
    }
    ev.agg(shifted.as("ts")).select(
      lit(-1L).as("event_id"), col("ts"), lit(-1L).as("user_id"),
      lit("sentinel").as("event_type"), lit(0.0).as("value"), lit("").as("props"))
  }
}
