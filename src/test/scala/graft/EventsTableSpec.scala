package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * The adapter contract that round 7 broke: [[EventsTable]] must read
 * whatever `ts` encoding the driver's testdata generator shipped.
 * These tests run against the REAL `/root/testdata` parquet (the r7
 * regression was only visible there — synthetic frames matched the
 * old encoding) plus a synthesized raw-nanos frame so BOTH branches
 * stay covered regardless of the current on-disk choice.
 */
class EventsTableSpec extends SparkSpecBase {

  private def path = sf("sf0.001") + "/events.parquet"

  test("normalizeTs yields TimestampType on the real testdata") {
    val ev = EventsTable.normalizeTs(EventsTable.read(spark, path))
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.count() > 0)
    // and the full downstream query surface analyzes: the window agg
    // that died at analysis in r7
    val w = ev.groupBy(window(col("ts"), "1 hour")).count()
    assert(w.count() > 0)
  }

  test("rawNanosTs yields BIGINT epoch nanos consistent with normalizeTs") {
    val raw = EventsTable.rawNanosTs(EventsTable.read(spark, path))
    assert(raw.schema("ts").dataType == LongType)
    // micros(normalized) * 1000 == raw nanos, row by row (join on event_id)
    val norm = EventsTable.normalizeTs(EventsTable.read(spark, path))
      .select(col("event_id"), (unix_micros(col("ts")) * 1000L).as("n_ns"))
    val bad = raw.select(col("event_id"), col("ts").as("r_ns"))
      .join(norm, "event_id").filter(col("r_ns") =!= col("n_ns")).count()
    assert(bad == 0L, s"$bad rows disagree between raw and normalized paths")
  }

  test("the raw-nanos LongType branch is bit-identical to the timestamp branch") {
    // synthesize the OLD on-disk contract (INT64 epoch nanos) from the
    // real rows, run both through the adapter, and demand equality
    val real = EventsTable.read(spark, path)
    val asNanos = EventsTable.rawNanosTs(real) // ts: BIGINT nanos
    val viaLong = EventsTable.normalizeTs(asNanos)
    val viaNative = EventsTable.normalizeTs(real)
    assert(viaLong.schema("ts").dataType == TimestampType)
    val a = viaLong.select("event_id", "ts").orderBy("event_id").collect().toSeq
    val b = viaNative.select("event_id", "ts").orderBy("event_id").collect().toSeq
    assert(a == b, "LongType and Timestamp branches must agree")
    // idempotence both ways
    assert(EventsTable.rawNanosTs(asNanos).schema("ts").dataType == LongType)
    assert(EventsTable.normalizeTs(viaNative).schema("ts").dataType == TimestampType)
  }

  test("farFutureSentinel matches the on-disk schema and lands past every event") {
    val real = EventsTable.read(spark, path)
    val sent = EventsTable.farFutureSentinel(spark, path)
    // names + types must line up (nullability legitimately differs:
    // literals are non-null, parquet scans nullable)
    val shape = (s: org.apache.spark.sql.types.StructType) => s.map(f => (f.name, f.dataType))
    assert(shape(sent.schema) == shape(real.schema),
      s"sentinel schema ${sent.schema} != on-disk ${real.schema}")
    val maxReal = EventsTable.rawNanosTs(real).agg(max("ts")).collect()(0).getLong(0)
    val sentNs = EventsTable.rawNanosTs(sent).collect()(0).getLong(1)
    assert(sentNs > maxReal)
  }

  test("unsupported ts types are refused loudly") {
    val bogus = spark.range(1).select(lit("notatime").as("ts"))
    intercept[IllegalArgumentException] { EventsTable.normalizeTs(bogus) }
    intercept[IllegalArgumentException] { EventsTable.rawNanosTs(bogus) }
  }
}
