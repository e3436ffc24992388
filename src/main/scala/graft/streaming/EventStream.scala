package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Structured Streaming ingestion of the events feed: file-source
 * readStream -> event-time tumbling window aggregation with a
 * watermark. The reference has no streaming surface; this is the
 * engine's continuous-ingest path (SURVEY.md §2 #20), designed so
 * the batch query `events_window` and the streaming query produce
 * identical results on a bounded input (verified in ScalaTest).
 *
 * Scale: file-source streaming scales horizontally (each micro-batch
 * is a normal distributed scan); state is bounded by the watermark.
 */
object EventStream {

  /**
   * Streaming DF over a directory of events parquet files. The file
   * source needs an explicit schema, which we take from a one-off
   * batch scan of the same directory (driver-side metadata read, no
   * data pass) — so the stream tracks whatever `ts` encoding the
   * testdata generator shipped (nanos-as-long or TIMESTAMP), and
   * [[graft.EventsTable.normalizeTs]] presents TimestampType to every
   * downstream query exactly as the batch path does.
   */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val onDisk: StructType = graft.EventsTable.read(spark, dir).schema
    graft.EventsTable.normalizeTs(spark.readStream.schema(onDisk).parquet(dir))
  }

  /** Tumbling 1h window x event_type aggregation with a 2h watermark. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
        col("event_type"), col("n_events"), col("sum_value"))

  /**
   * Streaming exact dedup: drop duplicate event_ids within the
   * watermark horizon (the streaming face of Dedup.exactDedup —
   * state is bounded by the watermark).
   */
  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours").dropDuplicates("event_id")

  /**
   * Watermarked stream-stream interval join — the streaming face of
   * Temporal.rangeJoin: each event pairs with the same user's
   * 'purchase' events from the preceding `lookbackHours`. The
   * time-range condition plus both watermarks bound the join state
   * (Spark evicts buffered rows once the other side's watermark
   * passes the range), so state stays O(rate x lookback), not
   * O(stream length).
   */
  def purchaseIntervalJoin(events: DataFrame, lookbackHours: Int = 6): DataFrame = {
    val e = events.withWatermark("ts", "2 hours")
    val p = events
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("value").as("p_value"))
      .withWatermark("p_ts", "2 hours")
    e.join(p,
      col("user_id") === col("p_user") &&
        col("p_ts") <= col("ts") &&
        col("p_ts") >= col("ts") - expr(s"INTERVAL $lookbackHours HOURS"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("p_event_id"), col("p_value"))
  }

  /**
   * Streaming face of the HLL sketch: per-event-type distinct-user
   * registers as streaming aggregation state. No watermark is needed
   * because the state is BOUNDED BY CONSTRUCTION at groups x 2^p
   * rows — the defining property of a sketch, and what makes it the
   * right continuous distinct-count: an exact streaming
   * `count(DISTINCT user)` would hold every user id ever seen.
   * The same [[graft.operators.Sketch.hllRegisters]] column program
   * runs on the stream unchanged (a declarative plan is
   * batch/stream-portable); complete-mode output IS the mergeable
   * register table, so a consumer can [[graft.operators.Sketch.hllMerge]]
   * it with historical shards and [[graft.operators.Sketch.hllEstimate]]
   * the union.
   */
  def hllUserRegisters(events: DataFrame, p: Int = 6): DataFrame =
    graft.operators.Sketch.hllRegisters(
      events.select(col("event_type"), col("user_id")), "event_type", "user_id", p)

  /**
   * Streaming count-min cells over the user-id stream — same
   * bounded-by-construction aggregation-state story as
   * [[hllUserRegisters]] (d x 2^logW rows, no watermark), so the
   * whole sketch family (distinct / membership / frequency /
   * quantiles) has a continuous face: complete-mode output merges
   * with historical shards by [[graft.operators.Sketch.cmsMerge]].
   */
  def cmsUserCells(events: DataFrame, d: Int = 4, logW: Int = 10): DataFrame =
    graft.operators.Sketch.cmsCells(events.select(col("user_id")), "user_id", d, logW)

  /**
   * Streaming per-type user-membership bitmap words — the EXACT
   * distinct/overlap face of the sketch family: state is bounded by
   * the dense id domain (maxId/64 words per group), bit_or is a
   * commutative/idempotent aggregate, so complete-mode output equals
   * the batch index word for word and merges with historical shards
   * by a further bit_or.
   */
  def bitmapUserWords(events: DataFrame): DataFrame =
    graft.operators.Sketch.bitmapWords(
      events.select(col("event_type"), col("user_id")), "event_type", "user_id")

  /**
   * Run the windowed aggregation over whatever is in `dir` right now
   * (AvailableNow trigger) into an in-memory table; returns the
   * result. Used by tests to assert batch parity.
   */
  def runAvailableNow(spark: SparkSession, dir: String, queryName: String): DataFrame = {
    val q = windowedCounts(readEvents(spark, dir))
      .writeStream.format("memory").queryName(queryName)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
