package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Gap-based sessionization of the events feed.
 *
 * Batch form (`batchSessions`): two windows — lag to detect gaps,
 * running sum to number sessions — then a group-by. Fully
 * SQL-expressible, so it carries a DuckDB oracle (q_sessionize).
 *
 * Streaming form (`streamSessions`): flatMapGroupsWithState keyed by
 * user with an event-time timeout — the engine's custom-state
 * primitive (SURVEY.md §2 #20). On a bounded input the two forms
 * agree (asserted in ScalaTest).
 */
object Sessionize {

  val GapSeconds = 1800L

  final case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionOut(user_id: Long, session_seq: Long, session_start: String,
                              n_events: Long, sum_value_e2: Long)
  final case class UserBuf(events: List[(Long, Double)], emitted: Long) // (epochSec, value), #sessions emitted

  private val tsFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
  /** Always-full 'yyyy-MM-dd HH:mm:ss' (Instant.toString drops :00 seconds). */
  def formatSec(epochSec: Long): String = tsFmt.format(java.time.Instant.ofEpochSecond(epochSec))

  /** Batch sessionization: gap > 30 min starts a new session. */
  def batchSessions(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    events
      .withColumn("__prev", lag(col("ts"), 1).over(byUser))
      .withColumn("__new",
        when(col("__prev").isNull ||
          (unix_timestamp(col("ts")) - unix_timestamp(col("__prev"))) > GapSeconds, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("__new")).over(byUser))
      .groupBy("user_id", "session_seq")
      .agg(date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        count(lit(1)).as("n_events"),
        // integer cents: `value` carries 2-dp data, so per-row round(v*100)
        // is exact and the Long sum is order-independent — a double sum's
        // round(x, 2) straddles .xx5 differently in Spark vs DuckDB
        sum(round(col("value") * 100).cast("long")).as("sum_value_e2"))
  }

  /** DuckDB twin of batchSessions for the oracle. */
  val batchSessionsSql: String =
    s"""SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       count(*) AS n_events, CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_e2
       FROM (
         SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
         FROM (
           SELECT *, CASE WHEN prev_ts IS NULL
             OR date_diff('second', prev_ts, ts) > $GapSeconds THEN 1 ELSE 0 END AS is_new
           FROM (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM events)))
       GROUP BY user_id, session_seq"""

  /**
   * Streaming sessionization via flatMapGroupsWithState. State per
   * user: buffered (epochSec, value) events; an event-time timeout
   * flushes sessions once the watermark passes the gap.
   */
  def streamSessions(spark: SparkSession, events: DataFrame): Dataset[SessionOut] = {
    import spark.implicits._
    events.selectExpr("user_id", "ts", "value").as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserBuf, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[Ev], state: GroupState[UserBuf]) =>
          val prev = state.getOption.getOrElse(UserBuf(Nil, 0L))
          val incoming = rows.map(e => (e.ts.getTime / 1000, math.round(e.value * 100).toDouble)).toList
          val all = (prev.events ++ incoming).sortBy(x => x)
          val wmSec = state.getCurrentWatermarkMs() / 1000
          // split into sessions by the gap rule (events are sorted)
          val sessions = all.foldLeft(List.empty[List[(Long, Double)]]) {
            case (acc, ev) => acc match {
              case head :: tail if ev._1 - head.head._1 <= GapSeconds => (ev :: head) :: tail
              case _ => List(ev) :: acc
            }
          }.map(_.reverse).reverse
          // a session is closed once the watermark is a full gap past
          // its last event. State survives even when everything
          // closed: the `emitted` counter must persist so the user's
          // next session continues batch-identical numbering (state
          // is O(users); the event buffer itself drains to empty).
          val (closed, open) = sessions.partition(s => wmSec - s.last._1 > GapSeconds)
          state.update(UserBuf(open.flatten, prev.emitted + closed.length))
          if (open.nonEmpty)
            state.setTimeoutTimestamp((all.map(_._1).max + GapSeconds + 1) * 1000)
          closed.zipWithIndex.iterator.map { case (s, i) =>
            SessionOut(user, prev.emitted + i + 1, formatSec(s.head._1),
              s.length.toLong,
              s.map(_._2.toLong).sum)
          }
      }
  }
}
