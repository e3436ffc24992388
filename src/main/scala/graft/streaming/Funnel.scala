package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming face of [[graft.operators.Temporal.funnelStages]]: per
 * user, progress through an ordered step sequence, emitted as one row
 * per stage INCREASE (the monitoring shape — "user reached checkout").
 *
 * State per user is the earliest qualifying time of each step (k
 * longs) plus a buffer of events still above the watermark — O(k +
 * in-flight events), never the history. Events at or below the
 * watermark fold into the step times in (ts, event_id) order, which
 * reproduces the batch window's cumulative-min semantics exactly:
 * within one fold the running q-state at each event equals the batch
 * prefix state, and across folds the watermark guarantees every
 * later-folded event has a later timestamp than everything already
 * folded (late rows beyond the watermark are the streaming contract's
 * loss, same as every watermarked operator here).
 *
 * On a bounded input the final per-user max stage equals the batch
 * operator's stage (ScalaTest-asserted).
 *
 * State lifetime: a user's state is REMOVED as soon as the funnel
 * completes (stage == nSteps with nothing buffered — the emit range
 * is empty forever after), and an event-time TTL (`idleTtlMs`, 24 h
 * default) drops users idle past the watermark horizon, so long-run
 * state is O(users active within the TTL), not O(all users ever).
 * The trade, same loss class as watermark lateness: an event arriving
 * after its user's state was dropped restarts that funnel from
 * scratch (completed users could re-emit stages on post-completion
 * re-entry; idle users lose pre-TTL progress).
 */
object FunnelStream {

  private val Sentinel = Long.MaxValue

  final case class FEv(user_id: Long, ts: java.sql.Timestamp, event_id: Long, step: Int)
  final case class FunnelProgress(user_id: Long, stage: Long, reached_at: String)
  /** q = earliest qualifying millis per step (Sentinel = not reached);
    * buf = (tsMillis, event_id, step) still above the watermark. */
  final case class FunnelBuf(q: List[Long], buf: List[(Long, Long, Int)], emitted: Int)

  /**
   * `events` needs (user_id, ts, event_id, step) where step is the
   * funnel index the event satisfies (map event_type -> index before
   * calling; -1 / out-of-range rows are ignored). `nSteps` fixes the
   * state width.
   */
  def streamFunnel(spark: SparkSession, events: DataFrame, nSteps: Int,
                   idleTtlMs: Long = 86400000L): Dataset[FunnelProgress] = {
    import spark.implicits._
    require(nSteps >= 1, s"nSteps must be >= 1 (got $nSteps)")
    require(idleTtlMs > 0, s"idleTtlMs must be > 0 (got $idleTtlMs)")
    events.selectExpr("user_id", "ts", "event_id", "step").as[FEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelBuf, FunnelProgress](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[FEv], state: GroupState[FunnelBuf]) =>
          val prev = state.getOption.getOrElse(
            FunnelBuf(List.fill(nSteps)(Sentinel), Nil, 0))
          val incoming = rows
            .filter(e => e.step >= 0 && e.step < nSteps)
            .map(e => (e.ts.getTime, e.event_id, e.step)).toList
          val wm = state.getCurrentWatermarkMs()
          val (ready, hold) = (prev.buf ++ incoming).partition(_._1 <= wm)
          val q = prev.q.toArray
          // ascending fold = the batch cumulative-min window; strict <
          // on the PREVIOUS step's time is the in-sequence rule
          ready.sortBy(e => (e._1, e._2)).foreach { case (ts, _, s) =>
            if ((s == 0 || q(s - 1) < ts) && ts < q(s)) q(s) = ts
          }
          val stage = q.indexWhere(_ == Sentinel) match {
            case -1 => nSteps
            case i  => i
          }
          val emitted = math.max(stage, prev.emitted)
          // drop state when it can never produce output again
          // (completed, nothing buffered) or the idle TTL expired with
          // an empty buffer; otherwise keep it and always arm a
          // timeout so idle users get cleaned up on watermark advance
          if (hold.isEmpty && (emitted >= nSteps || state.hasTimedOut)) state.remove()
          else {
            state.update(FunnelBuf(q.toList, hold, emitted))
            state.setTimeoutTimestamp(
              if (hold.nonEmpty) hold.map(_._1).max + 1000
              else math.max(wm, 0L) + idleTtlMs)
          }
          ((prev.emitted + 1) to stage).iterator.map(st =>
            FunnelProgress(user, st.toLong, Sessionize.formatSec(q(st - 1) / 1000)))
      }
  }
}
