package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Mutable-session accumulator for the streaming variant (top-level:
  * encoder codegen requires a public constructor).
  */
case class SessState(start: Long, last: Long, n: Long)

/** Gap-based sessionization — the canonical event-stream enrichment a
  * training-data pipeline needs on interaction logs (north-star
  * "batch analytics" surface; no reference analog — the reference has
  * no per-user state at all).
  *
  * Batch form: pure window functions (lag → gap flag → running sum),
  * one shuffle on user_id, fully codegen'd, oracle-expressible.
  * Streaming form: `flatMapGroupsWithState` with event-time timeout —
  * the Structured Streaming custom-state surface (SURVEY §2 mapping
  * for KeyValueGroupedDataset state ops).
  */
object Sessionize {

  /** Assign 1-based session sequence numbers per user: a new session
    * starts when the gap since the previous event exceeds
    * `gapSeconds`. `tieBreak` totalizes the order when timestamps
    * collide (second-truncated data), keeping the numbering
    * deterministic.
    */
  def sessions(events: DataFrame, userCol: Column, tsEpoch: Column,
               gapSeconds: Long, tieBreak: Column): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(tsEpoch.asc, tieBreak.asc)
    val newSession = when(
      tsEpoch - lag(tsEpoch, 1).over(byUser) > gapSeconds, 1L)
      .otherwise(when(lag(tsEpoch, 1).over(byUser).isNull, 1L).otherwise(0L))
    events.withColumn("session_seq",
      sum(newSession).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
  }

  // ---- streaming variant ----

  case class Ev(user_id: Long, ts_epoch: Long, event_id: Long)
  case class SessionOut(user_id: Long, session_start: Long,
                        session_end: Long, n_events: Long)

  /** Emit one record per CLOSED session (closed by a gap or by
    * event-time timeout once the watermark passes).
    */
  def streamingSessions(events: Dataset[Ev], gapSeconds: Long): Dataset[SessionOut] = {
    implicit val stateEnc = Encoders.product[SessState]
    implicit val outEnc = Encoders.product[SessionOut]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[Ev], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(user, s.start, s.last, s.n))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts_epoch)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.ts_epoch - s.last <= gapSeconds =>
                  // a LATE cross-batch event (ts below the session's
                  // last, still inside the watermark) must not move the
                  // session end backward or re-arm the timeout in the
                  // past — extend the span, never shrink it
                  cur = Some(SessState(math.min(s.start, e.ts_epoch),
                    math.max(s.last, e.ts_epoch), s.n + 1))
                case Some(s) =>
                  closed ::= SessionOut(user, s.start, s.last, s.n)
                  cur = Some(SessState(e.ts_epoch, e.ts_epoch, 1))
                case None =>
                  cur = Some(SessState(e.ts_epoch, e.ts_epoch, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // replaying HISTORICAL data (catch-up, backfill) can
              // advance the watermark past a session's natural close
              // time within one burst of micro-batches; a timeout
              // below the watermark throws — clamp to just past it,
              // which fires on the next trigger (the session IS
              // closed, the watermark already proves it)
              val target = (s.last + gapSeconds) * 1000
              val wm = state.getCurrentWatermarkMs()
              state.setTimeoutTimestamp(math.max(target, wm + 1))
            }
            closed.reverseIterator
          }
      }
  }
}
