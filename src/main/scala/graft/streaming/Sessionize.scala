package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time sessionization with custom keyed state — the
  * `flatMapGroupsWithState` + `EventTimeTimeout` surface (SURVEY.md §2.5):
  * a session closes either when a later event in the same batch exceeds the
  * inactivity gap, or when the WATERMARK passes the session's end + gap and
  * the state times out. Emitted sessions are final (Append mode); per-key
  * state is a constant-size (start, end, count) triple.
  *
  * The declarative `session_window` covers plain windowed aggregates
  * (StreamingSpec); this operator is the escape hatch for session logic a
  * groupBy can't express (custom merge rules, per-session payloads).
  */
object Sessionize {

  case class SessionOut(user_id: Long, session_start: Timestamp,
                        session_end: Timestamp, n_events: Long)

  case class SessState(start: Long, end: Long, n: Long)

  /** @param events streaming frame with `user_id` (long) and `ts` (timestamp)
    * @param gapMs inactivity gap closing a session
    * @param watermark lateness horizon (drives the timeout clock) */
  def sessions(events: DataFrame, gapMs: Long = 30L * 60 * 1000,
               watermark: String = "10 minutes"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("ts"))
      .withWatermark("ts", watermark)
      .as[(Long, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid, rows, state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(uid, new Timestamp(s.start), new Timestamp(s.end), s.n))
          } else {
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            // Bound: this sorts ONE key's rows from ONE micro-batch (state
            // itself stays O(1) — a single open session). The trigger
            // interval bounds batch volume; a key hot enough to overflow a
            // task here needs ingest-side partial sessionization (pre-reduce
            // to per-(key, trigger) min/max/count spans) before this stage.
            rows.map(_._2.getTime).toSeq.sorted.foreach { t =>
              cur = cur match {
                case Some(s) if t - s.end <= gapMs =>
                  // math.min on start: a late CROSS-BATCH event (above the
                  // watermark, earlier than the open session's start) merges
                  // in and must extend the span BACKWARD — without it the
                  // event is counted in n but excluded from the emitted
                  // span (review finding; SessionTimeout.scala handles the
                  // same case with the same min).
                  Some(SessState(math.min(s.start, t), math.max(s.end, t), s.n + 1))
                case Some(s) => // gap exceeded within the batch: session final
                  closed ::= SessionOut(uid, new Timestamp(s.start), new Timestamp(s.end), s.n)
                  Some(SessState(t, t, 1))
                case None => Some(SessState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
