package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Inactivity-timeout session summaries via transformWithState TIMERS — the
  * capability the declarative `session_window` cannot express: emit exactly
  * ONE summary row per session, only when the watermark PROVES the session
  * over, while keeping arbitrary per-session state in between (running
  * count, value sum, first/last event time).
  *
  * Mechanics: each input batch folds into the keyed ValueState IN EVENT-TIME
  * ORDER, closing a session inline whenever the next event lands more than
  * `gap` after the open session's last event — so two logical sessions whose
  * events arrive in the same micro-batch emit as two summaries, and session
  * boundaries depend only on event time, never on where a replay happens to
  * cut micro-batches. The surviving open session re-arms a single event-time
  * timer at `last event time + gap` (previous timers deleted — one live
  * timer per key); when the watermark passes it,
  * [[SessionTimeout.Summarizer.handleExpiredTimer]] fires: the summary row
  * emits and the state clears, so a later event starts a fresh session.
  * State per key is one fixed-size struct + one timer — bounded by active
  * keys, expired exactly by the timer, RocksDB-backed at scale, and restored
  * (timers included) from the checkpoint on restart.
  *
  * Late-data caveat: an event older than the open session's first event
  * folds into that session (extending it backwards) rather than opening a
  * separate earlier one — the watermark bounds how stale such events can be,
  * and a summary-correctness purist should set the watermark ≤ gap. */
object SessionTimeout {

  /** Per-user open-session accumulator. */
  case class SessState(n: Long, total: Double, firstMs: Long, lastMs: Long)

  /** One row per CLOSED session. */
  case class SessionSummary(user_id: Long, n_events: Long, total: Double,
                            start_ms: Long, end_ms: Long)

  /** (user, event-time ms, value) — the reduced input shape. */
  case class Ev(user_id: Long, ts_ms: Long, value: Double)

  class Summarizer(gapMs: Long)
      extends StatefulProcessor[Long, Ev, SessionSummary] {
    @transient private var st: ValueState[SessState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[SessState]("sess",
        Encoders.product[SessState], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[Ev],
        tv: TimerValues): Iterator[SessionSummary] = {
      // Sort by event time (value as a deterministic tiebreaker so the
      // double sum folds in one fixed order): session boundaries — and the
      // emitted summaries — must depend only on event time, not on how a
      // replay cuts micro-batches.
      val sorted = rows.toArray.sortBy(e => (e.ts_ms, e.value))
      var open: Option[SessState] = if (st.exists()) Some(st.get()) else None
      val closed = scala.collection.mutable.ArrayBuffer.empty[SessionSummary]
      for (e <- sorted) open = open match {
        case Some(s) if e.ts_ms > s.lastMs + gapMs =>
          // gap exceeded inside the batch: close the open session NOW (the
          // timer-based close would have merged them) and start fresh
          closed += SessionSummary(user, s.n, s.total, s.firstMs, s.lastMs)
          Some(SessState(1L, e.value, e.ts_ms, e.ts_ms))
        case Some(s) =>
          Some(SessState(s.n + 1, s.total + e.value,
            math.min(s.firstMs, e.ts_ms), math.max(s.lastMs, e.ts_ms)))
        case None =>
          Some(SessState(1L, e.value, e.ts_ms, e.ts_ms))
      }
      open.foreach { s =>
        st.update(s)
        // one live timer per key: re-arm at latest activity + gap
        getHandle.listTimers().foreach(getHandle.deleteTimer)
        getHandle.registerTimer(s.lastMs + gapMs)
      }
      closed.iterator
    }

    override def handleExpiredTimer(user: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[SessionSummary] = {
      val out =
        if (st.exists()) {
          val s = st.get()
          Iterator.single(SessionSummary(user, s.n, s.total, s.firstMs, s.lastMs))
        } else Iterator.empty
      st.clear()
      out
    }
  }

  /** Streaming leg: (user_id, ts, value) frame → closed-session summaries.
    * The watermark on `ts` both bounds late data and drives timer expiry. */
  def summaries(events: DataFrame, gapMs: Long,
                watermark: String = "10 minutes"): Dataset[SessionSummary] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", watermark)
      .select(col("user_id").cast("long").as("user_id"),
        unix_millis(col("ts")).as("ts_ms"), col("value").cast("double").as("value"))
      .as[Ev]
      .groupByKey(_.user_id)
      .transformWithState(new Summarizer(gapMs), TimeMode.EventTime(),
        OutputMode.Append())
  }
}
