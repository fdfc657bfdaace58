package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via `flatMapGroupsWithState`: per-key
  * sessionization with an inactivity gap. This is the operator class the
  * reference's "stateless recompute-everything" design cannot express
  * (SURVEY.md §2.9): state is O(active keys), not O(history), and sessions
  * emit as they close instead of on full recompute.
  *
  * Event-time variant: state advances with the watermark
  * (EventTimeTimeout), so late events within the watermark still extend
  * their session and sessions close deterministically.
  */
object Sessionize extends Serializable {

  final case class Event(key: String, ts: java.sql.Timestamp, value: Double)
  /** start/end in epoch MICROS — the native Spark timestamp precision, so
    * emitted sessions carry the exact event timestamps (millis-only state
    * silently truncated sub-milli digits and broke q45 parity). */
  final case class SessionState(start: Long, end: Long, n: Long, sum: Double)
  final case class Session(key: String, start: java.sql.Timestamp,
                           end: java.sql.Timestamp, n_events: Long, sum_value: Double)

  private def toMicros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
  private def toTs(us: Long): java.sql.Timestamp = {
    val ts = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    ts
  }

  /** Sessions separated by more than `gapSeconds` of event-time inactivity,
    * emitted when the watermark passes end + gap. The gap compares
    * SECOND-TRUNCATED timestamps — exactly `TimeSeriesOps.sessionAgg`'s
    * `cast(ts AS long)` rule — so a drained stream reproduces the
    * oracle-checked q45 batch sessions row for row (SessionizeSpec pins
    * it); timestamps themselves stay micro-exact in state. */
  def sessions(events: Dataset[Event], gapSeconds: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    def sec(us: Long) = Math.floorDiv(us, 1000000L)

    def update(key: String, it: Iterator[Event],
               state: GroupState[SessionState]): Iterator[Session] = {
      def emit(s: SessionState) = Session(key, toTs(s.start), toTs(s.end), s.n, s.sum)

      if (state.hasTimedOut) {
        val out = state.getOption.map(emit).iterator
        state.remove()
        out
      } else {
        val batch = it.toSeq.sortBy(e => toMicros(e.ts))
        var cur = state.getOption
        val closed = Seq.newBuilder[Session]
        batch.foreach { e =>
          val t = toMicros(e.ts)
          cur match {
            // within the session's gap-extended interval (a late event
            // within the watermark may precede the current start — it
            // extends the session BACKWARD, not just forward)
            case Some(s) if sec(t) >= sec(s.start) - gapSeconds &&
                            sec(t) <= sec(s.end) + gapSeconds =>
              cur = Some(SessionState(math.min(s.start, t), math.max(s.end, t),
                s.n + 1, s.sum + e.value))
            case Some(s) if sec(t) > sec(s.end) + gapSeconds => // gap exceeded → close, start new
              closed += emit(s)
              cur = Some(SessionState(t, t, 1, e.value))
            case Some(_) => // late event older than start-gap: its own
              // already-closed session (its end+gap has passed)
              closed += Session(key, toTs(t), toTs(t), 1, e.value)
            case None =>
              cur = Some(SessionState(t, t, 1, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp((sec(s.end) + gapSeconds + 1) * 1000L)
        }
        closed.result().iterator
      }
    }

    events
      .withWatermark("ts", "10 seconds")
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
