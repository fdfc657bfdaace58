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
object Sessionize {

  final case class Event(key: String, ts: java.sql.Timestamp, value: Double)
  final case class SessionState(start: Long, end: Long, n: Long, sum: Double)
  final case class Session(key: String, start: java.sql.Timestamp,
                           end: java.sql.Timestamp, n_events: Long, sum_value: Double)

  /** Sessions separated by ≥ `gapMs` of event-time inactivity. Emits a
    * session when the watermark passes its end + gap. */
  def sessions(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._

    def update(key: String, it: Iterator[Event],
               state: GroupState[SessionState]): Iterator[Session] = {
      def emit(s: SessionState) = Session(key,
        new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end), s.n, s.sum)

      if (state.hasTimedOut) {
        val out = state.getOption.map(emit).iterator
        state.remove()
        out
      } else {
        val batch = it.toSeq.sortBy(_.ts.getTime)
        var cur = state.getOption
        val closed = Seq.newBuilder[Session]
        batch.foreach { e =>
          val t = e.ts.getTime
          cur match {
            // within the session's gap-extended interval (a late event
            // within the watermark may precede the current start — it
            // extends the session BACKWARD, not just forward)
            case Some(s) if t >= s.start - gapMs && t <= s.end + gapMs =>
              cur = Some(SessionState(math.min(s.start, t), math.max(s.end, t),
                s.n + 1, s.sum + e.value))
            case Some(s) if t > s.end + gapMs => // gap exceeded → close, start new
              closed += emit(s)
              cur = Some(SessionState(t, t, 1, e.value))
            case Some(_) => // late event older than start-gap: its own
              // already-closed session (its end+gap has passed)
              closed += Session(key, new java.sql.Timestamp(t),
                new java.sql.Timestamp(t), 1, e.value)
            case None =>
              cur = Some(SessionState(t, t, 1, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.end + gapMs)
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
