package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming event-sequence mining: the stateful counterpart of
  * `analytics.Behavior.eventNgrams`. Per-user state is only the LAST n−1
  * event types plus a sequence high-water mark — O(active keys · n), not
  * O(history) — and every incoming event emits at most one n-gram, so a
  * drained stream reproduces the batch lead-window extraction row for row
  * (StreamingNgramsSpec pins stream ≡ batch across batch splits).
  *
  * Ordering contract: events must arrive per-user in increasing `seq`
  * order ACROSS batches (the append-ingest contract — a monotone event_id
  * or log offset). Within a batch any order is fine (sorted here); a
  * cross-batch regression THROWS rather than silently mining a reordered
  * sequence.
  */
object StreamingNgrams extends Serializable {

  final case class Ev(user: Long, seq: Long, etype: String)
  final case class Tail(items: Seq[String], lastSeq: Long)
  final case class Gram(user: Long, ngram: String)

  def ngrams(events: Dataset[Ev], n: Int): Dataset[Gram] = {
    require(n >= 2, s"n must be ≥ 2, got $n")
    val spark = events.sparkSession
    import spark.implicits._

    def update(user: Long, it: Iterator[Ev],
               state: GroupState[Tail]): Iterator[Gram] = {
      val batch = it.toSeq.sortBy(_.seq)
      var tail = state.getOption.getOrElse(Tail(Nil, Long.MinValue))
      val out = Seq.newBuilder[Gram]
      batch.foreach { e =>
        require(e.seq > tail.lastSeq,
          s"out-of-order event for user $user: seq ${e.seq} after ${tail.lastSeq}")
        val window = (tail.items :+ e.etype).takeRight(n)
        if (window.size == n) out += Gram(user, window.mkString(">"))
        tail = Tail(window.takeRight(n - 1), e.seq)
      }
      state.update(tail)
      out.result().iterator
    }

    events.groupByKey(_.user)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }
}
