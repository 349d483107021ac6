package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming point-in-time feature assembly — pitMulti's STREAMING face
  * (VERDICT r13 Next #8): enrich each observation event, AS IT ARRIVES,
  * with the latest value at-or-before its own event time from each of N
  * independently-updated feature types, without label leakage. The batch
  * forms (qa04's asofJoin chain, qa04b's single-window pitMulti) re-sort
  * the whole corpus per run; at ingest the right shape is PER-KEY STATE:
  * one flatMapGroupsWithState keeps, per user, the (ts, value) of the
  * latest click and purchase seen so far — O(features) state per key,
  * independent of history length — and every view emits its enriched row
  * exactly once, in its own micro-batch.
  *
  * Within a micro-batch the group's events are folded in (event_time,
  * feature-before-observation) order, so qa04's ASOF `<=` tie rule holds
  * exactly (a click AT the view's timestamp is visible); equal-ts
  * duplicate features take the max value, matching qa04's per-(user, ts)
  * pre-aggregation. Across micro-batches the state carries features
  * forward, so the result equals the batch PIT whenever batches arrive in
  * per-key event-time order — the qst25/qst29-class delivery contract; a
  * feature arriving AFTER an already-emitted later-ts view is the
  * streaming world's late-data case and would need a retraction channel
  * no engine's update mode provides. The gate streams the corpus through
  * one batch, where the contract holds vacuously and the oracle is
  * qa04's DuckDB ASOF JOIN verbatim.
  *
  * State is deliberately un-timed-out here (the gate is bounded); a
  * production deployment sets an event-time TTL exactly like qst18's
  * dedup state — features older than the staleness bound are dead state
  * (qa05's argument: too-old features shouldn't match anyway).
  */
object StreamPit {

  final case class Ev(user_id: Long, ts: Timestamp, event_type: String,
    event_id: Long, value: Double)
  /** Per-user carried features: Long.MinValue ts = "none seen". */
  final case class FeatState(click_ts: Long, click_v: Double,
    purch_ts: Long, purch_v: Double)
  final case class PitRow(user_id: Long, event_id: Long, ts: Timestamp,
    click_value: Option[Double], purchase_value: Option[Double])

  def enriched(events: Dataset[Ev]): Dataset[PitRow] = {
    implicit val stateEnc = Encoders.product[FeatState]
    implicit val outEnc = Encoders.product[PitRow]
    implicit val keyEnc = Encoders.scalaLong

    // everything the executor-side fold touches lives INSIDE fn: a
    // reference to an object-level helper would capture the (non-
    // serializable) enclosing object in the closure
    val fn = (user: Long, it: Iterator[Ev],
        state: GroupState[FeatState]) => {
      val None_ = Long.MinValue
      def carry(ts: Long, v: Double, prevTs: Long, prevV: Double): (Long, Double) =
        if (prevTs == None_ || ts > prevTs) (ts, v)
        else if (ts == prevTs) (prevTs, math.max(prevV, v)) // qa04's max per (user, ts)
        else (prevTs, prevV)
      // features sort before observations at equal ts — ASOF `<=` tie rule
      val evs = it.toArray.sortBy(e =>
        (e.ts.getTime, if (e.event_type == "view") 1 else 0))
      var st = state.getOption.getOrElse(FeatState(None_, 0.0, None_, 0.0))
      val out = ArrayBuffer.empty[PitRow]
      evs.foreach { e =>
        e.event_type match {
          case "click" =>
            val (t, v) = carry(e.ts.getTime, e.value, st.click_ts, st.click_v)
            st = st.copy(click_ts = t, click_v = v)
          case "purchase" =>
            val (t, v) = carry(e.ts.getTime, e.value, st.purch_ts, st.purch_v)
            st = st.copy(purch_ts = t, purch_v = v)
          case "view" =>
            out += PitRow(user, e.event_id, e.ts,
              if (st.click_ts == None_) None else Some(st.click_v),
              if (st.purch_ts == None_) None else Some(st.purch_v))
          case _ => () // other event types carry no feature and observe nothing
        }
      }
      state.update(st)
      out.iterator
    }: Iterator[PitRow]

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout())(
        fn(_, _, _))
  }
}
