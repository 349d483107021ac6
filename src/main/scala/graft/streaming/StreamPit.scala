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
  * per-key event-time order AND every equal-ts feature/observation pair
  * lands in the same micro-batch (or feature-first) — event-time order
  * alone is not enough for the `<=` tie rule: a feature with ts EQUAL to
  * a view's ts but delivered in a later batch diverges from the batch
  * ASOF oracle because the view already emitted without it (ADVICE r14);
  * within one batch the feature-before-observation sort resolves the tie
  * correctly. This is the qst25/qst29-class delivery contract; a feature
  * arriving AFTER an already-emitted later-ts view is the streaming
  * world's late-data case and would need a retraction channel no
  * engine's update mode provides. The gate streams the corpus through
  * event-time-ordered micro-batches (splits chosen between distinct
  * timestamps, so the equal-ts clause holds by construction) and the
  * oracle is qa04's DuckDB ASOF JOIN verbatim.
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
      // exact MICROsecond epoch: getTime is ms-truncated, and the corpus
      // carries µs precision — a same-ms view/click pair ordered by ms
      // would diverge from the µs-exact batch ASOF oracle
      def us(t: Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
      def carry(ts: Long, v: Double, prevTs: Long, prevV: Double): (Long, Double) =
        if (prevTs == None_ || ts > prevTs) (ts, v)
        else if (ts == prevTs) (prevTs, math.max(prevV, v)) // qa04's max per (user, ts)
        else (prevTs, prevV)
      // features sort before observations at equal ts — ASOF `<=` tie rule
      val evs = it.toArray.sortBy(e =>
        (us(e.ts), if (e.event_type == "view") 1 else 0))
      var st = state.getOption.getOrElse(FeatState(None_, 0.0, None_, 0.0))
      val out = ArrayBuffer.empty[PitRow]
      evs.foreach { e =>
        e.event_type match {
          case "click" =>
            val (t, v) = carry(us(e.ts), e.value, st.click_ts, st.click_v)
            st = st.copy(click_ts = t, click_v = v)
          case "purchase" =>
            val (t, v) = carry(us(e.ts), e.value, st.purch_ts, st.purch_v)
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

  /** qa05-shaped TTL row: no `age_us` — a TTL'd system has, BY DESIGN,
    * forgotten the feature once it is stale, so the exact age of a stale
    * match is the one qa05 column streaming-with-TTL cannot reproduce
    * (the state that would compute it is the dead state the TTL exists
    * to drop). Everything a model reads survives: the fresh flag and the
    * freshness-gated value. */
  final case class TtlRow(user_id: Long, event_id: Long, ts: Timestamp,
    click_value: Option[Double], fresh: Boolean)
  /** TTL'd click state. */
  final case class ClickState(click_ts: Long, click_v: Double)

  /** [[enriched]] with qa05's staleness bound as EVENT-TIME state TTL
    * (VERDICT r14 #5): the carried click expires when the watermark
    * passes `click_ts + tolUs` — features older than the staleness
    * tolerance are dead state, so per-key state is bounded by arrival
    * rate × tolerance instead of the distinct-user universe (the qst18/
    * qst19 treatment of qst03/qst16).
    *
    * Expiry is SEMANTICS-PRESERVING under the ordered-replay delivery
    * contract, not an approximation: the timeout fires only once the
    * watermark exceeds `click_ts + tol`, and any view that arrives after
    * that has `ts > watermark ≥ click_ts + tol` — it would have read the
    * feature as stale (null value, fresh=false) even if the state were
    * still there. A view with `ts ≤ watermark` is the late-data case the
    * delivery contract already excludes. View-only users store NO state
    * at all (nothing to expire, nothing to leak). The timeout millisecond
    * rounds UP (`ceil` to ms) so ms-granular expiry can never fire before
    * the µs-exact staleness boundary. Input must carry `withWatermark` —
    * event-time timeouts require it. */
  def enrichedTtl(events: Dataset[Ev], tolUs: Long): Dataset[TtlRow] = {
    implicit val stateEnc = Encoders.product[ClickState]
    implicit val outEnc = Encoders.product[TtlRow]
    implicit val keyEnc = Encoders.scalaLong

    val fn = (user: Long, it: Iterator[Ev],
        state: GroupState[ClickState]) => {
      if (state.hasTimedOut) {
        state.remove() // stale click: dead state, drop it
        Iterator.empty
      } else {
        val None_ = Long.MinValue
        def us(t: Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
        val evs = it.toArray.sortBy(e =>
          (us(e.ts), if (e.event_type == "view") 1 else 0))
        var st = state.getOption.getOrElse(ClickState(None_, 0.0))
        val out = ArrayBuffer.empty[TtlRow]
        evs.foreach { e =>
          e.event_type match {
            case "click" =>
              val t = us(e.ts)
              if (st.click_ts == None_ || t > st.click_ts) st = ClickState(t, e.value)
              else if (t == st.click_ts) st = st.copy(click_v = math.max(st.click_v, e.value))
            case "view" =>
              val fresh = st.click_ts != None_ && us(e.ts) - st.click_ts <= tolUs
              out += TtlRow(user, e.event_id, e.ts,
                if (fresh) Some(st.click_v) else None, fresh)
            case _ => ()
          }
        }
        if (st.click_ts != None_) {
          // ceil to ms: never expire before the µs-exact boundary
          val toMs = (st.click_ts + tolUs + 999L) / 1000L
          if (toMs > state.getCurrentWatermarkMs()) {
            state.update(st); state.setTimeoutTimestamp(toMs)
          } else if (state.exists) {
            // the carried click is ALREADY stale vs the watermark (a key
            // that received data this batch skips its pending timeout, and
            // re-arming a past timestamp throws) — every in-contract
            // future view has ts > watermark ≥ click_ts + tol and would
            // read it as stale anyway: dead state, drop it now
            state.remove()
          }
        }
        out.iterator
      }
    }: Iterator[TtlRow]

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.EventTimeTimeout())(fn(_, _, _))
  }
}
