package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming cohort retention — qw08's first-seen-cohort × weekly-offset
  * grid as an ingest stream. The hard part is that a user's COHORT DAY is a
  * running minimum: a late-arriving earlier event retroactively re-cohorts
  * the user and shifts the week index of every activity day already
  * emitted. Same remedy as qst10/qst16: keyed state remembers the user's
  * seen activity days + current cohort day, and when the cohort decreases
  * the processor re-emits EVERY seen day with its corrected (cohort,
  * week_idx). Both corrections are monotone — cohort_day only decreases,
  * week_idx = (day − cohort)/7 therefore only increases — so the sink-side
  * (min(cohort_day), max(week_idx)) reduction per (user, day) is exact
  * under ANY micro-batch split or arrival order.
  *
  * Scale bounds (100 TB ingest): state per user is the distinct-activity-
  * DAY set (calendar granularity — bounded by the retention horizon, e.g.
  * ≤ 365 entries/user/year; TTLConfig is the horizon knob). The shuffle
  * carries (user_id, epoch_day) pairs only.
  */
object CohortRetention {

  final case class DayRow(userId: Long, day: Int)   // day = epoch days
  final case class DayFlag(userId: Long, day: Int, cohortDay: Int, weekIdx: Long)

  private class CohortProcessor(ttl: TTLConfig)
      extends StatefulProcessor[Long, DayRow, DayFlag] {
    // head = cohort day by construction (kept sorted ascending)
    @transient private var seen: ListState[Int] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[Int]("seen", Encoders.scalaInt, ttl)

    override def handleInputRows(key: Long, rows: Iterator[DayRow],
        timerValues: TimerValues): Iterator[DayFlag] = {
      val prior = scala.collection.mutable.SortedSet.empty[Int]
      val it = seen.get()
      while (it.hasNext) prior += it.next()
      val oldCohort = prior.headOption
      val batchDays = rows.map(_.day).toArray.sorted.distinct
      val all = prior ++ batchDays
      val cohort = all.head
      val out = scala.collection.mutable.ArrayBuffer.empty[DayFlag]
      def flag(d: Int) = DayFlag(key, d, cohort, (d - cohort).toLong / 7)
      if (oldCohort.exists(cohort < _)) {
        // retroactive re-cohort: every seen day's week index shifts — re-emit
        // all of them; the sink-side max(week_idx) absorbs the correction
        all.foreach(d => out += flag(d))
      } else {
        batchDays.foreach(d => if (!prior.contains(d) || oldCohort.isEmpty) out += flag(d))
      }
      seen.put(all.toArray)
      out.iterator
    }
  }

  /** (user_id, day: DATE) stream → per-(user, day) cohort/week flags.
    * Downstream reduces with groupBy(userId, day)
    * .agg(min(cohortDay), max(weekIdx)) — exact under any arrival order. */
  def flagCohorts(events: DataFrame,
      ttl: TTLConfig = TTLConfig.NONE): Dataset[DayFlag] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").as("userId"),
        datediff(col("day"), lit("1970-01-01").cast("date")).as("day"))
      .as[DayRow]
      .groupByKey(_.userId)
      .transformWithState(new CohortProcessor(ttl),
        TimeMode.None(), OutputMode.Update())
  }
}
