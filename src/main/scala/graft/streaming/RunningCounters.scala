package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-key running counters on Spark 4's `transformWithState` API (the
  * successor to flatMapGroupsWithState, RocksDB-backed) — the keyed,
  * checkpointable version of the reference's atomic running counters
  * (A7, [sbx/YahooMapper.h:53-99]; Flink ThroughputLogger
  * [ysb/benchmark/flink/YahooBenchmark.scala:109-141]).
  *
  * Emits one (key, cumulative_count, batch_delta) row per key per trigger.
  * State is one long per key; TTL-capable for unbounded key spaces.
  */
object RunningCounters {

  final case class CounterUpdate(key: Long, total: Long, delta: Long)

  private class CounterProcessor extends StatefulProcessor[Long, Long, CounterUpdate] {
    @transient private var count: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Long],
        timerValues: TimerValues): Iterator[CounterUpdate] = {
      val delta = rows.size.toLong
      val total = (if (count.exists()) count.get() else 0L) + delta
      count.update(total)
      Iterator.single(CounterUpdate(key, total, delta))
    }
  }

  /** keys: a stream of key occurrences (e.g. user_ids); output: cumulative
    * count per key per micro-batch. */
  def countByKey(keys: Dataset[Long]): Dataset[CounterUpdate] = {
    implicit val outEnc = Encoders.product[CounterUpdate]
    keys.groupByKey(identity)(Encoders.scalaLong)
      .transformWithState(new CounterProcessor, TimeMode.None(), OutputMode.Update())
  }
}
