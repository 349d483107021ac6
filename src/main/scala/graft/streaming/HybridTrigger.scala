package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** W5: the reference's Flink path registers a custom
  * EventAndProcessingTimeTrigger — early FIRE on a processing-time interval
  * while a window is open, then FIRE_AND_PURGE when the event-time watermark
  * passes window end [ysb/benchmark/flink/YahooBenchmark.scala:73-104].
  *
  * Spark has no per-window trigger hooks, so the faithful emulation is a
  * DUAL query over the same stream:
  *
  *  - the **early** query runs in update mode with a processing-time
  *    trigger: each trigger emits the corrected partial aggregate for every
  *    window touched in the batch — Flink's early FIREs;
  *  - the **final** query runs in append mode with a watermark: each window
  *    emits exactly once, when the watermark passes its end, and its state
  *    is evicted — Flink's FIRE_AND_PURGE.
  *
  * The pair of sinks together carries the Flink firing sequence; the
  * invariant (asserted in StreamingSpec) is that a closed window's final
  * append row equals the last early update row for that window.
  */
object HybridTrigger {

  /** Build the (early, final) windowed-count pair over one event stream.
    * Start `early` with `outputMode("update")` (+ a ProcessingTime trigger
    * for the FIRE cadence) and `fin` with `outputMode("append")`. */
  def dual(events: DataFrame, tsCol: String, keyCol: String,
      windowLength: String, watermark: String): (DataFrame, DataFrame) = {
    def agg(df: DataFrame): DataFrame =
      df.groupBy(window(col(tsCol), windowLength), col(keyCol))
        .count()
        .select(col("window.start").as("w_start"), col(keyCol), col("count"))
    val early = agg(events)
    val fin = agg(events.withWatermark(tsCol, watermark))
    (early, fin)
  }
}
