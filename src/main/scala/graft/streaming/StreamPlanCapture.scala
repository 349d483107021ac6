package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.{StreamExecution, StreamingQueryWrapper}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Micro-batch physical-plan capture for the streaming census (VERDICT r14
  * Next #6). The batch census reads `df.queryExecution.executedPlan` off the
  * frame a gate returns — but a qst* gate's returned frame is just the
  * memory-sink rollup; the plan that matters (where AQE is off, so a bad
  * join strategy is forever) is the micro-batch plan inside the
  * StreamingQuery, which the gate stops before returning.
  *
  * Capture is zero-touch: `onQueryStarted` is delivered synchronously with
  * `DataStreamWriter.start()` (Spark guarantees start events reach
  * same-session listeners before `start()` returns), at which point the
  * query is already registered in `spark.streams`, so the listener stashes
  * the underlying [[StreamExecution]]. `lastExecution` — the final
  * trigger's `IncrementalExecution` — survives `stop()`, so the plans are
  * read AFTER the gate finishes, with no change to any gate's stream
  * lifecycle. A gate that starts N streams (hybrid-trigger emulation)
  * yields N plans.
  */
object StreamPlanCapture {

  final class Handle private[StreamPlanCapture] (spark: SparkSession) {
    private val stashed = ArrayBuffer.empty[StreamExecution]
    private val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit =
        Option(spark.streams.get(e.id)).foreach {
          case w: StreamingQueryWrapper =>
            stashed.synchronized { stashed += w.streamingQuery }: Unit
          case _ => ()
        }
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)

    @volatile private var ended = false

    /** Unregister and return the LAST micro-batch physical plan of every
      * stream started while this handle was live. Empty only if no stream
      * ran a trigger (the census treats that as a capture error).
      * Idempotent: a second call (the census error path's cleanup after a
      * successful end) is a no-op returning Nil. */
    def end(): Seq[String] = {
      if (ended) return Nil
      ended = true
      spark.streams.removeListener(listener)
      stashed.synchronized {
        stashed.toSeq.flatMap(se =>
          Option(se.lastExecution).map(_.executedPlan.toString))
      }
    }
  }

  def begin(spark: SparkSession): Handle = new Handle(spark)
}
