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
    // The listener is session-global: EVERY stream started while the
    // handle is live is stashed. The census runs gates sequentially, one
    // stream set per handle — a concurrent or leaked background stream
    // would silently pollute the censused plan counts, so fail loudly at
    // begin() if anything is already running (ADVICE r15).
    require(spark.streams.active.isEmpty,
      "StreamPlanCapture.begin() with streams already active — " +
        "census rows would mix plans from: " +
        spark.streams.active.map(q => s"${q.name}/${q.id}").mkString(", "))
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

    // inner BATCH plans contributed by foreachBatch gates (see
    // [[StreamPlanCapture.contribute]]); latest per key, so the censused
    // counts are stable in the trigger count
    private val extra =
      scala.collection.mutable.LinkedHashMap.empty[String, String]
    private[StreamPlanCapture] def addExtra(key: String, plan: String): Unit =
      extra.synchronized { extra(key) = plan }: Unit

    /** Unregister and return the LAST micro-batch physical plan of every
      * stream started while this handle was live, plus any contributed
      * foreachBatch inner plans. Empty only if no stream ran a trigger
      * (the census treats that as a capture error). Idempotent: a second
      * call (the census error path's cleanup after a successful end) is a
      * no-op returning Nil. */
    def end(): Seq[String] = {
      if (ended) return Nil
      ended = true
      current.compareAndSet(this, null): Unit
      spark.streams.removeListener(listener)
      stashed.synchronized {
        stashed.toSeq.flatMap(se =>
          Option(se.lastExecution).map(_.executedPlan.toString))
      } ++ extra.synchronized { extra.values.toSeq }
    }
  }

  // the live handle, if any (census runs gates sequentially; begin()
  // asserts no concurrent streams, so one live handle is an invariant)
  private val current =
    new java.util.concurrent.atomic.AtomicReference[Handle](null)

  def begin(spark: SparkSession): Handle = {
    val h = new Handle(spark)
    current.set(h)
    h
  }

  /** Census channel for gates whose per-trigger work runs as BATCH
    * queries inside foreachBatch — those plans never appear in any
    * StreamExecution's `lastExecution`, so without this the census would
    * see only the source→sink shell and miss the join strategy that
    * actually serves each trigger (qst43's pruned store join). Latest
    * plan per key wins; `plan` is by-name so gates pay nothing when no
    * census capture is live (the Verify/Bench path). */
  def contribute(key: String, plan: => String): Unit =
    Option(current.get()).foreach(_.addExtra(key, plan))
}
