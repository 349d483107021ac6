package graft

import org.apache.spark.sql.SparkSession

/** Machine-load calibration shared by every timing main (Bench, the YSB
  * streaming bench, probe mains that want a clean window).
  *
  * The probe is a fixed-cost SF-independent CPU+shuffle job: its wall
  * time depends only on the machine, so on an idle box it is stable
  * run-to-run and an artifact whose calibration reads 2-3× the
  * historical idle value is self-identifying as a loaded-machine run
  * (the round-3 driver artifact showed a phantom 2.2× "regression" an
  * idle rerun could not reproduce — the pre/post fields adjudicate that
  * case without a rerun).
  *
  * Idle-watch (VERDICT r16 Next #3, extended to the streaming bench in
  * r18 per VERDICT r17 Next #4): nine manual clean-window attempts
  * failed in r16 — a loop should hunt the window, not a human. The
  * watch polls the probe every `SPARK_GRAFT_IDLE_WATCH_POLL_S` seconds
  * (default 120 — the host burst budget refills in ~1-2 min, so polling
  * faster reads the probe's OWN exhaust) and reports ready when a probe
  * reads < 1.15× the idle reference, giving up after
  * `SPARK_GRAFT_IDLE_WATCH_MAX` attempts (default 45, ~1.5 h) so an
  * artifact is always produced. The successful probe's reading is
  * returned so callers can REUSE it as their pre-calibration instead of
  * probing again immediately — two probes closer than a refill window
  * read each other's exhaust, which would defeat the watch (ADVICE r17).
  */
object BenchCal {

  /** Idle reference: a property of the BOX (idle probe wall time at this
    * core count), not of the engine — overridable on different hardware /
    * SPARK_GRAFT_CPUS, and emitted in artifacts so the threshold each was
    * judged against is recorded in it (ADVICE r15). */
  val idleRef: Double =
    sys.env.get("SPARK_GRAFT_CAL_IDLE_REF").map(_.toDouble).getOrElse(1.0)

  /** One timed calibration probe. Callers run one UNTIMED probe first so
    * pre/post measure machine load, not the probe's own codegen/JIT. */
  def calibrate(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    spark.range(0L, 1L << 24, 1, 32).selectExpr("id % 1000003 as k")
      .groupBy("k").count().agg(org.apache.spark.sql.functions.sum("count"))
      .collect()
    (System.nanoTime() - t0) / 1e9
  }

  /** `(attempts, waitedSeconds, lastProbeSeconds)`; attempts == 0 when the
    * watch is disabled (SPARK_GRAFT_IDLE_WATCH unset) and the caller
    * should take its own pre-calibration. */
  final case class Watch(attempts: Int, waitedS: Long, lastProbe: Double) {
    def ran: Boolean = attempts > 0
  }

  /** Poll until a probe reads < 1.15× idleRef or attempts run out; no-op
    * unless SPARK_GRAFT_IDLE_WATCH=1. */
  def idleWatch(spark: SparkSession): Watch = {
    if (!sys.env.get("SPARK_GRAFT_IDLE_WATCH").contains("1"))
      return Watch(0, 0L, -1.0)
    val pollS =
      sys.env.get("SPARK_GRAFT_IDLE_WATCH_POLL_S").map(_.toInt).getOrElse(120)
    val maxTries =
      sys.env.get("SPARK_GRAFT_IDLE_WATCH_MAX").map(_.toInt).getOrElse(45)
    var probe = calibrate(spark)
    var attempts = 1
    var waitedS = 0L
    while (probe >= 1.15 * idleRef && attempts < maxTries) {
      System.err.println(
        f"[bench] idle-watch attempt $attempts: probe $probe%.2f s >= " +
          f"${1.15 * idleRef}%.2f — sleeping $pollS s")
      Thread.sleep(pollS * 1000L)
      waitedS += pollS
      probe = calibrate(spark)
      attempts += 1
    }
    System.err.println(f"[bench] idle-watch: firing after $attempts " +
      f"attempt(s), probe $probe%.2f s")
    Watch(attempts, waitedS, probe)
  }
}
