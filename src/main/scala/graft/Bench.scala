package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...,"queries":{...}}. Each query is forced
  * through the `noop` sink — FULL row production with no serialization cost.
  * NOT `.count()`: under count, Catalyst legally eliminates work that
  * doesn't change cardinality (a left join whose right key is unique, any
  * pure projection), so count-timing silently measured only the scan for
  * that query class — caught in round 5 when qd11's "2.4 s at 30×" pair
  * join turned out to be an eliminated join (true cost ~38 s; the per-row
  * projections qt11/qt14/qe01/qm02 were similarly under-measured). A
  * warmup action runs first so JIT/codegen setup isn't billed to the first
  * query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local("graft-bench", cpus)
    spark.sparkContext.setLogLevel("ERROR")

    // warmup: small scan+agg to absorb codegen/JIT/IO-pool startup
    try graft.sources.Tables.lineitem(spark, sfDir).limit(1000).count()
    catch { case e: Throwable =>
      System.err.println(s"[bench] warmup failed: ${e.getMessage}") }

    // Driver contract times the headline set; SPARK_GRAFT_BENCH_ALL=1 times
    // every gated batch query (local telemetry for finding regressions the
    // 14-query headline set wouldn't surface). The all mode still excludes
    // the streaming run-to-completion queries (they time Structured
    // Streaming machinery, not a batch plan) and the deliberate O(N²)
    // small-SF-only baselines, which must never run above test scale.
    val smallSfOnly = Set("qd05_embedding_dup", "qs01_knn_brute")
    val headline =
      if (sys.env.get("SPARK_GRAFT_BENCH_ALL").contains("1"))
        Registry.all.filterNot(q =>
          q.name.startsWith("qst") || smallSfOnly(q.name))
      else Registry.all.filter(_.headline)
    // Fixed-cost calibration probe (SF-independent CPU+shuffle work), timed
    // before and after the query passes. Its wall time depends only on the
    // machine: on an idle box it is stable run-to-run, so a bench artifact
    // whose calibration is 2-3× the historical value is self-identifying as
    // a loaded-machine run (the round-3 driver artifact showed a phantom
    // 2.2× "regression" that an idle rerun could not reproduce — this field
    // adjudicates that case without a rerun).
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 1L << 24, 1, 32).selectExpr("id % 1000003 as k")
        .groupBy("k").count().agg(org.apache.spark.sql.functions.sum("count"))
        .collect()
      (System.nanoTime() - t0) / 1e9
    }
    calibrate() // untimed: absorb the probe's own codegen/JIT so pre/post
                // measure machine load, not first-pass warmup
    // Idle-watch mode (VERDICT r16 Next #3): nine manual clean-window
    // attempts failed in r16 — a loop should hunt the window, not a
    // human. With SPARK_GRAFT_IDLE_WATCH=1 the run polls the calibration
    // probe every SPARK_GRAFT_IDLE_WATCH_POLL_S seconds (default 120 —
    // the burst budget refills in ~1-2 min, so polling faster reads the
    // probe's own exhaust) and fires the query passes only when a probe
    // reads < 1.15× idle_ref, giving up after
    // SPARK_GRAFT_IDLE_WATCH_MAX attempts (default 45, ~1.5 h) and
    // running anyway so an artifact is always produced. Attempts and
    // seconds waited are recorded in the artifact.
    val idleRefEnv =
      sys.env.get("SPARK_GRAFT_CAL_IDLE_REF").map(_.toDouble).getOrElse(1.0)
    var watchAttempts = 0
    var watchWaitedS = 0L
    if (sys.env.get("SPARK_GRAFT_IDLE_WATCH").contains("1")) {
      val pollS =
        sys.env.get("SPARK_GRAFT_IDLE_WATCH_POLL_S").map(_.toInt).getOrElse(120)
      val maxTries =
        sys.env.get("SPARK_GRAFT_IDLE_WATCH_MAX").map(_.toInt).getOrElse(45)
      var probe = calibrate()
      watchAttempts = 1
      while (probe >= 1.15 * idleRefEnv && watchAttempts < maxTries) {
        System.err.println(
          f"[bench] idle-watch attempt $watchAttempts: probe $probe%.2f s >= " +
            f"${1.15 * idleRefEnv}%.2f — sleeping $pollS s")
        Thread.sleep(pollS * 1000L)
        watchWaitedS += pollS
        probe = calibrate()
        watchAttempts += 1
      }
      System.err.println(f"[bench] idle-watch: firing after $watchAttempts " +
        f"attempt(s), probe $probe%.2f s")
    }
    val calPre = calibrate()
    // Best-of-2 per query: a single cold pass bills one-time JVM/codegen/
    // page-cache effects to whichever query hits them first (round-1 driver
    // run measured 23.7 s where warm local runs measured 14.5 s). Two timed
    // passes, keep the faster — still honest end-to-end plan execution. Both
    // pass times are emitted (`passes`) so inter-pass variance is visible in
    // the artifact.
    val results = headline.map { q =>
      def timed(): Double = {
        val t0 = System.nanoTime()
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val passes = try Seq(timed(), timed())
      catch { case e: Throwable =>
        System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}"); Seq(-1.0) }
      q.name -> passes
    }
    // r15 established the throttle mechanism: the query passes themselves
    // drain a host burst budget that refills in ~1–2 min, so an IMMEDIATE
    // post-calibration reads the run's own exhaust, not ambient load
    // (every r15 post-cal was degraded while pre-cals minutes later read
    // clean). An optional cooldown lets one sitting produce both
    // calibrations clean when the box itself is idle; the seconds slept
    // are recorded in the artifact so the gap is disclosed, not hidden
    // (VERDICT r15 #4).
    val cooldownS =
      sys.env.get("SPARK_GRAFT_CAL_COOLDOWN_S").map(_.toInt).getOrElse(0)
    if (cooldownS > 0) Thread.sleep(cooldownS * 1000L)
    val calPost = calibrate()
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v.min }
      .mkString("{", ",", "}")
    val ps = results.map { case (k, v) => "\"" + k + "\":" + v.mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val total = results.map(_._2.min).filter(_ >= 0).sum
    // Self-gate (VERDICT r14 Next #3): the probe's idle wall time on this
    // box is ~1.0 s (r11-r13 clean anchors: 1.00-1.07; every throttled r14
    // artifact: 2.15-3.02). If EITHER calibration exceeds 1.5× that idle
    // reference, the artifact stamps itself degraded so downstream tooling
    // never quotes its timings unqualified — the load was present during
    // (post) or before (pre) the query passes either way.
    // calIdleRef is a property of the BOX (idle probe wall time at this
    // core count), not of the engine — overridable via env on different
    // hardware / SPARK_GRAFT_CPUS, and emitted in the JSON so the
    // threshold each artifact was judged against is recorded in it
    // (ADVICE r15).
    val calIdleRef = idleRefEnv
    val degraded = math.max(calPre, calPost) > 1.5 * calIdleRef
    println(s"""{"metric":"headline_total","value":$total,"unit":"sec","queries":$qs,"passes":$ps,"calibration":{"pre":$calPre,"post":$calPost,"idle_ref":$calIdleRef,"cooldown_s":$cooldownS,"idle_watch_attempts":$watchAttempts,"idle_watch_waited_s":$watchWaitedS},"degraded":$degraded,"sf":"$sfDir"}""")
    spark.stop()
  }
}
