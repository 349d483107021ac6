package graft

/** Registry-wide physical-plan census (VERDICT r12 Next #8): per-query
  * counts of the plan nodes that define scale behavior — broadcast vs
  * shuffle exchanges, join strategies, sorts, windows, generates — dumped
  * as one JSON object so plan-shape regressions across the whole registry
  * self-identify round over round the way bench regressions already do
  * (a query silently flipping from broadcast to sort-merge join, or
  * growing an extra Exchange, shows up as a diff against the previous
  * round's checked-in census).
  *
  * Usage: PLAN_CENSUS output goes to stdout (single JSON line, `"metric":
  * "plan_census"`); SPARK_GRAFT_SF_DIR selects the data dir (plan shapes
  * are size-dependent through AQE thresholds, so diffs must compare
  * censuses taken at the SAME sf). Streaming-eager queries execute while
  * being captured (their returned frame is the batch rollup over the
  * sink table); the handful whose capture is meaningless are skipped with
  * PlanLintSpec's exact skip set.
  */
object PlanCensus {
  // mirror of PlanLintSpec.skip — side-effecting captures with no stable plan
  private val skip = Set("qst01_stream_tumbling", "qst02_stream_ysb",
    "qst03_stream_dedup", "qst04_stream_watermark_append",
    "qst05_replay_source_ysb", "qst06_stream_session",
    "qst07_stream_interval_join", "qst08_stream_running_counters",
    "qst09_stream_outer_join", "qst10_stream_neardup",
    "qst11_stream_contamination", "qst12_stream_pii",
    "qst13_stream_sample", "qst14_stream_quality", "qst15_stream_sessions",
    "qx02_bucketed_join")

  private val metrics: Seq[(String, String)] = Seq(
    "bx" -> "BroadcastExchange",          // broadcast exchanges
    "shx" -> "Exchange hashpartitioning", // hash shuffles
    "rgx" -> "Exchange rangepartitioning",// range shuffles (global sorts)
    "bhj" -> "BroadcastHashJoin",
    "smj" -> "SortMergeJoin",
    "bnlj" -> "BroadcastNestedLoopJoin",
    "cart" -> "CartesianProduct",
    "sort" -> "Sort [",
    "win" -> "Window [",
    "gen" -> "Generate ")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.local("graft-plan-census",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")
    val rows = Registry.all.filterNot(q => skip(q.name)).sortBy(_.name).map { q =>
      val counts =
        try {
          val df = q.run(spark, sfDir)
          // Execute BEFORE capturing: with AQE the un-executed plan is the
          // initial (isFinalPlan=false) one — broadcast-vs-SMJ flips and
          // runtime-coalesced exchanges only appear in the final plan
          // (ADVICE r13; same finalize-then-read pattern as PlanLintSpec).
          // Gate results are oracle-bounded, so collect() is driver-safe.
          df.collect(): Unit
          val plan = df.queryExecution.executedPlan.toString
          metrics.map { case (k, pat) =>
            k -> plan.sliding(pat.length).count(_ == pat)
          }
        } catch {
          case e: Throwable =>
            System.err.println(s"[census] ${q.name} failed: ${e.getMessage}")
            metrics.map { case (k, _) => k -> -1 }
        }
      s""""${q.name}":{${counts.map { case (k, n) => s""""$k":$n""" }.mkString(",")}}"""
    }
    println(s"""{"metric":"plan_census","sf_dir":"$sfDir",""" +
      s""""queries":{${rows.mkString(",")}}}""")
    spark.stop()
  }
}
