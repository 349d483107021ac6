package graft

import org.apache.spark.sql.functions._

/** The census-diff standing check (VERDICT r13 Next #7): plan regressions
  * — a new cartesian, an unallowlisted nested-loop join, an Exchange-count
  * blowup — must fail loudly when `PlanCensus` runs against the checked-in
  * baseline, instead of waiting for a judge diff. This spec pins the diff
  * logic on synthetic censuses AND proves a deliberately-broken REAL plan
  * (a cross join injected into a clean aggregation) is caught end-to-end
  * through the same countPlan → diff path the census main uses.
  */
class CensusDiffSpec extends SparkSpec {

  private val clean = Map("bx" -> 1, "shx" -> 2, "rgx" -> 0, "bhj" -> 1,
    "smj" -> 0, "bnlj" -> 0, "cart" -> 0, "sort" -> 0, "win" -> 0, "gen" -> 0)

  test("identical censuses diff clean") {
    val c = Map("qa" -> clean, "qb" -> clean)
    assert(PlanCensus.diff(c, c, Set.empty) === Nil)
  }

  test("new cartesian is flagged even for a new query") {
    val cur = Map("qa" -> clean, "qnew" -> (clean + ("cart" -> 1)))
    val v = PlanCensus.diff(Map("qa" -> clean), cur, Set.empty)
    assert(v.size === 1 && v.head.startsWith("qnew:") &&
      v.head.contains("CartesianProduct"))
  }

  test("BNLJ outside the allowlist is flagged; inside is not") {
    val cur = Map("qa" -> (clean + ("bnlj" -> 2)))
    assert(PlanCensus.diff(Map("qa" -> clean), cur, Set.empty).size === 1)
    assert(PlanCensus.diff(Map("qa" -> clean), cur, Set("qa")) === Nil)
  }

  test("exchange growth >2x is flagged; jitter under the floor is not") {
    // baseline 3 exchanges → 7 exchanges: 7 > 2*3, flagged
    val grown = clean + ("shx" -> 6)
    assert(PlanCensus.diff(Map("qa" -> clean), Map("qa" -> grown),
      Set.empty).exists(_.contains("Exchange count")))
    // trivial-plan jitter: 0 → 3 stays under the max(baseline,2) floor...
    val zero = clean.map { case (k, _) => k -> 0 }
    val three = zero + ("shx" -> 3)
    assert(PlanCensus.diff(Map("qb" -> zero), Map("qb" -> three),
      Set.empty) === Nil)
    // ...but a real blowup on a trivial plan clears it: 0 → 5
    val five = zero + ("shx" -> 5)
    assert(PlanCensus.diff(Map("qb" -> zero), Map("qb" -> five),
      Set.empty).nonEmpty)
  }

  test("census capture errors are violations") {
    val err = clean + ("shx" -> -1)
    assert(PlanCensus.diff(Map("qa" -> clean), Map("qa" -> err),
      Set.empty).exists(_.contains("errored")))
  }

  test("a deliberately-broken real plan is caught through countPlan") {
    import spark.implicits._
    // the clean shape: one keyed aggregation
    val ev = (1L to 100L).map(i => (i, i % 7)).toDF("id", "k")
    val good = ev.groupBy(col("k")).agg(count(lit(1)).as("n"))
    good.collect()
    val base = Map("qx" ->
      PlanCensus.countPlan(good.queryExecution.executedPlan.toString))
    // the regression: someone cross-joins a corpus-sized frame in
    val broken = good.crossJoin(ev.select(col("id").as("id2")))
      .filter(col("n") >= 0)
    broken.collect()
    val cur = Map("qx" ->
      PlanCensus.countPlan(broken.queryExecution.executedPlan.toString))
    val v = PlanCensus.diff(base, cur, Set.empty)
    assert(v.nonEmpty, "cross-join regression not caught")
    assert(v.exists(s => s.contains("CartesianProduct") ||
      s.contains("BroadcastNestedLoopJoin")), v.mkString("; "))
  }

  test("a deliberately-bad STREAMING plan is caught via StreamPlanCapture") {
    // The streaming census path (VERDICT r14 Next #6): qst* gates are
    // censused on their micro-batch plans, where AQE is off so a bad join
    // strategy is forever. Prove the whole path — listener capture of
    // lastExecution after stop, countPlan over the micro-batch plan, diff —
    // catches a stream-static nested-loop join nobody allowlisted.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    // clean shape: stream-static EQUI join (broadcast hash, no BNLJ)
    val dim = (1L to 50L).map(i => (i, s"d$i")).toDF("k", "name")
    def run(join: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
        name: String): Map[String, Int] = {
      val cap = graft.streaming.StreamPlanCapture.begin(spark)
      val ms = MemoryStream[Long]
      val q = join(ms.toDF().toDF("id"))
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try { ms.addData(1L to 100L: _*); q.processAllAvailable() } finally q.stop()
      val plans = cap.end()
      assert(plans.nonEmpty, "no micro-batch plan captured")
      PlanCensus.countPlan(plans.mkString("\n"))
    }
    val base = Map("qstx" -> run(s => s.join(dim, s("id") === dim("k")), "cen_good"))
    assert(base("qstx").getOrElse("bnlj", 0) === 0, base.toString)
    // the regression: someone makes the stream-static join non-equi
    val cur = Map("qstx" -> run(s => s.join(dim, s("id") >= dim("k")), "cen_bad"))
    val v = PlanCensus.diff(base, cur, Set.empty)
    assert(v.nonEmpty, s"bad streaming join not caught: ${cur.toString}")
    assert(v.exists(s => s.contains("BroadcastNestedLoopJoin") ||
      s.contains("CartesianProduct")), v.mkString("; "))
  }

  test("parseCensus round-trips the main output format") {
    val json = """{"metric":"plan_census","sf_dir":"x","queries":{""" +
      """"qa":{"bx":1,"shx":2,"cart":0},"qb":{"bx":0,"shx":-1,"cart":3}}}"""
    val m = PlanCensus.parseCensus(json)
    assert(m("qa") === Map("bx" -> 1, "shx" -> 2, "cart" -> 0))
    assert(m("qb")("shx") === -1 && m("qb")("cart") === 3)
  }
}
