package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

class WindowsSpec extends SparkSpec {

  test("tumbling window partitions every event exactly once") {
    val out = Registry.byName("qw01_tumbling_window").run(spark, sf)
    val total = Tables.events(spark, sf).count()
    assert(out.agg(sum("n")).collect()(0).getLong(0) === total)
  }

  test("sliding 1d/12h window counts every event exactly twice") {
    val out = Registry.byName("qw02_sliding_window").run(spark, sf)
    val total = Tables.events(spark, sf).count()
    assert(out.agg(sum("n")).collect()(0).getLong(0) === 2 * total)
  }

  test("session windows: ends exceed starts by ≥ gap, per-user events conserved") {
    val out = Registry.byName("qw03_session_window").run(spark, sf)
    assert(out.filter(col("s_end") <= col("s_start")).count() === 0)
    val total = Tables.events(spark, sf).count()
    assert(out.agg(sum("n")).collect()(0).getLong(0) === total)
  }

  test("running agg final value equals group total") {
    val out = Registry.byName("qw04_running_agg").run(spark, sf)
    val finals = out.groupBy("user_id").agg(
      max(struct(col("running_n"), col("running_value"))).as("fin"),
      count(lit(1)).as("n_rows"))
    assert(finals.filter(col("fin.running_n") =!= col("n_rows")).count() === 0)
  }
}

class SessionSequencesSpec extends SparkSpec {

  test("qw07 sequences: planted timeline splits sessions and hashes order") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // reuse the gated query over sf events is covered by the driver gate;
    // here: content check — each session's hash is md5 of its type string
    val out = Registry.byName("qw07_session_sequences").run(spark, sf)
    // independent mirror: gaps-and-islands + manual md5 over collected rows
    val events = Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def micros(t: java.sql.Timestamp): Long =
      t.getTime / 1000 * 1000000L + t.getNanos / 1000
    val expected = events.groupBy(_._1).flatMap { case (uid, rows) =>
      val sorted = rows.sortBy(r => (micros(r._2), r._3))
      val sessions = scala.collection.mutable.ArrayBuffer[scala.collection.mutable.ArrayBuffer[(Long, java.sql.Timestamp, Long, String)]]()
      sorted.foreach { r =>
        if (sessions.isEmpty ||
          micros(r._2) - micros(sessions.last.last._2) > 30L * 60 * 1000000)
          sessions += scala.collection.mutable.ArrayBuffer(r)
        else sessions.last += r
      }
      sessions.map { sess =>
        (uid, sess.head._2, sess.size.toLong,
          md5hex(sess.map(_._4).mkString(" ")))
      }
    }.toSet
    val got = out.collect()
      .map(r => (r.getLong(1), r.getTimestamp(0), r.getLong(2), r.getString(3)))
      .toSet
    assert(got === expected)
  }
}

class GapFillSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("qw10 gap fill matches a driver-side forward-fill reimplementation") {
    val out = Registry.byName("qw10_gap_fill").run(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getDouble(2),
        r.getBoolean(3)))
      .sortBy(t => (t._1, t._2))
    // independent reimplementation: hourly max per user via a mutable map,
    // then walk the dense hour grid carrying the last observed value
    val obs = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("value")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 3600000L * 3600000L,
        r.getDouble(2)))
    val expected = obs.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val hourMax = rows.groupBy(_._2).map { case (h, vs) => h -> vs.map(_._3).max }
      val lo = hourMax.keys.min; val hi = hourMax.keys.max
      var last = 0.0
      (lo to hi by 3600000L).map { h =>
        val isObs = hourMax.contains(h)
        if (isObs) last = hourMax(h)
        (u, h, last, isObs)
      }
    }.sortBy(t => (t._1, t._2))
    assert(out.length === expected.length)
    out.zip(expected).foreach { case (a, b) => assert(a === b) }
  }
}

class RollingZscoreSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("qw11 z-scores match a driver-side trailing-24h reimplementation") {
    val out = Registry.byName("qw11_rolling_zscore").run(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      .toMap
    val counts = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), col("ts")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 3600000L))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val expected = counts.keys.groupBy(_._1).flatMap { case (et, keys) =>
      keys.map { case (_, eh) =>
        val win = counts.collect {
          case ((t, h), n) if t == et && h >= eh - 23 && h <= eh => n
        }.toSeq
        val c = win.length
        (et, eh, c, win)
      }
    }.filter(_._3 >= 12)
    assert(expected.size === out.size)
    expected.foreach { case (et, eh, c, win) =>
      val n = counts((et, eh)).toDouble
      val s = win.sum.toDouble
      val sq = win.map(x => x * x).sum.toDouble
      val z = (n - s / c) /
        math.sqrt(math.max((sq - s * s / c) / (c - 1), 1e-12))
      val (_, zOut, spike) = out((et, eh))
      // zOut is z rounded to 6 decimals, so |zOut − z| ≤ 5e-7 by definition
      assert(math.abs(zOut - z) < 1e-6, s"z mismatch at ($et,$eh)")
      assert(spike === (math.abs(z) > 2.0))
    }
  }

  test("qw11 suppresses cold-start windows (< 12 trailing hours)") {
    val out = Registry.byName("qw11_rolling_zscore").run(spark, sf)
    // the first observed hour of each type can never have 12 trailing hours
    val firstHours = graft.sources.Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(min(expr("unix_micros(ts) div 3600000000")).as("eh"))
    assert(out.join(firstHours, Seq("event_type", "eh")).count() === 0)
  }
}

class CohortRetentionSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("cohort grid invariants: week 0 is the cohort size and dominates every week") {
    val grid = Registry.byName("qw08_cohort_retention").run(spark, sf).cache()
    // every user's first event puts them in week 0 of their own cohort, so
    // week 0 exists per cohort and no later week exceeds it
    val w0 = grid.filter(col("week_idx") === 0)
      .select(col("cohort"), col("n_active").as("w0"))
    assert(w0.count() === grid.select("cohort").distinct().count())
    assert(grid.join(w0, Seq("cohort"))
      .filter(col("n_active") > col("w0")).count() === 0)
    // week-0 totals partition the user base: every user is in exactly one cohort
    val users = graft.sources.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    val w0Sum = w0.agg(sum(col("w0"))).collect()(0).getLong(0)
    assert(w0Sum === users)
    // no negative week offsets (activity can't precede the cohort day)
    assert(grid.filter(col("week_idx") < 0).count() === 0)
    grid.unpersist()
  }
}

class EwmaSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("qw12 EWMA equals a JVM mirror of the FIR over present taps (gap-aware)") {
    // recompute hourly counts and the 24-tap renormalized FIR single-
    // threaded; require exact equality — the quantization and literal-tap
    // contract means no tolerance is needed
    val hourly = graft.sources.Tables.events(spark, sf)
      .groupBy(col("event_type"), expr("unix_micros(ts) div 3600000000").as("eh"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val weights = (0 until 24).map(k => 0.3 * math.pow(1 - 0.3, k))
    val expected = hourly.map { case ((t, eh), n) =>
      var num = 0L; var den = 0L
      for (k <- 0 until 24) hourly.get((t, eh - k)).foreach { v =>
        num += math.round(weights(k) * v * 1e6)
        den += math.round(weights(k) * 1e6)
      }
      (t, eh) -> ((n, num.toDouble / den))
    }
    val got = Registry.byName("qw12_ewma_smoothing").run(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got === expected)
    // cold start: an hour with no prior history smooths to exactly its own
    // count (renormalization over present taps)
    val firstEh = hourly.keys.groupBy(_._1).map { case (t, ks) =>
      t -> ks.map(_._2).min }
    firstEh.foreach { case (t, eh) =>
      val (n, ewma) = got((t, eh))
      assert(ewma === n.toDouble, s"cold start for ($t, $eh): $ewma != $n")
    }
  }
}

class CusumSpec extends SparkSpec {

  test("qw13: closed form equals the textbook max(0, C+d) recursion, burst flagged") {
    import spark.implicits._
    // planted hourly series: steady rate 10 with a silent hour (gap — must
    // be filled and contribute NEGATIVE drift) and a 3-hour burst at 50
    val rows = Seq(
      ("view", 0L, 10L), ("view", 1L, 10L), /* hour 2 silent */
      ("view", 3L, 10L), ("view", 4L, 50L), ("view", 5L, 50L),
      ("view", 6L, 50L), ("view", 7L, 10L),
      ("click", 0L, 5L), ("click", 7L, 5L))
    val hourly = rows.toDF("event_type", "eh", "n")
    val got = graft.operators.Windows.cusumOverHourly(hourly).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap

    // JVM reference: gap-fill 0..7, integer k, then the literal recursion
    val byType = rows.groupBy(_._1)
    byType.foreach { case (t, rs) =>
      val n = (0L to 7L).map(eh => rs.find(_._2 == eh).map(_._3).getOrElse(0L))
      val kU = n.sum * 1000000L / n.size
      var c = 0L
      n.zipWithIndex.foreach { case (x, eh) =>
        c = math.max(0L, c + (x * 1000000L - kU))
        val (gn, gc, gf) = got((t, eh.toLong))
        assert(gn === x, s"($t, $eh) n")
        assert(gc === c, s"($t, $eh): closed form $gc != recursion $c")
        assert(gf === (c > 3L * kU), s"($t, $eh) flag")
      }
    }
    // the burst is caught once accumulated excess crosses 3k (hour 6:
    // 78.75M > 71.25M; hour 5's 52.5M is still below), and the steady
    // tail decays back under threshold instead of latching
    assert(!got(("view", 5L))._3 && got(("view", 6L))._3)
    assert(!got(("view", 7L))._3, "steady tail failed to decay")
    assert(!got(("view", 0L))._3 && !got(("click", 7L))._3)
  }
}

class PitFeaturesSpec extends SparkSpec {

  test("qa04: per-feature time travel is independent and leak-free") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    // user 1: click@1, purchase@2, view@3 — the purchase between click and
    // view must NOT mask the click; both features attach their own latest.
    // user 2: view@1, click@2 — a click AFTER the view must not leak.
    // user 3: purchase@1, view@2 — click never happened: null, not 0.
    val left = Seq((1L, ts(3), 100L), (2L, ts(1), 200L), (3L, ts(2), 300L))
      .toDF("user_id", "ts", "event_id")
    val clicks = Seq((1L, ts(1), 11), (2L, ts(2), 22))
      .toDF("user_id", "ts", "click_value")
    val purchases = Seq((1L, ts(2), 77), (3L, ts(1), 88))
      .toDF("user_id", "ts", "purchase_value")
    val step1 = graft.operators.AsOf.asofJoin(
      left, clicks, "user_id", "ts", Seq("click_value"))
    val out = graft.operators.AsOf.asofJoin(
      step1, purchases, "user_id", "ts", Seq("purchase_value"))
      .collect().map { r =>
        r.getAs[Long]("event_id") ->
          ((Option(r.getAs[Integer]("click_value")).map(_.toInt),
            Option(r.getAs[Integer]("purchase_value")).map(_.toInt)))
      }.toMap
    assert(out(100L) === ((Some(11), Some(77))), "independence: purchase masked the click")
    assert(out(200L) === ((None, None)), "leak: a future click reached the view")
    assert(out(300L) === ((None, Some(88))), "missing feature must be null")
  }

  test("qa05: stale matches are nulled, fresh kept, never-observed stay null") {
    val out = Registry.byName("qa05_asof_tolerance").run(spark, sf).collect()
    val tolUs = 2L * 86400L * 1000000L
    assert(out.nonEmpty)
    var fresh = 0; var stale = 0; var never = 0
    out.foreach { r =>
      val age = Option(r.getAs[java.lang.Long]("age_us")).map(_.toLong)
      val v = Option(r.getAs[java.lang.Double]("click_value"))
      val f = r.getAs[Boolean]("fresh")
      age match {
        case Some(a) if a <= tolUs =>
          assert(v.nonEmpty && f, s"fresh match (age $a) lost its value"); fresh += 1
        case Some(a) =>
          assert(v.isEmpty && !f, s"stale match (age $a) leaked a value"); stale += 1
        case None =>
          assert(v.isEmpty && !f, "never-observed row got a value"); never += 1
      }
    }
    // the tolerance actually bites on this corpus: all three cases occur
    assert(fresh > 0 && stale > 0, s"degenerate corpus: fresh=$fresh stale=$stale never=$never")
  }
}
