package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

import graft.Q
import graft.sources.Tables

/** Time-window operators in batch form (the streaming twins live in
  * graft.streaming): tumbling / sliding / session windows over event time,
  * plus analytic running/lag windows.
  *
  * Reference surface: W1 tumbling 10 s event-time window
  * [ysb/benchmark/spark/SparkYahooRunner.scala:75;
  * ysb/benchmark/flink/YahooBenchmark.scala:222], W7 session-window
  * scaffolding [sbx/Values.h:1415-1474], A6 windowed collect
  * [sbx/test-yahoo.cpp:137-146].
  *
  * Oracles express buckets as exact integer epoch-microsecond arithmetic
  * (`make_timestamp(epoch_us(ts) // W * W)`), which matches Spark's
  * epoch-aligned `window()` in a UTC session exactly — no reliance on
  * DuckDB `time_bucket` origin conventions.
  */
object Windows {

  private def dec2(c: Column): Column = c.cast(DecimalType(12, 2))

  // ---------------------------------------------------------------------
  // qw01: tumbling 1-day event-time window × event_type — count + decimal
  // sum + max(ts) ("lastUpdate"), the exact YSB A1 aggregate shape.
  // ---------------------------------------------------------------------
  private def qw01(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        // exact decimal accumulation, one final DOUBLE cast mirrored in the
        // oracle — DECIMAL outputs hash-mismatch the driver (VERDICT r01)
        sum(dec2(col("value"))).cast(DoubleType).as("sum_value"),
        max(col("ts")).as("last_update"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"), col("last_update"))

  private val qw01Sql =
    """SELECT make_timestamp(epoch_us(ts) // 86400000000 * 86400000000) AS w_start,
      |  event_type, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
      |  max(ts) AS last_update
      |FROM events GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // qw02: sliding window (1 day length, 12 h slide) — each event lands in 2
  // windows. Oracle = union of the two shifted 12 h buckets.
  // ---------------------------------------------------------------------
  private def qw02(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 day", "12 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))

  private val qw02Sql =
    """WITH assigned AS (
      |  SELECT make_timestamp(epoch_us(ts) // 43200000000 * 43200000000) AS w_start, event_type FROM events
      |  UNION ALL
      |  SELECT make_timestamp(epoch_us(ts) // 43200000000 * 43200000000 - 43200000000) AS w_start, event_type FROM events)
      |SELECT w_start, event_type, count(*) AS n FROM assigned GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // qw03: session windows (30 min gap) per user — session start = min(ts),
  // end = max(ts)+gap (Spark session_window semantics), count + value sum.
  // Oracle: classic gaps-and-islands with lag + cumulative flag sum.
  // ---------------------------------------------------------------------
  private def qw03(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("value"))).cast(DoubleType).as("sum_value"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("user_id"), col("n"), col("sum_value"))

  private val qw03Sql =
    """WITH flagged AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |              > INTERVAL 30 MINUTE OR
      |              lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events),
      |islands AS (
      |  SELECT user_id, ts, value,
      |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
      |                        ROWS UNBOUNDED PRECEDING) AS sess
      |  FROM flagged)
      |SELECT min(ts) AS s_start, max(ts) + INTERVAL 30 MINUTE AS s_end,
      |  user_id, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM islands GROUP BY user_id, sess""".stripMargin

  // ---------------------------------------------------------------------
  // qw04: running (cumulative) aggregation per key ordered by event time —
  // unbounded-preceding frame, exact decimal running sum.
  // ---------------------------------------------------------------------
  private def qw04(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .filter(col("user_id") < lit(10))
      .select(col("user_id"), col("event_id"), col("ts"),
        sum(dec2(col("value"))).over(w).cast(DoubleType).as("running_value"),
        count(lit(1)).over(w).as("running_n"))
  }

  private val qw04Sql =
    """SELECT user_id, event_id, ts,
      |  CAST(sum(CAST(value AS DECIMAL(12,2)))
      |       OVER (PARTITION BY user_id ORDER BY ts, event_id
      |             ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value,
      |  count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                 ROWS UNBOUNDED PRECEDING) AS running_n
      |FROM events WHERE user_id < 10""".stripMargin

  // ---------------------------------------------------------------------
  // qw05: lag/lead — inter-event gap in microseconds per user (the latency
  // diff shape, F9 [SparkYahooRunner.scala:138]).
  // ---------------------------------------------------------------------
  private def qw05(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .filter(col("user_id") < lit(10))
      .select(col("user_id"), col("event_id"),
        (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))).as("gap_us"),
        lead(col("event_id"), 1).over(w).as("next_event"))
  }

  private val qw05Sql =
    """SELECT user_id, event_id,
      |  epoch_us(ts) - epoch_us(lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us,
      |  lead(event_id, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_event
      |FROM events WHERE user_id < 10""".stripMargin

  // ---------------------------------------------------------------------
  // qw06: windowed collect (A6: StreamBox WinSum_mergeset ≡ windowed
  // distinct collect) — distinct event types per 1-day window, sorted for
  // determinism. At 100 TB collect_set per group is only safe for
  // low-cardinality domains like this; the unbounded-cardinality path is
  // q18_approx_distinct (HLL).
  // ---------------------------------------------------------------------
  // Output the set as a comma-joined string, not array<string>: the
  // driver's pandas sort crashes on array output columns (VERDICT r01).
  private def qw06(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 day"))
      .agg(concat_ws(",", array_sort(collect_set(col("event_type")))).as("types"),
        countDistinct(col("user_id")).as("n_users"))
      .select(col("window.start").as("w_start"), col("types"), col("n_users"))

  private val qw06Sql =
    """SELECT make_timestamp(epoch_us(ts) // 86400000000 * 86400000000) AS w_start,
      |  array_to_string(list_sort(list_distinct(list(event_type))), ',') AS types,
      |  count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // qw07: per-session event SEQUENCES — the behavioral-training-data
  // composition step: each (user, 30-min-gap session) becomes one example
  // whose content is the event types in (ts, event_id) order. The
  // sequence is gated by md5 so the driver compares exact content without
  // array columns (hash-canonical rules, README). Shape: qw03's session
  // aggregation with an order-deterministic collect — the collect_list is
  // per session (bounded by session length), sorted map-side after the
  // one groupBy shuffle.
  // ---------------------------------------------------------------------
  private def qw07(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        md5(array_join(expr(
          "transform(array_sort(collect_list(struct(ts, event_id, event_type))), x -> x.event_type)"),
          " ")).as("seq_hash"))
      .select(col("session_window.start").as("s_start"), col("user_id"),
        col("n_events"), col("seq_hash"))

  private val qw07Sql =
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |              > INTERVAL 30 MINUTE OR
      |              lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events),
      |islands AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
      |                        ROWS UNBOUNDED PRECEDING) AS sess
      |  FROM flagged)
      |SELECT min(ts) AS s_start, user_id, count(*) AS n_events,
      |  md5(string_agg(event_type, ' ' ORDER BY ts, event_id)) AS seq_hash
      |FROM islands GROUP BY user_id, sess""".stripMargin

  // ---------------------------------------------------------------------
  // qw08: cohort retention — the canonical product-analytics rollup: each
  // user is cohorted by first-seen date; activity is bucketed into weekly
  // offsets from the cohort day; the grid counts distinct active users per
  // (cohort, week). Two shuffles by design: one groupBy(user) for the
  // cohort day (map-side partial min), one for the final grid; the
  // events×cohorts join is corpus×corpus on both sides → merge-pinned
  // (the qd04 static-broadcast trap — a cohort frame has one row per
  // USER, which grows with the corpus).
  // ---------------------------------------------------------------------
  private def qw08(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val cohorts = ev.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    ev.join(cohorts.hint("merge"), Seq("user_id"))
      .select(col("user_id"),
        date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort"),
        expr("cast(datediff(day, cohort_day) div 7 as bigint)").as("week_idx"))
      .groupBy(col("cohort"), col("week_idx"))
      .agg(countDistinct(col("user_id")).as("n_active"))
  }

  private[graft] val qw08Sql =
    """WITH ev AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day FROM events),
      |cohorts AS (
      |  SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id)
      |SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort,
      |  CAST(datediff('day', c.cohort_day, e.day) // 7 AS BIGINT) AS week_idx,
      |  count(DISTINCT e.user_id) AS n_active
      |FROM ev e JOIN cohorts c USING (user_id)
      |GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // qw09: ordered funnel — the third canonical product-analytics face
  // (qw07 sequences, qw08 retention, this one conversion): how many users
  // performed view → click → purchase IN ORDER, where each step must
  // strictly follow the user's first qualifying occurrence of the
  // previous step. Iterative conditional-min shape: step k's frame is
  // groupBy(user) min(ts) over events after the user's step-k−1
  // timestamp — one shuffle per step plus a merge-pinned join against the
  // previous step's per-user frame (one row per USER: corpus-growing,
  // never broadcast — the qw08 rule). Step frames shrink monotonically,
  // so later joins get cheaper; at 100 TB each join is user-key
  // partitioned and AQE-coalesced.
  // ---------------------------------------------------------------------
  private def qw09(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id"), col("event_type"), col("ts"))
    def firstAfter(etype: String, prev: DataFrame, prevTs: String, outTs: String) =
      ev.filter(col("event_type") === etype)
        .join(prev.hint("merge"), Seq("user_id"))
        .filter(col("ts") > col(prevTs))
        .groupBy(col("user_id"))
        .agg(min(col("ts")).as(outTs))
    val t1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val t2 = firstAfter("click", t1, "t1", "t2")
    val t3 = firstAfter("purchase", t2, "t2", "t3")
    t1.agg(lit("1_view").as("step"), count(lit(1)).as("n_users"))
      .unionAll(t2.agg(lit("2_click").as("step"), count(lit(1)).as("n_users")))
      .unionAll(t3.agg(lit("3_purchase").as("step"), count(lit(1)).as("n_users")))
  }

  private val qw09Sql =
    """WITH t1 AS (
      |  SELECT user_id, min(ts) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |t2 AS (
      |  SELECT e.user_id, min(e.ts) AS t2
      |  FROM events e JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.t1
      |  WHERE e.event_type = 'click' GROUP BY e.user_id),
      |t3 AS (
      |  SELECT e.user_id, min(e.ts) AS t3
      |  FROM events e JOIN t2 ON e.user_id = t2.user_id AND e.ts > t2.t2
      |  WHERE e.event_type = 'purchase' GROUP BY e.user_id)
      |SELECT '1_view' AS step, count(*) AS n_users FROM t1
      |UNION ALL SELECT '2_click', count(*) FROM t2
      |UNION ALL SELECT '3_purchase', count(*) FROM t3""".stripMargin

  // ---------------------------------------------------------------------
  // qw10: time-series gap fill — resample each user's event stream to a
  // dense 1-hour grid between their first and last observed hour,
  // forward-filling the hourly max(value) gauge across unobserved hours
  // (the resample/interpolate step every metrics pipeline runs before
  // training or charting). Shape: downsample is ONE partial-agg groupBy
  // (map-side combine — max is order-free, so no per-hour sort); the grid
  // is a map-side sequence() explode bounded by span/granularity per key
  // (a key spanning years at minute grain would chunk the span — the
  // documented knob); the fill avoids any IGNORE NULLS dependence via the
  // running-count trick: k = count of observations at-or-before each grid
  // hour indexes the kth observation, fetched by an equi-join. Both joins
  // are corpus-growing × corpus-growing → merge-pinned (the qw08 rule);
  // all windows are per-user, bounded by the grid span.
  // ---------------------------------------------------------------------
  private def qw10(s: SparkSession, d: String): DataFrame = {
    val obs = Tables.events(s, d)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .agg(max(col("value")).as("v"))
    val grid = obs.groupBy(col("user_id"))
      .agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
      .select(col("user_id"),
        explode(expr("sequence(lo, hi, interval 1 hour)")).as("h"))
    val j = grid.join(obs.hint("merge"), Seq("user_id", "h"), "left")
      .withColumn("k",
        count(col("v")).over(Window.partitionBy("user_id").orderBy("h")))
    val r = obs.select(col("user_id").as("r_user"), col("v").as("fill"),
      row_number().over(Window.partitionBy("user_id").orderBy("h")).as("rn"))
    j.join(r.hint("merge"),
        j("user_id") === col("r_user") && col("k") === col("rn"))
      .select(col("user_id"), col("h"), col("fill"),
        col("v").isNotNull.as("is_obs"))
  }

  private val qw10Sql =
    """WITH obs AS (
      |  SELECT user_id, date_trunc('hour', ts) AS h, max(value) AS v
      |  FROM events GROUP BY 1, 2),
      |grid AS (
      |  SELECT user_id,
      |    unnest(generate_series(min(h), max(h), INTERVAL 1 HOUR)) AS h
      |  FROM obs GROUP BY user_id),
      |j AS (
      |  SELECT g.user_id, g.h, o.v,
      |    count(o.v) OVER (PARTITION BY g.user_id ORDER BY g.h) AS k
      |  FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.h = o.h),
      |r AS (
      |  SELECT user_id, h, v,
      |    row_number() OVER (PARTITION BY user_id ORDER BY h) AS rn
      |  FROM obs)
      |SELECT j.user_id, j.h, r.v AS fill, j.v IS NOT NULL AS is_obs
      |FROM j JOIN r ON j.user_id = r.user_id AND j.k = r.rn""".stripMargin

  // ---------------------------------------------------------------------
  // qw11: rolling z-score anomaly detection — flag hours whose event
  // count spikes > 2σ above the trailing 24 h mean, per event type. The
  // 100 TB shape: the raw corpus collapses FIRST through one partial-agg
  // groupBy to hourly counts (output bounded by types × span hours, not
  // corpus size); the rolling frame (RANGE 23 PRECEDING on the integer
  // epoch-hour key — robust to gap hours, unlike a ROWS frame) then runs
  // over that tiny frame. Float parity: sums and sums-of-squares
  // accumulate in DECIMAL (exact, order-free); mean/variance/z are the
  // IDENTICAL IEEE expression in both engines — single divisions,
  // subtractions, one sqrt (all correctly-rounded ops), with a 1e-12
  // variance floor so an all-equal window yields z = 0, not a div-0.
  // Windows needing < 12 trailing hours are suppressed (cold-start rule).
  // ---------------------------------------------------------------------
  private def qw11(s: SparkSession, d: String): DataFrame = {
    val hourly = Tables.events(s, d)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("eh"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type").orderBy("eh").rangeBetween(-23, 0)
    val nDec = col("n").cast(DecimalType(18, 0))
    val stats = hourly
      .withColumn("s", sum(nDec).over(w).cast(DoubleType))
      .withColumn("sq", sum(nDec * nDec).over(w).cast(DoubleType))
      .withColumn("c", count(lit(1)).over(w))
    val z = (col("n") - col("s") / col("c")) /
      sqrt(greatest(
        (col("sq") - col("s") * col("s") / col("c")) / (col("c") - 1),
        lit(1e-12)))
    stats.where(col("c") >= 12)
      .select(col("event_type"), col("eh"), col("n"),
        round(z, 6).as("z"), (abs(z) > 2.0).as("is_spike"))
  }

  private val qw11Sql =
    """WITH hourly AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS eh, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |stats AS (
      |  SELECT event_type, eh, n,
      |    CAST(sum(CAST(n AS DECIMAL(18,0))) OVER w AS DOUBLE) AS s,
      |    CAST(sum(CAST(n AS DECIMAL(18,0)) * CAST(n AS DECIMAL(18,0))) OVER w
      |         AS DOUBLE) AS sq,
      |    count(*) OVER w AS c
      |  FROM hourly
      |  WINDOW w AS (PARTITION BY event_type ORDER BY eh
      |               RANGE BETWEEN 23 PRECEDING AND CURRENT ROW))
      |SELECT event_type, eh, n,
      |  round((n - s / c)
      |    / sqrt(greatest((sq - s * s / c) / (c - 1), 1e-12)), 6) AS z,
      |  abs((n - s / c)
      |    / sqrt(greatest((sq - s * s / c) / (c - 1), 1e-12))) > 2.0 AS is_spike
      |FROM stats WHERE c >= 12""".stripMargin

  // ---------------------------------------------------------------------
  // qw12: EWMA trend smoothing — qw11's sibling: instead of flagging
  // spikes against a flat trailing mean, smooth each type's hourly
  // series with an exponentially-weighted moving average (the standard
  // monitoring/forecast baseline). The recursion x̄_t = αx_t + (1−α)x̄_{t−1}
  // is order-dependent and unexpressible as a parallel fold, so it is
  // re-expressed in CLOSED FORM as a 24-tap FIR: w_k = α(1−α)^k computed
  // ONCE in Scala and shipped as identical double literals to BOTH
  // engines — no pow() at query time, no libm parity risk. Gap hours are
  // handled by construction: taps attach via an (eh − k) equi-join (the
  // qw10 gap-fill shape, not ROWS lag which would misalign on gaps), and
  // the weight mass renormalizes over the taps actually present — which
  // also makes the cold start principled (first hour: ewma = its own n).
  // Float parity: each tap contribution w_k·n is one IEEE product
  // quantized to micro-units (BIGINT), summed exactly (order-free);
  // ewma = one final integer-ratio division. 100 TB shape: one partial-
  // agg groupBy collapses the corpus to types × hours before ANY tap
  // work; the tap join multiplies that bounded frame by 24 — still
  // bounded, never corpus-sized.
  // ---------------------------------------------------------------------
  private val EwmaAlpha = 0.3
  private val EwmaTaps = 24

  private def ewmaWeights: IndexedSeq[Double] =
    (0 until EwmaTaps).map(k => EwmaAlpha * math.pow(1 - EwmaAlpha, k))

  /** The 24-tap FIR over an arbitrary (event_type, eh, n) hourly frame —
    * qw12's whole computation after the hourly rollup, shared with the
    * streaming face qst31 (which produces the hourly frame from a
    * streaming aggregation instead): streaming/batch consistency by
    * construction. */
  private[graft] def ewmaOverHourly(hourly: DataFrame): DataFrame = {
    val tapsLit = ewmaWeights.zipWithIndex.map { case (w, k) =>
      s"named_struct('k', ${k}L, 'w', cast('${w.toString}' as double))"
    }.mkString("array(", ", ", ")")
    val contrib = hourly.select(col("event_type"), col("eh"))
      .withColumn("tap", explode(expr(tapsLit)))
      .join(hourly.select(col("event_type").as("src_type"),
          col("eh").as("src_eh"), col("n").as("src_n")).hint("merge"),
        col("src_type") === col("event_type") &&
          col("src_eh") === col("eh") - col("tap.k"))
    contrib
      .groupBy(col("event_type"), col("eh"))
      .agg(
        sum(expr("cast(round(tap.w * src_n * 1e6) as bigint)")).as("num_q"),
        sum(expr("cast(round(tap.w * 1e6) as bigint)")).as("den_q"),
        max(when(col("tap.k") === 0, col("src_n"))).as("n"))
      .select(col("event_type"), col("eh"), col("n"),
        (col("num_q").cast("double") / col("den_q")).as("ewma"))
      .withColumn("ratio", col("n").cast("double") / col("ewma"))
      .withColumn("is_high", col("ratio") > 1.5)
  }

  private def qw12(s: SparkSession, d: String): DataFrame =
    ewmaOverHourly(Tables.events(s, d)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("eh"))
      .agg(count(lit(1)).as("n")))

  private[graft] val qw12Sql = {
    val taps = ewmaWeights.zipWithIndex
      .map { case (w, k) => s"($k, CAST('${w.toString}' AS DOUBLE))" }
      .mkString(", ")
    s"""WITH hourly AS (
       |  SELECT event_type, epoch_us(ts) // 3600000000 AS eh,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1, 2),
       |taps AS (SELECT * FROM (VALUES $taps) t(k, w)),
       |agg AS (
       |  SELECT b.event_type, b.eh,
       |    CAST(sum(CAST(round(t.w * s.n * 1e6) AS BIGINT)) AS BIGINT) AS num_q,
       |    CAST(sum(CAST(round(t.w * 1e6) AS BIGINT)) AS BIGINT) AS den_q,
       |    max(CASE WHEN t.k = 0 THEN s.n END) AS n
       |  FROM hourly b
       |  CROSS JOIN taps t
       |  JOIN hourly s ON s.event_type = b.event_type AND s.eh = b.eh - t.k
       |  GROUP BY 1, 2)
       |SELECT event_type, eh, n,
       |  CAST(num_q AS DOUBLE) / den_q AS ewma,
       |  CAST(n AS DOUBLE) / (CAST(num_q AS DOUBLE) / den_q) AS ratio,
       |  CAST(n AS DOUBLE) / (CAST(num_q AS DOUBLE) / den_q) > 1.5 AS is_high
       |FROM agg""".stripMargin
  }

  // ---------------------------------------------------------------------
  // qw13: CUSUM drift detection (Page 1954) — the sequential changepoint
  // monitor an ingest pipeline runs on its hourly rates. The textbook
  // recursion C_t = max(0, C_{t−1} + (x_t − k)) is order-dependent and
  // looks stream-only; it has an EXACT closed form over prefix sums:
  //   C_t = P_t − min(0, min_{j≤t} P_j),  P_t = Σ_{i≤t} (x_i − k)
  // (qw12's FIR re-expression, same move for a max-recursion), so the
  // whole monitor is two window passes over the bounded types×hours
  // frame — no driver loop, no UDAF, exact BIGINT arithmetic end to end:
  // counts are integers, the per-type reference rate k is quantized by
  // INTEGER division to micro-units, deviations/prefix sums/minima stay
  // BIGINT, and the flag threshold is the exact integer 3·k_u. Silent
  // hours matter to drift (no events IS drift), so the hour grid is
  // gap-filled first (qw10's move: global [min,max] hour bounds — one
  // 1-row broadcast — × the bounded type set). Scale: the windows
  // partition by type and run over ≤ types×span rows, never the corpus.
  // ---------------------------------------------------------------------
  private def qw13(s: SparkSession, d: String): DataFrame = {
    val hourly = Tables.events(s, d)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("eh"))
      .agg(count(lit(1)).as("n"))
    cusumOverHourly(hourly)
  }

  /** The closed-form CUSUM over an arbitrary (event_type, eh, n) hourly
    * frame — shared with the JVM-mirror spec. */
  private[graft] def cusumOverHourly(hourly: DataFrame): DataFrame = {
    val bounds = hourly.agg(min(col("eh")).as("lo"), max(col("eh")).as("hi"))
    // the grid path re-aliases event_type (fresh exprId) so the grid⋈hourly
    // self-join resolves even when `hourly` is a memory-sink view (the
    // streaming face) — parquet-backed frames dedup automatically, memory
    // plans do not
    val grid = hourly.select(col("event_type").as("event_type")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(expr("sequence(lo, hi)")).as("eh"))
    val filled = grid.join(hourly, Seq("event_type", "eh"), "left")
      .select(col("event_type"), col("eh"),
        coalesce(col("n"), lit(0L)).as("n"))
    val k = filled.groupBy(col("event_type"))
      .agg(expr("(sum(n) * 1000000L) div count(*)").as("k_u"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("eh"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    filled
      .join(broadcast(k), Seq("event_type")) // ≤ |types| rows by construction
      .withColumn("p", sum(col("n") * lit(1000000L) - col("k_u")).over(w))
      .withColumn("mn", least(min(col("p")).over(w), lit(0L)))
      .select(col("event_type"), col("eh"), col("n"),
        (col("p") - col("mn")).as("cusum_u"),
        ((col("p") - col("mn")) > lit(3L) * col("k_u")).as("flagged"))
  }

  private[graft] val qw13Sql =
    """WITH hourly AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS eh,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |bounds AS (SELECT min(eh) AS lo, max(eh) AS hi FROM hourly),
      |grid AS (
      |  SELECT event_type, unnest(generate_series(lo, hi)) AS eh
      |  FROM (SELECT DISTINCT event_type FROM hourly), bounds),
      |filled AS (
      |  SELECT g.event_type, g.eh, coalesce(h.n, 0) AS n
      |  FROM grid g LEFT JOIN hourly h
      |    ON g.event_type = h.event_type AND g.eh = h.eh),
      |k AS (SELECT event_type,
      |        (CAST(sum(n) AS BIGINT) * 1000000) // count(*) AS k_u
      |      FROM filled GROUP BY event_type),
      |cum AS (
      |  SELECT f.event_type, f.eh, f.n, k_u,
      |    CAST(sum(f.n * 1000000 - k_u) OVER (PARTITION BY f.event_type
      |      ORDER BY f.eh ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS p
      |  FROM filled f JOIN k USING (event_type)),
      |cus AS (
      |  SELECT event_type, eh, n, k_u, p,
      |    CAST(least(min(p) OVER (PARTITION BY event_type ORDER BY eh
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
      |      AS BIGINT) AS mn
      |  FROM cum)
      |SELECT event_type, eh, n,
      |  CAST(p - mn AS BIGINT) AS cusum_u,
      |  (p - mn) > 3 * k_u AS flagged
      |FROM cus""".stripMargin

  def queries: Seq[Q] = Seq(
    Q("qw01_tumbling_window", qw01, Some(qw01Sql), headline = true),
    Q("qw02_sliding_window", qw02, Some(qw02Sql)),
    Q("qw03_session_window", qw03, Some(qw03Sql), headline = true),
    Q("qw04_running_agg", qw04, Some(qw04Sql)),
    Q("qw05_lag_lead", qw05, Some(qw05Sql)),
    Q("qw06_windowed_collect", qw06, Some(qw06Sql)),
    Q("qw07_session_sequences", qw07, Some(qw07Sql)),
    Q("qw08_cohort_retention", qw08, Some(qw08Sql)),
    Q("qw09_funnel", qw09, Some(qw09Sql)),
    Q("qw10_gap_fill", qw10, Some(qw10Sql)),
    Q("qw11_rolling_zscore", qw11, Some(qw11Sql)),
    Q("qw12_ewma_smoothing", qw12, Some(qw12Sql)),
    Q("qw13_cusum_drift", qw13, Some(qw13Sql)))
}
