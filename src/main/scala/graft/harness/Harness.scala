package graft.harness

import java.util.concurrent.ConcurrentLinkedQueue

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

import graft.ysb.{Gen, Ysb}

/** Benchmark harness (SURVEY §2.10): config knobs H8, trial loop H1/H2,
  * listener-based throughput H3, and a latency metric H4.
  *
  * Latency here is foreachBatch wall-clock at result emission minus
  * max(event_time) per group — the same definition as the reference's
  * Kafka-LogAppendTime variant [SparkYahooRunner.scala:119-145] with the
  * broker timestamp replaced by emission time (no broker in CI; SURVEY §7.4).
  */
final case class YsbConfig(
    recordsPerSecond: Long = 2000000L, // StreamBenchMain.scala:32
    rampUpSeconds: Int = 10,
    runDurationMillis: Long = 100000L,
    numTrials: Int = 3,
    numCampaigns: Int = 100,
    windowLength: String = "10 seconds",
    genParallelism: Int = 32,
    triggerMillis: Long = 1000L,
    watermark: Option[String] = Some("10 seconds"))

/** Aggregates StreamingQueryProgress into a throughput figure (H3 —
  * identical public-API mechanism to the reference's listener
  * [SparkYahooRunner.scala:28-55,98-113]). */
final class ThroughputListener extends StreamingQueryListener {
  private val rows = new java.util.concurrent.atomic.AtomicLong(0)
  @volatile private var firstNs = 0L
  @volatile private var lastNs = 0L

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val n = e.progress.numInputRows
    if (n > 0) {
      val now = System.nanoTime()
      if (firstNs == 0L) firstNs = now
      lastNs = now
      rows.addAndGet(n)
    }
  }
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  def totalRows: Long = rows.get()
  def elapsedSec: Double = if (lastNs > firstNs) (lastNs - firstNs) / 1e9 else 0.0
  def throughput: Double = if (elapsedSec > 0) totalRows / elapsedSec else 0.0
}

object YsbStreamingBench {

  final case class TrialResult(rows: Long, seconds: Double, throughput: Double,
      latencies: Seq[Double])

  /** One streaming trial: rate-source YSB → windowed counts → foreachBatch
    * latency probe, run for `runDurationMillis`. */
  def runTrial(spark: SparkSession, cfg: YsbConfig): TrialResult = {
    val listener = new ThroughputListener
    spark.streams.addListener(listener)
    val latencies = new ConcurrentLinkedQueue[Double]()
    try {
      val events = Gen.rateStream(spark, cfg.recordsPerSecond,
        cfg.genParallelism, cfg.rampUpSeconds, cfg.numCampaigns)
      val withWm = cfg.watermark.fold(events)(events.withWatermark("event_time", _))
      val counts = Ysb.windowedCounts(
        Ysb.enrichCampaign(Ysb.projectAdTime(Ysb.filterViews(withWm)),
          Gen.campaigns(spark, cfg.numCampaigns)),
        cfg.windowLength)
      val query = counts.writeStream
        .outputMode("update")
        .trigger(Trigger.ProcessingTime(s"${cfg.triggerMillis} milliseconds"))
        .foreachBatch { (batch: DataFrame, _: Long) =>
          // H4 latency definition: per updated (window, campaign) group,
          // emission time − max(event_time) in the group — one sample per
          // group per trigger (the reference's Kafka-LogAppendTime variant
          // with broker timestamp → emission wall clock)
          val emitMs = System.currentTimeMillis()
          batch.select(unix_millis(col("last_update"))).collect()
            .foreach(r => if (!r.isNullAt(0))
              latencies.add((emitMs - r.getLong(0)).toDouble))
        }
        .start()
      query.awaitTermination(cfg.runDurationMillis)
      query.stop()
      import scala.jdk.CollectionConverters._
      TrialResult(listener.totalRows, listener.elapsedSec, listener.throughput,
        latencies.asScala.toSeq)
    } finally spark.streams.removeListener(listener)
  }

  /** H1 trial loop with System.gc between trials [Benchmark.scala:53-70]. */
  def run(spark: SparkSession, cfg: YsbConfig): Seq[TrialResult] =
    (1 to cfg.numTrials).map { _ =>
      System.gc()
      runTrial(spark, cfg)
    }

  private def pct(xs: Seq[Double], p: Double): Double =
    if (xs.isEmpty) 0.0
    else {
      val s = xs.sorted
      s(math.min(s.size - 1, math.ceil(p * s.size).toInt - 1).max(0))
    }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ysb-stream-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cfg = YsbConfig(
      recordsPerSecond = args.headOption.map(_.toLong).getOrElse(2000000L),
      rampUpSeconds = 5,
      runDurationMillis = args.lift(1).map(_.toLong).getOrElse(60000L),
      numTrials = args.lift(2).map(_.toInt).getOrElse(1))
    val trials = run(spark, cfg)
    val best = trials.maxBy(_.throughput)
    val lat = trials.flatMap(_.latencies)
    println(
      s"""{"metric":"ysb_stream_throughput","value":${best.throughput},"unit":"rows/sec",""" +
      s""""rows":${best.rows},"seconds":${best.seconds},""" +
      s""""latency_ms":{"p50":${pct(lat, 0.5)},"p95":${pct(lat, 0.95)},"p99":${pct(lat, 0.99)}},""" +
      s""""trials":${trials.size},"target_rps":${cfg.recordsPerSecond}}""")
    spark.stop()
  }
}

/** Bounded (batch) YSB throughput: generate N events, run the full pipeline,
  * report events/s — comparable to the single-node engines' batch replay
  * numbers (BASELINE.md: StreamBox 2.7M rec/s on 2 cores). */
object YsbBatchBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(50000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ysb-batch-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warmup
    Ysb.query(Gen.boundedEvents(spark, 100000L), Gen.campaigns(spark)).count()
    val t0 = System.nanoTime()
    val out = Ysb.query(Gen.boundedEvents(spark, n), Gen.campaigns(spark)).count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"""{"metric":"ysb_batch_throughput","value":${n / sec},"unit":"rows/sec","rows":$n,"seconds":$sec,"groups":$out}""")
    spark.stop()
  }
}
