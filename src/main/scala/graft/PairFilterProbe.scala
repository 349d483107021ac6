package graft

import org.apache.spark.sql.SparkSession

import graft.ext.{CheckpointStrategy, Clustering, TextAnalysis}

/** Same-sitting A/B of the r15 subtree changes (VERDICT r14 #4/#8), on
  * SPARK_GRAFT_SF_DIR (point it at a soak tier for scale evidence):
  *
  *  - qd19's pair stage WITH vs WITHOUT the size filter — the "measured
  *    attempt" row for whether pruning non-qualifying pairs pays at the
  *    tier where the pair join matters;
  *  - qc03's gradient step WITH the design-matrix checkpoint vs plain
  *    lineage ([[CheckpointStrategy.Off]]) — what collapsing the 3×
  *    token-explode re-execution buys.
  *
  * Cross-sitting comparisons (this round vs BASELINE rows) are confounded
  * by the box's burst throttle — r14's close saw calibrations of 2.15–3×
  * idle — so each A/B runs both variants interleaved in ONE JVM sitting:
  * variant order A,B,B,A (two timed passes each, best-of-2) cancels
  * slow-drift load. Output: one JSON line per query.
  */
object PairFilterProbe {

  private def timeIt(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-pair-filter-probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.documents(spark, dir).limit(1000).count() // warmup

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // Each timed build eagerly checkpoints corpus-sized frames (DISK_ONLY
    // blocks owned by the ContextCleaner, whose GC-driven cleanup is not
    // prompt) — without an explicit clear the blocks ACCUMULATE across the
    // sitting and later passes run under growing storage/disk pressure, a
    // monotone bias the A,B,B,A ordering cancels only for slow drift, not
    // accumulation (ADVICE r15). Drop all persisted RDDs after every pass
    // so each starts from the same storage state.
    def clearStorage(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))

    def ab(name: String, a: => Unit, b: => Unit): Unit = {
      def pass(f: => Unit): Double = { val t = timeIt(f); clearStorage(); t }
      val tA1 = pass(a); val tB1 = pass(b)
      val tB2 = pass(b); val tA2 = pass(a)
      println(f"""{"metric":"ab_probe","query":"$name","dir":"$dir","on_sec":${math.min(tA1, tA2)}%.3f,"off_sec":${math.min(tB1, tB2)}%.3f,"on_passes":[$tA1%.3f,$tA2%.3f],"off_passes":[$tB1%.3f,$tB2%.3f]}""")
    }

    ab("qd19_size_filter",
      noop(TextAnalysis.qd19Impl(spark, dir, CheckpointStrategy.LocalDisk,
        sizeFilter = Some(true))),
      noop(TextAnalysis.qd19Impl(spark, dir, CheckpointStrategy.LocalDisk,
        sizeFilter = Some(false))))
    // auto mode (the shipping default, VERDICT r15 #6a): record which
    // side the posting-count threshold picks at this tier and what it
    // costs — the artifact row that shows auto == the winning variant
    locally {
      val t = timeIt(noop(
        TextAnalysis.qd19Impl(spark, dir, CheckpointStrategy.LocalDisk)))
      clearStorage()
      val (n, used) = TextAnalysis.lastSizeFilterDecision.getOrElse((-1L, false))
      println(f"""{"metric":"ab_probe_auto","query":"qd19_size_filter","dir":"$dir","auto_sec":$t%.3f,"posting_rows":$n,"filter_used":$used,"threshold":${TextAnalysis.SizeFilterMinPostings}}""")
    }
    ab("qc03_ckpt",
      noop(Clustering.qc03Impl(spark, dir, CheckpointStrategy.LocalDisk)),
      noop(Clustering.qc03Impl(spark, dir, CheckpointStrategy.Off)))
    spark.stop()
  }
}
