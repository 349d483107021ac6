package graft

import org.apache.spark.sql.functions._

/** Ingest-cost flatness evidence for the clustered streaming sink
  * (qst36): writeClusteredBatch lands each batch under its own batch_id
  * partition, so per-batch cost must track |batch| — NOT |table| — as the
  * table grows (the property qd18's pre-partitioned store had to be
  * REBUILT to get, measured here for the layout sink by construction).
  * The probe appends `batches` equal-sized event batches, timing each
  * write and the post-run compaction, and emits one JSON line →
  * BASELINE.md. A growing per-batch trend would mean the sink is
  * accidentally rescanning the table (dynamic overwrite gone wrong).
  */
object SinkCurve {

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val batches = sys.env.getOrElse("SPARK_GRAFT_SINK_BATCHES", "12").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local("graft-sink-curve", cpus)
    spark.sparkContext.setLogLevel("ERROR")

    val base = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
      s"/graft-sink-curve-p${ProcessHandle.current().pid()}"
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def del(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(del)); f.delete(); ()
      }
      del(new java.io.File(base))
    }))

    val ev = graft.sources.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))
      .localCheckpoint(true) // time the SINK, not the upstream scan
    val perBatch = ev.count() / batches

    def js(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    val times = (0 until batches).map { i =>
      val b = ev.filter(pmod(col("event_id"), lit(batches.toLong)) === i)
      val t0 = System.nanoTime()
      graft.sinks.Layout.writeClusteredBatch(
        b, i, base, "user_id", "event_id", files = 8)
      (System.nanoTime() - t0) / 1e9
    }
    val t0 = System.nanoTime()
    graft.sinks.Layout.compactClustered(spark, base,
      "user_id", "event_id", files = 16)
    val compactS = (System.nanoTime() - t0) / 1e9
    val total = spark.read.parquet(base).count()

    println(s"""{"metric":"sink_curve","sf":"$dir","batches":$batches,""" +
      s""""rows_per_batch":$perBatch,"final_rows":$total,""" +
      s""""batch_s":[${times.map(js).mkString(",")}],""" +
      s""""first_s":${js(times.head)},"last_s":${js(times.last)},""" +
      s""""compact_s":${js(compactS)}}""")
    spark.stop()
  }
}
