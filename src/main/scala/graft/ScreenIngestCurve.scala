package graft

import java.io.File

import org.apache.spark.sql.functions._

import graft.streaming.FingerprintStore

/** qst44 incremental-ingest curve (VERDICT r17 Next #1's artifact): the
  * gate pins incremental ≡ one-shot semantics by oracle hash; this probe
  * measures the scale CLAIM — per-batch APPEND cost and per-batch SCREEN
  * cost both ~flat while the log-structured store grows batch by batch,
  * with compaction bounding the per-partition file count (the screen's
  * task-overhead unit once pages are h-IN-pruned).
  *
  * Store growth reuses ScreenCurve's salting: append batch k is the real
  * sf-corpus winnowed distinct-h frame, XOR-salted by k × an odd 64-bit
  * constant (k = 0 is the identity, so the fixed probe batch keeps
  * hitting the first ingested slice — the oldest, most-compacted rows).
  * Every batch is therefore all-novel and of identical size: a flat
  * per-append wall time across the curve isolates store-size dependence
  * (the anti-join reads the store only through the same pruned scan the
  * screen uses — O(batch) pages, never O(|store|)).
  *
  * Auto-compaction is DISABLED in the launch env
  * (SPARK_GRAFT_SCREEN_COMPACT_EVERY beyond the batch count) so the probe
  * can time compaction separately at its own cadence
  * (SPARK_GRAFT_INGEST_COMPACT_EVERY, default 8 = the shipping
  * CompactEvery): `compact_sec` is the amortized O(|store|/C)-per-batch
  * cost of the log-structured trade, and `files` right after a compact
  * returns to one per partition.
  *
  * Output: one JSON line per batch
  * {"metric":"screen_ingest_curve","k":K,"append_sec":A,"novel":N,
  *  "store_rows":R,"fanout":F,"files":C,"compact_sec":S,
  *  "screen":[p1,p2]} consumed into BASELINE.md.
  */
object ScreenIngestCurve {

  private def fileCount(dir: String): Int = {
    def walk(f: File): Int =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0)
      else if (f.getName.endsWith(".parquet")) 1 else 0
    walk(new File(dir))
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nBatches =
      sys.env.get("SPARK_GRAFT_INGEST_BATCHES").map(_.toInt).getOrElse(32)
    val compactEvery =
      sys.env.get("SPARK_GRAFT_INGEST_COMPACT_EVERY").map(_.toInt).getOrElse(8)
    val out = "target/screen-ingest-curve"
    val spark = GraftSession.local("graft-screen-ingest-curve",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    // shared calibration bracket — see ScreenCurve's rationale; a burst
    // mid-curve would fake an append/screen slope
    BenchCal.calibrate(spark)
    val watch = BenchCal.idleWatch(spark)
    val calPre = if (watch.ran) watch.lastProbe else BenchCal.calibrate(spark)

    val dirF = new File(out)
    if (dirF.exists()) {
      def rm(f: File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(dirF)
    }
    dirF.mkdirs(): Unit

    val docs = graft.sources.Tables.documents(spark, base)
    // base fingerprint set, materialized once and re-salted per batch
    val baseH = graft.ext.CheckpointStrategy.LocalDisk(
      graft.ext.TextAnalysis.winnowedFingerprints(docs)
        .select(col("h")).distinct())
    baseH.count(): Unit
    // fixed small probe batch — the steady-state trigger shape
    val batch = docs.filter(col("doc_id") % 101 === 0).localCheckpoint(true)

    val idxDir = s"$out/fp"
    val st = FingerprintStore.create(spark, idxDir)

    (0 until nBatches).foreach { k =>
      val salted = baseH
        .select(col("h").bitwiseXOR(lit(k * 0x9E3779B97F4A7CL)).as("h"))
      val a0 = System.nanoTime()
      val novel = st.append(salted)
      val appendSec = (System.nanoTime() - a0) / 1e9
      val compactSec = if ((k + 1) % compactEvery == 0) {
        val c0 = System.nanoTime()
        st.compact()
        (System.nanoTime() - c0) / 1e9
      } else 0.0
      val screen = (1 to 2).map { _ =>
        val p0 = System.nanoTime()
        graft.streaming.StreamingQueries
          .screenAgainstStore(spark, idxDir)(batch)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - p0) / 1e9
      }
      println(f"""{"metric":"screen_ingest_curve","k":$k,""" +
        f""""append_sec":$appendSec%.3f,"novel":$novel,""" +
        f""""store_rows":${st.rows},"fanout":${st.fanout},""" +
        f""""files":${fileCount(idxDir)},"compact_sec":$compactSec%.3f,""" +
        s""""screen":[${screen.map(p => f"$p%.3f").mkString(",")}]}""")
    }
    val calPost = BenchCal.calibrate(spark)
    println(f"""{"metric":"screen_ingest_cal","pre":$calPre%.2f,""" +
      f""""post":$calPost%.2f,"idle_ref":${BenchCal.idleRef},""" +
      s""""idle_watch_attempts":${watch.attempts},""" +
      s""""degraded":${math.max(calPre, calPost) > 1.5 * BenchCal.idleRef}}""")
    spark.stop()
  }
}
