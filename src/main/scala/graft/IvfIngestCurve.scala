package graft

import java.io.File

import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** qs13 incremental-IVF ingest curve (VERDICT r13 Next #5): the IngestCurve
  * pattern applied to the persisted inverted file — drive K append batches
  * into the cell-partitioned index and time each batch's APPEND (assign new
  * vectors to frozen centroids, write only their cell partitions) and a
  * SERVE (qs12's DPP-pruned plan) after every batch, with the per-cell
  * parquet file count as the read-side cost driver. The claims under test:
  *
  *  - append cost tracks |batch|, not |index| — the existing index is
  *    never read or rewritten by an append (flat append_sec);
  *  - serve latency degrades with ACCUMULATED FILES, not index rows —
  *    every probed cell opens all its append files; compaction
  *    ([[Similarity.compactIvfIndex]] every `SPARK_GRAFT_IVF_COMPACT_EVERY`
  *    batches; 0 = control) bounds that count, so the compacting run's
  *    serve_sec stays flat while the control's grows with the curve.
  *
  * Centroids are frozen from the full corpus before batch 0 (qs13's
  * contract: assignment is a fixed projection, so incremental ≡ full build
  * regardless of arrival order — the gate pins that by hash; this probe
  * reports final serve rows as the cross-run consistency check).
  *
  * Output: one JSON line {"metric":"ivf_ingest_curve","dir":...,
  * "batches":[{"k":i,"append_sec":s,"serve_sec":s,"files":n,
  * "compact_sec":s},...]}.
  */
object IvfIngestCurve {

  private def fileCount(dir: String): Int = {
    def walk(f: File): Int =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0)
      else if (f.getName.endsWith(".parquet")) 1 else 0
    walk(new File(dir))
  }

  /** Max parquet-file count over the `c_id=*` cell directories — the
    * serve-side cost driver stated per cell: a probed cell opens ALL its
    * append files, so the worst cell's count bounds per-probe open/footer
    * cost regardless of how many batches produced it. */
  private def maxFilesPerCell(dir: String): Int =
    Option(new File(dir).listFiles()).getOrElse(Array.empty[File])
      .filter(f => f.isDirectory && f.getName.startsWith("c_id="))
      .map(f => fileCount(f.getPath))
      .foldLeft(0)(math.max)

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_IVF_BATCHES", "20").toInt
    val compactEvery =
      sys.env.getOrElse("SPARK_GRAFT_IVF_COMPACT_EVERY", "0").toInt
    // File-count-aware trigger (VERDICT r14 Next #7): compact when the
    // WORST cell's file count exceeds this, instead of on a batch cadence.
    // The r14 curve showed serve cost tracks open files, not batches — a
    // 100 TB operator states the knob in the unit that drives the cost.
    // 0 = off; takes precedence over COMPACT_EVERY when both are set.
    val maxFilesCell =
      sys.env.getOrElse("SPARK_GRAFT_IVF_MAX_FILES_PER_CELL", "0").toInt
    val spark = GraftSession.local("graft-ivf-ingest-curve",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    // soak corpora lack the raw-testdata nanos quirk; Tables handles both
    val e = graft.sources.Tables.embeddings(spark, dir)
    val cents = Similarity.ivfCentroids(spark, dir).localCheckpoint(true)
    val corpus = e.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))

    val path = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
      s"/graft-ivf-curve-p${ProcessHandle.current().pid()}"
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def del(f: File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(del)); f.delete(); ()
      }
      del(new File(path)); del(new File(path + ".old"))
      del(new File(path + ".compacting"))
    }))

    def sec(t0: Long): Double = (System.nanoTime() - t0) / 1e9
    var lastServeRows = 0L
    val rows = (0 until nBatches).map { k =>
      val batch = Similarity.cellsOf(cents,
        corpus.filter(col("n_id") % nBatches === k), "n_id", "n_emb", keep = 1)
        .select(col("n_id"), col("n_emb"), col("c_id"))
      val tA = System.nanoTime()
      batch.write.partitionBy("c_id")
        .mode(if (k == 0) "overwrite" else "append").parquet(path)
      val appendSec = sec(tA)
      val shouldCompact =
        if (maxFilesCell > 0) maxFilesPerCell(path) > maxFilesCell
        else compactEvery > 0 && k > 0 && k % compactEvery == 0
      val compactSec =
        if (shouldCompact) {
          val tC = System.nanoTime()
          Similarity.compactIvfIndex(spark, path)
          sec(tC)
        } else 0.0
      val files = fileCount(path)
      val perCell = maxFilesPerCell(path)
      val tS = System.nanoTime()
      lastServeRows =
        Similarity.serveIvf(spark, path, cents, e).count()
      val serveSec = sec(tS)
      f"""{"k":$k,"append_sec":$appendSec%.3f,"serve_sec":$serveSec%.3f,""" +
        f""""files":$files,"files_per_cell_max":$perCell,""" +
        f""""compact_sec":$compactSec%.3f}"""
    }
    // Content-hash invariant: compaction (any trigger) must not change what
    // serve returns. Order-insensitive XOR of per-row hashes over the full
    // top-k result — identical across control / cadence / threshold runs.
    // (bit_xor, not sum: a 64-bit hash sum overflows under ANSI; XOR is
    // total, and the (q_id, n_id, rank) rows are distinct so no pair of
    // identical hashes can cancel.)
    val serveHash = Similarity.serveIvf(spark, path, cents, e)
      .select(xxhash64(col("q_id"), col("n_id"), col("rank")).as("h"))
      .agg(expr("bit_xor(h)")).collect()(0).getLong(0)
    println(s"""{"metric":"ivf_ingest_curve","dir":"$dir",""" +
      s""""batches_n":$nBatches,"compact_every":$compactEvery,""" +
      s""""max_files_per_cell":$maxFilesCell,""" +
      s""""final_serve_rows":$lastServeRows,"serve_hash":$serveHash,""" +
      s""""batches":[${rows.mkString(",")}]}""")
    spark.stop()
  }
}
