package graft

import java.io.File

import org.apache.spark.sql.functions._

import graft.ext.SpanDedup
import graft.sources.Tables

/** qd18 steady-state ingest curve: drive the persisted dedup-state loop
  * copy-by-copy over the Zipf soak corpus and time each batch's two
  * phases separately as the signature store grows:
  *
  *  - CLASSIFY — the claim under test is qd13's cap argument carried into
  *    the loop: per-batch classification cost is O(|batch| × bands ×
  *    BucketCap) — FLAT in store size, because the bucket cap bounds the
  *    compare fan-out per incoming chunk no matter how many signatures
  *    the store has accumulated.
  *  - MERGE — with the round-12 hash-prefix-partitioned store this is
  *    O(|batch|) for all-new doc ids (pure file append into partition
  *    dirs; the r11 full-snapshot rewrite was honestly O(|store|) per
  *    batch) plus an amortized compaction every [[CompactEvery]] batches
  *    (timed separately as `compact_sec` — the O(|store|/C) move of the
  *    log-structured trade).
  *
  * Batches are groups of corpus copies (doc_id ∈ [k·cpb·off,
  * (k+1)·cpb·off)), pushed down to the store/batch parquet scans; set
  * SPARK_GRAFT_INGEST_COPIES_PER_BATCH > 1 to reach the decade tier
  * (e.g. mult=1000, cpb=25 → 40 batches growing the store to ~5 M
  * signatures). The Zipf duplication rule means later copies carry
  * verbatim hot docs — so classify must actually FIND dups against an
  * ever-older store (status counts are reported as the efficacy signal,
  * not just wall time).
  *
  * After the curve, a RE-INGEST probe merges a batch of already-stored
  * doc ids drawn from a SINGLE hash-prefix partition: its merge must
  * rewrite exactly 1 of 16 partitions (`touched`:1, ~|store|/16 rows),
  * demonstrating that replace cost tracks touched partitions, not
  * |store| — the claim the partitioned layout exists to make true.
  *
  * Output: one JSON line {"metric":"ingest_curve","mult":M,
  * "copies_per_batch":C,"batches":[{"k":i,"classify_sec":s,
  * "merge_sec":s,"compact_sec":s,"touched":t,"store_rows":n,"exact":n,
  * "near":n,"new":n},...],"reingest":{"docs":n,"touched":t,
  * "merge_sec":s}} consumed into BASELINE.md.
  */
object IngestCurve {

  /** Compact the store's append files every this many batches
    * (SPARK_GRAFT_INGEST_COMPACT_EVERY; 0 disables — the no-compaction
    * CONTROL whose file counts grow with every append batch, against
    * which the compacting run's bounded counts are the evidence). */
  val CompactEvery = 10

  /** Parquet data-file count under a store table dir — the read-side
    * cost driver compaction exists to bound (every probe/classify scan
    * opens them). Reported per batch as h_files/c_files. */
  private def fileCount(dir: String): Int = {
    def walk(f: File): Int =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0)
      else if (f.getName.endsWith(".parquet")) 1 else 0
    walk(new File(dir))
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_SOAK_MULT", "30").toInt
    val cpb = sys.env.getOrElse("SPARK_GRAFT_INGEST_COPIES_PER_BATCH", "1").toInt
    val compactEvery = sys.env.getOrElse("SPARK_GRAFT_INGEST_COMPACT_EVERY",
      CompactEvery.toString).toInt
    val dir = s"target/soak/zipf_x$mult"
    val spark = GraftSession.local("graft-ingest-curve",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    if (!new File(s"$dir/documents.parquet").exists())
      Soak.generate(spark, base, dir, mult, zipf = true, Set("documents"))

    val docs = Tables.documents(spark, dir)
    val off = Tables.documents(spark, base).agg(max(col("doc_id")))
      .collect()(0).getLong(0) + 1

    val root = java.nio.file.Files.createTempDirectory("graft-ingest-curve-")
    SpanDedup.registerTempRoot(root) // shared shutdown cleanup (ADVICE r11)
    val store = SpanDedup.SignatureStore(root).init()

    def sec(t0: Long): Double = (System.nanoTime() - t0) / 1e9
    def sigsOf(batch: org.apache.spark.sql.DataFrame) = (
      batch.select(col("doc_id"), md5(col("text")).as("h")),
      SpanDedup.simhashChunks(batch)
        .select(col("doc_id"), col("c"), col("chunk"), col("simhash")))

    // ceil(mult / cpb) batches: a trailing mult % cpb remainder gets a
    // final SHORT batch (upper bound clamped to the corpus end) instead of
    // being silently dropped (ADVICE r12) — the curve's store_rows and
    // classify efficacy cover exactly the mult copies the env var implies
    val nBatches = (mult + cpb - 1) / cpb
    val rows = (0 until nBatches).map { k =>
      val copies = math.min(cpb, mult - k * cpb)
      val batch = docs.filter(
        col("doc_id") >= k.toLong * cpb * off &&
        col("doc_id") < math.min((k + 1).toLong * cpb, mult.toLong) * off)

      val tc = System.nanoTime()
      val counts = SpanDedup.classifyAgainstState(batch,
          store.readH(spark), store.readChunks(spark))
        .groupBy(col("status")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val classifySec = sec(tc)

      val tm = System.nanoTime()
      val (batchH, batchC) = sigsOf(batch)
      val touched = store.merge(spark, batchH, batchC)
      val mergeSec = sec(tm)

      val tk = System.nanoTime()
      if (compactEvery > 0 && (k + 1) % compactEvery == 0) store.compact(spark)
      val compactSec = sec(tk)

      val storeRows = store.readH(spark).count()
      val storeFiles = fileCount(root.toString)
      println(f"[ingest] k=$k classify=$classifySec%.2f merge=$mergeSec%.2f " +
        f"compact=$compactSec%.2f touched=${touched.size} store=$storeRows " +
        s"files=$storeFiles counts=$counts")
      f"""{"k":$k,"copies":$copies,"classify_sec":$classifySec%.2f,"merge_sec":$mergeSec%.2f,""" +
        f""""compact_sec":$compactSec%.2f,"touched":${touched.size},""" +
        s""""store_files":$storeFiles,""" +
        s""""store_rows":$storeRows,"exact":${counts.getOrElse("exact_dup", 0L)},""" +
        s""""near":${counts.getOrElse("near_dup", 0L)},"new":${counts.getOrElse("new", 0L)}}"""
    }

    // re-ingest probe: already-stored docs from ONE hash-prefix partition
    val reDocs = docs.filter(col("doc_id") < off)
      .filter(substring(md5(col("doc_id").cast("string")), 1, 1) === "0")
    val nRe = reDocs.count()
    val tr = System.nanoTime()
    val (reH, reC) = sigsOf(reDocs)
    val reTouched = store.merge(spark, reH, reC)
    val reSec = sec(tr)
    println(f"[ingest] reingest docs=$nRe touched=${reTouched.size} " +
      f"merge=$reSec%.2f")

    println(s"""{"metric":"ingest_curve","mult":$mult,"copies_per_batch":$cpb,""" +
      s""""compact_every":$compactEvery,""" +
      s""""batches":[${rows.mkString(",")}],""" +
      f""""reingest":{"docs":$nRe,"touched":${reTouched.size},"merge_sec":$reSec%.2f}}""")
    spark.stop()
  }
}
