package graft

import java.io.File

import org.apache.spark.sql.functions._

import graft.ext.SpanDedup
import graft.sources.Tables

/** qd18 steady-state ingest curve: drive the persisted dedup-state loop
  * copy-by-copy over the 30× Zipf soak corpus and time each batch's two
  * phases separately as the signature store grows:
  *
  *  - CLASSIFY — the claim under test is qd13's cap argument carried into
  *    the loop: per-batch classification cost is O(|batch| × bands ×
  *    BucketCap) — FLAT in store size, because the bucket cap bounds the
  *    compare fan-out per incoming chunk no matter how many signatures
  *    the store has accumulated.
  *  - MERGE — honestly O(|store|) per batch (snapshot rewrite): the
  *    log-structured compaction trade, expected to grow linearly with
  *    the accumulated store. The production mitigation is hash-prefix
  *    partitioning (rewrite only touched partitions) + snapshot expiry,
  *    not a different algorithm.
  *
  * Batches are the corpus copies (doc_id ∈ [k·off, (k+1)·off)), pushed
  * down to the store/batch parquet scans. The Zipf duplication rule means
  * later copies carry verbatim hot docs — so classify must actually FIND
  * dups against an ever-older store (status counts are reported as the
  * efficacy signal, not just wall time).
  *
  * Output: one JSON line {"metric":"ingest_curve","mult":M,"batches":
  * [{"k":i,"classify_sec":s,"merge_sec":s,"store_rows":n,"exact":n,
  * "near":n,"new":n},...]} consumed into BASELINE.md.
  */
object IngestCurve {

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_SOAK_MULT", "30").toInt
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
    def hPath(v: Int) = s"$root/h_v$v"
    def cPath(v: Int) = s"$root/chunks_v$v"
    docs.select(col("doc_id"), md5(col("text")).as("h")).limit(0)
      .write.parquet(hPath(0))
    SpanDedup.simhashChunks(docs.limit(0))
      .select(col("doc_id"), col("c"), col("chunk"), col("simhash"))
      .write.parquet(cPath(0))

    def sec(t0: Long): Double = (System.nanoTime() - t0) / 1e9

    val rows = (0 until mult).map { k =>
      val batch = docs
        .filter(col("doc_id") >= k * off && col("doc_id") < (k + 1) * off)
      val stateH = spark.read.parquet(hPath(k))
      val stateC = spark.read.parquet(cPath(k))

      val tc = System.nanoTime()
      val counts = SpanDedup.classifyAgainstState(batch, stateH, stateC)
        .groupBy(col("status")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val classifySec = sec(tc)

      val tm = System.nanoTime()
      val batchH = batch.select(col("doc_id"), md5(col("text")).as("h"))
      val batchC = SpanDedup.simhashChunks(batch)
        .select(col("doc_id"), col("c"), col("chunk"), col("simhash"))
      stateH.join(batchH.select(col("doc_id")).distinct().hint("merge"),
          Seq("doc_id"), "left_anti")
        .union(batchH).write.parquet(hPath(k + 1))
      stateC.join(batchC.select(col("doc_id")).distinct().hint("merge"),
          Seq("doc_id"), "left_anti")
        .union(batchC).write.parquet(cPath(k + 1))
      val mergeSec = sec(tm)

      val storeRows = spark.read.parquet(hPath(k + 1)).count()
      println(f"[ingest] k=$k classify=$classifySec%.2f merge=$mergeSec%.2f " +
        s"store=$storeRows counts=$counts")
      f"""{"k":$k,"classify_sec":$classifySec%.2f,"merge_sec":$mergeSec%.2f,""" +
        s""""store_rows":$storeRows,"exact":${counts.getOrElse("exact_dup", 0L)},""" +
        s""""near":${counts.getOrElse("near_dup", 0L)},"new":${counts.getOrElse("new", 0L)}}"""
    }
    println(s"""{"metric":"ingest_curve","mult":$mult,"batches":[${rows.mkString(",")}]}""")
    spark.stop()
  }
}
