package graft

import org.apache.spark.sql.DataFrame

import graft.ext.{CheckpointStrategy, Clustering, Dedup, Embeddings,
  SpanDedup, TextAnalysis}
import graft.sources.Tables

/** Round-18 optimization variants: every A/B pair OptProbe times must be
  * OUTPUT-IDENTICAL by construction — the oracle gates pin only the
  * shipping default, so this spec pins the control shapes against them
  * row-for-row (the qd19 sizeFilter precedent). A variant drifting from
  * its default would silently invalidate both the A/B comparison and the
  * "identical either way" claims in the scaladocs.
  */
class OptVariantsSpec extends SparkSpec {

  /** Sorted multiset, not Set: a variant that changed row MULTIPLICITY
    * (e.g. a fan-out join bug) must fail the pin too (ADVICE r18). */
  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("qt19 fused == unfused (rows)") {
    assert(rows(TextAnalysis.qt19Impl(spark, sf, fused = true)) ==
      rows(TextAnalysis.qt19Impl(spark, sf, fused = false)))
  }

  test("qt09 fused == unfused (rows)") {
    assert(rows(TextAnalysis.qt09Impl(spark, sf, fused = true)) ==
      rows(TextAnalysis.qt09Impl(spark, sf, fused = false)))
  }

  test("qc04 pinned err == recomputed err (full trajectory)") {
    assert(rows(Clustering.qc04Impl(spark, sf, CheckpointStrategy.LocalDisk,
        pinErr = true)) ==
      rows(Clustering.qc04Impl(spark, sf, CheckpointStrategy.LocalDisk,
        pinErr = false)))
  }

  test("qe04 single-pass refine step == 4-branch union refine step") {
    val init = Embeddings.initCbs(Embeddings.pqSample(spark, sf))
    val emb = Tables.embeddings(spark, sf)
    val a = Embeddings.pqRefineStepOn(emb, init, singlePass = true)
    val b = Embeddings.pqRefineStepOn(emb, init, singlePass = false)
    assert(a.map(_.map(_.toSeq)) == b.map(_.map(_.toSeq)))
  }

  test("qd18 signature reuse and append compaction leave statuses unchanged") {
    val docs = Tables.documents(spark, sf)
    val base = rows(SpanDedup.ingestSequentially(spark, docs))
    assert(rows(SpanDedup.ingestSequentially(spark, docs,
      reuseSigs = true)) == base)
    assert(rows(SpanDedup.ingestSequentially(spark, docs,
      compactAppends = false)) == base)
    assert(rows(SpanDedup.ingestSequentially(spark, docs,
      overlapMerge = false)) == base)
  }

  test("components coPart layout == plain layout (labels)") {
    val pairs = Registry.byName("qd03_minhash_lsh_pairs").run(spark, sf)
      .select("doc_a", "doc_b").localCheckpoint(true)
    assert(rows(Dedup.components(pairs, coPart = true)) ==
      rows(Dedup.components(pairs, coPart = false)))
  }

  test("pageRank coPart/Reliable layout == plain/Local layout (ranks)") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft_opt_ckpt")
    spark.sparkContext.setCheckpointDir(ckpt.toString)
    val pairs = Registry.byName("qd03_minhash_lsh_pairs").run(spark, sf)
      .select("doc_a", "doc_b").localCheckpoint(true)
    assert(rows(Dedup.pageRank(pairs, CheckpointStrategy.Reliable,
        coPart = true)) ==
      rows(Dedup.pageRank(pairs, CheckpointStrategy.Local,
        coPart = false)))
  }

}
