package graft

import java.io.File
import org.scalatest.funsuite.AnyFunSuite

/** collect()-site census — BroadcastSiteSpec's rule applied to the other
  * driver-memory hazard: a `.collect()` on a corpus-sized frame is a
  * driver OOM at 100 TB exactly like a pinned broadcast of one. Every
  * collect in LIBRARY code (operators/ext/streaming/ysb/sinks/functions/
  * sources — measurement mains like Bench/Soak/AnnProbe legitimately
  * collect their own summaries) must be classified here with the
  * construction that bounds what it pulls to the driver. VERDICT r12
  * audited these sites by hand ("non-findings worth recording"); this
  * lint makes that audit standing — a new unclassified collect fails the
  * suite until justified or redesigned.
  */
class CollectSiteSpec extends AnyFunSuite {

  private val roots = Seq("operators", "ext", "streaming", "ysb", "sinks",
    "functions", "sources").map(d => new File(s"src/main/scala/graft/$d"))

  /** (file, trimmed line) -> (expected occurrences, boundedness proof). */
  private val manifest: Map[(String, String), (Int, String)] = Map(
    ("ext/Clustering.scala", """.select(col("id").as("j"), wOf(col("id")).as("w")).collect()""") ->
      (1, "model weight vector: exactly NumFeat rows (model-size constant)"),
    ("ext/Clustering.scala", ".collect()(0)") ->
      (1, "1-row global (n_docs, n_correct) accuracy frame"),
    ("ext/Clustering.scala", """.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap""") ->
      (1, "gradient frame: exactly NumFeat rows (qc04 SGD step)"),
    ("ext/TextAnalysis.scala", """.limit(k).collect()""") ->
      (1, "explicit limit(k): <= DistTrainBatchK top pair-count rows per round"),
    ("ext/TextAnalysis.scala", """.agg(max(length(col("s"))).as("m")).collect()(0) match {""") ->
      (1, "1-row global max-symbol-length frame (batching soundness guard)"),
    ("ext/Dedup.scala", ".collect()(0).getLong(0)") ->
      (1, "1-row count frame (iteration size probe)"),
    ("ext/Dedup.scala", """changed = next.agg(coalesce(sum(col("chg")), lit(0L))).collect()(0).getLong(0)""") ->
      (1, "1-row convergence counter per pointer-doubling round"),
    ("ext/Embeddings.scala", """.collect().map(_.getSeq[Float](1).toArray)""") ->
      (1, "fixed-size codebook sample: PqK rows by construction"),
    ("ext/Embeddings.scala", ".collect()") ->
      (1, "fixed-K centroid/codebook frame (training literals)"),
    ("ext/Embeddings.scala", """.limit(Similarity.IvfK + PqK).collect()""") ->
      (1, "explicit limit(IvfK + PqK): bounded sample rows"),
    ("ext/SpanDedup.scala", """.collect().map(_.getString(0)).toSeq.sorted""") ->
      (2, "dp partition keys: <= 16 hash-prefix values by construction"),
    ("streaming/StreamingQueries.scala", ".collect().toSeq") ->
      (1, "per-shard sketch summaries: <= shards x capacity rows (SpaceSaving bound)"),
    ("streaming/StreamingQueries.scala", "qst27Values.put(d, b.collect()") ->
      (1, "per-event-type quantile rows: <= |event types| (enum-bounded)"),
    ("streaming/StreamingQueries.scala", """max(unix_micros(col("ts"))).as("hi")).collect()(0) // 2 scalars""") ->
      (1, "1-row global (min ts, max ts) bounds frame for the replay split"),
    ("streaming/StreamingQueries.scala", """java.util.Arrays.asList(built.collect(): _*), built.schema)""") ->
      (1, "bm25 query-term index: one row per derived query (= 3) by construction"),
    ("streaming/FingerprintStore.scala", """.collect().map(_.getInt(0)).sorted.toSeq""") ->
      (1, "screen/append prefix probe: <= fanout <= ScreenFanoutMax " +
        "(4096) rows by construction (hp = pmod(h, fanout); the distinct " +
        "runs distributed, the driver sees only its bounded image)"),
    ("streaming/FingerprintStore.scala", """.limit(pushdownCap + 1).collect().map(_.getLong(0))""") ->
      (1, "screen/append value probe: explicit limit(cap + 1) — an " +
        "over-cap batch materializes at most cap + 1 longs, then the " +
        "pushdown is skipped (VERDICT r17 #1: never collects the full " +
        "distinct set just to discard it)"),
    ("ext/TextAnalysis.scala", """val rows = vocab.select(col("freq"), col("enc")).collect()""") ->
      (1, "BPE word-type vocab: GUARDED by the preceding count() <= LocalTrainMaxTypes check, distributed fallback above it"))

  private def scalaFiles(dir: File): Seq[File] =
    if (!dir.exists()) Nil
    else {
      val (dirs, files) = dir.listFiles.toSeq.partition(_.isDirectory)
      files.filter(_.getName.endsWith(".scala")) ++ dirs.flatMap(scalaFiles)
    }

  private def scan(): Map[(String, String), Int] =
    roots.flatMap { root =>
      scalaFiles(root).flatMap { f =>
        val rel = f.getPath.stripPrefix("src/main/scala/graft/")
        val src = scala.io.Source.fromFile(f, "UTF-8")
        try src.getLines().map(_.trim).filter { l =>
          l.contains(".collect()") && !l.startsWith("*") && !l.startsWith("//")
        }.map(l => (rel, l)).toList
        finally src.close()
      }
    }.groupBy(identity).map { case (k, v) => k -> v.size }

  test("every collect() in library code is classified bounded-by-construction") {
    val found = scan()
    val unclassified = found.keySet -- manifest.keySet
    assert(unclassified.isEmpty,
      "unclassified collect() sites (add to the manifest with a boundedness " +
        "proof, or keep the data distributed):\n  " +
        unclassified.toSeq.sorted.mkString("\n  "))
    val stale = manifest.keySet -- found.keySet
    assert(stale.isEmpty,
      s"stale manifest entries:\n  ${stale.toSeq.sorted.mkString("\n  ")}")
    val miscounted = found.collect {
      case (k, n) if manifest(k)._1 != n => s"$k: found $n, manifest says ${manifest(k)._1}"
    }
    assert(miscounted.isEmpty, miscounted.mkString("\n"))
  }
}
