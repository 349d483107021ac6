package graft

import java.io.File

/** BPE-trainer cost-per-merge curve (VERDICT r09 Next #3 / r10 carry):
  * train the qt16 tokenizer to SPARK_GRAFT_BPE_DEPTH merges (default 20,
  * the gated depth) on the 30× soak documents corpus and report seconds
  * per merge step. The claim under test: with per-iteration eager
  * localCheckpoint the cost per merge is FLAT in the step index —
  * one pair-count shuffle + one O(vocab) replace each — where the
  * round-≤10 lineage-growing form was O(i) per step (and the naive
  * cache-nesting form OOMs the driver on plan-string rendering at depth
  * 20 before cost even matters). Vocab sizes are also reported: the
  * corpus-scale anchor is that training cost is driven by the WORD-TYPE
  * vocabulary (Heaps-law sublinear in corpus size), not corpus rows.
  *
  * Output: one JSON line {"metric":"bpe_curve","mult":M,"vocab":V,
  * "steps":[{"step":i,"sec":s},...]} consumed into BASELINE.md.
  */
object BpeCurve {

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_SOAK_MULT", "30").toInt
    val depth = sys.env.getOrElse("SPARK_GRAFT_BPE_DEPTH", "20").toInt
    val dir = s"target/soak/x$mult"
    val spark = GraftSession.local("graft-bpe-curve",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    if (!new File(s"$dir/documents.parquet").exists())
      Soak.generate(spark, base, dir, mult, zipf = false, Set("documents"))

    val vocab = graft.ext.TextAnalysis.bpeVocab(spark, dir)
    val vocabSize = vocab.count()

    val steps = Seq.newBuilder[String]
    // forceDistributed: the curve's claim is about the DISTRIBUTED fold
    // loop (flat cost per merge, no lineage growth) — the shipping hybrid
    // would short-circuit to the driver-local path at this vocab size
    val merges = graft.ext.TextAnalysis.trainBpe(vocab, depth,
      (i, nanos) => steps += f"""{"step":$i,"sec":${nanos / 1e9}%.3f}""",
      forceDistributed = true)
    require(merges.size == depth, s"trained ${merges.size}/$depth")
    // the hybrid's local path on the same vocab: one collect + the whole
    // merge loop on the driver, merge-sequence equality asserted here so
    // the speedup row can never quote a diverging trainer
    val t0 = System.nanoTime()
    val local = graft.ext.TextAnalysis.trainBpe(vocab, depth)
    val localSec = (System.nanoTime() - t0) / 1e9
    require(local == merges, "local trainer diverged from distributed")
    println(s"""{"metric":"bpe_curve","mult":$mult,"vocab":$vocabSize,""" +
      f""""depth":$depth,"local_total_sec":$localSec%.3f,""" +
      s""""steps":[${steps.result().mkString(",")}]}""")
    spark.stop()
  }
}
