package graft

import graft.ext.{CheckpointStrategy, Clustering, SpanDedup, TextAnalysis}
import graft.sources.Tables

/** Same-sitting A/B of the r18 optimization-round subtree changes, on
  * SPARK_GRAFT_SF_DIR (PairFilterProbe's methodology verbatim: the box's
  * burst throttle confounds cross-sitting comparisons, so each A/B runs
  * both variants interleaved A,B,B,A in ONE JVM sitting, best-of-2 per
  * variant):
  *
  *  - qt19 fused vs the pre-r18 three-consumer shape (one gram pass +
  *    flag join vs three gram executions + doc-keyed join);
  *  - qc04 with vs without the per-step err pin (one score pass per
  *    step vs two);
  *  - qd18 with vs without per-batch signature reuse (md5+simhash
  *    localCheckpointed once per batch vs re-derived per consumer).
  *
  * Every pair is output-identical by construction (spec-pinned); this
  * probe records what the physical change buys. Output: one JSON line
  * per query (`"metric":"ab_probe"`, on = the new shape).
  */
object OptProbe {

  private def timeIt(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-opt-probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_OPT_SOAK_MULT=30: A/B on an N× soak tier instead of the
    // base dir (StageProbe's generate-if-missing; combine with
    // SPARK_GRAFT_SOAK_TABLES=documents to skip unneeded fact tables).
    val dir = sys.env.get("SPARK_GRAFT_OPT_SOAK_MULT").map(_.toInt) match {
      case Some(m) =>
        val out = s"target/soak/x$m"
        val missing = Seq("documents", "embeddings").filterNot(t =>
          new java.io.File(s"$out/$t.parquet/_SUCCESS").exists())
        if (missing.nonEmpty) {
          System.err.println(
            s"[opt-probe] generating ${m}x ${missing.mkString("+")} under $out")
          Soak.generate(spark, base, out, m, zipf = false,
            tables = missing.toSet)
        }
        out
      case None => base
    }
    Tables.documents(spark, dir).limit(1000).count() // warmup

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // Checkpoint blocks accumulate across passes (ContextCleaner cleanup
    // is GC-driven, not prompt) — clear after every pass so each starts
    // from the same storage state (the PairFilterProbe/ADVICE r15 rule).
    def clearStorage(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))

    // SPARK_GRAFT_OPT_COLD=1: drop the OS page cache before EVERY timed
    // pass (sync + /proc/sys/vm/drop_caches — the sandbox grants it), so
    // the A/B measures cold-storage scans instead of page-cache replays.
    // This is the evidence channel VERDICT r18 Next #2/#6 asked for: at
    // warm 30×/100× every re-scan is a memcpy, which systematically
    // underprices the scan-elimination shapes (qe04) and underprices
    // re-reading a materialization (qt19).
    val cold = sys.env.get("SPARK_GRAFT_OPT_COLD").contains("1")
    def dropPageCache(): Unit = {
      import scala.sys.process._
      val rc = Seq("sh", "-c", "sync && echo 3 > /proc/sys/vm/drop_caches").!
      require(rc == 0, "SPARK_GRAFT_OPT_COLD=1 but drop_caches failed")
    }

    def ab(name: String, a: => Unit, b: => Unit): Unit = {
      def pass(f: => Unit): Double = {
        if (cold) dropPageCache()
        val t = timeIt(f); clearStorage(); t
      }
      val tA1 = pass(a); val tB1 = pass(b)
      val tB2 = pass(b); val tA2 = pass(a)
      println(f"""{"metric":"ab_probe","query":"$name","dir":"$dir","cold":$cold,"on_sec":${math.min(tA1, tA2)}%.3f,"off_sec":${math.min(tB1, tB2)}%.3f,"on_passes":[$tA1%.3f,$tA2%.3f],"off_passes":[$tB1%.3f,$tB2%.3f]}""")
    }

    // SPARK_GRAFT_OPT_EXPLAIN=1: instead of timing, print each variant's
    // formatted physical plan (the plans/r18 before/after evidence comes
    // from the same variant definitions the A/B times). For the
    // driver-loop queries (qc04/qd18) whose registry frame is a local
    // result, the meaningful plan is per-step — dumped by the loop itself
    // is overkill; the A/B seconds plus the code diff carry those.
    val explainOnly = sys.env.get("SPARK_GRAFT_OPT_EXPLAIN").contains("1")
    def abOrExplain(name: String, a: => org.apache.spark.sql.DataFrame,
        b: => org.apache.spark.sql.DataFrame): Unit =
      if (explainOnly) {
        println(s"\n========== $name AFTER (shipping) ==========")
        a.explain("formatted")
        println(s"\n========== $name BEFORE (control) ==========")
        b.explain("formatted")
      } else ab(name, noop(a), noop(b))

    val only = sys.env.get("SPARK_GRAFT_OPT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def want(n: String): Boolean = only.forall(_.exists(n.startsWith))

    if (want("qt19")) abOrExplain("qt19_fused",
      TextAnalysis.qt19Impl(spark, dir, fused = true),
      TextAnalysis.qt19Impl(spark, dir, fused = false))
    if (want("qt09")) abOrExplain("qt09_fused",
      TextAnalysis.qt09Impl(spark, dir, fused = true),
      TextAnalysis.qt09Impl(spark, dir, fused = false))
    if (want("qc04")) ab("qc04_err_pin",
      noop(Clustering.qc04Impl(spark, dir, CheckpointStrategy.LocalDisk,
        pinErr = true)),
      noop(Clustering.qc04Impl(spark, dir, CheckpointStrategy.LocalDisk,
        pinErr = false)))
    if (want("qd18")) ab("qd18_sig_reuse",
      noop(SpanDedup.ingestSequentially(spark, Tables.documents(spark, dir),
        reuseSigs = true)),
      noop(SpanDedup.ingestSequentially(spark, Tables.documents(spark, dir),
        reuseSigs = false)))
    if (want("qd18c")) ab("qd18_append_compact",
      noop(SpanDedup.ingestSequentially(spark, Tables.documents(spark, dir),
        compactAppends = true)),
      noop(SpanDedup.ingestSequentially(spark, Tables.documents(spark, dir),
        compactAppends = false)))
    // qd18 merge overlap (r19, VERDICT r18 Next #3): h/chunks stage writes
    // and appends overlapped from a second thread vs the sequential loop.
    if (want("qd18o")) ab("qd18_merge_overlap",
      noop(SpanDedup.ingestSequentially(spark, Tables.documents(spark, dir),
        overlapMerge = true)),
      noop(SpanDedup.ingestSequentially(spark, Tables.documents(spark, dir),
        overlapMerge = false)))
    // qe04's Lloyd refine loop (3 iterations), single-pass vs the
    // 4-branch union — the refine step collects bounded codebook scalars
    // itself, so the trajectory IS the timed action (no noop needed).
    if (want("qe04")) {
      val emb = Tables.embeddings(spark, dir)
      def init = graft.ext.Embeddings.initCbs(
        graft.ext.Embeddings.pqSample(spark, dir))
      def train(sp: Boolean): Unit = {
        (1 to 3).foldLeft(init) { (c, _) =>
          graft.ext.Embeddings.pqRefineStepOn(emb, c, singlePass = sp)
        }: Unit
      }
      ab("qe04_singlepass_refine", train(true), train(false))
    }
    // components stage ISOLATED (the qd08/qd16/qx18 shared kernel): the
    // qd03 pair frame is staged once to parquet outside the timed region
    // (NOT localCheckpointed — clearStorage() between passes would drop
    // the blocks) so the A/B measures the label-propagation loop alone,
    // not the LSH stage.
    // The corpus-sized qd03 pair frame backing the graph-kernel A/Bs is
    // staged ONCE to a temp parquet dir outside the timed region (NOT
    // localCheckpointed — clearStorage() between passes would drop the
    // blocks) and registered for deletion at JVM exit (ADVICE r18: the
    // r18 probe leaked this dir per run).
    lazy val stagedPairs: org.apache.spark.sql.DataFrame = {
      val stage = java.nio.file.Files.createTempDirectory("graft-opt-pairs-")
      SpanDedup.registerTempRoot(stage)
      Registry.byName("qd03_minhash_lsh_pairs").run(spark, dir)
        .write.mode("overwrite").parquet(stage.toString)
      spark.read.parquet(stage.toString)
    }
    if (want("qd08")) {
      def pairs = stagedPairs
      ab("qd08_components_copart",
        noop(graft.ext.Dedup.components(pairs, coPart = true)),
        noop(graft.ext.Dedup.components(pairs, coPart = false)))
    }
    // qd09 pageRank layout (r19, VERDICT r18 Next #5). Two rows: the
    // shipping-candidate comparison (Reliable+coPart vs the Local plain
    // default) and the tier-cost control (Reliable plain vs Local plain)
    // that isolates how much of the delta is the checkpoint tier itself.
    if (want("qd09")) {
      val ckptDir = java.nio.file.Files.createTempDirectory("graft-opt-ckpt-")
      SpanDedup.registerTempRoot(ckptDir)
      spark.sparkContext.setCheckpointDir(ckptDir.toString)
      import graft.ext.Dedup
      def pairs = stagedPairs
      if (explainOnly) {
        // the output checkpoint collapses the executed plan to a
        // LogicalRDD, so the explain evidence uses the pre-checkpoint
        // iteration frame (pageRankBuild) for both layouts
        println("\n========== qd09 pageRank AFTER (Reliable+coPart) ==========")
        Dedup.pageRankBuild(pairs, CheckpointStrategy.Reliable,
          coPart = true)._1.explain("formatted")
        println("\n========== qd09 pageRank BEFORE (Local plain) ==========")
        Dedup.pageRankBuild(pairs, CheckpointStrategy.Local,
          coPart = false)._1.explain("formatted")
      } else {
        ab("qd09_pagerank_copart",
          noop(Dedup.pageRank(pairs, CheckpointStrategy.Reliable, coPart = true)),
          noop(Dedup.pageRank(pairs, CheckpointStrategy.Local, coPart = false)))
        ab("qd09_pagerank_reliable_ctrl",
          noop(Dedup.pageRank(pairs, CheckpointStrategy.Reliable, coPart = false)),
          noop(Dedup.pageRank(pairs, CheckpointStrategy.Local, coPart = false)))
      }
    }
    spark.stop()
  }
}
