package graft

import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** ANN sizing evidence for the 100 TB claim: qs02's gated config is 4
  * planes / 16 buckets (oracle-stable at test SF); the production sizing
  * rule is "pick planes so N / 2^planes fits a task". This probe measures
  * that rule on the soak corpus: for planes ∈ {4, 8, 12} it reports bucket
  * occupancy (observed mean/max vs the N / 2^planes expectation), the
  * fraction of the corpus each query actually scans, and recall@3 against
  * the exact qs01 baseline at nprobe ∈ {1, 4}.
  *
  * One JSON line per (planes, nprobe) → BASELINE.md's ANN sizing table.
  * (Driver embeddings are isotropic noise — recall here is the no-structure
  * floor; SimilaritySpec pins recall ≥ 0.9 on planted clusters.)
  */
object AnnProbe {

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_ANN_DIR", "target/soak/x10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local("graft-ann-probe", cpus)
    spark.sparkContext.setLogLevel("ERROR")

    val corpusN = graft.sources.Tables.embeddings(spark, dir)
      .filter(col("vec_id") >= 10).count()
    val exact = Registry.byName("qs01_knn_brute").run(spark, dir)
      .filter(col("rank") <= 3).select(col("q_id"), col("n_id"))
      .localCheckpoint(true)
    val exactN = exact.count()

    def js(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))

    for (planes <- Seq(4, 8, 12)) {
      val occ = Similarity.lshBucketStats(spark, dir, planes)
        .agg(count(lit(1)).as("buckets"), max(col("n")).as("mx"),
          avg(col("n")).as("mean")).collect()(0)
      for (nprobe <- Seq(1, 4)) {
        val ann = Similarity.lshAnn(spark, dir, planes, nprobe, topK = 3)
          .select(col("q_id"), col("n_id"))
        val hit = ann.join(exact, Seq("q_id", "n_id")).count()
        // per-query scanned fraction ≈ nprobe · mean-bucket / N
        val scanned = nprobe * occ.getAs[Double]("mean") / corpusN
        println(s"""{"metric":"ann_probe","planes":$planes,"nprobe":$nprobe,""" +
          s""""corpus":$corpusN,"buckets_live":${occ.getAs[Long]("buckets")},""" +
          s""""expected_mean":${js(corpusN.toDouble / (1 << planes))},""" +
          s""""observed_mean":${js(occ.getAs[Double]("mean"))},""" +
          s""""max_bucket":${occ.getAs[Long]("mx")},""" +
          s""""scanned_frac":${js(scanned)},""" +
          s""""recall_at3":${js(hit.toDouble / exactN)}}""")
      }
    }

    // ---------------------------------------------------------------
    // PQ training recall ladder (VERDICT r11 Next #3): recall@5 of the
    // ADC search against the exact L2 top-5 as the codebooks train
    // through Lloyd iterations 0 (sampled) / 1 / 2 / 4, with the total
    // distortion alongside — the measured claim behind "qe04 is the
    // trainer that raises qs07's recall".
    // ---------------------------------------------------------------
    import graft.ext.Embeddings
    val e = graft.sources.Tables.embeddings(spark, dir)
    val l2 = "aggregate(zip_with(q_emb, n_emb, (a, b) -> " +
      "(cast(a as double) - b) * (cast(a as double) - b)), 0D, (acc, x) -> acc + x)"
    val wL2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("l2").asc, col("n_id").asc)
    val exactL2 = e.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
      .crossJoin(broadcast(e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))))
      .select(col("q_id"), col("n_id"), expr(l2).as("l2"))
      .withColumn("r", row_number().over(wL2)).filter(col("r") <= 5)
      .select(col("q_id"), col("n_id")).localCheckpoint(true)
    val exactL2N = exactL2.count()
    var cbs = Embeddings.initCbs(Embeddings.pqSample(spark, dir))
    var iter = 0
    for (target <- Seq(0, 1, 2, 4)) {
      while (iter < target) { cbs = Embeddings.pqRefineStep(spark, dir, cbs); iter += 1 }
      val enc = Embeddings.pqEncodedWith(e, cbs.map(Embeddings.cbLitD))
      val distortion = enc.select((0 until Embeddings.SubVecs)
          .map(j => col(s"s$j.err")).reduce(_ + _).as("err"))
        .agg(sum(col("err"))).collect()(0).getDouble(0)
      val hits = Embeddings.adcSearch(e, cbs, topK = 5)
        .select(col("q_id"), col("n_id"))
        .join(exactL2, Seq("q_id", "n_id")).count()
      println(s"""{"metric":"pq_recall_ladder","lloyd_iters":$target,""" +
        s""""recall_at5":${js(hits.toDouble / exactL2N)},""" +
        s""""distortion":${js(distortion)}}""")
    }

    // residual rung: recall@5 of the qs09 residual-IVFADC path on the
    // same exact-L2 baseline (cells restrict candidates AND residual
    // codes replace raw codes — the two differences vs the iters=0 rung)
    val resHits = Registry.byName("qs09_ivfadc_residual").run(spark, dir)
      .select(col("q_id"), col("n_id"))
      .join(exactL2, Seq("q_id", "n_id")).count()
    // attribution: the cell CEILING is the share of true top-5 that lie
    // in a probed cell at all — no code scheme can beat it; the gap
    // between ceiling and achieved is the quantization loss, the gap
    // from 1.0 is the coarse-probe loss (dominant on isotropic data)
    val cents0 = Similarity.ivfCentroids(spark, dir)
    val probedPairs = Similarity.cellsOf(cents0,
        e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
        "q_id", "q_emb", keep = 2)
      .select(col("q_id"), col("c_id"))
      .join(Similarity.cellsOf(cents0,
          e.filter(col("vec_id") >= 10)
            .select(col("vec_id").as("n_id"), col("embedding").as("n_emb")),
          "n_id", "n_emb", keep = 1)
        .select(col("n_id"), col("c_id")), Seq("c_id"))
      .select(col("q_id"), col("n_id"))
    val ceiling = probedPairs.join(exactL2, Seq("q_id", "n_id")).count()
    println(s"""{"metric":"pq_recall_ladder","variant":"residual_ivfadc",""" +
      s""""recall_at5":${js(resHits.toDouble / exactL2N)},""" +
      s""""cell_ceiling":${js(ceiling.toDouble / exactL2N)}}""")
    // trained-residual rung: two Lloyd iterations ON THE RESIDUAL frame
    // (the production IVFADC training step) — the lift over the sampled
    // residual codebooks above is the trained-residual claim, measured
    val rFrame = Embeddings.residualFrame(e, Similarity.ivfCentroids(spark, dir))
      .localCheckpoint(true)
    var rcbs = Embeddings.pqResidualCbs(spark, dir)
    (1 to 2).foreach(_ => rcbs = Embeddings.pqRefineStepOn(rFrame, rcbs))
    val trainedHits = Embeddings.ivfadcSearch(spark, dir, rcbs, topK = 5)
      .select(col("q_id"), col("n_id"))
      .join(exactL2, Seq("q_id", "n_id")).count()
    println(s"""{"metric":"pq_recall_ladder","variant":"residual_ivfadc_trained2",""" +
      s""""recall_at5":${js(trainedHits.toDouble / exactL2N)},""" +
      s""""cell_ceiling":${js(ceiling.toDouble / exactL2N)}}""")

    // ---------------------------------------------------------------
    // qs08 candidate bound: with corpus cells keep = 1 and nprobe = 2,
    // each query ADC-scores exactly the rows of its two probed cells —
    // cell-bounded, never the corpus. Reported as mean/max candidates
    // per query vs N (the soak row VERDICT r11 Next #2 asks for).
    // ---------------------------------------------------------------
    // ---------------------------------------------------------------
    // Serving-family tier rows (VERDICT r12 Next #3): best-of-2 serve
    // seconds at THIS corpus plus recall@3 against the exact cosine
    // baseline for the members whose ranking family is cosine top-k
    // (qs08 IVF×PQ, qs10 RRF hybrid, qs12 persisted IVF+DPP; qs11's
    // baseline is label-conditioned, so it reports time + rows only).
    // The scanned fraction for the IVF members is the ivfpq_candidates
    // line below (keep=1/nprobe=2 cell sizes — identical cell geometry
    // for qs08 and qs12). qs12's first pass includes the one-time index
    // build (memoized per process); pass2 is the serve-only time the
    // "build once, serve many" claim is about — both reported.
    // ---------------------------------------------------------------
    for (name <- Seq("qs08_ivf_pq_search", "qs10_hybrid_rrf",
        "qs11_filtered_ann", "qs12_persisted_ivf")) {
      val q = Registry.byName(name)
      def pass(): Double = {
        val t0 = System.nanoTime()
        q.run(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val t1 = pass(); val t2 = pass()
      val res = q.run(spark, dir)
      val rows = res.count()
      val recall =
        if (name == "qs11_filtered_ann") -1.0
        else res.filter(col("rank") <= 3).select(col("q_id"), col("n_id"))
          .join(exact, Seq("q_id", "n_id")).count().toDouble / exactN
      println(s"""{"metric":"serve_tier","query":"$name","corpus":$corpusN,""" +
        s""""pass1_sec":${js(t1)},"pass2_sec":${js(t2)},"rows":$rows,""" +
        s""""recall_at3":${js(recall)}}""")
    }

    val cents = Similarity.ivfCentroids(spark, dir)
    val cellSizes = Similarity.cellsOf(cents,
        e.filter(col("vec_id") >= 10)
          .select(col("vec_id").as("n_id"), col("embedding").as("n_emb")),
        "n_id", "n_emb", keep = 1)
      .groupBy(col("c_id")).agg(count(lit(1)).as("cell_n"))
    val perQuery = Similarity.cellsOf(cents,
        e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
        "q_id", "q_emb", keep = 2)
      .join(cellSizes, Seq("c_id"))
      .groupBy(col("q_id")).agg(sum(col("cell_n")).as("cands"))
      .agg(avg(col("cands")).as("mean"), max(col("cands")).as("mx"))
      .collect()(0)
    println(s"""{"metric":"ivfpq_candidates","corpus":$corpusN,""" +
      s""""mean_cands":${js(perQuery.getAs[Double]("mean"))},""" +
      s""""max_cands":${perQuery.getAs[Long]("mx")},""" +
      s""""scanned_frac":${js(perQuery.getAs[Double]("mean") / corpusN)}}""")
    spark.stop()
  }
}
