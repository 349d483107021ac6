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
    spark.stop()
  }
}
