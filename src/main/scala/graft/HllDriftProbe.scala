package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q34's incremental-HLL maintenance contract measured at GROWN tiers
  * (VERDICT r13 Next #4): the gate pins |merged − full| ≤ max(1, 1% ·
  * full) at sf0.1 only — this probe re-measures the drift at the soak
  * corpora (events at 30×, documents at 1000×/Zipf-1000×) to show the
  * bound does not widen with sketch density: past the sparse→dense
  * promotion the Datasketches union's representation drift is a property
  * of the register array size (2^lgK), not the stream length, so the
  * RELATIVE drift should shrink as counts grow — that is the claim under
  * test, stated as a measured max-drift-percent per tier.
  *
  * One JSON line per (dir, keyspace): per-group merged/full/exact
  * estimates and the max |merged−full|/full across groups.
  */
object HllDriftProbe {

  /** q34's exact shape: split on a modulus, sketch each side, union vs
    * single-pass full sketch vs exact distinct. */
  private def drift(df: DataFrame, groupCol: String, idCol: String,
      splitCol: String): DataFrame = {
    val base = df.filter(col(splitCol) % 7 =!= 0)
    val delta = df.filter(col(splitCol) % 7 === 0)
    def sk(part: DataFrame, name: String) =
      part.groupBy(col(groupCol))
        .agg(hll_sketch_agg(col(idCol)).as(name))
    val merged = sk(base, "sk_b")
      .join(sk(delta, "sk_d"), Seq(groupCol), "full_outer")
      .select(col(groupCol), hll_sketch_estimate(
        when(col("sk_b").isNull, col("sk_d"))
          .when(col("sk_d").isNull, col("sk_b"))
          .otherwise(hll_union(col("sk_b"), col("sk_d")))).as("est_merged"))
    val full = df.groupBy(col(groupCol)).agg(
      hll_sketch_estimate(hll_sketch_agg(col(idCol))).as("est_full"),
      countDistinct(col(idCol)).as("exact"))
    merged.join(full, Seq(groupCol))
  }

  private def run(s: SparkSession, tag: String, df: DataFrame,
      groupCol: String, idCol: String, splitCol: String): String = {
    val rows = drift(df, groupCol, idCol, splitCol).collect()
    // empty tier (exists but zero groups after the modulus split) must
    // report groups:0, not crash the probe on .max (ADVICE r14)
    if (rows.isEmpty) return f""""$tag":{"groups":0,"total_exact":0}"""
    // hll_sketch_estimate returns LongType
    val maxDrift = rows.map { r =>
      val m = r.getAs[Long]("est_merged").toDouble
      val f = r.getAs[Long]("est_full").toDouble
      math.abs(m - f) / math.max(f, 1.0)
    }.max
    val maxErr = rows.map { r =>
      val m = r.getAs[Long]("est_merged").toDouble
      val e = r.getAs[Long]("exact")
      math.abs(m - e) / math.max(e.toDouble, 1.0)
    }.max
    val nGroups = rows.length
    val totExact = rows.map(_.getAs[Long]("exact")).sum
    f""""$tag":{"groups":$nGroups,"total_exact":$totExact,""" +
      f""""max_union_drift_pct":${maxDrift * 100}%.4f,""" +
      f""""max_vs_exact_pct":${maxErr * 100}%.4f,""" +
      f""""drift_le_1pct":${maxDrift <= 0.01}}"""
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-hll-drift",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val parts = Seq.newBuilder[String]

    // tier 1: the gate's own shape at sf0.1 (continuity anchor)
    parts += run(spark, "events_sf01",
      graft.sources.Tables.events(spark, "/root/testdata/sf0.1"),
      "event_type", "user_id", "event_id")

    // tier 2: events at 30× (soak corpus; user ids span the copies)
    val x30 = "target/soak/x30"
    if (new java.io.File(s"$x30/events.parquet").exists())
      parts += run(spark, "events_x30",
        graft.sources.Tables.events(spark, x30),
        "event_type", "user_id", "event_id")

    // tier 3: documents at 1000× and Zipf-1000× — ~20M distinct doc ids
    // per tier, far past sparse mode in every group
    for ((dir, tag) <- Seq("target/soak/x1000" -> "docs_x1000",
        "target/soak/zipf_x1000" -> "docs_zipf_x1000"))
      if (new java.io.File(s"$dir/documents.parquet").exists())
        parts += run(spark, tag,
          spark.read.parquet(s"$dir/documents.parquet"),
          "source", "doc_id", "doc_id")

    println(s"""{"metric":"hll_drift","tiers":{${parts.result().mkString(",")}}}""")
    spark.stop()
  }
}
