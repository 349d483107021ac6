package graft

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Soak-scale stage attribution (VERDICT r07 Next #6): the three heaviest
  * 300×-soak constants — qd03 (MinHash-LSH pairs), qd12 (dup spans), qp02
  * (curation pipeline) — decomposed into their stage prefixes at 30× on the
  * SAME uniform soak corpus, FloorProbe methodology (noop-forced,
  * best-of-2). Each variant adds one stage over the previous, so the
  * per-stage cost is the delta between consecutive lines; the result either
  * records an honest attribution (cap-bounded pair work, corpus-sized
  * shuffles) or points at the stage worth shaving — it located qd12's
  * duplicate-gram detection paying a doc_id+gram distinct shuffle the
  * min≠max rewrite now avoids (see SpanDedup.dupSpans).
  */
object StageProbe {

  private def timed(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_SOAK_MULT", "30").toInt
    val out = s"target/soak/x$mult"
    val spark = GraftSession.local("graft-stage-probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    if (!new File(s"$out/embeddings.parquet/_SUCCESS").exists()) {
      System.err.println(s"[stage-probe] generating ${mult}x corpus under $out")
      Soak.generate(spark, base, out, mult, zipf = false)
    }

    def bestOf2(mk: () => DataFrame): Double = {
      def pass(): Double =
        timed { mk().write.format("noop").mode("overwrite").save() }
      math.min(pass(), pass())
    }

    def q(name: String) = Registry.byName(name).run

    // Each entry: (label, frame). Consecutive prefixes of one query share a
    // label prefix so the delta between adjacent lines is the stage cost.
    val variants: Seq[(String, () => DataFrame)] = Seq(
      // --- qd03: sigs → +bucket shuffle → +pair distinct → full (adds the
      // two merge joins + jaccard filter)
      "qd03_1_sigs" -> (() => ext.Dedup.withSignature(Tables.documents(spark, out))),
      "qd03_2_buckets" -> (() => ext.Dedup.lshStage(spark, out)),
      "qd03_3_pairs_distinct" -> (() => ext.Dedup.lshCandidates(spark, out)),
      "qd03_4_full" -> (() => q("qd03_minhash_lsh_pairs")(spark, out)),
      // --- qd12: positional grams → duplicate-gram keys → full (adds the
      // semi join back + per-doc window + coverage joins)
      "qd12_1_grams" -> (() => ext.SpanDedup.gramStage(Tables.documents(spark, out))),
      "qd12_2_dupgrams" -> (() => ext.SpanDedup.dupGramStage(Tables.documents(spark, out))),
      "qd12_3_full" -> (() => q("qd12_dup_spans")(spark, out)),
      // --- qp02: quality gate → +embedding attach join → semdedup flags
      // alone (k-means + cluster-scoped pairs) → full composition
      "qp02_1_qualgate" -> (() => Tables.documents(spark, out)
        .withColumn("nt", size(expr("split(trim(text), '\\\\s+')")).cast("long"))
        .filter(col("nt") >= 50)),
      "qp02_2_attach" -> (() => Tables.documents(spark, out)
        .withColumn("nt", size(expr("split(trim(text), '\\\\s+')")).cast("long"))
        .filter(col("nt") >= 50)
        .select(col("doc_id"), col("source"), col("nt"))
        .join(Tables.embeddings(spark, out)
          .select(col("vec_id").as("doc_id"), col("label")).hint("merge"),
          Seq("doc_id"))),
      "qp02_3_semdedup" -> (() => ext.Clustering.semDedupFlags(spark, out)),
      "qp02_4_full" -> (() => q("qp02_curation_pipeline")(spark, out))
    )

    Tables.lineitem(spark, base).limit(1000).count() // warm codegen/JIT

    // SPARK_GRAFT_STAGE_ONLY=qd03,qd12: restrict to query prefixes for
    // targeted large-mult attributions (fail fast on a prefix matching
    // nothing — same rationale as the Soak knobs)
    val only = sys.env.get("SPARK_GRAFT_STAGE_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val selected = only.fold(variants) { prefixes =>
      prefixes.foreach { p =>
        require(variants.exists(_._1.startsWith(p)),
          s"SPARK_GRAFT_STAGE_ONLY prefix matches nothing: $p")
      }
      variants.filter { case (n, _) => prefixes.exists(n.startsWith) }
    }

    val times = selected.map { case (n, mk) => n -> bestOf2(mk) }
    println(times.map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString(s"""{"metric":"stage_probe","mult":$mult,""", ",", "}"))
    spark.stop()
  }
}
