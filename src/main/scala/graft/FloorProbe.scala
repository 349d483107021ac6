package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, TimestampType}

/** Floor probe (round 7): decomposes the two most expensive headline
  * queries — q01 (~1.0 s) and qd03 (~1.3 s) at sf0.1 — into stage
  * variants to attribute their wall time: scan vs arithmetic vs shuffle
  * vs fixed per-job cost. Each variant is noop-forced, best-of-2 (same
  * methodology as [[Bench]]); results feed the BASELINE.md floor note
  * (VERDICT r06 Next #7). Also probes qd03's sensitivity to
  * `spark.sql.shuffle.partitions` (32 → 4) to answer whether the posting
  * shuffle's partition count dominates at small SF.
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-floorprobe", "32")
    spark.sparkContext.setLogLevel("ERROR")
    import graft.sources.Tables

    try Tables.lineitem(spark, sfDir).limit(1000).count()
    catch { case e: Throwable => System.err.println(s"warmup: ${e.getMessage}") }

    def bestOf2(mk: () => DataFrame): Double = {
      def timed(): Double = {
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      math.min(timed(), timed())
    }

    val dec2 = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(12, 2))
    val one = lit(1).cast(DecimalType(3, 2))
    def liFiltered =
      Tables.lineitem(spark, sfDir)
        .filter(col("l_shipdate") <= lit("1999-06-30").cast(TimestampType))
        .select("l_quantity", "l_extendedprice", "l_discount", "l_tax",
          "l_returnflag", "l_linestatus")

    def q(name: String): (SparkSession, String) => DataFrame =
      Registry.all.find(_.name == name).get.run

    val variants: Seq[(String, () => DataFrame)] = Seq(
      // q01 decomposition: scan+filter only; same agg shape on raw doubles
      // (no decimal); full gated query.
      "q01_scan_only" -> (() => liFiltered),
      "q01_agg_double" -> (() => liFiltered
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity").as("sum_qty"),
          sum("l_extendedprice").as("sum_base_price"),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          count(lit(1)).as("count_order"))),
      "q01_agg_decimal_nocastout" -> (() => liFiltered
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum(dec2(col("l_extendedprice"))).as("s1"),
          sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount")))).as("s2"),
          sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount")))
            * (one + dec2(col("l_tax")))).as("s3"),
          count(lit(1)).as("n"))),
      "q01_full" -> (() => q("q01_pricing_summary")(spark, sfDir)),
      // qd03 decomposition: signature compute only; + bucket groupBy
      // shuffle; full query (adds checkpoint + pair explode + distinct +
      // two merge joins + jaccard filter).
      "qd03_sigs_only" -> (() => ext.Dedup.withSignature(Tables.documents(spark, sfDir))),
      "qd03_sig_plus_bucket" -> (() => ext.Dedup.lshStage(spark, sfDir)),
      "qd03_full" -> (() => q("qd03_minhash_lsh_pairs")(spark, sfDir))
    )

    val base = variants.map { case (n, mk) => n -> bestOf2(mk) }

    // Shuffle-partition sensitivity, ALTERNATING sp to decouple the
    // comparison from JIT/page-cache warm-up drift (a trailing sp=4 block
    // would otherwise get the warmest JVM): sp32,sp4,sp32,sp4,... and the
    // reported value is the min over that variant's interleaved runs.
    def alternating(name: String, mk: () => DataFrame): Seq[(String, Double)] = {
      val reps = Seq("32", "4", "32", "4", "32", "4")
      val times = reps.map { sp =>
        spark.conf.set("spark.sql.shuffle.partitions", sp)
        sp -> bestOf2(mk)
      }
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      Seq(s"${name}_sp32" -> times.filter(_._1 == "32").map(_._2).min,
        s"${name}_sp4" -> times.filter(_._1 == "4").map(_._2).min)
    }
    val at4 = alternating("qd03_full", () => q("qd03_minhash_lsh_pairs")(spark, sfDir)) ++
      alternating("q01_full", () => q("q01_pricing_summary")(spark, sfDir))

    val all = base ++ at4
    println(all.map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString("""{"metric":"floor_probe","sf":"""" + sfDir + "\",", ",", "}"))
    spark.stop()
  }
}
