package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Multi-dimensional clustering evidence for qx17: rows actually read off
  * parquet (the scan's numOutputRows — rows in row groups that SURVIVE
  * min/max pruning) for single-column sorted vs z-ordered layouts of
  * lineitem, under range predicates on the sorted key, the second key,
  * and both. The claim being measured: a linear layout serves ONE
  * predicate column; the Morton curve serves BOTH (each at a sub-linear
  * fraction), which at 100 TB is the difference between a pruned scan and
  * a full scan whenever the access path isn't the sort key.
  *
  * One JSON line → BASELINE.md's layout-pruning table. Selectivity knobs
  * are fractions of each key's max, so the probe is SF-independent.
  */
object LayoutProbe {

  private def scanRows(df: DataFrame): Long = {
    df.collect()
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: FileSourceScanExec => Seq(s)
      case o => o.children.flatMap(scans)
    }
    scans(df.queryExecution.executedPlan)
      .map(_.metrics("numOutputRows").value).sum
  }

  /** `SPARK_GRAFT_LAYOUT_FILES` accepts a comma-separated LADDER (e.g.
    * "16,64,256,512,2048"): one JSON line per rung, same corpus and
    * predicates throughout — the granularity-conditional evidence for the
    * Morton-vs-Hilbert crossover (VERDICT r13 Next #3: at 64 files Morton
    * wins the conjunctive predicate, at 512 Hilbert wins everything; a
    * user picking a curve needs to know WHERE that flips for their file
    * count). */
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val ladder = sys.env.getOrElse("SPARK_GRAFT_LAYOUT_FILES", "64")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local("graft-layout-probe", cpus)
    spark.sparkContext.setLogLevel("ERROR")

    val li = graft.sources.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val total = li.count()
    val Array(maxO, maxP) = li.agg(max("l_orderkey"), max("l_partkey"))
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray

    val base = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
      s"/graft-layout-probe-p${ProcessHandle.current().pid()}"
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def del(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(del)); f.delete(); ()
      }
      del(new java.io.File(base))
    }))

    // 10%-of-domain range predicates on each dimension
    val pOrder = col("l_orderkey") <= maxO / 10
    val pPart = col("l_partkey") <= maxP / 10

    for (files <- ladder) {
      li.repartitionByRange(files, col("l_orderkey"))
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite").parquet(s"$base/linear")
      graft.sinks.Layout.writeZOrdered(li, s"$base/zorder",
        "l_orderkey", "l_partkey", files)
      graft.sinks.Layout.writeHilbertOrdered(li, s"$base/hilbert",
        "l_orderkey", "l_partkey", files)

      def rows(layout: String, pred: Column): Long =
        scanRows(spark.read.parquet(s"$base/$layout").filter(pred))

      val fields = for {
        (layout, tag) <- Seq("linear" -> "linear", "zorder" -> "zorder",
          "hilbert" -> "hilbert")
        (pred, ptag) <- Seq(pOrder -> "orderkey", pPart -> "partkey",
          (pOrder && pPart) -> "both")
      } yield s""""${tag}_$ptag":${rows(layout, pred)}"""

      println(s"""{"metric":"layout_pruning","sf":"$dir","files":$files,""" +
        s""""total_rows":$total,${fields.mkString(",")}}""")
    }
    spark.stop()
  }
}
