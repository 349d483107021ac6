package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Q

/** File-format sources beyond parquet (SURVEY §2 S6: the reference's CSV
  * scan feeds its batch pipeline [sbx/test-yahoo.cpp:97-115]).
  *
  * The gated query is a write→read roundtrip: the supplier table is written
  * to CSV (quoted, headered) and read back with an explicit schema; the
  * result must row-for-row hash-match the oracle reading the original
  * parquet — i.e. the CSV codec is lossless for every column type it
  * carries (int, string, double — doubles print shortest-roundtrip, so
  * text transit is bit-exact).
  *
  * At scale the same reader handles a partitioned CSV directory: Spark's
  * CSV source is splittable (uncompressed), so a 100 TB CSV dataset scans
  * in parallel like parquet, just without pushdown/pruning — which is why
  * parquet stays the preferred layout and CSV is an ingest format.
  */
object FileSources {

  /** Deterministic per-sfDir scratch location for the CSV copy. */
  private def csvDir(d: String): String =
    sys.props.getOrElse("java.io.tmpdir", "/tmp") +
      "/graft-csv-supplier-" + Integer.toHexString(d.hashCode)

  private def qf01(s: SparkSession, d: String): DataFrame = {
    val supplier = Tables.supplier(s, d)
    val path = csvDir(d)
    supplier.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(path)
    s.read.schema(supplier.schema).option("header", "true").csv(path)
  }

  private val qf01Sql =
    "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier"

  def queries: Seq[Q] = Seq(
    Q("qf01_csv_roundtrip", qf01, Some(qf01Sql)))
}
