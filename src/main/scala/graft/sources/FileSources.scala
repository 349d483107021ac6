package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Scratch location for a roundtrip copy: deterministic per (sfDir,
    * table) within one JVM, but unique per process — two concurrent
    * sessions (e.g. Verify and Bench on the same sfDir) must not race on
    * one directory with mode=overwrite. */
  private def scratchDir(table: String, d: String): String =
    sys.props.getOrElse("java.io.tmpdir", "/tmp") +
      s"/graft-$table-" + Integer.toHexString(d.hashCode) +
      "-p" + ProcessHandle.current().pid()

  private def csvDir(d: String): String = scratchDir("csv-supplier", d)

  private def qf01(s: SparkSession, d: String): DataFrame = {
    val supplier = Tables.supplier(s, d)
    val path = csvDir(d)
    supplier.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(path)
    s.read.schema(supplier.schema).option("header", "true").csv(path)
  }

  private val qf01Sql =
    "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier"

  /** Microsecond-precision timestamp format: Spark's default JSON timestamp
    * format truncates to millis, which would silently lose the events
    * table's microsecond precision in the roundtrip. */
  private val TsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  private def jsonDir(d: String): String = scratchDir("jsonl-events", d)

  /** qf02: JSON-lines roundtrip of the events table (timestamps at full
    * microsecond precision, doubles shortest-roundtrip via Jackson, nested
    * JSON `props` as escaped strings) — then an aggregate over the re-read
    * rows, hash-matched against the parquet oracle. */
  private def qf02(s: SparkSession, d: String): DataFrame = {
    val events = Tables.events(s, d)
    val path = jsonDir(d)
    events.coalesce(1).write.mode("overwrite")
      .option("timestampFormat", TsFmt).json(path)
    s.read.schema(events.schema).option("timestampFormat", TsFmt).json(path)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        max(col("ts")).as("max_ts"),
        min(col("value")).as("min_value"),
        max(col("user_id")).as("max_user"))
  }

  private val qf02Sql =
    """SELECT event_type, count(*) AS n, max(ts) AS max_ts,
      |  min(value) AS min_value, max(user_id) AS max_user
      |FROM events GROUP BY event_type""".stripMargin

  private def orcDir(d: String): String = scratchDir("orc-events", d)

  /** qf03: ORC roundtrip of the events table — Spark's other built-in
    * columnar format (native timestamp/double encodings, no text transit at
    * all), aggregated after re-read and hash-matched against the parquet
    * oracle. At scale ORC behaves like parquet (splittable, predicate
    * pushdown, column pruning), so the engine is layout-agnostic between
    * the two columnar formats; the same oracle as qf02 pins that the two
    * codecs carry identical values. */
  private def qf03(s: SparkSession, d: String): DataFrame = {
    val events = Tables.events(s, d)
    val path = orcDir(d)
    events.coalesce(1).write.mode("overwrite").orc(path)
    s.read.schema(events.schema).orc(path)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        max(col("ts")).as("max_ts"),
        min(col("value")).as("min_value"),
        max(col("user_id")).as("max_user"))
  }

  def queries: Seq[Q] = Seq(
    Q("qf01_csv_roundtrip", qf01, Some(qf01Sql)),
    Q("qf02_jsonl_roundtrip", qf02, Some(qf02Sql)),
    Q("qf03_orc_roundtrip", qf03, Some(qf02Sql)))
}
