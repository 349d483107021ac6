package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.Q
import graft.sources.Tables

/** Kafka wire-format framing (K1–K3, F1–F3, F11): rows serialize to
  * `(key, value)` with `value = to_json(struct(*))` and parse back with
  * `from_json` + explicit schema — exactly the reference's framing
  * [ysb/benchmark/yahoo/YahooBenchmarkRunner.scala:40,47;
  * SparkYahooRunner.scala:77,124-135].
  *
  * The transport is pluggable: `.format("kafka")` needs only the standard
  * spark-sql-kafka connector on the deploy classpath (not present in this
  * container), while memory/parquet/console sinks exercise the identical
  * frames in tests. The framing itself — the part with engine semantics —
  * is oracle-checked via a serialize→parse roundtrip query.
  */
object Frames {

  /** Row → Kafka frame: key column + JSON value of all columns. */
  def toKafkaFrame(df: DataFrame, keyCol: Column): DataFrame =
    df.select(keyCol.cast("string").as("key"), to_json(struct(col("*"))).as("value"))

  /** Kafka frame → rows: parse `value` with an explicit schema and flatten
    * (`select("result.*")` shape [SparkYahooRunner.scala:132-135]). */
  def fromKafkaFrame(df: DataFrame, schema: StructType): DataFrame =
    df.select(from_json(col("value").cast("string"), schema).as("result"))
      .select(col("result.*"))

  // ---------------------------------------------------------------------
  // qj01: JSON roundtrip — events serialized to frames, parsed back, then
  // aggregated; must equal aggregating the original rows (oracle = direct
  // aggregation, which is exactly the roundtrip-identity claim).
  // ---------------------------------------------------------------------
  private def qj01(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val framed = toKafkaFrame(ev, col("user_id"))
    val parsed = fromKafkaFrame(framed, ev.schema)
    // Exact decimal accumulation inside, one final DOUBLE cast mirrored in
    // the oracle: DECIMAL output columns hash-mismatch in the driver's
    // pandas canonicalization (VERDICT r01).
    parsed.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2)))
          .cast(org.apache.spark.sql.types.DoubleType).as("sum_value"),
        max(col("user_id")).as("max_user"))
  }

  private val qj01Sql =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
      |  max(user_id) AS max_user
      |FROM events GROUP BY event_type""".stripMargin

  def queries: Seq[Q] = Seq(
    Q("qj01_json_roundtrip", qj01, Some(qj01Sql)))
}
