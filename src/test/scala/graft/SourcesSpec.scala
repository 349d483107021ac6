package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

class SourcesSpec extends SparkSpec {

  test("CSV source roundtrip equals parquet source (S6)") {
    val pq = Tables.orders(spark, sf)
    val dir = "/tmp/graft-csv-test/orders"
    pq.write.mode("overwrite").option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss").csv(dir)
    val csv = spark.read.schema(pq.schema).option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss").csv(dir)
    assert(csv.count() === pq.count())
    assert(csv.exceptAll(pq).count() === 0)
    assert(pq.exceptAll(csv).count() === 0)
  }

  test("events nanos timestamps truncate to DuckDB-equal micros") {
    // Tables.events must expose ts as TimestampType (micros)
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    assert(ev.filter(col("ts").isNull).count() === 0)
  }
}
