package graft

import org.apache.spark.sql.functions._

import graft.sinks.Layout
import graft.sources.Tables

class LayoutSpec extends SparkSpec {

  test("date-partitioned layout prunes partitions for date predicates") {
    val path = "/tmp/graft-layout-test/events_by_day"
    Layout.writeDatePartitioned(Tables.events(spark, sf), path, "ts")
    val pruned = Layout.readDatePartitioned(spark, path)
      .filter(col("dt") === "2024-01-05")
    pruned.count()
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("dt#") || plan.contains("isnotnull(dt"),
      s"no partition pruning visible in plan:\n${plan.take(800)}")
    // pruning must not change semantics
    val expected = Tables.events(spark, sf)
      .filter(date_format(col("ts"), "yyyy-MM-dd") === "2024-01-05").count()
    assert(pruned.count() === expected)
  }

  test("idempotent foreachBatch sink: replayed batch replaces, not duplicates") {
    val path = "/tmp/graft-layout-test/idempotent"
    val b0 = Tables.events(spark, sf).limit(100)
    Layout.writeIdempotent(b0, 0, path)
    Layout.writeIdempotent(Tables.events(spark, sf).limit(50), 1, path)
    val before = spark.read.parquet(path).count()
    assert(before === 150)
    // replay batch 1 (failure recovery) — must overwrite, not append
    Layout.writeIdempotent(Tables.events(spark, sf).limit(50), 1, path)
    val after = spark.read.parquet(path).count()
    assert(after === 150)
  }
}
