package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

class WindowsSpec extends SparkSpec {

  test("tumbling window partitions every event exactly once") {
    val out = Registry.byName("qw01_tumbling_window").run(spark, sf)
    val total = Tables.events(spark, sf).count()
    assert(out.agg(sum("n")).collect()(0).getLong(0) === total)
  }

  test("sliding 1d/12h window counts every event exactly twice") {
    val out = Registry.byName("qw02_sliding_window").run(spark, sf)
    val total = Tables.events(spark, sf).count()
    assert(out.agg(sum("n")).collect()(0).getLong(0) === 2 * total)
  }

  test("session windows: ends exceed starts by ≥ gap, per-user events conserved") {
    val out = Registry.byName("qw03_session_window").run(spark, sf)
    assert(out.filter(col("s_end") <= col("s_start")).count() === 0)
    val total = Tables.events(spark, sf).count()
    assert(out.agg(sum("n")).collect()(0).getLong(0) === total)
  }

  test("running agg final value equals group total") {
    val out = Registry.byName("qw04_running_agg").run(spark, sf)
    val finals = out.groupBy("user_id").agg(
      max(struct(col("running_n"), col("running_value"))).as("fin"),
      count(lit(1)).as("n_rows"))
    assert(finals.filter(col("fin.running_n") =!= col("n_rows")).count() === 0)
  }
}
