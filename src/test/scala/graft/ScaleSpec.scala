package graft

import org.apache.spark.sql.functions._

import graft.operators.Scale
import graft.sources.Tables

class ScaleSpec extends SparkSpec {

  test("salted join is result-identical to the plain join") {
    val fact = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val dim = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = fact.join(dim, Seq("l_orderkey"))
    val salted = Scale.saltedJoin(fact, dim, "l_orderkey", salt = 4)
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("two-stage salted aggregation equals direct groupBy") {
    val df = Tables.lineitem(spark, sf)
    val direct = df.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_value"))
    val salted = Scale.saltedCountSum(df, "l_orderkey", "l_quantity", salt = 4)
    assert(salted.exceptAll(direct).count() === 0)
    assert(direct.exceptAll(salted).count() === 0)
  }

  test("bucketed join runs shuffle-free (no Exchange in plan)") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    Scale.writeBucketed(
      Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity"),
      "li_bkt", "l_orderkey", buckets = 8)
    Scale.writeBucketed(
      Tables.orders(spark, sf).select(col("o_orderkey").as("l_orderkey"), col("o_totalprice")),
      "ord_bkt", "l_orderkey", buckets = 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      val joined = Scale.bucketedJoin(spark, "li_bkt", "ord_bkt", "l_orderkey")
      joined.count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join plan still shuffles:\n$plan")
      // and it is still correct
      val expected = Tables.lineitem(spark, sf).count()
      assert(joined.count() === expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
