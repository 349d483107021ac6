package graft

import org.apache.spark.sql.functions._

import graft.ysb.{Gen, Ysb}

class YsbSpec extends SparkSpec {

  test("campaign dimension has numCampaigns × adsPerCampaign rows, 10 ads each") {
    val dim = Gen.campaigns(spark, numCampaigns = 100, adsPerCampaign = 10)
    assert(dim.count() === 1000)
    val perCampaign = dim.groupBy("campaign_id").count().select("count").distinct().collect()
    assert(perCampaign.map(_.getLong(0)).toSet === Set(10L))
  }

  test("reference off-by-one variant is reproducible (99 campaigns)") {
    // the reference's Spark path generates numCampaigns−1 campaigns
    // [ysb/benchmark/yahoo/YahooBenchmark.scala:40]; we model that as an
    // explicit parameter instead
    assert(Gen.campaigns(spark, numCampaigns = 99).select("campaign_id").distinct().count() === 99)
  }

  test("bounded generator: deterministic, round-robin types") {
    val ev = Gen.boundedEvents(spark, 3000L)
    assert(ev.count() === 3000)
    val types = ev.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(types === Map("view" -> 1000L, "click" -> 1000L, "purchase" -> 1000L))
    // determinism: same seed → same content hash
    val h1 = ev.agg(sum(hash(col("ad_id"), col("event_time")))).collect()(0).getLong(0)
    val h2 = Gen.boundedEvents(spark, 3000L)
      .agg(sum(hash(col("ad_id"), col("event_time")))).collect()(0).getLong(0)
    assert(h1 === h2)
  }

  test("YSB query: window totals equal filtered-join input size") {
    val events = Gen.boundedEvents(spark, 30000L) // 30 s of events at 1 ms
    val dim = Gen.campaigns(spark)
    val out = Ysb.query(events, dim, "10 seconds")
    val totalCounted = out.agg(sum("count")).collect()(0).getLong(0)
    assert(totalCounted === 10000L) // exactly 1/3 are views, all ads resolve
    // 3 windows × ≤100 campaigns
    assert(out.select("time_window").distinct().count() === 3)
    assert(out.count() <= 300)
  }

  test("YSB window starts are 10 s aligned epoch millis") {
    val out = Ysb.query(Gen.boundedEvents(spark, 5000L), Gen.campaigns(spark), "10 seconds")
    val misaligned = out.filter(pmod(col("time_window"), lit(10000L)) =!= 0).count()
    assert(misaligned === 0)
  }
}
