package graft.ysb

import java.sql.Timestamp
import org.apache.spark.sql.types._

/** YSB data model — the reference's schemas re-declared as case classes +
  * explicit StructTypes (SURVEY.md §1.2).
  *
  * Event: [ysb/benchmark/yahoo/Variables.scala:6-15]
  * CampaignAd: [Variables.scala:34-36]
  * WindowedCount/Output: [Variables.scala:18-24;
  *   ysb/benchmark/yahoo/YahooBenchmark.scala:78-81]
  */
final case class Event(
    user_id: String,
    page_id: String,
    ad_id: String,
    ad_type: String,
    event_type: String,
    event_time: Timestamp,
    ip_address: String)

final case class CampaignAd(ad_id: String, campaign_id: String)

final case class ProjectedEvent(ad_id: String, event_time: Timestamp)

/** time_window = epoch millis of window start (the reference serializes the
  * window as a long [SparkYahooRunner.scala:68,75]). */
final case class WindowedCount(
    time_window: Long,
    campaign_id: String,
    count: Long,
    lastUpdate: Timestamp)

object Model {
  val adTypes: Seq[String] =
    Seq("banner", "modal", "sponsored-search", "mail", "mobile") // Variables.scala:44
  val eventTypes: Seq[String] = Seq("view", "click", "purchase") // Variables.scala:45

  val eventSchema: StructType = StructType(Seq(
    StructField("user_id", StringType),
    StructField("page_id", StringType),
    StructField("ad_id", StringType),
    StructField("ad_type", StringType),
    StructField("event_type", StringType),
    StructField("event_time", TimestampType),
    StructField("ip_address", StringType)))

  val campaignSchema: StructType = StructType(Seq(
    StructField("ad_id", StringType),
    StructField("campaign_id", StringType)))

  val outputSchema: StructType = StructType(Seq(
    StructField("time_window", LongType),
    StructField("campaign_id", StringType),
    StructField("count", LongType),
    StructField("lastUpdate", TimestampType)))
}
