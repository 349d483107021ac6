package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's scale-appropriate defaults, shared by
  * every main (Verify / Bench / Explain / harness benches).
  *
  * Local mode sizes `shuffle.partitions` to the core count (the driver
  * contract's local[32] → 32, not Spark's default 200: at small SF, 200
  * near-empty shuffle partitions cost more scheduling than they buy in
  * parallelism). On a real cluster the same knob should be ~2–3× total
  * executor cores, or left to AQE coalescing — see README "Running at
  * 100 TB".
  *
  * AQE stays on everywhere: runtime partition coalescing, skew-join
  * splitting, and dynamic join-strategy switches are exactly the safety
  * nets a 100 TB run needs, and they cost nothing at test SF.
  */
object GraftSession {

  def local(appName: String, cores: String, aqe: Boolean = true): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", aqe.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
