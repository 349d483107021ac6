package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins (beyond the reference's stream-static J1 — part of
  * the complete streaming surface). Both sides need watermarks; the time
  * bound keeps join state finite: left rows are held only while
  * `right.time ∈ [left.time − lower, left.time + upper]` can still arrive.
  */
object StreamJoin {

  /** Watermarked interval equi-join:
    * `left.key = right.key AND right.ts ∈ [left.ts − lowerSec, left.ts + upperSec]`.
    * Columns are expected pre-disambiguated (lKey/lTs vs rKey/rTs).
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
      lKey: String, lTs: String, rKey: String, rTs: String,
      lowerSec: Long, upperSec: Long,
      watermark: String = "10 seconds"): DataFrame =
    left.withWatermark(lTs, watermark)
      .join(
        right.withWatermark(rTs, watermark),
        expr(s"""$lKey = $rKey AND
                |$rTs >= $lTs - INTERVAL $lowerSec SECONDS AND
                |$rTs <= $lTs + INTERVAL $upperSec SECONDS""".stripMargin.replace("\n", " ")),
        "inner")
}
