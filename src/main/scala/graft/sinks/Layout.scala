package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout helpers for the 100 TB path:
  *
  *  - [[writeDatePartitioned]]: hive-style `dt=YYYY-MM-DD` partition layout,
  *    so date-range predicates prune whole directories at planning time
  *    (PartitionFilters in the scan, zero IO for excluded days).
  *  - [[writeIdempotent]]: the foreachBatch exactly-once pattern — each
  *    micro-batch lands in a `batch_id=N` subdir, so replayed batches after
  *    a failure overwrite their own output instead of duplicating it
  *    (dynamic partition overwrite).
  */
object Layout {

  /** Write `df` partitioned by the date of `tsCol` (hive layout `dt=...`). */
  def writeDatePartitioned(df: DataFrame, path: String, tsCol: String): Unit =
    df.withColumn("dt", date_format(col(tsCol), "yyyy-MM-dd"))
      .write
      .partitionBy("dt")
      .mode("overwrite")
      .parquet(path)

  def readDatePartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Idempotent micro-batch sink body for `writeStream.foreachBatch`:
    * overwrite only this batch's partition — re-delivered batches replace
    * themselves, giving effectively-once file output.
    */
  def writeIdempotent(batch: DataFrame, batchId: Long, path: String): Unit = {
    val spark = batch.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try batch.withColumn("batch_id", lit(batchId))
      .write
      .partitionBy("batch_id")
      .mode("overwrite")
      .parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }
}
