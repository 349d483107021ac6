package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Z-order (Morton) curve value of two non-negative integer keys: the
    * low `bits` bits of each are interleaved (x on even positions, y on
    * odd), so sorting by z keeps rows that are close in EITHER dimension
    * close in file order. That gives every file/row-group a TIGHT min/max
    * envelope in BOTH columns — parquet statistics then prune scans for
    * range predicates on either column, the lever a single-column sort
    * (or hive partitioning, which burns the directory level on ONE key)
    * cannot give a second dimension at 100 TB. Pure bit arithmetic, fully
    * codegen'd; `bits` must cover the key domain (⌈log₂(max+1)⌉ — high
    * bits beyond it are dropped, which scatters, never corrupts: z is a
    * SORT key only, the data columns are untouched).
    */
  def zorder2(x: Column, y: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).map { j =>
      shiftleft(shiftright(xl, j).bitwiseAND(lit(1L)), 2 * j)
        .bitwiseOR(shiftleft(shiftright(yl, j).bitwiseAND(lit(1L)), 2 * j + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Write `df` z-ordered on (`cx`, `cy`): range-partition by the Morton
    * value into `files` output files, sort within each, drop the key. The
    * range partitioner's sampled bounds make the files near-equal-sized
    * regardless of key skew; each file covers one contiguous z-range ⇒
    * tight per-file min/max on both columns. */
  def writeZOrdered(df: DataFrame, path: String, cx: String, cy: String,
                    files: Int, bits: Int = 21): Unit =
    df.withColumn("__z", zorder2(col(cx), col(cy), bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

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
