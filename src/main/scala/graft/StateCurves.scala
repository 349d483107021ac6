package graft

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Streaming steady-state state-size curves (VERDICT r06 Next #6): replay
  * a 30× corpus through the stateful streaming operators ONE COPY PER
  * MICRO-BATCH and record `stateOperators` (numRowsTotal, memoryUsedBytes)
  * per trigger from the query progress feed. Turns the "bounded state"
  * design argument into a measured curve:
  *
  *  - `qst03_fixed_keys`  — dropDuplicates(user_id, event_type), the gated
  *    qst03 shape: state = every key ever seen. The gate corpus keyspace is
  *    FIXED (7.5k pairs), so the curve saturates in the first triggers —
  *    flat, but only because the domain is closed.
  *  - `dedup_open_keys`   — the same operator keyed by event_id (exactly-
  *    once ingest dedup, qd14's streaming face): open keyspace ⇒ state
  *    grows monotonically with the corpus, ~100k rows per trigger. This is
  *    the untenable-at-100 TB trajectory.
  *  - `dedup_ttl_open_keys` — qst18's dropDuplicatesWithinWatermark on the
  *    SAME open keys with a 1 h watermark horizon: the copies are
  *    time-shifted (+31 days each) so the watermark advances every trigger
  *    and expires prior state — the curve plateaus at the key-arrival rate
  *    × horizon, orders of magnitude below the open-key line.
  *  - `qst10_neardup`     — transformWithState ListState simhash buckets
  *    (RocksDB): the chunk keyspace is bounded (4 chunks × 4096 values)
  *    and BucketCap poisons hot buckets, so rows-in-state plateau under
  *    Zipf duplication pressure while evictions absorb the growth.
  *  - `qst16_blockdedup`  — ValueState keeper per distinct block hash:
  *    grows with DISTINCT blocks (inherent to exact dedup — the TTLConfig
  *    horizon is the production knob); under Zipf duplication the distinct
  *    count grows sublinearly in raw rows.
  *
  * Corpus: events time-shifted per copy (watermarks advance like real
  * ingest); documents Zipf-duplicated per Soak's rule (hot docs concentrate
  * buckets — the realistic pressure for the near-dup curves). Slices are
  * written sequentially so the file source's oldest-first ordering replays
  * copies in generation order.
  *
  * Output: one JSON line per curve with per-trigger rows/bytes, consumed
  * into BASELINE.md.
  */
object StateCurves {

  private def rocksDb(s: SparkSession): Unit =
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

  /** Write `mult` derived copies of `base` sequentially (one append per
    * copy, fixed file count) so modification-time order == copy order. */
  private def writeSlices(dir: String, mult: Int, filesPerCopy: Int)(
      copy: Int => DataFrame): Unit =
    (0 until mult).foreach { k =>
      copy(k).coalesce(filesPerCopy).write
        .mode(if (k == 0) "overwrite" else "append").parquet(dir)
    }

  private def curve(spark: SparkSession, name: String, dir: String,
      filesPerTrigger: Int, mode: String)(
      transform: DataFrame => DataFrame): Unit = {
    val schema = spark.read.parquet(dir).schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", filesPerTrigger).parquet(dir)
    val q = transform(src).writeStream
      .outputMode(mode).format("noop")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory(s"graft-curve-$name-").toString)
      .start()
    q.processAllAvailable()
    val points = q.recentProgress.toSeq
      .filter(_.numInputRows > 0)
      .map { p =>
        val rows = p.stateOperators.map(_.numRowsTotal).sum
        val mem = p.stateOperators.map(_.memoryUsedBytes).sum
        s"""{"batch":${p.batchId},"input":${p.numInputRows},"state_rows":$rows,"state_bytes":$mem}"""
      }
    q.stop()
    println(s"""{"metric":"state_curve","query":"$name","points":[${points.mkString(",")}]}""")
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_SOAK_MULT", "30").toInt
    val out = s"target/state-curves/x$mult"
    val spark = GraftSession.local("graft-state-curves",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    rocksDb(spark)

    val evDir = s"$out/events"
    val docDir = s"$out/documents"
    if (!new File(evDir).exists()) {
      val ev = Tables.events(spark, base)
      val evOff = ev.agg(max(col("event_id"))).collect()(0).getLong(0) + 1
      // +31 days per copy: each copy's month of events lands after the
      // previous copy's, so event time — and the watermark — advances
      // monotonically across triggers, the real ingest shape
      writeSlices(evDir, mult, filesPerCopy = 2) { k =>
        ev.withColumn("event_id", col("event_id") + lit(k * evOff))
          .withColumn("ts", col("ts") + expr(s"INTERVAL ${k * 31} DAYS"))
      }
      val docs = Tables.documents(spark, base)
      val docOff = docs.agg(max(col("doc_id"))).collect()(0).getLong(0) + 1
      // Soak's Zipf duplication rule: copy k keeps doc d verbatim when
      // (d+1)·k ≤ N ⇒ cluster sizes ~1/rank — hot simhash buckets
      writeSlices(docDir, mult, filesPerCopy = 1) { k =>
        val rot = translate(col("text"), "abcdefghijklmnopqrstuvwxyz",
          "abcdefghijklmnopqrstuvwxyz".drop((k * 7) % 26) +
            "abcdefghijklmnopqrstuvwxyz".take((k * 7) % 26))
        val text =
          if (k == 0) col("text")
          else when((col("doc_id") + 1) * k <= lit(docOff), col("text")).otherwise(rot)
        docs.withColumn("text", text)
          .withColumn("doc_id", col("doc_id") + lit(k * docOff))
      }
    }

    curve(spark, "qst03_fixed_keys", evDir, 2, "append") { ev =>
      ev.select(col("user_id"), col("event_type"))
        .dropDuplicates("user_id", "event_type")
    }
    curve(spark, "dedup_open_keys", evDir, 2, "append") { ev =>
      ev.select(col("event_id")).dropDuplicates("event_id")
    }
    curve(spark, "dedup_ttl_open_keys", evDir, 2, "append") { ev =>
      ev.select(col("ts"), col("event_id"))
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("event_id")
        .select(col("event_id"))
    }
    curve(spark, "qst10_neardup", docDir, 1, "update") { docs =>
      graft.streaming.NearDupDedup.flagNearDuplicates(
        graft.ext.Dedup.withSimhash(docs),
        bucketCap = graft.ext.Dedup.BucketCap).toDF()
    }
    curve(spark, "qst16_blockdedup", docDir, 1, "update") { docs =>
      graft.streaming.BlockDedup.flagBlocks(docs).toDF()
    }
    spark.stop()
  }
}
