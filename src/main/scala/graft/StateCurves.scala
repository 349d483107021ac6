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

  // SPARK_GRAFT_CURVE_ONLY=a,b: rerun a curve subset without paying for
  // the rest (e.g. the SST-metric byte curves after a metric change)
  private val only: Option[Set[String]] = sys.env.get("SPARK_GRAFT_CURVE_ONLY")
    .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)

  private def curve(spark: SparkSession, name: String, dir: String,
      filesPerTrigger: Int, mode: String,
      triggerEveryMs: Option[Long] = None,
      expectedRows: Option[Long] = None,
      compactOnCommit: Boolean = false,
      confs: Map[String, String] = Map.empty,
      liveAudit: Option[(SparkSession, String) => String] = None)(
      transform: DataFrame => DataFrame): Unit = {
    if (!only.forall(_.contains(name))) return
    if (compactOnCommit) spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.compactOnCommit", "true")
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try curveRun(spark, name, dir, filesPerTrigger, mode, triggerEveryMs,
      expectedRows, compactOnCommit, liveAudit)(transform)
    finally {
      if (compactOnCommit) spark.conf.unset(
        "spark.sql.streaming.stateStore.rocksdb.compactOnCommit")
      confs.keys.foreach(spark.conf.unset)
    }
  }

  private def curveRun(spark: SparkSession, name: String, dir: String,
      filesPerTrigger: Int, mode: String,
      triggerEveryMs: Option[Long],
      expectedRows: Option[Long],
      compactOnCommit: Boolean,
      liveAudit: Option[(SparkSession, String) => String])(
      transform: DataFrame => DataFrame): Unit = {
    val schema = spark.read.parquet(dir).schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", filesPerTrigger).parquet(dir)
    // progress points via listener, not recentProgress: the rolling buffer
    // caps at 100 entries and paced/TTL'd runs interleave no-data ticks
    // that would push data triggers out of it
    val points = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val inputRows = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        if (p.numInputRows > 0) {
          inputRows.addAndGet(p.numInputRows)
          val rows = p.stateOperators.map(_.numRowsTotal).sum
          val mem = p.stateOperators.map(_.memoryUsedBytes).sum
          // memoryUsedBytes for the RocksDB provider is dominated by block
          // cache + memtable — a CACHE that grows with data volume, not
          // resident state (the round-7 "bytes don't track rows" caveat).
          // The live-state signal is the SST file size custom metric —
          // with compaction caught up it holds only live keys.
          def cm(name: String): Long = p.stateOperators.map(op =>
            Option(op.customMetrics.get(name)).map(_.longValue).getOrElse(0L)).sum
          val sst = cm("rocksdbSstFileSize")
          val pinned = cm("rocksdbPinnedBlocksMemoryUsage")
          points.add(s"""{"batch":${p.batchId},"input":${p.numInputRows},"state_rows":$rows,"state_bytes":$mem,"sst_bytes":$sst,"pinned_bytes":$pinned}""")
        }
      }
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    val ckpt =
      java.nio.file.Files.createTempDirectory(s"graft-curve-$name-").toString
    try {
      val writer = transform(src).writeStream
        .outputMode(mode).format("noop")
        .option("checkpointLocation", ckpt)
      // paced triggers: trigger starts are spaced (wall-clock ingest pacing)
      // so processing-time TTLs get a chance to bind and RocksDB compaction
      // can catch up between commits — both effects the back-to-back replay
      // of processAllAvailable masks
      val q = triggerEveryMs
        .fold(writer)(ms => writer.trigger(
          org.apache.spark.sql.streaming.Trigger.ProcessingTime(ms)))
        .start()
      expectedRows match {
        case None => q.processAllAvailable()
        case Some(total) =>
          // TTL'd TimeMode.ProcessingTime operators re-schedule no-data
          // ticks forever (shouldRunAnotherBatch is always true — the ticks
          // drive TTL expiry), so processAllAvailable never latches; wait
          // until the source has absorbed the whole corpus instead
          val deadline = System.nanoTime() + 3600L * 1000 * 1000 * 1000
          while (inputRows.get() < total && System.nanoTime() < deadline)
            Thread.sleep(500)
          require(inputRows.get() >= total,
            s"$name: absorbed ${inputRows.get()}/$total rows before timeout")
      }
      q.stop()
    } finally spark.streams.removeListener(listener)
    // live-state audit: re-read the LATEST checkpoint version through the
    // state reader and measure what is actually resident — the ground
    // truth the per-trigger byte columns approximate
    val live = liveAudit.map(f => s""","live_state":${f(spark, ckpt)}""")
      .getOrElse("")
    import scala.jdk.CollectionConverters._
    println(s"""{"metric":"state_curve","query":"$name",""" +
      s""""compact_on_commit":$compactOnCommit,""" +
      s""""points":[${points.asScala.mkString(",")}]$live}""")
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_SOAK_MULT", "30").toInt
    val out = s"target/state-curves/x$mult"
    val spark = GraftSession.local("graft-state-curves",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    rocksDb(spark)

    // column semantics, stated once (VERDICT r11 obs #2: the r11 artifact's
    // state_bytes column grew while live state was flat, undercutting the
    // bounded-state claim it was written to prove — because memoryUsedBytes
    // measures the provider's CACHE, not resident state)
    println("""{"metric":"state_curve_columns","state_rows":"live rows in the state store (the bounded-state claim's unit)","state_bytes":"provider memoryUsedBytes = RocksDB block cache + memtable + retained readers; a CACHE that grows with traffic, NOT live state","sst_bytes":"RocksDB SST file bytes; equals live state only when compaction is caught up — exact per commit when compact_on_commit is true","pinned_bytes":"blocks pinned by open readers","live_state":"post-run ground truth read back from the LATEST checkpoint version via the state reader"}""")

    val evDir = s"$out/events"
    val docDir = s"$out/documents"
    // Corpus meta stamp (ADVICE r15): the generated corpus is REUSED
    // whenever the directory exists, but the open-keyspace curves below
    // need the copy offsets the corpus was GENERATED with — recomputing
    // them from the CURRENT base silently mis-assigns copy indices if the
    // base corpus changed under the cached directory. Stamp (base,
    // offsets) at generation time, read them back on reuse, and fail fast
    // on a base mismatch instead of producing quietly-wrong curves.
    val metaFile = new File(s"$out/meta.json")
    // Jackson, not a regex (ADVICE r16 #4): the regex's value class
    // truncated at ',' '}' '"', so a base path containing one would
    // store/parse inconsistently and trip the base-match require
    def readMeta(): Map[String, String] = {
      val root = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(metaFile)
      val out = Map.newBuilder[String, String]
      root.fieldNames().forEachRemaining(k => out += k -> root.get(k).asText())
      out.result()
    }
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
      val userOff = ev.agg(max(col("user_id"))).collect()(0).getLong(0) + 1
      java.nio.file.Files.write(metaFile.toPath,
        s"""{"base":"$base","mult":$mult,"ev_off":$evOff,"user_off":$userOff,"doc_off":$docOff}"""
          .getBytes("UTF-8")): Unit
    }
    require(metaFile.exists(),
      s"$out exists without its meta.json stamp — regenerate (rm -r $out)")
    val meta = readMeta()
    require(meta("base") == base && meta("mult") == mult.toString,
      s"cached corpus at $out was generated from base=${meta("base")} " +
        s"mult=${meta("mult")}, but this run uses base=$base mult=$mult — " +
        s"offsets would mis-assign copy indices; rm -r $out to regenerate")

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

    // qst19: the TTL'd configuration of the line above — the one curve
    // still monotone in STATE_CURVES_r07. Keeper TTL 15 s with trigger
    // starts paced 10 s apart: a keeper whose hash hasn't re-arrived
    // within ~1.5 triggers expires, so state plateaus at the distinct-
    // block ARRIVAL RATE × horizon while the untimed curve above grows
    // with the corpus's total distinct blocks. Zipf-hot docs re-arrive
    // every copy and keep their keepers alive; the cold tail expires —
    // exactly the 100 TB ingest shape (horizon = days, state ∝ rate).
    if (!sys.env.get("SPARK_GRAFT_CURVE_TTL").contains("0")) {
      val totalDocs = spark.read.parquet(docDir).count()
      curve(spark, "qst19_blockdedup_ttl", docDir, 1, "update",
        triggerEveryMs = Some(10000L), expectedRows = Some(totalDocs)) { docs =>
        graft.streaming.BlockDedup.flagBlocks(docs,
          new org.apache.spark.sql.streaming.TTLConfig(
            java.time.Duration.ofSeconds(15))).toDF()
      }
    }

    // VERDICT r14 #5: the streaming feature store's state story. The gate
    // corpus keeps a FIXED user universe, so qst41's per-user carry would
    // saturate trivially; here the keyspace is OPENED (copy k's events get
    // fresh user ids, derived from the event_id copy offset already baked
    // into the corpus) — the 100 TB trajectory, where the user universe
    // grows with the corpus. The un-TTL'd carry then grows monotonically
    // (one FeatState row per user ever seen with a feature), while qst42's
    // event-time TTL expires any carried click once the watermark passes
    // click_ts + the qa05 staleness tolerance (2 days; copies sit +31 days
    // apart, so each copy boundary expires the previous copy's users):
    // state plateaus at arrival rate × tolerance, the qst18/qst19 shape.
    locally {
      import spark.implicits._
      // offsets come from the corpus's meta stamp, NOT recomputed from the
      // current base (ADVICE r15) — see the generation block above
      val evOff = meta("ev_off").toLong
      val userOff = meta("user_off").toLong
      def openUsers(ev: DataFrame): DataFrame = ev.withColumn("user_id",
        col("user_id") + floor(col("event_id") / evOff).cast("long") * userOff)
      def asEv(ev: DataFrame) = ev
        .filter(col("event_type").isin("view", "click", "purchase"))
        .select(col("user_id"), col("ts"), col("event_type"),
          col("event_id"), col("value"))
        .as[graft.streaming.StreamPit.Ev]
      curve(spark, "qst41_pit_open_users", evDir, 2, "update") { ev =>
        graft.streaming.StreamPit.enriched(asEv(openUsers(ev))).toDF()
      }
      curve(spark, "qst42_pit_ttl", evDir, 2, "update") { ev =>
        graft.streaming.StreamPit.enrichedTtl(
          asEv(openUsers(ev).withWatermark("ts", "1 hour")),
          graft.operators.AsOf.StaleTolUs).toDF()
      }
      // VERDICT r15 #3: qst42's live rows plateau from trigger 1 but the
      // provider's memoryUsedBytes climbs ~350 KB/trigger — RocksDB block
      // cache + memtable + retained readers, a CACHE that grows with
      // traffic. For an always-on 100 TB stream the bounded-state story
      // must bound the cache too, and RocksDB's bounded-memory mode is
      // the production knob: ONE shared LRU block cache + write-buffer
      // pool per executor, capped at maxMemoryUsageMB, evicting instead
      // of growing. Same TTL'd query, stated cap of 16 MB (the 100-
      // trigger unbounded line crosses ~35 MB, so the cap demonstrably
      // BINDS): state_rows must reproduce the unbounded plateau exactly
      // while the byte line holds under the cap.
      curve(spark, "qst42_pit_ttl_bounded", evDir, 2, "update",
        confs = Map(
          "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage" -> "true",
          "spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB" -> "16")) { ev =>
        graft.streaming.StreamPit.enrichedTtl(
          asEv(openUsers(ev).withWatermark("ts", "1 hour")),
          graft.operators.AsOf.StaleTolUs).toDF()
      }
    }

    // VERDICT r07 Next #3: close the RocksDB bytes caveat. Under the
    // back-to-back replay above, memoryUsedBytes (SST + memtable) grows in
    // BOTH the TTL'd and unbounded dedup runs because compaction lags the
    // commit rate — tombstoned keys still occupy SST space. Re-record both
    // open-key dedup curves with compactOnCommit=true (a synchronous full
    // compaction per commit — the measurement configuration, not the
    // production default): with dead keys actually reclaimed per commit,
    // the TTL'd run's bytes must plateau with its rows while the
    // unbounded run's keep growing — bytes finally tracking rows.
    if (!sys.env.get("SPARK_GRAFT_CURVE_COMPACT").contains("0")) {
      spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.compactOnCommit", "true")
      try {
        curve(spark, "dedup_open_keys_compact", evDir, 2, "append") { ev =>
          ev.select(col("event_id")).dropDuplicates("event_id")
        }
        curve(spark, "dedup_ttl_open_keys_compact", evDir, 2, "append") { ev =>
          ev.select(col("ts"), col("event_id"))
            .withWatermark("ts", "1 hour")
            .dropDuplicatesWithinWatermark("event_id")
            .select(col("event_id"))
        }
      } finally spark.conf.unset(
        "spark.sql.streaming.stateStore.rocksdb.compactOnCommit")
    }

    // VERDICT r10 #2: the qst26 state-curve pair — same skewed key
    // derivation as the qst26 gate (10 hot keys carry half the mass, the
    // tail keys by unique event_id, so the key universe grows with every
    // copy). The exact leaderboard (qst24's streaming-agg shape) holds one
    // state row per key — monotone in the tail universe; the SpaceSaving
    // sketch holds exactly HhShards × HhCapacity counters — flat from the
    // first trigger. (The sketch processor sorts each micro-batch's rows
    // per shard for bit-deterministic bounded replays — an O(batch log
    // batch) CPU trade irrelevant to state size; a production variant
    // streams the iterator unsorted, the invariants hold under any order.)
    import graft.streaming.StreamingQueries.{hhKey, HhShards, HhCapacity}
    curve(spark, "qst24_topk_exact_keys", evDir, 2, "update") { ev =>
      ev.select(hhKey.as("key")).groupBy(col("key")).count()
    }
    // the sketch curves run with compactOnCommit so sst_bytes IS live
    // state per commit (the dedup_*_compact measurement configuration):
    // the r11 artifact recorded the sketches WITHOUT it, so state_bytes
    // grew with retained SST versions while live state sat flat —
    // exactly the misleading column VERDICT r11 flagged
    curve(spark, "qst26_heavyhitters_sketch", evDir, 2, "update",
      compactOnCommit = true,
      liveAudit = Some { (s, ckpt) =>
        val st = s.read.format("statestore")
          .option("stateVarName", "summary")
          .option("flattenCollectionTypes", "true").load(ckpt)
        val rows = st.select(col("key.value")).distinct().count()
        val entries = st.count()
        s"""{"rows":$rows,"entries":$entries,"bound":"${HhShards} shards x ${HhCapacity} counters"}"""
      }) { ev =>
      graft.streaming.HeavyHitters.sketch(
        ev.select(hhKey.as("key")), HhShards, HhCapacity).toDF()
    }

    // qst28's contrast with dedup_open_keys above: the SAME task (dedup
    // by event_id over an open key universe) — exact dropDuplicates grows
    // one state row per key (3M at 30×); the Bloom sketch holds 4 binary
    // rows (shards × 16 KiB) flat, trading FP-suppression of new keys.
    curve(spark, "qst28_bloom_dedup", evDir, 2, "update",
      compactOnCommit = true,
      liveAudit = Some { (s, ckpt) =>
        val st = s.read.format("statestore")
          .option("stateVarName", "bloom").load(ckpt)
          .select(expr("octet_length(value.value)").as("b"))
        val rows = st.count()
        val bytes = st.agg(sum(col("b"))).collect()(0).getLong(0)
        s"""{"rows":$rows,"value_bytes":$bytes,"bound":"${HhShards} shards x ${graft.streaming.BloomDedup.MBits / 8} bytes"}"""
      }) { ev =>
      graft.streaming.BloomDedup.sketch(
        ev.select((col("event_id") % HhShards).cast("int").as("shard"),
          col("event_id").as("key"))).toDF()
    }
    spark.stop()
  }
}
