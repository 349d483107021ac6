package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** Streaming Bloom-filter deduplication with BOUNDED state — the
  * membership member of the bounded-state streaming analytics suite
  * (qst21 = HLL distinct count, qst26 = SpaceSaving top-k, qst27 = GK
  * quantiles, this = set membership). Exact streaming dedup (qst03,
  * qst18) keeps one state row per key — linear in the key universe; the
  * Bloom form keeps EXACTLY `MBits` bits per shard no matter how many
  * keys flow through, trading a bounded false-positive rate: an FP
  * SUPPRESSES a genuinely-new key (a recall drop, the same
  * cap-by-design channel as qd03's oversized buckets), while a seen key
  * can never re-emit (its bits are all set — no false negatives, under
  * ANY arrival order).
  *
  * What makes this gateable hash-exactly (the qst23 state-audit move):
  * WHICH keys get FP-suppressed depends on arrival order, but the FINAL
  * bit array does not — it is the OR of every distinct key's bit
  * positions, a set union, order-independent by construction. The gate
  * therefore audits the checkpoint's ValueState byte-for-byte against
  * the oracle's independently-computed union (DuckDB derives every
  * key's positions from the same md5 hash family and bit_or's them).
  * The sketch IS the state, and the state is exactly reproducible.
  *
  * Hash family (cross-engine contract, mirrored in the oracle SQL and
  * pinned by spec): position j of key k is the first 15 hex chars of
  * md5("k:j") parsed as a 60-bit integer, mod MBits — the same
  * md5-prefix trick as the simhash token hashes, chosen because both
  * engines render it identically.
  *
  * Reference capability analogue: A6's approx-distinct row
  * [sbx/Values.h:2190-2205] — replace-exact-state-with-a-sketch, here
  * for the dedup/membership operator.
  */
object BloomDedup {

  /** Bits per shard (16 KiB) — the state size knob. */
  val MBits = 131072
  /** Hash functions per key. */
  val NumHashes = 3

  final case class KeyEvent(shard: Int, key: Long)
  final case class FirstSeen(shard: Int, key: Long)

  /** The cross-engine hash family — see class doc. The first 15 hex
    * chars of the digest are the top 60 bits of bytes 0–7 (7 full bytes
    * plus byte 7's high nibble); assembling them by shift/mask skips the
    * per-key hex-string formatting that dominated the hot path at soak
    * scale while keeping the exact md5-prefix-15 semantics the oracle
    * mirrors. */
  private[graft] def bitPositions(key: Long): Array[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(NumHashes) { j =>
      val d = md.digest(s"$key:$j".getBytes("UTF-8"))
      var v = 0L
      var i = 0
      while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
      v = (v << 4) | ((d(7) & 0xf0L) >> 4)
      (v % MBits).toInt
    }
  }

  private class BloomProcessor
      extends StatefulProcessor[Int, KeyEvent, FirstSeen] {
    // resolved driver-side (see BlockDedup.KeeperProcessor livelock note)
    private val binEnc = Encoders.BINARY
    @transient private var bits: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      bits = getHandle.getValueState("bloom", binEnc,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(shard: Int, rows: Iterator[KeyEvent],
        timerValues: TimerValues): Iterator[FirstSeen] = {
      val arr = Option(bits.get()).getOrElse(new Array[Byte](MBits / 8))
      val out = Seq.newBuilder[FirstSeen]
      // sorted for bit-deterministic bounded replays; the gated property
      // (the final bit array) is order-independent regardless
      rows.toArray.sortBy(_.key).foreach { r =>
        val pos = bitPositions(r.key)
        val unseen = pos.exists(p => (arr(p >> 3) & (1 << (p & 7))) == 0)
        if (unseen) {
          out += FirstSeen(shard, r.key)
          pos.foreach(p => arr(p >> 3) = (arr(p >> 3) | (1 << (p & 7))).toByte)
        }
      }
      bits.update(arr)
      out.result().iterator
    }
  }

  /** `keyed` must have int `shard` and long `key` columns. Emits
    * first-seen keys (FP-suppression drops some — see class doc); the
    * authoritative artifact is the checkpoint's "bloom" ValueState. */
  def sketch(keyed: DataFrame): Dataset[FirstSeen] = {
    val spark = keyed.sparkSession
    import spark.implicits._
    keyed.select(col("shard").cast("int").as("shard"), col("key"))
      .as[KeyEvent]
      .groupByKey(_.shard)
      .transformWithState(new BloomProcessor, TimeMode.None(),
        OutputMode.Update())
  }
}
