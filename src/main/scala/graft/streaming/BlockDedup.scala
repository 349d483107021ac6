package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.ext.SpanDedup

/** Streaming block-level dedup — the streaming face of qd15's batch
  * paragraph/block dedup: documents stream in, each explodes into
  * fixed-size token blocks, and a keeper election per block hash keeps
  * exactly one occurrence corpus-wide.
  *
  * Determinism contract (what makes qst16 oracle-gatable): the keeper is
  * the MINIMUM (doc_id, blk) occurrence — the batch qd15 rule — not the
  * first arrival. The contract holds under any micro-batch split: keyed
  * ValueState stores the current keeper per hash, and when a lower
  * (doc_id, blk) arrives after a higher one was already emitted kept=1,
  * the processor re-emits the demoted occurrence with kept=0; the
  * sink-side min(kept) reduction merges the correction (the qst10
  * re-emission pattern). Promotion back to keeper is impossible — the
  * keeper key only decreases — so min(kept) is exact under any order.
  *
  * Scale bounds (100 TB ingest): state is ONE (doc_id, blk) pair per
  * distinct block hash — O(1) per key, no per-key list to cap (contrast
  * qst10's bucket lists). Total state grows with the distinct-block count,
  * which is inherent to exact dedup; the production horizon knob is the
  * TTLConfig passed to `flagBlocks` (gated as qst19): a keeper whose block
  * hash has not re-arrived within the horizon expires, bounding state to
  * the distinct-block arrival rate × horizon. The trade — the same one
  * qst18 pins for dropDuplicatesWithinWatermark — is re-keeping: an
  * occurrence arriving after its hash's keeper expired is elected keeper
  * again, so the kept set is the TIME-RESTRICTED keeper rule (min
  * occurrence per hash per horizon window) rather than corpus-wide min.
  * TTL here is processing-time (the only mode TTLConfig supports), so the
  * horizon binds on wall-clock ingest pacing — the 100 TB deployment shape,
  * where "horizon" means e.g. 7 days of ingest. The shuffle carries only
  * (bhash, doc_id, blk) — never block text.
  */
object BlockDedup {

  final case class BlockRow(bhash: String, docId: Long, blk: Long)
  final case class BlockFlag(docId: Long, blk: Long, kept: Long)

  private class KeeperProcessor(ttl: TTLConfig)
      extends StatefulProcessor[String, BlockRow, BlockFlag] {
    // resolved ONCE driver-side at construction and serialized with the
    // processor: Encoders.product runs Scala-reflection TypeTag resolution,
    // and calling it from init() — which runs PER TASK on executors —
    // livelocks under concurrent tasks (global TypeTag lock + per-thread
    // ExecutorClassLoader misses; observed wedging a 4-thread local run)
    private val keeperEnc = Encoders.product[(Long, Long)]
    @transient private var keeper: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      keeper = getHandle.getValueState[(Long, Long)]("keeper", keeperEnc, ttl)

    override def handleInputRows(key: String, rows: Iterator[BlockRow],
        timerValues: TimerValues): Iterator[BlockFlag] = {
      // (doc_id, blk) order within the batch so the election is identical
      // whether two occurrences share a micro-batch or not
      val batch = rows.toArray.sortBy(r => (r.docId, r.blk))
      val out = scala.collection.mutable.ArrayBuffer.empty[BlockFlag]
      var cur: Option[(Long, Long)] =
        if (keeper.exists()) Some(keeper.get()) else None
      batch.foreach { r =>
        cur match {
          case None =>
            cur = Some((r.docId, r.blk))
            out += BlockFlag(r.docId, r.blk, 1L)
          case Some((kd, kb)) =>
            if (r.docId < kd || (r.docId == kd && r.blk < kb)) {
              // retroactive demotion of the old keeper (qst10 pattern):
              // its earlier kept=1 row is overridden by the sink-side min
              out += BlockFlag(kd, kb, 0L)
              cur = Some((r.docId, r.blk))
              out += BlockFlag(r.docId, r.blk, 1L)
            } else if (r.docId == kd && r.blk == kb) {
              out += BlockFlag(r.docId, r.blk, 1L) // idempotent replay
            } else {
              out += BlockFlag(r.docId, r.blk, 0L)
            }
        }
      }
      cur.foreach(keeper.update)
      out.iterator
    }
  }

  /** (doc_id, text) stream → per-block keeper flags. Downstream reduces
    * with groupBy(docId, blk).agg(min(kept)) — exact under any arrival
    * order (see determinism contract above). */
  def flagBlocks(docs: DataFrame,
      ttl: TTLConfig = TTLConfig.NONE): Dataset[BlockFlag] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bt = SpanDedup.BlockTokens
    val blocks = docs
      .select(col("doc_id"), expr("split(trim(text), '\\\\s+')").as("toks"))
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(0, cast(ceil(size(toks) / $bt.0) as int) - 1),
           |  b -> named_struct(
           |    'blk', cast(b as bigint),
           |    'bhash', md5(array_join(slice(toks, b * $bt + 1, $bt), ' '))))"""
          .stripMargin.replace("\n", " "))).as("b"))
      .select(col("b.bhash").as("bhash"), col("doc_id").as("docId"),
        col("b.blk").as("blk"))
      .as[BlockRow]
    // TTL'd value state requires processing-time mode; the untimed gate
    // path keeps TimeMode.None (no timer plumbing where none is used)
    val timeMode =
      if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    blocks
      .groupByKey(_.bhash)
      .transformWithState(new KeeperProcessor(ttl), timeMode, OutputMode.Update())
  }
}
