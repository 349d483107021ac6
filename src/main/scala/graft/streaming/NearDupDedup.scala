package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming near-duplicate filtering — the streaming face of the batch
  * SimHash pipeline (qd06/qd07): what an LLM ingest pipeline actually runs,
  * dropping a document on arrival when it is a near-dup of anything already
  * seen. Reference analogue: the stateful dedup/window operators the
  * benchmark exercises per-key [sbx/YahooMapper.h:53-99]; here state is keyed
  * by SimHash band.
  *
  * Mechanics: each doc's 48-bit SimHash (identical expression to the batch
  * qd06 — graft.functions.TokenSimHash) is split into 4 × 12-bit chunks;
  * a doc flows to the 4 chunk buckets, and a `transformWithState` processor
  * per (chunk-index, chunk-value) bucket flags it against every bucket-mate
  * with Hamming distance ≤ 12 (RocksDB-backed ListState). A doc is dropped
  * iff flagged in ANY of its 4 buckets — same recall guarantee as qd07
  * (any Hamming ≤ 3 pair shares at least one exact chunk).
  *
  * Determinism contract (what makes qst10 oracle-gatable): "earlier" is
  * doc_id order, not arrival order — doc b is a duplicate iff some doc a
  * with a.doc_id < b.doc_id is within the Hamming bound, whether a arrived
  * before or after b and whether a itself was kept (cascade-free, matching
  * the qd07 pair semantics). The decision is therefore identical under any
  * micro-batch split of the input. An arrival-order variant is the same
  * processor with `aid < r.docId` dropped — deterministic only per-run.
  *
  * Scale notes (100 TB ingest): state per bucket grows with the stream —
  * bound it in production with TTLConfig (dedup horizon) or a per-bucket
  * cap like the batch BucketCap; the shuffle carries only (chunk-key,
  * doc_id, simhash) — 4 compact rows per doc, never document text.
  */
object NearDupDedup {

  private val SimBits = 48
  private val ChunkBits = 12
  private val NumChunks = SimBits / ChunkBits

  /** Max Hamming distance (of 48 bits) for two docs to count as near-dups —
    * same threshold as the batch qd07. */
  val HammingMax = 12

  final case class ChunkDoc(c: Int, chunk: Long, docId: Long, simhash: Long)
  final case class ChunkFlag(docId: Long, simhash: Long, dup: Long)

  private class BucketProcessor
      extends StatefulProcessor[(Int, Long), ChunkDoc, ChunkFlag] {
    @transient private var seen: ListState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[(Long, Long)]("seen",
        Encoders.product[(Long, Long)], TTLConfig.NONE)

    override def handleInputRows(key: (Int, Long), rows: Iterator[ChunkDoc],
        timerValues: TimerValues): Iterator[ChunkFlag] = {
      // Sort batch-mates by doc_id so the "earlier doc" rule is evaluated
      // identically whether two docs share a micro-batch or not.
      val batch = rows.toArray.sortBy(_.docId)
      val prior = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      val it = seen.get()
      while (it.hasNext) prior += it.next()
      val out = batch.map { r =>
        val dup = prior.exists { case (aid, ash) =>
          aid < r.docId && java.lang.Long.bitCount(ash ^ r.simhash) <= HammingMax
        }
        prior += ((r.docId, r.simhash))
        seen.appendValue((r.docId, r.simhash))
        ChunkFlag(r.docId, r.simhash, if (dup) 1L else 0L)
      }
      out.iterator
    }
  }

  /** (doc_id, simhash) frame → one ChunkDoc per 12-bit chunk (4 per doc).
    * Same chunking arithmetic as the batch qd07 bucket stage. */
  private def chunked(sim: DataFrame): Dataset[ChunkDoc] =
    sim.select(explode(array((0 until NumChunks).map(c =>
        struct(lit(c).as("c"),
          expr(s"(simhash div cast(pow(2, ${ChunkBits * c}) as bigint)) % ${1 << ChunkBits}")
            .as("chunk"),
          col("doc_id").as("docId"), col("simhash").as("simhash"))): _*)).as("cd"))
      .select(col("cd.c"), col("cd.chunk"), col("cd.docId"), col("cd.simhash"))
      .as[ChunkDoc](Encoders.product[ChunkDoc])

  /** Per-chunk duplicate flags for a streaming (doc_id, simhash) frame: one
    * (docId, simhash, dup) row per doc per chunk per trigger. A doc is a
    * near-duplicate iff max(dup) over its 4 chunk rows is 1 — the final
    * reduction runs wherever the flags land (sink-side at test, or a
    * downstream stage in a production pipeline). Requires the RocksDB state
    * store provider (transformWithState contract). */
  def flagNearDuplicates(sim: DataFrame): DataFrame = {
    implicit val outEnc = Encoders.product[ChunkFlag]
    chunked(sim)
      .groupByKey(r => (r.c, r.chunk))(Encoders.product[(Int, Long)])
      .transformWithState(new BucketProcessor, TimeMode.None(), OutputMode.Update())
      .toDF()
  }
}
