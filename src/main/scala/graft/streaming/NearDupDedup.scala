package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}
import org.apache.spark.util.LongAccumulator

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
  * the qd07 pair semantics). The contract holds under ANY micro-batch split
  * of the input, including out-of-order arrival: within a trigger the batch
  * is processed in doc_id order, and when a doc r arrives AFTER a
  * higher-doc_id bucket-mate a that r retroactively makes a duplicate
  * (a.doc_id > r.doc_id, Hamming ≤ bound), the processor re-emits a's flag
  * row with dup=1 — the sink-side max(dup) reduction merges the correction
  * with a's earlier dup=0 row. An arrival-order variant is the same
  * processor with the correction dropped and `aid < r.docId` relaxed —
  * deterministic only per-run.
  *
  * Scale bounds (100 TB ingest): unbounded state is the default only
  * because it is what the batch oracle states; production runs bound it
  * with one or both knobs:
  *
  *  - `ttl`: a [[TTLConfig]] dedup horizon — bucket entries expire after
  *    the configured processing-time duration (RocksDB-native expiry);
  *  - `bucketCap`: a per-bucket entry cap, the streaming analogue of the
  *    batch [[graft.ext.Dedup.BucketCap]]. When a bucket exceeds the cap
  *    the HIGHEST doc_ids are evicted (the doc_id-ordered rule makes low
  *    ids the authoritative dup sources, so keep-lowest loses the least
  *    recall, and the retained set is arrival-order independent). Evicted
  *    entries are counted in the optional `evictions` accumulator — the
  *    observable-drops channel, mirroring Dedup.oversizedLshBuckets.
  *
  * Capped mode trades the any-split determinism guarantee for bounded
  * state: a doc is flagged against the ≤ cap retained mates, exact
  * whenever its bucket never exceeded the cap. The shuffle carries only
  * (chunk-key, doc_id, simhash) — 4 compact rows per doc, never text.
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

  private class BucketProcessor(ttl: TTLConfig, bucketCap: Int,
      evictions: Option[LongAccumulator])
      extends StatefulProcessor[(Int, Long), ChunkDoc, ChunkFlag] {
    @transient private var seen: ListState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[(Long, Long)]("seen",
        Encoders.product[(Long, Long)], ttl)

    override def handleInputRows(key: (Int, Long), rows: Iterator[ChunkDoc],
        timerValues: TimerValues): Iterator[ChunkFlag] = {
      // Sort batch-mates by doc_id so the "earlier doc" rule is evaluated
      // identically whether two docs share a micro-batch or not.
      val batch = rows.toArray.sortBy(_.docId)
      val state = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      val it = seen.get()
      while (it.hasNext) state += it.next()
      val nPrior = state.size // entries emitted in earlier triggers
      val out = scala.collection.mutable.ArrayBuffer.empty[ChunkFlag]
      batch.foreach { r =>
        var dup = false
        var i = 0
        while (i < state.size) {
          val (aid, ash) = state(i)
          if (java.lang.Long.bitCount(ash ^ r.simhash) <= HammingMax) {
            if (aid < r.docId) dup = true
            // Out-of-order correction: an earlier trigger emitted dup=0
            // for aid, and r (a lower doc_id inside the Hamming bound)
            // retroactively makes it a duplicate under the doc_id-ordered
            // rule. Re-emit with dup=1; the sink-side max(dup) merges.
            // (i < nPrior is implied for aid > r.docId: batch-mates
            // already in `state` sort before r.)
            else if (i < nPrior && aid > r.docId) out += ChunkFlag(aid, ash, 1L)
          }
          i += 1
        }
        state += ((r.docId, r.simhash))
        out += ChunkFlag(r.docId, r.simhash, if (dup) 1L else 0L)
      }
      if (state.size > bucketCap) {
        // keep-lowest eviction: rewrite the list with the cap smallest ids
        evictions.foreach(_.add(state.size - bucketCap))
        seen.put(state.sortBy(_._1).take(bucketCap).toArray)
      } else {
        batch.foreach(r => seen.appendValue((r.docId, r.simhash)))
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
    * (docId, simhash, dup) row per doc per chunk per trigger, plus dup=1
    * correction rows when out-of-order arrival retroactively flags an
    * earlier emission. A doc is a near-duplicate iff max(dup) over its rows
    * is 1 — the final reduction runs wherever the flags land (sink-side at
    * test, or a downstream stage in a production pipeline). State is
    * bounded by `ttl` (processing-time dedup horizon) and/or `bucketCap`
    * (keep-lowest per-bucket cap; evictions counted in the accumulator).
    * Requires the RocksDB state store provider (transformWithState
    * contract). */
  def flagNearDuplicates(sim: DataFrame,
      ttl: TTLConfig = TTLConfig.NONE,
      bucketCap: Int = Int.MaxValue,
      evictions: Option[LongAccumulator] = None): DataFrame = {
    implicit val outEnc = Encoders.product[ChunkFlag]
    val timeMode =
      if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    chunked(sim)
      .groupByKey(r => (r.c, r.chunk))(Encoders.product[(Int, Long)])
      .transformWithState(new BucketProcessor(ttl, bucketCap, evictions),
        timeMode, OutputMode.Update())
      .toDF()
  }
}
