package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.sources.Tables

/** Substring-level and incremental deduplication over `documents` — the two
  * dedup faces qd01–qd11 don't cover:
  *
  *  - qd12: duplicated-SPAN detection. Document-level dedup (exact, MinHash,
  *    SimHash) misses the common contamination mode where only a passage is
  *    shared (boilerplate headers, licence blocks, quoted paragraphs). The
  *    published remedy is exact substring dedup over a corpus-wide suffix
  *    array; the scalable re-expression here is its standard positional
  *    k-gram form: a token k-gram occurring in ≥ 2 documents marks its k
  *    token positions as duplicated, and per-document coverage is the size
  *    of the union of those [pos, pos+k) intervals. A span of length
  *    L ≥ k duplicated across documents is covered exactly (every window
  *    inside it is shared), so `dup_frac` is the per-doc duplicated-token
  *    fraction with minimum match length k.
  *
  *  - qd13: incremental (new-batch vs seen-corpus) dedup — the steady-state
  *    ingest shape: classify each incoming document against the already-
  *    accepted corpus as exact_dup (byte-identical text), near_dup (SimHash
  *    Hamming ≤ 12 against any seen doc, qd07's bound), or new. Unlike
  *    qd07's symmetric all-pairs, the join is asymmetric: only seen-side
  *    buckets are scanned, and only for the incoming batch.
  *
  * 100 TB shape:
  *  - qd12 has NO pair explosion anywhere — unlike qd03/qd04/qd07 it never
  *    joins documents to documents. Work is linear in total tokens: one
  *    distinct + one groupBy on 16-byte gram hashes (map-side partial aggs
  *    carry both), one gram-keyed semi join back (both sides corpus-sized →
  *    merge-pinned, the qd04 static-broadcast trap), and one window
  *    partitioned by doc_id whose partition size is bounded by the longest
  *    document. Hot grams (corpus-wide boilerplate) just mean long posting
  *    lists — linear rows, never quadratic pairs, so no BucketCap is needed.
  *  - qd13 caps the seen side per (band, chunk) bucket at qd07's
  *    [[Dedup.BucketCap]] (mirrored in the oracle): per incoming chunk the
  *    compare fan-out is ≤ BucketCap, so batch work is O(|incoming| ×
  *    4 × BucketCap) however large the seen corpus grows. The incoming
  *    batch is NOT broadcast: at 100 TB an ingest batch is itself huge, so
  *    both bucket joins are merge-pinned.
  *
  * Reference scope: the reference engine has no substring or incremental
  * dedup; these extend the dedup family for training-data pipelines
  * (published recipes: suffix-array substring dedup, SimHash ingest dedup).
  */
object SpanDedup {

  /** Minimum duplicated-span length in tokens (the k of the k-gram). */
  val SpanK = 5

  // ---------------------------------------------------------------------
  // qd12: per-document duplicated-span coverage.
  // ---------------------------------------------------------------------
  /** (doc_id, pos, gram): every positional k-gram occurrence. `pos` is the
    * 0-based token index the gram starts at. */
  private def gramOccurrences(tok: DataFrame): DataFrame =
    tok.select(col("doc_id"), posexplode(expr(
      s"""transform(sequence(1, size(toks) - ${SpanK - 1}),
         |  i -> md5(concat_ws(' ', slice(toks, i, $SpanK))))"""
        .stripMargin.replace("\n", " "))).as(Seq("pos", "gram")))

  /** StageProbe prefix 1: tokenization + positional gram explode only. */
  private[graft] def gramStage(docs: DataFrame): DataFrame =
    gramOccurrences(docs
      .select(col("doc_id"), expr("split(trim(text), '\\\\s+')").as("toks"))
      .filter(size(col("toks")) >= SpanK))

  /** StageProbe prefix 2: + the duplicate-gram key set (the one gram-keyed
    * shuffle the min≠max rewrite reduced this to). */
  private[graft] def dupGramStage(docs: DataFrame): DataFrame =
    gramStage(docs)
      .groupBy(col("gram"))
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      .filter(col("mn") =!= col("mx")).select(col("gram"))

  /** The qd12 coverage computation over an arbitrary (doc_id, text) frame —
    * package-private so the spec can run it on planted-span corpora. */
  private[graft] def dupSpans(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("doc_id"), expr("split(trim(text), '\\\\s+')").as("toks"))
      .filter(size(col("toks")) >= SpanK)
    val grams = gramOccurrences(tok)
    // grams shared by >= 2 distinct docs. The predicate needs only "more
    // than one distinct doc", and min(doc_id) ≠ max(doc_id) answers that
    // in ONE gram-keyed shuffle with constant-size partial aggs — vs the
    // naive distinct(doc_id, gram) + groupBy(gram) count, which shuffles
    // every occurrence pair TWICE (measured interleaved at 30× soak:
    // 7.52 s → 6.38 s whole-query, 15% — see BASELINE.md stage
    // attribution; the remaining cost is the semi join + per-doc window).
    // Corpus-sized → merge-pin the semi join back (broadcast trap, qd04).
    val dupGrams = grams
      .groupBy(col("gram"))
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      .filter(col("mn") =!= col("mx")).select(col("gram"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    // union-of-intervals size via the sorted-gap identity: each occurrence
    // adds min(k, pos − prev_pos) new covered tokens (k for the first)
    val coverage = grams.join(dupGrams.hint("merge"), Seq("gram"), "left_semi")
      .withColumn("contrib",
        when(lag(col("pos"), 1).over(w).isNull, lit(SpanK))
          .otherwise(least(lit(SpanK), col("pos") - lag(col("pos"), 1).over(w))))
      .groupBy(col("doc_id"))
      .agg(sum(col("contrib")).cast("long").as("dup_tokens"))
    tok.select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"))
      .join(coverage.hint("merge"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        (coalesce(col("dup_tokens"), lit(0L)).cast("double") / col("n_tokens"))
          .as("dup_frac"))
  }

  private def qd12(s: SparkSession, d: String): DataFrame =
    dupSpans(Tables.documents(s, d))

  private val qd12Sql =
    s"""WITH tok AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
       |  FROM documents
       |  WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= $SpanK),
       |occ AS (
       |  SELECT doc_id, unnest(range(1, len(toks) - ${SpanK - 2})) AS i, toks
       |  FROM tok),
       |grams AS (
       |  SELECT doc_id, i - 1 AS pos,
       |    md5(array_to_string(toks[i:i+${SpanK - 1}], ' ')) AS gram
       |  FROM occ),
       |dup AS (
       |  SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM grams)
       |  GROUP BY gram HAVING count(*) >= 2),
       |cov AS (
       |  SELECT doc_id,
       |    CASE WHEN lag(pos) OVER w IS NULL THEN $SpanK
       |         ELSE least($SpanK, pos - lag(pos) OVER w) END AS contrib
       |  FROM (SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (gram))
       |  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
       |agg AS (
       |  SELECT doc_id, CAST(sum(contrib) AS BIGINT) AS dup_tokens
       |  FROM cov GROUP BY doc_id)
       |SELECT t.doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
       |  coalesce(a.dup_tokens, 0) AS dup_tokens,
       |  CAST(coalesce(a.dup_tokens, 0) AS DOUBLE) / len(toks) AS dup_frac
       |FROM tok t LEFT JOIN agg a USING (doc_id)""".stripMargin

  // ---------------------------------------------------------------------
  // qd13: incremental dedup — incoming batch (doc_id % NewMod = 0, a 20%
  // stand-in; in production the batch is "files newer than the last
  // watermark") classified against the seen corpus (the rest).
  // ---------------------------------------------------------------------
  private val NewMod = 5

  private[graft] def simhashChunks(docs: DataFrame,
      scheme: Dedup.BandScheme = Dedup.GateScheme): DataFrame =
    Dedup.withSimhash(docs, scheme.simBits)
      .select(col("doc_id"), col("simhash"),
        explode(array((0 until scheme.bands).map(c =>
          struct(lit(c).as("c"),
            expr(s"(simhash div cast(pow(2, ${scheme.width * c}) as bigint)) % ${1L << scheme.width}")
              .as("chunk"))): _*)).as("ck"))
      .select(col("doc_id"), col("simhash"),
        col("ck.c").as("c"), col("ck.chunk").as("chunk"))

  /** Seen-side (band, chunk) buckets qd13 skips entirely (> BucketCap
    * members): an incoming near-dup whose ONLY match lives in one of these
    * classifies as 'new' — a recall loss, capped by design. This is the
    * observable-drops channel for that cap, symmetric to
    * [[Dedup.oversizedLshBuckets]]; Soak prints its count so the loss is
    * measured rather than silent as the seen corpus grows. */
  def incrementalDroppedBuckets(s: SparkSession, d: String): DataFrame =
    simhashChunks(Tables.documents(s, d))
      .filter(col("doc_id") % NewMod =!= 0)
      .groupBy(col("c"), col("chunk"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > Dedup.BucketCap)

  /** The qd13 classification over an arbitrary (doc_id, text) frame, split
    * seen/incoming by doc_id % NewMod — package-private for the spec. */
  private[graft] def classifyIncremental(docs: DataFrame): DataFrame = {
    val hashed = docs.select(col("doc_id"), md5(col("text")).as("h"))
    val seenH = hashed.filter(col("doc_id") % NewMod =!= 0)
      .select(col("h")).distinct()
    val incoming = hashed.filter(col("doc_id") % NewMod === 0)
    val exact = incoming.join(seenH.hint("merge"), Seq("h"), "left_semi")
      .select(col("doc_id")).withColumn("is_exact", lit(1L))

    val chunks = simhashChunks(docs)
    val seenC = chunks.filter(col("doc_id") % NewMod =!= 0)
    val inC = chunks.filter(col("doc_id") % NewMod === 0)
    // seen-side bucket cap: per incoming chunk at most BucketCap compares,
    // whatever the seen-corpus size (cap mirrored in the oracle)
    val kept = seenC.groupBy(col("c"), col("chunk"))
      .agg(count(lit(1)).as("n")).filter(col("n") <= Dedup.BucketCap)
      .select(col("c"), col("chunk"))
    val near = inC.join(
        seenC.join(kept.hint("merge"), Seq("c", "chunk"), "left_semi")
          .select(col("c"), col("chunk"), col("simhash").as("seen_sim"))
          .hint("merge"),
        Seq("c", "chunk"))
      .filter(expr("bit_count(simhash ^ seen_sim) <= 12"))
      .select(col("doc_id")).distinct().withColumn("is_near", lit(1L))

    incoming.select(col("doc_id"))
      .join(exact.hint("merge"), Seq("doc_id"), "left")
      .join(near.hint("merge"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("is_exact") === 1, "exact_dup")
          .when(col("is_near") === 1, "near_dup")
          .otherwise("new").as("status"))
  }

  private def qd13(s: SparkSession, d: String): DataFrame =
    classifyIncremental(Tables.documents(s, d))

  private[graft] val qd13Sql =
    s"""WITH ${Dedup.simhashSqlCte},
       |hashes AS (SELECT doc_id, md5(text) AS h FROM documents),
       |seen_h AS (SELECT DISTINCT h FROM hashes WHERE doc_id % $NewMod <> 0),
       |incoming AS (SELECT doc_id, h FROM hashes WHERE doc_id % $NewMod = 0),
       |exact AS (SELECT DISTINCT i.doc_id FROM incoming i JOIN seen_h USING (h)),
       |chunks AS (
       |  SELECT doc_id, CAST(simhash AS BIGINT) AS simhash, c,
       |    (CAST(simhash AS BIGINT) // CAST(pow(2, 12 * c) AS BIGINT)) % 4096 AS chunk
       |  FROM simhashed, range(0, 4) t(c)),
       |seen_c AS (SELECT * FROM chunks WHERE doc_id % $NewMod <> 0),
       |in_c AS (SELECT * FROM chunks WHERE doc_id % $NewMod = 0),
       |kept AS (
       |  SELECT c, chunk FROM seen_c GROUP BY c, chunk
       |  HAVING count(*) <= ${Dedup.BucketCap}),
       |near AS (
       |  SELECT DISTINCT i.doc_id
       |  FROM in_c i
       |  JOIN kept k ON k.c = i.c AND k.chunk = i.chunk
       |  JOIN seen_c s ON s.c = i.c AND s.chunk = i.chunk
       |  WHERE bit_count(xor(i.simhash, s.simhash)) <= 12)
       |SELECT i.doc_id,
       |  CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
       |       WHEN n.doc_id IS NOT NULL THEN 'near_dup'
       |       ELSE 'new' END AS status
       |FROM incoming i
       |LEFT JOIN exact e ON e.doc_id = i.doc_id
       |LEFT JOIN near n ON n.doc_id = i.doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // qd15: block-level dedup WITH REWRITE — the published paragraph-dedup
  // recipe (drop paragraphs duplicated across the corpus, keep the first
  // occurrence, reassemble each document from its surviving paragraphs).
  // This corpus has no newlines, so "paragraph" is re-expressed as the
  // fixed-size token block (BlockTokens words); the pipeline shape is
  // identical. Unlike qd01–qd13, the OUTPUT is a transformed corpus (the
  // cleaned text), not flags — the rewrite face of dedup.
  //
  // 100 TB shape: linear everywhere. One groupBy on 16-byte block hashes
  // (map-side partial min) picks the global keeper per hash; the join back
  // is corpus×corpus → merge-pinned (the qd04 static-broadcast trap); the
  // per-doc reassembly is a collect_list bounded by the longest document.
  // No pair explosion exists anywhere, so no BucketCap is needed: a block
  // duplicated a billion times is one groupBy key with a billion-row
  // posting list reduced map-side to a single min.
  //
  // Documents whose every block is a duplicate drop out of the output
  // (nothing survives to reassemble) — mirrored in the oracle.
  // ---------------------------------------------------------------------

  /** Tokens per block ("paragraph" stand-in on a newline-free corpus). */
  val BlockTokens = 20

  /** Keeper ordering: min(doc_id * BlkKeyMul + blk). Valid while every doc
    * has fewer than BlkKeyMul blocks — 1M blocks × 20 tokens ≈ a 20M-token
    * document, far past any real corpus document. */
  private val BlkKeyMul = 1000000L

  /** The qd15 rewrite over an arbitrary (doc_id, text) frame —
    * package-private so the spec can run it on planted-duplicate corpora. */
  private[graft] def blockDedupRewrite(docs: DataFrame): DataFrame = {
    val blocks = docs
      .select(col("doc_id"), expr("split(trim(text), '\\\\s+')").as("toks"))
      .select(col("doc_id"), expr(
        s"""transform(sequence(0, cast(ceil(size(toks) / ${BlockTokens}.0) as int) - 1),
           |  b -> named_struct(
           |    'blk', cast(b as bigint),
           |    'btext', array_join(slice(toks, b * $BlockTokens + 1, $BlockTokens), ' ')))"""
          .stripMargin.replace("\n", " ")).as("bs"))
      .select(col("doc_id"), explode(col("bs")).as("b"))
      .select(col("doc_id"), col("b.blk").as("blk"), col("b.btext").as("btext"),
        md5(col("b.btext")).as("bhash"))
    val keeper = blocks
      .groupBy(col("bhash"))
      .agg(min(col("doc_id") * BlkKeyMul + col("blk")).as("keep_key"))
    val kept = blocks.join(keeper.hint("merge"), Seq("bhash"))
      .filter(col("doc_id") * BlkKeyMul + col("blk") === col("keep_key"))
    kept.groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("kept_blocks"),
        expr("array_join(transform(sort_array(collect_list(struct(blk, btext))), x -> x.btext), ' ')")
          .as("clean_text"))
  }

  private def qd15(s: SparkSession, d: String): DataFrame =
    blockDedupRewrite(Tables.documents(s, d))

  /** The qd15 CTE chain (tokenize → block → keeper election → kept set) —
    * package-visible so the streaming face qst16 reuses it verbatim. */
  private[graft] val blockKeeperSqlCte =
    s"""tok AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
       |  FROM documents),
       |blk AS (
       |  SELECT doc_id,
       |    unnest(range(0, CAST(ceil(len(toks) / ${BlockTokens}.0) AS INT))) AS blk,
       |    toks
       |  FROM tok),
       |blocks AS (
       |  SELECT doc_id, blk,
       |    array_to_string(toks[blk*$BlockTokens+1 : blk*$BlockTokens+$BlockTokens], ' ') AS btext,
       |    md5(array_to_string(toks[blk*$BlockTokens+1 : blk*$BlockTokens+$BlockTokens], ' ')) AS bhash
       |  FROM blk),
       |keeper AS (
       |  SELECT bhash, min(doc_id * $BlkKeyMul + blk) AS keep_key
       |  FROM blocks GROUP BY bhash),
       |kept AS (
       |  SELECT b.doc_id, b.blk, b.btext
       |  FROM blocks b JOIN keeper k
       |    ON b.bhash = k.bhash AND b.doc_id * $BlkKeyMul + b.blk = k.keep_key)""".stripMargin

  private val qd15Sql =
    s"""WITH $blockKeeperSqlCte
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS kept_blocks,
       |  string_agg(btext, ' ' ORDER BY blk) AS clean_text
       |FROM kept GROUP BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // qd18: PERSISTED dedup-state composition — the steady-state ingest
  // LOOP qd13 only states one step of. qd13 classifies one batch against
  // a seen corpus it recomputes from scratch; production ingest instead
  // maintains a durable signature store and, per arriving batch:
  //   (1) classifies the batch against the store AS IT STANDS, then
  //   (2) MERGEs the batch's signatures in (upsert by doc_id).
  // Here the seen corpus (doc_id % NewMod ≠ 0) arrives as IngestBatches
  // sequential batches (batch_id = (doc_id div NewMod) % IngestBatches),
  // each classified-then-merged against a parquet store on disk; finally
  // the qd13 incoming set (batch_id = IngestBatches) is classified
  // against the accumulated store. The gate is the COMPOSITION THEOREM:
  // every doc's status must equal the set-theoretic answer "classified
  // against exactly the batches that arrived before mine" — which for
  // the final batch is qd13's from-scratch result verbatim (same split,
  // same BucketCap, same Hamming bound). The oracle states that unified
  // answer in one query; the Spark side EARNS it through the loop — any
  // merge bug (lost signatures, duplicated rows, cap drift) breaks the
  // hash.
  //
  // Store layout (round 12 — the MERGE-side scaling fix the round-11
  // comments promised): two LIVE parquet tables (h: doc_id → md5;
  // chunks: doc_id → 4 (band, chunk, simhash) rows), each hash-prefix-
  // partitioned by dp = first hex char of md5(doc_id). The r11 layout
  // snapshot-versioned the whole store (v0..vN), making every merge an
  // O(|store|) full rewrite — measured flat at 150k signatures only
  // because fixed overhead still dominated there. A merge now does two
  // partition-local moves instead:
  //   append  — rows of never-seen doc_ids land as NEW files in their
  //             partitions: O(|batch|), independent of |store|;
  //   rewrite — only when the batch RE-ingests known doc_ids, and then
  //             only the partitions those ids hash to are rewritten
  //             (upsertByDoc on the partition slice): O(rows in touched
  //             partitions), never O(|store|).
  // The existence probe that splits the batch into the two moves is
  // itself partition-pruned (it reads doc_id from only the partitions
  // the batch's ids hash to). Snapshot expiry falls out of the design:
  // there are no retained versions to expire — appended files accumulate
  // until compact() folds each partition, the amortized O(|store|/C)
  // move IngestCurve times separately. The partition key is the DOC id,
  // not the content hash: upsert-by-doc must locate a re-ingested doc's
  // OLD rows, and a content-keyed layout (substr(h,1,1)) cannot —
  // changed text moves the row to an unrelated partition, forcing a full
  // store scan per merge. Doc-keyed prefixes keep every signature row of
  // a doc (h and all 4 chunk rows, old and new) in ONE known partition.
  //
  // 100 TB shape: classification cost per batch is qd13's — O(|batch| ×
  // bands × BucketCap) compares, both joins merge-pinned, the store is
  // never broadcast. State never lives in executor memory: it is a
  // parquet table like any other, so the loop scales to a store far
  // larger than the cluster. At cluster scale the partition swap is a
  // transactional-table-format commit (Iceberg/Delta replace-partition);
  // here the same file layout is swapped with filesystem moves.
  // ---------------------------------------------------------------------

  /** Seen-corpus ingest batch count (the final classify is batch
    * [[IngestBatches]], the qd13 incoming set). */
  val IngestBatches = 4

  private def batchIdCol = when(col("doc_id") % NewMod === 0,
      lit(IngestBatches.toLong))
    .otherwise(expr(s"doc_id div $NewMod") % IngestBatches)

  /** Classify a batch against the signature store (stateH: `h`;
    * stateChunks: `c, chunk, simhash`) — qd13's classification with the
    * seen side read from the store instead of recomputed. */
  private[graft] def classifyAgainstState(batch: DataFrame,
      stateH: DataFrame, stateChunks: DataFrame): DataFrame =
    classifyAgainstStateSigs(
      batch.select(col("doc_id"), md5(col("text")).as("h")),
      simhashChunks(batch)
        .select(col("doc_id"), col("c"), col("chunk"), col("simhash")),
      stateH, stateChunks)

  /** The same classification over PRE-COMPUTED batch signature frames
    * (batchH: `doc_id, h`; batchChunks: `doc_id, c, chunk, simhash`) —
    * the reuseSigs = true variant of qd18's ingest loop feeds the same
    * pinned frames to classification and the store merge instead of
    * re-deriving the projections per consumer (an r18 measured attempt,
    * declined as the default — see ingestSequentially). Every doc has
    * exactly one md5 row, so `batchH.select(doc_id)` is row-identical to
    * `batch.select(doc_id)` and the statuses are unchanged. */
  private[graft] def classifyAgainstStateSigs(batchH: DataFrame,
      batchChunks: DataFrame,
      stateH: DataFrame, stateChunks: DataFrame): DataFrame = {
    val exact = batchH
      .join(stateH.select(col("h")).distinct().hint("merge"), Seq("h"), "left_semi")
      .select(col("doc_id")).withColumn("is_exact", lit(1L))
    val kept = stateChunks.groupBy(col("c"), col("chunk"))
      .agg(count(lit(1)).as("n")).filter(col("n") <= Dedup.BucketCap)
      .select(col("c"), col("chunk"))
    val near = batchChunks
      .join(
        stateChunks.join(kept.hint("merge"), Seq("c", "chunk"), "left_semi")
          .select(col("c"), col("chunk"), col("simhash").as("seen_sim"))
          .hint("merge"),
        Seq("c", "chunk"))
      .filter(expr("bit_count(simhash ^ seen_sim) <= 12"))
      .select(col("doc_id")).distinct().withColumn("is_near", lit(1L))
    batchH.select(col("doc_id"))
      .join(exact.hint("merge"), Seq("doc_id"), "left")
      .join(near.hint("merge"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("is_exact") === 1, "exact_dup")
          .when(col("is_near") === 1, "near_dup")
          .otherwise("new").as("status"))
  }

  /** The store MERGE primitive: every signature row of a doc_id present
    * in `batch` is REPLACED by the batch's rows (anti-join + union) —
    * re-ingesting a doc updates its signatures instead of duplicating
    * them. [[SignatureStore.merge]] applies exactly this, but only to
    * the partition slices the batch's doc ids hash into; the spec
    * exercises the replace branch directly with a re-ingest. */
  private[graft] def upsertByDoc(state: DataFrame, batch: DataFrame): DataFrame =
    state.join(batch.select(col("doc_id")).distinct().hint("merge"),
        Seq("doc_id"), "left_anti")
      .union(batch)

  /** Partition key f(doc_id) — one hex char of md5 of the id (16-way).
    * See the layout note above for why the key is the DOC id. */
  private def dpCol = substring(md5(col("doc_id").cast("string")), 1, 1)

  /** One qd18 temp-root cleanup hook per JVM (ADVICE r11: a hook per
    * invocation accumulated across bench iterations and SF sweeps). */
  private val tempRoots =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private def rmTree(p: java.nio.file.Path): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(p.toFile)
  }
  private lazy val tempRootHook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      tempRoots.forEach(p => rmTree(p))
    })): Unit
  }
  private[graft] def registerTempRoot(p: java.nio.file.Path): Unit = {
    tempRootHook; tempRoots.add(p): Unit
  }

  /** The hash-prefix-partitioned live signature store — see the layout
    * note above. All paths are plain parquet directories with `dp=X`
    * partition subdirs; partition swaps are filesystem moves (the
    * single-JVM stand-in for a table format's replace-partition
    * commit). */
  private[graft] final case class SignatureStore(root: java.nio.file.Path,
      compactAppends: Boolean = true,
      overlapMerge: Boolean = true) {
    import org.apache.spark.sql.types._

    private val hDir = s"$root/h"
    private val cDir = s"$root/chunks"
    private val hSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("h", StringType),
      StructField("dp", StringType)))
    private val cSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("c", IntegerType),
      StructField("chunk", LongType), StructField("simhash", LongType),
      StructField("dp", StringType)))

    def init(): this.type = {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(hDir))
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(cDir))
      recoverSwap() // recover a crashed swap (roll back or forward)
      this
    }

    def readH(s: SparkSession): DataFrame =
      s.read.schema(hSchema).parquet(hDir)
        .select(col("doc_id"), col("h"))
    def readChunks(s: SparkSession): DataFrame =
      s.read.schema(cSchema).parquet(cDir)
        .select(col("doc_id"), col("c"), col("chunk"), col("simhash"))

    /** Read-only half of [[merge]]: which dp partitions hold doc ids the
      * batch replaces (empty → the merge is a pure append). Split out
      * (optimization r19) so the ingest loop can run this probe
      * CONCURRENTLY with the batch's classification — both read the same
      * pre-merge store state and neither mutates anything, so the
      * overlap is semantics-free; only the mutating half must wait for
      * the classification to be pinned. */
    def probeTouched(s: SparkSession, batchH: DataFrame): Seq[String] = {
      val bH = batchH.withColumn("dp", dpCol)
      val batchDocs = bH.select(col("dp"), col("doc_id")).distinct()
      // partition-pruned existence probe: read doc_id from ONLY the
      // partitions the batch's ids hash to; ≤ 16 dp keys come back
      val batchDps = batchDocs.select(col("dp")).distinct()
        .collect().map(_.getString(0)).toSeq.sorted
      val replaceDocs = s.read.schema(hSchema).parquet(hDir)
        .filter(col("dp").isin(batchDps: _*)).select(col("doc_id"))
        .join(batchDocs.select(col("doc_id")).hint("merge"),
          Seq("doc_id"), "left_semi")
      replaceDocs.select(dpCol.as("dp")).distinct()
        .collect().map(_.getString(0)).toSeq.sorted
    }

    /** MERGE one batch's signatures in. Returns the dp keys that needed
      * a partition REWRITE (empty for the pure-append case of all-new
      * doc ids — then the only work is writing O(|batch|) new files).
      * `touchedPre`: a [[probeTouched]] result computed by the caller
      * (possibly overlapped with other read-only work) — MUST come from
      * the same batch against the current store state. */
    def merge(s: SparkSession, batchH: DataFrame, batchC: DataFrame,
        touchedPre: Option[Seq[String]] = None): Seq[String] = {
      val bH = batchH.withColumn("dp", dpCol)
      val bC = batchC.withColumn("dp", dpCol)
      val touched = touchedPre.getOrElse(probeTouched(s, batchH))
      if (touched.nonEmpty) {
        // rewrite ONLY the touched partitions: upsert the batch slice
        // into the store slice, stage to a sibling dir, swap dirs in.
        // Both tables stage (the actions that drain every read of the
        // live slices) before either swaps. The h and chunks sides of
        // each step are INDEPENDENT jobs (different inputs, different
        // output dirs) run sequentially only by driver-code ordering —
        // overlapped from a second thread (guide §2.6, optimization
        // r19) so one side's stage/append tail back-fills the cores the
        // other leaves idle. The swap itself stays sequential: it is
        // the filesystem transaction both sides must reach first.
        var hStage: String = null
        var cStage: String = null
        inParallel(
          { hStage = stageTouched(s, hDir, hSchema, touched,
              bH.filter(col("dp").isin(touched: _*))) },
          { cStage = stageTouched(s, cDir, cSchema, touched,
              bC.filter(col("dp").isin(touched: _*))) })
        swapPartitions(Seq(hStage -> hDir, cStage -> cDir), touched)
        inParallel(
          appendRows(bH.filter(!col("dp").isin(touched: _*)), hDir),
          appendRows(bC.filter(!col("dp").isin(touched: _*)), cDir))
      } else {
        inParallel(appendRows(bH, hDir), appendRows(bC, cDir))
      }
      touched
    }

    private def inParallel(a: => Unit, b: => Unit): Unit =
      overlapped(overlapMerge)(a, b)

    // One file per touched dp partition per append (optimization r18,
    // guide §6 small files): an un-repartitioned partitionBy write fans
    // each batch into (write tasks × dp keys) tiny files — at 32 local
    // tasks × 16 prefixes that is up to 512 files per append per table,
    // and EVERY later batch's classify + existence probe pays the
    // per-file open/list overhead back. The dp repartition is a shuffle
    // of batch-sized signature rows (trivial next to the store reads it
    // saves); at cluster scale it is exactly Iceberg's
    // write.distribution-mode=hash trade. compactAppends = false is the
    // pre-r18 fanout shape (OptProbe A/B control; store contents
    // identical either way — only file counts differ).
    private def appendRows(rows: DataFrame, dir: String): Unit =
      (if (compactAppends) rows.repartition(col("dp")) else rows)
        .write.mode("append").partitionBy("dp").parquet(dir)

    /** Path of the swap commit marker — ONE file at the store root (not
      * per-table), written by [[swapPartitions]] only after EVERY staged
      * partition of EVERY table in the swap has been placed. A single
      * root-level marker is what makes hard-crash recovery transactional
      * ACROSS the h and chunks tables: per-table markers would let a
      * crash between two marker writes roll one table forward and the
      * other back (ADVICE r14). */
    private val swapMarker = java.nio.file.Paths.get(s"$root/SWAP_COMMITTED")

    /** Hard-crash recovery (ADVICE r13/r14). Decides ONCE, from the
      * root-level commit marker, whether a crashed swap rolls FORWARD
      * (marker present: every placement finished, the asides are
      * superseded old copies — drop them) or BACK (marker absent: the
      * crash landed mid-aside-move or mid-placement — delete any
      * partially-placed new copy and restore the aside original), then
      * applies that one decision to BOTH tables. Either way the h and
      * chunks tables land on the same side of the swap. Idempotent: a
      * crash inside recovery re-enters the same branch. Called at store
      * open ([[init]]) and at swap entry as a backstop. */
    private def recoverSwap(): Unit = {
      import java.nio.file._
      val forward = Files.exists(swapMarker)
      Seq(hDir, cDir).foreach { dir =>
        val aside = Paths.get(s"$dir.aside")
        if (Files.exists(aside)) {
          if (!forward) {
            // roll back: aside holds the pre-swap original; any live
            // dp= dir that coexists with an aside entry is a partially
            // placed new copy — remove it and put the original back.
            Option(aside.toFile.listFiles()).getOrElse(Array.empty)
              .filter(_.getName.startsWith("dp=")).foreach { orphan =>
                val live = Paths.get(dir, orphan.getName)
                if (Files.exists(live)) rmTree(live)
                Files.move(orphan.toPath, live): Unit
              }
          }
          rmTree(aside)
        }
      }
      Files.deleteIfExists(swapMarker): Unit
    }

    private def stageTouched(s: SparkSession, dir: String,
        schema: org.apache.spark.sql.types.StructType, touched: Seq[String],
        batchSlice: DataFrame): String = {
      val stage = s"$root/stage_${new java.io.File(dir).getName}"
      val slice = s.read.schema(schema).parquet(dir)
        .filter(col("dp").isin(touched: _*))
      upsertByDoc(slice.drop("dp"), batchSlice.drop("dp"))
        .withColumn("dp", dpCol)
        .write.mode("overwrite").partitionBy("dp").parquet(stage)
      stage
    }

    /** Replace `dp=X` dirs for every touched X with the staged versions,
      * across ALL the given (stage, dir) tables under ONE restore scope.
      * Every live partition moves ASIDE first, then all staged partitions
      * move in, then the root-level [[swapMarker]] commits the swap, and
      * only then are the asides deleted — any in-process failure puts
      * every moved partition of every table back, and a HARD crash at any
      * point is resolved transactionally by [[recoverSwap]]: marker
      * absent → every table rolls back to its aside originals; marker
      * present → every table keeps the placed copies. So a mid-swap crash
      * can neither lose a partition nor leave the h and chunks tables
      * desynchronized (ADVICE r12/r14; a table format would commit this
      * atomically — this is the filesystem approximation). */
    private def swapPartitions(swaps: Seq[(String, String)],
        touched: Seq[String]): Unit = {
      import java.nio.file._
      // (live, aside, staged) across every table, same touched keys
      val moves = for ((stage, dir) <- swaps; x <- touched) yield
        (Paths.get(dir, s"dp=$x"), Paths.get(s"$dir.aside", s"dp=$x"),
          Paths.get(stage, s"dp=$x"))
      var movedAside: List[(Path, Path)] = Nil // (aside, live) to restore
      var placed: List[Path] = Nil             // staged dirs now live
      try {
        recoverSwap() // backstop; init() already ran this at open
        swaps.foreach { case (_, dir) =>
          Files.createDirectories(Paths.get(s"$dir.aside")): Unit
        }
        moves.foreach { case (live, aside, _) =>
          if (Files.exists(live)) {
            Files.move(live, aside); movedAside ::= (aside, live)
          }
        }
        moves.foreach { case (live, _, staged) =>
          if (Files.exists(staged)) { Files.move(staged, live); placed ::= live }
        }
        Files.createFile(swapMarker): Unit // commit point (all placed)
      } catch {
        case e: Throwable =>
          placed.foreach(rmTree)          // undo half-placed stages
          movedAside.foreach { case (aside, live) =>
            if (Files.exists(live)) rmTree(live)
            Files.move(aside, live): Unit // originals back, both tables
          }
          swaps.foreach { case (_, dir) => rmTree(Paths.get(s"$dir.aside")) }
          throw e
      }
      swaps.foreach { case (_, dir) => rmTree(Paths.get(s"$dir.aside")) }
      Files.deleteIfExists(swapMarker): Unit
      swaps.foreach { case (stage, _) => rmTree(Paths.get(stage)) }
    }

    /** Fold each partition's accumulated append files into one file —
      * the amortized O(|store|/C) compaction move of the log-structured
      * trade. Partition-parallel; IngestCurve times it separately. */
    def compact(s: SparkSession): Unit = {
      Seq((hDir, hSchema), (cDir, cSchema)).foreach { case (dir, schema) =>
        val stage = s"$root/compact_${new java.io.File(dir).getName}"
        s.read.schema(schema).parquet(dir)
          .repartition(col("dp"))
          .write.mode("overwrite").partitionBy("dp").parquet(stage)
        val touched = new java.io.File(dir).listFiles()
          .filter(f => f.isDirectory && f.getName.startsWith("dp="))
          .map(_.getName.stripPrefix("dp=")).toSeq
        swapPartitions(Seq(stage -> dir), touched)
      }
    }

    def delete(): Unit = rmTree(root)
  }

  /** The qd18 ingest loop over an arbitrary (doc_id, text) frame —
    * package-private so the spec can replay planted corpora and assert
    * the final-batch slice equals [[classifyIncremental]] exactly. The
    * store is LIVE (mutated in place by each merge), so each batch's
    * classification is pinned eagerly before the next merge runs — a
    * bounded |batch| × (doc_id, batch_id, status) frame; the store files
    * are then deleted eagerly instead of lingering until JVM exit. */
  /** Run two independent steps concurrently (`a` on the calling thread,
    * `b` on one spawned thread) — or sequentially when `overlap = false`
    * (the pre-r19 shape, OptProbe's A/B control). Spark's scheduler runs
    * jobs from both threads at once, so one side's stage tail back-fills
    * the cores the other leaves idle (guide §2.6). Both sides complete
    * before return either way, so callers' ordering invariants (classify
    * before mutation, stage before swap) hold; the first failure is
    * rethrown only after BOTH sides have settled (never mutating the
    * store concurrently with an unwinding exception). */
  private[graft] def overlapped(overlap: Boolean)(a: => Unit, b: => Unit): Unit =
    if (!overlap) { a; b }
    else {
      @volatile var bErr: Throwable = null
      val t = new Thread(() => try b catch { case x: Throwable => bErr = x })
      t.setName("graft-qd18-merge-overlap")
      t.start()
      val aErr = try { a; null } catch { case x: Throwable => x }
      t.join()
      if (aErr != null) throw aErr
      if (bErr != null) throw bErr
    }

  /** Release the storage blocks behind an eagerly localCheckpointed frame
    * once its last consumer has run. */
  private def dropLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false): Unit
      case _ => ()
    }

  private[graft] def ingestSequentially(s: SparkSession, docs: DataFrame,
      reuseSigs: Boolean = false,
      compactAppends: Boolean = true,
      overlapMerge: Boolean = true): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("graft-qd18-state-")
    registerTempRoot(root)
    val store = SignatureStore(root, compactAppends, overlapMerge).init()
    val outs = (0 to IngestBatches).map { b =>
      val batch = docs.withColumn("bid", batchIdCol)
        .filter(col("bid") === b).drop("bid")
      // reuseSigs = true pins each batch's md5 + simhash frames eagerly
      // and reuses them across classification, the merge's existence
      // probe, and the merge's writes — an r18 MEASURED ATTEMPT, declined
      // as the default: OptProbe's A/B read ~1.05× faster at sf0.1
      // (14.4 vs 15.0 s, within noise) but 1.12× SLOWER at the 30× tier
      // (35.1 vs 31.4 s) — the BlockManager round-trip of the signature
      // frames costs more than the columnar re-scans it saves (statuses
      // identical either way, spec-pinned).
      val classified = (if (reuseSigs) {
        val bH = batch.select(col("doc_id"), md5(col("text")).as("h"))
          .localCheckpoint(true)
        val bC = simhashChunks(batch)
          .select(col("doc_id"), col("c"), col("chunk"), col("simhash"))
          .localCheckpoint(true)
        val cls = classifyAgainstStateSigs(bH, bC,
            store.readH(s), store.readChunks(s))
          .withColumn("batch_id", lit(b.toLong))
          .localCheckpoint(true)
        if (b < IngestBatches) store.merge(s, bH, bC): Unit
        // the merge is the last consumer of this batch's signature
        // blocks — drop them so a full ingest doesn't accumulate one
        // pinned pair per batch until session end (ADVICE r18). NB
        // Dataset.unpersist() is a no-op for localCheckpointed frames
        // (their blocks hang off the RDD, not the CacheManager), so
        // unpersist the LogicalRDD's RDD directly.
        dropLocalCheckpoint(bH); dropLocalCheckpoint(bC)
        cls
      } else {
        val clsFrame = classifyAgainstState(batch,
            store.readH(s), store.readChunks(s))
          .withColumn("batch_id", lit(b.toLong))
        val bH = batch.select(col("doc_id"), md5(col("text")).as("h"))
        var cls: DataFrame = null
        if (b < IngestBatches) {
          // classification and the merge's existence probe both read the
          // SAME pre-merge store state and are independent — overlap them
          // (guide §2.6; sequential when overlapMerge = false). Only the
          // mutating half of the merge waits for the classification pin.
          var touched: Seq[String] = null
          overlapped(overlapMerge)(
            { cls = clsFrame.localCheckpoint(true) },
            { touched = store.probeTouched(s, bH) })
          store.merge(s, bH,
            simhashChunks(batch)
              .select(col("doc_id"), col("c"), col("chunk"), col("simhash")),
            touchedPre = Some(touched)): Unit
        } else cls = clsFrame.localCheckpoint(true)
        cls
      })
      classified
    }
    store.delete()
    outs.reduce(_.union(_))
      .select(col("doc_id"), col("batch_id"), col("status"))
  }

  private def qd18(s: SparkSession, d: String): DataFrame =
    ingestSequentially(s, Tables.documents(s, d))

  private val qd18Sql =
    s"""WITH ${Dedup.simhashSqlCte},
       |b AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % $NewMod = 0 THEN CAST($IngestBatches AS BIGINT)
       |         ELSE CAST((doc_id // $NewMod) % $IngestBatches AS BIGINT)
       |    END AS batch_id
       |  FROM documents),
       |hashes AS (
       |  SELECT d.doc_id, md5(d.text) AS h, bb.batch_id
       |  FROM documents d JOIN b bb USING (doc_id)),
       |ex AS (
       |  SELECT DISTINCT i.doc_id
       |  FROM hashes i JOIN hashes s ON s.h = i.h AND s.batch_id < i.batch_id),
       |chunks AS (
       |  SELECT sh.doc_id, CAST(simhash AS BIGINT) AS simhash, c,
       |    (CAST(simhash AS BIGINT) // CAST(pow(2, 12 * c) AS BIGINT)) % 4096 AS chunk,
       |    bb.batch_id
       |  FROM simhashed sh JOIN b bb USING (doc_id), range(0, 4) t(c)),
       |seen_c AS (SELECT * FROM chunks WHERE batch_id < $IngestBatches),
       |cnt AS (
       |  SELECT ob.ob AS obs_b, s.c, s.chunk, count(*) AS n
       |  FROM seen_c s JOIN range(1, ${IngestBatches + 1}) ob(ob)
       |    ON s.batch_id < ob.ob
       |  GROUP BY 1, 2, 3),
       |kept AS (SELECT obs_b, c, chunk FROM cnt WHERE n <= ${Dedup.BucketCap}),
       |near AS (
       |  SELECT DISTINCT i.doc_id
       |  FROM chunks i
       |  JOIN kept k ON k.obs_b = i.batch_id AND k.c = i.c AND k.chunk = i.chunk
       |  JOIN seen_c s ON s.c = i.c AND s.chunk = i.chunk
       |    AND s.batch_id < i.batch_id
       |  WHERE bit_count(xor(i.simhash, s.simhash)) <= 12)
       |SELECT bb.doc_id, bb.batch_id,
       |  CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
       |       WHEN n.doc_id IS NOT NULL THEN 'near_dup'
       |       ELSE 'new' END AS status
       |FROM b bb
       |LEFT JOIN ex e ON e.doc_id = bb.doc_id
       |LEFT JOIN near n ON n.doc_id = bb.doc_id""".stripMargin

  def queries: Seq[Q] = Seq(
    Q("qd12_dup_spans", qd12, Some(qd12Sql)),
    Q("qd13_incremental_dedup", qd13, Some(qd13Sql)),
    Q("qd15_block_dedup_rewrite", qd15, Some(qd15Sql)),
    Q("qd18_persisted_ingest_dedup", qd18, Some(qd18Sql)))
}
