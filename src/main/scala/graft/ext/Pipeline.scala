package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.sources.Tables

/** End-to-end training-data ingest pipeline — the composition a user of
  * this engine actually runs over a raw document dump, as one gated query:
  *
  *   1. quality gate: ≥ 10 whitespace tokens (stand-in for the qt02/qt09
  *      score thresholds — the filter STRUCTURE is what the pipeline pins);
  *   2. exact dedup: keep the minimum doc_id per md5(text) (qd01 policy);
  *   3. near-dup drop over the survivors: drop b iff some surviving a < b
  *      shares a 12-bit SimHash chunk with Hamming ≤ 12 (the qd07/qst10
  *      cascade-free rule);
  *   4. stratified sample: qx03's deterministic md5-bucket per-source
  *      rates (even sources 50%, odd 20%);
  *   5. report: per-source document and token counts of the final corpus.
  *
  * Every stage is deterministic (hash policies, no RNG), so the whole
  * composition is DuckDB-oracle-gated end to end — the property that lets
  * a pipeline owner refactor any stage and prove the corpus unchanged.
  *
  * Scale shape: stage shuffles are the stages' own (text-hash window, one
  * chunk groupBy for near-dup candidates, final per-source rollup); no
  * stage introduces a join or shuffle beyond what its standalone query
  * (qd01/qd07/qx03) already pays — INCLUDING qd07's bucket cap: the
  * near-dup candidate stage is the same capped groupBy(chunk) shape
  * ([[Dedup.BucketCap]] bounds the worst bucket's pair fan-out), so one
  * hot 12-bit chunk cannot make the pipeline quadratic where the
  * standalone query would have skipped it. Skipped buckets are observable
  * via [[oversizedBuckets]], mirroring Dedup.oversizedLshBuckets.
  */
object Pipeline {

  private val MinTokens = 10
  private val HammingMax = 12

  /** Quality-gate + exact-dedup survivors with (doc_id, text, source, nt). */
  private def dedupSurvivors(s: SparkSession, d: String): DataFrame = {
    val qual = Tables.documents(s, d)
      .withColumn("nt", size(expr("split(trim(text), '\\\\s+')")).cast("long"))
      .filter(col("nt") >= MinTokens)
    // exact dedup: min doc_id per content hash (one shuffle on md5)
    qual
      .withColumn("rn", row_number().over(
        Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
      .filter(col("rn") === 1).drop("rn")
  }

  /** Near-dup candidate buckets over the dedup survivors, BEFORE the cap
    * filter: one groupBy(chunk-key) shuffle carrying sorted (doc_id,
    * simhash) structs — identical shape to Dedup.simhashBucketStage. Band
    * layout is a parameter (gate = Dedup.GateScheme; Soak also probes
    * Dedup.WideScheme to show the wider keyspace draining the saturated
    * oversized-bucket channel). */
  private def nearDupBuckets(dedup: DataFrame,
      scheme: Dedup.BandScheme = Dedup.GateScheme): DataFrame =
    Dedup.withSimhash(dedup.select(col("doc_id"), col("text")), scheme.simBits)
      .select(col("doc_id"), col("simhash"),
        explode(array((0 until scheme.bands).map(c =>
          expr(s"(simhash div cast(pow(2, ${scheme.width * c}) as bigint)) % ${1L << scheme.width}")
            .cast("long") * scheme.bands + c): _*)).as("ck"))
      .select(col("ck"), struct(col("doc_id"), col("simhash")).as("ds"))
      .groupBy(col("ck"))
      .agg(sort_array(collect_list(col("ds"))).as("ids")) // sorts by doc_id

  /** Buckets the pipeline's near-dup stage skips (> BucketCap members) —
    * the observable-drops channel, symmetric to Dedup.oversizedLshBuckets;
    * asserted empty in the soak's linearity preconditions. */
  def oversizedBuckets(s: SparkSession, d: String,
      scheme: Dedup.BandScheme = Dedup.GateScheme): DataFrame =
    nearDupBuckets(dedupSurvivors(s, d), scheme)
      .filter(size(col("ids")) > Dedup.BucketCap)
      .select(col("ck"), size(col("ids")).as("n"))

  /** Survivors of quality gate + exact dedup + near-dup drop + sampling,
    * with (doc_id, text, source, nt). Package-private for the spec. */
  private[graft] def sampledCorpus(s: SparkSession, d: String): DataFrame = {
    val dedup = dedupSurvivors(s, d)
    // near-dup drop among survivors: the qd07 capped-bucket shape — pair
    // explosion is map-side after the one groupBy(chunk) shuffle, bounded
    // by BucketCap² per bucket; oversized buckets are skipped (observable
    // above), exactly as the standalone query does.
    val dropped = nearDupBuckets(dedup)
      .filter(size(col("ids")).between(2, Dedup.BucketCap))
      .select(explode(expr(
        """flatten(transform(sequence(1, size(ids) - 1),
          |  i -> transform(slice(ids, i + 1, size(ids) - i),
          |    b -> struct(b.doc_id AS doc_id,
          |      bit_count(element_at(ids, i).simhash ^ b.simhash) AS hamming))))"""
          .stripMargin.replace("\n", " "))).as("p"))
      .filter(col("p.hamming") <= HammingMax)
      .select(col("p.doc_id").as("doc_id")).distinct()
    // merge hint: the dropped set is corpus-sized — never broadcast-safe,
    // and the static planner misestimates post-explode/distinct sizes
    // (see Dedup qd03/qd04).
    val kept = dedup.join(dropped.hint("merge"), Seq("doc_id"), "left_anti")
    // deterministic stratified sample (qx03 rates)
    kept
      .withColumn("bucket", expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint) % 100"))
      .withColumn("rate", expr(
        "CASE WHEN cast(substring(source, 4) as int) % 2 = 0 THEN 50 ELSE 20 END"))
      .filter(col("bucket") < col("rate"))
  }

  private def qp01(s: SparkSession, d: String): DataFrame =
    sampledCorpus(s, d)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))

  private val qp01Sql =
    s"""WITH qual AS (
      |  SELECT doc_id, text, source,
      |    len(regexp_split_to_array(trim(text), '\\s+')) AS nt
      |  FROM documents
      |  WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= $MinTokens),
      |dedup AS (
      |  SELECT doc_id, text, source, nt FROM (
      |    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      |    FROM qual)
      |  WHERE rn = 1),
      |${Dedup.simhashSqlCteFrom("dedup")},
      |chunks AS (
      |  SELECT doc_id, simhash,
      |    ((simhash // CAST(pow(2, 12 * c) AS BIGINT)) % 4096) * 4 + c AS ck
      |  FROM simhashed, range(0, 4) t(c)),
      |kept_buckets AS (
      |  SELECT ck FROM chunks GROUP BY ck
      |  HAVING count(*) BETWEEN 2 AND ${Dedup.BucketCap}),
      |dup AS (
      |  SELECT DISTINCT y.doc_id
      |  FROM chunks x JOIN chunks y
      |    ON x.ck = y.ck AND x.doc_id < y.doc_id
      |   AND bit_count(xor(x.simhash, y.simhash)) <= $HammingMax
      |  JOIN kept_buckets k ON k.ck = x.ck),
      |sampled AS (
      |  SELECT d.source, d.nt FROM dedup d
      |  WHERE d.doc_id NOT IN (SELECT doc_id FROM dup)
      |    AND CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100
      |        < CASE WHEN CAST(substr(d.source, 4) AS INT) % 2 = 0 THEN 50 ELSE 20 END)
      |SELECT source, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens
      |FROM sampled GROUP BY source""".stripMargin

  // ---------------------------------------------------------------------
  // qp02: embedding-side curation pipeline — the cross-modal composition
  // a semantic-curation pass actually runs, as one gated query:
  //
  //   1. quality gate: ≥ MinTokens whitespace tokens (qp01's stage 1);
  //   2. cross-modal attach: join each surviving document to its
  //      embedding row (vec_id = doc_id) — the canonical co-partitioned
  //      1:1 join; at 100 TB both sides are corpus-sized, so the join is
  //      merge-pinned here and bucketed-by-id in a real deployment
  //      (qx02's layout) — never broadcast;
  //   3. semantic dedup: qd11's SemDeDup flags VERBATIM
  //      ([[Clustering.semDedupFlags]] — cluster-scoped cosine pairs,
  //      keep-min) joined on doc_id; keep is_dup = 0;
  //   4. report: per-source kept documents, token mass, and label
  //      diversity (distinct embedding labels) — the curation dashboard
  //      row a pipeline owner reads.
  //
  // Stage 3 is the SAME frame qd11 gates standalone, so the pipeline
  // introduces no shape beyond its stages' own: one merge join per
  // attach/flag, and qd11's documented O(N²/K) cluster pair work with K
  // as the 100 TB sizing knob. All corpus×corpus joins merge-pinned
  // (plan-lint guarded).
  // ---------------------------------------------------------------------

  /** Quality-gated docs joined 1:1 to their embedding rows, with qd11's
    * dup flags — package-private for the spec. */
  private[graft] def curatedCorpus(s: SparkSession, d: String): DataFrame = {
    val qual = Tables.documents(s, d)
      .withColumn("nt", size(expr("split(trim(text), '\\\\s+')")).cast("long"))
      .filter(col("nt") >= MinTokens)
      .select(col("doc_id"), col("source"), col("nt"))
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id").as("doc_id"), col("label"))
    val flags = Clustering.semDedupFlags(s, d)
      .select(col("vec_id").as("doc_id"), col("is_dup"))
    qual
      .join(emb.hint("merge"), Seq("doc_id"))
      .join(flags.hint("merge"), Seq("doc_id"))
      .filter(col("is_dup") === 0L)
  }

  private def qp02(s: SparkSession, d: String): DataFrame =
    curatedCorpus(s, d)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"),
        countDistinct(col("label")).as("n_labels"))

  private val qp02Sql =
    s"""WITH ${Clustering.semDedupSqlCte},
       |qual AS (
       |  SELECT doc_id, source,
       |    len(regexp_split_to_array(trim(text), '\\s+')) AS nt
       |  FROM documents
       |  WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= $MinTokens),
       |curated AS (
       |  SELECT q.doc_id, q.source, q.nt, e.label
       |  FROM qual q
       |  JOIN embeddings e ON e.vec_id = q.doc_id
       |  WHERE q.doc_id NOT IN (SELECT vec_id FROM dup))
       |SELECT source, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens,
       |  count(DISTINCT label) AS n_labels
       |FROM curated GROUP BY source""".stripMargin

  // ---------------------------------------------------------------------
  // qp03: data-quality expectation checks — the validation contract every
  // 100 TB load runs before publishing a table (the Great-Expectations/
  // dbt-test primitive): each expectation is a (check_name, metric,
  // passed) row where `metric` counts VIOLATIONS (0 = clean), so the
  // whole suite is a UNION of independent aggregates the scheduler can
  // evaluate in one job. The checks exercise the real shapes: PK
  // uniqueness (self-agg), referential integrity (anti-join against the
  // parent — an SMJ at scale, the one check that costs a shuffle),
  // domain/range/null-rate checks (map-side counters). All metrics are
  // exact integers; `passed` is metric = 0 — bit-identical in both
  // engines by construction.
  // ---------------------------------------------------------------------
  private def qp03(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    val lineitem = Tables.lineitem(s, d)
    val events = Tables.events(s, d)
    val docs = Tables.documents(s, d)
    def check(name: String, metric: DataFrame): DataFrame =
      metric.select(lit(name).as("check_name"),
        col("metric").cast("long").as("metric"),
        (col("metric") === 0).as("passed"))
    val pkDups = orders.groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("c")).filter(col("c") > 1)
      .agg(count(lit(1)).as("metric"))
    val fkOrphans = lineitem.select(col("l_orderkey"))
      .join(orders.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("metric"))
    val negValues = events.agg(
      sum(when(col("value") < 0, 1L).otherwise(0L)).as("metric"))
    val badTypes = events.agg(
      sum(when(col("event_type").isin(
        "view", "click", "purchase", "signup", "error"), 0L)
        .otherwise(1L)).as("metric"))
    val emptyDocs = docs.agg(
      sum(when(col("text").isNull || length(trim(col("text"))) === 0, 1L)
        .otherwise(0L)).as("metric"))
    check("orders_pk_unique", pkDups)
      .unionAll(check("lineitem_fk_orders", fkOrphans))
      .unionAll(check("events_value_nonneg", negValues))
      .unionAll(check("events_type_in_domain", badTypes))
      .unionAll(check("documents_text_nonempty", emptyDocs))
  }

  private val qp03Sql =
    """SELECT 'orders_pk_unique' AS check_name,
      |  CAST((SELECT count(*) FROM (
      |     SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1))
      |    AS BIGINT) AS metric,
      |  (SELECT count(*) FROM (
      |     SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1)) = 0
      |    AS passed
      |UNION ALL
      |SELECT 'lineitem_fk_orders',
      |  CAST((SELECT count(*) FROM lineitem l
      |     WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                       WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT),
      |  (SELECT count(*) FROM lineitem l
      |     WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                       WHERE o.o_orderkey = l.l_orderkey)) = 0
      |UNION ALL
      |SELECT 'events_value_nonneg',
      |  CAST((SELECT coalesce(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END), 0)
      |     FROM events) AS BIGINT),
      |  (SELECT coalesce(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END), 0)
      |     FROM events) = 0
      |UNION ALL
      |SELECT 'events_type_in_domain',
      |  CAST((SELECT coalesce(sum(CASE WHEN event_type IN
      |     ('view','click','purchase','signup','error') THEN 0 ELSE 1 END), 0)
      |     FROM events) AS BIGINT),
      |  (SELECT coalesce(sum(CASE WHEN event_type IN
      |     ('view','click','purchase','signup','error') THEN 0 ELSE 1 END), 0)
      |     FROM events) = 0
      |UNION ALL
      |SELECT 'documents_text_nonempty',
      |  CAST((SELECT coalesce(sum(CASE WHEN text IS NULL
      |     OR length(trim(text)) = 0 THEN 1 ELSE 0 END), 0)
      |     FROM documents) AS BIGINT),
      |  (SELECT coalesce(sum(CASE WHEN text IS NULL
      |     OR length(trim(text)) = 0 THEN 1 ELSE 0 END), 0)
      |     FROM documents) = 0""".stripMargin

  def queries: Seq[Q] = Seq(
    Q("qp01_pipeline_e2e", qp01, Some(qp01Sql)),
    Q("qp02_curation_pipeline", qp02, Some(qp02Sql)),
    Q("qp03_data_quality_checks", qp03, Some(qp03Sql)))
}
