package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Plan lint: structural guards over the optimized physical plans of every
  * registry query — the properties that keep queries scalable can regress
  * silently while results stay correct, so they're pinned here.
  */
class PlanLintSpec extends SparkSpec {

  // queries whose *intended* shape is an all-pairs comparison at small SF
  // — single source of truth shared with the census diff (PlanCensus)
  private val allowNestedLoop = PlanCensus.AllowNestedLoop

  // streaming / side-effecting queries execute eagerly — skip plan capture
  private val skip = Set("qst01_stream_tumbling", "qst02_stream_ysb",
    "qst03_stream_dedup", "qst04_stream_watermark_append",
    "qst05_replay_source_ysb", "qst06_stream_session",
    "qst07_stream_interval_join", "qst08_stream_running_counters",
    "qst09_stream_outer_join", "qst10_stream_neardup",
    "qst11_stream_contamination", "qst12_stream_pii",
    "qst13_stream_sample", "qst14_stream_quality", "qst15_stream_sessions",
    "qx02_bucketed_join")

  Registry.all.filterNot(q => skip(q.name)).foreach { q =>
    test(s"${q.name}: no accidental nested-loop join") {
      val plan = q.run(spark, sf).queryExecution.executedPlan.toString
      if (!allowNestedLoop(q.name)) {
        assert(!plan.contains("CartesianProduct"),
          s"unexpected CartesianProduct in ${q.name}")
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"unexpected BroadcastNestedLoopJoin in ${q.name}")
      }
    }
  }

  test("filter pushdown reaches the parquet scan (q02)") {
    val plan = Registry.byName("q02_filter_project").run(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && !plan.contains("PushedFilters: []"),
      s"no pushed filters:\n${plan.take(600)}")
  }

  test("column pruning reaches the parquet scan (q02 reads 5 of 11 columns)") {
    val plan = Registry.byName("q02_filter_project").run(spark, sf)
      .queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && !readSchema.contains("l_returnflag"),
      s"pruning failed: $readSchema")
  }

  test("q04 star join: date filter pushed to the orders scan, dims broadcast") {
    val plan = Registry.byName("q04_star_join").run(spark, sf)
      .queryExecution.executedPlan.toString
    // the o_orderdate range filter is written post-join but must reach the
    // orders parquet scan via Catalyst pushdown
    val ordersScan = plan.linesIterator
      .filter(_.contains("orders.parquet"))
      .find(_.contains("PushedFilters"))
    assert(ordersScan.exists(l =>
      l.contains("o_orderdate") && !l.contains("PushedFilters: []")),
      s"o_orderdate filter not pushed to orders scan:\n${ordersScan.getOrElse("scan line not found")}")
    // customer/nation/region dims must be broadcast, not shuffled
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3,
      "expected >= 3 broadcast joins for the three dims")
  }

  // Headline batch queries must keep a WholeStageCodegen span (the `*(n)`
  // stage markers in the plan tree) — a query falling entirely out of
  // codegen (e.g. an interpreted expression sneaking into the hot path) is
  // a silent multi-x regression at 100 TB.
  Registry.all.filter(q => q.headline && !skip(q.name)).foreach { q =>
    test(s"${q.name}: plan contains a WholeStageCodegen span") {
      val df = q.run(spark, sf)
      df.collect() // execute THIS plan so AQE finalizes it (count() builds a new one)
      // exchange-less plans never get AQE-wrapped — both forms carry `*(n)` markers
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("*("), s"no codegen span in ${q.name}:\n${plan.take(400)}")
    }
  }

  // ----- candidate-generation single-Exchange contracts ------------------
  // The round-1 LSH formulation was a band self-join: three shuffles and
  // unbounded per-bucket blowup. The current qd03/qd04/qd07 candidate stages
  // are contractually ONE hash-partition shuffle each (groupBy on a compact
  // bucket key, pair explosion map-side afterwards). A refactor that
  // reintroduces a self-join adds an Exchange and fails here even though
  // results stay hash-correct.
  private def shuffleExchanges(df: org.apache.spark.sql.DataFrame): Int =
    "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).size

  test("qd03 LSH candidate stage: exactly one shuffle Exchange") {
    assert(shuffleExchanges(graft.ext.Dedup.lshStage(spark, sf)) == 1)
  }

  test("qd04 posting-list candidate stage: exactly one shuffle Exchange") {
    assert(shuffleExchanges(graft.ext.Dedup.postingStage(spark, sf)) == 1)
  }

  test("qd07 simhash bucket candidate stage: exactly one shuffle Exchange") {
    assert(shuffleExchanges(graft.ext.Dedup.simhashBucketStage(spark, sf)) == 1)
  }

  // qa04b's whole point: N features, ONE key shuffle. The carry stage is a
  // single Window operator computing every feature's last() over one
  // (user_id)-partitioned sort; the only other exchanges are the per-
  // feature pre-aggregations (shared with qa04, which pays those PLUS one
  // window shuffle per feature).
  test("qa04b N-feature PIT: exactly one Window operator for all carries") {
    val plan = Registry.byName("qa04b_pit_single_pass").run(spark, sf)
      .queryExecution.executedPlan.toString
    assert("Window \\[".r.findAllIn(plan).size == 1,
      s"expected 1 Window operator:\n${plan.take(800)}")
  }

  test("pitMulti core: one shuffle + one Window for two features") {
    import spark.implicits._
    val obs = Seq((1L, 10L, "e1")).toDF("user_id", "ts", "event_id")
    val f1 = Seq((1L, 5L, 2.0)).toDF("user_id", "ts", "v1")
    val f2 = Seq((1L, 6L, 3.0)).toDF("user_id", "ts", "v2")
    val df = graft.operators.AsOf.pitMulti(obs, Seq(f1 -> "v1", f2 -> "v2"),
      "user_id", "ts")
    val plan = df.queryExecution.executedPlan.toString
    assert(shuffleExchanges(df) == 1,
      s"expected exactly 1 hash Exchange:\n${plan.take(800)}")
    assert("Window \\[".r.findAllIn(plan).size == 1, "expected 1 Window")
  }

  // qd19's r13 contract: the posting self-join runs in REPRESENTATIVE
  // space (exact-dedup-first) and the member expansion is a map-side
  // Generate chain — no broadcast anywhere (corpus-sized frames only).
  test("qd19 containment: no broadcast of corpus-sized frames (rep-space pair join)") {
    val plan = Registry.byName("qd19_containment_dup").run(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastExchange"),
      "corpus-sized frame broadcast in qd19")
    assert(plan.contains("Generate"),
      "member expansion should be an explode (Generate), not a join")
  }

  test("qt21 winnowing profile: ZERO shuffle Exchanges (pure projection)") {
    // the round-12 rewrite's contract: selection is per-document local,
    // so the whole per-doc profile is scan → project — a refactor that
    // reintroduces the (doc, window) tap join adds an Exchange here
    assert(shuffleExchanges(
      Registry.byName("qt21_winnowing_fingerprints").run(spark, sf)) == 0)
  }

  // ----- corpus-sized joins must never broadcast --------------------------
  // Joins whose BOTH sides grow with the corpus (per-doc aggregates,
  // candidate-pair sets) are never broadcast-safe, and the static planner's
  // size estimates after explode/aggregate chains are unreliable: at the
  // 30× soak scale it estimated a 150k-doc counts frame "small", chose a
  // broadcast, and OOM'd qd04. The shuffle join is pinned with merge hints
  // in the queries; this asserts the resulting plan carries no broadcast.
  for (name <- Seq("qd03_minhash_lsh_pairs", "qd04_ngram_jaccard",
      "qt09_gopher_repetition", "qp01_pipeline_e2e", "qd10_cdc_chunks",
      // round-5 additions: qd12's gram semi-join + coverage join, qd13's
      // seen-bucket joins, and qx06's offsets join are all corpus×corpus
      "qd12_dup_spans", "qd13_incremental_dedup", "qx06_shard_shuffle",
      // qd15's keeper join is corpus×corpus (block hashes × occurrences)
      "qd15_block_dedup_rewrite",
      // qw08's cohort frame is one row per USER — grows with the corpus
      "qw08_cohort_retention",
      // qd16's component and score frames both grow with the corpus
      "qd16_component_keep_best",
      // qd05b/qd05c's candidate pairs and embeddings both grow with the
      // corpus (same plan shape, gate vs wide band layout)
      "qd05b_embedding_lsh_dup", "qd05c_embedding_lsh_wide",
      // qw09's step frames are one row per user — corpus-growing
      "qw09_funnel",
      // qw10's obs/grid/rank frames are all one-row-per-(user,hour) —
      // corpus-growing on both sides of both fill joins
      "qw10_gap_fill",
      // q31's agg table is keyspace-sized (generically corpus-growing for
      // user-level keys) — the maintenance merge must stay a shuffle join
      "q31_incremental_agg",
      // qt19: BOTH 5-gram corpora grow with the data — the symmetric
      // variant of qt10, whose one-broadcast shape is pinned separately;
      // qd18's signature store AND its batches are both corpus-growing
      "qt19_symmetric_contamination", "qd18_persisted_ingest_dedup")) {
    test(s"$name: no broadcast of corpus-sized frames") {
      val plan = Registry.byName(name).run(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastExchange"),
        s"corpus-sized frame broadcast in $name")
    }
  }

  // ----- dictionary joins must stay unhinted (AQE decides) ----------------
  // qt06/qt07 join an UNBOUNDED token dictionary (vocabulary grows with
  // corpus — Heaps' law): a static broadcast() hint there is a 100 TB
  // driver-OOM. The only legitimate hint in each query is the 1-row
  // corpus-N cross frame. Counting ResolvedHint nodes in the analyzed plan
  // pins that: a reintroduced broadcast(df) adds a second hint and fails.
  for (name <- Seq("qt06_tfidf", "qt07_unigram_logprob")) {
    test(s"$name: only the 1-row corpus-N frame is broadcast-hinted") {
      val analyzed = Registry.byName(name).run(spark, sf)
        .queryExecution.analyzed.toString
      val hints = "ResolvedHint".r.findAllIn(analyzed).size
      assert(hints == 1,
        s"expected exactly 1 broadcast hint (corpus-N frame), found $hints — " +
          "the unbounded dictionary join must stay unhinted for AQE")
    }
  }

  // ----- eval-set broadcast must be bounded by construction ---------------
  // qt10's contamination gate broadcasts the eval-gram set. That is only
  // safe because the eval side is a FIXED doc-id range (doc_id < 32) whose
  // size is independent of corpus size; a corpus-proportional eval stand-in
  // (e.g. doc_id % k = 0) silently re-creates the qd04 static-broadcast OOM.
  // Pinned two ways: the doc-id bound must reach the eval-side parquet scan
  // as a pushed LessThan filter, and the plan must carry exactly ONE
  // BroadcastExchange (the eval set — nothing corpus-sized joins broadcast).
  // qst11 shares the same EvalDocCount constant and oracle by construction.
  test("qt10 contamination: eval side is a pushed fixed doc-id range, single broadcast") {
    val plan = Registry.byName("qt10_contamination").run(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LessThan(doc_id,"),
      "eval-side doc_id bound not pushed to the parquet scan")
    val broadcasts = "BroadcastExchange".r.findAllIn(plan).size
    assert(broadcasts == 1,
      s"expected exactly 1 BroadcastExchange (the bounded eval set), found $broadcasts")
  }

  // qf04's whole point: the dt range must prune at PLANNING time — the
  // predicate appears as PartitionFilters on the scan (directories outside
  // the week are never listed into tasks), and only the 7 selected days'
  // files back the relation.
  test("qf04 date-partitioned scan: dt range is a partition filter, 7 days read") {
    val scan = graft.sources.FileSources.datePartitionedScan(spark, sf)
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      "PartitionFilters: \\[[^\\]]*dt".r.findFirstIn(plan).isDefined,
      s"dt predicate not a partition filter:\n${plan.take(800)}")
    val days = scan.select("dt").distinct().count()
    assert(days === 7, s"expected 7 pruned day partitions, read $days")
  }

  // qysb02's dim is corpus-derived (distinct users), so the join is
  // UNHINTED (r12 finding #1): the analyzed plan must carry zero
  // ResolvedHints, while at this SF the planner still picks a broadcast
  // join on its own (under autoBroadcastJoinThreshold) — the behavior a
  // pinned hint would fake at 100 TB where it must become a shuffle.
  test("YSB dimension join: unhinted, planner broadcasts at small SF (qysb02)") {
    val df = Registry.byName("qysb02_events").run(spark, sf)
    assert(!df.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "corpus-derived dim must stay unhinted — AQE decides")
    df.collect() // finalize AQE
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "planner should still choose a broadcast at this SF")
  }

  // ----- pure projections must not shuffle --------------------------------
  // qe01 (int8 quantization), qt14 (text normalization), qt18 (Unicode
  // normalization) and qe03 (PQ encode with literal-folded codebooks) are
  // per-row maps; any Exchange appearing in their plans is a regression.
  // (qe03's codebook sample is collected at plan-BUILD time — the encode
  // plan itself must stay shuffle- and join-free.)
  for (name <- Seq("qe01_embedding_quantize", "qt14_text_normalize",
      "qt18_unicode_normalize", "qe03_product_quantize")) {
    test(s"$name: zero Exchange (pure per-row projection)") {
      val plan = Registry.byName(name).run(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle in $name")
    }
  }

  // ----- bounded-keyspace broadcast is the legitimate kind ----------------
  // qe02's occupancy frame is bounded at 2^16 rows BY CONSTRUCTION (the
  // code space, not the corpus), so its static broadcast is safe at any
  // corpus size — the inverse case of the qd04 rule. Exactly one
  // BroadcastExchange: the occupancy frame and nothing corpus-sized.
  // qp02's legitimate broadcasts are exactly qd11's own (the bounded
  // K-centroid frames of the k-means assignment); the cross-modal attach
  // and the flag join it ADDS are corpus×corpus and merge-pinned, so the
  // composition must introduce ZERO broadcasts beyond the standalone
  // stage's count.
  test("qp02 curation pipeline: no broadcasts beyond qd11's own centroid frames") {
    def broadcasts(name: String): Int =
      "BroadcastExchange".r.findAllIn(
        Registry.byName(name).run(spark, sf)
          .queryExecution.executedPlan.toString).size
    val base = broadcasts("qd11_semdedup")
    val composed = broadcasts("qp02_curation_pipeline")
    assert(composed == base,
      s"qp02 has $composed BroadcastExchanges vs qd11's $base — " +
        "the attach/flag joins must stay merge-pinned")
  }

  test("qe02 binary codes: single broadcast, and it is the bounded occupancy frame") {
    val plan = Registry.byName("qe02_embedding_binary").run(spark, sf)
      .queryExecution.executedPlan.toString
    val broadcasts = "BroadcastExchange".r.findAllIn(plan).size
    assert(broadcasts == 1,
      s"expected exactly 1 BroadcastExchange (2^16-bounded occupancy), found $broadcasts")
  }

  // qs04's scale contract: the coarse rank-≤-C filter must compile to
  // WindowGroupLimit (per-task bounded top-C heaps before any exchange —
  // Spark's rank-limit pushdown), and the rerank must attach full vectors
  // through broadcasts of the |queries|·C-bounded candidate frame, never a
  // corpus-side shuffle join.
  test("qs04 two-stage rerank: coarse top-C is a WindowGroupLimit, rerank broadcast-bounded") {
    val df = Registry.byName("qs04_quantized_rerank").run(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"coarse rank filter did not push down to WindowGroupLimit:\n${plan.take(600)}")
    assert(!plan.contains("SortMergeJoin"),
      "rerank attach should be broadcast (bounded candidate frame), not a shuffle join")
  }

  // qt23's scale contract: the 9-term selection is a TakeOrderedAndProject
  // (per-partition heaps, never a global sort), and the final per-query
  // top-10 is fed by map-side WindowGroupLimits so the 3-partition rank
  // exchange carries ≤ 10·tasks rows per query, not the corpus.
  test("qt23 BM25: term selection is TakeOrdered, rank window group-limited") {
    val plan = Registry.byName("qt23_bm25_rank").run(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-9 term selection is not a TakeOrderedAndProject:\n${plan.take(600)}")
    assert(plan.contains("WindowGroupLimit"),
      "final top-10 rank filter did not push down to WindowGroupLimit")
  }

  // qs12's scale contract: the serve scan over the persisted inverted
  // file must be pruned by DYNAMIC partition pruning — the probed-cell
  // set is only known at runtime (from the broadcast query side), so a
  // plan without dynamicpruning reads the WHOLE index per query batch.
  test("qs12 persisted IVF: the index scan carries a dynamic pruning filter") {
    val plan = Registry.byName("qs12_persisted_ivf").run(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning on the index scan:\n${plan.take(800)}")
  }

  // qs13's serve must inherit qs12's DPP contract over the INCREMENTALLY
  // maintained index (append-extended cell dirs prune identically)
  test("qs13 incremental IVF: the appended index scan still carries dynamic pruning") {
    val plan = Registry.byName("qs13_incremental_ivf").run(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning on the incremental index scan:\n${plan.take(800)}")
  }

  test("qx10 bloom join: might_contain prefilter present, join stays a merge SMJ") {
    val plan = Registry.byName("qx10_bloom_join").run(spark, sf)
      .queryExecution.executedPlan.toString
    // phase-2 sketch re-embedded as a literal prefilter on the fact side
    assert(plan.contains("might_contain"),
      s"bloom prefilter missing from qx10 plan:\n${plan.take(600)}")
    // both sides corpus-scaled: the exact join must stay a shuffle SMJ
    assert(plan.contains("SortMergeJoin"), "qx10 join is not a SortMergeJoin")
    assert(!plan.contains("BroadcastExchange"),
      "corpus-sized frame broadcast in qx10")
  }

  test("qx14 BPE counts fold into one projection: no explode, merges as literals") {
    val plan = Registry.byName("qx14_bpe_packing").run(spark, sf)
      .queryExecution.executedPlan.toString
    // the per-doc tokenizer count is a higher-order lambda, not a
    // token-explode: a Generate here would mean a corpus-tokens-sized
    // intermediate plus a re-agg shuffle that the lambda avoids
    assert(!plan.contains("Generate"),
      s"unexpected explode in qx14 plan:\n${plan.take(600)}")
    // trained merges are driver-side literals inside the projection —
    // no join or broadcast ships the vocabulary
    assert(plan.contains("replace("), "merge-apply replace chain missing")
  }

  test("qt17 BPE apply: chained merge replaces stay in the projection, no extra join") {
    val plan = Registry.byName("qt17_bpe_apply").run(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("replace("), "merge-apply replace chain missing")
    // one explode (per-token rows) + one agg shuffle; the vocabulary
    // itself must never appear as a join side
    assert(!plan.contains("Join"), s"unexpected join in qt17 plan")
  }
}
