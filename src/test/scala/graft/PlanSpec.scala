package graft

/** Physical-plan assertions: the properties that decide whether a query
  * survives a 100 TB scale-up, pinned as tests so a refactor cannot silently
  * regress them. Each assertion names the property, not the full plan text:
  *
  *  - filters/projections reach the parquet scan (PushedFilters/ReadSchema)
  *  - small dimensions broadcast; nothing degenerates to nested-loop
  *  - aggregations are partial (map-side combine) before the shuffle
  *  - per-group ops shuffle exactly once on the group key
  *  - the hot path stays inside whole-stage codegen
  *
  * Run against sf0.001 so the suite stays fast. Plan shape is data-size
  * independent for everything asserted here except the broadcast choices:
  * genuinely-bounded sides (nation/region, probe sets, centroid tables)
  * carry explicit broadcast() hints, while sf-scaled sides (customer,
  * orders) carry NO hint — AQE broadcasts them at test scale (asserted) and
  * degrades to shuffle joins at 100× instead of OOMing an executor.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  private def countOf(hay: String, needle: String): Int =
    needle.r.findAllMatchIn(hay).length

  test("s3_scan_prune: filter + projection are pushed into the parquet scan") {
    val p = plan("s3_scan_prune")
    assert(p.contains("PushedFilters: [IsNotNull(l_extendedprice), GreaterThan(l_extendedprice,3000.0)]"), p)
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_extendedprice:double>"), p)
  }

  test("s11_partition_pruned_scan: the event_type predicate is a PartitionFilter") {
    // planning-time directory pruning (file index), NOT a pushed row filter
    // and NOT a post-scan Filter — the predicate must never open a
    // non-matching file at all
    val p = plan("s11_partition_pruned_scan")
    assert(p.contains("PartitionFilters: [isnotnull(event_type"), p)
    assert(p.contains("(event_type#"), p)
    assert(!p.contains("PushedFilters: [IsNotNull(event_type)"), p)
    // and the aggregation on top still partial-aggregates before its shuffle
    assert(p.contains("partial_count"), p)
  }

  test("p1_isin_filter: In-filter pushed to scan, two-column read schema") {
    val p = plan("p1_isin_filter")
    assert(p.contains("PushedFilters: [In(l_linenumber, [1,2])]"), p)
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int>"), p)
  }

  test("q1_agg: map-side partial aggregation before the single shuffle") {
    val p = plan("q1_agg")
    assert(p.contains("partial_sum"), p)
    assert(countOf(p, "Exchange hashpartitioning") == 1, p)
    // 16-column lineitem pruned to the 4 the aggregates need
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_returnflag:string"), p)
  }

  test("j1_broadcast_inner: dimension join broadcasts, fact side never shuffles for the join") {
    val p = plan("j1_broadcast_inner")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // only the post-join aggregation shuffles (on c_mktsegment)
    assert(countOf(p, "Exchange hashpartitioning") == 1, p)
  }

  test("q5_multijoin: dims broadcast; no nested-loop or cartesian anywhere") {
    val p = plan("q5_multijoin")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("j7b pure-interval join: custom range strategy, not nested-loop") {
    val p = plan("j7b_interval_join")
    assert(p.contains("BroadcastRangeJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("j6 as-of window: exactly one shuffle, on the partition key") {
    val p = plan("j6_asof_last_prev")
    assert(p.contains("Window"), p)
    assert(countOf(p, "Exchange hashpartitioning") == 1, p)
    assert(p.contains("hashpartitioning(user_id"), p)
  }

  test("o2 head-of-group: partial aggregate + one shuffle, no window") {
    // min(struct) buffers aren't hash-aggregable so Spark picks
    // SortAggregate — the scale property is map-side combine + a single
    // key shuffle, NOT a window (which would sort every group's full rows).
    val p = plan("o2_first_per_group")
    assert(p.contains("partial_min"), p)
    assert(countOf(p, "Exchange hashpartitioning") == 1, p)
    assert(!p.contains("Window"), p)
  }

  test("j2_left_m2one: no hard-broadcast of a table that scales with sf") {
    // orders grows with scale factor; a broadcast() hint would pin an
    // executor-OOM plan at 100×. The analyzed plan must carry NO broadcast
    // hint — whatever join AQE then picks is a size-based, scale-safe choice.
    val analyzed = SparkEntry.queries("j2_left_m2one")(spark, sf)
      .queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint"), analyzed)
  }

  test("j1_broadcast_inner: AQE (not a hint) picks the broadcast; no hint in plan") {
    val qe = SparkEntry.queries("j1_broadcast_inner")(spark, sf).queryExecution
    assert(!qe.analyzed.toString.contains("ResolvedHint"), qe.analyzed.toString)
    // at test scale the size estimate still yields a broadcast join — the
    // property asserted in the earlier j1 test — but it is now AQE's choice
  }

  test("j8 interpolation: windows are keyed — no single-partition exchange") {
    // an unpartitioned Window.orderBy would drag the whole events table
    // through ONE task; both interpolation variants must shard their sorts
    for (q <- Seq("j8_interpolate_asof", "j8b_interpolate_per_series")) {
      val p = plan(q)
      assert(!p.contains("Exchange SinglePartition"), s"$q:\n$p")
      assert(p.contains("Window"), s"$q:\n$p")
    }
  }

  test("dedup_embed_lsh: equi-joins only — no nested-loop/cartesian, bounded shuffles") {
    // the bucketed dedup path exists to avoid the all-pairs plan; a
    // regression to BroadcastNestedLoopJoin or CartesianProduct would be
    // O(N²) at scale regardless of how fast it looks at test size
    val p = plan("dedup_embed_lsh")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // band shuffle + candidate-pair distinct + two join sides — anything
    // beyond 8 hash exchanges means a plan branch stopped being reused
    assert(countOf(p, "Exchange hashpartitioning") <= 8, p)
  }

  test("a13b approx percentile: sketch partials merge map-side before the shuffle") {
    // the 100 TB percentile path must ship fixed-size sketches, not
    // per-group value buffers: partial_percentile_approx below the
    // exchange, the final merge above it
    val p = graft.queries.Extended
      .percentileApprox(graft.tables.Tables.lineitem(spark, sf))
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_percentile_approx"), p)
    assert(countOf(p, "Exchange hashpartitioning") == 1, p)
  }

  test("text_repetition: pure per-row HOF math — zero shuffles") {
    val p = plan("text_repetition")
    assert(!p.contains("Exchange"), p)
  }

  test("dedup_simhash_pairs: one band shuffle + pair distinct, no nested loop") {
    val p = plan("dedup_simhash_pairs")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(countOf(p, "Exchange hashpartitioning") <= 2, p)
  }

  test("w4_funnel: the time-range predicate rides the user equi-join, no nested loop") {
    val p = plan("w4_funnel")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("text_decontaminate: the benchmark probe is a LEFT SEMI join") {
    // the no-pair-explosion claim: the benchmark set is probed semi-style
    // (each training posting matches at most once), never expanded
    val p = plan("text_decontaminate")
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("dedup_canonical: canonical selection is one keyed window, no join-back") {
    // groupBy + join-back would re-compute the labeled-docs subtree twice;
    // the window shape scans documents exactly once
    val p = plan("dedup_canonical")
    assert(p.contains("Window"), p)
    assert(countOf(p, "documents\\.parquet") <= 1,
      "documents scanned more than once:\n" + p)
  }

  test("emb_dim_stats: moments aggregate partially before the one dim shuffle") {
    // the shuffle must carry per-partition (dim, moments) partials — 6
    // numbers per dim per map task — never the exploded (dim, x) rows
    val p = plan("emb_dim_stats")
    assert(p.contains("partial_sum"), p)
    assert(countOf(p, "Exchange hashpartitioning") == 1, p)
  }

  test("emb_covariance: one scan, one shuffle, no join — all moments in one pass") {
    // Σxy, Σx, Σy, n aggregate together from the per-row pair expansion; a
    // separate means table would re-scan and re-explode the corpus twice
    val p = plan("emb_covariance")
    assert(countOf(p, "Scan parquet") == 1, p)
    assert(countOf(p, "Exchange hashpartitioning") == 1, p)
    assert(!p.contains("Join"), p)
    assert(p.contains("partial_sum"), p)
  }

  test("emb_quantize_int8: per-dim scales broadcast; fact side never shuffles for the join") {
    val p = plan("emb_quantize_int8")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("text_unigram_logprob: the vocab LM broadcasts to the token stream") {
    // the corpus-sized token stream must join the |vocab|-bounded LM table
    // by broadcast — a shuffle join here would re-shuffle every token
    val p = plan("text_unigram_logprob")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("pack_sequences: the packing window is keyed, never a single global sort") {
    val p = plan("pack_sequences")
    assert(p.contains("Window"), p)
    assert(!p.contains("Exchange SinglePartition"),
      "global unpartitioned window:\n" + p)
    assert(p.contains("hashpartitioning(source"), p)
  }

  test("sample_reservoir: per-group top-k prunes map-side via WindowGroupLimit") {
    // rank-then-filter over the keyed window must not sort whole groups:
    // WindowGroupLimit(Partial) keeps each map partition's local top-100
    // before the lang shuffle, so shuffle volume is ≤ 100×partitions rows
    val p = plan("sample_reservoir")
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(p.contains("hashpartitioning(lang"), p)
  }

  test("sample_weighted: weighted top-k keeps the reservoir's WindowGroupLimit shape") {
    // the u/w priority changes the ORDER, not the plan: map-side local
    // top-25 before the per-language shuffle, never a global sort
    val p = plan("sample_weighted")
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(p.contains("hashpartitioning(lang"), p)
  }

  test("dedup_semantic: in-cluster pair join is equi-keyed on c_id, never a loop join") {
    // the operator's entire point vs dedup_embed_cosine: after the bounded
    // broadcast quantizer, pairwise work partitions by cluster — the pair
    // join must be hash/merge on c_id, and every reference to the
    // assignment table must read the materialized cache (quantize once),
    // not re-run the corpus × centroid pass
    val p = plan("dedup_semantic")
    assert(p.contains("InMemoryTableScan"), p)
    assert(p.contains("SortMergeJoin [c_id") || p.contains("ShuffledHashJoin [c_id")
      || p.contains("BroadcastHashJoin [c_id"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("w9_ema_decay: all 8 lags ride ONE user-keyed window sort") {
    // 8 lag() columns over the same (user_id; ts, event_id) spec must
    // collapse into a single Window operator after a single keyed exchange
    val p = plan("w9_ema_decay")
    assert(countOf(p, "Exchange hashpartitioning") == 1, p)
    assert(countOf(p, "\\bWindow\\b") == 1, p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("o5_pareto: bucket-local phase is keyed; only the survivor scan is global") {
    // phase 1's window partitions by the hash bucket (corpus-wide work
    // stays parallel); exactly one SinglePartition exchange may appear —
    // the global scan over the tiny survivor set
    val p = plan("o5_pareto")
    assert(p.contains("hashpartitioning(b#"), p)
    assert(countOf(p, "Exchange SinglePartition") == 1, p)
  }

  test("text_entropy: per-row HOF math — no key shuffle, no window") {
    // the entropy is computed entirely inside the row (sequence → filter →
    // aggregate); the only allowed exchange is the small-input fan-out
    val p = plan("text_entropy")
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(!p.contains("Window"), p)
  }

  test("q3b_bucketed_topk: bucketed join + same-key agg plan ZERO hash exchanges") {
    // The bucketed-layout contract in the bench/oracle path: both scans are
    // pre-co-partitioned by custkey (bucketBy(8) at write), the join is a
    // co-located SortMergeJoin, and the aggregation is on the same key — so
    // NO hash exchange appears anywhere in the plan. The only movement is
    // the constant-size TakeOrdered top-k gather.
    val p = plan("q3b_bucketed_topk")
    assert(p.contains("SortMergeJoin"), p)
    assert(countOf(p, "Exchange hashpartitioning") == 0,
      "bucketed layout shuffled anyway:\n" + p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q5b_bucketed_multijoin: the customer⋈orders edge joins with zero exchanges") {
    // the layout composes through q5's deeper join tree: the bucketed edge
    // is a co-located SortMergeJoin (no exchange under either bucketed
    // scan), lineitem shuffles on its join key as it must, dims broadcast
    val p = plan("q5b_bucketed_multijoin")
    assert(p.contains("SortMergeJoin"), p)
    assert(countOf(p, "BroadcastHashJoin") >= 2, p)
    // exchanges: lineitem's join shuffle(s) + the final n_name agg — but
    // NONE on custkey (the bucketed edge's key)
    assert(!p.contains("Exchange hashpartitioning(o_custkey") &&
      !p.contains("Exchange hashpartitioning(c_custkey"),
      "bucketed edge shuffled anyway:\n" + p)
  }

  test("a15_corr: all five moments partial-aggregate in one pass, one shuffle") {
    val p = plan("a15_corr")
    assert(p.contains("partial_sum"), p)
    assert(countOf(p, "Exchange hashpartitioning") == 1, p)
  }

  test("w6_transitions: the lead window is user-keyed, the norm window type-keyed") {
    // both windows partition on a key — the corpus pass shuffles once on
    // user_id, the probability pass on the bounded |types|² matrix; no
    // global window anywhere
    val p = plan("w6_transitions")
    assert(countOf(p, "Exchange SinglePartition") == 0, p)
    assert(p.contains("lead("), p)
  }

  test("text_bm25_topk: probe metadata broadcasts onto postings; top-5 is a keyed window") {
    // the corpus posting table must never shuffle for the probe join (the
    // query-side dim table broadcasts), and the per-probe top-5 ranks in a
    // window KEYED by q_doc — WindowGroupLimit prunes map-side, no global
    // sort of the scored candidates
    val p = plan("text_bm25_topk")
    assert(countOf(p, "BroadcastHashJoin") >= 2, p)
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("hashpartitioning(q_doc"), p)
  }

  test("pipeline_hybrid_retrieval: both corpus passes probe-broadcast; fusion keyed") {
    // the composed retrieval stack touches the corpus exactly twice — the
    // posting-table probe join (lexical leg) and the 8-byte code scan
    // (dense leg) — and BOTH must join against BROADCAST probe-side dims
    // (the corpus never shuffles for a probe). Since r13 the two corpus
    // passes live in the session-shared legs BUILD (the query plan reads
    // the materialized legs as a LogicalRDD leaf), so the corpus-pass
    // contract is asserted on the build plan and the query plan pins the
    // fusion shape: probe-keyed ranking windows, never a global sort.
    val legs = graft.queries.Similarity.hybridLegsBuild(spark, sf)
      .queryExecution.executedPlan.toString
    assert(countOf(legs, "BroadcastHashJoin") >= 3, legs)
    assert(legs.contains("hashpartitioning(q_doc"), legs)
    val p = plan("pipeline_hybrid_retrieval")
    assert(p.contains("Scan ExistingRDD"), p) // the materialized legs leaf
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("hashpartitioning(q_id"), p)
  }

  test("text_chunk_windows: pure per-row chunking — zero shuffles") {
    // chunking must run at scan speed: filter + offset explode + slice +
    // hash are all per-row; any exchange would mean a refactor broke the
    // map-only shape
    val p = plan("text_chunk_windows")
    assert(!p.contains("Exchange"), p)
  }

  test("sim_pq_adc: codebook and LUT broadcast; every join equi-keyed; ADC window keyed") {
    // PQ's scale contract: the 8×16×8-cell codebook and the per-probe
    // lookup table broadcast (the corpus never shuffles for either), every
    // join is equi-keyed (no nested loop anywhere — distances are grouped
    // sums, not pairwise expressions), and the top-5 ranks in a window
    // keyed by the probe id
    val p = plan("sim_pq_adc")
    // since r13 the code table and codebook read back as materialized
    // LogicalRDD leaves, so the in-plan broadcasts are the LUT build and
    // the ADC scan's LUT join (the codebook's own broadcast sits in the
    // shared encode build, pinned by the zero-exchange assertion below)
    assert(countOf(p, "BroadcastHashJoin") >= 2, p)
    assert(p.contains("Scan ExistingRDD"), p) // the 8-byte code-table leaf
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p) // the corpus never shuffles for a join
    assert(p.contains("hashpartitioning(q_id"), p)
  }

  test("pq code-table build: zero-shuffle argmin encode (r13 array kernel)") {
    // the reshaped PQ assignment must stay a broadcast-join + per-row fold:
    // no aggregation over an N×16 explosion, no argmin window, and the only
    // exchange anywhere is the 1024-group codebook mean update inside the
    // training parent — the corpus itself never shuffles to be encoded
    val p = graft.queries.Similarity.pqCodesBuild(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p) // the 8-row (sub → cands) dim
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("Window"), p) // argmin is a per-row fold, not a window
    // exchanges: only codebook-bounded ones (the training mean update and
    // the candidate-directory rollup) — never hashpartitioning(vec_id
    assert(!p.contains("hashpartitioning(vec_id"), p)
  }

  test("w7_attribution: one user-keyed corpus window, no global funnel") {
    // the attribution pass shuffles once on user_id (the shared temporal
    // key); the channel aggregate is |types|-bounded; nothing funnels the
    // corpus through a single partition
    val p = plan("w7_attribution")
    assert(p.contains("hashpartitioning(user_id"), p)
    assert(countOf(p, "Exchange SinglePartition") == 0, p)
  }

  test("dedup_exact_substring: span df via keyed window, exactly three exchanges") {
    // the rewrite's contract: map-side (doc, hash) collapse -> df window on
    // hash -> per-doc fold. Three keyed hash exchanges, no join, and the
    // raw span stream crosses the wire once (partial-aggregated).
    val p = plan("dedup_exact_substring")
    assert(countOf(p, "Exchange hashpartitioning") == 3,
      s"expected exactly 3 keyed exchanges:\n$p")
    assert(countOf(p, "Exchange SinglePartition") == 0, p)
    assert(!p.contains("Join"), "the df join-back should be gone:\n" + p)
  }

  test("emb_pca_topk: the projection pass is scan -> project, zero shuffles") {
    // training happens in the two bounded-output passes (covariance,
    // means) and on the driver; the returned plan — the pass that touches
    // every row at 100 TB — must be a pure per-row projection
    val p = plan("emb_pca_topk")
    assert(countOf(p, "Exchange") == 0, s"projection pass shuffles:\n$p")
  }

  test("graph_pagerank: every iteration reads the cached degree-annotated edges") {
    // the iterative contract: the edge list joins degrees ONCE and is
    // cached; all 3 iterations reuse the in-memory copy instead of
    // re-scanning and re-aggregating the pair frame. An exact exchange
    // count would be brittle (AQE broadcasts the tiny rank side at spec
    // scale and nests adaptive subplans), but losing the cache — the
    // regression that triples the per-iteration work — is visible as
    // missing InMemoryTableScans.
    val p = plan("graph_pagerank")
    // the materialized edge frame reads back as a LogicalRDD leaf since
    // r13 (truncated shared-cache view) — one ExistingRDD scan per
    // iteration replaces the InMemoryTableScans persist() used to show
    assert(countOf(p, "Scan ExistingRDD") >= 3,
      s"expected >=3 materialized-edge reads (one per iteration):\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("text_shingle_knn: probe shingles broadcast; top-5 is a probe-keyed window") {
    // the corpus posting side must never shuffle for the candidate join —
    // the probe side (10 docs' shingles) broadcasts onto it — and the
    // final top-5 prunes map-side inside a q_doc-keyed window
    val p = plan("text_shingle_knn")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("hashpartitioning(q_doc"), p)
  }

  test("text_quality_probe: one corpus scan, moments partial-aggregate before one shuffle") {
    // the whole training pass is scan → map-side moment partials → one
    // |sources|-keyed exchange → scalar Cramer solve; no join, no window,
    // no second pass over the corpus
    val p = plan("text_quality_probe")
    assert(p.contains("partial_sum"), p)
    assert(countOf(p, "Exchange hashpartitioning") == 1, p)
    assert(!p.contains("Join"), p)
    assert(countOf(p, "FileScan parquet") == 1, p)
  }

  test("sample_shard_assign: the packing window is language-keyed, never global") {
    val p = plan("sample_shard_assign")
    assert(p.contains("hashpartitioning(lang"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("a21_hll_partial_merge: sketches build map-side and merge keyed") {
    // daily sketches partial-aggregate before their (week, day) shuffle —
    // at 100 TB the raw user ids never cross the wire twice; the weekly
    // union merges fixed-size sketch binaries, keyed by week
    val p = plan("a21_hll_partial_merge")
    assert(p.contains("partial_hll_sketch_agg"), p)
    assert(p.contains("hll_union_agg"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("plan sweep: NO query plans a cartesian/nested-loop join except declared baselines") {
    // the whole-suite guard: any new query that silently degenerates to an
    // all-pairs join fails CI here, not in a 100 TB run. The allowlist
    // names the queries where a broadcast nested loop is the documented
    // intent (brute-force baselines against which the bucketed variants
    // are justified, and the tiny-probe top-k).
    val intentional = Set(
      "sim_cosine_topk", // broadcast 10-probe brute-force baseline
      "sim_mips_topk", // same broadcast 10-probe baseline, dot-product metric
      "sim_knn_label", // composes sim_cosine_topk
      "sim_rrf_fusion", // dense leg composes sim_cosine_topk; fusion joins are equi-key
      "dedup_embed_cosine", // the recall-100% small-N baseline
      // quantizers: every vector × a BOUNDED broadcast centroid table
      // (8-16 rows, fixture or Lloyd-trained) — linear work, the canonical
      // IVF/k-means shape
      "sim_ivf_topk", "sim_kmeans_update", "sim_ivf_trained",
      // SemDeDup's quantizer: every vector × the same BOUNDED broadcast
      // 16-row centroid table; the in-cluster pair join it feeds is
      // equi-keyed on c_id
      "dedup_semantic",
      "sim_ivf_recall", // composes the two baselines above; the join it ADDS is equi-key
      // the 16-seed coarse scoring + the broadcast-probe brute-force
      // baseline restricted to the eligible label population — both
      // declared classes; the candidate join is equi-keyed on c_id
      "sim_ivf_filtered", "sim_ivf_filtered_sweep",
      // the exact-L2 ground truth is the same broadcast 10-probe
      // brute-force baseline shape as sim_cosine_topk; the ADC side it
      // audits is all equi-joins
      "sim_pq_recall",
      // same exact-L2 broadcast-probe ground truth as sim_pq_recall; the
      // re-rank leg it audits is all equi-joins
      "sim_pq_rerank_recall",
      // coarse quantizer: every vector × the BOUNDED broadcast 16-seed
      // table (the canonical IVF shape); candidate/ADC/re-rank joins are
      // all equi-keyed
      "sim_ivfpq_topk",
      "sim_ivfpq_trained", // same shape over the Lloyd-trained coarse cells
      "sim_ivfpq_recall", // composes the exact baseline + sim_ivfpq_topk
      // same 16-seed coarse scoring + exact baseline as sim_ivfpq_recall,
      // plus a 1-row scalar(corpus size) annotate for the scanned fraction
      "sim_ivfpq_probe_sweep",
      // the probe sweep's shape with a second bounded explode (depth legs
      // over the ≤200-rank frame); the same 1-row scalar(corpus size)
      // annotate is the only nested loop
      "sim_ivfpq_grid",
      // same 16-seed coarse scoring; the residual chain's joins (cell
      // centroid gather, residual codebook, per-cell LUT) are all
      // equi-keyed on bounded broadcast dims
      "sim_ivfpq_residual", "sim_ivfpq_residual_recall",
      // both legs of the raw-vs-residual audit, same shapes as above plus
      // the exact-baseline broadcast-probe class
      "sim_ivfpq_code_gain",
      // three 1-row scalar(corpus size) annotates (one per audit rung) —
      // the annotate-with-constant shape; the train/encode joins are all
      // equi-keyed on bounded broadcast codebooks
      "sim_opq_code_gain",
      // the exact-L2 broadcast-probe ground truth (sim_pq_recall's
      // declared baseline class); both ADC legs are equi-keyed
      "sim_opq_recall",
      // four 1-row scalar(corpus size) annotates (one per Lloyd round) —
      // the annotate-with-constant shape; every training join is
      // equi-keyed on the 1024-row broadcast codebook
      "sim_pq_train_curve",
      // the 16-seed coarse scoring + exact broadcast-probe baseline
      // (sim_ivfpq_code_gain's class); candidate/ADC joins are equi-keyed
      "sim_opq_ivfpq_gain",
      // the exact broadcast-probe baseline again; both whole-corpus ADC
      // legs and the re-rank gathers are equi-keyed
      "sim_opq_rerank_gain",
      // two 1-row scalar(corpus size) annotates — the annotate-with-
      // constant shape; the md5 seed pick is TakeOrdered, training joins
      // are equi-keyed on broadcast codebooks
      "sim_pq_seed_audit",
      // sim_mmr_topk's broadcast-probe shortlist build; the three greedy
      // λ legs run keyed per probe over the same ≤20 rows
      "sim_mmr_lambda_sweep",
      // declared brute-force audit: probe×corpus broadcast pairs scored at
      // four prefix dims in one pass — the same baseline class as
      // sim_pq_recall's exact leg
      "emb_matryoshka_recall",
      // same broadcast-probe brute-force class, fixed radius instead of
      // top-k
      "sim_range_search",
      // same broadcast-probe shortlist build; the greedy MMR kernel runs
      // keyed per probe over ≤20 rows
      "sim_mmr_topk",
      // 1-row scalar(n_docs) × |vocab|-row df table — constant-size;
      // the fact-side tf join is broadcast-hash
      "text_tfidf_topk",
      // 1-row scalar(total) × the token histogram / vocab LM — the
      // broadcast side is exactly one row, so the "nested loop" is a
      // linear annotate-with-constant pass (same shape as tfidf's n_docs)
      "text_heavy_hitters", "text_unigram_logprob",
      // composes text_tfidf_topk (the 1-row n_docs annotate) and adds its
      // own 1-row (n_docs, avgdl) scalar × the ≤3·|probes| query-term
      // table — both constant-size; the posting-side join is broadcast-hash
      "text_bm25_topk",
      // the composed retrieval stack inherits text_bm25_topk's lexical leg
      // and with it the same two constant-size scalar annotates; the dense
      // leg and the fusion add no nested-loop shapes
      "pipeline_hybrid_retrieval",
      // the fusion audit and the k sweep compose the retrieval stack's
      // legs (bm25's scalar annotates) with the exact broadcast-probe
      // ground truth (sim_opq_recall's declared baseline class)
      "pipeline_hybrid_gain", "pipeline_hybrid_ksweep",
      "pipeline_hybrid_depth_curve",
      // the graded-metrics audit composes the same legs (bm25's scalar
      // annotates) with the exact broadcast-probe ground truth; its own
      // additions are one broadcast-hash join + a 3-group agg
      "pipeline_retrieval_metrics",
      // sim_pq_train_curve's four scalar(corpus size) annotates over the
      // rotated coordinates; every training join is equi-keyed on the
      // 1024-row broadcast codebook
      "sim_opq_train_curve",
      // the 16-seed coarse scoring + two 1-row scalar annotates (corpus
      // size, probe count) over the 4-row cost table
      "sim_ivfpq_scan_cost",
      // 1-row tercile-cutoff scalar × the per-doc score table
      "text_ppl_bucket",
      // 1-row corpus-total scalar × the 3-row per-w counts — the same
      // annotate-with-constant shape
      "text_winnowing_sweep",
      // 1-row (tr, tt) totals scalar × the B-bounded bucket table — the
      // same annotate-with-constant shape as text_unigram_logprob
      "text_dsir_weights",
      // 1-row (lo, hi) extrema scalar × the fact rows — the same
      // annotate-with-constant shape as text_heavy_hitters
      "a17_histogram",
      // 1-row scalar(total) × the 10 surviving top-k rows — constant-size
      "diag_key_skew",
      // 1-row scalar(corpus total) × the bounded QI-group census — the
      // same annotate-with-constant shape
      "diag_k_anonymity",
      // 1-row scalar(n_drifted_dims) × the dim-bounded per-dim frame —
      // the same annotate-with-constant shape as text_heavy_hitters
      "emb_drift",
      // 1-row scalar(straddle counts) × the 3-row per-split stats — the
      // same annotate-with-constant shape; the audit joins themselves are
      // equi-keyed broadcasts of the bounded pair frame
      "pipeline_split_leakage_safe",
      // 1-row scalar(max day) × the exploded (user, report-day) pairs —
      // the same annotate-with-constant horizon clamp as a17's extrema
      "w12_rolling_active",
      // 1-row scalar(total, n_sources) × the |sources|-row share table —
      // the same annotate-with-constant shape as text_tfidf's n_docs
      "sample_mix_schedule",
      // the NN-Descent convergence audit: its exact ground-truth leg is
      // the declared broadcast-probe brute-force baseline class (bounded
      // md5 10% sample × corpus), plus a 1-row scalar(n_exact) annotate;
      // the graph build itself is all equi-joins
      "sim_knn_graph_curve",
      // the incremental-maintenance metric's overall row: three 1-row
      // scalar aggregates annotated together (the annotate-with-constant
      // shape); the insert/repair joins are all equi-keyed
      "sim_knn_graph_incremental",
      // the beam-sweep's exact ground-truth leg is the declared
      // broadcast-probe brute-force baseline class; the walks themselves
      // are all equi-joins
      "sim_knn_graph_search_sweep",
      // the serve-path comparison shares the sweep's exact ground-truth
      // leg (broadcast-probe baseline); both walks are all equi-joins
      "sim_knn_graph_serve_maintained",
      // composes sim_ivfpq_topk's declared shapes (16-seed coarse scoring
      // + the bounded per-probe LUT broadcast cross) over the tombstoned
      // and purged candidate sets; every join the serve comparison ADDS
      // (tombstone flag, cell directory, leg agreement) is equi-keyed
      "sim_ivfpq_forget_serve",
      // the int8 shortlist leg is every vector × the broadcast 10-probe
      // table (the sim_pq_recall exact-baseline class), plus the same
      // exact ground-truth leg
      "sim_sq8_recall",
      // the Hamming shortlist leg is the same broadcast 10-probe class
      // (2 XORs + 2 popcounts per pair); re-rank gather is equi-keyed
      "sim_binary_rerank",
      // the ladder composes the three rungs above, inheriting their
      // declared broadcast-probe legs
      "sim_quant_ladder",
      // the exact ground-truth leg is the declared broadcast-probe class,
      // and the hier strategy's upper-layer scan (probes × the md5-sampled
      // N/8 layer) is the operator itself — the HNSW entry descent
      // collapsed to one bounded layer; all three walks are equi-joins
      "sim_knn_graph_entry",
      // two 1-row scalars (distinct train bigrams D, train vocab V) ×
      // the held-half bigram stream — the annotate-with-constant shape;
      // the three LM joins are broadcast-hash on vocab-bounded tables
      "text_kn_heldout",
      // the assignment pass is every vector × the BOUNDED broadcast
      // 8-center table (the canonical IVF/k-means quantizer shape); the
      // greedy selection's per-step pass is the same shape with ONE row
      "sample_kcenter_census", "sample_kcenter",
      // two of the same bounded 8-center assignment passes, one per scheme
      "sim_ivf_kcenter_balance")
    val skipped = SparkEntry.queries.keys.filter(_.startsWith("stream_")) // unstartable plans
    for ((name, fn) <- SparkEntry.queries
         if !intentional(name) && !skipped.exists(_ == name)) {
      val p = fn(spark, sf).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name plans a CartesianProduct:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$name plans a BroadcastNestedLoopJoin:\n$p")
    }
  }

  test("plan sweep: NO query funnels unbounded rows through a SinglePartition exchange") {
    // the heavy-hitters class of scale-killer: an unpartitioned window (or
    // global sort step) that drags a corpus-sized intermediate through ONE
    // task. An `Exchange SinglePartition` is legitimate only when the rows
    // entering it are bounded:
    //  - its child is a KEYLESS partial aggregate (scalar agg: one row per
    //    map partition crosses the wire), or
    //  - the query is declared below because the exchanged frame is a
    //    provably tiny post-aggregation/top-k result.
    import org.apache.spark.sql.execution.{SparkPlan, WholeStageCodegenExec, InputAdapter}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition

    val tinyFrame = Set(
      "sample_mix_weights", // window over the |langs|-row post-agg frame
      "sample_temperature", // same |langs|-row post-agg window
      "pipeline_train_mix", // same |sources|-row post-agg mix window
      "pipeline_train_mix_gated", // same |sources|-row post-agg mix window
                                  // (the gated twin shares the mix tail)
      "pipeline_mix_packing", // same |sources|-row threshold window; the
                              // packing cumsum itself is keyed by source
      "pipeline_mix_decontaminated", // same |sources|-row mix window; the
                                     // contam probe itself is a broadcast
                                     // semi join, never funneled
      "pipeline_mix_incremental", // same |sources|-row mix window over the
                                  // merged bounded histogram
      "sample_balanced_pairs", // same |sources|-row source-index window
      "diag_key_skew",      // window over the 10-row per-partition top-k
      "text_top_tokens",    // rank window over the 100-row TakeOrdered result
      "o5_pareto",          // global scan over the bucket-local skyline
                            // survivors only (206 of 15 000 rows at sf0.01)
      "text_bpe_pairs"      // rank window over the 30-row TakeOrdered result
    )

    def unAqe(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => unAqe(a.executedPlan)
      case q: QueryStageExec        => unAqe(q.plan)
      case other                    => other
    }
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case w: WholeStageCodegenExec => unwrap(w.child)
      case i: InputAdapter          => unwrap(i.child)
      case other                    => other
    }
    def scalarPartial(p: SparkPlan): Boolean = unwrap(p) match {
      case h: HashAggregateExec       => h.groupingExpressions.isEmpty
      case o: ObjectHashAggregateExec => o.groupingExpressions.isEmpty
      case s: SortAggregateExec       => s.groupingExpressions.isEmpty
      case _                          => false
    }
    def offenders(p: SparkPlan): Seq[SparkPlan] = {
      val here = unAqe(p) match {
        case e: ShuffleExchangeExec
            if e.outputPartitioning == SinglePartition && !scalarPartial(unAqe(e.child)) =>
          Seq(e)
        case _ => Nil
      }
      here ++ unAqe(p).children.flatMap(offenders)
    }

    val skipped = SparkEntry.queries.keys.filter(_.startsWith("stream_")) // unstartable plans
    for ((name, fn) <- SparkEntry.queries
         if !tinyFrame(name) && !skipped.exists(_ == name)) {
      val plan = fn(spark, sf).queryExecution.executedPlan
      val bad = offenders(plan)
      if (bad.nonEmpty)
        fail(s"$name funnels unbounded rows through Exchange SinglePartition:\n${bad.head}\nfull plan:\n$plan")
    }
  }

  test("f10 projection pipeline: whole-stage codegen, zero shuffles") {
    val p = plan("f10_round_cast")
    // "*(1)" is the whole-stage-codegen stage marker in executedPlan output
    assert(p.contains("*(1)"), p)
    assert(!p.contains("Exchange"), p)
  }

  test("o3 top-k: per-partition TakeOrderedAndProject, not a global-window sort") {
    // rank-then-filter over a no-partition window would sort EVERY row in
    // one task; orderBy+limit keeps the reduction per-partition and the
    // window only ever sees the 100 surviving rows.
    val p = plan("o3_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("a12 rollup: one Expand + one shuffle computes all three granularities") {
    // ROLLUP must not union three re-scans of the fact table: Spark expands
    // each row to its grouping sets before a single partial-agg + shuffle.
    val p = plan("a12_rollup")
    assert(p.contains("Expand"), p)
    assert(countOf(p, "Exchange hashpartitioning") == 1, p)
    assert(p.contains("partial_"), p)
  }

  test("text_top_tokens: global top-k never globally sorts") {
    val p = plan("text_top_tokens")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("dedup_exact: partial aggregation handles duplicate collapse map-side") {
    val p = plan("dedup_exact")
    assert(p.contains("HashAggregate"), p)
    assert(countOf(p, "Exchange hashpartitioning") <= 2, p)
  }
}
