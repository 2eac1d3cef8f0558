"""Physical-plan regression tests — the scale story, checked.

These assert the plan SHAPES that make the engine viable at 100 TB:
filters/projections reaching the parquet scan, small dims broadcast,
top-k as TakeOrdered, whole-stage codegen in the hot path. A change
that silently degrades one of these (e.g. a cast blocking pushdown)
fails here long before a benchmark would catch it.
"""

from __future__ import annotations

from gramene_mongodb_spark.catalog import REGISTRY


def plan_of(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].fn(spark, sf_dir)
    df.collect()  # AQE finalizes (and codegen-annotates) the plan on execution
    return df._jdf.queryExecution().executedPlan().toString()


def test_q01_filter_pushed_to_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q01_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan  # inside PushedFilters
    # column pruning: only the 7 needed columns in ReadSchema
    assert "l_comment" not in plan
    assert "*(" in plan  # WholeStageCodegen stage markers


def test_q01_partial_aggregation(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q01_pricing_summary")
    # map-side combine before the exchange (partial_ functions)
    assert "partial_sum" in plan or "partial_avg" in plan


def test_q05_broadcasts_dims(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q05_regional_revenue")
    assert plan.count("BroadcastHashJoin") >= 3  # supplier, nation, region
    assert "EqualTo(r_name,ASIA)" in plan  # region filter pushed to scan


def test_j1_enrich_never_shuffles_facts(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "j1_broadcast_enrich")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_topk_is_take_ordered_not_full_sort(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "o1_topk_lineitems")
    assert "TakeOrderedAndProject" in plan


def test_semi_join_stays_semi(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "j10_semi_join")
    assert "LeftSemi" in plan
    # the totalprice filter is pushed into the orders scan
    assert "GreaterThan(o_totalprice,300000" in plan


def test_binning_is_pure_arithmetic(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "k10_bin_totalprice")
    assert "BatchEvalPython" not in plan  # no Python in the hot path
    assert "Exchange" in plan  # exactly the one agg shuffle


def test_text_ops_have_no_python_udfs(spark, sf_dir):
    for name in ("x_text_stats", "x_text_quality", "x_lang_id", "x_fingerprint"):
        plan = plan_of(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_cosine_topk_broadcasts_queries(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "x_cosine_topk")
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q04_exists_is_one_semi_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q04_priority_exists")
    assert "LeftSemi" in plan            # EXISTS decorrelated, not re-scanned
    # lineitem side pruned to the two columns the predicate needs
    assert "l_extendedprice" not in plan


def test_q16_not_in_is_anti_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q16_supplier_variety")
    assert "LeftAnti" in plan
    assert "partial_count(distinct" in plan  # map-side partial distinct


def test_q17_decorrelates_to_single_pass(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q17_small_qty_revenue")
    assert "partial_avg" in plan         # per-part avg combined map-side
    # lineitem is scanned exactly twice (fact + avg), never per-row;
    # count on the pre-AQE plan (the adaptive plan string repeats
    # reused subtrees)
    df = REGISTRY["q17_small_qty_revenue"].fn(spark, sf_dir)
    static = df._jdf.queryExecution().sparkPlan().toString()
    assert static.count("Scan parquet") == 3


def test_embed_lsh_candidates_are_equi_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "x_embed_near_lsh")
    # banded candidates join on (band, bucket) — no cartesian product
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan  # signature bits are JVM-side


def test_q06_pure_scan_aggregate(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q06_forecast_revenue")
    # every predicate sargable and pushed into the parquet scan (the
    # PushedFilters list is truncated in toString, so check its head
    # plus the full Filter condition text)
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    assert ">= 1996-01-01 00:00:00)" in plan
    assert "< 24.0)" in plan
    assert "partial_sum" in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_q07_dims_broadcast_before_fact_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q07_nation_volume")
    # supplier/nation/customer/nation all broadcast; facts never cross
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_q10_topk_is_take_ordered(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q10_returned_revenue")
    assert "TakeOrderedAndProject" in plan
    # returnflag filter pushed to the lineitem scan
    assert "EqualTo(l_returnflag,R)" in plan


def test_q18_preaggregates_before_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q18_large_orders")
    # lineitem collapses to (orderkey, qty) BEFORE joining orders
    assert "partial_sum" in plan
    assert "BroadcastHashJoin" in plan
    # only the two agg/join columns of lineitem are read
    assert "l_extendedprice" not in plan


def test_q19_disjunction_is_hash_join_not_nested_loop(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q19_disjunctive_revenue")
    # Catalyst extracts the common partkey equi-key from the OR-of-ANDs
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q21_reuses_single_lineitem_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q21_waiting_supplier")
    # the per-(order,supplier) flags exchange feeds both aggregation
    # levels — EXISTS/NOT-EXISTS collapse to one scan, not three
    assert "ReusedExchange" in plan
    assert "BatchEvalPython" not in plan


def test_q22_anti_join_with_broadcast_scalar(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q22_idle_rich_customers")
    assert "LeftAnti" in plan
    # recent-orders side pre-filtered at the scan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_corpus_clean_pipeline_is_one_shuffle(spark, sf_dir):
    """The flagship cleaning pipeline: dedup window is the ONLY exchange;
    scoring/filter/sample all pipeline map-side; no Python in the plan."""
    plan = plan_of(spark, sf_dir, "pipeline_corpus_clean")
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange") == 1
    assert final.count("FileScan") == 1          # documents scanned once
    assert "BatchEvalPython" not in final and "ArrowEvalPython" not in final


def test_contamination_broadcasts_benchmark_grams(spark, sf_dir):
    # the benchmark gram set must be the broadcast side — the corpus probe
    # is a map-side hash join, never a corpus shuffle on shingle
    plan = plan_of(spark, sf_dir, "x_contamination")
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_tfidf_vocab_join_not_force_broadcast(spark, sf_dir):
    """The term→df join must carry NO broadcast hint: at web scale the
    distinct-term table runs to billions of rows and a forced broadcast
    OOMs every executor. AQE still picks broadcast at runtime when the
    vocab is genuinely small — that's allowed; a mandatory hint is not.
    The only hinted broadcast is the one-row N cross join."""
    df = REGISTRY["x_tfidf_topk"].fn(spark, sf_dir)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    inner_joins = [l for l in opt.splitlines() if "Join Inner" in l]
    assert inner_joins and all("Hint" not in l for l in inner_joins)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_mixture_sample_is_broadcast_filter(spark, sf_dir):
    # stratum rates broadcast back onto the corpus; the keep test is a
    # map-side filter (no corpus shuffle anywhere)
    plan = plan_of(spark, sf_dir, "x_mixture_sample")
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_forward_asof_single_shuffle(spark, sf_dir):
    # union + one window: exactly one exchange keyed on user_id feeds the
    # sort/window; no pair-blowup join anywhere
    plan = plan_of(spark, sf_dir, "x_asof_next_click")
    assert "SortMergeJoin" not in plan and "NestedLoop" not in plan
    assert plan.count("Window") >= 1


def test_url_canonical_is_map_only(spark, sf_dir):
    # canonicalization is pure projection: no shuffle, no Python anywhere
    plan = plan_of(spark, sf_dir, "x_url_canonical")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_domain_quota_single_shuffle_no_python(spark, sf_dir):
    # one exchange on the stratum feeds the rank window; cap applied there
    plan = plan_of(spark, sf_dir, "x_domain_quota")
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange") == 1
    assert "BatchEvalPython" not in final


def test_span_dedup_two_shuffles_no_python(spark, sf_dir):
    # one exchange keyed by span text (winners) + one keyed by doc
    # (reassembly/totals); everything else map-side, no Python anywhere
    plan = plan_of(spark, sf_dir, "x_span_dedup")
    final = plan.split("== Initial Plan ==")[0]
    assert "BatchEvalPython" not in final and "ArrowEvalPython" not in final
    assert final.count("Exchange") <= 4  # span win + totals/kept aggs + join


def test_round6_entries_stay_jvm_side(spark, sf_dir):
    """The new curation entries are pure DataFrame plans — no Python
    evaluation anywhere (the 100-TB hot-path contract)."""
    for name in (
        "x_token_budget",
        "x_cluster_split",
        "x_inverted_index",
        "x_top_ngrams",
        "x_embed_quantize",
    ):
        plan = plan_of(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_embed_quantize_broadcasts_range_row(spark, sf_dir):
    """The d-row min/max stats collapse to ONE broadcast row; the corpus
    side is never shuffled for the encode (map-side transform)."""
    plan = plan_of(spark, sf_dir, "x_embed_quantize")
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_top_ngrams_is_take_ordered(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "x_top_ngrams")
    assert "TakeOrderedAndProject" in plan


def test_analytics_entries_stay_jvm_side(spark, sf_dir):
    """Funnel/LM/SCD2/cohort/fixed-sample are pure DataFrame plans."""
    for name in (
        "x_funnel_stages",
        "x_lm_score",
        "x_scd2_history",
        "x_cohort_retention",
        "x_fixed_sample",
    ):
        plan = plan_of(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_fixed_sample_is_take_ordered(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "x_fixed_sample")
    assert "TakeOrderedAndProject" in plan


def test_mad_outliers_single_exchange(spark, sf_dir):
    """All four window computations (count, two ranked picks, spread)
    share ONE hash exchange on the group key — the second ranked pick
    re-sorts within partitions but must not re-shuffle. Asserted on the
    pre-execution plan: AQE's post-run stage dump repeats the exchange
    at stage boundaries, which would double-count it."""
    df = REGISTRY["x_mad_outliers"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "BatchEvalPython" not in plan


def test_cdc_replay_prunes_top1_before_exchange(spark, sf_dir):
    """Latest-change-wins executes as WindowGroupLimit — per-partition
    top-1 pruning runs map-side before the single key shuffle, so the
    full log never crosses the wire."""
    plan = plan_of(spark, sf_dir, "x_cdc_replay")
    assert "WindowGroupLimit" in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # partial + final limit


def test_adaptive_filter_threshold_broadcasts(spark, sf_dir):
    """The 1-row corpus-quantile threshold reaches the filter via a
    broadcast — the corpus side is never shuffled for the comparison."""
    plan = plan_of(spark, sf_dir, "x_adaptive_filter")
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan


def test_heavy_hitters_recount_is_broadcast_semi(spark, sf_dir):
    """The exact recount probes the tiny candidate set via broadcast
    join with map-side partial counts — the full-cardinality token
    table is never shuffled."""
    plan = plan_of(spark, sf_dir, "x_heavy_hitters")
    assert "BroadcastHashJoin" in plan
    assert "partial_count" in plan


def test_priority_sample_is_take_ordered(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "x_priority_sample")
    assert "TakeOrderedAndProject" in plan


def test_graph_and_fusion_entries_stay_jvm_side(spark, sf_dir):
    """PageRank, triangle census, components, RRF fusion, agg merge:
    pure DataFrame plans, zero Python evaluation."""
    for name in (
        "x_pagerank_hosts",
        "x_triangle_count",
        "x_graph_components",
        "x_rrf_hybrid",
        "x_agg_merge",
    ):
        plan = plan_of(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_edit_distance_no_cartesian(spark, sf_dir):
    """Ed-Join candidate generation must be an equi-join on the gram
    (+post-filters), never a cartesian/nested-loop pair explosion, and
    the whole path stays JVM-side."""
    plan = plan_of(spark, sf_dir, "x_edit_distance_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_zorder_key_is_pure_arithmetic(spark, sf_dir):
    """The Morton key is shift/mask codegen: no Python, no join, exactly
    the one aggregation exchange."""
    plan = plan_of(spark, sf_dir, "x_zorder_layout")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "Join" not in plan
    assert "partial_count" in plan  # map-side combine before the agg


def test_bfs_frontier_never_moves_edges(spark, sf_dir):
    """BFS rounds join the (small) frontier INTO the pre-partitioned
    edge table: the executed plan of the final result must not re-sort
    the edge side per round — frontier joins appear as hash joins, not
    SortMergeJoin cascades over the edge scan."""
    plan = plan_of(spark, sf_dir, "x_bfs_distance")
    assert "BatchEvalPython" not in plan


def test_entity_resolution_blocking_is_equi_join(spark, sf_dir):
    """Blocking must reach the pair space through the block-key
    equi-join — no cartesian pair generation anywhere in the ER plan."""
    plan = plan_of(spark, sf_dir, "pipeline_entity_resolution")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_table_profile_single_pass(spark, sf_dir):
    """The profiler is one aggregation over one scan: the pre-AQE plan
    reads the parquet exactly once (Expand duplicates the stream for
    the multi-distinct, but never re-scans)."""
    df = REGISTRY["x_table_profile"].fn(spark, sf_dir)
    static = df._jdf.queryExecution().sparkPlan().toString()
    assert static.count("Scan parquet") == 1
    assert "Expand" in static  # the documented multi-distinct shape


def test_quality_classifier_map_only(spark, sf_dir):
    """The learned-classifier scorer is a pure projection: hashing-trick
    buckets + literal weight vector inside one aggregate() expression.
    Zero exchanges, zero Python — the plan that runs at scan speed."""
    df = REGISTRY["x_quality_classifier"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_preference_pairs_single_agg_no_window(spark, sf_dir):
    """Chosen/rejected come from struct min/max aggregates, which combine
    map-side — one hash exchange on the prompt key, and no per-candidate
    window sort anywhere in the plan."""
    df = REGISTRY["x_preference_pairs"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Window" not in plan, plan


def test_quality_gate_single_shuffle(spark, sf_dir):
    """Four gate signals fold into map-side conditional sums: the whole
    attrition funnel costs one exchange on the source key."""
    df = REGISTRY["pipeline_quality_gate"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_incremental_dedup_no_cartesian(spark, sf_dir):
    """Asymmetric candidate generation must stay an equi-join on
    (band, bucket) — any CartesianProduct/NestedLoop in this plan means
    the delta is being compared all-pairs against the corpus."""
    df = REGISTRY["x_incremental_dedup"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_semantic_contamination_corpus_never_shuffles(spark, sf_dir):
    """Benchmark vectors collapse to one broadcast row; the corpus side
    is scan → project → broadcast join. The only exchange allowed is the
    SinglePartition collect of the (small) benchmark — a hash
    repartition would mean the 100 TB side is moving."""
    df = REGISTRY["x_semantic_contamination"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_media_synth_passes_are_spread_before_decode(spark, sf_dir):
    """The frame/audio synth→decode→hash chains are narrow, so they
    inherit the partitioning of the 1-2-split customer scan unless the
    tiny id list is spread first — at sf0.1 the missing repartition
    serialized x_video_shots onto 1-2 of 32 cores (8.0s → 1.0s fixed;
    SCALE.md). Guard: a round-robin exchange precedes the Arrow pass."""
    for name in ("x_video_shots", "x_audio_segments"):
        plan = plan_of(spark, sf_dir, name)
        assert "RoundRobinPartitioning" in plan, name


def test_pmi_topk_is_take_ordered_all_jvm(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "x_pmi_collocations")
    assert "TakeOrderedAndProject" in plan  # top-k, never a global sort
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_nb_classify_no_python_no_cartesian_on_corpus(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "x_nb_classify")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the only nested-loop joins allowed are the broadcast scalar/class
    # expansions (1-row or class-count sides); the token-keyed model
    # join and the per-doc aggregation must be hash-based
    assert "CartesianProduct" not in plan


def test_auc_eval_windows_are_group_keyed(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "x_auc_eval")
    assert "BatchEvalPython" not in plan
    # the rank/tie windows must be partitioned on the group — a global
    # (unpartitioned) window would surface as an all-rows-to-one-task
    # SinglePartition exchange, the classic scale killer
    assert "Exchange SinglePartition" not in plan
    assert "Window" in plan


def test_dsir_scoring_join_is_broadcast(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "x_dsir_select")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the bucket-weight table (128 rows) must reach the exploded raw
    # tokens as a broadcast — a shuffled join here would shuffle the
    # whole corpus' token stream on a 128-value key (skew disaster)
    assert "BroadcastHashJoin" in plan


def test_mongo_find_pushes_filters_to_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "x_mongo_find")
    # the translated document's comparisons reach the parquet scan —
    # equality is null-safe (Mongo {f: v} semantics), pushed as
    # EqualNullSafe
    assert "EqualNullSafe(o_orderstatus,O)" in plan
    assert "GreaterThan(o_totalprice,100000.0)" in plan
    # projection pruning: the unprojected, unfiltered date column is
    # not in the scan's ReadSchema
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and all("o_orderdate" not in ln for ln in read_schema)
    assert "BatchEvalPython" not in plan


def test_html_extract_rides_the_scan(spark, sf_dir):
    """The markup-extraction chain is pure map-side regexp codegen: no
    exchange, no Python, no join — at 100 TB it runs at scan speed."""
    plan = plan_of(spark, sf_dir, "x_html_extract")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "Join" not in plan


def test_random_projection_no_join_no_shuffle_arrow_only(spark, sf_dir):
    """The projection is ONE map-side Arrow kernel (numpy int64 GEMM
    per batch — SQL higher-order folds evaluate interpreted, measured
    ~7x slower): no exchange, no join, and never row-at-a-time
    Python."""
    plan = plan_of(spark, sf_dir, "x_random_projection")
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" in plan or "mapInPandas" in plan.lower()


def test_expectations_fk_probe_is_broadcast_anti(spark, sf_dir):
    """The quality gate's FK orphan check must broadcast the dimension
    side of the LEFT ANTI — a shuffled anti join would co-shuffle the
    fact table per expectation."""
    plan = plan_of(spark, sf_dir, "x_expectations")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_substring_rewrite_array_cut_is_map_side(spark, sf_dir):
    """The rewrite product: windows shuffle as xxhash64 counts and the
    final token cut is an array filter against the joined-back interval
    list — no Python anywhere, no cartesian, and the only corpus-wide
    join is the per-doc interval LEFT join on the id."""
    plan = plan_of(spark, sf_dir, "x_substring_rewrite")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_communities_lpa_edges_shuffle_once(spark, sf_dir):
    """LPA rounds re-shuffle only vertex-sized label/count tables; the
    symmetrized edge list is checkpointed and the whole path stays
    JVM-side."""
    plan = plan_of(spark, sf_dir, "x_communities_lpa")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
