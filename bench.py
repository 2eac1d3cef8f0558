#!/usr/bin/env python
"""Benchmark harness — one COMPACT JSON line on stdout, detail to a file.

Runs the headline catalog queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints, LAST:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "n_queries": N, "runs_per_query": R, "sf": <sf>,
     "detail_file": "BENCH_DETAIL_c<cpus>.json"}

Per-query min/mean timings land in ``BENCH_DETAIL_c<cpus>.json`` (path
override: ``$SPARK_GRAFT_BENCH_DETAIL``; the core-count suffix keeps a
multi-core-count bench session from clobbering its own detail — the
PERF_r15 lesson), committed per round — the stdout line stays a few
hundred bytes so the driver's tail capture can never clip the headline
(which is exactly what broke BENCH_r07.json).

Each query is timed end-to-end (plan build + full execution into a
``noop`` sink — every row is computed and serialized by the engine,
nothing is transferred to the Python driver, which is how these jobs
run at scale and what a throughput number should measure).
The set stresses every execution shape: scan-agg (q01), multi-join
(q03/q05), window (a3), iterative join (k7), shingle self-join
(x_ngram_jaccard), broadcast ANN scoring (x_cosine_topk), and
scan-speed text scoring (x_text_quality).
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_regional_revenue",
    "a3_sessionize_events",
    "a5_argmax_top_order",
    "k6_merge_order_windows",
    "k7_closure_ancestors",
    "w2_genes_between",
    "tumbling_hour_events",
    "x_dedup_exact",
    "x_ngram_jaccard",
    "x_cosine_topk",
    "x_ivf_topk",
    "x_text_quality",
    "x_contamination",
    "x_tfidf_topk",
    "x_asof_next_click",
    "x_span_dedup",
    "x_kmeans_clusters",
    "pipeline_corpus_curate",
    "x_pack_sequences",
    "x_bm25_topk",
    "x_embed_quantize",
    "x_semantic_dedup",
    "x_lm_score",
    "pipeline_training_mix",
    "x_pagerank_hosts",
    "pipeline_web_curate",
    "x_temporal_join",
    "x_skyline_orders",
    "x_overlap_depth",
    # round 7: the composite flagships + the IVF-PQ search half
    "pipeline_genes_decorate",
    "pipeline_tree_publish",
    "pipeline_entity_resolution",
    "x_pq_adc_topk",
    "pipeline_media_curate",
    "pipeline_quality_gate",
    "x_semantic_contamination",
    "x_quantile_sketch_merge",
    "pipeline_corpus_map",
    "x_bpe_pairs",
    "x_ranking_eval",
    # round 8: the release-gauntlet flagship + the deep-tree kernel path
    # + the tokenize-and-pack layout composite
    "pipeline_corpus_release",
    "k3k4_deep_tree",
    "pipeline_tokenize_pack",
    # round 8 close: the three newest physical strategies — ExactSubstr
    # windowed islands, Apriori broadcast-bounded pairs, per-frame
    # aHash + Hamming-cut segmentation
    "x_substring_dedup",
    "x_frequent_itemsets",
    "x_video_shots",
    # round 9: the homologs lifecycle flagship (order-index self-join →
    # split filter → synteny containment) and the batched BPE trainer
    # (per-round job count now vocabulary-churn-bounded, not per-merge)
    "pipeline_homologs",
    "x_bpe_train",
    # round 9 (cont.): the trained-classifier loop — NB train+serve in
    # one plan (token-keyed model join + per-doc argmin), the
    # vocabulary-marginal PMI miner, and DSIR importance selection
    # (128-key count shuffle + broadcast weight join at scan speed)
    "x_nb_classify",
    "x_pmi_collocations",
    "x_dsir_select",
    # round 9 (cont. 2): bounded shingle self-join (leakage matrix) and
    # the per-user lead-window transition aggregate
    "x_leakage_matrix",
    "x_event_transitions",
    # round 10: markup-extraction front end (scan-speed regex chain into
    # the C4 line rules), the ExactSubstr REWRITE product (window pass +
    # doc-keyed interval join-back + map-side array cut), and the
    # one-pass declarative quality gate
    "pipeline_markup_curate",
    "x_substring_rewrite",
    "x_expectations",
    # round 10 (cont.): scan-speed JL projection (literal sign matrix)
    # and the fixed-round synchronous LPA community pass
    "x_random_projection",
    "x_communities_lpa",
    # round 11: baseline-JPEG entropy codec (encode fixtures + Huffman/
    # IDCT decode, embarrassingly parallel map pass) and the Mongo
    # aggregation-pipeline shim (match→unwind→group→sort→limit, pure
    # Catalyst)
    "x_jpeg_decode",
    "x_mongo_aggregate",
    # round 12: MPEG-1 Layer III codec (synthesize→encode→decode map
    # pass, geometry closed-form + tolerance flags) and the $facet/
    # $bucket/$bucketAuto Mongo read-side stages (pure Catalyst)
    "x_mp3_decode",
    "x_mongo_facet",
    # round 13: the $graphLookup recursive-traversal shim (labeled
    # multi-source BFS over one shared edge partitioning) and the §3
    # dependency-order release DAG (5 staged-parquet barrier stages)
    "x_mongo_graphlookup",
    "pipeline_release_e2e",
    # round 14: the expression-tail entries — regex/object-reshape/
    # date-crossing surface, strings/sets/$topN accumulators, and the
    # $integral/$derivative window calculus (per-row JVM expressions;
    # one fixed-domain groupBy / one window exchange each)
    "x_mongo_object_reshape",
    "x_mongo_strings_sets",
    "x_mongo_window_calculus",
    # round 14 (cont.): the updateMany write-surface shim (one narrow
    # CASE-per-column select; zero extra shuffles), $expMovingAvg
    # (grouped-map recurrence kernel — one hash exchange + per-group
    # O(rows) pass, the honest sequential floor), and the
    # $convert/$isNumber/$type coercion surface (scan-speed)
    "x_mongo_update_many",
    "x_mongo_ema",
    "x_mongo_convert",
    # round 15: time-unit range windows ({range, unit: 'day'} →
    # epoch-ms rangeBetween; ONE hash exchange on o_custkey shared by
    # all three window outputs) and the densify/fill/calculus
    # time-unit stack (day grid + $derivative/$integral units; one
    # groupBy exchange + one window exchange, broadcast anti-join grid)
    "x_mongo_window_range_unit",
    "x_mongo_timeseries_units",
]

#: the round-6 headline set, for the same-set A/B control run
#: (BENCH_NOTES.md methodology: cross-round deltas stay attributable)
R6_SET = HEADLINE[:31]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")

    from gramene_mongodb_spark.catalog import REGISTRY
    from gramene_mongodb_spark.session import get_spark

    spark = get_spark("gramene-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # JVM/codegen warm-up on the smallest sf so headline timings measure
    # the queries, not first-touch class loading; k7 also warms the
    # iterative-join path (checkpoint + repartition machinery)
    run(REGISTRY["q01_pricing_summary"].fn(spark, "/root/testdata/sf0.001"))
    run(REGISTRY["k7_closure_ancestors"].fn(spark, "/root/testdata/sf0.001"))

    # n runs per query, MIN reported: on a shared sandbox the min is the
    # plan's cost, the spread is scheduler noise — this is what lets a
    # round-over-round comparison tell a real plan regression from a
    # noisy neighbor (mean rides along for context)
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    # optional subset (comma-separated names): lets an A/B run isolate
    # harness-position effects (JIT/GC pressure from the growing set)
    # from real per-query regressions without editing HEADLINE
    subset = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    headline = (
        [n for n in subset.split(",") if n] if subset else HEADLINE
    )
    timings: dict[str, float] = {}
    means: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in headline:
        fn = REGISTRY[name].fn
        samples = []
        # one broken query must not zero the whole bench line — record the
        # error per-query and keep timing the rest
        try:
            for _ in range(n_runs):
                t0 = time.perf_counter()
                run(fn(spark, sf_dir))
                samples.append(time.perf_counter() - t0)
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
            continue
        timings[name] = round(min(samples), 3)
        means[name] = round(sum(samples) / len(samples), 3)
        spread = ", ".join(f"{s:.3f}" for s in samples)
        print(f"# {name}: min {min(samples):.3f}s of [{spread}]", file=sys.stderr)

    detail = {
        "metric": "headline_queries_total_wall_seconds",
        # a partial total is NOT comparable round-over-round: a failing
        # query shrinking the sum must read as broken, not as a speedup
        "value": round(sum(timings.values()), 3) if not errors else None,
        "unit": "sec",
        "complete": not errors,
        "queries": timings,
        "queries_mean": means,
        "runs_per_query": n_runs,
        "sf": sf,
    }
    if errors:
        detail["errors"] = errors
        detail["partial_total"] = round(sum(timings.values()), 3)

    # Per-query detail goes to a FILE; stdout gets one COMPACT line.
    # Round 7 lesson: the 42-query detail dict grew the stdout JSON past
    # the driver's tail-capture window, clipping the line's FRONT — the
    # headline total — and leaving BENCH_r07.json unparseable
    # ("parsed": null). A few-hundred-byte final line survives any tail
    # window; the detail file is committed for round-over-round A/B.
    # Round 15 lesson: the driver benches at TWO core counts back to
    # back, and the second run clobbered the first run's per-query
    # detail before PERF collected it (PERF_r15 per_query came up
    # empty) — so the default detail name is now suffixed with the core
    # count; consecutive runs at different $SPARK_GRAFT_CPUS leave
    # separate files, and the stdout line still names the right one.
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    detail_path = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     f"BENCH_DETAIL_c{cpus}.json"),
    )
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1, sort_keys=True)
        fh.write("\n")

    compact = {
        "metric": detail["metric"],
        "value": detail["value"],
        "unit": "sec",
        "complete": detail["complete"],
        "n_queries": len(timings),
        "runs_per_query": n_runs,
        "sf": sf,
        "detail_file": os.path.basename(detail_path),
    }
    if errors:
        compact["n_errors"] = len(errors)
        compact["partial_total"] = detail["partial_total"]
    print(json.dumps(compact))
    spark.stop()


if __name__ == "__main__":
    main()
