"""Repo-wide physical-plan sweep: the no-Python-in-hot-paths contract.

Every catalog entry's analyzed plan is checked for row-at-a-time Python
(`BatchEvalPython` — the 10-100x-slower-than-JVM execution mode this
engine bans outright) and for Arrow-batched Python kernels
(`ArrowEvalPython` / `FlatMapGroupsInPandas` / `MapInPandas`), which are
legal ONLY on the explicit allowlist below — the tree/media/graph
kernels whose semantics genuinely exceed DataFrame expressions
(SURVEY.md §7 rule: composition first, Arrow kernel second, never
row-Python). A new entry that silently introduces Python into a hot
path fails here by name.

Mostly analysis-only (sparkPlan; a handful of entries execute eager
materializations or iterative rounds at build time), ~90s for ~200
entries. Python-level ``localCheckpoint`` is patched to identity for
the sweep: an eager checkpoint truncates lineage to a LogicalRDD leaf,
which would hide everything UPSTREAM of it — exactly the O(tokens²)
shingle/media subtrees this test exists to guard — and make a
Python UDF smuggled into them invisible. (JVM-level
``lineage.hard_checkpoint`` sites — the iterative closure loops —
still truncate; their per-round bodies are separately plan-tested.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from gramene_mongodb_spark.catalog import REGISTRY

#: entries whose Arrow kernels are the DESIGN (judge-audited): per-tree
#: applyInPandas kernels, stdlib media codecs over mapInPandas, the
#: small-graph vectorized union-find path, numpy tile kernels
ARROW_ALLOWED = {
    "k3k4_deep_tree",
    "k3k4_tree_representatives",
    "k5_domain_architecture",
    "k7_closure_ancestors",
    "k8_nested_tree_docs",
    "pipeline_entity_resolution",
    "pipeline_genes_decorate",
    "pipeline_media_curate",
    "pipeline_taxonomy_build",
    "pipeline_tree_publish",
    "x_audio_segments",
    "x_cigar_identity",
    "x_dedup_clusters",
    "x_graph_components",
    "x_image_phash",
    "x_media_audio",
    "x_media_formats",
    "x_media_frames",
    "x_jpeg_decode",  # baseline JPEG entropy codec: Huffman decode is inherently sequential per MCU — Arrow-batched by design (operators/jpeg.py)
    "x_jpeg_ac_invariance",  # JPEG-vs-PNG twin decode: same codec pass as x_jpeg_decode over gradient lattices (AC path under the driver gate)
    "x_mp3_decode",  # MPEG-1 Layer III codec: bit-serial entropy coding + IMDCT/filterbank — Arrow-batched by design (operators/mp3.py)
    "x_id3_metadata",  # ID3v2 tag write/parse over real tagged streams — byte-serial frame walk, Arrow-batched by design
    "x_mp3_vad",  # VAD over compressed audio: Layer III codec pass feeding audio_segments — Arrow-batched by design
    "x_media_probe",
    "x_media_resize",
    "x_mongo_ema",  # $expMovingAvg: sequential per-partition recurrence (each value depends on the previous OUTPUT) — grouped-map by design (documents._exp_moving_avg_kernel)
    "x_random_projection",  # Arrow int64 GEMM — HOF folds measured ~7x slower (BENCH_NOTES r10)
    "x_semantic_dedup",
    "x_video_shots",
}

#: execute a live availableNow stream at build time — plan not
#: inspectable statically; x_stream_agg_merge's foreachBatch body
#: reuses merge_partial_aggregates (swept via x_agg_merge) and
#: x_stream_exactly_once's read-back aggregate is plain groupBy
BUILD_EXECUTES = {"x_stream_agg_merge", "x_stream_exactly_once"}

ARROW_NODES = (
    "ArrowEvalPython",
    "FlatMapGroupsInPandas",
    "MapInPandas",
    "PythonMapInArrow",
)


def test_no_python_in_any_hot_path_repo_wide(spark, sf_dir, monkeypatch):
    # identity-checkpoint so eager materializations don't truncate the
    # swept plans (see module docstring)
    monkeypatch.setattr(
        DataFrame, "localCheckpoint", lambda self, eager=True: self
    )
    batch_hits: list[str] = []
    arrow_unexpected: list[str] = []
    arrow_stale = set(ARROW_ALLOWED)
    for name, spec in sorted(REGISTRY.items()):
        if name in BUILD_EXECUTES:
            continue
        plan = spec.fn(spark, sf_dir)._jdf.queryExecution().sparkPlan().toString()
        if "BatchEvalPython" in plan:
            batch_hits.append(name)
        if any(node in plan for node in ARROW_NODES):
            if name in ARROW_ALLOWED:
                arrow_stale.discard(name)
            else:
                arrow_unexpected.append(name)
    assert not batch_hits, f"row-at-a-time Python in hot paths: {batch_hits}"
    assert not arrow_unexpected, (
        f"Arrow kernels outside the allowlist (add deliberately or fix): "
        f"{arrow_unexpected}"
    )
    # keep the allowlist honest both ways: entries that no longer use
    # an Arrow kernel should be removed from it
    assert not arrow_stale, f"allowlist entries with no Arrow node: {arrow_stale}"
