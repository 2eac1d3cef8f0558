"""Empty-input robustness: the custom operators (iterative, windowed,
two-pass) must return empty results — not throw — on empty tables,
because at 100 TB a partition-pruned branch of a pipeline routinely IS
empty (a genome with no QTLs, a day with no events)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_transitive_closure_empty_edges(spark):
    from gramene_mongodb_spark.operators.closure import transitive_closure

    edges = spark.createDataFrame([], "child LONG, parent LONG")
    assert transitive_closure(edges).count() == 0


def test_connected_components_empty(spark):
    from gramene_mongodb_spark.operators.closure import connected_components

    edges = spark.createDataFrame([], "src LONG, dst LONG")
    assert connected_components(edges).count() == 0


def test_pagerank_empty(spark):
    from gramene_mongodb_spark.operators.closure import pagerank

    edges = spark.createDataFrame([], "src LONG, dst LONG")
    assert pagerank(edges).count() == 0


def test_dedup_exact_empty(spark):
    from gramene_mongodb_spark.operators.dedup import dedup_exact

    docs = spark.createDataFrame([], "doc_id LONG, text STRING")
    assert dedup_exact(docs, "doc_id").count() == 0


def test_merge_intervals_empty(spark):
    from gramene_mongodb_spark.operators.relational import merge_intervals

    df = spark.createDataFrame([], "k STRING, lo LONG, hi LONG")
    assert merge_intervals(df, ["k"], "lo", "hi").count() == 0


def test_sessionize_empty(spark):
    from gramene_mongodb_spark.operators.relational import sessionize

    df = spark.createDataFrame([], "user_id LONG, ts TIMESTAMP, event_id LONG")
    out = sessionize(df, ["user_id"], "ts", 1800, tiebreak=["event_id"])
    assert out.count() == 0


def test_boilerplate_ops_empty(spark):
    from gramene_mongodb_spark.operators.textops import (
        boilerplate_ratio,
        boilerplate_shingles,
    )

    docs = spark.createDataFrame([], "doc_id LONG, text STRING")
    assert boilerplate_shingles(docs).count() == 0
    assert boilerplate_ratio(docs).count() == 0


def test_upsert_merge_empty_sides(spark):
    from gramene_mongodb_spark.operators.relational import upsert_merge

    full = spark.createDataFrame([(1, "a")], "id LONG, v STRING")
    empty = spark.createDataFrame([], "id LONG, v STRING")
    # empty updates → current unchanged
    assert {r.id for r in upsert_merge(full, empty, "id").collect()} == {1}
    # empty current → all updates inserted
    assert {r.id for r in upsert_merge(empty, full, "id").collect()} == {1}
    # both empty
    assert upsert_merge(empty, empty, "id").count() == 0


def test_asof_join_empty_right(spark):
    from gramene_mongodb_spark.operators.relational import asof_join

    left = spark.createDataFrame(
        [(1, 100)], "k LONG, t LONG"
    )
    right = spark.createDataFrame([], "k LONG, t LONG, v STRING")
    out = asof_join(left, right, on=["k"], left_ts="t", right_ts="t")
    rows = out.collect()
    assert len(rows) == 1 and rows[0].v_asof is None  # left kept, no match


def test_quota_sample_empty_and_tiny(spark):
    from gramene_mongodb_spark.operators.relational import quota_sample

    empty = spark.createDataFrame([], "id LONG, src STRING")
    assert quota_sample(empty, "id", "src", quota=5).count() == 0
    one = spark.createDataFrame([(1, "a")], "id LONG, src STRING")
    assert quota_sample(one, "id", "src", quota=5).count() == 1


def test_kmeans_assign_exact_empty_and_fewer_than_k(spark):
    from gramene_mongodb_spark.operators.similarity import kmeans_assign_exact

    empty = spark.createDataFrame([], "vec_id LONG, embedding ARRAY<FLOAT>")
    out = kmeans_assign_exact(empty, k=4)
    assert out.count() == 0 and out.columns == ["vec_id", "cluster"]
    # n < k: every point is its own (initial) centroid -> n distinct clusters
    tiny = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 1.0])], "vec_id LONG, embedding ARRAY<FLOAT>"
    )
    got = {r.vec_id: r.cluster for r in kmeans_assign_exact(tiny, k=4).collect()}
    assert got == {0: 0, 1: 1}


def test_canonical_url_null_passthrough(spark):
    from pyspark.sql import functions as F

    from gramene_mongodb_spark.operators.textops import canonical_url

    df = spark.createDataFrame([(1, None)], "i LONG, url STRING")
    assert df.select(canonical_url(F.col("url")).alias("c")).collect()[0].c is None


def test_audio_stats_empty(spark):
    from gramene_mongodb_spark.operators.multimodal import audio_stats

    empty = spark.createDataFrame([], "media_id BIGINT, payload BINARY")
    assert audio_stats(empty).count() == 0


def test_token_budget_empty(spark):
    from gramene_mongodb_spark.operators.relational import token_budget_sample

    df = spark.createDataFrame([], "doc_id LONG, source STRING, n_tokens LONG")
    assert token_budget_sample(df, "doc_id", "n_tokens", "source", 100).count() == 0


def test_split_by_cluster_empty(spark):
    from gramene_mongodb_spark.operators.relational import split_by_cluster

    df = spark.createDataFrame([], "doc_id LONG, cluster_id LONG")
    out = split_by_cluster(df, "cluster_id")
    assert out.count() == 0 and "split" in out.columns


def test_inverted_index_empty(spark):
    from gramene_mongodb_spark.operators.textops import inverted_index

    docs = spark.createDataFrame([], "doc_id LONG, text STRING")
    assert inverted_index(docs).count() == 0


def test_top_ngrams_empty(spark):
    from gramene_mongodb_spark.operators.textops import top_ngrams

    docs = spark.createDataFrame([], "doc_id LONG, text STRING")
    assert top_ngrams(docs).count() == 0


def test_quantize_embeddings_empty(spark):
    from gramene_mongodb_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame([], "vec_id LONG, embedding ARRAY<FLOAT>")
    out = quantize_embeddings(df)
    assert out.count() == 0
    assert set(out.columns) == {"vec_id", "qvec", "q_l1"}


def test_semantic_dedup_empty(spark):
    from gramene_mongodb_spark.operators.similarity import semantic_dedup

    df = spark.createDataFrame([], "vec_id LONG, embedding ARRAY<FLOAT>, label INT")
    assert semantic_dedup(df).count() == 0


def test_round6_operators_empty(spark):
    """Every round-6 operator returns empty (not throws) on an empty
    input — partition-pruned pipeline branches routinely are empty."""
    from gramene_mongodb_spark.operators.closure import triangle_count
    from gramene_mongodb_spark.operators.relational import (
        cdc_replay,
        equidepth_bins,
        grouped_mad_outliers,
        grouped_rank_percentiles,
        interval_max_overlap,
        merge_partial_aggregates,
        percentile_threshold_filter,
        priority_sample,
        skyline_2d,
    )
    from gramene_mongodb_spark.operators.similarity import rrf_fuse
    from gramene_mongodb_spark.operators.textops import heavy_hitters

    kv = spark.createDataFrame([], "k LONG, v LONG")
    assert grouped_mad_outliers(kv, ["k"], "v").count() == 0
    assert grouped_rank_percentiles(kv, ["k"], "v").count() == 0
    assert percentile_threshold_filter(kv, "v", 3, 4).count() == 0
    assert equidepth_bins(kv, "v", 4).count() == 0
    assert skyline_2d(kv, "k", "v").count() == 0
    assert priority_sample(kv, "v", "k", 10).count() == 0

    ivs = spark.createDataFrame([], "k LONG, lo LONG, hi LONG")
    assert interval_max_overlap(ivs, ["k"], "lo", "hi").count() == 0

    log = spark.createDataFrame([], "k LONG, seq LONG, op STRING, v LONG")
    assert cdc_replay(log, ["k"], ["seq"], op="op").count() == 0

    agg = spark.createDataFrame([], "k LONG, s LONG, c LONG")
    assert (
        merge_partial_aggregates(agg, agg, ["k"], sums=["s"], counts=["c"]).count()
        == 0
    )

    edges = spark.createDataFrame([], "src LONG, dst LONG")
    tri = triangle_count(edges).collect()[0]
    assert (tri.n_triangles, tri.n_wedges) == (0, 0)

    ranked = spark.createDataFrame([], "doc_id LONG, rank LONG")
    assert rrf_fuse([ranked, ranked]).count() == 0

    docs = spark.createDataFrame([], "text STRING")
    assert heavy_hitters(docs, "text", k_den=10).count() == 0


def test_round7_operators_empty(spark):
    """Round-7 operators on empty inputs: empty results, never throws."""
    from gramene_mongodb_spark.io import table_profile
    from gramene_mongodb_spark.operators.closure import bfs_distance
    from gramene_mongodb_spark.operators.dedup import edit_distance_pairs
    from gramene_mongodb_spark.operators.relational import (
        linear_interpolate,
        snapshot_diff,
        zorder_key,
    )

    docs = spark.createDataFrame([], "id LONG, t STRING")
    assert edit_distance_pairs(docs, "id", "t").count() == 0

    edges = spark.createDataFrame([], "src LONG, dst LONG")
    seeds = spark.createDataFrame([], "v LONG")
    assert bfs_distance(edges, seeds).count() == 0

    tkv = spark.createDataFrame([], "t LONG, k LONG, v LONG")
    assert linear_interpolate(tkv, ["k"], "t", "v").count() == 0

    kv = spark.createDataFrame([], "k LONG, v LONG")
    assert snapshot_diff(kv, kv, ["k"], ["v"]).count() == 0

    # profiler on an empty table still yields one row per column with
    # zero counts and NULL min/max — the honest empty-table profile
    prof = {r.column: (r.n_rows, r.n_nulls, r.n_distinct, r.min_value)
            for r in table_profile(kv).collect()}
    assert prof == {"k": (0, 0, 0, None), "v": (0, 0, 0, None)}

    # zorder_key on an empty frame: expression builds and yields no rows
    keyed = kv.withColumn("z", zorder_key(["k", "v"], bits=4))
    assert keyed.count() == 0


def test_round7b_operators_empty(spark):
    """This session's additions: classifier scoring, preference pairs,
    incremental dedup and semantic contamination on empty inputs."""
    from gramene_mongodb_spark.operators.dedup import incremental_dedup
    from gramene_mongodb_spark.operators.relational import preference_pairs
    from gramene_mongodb_spark.operators.similarity import semantic_contamination
    from gramene_mongodb_spark.operators.textops import classifier_score

    docs = spark.createDataFrame([], "doc_id LONG, text STRING")
    assert classifier_score(docs).count() == 0

    scored = spark.createDataFrame([], "id LONG, grp LONG, score LONG")
    assert preference_pairs(scored, "grp", "score", "id").count() == 0

    # empty delta against a populated history → no verdicts at all
    history = spark.createDataFrame([(1, "some history text")], "doc_id LONG, text STRING")
    assert incremental_dedup(history, docs, "doc_id").count() == 0
    # populated delta against empty history → all kept (self-dedup only)
    out = incremental_dedup(docs, history, "doc_id").collect()
    assert [(r.doc_id, r.kept) for r in out] == [(1, 1)]

    emb = spark.createDataFrame([], "vec_id LONG, embedding ARRAY<FLOAT>")
    bench = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id LONG, embedding ARRAY<FLOAT>"
    )
    assert semantic_contamination(emb, bench).count() == 0


def test_round8_ops_on_empty_and_degenerate_inputs(spark):
    """Round-8 additions: line filter, PII redaction, BLEU/ROUGE and
    hard negatives on empty frames and degenerate rows."""
    from gramene_mongodb_spark.operators.dedup import blocked_pairs, blocking_keys
    from gramene_mongodb_spark.operators.similarity import hard_negatives
    from gramene_mongodb_spark.operators.textops import (
        bleu_scores,
        line_filter,
        pii_redact,
        rouge_scores,
    )

    docs = spark.createDataFrame([], "doc_id LONG, text STRING")
    assert line_filter(docs).count() == 0
    assert pii_redact(docs).count() == 0
    assert blocked_pairs(blocking_keys(docs, text="text"), "doc_id").count() == 0

    # empty-string doc: one empty line, dropped; nothing to redact
    one = spark.createDataFrame([(1, "")], "doc_id LONG, text STRING")
    r = line_filter(one).collect()[0]
    assert (r.n_lines, r.n_kept, r.text_clean) == (1, 0, "")
    p = pii_redact(one).collect()[0]
    assert (p.text_redacted, p.n_redactions) == ("", 0)

    pairs = spark.createDataFrame([], "pair_id LONG, ref STRING, cand STRING")
    assert bleu_scores(pairs).count() == 0
    assert rouge_scores(pairs).count() == 0

    emb = spark.createDataFrame([], "vec_id LONG, embedding ARRAY<FLOAT>, label LONG")
    q = spark.createDataFrame(
        [(1, [1.0, 0.0], 0)], "vec_id LONG, embedding ARRAY<FLOAT>, label LONG"
    )
    assert hard_negatives(emb, q).count() == 0  # no candidates
    assert hard_negatives(q, emb).count() == 0  # no queries


def test_exact_substring_spans_empty_and_short(spark):
    """Empty frame → empty result; docs shorter than the window emit
    zero windows but still one zero-count output row each."""
    from gramene_mongodb_spark.operators.dedup import exact_substring_spans

    empty = spark.createDataFrame([], "doc_id LONG, text STRING")
    assert exact_substring_spans(empty, "doc_id").count() == 0

    short = spark.createDataFrame(
        [(1, ""), (2, "one two"), (3, None)], "doc_id LONG, text STRING"
    )
    rows = {
        r.doc_id: r
        for r in exact_substring_spans(short, "doc_id", window_tokens=8).collect()
    }
    assert set(rows) == {1, 2, 3}
    for r in rows.values():
        assert (r.n_windows, r.n_dup_windows, r.n_spans, r.dup_tokens) == (0, 0, 0, 0)
    assert rows[2].n_tokens == 2
    assert rows[3].n_tokens == 0


def test_frequent_itemsets_empty(spark):
    from gramene_mongodb_spark.operators.relational import frequent_itemsets

    empty = spark.createDataFrame([], "basket LONG, item STRING")
    assert frequent_itemsets(empty, "basket", "item").count() == 0
    # single-item baskets: no pairs, regardless of support
    solo = spark.createDataFrame([(1, "a"), (2, "a")], "basket LONG, item STRING")
    assert frequent_itemsets(solo, "basket", "item", 0.5).count() == 0


def test_html_extract_empty(spark):
    from gramene_mongodb_spark.operators.textops import html_extract

    docs = spark.createDataFrame([], "doc_id LONG, html STRING")
    assert html_extract(docs, "doc_id", "html").count() == 0


def test_exact_substring_rewrite_empty_and_null(spark):
    from gramene_mongodb_spark.operators.dedup import exact_substring_rewrite

    docs = spark.createDataFrame([], "doc_id LONG, text STRING")
    assert exact_substring_rewrite(docs, "doc_id").count() == 0
    # null/empty text rows survive with zero tokens, not a throw
    docs = spark.createDataFrame(
        [(1, None), (2, "")], "doc_id LONG, text STRING"
    )
    rows = {r.doc_id: r for r in exact_substring_rewrite(docs, "doc_id").collect()}
    assert rows[1].n_tokens == 0 and rows[1].text_kept == ""
    assert rows[2].n_tokens == 0 and rows[2].n_spans_cut == 0


def test_check_expectations_empty_table(spark):
    """An empty load: zero violations everywhere (vacuous pass), total
    0 — counts, never nulls."""
    from gramene_mongodb_spark import io

    df = spark.createDataFrame([], "id LONG, status STRING")
    ref = spark.createDataFrame([], "k LONG")
    got = {
        r.expectation: (r.violations, r.total, r.passed)
        for r in io.check_expectations(
            df,
            row_checks={"id_not_null": F.col("id").isNotNull()},
            unique={"pk": ("id",)},
            foreign_keys={"fk": ("id", ref, "k")},
        ).collect()
    }
    assert got == {
        "id_not_null": (0, 0, True),
        "pk": (0, 0, True),
        "fk": (0, 0, True),
    }


def test_random_projection_empty(spark):
    from gramene_mongodb_spark.operators.similarity import random_projection

    df = spark.createDataFrame([], "vec_id LONG, embedding ARRAY<FLOAT>")
    assert random_projection(df, in_dim=4, out_dim=2).count() == 0


def test_label_propagation_empty(spark):
    from gramene_mongodb_spark.operators.closure import label_propagation

    edges = spark.createDataFrame([], "src LONG, dst LONG")
    assert label_propagation(edges).count() == 0


def test_mongo_new_stages_empty_inputs(spark):
    """Round-13 shim stages over EMPTY frames: window fields, densify,
    fill, graphLookup (both strategies), merge (both directions empty),
    unionWith, lookup pipeline form — all must yield sane empty/other-
    side results, never crash on the degenerate case a real migration
    hits first."""
    from gramene_mongodb_spark.operators.documents import mongo_aggregate

    empty = spark.createDataFrame([], "_id int, p string, t int, v int")
    one = spark.createDataFrame([(1, "a", 2, 5)], "_id int, p string, t int, v int")

    # window/fill/densify on empty input
    assert mongo_aggregate(empty, [{"$setWindowFields": {
        "partitionBy": "$p", "sortBy": {"t": 1},
        "output": {"c": {"$sum": "$v",
                         "window": {"documents": ["unbounded", "current"]}},
                   "r": {"$rank": {}}}}}]).count() == 0
    assert mongo_aggregate(empty, [{"$densify": {
        "field": "t", "partitionByFields": ["p"],
        "range": {"step": 2, "bounds": "partition"}}}]).count() == 0
    # explicit bounds over empty input: no partitions exist -> no grid
    assert mongo_aggregate(empty, [{"$densify": {
        "field": "t", "partitionByFields": ["p"],
        "range": {"step": 2, "bounds": [0, 10]}}}]).count() == 0
    assert mongo_aggregate(empty, [{"$fill": {
        "partitionBy": "$p", "sortBy": {"t": 1},
        "output": {"v": {"method": "locf"}}}}]).count() == 0

    # graphLookup: empty input (both strategies) and empty collection
    gl = {"from": "c", "startWith": "$p", "connectFromField": "p",
          "connectToField": "p", "as": "chain"}
    assert mongo_aggregate(empty, [{"$graphLookup": gl}],
                           collections={"c": one}).count() == 0
    assert mongo_aggregate(empty, [{"$graphLookup": {**gl, "depthField": "d",
                                                     "maxDepth": 2}}],
                           collections={"c": one}).count() == 0
    got = mongo_aggregate(one, [{"$graphLookup": gl}],
                          collections={"c": empty}).collect()
    assert len(got) == 1 and got[0]["chain"] == []

    # merge: empty updates keep the target; empty target inserts all
    m = {"into": "t", "on": "_id"}
    assert mongo_aggregate(empty, [{"$merge": m}],
                           collections={"t": one}).count() == 1
    assert mongo_aggregate(one, [{"$merge": m}],
                           collections={"t": empty}).count() == 1

    # unionWith with one empty side; lookup pipeline over empty inner
    assert mongo_aggregate(empty, [{"$unionWith": "o"}],
                           collections={"o": one}).count() == 1
    lp = mongo_aggregate(one, [{"$lookup": {
        "from": "i", "let": {"x": "$_id"},
        "pipeline": [{"$match": {"$expr": {"$eq": ["$$x", "$_id"]}}}],
        "as": "z"}}], collections={"i": empty}).collect()
    assert len(lp) == 1 and lp[0]["z"] == []


def test_mongo_update_many_empty(spark):
    from gramene_mongodb_spark.operators.documents import mongo_update_many

    df = spark.createDataFrame([], "id LONG, x DOUBLE, a ARRAY<STRING>")
    out = mongo_update_many(df, {"x": {"$gt": 0}}, {
        "$inc": {"x": 1}, "$push": {"a": "v"}, "$set": {"new": 1},
    })
    assert out.count() == 0
    assert "new" in out.columns
    out2 = mongo_update_many(df, {}, [{"$set": {"y": {"$add": ["$x", 1]}}}])
    assert out2.count() == 0 and "y" in out2.columns


def test_mongo_exp_moving_avg_empty(spark):
    from gramene_mongodb_spark.operators.documents import mongo_aggregate

    df = spark.createDataFrame([], "g LONG, t LONG, v DOUBLE")
    out = mongo_aggregate(df, [{"$setWindowFields": {
        "partitionBy": "$g", "sortBy": {"t": 1},
        "output": {"e": {"$expMovingAvg": {"input": "$v", "N": 3}},
                   "rn": {"$documentNumber": {}}}}}])
    assert out.count() == 0
    assert {"e", "rn"} <= set(out.columns)
