"""Similarity search: exact top-k sanity, k-means IVF training,
probe-based search recall vs the exact baseline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gramene_mongodb_spark.io import load_table
from gramene_mongodb_spark.operators import similarity as SIM


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_cosine_topk_self_is_best_when_included(spark, emb):
    q = emb.filter("vec_id < 3")
    out = SIM.cosine_topk(emb, q, k=1, include_self=True)
    rows = {r.query_id: r for r in out.collect()}
    for qid, r in rows.items():
        assert r.neighbor_id == qid  # self-similarity = 1.0 wins
        assert r.cosine == pytest.approx(1.0, abs=1e-9)


def test_kmeans_centroids_shape_and_determinism(spark, emb):
    c1 = SIM.kmeans_centroids(emb, k=8, iterations=2)
    c2 = SIM.kmeans_centroids(emb, k=8, iterations=2)
    r1 = sorted((r.centroid_id, tuple(round(x, 9) for x in r.centroid)) for r in c1.collect())
    r2 = sorted((r.centroid_id, tuple(round(x, 9) for x in r.centroid)) for r in c2.collect())
    assert r1 == r2                      # deterministic end to end
    assert len(r1) <= 8 and len(r1) > 1
    assert len(r1[0][1]) == 64           # embedding dim preserved


def test_ivf_search_recall_vs_exact(spark, emb):
    queries = emb.filter("vec_id < 10")
    exact = SIM.cosine_topk(emb, queries, k=5)
    exact_sets = {
        r.query_id: set()
        for r in exact.collect()
    }
    for r in exact.collect():
        exact_sets[r.query_id].add(r.neighbor_id)
    centroids = SIM.kmeans_centroids(emb, k=8, iterations=3)
    approx = SIM.ivf_search(emb, queries, centroids, k=5, n_probe=4)
    approx_sets: dict = {}
    for r in approx.collect():
        approx_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    mean_recall = sum(recalls) / len(recalls)
    # random 64-d gaussians cluster weakly; half the buckets probed should
    # still recover well over half of the true neighbors
    assert mean_recall >= 0.5, f"mean recall {mean_recall:.2f}"
    # every returned neighbor must be a real corpus vector, ranked 1..5
    assert all(1 <= r.rank <= 5 for r in approx.collect())
