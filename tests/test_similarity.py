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


# --------------------------------------------------------------------------
# embedding-cosine near-dup (exact + LSH)
# --------------------------------------------------------------------------

def _numpy_near_pairs(emb_rows, threshold):
    import numpy as np

    ids = [r.vec_id for r in emb_rows]
    mat = np.array([r.embedding for r in emb_rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    cos = mat @ mat.T
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if round(cos[i, j], 4) >= threshold:
                a, b = sorted((ids[i], ids[j]))
                out.add((a, b))
    return out


def test_embedding_near_pairs_matches_numpy(spark, emb):
    from gramene_mongodb_spark.operators import dedup as D

    expected = _numpy_near_pairs(emb.collect(), 0.4)
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in D.embedding_near_pairs(emb, threshold=0.4, round_to=4).collect()
    }
    assert set(got) == expected
    assert all(a < b for a, b in got)
    assert all(c >= 0.4 for c in got.values())


def test_embedding_lsh_subset_and_recall(spark, emb):
    from gramene_mongodb_spark.operators import dedup as D

    exact = {
        (r.id_a, r.id_b)
        for r in D.embedding_near_pairs(emb, threshold=0.4, round_to=4).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in D.embedding_lsh_near_pairs(
            emb, dim=64, threshold=0.4, round_to=4
        ).collect()
    }
    assert lsh <= exact                      # verify step kills false positives
    assert exact, "fixture should contain near pairs at 0.4"
    recall = len(lsh & exact) / len(exact)
    # 8 bands x 2 rows at cosine 0.4 -> expected recall ~0.98
    assert recall >= 0.8, f"LSH recall {recall:.2f}"


def test_embedding_lsh_deterministic(spark, emb):
    from gramene_mongodb_spark.operators import dedup as D

    r1 = sorted(
        (r.id_a, r.id_b, r.cosine)
        for r in D.embedding_lsh_near_pairs(emb, dim=64, round_to=4).collect()
    )
    r2 = sorted(
        (r.id_a, r.id_b, r.cosine)
        for r in D.embedding_lsh_near_pairs(emb, dim=64, round_to=4).collect()
    )
    assert r1 == r2


def test_kmeans_assign_exact_matches_numpy_reference(spark):
    """Two Lloyd rounds on a crafted corpus must equal an independent
    numpy implementation of the same integer-exact algorithm."""
    import numpy as np

    from gramene_mongodb_spark.operators.similarity import kmeans_assign_exact

    rng = np.random.RandomState(11)
    # three obvious blobs in 4-d plus a duplicate point
    blobs = np.concatenate(
        [rng.normal(c, 0.05, size=(7, 4)) for c in (-1.0, 0.0, 1.0)]
    ).astype(np.float32)
    blobs[20] = blobs[0]
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(blobs)],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    got = {
        r.vec_id: r.cluster
        for r in kmeans_assign_exact(df, k=3, iterations=2).collect()
    }

    q = np.round(blobs.astype(np.float64) * 1_000_000).astype(np.int64)
    cent = q[:3].copy()
    cids = np.arange(3)

    def assign(c, ids):
        d = ((q[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)  # exact int64
        order = np.lexsort((ids[np.argsort(d, kind="stable", axis=1)][:, 0],))
        # argmin with lowest-cid tie-break:
        best = np.empty(len(q), dtype=np.int64)
        for i in range(len(q)):
            m = d[i].min()
            best[i] = ids[np.flatnonzero(d[i] == m)[0]]
        return best

    for _ in range(2):
        a = assign(cent, cids)
        new_cent, new_ids = [], []
        for cid in cids:
            members = q[a == cid]
            if len(members):
                new_cent.append(np.round(members.sum(axis=0) / len(members)))
                new_ids.append(cid)
        cent, cids = np.array(new_cent, dtype=np.int64), np.array(new_ids)
    final = assign(cent, cids)
    assert got == {i: int(final[i]) for i in range(len(q))}
    # identical vectors always co-cluster; the two extreme blobs (-1, +1)
    # can never share a centroid after a round
    assert got[20] == got[0]
    assert got[0] != got[14]


def test_quantize_embeddings_bounds_and_extremes(spark):
    from gramene_mongodb_spark.operators import similarity as S

    rows = [
        (1, [0.0, 5.0, -1.0]),
        (2, [1.0, 5.0, 0.0]),
        (3, [0.5, 5.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    out = {r.vec_id: r for r in S.quantize_embeddings(df).collect()}
    for r in out.values():
        assert all(0 <= c <= 255 for c in r.qvec)
        assert r.q_l1 == sum(r.qvec)
    # per-dim min maps to 0, max to 255
    assert out[1].qvec[0] == 0 and out[2].qvec[0] == 255
    assert out[1].qvec[2] == 0 and out[3].qvec[2] == 255
    # constant dimension (span 0) maps to code 0 everywhere, no div-by-zero
    assert all(out[v].qvec[1] == 0 for v in (1, 2, 3))
    # midpoint lands mid-range
    assert 120 <= out[3].qvec[0] <= 135


def test_semantic_dedup_leader_survives_cross_cluster_ignored(spark):
    from gramene_mongodb_spark.operators import similarity as S

    rows = [
        (1, [0.0, 0.0], 0),       # leader of cluster 0
        (2, [0.0005, 0.0], 0),    # within tau of 1 -> dropped
        (3, [9.0, 9.0], 0),       # far -> survives
        (4, [0.0, 0.0], 1),       # identical to 1 but other cluster -> survives
        (5, [0.00051, 0.0], 1),   # within tau of 4 -> dropped
    ]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>, label INT")
    # tau: 0.0005 micros = 500; 500^2 = 250_000
    out = sorted(
        r.vec_id
        for r in S.semantic_dedup(df, tau_micros_sq=300_000).collect()
    )
    assert out == [1, 3, 4]


def test_semantic_dedup_no_transitive_chaining_leader_rule(spark):
    from gramene_mongodb_spark.operators import similarity as S

    # chain 1 -- 2 -- 3 where 1-3 are NOT within tau: leader rule drops
    # 2 (near 1) and ALSO drops 3 only if near a lower-id SURVIVOR or
    # any lower id within tau; 3 is near 2 (dropped) -> still dropped,
    # because the rule is "exists lower id within tau", not "exists
    # surviving lower id" — document the exact contract
    rows = [(1, [0.0]), (2, [0.0004]), (3, [0.0008])]
    df = spark.createDataFrame(
        [(i, v, 0) for i, v in rows], "vec_id LONG, embedding ARRAY<FLOAT>, label INT"
    )
    out = sorted(
        r.vec_id for r in S.semantic_dedup(df, tau_micros_sq=250_000).collect()
    )
    # 2 near 1 (400^2=160k <= 250k) dropped; 3 near 2 (160k) dropped
    assert out == [1]


def test_semantic_dedup_kernels_agree(spark, sf_dir):
    from gramene_mongodb_spark.io import load_table
    from gramene_mongodb_spark.operators import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    a = sorted(r.vec_id for r in S.semantic_dedup(emb, kernel="numpy").collect())
    b = sorted(r.vec_id for r in S.semantic_dedup(emb, kernel="sql").collect())
    assert a == b and len(a) > 0


def test_hard_negatives_excludes_same_label(spark):
    """Every returned neighbor has a different label than its query;
    ranking equals brute-force over the different-label subset."""
    import numpy as np

    from gramene_mongodb_spark.operators import similarity as SIM

    rng = np.random.default_rng(11)
    vecs = [(i, [float(x) for x in rng.normal(size=8)], i % 3) for i in range(30)]
    df = spark.createDataFrame(vecs, "vec_id: long, embedding: array<float>, label: long")
    q = df.filter("vec_id < 4")
    got = SIM.hard_negatives(df, q, k=3, round_to=6).collect()
    assert len(got) == 4 * 3
    assert all(r.neighbor_label != r.query_label for r in got)
    # brute force reference
    arr = {i: (np.array(v, dtype=np.float64), lab) for i, v, lab in vecs}
    for qid in range(4):
        qv, ql = arr[qid]
        scored = sorted(
            (
                (-round(float(qv @ v / (np.linalg.norm(qv) * np.linalg.norm(v))), 6), i)
                for i, (v, lab) in arr.items()
                if lab != ql
            )
        )[:3]
        want = [i for _, i in scored]
        have = [r.neighbor_id for r in sorted(
            (r for r in got if r.query_id == qid), key=lambda r: r.rank
        )]
        assert have == want, qid


def test_random_projection_matches_python_reference(spark):
    """Engine vs pure-python reference: same md5-parity sign matrix,
    same int64-micro quantization, exact integer dot products — every
    (vec, dim) component must match bit-for-bit."""
    import hashlib

    import numpy as np

    vecs = [
        (0, [0.5, -0.25, 0.125, 1.0]),
        (1, [0.0, 0.0, 0.0, 0.0]),
        (2, [-1.5, 2.5, -3.5, 0.5000005]),
    ]
    df = spark.createDataFrame(vecs, "vec_id LONG, embedding ARRAY<FLOAT>")
    got = {
        (r.vec_id, r.dim): r.proj_micro
        for r in SIM.random_projection(
            df, "vec_id", "embedding", in_dim=4, out_dim=3, seed="jl"
        ).collect()
    }

    def sign(i, j):
        h = hashlib.md5(f"jl:{i}:{j}".encode()).hexdigest()
        return 1 if int(h[0], 16) % 2 == 1 else -1

    import decimal

    def micro(x):
        # Spark round() = HALF_UP on the double value
        return int(
            decimal.Decimal(float(np.float32(x)) * 1e6).quantize(
                0, rounding=decimal.ROUND_HALF_UP
            )
        )

    want = {
        (vid, j): sum(micro(v) * sign(i, j) for i, v in enumerate(vec))
        for vid, vec in vecs
        for j in range(3)
    }
    assert got == want


def test_random_projection_preserves_distances(spark):
    """JL sanity on the real corpus slice: the 64→16 projection keeps
    relative pairwise (squared) distances within a loose distortion
    band — the property the operator exists for."""
    import itertools

    import numpy as np

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    sample = emb.filter("vec_id < 12")
    orig = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in sample.collect()}
    proj = SIM.random_projection(sample, "vec_id", "embedding", 64, 16).collect()
    pv = {}
    for r in proj:
        pv.setdefault(r.vec_id, [0.0] * 16)[r.dim] = r.proj_micro / 1e6
    ratios = []
    for a, b in itertools.combinations(sorted(orig), 2):
        d_orig = float(np.sum((orig[a] - orig[b]) ** 2))
        d_proj = float(
            np.sum((np.array(pv[a]) - np.array(pv[b])) ** 2)
        ) / 16.0  # the omitted 1/k scale
        if d_orig > 0:
            ratios.append(d_proj / d_orig)
    # k=16 is loose; assert the distribution is centered, not tight
    med = sorted(ratios)[len(ratios) // 2]
    assert 0.4 < med < 2.5, med
    assert all(r > 0.05 for r in ratios), min(ratios)


def test_random_projection_degenerate_vectors_emit_null_components(spark):
    """ADVICE r10: NULL / wrong-arity embeddings must keep their vec_id
    visible — out_dim rows with NULL proj_micro, never silently dropped
    (the x_random_projection oracle replays the same rule with a
    NULL-qv UNION branch)."""
    rows = [
        (1, [float(i) for i in range(64)]),
        (2, None),
        (3, [1.0, 2.0]),  # wrong arity
    ]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    out = SIM.random_projection(df, "vec_id", "embedding", 64, 16).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.vec_id, []).append(r.proj_micro)
    assert set(by_id) == {1, 2, 3}
    assert all(len(v) == 16 for v in by_id.values())
    assert all(p is not None for p in by_id[1])
    assert all(p is None for p in by_id[2] + by_id[3])
