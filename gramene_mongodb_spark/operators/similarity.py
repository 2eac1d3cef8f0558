"""Similarity search over embedding columns (array<float>).

Extension surface (BASELINE.json north_star). Two tiers:

* ``cosine_topk`` — exact brute force. The embedding table is scanned
  once; the (small) query set is broadcast, so the plan is a map-side
  nested loop per partition with a final top-k shuffle on query id.
  Correctness baseline and perfectly adequate when |queries| is small.
* ``ivf_topk`` — IVF-style approximate search: rows are bucketed by
  nearest centroid (coarse quantizer); probes search only ``n_probe``
  buckets. Bucket assignment is a broadcast join + argmin — at 100 TB
  the bucket becomes a parquet partition key so probing prunes partitions
  at the scan (partition pruning visible in .explain).

Vector math is JVM-side higher-order functions (zip_with/aggregate)
where the arity is small, and Arrow-batched numpy kernels where a whole
matrix op per row would otherwise evaluate interpreted (HOF lambdas do
not whole-stage-codegen — random_projection measured ~7× faster as one
int64 GEMM per batch). Never row-at-a-time Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gramene_mongodb_spark.lineage import hard_checkpoint


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def with_cosine(df: DataFrame, a: str, b: str, out: str = "cosine") -> DataFrame:
    """Cosine similarity between two array<numeric> columns."""
    return df.withColumn(
        out, _dot(F.col(a), F.col(b)) / (_norm(F.col(a)) * _norm(F.col(b)))
    )


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    include_self: bool = False,
    round_to: int | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` has the same (id_col, vec_col) shape; it is broadcast, so
    the candidate scan never shuffles — only the final per-query top-k
    (row_number over a window on query id) moves data, and AQE coalesces
    that tiny shuffle.

    Deterministic: ties broken by candidate id ascending. ``round_to``
    rounds the score BEFORE ranking so results are reproducible across
    engines whose floating-point summation order differs.
    Output: (query_id, neighbor_id, cosine, rank).
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
    )
    cand = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")
    )
    scored = cand.crossJoin(F.broadcast(q)).withColumn(
        "cosine",
        _dot(F.col("__qvec"), F.col("__cvec"))
        / (_norm(F.col("__qvec")) * _norm(F.col("__cvec"))),
    )
    if not include_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    if round_to is not None:
        scored = scored.withColumn("cosine", F.round(F.col("cosine"), round_to))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def hard_negatives(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
    round_to: int | None = None,
) -> DataFrame:
    """Hard-negative mining for contrastive/embedding training: for each
    query, the top-``k`` most-similar candidates whose ``label_col``
    DIFFERS from the query's — the near-miss examples that actually
    move a contrastive loss (easy negatives are a wasted batch slot).

    Same physical shape as ``cosine_topk``: queries broadcast (with
    their labels riding along), map-side scoring via JVM higher-order
    functions, label inequality applied BEFORE the top-k window so
    same-label candidates never reach the shuffle. Deterministic: score
    rounded to ``round_to`` before ranking, ties by candidate id.
    Output: (query_id, query_label, neighbor_id, neighbor_label,
    cosine, rank)."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("query_label"),
        F.col(vec_col).alias("__qvec"),
    )
    cand = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("neighbor_label"),
        F.col(vec_col).alias("__cvec"),
    )
    scored = (
        cand.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_label") != F.col("query_label"))
        .withColumn(
            "cosine",
            _dot(F.col("__qvec"), F.col("__cvec"))
            / (_norm(F.col("__qvec")) * _norm(F.col("__cvec"))),
        )
    )
    if round_to is not None:
        scored = scored.withColumn("cosine", F.round(F.col("cosine"), round_to))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "query_label", "neighbor_id", "neighbor_label",
            "cosine", "rank",
        )
    )


def assign_ivf_buckets(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "centroid",
) -> DataFrame:
    """Coarse quantization: tag every vector with its nearest centroid.

    Centroids are broadcast; assignment is an argmin over the broadcast
    side (map-only). At scale, write the result partitioned by ``bucket``
    so probes prune partitions at the parquet scan.
    """
    # truly map-only: centroids collapse to ONE broadcast row (with
    # per-centroid norms precomputed once); the nearest bucket is
    # array_min over (-cosine, bucket) structs — lexicographic struct
    # ordering reproduces the previous (sim desc, bucket asc) pick, and
    # the corpus is never replicated k× through an id-keyed window
    # shuffle (the previous plan's hidden exchange)
    one = (
        centroids.select(
            F.struct(
                F.col(centroid_id).alias("bucket"),
                F.col(centroid_vec).alias("__ctr"),
                _norm(F.col(centroid_vec)).alias("__cn"),
            ).alias("s")
        )
        .groupBy()
        .agg(F.array_sort(F.collect_list("s")).alias("__cents"))
    )
    pick = F.expr(
        f"array_min(transform(__cents, cc -> named_struct("
        f"'ns', -(aggregate(zip_with({vec_col}, cc.__ctr,"
        f"                  (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        f"        CAST(0 AS DOUBLE), (a, v) -> a + v) / (__nv * cc.__cn)),"
        f"'bucket', cc.bucket))).bucket"
    )
    return (
        vectors.withColumn("__nv", _norm(F.col(vec_col)))
        .crossJoin(F.broadcast(one))
        .withColumn("bucket", pick)
        .drop("__cents", "__nv")
    )


def kmeans_centroids(
    vectors: DataFrame,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iterations: int = 5,
) -> DataFrame:
    """Train IVF centroids with Lloyd's algorithm in pure DataFrame ops
    (no MLlib dependency): deterministic init (k lowest-id vectors),
    then `iterations` rounds of assign (broadcast argmin) + recompute
    (groupBy mean via element-wise array aggregation).

    Scale: each round is one map-side assignment over the corpus + one
    shuffle keyed by centroid id (k groups). Centroids stay on the
    driver-broadcast side; the corpus is never collected. For 100 TB,
    train on a sample (``vectors.sample``) — quantizer quality needs
    only a representative subset.

    Output: (centroid_id INT, centroid ARRAY<DOUBLE>).
    """
    from pyspark.sql import Window

    dim = len(vectors.select(vec_col).first()[0])
    centroids = (
        vectors.orderBy(id_col)
        .limit(k)
        .select(
            (F.row_number().over(Window.orderBy(id_col)) - 1).alias("centroid_id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("centroid"),
        )
    )
    centroids = hard_checkpoint(centroids)
    for _ in range(iterations):
        assigned = assign_ivf_buckets(
            vectors, centroids, id_col, vec_col, "centroid_id", "centroid"
        )
        sums = assigned.groupBy("bucket").agg(
            *[
                F.sum(F.col(vec_col)[i].cast("double")).alias(f"s{i}")
                for i in range(dim)
            ],
            F.count(F.lit(1)).alias("n"),
        )
        centroids = sums.select(
            F.col("bucket").alias("centroid_id"),
            F.array(*[(F.col(f"s{i}") / F.col("n")) for i in range(dim)]).alias(
                "centroid"
            ),
        )
        centroids = hard_checkpoint(centroids)
    return centroids


def kmeans_assign_exact(
    vectors: DataFrame,
    k: int = 8,
    iterations: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd k-means clustering with EXACT integer arithmetic — the
    oracle-checkable (and engine-portable) twin of ``kmeans_centroids``.

    Embedding clustering is a standard curation pass (semantic
    grouping, diversity sampling, per-cluster quotas). Plain float
    Lloyd can't be differentially verified: mean computation depends on
    float summation order, so two engines drift in the last ulp and
    borderline assignments flip. Here every vector is quantized ONCE to
    int64 micros (``round(v·1e6)`` — both engines round half away from
    zero), after which

    * distances are exact integer sums of squared differences
      (order-independent; ≤ 4e12 per dim · 64 dims ≪ int64 range), and
    * centroid updates are ``round(exact_int_sum / count)`` — one
      correctly-rounded double division on identical integers.

    Nothing is float-accumulated, so the full assignment hash-matches a
    replay in any engine. Init: the ``k`` lowest-id vectors; one
    "iteration" = assign + recompute; the output is the assignment
    against the final centroids. Empty clusters drop out (both sides
    drop them identically). Ties: lowest cluster id wins.

    Scale: each assign is a broadcast-k·dim argmin over the corpus
    (map-side); each recompute is one shuffle into k groups with
    map-side partial sums. The corpus is never collected; centroids are
    the only driver-sized state. Train on a sample at 100 TB.
    """
    from pyspark.sql import Window

    quant = vectors.select(
        F.col(id_col),
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * 1000000).cast("long"),
        ).alias("__q"),
    )
    probe = quant.select("__q").first()
    if probe is None:  # empty corpus -> empty assignment, stable schema
        return quant.select(F.col(id_col), F.lit(0).cast("int").alias("cluster"))
    dim = len(probe[0])
    cent = (
        quant.orderBy(id_col)
        .limit(k)
        .select(
            (F.row_number().over(Window.orderBy(id_col)) - 1).alias("__cid"),
            F.col("__q").alias("__c"),
        )
    )
    # eager severing measured FASTER here than lazy composition, unlike
    # pagerank (r15 A/B: lazy rounds 3.9 s vs 2.1 s on x_kmeans_clusters;
    # lazy init alone 3.2 s): the k-row centroid table feeds a broadcast
    # in EVERY round's assign, and materializing it keeps each broadcast
    # build trivial instead of re-planning the upstream corpus pass
    # inside the BroadcastExchange subtree. Left checkpointed on purpose.
    cent = hard_checkpoint(cent)

    def assign(points: DataFrame, centroids: DataFrame) -> DataFrame:
        # argmin as a PURE map-side expression: the k centroids collapse
        # to ONE broadcast row holding a cid-sorted struct array, and
        # array_min over (dist, cid) structs picks nearest-centroid with
        # the lowest-cid tie-break via lexicographic struct ordering —
        # no k·n row explosion, no id-keyed shuffle per iteration (the
        # previous form windowed the k-replicated corpus every round)
        one = (
            centroids.select(F.struct(F.col("__cid"), F.col("__c")).alias("s"))
            .groupBy()
            .agg(F.array_sort(F.collect_list("s")).alias("__cents"))
        )
        pick = F.expr(
            "array_min(transform(__cents, cc -> named_struct("
            "'d', aggregate(zip_with(__q, cc.__c, (x, y) -> (x - y) * (x - y)),"
            "               0L, (a, v) -> a + v),"
            "'cid', cc.__cid))).cid"
        )
        return (
            points.crossJoin(F.broadcast(one))
            .withColumn("__cid", pick)
            .drop("__cents")
        )

    # r15 (guide §5.1, driver cost): the per-dim aggregate/rebuild
    # expressions are built as SQL strings parsed in ONE JVM call each —
    # the previous Column-algebra list comprehensions issued ~4-7 py4j
    # round-trips per dimension per expression (~1.7 s of driver wall at
    # dim=64 JUST to construct the plan; the plan itself is unchanged).
    sum_exprs = [F.expr(f"sum(__q[{i}]) AS s{i}") for i in range(dim)]
    rebuild = F.expr(
        "array("
        + ", ".join(
            f"cast(round(cast(s{i} as double) / n) as long)" for i in range(dim)
        )
        + ") AS __c"
    )
    for _ in range(iterations):
        assigned = assign(quant, cent)
        sums = assigned.groupBy("__cid").agg(
            *sum_exprs, F.count(F.lit(1)).alias("n"),
        )
        cent = sums.select("__cid", rebuild)
        cent = hard_checkpoint(cent)
    return assign(quant, cent).select(F.col(id_col), F.col("__cid").alias("cluster"))


def ivf_search(
    vectors: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 2,
) -> DataFrame:
    """IVF ANN with trained centroids: candidates come only from each
    query's ``n_probe`` nearest buckets.

    At 100 TB: persist ``assign_ivf_buckets(vectors, centroids)``
    partitioned by ``bucket`` — the bucket equi-join below then prunes
    partitions at the scan, so a query touches n_probe/k of the corpus.
    """
    from pyspark.sql import Window

    cand = assign_ivf_buckets(vectors, centroids, id_col, vec_col)
    c = centroids.select(F.col("centroid_id").alias("bucket"), F.col("centroid"))
    q_scored = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec"))
        .crossJoin(F.broadcast(c))
        .withColumn(
            "__sim",
            _dot(F.col("__qvec"), F.col("centroid"))
            / (_norm(F.col("__qvec")) * _norm(F.col("centroid"))),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("__sim").desc(), F.col("bucket"))
    q_buckets = (
        q_scored.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= n_probe)
        .select("query_id", "__qvec", "bucket")
    )
    scored = (
        cand.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec"), "bucket"
        )
        .join(F.broadcast(q_buckets), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            _dot(F.col("__qvec"), F.col("__cvec"))
            / (_norm(F.col("__qvec")) * _norm(F.col("__cvec"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dims: int = 4,
    round_to: int | None = None,
) -> DataFrame:
    """Approximate top-k: search only the query's own sign-orthant bucket.

    Bucket id = sign bits of the first ``dims`` components (pure
    expression, no join needed for this quantizer). The candidate join is
    an equi-join on ``bucket`` — at 100 TB this is the partition-pruned
    path; recall is tunable by probing adjacent buckets (n_probe).
    """
    from pyspark.sql import Window

    def bucket_expr(col: Column) -> Column:
        b = F.lit(0)
        for i in range(dims):
            b = b + F.when(col[i] >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        return b.cast("int")

    cand = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        bucket_expr(F.col(vec_col)).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        bucket_expr(F.col(vec_col)).alias("bucket"),
    )
    scored = cand.join(F.broadcast(q), "bucket").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = scored.withColumn(
        "cosine",
        _dot(F.col("__qvec"), F.col("__cvec"))
        / (_norm(F.col("__qvec")) * _norm(F.col("__cvec"))),
    )
    if round_to is not None:
        scored = scored.withColumn("cosine", F.round(F.col("cosine"), round_to))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 255,
) -> DataFrame:
    """Scalar (per-dimension min-max) int8-style quantization: map each
    float dimension to an integer code in ``[0, levels]`` — the 4×
    memory/IO compression every large ANN index applies before vectors
    go near an index structure (IVF residuals, SQ8 flat scans).

    Differential determinism (the same trick as ``kmeans_assign_exact``):
    floats are quantized ONCE to int64 micros (``round(v·1e6)``, both
    engines round half away from zero); per-dimension min/max are exact
    integer aggregates; and the code is the pure integer expression
    ``(v - min) · levels div max(1, span)`` — truncating and floor
    division agree because every operand is non-negative, so the code
    array hash-matches any engine that agrees on the arithmetic.

    Output: ``id_col``, ``qvec`` (array<int> codes), ``q_l1`` (BIGINT
    sum of codes — a cheap scalar invariant for audits).

    Scale: the min/max pass is a posexplode + groupBy(pos) — dim·1 rows
    out of a corpus-sized scan with map-side partial min/max; the d-row
    range table is collapsed to ONE broadcast row of two arrays, and
    encoding is a pure map-side transform. Two scans total (stats +
    encode), no corpus shuffle anywhere.
    """
    quant = df.select(
        F.col(id_col),
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * 1000000).cast("long"),
        ).alias("__q"),
    )
    ranges = (
        quant.select(F.posexplode("__q").alias("__pos", "__v"))
        .groupBy("__pos")
        .agg(F.min("__v").alias("__mn"), F.max("__v").alias("__mx"))
        .groupBy()
        .agg(
            F.array_sort(F.collect_list(F.struct("__pos", "__mn", "__mx"))).alias("__r")
        )
        .select(
            F.expr("transform(__r, s -> s.__mn)").alias("__mins"),
            F.expr("transform(__r, s -> s.__mx)").alias("__maxs"),
        )
    )
    encoded = quant.crossJoin(F.broadcast(ranges)).select(
        F.col(id_col),
        F.expr(
            f"transform(__q, (v, i) -> CAST(((v - __mins[i]) * {int(levels)})"
            " div greatest(1L, __maxs[i] - __mins[i]) AS INT))"
        ).alias("qvec"),
    )
    return encoded.withColumn(
        "q_l1",
        F.aggregate(F.col("qvec"), F.lit(0).cast("long"), lambda a, v: a + v),
    )


def _jl_sign(seed: str, i: int, j: int) -> int:
    """±1 sign for input dim ``i`` → output dim ``j``: parity of the
    first hex digit of ``md5(seed:i:j)``. hashlib and SQL ``md5()``
    agree byte-for-byte, so an oracle can re-derive the matrix
    independently instead of trusting a shipped literal."""
    import hashlib

    h = hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest()
    return 1 if int(h[0], 16) % 2 == 1 else -1


def random_projection(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    in_dim: int = 64,
    out_dim: int = 16,
    seed: str = "jl",
) -> DataFrame:
    """Johnson–Lindenstrauss signed random projection (Achlioptas 2003
    ±1 variant): project ``in_dim`` float embeddings to ``out_dim``
    integer components — the dimensionality-reduction pass that makes
    downstream ANN (IVF buckets, brute-force rerank, LSH planes)
    4–8× cheaper while preserving pairwise distances to within the JL
    bound. The constant 1/√k scale is omitted (cosine and relative
    distances are scale-invariant; document consumers accordingly).

    Differential determinism, house style: floats quantize ONCE to
    int64 micros (``round(v·1e6)``, HALF_UP on the widened double —
    replicated exactly in numpy); the sign matrix is ±1 from md5
    parity (:func:`_jl_sign`), built DRIVER-SIDE with hashlib, while
    an oracle re-derives the same matrix with SQL ``md5()`` — two
    independent derivations that must agree; each output component is
    an exact int64 dot product, so results hash-match any engine
    bit-for-bit.

    Output: ``(id, dim, proj_micro)`` — one scalar row per output
    component. Scale: ONE map-side Arrow pass (no join, no shuffle,
    no per-row hashing) — the projection runs at scan speed on any
    corpus and vectorizes as a single int64 GEMM per batch.
    """
    # Arrow-vectorized integer matmul, NOT SQL higher-order functions:
    # transform/zip_with/aggregate lambdas evaluate INTERPRETED per row
    # (no whole-stage codegen — measured ~67 µs/row for 16 folds over a
    # 64-dim array), and unrolling them into 1024 flat Add nodes just
    # moves the cost into plan compilation. One numpy int64 GEMM per
    # Arrow batch is exact (int64 products/sums, no float surface after
    # quantization) and ~two orders of magnitude cheaper per row — this
    # is the documented "built-ins genuinely can't express it
    # efficiently" exception, same as the multimodal/tree kernels.
    import numpy as np
    import pandas as pd

    signs = np.array(
        [[_jl_sign(seed, i, j) for j in range(out_dim)] for i in range(in_dim)],
        dtype=np.int64,
    )
    dims = np.arange(out_dim, dtype=np.int64)
    out_schema = f"{id_col} long, dim long, proj_micro long"

    def project(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            vecs = pdf[vec_col]
            ok = np.array(
                [v is not None and len(v) == in_dim for v in vecs], dtype=bool
            )
            frames = []
            if ok.any():
                # float32 -> float64 widening is exact; round HALF_UP
                # away from zero on the double, matching Spark round()
                m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs[ok]])
                y = m * 1e6
                q = np.where(y >= 0, np.floor(y + 0.5), np.ceil(y - 0.5)).astype(
                    np.int64
                )
                proj = q @ signs  # exact int64
                frames.append(
                    pd.DataFrame(
                        {
                            id_col: np.repeat(ids[ok], out_dim),
                            "dim": np.tile(dims, int(ok.sum())),
                            "proj_micro": proj.reshape(-1),
                        }
                    )
                )
            if (~ok).any():  # null/short vectors: NULL components
                bad = pd.DataFrame(
                    {
                        id_col: np.repeat(ids[~ok], out_dim),
                        "dim": np.tile(dims, int((~ok).sum())),
                        "proj_micro": pd.array(
                            [None] * (int((~ok).sum()) * out_dim), dtype="Int64"
                        ),
                    }
                )
                frames.append(bad)
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return df.select(id_col, vec_col).mapInPandas(project, out_schema)


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "label",
    tau_micros_sq: int = 1_500_000_000_000,
    kernel: str = "numpy",
) -> DataFrame:
    """SemDeDup-style semantic deduplication: within each cluster, drop
    every vector that has a LOWER-id vector within squared distance
    ``tau_micros_sq`` (int64-micro units) — the leader-by-id rule, so
    the survivor set is deterministic with no transitive closure and no
    float surface (vectors quantized once to int64 micros, distances
    exact integer sums; the kmeans/quantize trick).

    ``cluster_col`` is pluggable: feed it ``kmeans_assign_exact``'s
    assignment (the SemDeDup recipe — cluster first so the quadratic
    step never sees the corpus), an IVF bucket, or a label column.

    Scale: ONE shuffle of the quantized corpus on ``cluster_col``, then
    a per-cluster quadratic step — SemDeDup's cost profile by design: at
    100 TB you raise k so clusters stay bounded (|cluster| ≈ n/k), and
    the anti-join back is key-only. Dim·(2e6)² ≪ int64, so 64-dim
    distances never overflow.

    ``kernel`` picks the quadratic step's engine — both produce
    BIT-IDENTICAL survivor sets because quantization happens JVM-side
    either way and int64 arithmetic is exact in both:

    * ``"numpy"`` (default, the production path): Arrow-batched
      ``applyInPandas`` per cluster; the pairwise distance matrix is one
      vectorized int64 broadcast — ~10× the throughput of interpreted
      per-pair higher-order functions. Blocked in 1024-row tiles so a
      hot cluster never materializes an n² matrix.
    * ``"sql"``: pure DataFrame self-join + zip_with/aggregate filter —
      zero Python, the oracle-replayable twin.
    """
    quant = df.select(
        F.col(cluster_col).alias("__cl"),
        F.col(id_col),
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * 1000000).cast("long"),
        ).alias("__q"),
    )
    if kernel == "numpy":
        import numpy as np
        import pandas as pd

        tau = int(tau_micros_sq)

        def find_dups(pdf: "pd.DataFrame") -> "pd.DataFrame":
            if len(pdf) < 2:
                return pd.DataFrame({id_col: []}).astype({id_col: "int64"})
            pdf = pdf.sort_values(id_col)
            ids = pdf[id_col].to_numpy()
            arr = np.stack(pdf["__q"].to_numpy()).astype(np.int64)
            # exact int64 throughout: ||a-b||² = ||a||² + ||b||² - 2·a·b;
            # |a·b| ≤ 64·(2e6)² ≈ 2.6e14 ≪ int64, so nothing wraps
            sq = np.einsum("ij,ij->i", arr, arr)
            dup = np.zeros(len(ids), dtype=bool)
            block = 1024
            for s in range(0, len(ids), block):
                e = min(s + block, len(ids))
                # rows [s:e] vs every strictly-lower id (= positions < e
                # after the id sort), tiled so memory stays block²-bounded
                for ps in range(0, e, block):
                    pe = min(ps + block, e)
                    d2 = (
                        sq[s:e, None]
                        + sq[None, ps:pe]
                        - 2 * (arr[s:e] @ arr[ps:pe].T)
                    )
                    lower = ids[None, ps:pe] < ids[s:e, None]
                    dup[s:e] |= ((d2 <= tau) & lower).any(axis=1)
            return pd.DataFrame({id_col: ids[dup]})

        dups = quant.groupBy("__cl").applyInPandas(
            find_dups, schema=f"{id_col} long"
        )
        return df.join(dups, on=id_col, how="left_anti")

    a, b = quant.alias("a"), quant.alias("b")
    d2 = F.aggregate(
        F.zip_with(
            F.col("a.__q"), F.col("b.__q"), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    dups = (
        a.join(
            b,
            (F.col("a.__cl") == F.col("b.__cl"))
            & (F.col(f"a.{id_col}") > F.col(f"b.{id_col}")),
        )
        .filter(d2 <= F.lit(int(tau_micros_sq)))
        .select(F.col(f"a.{id_col}").alias(id_col))
        .distinct()
    )
    return df.join(dups, on=id_col, how="left_anti")


# --------------------------------------------------------------------------
# reciprocal-rank fusion (hybrid lexical + semantic retrieval)
# --------------------------------------------------------------------------

def rrf_fuse(
    ranked: "list[DataFrame]",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k_const: int = 60,
    scale: int = 1_000_000_000,
    top_k: int = 20,
) -> DataFrame:
    """Reciprocal-rank fusion of heterogeneous retrieval arms (the
    standard hybrid-search combiner: BM25 lexical + embedding cosine,
    or any number of rankers):

        rrf(d) = Σ over arms containing d of  scale div (k_const + rank_d)

    Rank positions are integers and the reciprocal is TRUNCATING integer
    division, so fusion is engine- and order-exact — no float
    reciprocal sums to diverge between engines. An id missing from an
    arm simply contributes nothing (union semantics, the usual RRF
    treatment).

    Scale: each arm is already a top-k list (tiny); the union + groupBy
    touch k·#arms rows, the final top-k is TakeOrdered + a window over
    ≤ top_k rows. Nothing corpus-sized moves.

    Output: (rank, id_col, rrf_score, n_lists), rank 1-based by fused
    score descending, id ascending.
    """
    from functools import reduce

    from pyspark.sql import Window

    parts = [
        df.select(F.col(id_col), F.col(rank_col).cast("long").alias("__r"))
        for df in ranked
    ]
    un = reduce(lambda a, b: a.unionByName(b), parts)
    fused = un.groupBy(id_col).agg(
        F.sum(F.expr(f"{scale} div ({k_const} + __r)")).alias("rrf_score"),
        F.count(F.lit(1)).cast("long").alias("n_lists"),
    )
    top = fused.orderBy(
        F.col("rrf_score").desc(), F.col(id_col).asc()
    ).limit(int(top_k))
    w = Window.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", id_col, "rrf_score", "n_lists"
    )


def pq_codes(
    vectors: DataFrame,
    m: int = 4,
    k: int = 4,
    iterations: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product quantization (PQ, Jégou et al. TPAMI'11) with EXACT
    integer arithmetic — the vector-compression step that turns a
    100 TB float embedding store into an m-byte-per-vector code table
    an ANN index scans in memory (IVF-PQ = ``ivf_search`` buckets over
    these codes; ``quantize_embeddings`` is the scalar special case).

    Each vector is split into ``m`` subvectors; each subspace gets its
    own k-means codebook trained by the ``kmeans_assign_exact``
    arithmetic (int64-micro quantization, integer squared distances,
    round(sum/n) centroid updates, lowest-cid ties) — so codes and
    quantization errors are bit-identical on any engine and the whole
    operator is differentially verifiable, which float PQ is not.

    ONE plan for all subspaces: subvectors are posexploded into
    (vec_id, sub, subvec) rows, so training/assignment shuffle once per
    round keyed on (sub, cid) — m never multiplies the number of
    passes. Codebooks stay broadcast-sized (m·k rows); the corpus is
    never collected. Train on a sample at 100 TB (quantizer quality
    needs only a representative subset), then encode map-side.

    Output: (``vec_id``, ``codes`` — '-'-joined per-subspace codes,
    ``err`` — exact integer total squared quantization error).
    """
    assigned, _ = pq_model(vectors, m, k, iterations, id_col, vec_col)
    if assigned is None:
        return vectors.select(
            F.col(id_col),
            F.lit(None).cast("string").alias("codes"),
            F.lit(None).cast("long").alias("err"),
        ).limit(0)
    return assigned.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub", "__cid"))),
                lambda s: s["__cid"].cast("string"),
            ),
            "-",
        ).alias("codes"),
        F.sum("__d").cast("long").alias("err"),
    )


def pq_model(
    vectors: DataFrame,
    m: int = 4,
    k: int = 4,
    iterations: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame | None, DataFrame | None]:
    """The trainable core of ``pq_codes``: returns ``(assignments,
    codebook)`` — assignments as (id, sub, __cid, __d) rows, the
    codebook as broadcast-sized (sub, __cid, __c int64-micro subvector)
    rows — so downstream consumers (``pq_adc_topk``) can score against
    the codes without re-deriving the model. (None, None) on an empty
    corpus.
    """
    from pyspark.sql import Window

    quant = vectors.select(
        F.col(id_col),
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * 1000000).cast("long"),
        ).alias("__q"),
    )
    probe = quant.select("__q").first()
    if probe is None:
        return None, None
    dim = len(probe[0])
    if dim % m:
        raise ValueError(f"pq_model: dim {dim} not divisible by m={m}")
    subdim = dim // m
    subs = quant.select(
        F.col(id_col),
        F.posexplode(
            F.array(*[F.slice("__q", s * subdim + 1, subdim) for s in range(m)])
        ).alias("sub", "__sq"),
    )

    # r15 (guide §2.2): init = the k lowest-id vectors, which are the
    # SAME ids in every subspace — take them once with a global
    # orderBy().limit(k) (a TakeOrdered reduction) and explode k rows,
    # instead of row_number over the whole m×n exploded corpus (a full
    # per-sub shuffle+sort just to keep k rows per sub).
    low = quant.orderBy(id_col).limit(k)
    cent = (
        low.withColumn("__rn", F.row_number().over(Window.orderBy(id_col)))
        .select(
            (F.col("__rn") - 1).alias("__cid"),
            F.posexplode(
                F.array(*[F.slice("__q", s * subdim + 1, subdim) for s in range(m)])
            ).alias("sub", "__c"),
        )
        .select("sub", "__cid", "__c")
    )
    cent = hard_checkpoint(cent)

    def assign(points: DataFrame, centroids: DataFrame) -> DataFrame:
        per_sub = centroids.groupBy("sub").agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__cid"), F.col("__c")))
            ).alias("__cents")
        )
        pick = F.expr(
            "array_min(transform(__cents, cc -> named_struct("
            "'d', aggregate(zip_with(__sq, cc.__c, (x, y) -> (x - y) * (x - y)),"
            "               0L, (a, v) -> a + v),"
            "'cid', cc.__cid)))"
        )
        return (
            points.join(F.broadcast(per_sub), "sub")
            .withColumn("__pick", pick)
            .select(
                points[id_col],
                "sub",
                "__sq",
                F.col("__pick.cid").alias("__cid"),
                F.col("__pick.d").alias("__d"),
            )
        )

    # per-dim expressions as parsed SQL strings — one JVM call each, not
    # 4-7 py4j round-trips per dimension (the kmeans_assign_exact fix)
    sum_exprs = [F.expr(f"sum(__sq[{i}]) AS s{i}") for i in range(subdim)]
    rebuild = F.expr(
        "array("
        + ", ".join(
            f"cast(round(cast(s{i} as double) / n) as long)" for i in range(subdim)
        )
        + ") AS __c"
    )
    for _ in range(iterations):
        assigned = assign(subs, cent)
        sums = assigned.groupBy("sub", "__cid").agg(
            *sum_exprs, F.count(F.lit(1)).alias("n"),
        )
        cent = sums.select("sub", "__cid", rebuild)
        cent = hard_checkpoint(cent)

    return assign(subs, cent), cent


def pq_adc_topk(
    assignments: DataFrame,
    codebook: DataFrame,
    queries: DataFrame,
    k_top: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes — the search half
    of IVF-PQ: every query builds an m×k lookup table of exact integer
    squared distances from its subvectors to the codebook centroids;
    a coded vector's ADC distance is then the SUM of m table lookups —
    no float math, no decompression, and the corpus side touches only
    its (id, sub, code) rows.

    Plan shape at 100 TB: the LUT is (queries × m × k) rows — broadcast
    — so scoring is the code table joined map-side to the LUT, one
    groupBy (query, id) with map-side partial sums, and a per-query
    TakeOrdered. The full-precision corpus is never read at query time.

    Ties pinned by (adc, id). Output: (query_id, id, adc, rank ≤ k_top).
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(query_id),
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * 1000000).cast("long"),
        ).alias("__q"),
    )
    probe = codebook.select(F.size("__c").alias("s")).first()
    if probe is None:
        return assignments.select(
            F.lit(None).cast("long").alias(query_id),
            F.col(id_col),
            F.lit(None).cast("long").alias("adc"),
            F.lit(None).cast("long").alias("rank"),
        ).limit(0)
    subdim = probe[0]
    qsubs = q.select(
        query_id,
        F.posexplode(
            F.expr(
                f"transform(sequence(0, int(size(__q) / {subdim}) - 1),"
                f" s -> slice(__q, s * {subdim} + 1, {subdim}))"
            )
        ).alias("sub", "__qs"),
    )
    lut = (
        qsubs.join(F.broadcast(codebook), "sub")
        .select(
            query_id,
            "sub",
            "__cid",
            F.expr(
                "aggregate(zip_with(__qs, __c, (x, y) -> (x - y) * (x - y)),"
                " 0L, (a, v) -> a + v)"
            ).alias("__ld"),
        )
    )
    scored = (
        assignments.select(id_col, "sub", "__cid")
        .join(F.broadcast(lut), ["sub", "__cid"])
        .groupBy(query_id, id_col)
        .agg(F.sum("__ld").cast("long").alias("adc"))
    )
    w = Window.partitionBy(query_id).orderBy(F.col("adc").asc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k_top)
    )


def semantic_contamination(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.42,
    round_to: int = 4,
) -> DataFrame:
    """Benchmark decontamination by EMBEDDING similarity — the semantic
    companion to the n-gram `contamination_check`: a training doc whose
    embedding sits too close to any eval-benchmark embedding is flagged
    even when no 8-gram overlaps (paraphrased leakage, the case n-gram
    screens miss).

    Plan shape mirrors cosine_topk's broadcast-query design with the
    roles flipped: the BENCHMARK side is the small one (eval suites are
    thousands of rows, the corpus is the 100 TB side), so its unit
    vectors are collected into ONE row and broadcast; every corpus row
    then computes max-cosine over the benchmark array in a single
    map-side `array_max(transform(...))` expression — no join shuffle,
    no pair materialization, corpus never moves. Cosines are rounded to
    ``round_to`` BEFORE the max/threshold so the flag set is identical
    across engines; the argmax benchmark id is pinned (highest cosine,
    then highest id — lexicographic struct max).

    Output: (id, max_cos, matched_bench, contaminated).
    """
    from gramene_mongodb_spark.operators.dedup import _unit_vectors

    cu = _unit_vectors(corpus, id_col, vec_col)
    bu = _unit_vectors(bench, id_col, vec_col)
    bench_row = bu.agg(
        F.collect_list(F.struct(F.col("id"), F.col("u"))).alias("__bench")
    )
    best = F.array_max(
        F.transform(
            F.col("__bench"),
            lambda s: F.struct(
                F.round(_dot(F.col("u"), s["u"]), round_to).alias("cos"),
                s["id"].alias("bid"),
            ),
        )
    )
    return (
        cu.join(F.broadcast(bench_row))
        .select(F.col("id"), best.alias("__best"))
        .select(
            "id",
            F.col("__best.cos").alias("max_cos"),
            F.col("__best.bid").alias("matched_bench"),
            F.when(F.col("__best.cos") >= threshold, 1)
            .otherwise(0)
            .cast("long")
            .alias("contaminated"),
        )
    )
