"""K7 — transitive closure over a DAG (the one genuinely iterative operator).

Reference: four independent ancestor-closure implementations —
``ontologies/obo2json.pl:100-113`` (DFS over is_a/part_of),
``ontologies/parseInterpro.js:19-36`` (indent stack),
``trees/taxonomy.js:13-28`` (parent-chain walk),
``maps/load_maps_and_taxonomy.js:95-115`` (memoized recursion).
All materialize an ``ancestors`` array per node so downstream queries
(annotation rollups A6, most-specific-annotation U3) are joins, not walks.

Spark-first: iterative self-join to a fixpoint.  Each iteration extends
every known path by one edge hop and unions in the new pairs; dedup via
``distinct``; terminate when an iteration adds no rows.  Hierarchy depth
bounds iterations (ontologies/taxonomies: ≤ ~20), so the loop count is
small and data-independent of total size.

Scale notes:
* pair table is (node, ancestor) — for 100 TB graphs this stays columnar
  and shuffle-partitioned on ``node``; no driver-side structures.
* every iteration is plan-severed with ``lineage.hard_checkpoint`` —
  plain ``localCheckpoint`` RETAINS its child plan for lazy stats, and a
  self-joining round doubles that retained tree per iteration
  (measured: exponential analysis cost + driver OOM; see lineage.py).
* multi-parent DAGs converge because ``distinct`` dedups pairs found via
  different paths (SURVEY.md §7 risk 1).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

from gramene_mongodb_spark.lineage import hard_checkpoint


def transitive_closure(
    edges: DataFrame,
    child: str = "child",
    parent: str = "parent",
    max_iterations: int = 64,
    max_depth: int | None = None,
    single_task_bound: int = 2_000_000,
) -> DataFrame:
    """All (node, ancestor) pairs reachable via parent edges.

    ``edges`` is the direct-parent relation (one row per edge; DAGs with
    multiple parents per child are fine).  Output columns: ``node``,
    ``ancestor`` — one row per distinct pair, excluding self-pairs.

    ``max_depth``: a caller-known upper bound on the longest path in the
    hierarchy (ontologies/taxonomies publish theirs). When given, the
    loop runs exactly ⌈log2(max_depth)⌉ doubling rounds with NO per-round
    count action and NO final fixpoint-detect round — each round becomes
    a single checkpoint job, which removes one full pass over the
    (largest) closure table plus one Spark action per round. An
    UNDERESTIMATE returns an incomplete closure; when the depth is
    unknown, leave it None and pay the detect round.
    """
    # iteration tables are sized from the MEASURED pair count (we count
    # every round for the fixpoint check anyway): tiny closures run in a
    # few partitions instead of paying session-parallelism task overhead
    # per round (measured 2× on the sf0.1 bench), huge ones cap at the
    # session's parallelism and AQE takes over. ~500k pairs/partition ≈
    # tens of MB of (long, long) rows.
    max_parts = edges.sparkSession.sparkContext.defaultParallelism

    def sized(df: DataFrame, n_rows: int) -> DataFrame:
        parts = min(max(1, n_rows // 500_000 + 1), max_parts)
        # hard_checkpoint, not localCheckpoint: the closure is self-joined
        # every round, and a localCheckpoint's retained child plan would
        # double per round (see lineage.py) — exponential analysis cost
        return hard_checkpoint(df.repartition(parts))

    # NOTE (r15 A/B): checkpoint-before-count was tried here and REVERTED
    # — for the LUT-sized closures this operator actually serves
    # (ontology/taxonomy hierarchies), the eager materialization costs
    # more than the repeated lazy references it saves (k7 0.82→1.00 s,
    # release_e2e 3.08→5.12 s, genes_decorate 3.62→4.12 s).
    # connected_components keeps that flip because its edge derivation
    # (an ER match join) is genuinely expensive; these edge inputs are
    # cheap scans.
    base = edges.select(
        F.col(child).alias("node"), F.col(parent).alias("ancestor")
    ).distinct()
    n_pairs = base.count()

    def extend(df: DataFrame) -> DataFrame:
        return (
            df.join(
                df.select(
                    F.col("node").alias("ancestor"), F.col("ancestor").alias("grand")
                ),
                "ancestor",
            )
            .select("node", F.col("grand").alias("ancestor"))
            .unionByName(df)
            .distinct()
        )

    # path doubling: after k iterations the closure holds every path of
    # length ≤ 2^k, so a depth-d hierarchy converges in ⌈log2 d⌉ joins
    # (4 iterations for the reference's ~20-deep ontologies) instead of d
    # one-hop extensions — each iteration is one self-join + distinct.
    if max_depth is not None:
        import math

        rounds = math.ceil(math.log2(max(2, max_depth)))
        # Adaptive single-task path (AQE-style, same rationale as
        # connected_components): n_edges · max_depth is a HEURISTIC
        # size estimate, exact for trees (each node has ≤ max_depth
        # ancestors and one parent edge) but NOT a bound for
        # multi-parent DAGs — m leaves → 1 hub → m roots has 2m edges,
        # depth 2, yet an m²-pair closure. When the estimate fits one
        # task (~32 MB of (long,long) pairs at 2M) the whole doubling
        # loop collapses to one lazy Arrow kernel — pandas hash-merges
        # per round instead of ⌈log2 d⌉ shuffle pyramids. Identical
        # algebra (extend ∪ id, dedup), property-tested equal to the
        # distributed path. The kernel itself re-checks the estimate
        # mid-doubling and aborts with an actionable error if a dense
        # DAG blows past it (the alternative is a silent single-task
        # OOM). Bigger estimates — the 100 TB case — fall through to
        # the distributed doubling below; the reference's real
        # hierarchies (ontology / taxonomy LUTs, ≤ ~100k edges ×
        # depth ≤ 20, near-tree fan-in) all fit.
        if n_pairs * max_depth <= single_task_bound:
            return _closure_single_task(base, rounds, pair_cap=single_task_bound * 4)
        # SMALL bounded closures (LUT-sized term/taxon hierarchies used
        # as one stage of a larger plan — the decorate flagship's shape)
        # skip checkpointing entirely and return a pure LAZY composition:
        # the plan holds at most 2^rounds ≤ 16 references to the edge
        # scan (identical exchanges, so ReusedExchange collapses them at
        # runtime), analysis stays trivial, and the closure contributes
        # ZERO driver actions — it inlines into whatever job consumes
        # it. The checkpoint-per-round path below exists for plans that
        # self-reference across MANY rounds (lineage.py); with rounds
        # and pair counts both bounded, neither hazard applies.
        if rounds <= 4 and n_pairs <= 100_000:
            closure = base  # pure lazy: no checkpoint, zero extra jobs
            for _ in range(rounds):
                closure = extend(closure)
            return closure
        # size every round from the n_edges · depth estimate instead of
        # a per-round growth model: a doubling round over a multi-parent
        # DAG can MORE than double the pair count (the estimate is not a
        # true bound there — see the single-task note above), so this is
        # deliberately conservative for trees and merely best-effort for
        # dense DAGs; under-partitioned rounds spill rather than fail,
        # and sized() caps at session parallelism anyway. sized() floors
        # tiny closures to one partition, so small inputs don't pay for
        # the conservatism.
        est = n_pairs * max_depth
        closure = sized(base, n_pairs)
        for _ in range(rounds):
            closure = sized(extend(closure), est)
        return closure

    closure = sized(base, n_pairs)
    for _ in range(max_iterations):
        extended = sized(
            extend(closure),
            n_pairs,  # sized from the previous round's measured count
        )
        n_next = extended.count()
        closure = extended
        if n_next == n_pairs:  # fixpoint: no new (node, ancestor) pairs
            break
        n_pairs = n_next
    return closure


def ancestor_arrays(closure: DataFrame) -> DataFrame:
    """Collapse the (node, ancestor) closure to one sorted array per node —
    the materialized ``ancestors`` column shape the reference stores on
    every term/taxon doc (``ontologies/obo2json.pl:113``)."""
    return closure.groupBy("node").agg(
        F.array_sort(F.collect_set("ancestor")).alias("ancestors")
    )


def _closure_single_task(
    base: DataFrame, rounds: int, pair_cap: int | None = None
) -> DataFrame:
    """Single-task path doubling for closures whose size ESTIMATE
    (n_edges · max_depth — exact for trees, heuristic for multi-parent
    DAGs) fits one task — see ``transitive_closure``. Lazy like the
    plan it replaces (one ``mapInPandas`` over the coalesced pair set,
    zero driver actions): each round is a pandas hash-merge
    (node,ancestor)⋈(ancestor,grand) unioned with the current set and
    deduped — exactly the distributed ``extend`` algebra — with an
    early break at fixpoint. ``pair_cap`` guards the heuristic: a dense
    DAG whose true closure blows past the estimate aborts with an
    actionable error instead of silently OOMing the one task; callers
    hit by it rerun with ``single_task_bound=0`` to force the
    distributed path."""
    schema = base.schema

    def kernel(batches):
        import pandas as pd

        parts = list(batches)
        df = (
            pd.concat(parts, ignore_index=True)
            if parts
            else pd.DataFrame({"node": [], "ancestor": []})
        ).drop_duplicates()
        for _ in range(rounds):
            ext = df.merge(
                df.rename(columns={"node": "ancestor", "ancestor": "__g"}),
                on="ancestor",
            )[["node", "__g"]].rename(columns={"__g": "ancestor"})
            n0 = len(df)
            df = pd.concat([df, ext], ignore_index=True).drop_duplicates()
            if pair_cap is not None and len(df) > pair_cap:
                raise RuntimeError(
                    f"transitive_closure single-task kernel: closure grew to "
                    f"{len(df)} pairs, past the {pair_cap}-pair guard — the "
                    f"n_edges*max_depth estimate undercounts this multi-parent "
                    f"DAG. Rerun with single_task_bound=0 to use the "
                    f"distributed doubling path."
                )
            if len(df) == n0:
                break
        yield df

    return base.coalesce(1).mapInPandas(kernel, schema=schema)


def _components_single_task(e: DataFrame) -> DataFrame:
    """Exact union-find for graphs under the adaptive threshold (see
    ``connected_components``). One Spark job, zero iteration rounds: the
    canonical ``(a, b)`` edge set is coalesced to a single partition and
    streamed through one Arrow kernel that computes the identical
    (vertex, min-id component) mapping with vectorized hooking + full
    path compression — ``np.minimum.at`` per sweep, O(log n) sweeps, no
    Python per-edge loop. Component ids are exact minima: ids are
    sorted-factorized so index order equals id order, hooking is
    monotone-min on indices, and at fixpoint every vertex's root is its
    component's minimum index (the min's own chain can only terminate at
    an id ≤ itself within the component)."""
    vt = e.schema["a"].dataType
    schema = StructType(
        [StructField("vertex", vt, True), StructField("component", vt, True)]
    )

    def kernel(batches):
        import numpy as np
        import pandas as pd

        parts = list(batches)
        ab = (
            pd.concat(parts, ignore_index=True)
            if parts
            else pd.DataFrame({"a": [], "b": []})
        )
        ids = np.unique(np.concatenate([ab["a"].to_numpy(), ab["b"].to_numpy()]))
        u = np.searchsorted(ids, ab["a"].to_numpy())
        v = np.searchsorted(ids, ab["b"].to_numpy())
        parent = np.arange(len(ids))
        while True:
            while True:  # full path compression by pointer doubling
                pp = parent[parent]
                if np.array_equal(pp, parent):
                    break
                parent = pp
            ru, rv = parent[u], parent[v]
            lo, hi = np.minimum(ru, rv), np.maximum(ru, rv)
            before = parent.copy()
            np.minimum.at(parent, hi, lo)  # hook: root(hi) -> min root
            if np.array_equal(parent, before):
                break  # every edge's endpoints share a root
        yield pd.DataFrame({"vertex": ids, "component": ids[parent]})

    return e.coalesce(1).mapInPandas(kernel, schema=schema)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 32,
    small_graph_threshold: int = 2_000_000,
) -> DataFrame:
    """Connected components over an undirected edge list: every vertex
    gets its component's minimum vertex id as ``component``.

    The dedup-cluster primitive (near-dup pairs → duplicate groups) and a
    general graph op the reference lacks. Alternating **large-star /
    small-star contraction** (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14) — the production-standard formulation
    with provable O(log² n) round convergence on ANY topology:

    * large-star(u): attach every neighbor v > u to
      m(u) = min(Γ(u) ∪ {u});
    * small-star(u): attach every neighbor v ≤ u, and u itself, to m(u).

    Converged when the canonical edge set stops changing; final edges
    form stars whose centers are the component minima.

    Why not min-label propagation with pointer jumping: the jump
    label(v) ← label(label(v)) is a NO-OP once labels point at local
    minima (a local min's label is itself), so that scheme degrades to
    one graph hop per round — O(diameter) rounds, measured NOT converged
    after 64 rounds on a 5,000-vertex functional graph that star
    contraction finishes in 8. Large components with long cycles
    (real dedup graphs at 100 TB) hit exactly that shape.

    Each round is two star steps — groupBy(u) min + join, both keyed
    shuffles over the (shrinking) edge table; no driver-side union-find.
    Rounds are plan-severed via ``hard_checkpoint`` (a self-referencing
    localCheckpoint would grow 2^rounds — lineage.py); convergence is
    detected EXACTLY — count equality, then a left-anti probe only on
    the round where counts match (both sides are distinct canonical
    edge sets, so equal count + empty difference ⇔ set equality). A
    checksum shortcut was rejected: the contract is exactness, and a
    sum-based digest can both collide and overflow under ANSI mode.
    Output: (vertex, component), vertices = every id in ``edges``;
    the final mapping is min-aggregated per vertex, so even a
    max_iterations bailout yields one deterministic row per vertex.

    **Adaptive strategy (AQE-style):** the canonical deduped edge count
    is measured anyway for partition sizing; when it is at most
    ``small_graph_threshold`` the graph fits ONE task (two int64 columns
    at 2M edges ≈ 32 MB) and the iterative plan's per-round job overhead
    (~30 tiny Spark jobs) dominates wall time, so a single Arrow-batched
    union-find pass computes the identical (vertex, min-id component)
    mapping in one job. Exactly Spark's own measured-size strategy pick
    (sort-merge vs broadcast under AQE): same result, different physical
    plan. Above the threshold — the 100 TB case — star contraction runs
    unchanged. Output equality of the two paths is property-tested on
    random graphs (tests/test_closure.py). Set
    ``small_graph_threshold=0`` to force the distributed path.
    """
    max_parts = edges.sparkSession.sparkContext.defaultParallelism

    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    # r15 (guide §1.2/§5): checkpoint BEFORE counting — the count used
    # to execute the caller's full edge derivation (e.g. the ER match
    # join) once for the size probe and the chosen path then recomputed
    # it from scratch. Materialized first, the count is a leaf scan and
    # both strategies consume the already-built canonical edge set.
    e = e.localCheckpoint(eager=True)
    n_edges = e.count()
    if n_edges <= small_graph_threshold:
        return _components_single_task(e)
    parts = min(max(1, n_edges // 500_000 + 1), max_parts)
    e = hard_checkpoint(e.repartition(parts))
    verts = hard_checkpoint(
        e.select(F.col("a").alias("v"))
        .unionByName(e.select(F.col("b").alias("v")))
        .distinct()
        .repartition(parts)
    )

    def star(e: DataFrame, large: bool) -> DataFrame:
        sym = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
            e.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        mins = sym.groupBy("u").agg(F.min("v").alias("__mn"))
        mins = mins.select("u", F.least("__mn", F.col("u")).alias("m"))
        j = sym.join(mins, "u")
        if large:
            out = j.filter(F.col("v") > F.col("u")).select(
                F.col("v").alias("x"), F.col("m").alias("y")
            )
        else:
            out = (
                j.filter(F.col("v") <= F.col("u"))
                .select(F.col("v").alias("x"), F.col("m").alias("y"))
                .unionByName(
                    mins.select(F.col("u").alias("x"), F.col("m").alias("y"))
                )
            )
        return (
            out.filter(F.col("x") != F.col("y"))
            .select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
            .distinct()
        )

    prev: DataFrame | None = None
    prev_count = -1
    for _ in range(max_iterations):
        e = hard_checkpoint(star(star(e, large=True), large=False).repartition(parts))
        c = e.count()
        # exact stability: both sides are distinct canonical (a<b) sets,
        # so equal cardinality + empty set-difference ⇔ equality. The
        # anti-join probe runs only on count-match rounds (in practice,
        # once), and limit(1) short-circuits it.
        if (
            c == prev_count
            and prev is not None
            and e.join(prev, ["a", "b"], "left_anti").limit(1).count() == 0
        ):
            break
        prev, prev_count = e, c

    return (
        verts.join(
            e.select(F.col("b").alias("v"), F.col("a").alias("__comp")), "v", "left"
        )
        .groupBy("v")
        .agg(F.min(F.coalesce(F.col("__comp"), F.col("v"))).alias("component"))
        .select(F.col("v").alias("vertex"), "component")
    )


def most_specific(annotations: DataFrame, closure: DataFrame, entity: str, term: str) -> DataFrame:
    """U3 — most-specific-annotation split.

    Reference: ``search/ancestor_adder.js:56-78`` — an entity annotated
    with both a term and that term's ancestor keeps only the descendant in
    ``entries`` (the ancestor moves to the derived ``ancestors`` set).

    Spark-first: anti-join the annotation set against the ancestors of the
    entity's own terms: a term survives unless some *other* annotated term
    of the same entity has it as an ancestor.
    """
    implied = (
        annotations.alias("a")
        .join(closure.alias("c"), F.col(f"a.{term}") == F.col("c.node"))
        .select(F.col(f"a.{entity}").alias(entity), F.col("c.ancestor").alias(term))
        .distinct()
    )
    return annotations.join(implied, [entity, term], "left_anti")


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = 1_000_000,
) -> DataFrame:
    """Integer-exact fixed-iteration PageRank over a directed edge list —
    the link-graph quality prior a web-scale curation pipeline ranks
    hosts/pages with. Third iterative graph op next to
    ``transitive_closure`` and ``connected_components`` (the reference
    has no graph-rank operator; this is extension surface).

    Every quantity is int64 and every step is integer arithmetic, so the
    result is bit-identical on any engine and any partitioning:

    * ``rank_0(v) = scale`` for every vertex;
    * ``rank_{i+1}(v) = (100 - damping_pct) * scale / 100
      + Σ_{u→v} (rank_i(u) * damping_pct) div (100 * outdeg(u))``
      with truncating integer division (both operands positive, so
      Spark ``div`` and DuckDB ``//`` agree exactly).

    Integer sums are order-independent — no float accumulation surface.
    Dangling vertices (no out-edges) simply leak their damped mass
    (documented simplification: curation uses the RANKING, and the
    uniform teleport term keeps every vertex scored; redistribution
    would add an all-to-one broadcast per round for no ordering gain
    on real link graphs).

    Scale shape (100 TB link graph): ``edges`` is hash-partitioned on
    ``src`` ONCE and checkpointed; each round is one join of the
    vertex-sized rank table into that layout (ranks are the small,
    re-shuffled side) plus one ``groupBy(dst)`` sum with map-side
    partial aggregation — the canonical two-shuffle PageRank round.
    Rank tables are vertex-sized (two int64 columns), orders of
    magnitude smaller than the edge set; rounds compose LAZILY (each
    round references the previous rank table once, so plan growth is
    linear — one Spark job total), severing via ``hard_checkpoint``
    only every 4th round for large ``iterations`` (lineage.py).
    Overflow headroom: total mass ≤ n_vertices ×
    scale, so int64 holds up to ~9e12 vertices at the default scale.

    Output: (``vertex`` long, ``rank_micros`` long) — one row per vertex
    appearing anywhere in ``edges``.
    """
    max_parts = edges.sparkSession.sparkContext.defaultParallelism
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct()
    n_edges = e.count()
    parts = min(max(1, n_edges // 500_000 + 1), max_parts)
    # plain localCheckpoint ON PURPOSE (not hard_checkpoint): this is a
    # single pre-loop checkpoint — the exponential retained-plan growth
    # (lineage.py) needs an ITERATED checkpoint whose round plan
    # references the previous checkpoint twice, which never happens to
    # the edge table. And localCheckpoint preserves outputPartitioning,
    # so the per-round join sees edges already hashed on "u" and only
    # the vertex-sized rank table moves; hard_checkpoint would drop
    # that metadata and re-shuffle the (100 TB) edge side every round.
    # r15: the out-degree rides INSIDE the one-time edge checkpoint (a
    # window over the same hash(u) partitioning — no extra exchange), so
    # a round no longer recomputes/joins the degree table: before, each
    # round's plan re-derived deg from e (one groupBy exchange + one join
    # per round; ReusedExchange collapses duplicates within a job but not
    # the join itself). A checkpoint-first/AQE-sized variant was tried
    # and REVERTED (r15 A/B): the count-based sizing collapses small
    # graphs to few partitions, which beats paying 32-task rounds
    # (x_pagerank_hosts 1.03→1.45 s under the flip).
    from pyspark.sql import Window as _W

    e = (
        e.repartition(parts, "u")
        .withColumn("outdeg", F.count("*").over(_W.partitionBy("u")))
        .localCheckpoint(eager=True)
    )
    verts = (
        e.select("u")
        .unionByName(e.select(F.col("v").alias("u")))
        .distinct()
        .repartition(parts)
        .localCheckpoint(eager=True)
    )

    base = (100 - damping_pct) * scale // 100
    ranks = verts.select("u", F.lit(scale).cast("long").alias("pr"))
    for it in range(iterations):
        contrib = (
            e.join(ranks, "u")
            .select(
                "v",
                F.expr(f"(pr * {damping_pct}) div (100 * outdeg)").alias("c"),
            )
            .groupBy("v")
            .agg(F.sum("c").alias("c"))
        )
        ranks = (
            verts.join(contrib, verts["u"] == contrib["v"], "left")
            .select(
                "u",
                (F.lit(base) + F.coalesce(F.col("c"), F.lit(0)))
                .cast("long")
                .alias("pr"),
            )
        )
        # r15: rounds compose LAZILY — each round references the previous
        # rank table exactly once (never a self-join), so plan growth is
        # linear and all `iterations` rounds run as ONE Spark job instead
        # of one hard_checkpoint action + round-robin repartition each
        # (guide §1.2/§5). Past 4 rounds, sever every 4th so a large
        # `iterations` cannot buy quadratic analysis cost (lineage.py).
        if (it + 1) % 4 == 0 and (it + 1) < iterations:
            ranks = hard_checkpoint(ranks.repartition(parts))
    return ranks.select(
        F.col("u").alias("vertex"), F.col("pr").alias("rank_micros")
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
) -> DataFrame:
    """Synchronous deterministic label-propagation community detection
    (Raghavan et al. 2007, made engine-exact) over an undirected graph
    — the cheap community pass a link-graph curation pipeline runs
    beside PageRank (rank says how IMPORTANT a host is; communities
    say which hosts move together — mirror farms, boilerplate rings).

    Determinism (classic LPA is run-order-dependent; this variant is
    bit-identical on any engine/partitioning):

    * the graph is symmetrized (both directions, self-loops dropped);
    * ``label_0(v) = v``;
    * each round, EVERY vertex simultaneously adopts the most frequent
      label among its neighbors, ties broken by SMALLEST label — an
      integer argmin over exact counts, no randomness, no visit order;
    * fixed ``iterations`` rounds (fixpoint detection costs a count
      action per round; fixed-round is the bounded-latency form, same
      contract as :func:`pagerank`).

    Scale shape: the symmetrized edge list partitions on the message
    target once and checkpoints; each round is one join of the
    vertex-sized label table into that layout plus one
    ``groupBy(vertex, label)`` count and a vertex-keyed argmax window.
    Honest cost: the message stream between the join and the count is
    EDGE-sized pre-combine — map-side partials shrink it only where a
    vertex's neighbors repeat labels within a partition (late rounds,
    once communities form; round 1 moves ~|E| rows) — so the per-round
    exchange is bounded by the edge count, not the vertex count; the
    edge SET itself still never re-shuffles. Plan growth per round is
    linear (each round references the previous once); rounds ≤ 8 run on
    one lazy plan, and past that the label table hard-checkpoints every
    8 rounds so analysis cost can't go quadratic in ``iterations``.
    Measured (SCALE.md fifteenth probe): 10× edges → wall ×2.32
    (α≈0.37); 17 rounds vs 3 → ×5.85, at the linear-in-rounds ceiling.

    Output: ``(vertex, community)`` — one row per vertex appearing
    anywhere in ``edges``; ``community`` is a member vertex id (the
    propagated min-tie label), stable across engines.
    """
    from pyspark.sql import Window

    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).filter(
        F.col("u") != F.col("v")
    )
    und = (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)  # reused every round; pin the spread
    )
    labels = und.select(F.col("u").alias("vx")).distinct().select(
        "vx", F.col("vx").alias("lbl")
    )
    w = Window.partitionBy("vx").orderBy(F.desc("__c"), F.asc("lbl"))
    for r in range(int(iterations)):
        msgs = und.join(
            labels.withColumnRenamed("vx", "v"), "v"
        ).select(F.col("u").alias("vx"), "lbl")
        counts = msgs.groupBy("vx", "lbl").agg(F.count(F.lit(1)).alias("__c"))
        labels = (
            counts.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("vx", "lbl")
        )
        # linear plan growth is fine at small fixed round counts, but a
        # caller raising `iterations` must not buy quadratic analysis
        # cost: sever the label lineage every 8 rounds (not each round —
        # checkpoints cost an action; see lineage.py for the failure
        # mode this guards)
        if (r + 1) % 8 == 0 and (r + 1) < int(iterations):
            labels = hard_checkpoint(labels)
    return labels.select(
        F.col("vx").alias("vertex"), F.col("lbl").alias("community")
    )


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Global triangle count over an undirected graph (edge list in
    either/both directions; self-loops ignored) — the clustering-
    coefficient / community-structure primitive, fourth graph op beside
    closure, components and pagerank.

    Degree-ordered edge orientation, the standard distributed-triangle
    trick: orient every edge from the (degree, id)-smaller endpoint to
    the larger, so each triangle is counted EXACTLY once (its
    order-minimal vertex is the unique apex with two out-edges) and the
    wedge join fans out from low-degree vertices only — total wedge
    volume is O(m^1.5) regardless of hub skew, vs O(Σ deg²) for naive
    wedge counting (a single celebrity hub would otherwise explode).

    Plan: dedup to canonical undirected pairs (one shuffle), vertex-
    sized degree table joined back (broadcastable), wedge self-join on
    the apex (one shuffle on the oriented source), closing-edge
    semi-join on the canonical pair key (one shuffle). No iteration.

    Output: one row (n_triangles, n_wedges) — both exact BIGINTs.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("v"))
        .unionByName(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    with_deg = (
        und.join(deg.select(F.col("v").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("d").alias("db")), "b")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    orient = with_deg.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("s"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("t"),
    )
    o1 = orient.select(F.col("s"), F.col("t").alias("x"))
    o2 = orient.select(F.col("s"), F.col("t").alias("y"))
    wedges = o1.join(o2, "s").filter(F.col("x") < F.col("y"))
    closed = wedges.join(
        und,
        (F.least("x", "y") == F.col("a")) & (F.greatest("x", "y") == F.col("b")),
        "left_semi",
    )
    n_wedges = wedges.agg(F.count(F.lit(1)).cast("long").alias("n")).select("n")
    n_tri = closed.agg(F.count(F.lit(1)).cast("long").alias("n")).select("n")
    return n_tri.select(F.col("n").alias("n_triangles")).crossJoin(
        n_wedges.select(F.col("n").alias("n_wedges"))
    )


def bfs_distance(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 8,
) -> DataFrame:
    """Multi-source BFS hop distance over a directed edge list: every
    vertex reachable from ANY source within ``max_hops`` gets its
    MINIMUM hop count (sources themselves get 0). The fourth graph op
    (closure / components / pagerank / distance) — "how far is this
    page from the trusted seed set" is the standard link-graph
    trust/quality feature next to PageRank.

    ``sources`` is a one-column DataFrame of seed vertex ids. Vertices
    not reached within the bound are absent from the output (no
    sentinel distances — absence IS the statement).

    Frontier iteration, the textbook distributed-BFS shape:

    * edges are hash-partitioned on ``src`` ONCE and localCheckpointed
      (partitioning-preserving — the PageRank precedent: only the
      frontier, which is vertex-sized and usually much smaller, moves
      per round);
    * round h: ``frontier ⋈ edges`` → neighbor set, anti-join against
      the visited table, tag with distance h;
    * visited and frontier are ``hard_checkpoint``-severed each round —
      both are self-referenced by the next round (the anti-join AND the
      union), exactly the iterated-self-reference shape that makes a
      plain localCheckpoint's retained plan double per round
      (lineage.py);
    * terminate when the frontier empties (one count action per round —
      the same action drives the eager checkpoint, so rounds cost one
      job each).

    Exactly-min-distance correctness: a vertex enters ``visited`` the
    FIRST round it is reached, and the anti-join prevents any later
    (longer) distance from overwriting it — BFS's invariant, no
    min-aggregation needed.

    Output: (``vertex``, ``dist``), dist ∈ [0, max_hops].
    """
    max_parts = edges.sparkSession.sparkContext.defaultParallelism
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct()
    n_edges = e.count()
    parts = min(max(1, n_edges // 500_000 + 1), max_parts)
    e = e.repartition(parts, "u").localCheckpoint(eager=True)

    seed_col = sources.columns[0]
    visited = hard_checkpoint(
        sources.select(F.col(seed_col).alias("u"))
        .distinct()
        .withColumn("d", F.lit(0).cast("long"))
        .repartition(parts)
    )
    # r15 (guide §5.4): `visited` is kept as a lazy union of the
    # per-round checkpointed DELTAS instead of being re-materialized in
    # full each hop — every leaf is a checkpoint, so plan growth stays
    # linear and the anti-join still shuffles the same bytes, but the
    # O(|visited|) checkpoint REWRITE per round is gone (one checkpoint
    # per hop, not two; at h hops the old form rewrote the growing
    # visited table h times ≈ O(V·h) extra writes).
    deltas = [visited]
    frontier = visited
    for hop in range(1, max_hops + 1):
        vis_all = reduce(DataFrame.unionByName, (d.select("u") for d in deltas))
        nxt = hard_checkpoint(
            frontier.select("u")
            .join(e, "u")
            .select(F.col("v").alias("u"))
            .distinct()
            .join(vis_all, "u", "left_anti")
            .withColumn("d", F.lit(hop).cast("long"))
            .repartition(parts)
        )
        if nxt.limit(1).count() == 0:
            break
        deltas.append(nxt)
        frontier = nxt
    visited = reduce(DataFrame.unionByName, deltas)
    return visited.select(F.col("u").alias("vertex"), F.col("d").alias("dist"))


def labeled_bfs(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    label: str = "label",
    vertex: str = "vertex",
    max_hops: int = 8,
    detect_empty: bool = True,
) -> DataFrame:
    """Per-SOURCE multi-source BFS: for every (label, seed vertex) row in
    ``sources``, every vertex reachable from that seed within
    ``max_hops`` gets its MINIMUM hop count *for that label* (the seed
    itself gets 0). :func:`bfs_distance` collapses all seeds into one
    global frontier — the right shape for "distance to the trusted
    set"; this keeps the label so N independent traversals share ONE
    edge partitioning and ONE frontier join per round instead of N
    driver-side loops. It is the kernel under the Mongo
    ``$graphLookup`` shim (documents.py), where the label is the
    per-document ``startWith`` value (the reference materializes
    ancestor closures for exactly this access pattern —
    ``ontologies/obo2json.pl:100-113``, ``trees/taxonomy.js:13-28``).

    Same frontier/visited/anti-join shape as :func:`bfs_distance`
    (see its docstring for the checkpoint rationale); state is keyed on
    (label, vertex), so the per-round cost is O(frontier ⋈ edges) —
    edges are hash-partitioned on ``src`` once, the (label, vertex)
    frontier is what moves. Worst case the visited table is
    |labels| × |reachable set|; the callers bound that with
    ``max_hops`` (Mongo's maxDepth) exactly as Mongo itself does.

    ``detect_empty=False`` skips the per-round empty-frontier count —
    one Spark action saved per hop. Right when ``max_hops`` is a HARD
    bound the caller means to pay in full (Mongo's maxDepth): a
    frontier that empties early just makes the remaining rounds cheap
    empty jobs, the same bounded-contract trade as
    transitive_closure's ``max_depth``.

    Output: (``label``, ``vertex``, ``dist``), dist ∈ [0, max_hops].
    """
    max_parts = edges.sparkSession.sparkContext.defaultParallelism
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct()
    n_edges = e.count()
    parts = min(max(1, n_edges // 500_000 + 1), max_parts)
    e = e.repartition(parts, "u").localCheckpoint(eager=True)

    visited = hard_checkpoint(
        sources.select(F.col(label).alias("lbl"), F.col(vertex).alias("u"))
        .distinct()
        .withColumn("d", F.lit(0).cast("long"))
        .repartition(parts)
    )
    # r15 (guide §5.4): per-round deltas as checkpointed leaves, lazily
    # unioned for the anti-join — see bfs_distance for the rationale
    # (one checkpoint per hop instead of two, no O(|visited|) rewrite).
    deltas = [visited]
    frontier = visited
    for hop in range(1, max_hops + 1):
        vis_all = reduce(
            DataFrame.unionByName, (d.select("lbl", "u") for d in deltas)
        )
        nxt = hard_checkpoint(
            frontier.select("lbl", "u")
            .join(e, "u")
            .select("lbl", F.col("v").alias("u"))
            .distinct()
            .join(vis_all, ["lbl", "u"], "left_anti")
            .withColumn("d", F.lit(hop).cast("long"))
            .repartition(parts)
        )
        if detect_empty and nxt.limit(1).count() == 0:
            break
        deltas.append(nxt)
        frontier = nxt
    visited = reduce(DataFrame.unionByName, deltas)
    return visited.select(
        F.col("lbl").alias(label), F.col("u").alias(vertex), F.col("d").alias("dist")
    )
