"""Tree kernels (SURVEY.md §2.10 K1-K4, K8, K9) — grouped-map operators.

The reference stores gene/species trees as nested-set adjacency rows
(``tree_id, node_id, parent_id, left_index, right_index``; leaves carry
gene fields — `trees/genetree.js:338-371`) and runs per-tree algorithms
on an in-memory object graph. Engine-native representation here is the
**relational adjacency form**: all inter-tree parallelism comes free
(one Spark task per group of trees), and per-tree work runs in
vectorized pandas via ``applyInPandas`` — trees are small (≤ a few
thousand nodes), so a group always fits comfortably in a task.

Scale notes:
* one shuffle on ``tree_id`` feeds every kernel; millions of trees
  spread over executors, stragglers handled by AQE.
* scoring (K3's heuristics) is pure column expressions BEFORE the
  grouped kernel, so the JVM does the regex work and the pandas kernel
  only propagates numbers.
* nested JSON (K8) is a *sink* format: compute stays relational.
"""

from __future__ import annotations

import json

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# K9 — pruning
# ---------------------------------------------------------------------------

def prune_malformed_leaves(nodes: DataFrame) -> DataFrame:
    """Drop leaves whose nested-set span is inconsistent (K9).

    Reference: `trees/genetree.js:102-115` drops leaves where
    ``left_index + 1 < right_index`` (a "leaf" that claims a subtree).
    """
    is_leaf = F.col("gene_stable_id").isNotNull()
    malformed = is_leaf & (F.col("left_index") + 1 < F.col("right_index"))
    return nodes.filter(~malformed)


def subtree_gene_counts(nodes: DataFrame) -> DataFrame:
    """Per-node count of gene leaves in its subtree, via nested-set
    containment (leaf.left between node.left and node.right).

    Reference: the zero-gene-subtree prune of `trees/speciesTree.js:221-228`
    and num_genes rollups.

    Implemented as a SWEEP, not a containment join: nested-set positions
    are unique per tree, so the leaf count inside [left, right] is the
    difference of two prefix counts — cum(right) − cum(left−1), where
    cum is a running count of leaf positions in index order. Leaves emit
    (+pos) markers, every node emits two prefix queries (sign ±1), one
    window per tree computes the running count, one groupBy finishes.
    O(n log n) per tree and ONE shuffle total — the old per-tree
    |nodes|×|leaves| join collapsed on a 100×-skewed super-tree
    (SURVEY §7 risk 4); a super-tree now costs just its own sort.
    """
    from pyspark.sql import Window

    leaves = nodes.filter(F.col("gene_stable_id").isNotNull()).select(
        "tree_id",
        F.col("left_index").alias("pos"),
        F.lit(1).alias("is_leaf"),
        F.lit(None).cast(nodes.schema["node_id"].dataType).alias("qnode"),
        F.lit(0).alias("sign"),
    )
    base = nodes.select("tree_id", "node_id", "left_index", "right_index")
    q_hi = base.select(
        "tree_id",
        F.col("right_index").alias("pos"),
        F.lit(0).alias("is_leaf"),
        F.col("node_id").alias("qnode"),
        F.lit(1).alias("sign"),
    )
    q_lo = base.select(
        "tree_id",
        (F.col("left_index") - 1).alias("pos"),
        F.lit(0).alias("is_leaf"),
        F.col("node_id").alias("qnode"),
        F.lit(-1).alias("sign"),
    )
    events = leaves.unionByName(q_hi).unionByName(q_lo)
    # leaves sort before queries at the same position, so a query at pos
    # p sees cum(≤ p) — and the lo query at left−1 therefore cum(< left)
    w = Window.partitionBy("tree_id").orderBy(
        F.col("pos"), F.col("is_leaf").desc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    counts = (
        events.withColumn("cum", F.sum("is_leaf").over(w))
        .filter(F.col("qnode").isNotNull())
        .groupBy("tree_id", F.col("qnode").alias("node_id"))
        .agg(F.sum(F.col("sign") * F.col("cum")).alias("subtree_gene_count"))
    )
    return nodes.join(counts, ["tree_id", "node_id"], "left")


def prune_zero_gene_subtrees(nodes: DataFrame) -> DataFrame:
    """K9 — remove whole subtrees containing no gene leaves."""
    return subtree_gene_counts(nodes).filter(F.col("subtree_gene_count") > 0)


# ---------------------------------------------------------------------------
# K3 — leaf scoring (column expressions) + representative min-propagation
# ---------------------------------------------------------------------------

#: description patterns marking a low-information gene (reference's
#: bad-word heuristics, `trees/genetree.js:153-176`)
BAD_DESCRIPTION = (
    r"(?i)(projected|unknown|uncharacterized|hypothetical|predicted|"
    r"putative|expressed|conserved)"
)

#: model-species taxa preferred as representatives (`trees/genetree.js:177-190`
#: boosts a fixed set of reference genomes; arabidopsis=3702, rice=39947,
#: maize=4577, sorghum=4558)
MODEL_TAXA = (3702, 39947, 4577, 4558)


def score_leaves(nodes: DataFrame) -> DataFrame:
    """K3 scoring — lower is better (reference: curated −500 … bad +100,
    `trees/genetree.js:136-198`). Pure column expressions so the JVM does
    all regex work; the grouped kernel below only propagates numbers.

    Adds ``rep_score`` (null on branch nodes).
    """
    is_leaf = F.col("gene_stable_id").isNotNull()
    desc = F.col("gene_description")
    label = F.col("gene_display_label")
    score = (
        F.lit(0)
        + F.when(desc.isNull() | desc.rlike(BAD_DESCRIPTION), 100).otherwise(0)
        + F.when(label.isNotNull() & (label != F.col("gene_stable_id")), -10).otherwise(0)
        + F.when(F.col("taxon_id").isin(*MODEL_TAXA), -50).otherwise(0)
    )
    return nodes.withColumn(
        "rep_score", F.when(is_leaf, score).otherwise(F.lit(None).cast("int"))
    )


_REP_UP_SCHEMA = (
    "tree_id STRING, node_id BIGINT, rep_gene_id STRING, rep_score DOUBLE"
)

_REP_UP_DIST_SCHEMA = _REP_UP_SCHEMA + ", rep_dist DOUBLE"

_REP_COLS = [
    "tree_id", "node_id", "parent_id", "right_index",
    "distance_to_parent", "gene_stable_id", "rep_score",
]


def _grouped_by_tree(df: DataFrame, kernel, schema, batch_groups: int | None):
    """Run a per-tree pandas kernel via ``applyInPandas``.

    ``batch_groups=None`` → one Spark group per tree (the default; right
    when trees are big or few). With ``batch_groups=N`` the shuffle key
    becomes ``hash(tree_id) % N`` and ONE kernel call loops over every
    tree in its batch — amortizing the per-group Arrow/pandas fixed cost
    that dominates for corpora of TINY trees (SCALE.md round-8 probe:
    the same 150k rows cost 1.9× more in 2500 60-row groups than in 250
    600-row groups). Per-tree results are bit-identical: the kernels
    are pure per-tree functions and the loop re-groups on the exact
    ``tree_id``. Pick N ≈ 2-4× the cluster's cores."""
    if batch_groups is None:
        return df.groupBy("tree_id").applyInPandas(kernel, schema)

    def batched(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.drop(columns="__batch")
        return pd.concat(
            [kernel(g) for _, g in pdf.groupby("tree_id", sort=False)],
            ignore_index=True,
        )

    return (
        df.withColumn(
            "__batch", F.pmod(F.xxhash64("tree_id"), F.lit(batch_groups))
        )
        .groupBy("__batch")
        .applyInPandas(batched, schema)
    )


def _rep_kernel(emit_dist: bool):
    """Bottom-up min-propagation pass (post-order = ascending right_index;
    children always precede parents in nested-set order). ``emit_dist``
    additionally outputs the accumulated branch distance so sharded runs
    can recombine subtree results at the root with the SAME comparator."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("right_index")
        best: dict[int, tuple[float, float, str]] = {}  # node -> (score, dist, gene)
        out = []
        for row in pdf.itertuples(index=False):
            if row.gene_stable_id is not None and not pd.isna(row.gene_stable_id):
                cand = (float(row.rep_score), 0.0, row.gene_stable_id)
            else:
                cand = best.get(row.node_id, (float("inf"), float("inf"), None))
            best[row.node_id] = cand
            out.append(
                (row.tree_id, row.node_id, cand[2], cand[0], cand[1])
                if emit_dist
                else (row.tree_id, row.node_id, cand[2], cand[0])
            )
            # offer this node's best to its parent, penalized by distance
            if row.parent_id is not None and not pd.isna(row.parent_id):
                d = 0.0 if pd.isna(row.distance_to_parent) else float(row.distance_to_parent)
                lifted = (cand[0], cand[1] + d, cand[2])
                parent = int(row.parent_id)
                cur = best.get(parent)
                if cur is None or (lifted[0], lifted[1], lifted[2] or "") < (
                    cur[0], cur[1], cur[2] or ""
                ):
                    best[parent] = lifted
        columns = ["tree_id", "node_id", "rep_gene_id", "rep_score"]
        if emit_dist:
            columns.append("rep_dist")
        return pd.DataFrame(out, columns=columns)

    return kernel


def select_representatives(
    scored: DataFrame,
    max_group_nodes: int | None = None,
    batch_groups: int | None = None,
) -> DataFrame:
    """K3 — propagate the best (min score, then min accumulated branch
    distance, then lexicographic gene id) leaf to every ancestor node.

    Reference: `trees/genetree.js:120-246` walks each tree bottom-up;
    one ``applyInPandas`` group per tree.

    ``max_group_nodes`` is the SUPER-TREE GUARD (SURVEY §7 risk 4 — the
    reference's upstream splits oversized sibling trees for the same
    reason, `trees/speciesTree.js:27-29`): trees above the cap are
    sharded at the root's children — each child subtree becomes its own
    grouped-map task (bottom-up propagation never looks outside a
    subtree, so per-node results are bit-identical) — and the root's
    pick is recombined relationally as the argmin over child
    representatives lifted by their branch distance, the exact
    comparator the kernel applies. A 100×-skewed tree thus spreads over
    ~fanout tasks instead of one straggler.

    ``batch_groups`` (tiny-tree corpora only, exclusive with
    ``max_group_nodes``): run many trees per Spark group — see
    ``_grouped_by_tree``.

    Output: (tree_id, node_id, rep_gene_id, rep_score) for every node.
    """
    if max_group_nodes is None:
        return _grouped_by_tree(
            scored.select(*_REP_COLS),
            _rep_kernel(False),
            _REP_UP_SCHEMA,
            batch_groups,
        )

    from pyspark.sql import Window

    base = scored.select(*_REP_COLS, "left_index")

    sizes = base.groupBy("tree_id").agg(F.count(F.lit(1)).alias("__n"))
    big = sizes.filter(F.col("__n") > max_group_nodes).select(
        "tree_id", F.lit(True).alias("__big")
    )
    flagged = base.join(F.broadcast(big), "tree_id", "left")
    small_out = (
        flagged.filter(F.col("__big").isNull())
        .drop("__big")
        .groupBy("tree_id")
        .applyInPandas(_rep_kernel(False), schema=_REP_UP_SCHEMA)
    )

    bigt = flagged.filter(F.col("__big").isNotNull()).drop("__big")
    roots = bigt.filter(F.col("parent_id").isNull())
    root_ids = roots.select("tree_id", F.col("node_id").alias("__root_id"))
    nonroot = bigt.join(F.broadcast(root_ids), "tree_id").filter(
        F.col("parent_id").isNotNull()
    )

    # shard assignment via a sweep: the root's children tile the root's
    # span, so a node's owning child is the last child whose left_index
    # precedes (or equals) its own — one window, no containment join
    node_t = base.schema["node_id"].dataType
    markers = nonroot.filter(F.col("parent_id") == F.col("__root_id")).select(
        "tree_id",
        F.col("left_index").alias("__pos"),
        F.col("node_id").alias("__marker"),
        *[F.lit(None).cast(base.schema[c].dataType).alias(c) for c in _REP_COLS if c != "tree_id"],
    )
    node_rows = nonroot.select(
        "tree_id",
        F.col("left_index").alias("__pos"),
        F.lit(None).cast(node_t).alias("__marker"),
        *[c for c in _REP_COLS if c != "tree_id"],
    )
    sweep_w = Window.partitionBy("tree_id").orderBy(
        F.col("__pos"), F.col("__marker").isNull()
    ).rowsBetween(Window.unboundedPreceding, 0)
    sharded = (
        markers.unionByName(node_rows)
        .withColumn("__shard", F.last("__marker", ignorenulls=True).over(sweep_w))
        .filter(F.col("node_id").isNotNull())
    )
    shard_out = (
        sharded.select(*_REP_COLS, "__shard")
        .groupBy("tree_id", "__shard")
        .applyInPandas(_rep_kernel(True), schema=_REP_UP_DIST_SCHEMA)
    )

    # root recombination: child reps lifted by their branch distance,
    # argmin on the kernel's (score, dist, gene) comparator; a leaf root
    # (degenerate) keeps its own gene, as in the kernel
    child_d = nonroot.filter(F.col("parent_id") == F.col("__root_id")).select(
        "tree_id",
        "node_id",
        F.coalesce("distance_to_parent", F.lit(0.0)).alias("__d"),
    )
    cands = shard_out.join(child_d, ["tree_id", "node_id"]).select(
        "tree_id",
        "rep_gene_id",
        "rep_score",
        (F.col("rep_dist") + F.col("__d")).alias("__lifted"),
    )
    pick_w = Window.partitionBy("tree_id").orderBy(
        "rep_score", "__lifted", F.coalesce("rep_gene_id", F.lit(""))
    )
    picked = (
        cands.withColumn("__rn", F.row_number().over(pick_w))
        .filter(F.col("__rn") == 1)
        .select(
            "tree_id",
            F.col("rep_gene_id").alias("__pick_gene"),
            F.col("rep_score").alias("__pick_score"),
        )
    )
    is_leaf_root = F.col("gene_stable_id").isNotNull()
    root_out = (
        roots.join(picked, "tree_id", "left")
        .select(
            "tree_id",
            "node_id",
            F.when(is_leaf_root, F.col("gene_stable_id"))
            .otherwise(F.col("__pick_gene")).alias("rep_gene_id"),
            F.when(is_leaf_root, F.col("rep_score").cast("double"))
            .otherwise(F.col("__pick_score")).alias("rep_score"),
        )
    )
    return small_out.unionByName(shard_out.drop("rep_dist")).unionByName(root_out)


# ---------------------------------------------------------------------------
# K4 — representative push-down + duplication taxon sets (leaf summary)
# ---------------------------------------------------------------------------

_LEAF_SUMMARY_SCHEMA = (
    "tree_id STRING, gene_stable_id STRING, rep_gene_id STRING, "
    "ath_rep_gene_id STRING, duplication_taxa ARRAY<BIGINT>"
)

ARABIDOPSIS_TAXON = 3702


def assign_leaf_summaries(
    scored: DataFrame,
    reps: DataFrame | None = None,
    inherit_factor: float = 0.8,
    min_duplication_confidence: float = 0.5,
    batch_groups: int | None = None,
) -> DataFrame:
    """K4 — per-leaf summary table (`search/genetree_adder.js:113-252`):

    * ``rep_gene_id``: root→leaf walk; a child keeps the parent's
      representative when the parent's score is within
      ``inherit_factor`` of its own best (the reference's 0.8 rule),
      so near-equivalent subtrees agree on one representative.
    * ``ath_rep_gene_id``: same propagation restricted to Arabidopsis
      leaves (taxon 3702 / the reference's ``^AT`` test).
    * ``duplication_taxa``: taxon ids of ancestor duplication nodes with
      confidence > ``min_duplication_confidence``
      (`search/genetree_adder.js:157-173`).

    Pre-order = ascending ``left_index`` (parents precede children), so
    one linear pass per tree with a node→state map.

    ``reps=None`` (r15 optimization, guide §4: one Python pass instead
    of two) runs the SAME bottom-up rep kernel in-process on each tree
    before the summary walk — bit-identical per-node (rep_gene_id,
    rep_score) by construction (it calls ``_rep_kernel`` on the same
    rows), but skips one grouped-map exchange, one Arrow round-trip and
    the (tree_id, node_id) join. Pass an explicit ``reps`` when the
    rep table was computed with super-tree sharding
    (:func:`select_representatives` ``max_group_nodes``) — the fused
    path is per-tree only.
    """
    fused = reps is None
    if fused:
        joined = scored
    else:
        # reps carries the propagated (double) rep_score; drop the
        # leaf-only int score from `scored` to avoid an ambiguous column
        # after the join
        joined = scored.drop("rep_score").join(
            reps, ["tree_id", "node_id"], "left"
        )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        if fused:
            rep_out = _rep_kernel(False)(pdf[_REP_COLS])
            pdf = pdf.drop(columns=["rep_score"]).merge(
                rep_out.drop(columns=["tree_id"]), on="node_id", how="left"
            )
        pdf = pdf.sort_values("left_index")
        # node_id -> (eff_rep, eff_score, ath_rep, dup_taxa_tuple)
        state: dict[int, tuple] = {}
        # per-node best arabidopsis leaf, from a bottom-up pass first
        ath_best: dict[int, tuple[float, str]] = {}
        for row in pdf.sort_values("right_index").itertuples(index=False):
            is_ath_leaf = (
                row.gene_stable_id is not None
                and not pd.isna(row.gene_stable_id)
                and int(row.taxon_id) == ARABIDOPSIS_TAXON
            )
            if is_ath_leaf:
                cand = (float(row.rep_score), row.gene_stable_id)
            else:
                cand = ath_best.get(row.node_id, (float("inf"), None))
            ath_best[row.node_id] = cand
            if row.parent_id is not None and not pd.isna(row.parent_id):
                parent = int(row.parent_id)
                cur = ath_best.get(parent)
                if cur is None or (cand[0], cand[1] or "") < (cur[0], cur[1] or ""):
                    ath_best[parent] = cand

        out = []
        for row in pdf.itertuples(index=False):
            own = (row.rep_gene_id, float(row.rep_score) if not pd.isna(row.rep_score) else float("inf"))
            ath_own = ath_best.get(row.node_id, (float("inf"), None))
            if row.parent_id is None or pd.isna(row.parent_id):
                eff, ath, dups = own, (ath_own[1], ath_own[0]), ()
            else:
                p_eff, p_score, p_ath, p_dups = state[int(row.parent_id)]
                # inherit when the parent's pick beats ours by the factor
                # margin (scores are signed, lower=better: for positive own
                # scores the reference's "within 0.8×" rule applies
                # directly; for already-good negative scores the margin is
                # applied to the magnitude)
                threshold = (
                    inherit_factor * own[1] if own[1] > 0 else own[1] / inherit_factor
                )
                if own[0] is None or p_score <= threshold:
                    eff = (p_eff, p_score)
                else:
                    eff = own
                ath = (p_ath, float("-inf")) if p_ath is not None else (ath_own[1], ath_own[0])
                dups = p_dups
            is_dup = (
                row.node_type == "duplication"
                and row.duplication_confidence_score is not None
                and not pd.isna(row.duplication_confidence_score)
                and float(row.duplication_confidence_score) > min_duplication_confidence
            )
            if is_dup:
                dups = dups + (int(row.taxon_id),)
            state[int(row.node_id)] = (eff[0], eff[1], ath[0], dups)
            if row.gene_stable_id is not None and not pd.isna(row.gene_stable_id):
                out.append(
                    (
                        row.tree_id,
                        row.gene_stable_id,
                        eff[0],
                        ath[0],
                        sorted(set(dups)),
                    )
                )
        return pd.DataFrame(
            out,
            columns=[
                "tree_id", "gene_stable_id", "rep_gene_id",
                "ath_rep_gene_id", "duplication_taxa",
            ],
        )

    cols = [
        "tree_id", "node_id", "parent_id", "left_index", "right_index",
        "taxon_id", "gene_stable_id", "node_type",
        "duplication_confidence_score", "rep_score",
    ]
    # fused: the in-kernel rep pass needs the branch distance; joined:
    # the rep table already carries the propagated rep_gene_id
    cols.append("distance_to_parent" if fused else "rep_gene_id")
    return _grouped_by_tree(
        joined.select(*cols), kernel, _LEAF_SUMMARY_SCHEMA, batch_groups
    )


# ---------------------------------------------------------------------------
# J12 — tree-leaf decoration from gene documents
# ---------------------------------------------------------------------------

def decorate_leaves(
    nodes: DataFrame,
    gene_docs: DataFrame,
    gene_key: str = "_id",
    fields: tuple[str, ...] = (),
) -> DataFrame:
    """J12 — attach gene-document fields to tree leaves by stable id
    (`trees/add_domains_to_tree.js:99-116`: the second pass that copies
    domains/taxon/nTranscripts from finished gene docs onto tree leaves).

    Leaves stay relational (nest only at the K8 sink). Branch nodes pass
    through with nulls. One shuffle (or broadcast when the doc side is
    small). ``gene_docs`` must be unique on ``gene_key`` — duplicates fan
    leaves out (dedup upstream with dedup_exact/argmax if unsure)."""
    payload = gene_docs.select(
        F.col(gene_key).alias("gene_stable_id"), *[F.col(f) for f in fields]
    )
    return nodes.join(payload, "gene_stable_id", "left")


# ---------------------------------------------------------------------------
# K8 — flat → nested JSON assembly (sink format)
# ---------------------------------------------------------------------------

def assemble_nested_trees(
    nodes: DataFrame,
    extra_fields: tuple[str, ...] = (),
    batch_groups: int | None = None,
) -> DataFrame:
    """K8 — adjacency rows → one nested-JSON document per tree
    (`trees/genetree.js:75-80` FlatToNested). Children ordered by
    ``left_index`` (O4, `trees/genetree.js:5-9`). Output:
    (tree_id, n_nodes, doc JSON string) — a sink-side format only.

    ``extra_fields``: additional per-node columns copied into each
    node's JSON object when non-null (the decorated publish shape —
    `trees/add_domains_to_tree.js:99-116` writes rep/domain/doc fields
    straight into the nested nodes). Keys are emitted sorted, so
    field names are stable regardless of tuple order.
    """

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("left_index")
        children: dict[int, list] = {}
        objs: dict[int, dict] = {}
        root = None
        for row in pdf.itertuples(index=False):
            obj = {"node_id": int(row.node_id), "taxon_id": int(row.taxon_id)}
            if row.gene_stable_id is not None and not pd.isna(row.gene_stable_id):
                obj["gene_stable_id"] = row.gene_stable_id
            for f in extra_fields:
                v = getattr(row, f)
                if v is not None and not pd.isna(v):
                    obj[f] = v
            objs[int(row.node_id)] = obj
            if row.parent_id is None or pd.isna(row.parent_id):
                root = obj
            else:
                children.setdefault(int(row.parent_id), []).append(obj)
        for nid, kids in children.items():
            objs[nid]["children"] = kids  # already in left_index order
        doc = json.dumps(root, sort_keys=True)
        return pd.DataFrame(
            {"tree_id": [pdf["tree_id"].iloc[0]], "n_nodes": [len(pdf)], "doc": [doc]}
        )

    return _grouped_by_tree(
        nodes.select("tree_id", "node_id", "parent_id", "left_index",
                     "taxon_id", "gene_stable_id", *extra_fields),
        kernel,
        "tree_id STRING, n_nodes BIGINT, doc STRING",
        batch_groups,
    )


# ---------------------------------------------------------------------------
# K1/K2 — CIGAR expansion + pairwise identity (vectorized pandas UDFs)
# ---------------------------------------------------------------------------

def _expand_one(cigar: str, seq: str) -> str:
    """Expand ``3M2D4M``-style cigar over a sequence; D runs become gaps.
    Reference: `search/genetree_adder.js:8-47` (Uint16 consensus build)."""
    out = []
    pos = 0
    num = ""
    for ch in cigar:
        if ch.isdigit():
            num += ch
            continue
        n = int(num) if num else 1
        num = ""
        if ch == "M":
            out.append(seq[pos : pos + n])
            pos += n
        elif ch == "D":
            out.append("-" * n)
    return "".join(out)


def with_aligned_sequence(df: DataFrame, cigar: str = "cigar",
                          seq: str = "sequence", out: str = "aligned") -> DataFrame:
    """K1 — add the gap-expanded alignment string (Arrow-batched pandas UDF)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def expand(c: pd.Series, s: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if (ci is None or si is None) else _expand_one(ci, si)
                for ci, si in zip(c, s)
            ]
        )

    return df.withColumn(out, expand(F.col(cigar), F.col(seq)))


def pairwise_identity(df: DataFrame, a: str = "aligned_a", b: str = "aligned_b",
                      out: str = "identity") -> DataFrame:
    """K2 — position-wise % identity over two aligned sequences with a
    gap-aware denominator (`search/genetree_adder.js:49-78`): matches /
    min(non-gap length a, non-gap length b)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def ident(sa: pd.Series, sb: pd.Series) -> pd.Series:
        vals = []
        for x, y in zip(sa, sb):
            if x is None or y is None:
                vals.append(None)
                continue
            matches = sum(
                1 for cx, cy in zip(x, y) if cx == cy and cx != "-"
            )
            la = sum(1 for c in x if c != "-")
            lb = sum(1 for c in y if c != "-")
            denom = min(la, lb)
            vals.append(matches / denom if denom else 0.0)
        return pd.Series(vals, dtype="float64")

    return df.withColumn(out, ident(F.col(a), F.col(b)))
