"""Tree kernel unit tests (K1-K4, K8, K9) on hand-built fixtures
following FIXTURES.md §4 edge cases: malformed leaf, zero-gene subtree,
bad-description scoring, model-species boost, duplication sets, cigar
expansion consistent with sequence length."""

from __future__ import annotations

import json

import pytest

from gramene_mongodb_spark.operators import trees as TR

NODE_SCHEMA = (
    "tree_id STRING, node_id BIGINT, parent_id BIGINT, left_index INT, "
    "right_index INT, distance_to_parent DOUBLE, taxon_id BIGINT, "
    "gene_stable_id STRING, gene_display_label STRING, "
    "gene_description STRING, sequence STRING, cigar STRING, "
    "node_type STRING, duplication_confidence_score DOUBLE"
)

#          1:root(1,10)
#          /          \
#   2:dup(2,7)      5:leafC(8,9)
#     /      \
# 3:leafA(3,4) 4:leafB(5,6)
#
# leafA: arabidopsis, good description, labeled  -> score -60
# leafB: bad description ("hypothetical"), labeled -> score +90
# leafC: good description, labeled, not model    -> score -10
TREE1 = [
    ("t1", 1, None, 1, 10, None, 99, None, None, None, None, None, "speciation", None),
    ("t1", 2, 1, 2, 7, 0.1, 98, None, None, None, None, None, "duplication", 0.9),
    ("t1", 3, 2, 3, 4, 0.2, 3702, "AT1G01010", "GeneA", "kinase activity", "MKV", "3M", None, None),
    ("t1", 4, 2, 5, 6, 0.3, 4530, "OS01G001", "GeneB", "hypothetical protein", "MK", "2M", None, None),
    ("t1", 5, 1, 8, 9, 0.4, 3847, "ZM01G001", "GeneC", "transporter", "MKVA", "2M2D2M", None, None),
]
# malformed leaf: claims a subtree span (left+1 < right)
MALFORMED = [
    ("t2", 1, None, 1, 6, None, 1, None, None, None, None, None, "speciation", None),
    ("t2", 2, 1, 2, 5, 0.1, 2, "BAD1", None, None, None, None, None, None),
    ("t2", 3, 1, 3, 4, 0.1, 3, "OK1", None, "fine", None, None, None, None),
]


@pytest.fixture(scope="module")
def nodes(spark):
    return spark.createDataFrame(TREE1 + MALFORMED, NODE_SCHEMA)


def test_prune_malformed_leaves(nodes):
    kept = TR.prune_malformed_leaves(nodes)
    ids = {(r.tree_id, r.node_id) for r in kept.collect()}
    assert ("t2", 2) not in ids
    assert ("t2", 3) in ids and ("t1", 3) in ids


def test_subtree_gene_counts(nodes):
    counts = {
        (r.tree_id, r.node_id): r.subtree_gene_count
        for r in TR.subtree_gene_counts(nodes).collect()
    }
    assert counts[("t1", 1)] == 3  # root sees all three leaves
    assert counts[("t1", 2)] == 2  # duplication subtree: A and B
    assert counts[("t1", 3)] == 1


def test_score_and_select_representatives(spark):
    t1 = spark.createDataFrame(TREE1, NODE_SCHEMA)
    scored = TR.score_leaves(t1)
    by_node = {r.node_id: r.rep_score for r in scored.collect()}
    assert by_node[3] == -60  # labeled + model species
    assert by_node[4] == 90  # bad description (+100) but labeled (-10)
    assert by_node[5] == -10
    reps = {r.node_id: (r.rep_gene_id, r.rep_score)
            for r in TR.select_representatives(scored).collect()}
    assert reps[2] == ("AT1G01010", -60.0)  # dup node picks best child
    assert reps[1] == ("AT1G01010", -60.0)  # propagates to root
    assert reps[4] == ("OS01G001", 90.0)    # leaf keeps itself


def test_leaf_summaries_duplications_and_ath(spark):
    t1 = spark.createDataFrame(TREE1, NODE_SCHEMA)
    scored = TR.score_leaves(t1)
    reps = TR.select_representatives(scored)
    summary = {
        r.gene_stable_id: r
        for r in TR.assign_leaf_summaries(scored, reps).collect()
    }
    # leaves under the confident duplication node carry its taxon
    assert summary["AT1G01010"].duplication_taxa == [98]
    assert summary["OS01G001"].duplication_taxa == [98]
    assert summary["ZM01G001"].duplication_taxa == []
    # arabidopsis rep is the single ath leaf, tree-wide
    assert summary["OS01G001"].ath_rep_gene_id == "AT1G01010"
    # the much-better root rep (-60) is inherited by the bad leaf (+100)
    assert summary["OS01G001"].rep_gene_id == "AT1G01010"
    # a leaf keeps itself when it IS the best
    assert summary["AT1G01010"].rep_gene_id == "AT1G01010"


def test_assemble_nested_trees(spark):
    t1 = spark.createDataFrame(TREE1, NODE_SCHEMA)
    docs = {r.tree_id: r for r in TR.assemble_nested_trees(t1).collect()}
    doc = json.loads(docs["t1"].doc)
    assert docs["t1"].n_nodes == 5
    assert doc["node_id"] == 1
    kids = doc["children"]
    assert [k["node_id"] for k in kids] == [2, 5]  # left_index order (O4)
    assert [k["node_id"] for k in kids[0]["children"]] == [3, 4]
    assert kids[0]["children"][0]["gene_stable_id"] == "AT1G01010"


def test_cigar_and_identity(spark):
    t1 = spark.createDataFrame(TREE1, NODE_SCHEMA)
    aligned = {
        r.gene_stable_id: r.aligned
        for r in TR.with_aligned_sequence(t1).filter("sequence is not null").collect()
    }
    assert aligned["AT1G01010"] == "MKV"
    assert aligned["ZM01G001"] == "MK--VA"
    pairs = spark.createDataFrame(
        [("MKV-", "MKVA"), ("M-KV", "MAKV"), (None, "X")],
        "aligned_a STRING, aligned_b STRING",
    )
    vals = [r.identity for r in TR.pairwise_identity(pairs).collect()]
    assert vals[0] == pytest.approx(3 / 3)   # 3 matches / min(3,4)
    assert vals[1] == pytest.approx(3 / 3)
    assert vals[2] is None


def _skewed_forest(spark, n_big_leaves=2000, n_small_trees=10):
    """One 100×-skewed multi-level super-tree + small chain trees.

    Super-tree: root → 4 inner children → each with n_big_leaves/4
    leaves (nested-set indexes laid out contiguously), so the shard
    split happens at the inner nodes, not trivially per leaf.
    """
    rows = []
    per = n_big_leaves // 4
    span = 2 * per  # leaf slots inside one inner child
    rows.append(("big", 1, None, 1, 4 * (span + 2) + 2, None, 1, None,
                 None, None, None, None, "speciation", None))
    nid = 2
    for c in range(4):
        c_left = 2 + c * (span + 2)
        c_id = nid
        rows.append(("big", c_id, 1, c_left, c_left + span + 1, 0.5 + c, 10 + c,
                     None, None, None, None, None, "speciation", None))
        nid += 1
        for i in range(per):
            left = c_left + 1 + 2 * i
            taxon = 3702 if (c * per + i) % 7 == 0 else 9000
            desc = "hypothetical protein" if i % 2 == 0 else "kinase activity"
            rows.append(("big", nid, c_id, left, left + 1, 0.1 + (i % 5) * 0.1,
                         taxon, f"G{c}_{i:05d}", None, desc, None, None, None, None))
            nid += 1
    for t in range(n_small_trees):
        rows.append((f"s{t}", 1, None, 1, 6, None, 1, None, None, None,
                     None, None, "speciation", None))
        rows.append((f"s{t}", 2, 1, 2, 5, 0.2, 2, None, None, None,
                     None, None, "speciation", None))
        rows.append((f"s{t}", 3, 2, 3, 4, 0.3, 3702, f"S{t}_leaf", None,
                     "kinase activity", None, None, None, None))
    return spark.createDataFrame(rows, NODE_SCHEMA)


def test_subtree_gene_counts_sweep_on_skewed_forest(spark):
    nodes = _skewed_forest(spark, n_big_leaves=400)
    counts = {
        (r.tree_id, r.node_id): r.subtree_gene_count
        for r in TR.subtree_gene_counts(nodes).collect()
    }
    assert counts[("big", 1)] == 400          # root sees every leaf
    inner_ids = [2 + 101 * c for c in range(4)]
    assert all(counts[("big", i)] == 100 for i in inner_ids)
    assert counts[("s0", 1)] == 1 and counts[("s0", 2)] == 1


def test_select_representatives_sharded_matches_unsharded(spark):
    nodes = _skewed_forest(spark, n_big_leaves=2000)
    scored = TR.score_leaves(nodes)
    plain = {
        (r.tree_id, r.node_id): (r.rep_gene_id, r.rep_score)
        for r in TR.select_representatives(scored).collect()
    }
    # cap 500 → the 2005-node super-tree shards at its 4 inner children;
    # the small trees take the normal single-group path
    guarded = {
        (r.tree_id, r.node_id): (r.rep_gene_id, r.rep_score)
        for r in TR.select_representatives(scored, max_group_nodes=500).collect()
    }
    assert guarded == plain
    # sanity: the winner is a model-taxon gene propagated to the root
    gene, score = guarded[("big", 1)]
    assert score == -50.0 and gene.startswith("G")


def test_select_representatives_sharded_matches_unsharded_on_chains(spark):
    """Chain (caterpillar) topology: sharding at the root's children
    splits into ONE leaf shard and one deep-chain shard — the most
    lopsided recombination the root argmin can face. Results must be
    bit-identical to the per-tree kernel (the k3k4_deep_tree fixture is
    the oracle-gated twin of this shape)."""
    from gramene_mongodb_spark.catalog import _synth_chain_tree_nodes

    nodes = _synth_chain_tree_nodes(spark, "/root/testdata/sf0.001")
    scored = TR.score_leaves(nodes)
    plain = {
        (r.tree_id, r.node_id): (r.rep_gene_id, r.rep_score)
        for r in TR.select_representatives(scored).collect()
    }
    guarded = {
        (r.tree_id, r.node_id): (r.rep_gene_id, r.rep_score)
        for r in TR.select_representatives(scored, max_group_nodes=4).collect()
    }
    assert guarded == plain and len(plain) > 100


def test_tree_kernels_batched_match_unbatched(spark):
    """batch_groups packs many trees per Spark group (the tiny-tree
    amortization, SCALE.md round-8 probe) — every grouped kernel must
    return bit-identical rows."""
    from gramene_mongodb_spark.catalog import _synth_chain_tree_nodes

    nodes = _synth_chain_tree_nodes(spark, "/root/testdata/sf0.001")
    scored = TR.score_leaves(nodes)

    reps_plain = TR.select_representatives(scored)
    reps_batch = TR.select_representatives(scored, batch_groups=3)
    assert sorted(map(tuple, reps_plain.collect())) == sorted(
        map(tuple, reps_batch.collect())
    )

    summ_plain = TR.assign_leaf_summaries(scored, reps_plain).collect()
    summ_batch = TR.assign_leaf_summaries(
        scored, reps_plain, batch_groups=3
    ).collect()
    key = lambda r: (r.tree_id, r.gene_stable_id)
    assert sorted(summ_plain, key=key) == sorted(summ_batch, key=key)

    nest_plain = TR.assemble_nested_trees(nodes).collect()
    nest_batch = TR.assemble_nested_trees(nodes, batch_groups=3).collect()
    assert sorted(map(tuple, nest_plain)) == sorted(map(tuple, nest_batch))


def test_leaf_summaries_fused_reps_match_explicit(spark):
    """The r15 fused path (``reps=None`` runs the rep kernel in-process
    inside the summary kernel) must return bit-identical rows to the
    explicit two-pass ``assign_leaf_summaries(scored,
    select_representatives(scored))`` — on the hand-built TREE1 fixture
    AND on the synthetic chain forest (the most lopsided shape the rep
    walk faces). Pins the ADVICE r15 equivalence gap."""
    from gramene_mongodb_spark.catalog import _synth_chain_tree_nodes

    key = lambda r: (r.tree_id, r.gene_stable_id)
    for nodes in (
        spark.createDataFrame(TREE1, NODE_SCHEMA),
        _synth_chain_tree_nodes(spark, "/root/testdata/sf0.001"),
    ):
        scored = TR.score_leaves(nodes)
        explicit = TR.assign_leaf_summaries(
            scored, TR.select_representatives(scored)
        ).collect()
        fused = TR.assign_leaf_summaries(scored).collect()
        assert sorted(map(tuple, fused)) == sorted(map(tuple, explicit))
        assert len(explicit) > 0
