"""Genomics operators (J6/P7/W2/K10/K11/K12/W3) and K5 domain
architecture clustering, on FIXTURES.md §5-§7 shaped fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gramene_mongodb_spark.operators import domains as DM
from gramene_mongodb_spark.operators import genomics as G

PAIR_SCHEMA = (
    "gene_id STRING, other_id STRING, kind STRING, "
    "gene_genome_db_id BIGINT, other_genome_db_id BIGINT, "
    "gene_dnafrag_id BIGINT, other_dnafrag_id BIGINT, "
    "gene_dnafrag_start BIGINT, gene_dnafrag_end BIGINT, gene_dnafrag_strand INT, "
    "other_dnafrag_start BIGINT, other_dnafrag_end BIGINT, other_dnafrag_strand INT"
)


def test_classify_synteny(spark):
    pairs = spark.createDataFrame(
        [
            # fully inside block on both sides → syntenic
            ("gA", "gB", "ortholog_one2one", 1, 2, 10, 20, 100, 200, 1, 1100, 1200, 1),
            # gene side outside → stays plain
            ("gC", "gD", "ortholog_one2one", 1, 2, 10, 20, 5000, 6000, 1, 1100, 1200, 1),
            # wrong dnafrag pair → stays plain
            ("gE", "gF", "ortholog_one2one", 1, 2, 11, 20, 100, 200, 1, 1100, 1200, 1),
        ],
        PAIR_SCHEMA,
    )
    blocks = spark.createDataFrame(
        [(1, 2, 10, 20, 50, 400, 1000, 1500), (1, 2, 10, 20, 60, 300, 1050, 1400)],
        "gene_genome_db_id BIGINT, other_genome_db_id BIGINT, "
        "gene_dnafrag_id BIGINT, other_dnafrag_id BIGINT, "
        "start BIGINT, end BIGINT, start2 BIGINT, end2 BIGINT",
    )
    out = {r.gene_id: r.kind for r in G.classify_synteny(pairs, blocks).collect()}
    assert out == {
        "gA": "syntenic_ortholog_one2one",  # matches 2 blocks → one row
        "gC": "ortholog_one2one",
        "gE": "ortholog_one2one",
    }
    assert G.classify_synteny(pairs, blocks).count() == 3  # no fan-out


def test_gene_order_and_genes_between(spark):
    genes = spark.createDataFrame(
        [("g1", 10, 1, 100), ("g2", 10, 1, 500), ("g3", 10, 1, 900),
         ("g4", 10, -1, 50), ("g5", 11, 1, 100)],
        "gene_id STRING, dnafrag_id BIGINT, strand INT, start BIGINT",
    )
    idx = G.gene_order_index(genes)
    by_gene = {r.gene_id: r.gene_idx for r in idx.collect()}
    assert (by_gene["g1"], by_gene["g2"], by_gene["g3"]) == (1, 2, 3)
    assert by_gene["g4"] == 1  # separate strand partition
    pairs = spark.createDataFrame(
        [("g1", "g3"), ("g1", "g2"), ("g1", "g4"), ("g1", "g5")],
        "gene_id STRING, other_id STRING",
    )
    gb = {(r.gene_id, r.other_id): r.genes_between
          for r in G.genes_between(pairs, idx).collect()}
    assert gb[("g1", "g3")] == 1      # g2 lies between
    assert gb[("g1", "g2")] == 0
    assert gb[("g1", "g4")] is None   # different strand
    assert gb[("g1", "g5")] is None   # different fragment


def test_filter_gene_splits(spark):
    rows = [
        # adjacent halves, no overlap → keep
        ("s1", "s2", "gene_split", 1, 1, 10, 10, 100, 200, 1, 250, 350, 1),
        # heavy overlap → drop
        ("s3", "s4", "gene_split", 1, 1, 10, 10, 100, 300, 1, 120, 320, 1),
        # far apart (>1Mb) → drop
        ("s5", "s6", "gene_split", 1, 1, 10, 10, 100, 200, 1, 2_000_000, 2_000_100, 1),
        # different fragments → drop
        ("s7", "s8", "gene_split", 1, 1, 10, 11, 100, 200, 1, 250, 350, 1),
        # non-split kinds always pass
        ("k1", "k2", "ortholog_one2one", 1, 1, 10, 10, 100, 300, 1, 120, 320, 1),
    ]
    pairs = spark.createDataFrame(rows, PAIR_SCHEMA)
    kept = {r.gene_id for r in G.filter_gene_splits(pairs).collect()}
    assert kept == {"s1", "k1"}


MAPS_SCHEMA = (
    "_id STRING, taxon_id BIGINT, display_name STRING, "
    "regions STRUCT<names ARRAY<STRING>, lengths ARRAY<BIGINT>>"
)


def test_region_offsets_and_bins(spark):
    maps = spark.createDataFrame(
        [("asm1", 3702, "Ara", (["1", "2", "UNANCHORED"], [1000, 2000, 500]))],
        MAPS_SCHEMA,
    )
    offs = {r.region: r for r in G.region_offsets(maps).collect()}
    assert offs["1"].offset == 0
    assert offs["2"].offset == 1000
    assert offs["UNANCHORED"].offset == 3000
    assert offs["2"].genome_length == 3500
    pos = spark.createDataFrame(
        [("gA", 3702, "1", 10), ("gB", 3702, "2", 1999), ("gC", 3702, "1", 999)],
        "gene_id STRING, taxon_id BIGINT, region STRING, start BIGINT",
    )
    binned = {r.gene_id: r for r in G.assign_bins(pos, G.region_offsets(maps),
                                                  fixed_counts=(10,), widths_mb=(1,)).collect()}
    assert binned["gA"].global_pos == 10
    assert binned["gB"].global_pos == 2999
    assert binned["gA"].bin_fixed_10 == 0
    assert binned["gB"].bin_fixed_10 == 8   # 2999*10/3500 = 8.57
    assert binned["gC"].bin_fixed_10 == 2   # 999*10/3500 = 2.85
    assert binned["gB"].bin_1mb == 0


def test_graft_genome_children(spark):
    tax = spark.createDataFrame(
        [(1, None, "root"), (3702, 1, "Arabidopsis")],
        "taxon_id BIGINT, parent_id BIGINT, name STRING",
    )
    genomes = spark.createDataFrame(
        [("asm1", 3702, "TAIR10"), ("asm2", 3702, "Ara_v2")],
        "_id STRING, taxon_id BIGINT, display_name STRING",
    )
    out = G.graft_genome_children(tax, genomes)
    rows = {r.taxon_id: r for r in out.collect()}
    assert rows[3702001].parent_id == 3702 and rows[3702001].name == "TAIR10"
    assert rows[3702002].name == "Ara_v2"
    assert len(rows) == 4


def test_descriptor_and_species_rank(spark):
    df = spark.createDataFrame(
        [("g1", "name1", None, "repdesc", ["syn1", "syn2"]),
         ("g2", None, "desc2", None, None)],
        "id STRING, name STRING, description STRING, rep_description STRING, "
        "synonyms ARRAY<STRING>",
    )
    out = {r.id: r.descriptor for r in G.synthesize_descriptor(df).collect()}
    assert out["g1"] == "name1; repdesc; syn1 syn2"
    assert out["g2"] == "desc2"
    ranks = spark.createDataFrame(
        [(3702,), (4577,), (9999,)], "taxon BIGINT"
    ).select(G.species_rank(F.col("taxon")).alias("r")).collect()
    assert [r.r for r in ranks] == [1, 3, 10999]


def test_domain_architecture_clustering(spark):
    # hierarchy: R1 -> M1 -> C1 ; R1 -> M2 ; R2 (own root)
    paths = spark.createDataFrame(
        [("C1", ["R1", "M1", "C1"]), ("M1", ["R1", "M1"]),
         ("M2", ["R1", "M2"]), ("R2", ["R2"])],
        "interpro STRING, path ARRAY<STRING>",
    )
    feats = spark.createDataFrame(
        [
            # t1: C1 and M1 overlap 100% → one cluster, LCA = M1
            ("t1", "C1", 10, 50), ("t1", "M1", 12, 48),
            # M2 same root but far away → second cluster (LCA = M2)
            ("t1", "M2", 200, 250),
            # R2 different root overlapping C1 → own cluster
            ("t1", "R2", 20, 40),
            # t2: single hit
            ("t2", "C1", 5, 15),
        ],
        "translation_id STRING, interpro STRING, start BIGINT, end BIGINT",
    )
    clusters = DM.cluster_architecture(feats, paths)
    rows = [r for r in clusters.orderBy("translation_id", "cluster_idx").collect()]
    t1 = [r for r in rows if r.translation_id == "t1"]
    assert len(t1) == 3
    assert t1[0].members == ["C1", "M1"] and t1[0].lca == "M1"
    assert t1[0].start == 10 and t1[0].end == 50
    assert {c.root for c in t1} == {"R1", "R2"}
    arch = {r.translation_id: r.architecture
            for r in DM.architecture_strings(clusters).collect()}
    assert arch["t1"].split(" ")[0] in ("R1", "R2")  # position order
    assert arch["t2"] == "R1"
    # clusters ordered by start: (10,50) R1, (20,40) R2, (200,250) R1
    assert arch["t1"] == "R1 R2 R1"
