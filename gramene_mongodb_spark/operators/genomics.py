"""Genomic interval / homology operators (SURVEY.md §2: J6, P7, W2,
K10, K11, K12).

All are pure DataFrame ops. The homolog-pair operators follow the
FIXTURES.md §6 schema (gene/other sides with genome_db, dnafrag,
start/end/strand); the binning/grafting ops follow §7 (maps with
parallel region arrays).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# J6 — synteny classification (paired-interval containment + relabel)
# ---------------------------------------------------------------------------

def classify_synteny(pairs: DataFrame, blocks: DataFrame) -> DataFrame:
    """J6 — relabel a homolog pair's ``kind`` to ``syntenic_<kind>`` when
    BOTH genes fall inside the paired intervals of a synteny block of
    the right (genome pair, dnafrag pair).

    Reference: ``search/dump_homologs.js:99-128`` (block build),
    ``:206-243`` (sorted probe with bounds.le): containment is inclusive
    on both ends of both intervals.

    Spark-first: equi-join on the 4 pairing keys + containment
    predicates, left; matched rows get the prefix. The equi keys keep
    the join from exploding (SURVEY.md §7 risk 5 — never a cross join
    across dnafrags); at scale, additionally bin both sides on
    ``start`` to subdivide huge fragments.
    """
    b = blocks.select(
        F.col("gene_genome_db_id").alias("bg"),
        F.col("other_genome_db_id").alias("bo"),
        F.col("gene_dnafrag_id").alias("bgd"),
        F.col("other_dnafrag_id").alias("bod"),
        "start", "end", "start2", "end2",
    )
    cond = (
        (pairs["gene_genome_db_id"] == b["bg"])
        & (pairs["other_genome_db_id"] == b["bo"])
        & (pairs["gene_dnafrag_id"] == b["bgd"])
        & (pairs["other_dnafrag_id"] == b["bod"])
        & (b["start"] <= pairs["gene_dnafrag_start"])
        & (b["end"] >= pairs["gene_dnafrag_end"])
        & (b["start2"] <= pairs["other_dnafrag_start"])
        & (b["end2"] >= pairs["other_dnafrag_end"])
    )
    matched = (
        pairs.join(b, cond, "left")
        .withColumn("__syntenic", b["start"].isNotNull())
        .drop("bg", "bo", "bgd", "bod", "start", "end", "start2", "end2")
        # a pair inside several blocks must classify once, not duplicate
        .dropDuplicates(pairs.columns + ["__syntenic"])
    )
    # if a pair is both matched and unmatched rows would not occur (left
    # join emits one row per matching block or one null row); dedup above
    # collapses multi-block matches
    return matched.withColumn(
        "kind",
        F.when(F.col("__syntenic"), F.concat(F.lit("syntenic_"), F.col("kind"))).otherwise(
            F.col("kind")
        ),
    ).drop("__syntenic")


# ---------------------------------------------------------------------------
# W2 — gene order index + genes-between
# ---------------------------------------------------------------------------

def gene_order_index(
    genes: DataFrame,
    dnafrag: str = "dnafrag_id",
    strand: str = "strand",
    start: str = "start",
    gene: str = "gene_id",
    out: str = "gene_idx",
) -> DataFrame:
    """W2 (build) — per-(fragment, strand) position index in start order
    (``search/dump_homologs.js:131-148``). Tie-break on gene id pins
    determinism."""
    w = Window.partitionBy(dnafrag, strand).orderBy(F.col(start), F.col(gene))
    return genes.withColumn(out, F.row_number().over(w).cast("long"))


def genes_between(
    pairs: DataFrame,
    index: DataFrame,
    gene_a: str = "gene_id",
    gene_b: str = "other_id",
    out: str = "genes_between",
) -> DataFrame:
    """W2 (probe) — number of genes strictly between two genes on the
    same (fragment, strand): ``abs(idx_a − idx_b) − 1``
    (``search/dump_homologs.js:66-85``). Pairs on different fragments or
    strands get null. Two broadcast-able joins against the index."""
    ia = index.select(
        F.col("gene_id").alias(gene_a),
        F.col("dnafrag_id").alias("__da"),
        F.col("strand").alias("__sa"),
        F.col("gene_idx").alias("__ia"),
    )
    ib = index.select(
        F.col("gene_id").alias(gene_b),
        F.col("dnafrag_id").alias("__db"),
        F.col("strand").alias("__sb"),
        F.col("gene_idx").alias("__ib"),
    )
    out_df = (
        pairs.join(ia, gene_a, "left")
        .join(ib, gene_b, "left")
        .withColumn(
            out,
            F.when(
                (F.col("__da") == F.col("__db")) & (F.col("__sa") == F.col("__sb")),
                F.abs(F.col("__ia") - F.col("__ib")) - 1,
            ),
        )
    )
    return out_df.drop("__da", "__sa", "__ia", "__db", "__sb", "__ib")


# ---------------------------------------------------------------------------
# P7 — gene_split quality filter
# ---------------------------------------------------------------------------

def filter_gene_splits(
    pairs: DataFrame,
    max_overlap_ratio: float = 0.2,
    max_distance: int = 1_000_000,
    max_genes_between: int = 10,
) -> DataFrame:
    """P7 — drop implausible ``gene_split`` homology pairs
    (``search/dump_homologs.js:175-205``): a genuine split gene has its
    two halves nearly adjacent, so keep a gene_split pair only when

    * coordinate overlap ≤ ``max_overlap_ratio`` of the shorter gene,
    * gap between the halves ≤ ``max_distance`` bp,
    * ≤ ``max_genes_between`` genes between them (requires a
      ``genes_between`` column from :func:`genes_between`; null passes).

    Non-gene_split kinds pass through untouched. Pure predicates — fully
    pushed/codegen'd.
    """
    overlap = F.greatest(
        F.lit(0),
        F.least(F.col("gene_dnafrag_end"), F.col("other_dnafrag_end"))
        - F.greatest(F.col("gene_dnafrag_start"), F.col("other_dnafrag_start"))
        + 1,
    )
    len_a = F.col("gene_dnafrag_end") - F.col("gene_dnafrag_start") + 1
    len_b = F.col("other_dnafrag_end") - F.col("other_dnafrag_start") + 1
    overlap_ratio = overlap / F.least(len_a, len_b)
    gap = F.greatest(
        F.lit(0),
        F.greatest(F.col("gene_dnafrag_start"), F.col("other_dnafrag_start"))
        - F.least(F.col("gene_dnafrag_end"), F.col("other_dnafrag_end"))
        - 1,
    )
    same_frag = F.col("gene_dnafrag_id") == F.col("other_dnafrag_id")
    gb_ok = (
        F.col("genes_between").isNull() | (F.col("genes_between") <= max_genes_between)
        if "genes_between" in pairs.columns
        else F.lit(True)
    )
    keep_split = (
        same_frag
        & (overlap_ratio <= max_overlap_ratio)
        & (gap <= max_distance)
        & gb_ok
    )
    return pairs.filter((F.col("kind") != "gene_split") | keep_split)


# ---------------------------------------------------------------------------
# K10 — genome binning from per-region cumulative offsets
# ---------------------------------------------------------------------------

def region_offsets(maps: DataFrame) -> DataFrame:
    """Per-(taxon, region) cumulative start offsets from the maps table's
    parallel region arrays (FIXTURES.md §7; ``maps/dump_maps.js:62-66``).
    Output: (taxon_id, region, region_length, offset, genome_length) —
    the broadcast side of the binning join."""
    regions = maps.select(
        "taxon_id",
        F.posexplode(
            F.arrays_zip(
                F.col("regions.names").alias("name"),
                F.col("regions.lengths").alias("length"),
            )
        ).alias("pos", "r"),
    ).select(
        "taxon_id",
        F.col("r.name").alias("region"),
        F.col("r.length").alias("region_length"),
        "pos",
    )
    w = Window.partitionBy("taxon_id").orderBy("pos")
    return (
        regions.withColumn(
            "offset",
            F.coalesce(
                F.sum("region_length").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .withColumn(
            "genome_length",
            F.sum("region_length").over(
                Window.partitionBy("taxon_id").rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
        .drop("pos")
    )


def assign_bins(
    positions: DataFrame,
    offsets: DataFrame,
    fixed_counts: Sequence[int] = (100, 200, 500, 1000),
    widths_mb: Sequence[int] = (1, 2, 5, 10),
) -> DataFrame:
    """K10 — map (taxon_id, region, start) to genome-wide bin ids for
    fixed-count and uniform-width binnings (``search/bin_adder.js:35-60``
    + the external ``gramene-bins-client`` configs).

    One broadcast join + pure arithmetic: global_pos = offset + start;
    fixed-count bin = floor(global_pos × n / genome_length) clamped to
    n−1; width bin = floor(global_pos / width).
    """
    joined = positions.join(F.broadcast(offsets), ["taxon_id", "region"], "left")
    gpos = F.col("offset") + F.col("start")
    out = joined.withColumn("global_pos", gpos)
    for n in fixed_counts:
        out = out.withColumn(
            f"bin_fixed_{n}",
            F.least(
                F.floor(gpos * n / F.col("genome_length")), F.lit(n - 1)
            ).cast("long"),
        )
    for mb in widths_mb:
        out = out.withColumn(
            f"bin_{mb}mb", F.floor(gpos / (mb * 1_000_000)).cast("long")
        )
    return out


# ---------------------------------------------------------------------------
# K11 — taxonomy grafting (synthetic genome-child + foster nodes)
# ---------------------------------------------------------------------------

def graft_genome_children(
    taxonomy: DataFrame,
    genomes: DataFrame,
) -> DataFrame:
    """K11 — insert one synthetic child taxon per genome under its base
    taxon, id = ``taxon_id*1000 + n`` (n = rank of the genome under that
    taxon), the reference's multi-assembly disambiguation
    (``maps/load_maps_and_taxonomy.js:77-117``,
    ``ontologies/filter_taxonomy.js:117-164``).

    ``taxonomy``: (taxon_id, parent_id, name). ``genomes``: maps-shaped
    (_id, taxon_id, display_name). Output: taxonomy ∪ synthetic rows
    (re-run the K7 closure afterwards for updated ancestors).
    """
    w = Window.partitionBy("taxon_id").orderBy("_id")
    synthetic = (
        genomes.withColumn("n", F.row_number().over(w))
        .select(
            (F.col("taxon_id") * 1000 + F.col("n")).alias("taxon_id"),
            F.col("taxon_id").alias("parent_id"),
            F.col("display_name").alias("name"),
        )
    )
    return taxonomy.unionByName(synthetic)


# ---------------------------------------------------------------------------
# K12 / W3 — descriptor synthesis + ranked species ordering
# ---------------------------------------------------------------------------

def synthesize_descriptor(
    df: DataFrame,
    parts: Sequence[str] = ("name", "description", "rep_description"),
    synonyms: str | None = "synonyms",
    out: str = "descriptor",
) -> DataFrame:
    """K12 — compose a search descriptor from the first non-null fields
    plus joined synonyms (``prep_urgi_tsv.js:44-77``). ``concat_ws``
    skips nulls natively, matching the reference's conditional appends."""
    cols: list[Column] = [F.col(p) for p in parts]
    if synonyms is not None:
        cols.append(F.array_join(F.col(synonyms), " "))
    return df.withColumn(out, F.concat_ws("; ", *cols))


#: fixed model-species ranks (W3 — ``search/decorate.js:101-112``)
SPECIES_RANKS = {3702: 1, 39947: 2, 4577: 3, 4558: 4}


def species_rank(taxon: Column) -> Column:
    """W3 — fixed rank for model species, else the taxon id itself (so
    models sort first, everything else in stable taxon order)."""
    expr = None
    for tid, rank in SPECIES_RANKS.items():
        expr = (
            F.when(taxon == tid, rank)
            if expr is None
            else expr.when(taxon == tid, rank)
        )
    return expr.otherwise(taxon + 1000)
