"""Document-assembly operators (SURVEY.md §7 phase B).

The reference's output shape is a deeply-nested gene document
(`search/dump_genes.js:181-201`): xrefs grouped by db, transcripts with
canonical-first ordering, empty fields pruned before load. These
operators build/maintain that shape with pure column expressions —
nesting is cheap in Spark (structs are columnar), and nothing here
shuffles except the explicit groupBys.
"""

from __future__ import annotations

from typing import Literal

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# A1 — xref group-collect with evidence-pair form
# ---------------------------------------------------------------------------

#: ontology dbs whose xrefs keep [id, evidence_code] pairs
#: (`search/dump_genes.js:384-388`)
EVIDENCE_DBS = ("GO", "PO", "TO")


def group_xrefs(xrefs_long: DataFrame, gene: str = "gene_id") -> DataFrame:
    """A1 — long (gene, db, xref_id, evidence) rows → one row per gene
    with ``xrefs ARRAY<STRUCT<db, ids ARRAY<STRING>>>`` (ids de-duplicated
    and sorted) plus ``ontology_xrefs`` keeping [id, evidence] pairs for
    GO/PO/TO (`search/dump_genes.js:376-392`).

    Two shuffles ((gene, db) then gene), both map-side combinable.
    """
    per_db = xrefs_long.groupBy(gene, "db").agg(
        F.array_sort(F.collect_set("xref_id")).alias("ids"),
        F.array_sort(
            F.collect_set(
                F.when(
                    F.col("db").isin(*EVIDENCE_DBS),
                    F.struct(
                        F.col("xref_id").alias("id"),
                        F.col("evidence").alias("evidence_code"),
                    ),
                )
            )
        ).alias("pairs"),
    )
    return per_db.groupBy(gene).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("db"), F.col("ids")))
        ).alias("xrefs"),
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("db").isin(*EVIDENCE_DBS),
                    F.struct(F.col("db"), F.col("pairs")),
                )
            )
        ).alias("ontology_xrefs"),
    )


# ---------------------------------------------------------------------------
# J3 — deep-merge join with explicit per-column policy
# ---------------------------------------------------------------------------

MergePolicy = Literal["concat_array", "coalesce", "replace"]


def merge_join(
    facts: DataFrame,
    lut: DataFrame,
    on: str | list[str],
    policies: dict[str, MergePolicy],
    broadcast: bool = True,
) -> DataFrame:
    """J3 — the reference's implicit ``_.mergeWith(gene, lut[id],
    concatArrays)`` (`search/doc_merger.js:6-10`) made explicit: every
    shared column gets a declared merge policy.

    * ``concat_array`` — array columns: union-concat, de-duplicated,
      sorted (the reference concatenates; we pin deterministic order).
    * ``coalesce`` — fact value wins, LUT fills nulls.
    * ``replace`` — LUT value wins when present.

    LUT columns not in ``policies`` must not collide with fact columns.
    """
    keys = [on] if isinstance(on, str) else list(on)
    lut_renamed = lut
    for c in policies:
        lut_renamed = lut_renamed.withColumnRenamed(c, f"__lut_{c}")
    rhs = F.broadcast(lut_renamed) if broadcast else lut_renamed
    out = facts.join(rhs, on=keys, how="left")
    for c, policy in policies.items():
        lc = F.col(f"__lut_{c}")
        if policy == "concat_array":
            merged = F.array_sort(
                F.array_distinct(
                    F.concat(
                        F.coalesce(F.col(c), F.array()),
                        F.coalesce(lc, F.array()),
                    )
                )
            )
        elif policy == "coalesce":
            merged = F.coalesce(F.col(c), lc)
        elif policy == "replace":
            merged = F.coalesce(lc, F.col(c))
        else:  # pragma: no cover
            raise ValueError(f"unknown merge policy {policy!r}")
        out = out.withColumn(c, merged)
    return out.drop(*[f"__lut_{c}" for c in policies])


# ---------------------------------------------------------------------------
# A5 + W5 — canonical transcript selection and reorder, inside the array
# ---------------------------------------------------------------------------

def select_canonical_transcript(
    df: DataFrame,
    transcripts: str = "transcripts",
    out: str = "canonical_transcript",
) -> DataFrame:
    """A5 — pick the canonical transcript inside the nested array:
    longest translation, ties → longest transcript, ties → lexicographic
    id (pinning the reference's input-order-dependent tie,
    `search/decorate.js:48-80`). No shuffle: per-row array sort.

    Expects elements ``STRUCT<id, length, translation STRUCT<id, length, …>>``.
    """
    ranked = F.array_sort(
        F.col(transcripts),
        lambda a, b: F.when(_rank_key(a) < _rank_key(b), -1)
        .when(_rank_key(a) > _rank_key(b), 1)
        .otherwise(0),
    )
    return df.withColumn(out, ranked[0]["id"])


def _rank_key(t: Column) -> Column:
    # sort ascending on (-translation_len, -transcript_len, id):
    # build a zero-padded sortable string because array_sort comparators
    # must return a single orderable value per comparison
    tl = F.coalesce(t["translation"]["length"], F.lit(0))
    return F.concat(
        F.lpad((F.lit(10**9) - tl).cast("string"), 10, "0"),
        F.lpad((F.lit(10**9) - F.coalesce(t["length"], F.lit(0))).cast("string"), 10, "0"),
        t["id"],
    )


def canonical_first(
    df: DataFrame,
    transcripts: str = "transcripts",
    canonical: str = "canonical_transcript",
) -> DataFrame:
    """W5 — reorder the transcripts array so the canonical element is at
    position 0 (`search/decorate.js:82-99`), preserving the relative
    order of the rest."""
    is_canon = lambda t: t["id"] == F.col(canonical)  # noqa: E731
    return df.withColumn(
        transcripts,
        F.concat(
            F.filter(F.col(transcripts), is_canon),
            F.filter(F.col(transcripts), lambda t: ~is_canon(t)),
        ),
    )


# ---------------------------------------------------------------------------
# A7 — expression-matrix pivot (atlas gene × experiment docs)
# ---------------------------------------------------------------------------

def pivot_expression_matrix(
    long_df: DataFrame,
    gene: str = "gene_id",
    experiment: str = "experiment",
    group: str = "group",
    value: str = "value",
) -> DataFrame:
    """A7 — the atlas doc-assembly pivot (`atlas/parseBaseline.js:27-41`):
    long (gene, experiment, group, value) samples → one row per gene with
    ``expression MAP<experiment, ARRAY<STRUCT<group, value>>>``.

    A MapType column, not a ``pivot()``: experiment ids are dynamic data
    values (the reference abuses object keys — SURVEY.md §1.3), so the
    schema must not grow a column per experiment. Two map-side-combinable
    shuffles; samples within an experiment sorted by group for
    determinism. NA samples are dropped first (P6, `atlas/parseData.js`).
    """
    clean = long_df.filter(F.col(value).isNotNull())
    per_exp = clean.groupBy(gene, experiment).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(group).alias("group"), F.col(value).alias("value")))
        ).alias("samples")
    )
    return per_exp.groupBy(gene).agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct(F.col(experiment), F.col("samples"))))
        ).alias("expression")
    )


# ---------------------------------------------------------------------------
# P3 — empty-pruning for the document sink
# ---------------------------------------------------------------------------

def nullify_empties(df: DataFrame) -> DataFrame:
    """P3 — the reference deletes ``''`` values and empty objects/arrays
    before load (`search/decorate.js:124-143`). Spark-side: convert empty
    strings/arrays/maps to null (top level and one struct level deep);
    pair with ``to_json(..., ignoreNullFields=true)`` (io.write_jsonl) so
    the sink omits them entirely."""

    def empty_to_null(col: Column, dt: T.DataType) -> Column | None:
        if isinstance(dt, T.StringType):
            return F.when(col == "", F.lit(None)).otherwise(col)
        if isinstance(dt, (T.ArrayType, T.MapType)):
            return F.when(F.size(col) == 0, F.lit(None)).otherwise(col)
        if isinstance(dt, T.StructType):
            parts = []
            for f in dt.fields:
                conv = empty_to_null(col[f.name], f.dataType)
                parts.append((conv if conv is not None else col[f.name]).alias(f.name))
            return F.when(col.isNull(), F.lit(None)).otherwise(F.struct(*parts))
        return None

    out = df
    for field in df.schema.fields:
        conv = empty_to_null(F.col(field.name), field.dataType)
        if conv is not None:
            out = out.withColumn(field.name, conv)
    return out
