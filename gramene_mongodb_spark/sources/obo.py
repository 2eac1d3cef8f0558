"""S6 — OBO ontology flat-file source.

Reference: ``ontologies/obo2json.pl:36-94`` — a stateful Perl loop over
``[Term]`` stanzas producing one doc per term with multi-valued keys
(``is_a``, ``alt_id``, ``synonym``) and the ancestor closure
(``:100-113``).

Spark-first restatement: OBO stanzas are blank-line-delimited, so
``spark.read.option("lineSep", "\\n\\n").text(path)`` yields ONE ROW PER
STANZA with full parallelism (the file splits on block boundaries) —
no stateful parser, no driver-side pass. Field extraction is pure
higher-order column expressions (JVM-side): split to lines, prefix
filter, regex extract. The ancestor closure is the engine's K7 operator
(operators.closure.transitive_closure) over the is_a ∪ part_of edges.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _lines(col: Column) -> Column:
    return F.split(col, r"\n")


def _first_value(lines: Column, key: str) -> Column:
    """Value of the first ``key: value`` line, or null."""
    hits = F.filter(lines, lambda l: l.startswith(key + ": "))
    return F.when(
        F.size(hits) > 0, F.regexp_replace(hits[0], r"^[^:]+: ", "")
    ).otherwise(F.lit(None))


def _all_values(lines: Column, key: str) -> Column:
    """All ``key: value`` values, in file order (possibly empty array)."""
    hits = F.filter(lines, lambda l: l.startswith(key + ": "))
    return F.transform(hits, lambda l: F.regexp_replace(l, r"^[^:]+: ", ""))


def _term_id_num(term: Column) -> Column:
    """Numeric id from ``GO:0001234`` (reference parses with /\\d+/,
    `search/ancestor_adder.js:46`)."""
    return F.regexp_extract(term, r"(\d+)", 1).cast("long")


def read_obo_terms(spark: SparkSession, path: str) -> DataFrame:
    """Parse an OBO file into one row per ``[Term]`` stanza.

    Output columns: ``_id`` (numeric), ``id``, ``name``, ``namespace``,
    ``def``, ``is_a`` (numeric parent ids), ``part_of`` (numeric ids from
    relationship lines), ``alt_id``, ``synonyms`` (raw synonym strings),
    ``is_obsolete``.
    """
    raw = spark.read.option("lineSep", "\n\n").text(path)
    stanzas = raw.filter(F.col("value").startswith("[Term]"))
    lines = _lines(F.col("value"))
    # "is_a: GO:0001234 ! name-comment" → strip trailing comment first
    is_a_vals = F.transform(
        _all_values(lines, "is_a"), lambda v: F.regexp_replace(v, r"\s*!.*$", "")
    )
    part_of_vals = F.transform(
        F.filter(
            _all_values(lines, "relationship"),
            lambda v: v.startswith("part_of "),
        ),
        lambda v: F.regexp_replace(v, r"^part_of\s+|\s*!.*$", ""),
    )
    term_id = _first_value(lines, "id")
    return stanzas.select(
        _term_id_num(term_id).alias("_id"),
        term_id.alias("id"),
        _first_value(lines, "name").alias("name"),
        _first_value(lines, "namespace").alias("namespace"),
        _first_value(lines, "def").alias("def"),
        F.transform(is_a_vals, _term_id_num).alias("is_a"),
        F.transform(part_of_vals, _term_id_num).alias("part_of"),
        _all_values(lines, "alt_id").alias("alt_id"),
        _all_values(lines, "synonym").alias("synonyms"),
        F.coalesce(
            _first_value(lines, "is_obsolete") == F.lit("true"), F.lit(False)
        ).alias("is_obsolete"),
    )


def term_edges(terms: DataFrame) -> DataFrame:
    """Parentage edge list (child, parent) from is_a ∪ part_of — the
    input shape of the K7 closure (the reference merges both edge types
    into one parent map, `ontologies/obo2json.pl:69-81`)."""
    return terms.select(
        F.col("_id").alias("child"),
        F.explode(F.array_union(F.col("is_a"), F.col("part_of"))).alias("parent"),
    ).distinct()


def terms_with_ancestors(
    terms: DataFrame, max_depth: int | None = None
) -> DataFrame:
    """Attach the materialized ``ancestors`` array (sorted numeric ids,
    self excluded) — the doc shape the reference stores
    (`ontologies/obo2json.pl:113`).

    ``max_depth``: optional caller-known bound on the ontology's longest
    is_a/part_of chain (GO/PO/TO publish theirs, ≤ ~20) — forwarded to
    ``transitive_closure``, which then skips the fixpoint-detect rounds
    and may take the proven-size single-task path. Underestimating
    truncates the closure; leave ``None`` when unknown."""
    from gramene_mongodb_spark.operators.closure import (
        ancestor_arrays,
        transitive_closure,
    )

    closure = transitive_closure(term_edges(terms), max_depth=max_depth)
    anc = ancestor_arrays(closure).withColumnRenamed("node", "_id")
    out = terms.join(anc, "_id", "left")
    return out.withColumn(
        "ancestors", F.coalesce(F.col("ancestors"), F.array().cast("array<bigint>"))
    )
