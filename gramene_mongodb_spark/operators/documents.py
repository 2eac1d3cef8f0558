"""Document-assembly operators (SURVEY.md §7 phase B).

The reference's output shape is a deeply-nested gene document
(`search/dump_genes.js:181-201`): xrefs grouped by db, transcripts with
canonical-first ordering, empty fields pruned before load. These
operators build/maintain that shape with pure column expressions —
nesting is cheap in Spark (structs are columnar), and nothing here
shuffles except the explicit groupBys.
"""

from __future__ import annotations

import contextvars
import functools
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


# --------------------------------------------------------------------------
# MongoDB find()-document translation — the reference's query surface
# --------------------------------------------------------------------------

#: exception-free prefilter for string→int/long ``$convert`` with
#: ``onError`` (r15, guide §4): accepts a SUPERSET of ANSI try_cast's
#: integral forms ([\x00-\x20]* trim, optional sign, digits), so gating
#: try_cast behind it never turns a valid conversion into onError —
#: non-matching rows skip try_cast's raise-and-catch failure path
#: (~13 µs/row), matching rows still run it (which settles overflow).
#: Equivalence to plain try_cast is pinned row-for-row by
#: tests/test_properties.py::test_convert_integral_gate_matches_try_cast.
INTEGRAL_GATE_PATTERN = r"^[\x00-\x20]*[+-]?[0-9]+[\x00-\x20]*$"

_CMP_OPS = {
    "$gt": lambda c, v: c > F.lit(v),
    "$gte": lambda c, v: c >= F.lit(v),
    "$lt": lambda c, v: c < F.lit(v),
    "$lte": lambda c, v: c <= F.lit(v),
}


def _mongo_predicate(field: str, spec) -> Column:
    return _col_predicate(F.col(field), spec)


def _col_predicate(col: Column, spec) -> Column:
    if not isinstance(spec, dict):
        # bare equality; null-safe (<=>) so {field: None} matches
        # missing/null like Mongo's {field: null}
        return col.eqNullSafe(F.lit(spec))
    preds: list[Column] = []
    for op, val in spec.items():
        if op in _CMP_OPS:
            preds.append(_CMP_OPS[op](col, val))
        elif op == "$eq":
            preds.append(col.eqNullSafe(F.lit(val)))
        elif op == "$ne":
            # Mongo $ne matches missing fields too — null-safe negate
            preds.append(~col.eqNullSafe(F.lit(val)))
        elif op == "$in":
            if not isinstance(val, (list, tuple)):
                # Mongo errors with "$in needs an array"; a bare string
                # would otherwise ITERATE into per-character equality
                raise ValueError(f"$in requires a list, got {type(val).__name__}")
            vals = [v for v in val if v is not None]
            p = col.isin(vals) if vals else F.lit(False)
            if any(v is None for v in val):
                p = p | col.isNull()
            preds.append(p)
        elif op == "$nin":
            if not isinstance(val, (list, tuple)):
                raise ValueError(f"$nin requires a list, got {type(val).__name__}")
            vals = [v for v in val if v is not None]
            p = ~col.isin(vals) if vals else F.lit(True)
            # SQL NOT IN is null-poisoned; Mongo $nin keeps missing
            # fields unless null is in the list — make that explicit
            if any(v is None for v in val):
                p = p & col.isNotNull()
            else:
                p = p | col.isNull()
            preds.append(p)
        elif op == "$exists":
            preds.append(col.isNotNull() if val else col.isNull())
        elif op == "$regex":
            preds.append(col.rlike(val))
        elif op == "$not":
            # Mongo $not matches docs where the field is MISSING (the
            # inner predicate never ran); a bare ~inner would be
            # null-poisoned and drop them — coalesce first
            preds.append(~F.coalesce(_col_predicate(col, val), F.lit(False)))
        elif op == "$size":
            # array-length match; a null/missing array never matches
            # (Mongo: $size only matches actual arrays)
            if not isinstance(val, int) or isinstance(val, bool):
                raise ValueError("$size requires an int literal")
            preds.append(F.coalesce(F.size(col) == val, F.lit(False)))
        elif op == "$all":
            if not isinstance(val, (list, tuple)):
                raise ValueError("$all requires a list")
            # every listed value must be contained; null/missing arrays
            # never match. Empty $all matches nothing (Mongo: an empty
            # $all matches no documents)
            if not val:
                preds.append(F.lit(False))
            else:
                p = None
                for v in val:
                    c = F.coalesce(
                        F.array_contains(col, F.lit(v)), F.lit(False)
                    )
                    p = c if p is None else p & c
                preds.append(p)
        elif op == "$elemMatch":
            if not isinstance(val, dict) or not val:
                raise ValueError("$elemMatch requires a non-empty document")
            # scalar-element form ({"$gt": 5, "$lt": 9}: operators apply
            # to the element itself) vs document-element form (field
            # specs apply to the element's struct fields) — Mongo
            # forbids mixing them, so do we. Both compile to one
            # F.exists lambda; null/missing arrays never match.
            dollar = [k.startswith("$") for k in val]
            if any(dollar) and not all(dollar):
                raise ValueError(
                    "$elemMatch cannot mix operators and field specs"
                )

            def _elem_pred(x: Column) -> Column:
                if all(dollar):
                    return _col_predicate(x, val)
                ps = [_col_predicate(x[k], v) for k, v in val.items()]
                out = ps[0]
                for q in ps[1:]:
                    out = out & q
                return out

            preds.append(F.coalesce(F.exists(col, _elem_pred), F.lit(False)))
        else:
            raise ValueError(f"unsupported mongo operator: {op}")
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


def mongo_find_filter(query: dict) -> Column:
    """Translate a MongoDB ``find()`` filter document into one Spark
    Column predicate. Supports the surface the reference actually uses
    (`trees/add_domains_to_tree.js:11-20`, `trees/speciesTree.js:267`,
    `reactome/get_species_prefixes.js:26`: equality, range, $in) plus
    the adjacent standard operators: $eq $ne $gt $gte $lt $lte $in
    $nin $exists $regex $not, and top-level $and/$or. Dotted paths
    resolve into struct fields exactly as in Mongo.

    Semantics notes (documented, test-pinned): a MISSING field is a
    NULL column in the relational model, so equality is null-safe
    (``{f: None}`` matches null/missing), $ne and $nin also match
    missing fields (Mongo behavior, NOT SQL's null-poisoned NOT IN),
    and $exists maps to IS [NOT] NULL.
    """
    if not query:
        return F.lit(True)
    preds: list[Column] = []
    for key, spec in query.items():
        if key == "$expr":
            # aggregation expression in query context (Mongo 3.6+):
            # compile through the expression surface; NULL results are
            # falsy, exactly as in Mongo's query engine
            preds.append(_mongo_expr(spec).cast("boolean").eqNullSafe(F.lit(True)))
            continue
        if key in ("$and", "$or"):
            if not isinstance(spec, (list, tuple)) or not spec:
                # Mongo: "$and/$or must be a nonempty array"
                raise ValueError(f"{key} requires a non-empty list")
            sub = [mongo_find_filter(q) for q in spec]
            out = sub[0]
            for s in sub[1:]:
                out = (out & s) if key == "$and" else (out | s)
            preds.append(out)
        else:
            preds.append(_mongo_predicate(key, spec))
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


def mongo_find(
    df: DataFrame, query: dict, projection: dict | None = None
) -> DataFrame:
    """Run a MongoDB ``find(query, projection)`` document against a
    DataFrame — the migration shim that lets a reference user keep
    their existing query documents when the collections move to
    parquet. The filter becomes ONE Column predicate (pure Catalyst
    expressions, so comparisons and $in push down into the parquet
    scan — plan-asserted) and the projection becomes a select/drop.

    Projection follows Mongo's rules: ``{f: 1, ...}`` = include-only
    (inclusion and exclusion cannot mix, ValueError like Mongo's
    error), ``{f: 0, ...}`` = exclude-these.
    """
    out = df.filter(mongo_find_filter(query))
    if projection:
        inc = [k for k, v in projection.items() if v]
        exc = [k for k, v in projection.items() if not v]
        if inc and exc:
            raise ValueError("cannot mix inclusion and exclusion projection")
        out = out.select(*inc) if inc else out.drop(*exc)
    return out


# ---------------------------------------------------------------------------
# Mongo updateMany shim (round-14; the S12 write surface —
# `trees/speciesTree.js:230-252`, `trees/taxonomy.js:48-69` and
# `trees/add_domains_to_tree.js:123-148` all mutate loaded collections
# with update documents)
# ---------------------------------------------------------------------------


#: update operators this shim refuses with the reason — each needs
#: machinery a pure batch transform cannot honestly provide
_UPDATE_REFUSED = {
    "$currentDate": "wall-clock side effect — stamp a literal upstream "
                    "so the run is reproducible",
    "$setOnInsert": "no upsert context in a pure transform — use "
                    "mongo_merge/upsert_parquet for write-time upserts",
    "$bit": "BSON integer bitwise update — restate as a pipeline-form "
            "$set with $mod/arithmetic if genuinely needed",
}


def _update_path(field: str, targets: set[str]) -> None:
    """Validate an update target path and claim it (Mongo errors on two
    operators writing the same path: 'would create a conflict')."""
    if "." in field:
        raise ValueError(
            f"dotted update path {field!r} is refused — nested-field "
            "updates need an explicit struct rebuild (withField)"
        )
    if "$" in field:
        raise ValueError(
            f"positional update path {field!r} is refused — per-element "
            "array updates ($/$[]/arrayFilters) need an explicit "
            "transform() over the array column"
        )
    if field in targets:
        raise ValueError(
            f"updating {field!r} twice would create a conflict (Mongo "
            "raises the same error)"
        )
    targets.add(field)


def _guard_reserved_columns(df: DataFrame, prefix: str, where: str) -> None:
    """Loud refusal when an input collection already uses a helper-column
    prefix the shim stages under (``__upd_`` in :func:`mongo_update_many`,
    ``__swf_`` in the ``$setWindowFields`` compile). Without the guard a
    colliding input column surfaces as an opaque duplicate/ambiguous-
    column AnalysisException deep inside the plan (advisor r14) instead
    of a contract error naming the reserved prefix."""
    hits = [c for c in df.columns if c.startswith(prefix)]
    if hits:
        raise ValueError(
            f"{where}: column names starting with {prefix!r} are reserved "
            f"for the shim's internal staging; rename input column(s) "
            f"{hits} before applying the operator"
        )


def _update_literal(val) -> Column:
    """Literal update argument → Column. Scalars and flat non-empty
    lists of scalars only: classic-form update documents carry BSON
    literals (expressions belong to the pipeline form)."""
    if isinstance(val, (list, tuple)):
        if not val:
            raise ValueError(
                "empty-array literals are refused (element type is "
                "undecidable in a typed engine) — use the pipeline form "
                "with a typed $literal/$filter expression"
            )
        if any(isinstance(v, (list, tuple, dict)) for v in val):
            raise ValueError("nested-array/document literals are refused")
        return F.array(*[F.lit(v) for v in val])
    if isinstance(val, dict):
        raise ValueError(
            "nested-document literals are refused — update top-level "
            "fields, or use the pipeline form with an expression"
        )
    return F.lit(val)


def _require_number(op: str, val) -> None:
    if isinstance(val, bool) or not isinstance(val, (int, float)):
        raise ValueError(f"{op} requires a numeric argument, got {val!r}")


def mongo_update_many(
    df: DataFrame, query: dict, update: dict | list
) -> DataFrame:
    """``updateMany(filter, update)`` shim — the migration twin of the
    reference's collection-mutation sites (`trees/speciesTree.js:230-252`
    `update({_id}, doc, {upsert:true})`, `trees/taxonomy.js:48-69`,
    `trees/add_domains_to_tree.js:123-148` ``updateOne($set)``): apply a
    MongoDB update document to every row matching a find() filter and
    pass every other row through unchanged. Pure column expressions —
    ONE narrow select over the input (no shuffle, no UDF), so the whole
    update runs at scan speed and the filter's pushdown-eligible parts
    still reach the source.

    Classic operator form (``update`` is a dict):

    * ``$set`` — literal values (scalars / flat arrays); expressions
      belong to the pipeline form, as in Mongo. New fields append.
    * ``$unset`` — field → NULL (the house null≈missing convention).
    * ``$inc`` / ``$mul`` — arithmetic; a null/missing field seeds the
      operator's identity exactly as Mongo documents (``$inc`` creates
      the field as the increment, ``$mul`` creates it as 0).
    * ``$min`` / ``$max`` — ``least``/``greatest``; null/missing takes
      the operand (Mongo: sets if the field does not exist). PINNED
      DIVERGENCE (null≈missing): ``$min`` on a row whose stored value
      is a genuine null takes the operand, unlike live Mongo, where
      BSON comparison order puts null BELOW all numbers so $min keeps
      the null — this is the one classic operator where null and
      missing genuinely diverge in Mongo ($max agrees in both systems:
      null sorts below, so the operand wins either way). Test-pinned
      (test_update_min_null_value_pinned_divergence).
    * ``$rename`` — destination gets the source value on matched rows,
      source becomes NULL; both paths are claimed for conflict checks.
    * ``$push`` — append; with ``$each``, the ``$position/$sort/$slice``
      modifiers compile to positional slice-concat / ``sort_array`` /
      ``slice`` in Mongo's pinned apply order (insert at $position →
      sort WHOLE array → slice WHOLE array; negative $position/$slice
      count from the end, 0-$slice empties). ``$sort`` must be 1/-1 —
      elements here are scalars, so Mongo's ``{field: dir}`` document
      sorts have no twin (refused loudly). Null/missing arrays create
      the array from the pushed values, modifiers still applied.
    * ``$addToSet`` — append-if-absent, preserving existing duplicates
      (Mongo does NOT dedup what is already there — array_union would);
      ``$each`` folds left. Null/missing creates the distinct of the
      pushed values.
    * ``$pull`` — drop elements matching a literal or an operator doc
      ({$gt: …} etc., compiled via the find() element predicate);
      null/missing arrays stay null (Mongo no-ops).
    * ``$pullAll`` — drop exact listed values (NOT array_except, which
      would dedup survivors).
    * ``$pop`` — 1 drops the last element, -1 the first; null stays
      null, empty stays empty.

    Pipeline form (``update`` is a list, Mongo 4.2+): ``$set`` /
    ``$addFields`` / ``$unset`` stages whose values go through the
    aggregation expression compiler; stages see the previous stage's
    output (real select per stage) while the FILTER is pinned to the
    original document, exactly Mongo's evaluation order.

    Refused loudly: dotted paths, positional ``$``/``$[]``/arrayFilters,
    and the operators in ``_UPDATE_REFUSED``. The refusal scope is
    checked against the reference: its three update sites send either a
    whole replacement document (speciesTree.js/taxonomy.js upserts —
    covered by io.upsert_parquet_collection / _mongo_merge) or ``$set``
    with a whole TOP-LEVEL document (`add_domains_to_tree.js:127-129`
    ``$set: tree``) — no dotted or positional path appears anywhere in
    the reference, so this shim covers its full update surface.
    """
    if not isinstance(update, (dict, list)) or not update:
        raise ValueError("update must be a non-empty document or pipeline")
    _guard_reserved_columns(df, "__upd_", "mongo_update_many")
    match = mongo_find_filter(query)

    if isinstance(update, list):
        out = df.select("*", match.alias("__upd_match"))
        m = F.col("__upd_match")
        for stage in update:
            if not isinstance(stage, dict) or len(stage) != 1:
                raise ValueError("each pipeline-form stage must be a "
                                 "single-operator document")
            op, body = next(iter(stage.items()))
            if op in ("$set", "$addFields"):
                if not isinstance(body, dict) or not body:
                    raise ValueError(f"{op} requires a non-empty document")
                staged = dict.fromkeys(out.columns)
                for f, e in body.items():
                    _update_path(f, set())  # path shape only, no claim
                    old = F.col(f) if f in staged else F.lit(None)
                    staged[f] = F.when(m, _mongo_expr(e)).otherwise(old)
                out = out.select(*[
                    (c if expr is None else expr.alias(c))
                    for c, expr in staged.items()
                ])
            elif op == "$unset":
                fields = [body] if isinstance(body, str) else list(body)
                for f in fields:
                    _update_path(f, set())
                    if f not in out.columns:
                        continue
                    out = out.withColumn(
                        f, F.when(m, F.lit(None)).otherwise(F.col(f))
                    )
            else:
                raise ValueError(
                    f"pipeline-form update supports $set/$addFields/"
                    f"$unset only, got {op!r}"
                )
        return out.drop("__upd_match")

    updates: dict[str, Column] = {}
    targets: set[str] = set()
    for op, doc in update.items():
        if op in _UPDATE_REFUSED:
            raise ValueError(f"{op} is refused — {_UPDATE_REFUSED[op]}")
        if not isinstance(doc, dict) or not doc:
            raise ValueError(f"{op} requires a non-empty document")
        for f, v in doc.items():
            _update_path(f, targets)
            exists = f in df.columns
            old = F.col(f) if exists else F.lit(None)
            if op == "$set":
                updates[f] = _update_literal(v)
            elif op == "$unset":
                # unset of a statically-missing field is a no-op, but
                # the path STAYS claimed — Mongo raises the update
                # conflict regardless of field existence
                if exists:
                    updates[f] = F.lit(None)
            elif op == "$inc":
                _require_number(op, v)
                updates[f] = F.coalesce(old, F.lit(0)) + F.lit(v)
            elif op == "$mul":
                _require_number(op, v)
                updates[f] = F.coalesce(old, F.lit(0)) * F.lit(v)
            elif op == "$min":
                updates[f] = F.least(old, _update_literal(v))
            elif op == "$max":
                updates[f] = F.greatest(old, _update_literal(v))
            elif op == "$rename":
                if not isinstance(v, str):
                    raise ValueError("$rename target must be a string")
                _update_path(v, targets)
                # Mongo $rename NO-OPS per document when the source
                # field is missing — the destination keeps its prior
                # value (null≈missing: a null source row is a no-op
                # too). A statically-absent source column makes the
                # whole operator a no-op; both paths stay claimed for
                # the conflict check (Mongo checks paths regardless).
                if exists:
                    dest_old = (F.col(v) if v in df.columns
                                else F.lit(None))
                    updates[v] = F.when(old.isNotNull(), old).otherwise(
                        dest_old
                    )
                    updates[f] = F.when(old.isNotNull(), F.lit(None)) \
                        .otherwise(old)
            elif op in ("$push", "$addToSet"):
                push_pos = push_slice = push_sort = None
                if isinstance(v, dict):
                    if "$each" not in v:
                        raise ValueError(
                            f"{op} modifiers require $each (as in Mongo); "
                            "nested-document literals are refused"
                        )
                    allowed = ({"$each"} if op == "$addToSet"
                               else {"$each", "$slice", "$sort", "$position"})
                    extra = set(v) - allowed
                    if extra:
                        raise ValueError(
                            f"{op} modifiers {sorted(extra)} are refused — "
                            + ("$addToSet accepts $each only (as in Mongo)"
                               if op == "$addToSet"
                               else "$push supports $each/$slice/$sort/"
                                    "$position")
                        )
                    each = v["$each"]
                    if not isinstance(each, (list, tuple)):
                        raise ValueError("$each requires a list")
                    if op == "$push":
                        # Mongo's pinned apply order: insert $each at
                        # $position, $sort the WHOLE array, $slice the
                        # WHOLE array — compiled below as positional
                        # slice-concat + sort_array + slice, all linear
                        # column expressions
                        push_pos = v.get("$position")
                        push_slice = v.get("$slice")
                        push_sort = v.get("$sort")
                        for name_, val_ in (("$position", push_pos),
                                            ("$slice", push_slice)):
                            if val_ is not None and (
                                isinstance(val_, bool)
                                or not isinstance(val_, int)
                            ):
                                raise ValueError(
                                    f"$push {name_} must be an int"
                                )
                        if push_sort is not None and push_sort not in (1, -1):
                            raise ValueError(
                                "$push $sort must be 1 or -1 — array "
                                "elements here are scalars (nested-"
                                "document literals are refused), so "
                                "Mongo's {field: dir} document sorts "
                                "have no twin"
                            )
                else:
                    each = [v]
                arr = F.array(*[F.lit(x) for x in each])

                def _push_mods(c: Column, _sort=push_sort, _sl=push_slice
                               ) -> Column:
                    # $sort then $slice over the whole array (Mongo's
                    # order). sort_array's null placement matches BSON:
                    # ascending → nulls first (null sorts lowest),
                    # descending → nulls last. Negative $slice keeps
                    # the LAST |n| elements; 0 empties the array.
                    if _sort is not None:
                        c = F.sort_array(c, asc=_sort == 1)
                    if _sl is not None:
                        if _sl >= 0:
                            c = F.slice(c, F.lit(1), F.lit(_sl))
                        else:
                            sz = F.size(c)
                            c = F.slice(
                                c,
                                F.greatest(sz + F.lit(_sl + 1), F.lit(1)),
                                F.lit(-_sl),
                            )
                    return c

                def _pos_insert(base: Column, _p=push_pos) -> Column:
                    # insert the $each values at $position: negative
                    # counts from the end, beyond-length clamps to the
                    # end — Mongo's documented normalization
                    if _p is None:
                        return F.concat(base, arr)
                    sz = F.size(base)
                    cut = (F.greatest(sz + F.lit(_p), F.lit(0))
                           if _p < 0 else F.least(F.lit(_p), sz))
                    return F.concat(
                        F.slice(base, F.lit(1), cut),
                        arr,
                        F.slice(base, cut + F.lit(1), sz - cut),
                    )

                if not exists:
                    # missing array: Mongo creates it from the pushed
                    # values ($addToSet additionally dedups them), then
                    # $sort/$slice still apply
                    updates[f] = (_push_mods(arr) if op == "$push"
                                  else F.array_distinct(arr))
                elif op == "$push":
                    updates[f] = F.when(
                        old.isNull(), _push_mods(arr)
                    ).otherwise(_push_mods(_pos_insert(old)))
                else:
                    # append-if-absent in ONE linear pass: dedup the
                    # $each values (array_distinct keeps the FIRST
                    # occurrence — same winner as a left fold), drop
                    # those already present via a null-safe exists
                    # (NOT array_contains — a null needle over an
                    # array that already holds null must no-op; Mongo
                    # treats null as a value, and array_contains is
                    # NULL there), then concat the survivors. A
                    # when/otherwise fold that re-embeds the
                    # accumulated expression grows the Catalyst tree
                    # ~3^n in the $each length (advisor r14) and
                    # stalls plan compilation at a few dozen values;
                    # this form is linear and semantically identical.
                    def _absent(have: Column):
                        # closure, not a default arg — HOF lambdas are
                        # arity-sensitive (2nd param = element index)
                        def pred(x: Column) -> Column:
                            return ~F.exists(
                                have, lambda e: e.eqNullSafe(x)
                            )

                        return pred

                    updates[f] = F.when(
                        old.isNull(), F.array_distinct(arr)
                    ).otherwise(
                        F.concat(
                            old,
                            F.filter(F.array_distinct(arr), _absent(old)),
                        )
                    )
            elif op in ("$pull", "$pullAll", "$pop"):
                if op == "$pullAll" and not isinstance(v, (list, tuple)):
                    raise ValueError("$pullAll requires a list")
                if op == "$pop" and (v not in (1, -1) or isinstance(v, bool)):
                    raise ValueError("$pop requires 1 (last) or -1 (first)")
                if not exists:
                    # Mongo no-ops on missing arrays, but the path stays
                    # claimed — the conflict error fires regardless
                    continue
                # NOTE: pyspark HOF lambdas are ARITY-sensitive (a 2nd
                # parameter means "element index"), so captures must be
                # closures, never default arguments
                if op == "$pull":
                    def _pull_keep(q):
                        return lambda x: ~F.coalesce(
                            _col_predicate(x, q), F.lit(False)
                        )

                    updates[f] = F.filter(old, _pull_keep(v))
                elif op == "$pullAll":
                    def _pull_all_keep(vals, drop_null):
                        def _keep(x: Column) -> Column:
                            k = (~F.coalesce(x.isin(vals), F.lit(False))
                                 if vals else F.lit(True))
                            return k & x.isNotNull() if drop_null else k

                        return _keep

                    updates[f] = F.filter(
                        old,
                        _pull_all_keep(
                            [x for x in v if x is not None], None in v
                        ),
                    )
                else:
                    start = F.lit(1) if v == 1 else F.lit(2)
                    updates[f] = F.slice(
                        old, start, F.greatest(F.size(old) - 1, F.lit(0))
                    )
            else:
                raise ValueError(f"unsupported update operator: {op}")

    final = [
        (F.when(match, updates[c]).otherwise(F.col(c)).alias(c)
         if c in updates else F.col(c))
        for c in df.columns
    ]
    final += [
        F.when(match, updates[f]).otherwise(F.lit(None)).alias(f)
        for f in updates
        if f not in df.columns
    ]
    return df.select(*final)


# ---------------------------------------------------------------------------
# Mongo aggregation-pipeline shim (round-11; completes the migration
# surface mongo_find started — reference read sites issue aggregation
# pipelines downstream of `trees/add_domains_to_tree.js:11-20` and
# `search/genetree_adder.js:94-99`)
# ---------------------------------------------------------------------------


#: strict-$switch compile flag. A ContextVar (not a module global) so
#: concurrent mongo_aggregate calls from different driver threads — the
#: normal shape for parallel Spark job submission — can't leak strict
#: mode into each other's plan construction (round-13 advice).
_STRICT_SWITCH: contextvars.ContextVar[bool] = contextvars.ContextVar(
    "mongo_strict_switch", default=False
)


def _bool_convert(inp: Column, lenient: bool) -> Column:
    """Boolean conversion with Mongo's string refusal pinned. string→bool
    is UNSUPPORTED in MongoDB — ``$convert {to:'bool'}`` / ``$toBool``
    error (or fire onError) for EVERY string, even ``'true'`` — while
    Spark's cast parses ``'true'/'t'/'yes'/'1'`` etc., a silent
    divergence (advisor r14). The string case is therefore compiled to
    the Mongo behavior explicitly; ``typeof()`` is static per column, so
    non-string inputs pay nothing. With ``lenient`` (the caller has
    onError) strings map to NULL so the caller's
    ``coalesce(conv, onError)`` takes the onError branch for every
    string — exactly Mongo; without it a NON-NULL string raises at
    runtime (CaseWhen branches evaluate lazily per row, so null inputs —
    resolved by the caller's onNull wrapper / plain NULL — never reach
    the raise)."""
    is_str = F.typeof(inp) == F.lit("string")
    if lenient:
        return F.when(is_str, F.lit(None).cast("boolean")).otherwise(
            inp.try_cast("boolean")
        )
    return F.when(
        is_str & inp.isNotNull(),
        F.raise_error(F.lit(
            "$convert/$toBool: string input to a bool target is "
            "unsupported in MongoDB (it errors for every string) — "
            "supply onError, or compare the string explicitly upstream"
        )).cast("boolean"),
    ).otherwise(inp.cast("boolean"))


#: unary Mongo math/string/cast operators with direct Spark twins.
#: Casts follow the session's cast semantics: under ANSI (the Spark 4
#: default) an unparseable $toInt/$toLong/$toDouble ERRORS at runtime —
#: exactly what Mongo's conversion operators do; with ANSI off the cast
#: yields NULL instead (Mongo's $convert-with-onNull shape). Neither is
#: silently approximated, both are documented.
_EXPR_UNARY = {
    "$abs": F.abs, "$ceil": F.ceil, "$floor": F.floor,
    "$sqrt": F.sqrt, "$exp": F.exp, "$ln": F.log, "$log10": F.log10,
    "$trunc": lambda c: c.cast("long"),
    "$toUpper": F.upper, "$toLower": F.lower,
    "$strLenCP": F.length,
    # byte-oriented lengths: UTF-8 bytes for strings, payload bytes for
    # BinaryType ($binarySize accepts both, as in Mongo)
    "$strLenBytes": F.octet_length, "$binarySize": F.octet_length,
    "$trim": lambda c: F.trim(c), "$ltrim": lambda c: F.ltrim(c),
    "$rtrim": lambda c: F.rtrim(c),
    "$toString": lambda c: c.cast("string"),
    "$toInt": lambda c: c.cast("int"),
    "$toLong": lambda c: c.cast("long"),
    "$toDouble": lambda c: c.cast("double"),
    # string→bool pinned to Mongo's refusal (see _bool_convert)
    "$toBool": lambda c: _bool_convert(c, lenient=False),
    "$size": F.size,
    "$not": lambda c: ~c.cast("boolean"),
    # date parts — these read the column's WALL CLOCK (tz-proof on
    # TIMESTAMP_NTZ, the engine's house flavor; see catalog._epoch_s).
    # Mongo's optional timezone argument is refused, not defaulted
    # (the document form below). $dayOfWeek: Mongo and Spark agree on
    # 1=Sunday..7=Saturday.
    "$year": F.year, "$month": F.month, "$dayOfMonth": F.dayofmonth,
    "$hour": F.hour, "$minute": F.minute, "$second": F.second,
    "$dayOfWeek": F.dayofweek, "$dayOfYear": F.dayofyear,
    # trigonometry (Mongo 4.2) — JVM libm; differentials vs Python's
    # math module assert ≤1 ulp-class tolerance, not bit equality
    "$sin": F.sin, "$cos": F.cos, "$tan": F.tan,
    "$asin": F.asin, "$acos": F.acos, "$atan": F.atan,
    "$sinh": F.sinh, "$cosh": F.cosh, "$tanh": F.tanh,
    "$degreesToRadians": F.radians, "$radiansToDegrees": F.degrees,
}

#: Mongo $dateToString format specifiers → Spark date_format patterns.
#: Unknown specifiers and stray letters are refused (a letter that
#: slips through unquoted would be INTERPRETED by the Java pattern).
_DATE_FMT = {"%Y": "yyyy", "%m": "MM", "%d": "dd", "%H": "HH",
             "%M": "mm", "%S": "ss", "%L": "SSS", "%j": "DDD", "%%": "%"}


def _mongo_date_format(fmt: str) -> str:
    out = []
    i = 0
    while i < len(fmt):
        if fmt[i] == "%":
            spec = fmt[i:i + 2]
            if spec not in _DATE_FMT:
                raise ValueError(f"unsupported $dateToString specifier {spec!r}")
            out.append(_DATE_FMT[spec])
            i += 2
        elif fmt[i].isalpha():
            raise ValueError(
                f"literal letter {fmt[i]!r} in $dateToString format — quote "
                "it with a specifier or remove it (unquoted letters are "
                "pattern syntax in Spark)"
            )
        else:
            out.append(fmt[i])
            i += 1
    return "".join(out)


def _mongo_expr(spec, env: dict | None = None) -> Column:
    """MongoDB aggregation value expression → Spark Column.

    Surface: ``"$f"`` field paths (dotted paths resolve into struct
    fields), ``"$$var"`` bound variables (``$$this``/``$$value`` from
    the higher-order operators below, plus custom ``as`` names), bare
    literals, ``{"$literal": v}``, ``$cond``/``$switch``, comparisons
    (null-safe $eq/$ne — the find() rule), arithmetic ``$add/
    $subtract/$multiply/$divide/$mod/$pow``, unary math
    (``$abs/$ceil/$floor/$trunc/$sqrt/$exp/$ln/$log10``), strings
    (``$concat/$toUpper/$toLower/$strLenCP/$substrCP/$split/$trim``
    family — ``$substrCP`` keeps Mongo's 0-indexing; ``$split``'s
    delimiter is a literal, regex-escaped into Spark's split),
    casts (``$toString/$toInt/$toLong/$toDouble/$toBool`` — NULL on
    unparseable where Mongo errors, documented), booleans
    (``$and/$or/$not``), arrays (``$size/$arrayElemAt/$slice/$in/
    $concatArrays/$setUnion/$setIntersection/$setDifference`` —
    ``$arrayElemAt`` keeps 0-indexing and negative-from-end;
    ``$slice`` takes Mongo's [arr, n] / [arr, pos, n] int-literal
    forms), the higher-order trio ``$filter/$map/$reduce``
    compiled to Spark's filter/transform/aggregate lambdas (all
    JVM-side — no Python UDF anywhere in the shim), regex
    (``$regexMatch/$regexFind`` — literal pattern, imsx options as
    inline flags), dynamic-key documents over MapType
    (``$objectToArray/$arrayToObject/$mergeObjects`` — duplicate-key
    behavior follows spark.sql.mapKeyDedupPolicy, pinned at each
    site), date arithmetic (``$dateAdd/$dateSubtract/$dateDiff/
    $dateTrunc`` — wall-clock, timezone refused; $dateDiff counts
    Mongo's unit-boundary CROSSINGS via truncate-then-diff; weeks are
    Monday-only), date parsing (``$toDate/$dateFromString`` —
    NULL-on-unparseable, TIMESTAMP_NTZ wall clock via the
    TZ-cancelling LTZ→NTZ round-trip), ``$let`` variable binding,
    ``$round`` (half-to-even, as Mongo), string editing
    (``$replaceOne/$replaceAll/$strcasecmp/$indexOfCP``), and set
    predicates (``$setEquals/$setIsSubset/$anyElementTrue/
    $allElementsTrue``). Anything else raises — silent approximation
    is worse than an explicit gap."""
    if isinstance(spec, str) and spec.startswith("$$"):
        path = spec[2:].split(".")
        if not env or path[0] not in env:
            raise ValueError(f"unbound aggregation variable $${path[0]}")
        col = env[path[0]]
        for fld in path[1:]:
            col = col[fld]
        return col
    if isinstance(spec, str) and spec.startswith("$"):
        return F.col(spec[1:])
    if isinstance(spec, dict):
        if spec and not any(k.startswith("$") for k in spec):
            # embedded-document expression (no $-operator keys):
            # Mongo builds a sub-document field-wise → struct
            return F.struct(*[
                _mongo_expr(v, env).alias(k) for k, v in spec.items()
            ])
        if len(spec) != 1:
            raise ValueError(f"expression must have one operator: {spec}")
        op, args = next(iter(spec.items()))
        sub = lambda s, e=None: _mongo_expr(s, e if e is not None else env)
        if op == "$literal":
            # documents → structs and arrays recurse (F.lit cannot take
            # a dict); scalars stay verbatim — no operator evaluation
            # anywhere inside, as in Mongo
            def _lit(v):
                if isinstance(v, dict):
                    return F.struct(*[_lit(x).alias(k) for k, x in v.items()])
                if isinstance(v, (list, tuple)):
                    return F.array(*[_lit(x) for x in v])
                return F.lit(v)

            return _lit(args)
        if op == "$cond":
            if isinstance(args, dict):
                cond, then, els = args["if"], args["then"], args["else"]
            else:
                cond, then, els = args
            return F.when(sub(cond), sub(then)).otherwise(sub(els))
        if op == "$switch":
            out = None
            for br in args["branches"]:
                c, t = sub(br["case"]), sub(br["then"])
                out = F.when(c, t) if out is None else out.when(c, t)
            if out is None:
                raise ValueError("$switch requires at least one branch")
            if "default" not in args and _STRICT_SWITCH.get():
                # Mongo errors at RUNTIME when a document falls through a
                # no-default $switch; strict mode reproduces that with
                # raise_error so the shim can validate a migration
                # instead of papering over the gap with NULL
                return out.otherwise(F.raise_error(F.lit(
                    "$switch could not find a matching branch for an "
                    "input, and no default was specified")))
            return out.otherwise(sub(args.get("default")))
        if op == "$filter":
            inp, var = sub(args["input"]), args.get("as", "this")
            e0 = env or {}
            return F.filter(
                inp, lambda x: sub(args["cond"], {**e0, var: x}).cast("boolean")
            )
        if op == "$map":
            inp, var = sub(args["input"]), args.get("as", "this")
            e0 = env or {}
            return F.transform(inp, lambda x: sub(args["in"], {**e0, var: x}))
        if op == "$reduce":
            inp = sub(args["input"])
            e0 = env or {}
            return F.aggregate(
                inp,
                sub(args["initialValue"]),
                lambda acc, x: sub(args["in"], {**e0, "value": acc, "this": x}),
            )
        if op == "$dateToString":
            if not isinstance(args, dict) or "date" not in args:
                raise ValueError("$dateToString requires a document with date")
            if args.get("timezone") is not None:
                raise ValueError(
                    "$dateToString timezone is refused — the shim formats "
                    "the column's wall clock (TIMESTAMP_NTZ house flavor); "
                    "convert explicitly upstream if you need another zone"
                )
            fmt = args.get("format", "%Y-%m-%dT%H:%M:%S.%L")
            return F.date_format(sub(args["date"]), _mongo_date_format(fmt))
        if (op in _EXPR_UNARY and op.startswith("$") and isinstance(args, dict)
                and "date" in args):
            # document form of the date parts ({date, timezone?})
            if args.get("timezone") is not None:
                raise ValueError(f"{op} timezone is refused — wall clock only")
            return _EXPR_UNARY[op](sub(args["date"]))
        if op == "$let":
            # {vars: {name: expr}, in: expr} — vars evaluate in the
            # OUTER scope (a var may not reference a sibling, as in
            # Mongo), then extend the binding environment for `in`
            if not isinstance(args, dict) or not {"vars", "in"} <= set(args):
                raise ValueError("$let requires {vars, in}")
            outer = env or {}
            bound = {name: _mongo_expr(v, outer)
                     for name, v in args["vars"].items()}
            return _mongo_expr(args["in"], {**outer, **bound})
        if op == "$convert":
            # {input, to, onError?, onNull?} — the general conversion
            # operator behind the $to* shorthands. `to` is the string
            # type name ("int"/"long"/"double"/"bool"/"string"/"date");
            # numeric BSON type ids and decimal/objectId targets are
            # refused. WITHOUT onError the cast follows the session's
            # cast semantics (ANSI default: unparseable input ERRORS at
            # runtime — Mongo's own default); WITH onError the cast is
            # try_cast and a failed conversion of a NON-null input
            # takes the onError expression. onNull fires only when the
            # input itself is null/missing (Mongo's rule; a legal
            # conversion of a non-null value can never yield null, so
            # the two branches cannot collide). to:"date" routes
            # through the $toDate parse (strings only, NTZ wall clock)
            # and, like $toDate, is ALWAYS null-on-unparseable — so
            # onError there requires no ANSI bypass. to:"bool" pins
            # Mongo's string refusal (string→bool is unsupported there;
            # see _bool_convert). TYPED-ENGINE
            # divergence (pinned, not hidden): onError/onNull values
            # must be of (or coercible to) the TARGET type — BSON lets
            # onError return a string where a date failed; a typed
            # column cannot, and the coercion failure is loud.
            if not isinstance(args, dict) or not {"input", "to"} <= set(args):
                raise ValueError("$convert requires {input, to}")
            extra = set(args) - {"input", "to", "onError", "onNull"}
            if extra:
                raise ValueError(f"$convert unknown fields: {extra}")
            to = args["to"]
            targets = {"int": "int", "long": "long", "double": "double",
                       "bool": "boolean", "string": "string"}
            if to != "date" and to not in targets:
                raise ValueError(
                    f"$convert to {to!r} is refused — supported targets: "
                    "int/long/double/bool/string/date (numeric BSON type "
                    "ids, decimal and objectId are not representable here)"
                )
            inp = sub(args["input"])
            if to == "date":
                conv = F.try_to_timestamp(inp).cast("timestamp_ntz")
            elif to == "bool":
                # Mongo has no string→bool conversion — pinned refusal
                # (errors without onError, onError-for-every-string
                # with it); see _bool_convert
                conv = _bool_convert(inp, lenient="onError" in args)
            elif "onError" in args:
                conv = inp.try_cast(targets[to])
                if to in ("int", "long"):
                    # r15 (guide §4 boundary-adjacent cost): try_cast on
                    # a STRING that fails to parse raises-and-catches a
                    # JVM exception PER ROW (~13 µs) — an all-invalid
                    # column measured 2.05 s vs 0.17 s for 150k rows.
                    # Gate string inputs through an exception-free
                    # pattern test that accepts a SUPERSET of ANSI's
                    # integral forms ([\x00-\x20]* trim, optional sign,
                    # digits — differential-tested against try_cast over
                    # whitespace/control/sign/decimal/overflow/Unicode
                    # corpora): matching rows still run try_cast (which
                    # settles overflow), non-matching rows go straight
                    # to null→onError with no exception. Non-string
                    # inputs keep the plain try_cast (a double's string
                    # form would fail the integral pattern).
                    _ipat = INTEGRAL_GATE_PATTERN
                    conv = F.when(
                        F.typeof(inp) == "string",
                        F.when(inp.cast("string").rlike(_ipat),
                               inp.try_cast(targets[to])),
                    ).otherwise(inp.try_cast(targets[to]))
            else:
                conv = inp.cast(targets[to])
            if "onError" in args:
                conv = F.coalesce(conv, sub(args["onError"]))
            on_null = (sub(args["onNull"]) if "onNull" in args
                       else F.lit(None))
            return F.when(inp.isNull(), on_null).otherwise(conv)
        if op in ("$isNumber", "$type"):
            # typedness is STATIC in a relational engine (a double
            # column is numeric for every row), so these compile to a
            # typeof() check — constant per column, null-aware per row
            # (Mongo: $isNumber(null) = false, $type(null) = "null").
            c = sub(args)
            t = F.typeof(c)
            if op == "$isNumber":
                # exact names + a decimal(p,s) prefix — an anchored-left
                # rlike would also match 'interval day to second' via
                # the 'int' alternative
                return F.when(c.isNull(), F.lit(False)).otherwise(
                    t.isin("tinyint", "smallint", "int", "bigint",
                           "float", "double")
                    | t.startswith("decimal")
                )
            name = (
                F.when(t == F.lit("string"), F.lit("string"))
                .when(t.isin("tinyint", "smallint", "int"), F.lit("int"))
                .when(t == F.lit("bigint"), F.lit("long"))
                .when(t.isin("float", "double"), F.lit("double"))
                .when(t.startswith("decimal"), F.lit("decimal"))
                .when(t == F.lit("boolean"), F.lit("bool"))
                .when(t.isin("timestamp", "timestamp_ntz", "date"),
                      F.lit("date"))
                .when(t.startswith("array"), F.lit("array"))
                .when(t.startswith("struct") | t.startswith("map"),
                      F.lit("object"))
                .when(t == F.lit("binary"), F.lit("binData"))
                .otherwise(t)  # unmapped Spark type: raw name, documented
            )
            return F.when(c.isNull(), F.lit("null")).otherwise(name)
        if op in ("$dateFromString", "$toDate"):
            # $toDate accepts strings only (epoch-number forms refused
            # — make the millis→timestamp cast explicit upstream);
            # $dateFromString takes {dateString, format?} with the
            # same %-specifier table as $dateToString. Both return
            # NULL on unparseable input (the house try_-cast rule,
            # pinned like $toInt/$toLong — Mongo errors by default;
            # its onError:null form is this exact behavior). timezone
            # refused (wall clock only).
            # try_to_timestamp yields the session-default (LTZ) type;
            # the immediate NTZ cast reinterprets that instant back in
            # the SAME session zone, so the composition returns the
            # string's wall clock unchanged under ANY session timezone
            # (house TIMESTAMP_NTZ flavor; cross-TZ-sweep-proof)
            if op == "$toDate":
                return F.try_to_timestamp(sub(args)).cast("timestamp_ntz")
            if not isinstance(args, dict) or "dateString" not in args:
                raise ValueError("$dateFromString requires {dateString}")
            if args.get("timezone") is not None:
                raise ValueError("$dateFromString timezone is refused — "
                                 "wall clock only")
            if set(args) - {"dateString", "format"}:
                raise ValueError("$dateFromString supports {dateString, "
                                 "format} only (onError/onNull: the NULL-"
                                 "on-unparseable contract is built in)")
            ds = sub(args["dateString"])
            if "format" not in args:
                return F.try_to_timestamp(ds).cast("timestamp_ntz")
            return F.try_to_timestamp(
                ds, F.lit(_mongo_date_format(args["format"]))
            ).cast("timestamp_ntz")
        if op in ("$regexMatch", "$regexFind"):
            # {input, regex, options?} — regex must be a LITERAL (Spark
            # compiles the pattern plan-side); Mongo options i/m/s/x
            # become Java inline flags. $regexFind returns Mongo's
            # {match, idx, captures} struct for the FIRST match, NULL
            # when none. Pinned divergences: idx counts UTF-16 code
            # units (Java), Mongo counts code points — equal on BMP
            # text; a non-participating capture group yields '' where
            # Mongo yields null (regexp_extract has no tri-state).
            if not isinstance(args, dict) or not {"input", "regex"} <= set(args):
                raise ValueError(f"{op} requires {{input, regex}}")
            pattern = args["regex"]
            if isinstance(pattern, dict) and set(pattern) == {"$literal"}:
                pattern = pattern["$literal"]
            if not isinstance(pattern, str) or pattern.startswith("$"):
                raise ValueError(f"{op} regex must be a literal string "
                                 "(wrap in {'$literal': …} if it starts "
                                 "with '$')")
            opts = args.get("options", "")
            if not set(opts) <= set("imsx"):
                raise ValueError(f"{op} options must be drawn from imsx")
            if opts:
                pattern = f"(?{opts})" + pattern
            inp = sub(args["input"])
            if op == "$regexMatch":
                return inp.rlike(pattern)
            import re as _re

            ngroups = _re.compile(pattern).groups
            matched = F.regexp_substr(inp, F.lit(pattern))  # NULL if no match
            idx = (F.regexp_instr(inp, F.lit(pattern)) - 1).cast("int")
            caps = (F.array(*[F.regexp_extract(inp, pattern, g + 1)
                              for g in range(ngroups)])
                    if ngroups else F.array().cast("array<string>"))
            return F.when(matched.isNotNull(), F.struct(
                matched.alias("match"), idx.alias("idx"),
                caps.alias("captures")))
        if op == "$objectToArray":
            # MapType input only — the house flavor for Mongo's
            # dynamic-key objects (SURVEY §1.3); a STRUCT input has a
            # static schema, so Catalyst rejects it at analysis (loud),
            # and the faithful restatement is an explicit projection.
            arg = args[0] if isinstance(args, (list, tuple)) \
                and len(args) == 1 else args
            return F.transform(
                F.map_entries(sub(arg)),
                lambda e: F.struct(e["key"].alias("k"), e["value"].alias("v")),
            )
        if op == "$arrayToObject":
            # array<struct<k,v>> form (what $objectToArray emits); the
            # [[k,v], …] pair-array form is refused. Duplicate keys
            # follow spark.sql.mapKeyDedupPolicy — default EXCEPTION
            # raises loudly where Mongo keeps the LAST value; set
            # LAST_WIN to match Mongo exactly.
            arg = args[0] if isinstance(args, (list, tuple)) \
                and len(args) == 1 else args
            return F.map_from_entries(F.transform(
                sub(arg), lambda e: F.struct(e["k"], e["v"])))
        if op == "$mergeObjects":
            # EXPRESSION form over MapType documents: later fields win
            # (map_concat under mapKeyDedupPolicy=LAST_WIN; the default
            # EXCEPTION raises loudly on a key collision). Divergence,
            # pinned: Mongo silently skips null/missing inputs;
            # map_concat null-propagates — coalesce upstream. The
            # ACCUMULATOR form stays refused (_mongo_accumulator).
            if not isinstance(args, (list, tuple)) or len(args) < 2:
                raise ValueError("$mergeObjects (expression form) requires "
                                 "a list of two or more map inputs")
            return F.map_concat(*[sub(a) for a in args])
        if op in ("$dateAdd", "$dateSubtract"):
            # {startDate, unit, amount, timezone?} — literal unit,
            # wall-clock arithmetic (timezone refused, house NTZ rule)
            if not isinstance(args, dict) \
                    or not {"startDate", "unit", "amount"} <= set(args):
                raise ValueError(f"{op} requires {{startDate, unit, amount}}")
            if args.get("timezone") is not None:
                raise ValueError(f"{op} timezone is refused — wall clock only")
            unit = args["unit"]
            if unit not in ("year", "quarter", "month", "week", "day",
                            "hour", "minute", "second", "millisecond"):
                raise ValueError(f"{op} unit {unit!r} is not supported")
            amount = sub(args["amount"])
            if op == "$dateSubtract":
                amount = -amount
            return F.timestamp_add(unit.upper(), amount, sub(args["startDate"]))
        if op in ("$replaceOne", "$replaceAll"):
            # {input, find, replacement} — find/replacement are
            # expressions (Mongo matches the literal find STRING, no
            # regex). $replaceAll → F.replace (literal-string
            # semantics); $replaceOne via locate/concat splice, also
            # literal. Mongo returns null when input is null; a null
            # find errors in Mongo and null-propagates here (pinned).
            if not isinstance(args, dict) \
                    or not {"input", "find", "replacement"} <= set(args):
                raise ValueError(
                    f"{op} requires {{input, find, replacement}}")
            inp = sub(args["input"])
            find = sub(args["find"])
            repl = sub(args["replacement"])
            if op == "$replaceAll":
                return F.replace(inp, find, repl)
            pos = F.instr(inp, find)
            return F.when(
                pos > 0,
                F.concat(
                    F.substring(inp, F.lit(1), pos - 1),
                    repl,
                    F.substring(inp, pos + F.length(find),
                                F.length(inp)),
                ),
            ).otherwise(inp)
        if op == "$dateTrunc":
            # {date, unit, binSize?, timezone?, startOfWeek?} —
            # binSize≠1 refused (no silent bucketing), timezone
            # refused (house wall-clock rule), week is Monday-only
            # (Spark's date_trunc week base; Mongo's Sunday default
            # refused rather than silently shifted)
            if not isinstance(args, dict) or not {"date", "unit"} <= set(args):
                raise ValueError("$dateTrunc requires {date, unit}")
            if args.get("timezone") is not None:
                raise ValueError("$dateTrunc timezone is refused — wall "
                                 "clock only")
            if args.get("binSize", 1) != 1:
                raise ValueError("$dateTrunc binSize != 1 is not supported")
            unit = args["unit"]
            if unit not in ("year", "quarter", "month", "week", "day",
                            "hour", "minute", "second", "millisecond"):
                raise ValueError(f"$dateTrunc unit {unit!r} is not supported")
            if unit == "week" and str(
                    args.get("startOfWeek", "sunday")).lower() != "monday":
                raise ValueError(
                    "$dateTrunc week unit requires startOfWeek: 'monday' "
                    "(Spark weeks are Monday-based; Mongo's Sunday default "
                    "is refused rather than silently shifted)")
            return F.date_trunc(unit, sub(args["date"]))
        if op == "$strcasecmp":
            if not isinstance(args, (list, tuple)) or len(args) != 2:
                raise ValueError("$strcasecmp requires a two-element list")
            a, b = F.lower(sub(args[0])), F.lower(sub(args[1]))
            return (F.when(a < b, -1).when(a > b, 1).otherwise(0)
                    .cast("int"))
        if op == "$indexOfCP":
            # [str, substr] — 0-based index of first occurrence, -1
            # when absent (instr is 1-based, 0 for absent). The
            # start/end range form is refused. Code-point caveat as
            # $regexFind's idx: UTF-16 units, equal on BMP text.
            if not isinstance(args, (list, tuple)) or len(args) != 2:
                raise ValueError("$indexOfCP supports the two-argument "
                                 "form only (start/end ranges refused)")
            return (F.instr(sub(args[0]), sub(args[1])) - 1).cast("int")
        if op in ("$setEquals", "$setIsSubset"):
            if not isinstance(args, (list, tuple)) or len(args) < 2:
                raise ValueError(f"{op} requires at least two arrays")
            if op == "$setIsSubset":
                if len(args) != 2:
                    raise ValueError("$setIsSubset takes exactly two arrays")
                a, b = sub(args[0]), sub(args[1])
                return F.size(F.array_except(a, b)) == 0
            cols = [sub(a) for a in args]
            out = None
            for x, y in zip(cols, cols[1:]):
                e = (F.size(F.array_except(x, y)) == 0) & \
                    (F.size(F.array_except(y, x)) == 0)
                out = e if out is None else out & e
            return out
        if op in ("$anyElementTrue", "$allElementsTrue"):
            # Mongo wraps the array in a one-element list
            arg = args[0] if isinstance(args, (list, tuple)) \
                and len(args) == 1 else args
            arr = sub(arg)
            fn = F.exists if op == "$anyElementTrue" else F.forall
            return fn(arr, lambda x: x.cast("boolean"))
        if op == "$dateDiff":
            # Mongo counts unit-BOUNDARY crossings (23:59→00:01 is one
            # day), not elapsed whole units — truncate both endpoints
            # to the unit, then count units between the truncations.
            # week requires an explicit startOfWeek of "monday" (Spark
            # date_trunc weeks are Monday-based; Mongo defaults to
            # Sunday — refused rather than silently shifted).
            if not isinstance(args, dict) \
                    or not {"startDate", "endDate", "unit"} <= set(args):
                raise ValueError(
                    "$dateDiff requires {startDate, endDate, unit}")
            if args.get("timezone") is not None:
                raise ValueError("$dateDiff timezone is refused — wall "
                                 "clock only")
            unit = args["unit"]
            if unit not in ("year", "quarter", "month", "week", "day",
                            "hour", "minute", "second", "millisecond"):
                raise ValueError(f"$dateDiff unit {unit!r} is not supported")
            if unit == "week" and str(
                    args.get("startOfWeek", "sunday")).lower() != "monday":
                raise ValueError(
                    "$dateDiff week unit requires startOfWeek: 'monday' "
                    "(Spark weeks are Monday-based; Mongo's Sunday default "
                    "is refused rather than silently shifted)")
            s = F.date_trunc(unit, sub(args["startDate"]))
            e = F.date_trunc(unit, sub(args["endDate"]))
            return F.timestamp_diff(unit.upper(), s, e)
        if op == "$sortArray":
            # {"$sortArray": {input, sortBy: 1|-1}} — scalar-element
            # form; sortBy documents (field specs) are refused, not
            # approximated
            if not isinstance(args, dict) or "input" not in args:
                raise ValueError("$sortArray requires {input, sortBy}")
            direction = args.get("sortBy", 1)
            if direction not in (1, -1):
                raise ValueError(
                    "$sortArray supports scalar sortBy 1/-1 only (field-"
                    "spec sorts over document arrays are refused)"
                )
            arr = sub(args["input"])
            out_arr = F.array_sort(arr)
            return out_arr if direction == 1 else F.reverse(out_arr)
        if op == "$getField":
            if isinstance(args, dict):
                fld, inp = args["field"], args.get("input", "$$CURRENT")
                if inp == "$$CURRENT":
                    return F.col(fld)
                return sub(inp)[fld]
            return F.col(args)  # shorthand: field name on the root doc
        if op in ("$setField", "$unsetField"):
            # Mongo 5.0 struct-field manipulation — direct Spark twins
            # (Column.withField / dropFields). `field` must be a string
            # LITERAL (as in Mongo); $unsetField's doc form {field,
            # input} and $setField's {field, input, value}. Setting
            # value to the $$REMOVE sentinel removes the field, exactly
            # Mongo's spelling for unset-via-$setField.
            if not isinstance(args, dict) or not {"field", "input"} <= set(args):
                raise ValueError(f"{op} requires {{field, input}}")
            fld = args["field"]
            if not isinstance(fld, str) or fld.startswith("$"):
                raise ValueError(f"{op} field must be a string literal")
            inp = sub(args["input"])
            if op == "$unsetField":
                if "value" in args:
                    raise ValueError("$unsetField does not take a value")
                return inp.dropFields(f"`{fld}`")
            if "value" not in args:
                raise ValueError("$setField requires {field, input, value}")
            if args["value"] == "$$REMOVE":
                return inp.dropFields(f"`{fld}`")
            return inp.withField(f"`{fld}`", sub(args["value"]))
        if op in ("$rand", "$sample", "$sampleRate"):
            raise ValueError(
                f"{op} is refused — non-deterministic results cannot be "
                "oracle-verified or reproduced across retries; use the "
                "deterministic hash-sampling operators instead "
                "(relational.hash_sample / $mod over $toHashedIndexKey-"
                "style keys)"
            )
        if op == "$zip" and isinstance(args, dict):
            inputs = [sub(a) for a in args.get("inputs", [])]
            if len(inputs) < 2:
                raise ValueError("$zip requires at least two inputs")
            if args.get("useLongestLength"):
                # Mongo pads with defaults; the relational twin pads
                # with NULL structs fields (arrays_zip) — defaults are
                # refused rather than silently NULLed
                if args.get("defaults") is not None:
                    raise ValueError("$zip defaults are not supported — "
                                     "pad upstream")
                return F.arrays_zip(*inputs)
            # Mongo default truncates to the SHORTEST input; output
            # elements come back as STRUCTS (named 0..n-1), the
            # relational-native shape for Mongo's positional arrays
            shortest = functools.reduce(F.least, [F.size(c) for c in inputs])
            return F.slice(F.arrays_zip(*inputs), 1, shortest)
        if op in ("$trim", "$ltrim", "$rtrim") and isinstance(args, dict):
            if "chars" in args:
                raise ValueError(f"{op} with chars is not supported — "
                                 "refused rather than approximated")
            return _EXPR_UNARY[op](sub(args["input"]))
        if op in ("$gt", "$gte", "$lt", "$lte", "$eq", "$ne"):
            if not isinstance(args, (list, tuple)) or len(args) != 2:
                raise ValueError(f"{op} requires a two-element list")
            a, b = sub(args[0]), sub(args[1])
            return {
                "$gt": a > b, "$gte": a >= b, "$lt": a < b, "$lte": a <= b,
                "$eq": a.eqNullSafe(b), "$ne": ~a.eqNullSafe(b),
            }[op]
        if op in _EXPR_UNARY:
            # Mongo wraps single args in one-element lists interchangeably
            arg = args[0] if isinstance(args, (list, tuple)) and len(args) == 1 \
                else args
            return _EXPR_UNARY[op](sub(arg))
        if not isinstance(args, (list, tuple)):
            raise ValueError(f"{op} requires an argument list")
        if op == "$substrCP":
            s, start, length = (sub(a) for a in args)
            return s.substr(start + F.lit(1), length)  # Mongo is 0-indexed
        if op == "$split":
            # a "$"-prefixed string is a field path in Mongo; Spark's
            # split takes a compile-time regex, so only literal
            # delimiters compile (use {"$literal": "$"} to split on a
            # literal dollar sign)
            delim = args[1]
            if isinstance(delim, dict) and set(delim) == {"$literal"}:
                delim = delim["$literal"]
            elif isinstance(delim, str) and delim.startswith("$"):
                delim = None
            if not isinstance(delim, str):
                raise ValueError("$split delimiter must be a literal string")
            import re as _re

            return F.split(sub(args[0]), _re.escape(delim))
        if op == "$arrayElemAt":
            arr, idx = sub(args[0]), sub(args[1])
            # Mongo: 0-indexed, negative from end, and out-of-range
            # yields *missing* (≈ NULL under the house convention).
            # try_element_at preserves that: NULL on out-of-range
            # instead of ANSI INVALID_ARRAY_INDEX (element_at throws
            # under Spark 4's default ANSI mode).
            return F.try_element_at(
                arr, F.when(idx >= 0, idx + 1).otherwise(idx))
        if op == "$slice":
            ints = args[1:]
            if not all(isinstance(i, int) and not isinstance(i, bool)
                       for i in ints):
                raise ValueError("$slice positions/counts must be int literals")
            arr = sub(args[0])
            if len(args) == 2:
                n = args[1]
                # [arr, n]: first n (n>0) / last n (n<0)
                return (F.slice(arr, 1, n) if n >= 0
                        else F.slice(arr, n, -n))
            pos, n = args[1], args[2]
            if n <= 0:
                raise ValueError("$slice count must be positive in the "
                                 "three-argument form (as in Mongo)")
            return F.slice(arr, pos + 1 if pos >= 0 else pos, n)
        if op == "$in":
            return F.array_contains(sub(args[1]), sub(args[0]))
        if op == "$indexOfArray":
            # Mongo: 0-based index of first match, -1 when absent
            # (array_position is 1-based with 0-for-absent)
            pos = F.array_position(sub(args[0]), sub(args[1]))
            return (pos - 1).cast("int")
        if op == "$range":
            start, end = sub(args[0]), sub(args[1])
            step = sub(args[2]) if len(args) > 2 else F.lit(1)
            # Mongo $range is half-open [start, end); F.sequence is
            # inclusive — stop one step short, and an empty range
            # (nothing between start and end in step's direction)
            # yields an empty array as in Mongo
            last = end - F.when(step > 0, F.lit(1)).otherwise(F.lit(-1))
            empty = F.when(step > 0, start >= end).otherwise(start <= end)
            return F.when(empty, F.array().cast("array<int>")).otherwise(
                F.sequence(start.cast("int"), last.cast("int"),
                           step.cast("int"))
            )
        if op == "$zip":
            raise ValueError(
                "$zip is supported through the document form "
                '{"$zip": {"inputs": [...]}} only'
            )
        if op in ("$mod", "$pow", "$atan2"):
            a, b = sub(args[0]), sub(args[1])
            if op == "$mod":
                return a % b
            return F.pow(a, b) if op == "$pow" else F.atan2(a, b)
        if op == "$round":
            # Mongo rounds HALF-TO-EVEN (banker's) — that's bround,
            # not round (HALF_UP). place must be an int literal.
            place = args[1] if len(args) > 1 else 0
            if not isinstance(place, int) or isinstance(place, bool):
                raise ValueError("$round place must be an int literal")
            return F.bround(sub(args[0]), place)
        cols = [sub(a) for a in args]
        if op == "$ifNull":
            return F.coalesce(*cols)
        if op in ("$concat", "$concatArrays"):
            return F.concat(*cols)
        if op == "$and":
            return functools.reduce(
                lambda a, b: a & b, [c.cast("boolean") for c in cols]
            )
        if op == "$or":
            return functools.reduce(
                lambda a, b: a | b, [c.cast("boolean") for c in cols]
            )
        setops = {"$setUnion": F.array_union,
                  "$setIntersection": F.array_intersect,
                  "$setDifference": F.array_except}
        if op in setops:
            return functools.reduce(setops[op], cols)
        binops = {
            "$add": lambda a, b: a + b,
            "$subtract": lambda a, b: a - b,
            "$multiply": lambda a, b: a * b,
            "$divide": lambda a, b: a / b,
        }
        if op not in binops:
            raise ValueError(f"unsupported aggregation expression: {op}")
        out = cols[0]
        for c in cols[1:]:
            out = binops[op](out, c)
        return out
    if isinstance(spec, (list, tuple)):
        # array-construction expression: each element evaluates
        # (field paths, operators, embedded docs), as in Mongo
        return F.array(*[_mongo_expr(e, env) for e in spec])
    return F.lit(spec)


def _mongo_accumulator(spec) -> Column:
    """$group accumulator document → Spark aggregate Column.

    Pinned Mongo-vs-SQL semantics (tested):

    * ``$sum`` skips missing/null values and returns **0** (not NULL)
      when nothing summed — ``coalesce(sum(e), 0)``.
    * ``$avg/$min/$max`` skip nulls and return NULL on empty — Spark's
      native behavior already matches.
    * ``$push``/``$addToSet`` map to collect_list/collect_set. Spark
      DROPS nulls here where Mongo would keep them in $push — a
      documented divergence; pre-coalesce if null slots matter.
    * ``$first``/``$last`` follow encounter order, which (as in Mongo)
      is only meaningful downstream of a ``$sort``.
    * ``$top/$bottom/$topN/$bottomN`` take a single-field 1/-1 sortBy;
      the N forms sort-then-slice collected (key, output) structs with
      the output as the deterministic tie-break.
    * ``$median/$percentile`` compile to EXACT linear-interpolated
      percentile (Mongo's t-digest approximation has no stable twin;
      exact is the safer migration-validation direction).
    """
    if not isinstance(spec, dict) or len(spec) != 1:
        raise ValueError(f"accumulator must have one operator: {spec}")
    op, arg = next(iter(spec.items()))
    if op == "$sum":
        e = _mongo_expr(arg)
        return F.coalesce(F.sum(e), F.lit(0))
    if op == "$avg":
        return F.avg(_mongo_expr(arg))
    if op == "$min":
        return F.min(_mongo_expr(arg))
    if op == "$max":
        return F.max(_mongo_expr(arg))
    if op == "$push":
        return F.collect_list(_mongo_expr(arg))
    if op == "$addToSet":
        return F.collect_set(_mongo_expr(arg))
    if op == "$first":
        return F.first(_mongo_expr(arg))
    if op == "$last":
        return F.last(_mongo_expr(arg))
    if op == "$count":
        # accumulator form (Mongo 5.0): {"$count": {}}
        if arg not in ({}, None):
            raise ValueError("$count accumulator takes an empty document")
        return F.count(F.lit(1))
    if op == "$stdDevPop":
        return F.stddev_pop(_mongo_expr(arg))
    if op == "$stdDevSamp":
        return F.stddev_samp(_mongo_expr(arg))
    if op in ("$top", "$bottom"):
        # Mongo 5.2: the output of the doc that sorts first ($top) /
        # last ($bottom). Single-field 1/-1 sortBy compiles to
        # min_by/max_by (ties unspecified in BOTH systems — give the
        # sort a unique tie-break key if determinism matters).
        if not isinstance(arg, dict) or "output" not in arg or "sortBy" not in arg:
            raise ValueError(f"{op} requires {{output, sortBy}}")
        sort_by = arg["sortBy"]
        if not isinstance(sort_by, dict) or len(sort_by) != 1:
            raise ValueError(f"{op} supports a single sortBy field")
        f, direction = next(iter(sort_by.items()))
        if direction not in (1, -1):
            raise ValueError("sortBy directions must be 1 or -1")
        outc, key = _mongo_expr(arg["output"]), F.col(f)
        want_min = (direction == 1) == (op == "$top")
        return F.min_by(outc, key) if want_min else F.max_by(outc, key)
    if op in ("$median", "$percentile"):
        # Mongo 7.0 {input, method: 'approximate'[, p: [...]]}.
        # Compiled to Spark's EXACT linear-interpolated percentile —
        # a deliberate, pinned divergence: Mongo only offers a t-digest
        # approximation whose values are algorithm-specific; exact is
        # the strictly-safer direction for migration validation (and
        # what the DuckDB quantile_cont oracle computes). The method
        # key is required (as in Mongo) and must be 'approximate' —
        # naming any other method would promise something neither
        # engine has.
        if not isinstance(arg, dict) or "input" not in arg:
            raise ValueError(f"{op} requires {{input, method}}")
        if arg.get("method") != "approximate":
            raise ValueError(f"{op} requires method: 'approximate' "
                             "(Mongo's only method; compiled to exact "
                             "percentile — see docstring)")
        if op == "$median":
            return F.percentile(_mongo_expr(arg["input"]), 0.5)
        ps = arg.get("p")
        if (not isinstance(ps, (list, tuple)) or not ps
                or not all(isinstance(p, (int, float))
                           and not isinstance(p, bool)
                           and 0.0 <= p <= 1.0 for p in ps)):
            raise ValueError("$percentile p must be a non-empty list of "
                             "numeric literals in [0, 1]")
        return F.percentile(_mongo_expr(arg["input"]),
                            [float(p) for p in ps])
    if op in ("$topN", "$bottomN"):
        # Mongo 5.2: the outputs of the n docs that sort first/last.
        # Single-field 1/-1 sortBy; collect (key, output) structs,
        # array_sort (struct order: key, then output as the
        # DETERMINISTIC tie-break — Mongo leaves ties unspecified, so
        # give the oracle the same tie-break), reverse for descending
        # sortBy (which also reverses the tie-break — ORDER BY key
        # DESC, output DESC in the twin SQL), slice n from the top
        # ($topN) or the tail ($bottomN; Mongo returns the tail in
        # sort order, so no re-reverse). NULL sort keys: array_sort
        # puts nulls LAST; Mongo sorts nulls FIRST ascending —
        # null-free sort keys are the caller's contract here.
        if not isinstance(arg, dict) \
                or not {"n", "output", "sortBy"} <= set(arg):
            raise ValueError(f"{op} requires {{n, output, sortBy}}")
        n = arg["n"]
        if not isinstance(n, int) or isinstance(n, bool) or n < 1:
            raise ValueError(f"{op} n must be a positive int literal")
        sort_by = arg["sortBy"]
        if not isinstance(sort_by, dict) or len(sort_by) != 1:
            raise ValueError(f"{op} supports a single sortBy field")
        f, direction = next(iter(sort_by.items()))
        if direction not in (1, -1):
            raise ValueError("sortBy directions must be 1 or -1")
        pairs = F.array_sort(F.collect_list(
            F.struct(F.col(f).alias("k"), _mongo_expr(arg["output"]).alias("v"))
        ))
        if direction == -1:
            pairs = F.reverse(pairs)
        if op == "$topN":
            sliced = F.slice(pairs, 1, n)
        else:
            start = F.greatest(F.size(pairs) - F.lit(n) + 1, F.lit(1))
            sliced = F.slice(pairs, start, F.lit(n))
        return F.transform(sliced, lambda e: e["v"])
    if op == "$mergeObjects":
        # last-write-wins per field over encounter order on struct
        # inputs: Spark's last(ignorenulls) per FIELD restates Mongo's
        # document fold under the null≈missing convention — but that
        # requires schema access, so keep the faithful whole-struct
        # form: last non-null struct wins wholesale. Field-wise merge
        # diverges; refuse rather than approximate.
        raise ValueError(
            "$mergeObjects is not supported — Mongo folds documents "
            "FIELD-WISE, which has no faithful single-aggregate twin "
            "over a fixed relational schema; restructure as explicit "
            "per-field $last/$first accumulators"
        )
    raise ValueError(f"unsupported accumulator: {op}")


def _wf_sort_cols(sort_by: dict) -> list[Column]:
    cols = []
    for k, direction in sort_by.items():
        if direction not in (1, -1):
            raise ValueError("sortBy directions must be 1 or -1")
        cols.append(F.col(k).asc() if direction == 1 else F.col(k).desc())
    return cols


def _wf_bound(b, lower: bool):
    from pyspark.sql.window import Window

    if b == "unbounded":
        return Window.unboundedPreceding if lower else Window.unboundedFollowing
    if b == "current":
        return Window.currentRow
    if isinstance(b, int) and not isinstance(b, bool):
        return b
    raise ValueError(
        f"window bound must be 'unbounded', 'current' or an int, got {b!r} "
        "(fractional/time-unit bounds are refused, not approximated)"
    )


#: fixed-length time units in milliseconds — the spans Mongo's own
#: UTC window-bound/densify arithmetic treats as constant. The
#: calendar-variable units (year/quarter/month — per-document $dateAdd
#: boundaries) are deliberately ABSENT: every consumer of this table
#: refuses them loudly rather than approximating.
_FIXED_UNIT_MS: dict[str, int] = {
    "week": 604_800_000, "day": 86_400_000, "hour": 3_600_000,
    "minute": 60_000, "second": 1_000, "millisecond": 1,
}

#: calendar-variable units in months — usable ONLY where a compile can
#: evaluate per-document $dateAdd boundaries (the $setWindowFields
#: range-window frame-anchor join); everywhere a constant span is
#: required these stay refused via _require_fixed_unit.
_CAL_UNIT_MONTHS: dict[str, int] = {"month": 1, "quarter": 3, "year": 12}


def _epoch_ms_col(df: DataFrame, col_name: str, what: str) -> Column:
    """Session-timezone-INDEPENDENT wall-clock epoch milliseconds for a
    date/timestamp column — the millisecond twin of ``catalog._epoch_s``
    and the shared key map behind every time-``unit`` compile
    ($setWindowFields range windows, $densify grids, $integral/
    $derivative units). TIMESTAMP_NTZ goes through ``timestampdiff``
    from the epoch wall clock (no session timezone anywhere — verified
    bit-identical under UTC/Adelaide/New_York incl. DST-straddling
    pairs); an LTZ column is already an instant (``unix_millis``); DATE
    is pure calendar arithmetic. The map is strictly monotone, so
    ordering contracts on the raw column carry over unchanged."""
    dtype = dict(df.dtypes).get(col_name)
    if dtype == "timestamp_ntz":
        return F.expr(
            "timestampdiff(MILLISECOND, "
            f"TIMESTAMP_NTZ'1970-01-01 00:00:00', `{col_name}`)"
        )
    if dtype == "timestamp":
        return F.unix_millis(F.col(col_name))
    if dtype == "date":
        return (F.datediff(F.col(col_name), F.lit("1970-01-01"))
                .cast("long")) * F.lit(86_400_000)
    if dtype is None:
        raise ValueError(
            f"{what} requires a top-level column "
            f"({col_name!r} is not a column of the input)"
        )
    raise ValueError(
        f"{what} requires a date/timestamp field "
        f"({col_name!r} is {dtype!r}) — Mongo errors there too"
    )


def _wall_clock_ms(b, what: str) -> int:
    """Driver-side literal date → wall-clock epoch milliseconds, the
    Python twin of :func:`_epoch_ms_col` for explicit bounds (``$densify``
    unit-form ``bounds: [lo, hi]``). Accepts ISO-8601 strings,
    ``datetime.datetime`` and ``datetime.date``; integer arithmetic via
    timedelta floor-division (no float rounding)."""
    import datetime as dt

    if isinstance(b, str):
        try:
            b = dt.datetime.fromisoformat(b)
        except ValueError as exc:
            raise ValueError(f"{what}: unparseable ISO date {b!r}") from exc
    if isinstance(b, dt.datetime):
        if b.tzinfo is not None:
            raise ValueError(
                f"{what}: timezone-aware bounds are refused — the house "
                "flavor is wall-clock (TIMESTAMP_NTZ); convert upstream"
            )
    elif isinstance(b, dt.date):
        b = dt.datetime(b.year, b.month, b.day)
    else:
        raise ValueError(
            f"{what}: unit-form bounds must be ISO strings or "
            f"datetime/date values, got {type(b).__name__}"
        )
    return (b - dt.datetime(1970, 1, 1)) // dt.timedelta(milliseconds=1)


def _require_fixed_unit(unit: str, what: str) -> int:
    """unit name → milliseconds, refusing calendar-variable units."""
    if unit not in _FIXED_UNIT_MS:
        raise ValueError(
            f"{what} unit {unit!r} is refused — year/quarter/month are "
            "calendar-variable (Mongo evaluates those with per-document "
            "$dateAdd), which a constant span cannot express; use a "
            "fixed unit (week/day/hour/minute/second/millisecond) or "
            "materialize the boundary explicitly"
        )
    return _FIXED_UNIT_MS[unit]


#: Loud upper bound on rows per PARTITION VALUE inside the
#: $expMovingAvg grouped-map kernel — the kernel's one real memory axis
#: (a whole partition is materialized as one pandas group). The r14
#: boundary probe (SCALE.md, twenty-first probe) measured ×7.3 wall for
#: ×4 rows once a single partition held 4M rows; this bound fails fast
#: well before that cliff, matching the house 10k transcripts-per-gene
#: precedent (convert a measured risk into a contract error, never a
#: silent degradation). Deployments with genuinely longer per-key
#: series should pre-split on a secondary key (e.g. compute the EMA
#: per (user, year) and chain the seed across segments) or raise the
#: bound explicitly after sizing executor memory for it.
EMA_MAX_PARTITION_ROWS: int = 2_000_000


def _exp_moving_avg_kernel(
    out: DataFrame, spec: dict, sort_by: dict, ema_specs: list
) -> DataFrame:
    """Append ``__swf_ema_{i}`` double columns implementing
    ``$expMovingAvg`` — Mongo 5.0's only $setWindowFields operator with
    NO Spark window twin, because each output depends on the previous
    OUTPUT (``ema = α·x + (1−α)·ema_prev``, seeded with the first
    numeric input). A sequential per-partition recurrence is exactly
    the shape ``applyInPandas`` exists for (SURVEY §2.10 rule (b)):
    ONE hash exchange on the partition key, then an in-memory sort and
    a single O(rows) pass per group — the same exchange+sort a window
    function would cost, with the grouped-map caveat that one PARTITION
    (not the whole collection) must fit in executor memory, which is
    also Mongo's own practical bound for this operator. That axis is
    GUARDED, not just documented: any partition value exceeding
    :data:`EMA_MAX_PARTITION_ROWS` rows fails fast inside the kernel
    with a pre-split/raise-the-bound message (house convention — the
    10k transcripts-per-gene precedent; the r14 boundary probe measured
    the ×7.3 cliff this bound sits under).

    Group batching: one Spark group per PARTITION VALUE pays the
    per-group Arrow/pandas fixed cost once per partition — ruinous for
    collections with many small partitions (the trees round-8 probe
    measured 1.9× on exactly this shape). The shuffle key is therefore
    ``hash(partition) % (4 × defaultParallelism)`` and ONE kernel call
    loops over the partitions in its batch; per-partition results are
    bit-identical because the kernel is a pure per-partition function
    and the loop re-groups on the exact partition value (nulls kept).

    Pinned semantics (unit-tested against a pure-Python reference):

    * seeds with the first NUMERIC value (Mongo: "the first result is
      the first value of the input expression");
    * null (≈missing) inputs are skipped — the output carries the
      previous result forward, and is null before the first numeric
      value (Mongo ignores non-numeric values). PINNED DIVERGENCE: a
      genuine NaN input is treated the same as null (skipped), whereas
      Mongo treats NaN as numeric and poisons the series from that
      point on — Spark's Arrow transfer maps null and NaN to the same
      float64 NaN, so the two are indistinguishable inside the kernel;
      the skip is the useful reading and is test-pinned;
    * sortBy order matches the stage's window outputs: ascending keys
      put nulls FIRST (BSON: null sorts lowest), descending last;
    * the recurrence is evaluated in IEEE float64 exactly as written —
      ``α·x + (1−α)·prev`` with ``α = 2/(N+1)`` for the N form — so a
      SQL engine replaying the same recurrence (the oracle's recursive
      CTE) is bit-identical, no rounding needed;
    * sortBy keys must be top-level columns (the kernel sorts the
      pandas group); ties under a non-unique sortBy are order-dependent
      in both systems — use a unique key (house a1 convention).
    """
    import pandas as pd

    part = _mongo_expr(spec["partitionBy"]) if "partitionBy" in spec else F.lit(0)
    for k in sort_by:
        if k not in out.columns:
            raise ValueError(
                f"$expMovingAvg requires top-level sortBy columns "
                f"({k!r} is not a column of the input)"
            )
    tmp = out.select(
        "*",
        part.alias("__swf_ema_part"),
        *[
            expr.cast("double").alias(f"__swf_ema_in_{i}")
            for i, (_, expr, _) in enumerate(ema_specs)
        ],
    )
    keys = list(sort_by)
    asc = [d == 1 for d in sort_by.values()]
    alphas = [a for (_, _, a) in ema_specs]
    base_fields = list(out.schema.fields)
    base_cols = [f.name for f in base_fields]
    schema = T.StructType(
        base_fields
        + [
            T.StructField(f"__swf_ema_{i}", T.DoubleType(), True)
            for i in range(len(ema_specs))
        ]
    )

    max_rows = EMA_MAX_PARTITION_ROWS

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        # fail-fast on the kernel's one real memory axis (module
        # constant EMA_MAX_PARTITION_ROWS documents the measured cliff)
        if len(pdf) > max_rows:
            raise ValueError(
                f"$expMovingAvg: partition value "
                f"{pdf['__swf_ema_part'].iloc[0]!r} holds {len(pdf)} rows "
                f"> EMA_MAX_PARTITION_ROWS={max_rows}; a grouped-map "
                f"recurrence materializes the whole partition in one "
                f"pandas group — pre-split on a secondary key (chain the "
                f"seed across segments) or raise "
                f"documents.EMA_MAX_PARTITION_ROWS after sizing executor "
                f"memory for it"
            )
        # replicate Spark's window order per key: ascending → nulls
        # FIRST (BSON: null sorts lowest), descending → nulls last.
        # pandas' na_position is global, so stable-sort key-by-key in
        # reverse significance order with the per-key position.
        for k, a in reversed(list(zip(keys, asc))):
            pdf = pdf.sort_values(
                k, ascending=a, kind="mergesort",
                na_position="first" if a else "last",
            )
        res = pdf[base_cols].copy()
        for i, alpha in enumerate(alphas):
            x = pdf[f"__swf_ema_in_{i}"].to_numpy(
                dtype="float64", na_value=float("nan")
            )
            om = 1.0 - alpha
            vals: list[float | None] = [None] * len(x)
            prev: float | None = None
            for j, xv in enumerate(x):
                if xv == xv:  # not NaN (null≈missing is skipped)
                    prev = float(xv) if prev is None else alpha * float(xv) + om * prev
                vals[j] = prev
            res[f"__swf_ema_{i}"] = pd.array(vals, dtype="Float64")
        return res

    def batched(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.concat(
            [kernel(g) for _, g in
             pdf.groupby("__swf_ema_part", sort=False, dropna=False)],
            ignore_index=True,
        )

    n_batch = max(out.sparkSession.sparkContext.defaultParallelism * 4, 8)
    tmp = tmp.withColumn(
        "__swf_ema_b",
        F.pmod(F.xxhash64("__swf_ema_part"), F.lit(n_batch)),
    )
    return tmp.groupBy("__swf_ema_b").applyInPandas(batched, schema)


#: calendar-frame aggregates with direct groupBy twins (frame-anchor
#: join path); $push/$addToSet/$first/$last are refused there — see
#: _calendar_range_join.
_CAL_AGGS = {
    "$sum": F.sum, "$avg": F.avg, "$min": F.min, "$max": F.max,
    "$stdDevPop": F.stddev_pop, "$stdDevSamp": F.stddev_samp,
}


def _calendar_range_join(
    out: DataFrame, spec: dict, sort_by: dict, cal_specs: list
) -> DataFrame:
    """Calendar-unit range windows (``unit: month|quarter|year`` —
    Mongo 5.0 values a constant range frame cannot express, because the
    boundaries are per-document ``$dateAdd`` results: how long "one
    month back" is depends on WHICH month the current document sits
    in). Compiled as a FRAME-ANCHOR RANGE JOIN:

    * ``anchors`` = DISTINCT (partition, sortKey) — value-based frames
      mean rows with equal keys share one frame, so one aggregate per
      distinct key value suffices;
    * ``frame(k)`` = partition rows ``r`` with
      ``dateAdd(k, lo·unit) <= r.key <= dateAdd(k, hi·unit)``
      (``timestamp_add(MONTH)`` / ``add_months`` — day-of-month
      clamping matches Mongo's $dateAdd: Jan 31 + 1 month = Feb 28/29);
    * one LEFT join anchors→rows per distinct (lo, hi, unit) frame
      shape, grouped back to the anchor, then ONE left join attaches
      the aggregates to the input on (partition, key) — row count
      preserved (aggregates are unique per anchor).

    Cost is Σ|frame| — exactly the work Mongo's executor pays
    evaluating each document's window, made explicit as a
    partition-keyed range join instead of hidden in a scan (AQE's skew
    handling applies). Wall-clock frames (week and finer) never come
    here — they stay on the O(n log n) rangeBetween fast path.

    Supported: $sum/$avg/$min/$max/$count/$stdDevPop/$stdDevSamp/
    $covariancePop/$covarianceSamp. Refused loudly: $push/$addToSet
    (frame-order-dependent arrays) and $first/$last (need a
    document-order tie-break a value join cannot see) — use documents
    windows for those.

    Pinned edges (test-pinned): an EMPTY frame (e.g. range [-24, -12])
    gives SUM/AVG → NULL and COUNT → 0, same as the rangeBetween path;
    a NULL sort key sees an EMPTY frame (the fixed-unit path groups
    nulls into their own peer frame; live Mongo errors — all three
    behaviors documented at the stage docstring)."""
    if not sort_by or len(sort_by) != 1 or next(iter(sort_by.values())) != 1:
        raise ValueError(
            "range windows require a single ascending sortBy field"
        )
    key_name = next(iter(sort_by))
    dtype = dict(out.dtypes).get(key_name)
    if dtype not in ("timestamp_ntz", "timestamp", "date"):
        raise ValueError(
            f"calendar-unit range windows require a date/timestamp "
            f"sortBy field ({key_name!r} is {dtype!r}) — Mongo errors "
            "there too"
        )

    def shift(col: Column, n_months: int) -> Column:
        if n_months == 0:
            return col
        if dtype == "date":
            return F.add_months(col, n_months)
        # timestamp_add preserves the input flavor (NTZ in → NTZ out)
        # and clamps day-of-month exactly like Mongo's $dateAdd
        return F.timestamp_add("MONTH", F.lit(n_months), col)

    def bound_months(b, months: int):
        """window bound → month shift (None = unbounded)."""
        if b == "unbounded":
            return None
        if b == "current":
            return 0
        if isinstance(b, int) and not isinstance(b, bool):
            return b * months
        raise ValueError(
            f"window bound must be 'unbounded', 'current' or an int, "
            f"got {b!r} (fractional bounds are refused, not approximated)"
        )

    part = _mongo_expr(spec["partitionBy"]) if "partitionBy" in spec else F.lit(0)
    src = out.select("*", part.alias("__swf_cal_p"))

    # group outputs by frame shape — one anchor join per distinct
    # (lo, hi, unit), however many outputs share it
    from collections import defaultdict

    groups: dict[tuple, list] = defaultdict(list)
    for i, (fname, op, arg, lo, hi, months) in enumerate(cal_specs):
        groups[(lo, hi, months)].append((i, op, arg))

    anchors = src.select(
        F.col("__swf_cal_p").alias("__swf_cal_ap"),
        F.col(key_name).alias("__swf_cal_k"),
    ).distinct()

    out2 = src
    for (lo, hi, months), members in groups.items():
        lo_m = bound_months(lo, months)
        hi_m = bound_months(hi, months)
        val_cols: list[Column] = []
        agg_exprs: list[Column] = []
        for i, op, arg in members:
            if op in ("$push", "$addToSet", "$first", "$last"):
                raise ValueError(
                    f"{op} with a calendar-unit range window is refused "
                    "— the result depends on document order inside a "
                    "value-joined frame; use a documents window"
                )
            if op == "$count":
                agg_exprs.append(
                    F.count(F.col("__swf_cal_rk")).alias(f"__swf_cal_{i}")
                )
            elif op in ("$covariancePop", "$covarianceSamp"):
                if not isinstance(arg, (list, tuple)) or len(arg) != 2:
                    raise ValueError(f"{op} requires a two-expression list")
                val_cols.append(_mongo_expr(arg[0]).cast("double")
                                .alias(f"__swf_cal_va{i}"))
                val_cols.append(_mongo_expr(arg[1]).cast("double")
                                .alias(f"__swf_cal_vb{i}"))
                fn = (F.covar_pop if op == "$covariancePop"
                      else F.covar_samp)
                agg_exprs.append(
                    fn(F.col(f"__swf_cal_va{i}"), F.col(f"__swf_cal_vb{i}"))
                    .alias(f"__swf_cal_{i}")
                )
            elif op in _CAL_AGGS:
                val_cols.append(_mongo_expr(arg).alias(f"__swf_cal_v{i}"))
                agg_exprs.append(
                    _CAL_AGGS[op](F.col(f"__swf_cal_v{i}"))
                    .alias(f"__swf_cal_{i}")
                )
            else:
                raise ValueError(
                    f"unsupported $setWindowFields operator {op!r} for a "
                    "calendar-unit range window"
                )
        rows = src.select(
            F.col("__swf_cal_p").alias("__swf_cal_rp"),
            F.col(key_name).alias("__swf_cal_rk"),
            *val_cols,
        )
        cond = F.col("__swf_cal_ap").eqNullSafe(F.col("__swf_cal_rp"))
        if lo_m is not None:
            cond = cond & (F.col("__swf_cal_rk")
                           >= shift(F.col("__swf_cal_k"), lo_m))
        if hi_m is not None:
            cond = cond & (F.col("__swf_cal_rk")
                           <= shift(F.col("__swf_cal_k"), hi_m))
        agg = (
            anchors.join(rows, cond, "left")
            .groupBy("__swf_cal_ap", "__swf_cal_k")
            .agg(*agg_exprs)
        )
        out2 = out2.join(
            agg,
            out2["__swf_cal_p"].eqNullSafe(agg["__swf_cal_ap"])
            & out2[key_name].eqNullSafe(agg["__swf_cal_k"]),
            "left",
        ).drop("__swf_cal_ap", "__swf_cal_k")
    return out2


def _mongo_set_window_fields(out: DataFrame, spec: dict) -> DataFrame:
    """Compile ``$setWindowFields`` (Mongo 5.0's window stage) onto
    Spark window functions — the shim stage with the most direct
    Catalyst mapping, since Mongo copied the SQL window model.

    Pinned semantics:

    * ``partitionBy`` is any shim expression (absent = ONE partition —
      exactly as degenerate at scale in Spark as in Mongo; Spark at
      least spills, but don't do it on a big collection).
    * ``sortBy`` uses find()-style 1/-1 directions.
    * Omitted ``window`` = the WHOLE partition ([unbounded, unbounded]
      — Mongo's documented default), even when ``sortBy`` is present.
    * ``window.documents`` → ``rowsBetween``; ``window.range`` →
      ``rangeBetween`` and requires a SINGLE ascending numeric sortBy
      field (Mongo's own restriction). Bounds: "unbounded"/"current"/
      int. Time ``unit`` ranges over FIXED-LENGTH units (week/day/hour/
      minute/second/millisecond) compile onto a numeric ``rangeBetween``
      over wall-clock epoch milliseconds of the date sortBy field —
      exact, because Mongo evaluates window bounds in UTC where those
      units are constant spans; TZ-pinned via the house NTZ idiom (no
      session timezone in the epoch map). CALENDAR-VARIABLE units
      (month/quarter/year — per-document ``$dateAdd`` boundaries,
      day-of-month clamping included) compile onto the frame-anchor
      range JOIN (:func:`_calendar_range_join` — plain aggregates
      only; $push/$addToSet/$first/$last refused there with a
      documents-window pointer). Null sort keys: empty frame on the
      calendar path, own peer frame on the numeric/fixed-unit path
      (live Mongo errors on both — divergences pinned below).
    * Accumulators: $sum/$avg/$min/$max/$count/$first/$last,
      $stdDevPop/$stdDevSamp, $push/$addToSet (null-dropping pinned at
      the $group twins), $covariancePop/$covarianceSamp (two-expression
      list); position ops $rank/$denseRank/$documentNumber (require
      sortBy, REFUSE an explicit window — Mongo errors there too);
      $shift with {output, by, default} (positive ``by`` looks forward
      — lead), which ignores window bounds by contract; $derivative
      ((last−first)/(key span) over documents windows; zero span →
      NULL where Mongo gives Infinity — pinned); $integral (trapezoid
      rule via partition-lag terms + a lower-bound-shifted windowed
      sum; documents windows only); $expMovingAvg (grouped-map
      recurrence kernel — see :func:`_exp_moving_avg_kernel` for the
      pinned seed/null semantics; requires sortBy, refuses a window,
      {input, N|alpha} with exactly one of N/alpha).
    * Every output field is evaluated against the INPUT document
      (Mongo's rule): an output whose name shadows an input column
      cannot poison another output's argument or the shared sortBy —
      all window columns are computed in one select and applied at
      the end.
    * Ties under a non-unique sortBy make documents-window accumulator
      results order-dependent in BOTH systems; fixtures/oracles must
      sort on a unique key (house a1 convention).
    * NULL sort values under a range window: Mongo ERRORS at runtime
      ("sortBy field must be numeric"); Spark groups the null rows into
      their own peer frame (they see each other, no numeric rows).
      Documented divergence (test-pinned) — a plan-time check can't see
      the data, and a per-row assert would tax every row; filter or
      coalesce nulls upstream when migrating a collection that has
      them.
    """
    from pyspark.sql.window import Window

    output = spec.get("output")
    if not isinstance(output, dict) or not output:
        raise ValueError("$setWindowFields requires a non-empty output document")
    # covers BOTH internal prefixes this compile stages under:
    # __swf_ema_* (the grouped-map recurrence kernel) and __swf_tmp_*
    # (the one-shot output staging below)
    _guard_reserved_columns(out, "__swf_", "$setWindowFields")
    base = Window.partitionBy(
        _mongo_expr(spec["partitionBy"]) if "partitionBy" in spec else F.lit(0)
    )
    sort_by = spec.get("sortBy")
    sorted_base = base.orderBy(*_wf_sort_cols(sort_by)) if sort_by else None

    _ACC = {
        "$sum": F.sum, "$avg": F.avg, "$min": F.min, "$max": F.max,
        "$first": F.first, "$last": F.last,
    }
    # Every output expression is evaluated against the INPUT document
    # (Mongo's semantics): collect (name, column) pairs and apply them
    # in ONE select at the end, so an output that shadows an input
    # column can't poison a later output's (or the shared sortBy's)
    # reads the way sequential withColumn would.
    results: list[tuple[str, Column]] = []
    ema_specs: list[tuple[str, Column, float]] = []
    cal_specs: list[tuple] = []
    for out_field, body in output.items():
        if not isinstance(body, dict) or not body:
            raise ValueError(f"output.{out_field} must be an operator document")
        wspec = body.get("window")
        ops = {k: v for k, v in body.items() if k != "window"}
        if len(ops) != 1:
            raise ValueError(f"output.{out_field} must have exactly one operator")
        op, arg = next(iter(ops.items()))
        if op in ("$rank", "$denseRank", "$documentNumber"):
            if wspec is not None:
                raise ValueError(f"{op} does not accept a window (as in Mongo)")
            if sorted_base is None:
                raise ValueError(f"{op} requires sortBy")
            fn = {"$rank": F.rank, "$denseRank": F.dense_rank,
                  "$documentNumber": F.row_number}[op]
            results.append((out_field, fn().over(sorted_base)))
            continue
        if op == "$shift":
            if sorted_base is None:
                raise ValueError("$shift requires sortBy")
            if wspec is not None:
                raise ValueError("$shift does not accept a window (as in Mongo)")
            by = arg.get("by", 1)
            expr = _mongo_expr(arg["output"])
            # Mongo's default applies ONLY when the position falls
            # outside the partition — a null VALUE at a valid position
            # stays null, so lead/lag's own default (not coalesce)
            default = arg.get("default")
            col = (F.lead(expr, by, default) if by >= 0
                   else F.lag(expr, -by, default)).over(sorted_base)
            results.append((out_field, col))
            continue
        if op == "$expMovingAvg":
            # sequential recurrence (each value depends on the previous
            # OUTPUT) — no window twin; compiled onto the grouped-map
            # kernel above (_exp_moving_avg_kernel)
            if wspec is not None:
                raise ValueError(
                    "$expMovingAvg does not accept a window (as in Mongo)"
                )
            if not sort_by:
                raise ValueError("$expMovingAvg requires sortBy")
            if not isinstance(arg, dict) or "input" not in arg:
                raise ValueError("$expMovingAvg requires {input, N|alpha}")
            extra = set(arg) - {"input", "N", "alpha"}
            if extra:
                raise ValueError(f"$expMovingAvg unknown fields: {extra}")
            if ("N" in arg) == ("alpha" in arg):
                raise ValueError(
                    "$expMovingAvg requires exactly one of N or alpha"
                )
            if "N" in arg:
                n = arg["N"]
                if isinstance(n, bool) or not isinstance(n, int) or n < 1:
                    raise ValueError("$expMovingAvg N must be a positive int")
                alpha = 2.0 / (n + 1)
            else:
                a = arg["alpha"]
                if isinstance(a, bool) or not isinstance(a, (int, float)) \
                        or not (0.0 < a < 1.0):
                    raise ValueError(
                        "$expMovingAvg alpha must be in (0, 1) exclusive"
                    )
                alpha = float(a)
            ema_specs.append((out_field, _mongo_expr(arg["input"]), alpha))
            continue
        if op == "$integral":
            # Trapezoid rule, Mongo's definition: the integral of the
            # (sortKey, input) polyline across the window's documents.
            # Per-row term = the trapezoid between a doc and its
            # PARTITION predecessor (lag over the sorted partition),
            # then a windowed sum whose LOWER bound is shifted +1 so
            # the first in-frame doc's predecessor-trapezoid (which
            # reaches outside the frame) is excluded. With a date
            # sortBy, fixed-length `unit` scales the key to unit-count
            # doubles (epoch-ms / unit_ms, TZ-free) — integral per
            # Mongo's time-in-units definition; calendar units refused.
            # Range windows refused (a positional term cannot respect
            # a value-based boundary); one-doc frames integrate to 0.
            if not sort_by or len(sort_by) != 1 \
                    or next(iter(sort_by.values())) != 1:
                raise ValueError(
                    "$integral requires a single ascending sortBy field")
            inp = _mongo_expr(arg["input"] if isinstance(arg, dict) else arg)
            i_unit = arg.get("unit") if isinstance(arg, dict) else None
            if i_unit is not None:
                # Mongo 5.0 {input, unit}: integrate w.r.t. time
                # EXPRESSED IN the unit — the sort key becomes
                # wall-clock epoch ms scaled to unit-count doubles
                # (TZ-free map, _epoch_ms_col) and the trapezoid
                # formula below is unchanged. Fixed units only.
                ums = _require_fixed_unit(i_unit, "$integral")
                key = (_epoch_ms_col(out, next(iter(sort_by)),
                                     "$integral unit sortBy")
                       / F.lit(float(ums)))
            else:
                key = F.col(next(iter(sort_by)))
            term = (key - F.lag(key, 1).over(sorted_base)) * \
                (inp + F.lag(inp, 1).over(sorted_base)) / 2
            if wspec is None:
                w = base
            elif "documents" in wspec:
                lo, hi = wspec["documents"]
                lo_b = _wf_bound(lo, True)
                from pyspark.sql.window import Window as _W

                if lo_b != _W.unboundedPreceding:
                    lo_b = lo_b + 1
                w = sorted_base.rowsBetween(lo_b, _wf_bound(hi, False))
            else:
                raise ValueError("$integral windows must use documents "
                                 "bounds (range bounds cannot scope the "
                                 "positional trapezoid terms)")
            results.append((out_field, F.coalesce(
                F.sum(term).over(w), F.lit(0.0))))
            continue
        if op == "$derivative":
            # (last(input) − first(input)) / (last(sortKey) −
            # first(sortKey)) over the window — Mongo's definition.
            # With a date sortBy, fixed-length `unit` scales the key to
            # unit-count doubles (epoch-ms / unit_ms, TZ-free) — rate
            # per unit, Mongo's definition; calendar units refused.
            # A zero key-span yields NULL (Spark's x/0) where Mongo
            # yields Infinity — pinned.
            if not sort_by or len(sort_by) != 1 \
                    or next(iter(sort_by.values())) != 1:
                raise ValueError(
                    "$derivative requires a single ascending sortBy field")
            inp = _mongo_expr(arg["input"] if isinstance(arg, dict) else arg)
            d_unit = arg.get("unit") if isinstance(arg, dict) else None
            if d_unit is not None:
                # Mongo 5.0 {input, unit}: rate per unit of time — the
                # sort key becomes epoch ms scaled to unit-count
                # doubles (TZ-free), Δinput/Δkey below unchanged.
                ums = _require_fixed_unit(d_unit, "$derivative")
                key = (_epoch_ms_col(out, next(iter(sort_by)),
                                     "$derivative unit sortBy")
                       / F.lit(float(ums)))
            else:
                key = F.col(next(iter(sort_by)))
            if wspec is None:
                w = base
            elif "documents" in wspec:
                lo, hi = wspec["documents"]
                w = sorted_base.rowsBetween(_wf_bound(lo, True),
                                            _wf_bound(hi, False))
            else:
                raise ValueError("$derivative windows must use documents "
                                 "bounds (range adds nothing over the "
                                 "sort key itself)")
            col = F.try_divide(
                F.last(inp).over(w) - F.first(inp).over(w),
                F.last(key).over(w) - F.first(key).over(w))
            results.append((out_field, col))
            continue
        if op in ("$covariancePop", "$covarianceSamp"):
            if not isinstance(arg, (list, tuple)) or len(arg) != 2:
                raise ValueError(f"{op} requires a two-expression list")
            fn = F.covar_pop if op == "$covariancePop" else F.covar_samp
            agg = fn(_mongo_expr(arg[0]).cast("double"),
                     _mongo_expr(arg[1]).cast("double"))
        elif op == "$count":
            agg = F.count(F.lit(1))
        elif op in ("$stdDevPop", "$stdDevSamp"):
            agg = (F.stddev_pop if op == "$stdDevPop"
                   else F.stddev_samp)(_mongo_expr(arg))
        elif op in ("$push", "$addToSet"):
            # same null-dropping divergence as the $group twins (the
            # accumulator docstring pins it)
            agg = (F.collect_list if op == "$push"
                   else F.collect_set)(_mongo_expr(arg))
        elif op in _ACC:
            agg = _ACC[op](_mongo_expr(arg))
        else:
            raise ValueError(f"unsupported $setWindowFields operator {op!r}")
        if wspec is None:
            w = base  # whole partition — Mongo's documented default
        elif "documents" in wspec:
            if sorted_base is None:
                raise ValueError("documents windows require sortBy")
            lo, hi = wspec["documents"]
            w = sorted_base.rowsBetween(_wf_bound(lo, True), _wf_bound(hi, False))
        elif "range" in wspec:
            if not sort_by or len(sort_by) != 1 or next(iter(sort_by.values())) != 1:
                raise ValueError(
                    "range windows require a single ascending sortBy field"
                )
            lo, hi = wspec["range"]
            unit = wspec.get("unit")
            if unit is None:
                w = base.orderBy(*_wf_sort_cols(sort_by)).rangeBetween(
                    _wf_bound(lo, True), _wf_bound(hi, False)
                )
            elif unit in _CAL_UNIT_MONTHS:
                # calendar-variable unit (month/quarter/year): a
                # constant range frame CANNOT express per-document
                # $dateAdd boundaries, so these compile to the
                # frame-anchor range JOIN (see _calendar_range_join) —
                # collected here, computed once after the loop
                cal_specs.append((out_field, op, arg, lo, hi,
                                  _CAL_UNIT_MONTHS[unit]))
                continue
            else:
                # Mongo 5.0 time-unit range window ({range: [lo, hi],
                # unit}) compiled onto a NUMERIC rangeBetween over
                # wall-clock epoch MILLISECONDS of the date sortBy
                # field: Mongo's window-bound arithmetic runs in UTC
                # (the window spec has no timezone parameter), where
                # week/day/hour/minute/second/millisecond are constant
                # spans — so [cur−lo·unit, cur+hi·unit] is exactly a
                # constant millisecond range frame.
                # TZ PIN (house NTZ rule, same idiom as
                # catalog._epoch_s): TIMESTAMP_NTZ goes through
                # timestampdiff from the epoch wall clock — NO session
                # timezone involved, so the frame is identical under
                # any driver TZ (cross-TZ-sweep-proof); an LTZ column
                # is already an instant (unix_millis); DATE is pure
                # calendar arithmetic. The epoch key orders identically
                # to the raw column (strictly monotone map), so the
                # sortBy contract is unchanged.
                mult = _require_fixed_unit(unit, "range-window")
                key = _epoch_ms_col(out, next(iter(sort_by)),
                                    "range-window unit sortBy")

                def _ms_bound(b, lower: bool):
                    # scale only EXPLICIT numeric bounds; the
                    # unbounded/current sentinels pass through unscaled
                    # (multiplying Window.unboundedPreceding overflows)
                    if isinstance(b, int) and not isinstance(b, bool):
                        return b * mult
                    return _wf_bound(b, lower)

                w = base.orderBy(key.asc()).rangeBetween(
                    _ms_bound(lo, True), _ms_bound(hi, False)
                )
        else:
            raise ValueError("window must specify documents or range")
        results.append((out_field, agg.over(w)))
    if ema_specs:
        # grouped-map recurrence columns land on the input FIRST (the
        # kernel preserves every input column, so the window expressions
        # below still read unmodified input values — Mongo's rule holds)
        out = _exp_moving_avg_kernel(out, spec, sort_by, ema_specs)
        results += [
            (f, F.col(f"__swf_ema_{i}"))
            for i, (f, _, _) in enumerate(ema_specs)
        ]
    if cal_specs:
        # calendar-unit range frames land as __swf_cal_{i} columns via
        # the frame-anchor range join (every input column preserved —
        # Mongo's evaluate-against-input rule holds here too)
        out = _calendar_range_join(out, spec, sort_by, cal_specs)
        results += [
            (f, F.col(f"__swf_cal_{i}"))
            for i, (f, *_rest) in enumerate(cal_specs)
        ]
    # one-shot apply: stage under collision-proof temp names, then
    # replace shadowed input columns in place and append new fields
    tmps = {n: f"__swf_tmp_{i}" for i, (n, _) in enumerate(results)}
    staged = out.select("*", *[c.alias(tmps[n]) for n, c in results])
    replaced = set(tmps)
    final = [
        (F.col(tmps[c]).alias(c) if c in replaced else F.col(c))
        for c in out.columns
        if not c.startswith(("__swf_ema_", "__swf_cal_"))
    ]
    final += [F.col(tmps[n]).alias(n) for n, _ in results
              if n not in out.columns]
    return staged.select(*final)


def _mongo_densify(out: DataFrame, spec: dict) -> DataFrame:
    """Compile ``$densify`` (Mongo 5.1): insert documents so ``field``
    covers a step grid; all non-partition, non-densified fields on
    generated docs are NULL (missing, in Mongo terms).

    Pinned semantics:

    * ``range.bounds``: ``"partition"`` grids from each partition's
      min to max (inclusive where the grid lands exactly);
      ``"full"`` grids every partition over the GLOBAL [min, max];
      explicit ``[lo, hi]`` is half-open — values lo, lo+step, … < hi,
      generated even for partitions with no existing docs in range
      (within partitions that exist).
    * A grid value is only inserted if no document in that partition
      has EXACTLY that value (off-grid documents are kept, never
      snapped).
    * Integer fields/steps only on numeric fields; fractional steps are
      refused loudly — float grids accumulate drift and Mongo itself
      documents exact-match insertion.
    * Time ``unit`` grids (Mongo's date form) compile onto the SAME
      integer machinery over TZ-free wall-clock epoch milliseconds
      (:func:`_epoch_ms_col`): step becomes ``step × unit_ms``, grid
      values convert back to the field's own date/timestamp flavor, and
      exact-match suppression compares at the engine's microsecond
      precision (a BSON date IS int64 ms, so every value live Mongo
      could hold compares identically). Fixed-length units only —
      calendar-variable year/quarter/month are refused; a DATE-typed
      field additionally requires a day/week unit (sub-day grid points
      are not representable as DATE). Explicit bounds in the unit form
      are ISO strings / datetime / date values, converted to wall-clock
      ms driver-side (exact integer arithmetic).

    Scale shape: one partition-keyed min/max aggregate (tiny), a
    ``sequence``+``explode`` over it (output-sized), and one left-anti
    join on (partition, value) — no per-row Python anywhere.
    """
    field = spec.get("field")
    rng = spec.get("range") or {}
    step = rng.get("step")
    bounds = rng.get("bounds")
    parts = spec.get("partitionByFields", [])
    if not field or step is None or bounds is None:
        raise ValueError("$densify requires field and range{step, bounds}")
    # same loud contract as __upd_/__swf_ (advisor r14): the unit-grid
    # staging claims the __dens_ prefix
    _guard_reserved_columns(out, "__dens_", "$densify")
    if not isinstance(step, int) or isinstance(step, bool) or step <= 0:
        raise ValueError("$densify step must be a positive int")
    unit = rng.get("unit")
    if unit is None:
        eff_step = step
        vexpr = F.col(field)

        def from_v(c: Column) -> Column:
            return c
    else:
        ums = _require_fixed_unit(unit, "$densify")
        eff_step = step * ums
        vexpr = _epoch_ms_col(out, field, "$densify unit field")
        f_dtype = dict(out.dtypes).get(field)
        if f_dtype == "date" and ums < 86_400_000:
            raise ValueError(
                "$densify on a DATE field requires unit day/week — "
                f"a {unit!r} grid lands inside days, which DATE cannot "
                "represent; stage the column as a timestamp first"
            )

        def from_v(c: Column, _dt=f_dtype) -> Column:
            if _dt == "timestamp_ntz":
                # timestampadd keeps the wall clock — the exact inverse
                # of the _epoch_ms_col map, session-TZ-free
                return F.expr(
                    "timestampadd(MILLISECOND, `__dens_v`, "
                    "TIMESTAMP_NTZ'1970-01-01 00:00:00')"
                )
            if _dt == "timestamp":
                return F.timestamp_millis(c)
            return F.date_add(
                F.lit("1970-01-01"),
                (c / F.lit(86_400_000)).cast("int"),
            )
    pcols = [F.col(p) for p in parts]
    src = out.select(*pcols, vexpr.alias("__dens_v"))

    if isinstance(bounds, str) and bounds in ("partition", "full"):
        ext = src.groupBy(*pcols).agg(
            F.min("__dens_v").alias("__lo"), F.max("__dens_v").alias("__hi")
        )
        if bounds == "full":
            g = src.agg(F.min("__dens_v").alias("__glo"),
                        F.max("__dens_v").alias("__ghi"))
            ext = ext.crossJoin(F.broadcast(g)).select(
                *[F.col(p) for p in parts],
                F.col("__glo").alias("__lo"), F.col("__ghi").alias("__hi"),
            )
        grid = ext.select(
            *[F.col(p) for p in parts],
            F.explode(F.sequence("__lo", "__hi", F.lit(eff_step)))
            .alias("__dens_v"),
        )
    elif isinstance(bounds, (list, tuple)) and len(bounds) == 2:
        lo, hi = bounds
        if unit is not None:
            lo, hi = _wall_clock_ms(lo, "$densify bounds"), \
                _wall_clock_ms(hi, "$densify bounds")
        elif not all(isinstance(b, int) and not isinstance(b, bool)
                     for b in (lo, hi)):
            raise ValueError("$densify explicit bounds must be ints "
                             "(dates require the unit form)")
        if hi <= lo:
            raise ValueError("$densify bounds must satisfy lo < hi")
        pdf = src.select(*pcols).distinct() if parts else src.limit(0).select(
            F.lit(1).alias("__one")
        ).unionByName(
            out.sparkSession.range(1).select(F.lit(1).alias("__one"))
        ).limit(1)
        # half-open [lo, hi): last grid value strictly below hi
        grid = pdf.select(
            *([F.col(p) for p in parts] if parts else []),
            F.explode(
                F.sequence(F.lit(lo),
                           F.lit(lo + ((hi - 1 - lo) // eff_step) * eff_step),
                           F.lit(eff_step))
            ).alias("__dens_v"),
        )
    else:
        raise ValueError('$densify bounds must be "partition", "full" or [lo, hi]')

    grid = grid.select(
        *[F.col(p) for p in parts],
        from_v(F.col("__dens_v")).alias(field),
    )
    missing = grid.join(
        out.select(*pcols, F.col(field)).distinct(), [*parts, field], "left_anti"
    )
    filler = missing
    for c in out.columns:
        if c not in parts and c != field:
            filler = filler.withColumn(c, F.lit(None).cast(dict(out.dtypes)[c]))
    return out.unionByName(filler.select(*out.columns))


def _mongo_fill(out: DataFrame, spec: dict) -> DataFrame:
    """Compile ``$fill`` (Mongo 5.3): fill null/missing values either
    with a constant/expression (``{value: expr}``) or by
    last-observation-carried-forward (``{method: "locf"}`` — the
    `last non-null over rows unbounded-preceding..current` window).
    or by linear interpolation (``{method: "linear"}``).

    Linear semantics pinned to Mongo's: interpolation runs on the
    ``sortBy`` field's NUMERIC value (so it requires a single ascending
    numeric sortBy, as Mongo documents), nulls between two non-null
    anchors get ``prev + (next − prev) · (pos − prev_pos) /
    (next_pos − prev_pos)`` as a double, and nulls BEFORE the first or
    AFTER the last anchor stay null (no extrapolation). Implemented as
    two windows per filled field — last-non-null over the preceding
    frame and first-non-null over the following frame, each carrying
    its anchor position — which is one partition sort reused by all
    four window expressions. ``sortBy`` is required for locf and
    linear, exactly as in Mongo."""
    from pyspark.sql.window import Window

    output = spec.get("output")
    if not isinstance(output, dict) or not output:
        raise ValueError("$fill requires a non-empty output document")
    base = Window.partitionBy(
        _mongo_expr(spec["partitionBy"]) if "partitionBy" in spec else F.lit(0)
    )
    sort_by = spec.get("sortBy")
    for f, body in output.items():
        if "value" in body:
            out = out.withColumn(f, F.coalesce(F.col(f), _mongo_expr(body["value"])))
        elif body.get("method") == "locf":
            if not sort_by:
                raise ValueError("$fill locf requires sortBy")
            w = base.orderBy(*_wf_sort_cols(sort_by)).rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
            out = out.withColumn(f, F.last(F.col(f), ignorenulls=True).over(w))
        elif body.get("method") == "linear":
            if not sort_by or len(sort_by) != 1 or next(iter(sort_by.values())) != 1:
                raise ValueError(
                    "$fill linear requires a single ascending numeric or "
                    "date sortBy field (Mongo's own restriction)"
                )
            key_name = next(iter(sort_by))
            # Mongo allows a DATE sortBy for linear interpolation; a
            # date/timestamp key routes through the TZ-free epoch-ms
            # map (interpolation ratios are affine-invariant, so the
            # ms scale choice cancels). Numeric keys pass through.
            if dict(out.dtypes).get(key_name) in (
                "timestamp_ntz", "timestamp", "date"
            ):
                pos = _epoch_ms_col(out, key_name, "$fill linear sortBy")
            else:
                pos = F.col(key_name)
            back = base.orderBy(*_wf_sort_cols(sort_by)).rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
            fwd = base.orderBy(*_wf_sort_cols(sort_by)).rowsBetween(
                Window.currentRow, Window.unboundedFollowing
            )
            v = F.col(f).cast("double")
            anchor = F.when(
                v.isNotNull(),
                F.struct(pos.cast("double").alias("p"), v.alias("v")),
            )
            prev = F.last(anchor, ignorenulls=True).over(back)
            nxt = F.first(anchor, ignorenulls=True).over(fwd)
            interp = prev["v"] + (nxt["v"] - prev["v"]) * (
                (pos.cast("double") - prev["p"]) / (nxt["p"] - prev["p"])
            )
            out = out.withColumn(
                f,
                F.when(v.isNotNull(), v)
                .when(prev.isNotNull() & nxt.isNotNull(), interp)
                .otherwise(F.lit(None).cast("double")),
            )
        else:
            raise ValueError(f"$fill output.{f} must be {{value}} or "
                             "{method: 'locf'}")
    return out


def _eq_join_pairs(cond, let_names: set[str]) -> list[tuple]:
    """Decompose a correlated $expr condition into equi-join pairs.

    Accepts ``{"$eq": [a, b]}`` or ``{"$and": [list of $eq]}`` where in
    each pair ONE side references only ``$$let`` variables (the outer
    key expression) and the other references only inner fields.
    Returns [(outer_side_spec, inner_side_spec), ...]; anything else
    raises — a non-equi correlation has no hash-join compile and Mongo
    itself executes it as a per-document scan, which is exactly the
    shape this shim refuses to hide."""
    def refs(spec, out: set):
        if isinstance(spec, str):
            if spec.startswith("$$"):
                out.add("let")
            elif spec.startswith("$"):
                out.add("field")
        elif isinstance(spec, dict):
            for v in spec.values():
                refs(v, out)
        elif isinstance(spec, (list, tuple)):
            for v in spec:
                refs(v, out)
        return out

    conds = []
    if isinstance(cond, dict) and set(cond) == {"$and"}:
        conds = list(cond["$and"])
    else:
        conds = [cond]
    pairs = []
    for c in conds:
        if not (isinstance(c, dict) and set(c) == {"$eq"} and len(c["$eq"]) == 2):
            raise ValueError(
                "$lookup pipeline form: the correlated $match must be an "
                "$expr $eq (or $and of $eq) — non-equi correlations are "
                "refused, not silently turned into a per-document scan"
            )
        a, b = c["$eq"]
        ra, rb = refs(a, set()), refs(b, set())
        if ra <= {"let"} and rb <= {"field"} and "let" in ra:
            pairs.append((a, b))
        elif rb <= {"let"} and ra <= {"field"} and "let" in rb:
            pairs.append((b, a))
        else:
            raise ValueError(
                "$lookup pipeline form: each $eq must compare a $$let "
                "expression with an inner-field expression"
            )
    return pairs


def _mongo_lookup_pipeline(
    out: DataFrame, spec: dict, collections: dict[str, DataFrame] | None
) -> DataFrame:
    """The modern ``$lookup`` form — ``let`` variables + a correlated
    sub-``pipeline`` — compiled to ONE relational equi-join.

    Compilable subset (everything else refuses loudly):

    * The FIRST sub-pipeline stage must be the correlated
      ``{"$match": {"$expr": …}}`` whose condition decomposes into
      equi-pairs of (outer ``$$let`` expression, inner field
      expression) — see :func:`_eq_join_pairs`. This is the form the
      idiom exists for; Mongo executes anything else as a per-outer-doc
      collection scan, which a distributed engine should surface, not
      emulate.
    * Remaining sub-pipeline stages must be ROW-WISE ($match without
      $$vars, $project, $addFields/$set, $unwind): row-wise transforms
      commute with the per-outer-doc grouping, so they run ONCE over
      the matched side globally instead of once per outer doc.
      ($project inclusions are transparently extended with the hidden
      join-key columns; the keys never appear in the output docs.)
    * Join equality is null-safe via single-field-struct keys — the
      same $lookup null-matches-null rule as the classic form.

    Output: ``as`` holds the array of sub-pipeline output docs per
    outer doc (empty array when nothing matched — Mongo's contract).

    Scale: the correlated scan Mongo would do per document becomes one
    hash join on the extracted keys; the row-wise stages stay on the
    matched side pre-aggregation, so Catalyst pushes their predicates
    into the inner scan."""
    frm, as_f = spec["from"], spec["as"]
    if not collections or frm not in collections:
        raise ValueError(f"$lookup from unknown collection {frm!r}")
    inner = collections[frm]
    let = spec.get("let", {})
    sub_pipe = list(spec["pipeline"])
    if not sub_pipe or set(sub_pipe[0]) != {"$match"} or not (
        isinstance(sub_pipe[0]["$match"], dict)
        and set(sub_pipe[0]["$match"]) == {"$expr"}
    ):
        raise ValueError(
            "$lookup pipeline form: the first stage must be the correlated "
            "{'$match': {'$expr': …}}"
        )
    pairs = _eq_join_pairs(sub_pipe[0]["$match"]["$expr"], set(let))
    rest = sub_pipe[1:]

    # hidden key columns on the inner side, computed from ORIGINAL docs
    # (Mongo runs the correlated match before the rest of the pipeline)
    kcols = [f"__lkp_k{i}" for i in range(len(pairs))]
    inner_keyed = inner.select(
        "*", *[F.struct(_mongo_expr(inz)).alias(k)
               for k, (_, inz) in zip(kcols, pairs)]
    )
    # row-wise rest stages, with $project inclusions extended to keep
    # the hidden keys alive
    for st in rest:
        if len(st) != 1:
            raise ValueError(f"each stage must have exactly one operator: {st}")
        sop, sspec = next(iter(st.items()))
        if sop not in ("$match", "$project", "$addFields", "$set", "$unwind"):
            raise ValueError(
                f"$lookup pipeline form: stage {sop} after the correlated "
                "match is not row-wise compilable — refused"
            )
        if sop == "$match" and _expr_uses_let(sspec):
            raise ValueError("$lookup pipeline form: only the FIRST stage "
                             "may be correlated")
        if sop == "$project":
            # An inclusion projection (Mongo's rule, mirrored by the
            # base $project above) is one with 1/True flags OR computed
            # fields — a computed-ONLY spec like {"part": "$l_partkey"}
            # still drops unlisted columns, so the hidden keys must be
            # re-injected there too or the join select below fails.
            flags = {k: v for k, v in sspec.items()
                     if v in (0, 1, True, False)}
            inclusion_shaped = (
                any(v in (1, True) for v in flags.values())
                or any(k not in flags for k in sspec)
            )
            if inclusion_shaped:
                sspec = {**sspec, **{k: 1 for k in kcols}}
        inner_keyed = _mongo_aggregate_impl(inner_keyed, [{sop: sspec}],
                                            collections)
    doc_cols = [c for c in inner_keyed.columns if c not in kcols]
    right = inner_keyed.select(
        *kcols, F.struct(*[F.col(c) for c in doc_cols]).alias("__lkp_doc")
    )
    # outer key expressions: $$var resolves through the let bindings
    env = {name: _mongo_expr(expr) for name, expr in let.items()}
    okeys = [F.struct(_mongo_expr(oz, env)) for oz, _ in pairs]
    per_key = right.groupBy(*kcols).agg(
        F.collect_list("__lkp_doc").alias("__lkp_arr")
    )
    keyed = out.select(
        "*", *[ok.alias(k) for ok, k in zip(okeys, kcols)]
    )
    cond = None
    for k in kcols:
        e = keyed[k] == per_key[k]
        cond = e if cond is None else cond & e
    return (
        keyed.join(per_key, on=cond, how="left")
        .withColumn(as_f, F.coalesce(F.col("__lkp_arr"), F.array()))
        .drop("__lkp_arr", *kcols)
    )


def _expr_uses_let(spec) -> bool:
    if isinstance(spec, str):
        return spec.startswith("$$")
    if isinstance(spec, dict):
        return any(_expr_uses_let(v) for v in spec.values())
    if isinstance(spec, (list, tuple)):
        return any(_expr_uses_let(v) for v in spec)
    return False


def _mongo_merge(result: DataFrame, spec, collections) -> DataFrame:
    """Compile ``$merge`` — Mongo's upsert-into-collection terminal
    stage (`trees/speciesTree.js:230-252`-style ``update({_id}, doc,
    {upsert: true})`` loops are exactly aggregate-then-$merge) — as a
    RELATIONAL merge returning the new collection state. The live-sink
    binding is io.mongo_writer / io.upsert_parquet_collection; this
    compiles the SEMANTICS so a migration can validate results without
    a mongod.

    Pinned semantics (Mongo defaults: whenMatched "merge",
    whenNotMatched "insert"):

    * ``on``: field or list of fields — the merge key(s). Must be
      unique on BOTH sides for deterministic relational semantics
      (Mongo requires a unique index on ``on`` for the same reason);
      duplicate keys on EITHER side (pipeline result or target
      collection) raise at runtime (Mongo errors too).
    * ``whenMatched``: "replace" (pipeline doc wins whole), "merge"
      (field-wise $set — the pipeline's non-null fields overwrite,
      target fields survive where the update is null/missing, the
      house null≈missing convention), "keepExisting" (target wins),
      "fail" (LOUD runtime error on any match — assert_true threaded
      through the output so Catalyst can't prune it).
    * ``whenNotMatched``: "insert" | "discard" | "fail" (same loud
      mechanism).
    * Output columns: the union (target order first, then
      pipeline-only columns, NULL-padded on the side that lacks them).

    Scale: ONE co-partitioned full-outer shuffle on the key — the
    nightly-merge shape; bucket both sides (io.write_bucketed) and
    even that exchange disappears.
    """
    if not isinstance(spec, dict):
        spec = {"into": spec}
    into = spec.get("into")
    if not collections or into not in collections:
        raise ValueError(f"$merge into unknown collection {into!r}")
    target = collections[into]
    on = spec.get("on", "_id")
    keys = [on] if isinstance(on, str) else list(on)
    when_matched = spec.get("whenMatched", "merge")
    when_not = spec.get("whenNotMatched", "insert")
    if when_matched not in ("replace", "merge", "keepExisting", "fail"):
        raise ValueError(f"unsupported whenMatched {when_matched!r}")
    if when_not not in ("insert", "discard", "fail"):
        raise ValueError(f"unsupported whenNotMatched {when_not!r}")
    for k in keys:
        if k not in result.columns or k not in target.columns:
            raise ValueError(f"$merge on-field {k!r} missing from a side")

    from pyspark.sql.window import Window

    # Mongo requires a unique index on `on`; enforce the twin contract.
    # The duplicate check rides the presence flag (assert_true is NULL
    # when it passes, coalesced to 1) so Catalyst can't prune it.
    dup = F.count(F.lit(1)).over(Window.partitionBy(*[F.col(k) for k in keys]))
    ucols = list(result.columns)
    tcols = list(target.columns)
    out_cols = tcols + [c for c in ucols if c not in tcols]
    uu = result.select(
        *[F.col(c).alias(f"__u_{c}") for c in ucols],
        F.coalesce(
            F.assert_true(dup == 1, "$merge pipeline result has duplicate on-key")
            .cast("int"),
            F.lit(1),
        ).alias("__u_pres"),
    )
    # Same guard on the target: Mongo's unique-index requirement covers
    # the collection too, and target-side duplicate keys would silently
    # multiply rows through the full-outer join instead of raising.
    tdup = F.count(F.lit(1)).over(
        Window.partitionBy(*[F.col(k) for k in keys]))
    tt = target.select(
        *[F.col(c).alias(f"__t_{c}") for c in tcols],
        F.coalesce(
            F.assert_true(tdup == 1,
                          "$merge target collection has duplicate on-key")
            .cast("int"),
            F.lit(1),
        ).alias("__t_pres"),
    )
    cond = None
    for k in keys:
        e = F.col(f"__t_{k}").eqNullSafe(F.col(f"__u_{k}"))
        cond = e if cond is None else cond & e
    j = tt.join(uu, on=cond, how="full_outer")
    in_t = F.col("__t_pres").isNotNull()
    in_u = F.col("__u_pres").isNotNull()
    matched = in_t & in_u
    if when_matched == "fail":
        fail_m = F.assert_true(~matched, "$merge whenMatched: 'fail' matched")
    if when_not == "fail":
        fail_n = F.assert_true(in_t | ~in_u, "$merge whenNotMatched: 'fail'")
    if when_not == "discard":
        j = j.filter(in_t)
    sel = []
    for c in out_cols:
        tc = F.col(f"__t_{c}") if c in tcols else F.lit(None)
        ucol = F.col(f"__u_{c}") if c in ucols else F.lit(None)
        if when_matched == "replace":
            v = F.when(matched, ucol).when(in_u, ucol).otherwise(tc)
        elif when_matched == "keepExisting":
            v = F.when(matched, tc).when(in_u, ucol).otherwise(tc)
        else:  # merge: update's non-null fields overwrite
            v = F.when(matched, F.coalesce(ucol, tc)).when(in_u, ucol).otherwise(tc)
        if when_matched == "fail":
            v = F.when(fail_m.isNull(), v)
        if when_not == "fail":
            v = F.when(fail_n.isNull(), v)
        sel.append(v.alias(c))
    return j.select(*sel)


def _mongo_graph_lookup(
    out: DataFrame, spec: dict, collections: dict[str, DataFrame] | None
) -> DataFrame:
    """Compile ``$graphLookup`` — Mongo's bounded recursive traversal —
    onto the distributed labeled-BFS kernel (closure.labeled_bfs).

    Mongo semantics pinned (reference analog: the shim exists because
    Mongo recursion is painful enough that the reference MATERIALIZES
    ancestor closures instead — ``ontologies/obo2json.pl:100-113``,
    ``trees/taxonomy.js:13-28``):

    * For each input document, ``startWith`` (any shim expression,
      usually ``"$field"``) seeds a breadth-first traversal over
      ``from``: depth-0 matches are docs whose ``connectToField``
      equals the seed value; each matched doc's ``connectFromField``
      value continues the search. ``maxDepth`` bounds the DOC depth
      (``maxDepth: 0`` = first lookup only, no recursion); absent, the
      traversal runs to fixpoint with the same 64-round cap as
      transitive_closure — a loud upper bound, not an approximation
      (any real hierarchy is ≤ ~20 deep).
    * ``as`` gets the array of matched docs, each doc appearing ONCE at
      its MINIMUM depth (Mongo's BFS dedup); ``depthField`` (optional)
      injects that depth into each doc as a long. Array order is
      unspecified in Mongo and here.
    * Unmatched/empty traversals yield an EMPTY array, not NULL —
      Mongo's contract.
    * Null matching: a null seed (or null ``connectFromField`` link)
      matches docs whose ``connectToField`` is null — the same
      null-matches-null rule pinned for ``$lookup``. Implemented by
      single-field-struct-wrapping every join key: struct equality is
      per-field null-safe AND stays a hash-partitionable equi-join.
    * ``restrictSearchWithMatch`` filters ``from`` before the traversal
      (Mongo applies it at every recursion step; filtering the
      collection once is equivalent because steps only ever match
      within ``from``).

    Scale shape: the traversal is VALUE-level, shared across input
    docs — distinct seed values run as labels of ONE BFS over one
    edge partitioning (per-round cost O(frontier ⋈ edges), not
    O(docs × depth)); matched docs aggregate per seed value and join
    back to the input as a dimension (broadcast-able when the seed
    domain is small)."""
    frm = spec["from"]
    if not collections or frm not in collections:
        raise ValueError(f"$graphLookup from unknown collection {frm!r}")
    for req in ("startWith", "connectFromField", "connectToField", "as"):
        if req not in spec:
            raise ValueError(f"$graphLookup requires {req!r}")
    ref = collections[frm]
    if "restrictSearchWithMatch" in spec:
        ref = ref.filter(mongo_find_filter(spec["restrictSearchWithMatch"]))
    start = _mongo_expr(spec["startWith"])
    cf, ct, as_f = spec["connectFromField"], spec["connectToField"], spec["as"]
    max_depth = spec.get("maxDepth")
    if max_depth is not None and (not isinstance(max_depth, int) or max_depth < 0):
        raise ValueError("$graphLookup maxDepth must be a non-negative int")
    depth_f = spec.get("depthField")

    from gramene_mongodb_spark.operators.closure import (
        labeled_bfs,
        transitive_closure,
    )

    # value graph: holding value u matches docs with connectTo == u and
    # continues with those docs' connectFrom values (struct-wrapped keys
    # for the null rule above)
    edges = ref.select(
        F.struct(F.col(ct)).alias("src"), F.struct(F.col(cf)).alias("dst")
    )
    seeds = out.select(F.struct(start).alias("label")).distinct().select(
        "label", F.col("label").alias("vertex")
    )
    if depth_f is None and max_depth is None:
        # UNBOUNDED traversal without a depth field: per-seed hop-by-hop
        # BFS would pay one super-step per level (a depth-d hierarchy =
        # d checkpointed jobs). Depths aren't needed, so take the
        # path-doubling closure over the (collection-sized) value graph
        # instead — ⌈log2 d⌉ self-join rounds (transitive_closure), then
        # restrict the all-pairs reach set to the seed values. This is
        # the shim-side twin of the reference MATERIALIZING ancestor
        # closures rather than recursing per document.
        clos = transitive_closure(edges, child="src", parent="dst")
        reach = seeds.select("label", "vertex").unionByName(
            clos.join(
                seeds.select("label", F.col("vertex").alias("node")), "node"
            ).select("label", F.col("ancestor").alias("vertex"))
        ).distinct()
    elif max_depth is not None:
        # bounded contract: run exactly maxDepth rounds with no
        # per-round empty-frontier action (Mongo's bound is small and
        # hard; an early-empty frontier makes leftover rounds cheap
        # empty jobs)
        reach = labeled_bfs(edges, seeds, max_hops=max_depth,
                            detect_empty=False)
    else:
        # depthField without maxDepth: fixpoint detection needed (the
        # 64-round cap is a backstop, not the expected depth)
        reach = labeled_bfs(edges, seeds, max_hops=64)
    doc_fields = [F.col(c) for c in ref.columns]
    if depth_f is not None:
        doc_fields.append(F.col("dist").alias(depth_f))
    matched = reach.join(
        ref, on=reach["vertex"].eqNullSafe(F.struct(ref[ct])), how="inner"
    ).select(F.col("label").alias("__gl_key"), F.struct(*doc_fields).alias("__gl_doc"))
    per_seed = matched.groupBy("__gl_key").agg(
        F.collect_list("__gl_doc").alias("__gl_arr")
    )
    keyed = out.withColumn("__gl_key", F.struct(start))
    return (
        keyed.join(per_seed, "__gl_key", "left")
        .withColumn(as_f, F.coalesce(F.col("__gl_arr"), F.array()))
        .drop("__gl_key", "__gl_arr")
    )


def mongo_aggregate(
    df: DataFrame,
    pipeline: list[dict],
    collections: dict[str, DataFrame] | None = None,
    strict_switch: bool = False,
) -> DataFrame:
    """Run a MongoDB aggregation pipeline against a DataFrame — the
    second half of the Mongo migration shim (``mongo_find`` covers
    ``find()``; this covers the ``aggregate()`` read sites). Pure
    Catalyst: every stage compiles to DataFrame operations, so $match
    predicates push into the parquet scan, $group gets map-side partial
    aggregation, and $sort+$limit collapse to TakeOrdered.

    Stages: ``$match`` (reuses the find() predicate compiler, so the
    documented null/missing semantics carry over), ``$project``
    (1/0 include-exclude — mixing errors, as in Mongo — plus computed
    fields through the expression compiler), ``$addFields``/``$set``,
    ``$unwind`` (string or ``{path, preserveNullAndEmptyArrays}`` form:
    explode vs explode_outer), ``$group`` (_id: None | "$f" | {k:
    "$f", ...}; accumulator semantics in :func:`_mongo_accumulator`),
    ``$sort`` (1/-1; Mongo's BSON order sorts null/missing lowest —
    exactly Spark's asc-nulls-first / desc-nulls-last defaults),
    ``$skip``, ``$limit``, ``$count``, ``$sortByCount``, ``$bucket`` /
    ``$bucketAuto`` (see :func:`_mongo_bucket` / :func:`_mongo_bucket_auto`
    for the pinned semantics), ``$facet`` (each sub-pipeline runs on the
    same input; the facet document is one row of array-of-struct
    columns), ``$lookup`` (see below; referenced collections come in
    through ``collections``), ``$graphLookup`` (bounded recursive
    traversal compiled onto the labeled-BFS kernel — semantics pinned
    in :func:`_mongo_graph_lookup`), ``$setWindowFields`` /
    ``$densify`` / ``$fill`` (the Mongo 5.x window and time-series
    stages — :func:`_mongo_set_window_fields`, :func:`_mongo_densify`,
    :func:`_mongo_fill`), ``$unionWith`` (union BY NAME, optional
    sub-pipeline), ``$replaceRoot``/``$replaceWith`` (struct-typed
    root promotion, non-documents refused at plan time), and the
    terminal write stages ``$merge`` (:func:`_mongo_merge`) and
    ``$out`` (replace-wholesale — the result IS the new state).

    ``$lookup`` compilation is the interesting one. Mongo's contract
    embeds every matching foreign doc as an ARRAY in the ``as`` field;
    the shim implements that faithfully (join + per-row collect_list of
    the foreign row struct), BUT when the immediately following stage
    is ``$unwind`` on the same field — the overwhelmingly common idiom
    — the pair FUSES into one relational join: INNER when the unwind
    drops empty arrays (Mongo default), LEFT with
    ``preserveNullAndEmptyArrays`` (the unmatched row's ``as`` field is
    NULL, exactly what unwinding an absent array yields). The fused
    form is what Catalyst can actually optimize (broadcast the
    dimension, push predicates through) — the array materialization
    never happens. Join equality is null-safe, matching Mongo's
    null-matches-null $lookup rule.

    Relational deltas (documented): there is no implicit ``_id``
    carry-through in $project — only requested fields survive; $group's
    key column(s) come out as ``_id`` (scalar key) or one column per
    key (document key), not a nested document; a ``$switch`` with no
    matching branch and no ``default`` yields NULL where Mongo raises
    (three-valued logic is the relational-native behavior, and $cond
    with a null condition already takes the else branch on both
    systems) — unless ``strict_switch=True``, which compiles the
    fall-through to ``raise_error`` so the job fails at runtime exactly
    where Mongo would: the migration-validator mode (r11 verdict
    "What's missing" #4).
    """
    token = _STRICT_SWITCH.set(bool(strict_switch))
    try:
        return _mongo_aggregate_impl(df, pipeline, collections)
    finally:
        _STRICT_SWITCH.reset(token)


def _mongo_aggregate_impl(
    df: DataFrame,
    pipeline: list[dict],
    collections: dict[str, DataFrame] | None = None,
) -> DataFrame:
    out = df
    pipeline = list(pipeline)
    # r15 (guide §7.2): names whose defining expression is an inline
    # Project chain built by THIS pipeline ($addFields/$set/$project
    # computed fields). $unwind uses this to decide between plain
    # explode (cheap attribute — the inferred `size(arr)>0` filter
    # costs nothing and may prune at the scan) and the struct-wrap
    # rewrite (expensive computed array — the inferred filter would
    # re-inline the whole expression chain per row). Stages that
    # materialize through an operator boundary (join/aggregate/window/
    # generate) clear the set: their outputs are real attributes that
    # projection collapse cannot substitute through.
    proj_cols: set[str] = set()
    i = -1
    while i + 1 < len(pipeline):
        i += 1
        stage = pipeline[i]
        if not isinstance(stage, dict) or len(stage) != 1:
            raise ValueError(f"each stage must have exactly one operator: {stage}")
        op, spec = next(iter(stage.items()))
        if op not in ("$match", "$sort", "$skip", "$limit",
                      "$project", "$addFields", "$set", "$unwind"):
            proj_cols.clear()
        if op == "$lookup" and "pipeline" in spec:
            out = _mongo_lookup_pipeline(out, spec, collections)
            continue
        if op == "$lookup":
            frm, lf = spec["from"], spec["localField"]
            ff, as_f = spec["foreignField"], spec["as"]
            if not collections or frm not in collections:
                raise ValueError(f"$lookup from unknown collection {frm!r}")
            ref = collections[frm]
            # fusion peephole: $lookup immediately followed by $unwind
            # of the looked-up field
            nxt = pipeline[i + 1] if i + 1 < len(pipeline) else None
            fuse = None
            if nxt and len(nxt) == 1 and "$unwind" in nxt:
                us = nxt["$unwind"]
                upath = us if isinstance(us, str) else us["path"]
                if upath == "$" + as_f:
                    fuse = us
            rstruct = F.struct(*[F.col(c) for c in ref.columns]).alias(as_f)
            right = ref.select(F.col(ff).alias("__lk_key"), rstruct)
            if fuse is not None:
                preserve = not isinstance(fuse, str) and bool(
                    fuse.get("preserveNullAndEmptyArrays", False)
                )
                out = out.join(
                    right,
                    on=out[lf].eqNullSafe(right["__lk_key"]),
                    how="left" if preserve else "inner",
                ).drop("__lk_key")
                i += 1  # the $unwind is consumed by the fusion
            else:
                # faithful array form: per-left-row collect of matches.
                # Row identity via monotonically_increasing_id — unique
                # per row and deterministic for a deterministic source.
                left_cols = out.columns
                keyed = out.withColumn("__lk_row", F.monotonically_increasing_id())
                joined = keyed.join(
                    right,
                    on=keyed[lf].eqNullSafe(right["__lk_key"]),
                    how="left",
                ).drop("__lk_key")
                out = (
                    joined.groupBy("__lk_row")
                    .agg(
                        *[F.first(c).alias(c) for c in left_cols],
                        F.collect_list(as_f).alias(as_f),
                    )
                    .drop("__lk_row")
                )
            continue
        if op == "$graphLookup":
            out = _mongo_graph_lookup(out, spec, collections)
            continue
        if op == "$unionWith":
            # {"$unionWith": "coll"} or {"$unionWith": {"coll": c,
            # "pipeline": [...]}} — the second input runs its
            # sub-pipeline then unions BY NAME (Mongo documents are
            # keyed, not positional); columns one side lacks come back
            # NULL (missing). Output order is unspecified in Mongo and
            # here.
            cname = spec if isinstance(spec, str) else spec.get("coll")
            if not collections or cname not in collections:
                raise ValueError(f"$unionWith unknown collection {cname!r}")
            other = collections[cname]
            if isinstance(spec, dict) and spec.get("pipeline"):
                other = _mongo_aggregate_impl(other, spec["pipeline"], collections)
            out = out.unionByName(other, allowMissingColumns=True)
            continue
        if op in ("$replaceRoot", "$replaceWith"):
            # promote an embedded document to the root: the new root
            # must be a struct-typed expression; all other fields drop
            # (Mongo errors on non-document roots at runtime — here the
            # struct requirement is checked at plan time, stricter but
            # louder)
            new_root = spec["newRoot"] if op == "$replaceRoot" else spec
            col = _mongo_expr(new_root)
            out = out.select(col.alias("__rr"))
            if not isinstance(out.schema["__rr"].dataType, T.StructType):
                raise ValueError(f"{op} newRoot must be a document (struct) "
                                 "expression")
            out = out.select("__rr.*")
            continue
        if op in ("$merge", "$out"):
            # terminal write stages (Mongo errors mid-pipeline; so do we)
            if i != len(pipeline) - 1:
                raise ValueError(f"{op} must be the last pipeline stage")
            if op == "$merge":
                out = _mongo_merge(out, spec, collections)
            # $out REPLACES the collection wholesale — the new state IS
            # the pipeline result; the live binding is
            # io.mongo_writer(..., mode="overwrite")
            continue
        if op == "$match":
            out = out.filter(mongo_find_filter(spec))
        elif op == "$project":
            inc_flags = {k: v for k, v in spec.items() if v in (0, 1, True, False)}
            computed = {k: v for k, v in spec.items() if k not in inc_flags}
            inc = [k for k, v in inc_flags.items() if v]
            exc = [k for k, v in inc_flags.items() if not v]
            if inc and exc:
                raise ValueError("cannot mix inclusion and exclusion projection")
            if exc and computed:
                raise ValueError("exclusion projection cannot carry computed fields")
            if exc:
                out = out.drop(*exc)
                proj_cols -= set(exc)
            else:
                cols = [F.col(k).alias(k) for k in inc]
                cols += [_mongo_expr(v).alias(k) for k, v in computed.items()]
                out = out.select(*cols)
                proj_cols = (proj_cols & set(inc)) | set(computed)
        elif op in ("$addFields", "$set"):
            for k, v in spec.items():
                out = out.withColumn(k, _mongo_expr(v))
            proj_cols.update(spec.keys())
        elif op == "$unwind":
            if isinstance(spec, str):
                path, preserve = spec, False
            else:
                path = spec["path"]
                preserve = bool(spec.get("preserveNullAndEmptyArrays", False))
            if not path.startswith("$"):
                raise ValueError("$unwind path must start with '$'")
            field = path[1:]
            if preserve:
                out = out.withColumn(field, F.explode_outer(F.col(field)))
            elif field not in proj_cols:
                # cheap attribute (scan column or join/agg/window output):
                # plain explode — the inferred `size(arr)>0` pre-filter
                # references the attribute directly and may prune at the
                # scan; the struct-wrap below would only add per-element
                # wrap cost (A/B: x_mongo_aggregate 0.64→0.78 s,
                # x_mongo_graphlookup 2.71→2.89 s when wrapped).
                out = out.withColumn(field, F.explode(F.col(field)))
            else:
                # r15 (guide §7.2): for a PROJECTION-COMPUTED array, NOT
                # plain F.explode — Catalyst's InferFiltersFromGenerate
                # derives `size(arr) > 0 AND arr IS NOT NULL` from a
                # non-outer Generate and predicate pushdown then
                # substitutes the array's FULL defining expression into
                # that filter at the scan; the array is computed per-row
                # (regex/map chains), so every row paid the whole chain
                # twice (measured: x_mongo_object_reshape 2.80 → 1.91 s
                # after this rewrite). Struct-wrapping makes elements
                # non-null, explode_outer admits no inferred filter, and
                # the post-filter on the GENERATED attribute cannot be
                # pushed below the Generate. Semantics are identical to
                # explode: null/empty arrays drop (outer emits one null
                # wrapper row, filtered), null ELEMENTS survive as null
                # rows (the wrapper struct is non-null).
                if "__unwind_w" in out.columns:
                    raise ValueError(
                        "column name '__unwind_w' is reserved by the "
                        "$unwind compiler; rename the input column"
                    )
                wrapped = F.transform(
                    F.col(field), lambda x: F.struct(x.alias("v"))
                )
                out = (
                    out.withColumn("__unwind_w", F.explode_outer(wrapped))
                    .filter(F.col("__unwind_w").isNotNull())
                    .withColumn(field, F.col("__unwind_w")["v"])
                    .drop("__unwind_w")
                )
            # the unwound field is now generator output, no longer an
            # inline Project chain
            proj_cols.discard(field)
        elif op == "$group":
            if "_id" not in spec:
                raise ValueError("$group requires _id")
            key = spec["_id"]
            accs = [
                _mongo_accumulator(v).alias(k)
                for k, v in spec.items()
                if k != "_id"
            ]
            if key is None:
                out = out.groupBy(F.lit(None).cast("string").alias("_id")).agg(*accs)
            elif isinstance(key, dict):
                keys = [_mongo_expr(v).alias(k) for k, v in key.items()]
                out = out.groupBy(*keys).agg(*accs)
            else:
                out = out.groupBy(_mongo_expr(key).alias("_id")).agg(*accs)
        elif op == "$sort":
            order = []
            for k, direction in spec.items():
                if direction not in (1, -1):
                    raise ValueError("$sort directions must be 1 or -1")
                order.append(F.col(k).asc() if direction == 1 else F.col(k).desc())
            out = out.orderBy(*order)
        elif op == "$skip":
            out = out.offset(int(spec))
        elif op == "$limit":
            out = out.limit(int(spec))
        elif op == "$count":
            out = out.agg(F.count(F.lit(1)).alias(str(spec)))
        elif op == "$sortByCount":
            # {$sortByCount: expr} ≡ {$group: {_id: expr, count: {$sum: 1}}}
            # + {$sort: {count: -1}} (tie order unspecified, as in Mongo)
            out = (
                out.groupBy(_mongo_expr(spec).alias("_id"))
                .agg(F.count(F.lit(1)).alias("count"))
                .orderBy(F.col("count").desc())
            )
        elif op == "$bucket":
            out = _mongo_bucket(out, spec)
        elif op == "$bucketAuto":
            out = _mongo_bucket_auto(out, spec)
        elif op == "$setWindowFields":
            out = _mongo_set_window_fields(out, spec)
        elif op == "$densify":
            out = _mongo_densify(out, spec)
        elif op == "$fill":
            out = _mongo_fill(out, spec)
        elif op == "$facet":
            # every facet runs its sub-pipeline against the SAME input
            # and collapses to one array-of-row-structs cell; the facet
            # document is the crossJoin of the 1-row aggregates (each
            # side is exactly one row, so the join is a broadcast nested
            # loop over singletons — no data movement that matters)
            if not isinstance(spec, dict) or not spec:
                raise ValueError("$facet requires a non-empty dict of pipelines")
            faceted = None
            for fname, sub in spec.items():
                sub_df = _mongo_aggregate_impl(out, sub, collections)
                one = sub_df.agg(
                    F.collect_list(F.struct(*sub_df.columns)).alias(fname)
                )
                faceted = one if faceted is None else faceted.crossJoin(
                    F.broadcast(one)
                )
            out = faceted
        else:
            raise ValueError(f"unsupported pipeline stage: {op}")
    return out


def _mongo_bucket(df: DataFrame, spec: dict) -> DataFrame:
    """``$bucket`` — group into EXPLICIT boundary buckets.

    ``boundaries`` are literals in ascending order; a document lands in
    ``[b_i, b_{i+1})`` with ``_id = b_i``. Out-of-range and null/missing
    groupBy values go to the ``default`` bucket when given. Documented
    relational delta: with NO default, Mongo RAISES on the first
    out-of-range document; a relational filter cannot raise per-row, so
    out-of-range rows are DROPPED instead (same class of delta as the
    no-default ``$switch``). Spark's type coercion stands in for BSON's
    heterogeneous ``_id`` (a numeric boundary set with a string default
    coerces the ``_id`` column to string).

    Pure Catalyst: one CASE-chain expression + one groupBy — map-side
    partial aggregation, a single shuffle on the (≤ #boundaries) bucket
    ids at any scale.
    """
    bounds = list(spec["boundaries"])
    if len(bounds) < 2:
        raise ValueError("$bucket requires at least two boundaries")
    gb = _mongo_expr(spec["groupBy"])
    output = spec.get("output", {"count": {"$sum": 1}})
    bucket = None
    for lo, hi in zip(bounds, bounds[1:]):
        cond = (gb >= F.lit(lo)) & (gb < F.lit(hi))
        bucket = F.when(cond, F.lit(lo)) if bucket is None else bucket.when(
            cond, F.lit(lo)
        )
    if "default" in spec:
        bucket = bucket.otherwise(F.lit(spec["default"]))
        binned = df
    else:
        binned = df.filter((gb >= F.lit(bounds[0])) & (gb < F.lit(bounds[-1])))
    accs = [_mongo_accumulator(v).alias(k) for k, v in output.items()]
    return binned.groupBy(bucket.alias("_id")).agg(*accs)


def _mongo_bucket_auto(df: DataFrame, spec: dict) -> DataFrame:
    """``$bucketAuto`` — distribute into ``buckets`` groups of
    approximately equal document count, equal groupBy values never
    split. ``granularity`` is not supported (raises).

    Replayable rule (the sequential fill Mongo documents): target size
    ``s = ceil(n / buckets)``; walking values in BSON order (nulls
    lowest), a bucket CLOSES at the first distinct-value boundary where
    its cumulative count reaches ``s``; the last bucket absorbs the
    remainder. ``_id`` comes out FLATTENED as ``_id_min``/``_id_max``
    (the shim's document-key convention): min = the bucket's lowest
    value, max = the NEXT bucket's min — exclusive, except the last
    bucket's max, which is its own highest value, inclusive — exactly
    Mongo's boundary contract.

    Scale: one groupBy(value) shuffle with map-side combine builds the
    distinct-value table; the running sum over it is the only
    single-partition step (CARDINALITY CONTRACT: distinct-value-bounded,
    same as ``relational.equidepth_bins``); the ``buckets`` close
    thresholds are N ≤ buckets 1-row scalar aggregates over the
    localCheckpointed cum table (bounded driver collects, the approved
    pattern); assignment is a broadcast join of the distinct-value map
    back onto the rows.
    """
    from pyspark.sql import Window

    if "granularity" in spec:
        raise ValueError("$bucketAuto granularity is not supported")
    n_buckets = int(spec["buckets"])
    if n_buckets < 1:
        raise ValueError("$bucketAuto requires buckets >= 1")
    gb = _mongo_expr(spec["groupBy"])
    output = spec.get("output", {"count": {"$sum": 1}})

    tagged = df.withColumn("__ba_v", gb)
    counts = tagged.groupBy("__ba_v").agg(F.count(F.lit(1)).alias("__ba_c"))
    wcum = Window.orderBy(F.col("__ba_v").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = counts.withColumn("__ba_cum", F.sum("__ba_c").over(wcum))
    cum = cum.localCheckpoint(eager=False)

    total_row = cum.agg(F.max("__ba_cum").alias("n")).first()
    total = int(total_row["n"]) if total_row["n"] is not None else 0
    if total == 0:
        # Mongo emits no buckets for an empty input
        accs = [_mongo_accumulator(v).alias(k) for k, v in output.items()]
        empty = cum.groupBy(
            F.col("__ba_v").alias("_id_min"), F.col("__ba_v").alias("_id_max")
        ).agg(*accs)
        return empty.limit(0)
    size = -(-total // n_buckets)  # ceil
    closes: list[int] = []
    prev = 0
    for k in range(n_buckets):
        if k == n_buckets - 1 or prev + size > total:
            closes.append(total)
            break
        nxt = cum.filter(F.col("__ba_cum") >= prev + size).agg(
            F.min("__ba_cum")
        ).first()[0]
        closes.append(int(nxt))
        prev = int(nxt)
        if prev >= total:
            break
    # bucket(v) = number of non-final closes strictly below cum(v)
    bexpr = F.lit(0)
    for c in closes[:-1]:
        bexpr = bexpr + F.when(F.col("__ba_cum") > F.lit(c), 1).otherwise(0)
    assign = cum.select(
        F.col("__ba_v").alias("__ba_k"), bexpr.alias("__ba_bucket")
    )

    rows = tagged.join(
        F.broadcast(assign),
        on=tagged["__ba_v"].eqNullSafe(assign["__ba_k"]),
        how="inner",
    ).drop("__ba_k")
    accs = [_mongo_accumulator(v).alias(k) for k, v in output.items()]
    per = rows.groupBy("__ba_bucket").agg(
        F.min("__ba_v").alias("__ba_min"),
        F.max("__ba_v").alias("__ba_max"),
        *accs,
    )
    wnext = Window.orderBy("__ba_bucket")
    return (
        per.withColumn(
            "_id_max",
            F.coalesce(F.lead("__ba_min").over(wnext), F.col("__ba_max")),
        )
        .withColumnRenamed("__ba_min", "_id_min")
        .drop("__ba_bucket", "__ba_max")
        .select(
            "_id_min", "_id_max",
            *[k for k in output],
        )
    )
