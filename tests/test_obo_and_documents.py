"""S6 OBO source + document-assembly operators (A1/J3/A5/W5/P3) + K7/U3
closure semantics on a multi-parent DAG (FIXTURES.md §3 edge cases)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gramene_mongodb_spark.operators import documents as DOC
from gramene_mongodb_spark.operators.closure import (
    most_specific,
    transitive_closure,
)
from gramene_mongodb_spark.sources import obo

OBO_TEXT = """format-version: 1.2
ontology: test

[Term]
id: GO:0000001
name: root
namespace: biological_process

[Term]
id: GO:0000002
name: mid_a
namespace: biological_process
is_a: GO:0000001 ! root

[Term]
id: GO:0000003
name: mid_b
is_a: GO:0000001 ! root

[Term]
id: GO:0000004
name: multi_parent_leaf
alt_id: GO:0000444
is_a: GO:0000002 ! mid_a
is_a: GO:0000003 ! mid_b
relationship: part_of GO:0000001 ! root

[Term]
id: GO:0000005
name: obsolete_term
is_obsolete: true

[Typedef]
id: part_of
name: part of
"""


@pytest.fixture(scope="module")
def obo_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("obo") / "test.obo"
    p.write_text(OBO_TEXT)
    return str(p)


def test_read_obo_terms(spark, obo_path):
    terms = {r.id: r for r in obo.read_obo_terms(spark, obo_path).collect()}
    assert len(terms) == 5  # Typedef stanza excluded
    leaf = terms["GO:0000004"]
    assert leaf._id == 4
    assert sorted(leaf.is_a) == [2, 3]
    assert leaf.part_of == [1]
    assert leaf.alt_id == ["GO:0000444"]
    assert terms["GO:0000005"].is_obsolete is True
    assert terms["GO:0000001"].is_obsolete is False
    assert terms["GO:0000003"].namespace is None


def test_ancestor_closure_dedups_multi_parent_paths(spark, obo_path):
    terms = obo.read_obo_terms(spark, obo_path)
    anc = {
        r._id: r.ancestors
        for r in obo.terms_with_ancestors(terms).collect()
    }
    # node 4 reaches 1 via 2, via 3, and directly via part_of → appears once
    assert anc[4] == [1, 2, 3]
    assert anc[2] == [1]
    assert anc[1] == []  # root has no ancestors
    assert anc[5] == []  # obsolete orphan


def test_most_specific_annotation(spark, obo_path):
    terms = obo.read_obo_terms(spark, obo_path)
    closure = transitive_closure(obo.term_edges(terms))
    annotations = spark.createDataFrame(
        # gene g1 annotated with a leaf AND two of its ancestors → only
        # the leaf survives (`search/ancestor_adder.js:56-78`)
        [("g1", 4), ("g1", 2), ("g1", 1), ("g2", 3)],
        "gene STRING, term BIGINT",
    )
    kept = {(r.gene, r.term) for r in most_specific(annotations, closure, "gene", "term").collect()}
    assert kept == {("g1", 4), ("g2", 3)}


def test_group_xrefs(spark):
    rows = [
        ("g1", "UniProt", "P1", None),
        ("g1", "UniProt", "P1", None),  # dup id within db → A1 dedup
        ("g1", "UniProt", "P2", None),
        ("g1", "GO", "GO:1", "IEA"),
        ("g1", "GO", "GO:2", "IDA"),
        ("g2", "PO", "PO:9", "ISS"),
    ]
    xr = spark.createDataFrame(
        rows, "gene_id STRING, db STRING, xref_id STRING, evidence STRING"
    )
    out = {r.gene_id: r for r in DOC.group_xrefs(xr).collect()}
    g1 = {x.db: x.ids for x in out["g1"].xrefs}
    assert g1 == {"UniProt": ["P1", "P2"], "GO": ["GO:1", "GO:2"]}
    onto = {x.db: [(p.id, p.evidence_code) for p in x.pairs]
            for x in out["g1"].ontology_xrefs if x is not None}
    assert onto == {"GO": [("GO:1", "IEA"), ("GO:2", "IDA")]}


def test_merge_join_policies(spark):
    facts = spark.createDataFrame(
        [("a", ["s1"], None, "keep"), ("b", None, "fname", "x")],
        "id STRING, synonyms ARRAY<STRING>, name STRING, other STRING",
    )
    lut = spark.createDataFrame(
        [("a", ["s2", "s1"], "lutname"), ("c", ["zz"], "nope")],
        "id STRING, synonyms ARRAY<STRING>, name STRING",
    )
    out = {
        r.id: r
        for r in DOC.merge_join(
            facts, lut, "id", {"synonyms": "concat_array", "name": "coalesce"}
        ).collect()
    }
    assert out["a"].synonyms == ["s1", "s2"]  # concat + dedup + sort (J3)
    assert out["a"].name == "lutname"         # null filled from LUT
    assert out["b"].synonyms == []            # unmatched: empty, not null-crash
    assert out["b"].name == "fname"           # fact wins
    assert out["b"].other == "x"


TR_SCHEMA = (
    "gene STRING, transcripts ARRAY<STRUCT<id STRING, length BIGINT, "
    "translation STRUCT<id STRING, length BIGINT>>>"
)


def test_canonical_selection_and_reorder(spark):
    rows = [
        # t2 wins: longest translation
        ("g1", [("t1", 500, ("p1", 100)), ("t2", 300, ("p2", 200))]),
        # tie on translation → longest transcript wins (A5 tie-break)
        ("g2", [("t3", 300, ("p3", 100)), ("t4", 500, ("p4", 100))]),
        # no translations at all → longest transcript, tie → id
        ("g3", [("t6", 300, None), ("t5", 300, None)]),
    ]
    df = spark.createDataFrame(rows, TR_SCHEMA)
    sel = DOC.select_canonical_transcript(df)
    canon = {r.gene: r.canonical_transcript for r in sel.collect()}
    assert canon == {"g1": "t2", "g2": "t4", "g3": "t5"}
    ordered = DOC.canonical_first(sel)
    first = {r.gene: r.transcripts[0].id for r in ordered.collect()}
    assert first == canon
    # non-canonical relative order preserved (W5)
    g3 = [t.id for r in ordered.collect() if r.gene == "g3" for t in r.transcripts]
    assert g3 == ["t5", "t6"]


def test_nullify_empties(spark):
    df = spark.createDataFrame(
        [("", ["x"], ("", "ok")), ("v", [], ("a", ""))],
        "s STRING, arr ARRAY<STRING>, st STRUCT<f1 STRING, f2 STRING>",
    )
    rows = DOC.nullify_empties(df).collect()
    assert rows[0].s is None and rows[0].arr == ["x"]
    assert rows[0].st.f1 is None and rows[0].st.f2 == "ok"
    assert rows[1].s == "v" and rows[1].arr is None and rows[1].st.f2 is None


def test_pivot_expression_matrix(spark):
    rows = [
        ("g1", "E1", "g1grp", 1.5), ("g1", "E1", "g0grp", 2.5),
        ("g1", "E2", "a", 3.0), ("g2", "E1", "a", None),  # NA dropped
        ("g2", "E2", "b", 4.0),
    ]
    long_df = spark.createDataFrame(
        rows, "gene_id STRING, experiment STRING, group STRING, value DOUBLE"
    )
    out = {r.gene_id: r.expression for r in DOC.pivot_expression_matrix(long_df).collect()}
    assert set(out["g1"].keys()) == {"E1", "E2"}
    assert [(s.group, s.value) for s in out["g1"]["E1"]] == [("g0grp", 2.5), ("g1grp", 1.5)]
    assert set(out["g2"].keys()) == {"E2"}  # NA-only experiment absent


def test_decorate_leaves(spark):
    from gramene_mongodb_spark.operators import trees as TR

    nodes = spark.createDataFrame(
        [("t", 1, None, None), ("t", 2, 1, "G1"), ("t", 3, 1, "G2")],
        "tree_id STRING, node_id BIGINT, parent_id BIGINT, gene_stable_id STRING",
    )
    docs = spark.createDataFrame(
        [("G1", "kinase", 3), ("GX", "ignored", 9)],
        "_id STRING, description STRING, n_transcripts INT",
    )
    out = {r.node_id: r for r in TR.decorate_leaves(nodes, docs,
                                                    fields=("description", "n_transcripts")).collect()}
    assert out[2].description == "kinase" and out[2].n_transcripts == 3
    assert out[3].description is None          # unmatched leaf passes through
    assert out[1].gene_stable_id is None       # branch node untouched


def test_mongo_find_operator_semantics(spark):
    """The find()-document translator against Mongo's documented
    semantics on nulls: {f: None} matches missing, $ne/$nin/$not match
    missing, $exists maps to IS [NOT] NULL, SQL's null-poisoned NOT IN
    must NOT leak through."""
    from gramene_mongodb_spark.operators.documents import mongo_find

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, None, 30), (4, "abc", None)],
        "id: long, s: string, v: int",
    )

    def ids(q, proj=None):
        return sorted(r.id for r in mongo_find(df, q, proj).select("id").collect())

    assert ids({"s": "a"}) == [1]
    assert ids({"s": None}) == [3]                       # null-safe equality
    assert ids({"s": {"$ne": "a"}}) == [2, 3, 4]         # missing matches $ne
    assert ids({"v": {"$gt": 10, "$lte": 30}}) == [2, 3]
    assert ids({"s": {"$in": ["a", "b"]}}) == [1, 2]
    assert ids({"s": {"$in": ["a", None]}}) == [1, 3]    # null in $in list
    assert ids({"s": {"$nin": ["a", "b"]}}) == [3, 4]    # keeps missing
    assert ids({"s": {"$nin": ["a", None]}}) == [2, 4]   # null listed: drops it
    assert ids({"s": {"$exists": True}}) == [1, 2, 4]
    assert ids({"s": {"$exists": False}}) == [3]
    assert ids({"s": {"$regex": "^a"}}) == [1, 4]
    assert ids({"s": {"$not": {"$regex": "^a"}}}) == [2, 3]  # $not keeps missing
    assert ids({"$or": [{"s": "a"}, {"v": {"$gte": 30}}]}) == [1, 3]
    assert ids({"$and": [{"v": {"$gt": 5}}, {"s": {"$exists": True}}]}) == [1, 2]
    assert ids({}) == [1, 2, 3, 4]

    # projection: include-only, exclude, and the can't-mix error
    cols = mongo_find(df, {}, {"id": 1, "v": 1}).columns
    assert cols == ["id", "v"]
    cols = mongo_find(df, {}, {"s": 0}).columns
    assert cols == ["id", "v"]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        mongo_find(df, {}, {"id": 1, "s": 0})
    with _pytest.raises(ValueError):
        mongo_find(df, {"s": {"$type": "string"}})
    # operand-shape validation (Mongo's "$in needs an array" etc.) —
    # a bare string must NOT silently iterate into per-char equality
    with _pytest.raises(ValueError):
        mongo_find(df, {"s": {"$in": "abc"}})
    with _pytest.raises(ValueError):
        mongo_find(df, {"s": {"$nin": "abc"}})
    with _pytest.raises(ValueError):
        mongo_find(df, {"$or": []})
    with _pytest.raises(ValueError):
        mongo_find(df, {"$and": "not-a-list"})


def test_source_leakage_matrix_bound_and_jaccard(spark):
    """Three sources: s1/s2 share the shingle 'a b c'; the shingle
    'x y z' appears in ALL three and must be dropped by the bound
    (max_groups_per_shingle=2), changing both sizes and overlap.
    Remaining vocab per source: s1 {a b c, p q r}, s2 {a b c},
    s3 {u v w} -> only (s1,s2) overlaps: 1/(2+1-1) = 0.5."""
    from gramene_mongodb_spark.operators.dedup import source_leakage_matrix

    docs = spark.createDataFrame(
        [
            ("s1", "a b c"), ("s1", "p q r"), ("s1", "x y z"),
            ("s2", "a b c"), ("s2", "x y z"),
            ("s3", "u v w"), ("s3", "x y z"),
        ],
        "source: string, text: string",
    )
    out = {
        (r.src_a, r.src_b): r
        for r in source_leakage_matrix(
            docs, "source", "text", n=3, max_groups_per_shingle=2
        ).collect()
    }
    assert set(out) == {("s1", "s2")}  # s3 shares only the dropped shingle
    r = out[("s1", "s2")]
    assert (r.n_shared, r.n_a, r.n_b, r.jac6) == (1, 2, 1, 500_000)


def test_mongo_aggregate_stage_semantics(spark):
    """The aggregation-pipeline translator (round-11) against Mongo's
    documented semantics: $unwind drops vs preserves empties, $group
    null key forms its own bucket, $sum returns 0 over nothing, $sort
    puts nulls first ascending, $skip/$limit window, $project computed
    fields, and stage/expression validation errors."""
    import pytest as _pytest

    from gramene_mongodb_spark.operators.documents import mongo_aggregate

    df = spark.createDataFrame(
        [
            (1, "x", 10, ["a", "b"]),
            (2, "x", 20, ["a"]),
            (3, None, 30, []),
            (4, "y", None, None),
        ],
        "id: long, k: string, v: int, arr: array<string>",
    )

    # $unwind default drops empty/null arrays; preserve keeps the doc
    got = mongo_aggregate(df, [{"$unwind": "$arr"}]).select("id", "arr").collect()
    assert sorted((r.id, r.arr) for r in got) == [(1, "a"), (1, "b"), (2, "a")]
    got = mongo_aggregate(
        df, [{"$unwind": {"path": "$arr", "preserveNullAndEmptyArrays": True}}]
    ).select("id", "arr").collect()
    assert sorted([(r.id, r.arr) for r in got], key=str) == sorted(
        [(1, "a"), (1, "b"), (2, "a"), (3, None), (4, None)], key=str
    )

    # $group: null key bucket, $sum->0 over all-null input, $avg->null
    rows = mongo_aggregate(df, [
        {"$addFields": {"nil": {"$literal": None}}},
        {"$group": {"_id": "$k", "n": {"$sum": 1}, "sv": {"$sum": "$v"},
                    "znil": {"$sum": "$nil"}, "av": {"$avg": "$nil"},
                    "mx": {"$max": "$v"}}},
    ]).collect()
    by_key = {r._id: r for r in rows}
    assert set(by_key) == {"x", "y", None}
    assert by_key[None].n == 1 and by_key[None].sv == 30
    assert by_key["y"].sv == 0          # $sum over only-null field -> 0
    assert all(r.znil == 0 for r in rows)
    assert all(r.av is None for r in rows)   # $avg over nothing -> null
    assert by_key["x"].mx == 20

    # $sort nulls-first ascending (BSON order), then $skip/$limit window
    got = mongo_aggregate(df, [
        {"$sort": {"k": 1, "id": 1}}, {"$skip": 1}, {"$limit": 2},
    ]).select("id").collect()
    assert [r.id for r in got] == [1, 2]     # null k sorted first, skipped

    # $sort descending puts nulls last
    got = mongo_aggregate(df, [{"$sort": {"k": -1, "id": 1}}]).select("id").collect()
    assert [r.id for r in got] == [4, 1, 2, 3]

    # $project computed fields + include; $match reuses find() semantics
    got = mongo_aggregate(df, [
        {"$match": {"k": {"$ne": "y"}}},      # keeps the missing-k doc
        {"$project": {"id": 1, "vc": {"$multiply": ["$v", 100]},
                      "lab": {"$concat": [{"$ifNull": ["$k", {"$literal": "?"}]},
                                          {"$literal": "!"}]}}},
    ]).collect()
    assert sorted([(r.id, r.vc, r.lab) for r in got], key=str) == sorted(
        [(1, 1000, "x!"), (2, 2000, "x!"), (3, 3000, "?!")], key=str
    )

    # $count stage
    assert mongo_aggregate(df, [{"$count": "total"}]).collect()[0].total == 4

    # validation: unknown stage, two-op stage, bad sort direction,
    # mixed projection, unknown accumulator / expression
    for bad in (
        [{"$lookup": {}}],
        [{"$match": {}, "$limit": 1}],
        [{"$sort": {"k": 2}}],
        [{"$project": {"id": 1, "k": 0}}],
        [{"$group": {"_id": None, "z": {"$stdDev": "$v"}}}],
        [{"$group": {"n": {"$sum": 1}}}],
        [{"$unwind": "arr"}],
    ):
        with _pytest.raises((ValueError, KeyError)):
            mongo_aggregate(df, bad).collect()


def test_mongo_unwind_struct_wrap_rewrite(spark):
    """The r15 $unwind drop-path rewrite: a PIPELINE-COMPUTED array takes
    the explode_outer-over-struct-wrapped-elements path (no inferable
    pre-Generate filter, so Catalyst cannot re-inline the array's whole
    defining expression into a pushed Filter), while a plain attribute
    keeps ordinary explode. Both must keep explode's exact semantics:
    null ELEMENTS survive as null rows, only null/empty ARRAYS drop."""
    import pytest as _pytest

    from gramene_mongodb_spark.operators.documents import mongo_aggregate

    df = spark.createDataFrame(
        [(1, ["a", None, "b"]), (2, []), (3, None), (4, [None])],
        "id: long, arr: array<string>",
    )
    computed = [
        {"$addFields": {"arr2": {"$filter": {
            "input": "$arr", "as": "x", "cond": {"$ne": ["$$x", "zzz"]}}}}},
        {"$unwind": "$arr2"},
    ]
    got = mongo_aggregate(df, computed).select("id", "arr2").collect()
    assert sorted([(r.id, r.arr2) for r in got], key=str) == sorted(
        [(1, "a"), (1, None), (1, "b"), (4, None)], key=str
    )
    # computed path: no Filter node below the Generate re-evaluating the
    # $filter lambda (the regression the rewrite removes:
    # x_mongo_object_reshape 2.80->1.91 s)
    plan = mongo_aggregate(df, computed)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("filter(") <= 1  # once in Project, not again pushed

    # attribute path: plain explode, null elements still survive
    got = mongo_aggregate(df, [{"$unwind": "$arr"}]).select("id", "arr").collect()
    assert sorted([(r.id, r.arr) for r in got], key=str) == sorted(
        [(1, "a"), (1, None), (1, "b"), (4, None)], key=str
    )

    bad = df.withColumn("__unwind_w", F.lit(1))
    with _pytest.raises(ValueError, match="__unwind_w"):
        mongo_aggregate(bad, computed)


def test_mongo_lookup_and_conditional_expressions(spark):
    """$lookup semantics against Mongo's rules: null localField matches
    null foreignField, the general form embeds matches as an array
    (empty for no match), and the $lookup+$unwind fusion compiles to
    one join (inner by default, left with preserve). $cond/$switch:
    null conditions are falsy (else/default), as in Mongo."""
    import pytest as _pytest

    from gramene_mongodb_spark.operators.documents import mongo_aggregate

    orders = spark.createDataFrame(
        [(1, 10), (2, 20), (3, None), (4, 99)], "oid: long, cust: int"
    )
    cust = spark.createDataFrame(
        [(10, "alice"), (20, "bob"), (None, "ghost")], "cid: int, name: string"
    )
    colls = {"customers": cust}
    lk = {"$lookup": {"from": "customers", "localField": "cust",
                      "foreignField": "cid", "as": "c"}}

    got = mongo_aggregate(
        orders, [lk, {"$unwind": "$c"}, {"$project": {"oid": 1, "name": "$c.name"}}],
        colls,
    ).collect()
    assert sorted((r.oid, r.name) for r in got) == [
        (1, "alice"), (2, "bob"), (3, "ghost")]  # null==null matches; 4 dropped

    got = mongo_aggregate(
        orders,
        [lk, {"$unwind": {"path": "$c", "preserveNullAndEmptyArrays": True}},
         {"$project": {"oid": 1, "name": "$c.name"}}],
        colls,
    ).collect()
    assert sorted([(r.oid, r.name) for r in got], key=str) == sorted(
        [(1, "alice"), (2, "bob"), (3, "ghost"), (4, None)], key=str)

    # un-fused: array-of-struct embedding, empty for no match
    got = mongo_aggregate(orders, [lk], colls).collect()
    assert sorted((r.oid, len(r.c)) for r in got) == [(1, 1), (2, 1), (3, 1), (4, 0)]

    # the fusion is a real join in the physical plan (broadcastable)
    plan = mongo_aggregate(
        orders, [lk, {"$unwind": "$c"}], colls
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" in plan and "collect_list" not in plan

    # $cond / $switch with null conditions → else / default
    got = mongo_aggregate(orders, [
        {"$addFields": {
            "big": {"$cond": {"if": {"$gte": ["$cust", 20]},
                              "then": "yes", "else": "no"}},
            "band": {"$switch": {"branches": [
                {"case": {"$lt": ["$cust", 15]}, "then": "low"},
                {"case": {"$lt": ["$cust", 50]}, "then": "mid"},
            ], "default": "high"}},
        }},
    ]).collect()
    assert sorted((r.oid, r.big, r.band) for r in got) == [
        (1, "no", "low"), (2, "yes", "mid"), (3, "no", "high"),
        (4, "yes", "high")]

    with _pytest.raises(ValueError):
        mongo_aggregate(orders, [lk])  # no collections supplied


def test_mongo_facet_bucket_stages(spark):
    """Round-12 stages against Mongo's documented semantics: $sortByCount
    is group+count sorted desc; $bucket assigns [b_i, b_i+1) with _id =
    the lower boundary, routes out-of-range AND null groupBy values to
    the default (dropping them, documented delta, when there is none);
    $bucketAuto fills SEQUENTIALLY with target ceil(n/N), never splits
    equal values, absorbs the remainder into the last bucket, and emits
    the min/next-min (last: max, inclusive) boundary contract; $facet
    runs every sub-pipeline on the same input into one row."""
    import pytest as _pytest

    from gramene_mongodb_spark.operators.documents import mongo_aggregate

    df = spark.createDataFrame(
        [(1, "A", 10), (2, "B", 20), (3, "A", 5), (4, None, 40),
         (5, "A", 5), (6, "C", 99), (7, "B", 1)],
        "k: long, status: string, price: int",
    )

    got = mongo_aggregate(df, [{"$sortByCount": "$status"}]).collect()
    assert {(r._id, r["count"]) for r in got} == {
        ("A", 3), ("B", 2), ("C", 1), (None, 1)}
    assert [r["count"] for r in got] == sorted(
        (r["count"] for r in got), reverse=True)

    got = mongo_aggregate(df, [
        {"$addFields": {"nk": {"$cond": {"if": {"$eq": ["$k", 6]},
                                         "then": {"$literal": None},
                                         "else": "$k"}}}},
        {"$bucket": {"groupBy": "$nk", "boundaries": [1, 3, 6],
                     "default": -1,
                     "output": {"count": {"$sum": 1},
                                "tot": {"$sum": "$price"}}}},
    ]).collect()
    # k=1,2 -> bucket 1; k=3,4,5 -> bucket 3; k=7 out-of-range and k=6
    # nulled -> default -1
    assert {(r._id, r["count"], r.tot) for r in got} == {
        (1, 2, 30), (3, 3, 50), (-1, 2, 100)}

    # no default: out-of-range rows DROP (documented delta vs Mongo's
    # per-document error)
    got = mongo_aggregate(df, [
        {"$bucket": {"groupBy": "$k", "boundaries": [1, 3, 6]}}]).collect()
    assert {(r._id, r["count"]) for r in got} == {(1, 2), (3, 3)}

    # sequential fill distinguisher: values [1,1,1,2,3,4], N=3, target
    # ceil(6/3)=2 -> buckets [1,1,1] (equal values absorbed), [2,3], [4];
    # a static (first_rn-1)//s assignment would misplace the 3
    df2 = spark.createDataFrame([(v,) for v in [1, 1, 1, 2, 3, 4]], "v: long")
    got = mongo_aggregate(
        df2, [{"$bucketAuto": {"groupBy": "$v", "buckets": 3}}]).collect()
    assert {(r._id_min, r._id_max, r["count"]) for r in got} == {
        (1, 2, 3), (2, 4, 2), (4, 4, 1)}

    # nulls sort lowest (BSON order) into the first bucket; fewer
    # distinct values than buckets -> fewer buckets
    df3 = spark.createDataFrame([(None,), (1,), (2,)], "v: int")
    got = mongo_aggregate(
        df3, [{"$bucketAuto": {"groupBy": "$v", "buckets": 5}}]).collect()
    assert {(r._id_min, r._id_max, r["count"]) for r in got} == {
        (None, 1, 1), (1, 2, 1), (2, 2, 1)}

    # empty input -> no buckets
    assert mongo_aggregate(
        df3.limit(0), [{"$bucketAuto": {"groupBy": "$v", "buckets": 3}}]
    ).count() == 0

    with _pytest.raises(ValueError):
        mongo_aggregate(df, [{"$bucketAuto": {
            "groupBy": "$k", "buckets": 2, "granularity": "R5"}}])
    with _pytest.raises(ValueError):
        mongo_aggregate(df, [{"$bucket": {"groupBy": "$k",
                                          "boundaries": [1]}}])

    row = mongo_aggregate(df, [{"$facet": {
        "by_status": [{"$sortByCount": "$status"}],
        "top2": [{"$sort": {"price": -1}}, {"$limit": 2},
                 {"$project": {"k": 1}}],
    }}]).collect()
    assert len(row) == 1
    assert {(e._id, e["count"]) for e in row[0].by_status} == {
        ("A", 3), ("B", 2), ("C", 1), (None, 1)}
    assert [e.k for e in row[0].top2] == [6, 4]
    with _pytest.raises(ValueError):
        mongo_aggregate(df, [{"$facet": {}}])


def test_mongo_switch_strict_mode_raises_like_mongo(spark):
    """r11 verdict "What's missing" #4: with strict_switch=True a
    no-default $switch fall-through fails the job at runtime (Mongo's
    behavior); the default lenient mode yields NULL (documented
    relational delta). A $facet subpipeline inherits the strict flag."""
    from pyspark.errors import SparkRuntimeException

    from gramene_mongodb_spark.operators.documents import mongo_aggregate

    df = spark.createDataFrame([(1,), (5,)], "v INT")
    pipe = [{"$addFields": {"cls": {"$switch": {"branches": [
        {"case": {"$lt": ["$v", 3]}, "then": "small"},
    ]}}}}]
    lenient = mongo_aggregate(df, pipe).collect()
    assert {r.v: r.cls for r in lenient} == {1: "small", 5: None}
    with pytest.raises(SparkRuntimeException, match="could not find a matching branch"):
        mongo_aggregate(df, pipe, strict_switch=True).collect()
    # matching rows only -> strict mode passes
    ok = mongo_aggregate(
        df.filter("v < 3"), pipe, strict_switch=True
    ).collect()
    assert ok[0].cls == "small"
    # $facet subpipeline inherits strictness
    facet = [{"$facet": {"a": pipe}}]
    with pytest.raises(SparkRuntimeException, match="could not find a matching branch"):
        mongo_aggregate(df, facet, strict_switch=True).collect()


def test_mongo_graphlookup_semantics(spark):
    """$graphLookup pinned rules (documents._mongo_graph_lookup): BFS
    min-depth per doc, depthField injection, maxDepth=0 means first
    lookup only, empty traversals yield EMPTY arrays (not NULL),
    null-matches-null like $lookup, restrictSearchWithMatch filters the
    searched collection, and missing required fields / unknown
    collections refuse loudly."""
    from gramene_mongodb_spark.operators.documents import mongo_aggregate

    emp = spark.createDataFrame(
        [(1, "Dev", None), (2, "Eliot", "Dev"), (3, "Ron", "Eliot"),
         (4, "Andrew", "Eliot"), (5, "Asya", "Ron"), (6, "Dan", "Andrew")],
        "_id int, name string, reportsTo string")
    spec = {"from": "employees", "startWith": "$reportsTo",
            "connectFromField": "reportsTo", "connectToField": "name",
            "as": "chain", "depthField": "d"}
    res = mongo_aggregate(emp, [{"$graphLookup": spec}],
                          collections={"employees": emp})
    rows = {r["name"]: sorted((x["name"], x["d"]) for x in r["chain"])
            for r in res.collect()}
    assert rows["Asya"] == [("Dev", 2), ("Eliot", 1), ("Ron", 0)]
    assert rows["Dev"] == []  # null seed, no null names -> empty ARRAY
    assert all(r["chain"] is not None for r in res.collect())

    # maxDepth: 0 = no recursion (Mongo's contract)
    res0 = mongo_aggregate(
        emp, [{"$graphLookup": {**spec, "maxDepth": 0}}],
        collections={"employees": emp})
    rows0 = {r["name"]: [x["name"] for x in r["chain"]] for r in res0.collect()}
    assert rows0["Asya"] == ["Ron"]

    # null seed matches docs whose connectToField IS null (cycle of 2)
    e2 = spark.createDataFrame([(1, None, "x"), (2, "x", None)],
                               "_id int, name string, reportsTo string")
    res2 = mongo_aggregate(e2, [{"$graphLookup": {**spec, "from": "e"}}],
                           collections={"e": e2})
    r2 = {r["_id"]: sorted((x["_id"], x["d"]) for x in r["chain"])
          for r in res2.collect()}
    assert r2[1] == [(1, 1), (2, 0)] and r2[2] == [(1, 0), (2, 1)]

    # restrictSearchWithMatch prunes the traversal mid-chain
    resr = mongo_aggregate(
        emp, [{"$graphLookup": {
            **spec, "restrictSearchWithMatch": {"name": {"$ne": "Eliot"}}}}],
        collections={"employees": emp})
    rr = {r["name"]: sorted(x["name"] for x in r["chain"]) for r in resr.collect()}
    assert rr["Asya"] == ["Ron"]  # chain cut at the excluded Eliot

    with pytest.raises(ValueError, match="unknown collection"):
        mongo_aggregate(emp, [{"$graphLookup": spec}]).collect()
    with pytest.raises(ValueError, match="requires 'connectToField'"):
        bad = {k: v for k, v in spec.items() if k != "connectToField"}
        mongo_aggregate(emp, [{"$graphLookup": bad}],
                        collections={"employees": emp})
    with pytest.raises(ValueError, match="maxDepth"):
        mongo_aggregate(emp, [{"$graphLookup": {**spec, "maxDepth": -1}}],
                        collections={"employees": emp})


def test_mongo_window_densify_fill_semantics(spark):
    """$setWindowFields / $densify / $fill pinned rules
    (documents._mongo_set_window_fields/_mongo_densify/_mongo_fill):
    omitted window = whole partition; $shift default fires only OUTSIDE
    the partition (null value at a valid position stays null); rank ops
    refuse explicit windows; range windows demand single ascending
    numeric sortBy; densify inserts only missing grid values and keeps
    off-grid docs; explicit bounds are half-open and cover empty
    partitions; fill supports locf + value and refuses linear."""
    from gramene_mongodb_spark.operators.documents import mongo_aggregate

    df = spark.createDataFrame(
        [("CA", 1, 10), ("CA", 2, 20), ("CA", 3, None), ("NY", 1, 7)],
        "state string, seq int, qty int")
    res = mongo_aggregate(df, [{"$setWindowFields": {
        "partitionBy": "$state", "sortBy": {"seq": 1},
        "output": {
            "cum": {"$sum": "$qty", "window": {"documents": ["unbounded", "current"]}},
            "tot": {"$sum": "$qty"},
            "nxt": {"$shift": {"output": "$qty", "by": 1, "default": -1}},
            "rnk": {"$rank": {}},
        }}}])
    rows = {(r.state, r.seq): r for r in res.collect()}
    assert rows[("CA", 2)].cum == 30 and rows[("CA", 2)].tot == 30
    assert rows[("CA", 1)].nxt == 20
    assert rows[("CA", 2)].nxt is None      # null VALUE stays null
    assert rows[("CA", 3)].nxt == -1        # outside partition -> default
    assert rows[("NY", 1)].rnk == 1

    for bad in (
        [{"$setWindowFields": {"sortBy": {"seq": 1}, "output": {
            "r": {"$rank": {}, "window": {"documents": [-1, 0]}}}}}],
        [{"$setWindowFields": {"output": {"r": {"$rank": {}}}}}],
        [{"$setWindowFields": {"sortBy": {"seq": -1}, "output": {
            "c": {"$count": {}, "window": {"range": [-1, 0]}}}}}],
        [{"$setWindowFields": {"sortBy": {"seq": 1}, "output": {
            "c": {"$count": {}, "window": {"range": [-1, 0], "unit": "hour"}}}}}],
        [{"$fill": {"sortBy": {"seq": -1}, "output": {
            "qty": {"method": "linear"}}}}],  # linear needs single ASC sortBy
        [{"$densify": {"field": "seq", "range": {"step": 1, "bounds": "full",
                                                 "unit": "hour"}}}],
        [{"$densify": {"field": "seq", "range": {"step": 0, "bounds": "full"}}}],
    ):
        with pytest.raises(ValueError):
            mongo_aggregate(df, bad)

    # densify: partition bounds + off-grid kept + explicit half-open
    d2 = spark.createDataFrame([("a", 0, 1), ("a", 7, 2), ("b", 2, 9)],
                               "p string, t int, v int")
    got = mongo_aggregate(d2, [
        {"$densify": {"field": "t", "partitionByFields": ["p"],
                      "range": {"step": 5, "bounds": "partition"}}}])
    pts = sorted((r.p, r.t, r.v) for r in got.collect())
    assert pts == [("a", 0, 1), ("a", 5, None), ("a", 7, 2), ("b", 2, 9)]
    got2 = mongo_aggregate(d2, [
        {"$densify": {"field": "t", "partitionByFields": ["p"],
                      "range": {"step": 2, "bounds": [0, 5]}}}])
    pts2 = sorted((r.p, r.t) for r in got2.collect())
    # grid 0,2,4 per partition, hi=5 exclusive; existing (a,0),(b,2) kept once
    assert pts2 == [("a", 0), ("a", 2), ("a", 4), ("a", 7),
                    ("b", 0), ("b", 2), ("b", 4)]

    # fill: locf + value
    filled = mongo_aggregate(got, [
        {"$fill": {"partitionBy": "$p", "sortBy": {"t": 1},
                   "output": {"v": {"method": "locf"}}}}])
    fm = {(r.p, r.t): r.v for r in filled.collect()}
    assert fm[("a", 5)] == 1 and fm[("a", 7)] == 2


def test_mongo_fill_linear_interpolation(spark):
    """$fill linear pinned to Mongo: interpolation on the sortBy
    field's numeric VALUE (not row position), doubles out, and no
    extrapolation — nulls before the first / after the last anchor
    stay null."""
    from gramene_mongodb_spark.operators.documents import mongo_aggregate

    df = spark.createDataFrame(
        [("a", 0, 10.0), ("a", 2, None), ("a", 3, None), ("a", 4, 30.0),
         ("a", 6, None), ("b", 1, None), ("b", 2, 5.0), ("b", 4, None)],
        "p string, t int, v double")
    res = mongo_aggregate(df, [
        {"$fill": {"partitionBy": "$p", "sortBy": {"t": 1},
                   "output": {"v": {"method": "linear"}}}}])
    rows = {(r.p, r.t): r.v for r in res.collect()}
    assert rows[("a", 2)] == 20.0 and rows[("a", 3)] == 25.0  # value-weighted
    assert rows[("a", 0)] == 10.0 and rows[("a", 4)] == 30.0  # anchors kept
    assert rows[("a", 6)] is None and rows[("b", 1)] is None  # no extrapolation
    assert rows[("b", 4)] is None


def test_mongo_merge_semantics(spark):
    """$merge pinned rules (documents._mongo_merge): field-wise merge
    vs whole-doc replace vs keepExisting; insert/discard/fail for
    unmatched; fail-on-match; duplicate on-keys in the pipeline result
    refuse at runtime (Mongo's unique-index requirement); write stages
    must be terminal."""
    from pyspark.errors import SparkRuntimeException

    from gramene_mongodb_spark.operators.documents import mongo_aggregate

    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "_id int, name string, v int")
    updates = spark.createDataFrame(
        [(2, None, 99), (4, "d", 40)], "_id int, name string, v int")

    def run(wm, wn):
        return {r._id: (r.name, r.v) for r in mongo_aggregate(
            updates, [{"$merge": {"into": "t", "on": "_id",
                                  "whenMatched": wm, "whenNotMatched": wn}}],
            collections={"t": target}).collect()}

    assert run("merge", "insert") == {
        1: ("a", 10), 2: ("b", 99), 3: ("c", 30), 4: ("d", 40)}
    assert run("replace", "insert")[2] == (None, 99)  # whole doc, null included
    assert run("keepExisting", "discard") == {
        1: ("a", 10), 2: ("b", 20), 3: ("c", 30)}
    with pytest.raises(SparkRuntimeException, match="whenMatched"):
        run("fail", "insert")
    with pytest.raises(SparkRuntimeException, match="whenNotMatched"):
        run("merge", "fail")

    dup = spark.createDataFrame([(2, "x", 1), (2, "y", 2)],
                                "_id int, name string, v int")
    with pytest.raises(SparkRuntimeException, match="duplicate on-key"):
        mongo_aggregate(dup, [{"$merge": {"into": "t", "on": "_id"}}],
                        collections={"t": target}).collect()

    # $out returns the new collection state (the pipeline result);
    # write stages refuse mid-pipeline
    out_res = mongo_aggregate(
        updates, [{"$match": {"_id": {"$gte": 2}}}, {"$out": "t"}],
        collections={"t": target})
    assert out_res.count() == 2
    for bad in ([{"$out": "t"}, {"$limit": 1}],
                [{"$merge": {"into": "t"}}, {"$limit": 1}]):
        with pytest.raises(ValueError, match="last pipeline stage"):
            mongo_aggregate(updates, bad, collections={"t": target})
    with pytest.raises(ValueError, match="unknown collection"):
        mongo_aggregate(updates, [{"$merge": {"into": "zzz"}}])


def test_mongo_unionwith_replaceroot(spark):
    """$unionWith unions BY NAME with NULL-padded missing columns and
    runs the optional sub-pipeline on the second input; $replaceRoot/
    $replaceWith promote a struct to the root and refuse non-document
    roots at plan time."""
    from gramene_mongodb_spark.operators.documents import mongo_aggregate

    a = spark.createDataFrame([(1, "x")], "_id int, name string")
    b = spark.createDataFrame([(2, "y", 9), (0, "z", 1)],
                              "_id int, name string, extra int")
    res = mongo_aggregate(a, [{"$unionWith": {"coll": "b", "pipeline": [
        {"$match": {"_id": {"$gte": 2}}}]}}], collections={"b": b})
    assert sorted((r._id, r.name, r.extra) for r in res.collect()) == [
        (1, "x", None), (2, "y", 9)]
    with pytest.raises(ValueError, match="unknown collection"):
        mongo_aggregate(a, [{"$unionWith": "zzz"}])

    c = spark.createDataFrame([(1, ("inner", 5))],
                              "_id int, doc struct<n string, v int>")
    r2 = mongo_aggregate(c, [{"$replaceRoot": {"newRoot": "$doc"}}])
    assert r2.columns == ["n", "v"] and r2.first().n == "inner"
    assert mongo_aggregate(c, [{"$replaceWith": "$doc"}]).columns == ["n", "v"]
    with pytest.raises(ValueError, match="struct"):
        mongo_aggregate(c, [{"$replaceRoot": {"newRoot": "$_id"}}])


def test_mongo_expression_surface(spark):
    """Round-13 expression compiler additions: math/string/cast/array/
    boolean operators and the higher-order trio with bound variables
    ($$this/$$value/custom as-names), Mongo's 0-indexing pinned for
    $substrCP/$arrayElemAt/$slice, negative-from-end for
    $arrayElemAt/$slice, ANSI cast behavior documented, unbound
    variables and non-literal $split delimiters refused."""
    from gramene_mongodb_spark.operators.documents import mongo_aggregate

    df = spark.createDataFrame(
        [(1, "Hello World", [3, 1, 2, 1], -7.6, 10)],
        "_id int, s string, arr array<int>, x double, n int")
    r = mongo_aggregate(df, [{"$addFields": {
        "m": {"$mod": ["$n", 3]}, "p": {"$pow": ["$n", 2]},
        "a": {"$abs": "$x"}, "c": {"$ceil": "$x"}, "fl": {"$floor": "$x"},
        "tr": {"$trunc": "$x"}, "ln": {"$strLenCP": "$s"},
        "sb": {"$substrCP": ["$s", 0, 5]},
        "sp": {"$arrayElemAt": [{"$split": ["$s", " "]}, 1]},
        "last": {"$arrayElemAt": ["$arr", -1]},
        "sz": {"$size": "$arr"},
        "sl": {"$slice": ["$arr", -2]}, "sl3": {"$slice": ["$arr", 1, 2]},
        "inn": {"$in": [2, "$arr"]},
        "un": {"$setUnion": ["$arr", {"$literal": [9]}]},
        "ix": {"$setIntersection": ["$arr", {"$literal": [1, 9]}]},
        "dx": {"$setDifference": ["$arr", {"$literal": [1]}]},
        "ca": {"$concatArrays": ["$arr", {"$literal": [7]}]},
        "fi": {"$filter": {"input": "$arr", "cond": {"$gt": ["$$this", 1]}}},
        "mp": {"$map": {"input": "$arr", "as": "e",
                        "in": {"$multiply": ["$$e", 10]}}},
        "rd": {"$reduce": {"input": "$arr", "initialValue": 0,
                           "in": {"$add": ["$$value", "$$this"]}}},
        "bo": {"$and": [{"$gt": ["$n", 5]}, {"$not": [{"$eq": ["$n", 3]}]}]},
        "ts": {"$toString": "$n"},
        "ti": {"$toInt": {"$trim": {"input": "  42 "}}},
    }}]).first()
    assert (r.m, r.p, r.a) == (1, 100.0, 7.6)
    assert (r.c, r.fl, r.tr) == (-7, -8, -7)
    assert (r.ln, r.sb, r.sp) == (11, "Hello", "World")
    assert (r.last, r.sz) == (1, 4)
    assert r.sl == [2, 1] and r.sl3 == [1, 2]
    assert r.inn is True and sorted(r.un) == [1, 2, 3, 9]
    assert sorted(r.ix) == [1] and sorted(r.dx) == [2, 3]
    assert r.ca == [3, 1, 2, 1, 7]
    assert r.fi == [3, 2] and r.mp == [30, 10, 20, 10] and r.rd == 7
    assert r.bo is True and r.ts == "10" and r.ti == 42

    with pytest.raises(ValueError, match="unbound"):
        mongo_aggregate(df, [{"$addFields": {"z": "$$nope"}}])
    with pytest.raises(ValueError, match="literal string"):
        mongo_aggregate(df, [{"$addFields": {"z": {"$split": ["$s", "$s"]}}}])
    with pytest.raises(ValueError, match="chars"):
        mongo_aggregate(df, [{"$addFields": {"z": {"$trim": {
            "input": "$s", "chars": "x"}}}}])
    with pytest.raises(ValueError, match="int literals"):
        mongo_aggregate(df, [{"$addFields": {"z": {"$slice": ["$arr", "$n"]}}}])


def test_mongo_graphlookup_unbounded_doubling_path(spark):
    """Unbounded $graphLookup without a depthField takes the
    path-doubling closure fast path (⌈log2 d⌉ rounds, not d) — the
    reach SETS must equal the hop-by-hop labeled-BFS result (the
    depthField variant) on the same fixture, including a cyclic one."""
    from gramene_mongodb_spark.operators.documents import mongo_aggregate

    emp = spark.createDataFrame(
        [(1, "Dev", None), (2, "Eliot", "Dev"), (3, "Ron", "Eliot"),
         (4, "Andrew", "Eliot"), (5, "Asya", "Ron"), (6, "Dan", "Andrew"),
         (7, "Loop1", "Loop2"), (8, "Loop2", "Loop1")],  # 2-cycle
        "_id int, name string, reportsTo string")
    base = {"from": "e", "startWith": "$reportsTo",
            "connectFromField": "reportsTo", "connectToField": "name",
            "as": "chain"}
    fast = mongo_aggregate(emp, [{"$graphLookup": base}],
                           collections={"e": emp})
    slow = mongo_aggregate(emp, [{"$graphLookup": {**base, "depthField": "d"}}],
                           collections={"e": emp})
    f = {r["name"]: sorted(x["name"] for x in r["chain"]) for r in fast.collect()}
    s = {r["name"]: sorted(x["name"] for x in r["chain"]) for r in slow.collect()}
    assert f == s
    assert f["Asya"] == ["Dev", "Eliot", "Ron"]
    # the cycle converges to both members (each reaches the other and,
    # via the closure, itself)
    assert set(f["Loop1"]) == {"Loop1", "Loop2"}


def test_mongo_dates_and_expr_match(spark):
    """Date parts read the wall clock (house NTZ rule), $dayOfWeek
    agrees with Mongo's 1=Sunday, $dateToString translates Mongo
    %-specifiers (unknown specifiers and stray letters refused),
    timezone arguments are refused, and $expr works in $match with
    Mongo's null-is-falsy query rule."""
    import datetime

    from gramene_mongodb_spark.operators.documents import mongo_aggregate

    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 3, 7, 14, 30, 5), 10, 4),
         (2, datetime.datetime(2024, 3, 9, 2, 0, 0), None, 1)],
        "_id int, ts timestamp_ntz, a int, b int")
    r = mongo_aggregate(df, [
        {"$match": {"_id": 1}},
        {"$addFields": {
            "y": {"$year": "$ts"}, "h": {"$hour": {"date": "$ts"}},
            "dow": {"$dayOfWeek": "$ts"},
            "s": {"$dateToString": {"date": "$ts",
                                    "format": "%Y-%m-%d %H:%M:%S"}}}}]).first()
    assert (r.y, r.h, r.dow) == (2024, 14, 5)  # Thursday
    assert r.s == "2024-03-07 14:30:05"

    # $expr in $match; null expression result is FALSY (row 2's a is null)
    assert mongo_aggregate(df, [{"$match": {"$expr": {
        "$gt": ["$a", {"$multiply": ["$b", 2]}]}}}]).count() == 1

    for bad in ({"$dateToString": {"date": "$ts", "timezone": "UTC"}},
                {"$dateToString": {"date": "$ts", "format": "%Q"}},
                {"$dateToString": {"date": "$ts", "format": "at %H"}},
                {"$year": {"date": "$ts", "timezone": "UTC"}}):
        with pytest.raises(ValueError):
            mongo_aggregate(df, [{"$addFields": {"z": bad}}])


def test_mongo_lookup_pipeline_form(spark):
    """$lookup with let + correlated sub-pipeline: $expr equi-pairs
    become ONE hash join; row-wise rest stages run once globally
    ($project transparently keeps the hidden join keys alive and they
    never leak into the output docs); dry lookups yield empty arrays;
    non-equi correlations, correlated later stages, non-row-wise
    stages and a missing correlated first stage all refuse loudly."""
    from gramene_mongodb_spark.operators.documents import mongo_aggregate

    orders = spark.createDataFrame(
        [(1, "alice"), (2, "bob"), (3, "carol")], "_id int, cust string")
    items = spark.createDataFrame(
        [(1, "apple", 3), (1, "pear", 5), (2, "apple", 1), (9, "kiwi", 2)],
        "order_id int, sku string, qty int")
    coll = {"items": items}
    res = mongo_aggregate(orders, [{"$lookup": {
        "from": "items", "let": {"oid": "$_id"},
        "pipeline": [
            {"$match": {"$expr": {"$eq": ["$$oid", "$order_id"]}}},
            {"$match": {"qty": {"$gte": 2}}},
            {"$project": {"sku": 1, "qty": 1}},
        ],
        "as": "lines"}}], collections=coll)
    rows = {r._id: sorted((x["sku"], x["qty"]) for x in r["lines"])
            for r in res.collect()}
    assert rows == {1: [("apple", 3), ("pear", 5)], 2: [], 3: []}
    assert set(res.schema["lines"].dataType.elementType.names) == {"sku", "qty"}

    for bad in (
        [{"$match": {"$expr": {"$gt": ["$$oid", "$order_id"]}}}],
        [{"$match": {"$expr": {"$eq": ["$$oid", "$order_id"]}}},
         {"$match": {"$expr": {"$eq": ["$$oid", "$qty"]}}}],
        [{"$match": {"$expr": {"$eq": ["$$oid", "$order_id"]}}},
         {"$group": {"_id": None, "n": {"$sum": 1}}}],
        [{"$project": {"sku": 1}}],
    ):
        with pytest.raises(ValueError):
            mongo_aggregate(orders, [{"$lookup": {
                "from": "items", "let": {"oid": "$_id"},
                "pipeline": bad, "as": "z"}}], collections=coll)


def test_mongo_array_expression_batch(spark):
    """Round-13 late batch: $sortArray (scalar 1/-1 only), $indexOfArray
    (0-based, -1 absent), $range (half-open, negative steps, empty),
    $zip (truncate-to-shortest default, struct elements; longest form
    null-pads; defaults refused) and $getField."""
    from gramene_mongodb_spark.operators.documents import mongo_aggregate

    df = spark.createDataFrame([(1, [3, 1, 2], [10, 20, 30, 40])],
                               "_id int, a array<int>, b array<int>")
    r = mongo_aggregate(df, [{"$addFields": {
        "srt": {"$sortArray": {"input": "$a", "sortBy": 1}},
        "srd": {"$sortArray": {"input": "$a", "sortBy": -1}},
        "idx": {"$indexOfArray": ["$a", 2]},
        "idm": {"$indexOfArray": ["$a", 99]},
        "rng": {"$range": [0, 5]},
        "rn2": {"$range": [5, 0, -2]},
        "rn0": {"$range": [3, 3]},
        "zp": {"$zip": {"inputs": ["$a", "$b"]}},
        "zl": {"$zip": {"inputs": ["$a", "$b"], "useLongestLength": True}},
        "gf": {"$getField": {"field": "_id"}},
    }}]).first()
    assert r.srt == [1, 2, 3] and r.srd == [3, 2, 1]
    assert r.idx == 2 and r.idm == -1
    assert r.rng == [0, 1, 2, 3, 4] and r.rn2 == [5, 3, 1] and r.rn0 == []
    assert [tuple(x) for x in r.zp] == [(3, 10), (1, 20), (2, 30)]
    assert len(r.zl) == 4 and r.zl[3][0] is None
    assert r.gf == 1
    for bad in ({"$sortArray": {"input": "$a", "sortBy": {"x": 1}}},
                {"$zip": {"inputs": ["$a"]}},
                {"$zip": {"inputs": ["$a", "$b"], "useLongestLength": True,
                          "defaults": [0, 0]}},
                {"$zip": ["$a", "$b"]}):
        with pytest.raises(ValueError):
            mongo_aggregate(df, [{"$addFields": {"z": bad}}])


def test_mongo_find_array_operators(spark):
    """find() array operators: $size (arrays only — null/missing never
    match), $all (conjunction of containment; empty $all matches
    nothing), $elemMatch in both scalar-element and document-element
    forms (mixing refused, as in Mongo)."""
    from gramene_mongodb_spark.operators.documents import mongo_find

    df = spark.createDataFrame(
        [(1, [1, 2, 3], [(5, "a"), (9, "b")]),
         (2, [2], [(1, "a")]),
         (3, None, None),
         (4, [], [])],
        "_id int, tags array<int>, items array<struct<qty int, sku string>>")

    def ids(q):
        return sorted(r._id for r in mongo_find(df, q).collect())

    assert ids({"tags": {"$size": 1}}) == [2]
    assert ids({"tags": {"$size": 0}}) == [4]
    assert ids({"tags": {"$all": [1, 3]}}) == [1]
    assert ids({"tags": {"$all": [2]}}) == [1, 2]
    assert ids({"tags": {"$all": []}}) == []
    assert ids({"tags": {"$elemMatch": {"$gt": 1, "$lt": 3}}}) == [1, 2]
    assert ids({"items": {"$elemMatch": {"qty": {"$gte": 9}, "sku": "b"}}}) == [1]
    assert ids({"items": {"$elemMatch": {"sku": "a"}}}) == [1, 2]
    for bad in ({"tags": {"$size": "x"}}, {"tags": {"$all": 3}},
                {"items": {"$elemMatch": {}}},
                {"items": {"$elemMatch": {"$gt": 1, "sku": "a"}}}):
        with pytest.raises(ValueError):
            mongo_find(df, bad)


def test_mongo_range_window_null_sort_divergence(spark):
    """Documented divergence: Mongo ERRORS on null sortBy values under
    a range window; the shim (Spark) groups null rows into their own
    peer frame. Pinned so the behavior is a contract, not an accident."""
    from gramene_mongodb_spark.operators.documents import mongo_aggregate

    df = spark.createDataFrame([(1, 10), (2, None), (3, 12), (4, None)],
                               "_id int, x int")
    r = {row._id: row.c for row in mongo_aggregate(df, [{"$setWindowFields": {
        "sortBy": {"x": 1},
        "output": {"c": {"$count": {}, "window": {"range": [-2, 0]}}},
    }}]).collect()}
    assert r == {1: 1, 3: 2, 2: 2, 4: 2}  # nulls form their own frame


def test_mongo_group_accumulators_5x(spark):
    """Mongo 5.x $group accumulators: $count (empty-doc form),
    $stdDevPop/$stdDevSamp, $top/$bottom (single-field sortBy →
    min_by/max_by); $mergeObjects refused with a restructuring hint."""
    from gramene_mongodb_spark.operators.documents import mongo_aggregate

    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 20.0), ("b", 9, 5.0)],
        "g string, seq int, v double")
    r = {row._id: row for row in mongo_aggregate(df, [{"$group": {
        "_id": "$g",
        "n": {"$count": {}},
        "sd": {"$stdDevPop": "$v"},
        "first_v": {"$top": {"sortBy": {"seq": 1}, "output": "$v"}},
        "last_v": {"$bottom": {"sortBy": {"seq": 1}, "output": "$v"}},
        "max_v_doc": {"$top": {"sortBy": {"v": -1}, "output": "$seq"}},
    }}]).collect()}
    a = r["a"]
    assert a.n == 3 and abs(a.sd - 8.16496580927726) < 1e-9
    assert a.first_v == 10.0 and a.last_v == 20.0
    assert a.max_v_doc == 2  # seq of the max-v row
    assert r["b"].n == 1 and r["b"].sd == 0.0

    for bad in ({"$count": {"x": 1}},
                {"$top": {"output": "$v"}},
                {"$top": {"sortBy": {"seq": 1, "v": 1}, "output": "$v"}},
                {"$mergeObjects": "$v"}):
        with pytest.raises(ValueError):
            mongo_aggregate(df, [{"$group": {"_id": "$g", "z": bad}}])


def test_mongo_advice_r13_fixes(spark):
    """Round-14 ADVICE closures, all pinned here:

    1. $arrayElemAt out-of-range (positive or negative) returns NULL —
       Mongo's *missing* under the house null≈missing convention —
       instead of ANSI INVALID_ARRAY_INDEX (try_element_at).
    2. $lookup pipeline form keeps the hidden join keys alive through a
       COMPUTED-ONLY $project (inclusion-shaped in Mongo's rule even
       with zero 1/True flags).
    3. $setWindowFields evaluates every output against the INPUT
       document: an output that shadows an input column can't poison a
       later output's argument (Mongo's semantics).
    4. $merge refuses duplicate on-keys on the TARGET side too, not
       just the pipeline-result side (Mongo's unique-index rule).
    """
    from pyspark.errors import SparkRuntimeException

    from gramene_mongodb_spark.operators.documents import mongo_aggregate

    # 1 — ragged arrays, every out-of-range flavor
    df = spark.createDataFrame([(1, [10, 20]), (2, [])],
                               "_id int, arr array<int>")
    r = {row._id: (row.hi, row.lo, row.ok)
         for row in mongo_aggregate(df, [{"$addFields": {
             "hi": {"$arrayElemAt": ["$arr", 5]},
             "lo": {"$arrayElemAt": ["$arr", -5]},
             "ok": {"$arrayElemAt": ["$arr", -1]},
         }}]).collect()}
    assert r[1] == (None, None, 20)
    assert r[2] == (None, None, None)

    # 2 — computed-only projection in the sub-pipeline
    orders = spark.createDataFrame([(1,), (2,)], "_id int")
    items = spark.createDataFrame(
        [(1, "apple"), (1, "pear"), (9, "kiwi")], "order_id int, sku string")
    res = mongo_aggregate(orders, [{"$lookup": {
        "from": "items", "let": {"oid": "$_id"},
        "pipeline": [
            {"$match": {"$expr": {"$eq": ["$$oid", "$order_id"]}}},
            {"$project": {"item": {"$toUpper": "$sku"}}},
        ],
        "as": "lines"}}], collections={"items": items})
    rows = {row._id: sorted(x["item"] for x in row["lines"])
            for row in res.collect()}
    assert rows == {1: ["APPLE", "PEAR"], 2: []}
    assert res.schema["lines"].dataType.elementType.names == ["item"]

    # 3 — output name "v" shadows the input column a LATER output reads
    wdf = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 20.0), ("b", 1, 5.0)],
        "g string, seq int, v double")
    out = {(row.g, row.seq): (row.v, row.tot)
           for row in mongo_aggregate(wdf, [{"$setWindowFields": {
               "partitionBy": "$g", "sortBy": {"seq": 1},
               "output": {
                   "v": {"$rank": {}},          # shadows input column v
                   "tot": {"$sum": "$v"},       # must still read INPUT v
               }}}]).collect()}
    assert out[("a", 1)] == (1, 30.0) and out[("a", 2)] == (2, 30.0)
    assert out[("b", 1)] == (1, 5.0)

    # 4 — duplicate on-key in the TARGET collection
    dup_target = spark.createDataFrame(
        [(1, "a"), (1, "a2"), (2, "b")], "_id int, name string")
    updates = spark.createDataFrame([(3, "c")], "_id int, name string")
    with pytest.raises(SparkRuntimeException, match="target.*duplicate"):
        mongo_aggregate(updates, [{"$merge": {"into": "t", "on": "_id"}}],
                        collections={"t": dup_target}).collect()


def test_release_stage_fingerprint_covers_helpers():
    """ADVICE r13: the resume fingerprint must cover the HELPERS a
    stage calls, not just the stage body — _stage_code_digest walks the
    transitive gramene_mongodb_spark imports, so graft_genome_children
    (genomics), transitive_closure (closure), load_table (io) and this
    module's _staged all participate.  An edit to any of those modules
    flips the digest and forces a re-run."""
    from gramene_mongodb_spark import pipelines as P

    mods = P._stage_code_modules("taxonomy")
    for needed in ("gramene_mongodb_spark.pipelines",
                   "gramene_mongodb_spark.io",
                   "gramene_mongodb_spark.operators.closure",
                   "gramene_mongodb_spark.operators.genomics"):
        assert needed in mods, f"{needed} missing from fingerprint scope"
    # genes reads staged taxonomy via _staged (this module) + load_table
    gmods = P._stage_code_modules("genes")
    assert "gramene_mongodb_spark.pipelines" in gmods
    assert "gramene_mongodb_spark.io" in gmods
    # digest is deterministic and differs across stages
    assert P._stage_code_digest("taxonomy") == P._stage_code_digest("taxonomy")
    assert P._stage_code_digest("taxonomy") != P._stage_code_digest("genes")


def test_mongo_expression_tail_r14(spark):
    """Round-14 expression tail (VERDICT r13 §missing #3):
    $regexMatch/$regexFind (literal pattern, imsx inline-flag options,
    first-match {match, idx, captures}, NULL doc when no match),
    $objectToArray/$arrayToObject/$mergeObjects over MapType (the
    SURVEY §1.3 dynamic-key flavor; embedded-document and
    array-construction expressions compile), typed $literal documents,
    and $dateAdd/$dateSubtract/$dateDiff with Mongo's unit-boundary-
    CROSSING semantics. Error contracts: non-literal regex, bad
    options, bad units, timezone, Sunday weeks, and the accumulator
    $mergeObjects all refuse loudly."""
    import datetime as dt

    from gramene_mongodb_spark.operators.documents import mongo_aggregate

    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    try:
        df = spark.createDataFrame(
            [(1, "Hello World 42",
              dt.datetime(2020, 1, 1, 23, 59), dt.datetime(2020, 1, 2, 0, 1))],
            "_id int, s string, t0 timestamp_ntz, t1 timestamp_ntz")

        r = mongo_aggregate(df, [{"$addFields": {
            "m": {"$regexMatch": {"input": "$s", "regex": "world",
                                  "options": "i"}},
            "nm": {"$regexMatch": {"input": "$s", "regex": "^world"}},
            "f": {"$regexFind": {"input": "$s", "regex": r"(\w+) (\d+)"}},
            "fn": {"$regexFind": {"input": "$s", "regex": "zzz"}},
        }}]).first()
        assert r.m is True and r.nm is False
        assert (r.f.match, r.f.idx, list(r.f.captures)) == (
            "World 42", 6, ["World", "42"])
        assert r.fn is None

        # map round-trip: build → merge → shred; last-wins under LAST_WIN
        r2 = mongo_aggregate(df, [{"$addFields": {
            "kv": {"$arrayToObject": [{"$map": {
                "input": {"$split": ["$s", " "]},
                "in": {"k": "$$this", "v": {"$strLenCP": "$$this"}}}}]},
        }}, {"$addFields": {
            "merged": {"$mergeObjects": ["$kv", {"$arrayToObject": [
                {"$literal": [{"k": "Hello", "v": 99}]}]}]},
        }}, {"$addFields": {
            "back": {"$objectToArray": "$merged"},
        }}]).first()
        assert sorted(r2.kv.items()) == [("42", 2), ("Hello", 5), ("World", 5)]
        assert r2.merged["Hello"] == 99  # later doc wins
        assert sorted((e.k, e.v) for e in r2.back) == [
            ("42", 2), ("Hello", 99), ("World", 5)]

        # boundary crossings, not elapsed units: 23:59 → next-day 00:01
        r3 = mongo_aggregate(df, [{"$addFields": {
            "dd": {"$dateDiff": {"startDate": "$t0", "endDate": "$t1",
                                 "unit": "day"}},
            "dm": {"$dateDiff": {"startDate": "$t0", "endDate": "$t1",
                                 "unit": "minute"}},
            "plus": {"$dateAdd": {"startDate": "$t0", "unit": "hour",
                                  "amount": 2}},
            "minus": {"$dateSubtract": {"startDate": "$t0", "unit": "day",
                                        "amount": 1}},
        }}]).first()
        assert (r3.dd, r3.dm) == (1, 2)
        assert r3.plus == dt.datetime(2020, 1, 2, 1, 59)
        assert r3.minus == dt.datetime(2019, 12, 31, 23, 59)

        for bad, pat in (
            ({"$regexMatch": {"input": "$s", "regex": "$s"}}, "literal"),
            ({"$regexMatch": {"input": "$s", "regex": "x",
                              "options": "g"}}, "imsx"),
            ({"$regexFind": {"input": "$s"}}, "requires"),
            ({"$dateDiff": {"startDate": "$t0", "endDate": "$t1",
                            "unit": "fortnight"}}, "unit"),
            ({"$dateDiff": {"startDate": "$t0", "endDate": "$t1",
                            "unit": "week"}}, "monday"),
            ({"$dateAdd": {"startDate": "$t0", "unit": "day", "amount": 1,
                           "timezone": "UTC"}}, "timezone"),
            ({"$mergeObjects": ["$s"]}, "two or more"),
        ):
            with pytest.raises(ValueError, match=pat):
                mongo_aggregate(df, [{"$addFields": {"z": bad}}])
    finally:
        spark.conf.unset("spark.sql.mapKeyDedupPolicy")


def test_mongo_expression_batch2_r14(spark):
    """Round-14 batch 2: $replaceOne (FIRST occurrence via
    instr/concat splice) / $replaceAll (literal find, no regex),
    $dateTrunc (Monday weeks, binSize 1, no timezone), $strcasecmp /
    $indexOfCP (0-based, -1 absent, two-arg form only), set
    predicates, and the $topN/$bottomN accumulators ($bottomN returns
    the ascending TAIL in sort order — exactly the reverse of the
    descending head). Error contracts refuse everything else."""
    import datetime as dt

    from gramene_mongodb_spark.operators.documents import mongo_aggregate

    df = spark.createDataFrame(
        [("a", 1, 10.0, "1-URGENT", dt.datetime(2020, 1, 8, 5)),
         ("a", 2, 30.0, "2-HIGH", dt.datetime(2020, 1, 9, 5)),
         ("a", 3, 20.0, "3-MEDIUM", dt.datetime(2020, 1, 20, 5)),
         ("b", 4, 5.0, "5-LOW", dt.datetime(2020, 2, 1, 5))],
        "g string, k int, price double, pri string, ts timestamp_ntz")

    r = {row.pri: row for row in mongo_aggregate(df, [{"$addFields": {
        "rall": {"$replaceAll": {"input": "$pri", "find": "-",
                                 "replacement": "_"}},
        "rone": {"$replaceOne": {"input": "$pri", "find": "I",
                                 "replacement": "!"}},
        "wk": {"$dateTrunc": {"date": "$ts", "unit": "week",
                              "startOfWeek": "monday"}},
        "cmp": {"$strcasecmp": ["$pri", "3-medium"]},
        "gx": {"$indexOfCP": ["$pri", "G"]},
        "sub": {"$setIsSubset": [{"$literal": [1]}, {"$literal": [1, 2]}]},
        "seq": {"$setEquals": [{"$literal": [2, 1, 1]},
                               {"$literal": [1, 2]}]},
        "anyt": {"$anyElementTrue": [{"$literal": [False, True]}]},
        "allt": {"$allElementsTrue": [{"$literal": [False, True]}]},
    }}]).collect()}
    assert r["1-URGENT"].rall == "1_URGENT"
    assert r["3-MEDIUM"].rone == "3-MED!UM"  # first I only
    assert r["1-URGENT"].wk == dt.datetime(2020, 1, 6)  # Monday
    assert (r["1-URGENT"].cmp, r["3-MEDIUM"].cmp, r["5-LOW"].cmp) == (-1, 0, 1)
    assert (r["1-URGENT"].gx, r["5-LOW"].gx) == (4, -1)
    row = r["1-URGENT"]
    assert (row.sub, row.seq, row.anyt, row.allt) == (True, True, True, False)

    g = {row._id: row for row in mongo_aggregate(df, [{"$group": {
        "_id": "$g",
        "top2": {"$topN": {"n": 2, "sortBy": {"price": -1}, "output": "$k"}},
        "bot2": {"$bottomN": {"n": 2, "sortBy": {"price": 1}, "output": "$k"}},
    }}]).collect()}
    assert g["a"].top2 == [2, 3]   # 30.0 then 20.0
    assert g["a"].bot2 == [3, 2]   # ascending tail: 20.0 then 30.0
    assert g["b"].top2 == [4] and g["b"].bot2 == [4]  # n > group size

    for bad, pat in (
        ({"$replaceOne": {"input": "$pri"}}, "requires"),
        ({"$dateTrunc": {"date": "$ts", "unit": "week"}}, "monday"),
        ({"$dateTrunc": {"date": "$ts", "unit": "day",
                         "binSize": 2}}, "binSize"),
        ({"$dateTrunc": {"date": "$ts", "unit": "day",
                         "timezone": "UTC"}}, "timezone"),
        ({"$indexOfCP": ["$pri", "G", 1]}, "two-argument"),
        ({"$setIsSubset": ["$pri"]}, "two"),
        ({"$strcasecmp": ["$pri"]}, "two-element"),
    ):
        with pytest.raises(ValueError, match=pat):
            mongo_aggregate(df, [{"$addFields": {"z": bad}}])
    for badacc, pat in (
        ({"$topN": {"n": 2, "output": "$k"}}, "requires"),
        ({"$topN": {"n": 0, "sortBy": {"price": 1},
                    "output": "$k"}}, "positive"),
        ({"$bottomN": {"n": 1, "sortBy": {"price": 1, "k": 1},
                       "output": "$k"}}, "single"),
    ):
        with pytest.raises(ValueError, match=pat):
            mongo_aggregate(df, [{"$group": {"_id": "$g", "z": badacc}}])


def test_mongo_median_percentile(spark):
    """Mongo 7.0 $median/$percentile accumulators, compiled to EXACT
    linear-interpolated percentile (pinned divergence: Mongo offers
    only a t-digest approximation; exact is the safer migration-
    validation direction and matches quantile_cont oracles). method:
    'approximate' is REQUIRED as in Mongo; p must be numeric literals
    in [0,1]."""
    from gramene_mongodb_spark.operators.documents import mongo_aggregate

    df = spark.createDataFrame(
        [("a", v) for v in (1.0, 2.0, 3.0, 4.0)] + [("b", 10.0)],
        "g string, v double")
    r = {row._id: row for row in mongo_aggregate(df, [{"$group": {
        "_id": "$g",
        "med": {"$median": {"input": "$v", "method": "approximate"}},
        "pct": {"$percentile": {"input": "$v", "p": [0.25, 0.5, 1.0],
                                "method": "approximate"}},
    }}]).collect()}
    assert r["a"].med == 2.5
    assert r["a"].pct == [1.75, 2.5, 4.0]  # linear interpolation
    assert r["b"].med == 10.0 and r["b"].pct == [10.0, 10.0, 10.0]

    for bad, pat in (
        ({"$median": {"input": "$v"}}, "method"),
        ({"$median": {"input": "$v", "method": "exact"}}, "method"),
        ({"$percentile": {"input": "$v", "method": "approximate",
                          "p": []}}, "non-empty"),
        ({"$percentile": {"input": "$v", "method": "approximate",
                          "p": [1.5]}}, "0, 1"),
    ):
        with pytest.raises(ValueError, match=pat):
            mongo_aggregate(df, [{"$group": {"_id": "$g", "z": bad}}])


def test_mongo_window_calculus_r14(spark):
    """$setWindowFields calculus/statistics tail: $integral (trapezoid
    rule; bounded documents frames exclude the half-trapezoid that
    reaches outside via the shifted lower bound), $derivative
    ((last−first)/(key span); NULL on zero span — pinned vs Mongo's
    Infinity), windowed $stdDevPop/$covariancePop, $push/$addToSet
    windows, and refusals: $expMovingAvg with an explicit window,
    range-bounded $integral/$derivative, $integral/$derivative
    without a single ascending numeric sortBy, time units."""
    from gramene_mongodb_spark.operators.documents import mongo_aggregate

    # y = 2x on x = 0..3 → ∫ = x², slope 2 everywhere
    df = spark.createDataFrame(
        [("a", 0.0, 0.0), ("a", 1.0, 2.0), ("a", 2.0, 4.0), ("a", 3.0, 6.0),
         ("b", 0.0, 1.0), ("b", 2.0, 1.0)],
        "g string, x double, y double")
    rows = {(r.g, r.x): r for r in mongo_aggregate(df, [{"$setWindowFields": {
        "partitionBy": "$g", "sortBy": {"x": 1},
        "output": {
            "cum": {"$integral": {"input": "$y"},
                    "window": {"documents": ["unbounded", "current"]}},
            "tot": {"$integral": {"input": "$y"}},
            "pair": {"$integral": {"input": "$y"},
                     "window": {"documents": [-1, "current"]}},
            "slope": {"$derivative": {"input": "$y"},
                      "window": {"documents": [-1, 0]}},
            "sd": {"$stdDevPop": "$y"},
            "cov": {"$covariancePop": ["$x", "$y"]},
            "ys": {"$push": "$y",
                   "window": {"documents": ["unbounded", "current"]}},
        }}}]).collect()}
    a3 = rows[("a", 3.0)]
    assert [rows[("a", x)].cum for x in (0.0, 1.0, 2.0, 3.0)] == \
        [0.0, 1.0, 4.0, 9.0]  # x² — the trapezoid rule is exact on lines
    assert a3.tot == 9.0 and rows[("b", 2.0)].tot == 2.0
    assert a3.pair == 5.0  # trapezoid between x=2 and x=3 only
    assert a3.slope == 2.0 and rows[("a", 0.0)].slope is None  # zero span
    assert abs(a3.sd - 2.2360679) < 1e-6 and abs(a3.cov - 2.5) < 1e-12
    assert a3.ys == [0.0, 2.0, 4.0, 6.0]

    for bad, pat in (
        # round-14 update: $expMovingAvg is now IMPLEMENTED (grouped-map
        # recurrence kernel); the refusal that remains is Mongo's own —
        # it does not accept an explicit window
        ({"$expMovingAvg": {"input": "$y", "N": 3},
          "window": {"documents": [-1, 0]}}, "window"),
        ({"$integral": {"input": "$y"},
          "window": {"range": [-1, 0]}}, "documents"),
        ({"$derivative": {"input": "$y"},
          "window": {"range": [-1, 0]}}, "documents"),
        ({"$integral": {"input": "$y", "unit": "hour"},
          "window": {"documents": [-1, 0]}}, "unit"),
        ({"$covariancePop": ["$x"]}, "two-expression"),
    ):
        with pytest.raises(ValueError, match=pat):
            mongo_aggregate(df, [{"$setWindowFields": {
                "partitionBy": "$g", "sortBy": {"x": 1},
                "output": {"z": bad}}}])
    with pytest.raises(ValueError, match="ascending"):
        mongo_aggregate(df, [{"$setWindowFields": {
            "partitionBy": "$g", "sortBy": {"x": -1},
            "output": {"z": {"$derivative": {"input": "$y"},
                             "window": {"documents": [-1, 0]}}}}}])
    # $round is half-to-even (banker's), matching Mongo
    r = mongo_aggregate(
        spark.createDataFrame([(0.125, 0.375)], "p double, q double"),
        [{"$addFields": {"rp": {"$round": ["$p", 2]},
                         "rq": {"$round": ["$q", 2]}}}]).first()
    assert (r.rp, r.rq) == (0.12, 0.38)


def test_mongo_let_and_date_parsing(spark):
    """$let (outer-scope vars, nested rebinding, unbound refusal) and
    the parse direction of the date surface: $toDate (strings only)
    and $dateFromString with the $dateToString %-specifier table, both
    NULL-on-unparseable (the house try_-cast rule ≈ Mongo's
    onError:null) and returned as TIMESTAMP_NTZ wall clock — the
    LTZ-parse→NTZ-cast round-trip cancels the session timezone, so a
    hostile-TZ driver parses identically (cross-TZ sweep contract)."""
    import datetime as dt

    from pyspark.sql import types as T

    from gramene_mongodb_spark.operators.documents import mongo_aggregate

    df = spark.createDataFrame(
        [(1, "2020-03-05 12:30:00", "05/03/2020", 4.0)],
        "_id int, iso string, dmy string, x double")
    res = mongo_aggregate(df, [{"$addFields": {
        "t1": {"$toDate": "$iso"},
        "t2": {"$dateFromString": {"dateString": "$dmy",
                                   "format": "%d/%m/%Y"}},
        "bad": {"$toDate": {"$literal": "nope"}},
        "lt": {"$let": {"vars": {"half": {"$divide": ["$x", 2]}},
                        "in": {"$add": ["$$half",
                                        {"$multiply": ["$$half", 10]}]}}},
        "nested": {"$let": {"vars": {"a": 1},
                            "in": {"$let": {
                                "vars": {"b": {"$add": ["$$a", 1]}},
                                "in": {"$add": ["$$a", "$$b"]}}}}},
    }}])
    assert isinstance(res.schema["t1"].dataType, T.TimestampNTZType)
    assert isinstance(res.schema["t2"].dataType, T.TimestampNTZType)
    r = res.first()
    assert r.t1 == dt.datetime(2020, 3, 5, 12, 30)
    assert r.t2 == dt.datetime(2020, 3, 5)
    assert r.bad is None and r.lt == 22.0 and r.nested == 3

    # TZ-independence: same parse under a hostile half-hour offset
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Australia/Adelaide")
    try:
        r2 = mongo_aggregate(df, [{"$addFields": {
            "t1": {"$toDate": "$iso"}}}]).first()
        assert r2.t1 == dt.datetime(2020, 3, 5, 12, 30)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)

    for bad, pat in (
        ({"$let": {"vars": {"a": 1}, "in": "$$c"}}, "unbound"),
        ({"$let": {"in": 1}}, "requires"),
        ({"$dateFromString": {"dateString": "$iso",
                              "timezone": "UTC"}}, "timezone"),
        ({"$dateFromString": {"dateString": "$iso",
                              "onError": None}}, "only"),
        ({"$dateFromString": {"dateString": "$dmy",
                              "format": "%d/%Q/%Y"}}, "specifier"),
    ):
        with pytest.raises(ValueError, match=pat):
            mongo_aggregate(df, [{"$addFields": {"z": bad}}])


def test_mongo_update_many_semantics(spark):
    """updateMany shim (S12 write surface, `trees/taxonomy.js:48-69`):
    every classic operator's pinned missing≈null seed, unmatched-row
    passthrough, and the pipeline form's stage-sees-previous-stage /
    filter-pinned-to-original evaluation order."""
    df = spark.createDataFrame(
        [(1, "O", 10.0, ["a", "b"], ["x", "y", "x"]),
         (2, "F", 20.0, None, ["x"]),
         (3, "O", None, ["b"], None)],
        "id INT, st STRING, price DOUBLE, "
        "flags ARRAY<STRING>, codes ARRAY<STRING>")
    out = DOC.mongo_update_many(df, {"st": "O"}, {
        "$inc": {"price": 5},            # null seeds the increment
        "$set": {"audited": "r14"},      # new field appends
        "$rename": {"st": "status"},     # source nulled on matched rows
        "$addToSet": {"flags": "a"},     # append-if-absent
        "$pull": {"codes": "x"},
        "$max": {"cap": 3},              # missing field takes operand
    }).orderBy("id")
    rows = {r.id: r for r in out.collect()}
    assert rows[1].price == 15.0 and rows[3].price == 5.0
    assert rows[2].price == 20.0 and rows[2].audited is None
    assert rows[1].st is None and rows[1].status == "O"
    assert rows[2].st == "F" and rows[2].status is None
    assert rows[1].flags == ["a", "b"]          # already present: no dup
    assert rows[3].flags == ["b", "a"]          # appended
    assert rows[1].codes == ["y"] and rows[2].codes == ["x"]
    assert rows[3].codes is None                # $pull no-ops on null
    assert rows[1].cap == 3 and rows[2].cap is None

    # $push/$each, $addToSet preserves EXISTING duplicates, $pullAll
    # keeps surviving duplicates (not array_except), $pop both ends
    df2 = spark.createDataFrame(
        [(1, ["a", "a", "b"], [1, 2, 2, 3])],
        "id INT, tags ARRAY<STRING>, ns ARRAY<INT>")
    r = DOC.mongo_update_many(df2, {}, {
        "$addToSet": {"tags": "a"},
        "$pullAll": {"ns": [2]},
    }).first()
    assert r.tags == ["a", "a", "b"]  # untouched — Mongo does not dedup
    assert r.ns == [1, 3]
    r = DOC.mongo_update_many(df2, {}, {"$pop": {"ns": 1}}).first()
    assert r.ns == [1, 2, 2]
    r = DOC.mongo_update_many(df2, {}, {"$pop": {"ns": -1}}).first()
    assert r.ns == [2, 2, 3]
    # $pull with an operator document compiles the element predicate
    r = DOC.mongo_update_many(df2, {}, {"$pull": {"ns": {"$gte": 2}}}).first()
    assert r.ns == [1]
    # $push on a missing array creates it; $mul missing seeds 0
    r = DOC.mongo_update_many(df2, {}, {
        "$push": {"hist": {"$each": [1, 2]}},
        "$mul": {"scale": 7},
    }).first()
    assert r.hist == [1, 2] and r.scale == 0

    # pipeline form: stage 2 sees stage 1's output; the FILTER matched
    # the ORIGINAL document (id=3 price null stays null through $set)
    out2 = DOC.mongo_update_many(df, {"id": {"$gte": 2}}, [
        {"$set": {"price": {"$multiply": ["$price", 2]}}},
        {"$set": {"dbl": {"$add": ["$price", 1]}}},
        {"$unset": "st"},
    ])
    rows2 = {r.id: r for r in out2.collect()}
    assert rows2[1].price == 10.0 and rows2[1].st == "O"
    assert rows2[2].price == 40.0 and rows2[2].dbl == 41.0
    assert rows2[2].st is None and rows2[3].price is None


def test_mongo_update_many_error_contracts(spark):
    df = spark.createDataFrame([(1, 2.0, ["a"])],
                               "id INT, x DOUBLE, a ARRAY<STRING>")
    for update, pat in (
        ({"$inc": {"x": 1}, "$set": {"x": 2}}, "conflict"),
        ({"$set": {"a.b": 1}}, "dotted"),
        ({"$set": {"a.$[]": 1}}, "dotted|positional"),
        ({"$pull": {"a$": "v"}}, "positional"),
        ({"$currentDate": {"x": True}}, "refused"),
        ({"$setOnInsert": {"x": 1}}, "refused"),
        ({"$bit": {"x": {"and": 1}}}, "refused"),
        ({"$inc": {"x": "nope"}}, "numeric"),
        ({"$pop": {"a": 2}}, "pop"),
        ({"$push": {"a": {"$slice": 2}}}, "require .each"),
        ({"$addToSet": {"a": {"$each": ["v"], "$slice": 2}}}, "refused"),
        ({"$push": {"a": {"$each": ["v"], "$sort": {"k": 1}}}}, "1 or -1"),
        ({"$push": {"a": {"$each": ["v"], "$position": "x"}}}, "int"),
        ({"$push": {"a": {"$each": ["v"], "$rank": 1}}}, "refused"),
        ({"$push": {"a": {"$each": "v"}}}, "list"),
        ({"$pullAll": {"a": "v"}}, "list"),
        ({"$rename": {"x": 3}}, "string"),
        ({"$rename": {"x": "x"}}, "conflict"),
        ({"$set": {"x": []}}, "empty-array"),
        ({"$set": {"x": {"nested": 1}}}, "nested-document"),
        ({"$frobnicate": {"x": 1}}, "unsupported"),
        ({}, "non-empty"),
    ):
        with pytest.raises(ValueError, match=pat):
            DOC.mongo_update_many(df, {}, update)
    with pytest.raises(ValueError, match="single-operator"):
        DOC.mongo_update_many(df, {}, [{"$set": {"y": 1}, "$unset": "x"}])
    with pytest.raises(ValueError, match="\\$set/\\$addFields/\\$unset"):
        DOC.mongo_update_many(df, {}, [{"$project": {"x": 1}}])


def test_mongo_exp_moving_avg(spark):
    """$expMovingAvg pinned semantics: seed with first numeric, null
    inputs carry the previous output (null before the first numeric),
    the N form's alpha = 2/(N+1), and the recurrence matches a pure
    Python replay bit-for-bit. Mixed kernel+window outputs in one
    $setWindowFields stage; error contracts below."""
    ev = spark.createDataFrame(
        [(1, 1, None), (1, 2, 2.0), (1, 3, None), (1, 4, 4.0),
         (2, 1, 10.0)],
        "u INT, t INT, v DOUBLE")
    res = DOC.mongo_aggregate(ev, [{"$setWindowFields": {
        "partitionBy": "$u", "sortBy": {"t": 1},
        "output": {
            "rn": {"$documentNumber": {}},
            "ema": {"$expMovingAvg": {"input": "$v", "N": 3}},
            "emah": {"$expMovingAvg": {"input": "$v", "alpha": 0.25}},
        }}}])
    rows = {(r.u, r.t): r for r in res.collect()}
    assert rows[(1, 1)].ema is None          # null before first numeric
    assert rows[(1, 2)].ema == 2.0           # seeded with first numeric
    assert rows[(1, 3)].ema == 2.0           # null input carries forward
    alpha = 2.0 / (3 + 1)
    assert rows[(1, 4)].ema == alpha * 4.0 + (1.0 - alpha) * 2.0
    assert rows[(1, 4)].emah == 0.25 * 4.0 + 0.75 * 2.0
    assert rows[(2, 1)].ema == 10.0
    assert rows[(1, 4)].rn == 4              # window outputs still work

    # an output name may shadow an input column without poisoning the
    # kernel's sort or the other outputs (evaluated against the INPUT)
    res2 = DOC.mongo_aggregate(
        ev.selectExpr("u", "t", "v AS w"),
        [{"$setWindowFields": {
            "partitionBy": "$u", "sortBy": {"t": 1},
            "output": {"t": {"$expMovingAvg": {"input": "$w",
                                               "alpha": 0.5}}}}}])
    assert res2.filter("u = 2").first().t == 10.0

    for body, pat in (
        ({"input": "$v", "N": 3, "window": {"documents": [-1, 0]}},
         "window"),
        ({"input": "$v"}, "exactly one"),
        ({"input": "$v", "N": 3, "alpha": 0.5}, "exactly one"),
        ({"input": "$v", "N": 0}, "positive"),
        ({"input": "$v", "alpha": 1.0}, "exclusive"),
        ({"input": "$v", "alpha": 0.0}, "exclusive"),
        ({"input": "$v", "N": 3, "bogus": 1}, "unknown"),
        ({"N": 3}, "input"),
    ):
        wspec = body.pop("window", None)
        out_doc = {"$expMovingAvg": body}
        if wspec:
            out_doc["window"] = wspec
        with pytest.raises(ValueError, match=pat):
            DOC.mongo_aggregate(ev, [{"$setWindowFields": {
                "partitionBy": "$u", "sortBy": {"t": 1},
                "output": {"e": out_doc}}}])
    with pytest.raises(ValueError, match="sortBy"):
        DOC.mongo_aggregate(ev, [{"$setWindowFields": {
            "partitionBy": "$u",
            "output": {"e": {"$expMovingAvg": {"input": "$v", "N": 3}}}}}])


def test_mongo_convert_and_type_inspection(spark):
    """$convert (P8's general coercion): onError fires ONLY on a failed
    conversion of a non-null input, onNull ONLY on null/missing input,
    date targets parse null-on-unparseable; $isNumber/$type compile to
    typeof() — static per column, null-aware per row."""
    df = spark.createDataFrame(
        [(1, "1-URGENT", 100.5, None)],
        "id INT, pr STRING, price DOUBLE, nul STRING")
    r = DOC.mongo_aggregate(df, [{"$project": {
        "a": {"$convert": {"input": {"$substrCP": ["$pr", 0, 1]},
                           "to": "int"}},
        "b": {"$convert": {"input": "$pr", "to": "int", "onError": -1}},
        "c": {"$convert": {"input": "$nul", "to": "int", "onNull": 0}},
        "d": {"$convert": {"input": "$nul", "to": "int", "onError": -1}},
        "e": {"$convert": {"input": "$pr", "to": "date"}},
        "f": {"$toString": {"$toLong": {"$floor": "$price"}}},
        "g": {"$isNumber": "$price"}, "h": {"$isNumber": "$pr"},
        "i": {"$isNumber": "$nul"},
        "j": {"$type": "$price"}, "k": {"$type": "$pr"},
        "l": {"$type": "$nul"}, "m": {"$type": "$id"},
    }}]).first()
    assert r.a == 1 and r.b == -1
    assert r.c == 0                    # onNull fires on null input
    assert r.d is None                 # onError does NOT fire on null
    assert r.e is None                 # date: null-on-unparseable
    assert r.f == "100"
    assert (r.g, r.h, r.i) == (True, False, False)
    assert (r.j, r.k, r.l, r.m) == ("double", "string", "null", "int")

    for bad, why in (
        ({"$convert": {"input": "$pr", "to": "decimal"}}, "refused"),
        ({"$convert": {"input": "$pr", "to": 8}}, "refused"),
        ({"$convert": {"input": "$pr"}}, "requires"),
        ({"$convert": {"input": "$pr", "to": "int", "zz": 1}}, "unknown"),
    ):
        with pytest.raises(ValueError, match=why):
            DOC.mongo_aggregate(df, [{"$project": {"z": bad}}])


def test_mongo_field_manipulation_and_trig(spark):
    """$setField/$unsetField (Mongo 5.0 struct-field manipulation →
    withField/dropFields), the $$REMOVE sentinel, $rand/$sample loud
    refusal (non-deterministic), and the trig surface vs Python's math
    module at 1e-12 relative tolerance (JVM libm vs CPython libm may
    differ in the last ulp — bit equality is NOT the contract here)."""
    import math

    df = spark.createDataFrame([(1, (2, "x"), 0.5)],
                               "id INT, s STRUCT<a INT, b STRING>, v DOUBLE")
    r = DOC.mongo_aggregate(df, [{"$project": {
        "set_new": {"$setField": {"field": "c", "input": "$s",
                                  "value": {"$add": ["$v", 1]}}},
        "set_old": {"$setField": {"field": "a", "input": "$s",
                                  "value": 9}},
        "rm": {"$setField": {"field": "b", "input": "$s",
                             "value": "$$REMOVE"}},
        "uns": {"$unsetField": {"field": "a", "input": "$s"}},
        "got": {"$getField": {"field": "a", "input": "$s"}},
    }}]).first()
    assert r.set_new.asDict() == {"a": 2, "b": "x", "c": 1.5}
    assert r.set_old.asDict() == {"a": 9, "b": "x"}
    assert r.rm.asDict() == {"a": 2}
    assert r.uns.asDict() == {"b": "x"}
    assert r.got == 2

    t = DOC.mongo_aggregate(df, [{"$project": {
        "s1": {"$sin": "$v"}, "c1": {"$cos": "$v"}, "t1": {"$tan": "$v"},
        "as1": {"$asin": "$v"}, "ac1": {"$acos": "$v"},
        "at1": {"$atan": "$v"}, "at2": {"$atan2": ["$v", 2.0]},
        "sh": {"$sinh": "$v"}, "ch": {"$cosh": "$v"},
        "th": {"$tanh": "$v"},
        "d2r": {"$degreesToRadians": 90},
        "r2d": {"$radiansToDegrees": {"$literal": 3.141592653589793}},
    }}]).first()
    for got, want in [
        (t.s1, math.sin(0.5)), (t.c1, math.cos(0.5)),
        (t.t1, math.tan(0.5)), (t.as1, math.asin(0.5)),
        (t.ac1, math.acos(0.5)), (t.at1, math.atan(0.5)),
        (t.at2, math.atan2(0.5, 2.0)), (t.sh, math.sinh(0.5)),
        (t.ch, math.cosh(0.5)), (t.th, math.tanh(0.5)),
        (t.d2r, math.radians(90)), (t.r2d, 180.0),
    ]:
        assert abs(got - want) <= 1e-12 * max(1.0, abs(want)), (got, want)

    for bad, pat in (
        ({"$rand": {}}, "refused"),
        ({"$sample": {"size": 3}}, "refused"),
        ({"$setField": {"field": "a", "input": "$s"}}, "value"),
        ({"$setField": {"field": "$a", "input": "$s", "value": 1}},
         "literal"),
        ({"$unsetField": {"field": "a", "input": "$s", "value": 1}},
         "does not take"),
        ({"$unsetField": {"field": "a"}}, "requires"),
    ):
        with pytest.raises(ValueError, match=pat):
            DOC.mongo_aggregate(df, [{"$project": {"z": bad}}])


def test_mongo_exp_moving_avg_null_partition(spark):
    """A null partitionBy value forms its own group (matching window
    partitionBy semantics) and survives the hash-batched shuffle key."""
    ev = spark.createDataFrame(
        [(None, 1, 2.0), (None, 2, 4.0), ("g", 1, 10.0)],
        "p STRING, t INT, v DOUBLE")
    res = DOC.mongo_aggregate(ev, [{"$setWindowFields": {
        "partitionBy": "$p", "sortBy": {"t": 1},
        "output": {"e": {"$expMovingAvg": {"input": "$v",
                                           "alpha": 0.5}}}}}])
    rows = {(r.p, r.t): r.e for r in res.collect()}
    assert rows[(None, 1)] == 2.0
    assert rows[(None, 2)] == 0.5 * 4.0 + 0.5 * 2.0
    assert rows[("g", 1)] == 10.0


def test_mongo_byte_lengths(spark):
    """$strLenBytes (UTF-8 bytes) vs $strLenCP (code points), and
    $binarySize over BinaryType payloads."""
    df = spark.createDataFrame([("héllo", bytearray(b"\x00\x01\x02"))],
                               "s STRING, b BINARY")
    r = DOC.mongo_aggregate(df, [{"$project": {
        "cp": {"$strLenCP": "$s"}, "by": {"$strLenBytes": "$s"},
        "bs": {"$binarySize": "$b"},
    }}]).first()
    assert r.cp == 5 and r.by == 6 and r.bs == 3


def test_mongo_update_many_review_fixes(spark):
    """Round-14 review fixes, pinned:

    1. $rename no-ops per document when the source is null/missing —
       the destination keeps its prior value (Mongo's rule; the first
       build nulled it).
    2. A statically-absent source column makes $rename a whole no-op,
       but paths stay claimed — conflicts raise regardless of field
       existence (so do missing-array $unset/$pull/$pop claims).
    3. $addToSet with a null value no-ops when null is already present
       (null-safe membership, not array_contains' NULL verdict).
    """
    df = spark.createDataFrame(
        [(1, "src1", "dst1", ["a", None]), (2, None, "dst2", ["a"])],
        "id INT, s STRING, d STRING, arr ARRAY<STRING>")
    out = {r.id: r for r in DOC.mongo_update_many(
        df, {}, {"$rename": {"s": "d"}}).collect()}
    assert out[1].d == "src1" and out[1].s is None
    assert out[2].d == "dst2" and out[2].s is None   # null source: no-op

    # statically-missing source: destination untouched everywhere
    out2 = {r.id: r for r in DOC.mongo_update_many(
        df, {}, {"$rename": {"ghost": "d"}}).collect()}
    assert out2[1].d == "dst1" and out2[2].d == "dst2"

    # conflicts raise even when one operator is a missing-field no-op
    for upd in (
        {"$unset": {"ghost": ""}, "$inc": {"ghost": 1}},
        {"$pop": {"ghostarr": 1}, "$push": {"ghostarr": "v"}},
        {"$rename": {"ghost": "d"}, "$set": {"d": "x"}},
    ):
        with pytest.raises(ValueError, match="conflict"):
            DOC.mongo_update_many(df, {}, upd)

    # $addToSet null needle: no-op when null present, append when not
    out3 = {r.id: r for r in DOC.mongo_update_many(
        df, {}, {"$addToSet": {"arr": None}}).collect()}
    assert out3[1].arr == ["a", None]
    assert out3[2].arr == ["a", None]


def test_mongo_ema_null_sortkey_and_isnumber_interval(spark):
    """The EMA kernel's sort must match the stage's window outputs:
    ascending sortBy puts null keys FIRST (BSON order), so a null-ts
    row is rn=1 and seeds the series. $isNumber must not match
    interval types via the 'int' prefix."""
    ev = spark.createDataFrame(
        [(1, None, 5.0), (1, 1, 1.0)], "u INT, t INT, v DOUBLE")
    res = {r.rn: r for r in DOC.mongo_aggregate(ev, [
        {"$setWindowFields": {
            "partitionBy": "$u", "sortBy": {"t": 1},
            "output": {
                "rn": {"$documentNumber": {}},
                "e": {"$expMovingAvg": {"input": "$v", "alpha": 0.5}},
            }}}]).collect()}
    assert res[1].t is None and res[1].e == 5.0      # null key sorts first
    assert res[2].e == 0.5 * 1.0 + 0.5 * 5.0

    df = spark.createDataFrame([(1,)], "x INT").selectExpr(
        "x", "INTERVAL '1' DAY AS iv")
    r = DOC.mongo_aggregate(df, [{"$project": {
        "n": {"$isNumber": "$iv"}, "ty": {"$type": "$iv"},
    }}]).first()
    assert r.n is False
    assert r.ty.startswith("interval")  # unmapped: raw Spark name


def test_mongo_advice_r14_fixes(spark):
    """The four r14 advisor findings, each pinned:

    (1) $addToSet's $each fold is LINEAR in expression size (the old
        when/otherwise fold re-embedded the accumulated expression
        ~3^n — a 60-value $each now compiles and runs instantly) with
        identical append-if-absent semantics, null included;
    (2) $convert to:'bool' / $toBool pin Mongo's string refusal:
        string→bool is unsupported there, so 'true' must NOT parse —
        without onError a non-null string raises, with onError EVERY
        string takes the onError value;
    (3) classic $min's null divergence is pinned: a matched row whose
        stored value is genuinely null takes the operand (null≈missing),
        unlike live Mongo where BSON order keeps the null ($max agrees
        in both systems);
    (4) helper-column prefixes are guarded up front: an input column
        starting with __upd_ / __swf_ gets a contract ValueError naming
        the reserved prefix, not a deep AnalysisException.
    """
    # (1) linear $addToSet — semantics on dup/null/absent + a big $each
    df = spark.createDataFrame(
        [(1, [1, 2, 2, None]), (2, None), (3, [5])],
        "id INT, a ARRAY<INT>")
    out = {r.id: r.a for r in DOC.mongo_update_many(
        df, {}, {"$addToSet": {"a": {"$each": [2, 7, 7, None, 1]}}}
    ).collect()}
    assert out[1] == [1, 2, 2, None, 7]   # existing dups kept; only 7 new
    assert out[2] == [2, 7, None, 1]      # null array: distinct of $each
    assert out[3] == [5, 2, 7, None, 1]
    big = DOC.mongo_update_many(
        df, {}, {"$addToSet": {"a": {"$each": list(range(64))}}})
    assert big.where("id = 3").first().a[:3] == [5, 0, 1]  # compiles + runs

    # (2) bool conversion string refusal
    sdf = spark.createDataFrame([("true",), ("abc",), (None,)], "s STRING")
    lenient = [r.b for r in DOC.mongo_aggregate(sdf, [{"$project": {
        "b": {"$convert": {"input": "$s", "to": "bool",
                           "onError": False}}}}]).collect()]
    assert lenient == [False, False, None]  # 'true' fires onError too
    with pytest.raises(Exception, match="unsupported in MongoDB"):
        DOC.mongo_aggregate(
            sdf, [{"$project": {"b": {"$toBool": "$s"}}}]).collect()
    ndf = spark.createDataFrame([(0,), (3,), (None,)], "n INT")
    assert [r.b for r in DOC.mongo_aggregate(ndf, [{"$project": {
        "b": {"$toBool": "$n"}}}]).collect()] == [False, True, None]

    # (3) $min null-value pinned divergence (and $max's agreement)
    mm = spark.createDataFrame(
        [(1, None), (2, 10.0)], "id INT, price DOUBLE")
    got = {r.id: r for r in DOC.mongo_update_many(
        mm, {}, {"$min": {"price": 5.0}}).collect()}
    assert got[1].price == 5.0   # null takes the operand — UNLIKE Mongo
    assert got[2].price == 5.0
    gmx = {r.id: r for r in DOC.mongo_update_many(
        mm, {}, {"$max": {"price": 5.0}}).collect()}
    assert gmx[1].price == 5.0 and gmx[2].price == 10.0  # Mongo agrees

    # (4) reserved-prefix guards
    with pytest.raises(ValueError, match="__upd_"):
        DOC.mongo_update_many(
            df.withColumnRenamed("a", "__upd_x"), {}, {"$set": {"id": 9}})
    with pytest.raises(ValueError, match="__swf_"):
        DOC.mongo_aggregate(
            df.withColumnRenamed("a", "__swf_x"),
            [{"$setWindowFields": {"sortBy": {"id": 1},
                                   "output": {"r": {"$rank": {}}}}}])


def test_update_min_null_value_pinned_divergence(spark):
    """Named pin the updateMany docstring points at: classic $min on a
    MATCHED row with a stored null takes the operand (least() ignores
    NULLs), whereas live Mongo's BSON order (null < all numbers) would
    keep the null. Unmatched null rows stay null — the divergence is
    scoped to matched rows only."""
    df = spark.createDataFrame(
        [(1, "O", None), (2, "F", None), (3, "O", 2.0)],
        "id INT, st STRING, v DOUBLE")
    rows = {r.id: r.v for r in DOC.mongo_update_many(
        df, {"st": "O"}, {"$min": {"v": 7.0}}).collect()}
    assert rows[1] == 7.0       # matched null → operand (pinned divergence)
    assert rows[2] is None      # unmatched: passthrough
    assert rows[3] == 2.0       # normal min


def test_ema_partition_row_guard(spark, monkeypatch):
    """EMA_MAX_PARTITION_ROWS converts the kernel's measured memory axis
    (SCALE.md twenty-first probe: ×7.3 wall at 4M rows/partition) into a
    fail-fast naming the bound and the pre-split escape hatch — the
    house 10k-transcripts-per-gene convention. The bound is read at
    plan-construction time, so monkeypatching the module constant
    exercises the exact production code path at test scale."""
    monkeypatch.setattr(DOC, "EMA_MAX_PARTITION_ROWS", 3)
    df = spark.createDataFrame(
        [(1, i, float(i)) for i in range(5)], "u INT, t INT, v DOUBLE")
    stage = [{"$setWindowFields": {
        "partitionBy": "$u", "sortBy": {"t": 1},
        "output": {"e": {"$expMovingAvg": {"input": "$v", "N": 3}}}}}]
    with pytest.raises(Exception, match="EMA_MAX_PARTITION_ROWS"):
        DOC.mongo_aggregate(df, stage).collect()
    # under the bound the same plan shape runs
    monkeypatch.setattr(DOC, "EMA_MAX_PARTITION_ROWS", 5)
    vals = [round(r.e, 4) for r in
            DOC.mongo_aggregate(df, stage).orderBy("t").collect()]
    assert vals == [0.0, 0.5, 1.25, 2.125, 3.0625]


def test_mongo_range_window_time_unit(spark):
    """$setWindowFields range windows with a FIXED-LENGTH time unit
    compile onto a numeric rangeBetween over wall-clock epoch
    milliseconds (TZ-pinned: the NTZ path uses timestampdiff from the
    epoch wall clock, no session timezone anywhere). Hand-computed
    3-day trailing frames; calendar units and non-date sort keys are
    refused loudly; 'unbounded'/'current' sentinels pass unscaled."""
    import datetime as dt

    rows = [(1, dt.datetime(2020, 1, d + 1), float(d + 1))
            for d in range(6)]
    # gap: a seventh row 10 days later sees only itself in a 3-day frame
    rows.append((1, dt.datetime(2020, 1, 17), 100.0))
    tdf = spark.createDataFrame(rows, "k INT, ts TIMESTAMP_NTZ, v DOUBLE")
    out = DOC.mongo_aggregate(tdf, [{"$setWindowFields": {
        "partitionBy": "$k", "sortBy": {"ts": 1},
        "output": {
            "s": {"$sum": "$v", "window": {"range": [-2, 0], "unit": "day"}},
            "c": {"$count": {}, "window": {"range": [-2, 0], "unit": "day"}},
            "run": {"$sum": "$v",
                    "window": {"range": ["unbounded", "current"],
                               "unit": "day"}},
        }}}]).orderBy("ts").collect()
    assert [(r.s, r.c) for r in out] == [
        (1.0, 1), (3.0, 2), (6.0, 3), (9.0, 3), (12.0, 3), (15.0, 3),
        (100.0, 1),
    ]
    assert [r.run for r in out] == [1.0, 3.0, 6.0, 10.0, 15.0, 21.0, 121.0]

    # hour unit over the same column (finer grain, same machinery)
    h = DOC.mongo_aggregate(tdf, [{"$setWindowFields": {
        "partitionBy": "$k", "sortBy": {"ts": 1},
        "output": {"c": {"$count": {},
                         "window": {"range": [-25, 0], "unit": "hour"}}},
    }}]).orderBy("ts").collect()
    assert [r.c for r in h] == [1, 2, 2, 2, 2, 2, 1]

    # calendar units route to the frame-anchor join since round 15
    # (test_mongo_calendar_unit_range_windows pins those semantics) —
    # here just the seam: a month window computes on the same frame,
    # and a unit that exists in NEITHER table still refuses loudly
    m = DOC.mongo_aggregate(tdf, [{"$setWindowFields": {
        "partitionBy": "$k", "sortBy": {"ts": 1},
        "output": {"c": {"$count": {},
                         "window": {"range": [-1, 0],
                                    "unit": "month"}}}}}]) \
        .orderBy("ts").collect()
    assert [r.c for r in m] == [1, 2, 3, 4, 5, 6, 7]  # all within 1 month
    with pytest.raises(ValueError, match="refused"):
        DOC.mongo_aggregate(tdf, [{"$setWindowFields": {
            "sortBy": {"ts": 1},
            "output": {"s": {"$sum": "$v",
                             "window": {"range": [-1, 0],
                                        "unit": "fortnight"}}}}}])
    idf = spark.createDataFrame([(1, 1.0)], "t INT, v DOUBLE")
    with pytest.raises(ValueError, match="date/timestamp"):
        DOC.mongo_aggregate(idf, [{"$setWindowFields": {
            "sortBy": {"t": 1},
            "output": {"s": {"$sum": "$v",
                             "window": {"range": [-1, 0],
                                        "unit": "day"}}}}}])
    with pytest.raises(ValueError, match="single ascending"):
        DOC.mongo_aggregate(tdf, [{"$setWindowFields": {
            "sortBy": {"ts": -1},
            "output": {"s": {"$sum": "$v",
                             "window": {"range": [-1, 0],
                                        "unit": "day"}}}}}])


def test_mongo_push_modifiers(spark):
    """$push $each+$position/$sort/$slice (previously a documented
    refusal — VERDICT r14 'what's missing' #3): Mongo's pinned apply
    order is insert-at-$position, $sort the WHOLE array, $slice the
    WHOLE array. Covers: positional insert (head / negative / beyond
    length), asc+desc sorts with null placement (BSON: null lowest —
    asc first, desc last), positive/negative/zero slice, the classic
    capped-array idiom ($each + $slice: -n), modifier application on
    created-from-missing arrays, and the empty-$each maintenance form
    (sort/slice an existing array without appending)."""
    df = spark.createDataFrame(
        [(1, [5, 1, None, 3]), (2, None)], "id INT, a ARRAY<INT>")

    # $position: head insert, negative (from end), beyond-length clamp
    r = {x.id: x.a for x in DOC.mongo_update_many(
        df, {}, {"$push": {"a": {"$each": [9, 8], "$position": 0}}}
    ).collect()}
    assert r[1] == [9, 8, 5, 1, None, 3]
    assert r[2] == [9, 8]                      # created from $each
    r = {x.id: x.a for x in DOC.mongo_update_many(
        df, {}, {"$push": {"a": {"$each": [9], "$position": -1}}}
    ).collect()}
    assert r[1] == [5, 1, None, 9, 3]
    r = {x.id: x.a for x in DOC.mongo_update_many(
        df, {}, {"$push": {"a": {"$each": [9], "$position": 100}}}
    ).collect()}
    assert r[1] == [5, 1, None, 3, 9]          # clamps to append
    r = {x.id: x.a for x in DOC.mongo_update_many(
        df, {}, {"$push": {"a": {"$each": [9], "$position": -100}}}
    ).collect()}
    assert r[1] == [9, 5, 1, None, 3]          # clamps to head

    # $sort with nulls: asc → null first, desc → null last (BSON order)
    r = {x.id: x.a for x in DOC.mongo_update_many(
        df, {}, {"$push": {"a": {"$each": [2], "$sort": 1}}}).collect()}
    assert r[1] == [None, 1, 2, 3, 5]
    r = {x.id: x.a for x in DOC.mongo_update_many(
        df, {}, {"$push": {"a": {"$each": [2], "$sort": -1}}}).collect()}
    assert r[1] == [5, 3, 2, 1, None]

    # $slice: positive head, negative tail (capped array), zero empties;
    # tail slice larger than the array keeps everything
    r = {x.id: x.a for x in DOC.mongo_update_many(
        df, {}, {"$push": {"a": {"$each": [7], "$slice": 2}}}).collect()}
    assert r[1] == [5, 1] and r[2] == [7]
    r = {x.id: x.a for x in DOC.mongo_update_many(
        df, {}, {"$push": {"a": {"$each": [7], "$slice": -3}}}).collect()}
    assert r[1] == [None, 3, 7]                # last 3 after append
    assert r[2] == [7]                         # created array < |slice|
    r = {x.id: x.a for x in DOC.mongo_update_many(
        df, {}, {"$push": {"a": {"$each": [7], "$slice": 0}}}).collect()}
    assert r[1] == [] and r[2] == []

    # combined, Mongo's order: insert at 0 → sort asc → keep first 3
    r = {x.id: x.a for x in DOC.mongo_update_many(
        df, {},
        {"$push": {"a": {"$each": [4, 0], "$position": 0, "$sort": 1,
                         "$slice": 3}}}).collect()}
    assert r[1] == [None, 0, 1] and r[2] == [0, 4]

    # capped-array idiom on a matched subset; unmatched rows untouched
    r = {x.id: x.a for x in DOC.mongo_update_many(
        df, {"id": 1},
        {"$push": {"a": {"$each": [10], "$sort": -1, "$slice": -2}}}
    ).collect()}
    assert r[1] == [1, None] and r[2] is None

    # empty $each: pure maintenance (sort+slice existing, no append) —
    # and a missing/null array stays an empty creation
    r = {x.id: x.a for x in DOC.mongo_update_many(
        df, {}, {"$push": {"a": {"$each": [], "$sort": 1, "$slice": 2}}}
    ).collect()}
    assert r[1] == [None, 1]
    assert r[2] == []


def test_mongo_densify_time_units(spark):
    """$densify date grids (Mongo's unit form — round 15, previously a
    loud refusal): fixed-length units compile onto the integer grid
    machinery over TZ-free wall-clock epoch ms. Covers partition/full/
    explicit-ISO bounds (half-open), generated-doc null fields,
    exact-value suppression, the DATE-field day grid, and the refusal
    matrix (calendar units, sub-day grid on DATE, tz-aware bounds,
    non-date field)."""
    import datetime as dt

    rows = [("a", dt.datetime(2020, 1, 1), 1.0),
            ("a", dt.datetime(2020, 1, 4), 2.0),
            ("b", dt.datetime(2020, 1, 2), 3.0)]
    df = spark.createDataFrame(rows, "k STRING, ts TIMESTAMP_NTZ, v DOUBLE")

    out = DOC.mongo_aggregate(df, [{"$densify": {
        "field": "ts", "partitionByFields": ["k"],
        "range": {"step": 1, "unit": "day", "bounds": "partition"}}}])
    got = sorted((x.k, str(x.ts), x.v) for x in out.collect())
    assert got == [
        ("a", "2020-01-01 00:00:00", 1.0),
        ("a", "2020-01-02 00:00:00", None),   # generated: null fields
        ("a", "2020-01-03 00:00:00", None),
        ("a", "2020-01-04 00:00:00", 2.0),    # existing, suppressed grid
        ("b", "2020-01-02 00:00:00", 3.0),    # single-doc partition: no grid
    ]

    # full bounds: partition b grids over the GLOBAL [min, max]
    full = DOC.mongo_aggregate(df, [{"$densify": {
        "field": "ts", "partitionByFields": ["k"],
        "range": {"step": 1, "unit": "day", "bounds": "full"}}}])
    assert sum(1 for x in full.collect() if x.k == "b") == 4  # Jan 1-4

    # explicit ISO bounds are half-open; 12 h sub-day grid
    ex = DOC.mongo_aggregate(df, [{"$densify": {
        "field": "ts", "partitionByFields": ["k"],
        "range": {"step": 12, "unit": "hour",
                  "bounds": ["2020-01-01", "2020-01-02"]}}}])
    b_rows = sorted(str(x.ts) for x in ex.collect() if x.k == "b")
    assert b_rows == ["2020-01-01 00:00:00", "2020-01-01 12:00:00",
                      "2020-01-02 00:00:00"]  # 01-02T00 is b's OWN doc

    # DATE field with a day grid round-trips through pure calendar math
    ddf = spark.createDataFrame(
        [(dt.date(2020, 1, 1),), (dt.date(2020, 1, 3),)], "d DATE")
    dg = DOC.mongo_aggregate(ddf, [{"$densify": {
        "field": "d", "range": {"step": 1, "unit": "day",
                                "bounds": "partition"}}}])
    assert sorted(str(x.d) for x in dg.collect()) == [
        "2020-01-01", "2020-01-02", "2020-01-03"]

    with pytest.raises(ValueError, match="calendar-variable"):
        DOC.mongo_aggregate(df, [{"$densify": {
            "field": "ts", "range": {"step": 1, "unit": "quarter",
                                     "bounds": "partition"}}}])
    with pytest.raises(ValueError, match="DATE field requires"):
        DOC.mongo_aggregate(ddf, [{"$densify": {
            "field": "d", "range": {"step": 6, "unit": "hour",
                                    "bounds": "partition"}}}])
    with pytest.raises(ValueError, match="timezone-aware"):
        DOC.mongo_aggregate(df, [{"$densify": {
            "field": "ts",
            "range": {"step": 1, "unit": "day",
                      "bounds": ["2020-01-01T00:00:00+09:30",
                                 "2020-01-02"]}}}])
    ndf = spark.createDataFrame([(1,)], "x INT")
    with pytest.raises(ValueError, match="date/timestamp"):
        DOC.mongo_aggregate(ndf, [{"$densify": {
            "field": "x", "range": {"step": 1, "unit": "day",
                                    "bounds": "partition"}}}])


def test_mongo_calculus_time_units(spark):
    """$derivative/$integral with a fixed-length time unit (round 15,
    previously refused): the sort key becomes epoch-ms scaled to
    unit-count doubles, formulas unchanged. Hand-computed: rate per
    hour over adjacent pairs, trapezoid area in day units; calendar
    units refused."""
    import datetime as dt

    tdf = spark.createDataFrame(
        [(dt.datetime(2020, 1, 1, 0), 10.0),
         (dt.datetime(2020, 1, 1, 6), 22.0),
         (dt.datetime(2020, 1, 2, 0), 40.0)],
        "ts TIMESTAMP_NTZ, v DOUBLE")
    out = DOC.mongo_aggregate(tdf, [{"$setWindowFields": {
        "sortBy": {"ts": 1},
        "output": {
            "rate_h": {"$derivative": {"input": "$v", "unit": "hour"},
                       "window": {"documents": [-1, 0]}},
            "area_d": {"$integral": {"input": "$v", "unit": "day"}},
        }}}]).orderBy("ts").collect()
    assert [r.rate_h for r in out] == [None, 2.0, 1.0]
    # trapezoids: 0.25 d × (10+22)/2 = 4.0; 0.75 d × (22+40)/2 = 23.25
    assert [r.area_d for r in out] == [27.25, 27.25, 27.25]

    with pytest.raises(ValueError, match="calendar-variable"):
        DOC.mongo_aggregate(tdf, [{"$setWindowFields": {
            "sortBy": {"ts": 1},
            "output": {"r": {"$derivative": {"input": "$v",
                                             "unit": "month"}}}}}])


def test_densify_reserved_prefix_guard(spark):
    """__dens_ joins the guarded helper prefixes (__upd_/__swf_): a
    colliding input column gets a contract error, not a duplicate-
    column AnalysisException from inside the grid staging."""
    df = spark.createDataFrame([(1, 2)], "x INT, __dens_v INT")
    with pytest.raises(ValueError, match="__dens_"):
        DOC.mongo_aggregate(df, [{"$densify": {
            "field": "x", "range": {"step": 1, "bounds": "partition"}}}])


def test_fill_linear_date_sortby(spark):
    """$fill linear with a DATE/timestamp sortBy (Mongo allows both
    numeric and date keys): the key routes through the TZ-free epoch-ms
    map; interpolation ratios are scale-invariant, so results equal the
    hand-computed time-weighted values. Edge nulls stay null (no
    extrapolation) — same contract as the numeric path."""
    import datetime as dt

    df = spark.createDataFrame(
        [(dt.datetime(2020, 1, 1), None),
         (dt.datetime(2020, 1, 2), 10.0),
         (dt.datetime(2020, 1, 3), None),
         (dt.datetime(2020, 1, 5), None),
         (dt.datetime(2020, 1, 6), 50.0),
         (dt.datetime(2020, 1, 8), None)],
        "ts TIMESTAMP_NTZ, v DOUBLE")
    out = DOC.mongo_aggregate(df, [{"$fill": {
        "sortBy": {"ts": 1}, "output": {"v": {"method": "linear"}}}}])
    got = [r.v for r in out.orderBy("ts").collect()]
    # anchors at Jan 2 (10) and Jan 6 (50): Jan 3 = 10 + 40*(1/4) = 20,
    # Jan 5 = 10 + 40*(3/4) = 40; outside the anchors stays null
    assert got == [None, 10.0, 20.0, 40.0, 50.0, None]


def test_mongo_calendar_unit_range_windows(spark):
    """Calendar-unit range windows (month/quarter/year — round 15,
    previously refused): compiled as the frame-anchor range join
    (documents._calendar_range_join) because the boundaries are
    per-document $dateAdd results. Pins: day-of-month clamping
    (Mar 31 − 1 month = Feb 29 in 2020, so the Feb 29 doc IS in
    Mar 31's trailing-month frame), mixed-sentinel bounds, empty
    frames (SUM→NULL, COUNT→0), null-sort-key empty frame, value-tied
    keys sharing one frame, the DATE-dtype path, coexistence with
    plain window outputs in one stage, and the refusal matrix."""
    import datetime as dt

    rows = [
        (1, dt.datetime(2020, 1, 31), 10.0),
        (1, dt.datetime(2020, 2, 29), 20.0),
        (1, dt.datetime(2020, 3, 31), 30.0),
        (1, dt.datetime(2020, 6, 15), 40.0),
        (2, dt.datetime(2020, 1, 10), 5.0),
        (2, None, 7.0),
    ]
    df = spark.createDataFrame(rows, "k INT, ts TIMESTAMP_NTZ, v DOUBLE")
    out = DOC.mongo_aggregate(df, [{"$setWindowFields": {
        "partitionBy": "$k", "sortBy": {"ts": 1},
        "output": {
            "s1m": {"$sum": "$v",
                    "window": {"range": [-1, 0], "unit": "month"}},
            "c1m": {"$count": {},
                    "window": {"range": [-1, 0], "unit": "month"}},
            "prior_q": {"$sum": "$v",
                        "window": {"range": ["unbounded", -1],
                                   "unit": "quarter"}},
            "rn": {"$documentNumber": {}},     # plain output coexists
        }}}])
    got = {(r.k, str(r.ts)): (r.s1m, r.c1m, r.prior_q)
           for r in out.collect()}
    assert got[(1, "2020-01-31 00:00:00")] == (10.0, 1, None)
    assert got[(1, "2020-02-29 00:00:00")] == (30.0, 2, None)
    # clamping: Mar 31 − 1 month → Feb 29, frame holds Feb 29 + Mar 31
    assert got[(1, "2020-03-31 00:00:00")] == (50.0, 2, None)
    # quarter sentinel mix: ≤ Mar 15 → Jan 31 + Feb 29 docs
    assert got[(1, "2020-06-15 00:00:00")] == (40.0, 1, 30.0)
    assert got[(2, "2020-01-10 00:00:00")] == (5.0, 1, None)
    # null sort key: EMPTY frame (pinned) — SUM null, COUNT 0
    assert got[(2, "None")] == (None, 0, None)

    # value-tied keys share one frame; empty far-past frame
    tie = spark.createDataFrame(
        [(dt.datetime(2021, 5, 1), 1.0), (dt.datetime(2021, 5, 1), 2.0),
         (dt.datetime(2021, 6, 1), 4.0)], "ts TIMESTAMP_NTZ, v DOUBLE")
    t = DOC.mongo_aggregate(tie, [{"$setWindowFields": {
        "sortBy": {"ts": 1},
        "output": {
            "s": {"$sum": "$v", "window": {"range": [0, 0],
                                           "unit": "month"}},
            "old": {"$sum": "$v", "window": {"range": [-24, -12],
                                             "unit": "month"}},
            "oldc": {"$count": {}, "window": {"range": [-24, -12],
                                              "unit": "month"}},
        }}}]).orderBy("ts", "v").collect()
    assert [r.s for r in t] == [3.0, 3.0, 4.0]   # tied keys: same frame
    assert [r.old for r in t] == [None, None, None]
    assert [r.oldc for r in t] == [0, 0, 0]

    # DATE dtype path (add_months arithmetic)
    ddf = spark.createDataFrame(
        [(dt.date(2020, 1, 31), 1.0), (dt.date(2020, 2, 29), 2.0)],
        "d DATE, v DOUBLE")
    dd = DOC.mongo_aggregate(ddf, [{"$setWindowFields": {
        "sortBy": {"d": 1},
        "output": {"s": {"$sum": "$v",
                         "window": {"range": [-1, 0],
                                    "unit": "month"}}}}}]) \
        .orderBy("d").collect()
    assert [r.s for r in dd] == [1.0, 3.0]

    # refusals: order-dependent ops, numeric key, fractional bound
    with pytest.raises(ValueError, match="documents window"):
        DOC.mongo_aggregate(tie, [{"$setWindowFields": {
            "sortBy": {"ts": 1},
            "output": {"p": {"$push": "$v",
                             "window": {"range": [-1, 0],
                                        "unit": "month"}}}}}])
    ndf = spark.createDataFrame([(1, 1.0)], "t INT, v DOUBLE")
    with pytest.raises(ValueError, match="date/timestamp"):
        DOC.mongo_aggregate(ndf, [{"$setWindowFields": {
            "sortBy": {"t": 1},
            "output": {"s": {"$sum": "$v",
                             "window": {"range": [-1, 0],
                                        "unit": "year"}}}}}])
    with pytest.raises(ValueError, match="unbounded"):
        DOC.mongo_aggregate(tie, [{"$setWindowFields": {
            "sortBy": {"ts": 1},
            "output": {"s": {"$sum": "$v",
                             "window": {"range": [-1.5, 0],
                                        "unit": "month"}}}}}])
