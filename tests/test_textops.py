"""Unit tests for text-analysis extensions (boilerplate detection, PII
scan) on hand-built fixtures; the documents-table paths are covered by
the oracle parity suite (x_text_stats / x_boilerplate_shingles / …)."""

from __future__ import annotations

from gramene_mongodb_spark.operators import textops as T


def test_boilerplate_shingles_finds_repeated_span(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "intro text the quick brown fox jumps again"),
            (3, "completely different words here entirely now"),
            (4, "tiny doc"),  # shorter than n → contributes nothing
        ],
        "doc_id LONG, text STRING",
    )
    out = {r.gram: r.df for r in T.boilerplate_shingles(df, n=5, min_docs=2).collect()}
    assert out == {"the quick brown fox jumps": 2}


def test_boilerplate_shingles_dedups_within_doc(spark):
    # the same 2-gram repeated inside ONE doc must count that doc once
    df = spark.createDataFrame(
        [(1, "ha ha ha ha"), (2, "ha ha only")],
        "doc_id LONG, text STRING",
    )
    out = {r.gram: r.df for r in T.boilerplate_shingles(df, n=2, min_docs=2).collect()}
    assert out == {"ha ha": 2}


def test_pii_scan_counts_patterns(spark):
    df = spark.createDataFrame(
        [
            (1, "contact alice@example.com or bob@test.org today"),
            (2, "call 555-123-4567 about ssn 123-45-6789"),
            (3, "nothing sensitive here"),
        ],
        "doc_id LONG, text STRING",
    )
    rows = {r.doc_id: r for r in T.pii_scan(df).collect()}
    assert rows[1].n_email == 2 and rows[1].n_pii_total == 2
    assert rows[2].n_phone == 1 and rows[2].n_ssn_like == 1
    assert rows[2].n_pii_total == 2
    assert rows[3].n_pii_total == 0


def test_pii_scan_is_jvm_only(spark):
    df = spark.createDataFrame([(1, "x@y.io")], "doc_id LONG, text STRING")
    out = T.pii_scan(df)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
