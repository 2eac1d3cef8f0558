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


def test_deterministic_sample_full_rate_keeps_everything(spark):
    """Regression: rate=1.0 must be all-pass — format(256,'02x')='100'
    compares LOWER than most hex pairs and used to drop nearly all rows."""
    from gramene_mongodb_spark.operators.relational import deterministic_sample

    df = spark.createDataFrame([(i,) for i in range(200)], "id LONG")
    assert deterministic_sample(df, "id", 1.0).count() == 200
    assert deterministic_sample(df, "id", 0.0).count() == 0


def test_deterministic_sample_by_respects_strata_rates(spark):
    from gramene_mongodb_spark.operators.relational import (
        deterministic_sample,
        deterministic_sample_by,
    )

    rows = [(i, "en" if i % 2 == 0 else "zh") for i in range(400)]
    df = spark.createDataFrame(rows, "id LONG, lang STRING")
    out = deterministic_sample_by(df, "id", "lang", {"en": 0.25, "zh": 1.0})
    got = {r.lang: r.n for r in out.groupBy("lang").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    assert got["zh"] == 200                      # rate 1.0: all kept
    assert 20 <= got["en"] <= 80                 # ~25% of 200, hash variance
    # per-stratum selection == single-rate selection restricted to the stratum
    en_only = deterministic_sample(df.filter("lang = 'en'"), "id", 0.25)
    assert {r.id for r in out.filter("lang='en'").collect()} == {
        r.id for r in en_only.collect()
    }
