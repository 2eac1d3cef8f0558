"""Every oracle-backed catalog query must hash-match DuckDB at sf0.001 —
the local twin of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from gramene_mongodb_spark.catalog import REGISTRY

from tests.oracle import compare

ORACLE_BACKED = sorted(n for n, s in REGISTRY.items() if s.oracle)
ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if not s.oracle)


@pytest.mark.parametrize("name", ORACLE_BACKED)
def test_oracle_parity(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    ok, msg = compare(df, spec.oracle, sf_dir)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_dir, name):
    df = REGISTRY[name].fn(spark, sf_dir)
    assert df.count() >= 0


def test_approx_aggregates_error_bounds(spark, sf_dir):
    """The differential gate's boolean must actually be computed from the
    sketches: every group reports approx_within_5pct=True (the oracle
    emits literal TRUE, so a sketch drifting past 5% turns the driver row
    red), and the exact counts match an independent exact aggregation."""
    from pyspark.sql import functions as F

    from gramene_mongodb_spark.catalog import REGISTRY
    from gramene_mongodb_spark.io import load_table

    got = {
        r.o_orderpriority: r
        for r in REGISTRY["a_approx_aggregates"].fn(spark, sf_dir).collect()
    }
    exact = {
        r.o_orderpriority: r.n
        for r in load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert got.keys() == exact.keys()
    for k, n in exact.items():
        assert got[k].exact_customers == n, k
        assert got[k].approx_within_5pct is True, k
