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
