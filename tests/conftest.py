from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # keep test JVM small

SF_SMOKE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def pytest_collection_modifyitems(config, items):
    """Opt-in test sharding without pytest-xdist (not in this sandbox):
    PYTEST_SHARD="i/n" keeps only items whose stable nodeid hash ≡ i
    (mod n). scripts/test_shards.sh uses it to split the long-pole
    Hypothesis suite across two parallel processes; the union of shards
    0..n-1 is exactly the full collection."""
    shard = os.environ.get("PYTEST_SHARD")
    if not shard:
        return
    import zlib

    idx, n = (int(x) for x in shard.split("/"))
    keep, drop = [], []
    for it in items:
        (keep if zlib.crc32(it.nodeid.encode()) % n == idx else drop).append(it)
    if drop:
        config.hook.pytest_deselected(items=drop)
        items[:] = keep


@pytest.fixture(scope="session")
def spark():
    from gramene_mongodb_spark.session import get_spark

    s = get_spark("gramene-spark-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
