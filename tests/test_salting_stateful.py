"""Salted aggregation equivalence + custom stateful streaming operator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gramene_mongodb_spark.io import load_table
from gramene_mongodb_spark.operators.relational import salted_aggregate
from gramene_mongodb_spark.streaming import stateful, windows as SW


def test_salted_aggregate_matches_plain(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    plain = {
        r.o_custkey: (r.n, round(r.total, 6), r.mx)
        for r in orders.groupBy("o_custkey")
        .agg(
            F.count("o_orderkey").alias("n"),
            F.sum("o_totalprice").alias("total"),
            F.max("o_orderdate").alias("mx"),
        )
        .collect()
    }
    salted = {
        r.o_custkey: (r.n, round(r.total, 6), r.mx)
        for r in salted_aggregate(
            orders,
            ["o_custkey"],
            [
                ("o_orderkey", "count", "n"),
                ("o_totalprice", "sum", "total"),
                ("o_orderdate", "max", "mx"),
            ],
            salt_buckets=8,
        ).collect()
    }
    assert salted == plain


def test_salted_aggregate_rejects_nondecomposable(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    with pytest.raises(ValueError):
        salted_aggregate(orders, ["o_custkey"], [("o_totalprice", "avg", "a")])


def test_stateful_running_profiles(spark, sf_dir, tmp_path):
    src = str(tmp_path / "events")
    # cap to a few users: per-key python state workers dominate runtime
    subset = load_table(spark, sf_dir, "events").filter("user_id < 12").coalesce(2)
    subset.write.parquet(src)
    stream = SW.read_events_stream(spark, src)
    q = (
        stateful.running_user_profiles(stream, expire_idle_ms=None)
        .writeStream.format("memory")
        .queryName("profiles_t")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()
    got = {
        r.user_id: r
        for r in spark.sql(
            # update mode appends a row per (batch, user); keep the last
            "SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY user_id "
            "ORDER BY n_events DESC) rn FROM profiles_t) WHERE rn = 1"
        ).collect()
    }
    batch = {
        r.user_id: (r.n, round(r.total, 6))
        for r in load_table(spark, sf_dir, "events")
        .filter("user_id < 12")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert set(got) == set(batch)
    for uid, (n, total) in batch.items():
        assert got[uid].n_events == n
        assert round(got[uid].total_value, 6) == pytest.approx(total, abs=1e-4)
