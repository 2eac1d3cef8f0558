"""Timestamp-flavor property tests: sessionize / as-of / windows must
produce IDENTICAL results whether the time column arrives as
TIMESTAMP_NTZ (what parquet timestamp[us] reads as), TIMESTAMP_LTZ, or
raw epoch seconds (BIGINT).

Why this exists: the round-3 testdata regeneration silently flipped
events.ts from long nanos to timestamp[us] (TIMESTAMP_NTZ) and broke
sessionize/as-of AND the whole bench run (BENCH_r03 rc=1). These tests
pin every flavor to one oracle so a representation change can't break
the operators a third time.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from gramene_mongodb_spark.operators import relational as R

# (user_id, event_id, epoch_s, value) — gaps engineered around the 1800 s
# boundary: 1800 exactly = SAME session (gap test is strict >), 1801 = new
GAP_EVENTS = [
    (1, 1, 10_000, 5.0),
    (1, 2, 11_800, 1.0),   # +1800 → same session
    (1, 3, 13_601, 2.0),   # +1801 → new session
    (1, 4, 13_601, 3.0),   # duplicate ts → tiebreak on event_id
    (2, 5, 10_000, 7.0),
    (2, 6, 99_000, 8.0),   # far gap → new session
    (3, 7, 50_000, 9.0),   # singleton user
]


def _flavored(spark, rows, flavor: str, ts_col: str = "ts"):
    df = spark.createDataFrame(
        rows, "user_id LONG, event_id LONG, epoch_s LONG, value DOUBLE"
    )
    if flavor == "long":
        expr = F.col("epoch_s")
    elif flavor == "ltz":
        expr = F.timestamp_seconds(F.col("epoch_s"))
    elif flavor == "ntz":
        expr = F.timestamp_seconds(F.col("epoch_s")).cast("timestamp_ntz")
    else:
        raise ValueError(flavor)
    return df.withColumn(ts_col, expr).drop("epoch_s")


FLAVORS = ["ntz", "ltz", "long"]


@pytest.mark.parametrize("flavor", FLAVORS)
def test_sessionize_flavor_invariant(spark, flavor):
    df = _flavored(spark, GAP_EVENTS, flavor)
    dt = dict(df.dtypes)["ts"]
    expected_dt = {"ntz": "timestamp_ntz", "ltz": "timestamp", "long": "bigint"}[flavor]
    assert dt == expected_dt  # the fixture really exercises three storage types
    got = {
        r.event_id: r.session_id
        for r in R.sessionize(df, ["user_id"], "ts", 1800, tiebreak=["event_id"]).collect()
    }
    # oracle (hand-derived): 1800 s gap keeps the session, 1801 s breaks it
    assert got == {1: 0, 2: 0, 3: 1, 4: 1, 5: 0, 6: 1, 7: 0}


@pytest.mark.parametrize("flavor", FLAVORS)
def test_asof_join_flavor_invariant(spark, flavor):
    clicks = _flavored(
        spark,
        [(1, 10, 1_000, 0.0), (1, 11, 2_000, 0.0), (2, 12, 5_000, 0.0)],
        flavor,
    ).select("user_id", F.col("event_id").alias("click_id"), "ts")
    views = _flavored(
        spark,
        [(1, 20, 900, 1.5), (1, 21, 2_000, 2.5), (2, 22, 6_000, 3.5)],
        flavor,
    ).select("user_id", "ts", "value")

    back = {
        r.click_id: r.value_asof
        for r in R.asof_join(clicks, views, ["user_id"], direction="backward").collect()
    }
    assert back == {10: 1.5, 11: 2.5, 12: None}  # equal ts matches; no future rows

    fwd = {
        r.click_id: r.value_asof
        for r in R.asof_join(clicks, views, ["user_id"], direction="forward").collect()
    }
    assert fwd == {10: 2.5, 11: 2.5, 12: 3.5}


@pytest.mark.parametrize("flavor", ["ntz", "ltz"])
def test_tumbling_window_flavor_invariant(spark, flavor):
    # F.window needs a timestamp type; both flavors must bucket identically
    df = _flavored(spark, GAP_EVENTS, flavor)
    got = {
        (r.user_id, r.w_start_s): r.n
        for r in df.groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.col("w.start").cast("timestamp_ntz").cast("string").alias("w_start_s"),
            "n",
        )
        .collect()
    }
    # 10_000 // 3600 = hour 2, 11_800 → hour 3, 13_601 → hour 3, ...
    assert sum(got.values()) == len(GAP_EVENTS)
    assert got[(1, "1970-01-01 02:00:00")] == 1
    assert got[(1, "1970-01-01 03:00:00")] == 3


def test_a3_catalog_query_is_flavor_stable(spark, sf_dir):
    """The oracle-gated a3 aggregation (epoch-second BIGINT start,
    BIGINT-micros value) must return bit-identical rows when events.ts
    is presented as NTZ vs LTZ — i.e. nothing in the output depends on
    the storage flavor or the session timezone."""
    from gramene_mongodb_spark.io import load_table

    ev = load_table(spark, sf_dir, "events")

    def run(ev_df):
        s = R.sessionize(ev_df, ["user_id"], "ts", 1800, tiebreak=["event_id"])
        if dict(ev_df.dtypes)["ts"] == "timestamp_ntz":
            start_s = F.expr(
                "timestampdiff(SECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00',"
                " date_trunc('second', min(ts)))"
            )
        else:
            start_s = F.unix_timestamp(F.date_trunc("second", F.min("ts")))
        return {
            (r.user_id, r.session_id): (r.n_events, r.session_start_s, r.v)
            for r in s.groupBy("user_id", "session_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                start_s.cast("long").alias("session_start_s"),
                (F.sum(F.col("value").cast("decimal(18,6)")) * 1000000)
                .cast("long")
                .alias("v"),
            )
            .collect()
        }

    flavors = {dict(ev.dtypes)["ts"]}
    as_ntz = run(ev.withColumn("ts", F.col("ts").cast("timestamp_ntz")))
    as_ltz = run(ev.withColumn("ts", F.col("ts").cast("timestamp")))
    assert as_ntz == as_ltz
    assert len(flavors) == 1  # sanity: load_table yields one canonical flavor


def test_k6_w2_epoch_is_session_tz_independent(spark, sf_dir):
    """Regression (round-5 cross-TZ sweep): NTZ date columns must never
    reach epoch seconds via cast(timestamp)->cast(long) — that detours
    through the session timezone. Values must be identical under any TZ."""
    from gramene_mongodb_spark.catalog import REGISTRY

    def run(name):
        return sorted(tuple(r) for r in REGISTRY[name].fn(spark, sf_dir).collect())

    base_tz = spark.conf.get("spark.sql.session.timeZone")
    baseline = {n: run(n) for n in ("k6_merge_order_windows", "w2_genes_between")}
    try:
        spark.conf.set("spark.sql.session.timeZone", "Australia/Adelaide")
        for n, want in baseline.items():
            assert run(n) == want, f"{n} output depends on session timezone"
    finally:
        spark.conf.set("spark.sql.session.timeZone", base_tz)
