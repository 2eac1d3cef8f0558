"""Oracle-differential harness: mimics the driver's correctness gate.

Runs a catalog query on Spark and its SQL twin on DuckDB over the same
parquet tables, then compares row count, column names, and values
(order-insensitive, null-normalized). Used by tests/test_oracle_parity.py
so every catalog entry is verified locally before the driver sees it.
"""

from __future__ import annotations

import math
import os

import duckdb

from gramene_mongodb_spark.io import TABLES


def duckdb_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / 0.0 and format stably
        if v == 0:
            v = 0.0
        return f"{v:.6f}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v) if v is not None else "\x00NULL"


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_norm_cell(r[i]) for i in order))
    out.sort()
    return [cols[i] for i in order], out


def spark_value_hash(spark_df) -> str:
    """Stable fingerprint of a Spark result: the sha256 of the SAME
    canonical form `compare` checks (columns sorted by name, rows
    sorted, cells null/float-normalized). Two trees whose entry
    produces the same fingerprint at a given SF would attest
    identically at the driver gate — parity sweeps record this per
    entry so the rotation guard can prove 'result unchanged since last
    attestation' without re-running history (round-13 window-family
    guard)."""
    import hashlib

    cols = spark_df.columns
    rows = [tuple(r) for r in spark_df.collect()]
    c, canon = _canon(cols, rows)
    h = hashlib.sha256()
    h.update(("\x01".join(c)).encode())
    for r in canon:
        h.update(b"\x02")
        h.update(("\x01".join(r)).encode())
    return h.hexdigest()


def compare(spark_df, oracle_sql: str, sf_dir: str):
    """Returns (ok, message). ok=True when counts, column-name sets and
    canonicalized values all match."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols, d_rows = duckdb_run(oracle_sql, sf_dir)
    if sorted(s_cols) != sorted(d_cols):
        return False, f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}"
    sc, s_canon = _canon(s_cols, s_rows)
    dc, d_canon = _canon(d_cols, d_rows)
    if s_canon != d_canon:
        diffs = [
            (a, b) for a, b in zip(s_canon, d_canon) if a != b
        ][:3]
        return False, f"values differ (first diffs, cols={sc}): {diffs}"
    return True, f"ok ({len(s_rows)} rows)"
