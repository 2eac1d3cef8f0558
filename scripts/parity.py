"""Pre-driver parity sweep: run EVERY catalog query against its DuckDB
oracle at a given scale factor (default sf0.01 — the driver's gate scale)
on a PLAIN SparkSession (driver-identical; session.get_spark's confs must
not be load-bearing) and write a machine-readable report.

Usage:  python scripts/parity.py [sf_dir] [report_path]
Exit status is non-zero when any oracle-backed query mismatches.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    report_path = sys.argv[2] if len(sys.argv) > 2 else "PARITY_SF001.json"

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry
    from tests.oracle import compare, spark_value_hash

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # cross-TZ sweep: SPARK_GRAFT_TZ=Australia/Adelaide (half-hour offset
    # catches more than whole-hour zones) re-runs the whole differential
    # under a hostile session timezone — results must be identical
    tz = os.environ.get("SPARK_GRAFT_TZ", "UTC")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", tz)
        .config("spark.ui.enabled", "false")
        .appName("parity-sweep")
        .getOrCreate()
    )
    qs, osql = entry.queries(), entry.oracle_sql()
    from gramene_mongodb_spark.catalog import REGISTRY

    # loud staleness guard: a sweep that covers fewer queries than the
    # catalog registers is a stale artifact, not evidence (round-4 bug)
    assert len(qs) == len(REGISTRY), (
        f"entry.queries() exposes {len(qs)} queries but the catalog "
        f"registers {len(REGISTRY)} — __spark_entry__ is stale"
    )
    report: dict[str, dict] = {}
    n_fail = 0
    t0 = time.time()
    for name in sorted(qs):
        row: dict = {}
        try:
            df = qs[name](spark, sf_dir)
            if name in osql:
                ok, msg = compare(df, osql[name], sf_dir)
                row = {"gate": "oracle", "ok": ok, "msg": msg}
                if not ok:
                    n_fail += 1
            else:
                row = {"gate": "rows_only", "ok": True, "rows": df.count()}
            # result + oracle fingerprints for the rotation guard (see
            # tests/oracle.spark_value_hash): lets the next round prove
            # "unchanged since last attestation" per entry — the oracle
            # text is hashed too, because an entry whose ORACLE changed
            # is claiming an old green that validated a different check
            row["value_hash"] = spark_value_hash(df)
            if name in osql:
                import hashlib

                row["oracle_hash"] = hashlib.sha256(
                    osql[name].encode()
                ).hexdigest()
        except Exception as exc:  # noqa: BLE001 — report, don't die mid-sweep
            row = {"gate": "error", "ok": False, "msg": f"{type(exc).__name__}: {exc}"}
            n_fail += 1
        report[name] = row
        print(f"{'PASS' if row['ok'] else 'FAIL'} {name} {row.get('msg', '')}")
    spark.stop()

    summary = {
        "sf_dir": sf_dir,
        "total": len(qs),
        "registry_total": len(REGISTRY),
        "oracle_backed": sum(1 for r in report.values() if r["gate"] == "oracle"),
        "rows_only": sum(1 for r in report.values() if r["gate"] == "rows_only"),
        "failures": n_fail,
        # a passing oracle row over an EMPTY result verifies nothing —
        # list them so triviality is visible in the artifact (q11 bug)
        "zero_row_passes": sorted(
            n
            for n, r in report.items()
            if r["gate"] == "oracle" and r["ok"] and r.get("msg") == "ok (0 rows)"
        ),
        "wall_seconds": round(time.time() - t0, 1),
    }
    with open(report_path, "w") as fh:
        json.dump({"summary": summary, "queries": report}, fh, indent=1)
    print(json.dumps(summary))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
