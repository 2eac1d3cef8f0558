"""Round-10 scaling probe: source_leakage_matrix after the xxhash64
shingle prefilter.

Round 9 measured the leakage matrix at a 10x factor of 3.5 — the only
superlinear-ish reading in the probe family — and attributed it to the
(group, shingle) distinct shuffling shingle TEXT. Round 10 switches the
whole pipeline (distinct, per-shingle df count, bounded self-join,
sizes) to xxhash64(shingle) keys: 8 bytes/row through every exchange,
with a documented collision bound instead of a verify pass (a collision
shifts one count by +-1 inside vocabulary-sized denominators; contrast
substring dedup where it would flip a keep/cut bit).

Same methodology as scripts/scale_probe_r9b.py: sf0.1 documents
replicated 10x with shifted doc_ids (sources unchanged, so the group
axis is fixed and per-group vocabulary grows), min-of-3, noop sink.

Usage: python scripts/scale_probe_r10.py   (from the repo root)
Results recorded in SCALE.md "Measured scaling".
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gramene_mongodb_spark.operators import dedup as D
from gramene_mongodb_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
REP = "/tmp/probe_r9b_docs10.parquet"  # shared with the r9b probe


def timed(label, fn, runs=3):
    best = None
    for _ in range(runs):
        t0 = time.time()
        fn()
        best = min(best or 9e9, time.time() - t0)
    print(f"{label}: {best:.2f}s")
    return best


def main():
    spark = get_spark("scale-probe-r10")
    docs = spark.read.parquet(f"{SRC}/documents.parquet")

    if not os.path.exists(REP):
        parts = [
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
            for i in range(10)
        ]
        rep = parts[0]
        for p in parts[1:]:
            rep = rep.unionByName(p)
        rep.repartition(32).write.mode("overwrite").parquet(REP)
    docs10 = spark.read.parquet(REP)
    print(f"documents: {docs.count()} -> {docs10.count()}")

    def leak(d):
        return lambda: D.source_leakage_matrix(d, "source", "text").write.format(
            "noop"
        ).mode("overwrite").save()

    r1 = timed("leakage 1x", leak(docs))
    r10 = timed("leakage 10x", leak(docs10))
    print("\n| operator | sf0.1 | 10x | factor |")
    print("|---|---|---|---|")
    print(f"| source_leakage_matrix (hash-keyed) | {r1:.2f}s | {r10:.2f}s | {r10 / r1:.1f} |")
    spark.stop()


if __name__ == "__main__":
    main()
