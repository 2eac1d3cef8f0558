"""Round-10 scaling probe (b): exact_substring_rewrite at 10x corpus.

The round's flagship new operator: the ExactSubstr span-REMOVAL
rewrite. Its scale claim (dedup.exact_substring_rewrite docstring) is
that the window pass is the audited hash-prefilter form (8 B/window
through the count exchange), the first-occurrence rank shares the
verify pass's win_text partition, cut spans aggregate doc-keyed, and
the rewrite itself is a map-side array filter — so wall should scale
roughly with windows (corpus tokens), not with pairs.

A 10x replication is the ADVERSARIAL shape for this operator: every
window becomes 10x-duplicated corpus-wide, so the duplicated-candidate
remainder is the WHOLE corpus and every doc rewrites (docs 2..10 of
each replica group cut to ''). A real corpus has a small duplicated
tail; this measures the worst case.

Same methodology as scripts/scale_probe_r10.py: sf0.1 documents
replicated 10x with shifted doc_ids, min-of-3, noop sink. Results in
SCALE.md "Measured scaling" (fourteenth probe).

Usage: python scripts/scale_probe_r10b.py   (from the repo root)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gramene_mongodb_spark.operators import dedup as D
from gramene_mongodb_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
REP = "/tmp/probe_r9b_docs10.parquet"  # shared with the r9b/r10 probes


def timed(label, fn, runs=3):
    best = None
    for _ in range(runs):
        t0 = time.time()
        fn()
        best = min(best or 9e9, time.time() - t0)
    print(f"{label}: {best:.2f}s")
    return best


def main():
    spark = get_spark("scale-probe-r10b")
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

    def rewrite(d):
        return lambda: D.exact_substring_rewrite(
            d, "doc_id", "text", window_tokens=8
        ).write.format("noop").mode("overwrite").save()

    r1 = timed("rewrite 1x", rewrite(docs))
    r10 = timed("rewrite 10x (fully-duplicated worst case)", rewrite(docs10))
    print("\n| operator | sf0.1 | 10x | factor |")
    print("|---|---|---|---|")
    print(f"| exact_substring_rewrite | {r1:.2f}s | {r10:.2f}s | {r10 / r1:.1f} |")
    spark.stop()


if __name__ == "__main__":
    main()
