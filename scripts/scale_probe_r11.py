"""Round-11 scaling probes: LPA on the shared link graph (VERDICT r10
ask #4) and the leakage-matrix group-cap ceiling (ask #7).

Probe A — label_propagation. The corrected docstring
(closure.py) says the per-round exchange is EDGE-sized pre-combine and
the edge set never re-shuffles; at 10x edges, per-round cost should
grow ~linearly (alpha ≈ 1), and raising `iterations` past 8 must stay
near-linear in rounds (the new hard_checkpoint rotation guards the
plan-growth blowup measured in lineage.py).

Probe B — source_leakage_matrix's `max_groups_per_shingle` cap. The
thirteenth probe (round 10) measured factor 2.2 at 10x corpus with the
SAME 20 sources and attributed the residual slope to the capped pair
expansion. This probe is the ceiling test the verdict asked for: 10x
corpus AND 10x sources (200), i.e. ~100x the uncapped pair space
(190 -> 19,900 unordered source pairs). Every replicated shingle now
sits in up to 200 sources — far over the cap of 15 — so the cap drops
it BEFORE the pair expansion and wall time must stay scan-dominated
(factor comparable to the 13th probe's 2.2, nowhere near the 100x pair
space), which is the "bounded at any corpus size" claim, measured.

Methodology as rounds 9-10: sf0.1 base, 10x replication with shifted
ids, min-of-3, noop count sink. Results recorded in SCALE.md
(fifteenth/sixteenth probes).

Usage: python scripts/scale_probe_r11.py   (from the repo root)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gramene_mongodb_spark.operators import dedup as D
from gramene_mongodb_spark.operators.closure import label_propagation
from gramene_mongodb_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
REP_SRCS = "/tmp/probe_r11_docs10_srcs.parquet"


def timed(label, fn, runs=3):
    best = None
    for _ in range(runs):
        t0 = time.time()
        fn()
        best = min(best or 9e9, time.time() - t0)
    print(f"{label}: {best:.2f}s")
    return best


def linkgraph(docs, n):
    """The x_url_canonical/_linkgraph_edges derivation, parameterized
    by vertex count so the 10x graph links within itself."""
    return (
        docs.select(
            F.col("doc_id").alias("src"),
            F.explode(F.array(*[F.lit(j) for j in (1, 2, 3)])).alias("j"),
        )
        .select(
            "src",
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.col("src").cast("string"),
                                       F.lit(":"), F.col("j").cast("string"))),
                        1, 8,
                    ),
                    16, 10,
                ).cast("long") % F.lit(n)
            ).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )


def main():
    spark = get_spark("scale-probe-r11")
    docs1 = spark.read.parquet(f"{SRC}/documents.parquet")

    if not os.path.exists(REP_SRCS):
        parts = [
            docs1.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
            .withColumn(
                "source", F.concat(F.col("source"), F.lit("#"), F.lit(str(i)))
            )
            for i in range(10)
        ]
        rep = parts[0]
        for p in parts[1:]:
            rep = rep.unionByName(p)
        rep.repartition(32).write.mode("overwrite").parquet(REP_SRCS)
    docs10 = spark.read.parquet(REP_SRCS)

    n1 = docs1.count()
    n10 = docs10.count()
    print(f"docs: {n1} -> {n10}; sources: "
          f"{docs1.select('source').distinct().count()} -> "
          f"{docs10.select('source').distinct().count()}")

    # ---- probe A: LPA ----
    e1 = linkgraph(docs1.select("doc_id"), n1)
    e10 = linkgraph(docs10.select("doc_id"), n10)
    t1 = timed("lpa 1x (3 rounds)", lambda: label_propagation(e1, iterations=3).count())
    t10 = timed("lpa 10x (3 rounds)", lambda: label_propagation(e10, iterations=3).count())
    import math
    print(f"lpa factor {t10 / t1:.2f} alpha {math.log(t10 / t1) / math.log(10):.2f}")
    # deep-iteration guard: 17 rounds crosses two hard_checkpoint
    # rotations; must stay ~linear in rounds, not blow up in analysis
    t3 = timed("lpa 1x (3 rounds, repeat)", lambda: label_propagation(e1, iterations=3).count(), runs=1)
    t17 = timed("lpa 1x (17 rounds)", lambda: label_propagation(e1, iterations=17).count(), runs=1)
    print(f"17-vs-3 rounds ratio {t17 / t3:.2f} (linear-in-rounds ceiling ≈ 5.7)")

    # ---- probe B: leakage-matrix cap ceiling ----
    def leak(d):
        return D.source_leakage_matrix(
            d, "source", "text", n=3, max_groups_per_shingle=15
        ).count()

    p1 = D.source_leakage_matrix(docs1, "source", "text", n=3,
                                 max_groups_per_shingle=15).count()
    p10 = D.source_leakage_matrix(docs10, "source", "text", n=3,
                                  max_groups_per_shingle=15).count()
    print(f"pairs out: {p1} (of 190 possible) -> {p10} (of 19900 possible)")
    l1 = timed("leakage 1x (20 srcs)", lambda: leak(docs1))
    l10 = timed("leakage 10x (200 srcs)", lambda: leak(docs10))
    print(f"leakage factor {l10 / l1:.2f} at ~100x uncapped pair space "
          f"(13th-probe same-sources factor was 2.2)")
    spark.stop()


if __name__ == "__main__":
    main()
