"""Round-14 scaling probe (VERDICT r13 ask #6): release-DAG resume.

The nineteenth probe measures the property the staged barriers are
PAID for: a release killed mid-DAG resumes by re-running only the
stale suffix. Protocol, at sf0.1 on a quiet machine:

1. UNINTERRUPTED control — ``release_e2e_resumable`` into a fresh
   stage dir; record wall and the summary's value fingerprint.
2. CRASH — same fresh dir, with stage 4 ("decorate") replaced by a
   raiser: stages 1-3 commit their parquet + manifest barriers, then
   the release dies (the mid-release OOM/preemption case).
3. RESUME — restore the real stage, re-run into the same dir; record
   wall, which stages re-ran (must be exactly ["decorate"]), and the
   final fingerprint (must equal the control's).

Reported: control wall, resume wall, resume/control ratio, stages
re-run, fingerprint equality. The interesting number is the ratio —
at 100 TB the prefix (taxonomy+genes+homologs ≈ the expensive scans
and the closure) dominates, so the measured saving here is the FLOOR
of the production saving.

The correctness twin is tests/test_pipeline_genes.py::
test_release_dag_crash_resume (sf0.001, every assertion hard).

A second measurement gives the round's new entry its 10× row:
``x_mongo_object_reshape`` on orders sf0.1 vs a ×10 replication
(orderkeys shifted to stay unique) — expected ~linear-or-better: the
map build/shred is scan-speed, the only exchange is the final
(status, pword, k) groupBy whose key domain is FIXED (3 statuses × 5
words × 3 keys), so the 10× run is pure map-side partial aggregation.

Usage: python scripts/scale_probe_r14.py   (repo root; quiet machine)
Results recorded in SCALE.md "Measured scaling".
"""

import hashlib
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DIR = "/tmp/scale14_resume"


def _fingerprint(df):
    rows = sorted(map(str, df.collect()))
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main():
    from gramene_mongodb_spark import pipelines as P
    from gramene_mongodb_spark.session import get_spark

    spark = get_spark("scale-probe-r14")
    shutil.rmtree(DIR, ignore_errors=True)
    os.makedirs(DIR)

    # 1 — uninterrupted control
    d0 = os.path.join(DIR, "control")
    t0 = time.monotonic()
    df0, ran0 = P.release_e2e_resumable(spark, SF, d0)
    fp0 = _fingerprint(df0)
    wall_control = time.monotonic() - t0
    print(f"control: {wall_control:.2f}s ran={ran0} fp={fp0}")

    # 2 — crash during stage 4
    d1 = os.path.join(DIR, "crashed")
    real = P.RELEASE_STAGES["decorate"]

    def boom(*a, **k):
        raise RuntimeError("simulated mid-release crash")

    P.RELEASE_STAGES["decorate"] = boom
    t1 = time.monotonic()
    try:
        P.release_e2e_resumable(spark, SF, d1)
        raise AssertionError("crash did not fire")
    except RuntimeError:
        pass
    finally:
        P.RELEASE_STAGES["decorate"] = real
    wall_prefix = time.monotonic() - t1
    print(f"crashed after stage 3: {wall_prefix:.2f}s (prefix cost)")

    # 3 — resume: suffix only
    t2 = time.monotonic()
    df1, ran1 = P.release_e2e_resumable(spark, SF, d1)
    fp1 = _fingerprint(df1)
    wall_resume = time.monotonic() - t2
    assert ran1 == ["decorate"], f"resume re-ran {ran1}"
    assert fp1 == fp0, f"resumed fingerprint {fp1} != control {fp0}"
    print(f"resume: {wall_resume:.2f}s ran={ran1} fp={fp1} (== control)")
    print(
        f"RESULT sf_dir={SF} control={wall_control:.2f}s "
        f"resume={wall_resume:.2f}s ratio={wall_resume / wall_control:.2f} "
        f"prefix_saved={wall_prefix:.2f}s fingerprints_equal=True"
    )

    # --- 10× probe for the round's new entry ---
    from pyspark.sql import functions as F

    from gramene_mongodb_spark import catalog

    d10 = os.path.join(DIR, "x10")
    os.makedirs(d10, exist_ok=True)
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    reps = spark.range(10).withColumnRenamed("id", "__rep")
    span = orders.agg(F.max("o_orderkey")).first()[0] + 1
    (orders.crossJoin(F.broadcast(reps))
     .withColumn("o_orderkey", F.col("o_orderkey") + F.col("__rep") * span)
     .drop("__rep")
     .write.mode("overwrite").parquet(f"{d10}/orders.parquet"))

    def timed(sf_dir):
        t = time.monotonic()
        catalog.x_mongo_object_reshape(spark, sf_dir).collect()
        return time.monotonic() - t

    timed(SF)  # warm
    t1 = min(timed(SF) for _ in range(3))
    t10 = min(timed(d10) for _ in range(3))
    print(f"RESULT x_mongo_object_reshape sf0.1={t1:.2f}s x10={t10:.2f}s "
          f"factor={t10 / t1:.1f}")
    spark.stop()
    shutil.rmtree(DIR, ignore_errors=True)


if __name__ == "__main__":
    main()
