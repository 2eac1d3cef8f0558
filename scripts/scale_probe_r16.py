"""Round-16 probe: 10x inputs for the three r15 structural claims that
were wall-neutral at sf0.1 (VERDICT r15 item 8) — run from BOTH the r15
pre-optimization worktree and HEAD so the 10x delta shows whether the
structural direction holds:

* ``x_mongo_graphlookup`` (bfs delta-union, 816b96e) — visited kept as a
  lazy union of per-hop checkpointed deltas instead of a growing rewrite:
  the saved work is O(|visited| * hops) writes, which only shows once
  |visited| is large. customer x10.
* ``pipeline_media_curate`` (metadata checkpoint, 3208789) — the probed
  METADATA is checkpointed once instead of re-running the generator +
  header probe per consumer: saves a full per-object decode pass, which
  grows with corpus size. customer x10.
* ``x_pagerank_hosts`` (lazy rounds, 6abd082) — rounds compose into one
  job with out-degree riding the edge checkpoint: saves per-round
  materialize passes over the rank table. documents x10.

Usage:  python scripts/scale_probe_r16.py [build|run]
  build — materialize /tmp/scale16 (10x customer + documents, other
          tables copied through) — run ONCE from HEAD
  run   — min-of-3 noop timings for the three queries against
          /tmp/scale16, printed as one JSON line — run from EACH worktree
Results recorded in SCALE.md "Measured scaling" + OPTIMIZATION_r16.md.
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DIR = "/tmp/scale16"
QUERIES = ("x_mongo_graphlookup", "pipeline_media_curate", "x_pagerank_hosts")


def build():
    from pyspark.sql import functions as F

    from gramene_mongodb_spark.session import get_spark

    spark = get_spark("scale-probe-r16-build")
    shutil.rmtree(DIR, ignore_errors=True)
    os.makedirs(DIR)
    reps = spark.range(10).withColumnRenamed("id", "__rep")

    cust = spark.read.parquet(f"{SF}/customer.parquet")
    ckspan = cust.agg(F.max("c_custkey")).first()[0] + 1
    (cust.crossJoin(F.broadcast(reps))
     .withColumn("c_custkey", F.col("c_custkey") + F.col("__rep") * ckspan)
     .drop("__rep")
     .write.mode("overwrite").parquet(f"{DIR}/customer.parquet"))

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    dspan = docs.agg(F.max("doc_id")).first()[0] + 1
    (docs.crossJoin(F.broadcast(reps))
     .withColumn("doc_id", F.col("doc_id") + F.col("__rep") * dspan)
     .drop("__rep")
     .write.mode("overwrite").parquet(f"{DIR}/documents.parquet"))

    for name in os.listdir(SF):
        if name not in ("customer.parquet", "documents.parquet"):
            src = os.path.join(SF, name)
            dst = os.path.join(DIR, name)
            (shutil.copytree if os.path.isdir(src) else shutil.copy)(src, dst)
    print("built", DIR)
    spark.stop()


def run():
    from gramene_mongodb_spark.catalog import REGISTRY
    from gramene_mongodb_spark.session import get_spark

    spark = get_spark("scale-probe-r16")
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # warm-up
    noop(REGISTRY["q01_pricing_summary"].fn(spark, "/root/testdata/sf0.001"))
    out = {}
    for name in QUERIES:
        fn = REGISTRY[name].fn
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            noop(fn(spark, DIR))
            samples.append(round(time.perf_counter() - t0, 3))
        out[name] = {"min": min(samples), "samples": samples}
        print(f"# {name}: {samples}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "run"
    {"build": build, "run": run}[mode]()
