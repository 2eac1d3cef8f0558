"""Round-14 probe B: the other two new entries' 10× rows.

* ``x_mongo_strings_sets`` — the interesting one: its $topN/$bottomN
  compile to collect-sort-slice per group, and orders has only THREE
  o_orderstatus groups, so the collected (key, output) array grows
  linearly with the data (~50k structs/group at sf0.1 → ~500k at 10×)
  and sorts inside three tasks. The docstring already states the
  bound ("O(group) worst case — use the window-rank form for
  unbounded groups"); this probe MEASURES the cost of ignoring it, so
  the migration guidance has a number attached.
* ``x_mongo_window_calculus`` — per-partition window sort over the
  same three groups: 3-task parallelism regardless of cores, linear
  per-task work. Expected ~linear wall at 10× with idle cores — the
  fixture's group count, not the plan, is the parallel axis (real
  collections partition finer).

Usage: python scripts/scale_probe_r14b.py   (repo root; quiet machine)
Results recorded in SCALE.md "Measured scaling".
"""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DIR = "/tmp/scale14b"


def main():
    from pyspark.sql import functions as F

    from gramene_mongodb_spark import catalog
    from gramene_mongodb_spark.session import get_spark

    spark = get_spark("scale-probe-r14b")
    shutil.rmtree(DIR, ignore_errors=True)
    os.makedirs(DIR)
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    reps = spark.range(10).withColumnRenamed("id", "__rep")
    span = orders.agg(F.max("o_orderkey")).first()[0] + 1
    (orders.crossJoin(F.broadcast(reps))
     .withColumn("o_orderkey", F.col("o_orderkey") + F.col("__rep") * span)
     .drop("__rep")
     .write.mode("overwrite").parquet(f"{DIR}/orders.parquet"))

    for name in ("x_mongo_strings_sets", "x_mongo_window_calculus"):
        fn = catalog.REGISTRY[name].fn

        def timed(sf_dir):
            t = time.monotonic()
            fn(spark, sf_dir).collect()
            return time.monotonic() - t

        timed(SF)  # warm
        t1 = min(timed(SF) for _ in range(3))
        t10 = min(timed(DIR) for _ in range(3))
        print(f"RESULT {name} sf0.1={t1:.2f}s x10={t10:.2f}s "
              f"factor={t10 / t1:.1f}")
    spark.stop()
    shutil.rmtree(DIR, ignore_errors=True)


if __name__ == "__main__":
    main()
