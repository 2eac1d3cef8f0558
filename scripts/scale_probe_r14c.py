"""Round-14 probe C (twenty-first): 10× rows for the late round-14
entries.

* ``x_mongo_update_many`` — the updateMany shim is a CASE-per-column
  select over an orders⋈lineitem-agg join: the update itself is
  map-side (zero added shuffles), so the wall should track the
  array-building groupBy's linear growth. Both tables replicate 10×
  with consistently shifted order keys so the join fan-out stays 1:1.
* ``x_mongo_ema`` — the $expMovingAvg grouped-map kernel partitions by
  user_id; replication shifts user_id, so 10× data = 10× GROUPS of the
  same ~99-row size. That is the operator's good axis: recursion depth
  per group is constant and the added work spreads across cores. The
  oracle's recursive CTE also stays 99 iterations (frontier just
  widens), though only the Spark side is timed here.

Usage: python scripts/scale_probe_r14c.py   (repo root; quiet machine)
Results recorded in SCALE.md "Measured scaling".
"""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DIR = "/tmp/scale14c"


def main():
    from pyspark.sql import functions as F

    from gramene_mongodb_spark import catalog
    from gramene_mongodb_spark.session import get_spark

    spark = get_spark("scale-probe-r14c")
    shutil.rmtree(DIR, ignore_errors=True)
    os.makedirs(DIR)
    reps = spark.range(10).withColumnRenamed("id", "__rep")

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    okspan = orders.agg(F.max("o_orderkey")).first()[0] + 1
    (orders.crossJoin(F.broadcast(reps))
     .withColumn("o_orderkey", F.col("o_orderkey") + F.col("__rep") * okspan)
     .drop("__rep")
     .write.mode("overwrite").parquet(f"{DIR}/orders.parquet"))
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    (li.crossJoin(F.broadcast(reps))
     .withColumn("l_orderkey", F.col("l_orderkey") + F.col("__rep") * okspan)
     .drop("__rep")
     .write.mode("overwrite").parquet(f"{DIR}/lineitem.parquet"))

    ev = spark.read.parquet(f"{SF}/events.parquet")
    uspan = ev.agg(F.max("user_id")).first()[0] + 1
    espan = ev.agg(F.max("event_id")).first()[0] + 1
    (ev.crossJoin(F.broadcast(reps))
     .withColumn("user_id", F.col("user_id") + F.col("__rep") * uspan)
     .withColumn("event_id", F.col("event_id") + F.col("__rep") * espan)
     .drop("__rep")
     .write.mode("overwrite").parquet(f"{DIR}/events.parquet"))

    for name in ("x_mongo_update_many", "x_mongo_ema"):
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
