"""Round-15 probe (twenty-second): 10× rows for the time-unit entries.

* ``x_mongo_window_range_unit`` — a 30-day range window per customer:
  one hash exchange + a sorted range-frame scan. Orders replicate 10×
  with shifted o_custkey, so 10× data = 10× PARTITIONS of the same
  ~10-order size — the frame scan per partition is constant and the
  extra work spreads across cores; expect near-linear wall.
* ``x_mongo_timeseries_units`` — daily-count groupBy → day-grid
  $densify (per-user extent + explode + broadcast anti-join) → one
  window exchange for cum/derivative/integral. Events replicate 10×
  with shifted user_id: 10× users, same ~45-day span each, so the
  grid (output-sized) and every exchange grow linearly.

Usage: python scripts/scale_probe_r15.py   (repo root; quiet machine)
Results recorded in SCALE.md "Measured scaling".
"""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DIR = "/tmp/scale15"


def main():
    from pyspark.sql import functions as F

    from gramene_mongodb_spark import catalog
    from gramene_mongodb_spark.session import get_spark

    spark = get_spark("scale-probe-r15")
    shutil.rmtree(DIR, ignore_errors=True)
    os.makedirs(DIR)
    reps = spark.range(10).withColumnRenamed("id", "__rep")

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    ckspan = orders.agg(F.max("o_custkey")).first()[0] + 1
    okspan = orders.agg(F.max("o_orderkey")).first()[0] + 1
    (orders.crossJoin(F.broadcast(reps))
     .withColumn("o_custkey", F.col("o_custkey") + F.col("__rep") * ckspan)
     .withColumn("o_orderkey", F.col("o_orderkey") + F.col("__rep") * okspan)
     .drop("__rep")
     .write.mode("overwrite").parquet(f"{DIR}/orders.parquet"))

    ev = spark.read.parquet(f"{SF}/events.parquet")
    uspan = ev.agg(F.max("user_id")).first()[0] + 1
    espan = ev.agg(F.max("event_id")).first()[0] + 1
    (ev.crossJoin(F.broadcast(reps))
     .withColumn("user_id", F.col("user_id") + F.col("__rep") * uspan)
     .withColumn("event_id", F.col("event_id") + F.col("__rep") * espan)
     .drop("__rep")
     .write.mode("overwrite").parquet(f"{DIR}/events.parquet"))

    for name in ("x_mongo_window_range_unit", "x_mongo_timeseries_units"):
        fn = catalog.REGISTRY[name].fn

        def timed(sf_dir):
            t = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
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
