"""Round-8 scaling probe: the tree-COUNT axis for the tree-publish
flagship (judge ask r7 #5).

Round 7's probe grew the 25 sf0.1 trees 10x in SIZE (factor 7.84 —
linear-per-group with only 25-way parallelism over 32 cores). Real
corpora grow the other way (`trees/genetree.js:334` processes
thousands of trees), so this probe grows tree COUNT at fixed per-tree
size, plus a granularity control at equal total work:

  A baseline : sf0.1 as-is            —   25 trees x  600 leaves
  B count-10x: 10x rows, +25/rep nk   —  250 trees x  600 leaves
  C granular : same 10x rows, nk=ck%2500 — 2500 trees x   60 leaves

B/A isolates the count axis at 10x total work: with group count >=
cores the kernels pack all 32 slots (vs 25-way at baseline), so the
expected factor is ~10 x 25/32 ~ 7.8 on the kernel share and lower on
the row-bound relational stages. C/B holds total work CONSTANT while
multiplying group count 10x — the pure granularity effect; ~1x (or
below: smaller Arrow batches per group, less per-task memory) proves
group count is a free parallel axis, i.e. wall tracks total rows, not
tree count.

Usage: python scripts/scale_probe_r8.py   (from the repo root)
Results recorded in SCALE.md "Measured scaling".
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gramene_mongodb_spark.catalog import REGISTRY
from gramene_mongodb_spark.session import get_spark

spark = get_spark("scale-probe-r8")
spark.sparkContext.setLogLevel("ERROR")
SRC = "/root/testdata/sf0.1"
DST_COUNT = "/tmp/scale10_r8_count"
DST_GRAN = "/tmp/scale10_r8_gran"


def replicate():
    reps = spark.range(10).withColumnRenamed("id", "__rep")
    cust = spark.read.parquet(f"{SRC}/customer.parquet")
    big = (
        cust.crossJoin(reps)
        .withColumn("c_custkey", F.col("c_custkey") + F.col("__rep") * 1_000_000)
        # names must stay unique per tree (they are the gene ids): bake
        # the replica into the digits so blocking/score ties don't merge
        .withColumn(
            "c_name",
            F.concat(F.col("c_name"), F.lit("r"), F.col("__rep")),
        )
    )
    for dst, nk in (
        (DST_COUNT, F.col("c_nationkey") + F.col("__rep") * 25),
        (DST_GRAN, (F.col("c_custkey") % 2500).cast(cust.schema["c_nationkey"].dataType)),
    ):
        os.makedirs(dst, exist_ok=True)
        (big.withColumn("c_nationkey", nk)
            .drop("__rep").repartition(32)
            .write.mode("overwrite").parquet(f"{dst}/customer.parquet"))
        for t in ("nation", "region", "orders", "lineitem"):
            p = f"{SRC}/{t}.parquet"
            if os.path.exists(p):
                spark.read.parquet(p).write.mode("overwrite").parquet(f"{dst}/{t}.parquet")


def run(df):
    df.write.format("noop").mode("overwrite").save()


def best_of(fn, n=3):
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return min(samples), samples


replicate()
fn = REGISTRY["pipeline_tree_publish"].fn
run(fn(spark, "/root/testdata/sf0.001"))  # warm-up

results = {}
for label, d in (("A_baseline_25x600", SRC),
                 ("B_count10x_250x600", DST_COUNT),
                 ("C_granular_2500x60", DST_GRAN)):
    t, samples = best_of(lambda d=d: run(fn(spark, d)))
    results[label] = t
    print(f"{label}: min {t:.2f}s of {[round(s, 2) for s in samples]}",
          file=sys.stderr)

a, b, c = results.values()
print(f"RESULT count_axis_factor_BA={b / a:.2f} granularity_factor_CB={c / b:.2f} "
      f"A={a:.2f} B={b:.2f} C={c:.2f}", file=sys.stderr)
with open("/tmp/scale_probe_r8_result.txt", "w") as fh:
    fh.write(f"A={a:.3f} B={b:.3f} C={c:.3f} B/A={b/a:.2f} C/B={c/b:.2f}\n")
spark.stop()
