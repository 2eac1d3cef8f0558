"""Round-7 scaling probe: rows-vs-wall-time EXPONENTS for the iterative /
quadratic operators (judge ask r6 #6), plus the two new composite
flagships, plus a Misra-Gries capacity sweep.

Same 10x-replication setup as scale_probe.py (shifted keys; embeddings
nudged per replica so distances stay non-degenerate). For each operator
we report factor = t(10x)/t(1x) and the empirical exponent
alpha = log10(factor) -- alpha=1 is linear, <1 sublinear wall-clock
(parallel slack absorbed the growth), >1 superlinear (a quadratic or
join-fan-out term is emerging).

Usage: python scripts/scale_probe_r7.py   (from the repo root)
Results recorded in SCALE.md "Measured scaling".
"""
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gramene_mongodb_spark.catalog import REGISTRY
from gramene_mongodb_spark.operators.textops import heavy_hitters
from gramene_mongodb_spark.session import get_spark

spark = get_spark("scale-probe-r7")
spark.sparkContext.setLogLevel("ERROR")
SRC = "/root/testdata/sf0.1"
DST = "/tmp/scale10_r7"


def replicate():
    os.makedirs(DST, exist_ok=True)
    reps = spark.range(10).withColumnRenamed("id", "__rep")
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    (docs.crossJoin(reps)
        .withColumn("doc_id", F.col("doc_id") + F.col("__rep") * 10_000_000)
        .drop("__rep").repartition(32)
        .write.mode("overwrite").parquet(f"{DST}/documents.parquet"))
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    (emb.crossJoin(reps)
        .withColumn("vec_id", F.col("vec_id") + F.col("__rep") * 10_000_000)
        .withColumn("embedding",
            F.transform("embedding",
                        lambda x: x + F.col("__rep").cast("float") * F.lit(0.001)))
        .drop("__rep").repartition(32)
        .write.mode("overwrite").parquet(f"{DST}/embeddings.parquet"))
    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    (orders.crossJoin(reps)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("__rep") * 100_000_000)
        .withColumn("o_custkey", F.col("o_custkey") + F.col("__rep") * 1_000_000)
        .drop("__rep").repartition(32)
        .write.mode("overwrite").parquet(f"{DST}/orders.parquet"))
    cust = spark.read.parquet(f"{SRC}/customer.parquet")
    (cust.crossJoin(reps)
        .withColumn("c_custkey", F.col("c_custkey") + F.col("__rep") * 1_000_000)
        .drop("__rep").repartition(32)
        .write.mode("overwrite").parquet(f"{DST}/customer.parquet"))
    # small dims the flagships read unmodified
    for t in ("nation", "region", "supplier", "part", "lineitem", "events"):
        p = f"{SRC}/{t}.parquet"
        if os.path.exists(p):
            spark.read.parquet(p).write.mode("overwrite").parquet(f"{DST}/{t}.parquet")


def run(df):
    df.write.format("noop").mode("overwrite").save()


def best_of(fn, n=3):
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return min(samples)


replicate()
run(REGISTRY["x_lm_score"].fn(spark, "/root/testdata/sf0.001"))  # warm-up

OPS = [
    "x_graph_components",      # star-contraction CC (r7 exact-convergence)
    "x_dedup_clusters",        # CC via the dedup composition
    "x_pagerank_hosts",        # iterative integer PageRank
    "x_semantic_dedup",        # cluster-quadratic numpy tiles
    "pipeline_genes_decorate", # 16-stage flagship (r7)
    "pipeline_tree_publish",   # composite tree flagship (r7)
]
for name in OPS:
    fn = REGISTRY[name].fn
    t1 = best_of(lambda: run(fn(spark, SRC)))
    t10 = best_of(lambda: run(fn(spark, DST)))
    alpha = math.log10(t10 / t1)
    print(f"{name}: sf0.1 {t1:.2f}s  10x {t10:.2f}s  "
          f"factor {t10 / t1:.2f}  alpha {alpha:.2f}")

# Misra-Gries capacity sweep: wall time must be ~flat in capacity
# (memory knob, not a work knob) at both scales
docs1 = spark.read.parquet(f"{SRC}/documents.parquet")
docs10 = spark.read.parquet(f"{DST}/documents.parquet")
for cap in (400, 1600, 6400):
    t1 = best_of(lambda: run(heavy_hitters(docs1, "text", 200, cap)))
    t10 = best_of(lambda: run(heavy_hitters(docs10, "text", 200, cap)))
    print(f"heavy_hitters cap={cap}: sf0.1 {t1:.2f}s  10x {t10:.2f}s  "
          f"factor {t10 / t1:.2f}  alpha {math.log10(t10 / t1):.2f}")
spark.stop()
