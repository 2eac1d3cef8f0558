"""Round-7b scaling probe: the session's new operators.

1) Wall-time exponents (alpha = log10(t10x/t1x)) for the model-based
   curation trio, the media flagship and incremental dedup, using the
   same 10x document replica as scale_probe_r7.py (run that first, or
   this script rebuilds the staging it needs).

2) The incremental-dedup ASYMMETRY measurement — the claim that
   delta-vs-corpus screening costs O(|delta|*collisions), not corpus
   work, made falsifiable: at a fixed corpus size, compare
   (a) full self-join LSH over the whole corpus (what a naive daily
       re-dedup pays) against
   (b) incremental_dedup with a 10% delta (what the asymmetric join
       pays for the same day's intake).
   The signature pass is corpus-sized in both (here history signatures
   are recomputed; in production they are the persisted index), so the
   honest headline is the CANDIDATE+VERIFY stage difference — measured
   by also timing (c) a 10%-delta run where history signatures come
   from a pre-staged parquet index, the production read path.

Usage: python scripts/scale_probe_r7b.py   (from the repo root)
Results recorded in SCALE.md "Measured scaling".
"""
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gramene_mongodb_spark.catalog import REGISTRY
from gramene_mongodb_spark.operators.dedup import (
    _banded_buckets,
    incremental_dedup,
    minhash_lsh_pairs,
)
from gramene_mongodb_spark.session import get_spark

spark = get_spark("scale-probe-r7b")
spark.sparkContext.setLogLevel("ERROR")
SRC = "/root/testdata/sf0.1"
DST = "/tmp/scale10_r7"


def ensure_staging():
    if os.path.exists(f"{DST}/documents.parquet"):
        return
    os.makedirs(DST, exist_ok=True)
    reps = spark.range(10).withColumnRenamed("id", "__rep")
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    (docs.crossJoin(reps)
        .withColumn("doc_id", F.col("doc_id") + F.col("__rep") * 10_000_000)
        .drop("__rep").repartition(32)
        .write.mode("overwrite").parquet(f"{DST}/documents.parquet"))
    cust = spark.read.parquet(f"{SRC}/customer.parquet")
    (cust.crossJoin(reps)
        .withColumn("c_custkey", F.col("c_custkey") + F.col("__rep") * 1_000_000)
        .drop("__rep").repartition(32)
        .write.mode("overwrite").parquet(f"{DST}/customer.parquet"))
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
        .drop("__rep").repartition(32)
        .write.mode("overwrite").parquet(f"{DST}/orders.parquet"))


def run(df):
    df.write.format("noop").mode("overwrite").save()


def best_of(fn, n=3):
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return min(samples)


ensure_staging()
run(REGISTRY["x_quality_classifier"].fn(spark, "/root/testdata/sf0.001"))  # warm-up

OPS = [
    "x_quality_classifier",
    "pipeline_quality_gate",
    "x_preference_pairs",
    "pipeline_media_curate",
    "x_incremental_dedup",
    "x_semantic_contamination",
    "x_quantile_sketch_merge",
]
for name in OPS:
    fn = REGISTRY[name].fn
    t1 = best_of(lambda: run(fn(spark, SRC)))
    t10 = best_of(lambda: run(fn(spark, DST)))
    alpha = math.log10(t10 / t1)
    print(f"{name}: sf0.1 {t1:.2f}s  10x {t10:.2f}s  "
          f"factor {t10 / t1:.2f}  alpha {alpha:.2f}")

# --- asymmetry measurement at fixed corpus size (the 10x corpus) ------
docs10 = spark.read.parquet(f"{DST}/documents.parquet")
delta = docs10.filter(F.col("doc_id") % 10 == 0)
history = docs10.filter(F.col("doc_id") % 10 != 0)

t_full = best_of(
    lambda: run(minhash_lsh_pairs(docs10, "doc_id", "text")), n=2
)
t_incr = best_of(
    lambda: run(incremental_dedup(history, delta, "doc_id")), n=2
)

# production read path: history band buckets pre-staged as the persisted
# index — measures the daily cost when the corpus-side signature pass is
# amortized into the previous run
idx_path = f"{DST}/history_band_index.parquet"
_banded_buckets(history, "doc_id", "text", 3, 64, 16, 7).write.mode(
    "overwrite"
).parquet(idx_path)


def incr_with_staged_index():
    hb = spark.read.parquet(idx_path)
    db = _banded_buckets(delta, "doc_id", "text", 3, 64, 16, 7)
    cand = (
        db.alias("d").join(hb.alias("h"), ["band", "bucket"])
        .select(F.col("d.doc_id").alias("new_id"), F.col("h.doc_id").alias("src_id"))
        .distinct()
    )
    run(cand)


t_staged = best_of(incr_with_staged_index, n=2)
print(
    f"asymmetry @10x corpus: full self-join LSH {t_full:.2f}s  "
    f"incremental(10% delta, sigs recomputed) {t_incr:.2f}s  "
    f"delta-vs-staged-index candidates only {t_staged:.2f}s"
)
spark.stop()
