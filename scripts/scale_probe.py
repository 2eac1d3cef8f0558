"""10x-replication scaling probe: replicate sf0.1 documents/embeddings/
events with shifted keys (embeddings nudged per replica so distances stay
non-degenerate), then time catalog operators at 1x and 10x.

Usage: python scripts/scale_probe.py   (from the repo root)
Results are recorded in SCALE.md §Measured scaling."""
import time, os, sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from gramene_mongodb_spark.session import get_spark
from gramene_mongodb_spark.catalog import REGISTRY

spark = get_spark("scale-probe")
spark.sparkContext.setLogLevel("ERROR")
SRC = "/root/testdata/sf0.1"
DST = "/tmp/scale10"

def replicate():
    os.makedirs(DST, exist_ok=True)
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    reps = spark.range(10).withColumnRenamed("id", "__rep")
    (docs.crossJoin(reps)
        .withColumn("doc_id", F.col("doc_id") + F.col("__rep") * 10_000_000)
        .drop("__rep")
        .repartition(32)
        .write.mode("overwrite").parquet(f"{DST}/documents.parquet"))
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    (emb.crossJoin(reps)
        .withColumn("vec_id", F.col("vec_id") + F.col("__rep") * 10_000_000)
        # nudge each replica so distances stay non-degenerate (still well
        # inside the same clusters: 0.001 per dim << cluster radius)
        .withColumn("embedding",
            F.transform("embedding", lambda x: x + F.col("__rep").cast("float") * F.lit(0.001)))
        .drop("__rep")
        .repartition(32)
        .write.mode("overwrite").parquet(f"{DST}/embeddings.parquet"))
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    (ev.crossJoin(reps)
        .withColumn("event_id", F.col("event_id") + F.col("__rep") * 100_000_000)
        .withColumn("user_id", F.col("user_id") + F.col("__rep") * 1_000_000)
        .drop("__rep")
        .repartition(32)
        .write.mode("overwrite").parquet(f"{DST}/events.parquet"))
    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    (orders.crossJoin(reps)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("__rep") * 100_000_000)
        .withColumn("o_custkey", F.col("o_custkey") + F.col("__rep") * 1_000_000)
        .drop("__rep")
        .repartition(32)
        .write.mode("overwrite").parquet(f"{DST}/orders.parquet"))

def run(df): df.write.format("noop").mode("overwrite").save()

OPS = ["x_semantic_dedup", "x_lm_score", "x_bm25_topk", "x_inverted_index",
       "x_embed_quantize", "x_top_ngrams", "x_funnel_stages",
       "x_token_budget", "pipeline_training_mix", "x_pack_sequences",
       "x_pagerank_hosts", "x_triangle_count", "x_mad_outliers",
       "x_heavy_hitters", "x_cdc_replay", "x_agg_merge",
       "x_adaptive_filter", "x_rrf_hybrid"]

replicate()
# warm-up
run(REGISTRY["x_lm_score"].fn(spark, "/root/testdata/sf0.001"))
for name in OPS:
    fn = REGISTRY[name].fn
    res = {}
    for tag, d in (("sf0.1", SRC), ("10x", DST)):
        samples = []
        for _ in range(3):
            t0 = time.perf_counter(); run(fn(spark, d)); samples.append(time.perf_counter() - t0)
        res[tag] = min(samples)
    print(f"{name}: sf0.1 {res['sf0.1']:.2f}s  10x {res['10x']:.2f}s  factor {res['10x']/res['sf0.1']:.1f}")
spark.stop()
