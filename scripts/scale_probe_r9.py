"""Round-9 scaling probes.

Probe 1 — ExactSubstr shuffle bytes (judge ask r8 #2): the
window-TEXT shuffle in dedup.exact_substring_spans multiplies corpus
bytes by ~W tokens per window; the round-9 hash-prefilter path must
shuffle ≈ corpus + 8 B/window instead. Measured directly: total
shuffle WRITE bytes (Spark REST status API, summed over the stages of
each run) for hash_prefilter=False vs True on the sf0.1 documents
table at W=8, plus wall time. Equality of results is property-tested
(test_exact_substring_spans_hash_path_equals_text_path); this probe
records only the exchange-volume claim.

Probe 2 — skew join (judge ask r8 #6): a Zipf-skewed build of
lineitem×10 joined to a key dimension, comparing (a) plain sort-merge
join with AQE skew handling ON vs (b) relational.salted_join, on wall
time and max single-task duration. Records the when-to-salt rule for
SCALE.md.

Usage: python scripts/scale_probe_r9.py   (from the repo root)
Results recorded in SCALE.md "Measured scaling".
"""

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gramene_mongodb_spark.session import get_spark

SRC = "/root/testdata/sf0.1"


def _stages(spark, summaries=False):
    """Completed-stage metrics via the REST status API (public)."""
    sc = spark.sparkContext
    url = (
        f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}/stages"
        "?status=complete"
    )
    if summaries:
        url += "&withSummaries=true&quantiles=0.0,1.0"
    with urllib.request.urlopen(url) as r:
        return json.load(r)


def measured(spark, label, fn):
    before = {s["stageId"] for s in _stages(spark)}
    t0 = time.time()
    out = fn()
    wall = time.time() - t0
    new = [s for s in _stages(spark, summaries=True) if s["stageId"] not in before]
    swrite = sum(s.get("shuffleWriteBytes", 0) for s in new)
    sread = sum(s.get("shuffleReadBytes", 0) for s in new)
    max_task_ms = 0
    for s in new:
        dist = (s.get("taskMetricsDistributions") or {}).get("executorRunTime")
        if dist:
            max_task_ms = max(max_task_ms, dist[-1])
    print(
        f"{label}: wall={wall:.2f}s shuffle_write={swrite/1e6:.1f}MB "
        f"shuffle_read={sread/1e6:.1f}MB max_task={max_task_ms/1000:.2f}s "
        f"result={out}"
    )
    return wall, swrite


def probe_exactsubstr(spark):
    from gramene_mongodb_spark.operators.dedup import exact_substring_spans

    docs = spark.read.parquet(f"{SRC}/documents.parquet").select("doc_id", "text")
    nbytes = docs.select(F.sum(F.length("text"))).first()[0]
    print(f"documents sf0.1: text bytes = {nbytes/1e6:.1f}MB")

    def run(hash_prefilter):
        def fn():
            df = exact_substring_spans(
                docs, "doc_id", "text", window_tokens=8,
                hash_prefilter=hash_prefilter,
            )
            return df.select(
                F.sum("n_dup_windows"), F.sum("dup_tokens"), F.count(F.lit(1))
            ).first()
        return fn

    measured(spark, "exactsubstr text-path ", run(False))
    measured(spark, "exactsubstr hash-path ", run(True))


def probe_skew_join(spark):
    """Zipf-skewed fact (lineitem×10, ~6M rows, key 0 holds ~50% of
    rows) joined to a 10k-row dim that is too big to auto-broadcast
    when the threshold is lowered — the shape where one reducer gets
    half the data."""
    from gramene_mongodb_spark.operators.relational import salted_join

    reps = spark.range(10).withColumnRenamed("id", "__rep")
    li = spark.read.parquet(f"{SRC}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    # Zipf-ish with a heavy head: hash the orderkey to a uniform u in
    # (0,1), push mass to the head with u⁴, then invert the log-uniform
    # CDF (≈ Zipf(1)); P(k=0) ≈ (ln2/ln10⁴)^(1/4) ≈ 0.52 — one key
    # holds half the fact table, the true straggler shape
    u = (F.abs(F.xxhash64("l_orderkey", "__rep")) % 1000000) / 1000000.0
    u4 = u * u * u * u
    fact = li.crossJoin(reps).withColumn(
        "k", F.floor(F.exp(u4 * F.log(F.lit(10000.0)))).cast("long") - 1
    )
    dim = spark.range(10000).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 997).alias("dim_val")
    )
    agg = lambda j: j.select(
        F.sum(F.col("l_quantity") * F.col("dim_val")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    ).first()

    conf = spark.conf
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    skew = fact.groupBy("k").count().orderBy(F.desc("count")).limit(3).collect()
    print("top-3 key shares:", [(r.k, r["count"]) for r in skew])

    conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    measured(spark, "skew SMJ, AQE skew OFF ", lambda: agg(fact.join(dim, "k")))
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    measured(spark, "skew SMJ, AQE skew ON  ", lambda: agg(fact.join(dim, "k")))
    measured(
        spark,
        "salted_join (16 salts) ",
        lambda: agg(salted_join(fact, dim, "k", salts=16)),
    )
    conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    measured(spark, "broadcast join (control)", lambda: agg(fact.join(F.broadcast(dim), "k")))


def probe_homologs_10x(spark):
    """10×-replication row for the round-9 flagship: lineitem replicated
    with shifted order keys (gene ids stay unique; partkeys NOT shifted,
    so the coordinate space gets 10× denser — adversarial for the
    order-index window and the same-fragment pair rate)."""
    from pyspark.sql import functions as F

    from gramene_mongodb_spark.catalog import REGISTRY

    dst = "/tmp/scale10_r9_homologs"
    if not os.path.exists(dst + "/lineitem.parquet"):
        reps = spark.range(10).withColumnRenamed("id", "__rep")
        li = spark.read.parquet(f"{SRC}/lineitem.parquet")
        (
            li.crossJoin(reps)
            .withColumn("l_orderkey", F.col("l_orderkey") + F.col("__rep") * 10_000_000)
            .drop("__rep")
            .write.mode("overwrite")
            .parquet(f"{dst}/lineitem.parquet")
        )
        spark.read.parquet(f"{SRC}/nation.parquet").write.mode("overwrite").parquet(
            f"{dst}/nation.parquet"
        )
    fn = REGISTRY["pipeline_homologs"].fn
    for label, d in (("homologs sf0.1      ", SRC), ("homologs 10x        ", dst)):
        fn(spark, d).write.format("noop").mode("overwrite").save()  # warm
        measured(
            spark, label,
            lambda d=d: fn(spark, d).write.format("noop").mode("overwrite").save(),
        )


if __name__ == "__main__":
    # the probe reads per-stage shuffle metrics via the REST status
    # API, so it needs the UI server that get_spark disables
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("scale-probe-r9")
        .master(f"local[{os.environ['SPARK_GRAFT_CPUS']}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", os.environ["SPARK_GRAFT_CPUS"])
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "exactsubstr"):
        probe_exactsubstr(spark)
    if which in ("all", "skew"):
        probe_skew_join(spark)
    if which in ("all", "homologs"):
        probe_homologs_10x(spark)
