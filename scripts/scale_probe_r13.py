"""Round-13 scaling probe (VERDICT r12 ask #6): the r9 Zipf skew
measurement re-run THROUGH ``pipeline_genes_decorate``'s fused keyed
aggregation — composed-plan behavior, not the isolated join.

Fixture: orders sf0.1 ×10 (≈1.5M rows) with ``o_custkey`` remapped by
the r9 Zipf head (P(hot key) ≈ 0.52 — one customer holds half the fact
table), orderkeys kept unique; a uniform same-size control remaps the
same rows evenly over the same key domain. The composite then runs on
both directories, AQE on and off, and we record wall, per-stage max
task time, and shuffle volume via the REST status API (the r9
harness).

What this measures, precisely: the composite's large exchange is the
``o_custkey``-keyed pass that fuses the generif/qtl/homolog counts
(one scan + one exchange) plus the transcript ``collect_list``. Unlike
the r9 isolated SMJ, these are AGGREGATIONS — AQE's skew-join split
does not apply to them; what bounds the straggler is (a) partial
(map-side) aggregation collapsing the hot key's sum/count rows to one
row per mapper, and (b) the count_distinct EXPAND keying the first
aggregate on (key, value) so the hot key spreads across reducers. The
collect_list leg is the vulnerable one (its partial merge still ships
every element of the hot key to one reducer). The probe records all
three so SCALE.md can state which mechanism absorbs composite skew —
and the r9 isolated-join control is re-run in the same session to
show AQE's skew split still fires where an SMJ exists.

Usage: python scripts/scale_probe_r13.py   (repo root; quiet machine)
Results recorded in SCALE.md "Measured scaling".
"""

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


SRC = "/root/testdata/sf0.1"
DST = "/tmp/scale13_skew"


def _stages(spark, summaries=False):
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
    max_task_ms = 0
    for s in new:
        dist = (s.get("taskMetricsDistributions") or {}).get("executorRunTime")
        if dist:
            max_task_ms = max(max_task_ms, dist[-1])
    print(
        f"{label}: wall={wall:.2f}s shuffle_write={swrite/1e6:.1f}MB "
        f"max_task={max_task_ms/1000:.2f}s result={out}",
        flush=True,
    )
    return wall, max_task_ms


def build_fixtures(spark):
    """orders ×10 with Zipf vs uniform o_custkey over the SAME domain."""
    cust = spark.read.parquet(f"{SRC}/customer.parquet")
    n_cust = cust.count()
    reps = spark.range(10).withColumnRenamed("id", "__rep")
    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    base = orders.crossJoin(reps).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.col("__rep") * 100_000_000
    )
    # r9 Zipf head: uniform u -> u^4 -> log-uniform CDF inversion;
    # P(rank 0) ~= 0.52. Rank maps onto the real custkey domain.
    u = (F.abs(F.xxhash64("o_orderkey")) % 1000000) / 1000000.0
    u4 = u * u * u * u
    zipf_rank = (F.floor(F.exp(u4 * F.log(F.lit(float(n_cust))))) - 1).cast("long")
    for name, key in (
        ("zipf", zipf_rank % n_cust + 1),
        ("uniform", F.abs(F.xxhash64("o_orderkey", F.lit(1))) % n_cust + 1),
    ):
        d = f"{DST}/{name}"
        if not os.path.exists(f"{d}/orders.parquet"):
            base.withColumn("o_custkey", key).drop("__rep").write.mode(
                "overwrite"
            ).parquet(f"{d}/orders.parquet")
            cust.write.mode("overwrite").parquet(f"{d}/customer.parquet")
    hot = (
        spark.read.parquet(f"{DST}/zipf/orders.parquet")
        .groupBy("o_custkey").count().orderBy(F.desc("count")).limit(1).first()
    )
    tot = spark.read.parquet(f"{DST}/zipf/orders.parquet").count()
    print(f"zipf fixture: {tot} rows, hot key {hot['o_custkey']} holds "
          f"{hot['count']} ({hot['count']/tot:.0%})", flush=True)


def probe_composite(spark):
    from gramene_mongodb_spark.catalog import REGISTRY

    fn = REGISTRY["pipeline_genes_decorate"].fn

    def run(d):
        return lambda: fn(spark, d).write.format("noop").mode("overwrite").save()

    for label, d in (
        ("decorate uniform ×10, AQE on ", f"{DST}/uniform"),
        ("decorate zipf    ×10, AQE on ", f"{DST}/zipf"),
    ):
        run(d)()  # warm (plan compile + shuffle files)
        measured(spark, label, run(d))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    measured(spark, "decorate zipf    ×10, AQE OFF", run(f"{DST}/zipf"))
    spark.conf.set("spark.sql.adaptive.enabled", "true")


def probe_attribution(spark):
    """Which composite stage owns the zipf straggler? Each o_custkey-keyed
    shape from pipeline_genes_decorate, isolated, zipf vs uniform."""
    from gramene_mongodb_spark.operators import documents as DOC

    def t(label, fn):
        fn()  # warm
        t0 = time.time()
        fn()
        print(f"{label}: {time.time() - t0:.2f}s", flush=True)

    def noop(df):
        return lambda: df.write.format("noop").mode("overwrite").save()

    for name in ("zipf", "uniform"):
        o = spark.read.parquet(f"{DST}/{name}/orders.parquet")
        fused = o.groupBy("o_custkey").agg(
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("a"),
            F.sum(F.when(F.col("o_orderpriority").startswith("1"), 1)
                  .otherwise(0)).alias("b"),
            F.count_distinct((F.col("o_orderkey") % 1500) + 1).alias("c"),
        )
        t(f"fused counts  {name:8}", noop(fused))
        tr = o.select("o_custkey", F.struct(
            F.concat(F.lit("T"), F.col("o_orderkey").cast("string")).alias("id"),
            F.col("o_totalprice").cast("int").alias("length"),
            F.struct(
                F.concat(F.lit("P"), F.col("o_orderkey").cast("string")).alias("id"),
                (F.col("o_orderkey") % 500).cast("int").alias("length"),
            ).alias("translation"),
        ).alias("t"))
        tdocs = tr.groupBy(F.col("o_custkey").alias("tr_key")).agg(
            F.collect_list("t").alias("transcripts")
        )
        t(f"collect_list  {name:8}", noop(tdocs.select("tr_key", F.size("transcripts"))))
        fixed = tdocs.withColumn("transcripts", F.transform(
            "transcripts",
            lambda x: F.struct(
                x["id"].alias("id"), x["length"].alias("length"),
                F.struct(
                    x["translation"]["id"].alias("id"),
                    F.floor(x["translation"]["length"] / 3).cast("int").alias("length"),
                ).alias("translation"),
            ),
        ))
        chain = DOC.canonical_first(DOC.select_canonical_transcript(fixed)).select(
            "tr_key", F.size("transcripts").alias("n")
        )
        t(f"array chain   {name:8}", noop(chain))


def probe_isolated_control(spark):
    """r9 isolated-SMJ control in the same session: AQE skew split
    still fires where a sort-merge JOIN exists."""
    li = spark.read.parquet(f"{DST}/zipf/orders.parquet").select(
        "o_custkey", "o_totalprice"
    )
    dim = spark.range(200000).select(
        F.col("id").alias("o_custkey"), (F.col("id") * 7 % 997).alias("dim_val")
    )
    agg = lambda: li.join(dim, "o_custkey").select(
        F.sum(F.col("o_totalprice") * F.col("dim_val"))
    ).first()
    conf = spark.conf
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    measured(spark, "isolated SMJ, skew split OFF", agg)
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    measured(spark, "isolated SMJ, skew split ON ", agg)
    conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")




def probe_new_entries_10x(spark):
    """Wall-factor rows for the round-13 shim entries at 1× (sf0.1) vs
    10× replication (orderkeys/custkeys shifted so keys stay unique,
    customers and lineitem replicated alongside orders). The claim
    under test: every new entry's plan is keyed-exchange-shaped, so
    10× the input must cost ≲10× the wall (α = log10(t10/t1) ≤ 1)."""
    from gramene_mongodb_spark.catalog import REGISTRY

    d10 = f"{DST}/entries10x"
    if not os.path.exists(f"{d10}/orders.parquet"):
        reps = spark.range(10).withColumnRenamed("id", "__rep")
        orders = spark.read.parquet(f"{SRC}/orders.parquet")
        cust = spark.read.parquet(f"{SRC}/customer.parquet")
        li = spark.read.parquet(f"{SRC}/lineitem.parquet")
        n_cust = cust.count()
        (orders.crossJoin(reps)
         .withColumn("o_orderkey", F.col("o_orderkey") + F.col("__rep") * 100_000_000)
         .withColumn("o_custkey", F.col("o_custkey") + F.col("__rep") * n_cust)
         .drop("__rep").write.mode("overwrite").parquet(f"{d10}/orders.parquet"))
        (cust.crossJoin(reps)
         .withColumn("c_custkey", F.col("c_custkey") + F.col("__rep") * n_cust)
         .drop("__rep").write.mode("overwrite").parquet(f"{d10}/customer.parquet"))
        (li.crossJoin(reps)
         .withColumn("l_orderkey", F.col("l_orderkey") + F.col("__rep") * 100_000_000)
         .drop("__rep").write.mode("overwrite").parquet(f"{d10}/lineitem.parquet"))
        for t in ("nation", "region", "events", "documents", "embeddings",
                  "part", "supplier"):
            p = f"{SRC}/{t}.parquet"
            if os.path.exists(p):
                spark.read.parquet(p).write.mode("overwrite").parquet(
                    f"{d10}/{t}.parquet")
    for name in ("x_mongo_graphlookup", "x_mongo_window", "x_mongo_merge",
                 "x_mongo_lookup_pipeline", "x_mongo_densify_fill",
                 "x_mongo_expressions", "pipeline_release_e2e"):
        fn = REGISTRY[name].fn
        for label, d in ((f"{name} 1x ", SRC), (f"{name} 10x", d10)):
            run = lambda: fn(spark, d).write.format("noop").mode("overwrite").save()
            run()  # warm
            t0 = time.time()
            run()
            print(f"{label}: {time.time() - t0:.2f}s", flush=True)


if __name__ == "__main__":
    # the probe reads per-stage shuffle metrics via the REST status
    # API, so it needs the UI server that get_spark disables (the r9
    # probe's precedent)
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("scale-probe-r13")
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
    if which in ("all", "skew"):
        build_fixtures(spark)
        probe_composite(spark)
        probe_attribution(spark)
        probe_isolated_control(spark)
    if which in ("all", "new10x"):
        probe_new_entries_10x(spark)
    spark.stop()
