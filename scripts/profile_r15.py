#!/usr/bin/env python
"""Round-15 optimization profiler (guide §1: measure first).

For each headline query, split the wall into:
  * build   — Python-side DataFrame construction (catalog fn call)
  * analyze — first touch of df.schema (Catalyst analysis)
  * exec    — noop write (optimize + physical plan + run)
and extract plan-shape counters from explain("formatted"):
Exchange count, Python-eval nodes, join strategies, scan count.

Writes plans to plans/r15/<name>_<tag>.txt and a JSON summary to
/tmp/profile_r15_<tag>.json.  Usage:

  python scripts/profile_r15.py <tag> [query,query,...]
"""
from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    subset = sys.argv[2].split(",") if len(sys.argv) > 2 else None

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench
    from gramene_mongodb_spark.catalog import REGISTRY
    from gramene_mongodb_spark.session import get_spark

    spark = get_spark("gramene-spark-profile")
    spark.sparkContext.setLogLevel("ERROR")

    names = subset or bench.HEADLINE
    plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15")
    os.makedirs(plans_dir, exist_ok=True)

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # warm-up (same as bench.py)
    run(REGISTRY["q01_pricing_summary"].fn(spark, "/root/testdata/sf0.001"))
    run(REGISTRY["k7_closure_ancestors"].fn(spark, "/root/testdata/sf0.001"))

    out: dict[str, dict] = {}
    for name in names:
        fn = REGISTRY[name].fn
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        _ = df.schema  # force analysis
        t2 = time.perf_counter()
        run(df)
        t3 = time.perf_counter()
        # second exec on a FRESH build: steady-state exec cost
        df2 = fn(spark, sf_dir)
        t4 = time.perf_counter()
        run(df2)
        t5 = time.perf_counter()

        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        shape = {
            "exchanges": len(re.findall(r"\bExchange\b", plan)),
            "python_eval": len(re.findall(r"(BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|MapInArrow)", plan)),
            "smj": plan.count("SortMergeJoin"),
            "bhj": plan.count("BroadcastHashJoin"),
            "shj": plan.count("ShuffledHashJoin"),
            "bnlj": plan.count("BroadcastNestedLoopJoin"),
            "cartesian": plan.count("CartesianProduct"),
            "scans": plan.count("Scan parquet"),
            "sorts": len(re.findall(r"\bSort\b", plan)),
            "plan_chars": len(plan),
        }
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        rec = {
            "build_s": round(t1 - t0, 3),
            "analyze_s": round(t2 - t1, 3),
            "exec1_s": round(t3 - t2, 3),
            "build2_s": round(t4 - t3, 3),
            "exec2_s": round(t5 - t4, 3),
            **shape,
        }
        out[name] = rec
        print(f"{name}: build {rec['build_s']}s analyze {rec['analyze_s']}s "
              f"exec1 {rec['exec1_s']}s exec2 {rec['exec2_s']}s "
              f"exch {shape['exchanges']} py {shape['python_eval']} "
              f"smj {shape['smj']} bhj {shape['bhj']}", flush=True)
        spark.sparkContext.setJobDescription(None)

    with open(f"/tmp/profile_r15_{tag}.json", "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    tot = sum(r["exec2_s"] + r["build2_s"] for r in out.values())
    print(f"TOTAL build2+exec2: {tot:.1f}s over {len(out)} queries")
    spark.stop()


if __name__ == "__main__":
    main()
