"""Round-9 (cont.) scaling probe: the trained-classifier loop + PMI +
DSIR at 10x the documents.

Replicates the sf0.1 documents table 10x with shifted doc_ids (written
to parquet so scans are real), then times each new operator at 1x and
10x. What the factors should show:

- nb_classify: counts aggregate map-side (vocab x class keys are
  FIXED while occurrences grow 10x), the model join keys on token,
  the argmin window keys on doc — everything per-key-bounded, so the
  factor should sit well under linear.
- dsir: ONE 128-key count shuffle + a broadcast join — near-flat.
- pmi: bigram count combines map-side onto a fixed vocabulary-sized
  key space — near-flat after the scan cost.
- auc: group-keyed windows; rows per group grow 10x, local sorts
  absorb it.

Usage: python scripts/scale_probe_r9b.py   (from the repo root)
Results recorded in SCALE.md "Measured scaling".
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gramene_mongodb_spark.operators import textops as T
from gramene_mongodb_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
REP = "/tmp/probe_r9b_docs10.parquet"


def timed(label, fn, runs=3):
    best = None
    for _ in range(runs):
        t0 = time.time()
        fn()
        best = min(best or 9e9, time.time() - t0)
    print(f"{label}: {best:.2f}s")
    return best


def run_ops(spark, docs, tag):
    res = {}

    def nb():
        train = docs.filter(F.col("doc_id") % 10 < 8)
        test = docs.filter(F.col("doc_id") % 10 >= 8)
        model, prior = T.nb_train(train, "text", "lang")
        T.nb_classify(test, model, prior).write.format("noop").mode(
            "overwrite"
        ).save()

    def dsir():
        T.dsir_weights(docs, F.col("lang") == "en").write.format("noop").mode(
            "overwrite"
        ).save()

    def pmi():
        T.pmi_collocations(docs, "text", 5, 50).write.format("noop").mode(
            "overwrite"
        ).save()

    def auc():
        T.auc_eval(
            T.classifier_score(docs), "source", "clf_score",
            F.col("lang") == "en",
        ).write.format("noop").mode("overwrite").save()

    res["nb_classify"] = timed(f"nb_classify {tag}", nb)
    res["dsir"] = timed(f"dsir {tag}", dsir)
    res["pmi"] = timed(f"pmi {tag}", pmi)
    res["auc"] = timed(f"auc {tag}", auc)
    return res


def main():
    spark = get_spark("scale-probe-r9b")
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    n1 = docs.count()

    if not os.path.exists(REP):
        parts = [
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
            for i in range(10)
        ]
        rep = parts[0]
        for p in parts[1:]:
            rep = rep.unionByName(p)
        rep.repartition(32).write.mode("overwrite").parquet(REP)
    docs10 = spark.read.parquet(REP)
    n10 = docs10.count()
    print(f"documents: {n1} -> {n10}")

    r1 = run_ops(spark, docs, "1x")
    r10 = run_ops(spark, docs10, "10x")
    print("\n| operator | sf0.1 | 10x | factor |")
    print("|---|---|---|---|")
    for k in r1:
        print(f"| {k} | {r1[k]:.2f}s | {r10[k]:.2f}s | {r10[k]/r1[k]:.1f} |")
    spark.stop()


if __name__ == "__main__":
    main()
