"""End-to-end genes decoration pipeline — the reference's flagship
(SURVEY.md §3.1): gene docs → LUT decorations (J1/J2/J3) → canonical
transcript (A5/W5) → xref grouping (A1) → binning (K10) → ancestor
annotation split (U3/K7) → empty-pruned JSONL sink (P3/S13).

One composed lazy plan over the FIXTURES.md §1-§3 shapes: the Spark
restatement of the 16-stage through2 chain in `search/decorate.js:167-194`.
"""

from __future__ import annotations

import glob
import json

import pytest
from pyspark.sql import functions as F

from gramene_mongodb_spark import io
from gramene_mongodb_spark.operators import documents as DOC
from gramene_mongodb_spark.operators import genomics as G
from gramene_mongodb_spark.operators import relational as R
from gramene_mongodb_spark.operators.closure import (
    ancestor_arrays,
    most_specific,
    transitive_closure,
)

GENE_SCHEMA = (
    "_id STRING, name STRING, description STRING, taxon_id BIGINT, "
    "region STRING, start BIGINT, strand INT, synonyms ARRAY<STRING>, "
    "transcripts ARRAY<STRUCT<id STRING, length BIGINT, "
    "translation STRUCT<id STRING, length BIGINT>>>"
)

GENES = [
    ("G1", None, "kinase", 3702, "1", 100, 1, ["a"],
     [("t1", 500, ("p1", 100)), ("t2", 400, ("p2", 200))]),
    ("G2", "gene-two", None, 3702, "2", 900, -1, None,
     [("t3", 300, None)]),
]

ID_LUT = [  # FIXTURES §2: '-' sentinels, case-variant key
    ("G1", "OLD1", "old-name-1", "Uncharacterized protein"),
    ("g2", "OLD2", "-", "real description"),
]

XREFS = [
    ("G1", "GO", "GO:0001", "IEA"), ("G1", "GO", "GO:0002", "IDA"),
    ("G1", "UniProt", "P1", None), ("G2", "GO", "GO:0002", "ISS"),
]

TERM_EDGES = [(2, 1), (3, 2)]  # GO:0002 is_a GO:0001; GO:0003 is_a GO:0002

ANNOS = [("G1", 1), ("G1", 2), ("G2", 2)]  # G1 has term+ancestor → U3 drops 1

MAPS = [("asm", 3702, "Ara", (["1", "2"], [1000, 1000]))]


@pytest.fixture(scope="module")
def pipeline_output(spark, tmp_path_factory):
    genes = spark.createDataFrame(GENES, GENE_SCHEMA)
    lut = spark.createDataFrame(
        ID_LUT, "new_id STRING, old_id STRING, old_name STRING, old_description STRING"
    )
    # '-' sentinels → null (the fix_* TSV convention)
    for c in ("old_id", "old_name", "old_description"):
        lut = lut.withColumn(c, F.when(F.col(c) == "-", None).otherwise(F.col(c)))

    # J2: exact-then-uppercase id-history decoration
    decorated = R.ci_fallback_join(genes, lut, "_id", "new_id")
    # defaulting + synonym merge (J1/J3 semantics)
    decorated = decorated.withColumn(
        "name", F.coalesce(F.col("name"), F.col("old_name"), F.col("_id"))
    ).withColumn(
        "description",
        F.coalesce(  # reference keeps existing desc, backfills from history
            F.col("description"),
            F.when(~F.col("old_description").rlike("(?i)uncharacterized"),
                   F.col("old_description")),
        ),
    ).withColumn(
        "synonyms",
        F.array_sort(
            F.array_distinct(
                F.concat(
                    F.coalesce(F.col("synonyms"), F.array()),
                    F.filter(F.array(F.col("old_id")), lambda x: x.isNotNull()),
                )
            )
        ),
    ).drop("old_id", "old_name", "old_description")

    # A5 + W5: canonical transcript
    decorated = DOC.canonical_first(DOC.select_canonical_transcript(decorated))

    # A1: xref grouping
    xr = spark.createDataFrame(XREFS, "gene_id STRING, db STRING, xref_id STRING, evidence STRING")
    decorated = decorated.join(
        DOC.group_xrefs(xr).withColumnRenamed("gene_id", "_id"), "_id", "left"
    )

    # K10: genome binning
    maps = spark.createDataFrame(MAPS, "_id STRING, taxon_id BIGINT, display_name STRING, "
                                       "regions STRUCT<names ARRAY<STRING>, lengths ARRAY<BIGINT>>")
    offs = G.region_offsets(maps)
    decorated = G.assign_bins(decorated, offs, fixed_counts=(10,), widths_mb=(1,))

    # U3 + K7: most-specific annotation split + ancestors
    edges = spark.createDataFrame(TERM_EDGES, "child BIGINT, parent BIGINT")
    closure = transitive_closure(edges)
    annos = spark.createDataFrame(ANNOS, "_id STRING, term BIGINT")
    entries = (
        most_specific(annos, closure, "_id", "term")
        .groupBy("_id").agg(F.array_sort(F.collect_set("term")).alias("annotation_entries"))
    )
    implied = (
        annos.join(closure, annos["term"] == closure["node"])
        .groupBy("_id").agg(F.array_sort(F.collect_set("ancestor")).alias("annotation_ancestors"))
    )
    decorated = decorated.join(entries, "_id", "left").join(implied, "_id", "left")

    # P3 + S13: pruned JSONL sink
    out = str(tmp_path_factory.mktemp("pipeline") / "genes")
    io.write_jsonl(DOC.nullify_empties(decorated), out)
    docs = []
    for f in glob.glob(f"{out}/part-*"):
        docs += [json.loads(l) for l in open(f) if l.strip()]
    return {d["_id"]: d for d in docs}


def test_pipeline_decoration(pipeline_output):
    g1, g2 = pipeline_output["G1"], pipeline_output["G2"]
    assert g1["name"] == "old-name-1"            # backfilled from LUT
    assert g1["description"] == "kinase"          # own desc kept
    assert "Uncharacterized" not in str(g1)       # bad history desc rejected
    assert g1["synonyms"] == ["OLD1", "a"]        # J3 concat+dedup+sort
    assert g2["name"] == "gene-two"
    assert g2["description"] == "real description"  # J2 case-fallback hit
    assert g2["synonyms"] == ["OLD2"]


def test_pipeline_canonical_transcript(pipeline_output):
    g1 = pipeline_output["G1"]
    assert g1["canonical_transcript"] == "t2"     # longest translation
    assert g1["transcripts"][0]["id"] == "t2"     # W5 reorder


def test_pipeline_bins(pipeline_output):
    assert pipeline_output["G1"]["bin_fixed_10"] == 0    # pos 100 / 2000
    assert pipeline_output["G2"]["bin_fixed_10"] == 9    # pos 1900 / 2000


def test_pipeline_annotations(pipeline_output):
    g1 = pipeline_output["G1"]
    assert g1["annotation_entries"] == [2]        # ancestor term 1 dropped (U3)
    assert g1["annotation_ancestors"] == [1]
    assert pipeline_output["G2"]["annotation_entries"] == [2]


def test_pipeline_empty_pruning(pipeline_output):
    # G2 had no xrefs → field absent in the sink doc, not null/[]
    assert "xrefs" not in pipeline_output["G2"] or pipeline_output["G2"]["xrefs"]


# ---------------------------------------------------------------------------
# §3 release DAG — stage ordering is load-bearing (VERDICT r12 ask #2)
# ---------------------------------------------------------------------------

SF001 = "/root/testdata/sf0.001"


def test_release_dag_order_is_load_bearing(spark, tmp_path):
    """Every stage reads earlier stages' STAGED parquet, so any
    out-of-order prefix fails LOUDLY on the missing path — the DAG's
    ordering contract (never silent wrong data). The correct order runs
    end-to-end and the composed entry equals the hand-sequenced run."""
    from pyspark.errors import AnalysisException

    from gramene_mongodb_spark.pipelines import (
        RELEASE_ORDER, RELEASE_STAGES, release_e2e,
    )

    # dependency edges: stage -> earliest stage whose output it reads
    wrong_prefixes = [
        ("genes",),                       # needs staged taxonomy
        ("homologs",),                    # needs staged genes_raw
        ("publish",),                     # needs staged genes_decorated
        ("taxonomy", "decorate"),         # decorate also needs genes+homologs
        ("taxonomy", "genes", "decorate"),  # still missing homolog_counts
    ]
    for prefix in wrong_prefixes:
        d = str(tmp_path / ("wrong_" + "_".join(prefix)))
        with pytest.raises(AnalysisException):
            for name in prefix:
                out = RELEASE_STAGES[name](spark, SF001, d)
                if name == "publish":
                    out.collect()

    # the declared order is exactly the topological order: run it by
    # hand and compare to the composed entry
    d = str(tmp_path / "ok")
    for name in RELEASE_ORDER[:-1]:
        RELEASE_STAGES[name](spark, SF001, d)
    manual = RELEASE_STAGES["publish"](spark, SF001, d)
    composed = release_e2e(spark, SF001)
    m = {r["taxon_id"]: (r["n_genes"], r["n_orders"], r["n_homologs"])
         for r in manual.collect()}
    c = {r["taxon_id"]: (r["n_genes"], r["n_orders"], r["n_homologs"])
         for r in composed.collect()}
    assert m == c and len(m) > 30
    # the ordering PROOF: a root-level count only correct if gene totals
    # flowed taxonomy -> genes -> homologs -> decorate -> publish
    root_genes = m[999][0]
    n_cust = spark.read.parquet(f"{SF001}/customer.parquet").count()
    assert root_genes == n_cust


def test_decorate_transcript_skew_guard_fires(spark, tmp_path):
    """The r13 skew probe showed per-gene ARRAY stages are the one
    composite shape a hot key can serialize (17.4s vs 2.8s at orders×10;
    AQE cannot split per-row work) — so the decorate pipeline refuses
    loudly when transcripts-per-gene exceeds the 10k domain bound
    instead of melting a reducer. Corrupt fixture: every order row
    remapped to one customer."""
    from pyspark.errors import SparkRuntimeException

    from gramene_mongodb_spark import catalog

    d = str(tmp_path / "skewed_sf")
    orders = spark.read.parquet(f"{SF001}/orders.parquet")
    reps = spark.range(8).withColumnRenamed("id", "__rep")
    (orders.crossJoin(reps)
     .withColumn("o_orderkey", F.col("o_orderkey") + F.col("__rep") * 10_000_000)
     .withColumn("o_custkey", F.lit(1).cast(dict(orders.dtypes)["o_custkey"]))
     .drop("__rep")
     .write.mode("overwrite").parquet(f"{d}/orders.parquet"))
    spark.read.parquet(f"{SF001}/customer.parquet").write.mode(
        "overwrite").parquet(f"{d}/customer.parquet")

    with pytest.raises(SparkRuntimeException, match="domain bound"):
        catalog.pipeline_genes_decorate(spark, d).write.format("noop").mode(
            "overwrite").save()


def test_release_dag_resume_skips_fresh_stages(spark, tmp_path):
    """Resume semantics (the 100 TB retry story): a second run over
    unchanged inputs re-runs NOTHING; deleting one staged output
    re-runs exactly that stage plus its downstream chain; a perturbed
    (stale) manifest likewise invalidates its suffix; the resumed
    result equals the fresh one."""
    import json
    import shutil

    from gramene_mongodb_spark.pipelines import (
        _manifest_path, release_e2e_resumable,
    )

    d = str(tmp_path / "stage")
    df1, ran1 = release_e2e_resumable(spark, SF001, d)
    assert ran1 == ["taxonomy", "genes", "homologs", "decorate"]
    base = {r["taxon_id"]: (r["n_genes"], r["n_orders"], r["n_homologs"])
            for r in df1.collect()}

    _, ran2 = release_e2e_resumable(spark, SF001, d)
    assert ran2 == []  # everything fresh → nothing re-runs

    # kill one mid-DAG output: exactly that stage re-runs. Downstream
    # stays skipped — fingerprints key on LOGICAL inputs (code +
    # upstream fingerprints), and the regenerated parquet is
    # bit-identical in content, so decorate's staged output is still
    # valid. Only a code/input change (below) invalidates the suffix.
    shutil.rmtree(f"{d}/homolog_counts")
    df3, ran3 = release_e2e_resumable(spark, SF001, d)
    assert ran3 == ["homologs"]
    got = {r["taxon_id"]: (r["n_genes"], r["n_orders"], r["n_homologs"])
           for r in df3.collect()}
    assert got == base

    # a perturbed stored manifest re-runs ONLY that stage: downstream
    # fingerprints chain off the RECOMPUTED upstream fingerprint (same
    # code + same inputs → same value), so the re-run is recognized as
    # producing identical content
    m = _manifest_path(d, "taxonomy")
    doc = json.loads(open(m).read())
    doc["fingerprint"] = "0" * 64
    open(m, "w").write(json.dumps(doc))
    _, ran4 = release_e2e_resumable(spark, SF001, d)
    assert ran4 == ["taxonomy"]

    # a REAL input change (base-table mtime flips — the regenerated-
    # testdata event) invalidates every stage that reads it plus the
    # chained downstream suffix: everything re-runs
    import os
    import time

    mut_sf = str(tmp_path / "sf")
    os.makedirs(mut_sf)
    for t in ("nation", "region", "customer", "orders"):
        src = f"{SF001}/{t}.parquet"
        dst = f"{mut_sf}/{t}.parquet"
        (shutil.copytree if os.path.isdir(src) else shutil.copy)(src, dst)
    d2 = str(tmp_path / "stage2")
    _, first = release_e2e_resumable(spark, mut_sf, d2)
    assert len(first) == 4
    cust = f"{mut_sf}/customer.parquet"
    os.utime(cust, (time.time() + 5, time.time() + 5))
    _, again = release_e2e_resumable(spark, mut_sf, d2)
    assert again == ["taxonomy", "genes", "homologs", "decorate"]


def test_release_dag_crash_resume(spark, tmp_path, monkeypatch):
    """Nineteenth scale probe's correctness twin (VERDICT r13 ask #6):
    a release KILLED mid-DAG — after stage 3 (homologs) completes,
    during stage 4 (decorate) — resumes by re-running ONLY the suffix:
    stages 1-3 are skipped via manifest fingerprint hit, and the final
    summary equals the uninterrupted control run's. This is the crash
    case the retryable barriers exist for; the other invalidation
    paths (deleted output, perturbed manifest, changed inputs) are
    pinned in test_release_dag_resume_skips_fresh_stages."""
    import os

    from gramene_mongodb_spark import pipelines as P

    # uninterrupted control
    d0 = str(tmp_path / "control")
    df0, ran0 = P.release_e2e_resumable(spark, SF001, d0)
    assert ran0 == ["taxonomy", "genes", "homologs", "decorate"]
    want = {r["taxon_id"]: (r["n_genes"], r["n_orders"], r["n_homologs"])
            for r in df0.collect()}

    # crash during stage 4 — stages 1-3 have committed their
    # parquet + manifest barriers, decorate has not
    d = str(tmp_path / "stage")
    real_decorate = P.RELEASE_STAGES["decorate"]

    def boom(*a, **k):
        raise RuntimeError("simulated mid-release crash")

    monkeypatch.setitem(P.RELEASE_STAGES, "decorate", boom)
    with pytest.raises(RuntimeError, match="simulated mid-release"):
        P.release_e2e_resumable(spark, SF001, d)
    for done in ("taxonomy", "genes", "homologs"):
        assert os.path.exists(P._manifest_path(d, done)), done
    assert not os.path.exists(P._manifest_path(d, "decorate"))

    # resume with the real stage back: 1-3 skip on fingerprint hit
    monkeypatch.setitem(P.RELEASE_STAGES, "decorate", real_decorate)
    df, ran = P.release_e2e_resumable(spark, SF001, d)
    assert ran == ["decorate"], f"prefix was not skipped: {ran}"
    got = {r["taxon_id"]: (r["n_genes"], r["n_orders"], r["n_homologs"])
           for r in df.collect()}
    assert got == want
