"""Executed server-backed source/sink paths (S1-S3, S11-S12).

The reference's input side is eight MySQL extracts
(`search/dump_genes.js:326-417`) and its output side is Mongo upserts
(`trees/taxonomy.js:48-69`, `search/decorate.js:145-165`).  These tests
execute the engine's equivalents against REAL endpoints available
in-process:

* JDBC — Apache Derby (embedded, ships with Spark for the Hive
  metastore), driven through the same ``io.jdbc_reader`` wrapper used
  for MySQL: buffered scan (S1), partitioned range scan (S2 — the
  cursor-scan replacement), pushed-down query form (S3 — the IN-list
  batcher replacement), and a JDBC write-back.
* Mongo-less upsert — ``io.upsert_parquet_collection`` runs the
  write→merge→swap→re-read cycle with ``upsert_merge`` (S12
  replaceDocument semantics) against a parquet-staged collection.
"""

from __future__ import annotations

import pytest

from gramene_mongodb_spark import io


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    """Create an embedded Derby database with a seeded table, via the
    same JVM Spark's executors run in (local mode shares it)."""
    db = str(tmp_path_factory.mktemp("derby") / "db")
    url = f"jdbc:derby:{db}"
    conn = spark._jvm.java.sql.DriverManager.getConnection(url + ";create=true")
    st = conn.createStatement()
    st.execute(
        "CREATE TABLE genes (id INT PRIMARY KEY, stable_id VARCHAR(32), biotype VARCHAR(16))"
    )
    ps = conn.prepareStatement("INSERT INTO genes VALUES (?, ?, ?)")
    for i in range(1, 101):
        ps.setInt(1, i)
        ps.setString(2, f"GENE{i:04d}")
        ps.setString(3, "protein_coding" if i % 3 else "ncRNA")
        ps.executeUpdate()
    conn.close()
    return url


def test_jdbc_buffered_scan_reads_all_rows(spark, derby_url):
    # S1 — one server-side query, full table
    df = io.jdbc_reader(spark, derby_url, "genes").load()
    assert df.count() == 100
    assert sorted(c.upper() for c in df.columns) == ["BIOTYPE", "ID", "STABLE_ID"]
    got = {r["ID"] for r in df.collect()}
    assert got == set(range(1, 101))


def test_jdbc_partitioned_scan_parallel_ranges(spark, derby_url):
    # S2 — the cursor scan becomes numPartitions parallel range scans
    df = io.jdbc_reader(
        spark, derby_url, "genes",
        partition_column="id", num_partitions=4, lower_bound=1, upper_bound=101,
    ).load()
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 100
    # no row lost or duplicated across range boundaries
    assert df.select("id").distinct().count() == 100


def test_jdbc_query_form_pushes_predicate(spark, derby_url):
    # S3 — the reference's hand-batched IN-list scan is a pushed-down query
    df = io.jdbc_reader(
        spark, derby_url, "SELECT id, stable_id FROM genes WHERE id IN (2, 3, 5, 7)"
    ).load()
    assert {r["ID"] for r in df.collect()} == {2, 3, 5, 7}


def test_jdbc_write_back_round_trip(spark, derby_url):
    # sink side: transformed frame lands in a new table, read back intact
    src = io.jdbc_reader(spark, derby_url, "genes").load()
    out = src.filter("ID <= 10").selectExpr("ID + 1000 AS ID", "STABLE_ID")
    (
        out.write.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "genes_out")
        .mode("overwrite")
        .save()
    )
    back = io.jdbc_reader(spark, derby_url, "genes_out").load()
    assert {r["ID"] for r in back.collect()} == set(range(1001, 1011))


def test_upsert_parquet_collection_matrix(spark, tmp_path):
    # S12 — executed upsert cycle: create, replace-matched, insert-new,
    # pass-through-untouched, explicit-null overwrite
    path = str(tmp_path / "collection")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k INT, v STRING, n INT"
    )
    first = io.upsert_parquet_collection(spark, path, base, "k")
    assert first.count() == 3  # bootstrap: no existing collection

    updates = spark.createDataFrame(
        [(2, "B", None), (4, "d", 40)], "k INT, v STRING, n INT"
    )
    merged = io.upsert_parquet_collection(spark, path, updates, "k")
    rows = {r["k"]: (r["v"], r["n"]) for r in merged.collect()}
    assert rows == {
        1: ("a", 10),      # untouched passes through
        2: ("B", None),    # matched key replaced WHOLESALE incl. explicit null
        3: ("c", 30),
        4: ("d", 40),      # unmatched update row inserted
    }

    # idempotence: replaying the same updates changes nothing
    again = io.upsert_parquet_collection(spark, path, updates, "k")
    assert {r["k"]: (r["v"], r["n"]) for r in again.collect()} == rows
