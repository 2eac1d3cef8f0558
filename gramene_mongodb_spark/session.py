"""SparkSession factory.

Centralizes the configuration every entry point (tests, bench, driver
verify) needs:

* UTC session timezone — Spark timestamps are session-TZ while DuckDB's
  are UTC-naive; pinning UTC makes oracle comparisons exact.
* AQE on — runtime re-planning (auto broadcast, skew-join splitting,
  partition coalescing) is the scale story for 100 TB: plans written here
  are declarative and AQE picks physical parameters per stage.
* ``spark.sql.shuffle.partitions`` sized to the local core count for test
  runs; on a real cluster this is superseded by AQE coalescing
  (``spark.sql.adaptive.coalescePartitions.enabled``).
* Arrow enabled — every pandas-UDF kernel (SURVEY.md §2.10) transfers
  batches via Arrow, not pickled rows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "gramene-spark", master: str | None = None) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    for local runs; on a cluster, leave it unset and let spark-submit
    provide the master.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # parquet TIMESTAMP(NANOS) (written by modern arrow/duckdb) is not a
        # Spark type; read it as long and convert in io.load_table
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    return builder.getOrCreate()
