"""Exactly-once streaming sinks via idempotent foreachBatch writes.

Structured Streaming guarantees AT-LEAST-ONCE delivery to foreachBatch:
after a failure, the engine replays the last uncommitted micro-batch
with the SAME ``batch_id``. End-to-end exactly-once therefore needs the
sink to be idempotent per batch id — the receiving side must make a
replayed (batch_id, data) write a no-op. This module implements the
standard file-sink recipe:

* each micro-batch writes to ``<path>/batch_id=<id>/`` — a plain
  partitioned-parquet layout, so the result reads back with
  ``spark.read.parquet(path)`` and the batch id is a prunable column;
* a ``_COMMITTED`` marker in the batch directory is written only after
  the parquet write succeeds; a replay that finds the marker SKIPS the
  batch (already fully delivered), and a replay of a half-written batch
  (no marker) overwrites the directory — torn output never survives;
* markers are read and written through the Hadoop ``FileSystem`` API
  resolved from the sink path's scheme, so the protocol honors
  ``hdfs://`` / ``s3a://`` paths exactly like the parquet writes do
  (plain ``os.path`` would silently miss remote markers, turning every
  replay into a rewrite and hiding committed batches from readers);
  create-after-data ordering needs only per-object atomic visibility
  (HDFS create, S3 put), which those stores provide.

This is the parquet twin of the MERGE/upsert recipe a transactional
sink would use (upsert_parquet_collection covers that shape); both turn
at-least-once replays into exactly-once results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_MARKER = "_COMMITTED"


def _fs_and_path(spark: SparkSession, path: str):
    """Resolve (Hadoop FileSystem, Path) for ``path`` under the session's
    Hadoop configuration — the same resolution the parquet writer uses,
    so file:// in tests and hdfs://, s3a:// in deployments all work."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def _active_spark() -> SparkSession:
    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            "committed_ids needs an active SparkSession to resolve the "
            "path's filesystem scheme; pass spark= explicitly"
        )
    return spark


def write_batch_idempotent(df: DataFrame, batch_id: int, path: str) -> bool:
    """Idempotently deliver one micro-batch. Returns True if written,
    False if skipped because this ``batch_id`` was already committed
    (the at-least-once replay case)."""
    spark = df.sparkSession
    batch_dir = f"{path.rstrip('/')}/batch_id={batch_id}"
    fs, marker = _fs_and_path(spark, f"{batch_dir}/{_MARKER}")
    if fs.exists(marker):
        return False
    # overwrite: a torn previous attempt (no marker) is replaced whole
    df.write.mode("overwrite").parquet(batch_dir)
    out = fs.create(marker, True)
    try:
        out.write(bytearray(b"ok\n"))
    finally:
        out.close()
    return True


def committed_ids(path: str, spark: SparkSession | None = None) -> list[int]:
    """Batch ids with a commit marker — the read-side filter that hides
    half-written batches from consumers."""
    spark = spark or _active_spark()
    fs, jpath = _fs_and_path(spark, path)
    if not fs.exists(jpath):
        return []
    out = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if name.startswith("batch_id=") and fs.exists(
            st.getPath().suffix(f"/{_MARKER}")
        ):
            out.append(int(name.split("=", 1)[1]))
    return sorted(out)


def exactly_once_parquet_sink(stream: DataFrame, path: str, checkpoint: str):
    """Attach the idempotent batch writer to a streaming DataFrame.

    Returns the started StreamingQuery. With the engine's checkpoint
    (offsets + commits) plus the per-batch marker, the pipeline is
    exactly-once end-to-end: a crash between the parquet write and the
    engine's commit replays the batch, the marker makes the replay a
    no-op, and readers see each input row's effect exactly once.
    """
    return (
        stream.writeStream.foreachBatch(
            lambda df, bid: (write_batch_idempotent(df, bid, path), None)[1]
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
