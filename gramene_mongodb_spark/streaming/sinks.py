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
* the marker protocol assumes what real deployments have: a rename/put
  that is atomic per object (HDFS rename, S3 put). Readers who must not
  see uncommitted batches filter on the marker set (``committed_ids``).

This is the parquet twin of the MERGE/upsert recipe a transactional
sink would use (upsert_parquet_collection covers that shape); both turn
at-least-once replays into exactly-once results.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def write_batch_idempotent(df: DataFrame, batch_id: int, path: str) -> bool:
    """Idempotently deliver one micro-batch. Returns True if written,
    False if skipped because this ``batch_id`` was already committed
    (the at-least-once replay case)."""
    batch_dir = os.path.join(path, f"batch_id={batch_id}")
    marker = os.path.join(batch_dir, "_COMMITTED")
    if os.path.exists(marker):
        return False
    # overwrite: a torn previous attempt (no marker) is replaced whole
    df.write.mode("overwrite").parquet(batch_dir)
    with open(marker, "w") as fh:
        fh.write("ok\n")
    return True


def committed_ids(path: str) -> list[int]:
    """Batch ids with a commit marker — the read-side filter that hides
    half-written batches from consumers."""
    out = []
    if not os.path.isdir(path):
        return out
    for name in os.listdir(path):
        if name.startswith("batch_id=") and os.path.exists(
            os.path.join(path, name, "_COMMITTED")
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
