"""Streaming ingestion into a snapshot-manifest table
(operators/snapshots): each micro-batch lands as one atomic append
commit, with an exactly-once guard built from the table's own metadata.

The classic sink problem: Structured Streaming's ``foreachBatch`` is
AT-LEAST-ONCE — after a crash between the batch function and the
checkpoint advance, the same (batch_id, data) is delivered again. A
plain directory sink would double those rows. Here the manifest layer
makes idempotence a one-line check: every commit records the
``stream_batch_id`` that produced it, and a replayed batch whose id is
already in the committed ledger is SKIPPED — the commit either
published (and the replay is a no-op) or it didn't (its data files are
unreferenced orphans no reader ever saw, and the replay commits
fresh). Exactly-once table contents from at-least-once delivery, the
same recipe transactional formats document for their streaming sinks.

Scale: the ledger scan reads manifest metadata only (one JSON per
commit); per batch the work is the batch's own write plus one
metadata-scale publish. Readers are isolated from in-flight batches by
the snapshot layer itself, so a 100 TB table serves consistent reads
WHILE the stream appends.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def committed_stream_batches(table_path: str) -> set[int]:
    """Stream batch ids already published into ``table_path`` — the
    idempotency ledger (metadata-scale: reads manifests, never data)."""
    from ratatool_spark.operators.snapshots import _snap_ids, read_manifest

    out: set[int] = set()
    for sid in _snap_ids(table_path):
        b = read_manifest(table_path, sid).get("stream_batch_id")
        if b is not None:
            out.add(int(b))
    return out


def stream_snapshot_append(
    stream_df: DataFrame,
    table_path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Append a stream into a snapshot table, one atomic commit per
    micro-batch, replay-safe. Returns the started StreamingQuery; read
    the result (or any point-in-time prefix of the ingestion) with
    ``operators/snapshots.read_snapshot``."""
    from ratatool_spark.operators.snapshots import commit_append

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in committed_stream_batches(table_path):
            return  # replayed batch: already atomically published
        if batch_df.isEmpty():
            return  # nothing to publish; a replay just re-skips
        commit_append(
            batch_df, table_path, extra={"stream_batch_id": int(batch_id)}
        )

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
