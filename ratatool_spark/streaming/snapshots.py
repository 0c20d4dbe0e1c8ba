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
        b = read_manifest(table_path, sid, load_files=False).get(
            "stream_batch_id"
        )
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


def stream_snapshot_source(
    spark,
    table_path: str,
    process,
    checkpoint: str,
    available_now: bool = True,
    max_commits_per_trigger: int | None = None,
):
    """Structured-Streaming SOURCE over a snapshot table — the read half
    of the loop whose write half is :func:`stream_snapshot_append`. A
    downstream pipeline subscribes to a table and receives each APPEND
    commit's added rows exactly once, as they publish.

    Mechanism: the manifest directory IS a stream. Every commit
    publishes exactly one immutable ``snapshots/v{N}.json``, so a plain
    file-source stream over that directory delivers each snapshot id to
    exactly one micro-batch, with Spark's own file-source checkpoint as
    the replay ledger — no bespoke offset tracking. The manifest CONTENT
    is not shipped through the stream (it may be externalized to a
    parquet sidecar on large tables); the stream carries only the
    NAMES, and the batch hook resolves each id against the table and
    reads the commit's added data files JVM-side with the manifest's
    schema. Per micro-batch, ``process(df, snapshot_id)`` fires once per
    new APPEND commit, in snapshot order; replace/evolve maintenance
    commits and merge-on-read commits are skipped, same contract as
    ``snapshot_changes`` (row-level consumers poll
    ``snapshot_change_feed`` instead).

    ``max_commits_per_trigger`` bounds each micro-batch (the Delta
    ``maxFilesPerTrigger`` / Iceberg ``streaming-max-files-per-
    micro-batch`` throttle): exactly one manifest file publishes per
    commit, so the file source's ``maxFilesPerTrigger`` maps 1:1 onto
    commits — a consumer catching up over a long backlog processes it
    in bounded, checkpointed steps instead of one giant batch.

    Schema-evolution note: each commit's added files are read with THAT
    commit's schema (files written at commit N carry N's schema by the
    write-path invariant), so a consumer observes a rename/widen at
    exactly the commit where it published — per-commit frames are
    always internally consistent.

    Scale: the streamed files are metadata (one small JSON per commit);
    data IO is exactly the added files of each commit, read once.
    Caveat shared with every log-tailing source: snapshots must not
    EXPIRE before the consumer has seen them — retention must exceed
    consumer lag, or the resolve step raises
    :class:`operators.snapshots.SnapshotExpired` telling the operator
    to widen retention or rebase the consumer on a full read."""
    import os

    from pyspark.sql import functions as F

    from ratatool_spark.operators.snapshots import (
        _SNAP_DIR,
        SnapshotExpired,
        read_manifest,
    )

    from pyspark.sql.types import StructType
    import json as _json

    snap_dir = os.path.join(table_path, _SNAP_DIR)
    reader = spark.readStream.format("text").option(
        "pathGlobFilter", "v*.json"
    )
    if max_commits_per_trigger is not None:
        if max_commits_per_trigger < 1:
            raise ValueError("max_commits_per_trigger must be >= 1")
        reader = reader.option("maxFilesPerTrigger", max_commits_per_trigger)
    stream = reader.load(snap_dir)

    def _batch(batch_df, batch_id: int) -> None:
        names = [
            r[0]
            for r in batch_df.select(F.input_file_name()).distinct().collect()
        ]
        sids = sorted(
            int(os.path.basename(n)[1:-5])
            for n in names
            if os.path.basename(n).startswith("v")
        )
        # a batch usually delivers CONSECUTIVE commits: memoize each
        # manifest's path set so sid's parent lookup reuses sid-1's read
        # instead of re-materializing it (externalized manifests make a
        # redundant read a real sidecar parse, not a dict lookup)
        path_sets: dict[int, set[str]] = {}

        def _paths_of(s: int) -> set[str]:
            if s not in path_sets:
                path_sets[s] = {
                    e["path"] for e in read_manifest(table_path, s)["files"]
                }
            return path_sets[s]

        for sid in sids:
            try:
                m = read_manifest(table_path, sid)
                path_sets[sid] = {e["path"] for e in m["files"]}
                if m["operation"] != "append":
                    continue
                prev_paths: set[str] = set()
                if m["parent"] is not None:
                    prev_paths = _paths_of(m["parent"])
            except FileNotFoundError as e:
                # the commit (or its parent baseline) expired between
                # publish and this consumer's poll — the delta is gone
                raise SnapshotExpired(
                    f"snapshot {sid} (or its parent) expired before this "
                    f"consumer processed it under {table_path} — widen "
                    "snapshot retention past consumer lag, or rebase the "
                    "consumer: full read_snapshot() + fresh checkpoint"
                ) from e
            added = [e["path"] for e in m["files"] if e["path"] not in prev_paths]
            if not added:
                continue
            gone = [
                p for p in added
                if not os.path.exists(os.path.join(table_path, p))
            ]
            if gone:
                # manifest survived but a later rewrite + expiry already
                # reclaimed the data — the same retention race, caught
                # before a partial read can emit a short batch
                raise SnapshotExpired(
                    f"snapshot {sid}'s data files were expired before this "
                    f"consumer processed them under {table_path} "
                    f"(e.g. {gone[0]}) — widen snapshot retention past "
                    "consumer lag, or rebase the consumer"
                )
            schema = StructType.fromJson(_json.loads(m["schema"]))
            df = spark.read.schema(schema).parquet(
                *[os.path.join(table_path, p) for p in added]
            )
            process(df, sid)

    writer = stream.writeStream.foreachBatch(_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def mirrored_source_snapshots(table_path: str) -> set[int]:
    """Source snapshot ids already replayed into ``table_path`` by
    :func:`stream_snapshot_mirror` — the downstream idempotency ledger."""
    from ratatool_spark.operators.snapshots import _snap_ids, read_manifest

    out: set[int] = set()
    for sid in _snap_ids(table_path):
        b = read_manifest(table_path, sid, load_files=False).get(
            "source_snapshot_id"
        )
        if b is not None:
            out.add(int(b))
    return out


def stream_snapshot_mirror(
    spark,
    src_table: str,
    dst_table: str,
    checkpoint: str,
    available_now: bool = True,
):
    """table → stream → table: every append commit of ``src_table``
    replays as ONE atomic append commit of ``dst_table``, closing the
    loop (a snapshot table is now both a streaming sink AND a streaming
    source, so pipelines chain end to end through tables). Exactly-once
    twice over: the file-source checkpoint delivers each source manifest
    once, and the destination's ``source_snapshot_id`` ledger makes even
    a re-delivery under a FRESH checkpoint a no-op — the same
    manifest-as-ledger recipe as :func:`stream_snapshot_append`."""
    from ratatool_spark.operators.snapshots import commit_append

    # the ledger is read ONCE per mirror run (O(dst commits)) and kept
    # current with our own commits — re-scanning every dst manifest per
    # replayed commit would make mirroring N commits O(N^2) metadata
    # reads. The ledger only grows, and within a run this mirror is the
    # only writer of source_snapshot_id rows, so the cache never says
    # "missing" for an id the table already has.
    ledger: dict = {"ids": None}

    def _replay(df, src_sid: int) -> None:
        if ledger["ids"] is None:
            ledger["ids"] = mirrored_source_snapshots(dst_table)
        if src_sid in ledger["ids"]:
            return
        commit_append(
            df, dst_table, extra={"source_snapshot_id": int(src_sid)}
        )
        ledger["ids"].add(int(src_sid))

    return stream_snapshot_source(
        spark, src_table, _replay, checkpoint, available_now=available_now
    )
