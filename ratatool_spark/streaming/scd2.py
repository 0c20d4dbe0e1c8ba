"""Streaming SCD Type-2 maintenance: merge each arriving micro-batch of
changes into a persisted history table with ``operators/scd2.scd2_apply``.

The CDC-consumer shape: a change stream lands (files, Kafka, a CDC
feed), and the dimension history must stay current without rebuilding.
Per batch, only the batch's own keys re-window (scd2_apply's broadcast
affected-key split), so compute is O(batch + touched-history), not
O(history). Late and out-of-order changes are handled exactly — apply
equals a full rebuild for ANY batching of the change stream, which is
what the gate's oracle (the full-stream rebuild SQL) certifies.

Sink: plain parquet has no transactional MERGE, so each batch writes a
full history SNAPSHOT to ``<table>/snap=<batch_id>`` (overwrite →
idempotent under at-least-once replay) and readers take the newest
complete snapshot. The snapshot write is the format seam: on a
transactional table format (Delta/Iceberg) the same scd2_apply output
feeds MERGE and the sink becomes incremental too — the COMPUTE side is
already per-affected-key either way. Change ids are kept in the stored
snapshots (``keep_change_id``) so timestamp ties replay in arrival
order across batch boundaries.
"""

from __future__ import annotations

import glob
import os
import re
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def _snapshots(table_path: str) -> list[int]:
    out = []
    for d in glob.glob(os.path.join(table_path, "snap=*")):
        m = re.search(r"snap=(\d+)$", d)
        if m and os.path.exists(os.path.join(d, "_SUCCESS")):
            out.append(int(m.group(1)))
    return sorted(out)


def read_scd2_table(spark: SparkSession, table_path: str) -> DataFrame:
    """The newest complete history snapshot under ``table_path``."""
    snaps = _snapshots(table_path)
    if not snaps:
        raise FileNotFoundError(f"no complete scd2 snapshot under {table_path}")
    return spark.read.parquet(os.path.join(table_path, f"snap={snaps[-1]}"))


def stream_scd2(
    stream_df: DataFrame,
    table_path: str,
    checkpoint: str,
    key_cols: str | Sequence[str],
    ts_col: str,
    attr_cols: str | Sequence[str],
    change_id: str | None = None,
    available_now: bool = True,
):
    """Maintain an SCD2 history table from a change stream. Returns the
    started StreamingQuery; read the result with
    :func:`read_scd2_table`. Replayed batches (at-least-once delivery)
    rebuild from the snapshot BEFORE their own id, so reprocessing is
    idempotent."""
    from ratatool_spark.operators.scd2 import scd2_apply, scd2_history

    spark = stream_df.sparkSession

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        prior = [s for s in _snapshots(table_path) if s < batch_id]
        if prior:
            history = spark.read.parquet(
                os.path.join(table_path, f"snap={prior[-1]}")
            )
            new_hist = scd2_apply(
                history, batch_df, key_cols, ts_col, attr_cols,
                change_id=change_id, keep_change_id=bool(change_id),
            )
        else:
            new_hist = scd2_history(
                batch_df, key_cols, ts_col, attr_cols,
                change_id=change_id, keep_change_id=bool(change_id),
            )
        new_hist.write.mode("overwrite").parquet(
            os.path.join(table_path, f"snap={batch_id}")
        )

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
