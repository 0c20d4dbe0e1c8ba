"""Streaming SCD Type-2 maintenance: merge each arriving micro-batch of
changes into a persisted history table with ``operators/scd2.scd2_apply``.

The CDC-consumer shape: a change stream lands (files, Kafka, a CDC
feed), and the dimension history must stay current without rebuilding.
Both sides of the work are incremental:

- COMPUTE: only the batch's own keys re-window (scd2_apply's broadcast
  affected-key split), so per-batch compute is O(batch + touched
  history), not O(history).
- IO: the history table is stored partitioned by a stable key bucket
  (``__bucket = pmod(xxhash64(key), n_buckets)``). A batch touches only
  the buckets its keys hash into, so the read is partition-pruned to
  those directories and the write replaces ONLY them (dynamic partition
  overwrite) — per-batch IO is O(touched buckets), never a full-table
  rewrite. The same layout a transactional format's MERGE would
  cluster on; plain parquet just makes the bucketing explicit.

Storage is LOSSLESS on purpose: version rows are kept UNCOLLAPSED
(``collapse=False`` — one row per change), because collapsing discards
exactly the information an out-of-order batch needs. If changes
(t1,"a"),(t2,"a") were collapsed to one version and a later batch
delivers (t1.5,"b") between them, the t2 "a" version must be
RESURRECTED — impossible once t2's row is gone, trivial when it was
stored. With lossless storage, apply equals a full rebuild for ANY
batching/ordering of the change stream (each key's stored rows ARE its
change set), which is what the gate's oracle (the full-stream rebuild
SQL) certifies. :func:`read_scd2_table` serves the collapsed SCD2 view
by re-windowing at read (partition-prunable; one window pass over what
the reader selects).

Replayed batches (at-least-once delivery) are idempotent: change
identity is (key, ts, change id), and re-delivered rows are dropped by
an identity dedup inside the merge, so re-applying a batch rewrites its
buckets with identical content.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_BUCKET = "__bucket"
_META = "_scd2.json"


def _has_data(data: str) -> bool:
    # dynamic-partition-overwrite commits write no root _SUCCESS marker;
    # presence of any bucket directory is the existence signal
    return bool(glob.glob(os.path.join(data, f"{_BUCKET}=*")))


def read_scd2_table(
    spark: SparkSession, table_path: str, collapse: bool = True
) -> DataFrame:
    """The current history under ``table_path``. ``collapse=True``
    (default) serves the standard SCD2 view — consecutive no-op
    versions merged, intervals recomputed; ``collapse=False`` returns
    the lossless stored rows (one version per change)."""
    from ratatool_spark.operators.scd2 import scd2_history
    from ratatool_spark.sources.shards import _join, _read_text

    data = os.path.join(table_path, "data")
    if not _has_data(data):
        raise FileNotFoundError(f"no scd2 history table under {table_path}")
    raw = spark.read.parquet(data).drop(_BUCKET)
    if not collapse:
        return raw
    meta = json.loads(_read_text(spark, _join(table_path, _META)))
    keys, ts_col, attrs = meta["keys"], meta["ts_col"], meta["attrs"]
    cid = meta.get("change_id")
    changes = raw.select(
        *keys,
        F.col("valid_from").alias(ts_col),
        *attrs,
        *([cid] if cid else []),
    )
    return scd2_history(
        changes, keys, ts_col, attrs, change_id=cid, collapse=True
    )


def stream_scd2(
    stream_df: DataFrame,
    table_path: str,
    checkpoint: str,
    key_cols: str | Sequence[str],
    ts_col: str,
    attr_cols: str | Sequence[str],
    change_id: str | None = None,
    n_buckets: int = 64,
    available_now: bool = True,
):
    """Maintain an SCD2 history table from a change stream. Returns the
    started StreamingQuery; read the result with :func:`read_scd2_table`.

    ``n_buckets`` sizes the partition-pruning granularity: per batch,
    the affected-bucket list (≤ n_buckets values, metadata-scale) is the
    only thing collected to the driver. Size it so one bucket's history
    is a comfortable task read (e.g. 100 TB of history / 4096 buckets ≈
    25 GB per bucket directory, split across its files)."""
    from ratatool_spark.operators.scd2 import scd2_apply, scd2_history
    from ratatool_spark.sources.shards import _join, _write_text

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    attrs = [attr_cols] if isinstance(attr_cols, str) else list(attr_cols)
    spark = stream_df.sparkSession
    data = os.path.join(table_path, "data")

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.withColumn(
            _BUCKET, F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets))
        )
        aff = [r[0] for r in batch_df.select(_BUCKET).distinct().collect()]
        if not aff:
            return
        kw = dict(
            change_id=change_id,
            keep_change_id=bool(change_id),
            collapse=False,  # lossless storage — see module docstring
        )
        if _has_data(data):
            hist = spark.read.parquet(data).where(F.col(_BUCKET).isin(aff))
            new_hist = scd2_apply(
                hist, batch_df, [*keys, _BUCKET], ts_col, attrs,
                drop_duplicate_changes=True, **kw,
            )
        else:
            os.makedirs(table_path, exist_ok=True)
            _write_text(
                spark,
                _join(table_path, _META),
                json.dumps({
                    "keys": keys, "ts_col": ts_col, "attrs": attrs,
                    "change_id": change_id, "n_buckets": n_buckets,
                }),
            )
            new_hist = scd2_history(
                batch_df.dropDuplicates(
                    [*keys, ts_col] + ([change_id] if change_id else [])
                ),
                [*keys, _BUCKET], ts_col, attrs, **kw,
            )
        # one task per touched bucket: without this every shuffle task
        # writes a sliver into every bucket dir (|aff| × shuffle-partitions
        # small files per batch — the exact bloat compaction_plan exists
        # to undo). Then sever lineage from the directory being replaced
        # (the read is lazy; eager localCheckpoint materializes the
        # touched buckets BEFORE dynamic overwrite deletes them).
        out = new_hist.repartition(len(aff), F.col(_BUCKET)).localCheckpoint(
            eager=True
        )
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(_BUCKET)
            .parquet(data)
        )

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
