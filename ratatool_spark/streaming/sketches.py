"""Streaming sketch maintenance — per-micro-batch mergeable summaries.

The batch sketch tables (operators/timeagg: HLL distinct sketches, KMV
quantile sketches) answer "estimate over any union of batches without
rescanning them"; this module produces those tables FROM a stream: each
micro-batch writes its own partial into a ``batch_id=<n>`` directory, and
readers merge at query time. Because both sketch kinds are lossless under
merge (HLL register union; bottom-k of a union == bottom-k of
concatenated bottom-ks), the merged estimate equals a batch build over
everything the stream has delivered — the monitoring loop costs
O(micro-batch) per trigger and O(groups · sketch_size) at read, never a
replay.

Restart safety mirrors streaming/dedup.stream_filter_against: foreachBatch
is at-least-once, so each batch overwrites its OWN batch_id directory —
a replayed batch rewrites instead of double-counting (idempotent sink
keyed by batch id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stream_quantile_sketches(
    stream_df: DataFrame,
    output_path: str,
    checkpoint: str,
    group_cols: list[str],
    value_col: str,
    key_cols: list[str],
    k: int = 1024,
    seed: int = 0,
    available_now: bool = True,
):
    """Maintain per-batch KMV quantile sketch partials from a stream.

    Read the estimate side with :func:`read_stream_quantile_sketches` —
    it merges every batch's partial (lossless) and the result equals
    ``build_quantile_sketches`` over the concatenated stream input
    (stream==batch parity is test-pinned). Returns the started query.
    """
    from ratatool_spark.operators.timeagg import build_quantile_sketches

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        sk = build_quantile_sketches(
            batch_df, group_cols, value_col, key_cols, k=k, seed=seed
        )
        sk.write.mode("overwrite").parquet(
            f"{output_path}/batch_id={batch_id}"
        )

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_stream_quantile_sketches(spark, output_path: str) -> DataFrame:
    """Merge every micro-batch's sketch partial into one sketch table
    (drops the partition-discovery ``batch_id`` column first — it is sink
    bookkeeping, not a group key).

    Read cost grows with the number of accumulated partials (groups ×
    batches rows). For long-lived streams, compact periodically: because
    the merge is lossless, writing ``merge_quantile_sketches(partials)``
    over a fresh base directory and truncating the batch dirs preserves
    every estimate exactly — the same partial-compaction move as the
    rollup tables."""
    from ratatool_spark.operators.timeagg import merge_quantile_sketches

    parts = spark.read.parquet(output_path).drop("batch_id")
    return merge_quantile_sketches(parts)


def stream_freq_sketches(
    stream_df: DataFrame,
    output_path: str,
    checkpoint: str,
    group_cols: list[str],
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    seed: int = 0,
    available_now: bool = True,
):
    """Maintain per-batch count-min frequency sketch partials from a
    stream (operators/freq.build_freq_sketches per micro-batch, one
    ``batch_id=<n>`` directory each — the same idempotent at-least-once
    sink contract as the quantile path above). Count-min merge is an
    element-wise counter sum, so the read-side merge equals a batch build
    over everything the stream delivered, exactly."""
    from ratatool_spark.operators.freq import build_freq_sketches

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        sk = build_freq_sketches(
            batch_df, group_cols, key_col, depth=depth, width=width, seed=seed
        )
        sk.write.mode("overwrite").parquet(
            f"{output_path}/batch_id={batch_id}"
        )

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_stream_freq_sketches(spark, output_path: str) -> DataFrame:
    """Merge every micro-batch's count-min partial into one sketch table
    (same compaction guidance as :func:`read_stream_quantile_sketches` —
    the merge is exact, so periodic compaction preserves estimates)."""
    from ratatool_spark.operators.freq import merge_freq_sketches

    parts = spark.read.parquet(output_path).drop("batch_id")
    return merge_freq_sketches(parts)
