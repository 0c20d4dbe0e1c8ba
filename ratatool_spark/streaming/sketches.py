"""Streaming sketch maintenance — per-micro-batch mergeable summaries.

The batch sketch tables (operators/timeagg: HLL distinct sketches, KMV
quantile sketches; operators/freq: count-min frequency sketches) answer
"estimate over any union of batches without rescanning them"; this module
produces those tables FROM a stream: each micro-batch writes its own
partial into a ``batch_id=<n>`` directory, and readers merge at query
time. Because every sketch kind here is lossless under merge (HLL
register union; bottom-k of a union == bottom-k of concatenated
bottom-ks; count-min counter addition), the merged estimate equals a
batch build over everything the stream has delivered — the monitoring
loop costs O(micro-batch) per trigger and O(groups · sketch_size) at
read, never a replay.

Restart safety mirrors streaming/dedup.stream_filter_against: foreachBatch
is at-least-once, so each batch overwrites its OWN batch_id directory —
a replayed batch rewrites instead of double-counting (idempotent sink
keyed by batch id). That sink contract lives ONCE in
:func:`_stream_sketch_sink`; each sketch family plugs in only its
per-batch build function.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def _stream_sketch_sink(
    stream_df: DataFrame,
    output_path: str,
    checkpoint: str,
    build_fn: Callable[[DataFrame], DataFrame],
    available_now: bool,
):
    """Shared foreachBatch plumbing: build one sketch partial per
    micro-batch and overwrite its own ``batch_id=<n>`` directory (the
    at-least-once-safe idempotent sink). Returns the started query."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        build_fn(batch_df).write.mode("overwrite").parquet(
            f"{output_path}/batch_id={batch_id}"
        )

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _read_merged(
    spark,
    output_path: str,
    merge_fn: Callable[[DataFrame], DataFrame],
) -> DataFrame:
    """Shared read side: load every batch partial, drop the
    partition-discovery ``batch_id`` column (sink bookkeeping, not a
    group key), and merge.

    Read cost grows with the number of accumulated partials (groups x
    batches rows). For long-lived streams, compact periodically: because
    every merge here is lossless, writing the merged table over a fresh
    base directory and truncating the batch dirs preserves estimates
    exactly — the same partial-compaction move as the rollup tables."""
    return merge_fn(spark.read.parquet(output_path).drop("batch_id"))


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

    return _stream_sketch_sink(
        stream_df,
        output_path,
        checkpoint,
        lambda b: build_quantile_sketches(
            b, group_cols, value_col, key_cols, k=k, seed=seed
        ),
        available_now,
    )


def read_stream_quantile_sketches(spark, output_path: str) -> DataFrame:
    """Merge every micro-batch's KMV partial into one sketch table
    (compaction guidance in :func:`_read_merged`)."""
    from ratatool_spark.operators.timeagg import merge_quantile_sketches

    return _read_merged(spark, output_path, merge_quantile_sketches)


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
    stream (operators/freq.build_freq_sketches per micro-batch).
    Count-min merge is an element-wise counter sum, so the read-side
    merge equals a batch build over everything the stream delivered,
    exactly."""
    from ratatool_spark.operators.freq import build_freq_sketches

    return _stream_sketch_sink(
        stream_df,
        output_path,
        checkpoint,
        lambda b: build_freq_sketches(
            b, group_cols, key_col, depth=depth, width=width, seed=seed
        ),
        available_now,
    )


def read_stream_freq_sketches(spark, output_path: str) -> DataFrame:
    """Merge every micro-batch's count-min partial into one sketch table
    (compaction guidance in :func:`_read_merged` — the merge is exact,
    so periodic compaction preserves estimates)."""
    from ratatool_spark.operators.freq import merge_freq_sketches

    return _read_merged(spark, output_path, merge_freq_sketches)
