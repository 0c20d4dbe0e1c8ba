"""Streaming drift monitoring — per-micro-batch bin partials, PSI on read.

The production drift loop: bin the REFERENCE snapshot once with a fixed
binning spec (``operators/profile.fixed_bins``), then let the stream
maintain live bin-count partials per micro-batch; at any moment,
:func:`read_stream_drift` merges the partials (count addition — lossless
under any batch split, replay-safe under the idempotent batch_id sink)
and scores PSI per column against the reference. Because the spec is
fixed (explicit numeric bounds, raw categorical values), a partial from
any micro-batch is mergeable — the same contract as the streaming
sketch tables, reusing their sink plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ratatool_spark.streaming.sketches import _read_merged, _stream_sketch_sink


def stream_drift_bins(
    stream_df: DataFrame,
    output_path: str,
    checkpoint: str,
    categorical: list[str] | None = None,
    numeric_bounds: dict | None = None,
    n_buckets: int = 10,
    available_now: bool = True,
):
    """Maintain fixed-spec bin-count partials from a stream (one partial
    per micro-batch, idempotent ``batch_id`` sink). Returns the started
    query; score with :func:`read_stream_drift`."""
    from ratatool_spark.operators.profile import fixed_bins

    return _stream_sketch_sink(
        stream_df,
        output_path,
        checkpoint,
        lambda b: fixed_bins(
            b,
            categorical=categorical,
            numeric_bounds=numeric_bounds,
            n_buckets=n_buckets,
        ),
        available_now,
    )


def read_stream_drift(
    spark,
    output_path: str,
    ref_bins: DataFrame,
    smoothing: float = 0.5,
) -> DataFrame:
    """Merge every micro-batch's bin partial and score PSI per column
    against ``ref_bins`` (a :func:`fixed_bins` table computed once on
    the reference snapshot). Merged live counts equal a single batch
    binning of everything the stream delivered — stream==batch parity
    is what the oracle gate pins."""
    from ratatool_spark.operators.profile import psi_from_bins

    live = _read_merged(spark, output_path, lambda df: df)
    return psi_from_bins(ref_bins, live, smoothing=smoothing)
