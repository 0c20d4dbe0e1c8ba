"""Streaming deduplication — the training-data ingest shapes.

Batch dedup (operators/dedup.py) answers "collapse this corpus"; ingest
pipelines also need "never admit a duplicate twice" over an unbounded
stream. Two built-in shapes:

  - exact, bounded state: ``dropDuplicatesWithinWatermark`` on the content
    fingerprint — state holds one row per distinct fingerprint seen within
    the watermark horizon, evicted as event time passes. The horizon is
    the dedup contract: re-sends farther apart than the watermark are
    admitted again (at-least-once ingest upstream of exact batch dedup).
  - deterministic sampling on a stream: the hash-dice filter
    (operators/sampler.py) is stateless, so the SAME sample() plan runs
    unchanged on a readStream — cohort membership is a pure function of
    the record, which is what makes a sampled stream joinable with a
    sampled batch table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ratatool_spark.functions.text import fingerprint


def stream_exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First-occurrence-only stream by content fingerprint.

    State = one (fingerprint) row per distinct document inside the
    watermark horizon — bounded, watermark-evicted. Batch input runs the
    same plan with ``dropDuplicates`` (full-history horizon), which is the
    oracle for the streaming run over ordered input."""
    out = df.withColumn("__fp", fingerprint(F.col(text_col)))
    if out.isStreaming:
        return out.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["__fp"]
        ).drop("__fp")
    return out.dropDuplicates(["__fp"]).drop("__fp")


def stream_filter_against(
    stream_df: DataFrame,
    corpus_df: DataFrame,
    output_path: str,
    checkpoint: str,
    corpus_sigs: DataFrame | None = None,
    threshold: float = 0.7,
    fmt: str = "parquet",
    available_now: bool = True,
    **kwargs,
):
    """Streaming ingest gate: per micro-batch, drop rows with a verified
    near-duplicate in the EXISTING corpus and append the survivors —
    "never admit a known near-duplicate" as a live pipeline.

    Runs :func:`~ratatool_spark.operators.dedup.filter_against` inside
    ``foreachBatch``: the banded LSH join is new-batch x corpus, so each
    micro-batch costs O(batch), and with ``corpus_sigs`` (the persisted
    signature table from ``save_signatures``) the corpus is never
    re-shingled — one signature-table scan plus |candidates| corpus docs
    per batch, independent of corpus size.

    Restart safety: ``foreachBatch`` is at-least-once, so each batch's
    survivors land in their own ``batch_id=<n>`` subdirectory written
    with overwrite — a replayed batch rewrites the same directory instead
    of appending duplicates (idempotent sink keyed by batch id). Read the
    output with plain ``spark.read.<fmt>(output_path)``; partition
    discovery exposes ``batch_id`` as a column.

    Note the gate is against the STATIC corpus: duplicates arriving twice
    within the stream itself are admitted twice (compose with
    :func:`stream_exact_dedup` upstream for within-stream exactness, or
    re-run batch near_dedup on the appended output periodically — the
    standard ingest sandwich).

    Returns the started ``StreamingQuery``.
    """
    from ratatool_spark.cache import registry_mark, release_since
    from ratatool_spark.operators.dedup import filter_against

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        mark = registry_mark()
        try:
            kept = filter_against(
                batch_df,
                corpus_df,
                threshold=threshold,
                corpus_sigs=corpus_sigs,
                **kwargs,
            )
            # idempotent sink: one overwritten directory per batch id, so
            # an at-least-once replay rewrites rather than duplicates
            kept.write.mode("overwrite").format(fmt).save(
                f"{output_path}/batch_id={batch_id}"
            )
        finally:
            # release ONLY this batch's working sets (shingle frames,
            # signature caches) — a global release would drop caches a
            # concurrent operator in the same session still depends on
            release_since(mark)

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
