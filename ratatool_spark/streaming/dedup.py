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
