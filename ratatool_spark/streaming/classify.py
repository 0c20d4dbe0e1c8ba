"""Streaming inference for the trained hashed-feature classifiers.

Scoring is a PURE function of one document and a frozen weight table, so
the batch operators (operators/corpus.quality_classifier_score /
nb_classify) run unchanged inside ``foreachBatch``: a document is wholly
contained in its micro-batch, the ≤n_buckets-row weight grid broadcasts
into every batch, and per-batch cost is O(batch) regardless of how much
has streamed before — the live-scoring half of the train-offline /
apply-online contract (train on the frozen corpus, score every arriving
crawl shard). Same idempotent ``batch_id=<n>`` overwrite sink as the
streaming ingest gate (streaming/dedup.py): an at-least-once replay
rewrites its own directory instead of appending duplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stream_quality_scores(
    stream_df: DataFrame,
    weights_df: DataFrame,
    output_path: str,
    checkpoint: str,
    n_buckets: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    bias: float = 0.0,
    seed: int = 0,
    fmt: str = "parquet",
    available_now: bool = True,
):
    """Score every arriving document with a trained quality model
    (:func:`~ratatool_spark.operators.corpus.train_quality_weights`).
    Featurization params must match training — load them from a
    :func:`~ratatool_spark.operators.corpus.save_classifier_model`
    artifact rather than re-typing. Returns the started StreamingQuery;
    read results with ``spark.read.parquet(output_path)`` (partition
    discovery exposes ``batch_id``)."""
    from ratatool_spark.cache import persist_tracked
    from ratatool_spark.operators.corpus import quality_classifier_score

    # materialize the weight table ONCE: foreachBatch re-evaluates every
    # lineage it references per micro-batch, so an inline-trained weight
    # grid would re-run its corpus aggregates on every trigger (measured
    # ~3x the whole gate's wall at sf0.1). ≤n_buckets rows —
    # MEMORY_AND_DISK, released via unpersist_intermediates.
    weights_df = persist_tracked(weights_df)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        out = quality_classifier_score(
            batch_df,
            weights_df,
            n_buckets=n_buckets,
            text_col=text_col,
            id_col=id_col,
            n=n,
            bias=bias,
            seed=seed,
        )
        out.write.mode("overwrite").format(fmt).save(
            f"{output_path}/batch_id={batch_id}"
        )

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
