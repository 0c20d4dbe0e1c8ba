"""Sequence packing for training-data pipelines.

Pretraining loaders concatenate documents in a deterministic order and
chunk the stream into fixed-token-budget training sequences. The
distributed version of that assignment: each document goes to the chunk
where its first token lands — ``bin = floor(exclusive_prefix_tokens /
budget)``. Pure window expressions, no UDF, and the assignment is
reproducible in any SQL engine (it is one SUM OVER ... ROWS BETWEEN
UNBOUNDED PRECEDING AND 1 PRECEDING).

Scale note: a single global ordering would funnel the window through one
partition. Packing is therefore done **within groups** (``group_cols`` —
a shard/source/date column): each group is an independent window
partition, so parallelism = number of groups. That matches how loaders
shard anyway; pick (or synthesize, e.g. ``F.spark_partition_id()`` or a
hash bucket) a grouping with enough cardinality for the cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    token_col: str | Column,
    budget: int,
    order_cols: list[str],
    group_cols: list[str] | None = None,
    bin_col: str = "bin_id",
    offset_col: str | None = None,
) -> DataFrame:
    """Assign each row (document) a training-sequence bin id.

    ``bin = floor(exclusive-prefix-sum(tokens) / budget)`` over
    ``order_cols`` within each ``group_cols`` partition — the
    concatenate-then-chunk assignment: documents may straddle a chunk
    boundary (they belong to the chunk where they start), so a bin's
    token total exceeds ``budget`` by less than its last document's
    length and never by more.

    ``offset_col`` additionally emits the document's starting token
    offset within the group's concatenated stream (what a loader needs to
    slice the chunk).

    Calling without ``group_cols`` uses ONE global window partition — a
    single-task funnel at scale — and emits a ``RuntimeWarning``; pass a
    grouping column (or a synthesized hash bucket) on real data."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    if group_cols:
        w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    else:
        import warnings

        warnings.warn(
            "pack_sequences without group_cols funnels the whole dataset "
            "through one window partition (single task); pass group_cols "
            "(e.g. a shard/date column or a hash bucket) at scale",
            RuntimeWarning,
            stacklevel=2,
        )
        w = Window.orderBy(*order_cols)
    prefix = F.coalesce(
        F.sum(tok).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("long"),
    )
    out = df.withColumn("__off", prefix)
    cols = [*df.columns, F.floor(F.col("__off") / F.lit(budget)).alias(bin_col)]
    if offset_col:
        cols.append(F.col("__off").alias(offset_col))
    return out.select(*cols)
