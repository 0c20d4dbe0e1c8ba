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

    Calling without ``group_cols`` computes the GLOBAL assignment with
    the repo's distributed-prefix-sum pattern (range exchange on the
    ordering, per-partition running sums, a driver prefix over one row
    per partition — ``functions/ranks.partition_offsets``) instead of a
    single-task global window, so it scales like any other shuffle.
    Ordering ties must be broken by ``order_cols`` (include a unique
    id) or offsets are nondeterministic — the same contract as the
    window form."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    if group_cols:
        w = Window.partitionBy(*group_cols).orderBy(*order_cols)
        prefix = F.coalesce(
            F.sum(tok).over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0).cast("long"),
        )
        out = df.withColumn("__off", prefix)
    else:
        # global packing without the single-partition window funnel
        # (r11; the perplexity-rank pattern): __off = partition offset
        # (driver prefix over #partitions rows) + local exclusive sum.
        # persist pins the range partitioning so the offsets job and
        # the main job see identical __pid assignments.
        from ratatool_spark.cache import persist_tracked
        from ratatool_spark.functions.ranks import partition_offsets

        order = [F.col(c) if isinstance(c, str) else c for c in order_cols]
        tagged = persist_tracked(
            df.repartitionByRange(*order)
            .sortWithinPartitions(*order)
            .withColumn("__pid", F.spark_partition_id())
        )
        offs = partition_offsets(
            tagged.groupBy("__pid").agg(F.sum(tok).alias("__n")),
            off_col="__poff",
        )
        local = F.coalesce(
            F.sum(tok).over(
                Window.partitionBy("__pid")
                .orderBy(*order)
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0).cast("long"),
        )
        out = (
            tagged.join(F.broadcast(offs), "__pid")
            .withColumn("__off", (local + F.col("__poff")).cast("long"))
            .drop("__pid", "__poff")
        )
    cols = [*df.columns, F.floor(F.col("__off") / F.lit(budget)).alias(bin_col)]
    if offset_col:
        cols.append(F.col("__off").alias(offset_col))
    return out.select(*cols)
