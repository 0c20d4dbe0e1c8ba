"""Data-layout operators: z-order (Morton) clustering for multi-
dimensional scan pruning.

At 100 TB the cheapest query is the one whose files you never open:
parquet row-group min/max statistics prune scans only when the data is
CLUSTERED on the filter columns. Sorting clusters one column perfectly
and the rest not at all; a z-order (bit-interleaved) key gives every
participating column locality simultaneously — the same layout strategy
as Delta/Iceberg ``OPTIMIZE ZORDER BY`` — so range predicates on ANY of
the z-columns skip most files. (Databricks' public docs and the classic
Morton-order literature are the reference here; nothing engine-internal.)

Everything is pure integer expressions (quantize → interleave bits →
range-repartition + intra-partition sort): engine-replayable, zero UDFs,
and the only extra pass is the per-column min/max row that rides a
broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def zorder_key(
    cols: list[Column],
    los: list[Column],
    his: list[Column],
    bits: int = 16,
) -> Column:
    """Morton (z-order) key: each column quantized to ``bits``-bit
    integer rank over its [lo, hi] range (edge-clamped), then bits
    interleaved column-major (column j contributes bit i at position
    ``i * n_cols + j``). Pure shift/and/or integer expressions — the
    whole key survives whole-stage codegen and replays in any SQL
    engine. ``n_cols * bits`` must fit a signed long (≤ 62)."""
    n = len(cols)
    if n < 1:
        raise ValueError("zorder_key needs at least one column")
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed long")
    q = []
    for c, lo, hi in zip(cols, los, his):
        c = c.cast("double")
        lo, hi = lo.cast("double"), hi.cast("double")
        width = (hi - lo) / F.lit(float(1 << bits))
        cell = F.when(hi == lo, F.lit(0)).otherwise(
            F.least(
                F.greatest(
                    F.floor((c - lo) / width).cast("long"), F.lit(0)
                ),
                F.lit((1 << bits) - 1),
            )
        )
        q.append(cell)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, cell in enumerate(q):
            z = z + (
                F.shiftleft(
                    F.shiftright(cell, i).bitwiseAND(F.lit(1)),
                    i * n + j,
                )
            )
    return z


def zorder_repartition(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    num_partitions: int | None = None,
    z_col: str | None = None,
    arrange: bool = True,
) -> DataFrame:
    """Cluster a DataFrame by the z-order of ``cols`` for write-out:
    per-column min/max from ONE broadcast aggregate row (no driver
    collect), Morton key, ``repartitionByRange`` on it (range exchange =
    contiguous z-runs per output file) plus an intra-partition sort so
    row groups inside each file are tight too. Write the result with
    ``partitionBy``-free parquet and every z-column's min/max footer
    stats become selective. ``z_col`` keeps the key as a named output
    column (for gates/audits); default drops it. ``arrange=False``
    skips the exchange+sort and just attaches the key (z_col required):
    for writers that do their OWN partition-aligned range arrangement
    on the key (partitioned snapshot tables), a second exchange here
    would be pure waste."""
    if not arrange and not z_col:
        raise ValueError("arrange=False needs z_col (the key IS the output)")
    aggs = []
    for c in cols:
        aggs += [
            F.min(F.col(c)).alias(f"__zlo_{c}"),
            F.max(F.col(c)).alias(f"__zhi_{c}"),
        ]
    with_rng = df.crossJoin(F.broadcast(df.agg(*aggs)))
    key = zorder_key(
        [F.col(c) for c in cols],
        [F.col(f"__zlo_{c}") for c in cols],
        [F.col(f"__zhi_{c}") for c in cols],
        bits,
    )
    keep = z_col or "__z"
    out = with_rng.withColumn(keep, key).drop(
        *[f"__zlo_{c}" for c in cols], *[f"__zhi_{c}" for c in cols]
    )
    if not arrange:
        return out
    if num_partitions:
        out = out.repartitionByRange(num_partitions, F.col(keep))
    else:
        out = out.repartitionByRange(F.col(keep))
    out = out.sortWithinPartitions(keep)
    return out if z_col else out.drop("__z")


def rendezvous_shard(
    key: Column,
    shards: list[str],
    seed: int = 0,
) -> Column:
    """Rendezvous (highest-random-weight) shard assignment: each key goes
    to ``argmax_s portable_hash64(seed ␁ shard ␁ key)`` — Thaler &
    Ravishankar's HRW hashing. The property that matters for incremental
    dataset maintenance: ADDING a shard reassigns only the keys whose
    argmax IS the new shard (≈ 1/(n+1) of them) and REMOVING one only
    reassigns its own keys — modulo-hash sharding reshuffles nearly
    everything on any change. Pure expressions (one portable hash per
    candidate shard, a struct-sort argmax with a deterministic
    shard-name tiebreak); the shard list is plan literals, so this rides
    any scan at any scale. Returns the winning shard name."""
    from ratatool_spark.functions.hashing import portable_hash64

    if not shards:
        raise ValueError("rendezvous_shard needs at least one shard")
    if len(set(shards)) != len(shards):
        raise ValueError("duplicate shard names")
    scored = F.array(
        *[
            F.struct(
                portable_hash64(
                    F.concat_ws(
                        "\x01", F.lit(str(seed)), F.lit(s), key.cast("string")
                    )
                ).alias("h"),
                F.lit(s).alias("shard"),
            )
            for s in shards
        ]
    )
    # max on (h, shard): reverse(array_sort(...))[0] — ties (hash
    # collisions) break toward the LARGER shard name, deterministically
    return F.reverse(F.array_sort(scored))[0]["shard"]


def row_group_stats(path: str, cols: list[str]) -> list[dict]:
    """Per-row-group [min, max] footer statistics for ``cols`` from a
    parquet file or directory of part files — the metadata a scan
    planner prunes with. Footer-only reads (never row data), so this
    audit is cheap at any table size; part files are visited in sorted
    name order so group indices are stable."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = (
        sorted(glob.glob(os.path.join(path, "*.parquet")))
        if os.path.isdir(path)
        else [path]
    )
    out: list[dict] = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        name_to_idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            entry: dict = {"file": os.path.basename(f), "group": g,
                           "n_rows": rg.num_rows}
            for c in cols:
                st = rg.column(name_to_idx[c]).statistics
                entry[c] = (st.min, st.max)
            out.append(entry)
    return out


def row_group_skip_audit(
    stats: list[dict], box: dict[str, tuple[float, float]]
) -> tuple[int, int]:
    """(n_groups, n_scanned) for a conjunctive range predicate ``box``
    ({col: (lo, hi)}) against :func:`row_group_stats` output — a row
    group is scanned iff its [min, max] interval intersects the
    predicate range on EVERY column (exactly the parquet reader's
    min/max pruning rule). n_groups − n_scanned is the skip payoff the
    z-order layout exists to buy."""
    scanned = 0
    for e in stats:
        hit = all(
            e[c][1] >= lo and e[c][0] <= hi for c, (lo, hi) in box.items()
        )
        scanned += 1 if hit else 0
    return len(stats), scanned


def compaction_plan(
    manifest: DataFrame,
    size_col: str,
    order_cols: list[str],
    target_bytes: int,
    bin_col: str = "bin",
) -> DataFrame:
    """(manifest..., bin) — assign files (or partitions) to compaction
    output bins of ~``target_bytes`` each: order by size descending
    (``order_cols`` break ties), take the exclusive running sum of
    sizes, ``bin = floor(cum_before / target)``. Size-desc ordering is
    the classic bin-packing heuristic (big files anchor bins, small
    files fill the remainder); the cumulative-sum formulation makes the
    assignment a pure window expression that replays bit-identically in
    any SQL engine — no driver loop, no UDF.

    The small-files problem this solves is real at 100 TB (a 100k-file
    table with a long tail of KB-scale files wrecks scan parallelism and
    NameNode/liststatus cost). The MANIFEST is metadata — one row per
    file, ~10^5–10^6 rows for a 100 TB table at 100 MB–1 GB files — but
    the running sum is still computed DISTRIBUTED (the ``_global_rank``
    pattern from ``operators/corpus``): range-partition on the sort key,
    per-partition running sums (parallel window keyed by partition id),
    plus the exclusive prefix of per-partition size totals — a
    #partitions-row table prefix-summed on the driver
    (``functions.ranks.partition_offsets``) and broadcast back. No
    single-partition window anywhere in the plan.

    Every bin's total lands in [target, target + max_file) except the
    last; callers group by ``bin`` to drive one compaction task per bin.
    """
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be > 0, got {target_bytes}")
    from ratatool_spark.cache import persist_tracked
    from ratatool_spark.functions.ranks import partition_offsets

    order = [F.col(size_col).desc(), *[F.col(c) for c in order_cols]]
    # persisted: __pid feeds both the local running sums and the offset
    # table — two independent evaluations could range-partition
    # differently and disagree on partition ids.
    tagged = persist_tracked(
        manifest.repartitionByRange(*order)
        .sortWithinPartitions(*order)
        .withColumn("__pid", F.spark_partition_id())
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = tagged.withColumn(
        "__cum", F.coalesce(F.sum(F.col(size_col)).over(w), F.lit(0).cast("long"))
    )
    offs = partition_offsets(
        tagged.groupBy("__pid").agg(F.sum(F.col(size_col)).alias("__n"))
    )
    cum_before = F.col("__cum") + F.col("__off")
    return (
        local.join(F.broadcast(offs), "__pid")
        .withColumn(
            bin_col, F.floor(cum_before / F.lit(float(target_bytes))).cast("int")
        )
        .drop("__pid", "__cum", "__off")
    )
