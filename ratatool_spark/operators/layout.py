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


def hilbert_steps(
    d: int, bits: int, xor
) -> tuple[list[list[tuple[str, str]]], list[str]]:
    """Skilling's AxesToTranspose (J. Skilling, "Programming the
    Hilbert curve", AIP Conf. Proc. 707, 2004 — the standard public
    d-dimensional Hilbert algorithm) unrolled to a LINEAR chain of
    engine-neutral SQL assignment steps over variables ``x{i}_v``.

    Emitting *named steps* instead of one nested expression is the
    point: each mutation references prior variables by NAME, so both
    consumers stay linear in ``bits * d`` — Spark applies one
    projection per step (whole-stage codegen fuses them), the DuckDB
    oracle chains one CTE per step. A single closed-form expression
    would duplicate subtrees exponentially. ``xor(a, b) -> str``
    renders the one operator the engines spell differently (Spark
    ``^``, DuckDB ``xor()``).

    Returns ``(steps, final_names)``: steps is a list of projection
    rounds (each a list of (new_column, expr) pairs that may be
    computed in parallel from the previous round), final_names the
    d transposed words whose bit j contributes Hilbert-index bit
    ``j*d + (d-1-i)``."""
    if d < 1 or bits < 1:
        raise ValueError("need d >= 1 and bits >= 1")
    cur = [f"x{i}_0" for i in range(d)]
    steps: list[list[tuple[str, str]]] = []
    v = 0
    for s in range(bits - 1, 0, -1):
        q = 1 << s
        p = q - 1
        v += 1
        n0 = f"x0_{v}"
        steps.append([(
            n0,
            f"CASE WHEN ({cur[0]} & {q}) != 0 "
            f"THEN {xor(cur[0], str(p))} ELSE {cur[0]} END",
        )])
        cur[0] = n0
        for i in range(1, d):
            v += 1
            t = f"({xor(cur[0], cur[i])} & {p})"
            n0, ni = f"x0_{v}", f"x{i}_{v}"
            cond = f"({cur[i]} & {q}) != 0"
            steps.append([
                (n0, f"CASE WHEN {cond} THEN {xor(cur[0], str(p))} "
                     f"ELSE {xor(cur[0], t)} END"),
                (ni, f"CASE WHEN {cond} THEN {cur[i]} "
                     f"ELSE {xor(cur[i], t)} END"),
            ])
            cur[0], cur[i] = n0, ni
    # Gray-encode (sequential: each uses the UPDATED predecessor)
    for i in range(1, d):
        v += 1
        ni = f"x{i}_{v}"
        steps.append([(ni, xor(cur[i], cur[i - 1]))])
        cur[i] = ni
    # undo excess work in the lowest dimension (Skilling's final fixup)
    texpr = "0"
    for s in range(bits - 1, 0, -1):
        q = 1 << s
        texpr = xor(
            texpr,
            f"(CASE WHEN ({cur[d-1]} & {q}) != 0 THEN {q - 1} ELSE 0 END)",
        )
    steps.append([("t_fin", texpr)])
    v += 1
    fin = []
    for i in range(d):
        ni = f"x{i}_{v}"
        fin.append((ni, xor(cur[i], "t_fin")))
        cur[i] = ni
    steps.append(fin)
    return steps, cur


def hilbert_index_expr(names: list[str], bits: int) -> str:
    """The Hilbert index from Skilling's transposed words: bit ``j``
    of word ``i`` lands at index bit ``j*d + (d-1-i)`` (MSB-first
    interleave of the transpose). Engine-neutral SQL."""
    d = len(names)
    terms = []
    for i, nm in enumerate(names):
        for j in range(bits):
            terms.append(f"((({nm} >> {j}) & 1) << {j * d + (d - 1 - i)})")
    return " + ".join(terms)


def hilbert_attach(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    h_col: str = "__h",
    cells: bool = False,
) -> DataFrame:
    """Attach a d-dimensional Hilbert-curve key over ``cols``: each
    column quantized to a ``bits``-bit rank over its [min, max] (one
    broadcast range row, same quantizer as :func:`zorder_key`), then
    Skilling's transform applied as a linear projection chain (pure
    integer CASE/shift/xor expressions — zero UDFs, whole-stage
    codegen fuses the chain into one stage).

    Why offer this next to z-order: both give every participating
    column simultaneous locality, but the Hilbert curve is CONTIGUOUS
    — consecutive keys are always adjacent cells (Morton order takes
    long diagonal jumps at power-of-two boundaries), so file min/max
    boxes are tighter and range predicates skip more files. This is
    the curve behind Databricks' liquid clustering (public docs);
    Delta/Iceberg OPTIMIZE uses the same family. ``cells=True`` keeps
    the quantized rank columns (``__hcell_0..``) for audits."""
    n = len(cols)
    if n < 1:
        raise ValueError("hilbert_attach needs at least one column")
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed long")
    aggs = []
    for c in cols:
        aggs += [
            F.min(F.col(c)).alias(f"__hlo_{c}"),
            F.max(F.col(c)).alias(f"__hhi_{c}"),
        ]
    out = df.crossJoin(F.broadcast(df.agg(*aggs)))
    tmp: list[str] = []
    for i, c in enumerate(cols):
        col = F.col(c).cast("double")
        lo = F.col(f"__hlo_{c}").cast("double")
        hi = F.col(f"__hhi_{c}").cast("double")
        width = (hi - lo) / F.lit(float(1 << bits))
        cell = F.when(hi == lo, F.lit(0)).otherwise(
            F.least(
                F.greatest(
                    F.floor((col - lo) / width).cast("long"), F.lit(0)
                ),
                F.lit((1 << bits) - 1),
            )
        )
        out = out.withColumn(f"x{i}_0", cell)
        tmp.append(f"x{i}_0")
    steps, names = hilbert_steps(n, bits, lambda a, b: f"({a} ^ {b})")
    for step in steps:
        out = out.withColumns({nm: F.expr(e) for nm, e in step})
        tmp.extend(nm for nm, _ in step)
    out = out.withColumn(
        h_col, F.expr(hilbert_index_expr(names, bits)).cast("long")
    )
    if cells:
        for i in range(n):
            out = out.withColumn(f"__hcell_{i}", F.col(f"x{i}_0"))
    return out.drop(
        *dict.fromkeys(tmp), "t_fin",
        *[f"__hlo_{c}" for c in cols], *[f"__hhi_{c}" for c in cols],
    )


def hilbert_repartition(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    num_partitions: int | None = None,
    h_col: str | None = None,
    arrange: bool = True,
) -> DataFrame:
    """Cluster a DataFrame by Hilbert order of ``cols`` for write-out —
    the drop-in Hilbert twin of :func:`zorder_repartition` (range
    exchange on the key + intra-partition sort; ``arrange=False``
    attaches the key only, for writers doing their own partition-
    aligned arrangement)."""
    if not arrange and not h_col:
        raise ValueError("arrange=False needs h_col (the key IS the output)")
    keep = h_col or "__h"
    out = hilbert_attach(df, cols, bits=bits, h_col=keep)
    if not arrange:
        return out
    if num_partitions:
        out = out.repartitionByRange(num_partitions, F.col(keep))
    else:
        out = out.repartitionByRange(F.col(keep))
    out = out.sortWithinPartitions(keep)
    return out if h_col else out.drop("__h")


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
