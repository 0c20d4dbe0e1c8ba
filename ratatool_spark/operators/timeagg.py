"""Hierarchical time-grain rollup (hypertable-style continuous aggregate).

The shape TimescaleDB calls a continuous aggregate and OLAP stores call a
rollup cube over time: the same measures at minute/hour/day/... grains.
The scale property: only the finest grain ever scans the fact table —
every coarser grain re-aggregates the next finer grain's partials
(sum-of-sums, sum-of-counts, min-of-mins), so a 100 TB scan produces a
~minutes-cardinality partial once and the rest is cheap. All measures
here are decomposable aggregates, which is exactly what makes the
re-aggregation exact (decimal sums are associative; float sums would
drift, which is why value is cast to decimal first).

Within one union query Spark evaluates each branch, but the finest-grain
aggregate is an identical subplan in all of them — ReusedExchange
dedupes it at execution. For repeated/incremental use, persist the
finest grain or write it as a table and roll up from there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Coarse-to-fine validation order; date_trunc accepts all of these.
GRAINS = ("minute", "hour", "day", "week", "month", "quarter", "year")


def _validate_grains(grains: tuple[str, ...]) -> None:
    """Rollup chains must NEST: each coarser grain is derived by
    truncating the previous grain's bucket, which is only correct when
    every finer bucket lies wholly inside one coarser bucket. All grains
    nest left-to-right along GRAINS except ``week``: weeks contain whole
    days (so week may be derived FROM day/hour/minute) but cross
    month/quarter/year boundaries — deriving those from week buckets
    would count a March event into February. Hence week is only legal as
    the LAST grain of a chain."""
    order = {g: i for i, g in enumerate(GRAINS)}
    for g in grains:
        if g not in order:
            raise ValueError(f"unknown grain {g!r} (use one of {GRAINS})")
    if list(grains) != sorted(grains, key=order.get):
        raise ValueError("grains must be ordered finest to coarsest")
    if "week" in grains[:-1]:
        raise ValueError(
            "'week' does not nest into month/quarter/year — it may only be "
            "the coarsest grain of a rollup chain"
        )


def time_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    grains: tuple[str, ...] = ("minute", "hour", "day"),
) -> DataFrame:
    """(grain, bucket, n_events, sum_value, min_value, max_value) at every
    requested grain, finest listed first. Coarser grains are computed from
    the finer partial aggregate, not from ``df``."""
    _validate_grains(grains)

    fine = build_rollup_partial(df, ts_col, value_col, grains[0])
    return _rollup_ladder(fine, grains)


def _rollup_ladder(fine: DataFrame, grains: tuple[str, ...]) -> DataFrame:
    """Stack (grain, bucket, measures) rows from a finest-grain partial,
    each coarser grain re-aggregating the previous one."""
    parts = [fine.select(F.lit(grains[0]).alias("grain"), "*")]
    prev = fine
    for g in grains[1:]:
        prev = prev.groupBy(F.date_trunc(g, F.col("bucket")).alias("bucket")).agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").cast("decimal(38,6)").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        parts.append(prev.select(F.lit(g).alias("grain"), "*"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p.select(out.columns))
    return out


def build_rollup_partial(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    grain: str = "minute",
) -> DataFrame:
    """(bucket, n_events, sum_value, min_value, max_value) at one grain —
    the persistable unit of an INCREMENTAL continuous aggregate: each
    ingested batch writes its own partial (one scan of the batch, ever),
    and :func:`rollup_from_partials` serves any grain over any subset of
    batches without touching the fact data again. All measures are
    decomposable, and the sum is decimal-cast, so re-aggregation is
    exact — merged results equal a direct rollup bit-for-bit."""
    _validate_grains((grain,))
    return df.groupBy(F.date_trunc(grain, F.col(ts_col)).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col(value_col).cast("decimal(28,6)")).alias("sum_value"),
        F.min(F.col(value_col)).alias("min_value"),
        F.max(F.col(value_col)).alias("max_value"),
    )


def rollup_from_partials(
    partials: list[DataFrame], grains: tuple[str, ...] = ("minute", "hour", "day")
) -> DataFrame:
    """Merge per-batch finest-grain partials (all built at ``grains[0]``)
    and produce the full grain ladder — the maintenance path of the
    hypertable continuous aggregate: a new day's batch costs one
    batch-sized scan plus a buckets-sized merge, never a historical
    rescan. Exactness: counts/sums are associative (decimal), min/max
    idempotent, so this EQUALS time_rollup over the concatenated batches
    (pinned by the oracle gate)."""
    _validate_grains(grains)
    if not partials:
        raise ValueError("need at least one partial")
    u = partials[0]
    for p in partials[1:]:
        u = u.unionByName(p)
    merged = u.groupBy("bucket").agg(
        F.sum("n_events").alias("n_events"),
        # decimal(38,6): the same width the direct path's sum carries —
        # a narrower cast would overflow (NULL/error) at per-bucket sums
        # the ladder itself handles, breaking the bit-for-bit claim
        F.sum("sum_value").cast("decimal(38,6)").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )
    return _rollup_ladder(merged, grains)


def distinct_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    grains: tuple[str, ...] = ("hour", "day"),
    lg_k: int = 12,
) -> DataFrame:
    """(grain, bucket, n_distinct) — approximate distinct keys per time
    bucket at every grain, via mergeable HLL sketches (Datasketches,
    Spark 4 ``hll_sketch_agg``/``hll_union_agg``).

    Unlike counts/sums, COUNT(DISTINCT) is not decomposable — a day's
    distinct count is NOT the sum of its hours. The sketch makes it
    mergeable: the fact table is scanned once at the finest grain into
    ~KB sketches, and every coarser grain is a sketch union. Identical
    estimates to sketching the coarse grain directly (union of HLL
    registers is exact), at 1/scan-count of the IO — the OLAP cube /
    streaming-state pattern for distinct users at 100 TB."""
    _validate_grains(grains)

    fine = df.groupBy(F.date_trunc(grains[0], F.col(ts_col)).alias("bucket")).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lg_k)).alias("sk")
    )
    parts = [fine.select(F.lit(grains[0]).alias("grain"), "bucket", "sk")]
    prev = fine
    for g in grains[1:]:
        prev = prev.groupBy(F.date_trunc(g, F.col("bucket")).alias("bucket")).agg(
            F.hll_union_agg(F.col("sk"), F.lit(True)).alias("sk")
        )
        parts.append(prev.select(F.lit(g).alias("grain"), "bucket", "sk"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "grain", "bucket", F.hll_sketch_estimate("sk").alias("n_distinct")
    )


def distinct_rollup_exact(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    grains: tuple[str, ...] = ("hour", "day"),
) -> DataFrame:
    """Exact twin of :func:`distinct_rollup` — same rollup-from-partials
    shape, with distinct *(bucket, key)* pairs as the mergeable partial
    instead of HLL registers.

    The fact table is still scanned once: the finest grain dedups to
    (bucket, key) pairs, and every coarser grain re-dedups the finer
    pairs (distinct day-keys derive exactly from distinct hour-keys).
    Partial size is Σ|keys per bucket| rows — unbounded by design, which
    is precisely the memory blow-up the sketch variant exists to avoid at
    100 TB; use this form when exact counts are required (or as the
    engine-portable oracle for the sketch, which is how the driver gate
    consumes it)."""
    _validate_grains(grains)

    # lazy localCheckpoint: every non-final grain's pairs feed TWO
    # consumers (its own count and the next grain's derivation) in one
    # union plan, and the union branches do NOT get ReusedExchange
    # (measured: 4 FileScans without this, 2.7 s → ~1.4 s cold at sf0.1).
    # Checkpoint materializes the distinct once; lazy so plan building
    # stays job-free.
    pairs = (
        df.select(
            F.date_trunc(grains[0], F.col(ts_col)).alias("bucket"),
            F.col(key_col),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    parts = [
        pairs.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_distinct"))
        .select(F.lit(grains[0]).alias("grain"), "bucket", "n_distinct")
    ]
    prev = pairs
    for i, g in enumerate(grains[1:]):
        prev = prev.select(
            F.date_trunc(g, F.col("bucket")).alias("bucket"), F.col(key_col)
        ).distinct()
        if i < len(grains) - 2:  # non-final grains feed two consumers too
            prev = prev.localCheckpoint(eager=False)
        parts.append(
            prev.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_distinct"))
            .select(F.lit(g).alias("grain"), "bucket", "n_distinct")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ------------------------------------------------- persisted sketch tables
#
# The build-once artifact for incremental distinct counting: sketch each
# batch ONCE into a tiny per-group HLL table, persist it, and answer
# "distinct keys over any batch union" later by merging sketches — the raw
# batches are never rescanned. Completes the production-artifact family
# (minhash signature tables, IVF index, bloom filters).


def build_distinct_sketches(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """(group_cols..., hll binary, lg_k) — one mergeable Datasketches HLL
    per group. ~KB per group regardless of group size; one shuffle on the
    group key with map-side partial sketching."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lg_k)).alias("hll"),
        F.first(F.lit(lg_k)).alias("lg_k"),
    )


def save_distinct_sketches(
    df: DataFrame,
    path: str,
    group_cols: list[str],
    key_col: str,
    lg_k: int = 12,
) -> None:
    build_distinct_sketches(df, group_cols, key_col, lg_k).write.mode(
        "overwrite"
    ).parquet(path)


def load_distinct_sketches(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def merge_distinct_sketches(*sketch_dfs: DataFrame) -> DataFrame:
    """Union any number of sketch tables (e.g. one per ingested batch) and
    merge per group. HLL register union is lossless for a common lg_k, so
    the merged estimate equals sketching the concatenated batches
    directly; ``hll_union_agg`` raises on mismatched lg_k (sketches built
    with different precisions are not comparable — rebuild instead of
    silently degrading)."""
    if not sketch_dfs:
        raise ValueError("need at least one sketch table")
    u = sketch_dfs[0]
    for s in sketch_dfs[1:]:
        u = u.unionByName(s)
    group_cols = [c for c in u.columns if c not in ("hll", "lg_k")]
    return u.groupBy(*group_cols).agg(
        F.hll_union_agg(F.col("hll"), F.lit(False)).alias("hll"),
        F.first("lg_k").alias("lg_k"),
    )


def estimate_distinct(sketch_df: DataFrame) -> DataFrame:
    """Replace the sketch column with its cardinality estimate."""
    group_cols = [c for c in sketch_df.columns if c not in ("hll", "lg_k")]
    return sketch_df.select(
        *group_cols, F.hll_sketch_estimate("hll").alias("n_distinct")
    )


# ------------------------------------------------ quantile sketch tables
# The quantile twin of the HLL tables above: persisted, mergeable,
# per-group summaries that let daily batches answer "p95 over any grouping
# of batches" without rescanning them. Instead of an opaque KLL/t-digest
# blob, the sketch is a deterministic bottom-k (KMV) sample: each row gets
# the portable 60-bit md5 hash of its key columns, and the sketch keeps
# the k rows with the smallest hashes plus their values. Properties that
# matter at 100 TB:
#   - mergeable and LOSSLESS under merge: bottom-k of a union == bottom-k
#     of the concatenated bottom-ks (min is associative), so merged
#     estimates are bit-identical to a direct build over all batches;
#   - deterministic and cross-engine: any warehouse can re-derive the
#     exact sample (and therefore the exact estimates) from the same md5
#     arithmetic — the property the portable sampling dice provides, and
#     what makes a full-strength DuckDB oracle possible (approx sketches
#     only gate within tolerance);
#   - the build is a windowed top-k: `row_number() <= k` over the hash
#     order, which Spark rewrites to WindowGroupLimit — each map task
#     keeps a k-row heap before the shuffle, so the exchange carries
#     O(k · partitions), never the fact table.
# Accuracy is that of a uniform k-sample (hash order is uniform over
# rows): quantile standard error ~ sqrt(q(1-q)/k) — k=1024 gives ~1.5
# points at the median. For exact quantiles use percentile() directly.


def build_quantile_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    key_cols: list[str],
    k: int = 1024,
    seed: int = 0,
) -> DataFrame:
    """(group_cols..., sample array<struct<h,v>>, k) — one deterministic
    bottom-k value sample per group. ``key_cols`` must uniquely identify
    rows (they seed the per-row hash; duplicates would correlate the
    sample). The sample is stored hash-sorted so merge is a linear
    array merge conceptually — though re-ranking does it declaratively."""
    from pyspark.sql import Window

    from ratatool_spark.functions.hashing import hash_cols

    h = hash_cols(list(key_cols), seed=seed)
    w = Window.partitionBy(*group_cols).orderBy("__h")
    return (
        df.select(
            *group_cols,
            h.alias("__h"),
            F.col(value_col).cast("double").alias("__v"),
        )
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .groupBy(*group_cols)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__h").alias("h"), F.col("__v").alias("v")))
            ).alias("sample"),
            F.first(F.lit(k)).alias("k"),
        )
    )


def merge_quantile_sketches(*sketch_dfs: DataFrame) -> DataFrame:
    """Union any number of sketch tables and keep each group's bottom-k of
    the combined samples. Lossless: equals building one sketch over the
    concatenated inputs. Mismatched k raises (a smaller-k sketch has
    already discarded rows a larger-k merge would need)."""
    from pyspark.sql import Window

    if not sketch_dfs:
        raise ValueError("need at least one sketch table")
    u = sketch_dfs[0]
    for s in sketch_dfs[1:]:
        u = u.unionByName(s)
    group_cols = [c for c in u.columns if c not in ("sample", "k")]
    w = Window.partitionBy(*group_cols).orderBy("e.h")
    merged = (
        u.select(*group_cols, "k", F.explode("sample").alias("e"))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= F.col("k"))
        .groupBy(*group_cols)
        .agg(
            F.array_sort(F.collect_list("e")).alias("sample"),
            F.min("k").alias("__kmin"),
        )
    )
    # the k guard is GLOBAL (one-row broadcast of the whole union's
    # min/max) — a per-group check would silently pass when the
    # differing-k tables carry DISJOINT groups, shipping a mixed-k output
    gk = u.agg(F.min("k").alias("__gkmin"), F.max("k").alias("__gkmax"))
    merged = merged.crossJoin(F.broadcast(gk))
    # guard fused into the PAYLOAD column (sample): a guard riding `k`
    # is pruned away by any consumer that doesn't select k — which
    # estimate_quantiles doesn't — and would silently mix-k merge
    guard = F.when(
        F.col("__gkmin") != F.col("__gkmax"),
        F.raise_error(
            F.concat(
                F.lit("merge_quantile_sketches: mismatched k ("),
                F.col("__gkmin").cast("string"),
                F.lit(" vs "),
                F.col("__gkmax").cast("string"),
                F.lit(") — sketches are not mergeable; rebuild at one k"),
            )
        ).cast("array<struct<h:bigint,v:double>>"),
    ).otherwise(F.col("sample"))
    return merged.select(
        *group_cols, guard.alias("sample"), F.col("__kmin").alias("k")
    )


def estimate_quantiles(
    sketch_df: DataFrame, qs: list[float]
) -> DataFrame:
    """(group_cols..., q_<nn> ...) — nearest-rank quantiles from each
    group's sample: sorted_values[1 + floor(q * (m - 1))]. Deterministic,
    so a merge-then-estimate equals a direct-build-then-estimate exactly
    (pinned by the oracle)."""
    group_cols = [c for c in sketch_df.columns if c not in ("sample", "k")]
    vals = F.array_sort(F.transform("sample", lambda e: e["v"]))
    m = F.size("sample")
    labels = [f"q_{int(round(q * 100)):02d}" for q in qs]
    if len(set(labels)) != len(labels):
        raise ValueError(
            f"quantile labels collide ({labels}): output columns are named "
            "by integer percent — request quantiles at least 1 point apart "
            "(duplicate column names break parquet writes and selects)"
        )
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {q} outside [0, 1]")
    if not qs:
        return sketch_df.select(*[F.col(c) for c in group_cols])

    # Sort the sample ONCE per row: each element_at(vals, idx) referenced
    # the array_sort chain directly, re-sorting the sample per requested
    # quantile (HOFs are interpreted — no CSE). Bind the sorted array as a
    # lambda value, emit all quantiles as one struct, and materialize the
    # struct in its own projection so the field reads are attribute
    # accesses.
    def _pick(vs: Column) -> Column:
        cols = []
        for q, label in zip(qs, labels):
            idx = (F.lit(1) + F.floor(F.lit(q) * (m - F.lit(1)))).cast("int")
            cols.append(F.element_at(vs, idx).alias(label))
        return F.struct(*cols)

    qstruct = F.element_at(F.transform(F.array(vals), _pick), 1)
    tmp = sketch_df.select(*group_cols, qstruct.alias("__q"))
    return tmp.select(
        *group_cols, *[F.col("__q")[label].alias(label) for label in labels]
    )


# ------------------------------------------------ set-overlap sketch tables
# The third sketch family: distinct-SET samples that support intersection /
# Jaccard estimates between groups — the "audience overlap" question HLL
# cannot answer (register unions give |A∪B| but never |A∩B|). A KMV
# (k-minimum-values) sketch keeps the k smallest distinct portable hashes
# of each group's keys; because min-of-union = union-of-mins it merges
# losslessly, and because the hash is the deterministic portable md5, any
# engine re-derives the SAME sample — estimates gate exactly cross-engine,
# not within a tolerance band. Estimator (Beyer et al., SIGMOD'07): with
# K = k smallest of K_A ∪ K_B, J_est = |K ∩ K_A ∩ K_B| / |K|.


def build_set_sketches(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    k: int = 1024,
    seed: int = 0,
) -> DataFrame:
    """(group_cols..., kmv array<bigint> sorted ascending, k) — the k
    smallest distinct key hashes per group. One distinct aggregate + a
    WindowGroupLimit top-k: the exchange carries O(k·partitions), and the
    distinct pre-aggregate map-side-combines duplicate keys before it."""
    from pyspark.sql import Window

    from ratatool_spark.functions.hashing import hash_cols

    h = hash_cols([key_col], seed=seed)
    w = Window.partitionBy(*group_cols).orderBy("__h")
    return (
        df.select(*group_cols, h.alias("__h"))
        .distinct()
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .groupBy(*group_cols)
        .agg(
            F.array_sort(F.collect_list("__h")).alias("kmv"),
            F.first(F.lit(k)).alias("k"),
        )
    )


def merge_set_sketches(*sketch_dfs: DataFrame) -> DataFrame:
    """Union sketch tables and keep each group's k smallest distinct
    hashes — lossless (bottom-k of a union == bottom-k of concatenated
    bottom-ks). Mismatched k raises via the same fused guard as
    merge_quantile_sketches."""
    if not sketch_dfs:
        raise ValueError("need at least one sketch table")
    u = sketch_dfs[0]
    for s in sketch_dfs[1:]:
        u = u.unionByName(s)
    group_cols = [c for c in u.columns if c not in ("kmv", "k")]
    merged = u.groupBy(*group_cols).agg(
        F.flatten(F.collect_list("kmv")).alias("__all"),
        F.min("k").alias("__kmin"),
    )
    # global (not per-group) guard — see merge_quantile_sketches; fused
    # into the kmv PAYLOAD so column pruning can never elide it
    gk = u.agg(F.min("k").alias("__gkmin"), F.max("k").alias("__gkmax"))
    merged = merged.crossJoin(F.broadcast(gk))
    kmv = F.slice(F.array_sort(F.array_distinct("__all")), 1, F.col("__kmin"))
    guard = F.when(
        F.col("__gkmin") != F.col("__gkmax"),
        F.raise_error(
            F.concat(
                F.lit("merge_set_sketches: mismatched k ("),
                F.col("__gkmin").cast("string"),
                F.lit(" vs "),
                F.col("__gkmax").cast("string"),
                F.lit(") — rebuild at one k"),
            )
        ).cast("array<bigint>"),
    ).otherwise(kmv)
    return merged.select(
        *group_cols,
        guard.alias("kmv"),
        F.col("__kmin").alias("k"),
    )


def set_overlap_estimates(sketch_df: DataFrame) -> DataFrame:
    """Pairwise Jaccard / intersection estimates between every two groups
    of a KMV sketch table: for groups a < b, with K = the k smallest of
    kmv_a ∪ kmv_b, ``est_jaccard = |K ∩ kmv_a ∩ kmv_b| / |K|`` and
    ``est_intersection = est_jaccard · est_union`` (union cardinality
    from the KMV estimator (k-1)/U_k when the union sample is full,
    exact |K| when it is not).

    The pair enumeration is a self cross-join of the SKETCH TABLE —
    O(groups²) rows of k-length arrays, the deliberate envelope of a
    pairwise-overlap report (hundreds of groups, not the fact table).
    Deterministic end-to-end: the same report is re-derivable in any
    engine from the same md5 arithmetic."""
    group_cols = [c for c in sketch_df.columns if c not in ("kmv", "k")]
    a = sketch_df.select(
        F.struct(*group_cols).alias("ga"), F.col("kmv").alias("__ka"), "k"
    )
    b = sketch_df.select(
        F.struct(*group_cols).alias("gb"), F.col("kmv").alias("__kb")
    )
    pairs = a.join(b, F.col("ga") < F.col("gb"))
    union_k = F.slice(
        F.array_sort(F.array_distinct(F.concat("__ka", "__kb"))), 1, F.col("k")
    )
    inter = F.array_intersect(F.array_intersect(union_k, "__ka"), "__kb")
    est_j = F.size(inter) / F.size(union_k)
    from ratatool_spark.functions.hashing import HASH_SPACE

    full = F.size(union_k) >= F.col("k")
    u_k = F.element_at(union_k, F.col("k")).cast("double") / F.lit(HASH_SPACE)
    est_union = F.when(full, (F.col("k") - 1) / u_k).otherwise(
        F.size(union_k).cast("double")
    )
    return pairs.select(
        "ga",
        "gb",
        est_j.alias("est_jaccard"),
        (est_j * est_union).alias("est_intersection"),
    )


def rollup_anomalies(
    rollup_df: DataFrame,
    value_col: str = "sum_value",
    trailing: int = 24,
    min_periods: int = 8,
    z: float = 3.0,
    grain_col: str | None = "grain",
) -> DataFrame:
    """Trailing z-score anomaly flags over a rollup / continuous
    aggregate: each bucket's value is compared to the mean ± z·stddev of
    the preceding ``trailing`` buckets (its own bucket excluded — the
    monitored point must not contaminate its baseline). Buckets with
    fewer than ``min_periods`` trailing samples get a NULL flag (not
    false: "unknown" and "normal" must stay distinguishable while the
    baseline warms up).

    The input is time_rollup / rollup_from_partials output (or any
    (bucket, value) frame; pass ``grain_col=None`` if there is no grain
    column). Adds ``trailing_mean``, ``trailing_std``, ``is_anomaly``.

    Shape: one window per grain ordered by bucket with a ROWS frame —
    the rollup is already buckets-cardinality (~minutes of a year, not
    the fact table), so the per-grain sort is tiny; at 100 TB the fact
    data never enters this operator, only the continuous aggregate."""
    from pyspark.sql import Window

    parts = [grain_col] if grain_col else []
    w = (
        Window.partitionBy(*parts)
        .orderBy("bucket")
        .rowsBetween(-trailing, -1)
    )
    # mean/std from EXACT decimal window sums with a fixed finishing
    # formula — a float AVG/STDDEV over the frame is summation-order
    # dependent and drifts ~1e-10 between engines, which a rounded gate
    # can still split; decimal Σv and Σv² are order-free, and the single
    # fp finish below is the same op sequence everywhere
    vd = F.col(value_col).cast("decimal(28,6)")
    v = vd.cast("double")
    n = F.count(vd).over(w).cast("double")
    s1 = F.sum(vd).over(w).cast("double")
    s2 = F.sum((vd * vd).cast("decimal(38,12)")).over(w).cast("double")
    # CASE-gate the whole finish on the warm-up condition: below
    # min_periods every output is NULL (baseline unknown), and the
    # divisions never execute on empty/1-row frames (ANSI div-by-zero)
    warm = n >= F.lit(float(max(min_periods, 2)))
    mean = F.when(warm, s1 / n)
    std = F.when(
        warm, F.sqrt(F.greatest(s2 - s1 * s1 / n, F.lit(0.0)) / (n - 1))
    )
    # NOTE: no std > 0 guard — against a CONSTANT warm baseline (std = 0)
    # any deviation IS the anomaly (|v - m| > z·0 ⇔ v ≠ m); gating on
    # positive std would return NULL for exactly the spike a monitoring
    # consumer filtering is_anomaly = TRUE must see
    flag = F.when(warm, F.abs(v - mean) > F.lit(z) * std)
    return rollup_df.select(
        "*",
        mean.alias("trailing_mean"),
        std.alias("trailing_std"),
        flag.alias("is_anomaly"),
    )
