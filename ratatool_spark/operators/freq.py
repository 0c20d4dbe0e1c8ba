"""Frequency estimation: exact heavy hitters, skew diagnostics, and
mergeable count-min frequency sketch tables.

The fourth sketch family next to the HLL distinct / KMV quantile / KMV
set-overlap tables in ``operators/timeagg``: persisted, mergeable,
per-group COUNT-MIN sketches that answer "how often does key X occur in
any union of batches" without rescanning them. Count-min merge is an
element-wise counter sum, so a merged estimate equals a direct build over
the concatenated batches EXACTLY — and because the row hash is the
portable md5 hash (functions/hashing) and the per-depth bucket map is
plain modular arithmetic, any SQL engine re-derives the same counters and
the same estimates: the DuckDB oracle gates exact values, not a tolerance
band (Cormode & Muthukrishnan, J.Alg 2005 for the ±eps·N error envelope;
the arithmetic itself is deterministic).

Alongside the sketches, two exact one-scan diagnostics a 100 TB operator
reaches for before picking join/salting strategy:

- :func:`heavy_hitters` — top-k most frequent keys per group, two-stage
  aggregate + WindowGroupLimit (the exchange carries per-partition
  (group, key) partials, then k rows per group).
- :func:`skew_report` — per-column value histogram heads with share and
  skew ratio, one scan over a column melt; the report that tells you
  which join keys need salting (operators/skew.salted_join) and how hot
  the hottest key is.

Scale shapes: the sketch build explodes each row into ``depth`` (group,
slot) units BEFORE the group aggregate, so map-side combine collapses the
shuffle to at most groups x depth x width partial counters per task —
the fact table itself never shuffles. A sketch row is depth*width int64s
(default 4x1024 = 32 KB/group).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Bucket-map constants, shared verbatim by the DuckDB oracle replay:
# slot(j) = ((h mod P) * (2j+3) + ((j+1) * MIX mod P)) mod P mod width.
# P = 2^31 - 1 (prime) keeps every product under 2^63 in engines that
# error on BIGINT overflow rather than wrap (DuckDB); h is the 60-bit
# portable md5 hash, already uniform, so the affine map only needs to
# decorrelate the depth rows, not supply randomness.
CMS_P = 2147483647
CMS_MIX = 1013904223


def _cms_slot(h, j, width):
    """0-based bucket of hash ``h`` in depth-row ``j`` (Column exprs).
    All terms are widened to long first: ``j`` arrives as a 32-bit int
    from ``sequence`` and ``(j+1) * MIX`` overflows int32 at j >= 2."""
    jl = (j + F.lit(0)).cast("long")
    a = jl * 2 + 3
    b = ((jl + 1) * F.lit(CMS_MIX)) % F.lit(CMS_P)
    return ((h % F.lit(CMS_P)) * a + b) % F.lit(CMS_P) % width


def cms_slot_sql(h_sql: str, j_sql: str, width: int) -> str:
    """The DuckDB twin of :func:`_cms_slot` — kept beside it so the two
    implementations cannot drift."""
    return (
        f"((({h_sql}) % {CMS_P}) * ({j_sql} * 2 + 3) + "
        f"(({j_sql} + 1) * {CMS_MIX}) % {CMS_P}) % {CMS_P} % {width}"
    )


def heavy_hitters(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    k: int = 10,
    measure: Column | None = None,
) -> DataFrame:
    """(group_cols..., key_col, cnt|total, rank) — the k heaviest keys
    per group, exact. By frequency (``cnt``) by default; pass ``measure``
    (a Column) to rank by SUM of a metric instead (``total`` — top
    contributors by revenue / bytes / tokens). Decimal-cast the measure
    for exact, order-independent sums. Ties break on the smaller key so
    the result is fully deterministic (rank is ``row_number``).

    Two map-side-combined shuffles: groupBy(group+key) aggregate, then a
    ``row_number() <= k`` window that Spark rewrites to WindowGroupLimit —
    each task keeps a k-row heap per group before the second exchange, so
    it carries O(k x partitions), never the distinct-key table."""
    val = "cnt" if measure is None else "total"
    agg = (
        F.count(F.lit(1)) if measure is None else F.sum(measure)
    ).alias(val)
    counts = df.groupBy(*group_cols, key_col).agg(agg)
    w = Window.partitionBy(*group_cols).orderBy(F.desc(val), F.col(key_col))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def skew_report(df: DataFrame, cols: list[str], top_k: int = 5) -> DataFrame:
    """(column, value, cnt, share, skew_ratio, rank, n_distinct,
    entropy) — the ``top_k`` hottest values of each named column, with
    the numbers that drive a salting/partition-key decision: ``share`` =
    cnt / rows, ``skew_ratio`` = cnt / (rows / n_distinct) (how many
    times hotter than a uniform key; a skew_ratio of 40 on a join key
    means the hot task does 40x the average work), and ``entropy`` = the
    column's Shannon entropy in nats over its FULL value distribution
    (same value on every row of a column; ln(n_distinct) = perfectly
    uniform — the higher, the better the column spreads a shuffle).
    Values are compared in their string rendering so one report covers
    heterogeneous columns; NULL stays a (grouped) NULL row.

    Scale shape: the columns melt into (column, value) pairs via a map
    explode and partial-aggregate map-side into the value histogram.
    From there the per-column totals (`n_total`, `n_distinct`, and the
    entropy sum) come from a ``groupBy("column")`` AGGREGATE — map-side
    combined, parallel across the histogram partitions — broadcast-joined
    back onto the top-k rows. Entropy decomposes exactly so no
    full-histogram window is needed:  H = ln N − (1/N)·Σ cnt·ln cnt.
    The only window left is the ``row_number`` rank, which Spark rewrites
    to WindowGroupLimit (per-task k-heaps) once it is the sole window —
    so profiling a 10⁹-distinct join key never funnels the histogram
    through one task. The two consumers of the histogram share its
    (column, value) exchange via ReuseExchange: one fact scan."""
    if not cols:
        raise ValueError("skew_report needs at least one column")
    pairs = []
    for c in cols:
        pairs += [F.lit(c), F.col(c).cast("string")]
    melted = df.select(
        F.explode(F.create_map(*pairs)).alias("column", "value")
    )
    counts = melted.groupBy("column", "value").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # per-column totals as a plain aggregate (NOT a window): map-side
    # combined, parallel; one row per profiled column -> broadcast
    totals = counts.groupBy("column").agg(
        F.sum("cnt").alias("__n_total"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.col("cnt") * F.log(F.col("cnt").cast("double"))).alias(
            "__sum_clnc"
        ),
    )
    wrank = Window.partitionBy("column").orderBy(
        F.desc("cnt"), F.col("value")
    )
    ranked = (
        counts.withColumn("rank", F.row_number().over(wrank))
        .where(F.col("rank") <= top_k)
    )
    n = F.col("__n_total")
    return ranked.join(F.broadcast(totals), "column").select(
        "column",
        "value",
        "cnt",
        (F.col("cnt").cast("double") / n).alias("share"),
        (F.col("cnt").cast("double") * F.col("n_distinct") / n).alias(
            "skew_ratio"
        ),
        "rank",
        "n_distinct",
        # H = -Σ p ln p  ==  ln N − (1/N)·Σ cnt·ln cnt  (exact algebra)
        (F.log(n.cast("double")) - F.col("__sum_clnc") / n).alias("entropy"),
    )


# ------------------------------------------------ count-min sketch tables


def build_freq_sketches(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    seed: int = 0,
) -> DataFrame:
    """(group_cols..., cms array<bigint> of depth*width counters, depth,
    width, n_rows) — one count-min sketch per group. Point-query error
    envelope: est is never below the true count and exceeds it by more
    than 2n/width with probability < (1/2)^depth (uniform hash rows).

    The build explodes each row into ``depth`` slot ids before the group
    aggregate — map-side combine collapses the exchange to at most
    groups x depth x width partial counters per task. The dense counter
    array is assembled from the sparse (slot, count) pairs per group;
    ``n_rows`` falls out of the same aggregate (sum of counters in one
    depth row equals the row count)."""
    from ratatool_spark.functions.hashing import hash_cols

    if depth < 1 or width < 1:
        raise ValueError(f"need depth >= 1 and width >= 1, got {depth}x{width}")
    h = hash_cols([key_col], seed=seed)
    slots = F.transform(
        F.sequence(F.lit(0), F.lit(depth - 1)),
        lambda j: (j * width + _cms_slot(F.col("__h"), j, width)).cast("int"),
    )
    sparse = (
        df.select(*group_cols, h.alias("__h"))
        .select(*group_cols, F.explode(slots).alias("__slot"))
        .groupBy(*group_cols, "__slot")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    m = F.map_from_entries(
        F.collect_list(F.struct(F.col("__slot"), F.col("__c")))
    )
    # Bind the sparse map ONCE per group: referenced directly inside the
    # per-slot lambda it would be rebuilt from the collect_list result for
    # every one of the depth*width slots (HOFs are interpreted — no CSE).
    dense = F.element_at(
        F.transform(
            F.array(m),
            lambda mm: F.transform(
                F.sequence(F.lit(0), F.lit(depth * width - 1)),
                lambda i: F.coalesce(F.element_at(mm, i), F.lit(0)).cast("long"),
            ),
        ),
        1,
    )
    return sparse.groupBy(*group_cols).agg(
        dense.alias("cms"),
        F.first(F.lit(depth)).alias("depth"),
        F.first(F.lit(width)).alias("width"),
        (F.sum("__c") / depth).cast("long").alias("n_rows"),
    )


def merge_freq_sketches(*sketch_dfs: DataFrame) -> DataFrame:
    """Union sketch tables and sum counters element-wise per group.
    Count-min merge is LOSSLESS in the estimate sense: the merged sketch
    is identical to building one sketch over the concatenated inputs
    (counter addition is associative), pinned exactly by the oracle gate.
    Mismatched depth/width raises via the same global fused guard as the
    KMV merges (a per-group check would pass silently when differing
    geometries carry disjoint groups)."""
    if not sketch_dfs:
        raise ValueError("need at least one sketch table")
    u = sketch_dfs[0]
    for s in sketch_dfs[1:]:
        u = u.unionByName(s)
    group_cols = [
        c for c in u.columns if c not in ("cms", "depth", "width", "n_rows")
    ]
    merged = u.groupBy(*group_cols).agg(
        F.aggregate(
            F.collect_list("cms"),
            F.array_repeat(
                F.lit(0).cast("long"),
                (F.first("depth") * F.first("width")).cast("int"),
            ),
            lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
        ).alias("cms"),
        F.first("depth").alias("depth"),
        F.first("width").alias("width"),
        F.sum("n_rows").alias("n_rows"),
    )
    gk = u.agg(
        F.min("depth").alias("__dmin"),
        F.max("depth").alias("__dmax"),
        F.min("width").alias("__wmin"),
        F.max("width").alias("__wmax"),
    )
    merged = merged.crossJoin(F.broadcast(gk))
    # the guard is fused into the PAYLOAD column (cms), not a metadata
    # column: Catalyst prunes unreferenced columns, so a guard riding
    # `depth` would silently vanish for any consumer that selects only
    # cms/n_rows — and return positionally-summed garbage counters
    guard = F.when(
        (F.col("__dmin") != F.col("__dmax"))
        | (F.col("__wmin") != F.col("__wmax")),
        F.raise_error(
            F.concat(
                F.lit("merge_freq_sketches: mismatched geometry ("),
                F.col("__dmin").cast("string"),
                F.lit("x"),
                F.col("__wmin").cast("string"),
                F.lit(" vs "),
                F.col("__dmax").cast("string"),
                F.lit("x"),
                F.col("__wmax").cast("string"),
                F.lit(") — sketches are not mergeable; rebuild at one size"),
            )
        ).cast("array<bigint>"),
    ).otherwise(F.col("cms"))
    return merged.select(
        *group_cols, guard.alias("cms"), "depth", "width", "n_rows"
    )


def estimate_freqs(
    sketch_df: DataFrame,
    keys_df: DataFrame,
    key_col: str,
    seed: int = 0,
) -> DataFrame:
    """(group_cols..., key_col, est_count) — count-min point estimates of
    each probe key in each group: min over depth rows of the key's bucket
    counter. ``keys_df`` is the (small) probe list; it broadcasts onto
    the sketch table, so the cost is groups x probes array lookups —
    the fact data is never touched. ``seed`` must match the build.

    Estimates are deterministic: never below the true count, above it
    only by hash collisions that any engine replaying the same arithmetic
    reproduces bit-for-bit."""
    from ratatool_spark.functions.hashing import hash_cols

    group_cols = [
        c
        for c in sketch_df.columns
        if c not in ("cms", "depth", "width", "n_rows")
    ]
    if key_col in group_cols or key_col in ("cms", "depth", "width", "n_rows"):
        raise ValueError(
            f"probe column {key_col!r} collides with a sketch column "
            "(a group column or the reserved cms/depth/width/n_rows) "
            "— alias the probe list before estimating"
        )
    probes = keys_df.select(
        F.col(key_col), hash_cols([key_col], seed=seed).alias("__qh")
    )
    joined = sketch_df.crossJoin(F.broadcast(probes))
    est = F.array_min(
        F.transform(
            F.sequence(F.lit(0), F.col("depth") - 1),
            lambda j: F.element_at(
                "cms",
                (
                    j * F.col("width")
                    + _cms_slot(F.col("__qh"), j, F.col("width"))
                    + 1
                ).cast("int"),
            ),
        )
    )
    return joined.select(*group_cols, key_col, est.alias("est_count"))


def sketch_join_size(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
) -> DataFrame:
    """(group_cols..., est_join_rows, n_rows_a, n_rows_b) — estimated
    equi-join output cardinality |A ⋈ B| per group from two count-min
    sketch tables built on the join key (:func:`build_freq_sketches` with
    the same depth/width/seed): the CMS inner-product estimate
    ``min over depth rows j of Σ_slot a[j,slot]·b[j,slot]``, which
    estimates Σ_key f_A(key)·f_B(key) — exactly the number of rows the
    equi-join emits (Cormode & Muthukrishnan, J.Alg 2005 §4.2; error
    envelope +eps·|A|·|B| with eps = 2/width, never an underestimate in
    expectation and gated here as exact deterministic arithmetic).

    This is the 100 TB *planning* tool: decide whether a join needs a
    skew strategy (salting, AQE skew hints) or how many output partitions
    to provision, from two depth×width counter arrays — the fact tables
    are never rescanned, and sketches from any union of batches merge
    first via :func:`merge_freq_sketches`.

    Sketch tables join on their shared group columns (inner — a group
    absent from either side has no estimate); group-less global sketches
    (one row each) cross-join. Geometry mismatch raises via a guard fused
    into the output column — per-row is sound here (unlike the merge
    guard) because both geometries sit on the same joined row. Products
    are long arithmetic: counters up to ~3e9 per (bucket, bucket) pair
    are overflow-safe; past that ANSI mode raises rather than wraps."""
    reserved = ("cms", "depth", "width", "n_rows")
    ga = [c for c in sketch_a.columns if c not in reserved]
    gb = [c for c in sketch_b.columns if c not in reserved]
    if set(ga) != set(gb):
        raise ValueError(
            f"sketch group columns differ: {sorted(ga)} vs {sorted(gb)} "
            "— join-size estimation needs identically-grouped sketches"
        )
    a = sketch_a.select(
        *ga,
        F.col("cms").alias("__cms_a"),
        F.col("depth").alias("__d_a"),
        F.col("width").alias("__w_a"),
        F.col("n_rows").alias("n_rows_a"),
    )
    b = sketch_b.select(
        *gb,
        F.col("cms").alias("__cms_b"),
        F.col("depth").alias("__d_b"),
        F.col("width").alias("__w_b"),
        F.col("n_rows").alias("n_rows_b"),
    )
    joined = a.join(b, ga) if ga else a.crossJoin(b)
    # materialize the element-wise products as a NAMED column first:
    # slice() over an inline zip_with tree inside the per-depth transform
    # would re-evaluate all depth*width multiplies per depth row
    joined = joined.withColumn(
        "__prods",
        F.zip_with("__cms_a", "__cms_b", lambda x, y: x * y),
    )
    dot_rows = F.transform(
        F.sequence(F.lit(0), F.col("__d_a") - 1),
        lambda j: F.aggregate(
            F.slice(
                F.col("__prods"),
                (j * F.col("__w_a") + 1).cast("int"),
                F.col("__w_a").cast("int"),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )
    est = F.array_min(dot_rows)
    guarded = F.when(
        (F.col("__d_a") != F.col("__d_b")) | (F.col("__w_a") != F.col("__w_b")),
        F.raise_error(
            F.concat(
                F.lit("sketch_join_size: mismatched geometry ("),
                F.col("__d_a").cast("string"),
                F.lit("x"),
                F.col("__w_a").cast("string"),
                F.lit(" vs "),
                F.col("__d_b").cast("string"),
                F.lit("x"),
                F.col("__w_b").cast("string"),
                F.lit(") — rebuild both sketches at one size"),
            )
        ).cast("long"),
    ).otherwise(est)
    return joined.select(
        *ga, guarded.alias("est_join_rows"), "n_rows_a", "n_rows_b"
    )


def sketch_heavy_hitters(
    sketch_df: DataFrame,
    candidates_df: DataFrame,
    key_col: str,
    k: int = 10,
    seed: int = 0,
) -> DataFrame:
    """(group_cols..., key_col, est_count, rank) — top-k keys per group
    estimated FROM sketch artifacts, no fact-table rescan: the standard
    CMS + candidate-set pattern for heavy hitters over any union of
    batches. ``candidates_df`` is one column of candidate keys —
    typically the union of each batch's exact :func:`heavy_hitters` keys
    (a true global top-k key is a top-(k·overcount) key of at least one
    batch whenever batches are balanced; widen per-batch k for safety).

    Estimates are count-min upper bounds, so ranking inherits CMS
    determinism: ties break on the smaller key. Cost: groups x
    candidates array lookups + a WindowGroupLimit — both sketch-sized."""
    group_cols = [
        c
        for c in sketch_df.columns
        if c not in ("cms", "depth", "width", "n_rows")
    ]
    cands = candidates_df.select(key_col).distinct()
    est = estimate_freqs(sketch_df, cands, key_col, seed=seed)
    w = Window.partitionBy(*group_cols).orderBy(
        F.desc("est_count"), F.col(key_col)
    )
    return (
        est.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
