"""Single-pass table profiler: per-column completeness / cardinality /
range statistics — the "analyze" step before any large-scale ingest,
and a standalone generalization of the diff engine's per-field stats
(BigDiffy fieldStats, `operators/diffy.py`).

Shape: ONE scan, ONE aggregation producing every column's statistics as
a single wide row (map-side partial aggregation does the heavy lifting),
then a plan-side unpivot (``stack``) to one output row per column — no
per-column jobs, no driver loops. At 100 TB the scan dominates and is
paid exactly once.

``exact_distinct=False`` (default) uses ``approx_count_distinct`` (HLL,
mergeable, constant memory) — the 100 TB setting. ``True`` computes
exact distincts (Spark expands one pass per distinct aggregate) — the
engine-portable setting the DuckDB oracle twin checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def histogram(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_buckets: int = 10,
) -> DataFrame:
    """Equi-width histogram with caller-provided bounds — single pass,
    one keyed aggregation. Output: (``bucket``, ``lo``, ``hi``, ``cnt``)
    for every bucket 0..n-1 (empty buckets included, so the shape is
    stable for plotting/monitoring). Values outside [lo, hi) clamp into
    the edge buckets; nulls are dropped.

    Bounds come from the caller (a prior :func:`profile_table` run or
    domain knowledge) precisely so the histogram itself stays one pass —
    the classic two-pass min/max+bucket split into two explicit calls."""
    if not n_buckets > 0 or not hi > lo:
        raise ValueError("need n_buckets > 0 and hi > lo")
    w = (hi - lo) / n_buckets
    c = F.col(col)
    b = F.least(
        F.greatest(F.floor((c - F.lit(lo)) / F.lit(w)), F.lit(0)),
        F.lit(n_buckets - 1),
    ).cast("int")
    counts = (
        df.where(c.isNotNull())
        .groupBy(b.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    spark = df.sparkSession
    frame = spark.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
    return (
        frame.join(counts, "bucket", "left")
        .select(
            "bucket",
            (F.lit(lo) + F.col("bucket") * F.lit(w)).alias("lo"),
            (F.lit(lo) + (F.col("bucket") + 1) * F.lit(w)).alias("hi"),
            F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
        )
    )


def calibration_report(
    df: DataFrame,
    prob_col: str = "prob",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """Classifier calibration (reliability) table: bucket predictions by
    predicted probability and compare the mean prediction against the
    observed positive rate per bucket — the eval step between training a
    quality/language classifier and trusting its threshold at corpus
    scale. Output one row per non-empty bin:
    (bin, n, n_pos, frac_pos, mean_prob); |frac_pos − mean_prob|
    weighted by n/Σn is the bin's ECE contribution.

    Probabilities sum as fixed-point nano-units (exact longs), so
    ``mean_prob`` is independent of aggregation order — cross-engine /
    cross-run stable. ``prob == 1.0`` lands in the top bin.

    100 TB shape: one scan + ONE map-side-combined aggregate over at
    most ``n_bins`` groups."""
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    b = F.least(
        F.floor(F.col(prob_col) * n_bins), F.lit(n_bins - 1)
    ).cast("long")
    return (
        df.groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(label_col).cast("int")).alias("n_pos"),
            F.sum(
                F.round(F.col(prob_col) * F.lit(1.0e9), 0).cast("long")
            ).alias("__p_fx"),
        )
        .select(
            "bin",
            "n",
            "n_pos",
            (F.col("n_pos").cast("double") / F.col("n")).alias("frac_pos"),
            (
                F.col("__p_fx").cast("double") / F.lit(1.0e9) / F.col("n")
            ).alias("mean_prob"),
        )
    )


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """Profile ``cols`` (default: all) → one row per column:
    (``col_name``, ``n_rows``, ``n_nulls``, ``null_frac``, ``n_distinct``,
    ``min_value``, ``max_value``) with min/max rendered as strings so the
    output schema is column-type-independent."""
    cols = list(cols) if cols is not None else [f.name for f in df.schema.fields]
    if not cols:
        raise ValueError("no columns to profile")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        col = F.col(c)
        aggs.append(F.count(col).alias(f"__nn_{c}"))
        aggs.append(
            (
                F.count_distinct(col)
                if exact_distinct
                else F.approx_count_distinct(col)
            ).alias(f"__nd_{c}")
        )
        aggs.append(F.min(col).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(col).cast("string").alias(f"__max_{c}"))
    wide = df.agg(*aggs)
    stack_args = []
    for c in cols:
        stack_args.extend(
            [
                F.lit(c),
                F.col(f"__nn_{c}"),
                F.col(f"__nd_{c}"),
                F.col(f"__min_{c}"),
                F.col(f"__max_{c}"),
            ]
        )
    unpivoted = wide.select(
        F.col("__n"),
        F.stack(
            F.lit(len(cols)),
            *stack_args,
        ).alias("col_name", "__nn", "n_distinct", "min_value", "max_value"),
    )
    return unpivoted.select(
        "col_name",
        F.col("__n").alias("n_rows"),
        (F.col("__n") - F.col("__nn")).alias("n_nulls"),
        # try_divide: profiling an EMPTY (or fully filtered) table must
        # return a row with null_frac NULL, not throw ANSI DIVIDE_BY_ZERO
        F.try_divide(F.col("__n") - F.col("__nn"), F.col("__n")).alias(
            "null_frac"
        ),
        "n_distinct",
        "min_value",
        "max_value",
    )


def profile_pii(
    df: DataFrame,
    columns: list[str] | None = None,
    sample_fraction: float | None = None,
    dice_cols: list[str] | None = None,
    seed: int = 0,
) -> DataFrame:
    """Column-level PII scan — the governance question "WHICH columns
    carry emails / IPs / phones / SSNs / card numbers, and how often":
    one row per scanned string column with the rows-scanned count and
    per-pattern match-bearing-row counts (``n_email``, ``n_ipv4``,
    ``n_phone``, ``n_ssn``, ``n_card_shaped``, ``n_card_luhn`` — the
    Luhn-verified subset separates real PANs from id-shaped noise).

    ``sample_fraction`` scans a deterministic hash-dice cohort instead of
    the full table (``dice_cols`` defaults to the scanned columns'
    values, so membership is content-stable) — at 100 TB a 0.1% sample
    bounds the scan while rates stay estimable; the counts are over the
    sample and reproducible in any engine.

    Shape: ONE pass — every (column × pattern) counter is a conditional
    aggregate in a single aggregation over a single scan; the unpivot to
    one-row-per-column happens on the 1-row aggregate result (stack),
    never on data."""
    from ratatool_spark.functions.hashing import dice
    from ratatool_spark.functions.text import (
        CARD_RE,
        EMAIL_RE,
        IPV4_RE,
        PHONE_RE,
        SSN_RE,
        luhn_valid,
    )

    if columns is None:
        columns = [
            f.name for f in df.schema.fields if f.dataType.simpleString() == "string"
        ]
    if not columns:
        raise ValueError("no string columns to scan")
    for c in columns:
        if "'" in c or "`" in c:
            raise ValueError(
                f"column name {c!r} contains a quote/backtick — it would "
                "break the generated stack() unpivot; rename the column "
                "(withColumnRenamed) before scanning"
            )
    scan = df
    if sample_fraction is not None:
        dcols = dice_cols if dice_cols is not None else columns
        scan = df.where(dice([F.col(c) for c in dcols], seed=seed) < sample_fraction)

    pats = {
        "n_email": EMAIL_RE,
        "n_ipv4": IPV4_RE,
        "n_phone": PHONE_RE,
        "n_ssn": SSN_RE,
        "n_card_shaped": CARD_RE,
    }
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        for name, pat in pats.items():
            aggs.append(
                F.count(
                    F.when(F.col(c).rlike(pat), F.lit(1))
                ).alias(f"__{name}__{c}")
            )
        cards = F.regexp_extract_all(F.col(c), F.lit(CARD_RE), F.lit(0))
        aggs.append(
            F.count(
                F.when(F.size(F.filter(cards, luhn_valid)) > 0, F.lit(1))
            ).alias(f"__n_card_luhn__{c}")
        )
    row = scan.agg(*aggs)
    names = [*pats.keys(), "n_card_luhn"]
    stack_args = []
    for c in columns:
        stack_args.append(f"'{c}'")
        stack_args.extend(f"`__{n}__{c}`" for n in names)
    expr = (
        f"stack({len(columns)}, {', '.join(stack_args)}) as "
        f"(column, {', '.join(names)})"
    )
    return row.select(F.col("__n").alias("n_scanned"), F.expr(expr)).select(
        "column", "n_scanned", *names
    )


def k_anonymity(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 10,
) -> DataFrame:
    """k-anonymity audit over a set of quasi-identifier columns: one row
    per equivalence class (distinct quasi-identifier combination) with
    its size and an ``at_risk`` flag (``class_size < k``) — the release
    gate before publishing a dataset keyed on indirect identifiers
    (Sweeney's k-anonymity; rows in classes smaller than k are
    re-identifiable by linking on the quasi-identifiers).

    Summarize with :func:`k_anonymity_summary` for the one-row verdict
    (``k_min`` — the dataset's actual anonymity parameter — plus the
    at-risk row count and rate).

    100 TB shape: ONE hash aggregation on the quasi-identifier key,
    map-side combined (class counts collapse per partition before the
    exchange); output cardinality is the number of classes, not rows."""
    if not quasi_cols:
        raise ValueError("need at least one quasi-identifier column")
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("class_size"))
        .withColumn("at_risk", F.col("class_size") < k)
    )


def k_anonymity_summary(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 10,
) -> DataFrame:
    """One-row k-anonymity verdict: ``k_min`` (smallest class — the value
    of k the dataset ACTUALLY satisfies), class counts, and the number /
    rate of rows living in classes below the target ``k``. Second
    aggregation runs over the class table (bounded by class cardinality),
    not the data."""
    classes = k_anonymity(df, quasi_cols, k)
    return classes.agg(
        F.min("class_size").alias("k_min"),
        F.count(F.lit(1)).alias("n_classes"),
        F.sum(F.when(F.col("at_risk"), F.lit(1)).otherwise(F.lit(0))).alias(
            "n_classes_at_risk"
        ),
        F.sum(
            F.when(F.col("at_risk"), F.col("class_size")).otherwise(F.lit(0))
        ).alias("n_rows_at_risk"),
        F.round(
            F.sum(
                F.when(F.col("at_risk"), F.col("class_size")).otherwise(
                    F.lit(0)
                )
            )
            / F.sum("class_size"),
            6,
        ).alias("at_risk_rate"),
    )


def mutual_information(
    df: DataFrame,
    pairs: list[tuple[str, str]],
) -> DataFrame:
    """(x_col, y_col, n, h_x, h_y, mi, nmi) — Shannon mutual information
    in nats between each requested column pair, plus the marginal
    entropies and the min-entropy-normalized score ``nmi = mi /
    min(h_x, h_y)`` in [0, 1].

    The **leakage audit** for a training pipeline: a feature column with
    nmi ≈ 1 against the label (or against a held-out-split assignment)
    determines it — the classic target-leak / split-contamination
    signal; nmi ≈ 0 means the pair is independent. Values compare in
    their string rendering (heterogeneous column types, NULL is a
    category), like :func:`ratatool_spark.operators.freq.skew_report`.

    Exact algebra, no windows, no collect: with pair counts c_xy and
    marginals c_x, c_y over n rows,

        MI = ln n + (Σ c_xy·ln c_xy − Σ c_x·ln c_x − Σ c_y·ln c_y) / n

    so everything reduces to ONE groupBy(pair, x, y) aggregate over a
    struct-explode melt (one scan covers every pair; map-side combined)
    and three re-aggregations of that counts table — each parallel over
    the value partitions, joined back as 1-row-per-pair broadcasts. A
    10⁹-distinct pair never funnels through a single task. The counts
    subplan is shared via persist."""
    from ratatool_spark.cache import persist_tracked

    if not pairs:
        raise ValueError("mutual_information needs at least one column pair")
    structs = [
        F.struct(
            F.lit(x).alias("x_col"),
            F.lit(y).alias("y_col"),
            F.col(x).cast("string").alias("x"),
            F.col(y).cast("string").alias("y"),
        )
        for x, y in pairs
    ]
    melted = df.select(F.explode(F.array(*structs)).alias("p")).select("p.*")
    counts = persist_tracked(
        melted.groupBy("x_col", "y_col", "x", "y").agg(
            F.count(F.lit(1)).alias("c")
        )
    )
    clnc = F.sum(F.col("c") * F.log(F.col("c").cast("double")))
    joint = counts.groupBy("x_col", "y_col").agg(
        F.sum("c").alias("n"), clnc.alias("__j")
    )
    mx = (
        counts.groupBy("x_col", "y_col", "x")
        .agg(F.sum("c").alias("c"))
        .groupBy("x_col", "y_col")
        .agg(clnc.alias("__mx"))
    )
    my = (
        counts.groupBy("x_col", "y_col", "y")
        .agg(F.sum("c").alias("c"))
        .groupBy("x_col", "y_col")
        .agg(clnc.alias("__my"))
    )
    n = F.col("n").cast("double")
    h_x = F.log(n) - F.col("__mx") / n
    h_y = F.log(n) - F.col("__my") / n
    mi = F.log(n) + (F.col("__j") - F.col("__mx") - F.col("__my")) / n
    min_h = F.least(h_x, h_y)
    return (
        joint.join(mx, ["x_col", "y_col"])
        .join(my, ["x_col", "y_col"])
        .select(
            "x_col",
            "y_col",
            "n",
            F.round(h_x, 6).alias("h_x"),
            F.round(h_y, 6).alias("h_y"),
            F.round(mi, 6).alias("mi"),
            F.round(
                F.when(min_h > 0, mi / min_h).otherwise(F.lit(0.0)), 6
            ).alias("nmi"),
        )
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: float = 3.5,
    approx: bool = False,
    quantize_scale: int = 10**6,
) -> DataFrame:
    """Input rows + (``robust_z``, ``is_outlier``) — robust per-group
    outlier flags via the Iglewicz–Hoaglin modified z-score
    ``0.6745·(x − median) / MAD`` with cutoff ``|z| > k`` (their
    recommended 3.5 default). Median/MAD resist the very outliers a
    mean/std filter would absorb — the numeric-QC pass to run on metric
    and feature columns before training.

    Values are quantized to ``quantize_scale`` fixed-point longs FIRST,
    so every downstream quantity (median of longs, |x − med| halves,
    the z formula) is deterministic, engine-portable arithmetic — the
    oracle gates exact values. When ``MAD = 0`` (over half the group
    identical) ``robust_z`` is NULL and any value off the median is
    flagged — the conservative reading of a degenerate spread.

    Two aggregates over the group (median, then MAD around it) with the
    1-row-per-group results broadcast back; nothing else shuffles.
    ``approx=False`` uses exact ``percentile`` — per-group memory, the
    oracle-portable mode; ``approx=True`` switches both quantiles to
    ``percentile_approx`` (mergeable sketch, constant memory — the
    100 TB setting; flags near the cutoff may differ by the sketch
    tolerance)."""
    gcols = list(group_cols or [])
    q = F.percentile_approx if approx else F.percentile
    v_fx = F.round(F.col(value_col) * quantize_scale).cast("long")
    with_fx = df.withColumn("__v_fx", v_fx)
    med = with_fx.groupBy(*gcols).agg(
        q(F.col("__v_fx"), F.lit(0.5)).alias("__med")
    )
    j1 = (
        with_fx.join(F.broadcast(med), gcols)
        if gcols
        else with_fx.crossJoin(F.broadcast(med))
    )
    mad = j1.groupBy(*gcols).agg(
        q(F.abs(F.col("__v_fx") - F.col("__med")), F.lit(0.5)).alias("__mad"),
        F.first("__med").alias("__med2"),
    )
    j2 = (
        with_fx.join(F.broadcast(mad), gcols)
        if gcols
        else with_fx.crossJoin(F.broadcast(mad))
    )
    dev = F.col("__v_fx") - F.col("__med2")
    z = F.when(
        F.col("__mad") > 0, F.round(F.lit(0.6745) * dev / F.col("__mad"), 6)
    )
    flag = F.when(F.col("__mad") > 0, F.abs(z) > k).otherwise(dev != 0)
    return j2.select(
        *df.columns, z.alias("robust_z"), flag.alias("is_outlier")
    )


def drift_report(
    df_a: DataFrame,
    df_b: DataFrame,
    categorical: list[str] | None = None,
    numeric: list[str] | None = None,
    n_buckets: int = 10,
    top_k: int = 20,
    smoothing: float = 0.5,
    numeric_bounds: dict | None = None,
) -> DataFrame:
    """(column, kind, n_bins, n_a, n_b, psi) — population stability
    index between two table snapshots per column: the standard
    train-vs-serve / snapshot-vs-snapshot drift metric,

        PSI = Σ_bins (p_a − p_b) · ln(p_a / p_b)

    (≈0 stable; >0.1 drifting; >0.25 re-examine — the usual reading).
    Categorical columns bucket by value string with the combined top-``top_k``
    kept and the tail pooled into ``__other__`` (stable bin structure no
    matter how many new values snapshot B invents). Numeric columns
    bucket equi-width over the COMBINED min/max (same bins both sides by
    construction). Shares are Laplace-smoothed — ``(c + s)/(N + s·B)``
    — so empty bins contribute finite, deterministic terms instead of
    ±inf; with s = 0.5 a bin present in A and absent in B is charged
    sharply but boundedly.

    One melt + one (column, bucket, side) aggregate per column family,
    map-side combined; the per-column reductions (totals, bin counts,
    the PSI sum) are plain groupBy aggregates broadcast-joined — the
    same no-window-funnel discipline as
    :func:`ratatool_spark.operators.freq.skew_report`, so a
    high-cardinality categorical column costs its distinct-count
    aggregate plus a top-k WindowGroupLimit, never a single-task sort.
    The combined numeric min/max ride a broadcast 1-row aggregate (no
    driver collect).

    ``numeric_bounds``: optional ``{column: (lo, hi)}`` PINNED bin
    bounds (the :func:`fixed_bins` spec). A pinned column buckets
    equi-width over the given range with edge clamping and skips the
    combined-min/max pass entirely — at 100 TB a train-vs-serve
    comparison against a historical snapshot should derive the bin spec
    ONCE, persist it, and never rescan the reference side just to
    recompute its min/max. When every numeric column is pinned the
    union is scanned exactly once (the melt)."""
    from ratatool_spark.cache import persist_tracked

    cats = list(categorical or [])
    nums = list(numeric or [])
    if not cats and not nums:
        raise ValueError("drift_report needs at least one column")
    both = df_a.select(
        *(F.col(c).cast("string").alias(c) for c in cats),
        *(F.col(c).cast("double").alias(c) for c in nums),
        F.lit(0).alias("__side"),
    ).unionByName(
        df_b.select(
            *(F.col(c).cast("string").alias(c) for c in cats),
            *(F.col(c).cast("double").alias(c) for c in nums),
            F.lit(1).alias("__side"),
        )
    )

    # pass 1 (numeric only): ONE wide min/max row over the union,
    # broadcast — no per-column jobs, no melt, no driver collect.
    # Pinned columns (numeric_bounds) are excluded: their bounds are
    # plan literals, so when everything is pinned this pass vanishes.
    bounds = dict(numeric_bounds or {})
    unknown = set(bounds) - set(nums)
    if unknown:
        raise ValueError(f"numeric_bounds for non-numeric columns: {unknown}")
    derived = [c for c in nums if c not in bounds]
    if derived:
        rng_aggs = []
        for c in derived:
            rng_aggs += [
                F.min(F.col(c)).alias(f"__lo_{c}"),
                F.max(F.col(c)).alias(f"__hi_{c}"),
            ]
        both = both.crossJoin(F.broadcast(both.agg(*rng_aggs)))

    # pass 2: ONE melt buckets every column family together — the union
    # is scanned exactly twice total (the min/max pass + this melt)
    structs = []
    for c in cats:
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.lit("categorical").alias("kind"),
                F.col(c).alias("bucket"),
            )
        )
    for c in nums:
        if c in bounds:
            blo, bhi = bounds[c]
            if not bhi > blo:
                raise ValueError(f"need hi > lo for {c!r}, got ({blo}, {bhi})")
            lo, hi = F.lit(float(blo)), F.lit(float(bhi))
        else:
            lo, hi = F.col(f"__lo_{c}"), F.col(f"__hi_{c}")
        width = (hi - lo) / n_buckets
        b = F.when(hi == lo, F.lit(0)).otherwise(
            F.least(
                F.greatest(F.floor((F.col(c) - lo) / width), F.lit(0)),
                F.lit(n_buckets - 1),
            )
        )
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.lit("numeric").alias("kind"),
                b.cast("string").alias("bucket"),
            )
        )
    melted = (
        both.select("__side", F.explode(F.array(*structs)).alias("p"))
        .select("__side", "p.*")
        # numeric NULLs drop (no bucket); categorical NULL is a category
        .where(~((F.col("kind") == "numeric") & F.col("bucket").isNull()))
    )
    # value-histogram counts — the ONLY row-derived state; persisted
    # because the categorical top-k pooling and the final pivot both
    # consume it (same envelope as skew_report's counts table)
    counts = persist_tracked(
        melted.groupBy("column", "kind", "bucket", "__side").agg(
            F.count(F.lit(1)).alias("c")
        )
    )
    frames = []
    if cats:
        ccounts = counts.where(F.col("kind") == "categorical")
        w = Window.partitionBy("column").orderBy(F.desc("tot"), F.col("bucket"))
        top = (
            ccounts.groupBy("column", "bucket")
            .agg(F.sum("c").alias("tot"))
            .withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") <= top_k)
            .select("column", "bucket", F.lit(1).alias("__keep"))
        )
        pooled = (
            ccounts.join(F.broadcast(top), ["column", "bucket"], "left")
            .select(
                "column",
                F.lit("categorical").alias("kind"),
                F.when(F.col("__keep").isNotNull(), F.col("bucket"))
                .otherwise(F.lit("__other__"))
                .alias("bucket"),
                "__side",
                "c",
            )
            .groupBy("column", "kind", "bucket", "__side")
            .agg(F.sum("c").alias("c"))
        )
        frames.append(pooled)
    if nums:
        frames.append(counts.where(F.col("kind") == "numeric"))

    binned = frames[0]
    for f in frames[1:]:
        binned = binned.unionByName(f)
    # bin-count table is bins-sized — persist it: every consumer below
    # would otherwise re-derive the melt + aggregates (a branch-doubling
    # subtree; measured 9.7 s -> 0.9 s at sf0.1 with the pivot + persist)
    binned = persist_tracked(binned)
    # pivot sides into columns in ONE aggregate — no grid cross-join, no
    # self-join: a bin absent from a side smooths from c = 0 naturally
    side_c = lambda s: F.coalesce(
        F.max(F.when(F.col("__side") == s, F.col("c"))), F.lit(0)
    )
    pivoted = binned.groupBy("column", "kind", "bucket").agg(
        side_c(0).alias("ca"), side_c(1).alias("cb")
    )
    tot = pivoted.groupBy("column").agg(
        F.sum("ca").alias("n_a"),
        F.sum("cb").alias("n_b"),
        F.count(F.lit(1)).alias("n_bins"),
    )
    s = F.lit(smoothing)
    pa = (F.col("ca") + s) / (F.col("n_a") + s * F.col("n_bins"))
    pb = (F.col("cb") + s) / (F.col("n_b") + s * F.col("n_bins"))
    return (
        pivoted.join(F.broadcast(tot), "column")
        .groupBy("column")
        .agg(
            F.first("kind").alias("kind"),
            F.first("n_bins").alias("n_bins"),
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
            F.round(F.sum((pa - pb) * F.log(pa / pb)), 6).alias("psi"),
        )
    )


def fixed_bins(
    df: DataFrame,
    categorical: list[str] | None = None,
    numeric_bounds: dict | None = None,
    n_buckets: int = 10,
) -> DataFrame:
    """(column, kind, bucket, c) — bin counts under a FIXED binning
    spec: categorical columns bucket by raw value string, numeric
    columns equi-width over caller-provided ``(lo, hi)`` bounds with
    clamping. The streaming-safe sibling of :func:`drift_report`'s
    internal binning — fixed bounds mean partials from any data slice
    (a micro-batch, a snapshot) are mergeable by plain count addition,
    which is what :mod:`ratatool_spark.streaming.drift` relies on.
    One melt + one map-side-combined aggregate."""
    cats = list(categorical or [])
    bounds = dict(numeric_bounds or {})
    if not cats and not bounds:
        raise ValueError("fixed_bins needs at least one column")
    structs = []
    for c in cats:
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.lit("categorical").alias("kind"),
                F.col(c).cast("string").alias("bucket"),
            )
        )
    for c, (lo, hi) in bounds.items():
        if not hi > lo:
            raise ValueError(f"need hi > lo for {c!r}, got ({lo}, {hi})")
        width = (hi - lo) / n_buckets
        b = F.least(
            F.greatest(
                F.floor((F.col(c).cast("double") - lo) / width), F.lit(0)
            ),
            F.lit(n_buckets - 1),
        )
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.lit("numeric").alias("kind"),
                b.cast("string").alias("bucket"),
            )
        )
    return (
        df.select(F.explode(F.array(*structs)).alias("p"))
        .select("p.*")
        .groupBy("column", "kind", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def psi_from_bins(
    ref_bins: DataFrame,
    live_bins: DataFrame,
    smoothing: float = 0.5,
) -> DataFrame:
    """(column, kind, n_bins, n_ref, n_live, psi) — population
    stability index between two :func:`fixed_bins` tables over the
    UNION bucket grid with Laplace-smoothed shares (same algebra and
    reading as :func:`drift_report`; this entry point takes
    pre-binned counts so the reference can be computed once and the
    live side can come from merged streaming partials)."""
    r = ref_bins.groupBy("column", "kind", "bucket").agg(
        F.sum("c").alias("ca")
    )
    l = live_bins.groupBy("column", "kind", "bucket").agg(
        F.sum("c").alias("cb")
    )
    pivoted = (
        r.join(l, ["column", "kind", "bucket"], "full_outer")
        .select(
            "column",
            "kind",
            "bucket",
            F.coalesce(F.col("ca"), F.lit(0)).alias("ca"),
            F.coalesce(F.col("cb"), F.lit(0)).alias("cb"),
        )
    )
    tot = pivoted.groupBy("column").agg(
        F.sum("ca").alias("n_ref"),
        F.sum("cb").alias("n_live"),
        F.count(F.lit(1)).alias("n_bins"),
    )
    s = F.lit(smoothing)
    pa = (F.col("ca") + s) / (F.col("n_ref") + s * F.col("n_bins"))
    pb = (F.col("cb") + s) / (F.col("n_live") + s * F.col("n_bins"))
    return (
        pivoted.join(F.broadcast(tot), "column")
        .groupBy("column")
        .agg(
            F.first("kind").alias("kind"),
            F.first("n_bins").alias("n_bins"),
            F.first("n_ref").alias("n_ref"),
            F.first("n_live").alias("n_live"),
            F.round(F.sum((pa - pb) * F.log(pa / pb)), 6).alias("psi"),
        )
    )
