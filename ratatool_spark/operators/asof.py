"""As-of (temporal backward) join — composed from existing DataFrame ops.

Not in the reference (SURVEY §2.3: no theta/range/as-of joins exist there);
added because joining facts to the most-recent dimension snapshot is a core
training-data-pipeline operation (feature stores, slowly-changing dims).

Spark-first implementation — the **union + keyed window** trick rather than
a range join:

  1. tag left rows 1, right rows 0; union on (key, ts, tag);
  2. per key, ordered by (ts, tag), carry the last non-null right payload
     forward (``F.last(ignorenulls=True)`` over unbounded-preceding);
  3. keep left rows; each has the right row with the greatest
     right_ts <= left_ts.

One shuffle (the window partitioning), no range-explosion, no per-key
driver loops — at 100 TB this is a single sort within key partitions,
and skewed keys fall under the same AQE handling as any window. A
broadcast-range variant is unnecessary: the union keeps both sides
streaming through the same exchange.

Ties: a right row at exactly left_ts matches (<=); simultaneous right rows
are ordered by ``right_ts`` then input order — pass ``tiebreak`` for a
deterministic winner.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TS, _TAG, _LPAY, _RPAY = "__asof_ts", "__asof_tag", "__asof_l", "__asof_r"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_r",
    tolerance_seconds: float | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """For every left row: columns of the latest right row (same key,
    right_ts <= left_ts), or nulls if none (left-outer as-of semantics,
    matching DuckDB/pandas ``ASOF LEFT JOIN``).

    ``right_cols`` limits which right columns are attached (default: all
    non-key, non-ts). ``tolerance_seconds`` nulls the match when the right
    row is older than ``left_ts - tolerance``. The matched right timestamp
    is always attached as ``{right_ts}{suffix}``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    rcols = right_cols or [c for c in right.columns if c not in keys and c != right_ts]

    r_order: list[Column] = [F.col(_TS).asc(), F.col(_TAG).asc()]
    if tiebreak:
        # right rows carry the tiebreak inside the payload; order the union
        # stream by it so the winning simultaneous row is deterministic
        r_order = [F.col(_TS).asc(), F.col(_TAG).asc(), F.col(f"{_RPAY}.__tb").asc_nulls_first()]

    rpay_fields = [F.col(right_ts).alias("__rts")] + [F.col(c).alias(c) for c in rcols]
    if tiebreak:
        rpay_fields.append(F.col(tiebreak).alias("__tb"))

    l_side = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_TAG),
        F.struct(*[F.col(c) for c in left.columns]).alias(_LPAY),
        F.lit(None).cast(
            right.select(F.struct(*rpay_fields).alias("s")).schema["s"].dataType
        ).alias(_RPAY),
    )
    r_side = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_TAG),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left.columns]).alias("s"))
            .schema["s"]
            .dataType
        ).alias(_LPAY),
        F.struct(*rpay_fields).alias(_RPAY),
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy(*r_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = (
        l_side.unionByName(r_side)
        .withColumn("__match", F.last(_RPAY, ignorenulls=True).over(w))
        .where(F.col(_TAG) == 1)
    )

    match = F.col("__match")
    if tolerance_seconds is not None:
        fresh = (
            F.col(_TS).cast("double") - match["__rts"].cast("double")
        ) <= F.lit(tolerance_seconds)
        match = F.when(match.isNotNull() & fresh, match)

    out_cols = [F.col(f"{_LPAY}.{c}").alias(c) for c in left.columns]
    out_cols.append(match["__rts"].alias(f"{right_ts}{suffix}"))
    for c in rcols:
        name = f"{c}{suffix}" if c in left.columns else c
        out_cols.append(match[c].alias(name))
    return matched.select(*out_cols)
