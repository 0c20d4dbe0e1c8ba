"""Range (interval) join — point-in-interval matching at scale.

The reference has no theta/range joins (SURVEY §2.3: only keyed equi
shapes); this is one of the extension operators a training-data /
event-analytics pipeline needs: "which window(s) does each event fall
in" where windows overlap, so it can't be a groupBy, and a raw
``ts BETWEEN start AND end`` join is a cartesian product Spark would
BroadcastNestedLoop its way through.

Scale path — the standard bucketed interval join: pick a bucket width W,
give every point its single bucket ``floor(x / W)``, explode every
interval into the buckets it spans (``sequence(floor(s/W), floor(e/W))``),
equi-join on bucket, then apply the exact range predicate. The join is a
plain shuffled/broadcast hash join on bucket ids; each point row is
never replicated (one bucket), the interval side is replicated by
``len/W + 1`` — choose W near the typical interval length to keep that
factor ~2. Degenerate hot buckets are ordinary join skew, handled by AQE
skew splitting (on in session.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyspark.sql.types import DateType, TimestampType


def _as_number(df: DataFrame, col: str) -> Column:
    """Numeric view of a point/bound column: timestamps → epoch seconds
    (fractional), dates → epoch days, numerics pass through."""
    t = df.schema[col].dataType
    if isinstance(t, TimestampType):
        return F.col(col).cast("double")
    if isinstance(t, DateType):
        return F.datediff(F.col(col), F.lit("1970-01-01")).cast("double")
    return F.col(col).cast("double")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each row of ``points`` to every row of ``intervals`` whose
    half-open range ``[start_col, end_col)`` contains ``point_col``.

    Timestamp/date columns are bucketed on their epoch value, so
    ``bucket_width`` is in seconds (days for dates). ``how="inner"``
    (matched pairs) or ``"left"`` (keep unmatched points with null
    interval columns). Output: all point columns + all interval columns.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")

    p_num = _as_number(points, point_col)
    s_num = _as_number(intervals, start_col)
    e_num = _as_number(intervals, end_col)
    w = F.lit(float(bucket_width))

    p = points.withColumn("__bkt", F.floor(p_num / w))
    iv = intervals.withColumn(
        "__bkt", F.explode(F.sequence(F.floor(s_num / w), F.floor(e_num / w)))
    )
    cond = (
        (p["__bkt"] == iv["__bkt"])
        & (p[point_col] >= iv[start_col])
        & (p[point_col] < iv[end_col])
    )
    if how == "inner":
        return p.join(iv, cond).drop("__bkt")
    # Left: points may match nothing; each match is unique per (point row,
    # interval row) because the point has exactly one bucket.
    return p.join(iv, cond, "left").drop("__bkt")
