"""Skew-mitigation helpers: salted joins and two-stage aggregation.

AQE's skew-join splitting (on in ``session.py``) handles most runtime skew
by splitting oversized partitions. These helpers are the *manual* fallback
for the cases AQE can't fix:

  - a shuffle join where one key holds a double-digit percentage of all
    rows (AQE splits the partition but every split still collides on the
    hot key's sort);
  - high-cardinality aggregation state per key (e.g. ``collect_set``)
    where partial aggregation doesn't shrink the hot key.

Salting trades one extra narrow stage for an S-way spread of each hot key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__rt_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: list[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a skew-keyed big side against a small side by spreading each
    key over ``salt`` buckets: big rows get a random bucket, small rows are
    replicated into every bucket. Result is row-identical to the plain
    join; the shuffle for any single key is split S ways.

    The small side grows ×salt — keep it the dimension side. (With an
    explicitly skew-resistant broadcast — ``F.broadcast(small)`` — salting
    is unnecessary; use this when the small side is too big to broadcast
    but small enough to replicate S-way.)

    Only ``inner`` and ``left`` (big-side-preserving) joins are
    row-identical to the plain join: with ``right``/``full``, an unmatched
    small-side row would surface once per salt bucket."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: "
            "right/full would duplicate unmatched small-side rows per salt "
            "bucket"
        )
    big_s = big.withColumn(_SALT, (F.rand() * salt).cast("int"))
    small_s = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = big_s.join(small_s, keys + [_SALT], how)
    return out.drop(_SALT)


def two_stage_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, Column]],
    salt: int = 32,
) -> DataFrame:
    """Two-stage (salted) aggregation for algebraic aggregates:
    stage 1 groups on (keys, salt) computing the partial form, stage 2
    merges partials per key. ``aggs`` maps output name → (partial_expr,
    merge_expr-over-column-of-that-name).

        two_stage_agg(df, ["k"], {"n": (F.count(F.lit(1)), F.sum("n")),
                                  "mx": (F.max("x"), F.max("mx"))})

    Spark's HashAggregate already does partial aggregation *within* a task;
    the explicit salt stage additionally splits a hot key's *merge* work
    across ``salt`` reducers — relevant when one key dominates the input.
    """
    partial = df.withColumn(_SALT, (F.rand() * salt).cast("int")).groupBy(
        *keys, _SALT
    )
    p_exprs = [expr.alias(name) for name, (expr, _) in aggs.items()]
    m_exprs = [merge.alias(name) for name, (_, merge) in aggs.items()]
    return partial.agg(*p_exprs).groupBy(*keys).agg(*m_exprs)
