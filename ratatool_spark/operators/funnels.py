"""Behavioral event analytics: ordered funnels and cohort retention.

Classic event-table OLAP (the workload the ``events`` fixture models),
composed from the same primitives the rest of the engine uses: per-step
conditional minima for funnels, distinct-pairs + offset buckets for
retention. Both are pure DataFrame aggregations whose oracle twins are
plain ANSI SQL.

Scale shape: every aggregation is keyed by user (map-side partials on
the event scan) and every join joins *per-user aggregates* (one row per
user per step) — never event×event. At 100 TB the event scan dominates
and is paid once per funnel step (Catalyst shares the shuffled-by-user
exchange between steps where shapes line up)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel timestamps per user: ``ts_0`` = first occurrence of
    ``steps[0]``, ``ts_i`` = first occurrence of ``steps[i]`` STRICTLY
    AFTER ``ts_{i-1}`` (the standard sequential-min funnel semantics —
    order matters, re-orderings don't count). Null ``ts_i`` = the user
    never completed step i. One row per user who completed step 0."""
    if not steps:
        raise ValueError("steps must be non-empty")
    out = (
        df.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("ts_0"))
    )
    for i, s in enumerate(steps[1:]):
        nxt = (
            df.where(F.col(type_col) == s)
            .join(out.select(user_col, f"ts_{i}"), user_col)
            .where(F.col(ts_col) > F.col(f"ts_{i}"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"ts_{i + 1}"))
        )
        out = out.join(nxt, user_col, "left")
    return out


def funnel_counts(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Funnel conversion table: (``step``, ``step_name``, ``n_users``) —
    users whose ordered journey reached at least each step."""
    per_user = funnel(df, steps, user_col, ts_col, type_col)
    aggs = [
        F.count(F.col(f"ts_{i}")).alias(f"__n_{i}") for i in range(len(steps))
    ]
    wide = per_user.agg(*aggs)
    stack_args = []
    for i, s in enumerate(steps):
        stack_args.extend([F.lit(i), F.lit(s), F.col(f"__n_{i}")])
    return wide.select(
        F.stack(F.lit(len(steps)), *stack_args).alias(
            "step", "step_name", "n_users"
        )
    )


def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    grain: str = "day",
) -> DataFrame:
    """Cohort retention triangle: users bucketed by their FIRST active
    period (cohort), counted per period-offset they return in. Output:
    (``cohort``, ``period_offset``, ``n_users``) with offset 0 = the cohort
    period itself (so ``n_users`` at offset 0 is the cohort size).

    One distinct over (user, period) pairs, a per-user min for the
    cohort, and one broadcast-sized join back — the event table is
    scanned once."""
    per = df.select(
        F.col(user_col), F.date_trunc(grain, F.col(ts_col)).alias("__p")
    ).distinct()
    firsts = per.groupBy(user_col).agg(F.min("__p").alias("cohort"))
    if grain not in ("day", "hour", "week"):
        raise ValueError(f"unsupported grain {grain!r}")
    if grain == "hour":
        # hour buckets are whole epoch-hours apart in any fixed-offset tz;
        # epoch arithmetic is exact here
        offset = (
            (F.unix_timestamp("__p") - F.unix_timestamp("cohort")) / F.lit(3600)
        ).cast("long")
    else:
        # calendar difference, not epoch seconds: under a DST session
        # timezone a day is sometimes 23/25 h and epoch//86400 would be
        # off by one across the transition
        days = F.datediff(F.col("__p").cast("date"), F.col("cohort").cast("date"))
        offset = (days / F.lit(7)).cast("long") if grain == "week" else days.cast("long")
    return (
        per.join(firsts, user_col)
        .groupBy("cohort", offset.alias("period_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
