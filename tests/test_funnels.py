"""Funnel + retention operators (operators/funnels.py): hand-computed
fixtures pin sequential-min semantics and cohort-offset math; sf-scale
oracle parity lives in the driver queries."""

import datetime as dt

import pytest
from pyspark.sql import Row

from ratatool_spark.operators.funnels import (
    funnel,
    funnel_counts,
    retention_cohorts,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            Row(user_id=u, ts=dt.datetime(2024, 1, d, h), event_type=t)
            for u, d, h, t in rows
        ]
    )


def test_funnel_order_matters(spark):
    df = _ev(spark, [
        # u1 completes in order
        (1, 1, 0, "view"), (1, 1, 1, "click"), (1, 1, 2, "purchase"),
        # u2 has all three but purchase BEFORE click → stops at click
        (2, 1, 0, "view"), (2, 1, 1, "purchase"), (2, 1, 2, "click"),
        # u3 never views → absent (no step-0 row)
        (3, 1, 0, "click"), (3, 1, 1, "purchase"),
    ])
    got = {r["user_id"]: r for r in
           funnel(df, ["view", "click", "purchase"]).collect()}
    assert set(got) == {1, 2}
    assert got[1]["ts_2"] is not None
    assert got[2]["ts_1"] is not None and got[2]["ts_2"] is None

    counts = {r["step"]: r["n_users"] for r in
              funnel_counts(df, ["view", "click", "purchase"]).collect()}
    assert counts == {0: 2, 1: 2, 2: 1}


def test_funnel_strictly_after(spark):
    # click at the SAME timestamp as view does not count (strict >)
    df = _ev(spark, [(1, 1, 0, "view"), (1, 1, 0, "click")])
    got = funnel(df, ["view", "click"]).collect()[0]
    assert got["ts_1"] is None


def test_funnel_empty_steps_raises(spark):
    df = _ev(spark, [(1, 1, 0, "view")])
    with pytest.raises(ValueError):
        funnel(df, [])


def test_retention_triangle_exact(spark):
    df = _ev(spark, [
        # u1: first day 1, returns day 2 and 4
        (1, 1, 0, "view"), (1, 1, 5, "click"), (1, 2, 0, "view"), (1, 4, 0, "view"),
        # u2: first day 2 only
        (2, 2, 0, "view"),
    ])
    got = {(r["cohort"].day, r["period_offset"]): r["n_users"]
           for r in retention_cohorts(df, grain="day").collect()}
    # u1: cohort day1, active offsets 0/1/3; u2: cohort day2, offset 0.
    # u1's day-2 activity counts toward u1's cohort, never u2's.
    assert got == {(1, 0): 1, (1, 1): 1, (1, 3): 1, (2, 0): 1}


def test_retention_bad_grain_raises(spark):
    df = _ev(spark, [(1, 1, 0, "view")])
    with pytest.raises(ValueError):
        retention_cohorts(df, grain="fortnight")
