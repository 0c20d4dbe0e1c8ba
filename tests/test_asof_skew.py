"""As-of join + skew helper tests."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ratatool_spark.operators.asof import asof_join
from ratatool_spark.operators.skew import salted_join, two_stage_agg

BASE = dt.datetime(2024, 1, 1)


def _t(minutes):
    return BASE + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def left_right(spark):
    left = spark.createDataFrame(
        [(1, _t(10), "a"), (1, _t(30), "b"), (1, _t(5), "early"), (2, _t(20), "c")],
        "k int, ts timestamp, lv string",
    )
    right = spark.createDataFrame(
        [(1, _t(8), 100.0), (1, _t(25), 200.0), (2, _t(50), 300.0)],
        "k int, ts timestamp, rv double",
    )
    return left, right


def test_asof_backward_semantics(left_right):
    left, right = left_right
    out = {
        (r["k"], r["lv"]): (r["rv"], r["ts_r"])
        for r in asof_join(left, right, on="k").collect()
    }
    assert out[(1, "a")][0] == 100.0       # t10 -> t8
    assert out[(1, "b")][0] == 200.0       # t30 -> t25
    assert out[(1, "early")][0] is None    # t5: nothing before
    assert out[(2, "c")][0] is None        # right row is later (t50 > t20)


def test_asof_exact_tie_matches(spark):
    left = spark.createDataFrame([(1, _t(10), "x")], "k int, ts timestamp, lv string")
    right = spark.createDataFrame([(1, _t(10), 7.0)], "k int, ts timestamp, rv double")
    r = asof_join(left, right, on="k").collect()[0]
    assert r["rv"] == 7.0  # <= semantics


def test_asof_tolerance(left_right):
    left, right = left_right
    out = {
        (r["k"], r["lv"]): r["rv"]
        for r in asof_join(left, right, on="k", tolerance_seconds=180).collect()
    }
    assert out[(1, "a")] == 100.0   # 2 min gap, within 3 min
    assert out[(1, "b")] is None    # 5 min gap, beyond tolerance


def test_asof_equals_duckdb_asof(spark):
    """Cross-check the operator against DuckDB's native ASOF JOIN on a
    bigger random fixture."""
    import duckdb

    from ratatool_spark.generators import random_dataframe

    left = random_dataframe(
        spark, "k bigint, ts timestamp, lv double", 500, seed=11
    ).where(F.col("k").isNotNull() & F.col("ts").isNotNull())
    left = left.withColumn("k", F.pmod("k", F.lit(5)))
    right = random_dataframe(
        spark, "k bigint, ts timestamp, rv double", 200, seed=12
    ).where(F.col("k").isNotNull() & F.col("ts").isNotNull())
    right = right.withColumn("k", F.pmod("k", F.lit(5)))

    got = {
        (r["k"], r["ts"]): r["rv"]
        for r in asof_join(left, right, on="k").collect()
    }
    con = duckdb.connect()
    con.register("l", left.toPandas())
    con.register("r", right.toPandas())
    exp = con.execute(
        "SELECT l.k, l.ts, r.rv FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.ts >= r.ts"
    ).fetchall()
    assert len(exp) == len(got)
    for k, ts, rv in exp:
        assert got[(k, ts)] == rv


def test_salted_join_equals_plain(spark, lineitem, orders):
    plain = lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"]).count()
    salted = salted_join(
        lineitem,
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        ["l_orderkey"],
        salt=8,
    ).count()
    assert salted == plain


def test_two_stage_agg_equals_plain(spark, lineitem):
    plain = {
        (r["l_returnflag"],): (r["n"], r["mx"])
        for r in lineitem.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.max("l_quantity").alias("mx"))
        .collect()
    }
    two = {
        (r["l_returnflag"],): (r["n"], r["mx"])
        for r in two_stage_agg(
            lineitem,
            ["l_returnflag"],
            {
                "n": (F.count(F.lit(1)), F.sum("n")),
                "mx": (F.max("l_quantity"), F.max("mx")),
            },
        ).collect()
    }
    assert two == plain


# ---- range join (operators/rangejoin.py) ----


def test_range_join_matches_naive_cross(spark):
    """Bucketed range join = cross-join + range filter, for every bucket
    width (including widths smaller and larger than the intervals)."""
    from ratatool_spark.operators.rangejoin import range_join

    pts = spark.createDataFrame([(i, float(i)) for i in range(20)], "pid long, x double")
    ivs = spark.createDataFrame(
        [(100, 2.0, 7.0), (200, 5.0, 5.0), (300, 6.5, 18.0), (400, 19.0, 25.0)],
        "iid long, s double, e double",
    )
    naive = (
        pts.crossJoin(ivs)
        .where((F.col("x") >= F.col("s")) & (F.col("x") < F.col("e")))
        .select("pid", "iid")
    )
    expected = {(r["pid"], r["iid"]) for r in naive.collect()}
    assert expected, "fixture must produce matches"
    for w in (0.5, 3.0, 100.0):
        got = {
            (r["pid"], r["iid"])
            for r in range_join(pts, ivs, "x", "s", "e", bucket_width=w).collect()
        }
        assert got == expected, f"bucket_width={w}"


def test_range_join_left_keeps_unmatched(spark):
    from ratatool_spark.operators.rangejoin import range_join

    pts = spark.createDataFrame([(1, 1.0), (2, 10.0)], "pid long, x double")
    ivs = spark.createDataFrame([(7, 0.0, 2.0)], "iid long, s double, e double")
    rows = {
        r["pid"]: r["iid"]
        for r in range_join(pts, ivs, "x", "s", "e", 1.0, how="left").collect()
    }
    assert rows == {1: 7, 2: None}


def test_range_join_plan_has_no_nested_loop(spark):
    """The bucket equi-key must make this a hash/sort-merge join — a
    BroadcastNestedLoopJoin or CartesianProduct means the scale path broke."""
    from ratatool_spark.operators.rangejoin import range_join

    pts = spark.range(100).select(F.col("id").alias("pid"), F.col("id").cast("double").alias("x"))
    ivs = spark.range(10).select(
        F.col("id").alias("iid"),
        (F.col("id") * 10.0).alias("s"),
        (F.col("id") * 10.0 + 15.0).alias("e"),
    )
    plan = range_join(pts, ivs, "x", "s", "e", 10.0)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_salted_join_rejects_small_side_preserving_how(lineitem, orders):
    with pytest.raises(ValueError):
        salted_join(
            lineitem,
            orders.withColumnRenamed("o_orderkey", "l_orderkey"),
            ["l_orderkey"],
            how="full",
        )
