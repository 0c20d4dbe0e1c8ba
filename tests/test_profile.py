"""Single-pass table profiler (operators/profile.py)."""

import pytest
from pyspark.sql import Row

from ratatool_spark.operators.profile import profile_table


def test_profile_exact_values_with_nulls(spark):
    df = spark.createDataFrame(
        [
            Row(a=1, b="x"),
            Row(a=1, b=None),
            Row(a=3, b="y"),
            Row(a=None, b="y"),
        ]
    )
    got = {r["col_name"]: r for r in
           profile_table(df, exact_distinct=True).collect()}
    assert set(got) == {"a", "b"}
    ra = got["a"]
    assert (ra["n_rows"], ra["n_nulls"], ra["n_distinct"]) == (4, 1, 2)
    assert ra["null_frac"] == pytest.approx(0.25)
    assert (ra["min_value"], ra["max_value"]) == ("1", "3")
    rb = got["b"]
    assert (rb["n_rows"], rb["n_nulls"], rb["n_distinct"]) == (4, 1, 2)
    assert (rb["min_value"], rb["max_value"]) == ("x", "y")


def test_profile_single_scan_plan(spark, orders):
    """The whole profile is ONE scan + ONE aggregation: the executed plan
    must contain exactly one FileScan regardless of column count."""
    out = profile_table(
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet"),
        ["o_orderkey", "o_custkey", "o_orderstatus"],
    )
    p = out._jdf.queryExecution().executedPlan().toString()
    assert p.count("FileScan") == 1


def test_profile_approx_mode_close(spark, orders):
    approx = {r["col_name"]: r["n_distinct"]
              for r in profile_table(orders, ["o_custkey"]).collect()}
    exact = {r["col_name"]: r["n_distinct"]
             for r in profile_table(orders, ["o_custkey"],
                                    exact_distinct=True).collect()}
    assert approx["o_custkey"] == pytest.approx(exact["o_custkey"], rel=0.1)


def test_profile_empty_cols_raises(spark, orders):
    with pytest.raises(ValueError):
        profile_table(orders, [])
