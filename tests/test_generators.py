"""Generator tests — determinism and schema conformance mirror the
reference's generator round-trips (ProtoBufGeneratorTest.scala:28-44 "same
result every time", AvroGeneratorTest, ArbitraryTest)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ratatool_spark.generators import correlated_pair, random_dataframe

DDL = "c_long bigint, c_bool boolean, c_double double, c_str string"


def test_deterministic_same_seed(spark):
    a = random_dataframe(spark, DDL, 500, seed=1).collect()
    b = random_dataframe(spark, DDL, 500, seed=1).collect()
    assert a == b


def test_different_seed_differs(spark):
    a = random_dataframe(spark, DDL, 500, seed=1).collect()
    b = random_dataframe(spark, DDL, 500, seed=2).collect()
    assert a != b


def test_schema_conformance(spark):
    df = random_dataframe(spark, DDL, 100, seed=3)
    assert [f.dataType for f in df.schema.fields] == [
        T.LongType(),
        T.BooleanType(),
        T.DoubleType(),
        T.StringType(),
    ]


def test_nullable_fields_get_nulls(spark):
    df = random_dataframe(spark, DDL, 2000, seed=4)
    nulls = df.where(F.col("c_str").isNull()).count()
    assert 100 < nulls < 350  # ~10%


def test_string_bias(spark):
    """Degenerate-value bias (AvroGenerator.scala:100-103): empties and
    blanks must actually occur."""
    vals = [r[0] for r in random_dataframe(spark, DDL, 2000, seed=5).select("c_str").collect()]
    assert "" in vals and " " in vals and "foo" in vals


def test_complex_types(spark):
    ddl = (
        "arr array<double>, m map<string,bigint>, "
        "rec struct<a:int, b:string>, d date, ts timestamp, bin binary, "
        "dec decimal(10,2)"
    )
    rows = random_dataframe(spark, ddl, 50, seed=6).collect()
    non_null_rec = [r for r in rows if r["rec"] is not None]
    assert non_null_rec and hasattr(non_null_rec[0]["rec"], "a")
    non_null_arr = [r for r in rows if r["arr"] is not None]
    assert any(len(r["arr"]) > 0 for r in non_null_arr)


def test_overrides_amend(spark):
    """amend (scalacheck/package.scala:43-63): replace a field generator."""
    df = random_dataframe(
        spark, DDL, 100, seed=7, overrides={"c_long": F.col("__gen_id")}
    )
    vals = sorted(r[0] for r in df.select("c_long").collect())
    assert vals == list(range(100))


def test_correlated_pair_amend2(spark):
    """amend2 (scalacheck/package.scala:136-158): two datasets share keys."""
    a, b = correlated_pair(
        spark, "k bigint, x double", "k bigint, y string", "k", 300, seed=8
    )
    ka = {r[0] for r in a.select("k").collect()}
    kb = {r[0] for r in b.select("k").collect()}
    assert ka == kb and len(ka) == 300
    # payloads independent
    assert a.select("x").collect() != b.select("y").collect()


def test_generation_is_distributed(spark):
    """No driver loop: plan is range + project (scales to any n)."""
    df = random_dataframe(spark, DDL, 10, seed=9)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Range" in plan
