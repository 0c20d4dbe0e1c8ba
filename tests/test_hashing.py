"""Hash invariants — mirrors the reference's property tests
(BigSamplerTest.scala:52-104: bound in [0,1], determinism, 0%/100% dice)."""

import duckdb
from pyspark.sql import functions as F

from ratatool_spark.functions.hashing import (
    HASH_SPACE,
    bound01,
    dice,
    duckdb_dice_sql,
    hash_cols,
    xxdice,
)


def test_bound01_in_range(spark, lineitem):
    d = lineitem.select(
        bound01(hash_cols([F.col("l_orderkey")], seed=1)).alias("d")
    )
    row = d.agg(F.min("d"), F.max("d")).collect()[0]
    assert 0.0 <= row[0] and row[1] < 1.0


def test_dice_deterministic(spark, lineitem):
    a = lineitem.select(dice(["l_orderkey", "l_linenumber"], seed=7).alias("d"))
    b = lineitem.select(dice(["l_orderkey", "l_linenumber"], seed=7).alias("d"))
    assert a.collect() == b.collect()


def test_seed_changes_hash(spark, lineitem):
    a = lineitem.select(dice(["l_orderkey"], seed=1).alias("d")).collect()
    b = lineitem.select(dice(["l_orderkey"], seed=2).alias("d")).collect()
    assert a != b


def test_portable_matches_duckdb(spark, lineitem):
    """Cross-engine reproducibility — the property the reference's
    FARM_FINGERPRINT compatibility exists for (sampling/README.md:90-97)."""
    s = (
        lineitem.limit(100)
        .select("l_orderkey", dice(["l_orderkey"], seed=42).alias("d"))
        .collect()
    )
    con = duckdb.connect()
    expr = duckdb_dice_sql(["CAST(l_orderkey AS VARCHAR)"], seed=42)
    d = con.execute(
        f"SELECT l_orderkey, {expr} AS d FROM "
        "'/root/testdata/sf0.001/lineitem.parquet' LIMIT 100"
    ).fetchall()
    smap = {r[0]: r[1] for r in s}
    for k, v in d:
        assert abs(smap[k] - v) < 1e-15


def test_xxdice_range(spark, lineitem):
    row = (
        lineitem.select(xxdice(["l_orderkey"], seed=3).alias("d"))
        .agg(F.min("d"), F.max("d"))
        .collect()[0]
    )
    assert 0.0 <= row[0] and row[1] <= 1.0


def test_hash_space_is_60_bits():
    assert HASH_SPACE == float(1 << 60)


def test_serialize_timestamp_exact_integer_micros(spark):
    """Timestamps feed the hash as exact integer epoch-micros (the old
    double round-trip was off by ±1us at current epochs — double has only
    ~0.4us resolution there — breaking cross-engine dice reproducibility)."""
    import datetime as dt

    from pyspark.sql import types as T

    from ratatool_spark.functions.hashing import serialize_for_hash

    ts = dt.datetime(2024, 5, 17, 13, 45, 1, 999999, tzinfo=dt.timezone.utc)
    df = spark.createDataFrame([(ts,)], "t timestamp")
    got = df.select(
        serialize_for_hash(F.col("t"), T.TimestampType()).alias("s")
    ).collect()[0]["s"]
    # exact integer micros, computed independently of Spark
    import calendar

    micros = calendar.timegm(ts.utctimetuple()) * 1_000_000 + ts.microsecond
    assert got == str(micros)
