"""IO layer tests: format sniffing, memoization, row restriction, round-trip."""

import os

import pytest
from pyspark.sql import functions as F

from ratatool_spark.sources.io import (
    is_done,
    read_table,
    row_restriction,
    sniff_format,
    strip_quote_wrap,
    write_table,
)


def test_sniff_format():
    assert sniff_format("/a/b.parquet") == "parquet"
    assert sniff_format("/a/b.avro") == "avro"
    assert sniff_format("/a/b.json") == "json"
    assert sniff_format("/a/dir") == "parquet"
    assert sniff_format("/a/glob/*") == "parquet"


def test_strip_quote_wrap():
    assert strip_quote_wrap("'x > 1'") == "x > 1"
    assert strip_quote_wrap('"x"') == "x"
    assert strip_quote_wrap("`q`") == "q"
    assert strip_quote_wrap("plain") == "plain"
    assert strip_quote_wrap("'") == "'"


def test_row_restriction_pushdown(spark, orders):
    out = row_restriction(orders, "'o_totalprice > 100000'")
    assert out.count() == orders.where(F.col("o_totalprice") > 100000).count()
    # predicate must reach the scan (PushedFilters)
    df = row_restriction(
        read_table(spark, "/root/testdata/sf0.001/orders.parquet"),
        "o_totalprice > 100000",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "o_totalprice" in plan.split("PushedFilters")[1][:200]


def test_write_reuse_memoization(spark, orders, tmp_path):
    """SA12/S14: completed output short-circuits recompute
    (FileStorage.isDone:44-74, BigSamplerAvro.scala:240-242)."""
    out = str(tmp_path / "memo")
    assert write_table(orders.limit(10), out, mode="overwrite") is True
    assert is_done(out)
    assert write_table(orders.limit(10), out, mode="overwrite", reuse=True) is False


def test_json_roundtrip(spark, orders, tmp_path):
    """S6: TableRow-JSON-lines equivalent."""
    p = str(tmp_path / "o.json")
    write_table(orders.limit(50).select("o_orderkey", "o_orderstatus"), p, fmt="json")
    back = read_table(spark, p, fmt="json")
    assert back.count() == 50
    assert set(back.columns) == {"o_orderkey", "o_orderstatus"}


def test_tsv_header_write(spark, orders, tmp_path):
    """S12: text sink with header (saveAsTextFileWithHeader)."""
    import glob

    p = str(tmp_path / "tsv")
    write_table(orders.limit(5).select("o_orderkey"), p, header="x")
    f = glob.glob(p + "/*.csv")[0]
    assert open(f).readline().strip() == "o_orderkey"


def test_avro_routes_through_io_chokepoint(spark, lineitem, tmp_path):
    """read_table/write_table serve .avro end-to-end even without the
    spark-avro connector jar (jar-free codec fallback)."""
    from pyspark.testing import assertDataFrameEqual

    from ratatool_spark.sources.io import is_done, read_table, write_table

    sub = lineitem.select("l_orderkey", "l_linenumber", "l_returnflag").limit(200)
    out = str(tmp_path / "t.avro")
    assert write_table(sub, out)
    assert is_done(out)
    assert not write_table(sub, out, reuse=True)  # memoized skip
    back = read_table(spark, out)
    assertDataFrameEqual(back, sub)
