"""URL canonicalization functions (functions/urls)."""

import pytest
from pyspark.sql import functions as F

from ratatool_spark.functions.urls import (
    normalize_url,
    registered_domain,
    url_host,
    url_scheme,
)


def _norm(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r[0] for r in df.select(normalize_url(F.col("url"))).collect()]


def test_normalize_url_rules(spark):
    got = _norm(
        spark,
        [
            "HTTPS://WWW.Example.COM:443/Path/x?b=2&utm_source=nl&a=1#frag",
            "http://example.com:80",
            "http://example.com:8080/x",
            "https://example.com/x?utm_medium=m&utm_source=s&fbclid=abc",
            "https://example.com/x?gclid=1&keep=yes",
        ],
    )
    assert got == [
        # scheme+host lowered, default port gone, params filtered+sorted,
        # fragment gone; Path case PRESERVED (paths are case-sensitive)
        "https://www.example.com/Path/x?a=1&b=2",
        "http://example.com/",          # empty path -> /
        "http://example.com:8080/x",    # non-default port kept
        "https://example.com/x",        # emptied query drops its ?
        "https://example.com/x?keep=yes",
    ]


def test_normalize_url_idempotent_and_null(spark):
    urls = [
        "HTTPS://A.Example.ORG:443/p?utm_x=1&z=2&y=3#f",
        "http://b.example.com:80/q?a=1",
    ]
    once = _norm(spark, urls)
    twice = _norm(spark, once)
    assert once == twice
    df = spark.createDataFrame([(None,), ("not a url",)], "url string")
    assert [r[0] for r in df.select(normalize_url(F.col("url"))).collect()] == [
        None,
        None,
    ]


def test_url_host_and_scheme(spark):
    df = spark.createDataFrame(
        [("HTTP://WWW.Ex.CO.UK:8080/p?q=1",)], "url string"
    )
    row = df.select(
        url_scheme(F.col("url")).alias("s"),
        url_host(F.col("url")).alias("h"),
        url_host(F.col("url"), strip_www=True).alias("hw"),
    ).collect()[0]
    assert (row["s"], row["h"], row["hw"]) == ("http", "www.ex.co.uk", "ex.co.uk")


def test_registered_domain(spark):
    cases = {
        "www.news.bbc.co.uk": "bbc.co.uk",
        "a.b.example.com": "example.com",
        "example.com.au": "example.com.au",
        "sub.example.com.au": "example.com.au",
        "localhost": "localhost",
        "example.org": "example.org",
    }
    df = spark.createDataFrame([(h,) for h in cases], "host string")
    got = {
        r["host"]: r["d"]
        for r in df.select("host", registered_domain(F.col("host")).alias("d")).collect()
    }
    assert got == cases
