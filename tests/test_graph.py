"""Fixed-point PageRank (operators/graph)."""

import pytest
from pyspark.sql import functions as F

from ratatool_spark.operators.graph import pagerank

S, NUM, DEN = 10**9, 85, 100


def _reference(edges, iterations):
    """Plain-python replay of the documented fixed-point scheme."""
    e = {(a, b) for a, b in edges if a != b}
    nodes = sorted({a for a, _ in e} | {b for _, b in e})
    n = len(nodes)
    base = ((S * (DEN - NUM)) // DEN) // n
    outd = {}
    for a, _ in e:
        outd[a] = outd.get(a, 0) + 1
    r = {v: S // n for v in nodes}
    for _ in range(iterations):
        c = {v: 0 for v in nodes}
        for a, b in e:
            c[b] += r[a] // outd[a]
        dang = sum(r[v] for v in nodes if v not in outd)
        r = {v: base + (NUM * (c[v] + dang // n)) // DEN for v in nodes}
    return r


def test_pagerank_matches_python_replay(spark):
    edges = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1), (1, 2), (5, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank_fx"] for r in pagerank(df, iterations=6).collect()}
    # (1,2) duplicated and (5,5) a self-loop: both collapse/drop — node 5
    # disappears entirely (no surviving edge touches it)
    assert got == _reference(edges, 6)
    assert 5 not in got


def test_pagerank_dangling_and_mass_conservation(spark):
    # 4 is a pure sink: its inflow must recirculate via the dangling term
    edges = [(1, 4), (2, 4), (3, 4), (1, 2), (2, 3), (3, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank_fx"] for r in pagerank(df, iterations=8).collect()}
    assert got == _reference(edges, 8)
    # total mass stays ~scale (floor losses only: < n_nodes per term/iter)
    assert abs(sum(got.values()) - S) < 8 * 4 * 3
    # the sink holds the most rank
    assert max(got, key=got.get) == 4


def test_pagerank_validates_args(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="iterations"):
        pagerank(df, iterations=0)
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, damping_num=100, damping_den=100)
