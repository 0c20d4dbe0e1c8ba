"""Sequence packing (operators/packing.py): bin assignment invariants."""

import pytest
from pyspark.sql import functions as F

from ratatool_spark.operators.packing import pack_sequences


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"s{i % 3}", 10 + (i * 7) % 50) for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, src string, tok long")


def test_bins_monotone_and_offsets(spark, docs):
    out = pack_sequences(
        docs, "tok", 128, ["doc_id"], ["src"], offset_col="off"
    ).collect()
    by_src = {}
    for r in sorted(out, key=lambda r: (r["src"], r["doc_id"])):
        by_src.setdefault(r["src"], []).append(r)
    for rows in by_src.values():
        run = 0
        prev_bin = 0
        for r in rows:
            assert r["off"] == run  # exclusive prefix sum
            assert r["bin_id"] == run // 128  # chunk where the doc starts
            assert r["bin_id"] >= prev_bin  # monotone, no gaps backwards
            prev_bin = r["bin_id"]
            run += r["tok"]


def test_bin_budget_overflow_bounded(spark, docs):
    """A bin's total exceeds the budget by less than its last doc
    (straddle semantics), never more."""
    out = pack_sequences(docs, "tok", 128, ["doc_id"], ["src"])
    agg = (
        out.groupBy("src", "bin_id")
        .agg(F.sum("tok").alias("total"), F.max("tok").alias("mx"))
        .collect()
    )
    for r in agg:
        assert r["total"] < 128 + r["mx"]


def test_deterministic_and_group_independent(spark, docs):
    a = pack_sequences(docs, "tok", 64, ["doc_id"], ["src"]).collect()
    b = pack_sequences(docs, "tok", 64, ["doc_id"], ["src"]).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # packing one group alone matches its slice of the full run
    one = pack_sequences(
        docs.where(F.col("src") == "s1"), "tok", 64, ["doc_id"], ["src"]
    ).collect()
    full = [r for r in a if r["src"] == "s1"]
    assert sorted(map(tuple, one)) == sorted(map(tuple, full))


def test_budget_validation(spark, docs):
    with pytest.raises(ValueError):
        pack_sequences(docs, "tok", 0, ["doc_id"])
