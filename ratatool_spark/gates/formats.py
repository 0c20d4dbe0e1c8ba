"""Jar-free format round-trip gates (avro, proto).

Split out of __spark_entry__.py (r6 verdict #6); oracle strings are
byte-pinned by tests/test_oracle_golden.py."""


from __future__ import annotations

from ratatool_spark.gates._common import scratch_dir


from ratatool_spark.gates.diffy import _perturbed_pair


# ------------------------------------------- jar-free format round-trips
# S1/S7/S9 (avro) and S5/D4 (protobuf) exercised at the oracle gate, not
# just in pytest: Spark pushes rows through the pure-Python container
# codecs (executor-side encode, one file per partition; distributed
# binaryFile+mapInPandas decode) while the DuckDB oracle reads the same
# rows straight from parquet. Hash equality therefore proves the wire
# round-trip is value-faithful for longs, doubles, strings and timestamps
# — the property the reference's IO layer guarantees
# (AvroIO.scala:38-109, ProtoBufDiffy.scala:29-130).


def _q_avro_roundtrip(spark, sf_dir):
    """S1+S7+S9: parquet → jar-free Avro container sink → distributed
    Avro scan. Both halves parallelize per partition/file at cluster
    scale; only the schema touches the driver. The l_orderkey % 97 slice
    keeps the fixture small while covering every lineitem column type."""
    import os

    from pyspark.sql import functions as F

    from ratatool_spark.sources.io import load_tables, read_table, write_table

    li = load_tables(spark, sf_dir, names=("lineitem",))["lineitem"]
    # coalesce: the slice is tiny — 8 container files instead of one
    # (mostly empty) task per input split
    sl = li.where(F.col("l_orderkey") % 97 == 0).coalesce(8)
    out = os.path.join(scratch_dir(prefix="rt_avro_"), "lineitem.avro")
    write_table(sl, out, fmt="avro")
    return read_table(spark, out, fmt="avro")

_SQL_AVRO_ROUNDTRIP = "SELECT * FROM lineitem WHERE l_orderkey % 97 = 0"

_PROTO_ORDERS_DESC = {
    "name": "Order",
    "fields": [
        {"tag": 1, "name": "o_orderkey", "type": "int64"},
        {"tag": 2, "name": "o_custkey", "type": "int64"},
        {"tag": 3, "name": "o_orderstatus", "type": "string"},
        {"tag": 4, "name": "o_totalprice", "type": "double"},
        {"tag": 5, "name": "o_orderpriority", "type": "string"},
    ],
}

def _q_proto_roundtrip(spark, sf_dir):
    """S5: parquet → delimited-protobuf sink → distributed proto scan
    (BigSampler/BigDiffy proto mode, BigSampler.scala:262-273)."""
    import os

    from pyspark.sql import functions as F

    from ratatool_spark.sources.io import load_tables
    from ratatool_spark.sources.proto_py import read_proto, write_proto

    od = load_tables(spark, sf_dir, names=("orders",))["orders"]
    cols = [f["name"] for f in _PROTO_ORDERS_DESC["fields"]]
    sl = od.where(F.col("o_orderkey") % 97 == 0).select(cols).coalesce(8)
    out = os.path.join(scratch_dir(prefix="rt_proto_"), "orders.pb")
    write_proto(sl, out, _PROTO_ORDERS_DESC)
    return read_proto(spark, out, _PROTO_ORDERS_DESC)

_SQL_PROTO_ROUNDTRIP = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
FROM orders WHERE o_orderkey % 97 = 0
"""

_PROTO_DIFF_DESC = {
    "name": "OrderDiff",
    "fields": [
        {"tag": 1, "name": "o_orderkey", "type": "int64"},
        {"tag": 2, "name": "o_totalprice", "type": "double"},
        {"tag": 3, "name": "o_orderstatus", "type": "string"},
    ],
}

def _q_proto_diff(spark, sf_dir):
    """D4: BigDiffy over protobuf records — the diffy fixture pair is
    serialized to the wire format and the diff runs on the decoded scans
    (ProtoBufDiffy.scala:29-130, BigDiffy.scala:339). The oracle is the
    parquet-direct diffy deltas: equality holds iff the wire round-trip
    is lossless (doubles bit-identical, strings byte-identical)."""
    import os

    from ratatool_spark.operators.diffy import diff
    from ratatool_spark.sources.proto_py import read_proto, write_proto

    from pyspark.sql import functions as F

    lhs, rhs = _perturbed_pair(spark, sf_dir)
    # the wire-fidelity property is per-row; a keyed slice proves it
    # without paying the pure-Python codec for the whole table twice
    # (perturbation is keyed per-row, so post-filter == pre-filter)
    lhs = lhs.where(F.col("o_orderkey") % 7 == 0).coalesce(8)
    rhs = rhs.where(F.col("o_orderkey") % 7 == 0).coalesce(8)
    base = scratch_dir(prefix="rt_pbdiff_")
    ld, rd = os.path.join(base, "lhs.pb"), os.path.join(base, "rhs.pb")
    write_proto(lhs, ld, _PROTO_DIFF_DESC)
    write_proto(rhs, rd, _PROTO_DIFF_DESC)
    return diff(
        read_proto(spark, ld, _PROTO_DIFF_DESC),
        read_proto(spark, rd, _PROTO_DIFF_DESC),
        ["o_orderkey"],
    ).deltas
