"""Training-shard writer/verifier (sources/shards.py)."""

import glob
import json
import os

import pytest

from ratatool_spark.sources.shards import (
    MANIFEST,
    verify_shards,
    write_training_shards,
)


def test_write_verify_roundtrip(spark, orders, tmp_path):
    out = str(tmp_path / "shards")
    m = write_training_shards(
        orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        out,
        n_shards=4,
        key_cols=["o_orderkey"],
    )
    assert m["total_rows"] == orders.count()
    assert set(m["shards"]) <= {"0", "1", "2", "3"}
    # layout: one directory per shard, manifest present
    assert sorted(os.path.basename(p) for p in glob.glob(out + "/shard=*")) == [
        f"shard={i}" for i in sorted(int(s) for s in m["shards"])
    ]
    v = verify_shards(spark, out)
    assert v["ok"] and v["mismatches"] == []


def test_shard_assignment_deterministic(spark, orders, tmp_path):
    a = write_training_shards(
        orders.select("o_orderkey"), str(tmp_path / "a"), 8, ["o_orderkey"]
    )
    b = write_training_shards(
        orders.select("o_orderkey"), str(tmp_path / "b"), 8, ["o_orderkey"]
    )
    assert a["shards"] == b["shards"]


def test_verify_detects_tamper(spark, orders, tmp_path):
    out = str(tmp_path / "shards")
    write_training_shards(
        orders.select("o_orderkey", "o_orderstatus"), out, 2, ["o_orderkey"]
    )
    # tamper: claim a different checksum for shard 0
    mp = os.path.join(out, MANIFEST)
    m = json.load(open(mp))
    m["shards"]["0"]["checksum"] = "1"
    json.dump(m, open(mp, "w"))
    v = verify_shards(spark, out)
    assert not v["ok"] and "0" in v["mismatches"]


def test_bad_n_shards_raises(spark, orders, tmp_path):
    with pytest.raises(ValueError):
        write_training_shards(orders, str(tmp_path / "x"), 0, ["o_orderkey"])


def test_cli_write_shards(spark, orders, tmp_path):
    from ratatool_spark.cli import main

    src = str(tmp_path / "in.parquet")
    orders.select("o_orderkey", "o_custkey").write.parquet(src)
    out = str(tmp_path / "sh")
    rc = main(["writeShards", "--input", src, "--output", out,
               "--numShards", "3", "--keyFields", "o_orderkey", "--verify"])
    assert rc == 0
    assert os.path.exists(os.path.join(out, MANIFEST))


def test_manifest_hadoop_fs_roundtrip(spark):
    """The remote-URI manifest path goes through the Hadoop FileSystem —
    exercised here via a file:/// URI (the JVM LocalFileSystem): bytes
    must round-trip exactly (py4j mutates byte[] by value, so a readFully
    into a Python bytearray would return NULs — r4 review finding)."""
    from ratatool_spark.sources.shards import _hadoop_read, _hadoop_write

    uri = "file:///tmp/_rt_manifest_test.json"
    payload = '{"k": [1, 2, 3], "s": "héllo\\n"}'
    _hadoop_write(spark, uri, payload)
    assert _hadoop_read(spark, uri) == payload
