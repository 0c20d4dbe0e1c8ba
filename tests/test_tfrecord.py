"""TFRecord container codec (sources/tfrecord_py): CRC32C vectors, framing
corruption detection, Example encode/decode, distributed roundtrip."""

import os
import struct
import tempfile

import pytest

from ratatool_spark.sources.tfrecord_py import (
    EXAMPLE_DESC,
    _masked_crc,
    crc32c,
    read_tfrecord,
    read_tfrecord_bytes,
    write_tfrecord,
    write_tfrecord_file,
)


def test_crc32c_known_vectors():
    # RFC 3720 / Castagnoli reference vectors
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"a") == 0xC1D04330
    # TFRecord mask of the zero crc (spec constant)
    assert _masked_crc(b"") == 0xA282EAD8


def test_framing_roundtrip_and_corruption():
    payloads = [b"alpha", b"", b"\x00" * 100]
    path = os.path.join(tempfile.mkdtemp(), "x.tfrecord")
    assert write_tfrecord_file(path, payloads) == 3
    raw = open(path, "rb").read()
    assert read_tfrecord_bytes(raw) == payloads
    # flip one payload byte -> data crc mismatch
    bad = bytearray(raw)
    bad[12] ^= 0xFF
    with pytest.raises(ValueError, match="crc mismatch"):
        read_tfrecord_bytes(bytes(bad))
    # truncate -> partial payload
    with pytest.raises(ValueError, match="truncated|partial"):
        read_tfrecord_bytes(raw[:-2])
    # flip a length byte -> length crc mismatch
    bad2 = bytearray(raw)
    bad2[0] ^= 0x01
    with pytest.raises(ValueError, match="crc mismatch"):
        read_tfrecord_bytes(bytes(bad2))


def test_tfrecord_spark_roundtrip_all_kinds(spark):
    df = spark.createDataFrame(
        [
            (1, "hello", 1.5, [1, 2, 3], True, bytearray(b"\x00\xff")),
            (2, None, None, [], False, None),
            (3, "", -2.25, None, None, bytearray(b"")),
        ],
        "id long, text string, score float, xs array<long>, "
        "flag boolean, blob binary",
    )
    path = os.path.join(tempfile.mkdtemp(), "tfr")
    write_tfrecord(df.repartition(2), path)
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    back = {r["id"]: r for r in read_tfrecord(spark, path, df.schema).collect()}
    assert back[1]["text"] == "hello" and back[1]["score"] == 1.5
    assert back[1]["xs"] == [1, 2, 3] and back[1]["flag"] is True
    assert bytes(back[1]["blob"]) == b"\x00\xff"
    # Example cannot carry empty-vs-absent: both come back NULL
    assert back[2]["xs"] is None and back[2]["text"] is None
    assert back[3]["score"] == -2.25
    # empty string and empty bytes are single-element lists -> survive?
    # (a zero-length bytes value IS present in the list) — pin behaviour:
    assert back[3]["text"] == "" and bytes(back[3]["blob"]) == b""


def test_tfrecord_rejects_unsupported_types(spark):
    df = spark.range(1).selectExpr("CAST(id AS DECIMAL(10,2)) AS d")
    with pytest.raises(ValueError, match="feature encoding"):
        write_tfrecord(df, tempfile.mkdtemp())


def test_example_payloads_are_wellformed_protos():
    # decode with the raw proto codec: field numbers/structure must match
    # tf.train.Example's schema (features=1 -> feature=1 -> key=1/value=2)
    from ratatool_spark.sources.proto_py import decode_message, encode_message

    msg = {
        "features": {
            "feature": [
                {"key": "id", "value": {"int64_list": {"value": [7]}}},
                {"key": "t", "value": {"bytes_list": {"value": [b"x"]}}},
            ]
        }
    }
    rt = decode_message(EXAMPLE_DESC, encode_message(EXAMPLE_DESC, msg))
    feats = {e["key"]: e["value"] for e in rt["features"]["feature"]}
    assert feats["id"]["int64_list"]["value"] == [7]
    assert feats["t"]["bytes_list"]["value"] == [b"x"]


def test_tfrecord_through_generic_io(spark):
    from ratatool_spark.sources.io import read_table, write_table

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, t string")
    path = os.path.join(tempfile.mkdtemp(), "out")
    assert write_table(df, path, fmt="tfrecord", mode="overwrite")
    back = read_table(spark, path, fmt="tfrecord", schema=df.schema)
    assert sorted((r["id"], r["t"]) for r in back.collect()) == [(1, "a"), (2, "b")]
    with pytest.raises(ValueError, match="schema"):
        read_table(spark, path, fmt="tfrecord")
