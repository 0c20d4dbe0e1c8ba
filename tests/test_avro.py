"""Avro container codec: round-trip, Spark scan/sink, JVM byte-parity.

The JVM interop tests are the format-correctness proof: files written by
the pure-Python codec are read back by ``org.apache.avro.file
.DataFileReader`` (the avro core jar bundled with Spark), and vice versa —
so the fallback source/sink interoperates with any Avro tooling, not just
itself. Reference parity: AvroIO.scala:38-109 (read/write + schema-from-
file), BigSamplerAvro.scala:222-265 (avro records through the sampler).
"""

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.testing import assertDataFrameEqual

from ratatool_spark.sources.avro_py import (
    avro_schema_of,
    read_avro,
    read_container,
    read_schema,
    spark_schema_of,
    write_avro,
    write_container,
)

ROWS = [
    {"id": 1, "name": "alpha", "score": 1.5, "ok": True, "tags": ["a", "b"]},
    {"id": 2, "name": None, "score": -2.25, "ok": False, "tags": []},
    {"id": 3, "name": "γάμμα", "score": 0.0, "ok": None, "tags": ["x"]},
]

SCHEMA = {
    "type": "record",
    "name": "t",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "ok", "type": ["null", "boolean"]},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
    ],
}


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip(tmp_path, codec):
    p = str(tmp_path / "t.avro")
    n = write_container(p, SCHEMA, ROWS, codec=codec)
    assert n == 3
    schema, rows = read_container(p)
    assert schema == SCHEMA
    assert rows == ROWS
    assert read_schema(p) == SCHEMA


def test_varint_edge_values(tmp_path):
    vals = [0, -1, 1, 63, 64, -64, -65, 2**31, -(2**31), 2**62, -(2**62)]
    schema = {
        "type": "record",
        "name": "v",
        "fields": [{"name": "x", "type": "long"}],
    }
    p = str(tmp_path / "v.avro")
    write_container(p, schema, [{"x": v} for v in vals], codec="null")
    _, rows = read_container(p)
    assert [r["x"] for r in rows] == vals


def test_jvm_reads_python_file(spark, tmp_path):
    """Byte-parity, direction 1: org.apache.avro DataFileReader decodes
    our writer's output."""
    p = str(tmp_path / "py.avro")
    write_container(p, SCHEMA, ROWS, codec="deflate")
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    assert json.loads(reader.getSchema().toString()) == SCHEMA
    got = []
    while reader.hasNext():
        rec = reader.next()
        got.append(
            {
                "id": rec.get("id"),
                "name": None if rec.get("name") is None else str(rec.get("name")),
                "score": rec.get("score"),
                "ok": rec.get("ok"),
                "tags": [str(x) for x in rec.get("tags")],
            }
        )
    reader.close()
    assert got == ROWS


def test_python_reads_jvm_file(spark, tmp_path):
    """Byte-parity, direction 2: our reader decodes a file written by the
    JVM DataFileWriter (deflate codec)."""
    p = str(tmp_path / "jvm.avro")
    jvm = spark._jvm
    js = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(SCHEMA))
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(js)
    )
    writer.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    writer.create(js, jvm.java.io.File(p))
    for r in ROWS:
        rec = jvm.org.apache.avro.generic.GenericData.Record(js)
        rec.put("id", r["id"])
        rec.put("name", r["name"])
        rec.put("score", r["score"])
        rec.put("ok", r["ok"])
        arr = jvm.java.util.ArrayList()
        for t in r["tags"]:
            arr.add(t)
        rec.put("tags", arr)
        writer.append(rec)
    writer.close()
    _, rows = read_container(p)
    assert rows == ROWS


def test_spark_sink_and_scan_roundtrip(spark, tmp_path, lineitem):
    """Distributed write (one container per partition + _SUCCESS) and
    distributed binaryFile+mapInPandas scan reproduce the DataFrame."""
    sub = lineitem.select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    ).limit(500)
    out = str(tmp_path / "li_avro")
    write_avro(sub.repartition(4), out)
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    parts = [f for f in os.listdir(out) if f.endswith(".avro")]
    assert len(parts) >= 2  # genuinely partitioned output
    back = read_avro(spark, out)
    assertDataFrameEqual(back, sub)


def test_spark_avro_timestamps(spark, tmp_path):
    """timestamp-micros logical type survives the round trip."""
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 5, 17, 13, 45, 1, 999999))], "id long, ts timestamp"
    )
    out = str(tmp_path / "ts_avro")
    write_avro(df, out)
    back = read_avro(spark, out)
    assert back.schema["ts"].dataType.typeName() == "timestamp"
    assertDataFrameEqual(back, df)


def test_schema_conversion_inverse(spark, lineitem):
    st = lineitem.schema
    assert spark_schema_of(avro_schema_of(st)).fieldNames() == st.fieldNames()


UNION_SCHEMA = {
    "type": "record",
    "name": "u",
    "fields": [
        {"name": "id", "type": "long"},
        # multi-type union: null | long | string (AvroDiffy.scala:73-85)
        {"name": "val", "type": ["null", "long", "string"]},
    ],
}

UNION_ROWS = [
    {"id": 1, "val": 42},
    {"id": 2, "val": "forty-two"},
    {"id": 3, "val": None},
]


def test_multi_type_union_codec_roundtrip(tmp_path):
    """Wire round-trip of a multi-type union preserves branch + value."""
    p = str(tmp_path / "u.avro")
    write_container(p, UNION_SCHEMA, UNION_ROWS)
    _, rows = read_container(p)
    assert rows == UNION_ROWS


def test_multi_type_union_spark_scan(spark, tmp_path):
    """Spark reads a multi-union field as struct<member0,member1> with
    exactly one member set per row — the spark-avro convention, the shape
    the diffy engine recurses into (D2 over AvroDiffy §1.2 semantics)."""
    d = tmp_path / "u_avro"
    d.mkdir()
    write_container(str(d / "part-0.avro"), UNION_SCHEMA, UNION_ROWS)
    back = read_avro(spark, str(d))
    assert back.schema["val"].dataType.simpleString() == (
        "struct<member0:bigint,member1:string>"
    )
    got = {
        r["id"]: None
        if r["val"] is None
        else (r["val"]["member0"], r["val"]["member1"])
        for r in back.collect()
    }
    assert got == {1: (42, None), 2: (None, "forty-two"), 3: None}


def test_multi_type_union_diff_end_to_end(spark, tmp_path):
    """D2 over multi-type unions end-to-end (AvroDiffy.scala:73-85): two
    avro files whose union branches differ, diffed through the expression
    compiler. Branch changes surface as member-struct deltas —
    one-sided member occupancy is an UNKNOWN delta on that member's path
    (Diffy.scala one-sided-null rule) — while same-branch value changes
    are ordinary typed deltas on the member's path."""
    from ratatool_spark.operators.diffy import diff

    lhs_rows = [
        {"id": 1, "val": 42},            # long -> string branch flip
        {"id": 2, "val": "alpha"},       # string -> string value change
        {"id": 3, "val": None},          # null -> long
        {"id": 4, "val": 7},             # unchanged
    ]
    rhs_rows = [
        {"id": 1, "val": "forty-two"},
        {"id": 2, "val": "beta"},
        {"id": 3, "val": 5},
        {"id": 4, "val": 7},
    ]
    dl, dr = tmp_path / "l", tmp_path / "r"
    dl.mkdir(), dr.mkdir()
    write_container(str(dl / "part-0.avro"), UNION_SCHEMA, lhs_rows)
    write_container(str(dr / "part-0.avro"), UNION_SCHEMA, rhs_rows)

    d = diff(read_avro(spark, str(dl)), read_avro(spark, str(dr)), ["id"])
    got = {
        (r["key"], r["field"]): r["delta_type"] for r in d.deltas.collect()
    }
    assert got == {
        ("1", "val.member0"): "UNKNOWN",   # long branch vacated
        ("1", "val.member1"): "UNKNOWN",   # string branch adopted
        ("2", "val.member1"): "STRING",    # same-branch string delta
        ("3", "val.member0"): "UNKNOWN",   # null -> long
    }
    # the same-branch change carries the levenshtein distance
    row2 = {
        r["field"]: r
        for r in d.deltas.where(F.col("key") == "2").collect()
    }
    assert row2["val.member1"]["delta"] == 4.0  # lev(alpha, beta)
    g = d.global_stats.collect()[0]
    assert (g["num_total"], g["num_same"], g["num_diff"]) == (4, 1, 3)
