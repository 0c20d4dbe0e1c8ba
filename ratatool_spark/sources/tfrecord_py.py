"""Dependency-free TFRecord sink/scan — the training-shard container the
TF/JAX data world consumes, produced straight from a DataFrame.

The container format is public (tensorflow/core/lib/io/record_writer.cc):

    uint64  length        (little-endian)
    uint32  masked_crc32c(length bytes)
    byte    data[length]
    uint32  masked_crc32c(data)

with ``masked_crc(x) = rotr15(crc32c(x)) + 0xa282ead8 (mod 2^32)`` and
CRC32C the Castagnoli polynomial (0x82F63B78 reflected, table-driven
below). Both CRCs are verified on read — torn/corrupt shards fail loudly
instead of training on garbage.

Payloads are REAL ``tf.train.Example`` protobuf messages encoded with
this repo's jar-free wire codec (``sources/proto_py`` — Example is just a
nested proto: Features → repeated map entries → Feature oneof of
BytesList/FloatList/Int64List). TensorFlow's parsers accept unpacked
primitive lists (the proto spec requires it), so files written here are
readable by standard ``tf.data.TFRecordDataset`` + ``parse_example``
consumers, and packed lists written by TensorFlow decode here because
``proto_py`` accepts both encodings.

Type mapping (the Example feature model — no null scalars, no doubles):
int/long/bool → Int64List, float/double → FloatList (float32 — Example
has no double list; doubles are narrowed exactly as a ``CAST(x AS
FLOAT)``), string/binary → BytesList, arrays thereof → multi-value
lists. A NULL column value is an absent feature and decodes back to
NULL; an empty array also decodes to NULL (Example cannot distinguish
the two — documented container limitation).

Scale shape: mirrors the avro/proto codecs — the sink writes one
``.tfrecord`` file per partition ON THE EXECUTOR that owns it
(mapPartitionsWithIndex, ``_SUCCESS`` on commit); the scan ships whole
files to executors (binaryFile) and decodes in a mapInPandas kernel.
Bytes never visit the driver. Python-per-record cost is the same
documented envelope as the avro container codec.
"""

from __future__ import annotations

import os
import struct

from ratatool_spark.sources.proto_py import decode_message, encode_message

# ---------------------------------------------------------------- CRC32C

_CRC_TABLE: list[int] = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    """Castagnoli CRC (reflected, init/xorout 0xFFFFFFFF) — the checksum
    TFRecord, iSCSI and ext4 use. Table-driven byte loop; record-sized
    inputs only (this is the documented Python-codec seam)."""
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ----------------------------------------------------- tf.train.Example

_BYTES_LIST = {"name": "BytesList", "fields": [{"tag": 1, "name": "value", "type": "bytes", "repeated": True}]}
_FLOAT_LIST = {"name": "FloatList", "fields": [{"tag": 1, "name": "value", "type": "float", "repeated": True}]}
_INT64_LIST = {"name": "Int64List", "fields": [{"tag": 1, "name": "value", "type": "int64", "repeated": True}]}
_FEATURE = {
    "name": "Feature",
    "fields": [
        {"tag": 1, "name": "bytes_list", "type": "message", "message": _BYTES_LIST},
        {"tag": 2, "name": "float_list", "type": "message", "message": _FLOAT_LIST},
        {"tag": 3, "name": "int64_list", "type": "message", "message": _INT64_LIST},
    ],
}
_FEATURE_ENTRY = {
    "name": "FeatureEntry",
    "fields": [
        {"tag": 1, "name": "key", "type": "string"},
        {"tag": 2, "name": "value", "type": "message", "message": _FEATURE},
    ],
}
_FEATURES = {
    "name": "Features",
    "fields": [
        {"tag": 1, "name": "feature", "type": "message", "message": _FEATURE_ENTRY, "repeated": True}
    ],
}
EXAMPLE_DESC = {
    "name": "Example",
    "fields": [{"tag": 1, "name": "features", "type": "message", "message": _FEATURES}],
}

_INT_KINDS = {"long", "integer", "short", "byte", "boolean"}
_FLOAT_KINDS = {"double", "float"}
_BYTES_KINDS = {"string", "binary"}


def _feature_kind(dt) -> tuple[str, str]:
    """(feature list field, element kind) for a Spark DataType; raises on
    types Example cannot carry (timestamps, decimals, nested structs —
    stringify or epoch-cast upstream)."""
    name = dt.typeName()
    if name == "array":
        inner, kind = _feature_kind(dt.elementType)
        return inner, kind
    if name in _INT_KINDS:
        return "int64_list", name
    if name in _FLOAT_KINDS:
        return "float_list", name
    if name in _BYTES_KINDS:
        return "bytes_list", name
    raise ValueError(
        f"type {name!r} has no tf.train.Example feature encoding "
        "(cast to long/double/string upstream)"
    )


def _to_example(row: dict, plan: list[tuple[str, str, str, bool]]) -> dict:
    feats = []
    for name, list_field, kind, is_array in plan:
        v = row.get(name)
        if v is None:
            continue
        vals = list(v) if is_array else [v]
        if list_field == "int64_list":
            vals = [int(x) for x in vals]
        elif list_field == "float_list":
            vals = [float(x) for x in vals]
        else:
            vals = [
                x.encode("utf-8") if isinstance(x, str) else bytes(x)
                for x in vals
            ]
        feats.append({"key": name, "value": {list_field: {"value": vals}}})
    return {"features": {"feature": feats}}


def _from_example(rec: dict, plan: list[tuple[str, str, str, bool]]) -> tuple:
    by_key = {}
    for e in ((rec.get("features") or {}).get("feature") or []):
        by_key[e["key"]] = e.get("value") or {}
    out = []
    for name, list_field, kind, is_array in plan:
        feat = by_key.get(name)
        lst = ((feat or {}).get(list_field) or {}).get("value")
        if not lst:
            out.append(None)
            continue
        if list_field == "bytes_list" and kind == "string":
            lst = [b.decode("utf-8") for b in lst]
        elif list_field == "int64_list" and kind == "boolean":
            lst = [bool(x) for x in lst]
        out.append(list(lst) if is_array else lst[0])
    return tuple(out)


def _plan_of(spark_schema) -> list[tuple[str, str, str, bool]]:
    plan = []
    for f in spark_schema.fields:
        list_field, kind = _feature_kind(f.dataType)
        plan.append(
            (f.name, list_field, kind, f.dataType.typeName() == "array")
        )
    return plan


# ------------------------------------------------------------- container

def write_tfrecord_file(path: str, payloads) -> int:
    """Frame pre-encoded payload bytes into one .tfrecord file; returns
    the record count."""
    n = 0
    with open(path, "wb") as fh:
        for data in payloads:
            ln = struct.pack("<Q", len(data))
            fh.write(ln)
            fh.write(struct.pack("<I", _masked_crc(ln)))
            fh.write(data)
            fh.write(struct.pack("<I", _masked_crc(data)))
            n += 1
    return n


def read_tfrecord_bytes(raw: bytes) -> list[bytes]:
    """Unframe a .tfrecord byte string, verifying BOTH CRCs per record."""
    out = []
    pos, end = 0, len(raw)
    while pos < end:
        if end - pos < 12:
            raise ValueError("truncated tfrecord: partial header")
        ln_bytes = raw[pos : pos + 8]
        (ln,) = struct.unpack("<Q", ln_bytes)
        (ln_crc,) = struct.unpack("<I", raw[pos + 8 : pos + 12])
        if ln_crc != _masked_crc(ln_bytes):
            raise ValueError(f"tfrecord length crc mismatch at offset {pos}")
        pos += 12
        if end - pos < ln + 4:
            raise ValueError("truncated tfrecord: partial payload")
        data = raw[pos : pos + ln]
        (data_crc,) = struct.unpack("<I", raw[pos + ln : pos + ln + 4])
        if data_crc != _masked_crc(data):
            raise ValueError(f"tfrecord data crc mismatch at offset {pos}")
        out.append(data)
        pos += ln + 4
    return out


# ------------------------------------------------------ Spark integration

def write_tfrecord(df, path: str) -> None:
    """Distributed TFRecord-of-Example sink: one .tfrecord file per
    partition, written by the owning executor; _SUCCESS on commit."""
    os.makedirs(path, exist_ok=True)
    plan = _plan_of(df.schema)
    names = [f.name for f in df.schema.fields]

    def write_part(idx, it):
        payloads = (
            encode_message(EXAMPLE_DESC, _to_example({n: r[n] for n in names}, plan))
            for r in it
        )
        tmp = os.path.join(path, f".part-{idx:05d}.tfrecord.tmp")
        n = write_tfrecord_file(tmp, payloads)
        final = os.path.join(path, f"part-{idx:05d}.tfrecord")
        if n:
            os.rename(tmp, final)
        else:
            os.remove(tmp)
        return iter(())

    df.rdd.mapPartitionsWithIndex(write_part).count()
    with open(os.path.join(path, "_SUCCESS"), "w"):
        pass


def read_tfrecord(spark, path: str, schema):
    """Distributed TFRecord-of-Example scan: binaryFile ships each shard
    to an executor; a mapInPandas kernel unframes (CRC-verified) and
    decodes there. ``schema`` (StructType) names the features to extract
    and their types — the same contract as ``parse_example``."""
    import glob as g

    files = (
        sorted(g.glob(os.path.join(path, "*.tfrecord")))
        if os.path.isdir(path)
        else [path]
    )
    if not files:
        raise FileNotFoundError(f"no .tfrecord files under {path}")
    plan = _plan_of(schema)

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            for raw in pdf["content"]:
                rows = [
                    _from_example(decode_message(EXAMPLE_DESC, p), plan)
                    for p in read_tfrecord_bytes(bytes(raw))
                ]
                cols = {
                    name: pd.Series([r[i] for r in rows], dtype=object)
                    for i, (name, _, _, _) in enumerate(plan)
                }
                yield pd.DataFrame(cols, columns=[p[0] for p in plan])

    return (
        spark.read.format("binaryFile")
        .load(files)
        .select("content")
        .mapInPandas(decode, schema=schema)
    )
