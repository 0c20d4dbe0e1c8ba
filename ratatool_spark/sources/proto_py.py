"""Dependency-free protobuf wire-format codec + Spark integration.

Covers the reference's protobuf surface (S5 scan / D4 diff / G3 generate —
ProtoBufDiffy.scala:29-130, ProtoBufGenerator.scala:126-206,
BigDiffy.scala:339) without the spark-protobuf connector or the
``google.protobuf`` Python package, neither of which is in this container
(and there is no network to fetch them). The protobuf wire format
(https://protobuf.dev/programming-guides/encoding/) is five primitives —
varint, zigzag, fixed32/64, length-delimited — over (tag, wire_type)
keys, implemented here directly; tests pin byte-parity against the
JVM's shaded ``org.apache.orc.protobuf.CodedOutputStream`` (an
independent implementation that ships with Spark's ORC jars).

Messages are described by plain descriptor dicts (what a compiled
``.proto`` would generate), e.g.::

    DESC = {
        "name": "Event",
        "fields": [
            {"tag": 1, "name": "id", "type": "int64"},
            {"tag": 2, "name": "name", "type": "string"},
            {"tag": 3, "name": "score", "type": "double"},
            {"tag": 4, "name": "tags", "type": "string", "repeated": True},
            {"tag": 5, "name": "inner", "type": "message", "message": {...}},
        ],
    }

Supported field types: int32/int64/uint32/uint64 (varint), sint32/sint64
(zigzag), bool, enum (as int), double, float, fixed64/sfixed64,
fixed32/sfixed32, string, bytes, message (nested), and ``repeated`` for
any of them (scalars packed or unpacked on decode; encoded unpacked for
simplicity). Unknown tags are skipped on decode, proto3-style.

File framing: the canonical java ``writeDelimitedTo`` stream — each
message prefixed by its varint length; a ``.pb`` file is a concatenation.
The Spark scan ships whole files to executors (binaryFile) and decodes
them in a mapInPandas kernel — one task per file, bytes never on the
driver.
"""

from __future__ import annotations

import io
import os
import struct

_VARINT = {"int32", "int64", "uint32", "uint64", "bool", "enum"}
_ZIGZAG = {"sint32", "sint64"}
_FIX64 = {"fixed64", "sfixed64", "double"}
_FIX32 = {"fixed32", "sfixed32", "float"}
_LEN = {"string", "bytes", "message"}


def write_uvarint(buf: io.BytesIO, n: int) -> None:
    if n < 0:  # negative int32/int64 values occupy 10 bytes (two's compl.)
        n &= (1 << 64) - 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            break


def read_uvarint(buf) -> int:
    shift, acc = 0, 0
    while True:
        raw = buf.read(1)
        if not raw:
            raise EOFError("truncated varint")
        b = raw[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return acc
        shift += 7


def _wire_type(ftype: str) -> int:
    if ftype in _VARINT or ftype in _ZIGZAG:
        return 0
    if ftype in _FIX64:
        return 1
    if ftype in _LEN:
        return 2
    if ftype in _FIX32:
        return 5
    raise NotImplementedError(f"proto type {ftype!r}")


def _encode_scalar(buf: io.BytesIO, ftype: str, v) -> None:
    if ftype in _VARINT:
        write_uvarint(buf, int(v) if ftype != "bool" else int(bool(v)))
    elif ftype in _ZIGZAG:
        n = int(v)
        write_uvarint(buf, (n << 1) if n >= 0 else ((-n) << 1) - 1)
    elif ftype == "double":
        buf.write(struct.pack("<d", float(v)))
    elif ftype in ("fixed64", "sfixed64"):
        buf.write(struct.pack("<q" if ftype == "sfixed64" else "<Q", int(v)))
    elif ftype == "float":
        buf.write(struct.pack("<f", float(v)))
    elif ftype in ("fixed32", "sfixed32"):
        buf.write(struct.pack("<i" if ftype == "sfixed32" else "<I", int(v)))
    elif ftype == "string":
        b = v.encode("utf-8")
        write_uvarint(buf, len(b))
        buf.write(b)
    elif ftype == "bytes":
        b = bytes(v)
        write_uvarint(buf, len(b))
        buf.write(b)
    else:
        raise NotImplementedError(f"proto type {ftype!r}")


def encode_message(desc: dict, rec: dict) -> bytes:
    """dict → wire bytes. None / missing fields are omitted (proto3
    default semantics); repeated fields encode one tagged element each
    (the unpacked form every decoder must accept)."""
    buf = io.BytesIO()
    for f in desc["fields"]:
        v = rec.get(f["name"])
        if v is None:
            continue
        vals = v if f.get("repeated") else [v]
        for x in vals:
            key = (f["tag"] << 3) | _wire_type(f["type"])
            write_uvarint(buf, key)
            if f["type"] == "message":
                inner = encode_message(f["message"], x)
                write_uvarint(buf, len(inner))
                buf.write(inner)
            else:
                _encode_scalar(buf, f["type"], x)
    return buf.getvalue()


def _decode_scalar(buf, ftype: str):
    if ftype in _VARINT:
        n = read_uvarint(buf)
        if ftype == "bool":
            return bool(n)
        if ftype in ("int32", "int64") and n >= 1 << 63:
            return n - (1 << 64)  # negative two's complement
        return n
    if ftype in _ZIGZAG:
        n = read_uvarint(buf)
        return (n >> 1) ^ -(n & 1)
    if ftype == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if ftype == "sfixed64":
        return struct.unpack("<q", buf.read(8))[0]
    if ftype == "fixed64":
        return struct.unpack("<Q", buf.read(8))[0]
    if ftype == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if ftype == "sfixed32":
        return struct.unpack("<i", buf.read(4))[0]
    if ftype == "fixed32":
        return struct.unpack("<I", buf.read(4))[0]
    if ftype == "string":
        return buf.read(read_uvarint(buf)).decode("utf-8")
    if ftype == "bytes":
        return buf.read(read_uvarint(buf))
    raise NotImplementedError(f"proto type {ftype!r}")


def _skip(buf, wt: int) -> None:
    if wt == 0:
        read_uvarint(buf)
    elif wt == 1:
        buf.read(8)
    elif wt == 2:
        buf.read(read_uvarint(buf))
    elif wt == 5:
        buf.read(4)
    else:
        raise ValueError(f"cannot skip wire type {wt}")


def decode_message(desc: dict, data: bytes) -> dict:
    """wire bytes → dict. Missing fields decode to None (empty list for
    repeated); unknown tags are skipped; packed repeated scalars are
    recognized by a length-delimited key on a non-length wire type."""
    by_tag = {f["tag"]: f for f in desc["fields"]}
    out: dict = {
        f["name"]: ([] if f.get("repeated") else None) for f in desc["fields"]
    }
    buf = io.BytesIO(data)
    while True:
        start = buf.tell()
        raw = buf.read(1)
        if not raw:
            break
        buf.seek(start)
        key = read_uvarint(buf)
        tag, wt = key >> 3, key & 7
        f = by_tag.get(tag)
        if f is None:
            _skip(buf, wt)
            continue
        ftype = f["type"]
        expected = _wire_type(ftype)
        if ftype == "message":
            inner = buf.read(read_uvarint(buf))
            v = decode_message(f["message"], inner)
        elif wt == 2 and expected != 2 and f.get("repeated"):
            # packed scalars: one length-delimited block of raw values
            block = io.BytesIO(buf.read(read_uvarint(buf)))
            while block.tell() < len(block.getvalue()):
                out[f["name"]].append(_decode_scalar(block, ftype))
            continue
        else:
            v = _decode_scalar(buf, ftype)
        if f.get("repeated"):
            out[f["name"]].append(v)
        else:
            out[f["name"]] = v
    return out


# ------------------------------------------------------------ file framing


def write_delimited(path: str, desc: dict, recs) -> int:
    """Concatenated varint-length-prefixed messages (java
    writeDelimitedTo framing). Returns record count."""
    n = 0
    with open(path, "wb") as f:
        for rec in recs:
            body = encode_message(desc, rec)
            head = io.BytesIO()
            write_uvarint(head, len(body))
            f.write(head.getvalue())
            f.write(body)
            n += 1
    return n


def read_delimited_bytes(desc: dict, raw: bytes) -> list[dict]:
    buf = io.BytesIO(raw)
    out = []
    while buf.tell() < len(raw):
        out.append(decode_message(desc, buf.read(read_uvarint(buf))))
    return out


def read_delimited(path: str, desc: dict) -> list[dict]:
    with open(path, "rb") as f:
        return read_delimited_bytes(desc, f.read())


# --------------------------------------------------------- Spark plumbing


def spark_schema_of(desc: dict):
    """Descriptor → StructType (proto3 semantics: every field nullable,
    repeated → array)."""
    from pyspark.sql import types as T

    prim = {
        "int32": T.IntegerType(),
        "sint32": T.IntegerType(),
        "sfixed32": T.IntegerType(),
        "uint32": T.LongType(),
        "fixed32": T.LongType(),
        "int64": T.LongType(),
        "sint64": T.LongType(),
        "sfixed64": T.LongType(),
        # full uint64 range: values >= 2^63 are legal on the wire and would
        # overflow LongType at Arrow materialization, so these land as
        # DECIMAL(20,0) (Arrow accepts plain ints; encode_message int()s them)
        "uint64": T.DecimalType(20, 0),
        "fixed64": T.DecimalType(20, 0),
        "enum": T.IntegerType(),
        "bool": T.BooleanType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "string": T.StringType(),
        "bytes": T.BinaryType(),
    }

    def conv(f):
        if f["type"] == "message":
            dt = spark_schema_of(f["message"])
        else:
            dt = prim[f["type"]]
        if f.get("repeated"):
            dt = T.ArrayType(dt, False)
        return T.StructField(f["name"], dt, True)

    return T.StructType([conv(f) for f in desc["fields"]])


def read_proto(spark, path: str, desc: dict):
    """Distributed delimited-protobuf scan: binaryFile ships each ``.pb``
    file to an executor; a mapInPandas kernel decodes it there."""
    import glob as g

    files = sorted(g.glob(os.path.join(path, "*.pb"))) if os.path.isdir(path) else [path]
    if not files:
        raise FileNotFoundError(f"no .pb files under {path}")
    out_schema = spark_schema_of(desc)

    def to_row(rec, d):
        # nested dicts → tuples in field order (Spark struct rows)
        vals = []
        for f in d["fields"]:
            v = rec.get(f["name"])
            if f["type"] == "message" and v is not None:
                if f.get("repeated"):
                    v = [to_row(x, f["message"]) for x in v]
                else:
                    v = to_row(v, f["message"])
            vals.append(v)
        return tuple(vals)

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            for raw in pdf["content"]:
                recs = read_delimited_bytes(desc, bytes(raw))
                rows = [to_row(r, desc) for r in recs]
                # dtype=object: pandas would otherwise coerce an int column
                # containing a None to float64, corrupting int64 values
                # beyond 2^53 for the whole Arrow batch
                cols = {
                    f["name"]: pd.Series([r[i] for r in rows], dtype=object)
                    for i, f in enumerate(desc["fields"])
                }
                yield pd.DataFrame(cols)

    return (
        spark.read.format("binaryFile")
        .load(files)
        .select("content")
        .mapInPandas(decode, schema=out_schema)
    )


def write_proto(df, path: str, desc: dict) -> None:
    """Distributed delimited-protobuf sink: one ``.pb`` file per
    partition + ``_SUCCESS``."""
    os.makedirs(path, exist_ok=True)
    names = [f["name"] for f in desc["fields"]]

    def row_to_rec(r, d):
        out = {}
        for f in d["fields"]:
            v = r[f["name"]] if f["name"] in r else None
            if f["type"] == "message" and v is not None:
                if f.get("repeated"):
                    v = [row_to_rec(x.asDict(), f["message"]) for x in v]
                else:
                    v = row_to_rec(v.asDict(), f["message"])
            out[f["name"]] = v
        return out

    def write_part(idx, it):
        tmp = os.path.join(path, f".part-{idx:05d}.pb.tmp")
        n = write_delimited(
            tmp, desc, (row_to_rec(r.asDict(), desc) for r in it)
        )
        final = os.path.join(path, f"part-{idx:05d}.pb")
        if n:
            os.rename(tmp, final)
        else:
            os.remove(tmp)
        return iter(())

    df.rdd.mapPartitionsWithIndex(write_part).count()
    with open(os.path.join(path, "_SUCCESS"), "w"):
        pass
