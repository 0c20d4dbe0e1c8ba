"""Deterministic record hashing for cohort sampling and dedup.

Role model: the reference's hasher stack — FarmHash fingerprint64 / seeded
Murmur3_128 over a canonical per-type byte feeding
(reference: ratatool-sampling Util.scala:85-110, BigSampler.scala:349-435,
BigSamplerAvro.scala:161-185) with hash->[0,1] normalization
(BigSampler.scala:74-75 ``boundLong``).

Spark-first redesign, two tiers:

1. **portable_hash64** — md5-prefix hash (60 bits), expressed entirely in
   built-in JVM functions (``md5``/``conv``) so it stays inside whole-stage
   codegen AND is bit-for-bit reproducible in any other SQL engine
   (DuckDB: ``('0x' || substr(md5(x), 1, 15))::BIGINT``; BigQuery:
   ``SAFE_CAST(CONCAT('0x', SUBSTR(TO_HEX(MD5(x)), 1, 15)) AS INT64)``).
   This is the default sampling dice: a user can re-derive the exact cohort
   in their warehouse, which is the property the reference's
   FARM_FINGERPRINT compatibility exists to provide
   (ratatool-sampling/README.md:90-97).

2. **xxhash_cols** — Spark-native ``xxhash64``: faster (no md5), same
   determinism within Spark, NOT cross-engine portable. Use for internal
   shuffles/dedup where external reproducibility is not required.

FarmHash fingerprint64 parity (exact BigQuery FARM_FINGERPRINT) ships
jar-free via the pure-Python port in ``functions.farmhash`` — see
``farmhash_udf`` / ``farm_dice``; ``pyfarmhash`` is used as a C fast path
when installed.

Null semantics match the reference: null fields are skipped from the hash
feed (BigSamplerAvro.scala:66-71 logs-and-skips) — ``concat_ws`` drops
nulls in both Spark and DuckDB, so the portable form inherits it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# 60-bit hash space: 15 hex chars. Fits signed 64-bit in every engine.
HASH_BITS = 60
HASH_SPACE = float(1 << HASH_BITS)
# ASCII unit separator: cannot appear in the data fields we hash.
FIELD_SEP = "\x01"


def serialize_for_hash(
    col: Column | str,
    dtype: T.DataType | None = None,
    byte_encoding: str = "hex",
) -> Column:
    """Canonical string rendering of a column for hash feeding.

    Mirrors the reference's per-type feed rules (BigSamplerAvro.scala:161-185):
    int widened to long (same decimal string), boolean as true/false, bytes
    per ``byte_encoding``, enum/string as-is, timestamp as epoch micros
    (engine-neutral — avoids format differences). Doubles are rendered via a
    fixed-scale decimal cast so the text form is engine-independent.

    ``byte_encoding`` is the reference's ``--byteEncoding`` switch
    (ByteHasher.scala:24-71): ``hex`` = lowercase base16 (our default,
    their HexEncoding), ``base64`` = standard padded base64 (their
    Base64Encoding, Guava ``BaseEncoding.base64`` ≡ Spark ``F.base64``).
    The reference's ``raw`` mode feeds unencoded bytes into the hasher —
    incompatible with this string-feed design (arbitrary bytes are not
    valid UTF-8), so it raises with that explanation.

    Chunking hazard: depending on version and
    ``spark.sql.legacy.chunkBase64String``, Spark's ``base64`` may use
    the MIME encoder, inserting a line break every 76 chars for blobs
    > 57 bytes (SPARK-47307) — live on this very build. The rendering
    strips CR/LF in the expression, so the feed equals the non-chunked
    RFC 4648 form on every Spark version/conf (pinned by a 200-byte
    payload in tests/test_properties.py::test_serialize_bytes_base64)."""
    c = F.col(col) if isinstance(col, str) else col
    if dtype is None:
        return c.cast("string")
    if isinstance(dtype, T.BinaryType):
        if byte_encoding == "base64":
            return F.regexp_replace(F.base64(c), "[\r\n]", "")
        if byte_encoding == "raw":
            raise ValueError(
                "raw byte feeding is incompatible with the string-feed "
                "hash design (arbitrary bytes are not valid UTF-8); use "
                "'hex' or 'base64' (ByteHasher.scala:24-71 parity modes)"
            )
        if byte_encoding != "hex":
            raise ValueError(f"unknown byte_encoding {byte_encoding!r}")
        return F.lower(F.hex(c))
    if isinstance(dtype, T.TimestampType):
        # exact integer epoch-micros: the double round-trip
        # (cast('double')*1e6) is off by ±1us at current epochs (double has
        # ~0.4us resolution there), breaking cross-engine reproducibility
        return F.unix_micros(c).cast("string")
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return c.cast(T.DecimalType(28, 9)).cast("string")
    if isinstance(dtype, T.BooleanType):
        return F.when(c, F.lit("true")).otherwise(F.lit("false"))
    return c.cast("string")


def portable_hash64(s: Column) -> Column:
    """60-bit deterministic hash of a string column, cross-engine portable.

    ``conv`` parses the 15-char hex prefix of md5 as an unsigned number;
    result is in [0, 2^60).
    """
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def hash_cols(
    cols: Sequence[Column | str],
    seed: int = 0,
    dtypes: Sequence[T.DataType] | None = None,
    byte_encoding: str = "hex",
) -> Column:
    """Hash a tuple of field columns with a seed into [0, 2^60).

    The seed is prepended to the feed the way the reference prepends its
    int seed to the hasher (Util.scala:94-97). Fields are joined with an
    ASCII unit separator; nulls are skipped (see module docstring).
    ``byte_encoding`` selects the binary-field pre-hash rendering
    (ByteHasher.scala:24-71: hex | base64).
    """
    # NOTE: deliberately NOT composed as concat_ws(SEP, seed,
    # hash_feed(...)): the inner concat_ws renders an all-null field list
    # as "" (not NULL), so nesting would append a trailing separator and
    # change every null-field hash — the flat feed is the compatibility
    # contract the oracles pin.
    rendered = _render(cols, dtypes, byte_encoding)
    feed = F.concat_ws(FIELD_SEP, F.lit(str(seed)), *rendered)
    return portable_hash64(feed)


def bound01(hash_col: Column) -> Column:
    """Map a 60-bit hash to [0.0, 1.0) — the reference's ``boundLong``
    (BigSampler.scala:74-75) re-ranged for the portable hash space."""
    return hash_col.cast("double") / F.lit(HASH_SPACE)


def bound_signed64(h: Column) -> Column:
    """Map a full signed-64 hash to [0,1): the reference's ``boundLong``
    affine map (BigSampler.scala:74-75) — shared by every signed-range
    backend (xx / farm / murmur) so the map can never drift between them."""
    lmin, lmax = float(-(2**63)), float(2**63 - 1)
    return (h.cast("double") - F.lit(lmin)) / (F.lit(lmax) - F.lit(lmin))


def dice(
    cols: Sequence[Column | str],
    seed: int = 0,
    dtypes: Sequence[T.DataType] | None = None,
    byte_encoding: str = "hex",
) -> Column:
    """The deterministic sampling dice: uniform [0,1) per record, derived
    only from the named fields + seed (BigSampler.diceElement:83-90)."""
    return bound01(hash_cols(cols, seed=seed, dtypes=dtypes, byte_encoding=byte_encoding))


def text_hash64(s: Column, hasher: str = "portable") -> Column:
    """60-bit string hash with a speed/portability switch.

    ``"portable"`` (default) = md5-based, reproducible in any engine with
    md5 (the DuckDB oracles and BigQuery-style warehouse re-derivation
    depend on it). ``"xx"`` = xxhash64 masked to the same 60-bit range —
    Spark-native, several times faster, NOT cross-engine. Every
    shingle-hashing dedup operator threads this through as ``hasher=``;
    default answers stay oracle-reproducible."""
    if hasher == "xx":
        return F.xxhash64(s).bitwiseAND(F.lit((1 << 60) - 1))
    if hasher != "portable":
        raise ValueError(f"unknown hasher {hasher!r} (use 'portable' or 'xx')")
    return portable_hash64(s)


def xxhash_cols(cols: Sequence[Column | str], seed: int = 42) -> Column:
    """Spark-native fast path: xxhash64 over the columns. Deterministic
    within Spark, not portable to other engines. Full 64-bit signed range."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.xxhash64(F.lit(seed), *cs)


def xxdice(cols: Sequence[Column | str], seed: int = 42) -> Column:
    """xxhash64 mapped to [0,1): affine map of the signed 64-bit range,
    exactly the reference's boundLong (BigSampler.scala:74-75)."""
    return bound_signed64(xxhash_cols(cols, seed=seed))


def farmhash_udf(seed: int | None = None):
    """FarmHash Fingerprint64 UDF — exact BigQuery ``FARM_FINGERPRINT``
    parity (Util.scala:93-98). Signed 64-bit output over the column's UTF-8
    bytes; ``seed`` (when given) is prepended as 4 little-endian bytes, the
    reference's ``newHasher().putInt(seed)`` layout (README.md:90-97).

    Backend: ``pyfarmhash`` (C speed) when installed, else the pure-Python
    ``functions.farmhash`` port — bit-identical (both are property-tested
    against Guava's FarmHashFingerprint64 in tests/test_farmhash.py). For
    sampling dice that don't need BigQuery bit parity prefer
    ``portable_hash64`` — JVM md5 inside whole-stage codegen."""
    import struct

    prefix = b"" if seed is None else struct.pack("<i", seed)
    try:  # C fast path — only when the optional wheel is present
        import farmhash as _c  # type: ignore

        def _fp(b: bytes) -> int:
            u = _c.fingerprint64(b.decode("utf-8", "surrogateescape"))
            return u - (1 << 64) if u >= (1 << 63) else u

        # pyfarmhash takes str, not bytes — with a seed prefix the bytes
        # aren't valid UTF-8, so the pure port handles seeded hashing
        if seed is not None:
            _fp = None
    except ImportError:
        _fp = None
    if _fp is None:
        from ratatool_spark.functions.farmhash import fingerprint64

        def _fp(b: bytes) -> int:
            u = fingerprint64(b)
            return u - (1 << 64) if u >= (1 << 63) else u

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _farm(s):
        return s.map(
            lambda x: None if x is None else _fp(prefix + x.encode("utf-8"))
        )

    # real (non-string) hints: the module's `from __future__ import
    # annotations` would leave pandas_udf unable to resolve 'pd.Series'
    _farm.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(T.LongType())(_farm)


def farm_dice(col: Column | str, seed: int | None = None) -> Column:
    """Reference-exact sampling dice: FARM_FINGERPRINT(seed_le4 + utf8) →
    [0,1) via the signed-range affine map (BigSampler.scala:74-75
    ``boundLong``). A cohort drawn with this dice is reproducible in
    BigQuery with the README's CONCAT(b'..le-seed..', field) recipe.

    Non-string columns are rendered via ``CAST(.. AS STRING)`` (JVM-side)
    before hashing — the BigQuery twin is
    ``FARM_FINGERPRINT(CONCAT(<le-seed bytes>, CAST(CAST(f AS STRING) AS BYTES)))``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return bound_signed64(farmhash_udf(seed)(c.cast("string")))


def murmur_udf(seed: int = 0):
    """Guava ``murmur3_128(seed).hashBytes(utf8).asLong()`` UDF — the
    reference's alternate CLI hasher (``--hashAlgorithm=murmur``,
    Util.scala:89-91). Unlike farmhash's ``putInt(seed)`` byte-prefix
    layout, the murmur seed initialises the hash state.

    The reference defaults the murmur seed to ``currentTimeMillis`` when
    none is given (Util.scala:91) — deliberately non-reproducible; we
    default to 0 instead so unseeded runs stay deterministic.

    Backend: the pure-Python ``functions.murmur3`` port, bit-identical to
    Guava (property-tested through the Spark JVM in tests/test_murmur3.py),
    Arrow-batched. Prefer ``portable_hash64`` (JVM md5 in whole-stage
    codegen) when murmur bit parity is not required."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from ratatool_spark.functions.murmur3 import murmur3_128_aslong

    def _mm(s):
        return s.map(
            lambda x: None if x is None else murmur3_128_aslong(x, seed=seed)
        )

    # real hints: `from __future__ import annotations` would leave
    # pandas_udf unable to resolve the string 'pd.Series'
    _mm.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(T.LongType())(_mm)


def murmur_dice(col: Column | str, seed: int = 0) -> Column:
    """Murmur sampling dice: murmur3_128 asLong → [0,1) via the reference's
    signed-range affine map (BigSampler.scala:74-75 ``boundLong``)."""
    c = F.col(col) if isinstance(col, str) else col
    return bound_signed64(murmur_udf(seed)(c.cast("string")))


def _render(
    cols: Sequence[Column | str],
    dtypes: Sequence[T.DataType | None] | None = None,
    byte_encoding: str = "hex",
) -> list[Column]:
    """Per-type string rendering of each field — the one place the feed
    rules live (hash_cols and hash_feed both join these)."""
    if dtypes is not None:
        return [serialize_for_hash(c, t, byte_encoding) for c, t in zip(cols, dtypes)]
    return [serialize_for_hash(c) for c in cols]


def hash_feed(
    cols: Sequence[Column | str],
    dtypes: Sequence[T.DataType | None] | None = None,
    byte_encoding: str = "hex",
) -> Column:
    """The canonical multi-field string feed: per-type rendering joined on
    the unit separator, nulls skipped — shared by every hasher backend so a
    cohort is defined by (fields, seed, hasher, byte_encoding) alone."""
    return F.concat_ws(FIELD_SEP, *_render(cols, dtypes, byte_encoding))


def dice_for(
    hasher: str,
    cols: Sequence[Column | str],
    seed: int = 0,
    dtypes: Sequence[T.DataType | None] | None = None,
    byte_encoding: str = "hex",
) -> Column:
    """Uniform [0,1) dice over the fields with a selectable hash backend —
    the Spark face of the reference's ``--hashAlgorithm`` switch
    (Util.scala:85-103 farm|murmur) plus our two native tiers:

    * ``portable`` — md5-based, JVM-side, cross-engine reproducible (default)
    * ``xx``       — xxhash64, JVM-side, Spark-only, fastest
    * ``farm``     — FARM_FINGERPRINT parity (BigQuery-reproducible cohorts)
    * ``murmur``   — Guava murmur3_128(seed) parity
    """
    if hasher == "portable":
        return dice(cols, seed=seed, dtypes=dtypes, byte_encoding=byte_encoding)
    if hasher == "xx":
        return xxdice(cols, seed=seed)
    feed = hash_feed(cols, dtypes, byte_encoding)
    if hasher == "farm":
        h = farmhash_udf(seed)(feed)
    elif hasher == "murmur":
        h = murmur_udf(seed)(feed)
    else:
        raise ValueError(
            f"unknown hasher {hasher!r} (use portable|xx|farm|murmur)"
        )
    return bound_signed64(h)


def duckdb_dice_sql(field_sql: Sequence[str], seed: int = 0) -> str:
    """Emit the DuckDB SQL expression equivalent to ``dice`` over the given
    already-rendered field expressions. Used by the oracle harness; kept here
    so the two implementations sit side by side."""
    feed = f"concat_ws(chr(1), '{seed}', {', '.join(field_sql)})"
    return f"((('0x' || substr(md5({feed}), 1, 15))::BIGINT)::DOUBLE / {HASH_SPACE!r})"
