"""Schema-driven random record generation (SURVEY.md §2.10, G1-G5).

The reference generates random Avro/TableRow/Protobuf records with
ScalaCheck Gens (AvroGenerator.scala:62-298, TableRowGenerator.scala:54-160,
ProtoBufGenerator.scala:126-206) plus ``amend``/``amend2`` combinators to
override fields and correlate two records on a shared key
(scalacheck/package.scala:43-63,136-158).

Spark-first redesign: a generated dataset is ``spark.range(n)`` plus one
deterministic column expression per schema field. Randomness is the
portable hash of (seed, field-path, id) — so generation is:

  * **distributed** — no driver-side record loop, scales to any n;
  * **reproducible** — same seed ⇒ identical data on any cluster layout
    (the reference gets this via ScalaCheck seeds, GenTestUtils.scala:36-77);
  * **pure Catalyst** — every generator is a built-in expression, so a
    billion-row test fixture is a codegen'd scan, not a UDF crawl.

String generation mirrors the reference's bias toward degenerate values
(empty / blank / "foo" / random, AvroGenerator.scala:100-103) because those
are exactly the values that shake out bugs in downstream code.

``amend`` ⇒ the ``overrides`` argument; ``amend2`` (correlated datasets)
⇒ :func:`correlated_pair`, which generates one key table and joins two
payload generations onto it.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ratatool_spark.functions.hashing import FIELD_SEP, bound01, portable_hash64

_WORDS = ("foo", "bar", "baz", "qux", "lorem", "ipsum", "data", "spark")


def _h(seed: int, path: str, salt: str = "") -> Column:
    """Deterministic per-(row, field) hash in [0, 2^60)."""
    feed = F.concat_ws(
        FIELD_SEP, F.lit(str(seed)), F.lit(path), F.lit(salt), F.col("__gen_id").cast("string")
    )
    return portable_hash64(feed)


def _u(seed: int, path: str, salt: str = "") -> Column:
    """Uniform [0,1) stream independent per field."""
    return bound01(_h(seed, path, salt))


def _gen_for_type(dtype: T.DataType, seed: int, path: str) -> Column:
    h, u = _h(seed, path), _u(seed, path, "v")
    if isinstance(dtype, T.BooleanType):
        return (h % 2 == 0).cast("boolean")
    if isinstance(dtype, (T.ByteType, T.ShortType)):
        return (h % 100).cast(dtype.simpleString())
    if isinstance(dtype, T.IntegerType):
        return (h % 1000000).cast("int")
    if isinstance(dtype, T.LongType):
        return h
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return ((u - 0.5) * 2000.0).cast(dtype.simpleString())
    if isinstance(dtype, T.DecimalType):
        return (u * 10 ** min(dtype.precision - dtype.scale, 6)).cast(dtype)
    if isinstance(dtype, T.StringType):
        # degenerate-value bias (AvroGenerator.scala:100-103): "", " ",
        # a dictionary word, or a random hex token
        word = F.element_at(
            F.array(*[F.lit(w) for w in _WORDS]), (h % len(_WORDS) + 1).cast("int")
        )
        tok = F.substring(F.md5(h.cast("string")), 1, 8)
        sel = _h(seed, path, "sel") % 10
        return (
            F.when(sel == 0, F.lit(""))
            .when(sel == 1, F.lit(" "))
            .when(sel <= 5, word)
            .otherwise(tok)
        )
    if isinstance(dtype, T.BinaryType):
        return F.unhex(F.substring(F.md5(h.cast("string")), 1, 16))
    if isinstance(dtype, T.DateType):
        return F.date_add(F.lit("2020-01-01").cast("date"), (h % 2000).cast("int"))
    if isinstance(dtype, T.TimestampType):
        base = F.lit("2020-01-01 00:00:00").cast("timestamp")
        return F.timestamp_seconds(F.unix_timestamp(base) + h % (86400 * 2000))
    if isinstance(dtype, T.ArrayType):
        n_elems = (_h(seed, path, "len") % 5).cast("int")
        return F.transform(
            F.sequence(F.lit(1), n_elems),
            lambda i: _gen_elem(dtype.elementType, seed, path, i),
        )
    if isinstance(dtype, T.MapType):
        n_elems = (_h(seed, path, "len") % 4 + 1).cast("int")
        keys = F.transform(
            F.sequence(F.lit(1), n_elems),
            lambda i: F.concat(F.lit("k"), i.cast("string")),
        )
        vals = F.transform(
            F.sequence(F.lit(1), n_elems),
            lambda i: _gen_elem(dtype.valueType, seed, path, i),
        )
        return F.map_from_arrays(keys, vals)
    if isinstance(dtype, T.StructType):
        return F.struct(
            *[
                _gen_field(f, seed, f"{path}.{f.name}").alias(f.name)
                for f in dtype.fields
            ]
        )
    raise NotImplementedError(f"no generator for {dtype}")


def _gen_elem(dtype: T.DataType, seed: int, path: str, i: Column) -> Column:
    """Element generator for arrays/maps: salt the hash with the index."""
    salted = portable_hash64(
        F.concat_ws(
            FIELD_SEP,
            F.lit(str(seed)),
            F.lit(path),
            F.lit("elem"),
            F.col("__gen_id").cast("string"),
            i.cast("string"),
        )
    )
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return ((salted.cast("double") / float(1 << 60) - 0.5) * 2000.0).cast(
            dtype.simpleString()
        )
    if isinstance(dtype, T.IntegerType):
        return (salted % 1000000).cast("int")
    if isinstance(dtype, T.LongType):
        return salted
    if isinstance(dtype, T.StringType):
        return F.substring(F.md5(salted.cast("string")), 1, 8)
    if isinstance(dtype, T.BooleanType):
        return (salted % 2 == 0).cast("boolean")
    raise NotImplementedError(f"no element generator for {dtype}")


def _gen_field(f: T.StructField, seed: int, path: str) -> Column:
    col = _gen_for_type(f.dataType, seed, path)
    if f.nullable:
        # NULLABLE ⇒ sometimes-null (reference: 50% for BQ TableRow,
        # TableRowGenerator.scala:149-154; we default to 10% to keep
        # downstream joins interesting but not degenerate)
        return F.when(_u(seed, path, "null") < 0.1, F.lit(None)).otherwise(col)
    return col


def random_dataframe(
    spark: SparkSession,
    schema: T.StructType | str,
    n: int,
    seed: int = 42,
    overrides: Mapping[str, Column] | None = None,
    null_prob: float | None = None,
) -> DataFrame:
    """Generate n deterministic random rows matching ``schema``.

    ``overrides`` maps top-level field names to replacement Column
    expressions (the reference's ``amend``) — they may reference ``__gen_id``
    (the row index) for key-like fields.
    """
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    base = spark.range(n).withColumnRenamed("id", "__gen_id")
    cols = []
    for f in schema.fields:
        if overrides and f.name in overrides:
            cols.append(overrides[f.name].alias(f.name))
            continue
        fld = f
        if null_prob is not None:
            fld = T.StructField(f.name, f.dataType, nullable=null_prob > 0)
        c = _gen_field(fld, seed, f.name)
        if null_prob is not None and null_prob > 0:
            c = F.when(_u(seed, f.name, "null2") < null_prob, F.lit(None)).otherwise(
                _gen_for_type(f.dataType, seed, f.name)
            )
        cols.append(c.alias(f.name))
    return base.select(*cols)


def correlated_pair(
    spark: SparkSession,
    schema_a: T.StructType | str,
    schema_b: T.StructType | str,
    key_field: str,
    n: int,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """Two generated datasets sharing the same key column — the reference's
    ``amend2`` correlated-records pattern (scalacheck/package.scala:136-158,
    GenExample.scala:109-119). The key is the row index offset into a hash
    so both sides agree without any join at generation time."""
    key_col = portable_hash64(
        F.concat_ws(FIELD_SEP, F.lit(str(seed)), F.lit("corrkey"), F.col("__gen_id").cast("string"))
    )
    a = random_dataframe(
        spark, schema_a, n, seed=seed, overrides={key_field: key_col}
    )
    b = random_dataframe(
        spark, schema_b, n, seed=seed + 1, overrides={key_field: key_col}
    )
    return a, b
