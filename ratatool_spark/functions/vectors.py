"""Vector math over array columns — pure higher-order functions (JVM-side,
codegen'd). Used by the VECTOR delta type (Diffy.CosineDistance:168-184),
embedding near-dup and ANN search.

Fold order is left-to-right and element-wise casts are explicit so results
are bit-reproducible in other engines (DuckDB ``list_reduce`` matches).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm2(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_sim(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm2(a) * norm2(b))


def cosine_dist(a: Column, b: Column) -> Column:
    """1 - cosine similarity (the reference's vector delta metric)."""
    return F.lit(1.0) - cosine_sim(a, b)
