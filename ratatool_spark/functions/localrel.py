"""Single-slice local relations for metadata-scale rows.

``spark.createDataFrame(list, ...)`` parallelizes the list into
``spark.default.parallelism`` slices — on local[32] that is 32 tasks,
31 of them empty, costing ~0.5 s of pure scheduling per materialization.
Every local DataFrame an operator builds from collected METADATA
(manifest entries, prefix offsets, stratum allocations, vocabulary
constants, learned merges) is bounded and belongs in ONE slice; this
helper is that contract. Data-scale frames must never route through it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """``createDataFrame`` pinned to a single partition. ``rows`` is a
    list of tuples (metadata-scale by contract); ``schema`` is a DDL
    string or StructType — explicit, never inferred, so an empty list
    still yields a typed frame."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema
    )
