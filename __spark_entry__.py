"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` returns one callable per implemented operator from
SURVEY.md §2 (plus the training-data-pipeline extensions); ``oracle_sql()``
returns the DuckDB-equivalent SQL. Column names/aliases match pairwise.

Cross-engine determinism notes:
  - Aggregates over doubles are cast to DECIMAL before summing so Spark and
    DuckDB produce bit-identical results (no fp-order noise).
  - Deterministic sampling uses the portable md5 dice
    (ratatool_spark.functions.hashing) which both engines compute
    identically.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"

# DuckDB twin of ratatool_spark.functions.hashing.dice for 2 int fields
_DICE_SQL = (
    "((('0x' || substr(md5(concat_ws(chr(1), '{seed}', "
    "{fields})), 1, 15))::BIGINT)::DOUBLE / 1152921504606846976.0)"
)


def _dice_sql(fields: list[str], seed: int = 42) -> str:
    rendered = ", ".join(f"CAST({f} AS VARCHAR)" for f in fields)
    return _DICE_SQL.format(seed=seed, fields=rendered)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: deterministic 10% hash-sample of lineitem (BigSampler SA2)
    feeding a pricing-summary aggregation — sampling + agg end-to-end."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.sampler import sample

    li = spark.read.parquet(f"{SF0001}/lineitem.parquet")
    sampled = sample(li, 0.1, fields=["l_orderkey", "l_linenumber"], seed=42)
    return (
        sampled.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(28,4)")).alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(28,4)")).alias("sum_base_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------- queries


def _q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary over lineitem (A1-family built-in
    aggregation; validates scan+filter+agg pushdown path)."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    dec = lambda c: F.col(c).cast("decimal(28,4)")  # noqa: E731
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).alias("sum_qty"),
            F.sum(dec("l_extendedprice")).alias("sum_base_price"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(28,4)"
                )
            ).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_SQL_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       SUM(CAST(l_quantity AS DECIMAL(28,4))) AS sum_qty,
       SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS sum_base_price,
       SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def _q_sample_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SA2: deterministic hash-dice sample, 10%, portable md5 hash
    (BigSampler.scala:385-391). Exactly reproducible in any SQL engine."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.sampler import sample

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = sample(li, 0.1, fields=["l_orderkey", "l_linenumber"], seed=42)
    return out.select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_returnflag"
    )


_SQL_SAMPLE_DET = f"""
SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_returnflag
FROM lineitem
WHERE {_dice_sql(['l_orderkey', 'l_linenumber'])} < 0.1
"""


def _q_sample_exact_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SA8/SA9: exact stratified deterministic sample — per-stratum
    row_number over the portable dice, keep ceil(n_k * f)
    (SamplerSCollectionFunctions.scala:174-311 redesigned as window rank)."""
    from ratatool_spark.operators.sampler import sample

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = sample(
        li,
        0.05,
        fields=["l_orderkey", "l_linenumber"],
        strata=["l_returnflag"],
        exact=True,
        seed=42,
    )
    return out.select("l_orderkey", "l_linenumber", "l_returnflag")


_SQL_SAMPLE_EXACT_STRAT = f"""
WITH rolled AS (
  SELECT l_orderkey, l_linenumber, l_returnflag,
         {_dice_sql(['l_orderkey', 'l_linenumber'])} AS d,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n_k
  FROM lineitem
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY d) AS rn
  FROM rolled
)
SELECT l_orderkey, l_linenumber, l_returnflag
FROM ranked WHERE rn <= CAST(CEIL(n_k * 0.05) AS BIGINT)
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "tpch_q1_pricing_summary": _q_tpch_q1,
        "sample_deterministic": _q_sample_det,
        "sample_exact_stratified": _q_sample_exact_stratified,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "tpch_q1_pricing_summary": _SQL_TPCH_Q1,
        "sample_deterministic": _SQL_SAMPLE_DET,
        "sample_exact_stratified": _SQL_SAMPLE_EXACT_STRAT,
    }
