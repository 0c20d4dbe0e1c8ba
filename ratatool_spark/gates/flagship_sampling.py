"""Deterministic-sampling gates (BigSampler SA2 family).

Split out of __spark_entry__.py (r6 verdict #6); oracle strings are
byte-pinned by tests/test_oracle_golden.py."""


from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


from ratatool_spark.gates._common import _dice_sql


# ---------------------------------------------------------------- queries


def _q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary over lineitem (A1-family built-in
    aggregation; validates scan+filter+agg pushdown path)."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    dec = lambda c: F.col(c).cast("decimal(28,4)")  # noqa: E731
    # Sum in DECIMAL for bit-identical totals, but emit DOUBLE: the
    # harness hashes pandas-rendered frames and DuckDB's .df() renders
    # DECIMAL as float64, so a Decimal('153078.0000') vs 153078.0 would
    # hash-mismatch on identical values.
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(28,4)"
                )
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )

_SQL_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE)
         AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

def _q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style forecast-revenue aggregate: every predicate reaches
    the parquet scan (PushedFilters), zero joins, one partial->final agg —
    the pure scan-throughput benchmark."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    # window chosen inside the testdata's shipdate span
    # (1995-01-02 .. 2001-11-04) so the aggregate is non-vacuous
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_discount")).cast(
                    "decimal(28,4)"
                )
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )

_SQL_TPCH_Q6 = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,4))) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
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


def _q_sample_neyman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman (variance-optimal) stratified sampling
    (sampler.sample_neyman): 1000 lineitem rows allocated across
    l_returnflag strata ∝ N_h·S_h of l_extendedprice — exact integer
    stratum stats (fixed-point sums, decimal sumsq), quantized weights,
    floor+largest-remainder integer allocation, per-stratum dice rank.
    The oracle replays the whole allocation arithmetic and the rank, so
    a drift in the variance formula, the rounding rule, the remainder
    tie-break, or the dice flips membership and hash-mismatches."""
    from ratatool_spark.operators.sampler import sample_neyman

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = sample_neyman(
        li,
        total_n=1000,
        value_col="l_extendedprice",
        strata=["l_returnflag"],
        fields=["l_orderkey", "l_linenumber"],
        seed=42,
    )
    return out.select("l_orderkey", "l_linenumber", "l_returnflag")


def _sql_sample_neyman() -> str:
    d = _dice_sql(["l_orderkey", "l_linenumber"])
    return f"""
WITH fx AS (
  SELECT l_orderkey, l_linenumber, l_returnflag AS g,
         CAST(FLOOR(CAST(l_extendedprice AS DOUBLE) * 1000000.0 + 0.5)
              AS BIGINT) AS v,
         {d} AS dd
  FROM lineitem
), stats AS (
  SELECT g, COUNT(*) AS n, SUM(v) AS s1,
         SUM(CAST(v AS DECIMAL(19,0)) * CAST(v AS DECIMAL(19,0))) AS s2
  FROM fx GROUP BY g
), wts AS (
  SELECT g, n,
         CAST(FLOOR(n * (CASE WHEN n < 2 THEN 0.0 ELSE
           sqrt(GREATEST((CAST(s2 AS DOUBLE)
                          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                         / (n - 1), 0.0)) END) + 0.5) AS BIGINT) AS w
  FROM stats
), tot AS (
  SELECT SUM(w) AS tw, SUM(n) AS tn FROM wts
), raws AS (
  SELECT g, n,
         1000.0 * (CASE WHEN tw = 0 THEN n ELSE w END)
                / (CASE WHEN tw = 0 THEN tn ELSE tw END) AS raw
  FROM wts, tot
), based AS (
  SELECT g, n, CAST(FLOOR(raw) AS BIGINT) AS base,
         raw - FLOOR(raw) AS frac
  FROM raws
), bt AS (SELECT SUM(base) AS bsum FROM based),
alloc AS (
  SELECT g, LEAST(n, base + CASE WHEN
           ROW_NUMBER() OVER (ORDER BY frac DESC, g ASC) <= 1000 - bsum
           THEN 1 ELSE 0 END) AS nh
  FROM based, bt
), ranked AS (
  SELECT l_orderkey, l_linenumber, g,
         ROW_NUMBER() OVER (PARTITION BY g
                            ORDER BY dd, l_orderkey, l_linenumber) AS rn
  FROM fx
)
SELECT r.l_orderkey, r.l_linenumber, r.g AS l_returnflag
FROM ranked r JOIN alloc a ON a.g = r.g
WHERE r.rn <= a.nh
"""
