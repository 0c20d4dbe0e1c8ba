"""Remaining sampler-mode gates (reservoir, head, stratified).

Split out of __spark_entry__.py (r6 verdict #6); oracle strings are
byte-pinned by tests/test_oracle_golden.py."""


from __future__ import annotations


from ratatool_spark.gates._common import _dice_sql


# ------------------------------------------- remaining sampler modes


def _q_sample_uniform_det(spark, sf_dir):
    """SA6: deterministic uniform-distribution approx sample — per-stratum
    keep-probability from a broadcast count join, portable dice."""
    from ratatool_spark.operators.sampler import sample

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = sample(
        li,
        0.1,
        fields=["l_orderkey", "l_linenumber"],
        strata=["l_returnflag"],
        uniform=True,
        seed=42,
    )
    return out.select("l_orderkey", "l_linenumber", "l_returnflag")

_SQL_SAMPLE_UNIFORM_DET = f"""
WITH counts AS (
  SELECT l_returnflag, COUNT(*) AS n_k FROM lineitem GROUP BY l_returnflag
), tot AS (
  SELECT SUM(n_k) AS total, COUNT(*) AS nk FROM counts
), probs AS (
  SELECT l_returnflag, least((SELECT total * 0.1 / nk FROM tot) / n_k, 1.0) AS p
  FROM counts
)
SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag
FROM lineitem l JOIN probs USING (l_returnflag)
WHERE {_dice_sql(['l_orderkey', 'l_linenumber'])} < p
"""

def _q_sample_uniform_exact(spark, sf_dir):
    """SA9 uniform-exact: equal per-stratum targets, window-rank selection."""
    from ratatool_spark.operators.sampler import sample

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = sample(
        li,
        0.1,
        fields=["l_orderkey", "l_linenumber"],
        strata=["l_returnflag"],
        uniform=True,
        exact=True,
        seed=42,
    )
    return out.select("l_orderkey", "l_linenumber", "l_returnflag")

def _q_sample_exact_global(spark, sf_dir):
    """SA7 global exact sample (no strata): the ceil(n·f) smallest dice
    rolls, selected by distributed bucket-selection (value-range buckets
    over the dice + per-bucket local rank — no single-reducer top-t, see
    operators/sampler.py _exact_sample)."""
    from ratatool_spark.operators.sampler import sample

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = sample(li, 0.05, fields=["l_orderkey", "l_linenumber"], exact=True, seed=42)
    return out.select("l_orderkey", "l_linenumber", "l_returnflag")

_SQL_SAMPLE_EXACT_GLOBAL = f"""
SELECT l_orderkey, l_linenumber, l_returnflag FROM (
  SELECT l_orderkey, l_linenumber, l_returnflag,
         ROW_NUMBER() OVER (
           ORDER BY {_dice_sql(['l_orderkey', 'l_linenumber'])}) AS rn,
         COUNT(*) OVER () AS n
  FROM lineitem
) WHERE rn <= CEIL(n * 0.05)
"""

_SQL_SAMPLE_UNIFORM_EXACT = f"""
WITH counts AS (
  SELECT l_returnflag, COUNT(*) AS n_k FROM lineitem GROUP BY l_returnflag
), tot AS (
  SELECT SUM(n_k) AS total, COUNT(*) AS nk FROM counts
), rolled AS (
  SELECT l_orderkey, l_linenumber, l_returnflag,
         {_dice_sql(['l_orderkey', 'l_linenumber'])} AS d
  FROM lineitem
), ranked AS (
  SELECT r.*, c.n_k,
         ROW_NUMBER() OVER (PARTITION BY r.l_returnflag ORDER BY d) AS rn
  FROM rolled r JOIN counts c USING (l_returnflag)
)
SELECT l_orderkey, l_linenumber, l_returnflag
FROM ranked
WHERE rn <= least(CAST(CEIL((SELECT total * 0.1 / nk FROM tot)) AS BIGINT), n_k)
"""
