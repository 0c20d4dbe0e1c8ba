"""BigDiffy gates: keyed full-outer diff, global/field stats, deltas.

Split out of __spark_entry__.py (r6 verdict #6); oracle strings are
byte-pinned by tests/test_oracle_golden.py."""


from __future__ import annotations

from pyspark.sql import SparkSession


from ratatool_spark.gates._common import _dice_sql


# --------------------------------------------------------------- diffy
# Fixture: lhs/rhs derived deterministically from orders (o_orderkey is the
# unique PK) via portable dice so DuckDB can rebuild the identical pair.
# lhs drops ~2% of rows, rhs drops ~3%, shifts o_totalprice (+10 / +5) and
# rewrites o_orderstatus.


def _perturbed_pair(spark: SparkSession, sf_dir: str):
    from pyspark.sql import functions as F

    from ratatool_spark.functions.hashing import dice

    li = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    key = ["o_orderkey"]
    src = (
        li.withColumn("d_drop_r", dice(key, seed=101))
        .withColumn("d_qty", dice(key, seed=102))
        .withColumn("d_flag", dice(key, seed=103))
        .withColumn("d_drop_l", dice(key, seed=104))
    )
    lhs = src.where(F.col("d_drop_l") < 0.98).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    rhs = src.where(F.col("d_drop_r") < 0.97).select(
        "o_orderkey",
        F.when(F.col("d_qty") < 0.1, F.col("o_totalprice") + 10)
        .when(F.col("d_qty") < 0.2, F.col("o_totalprice") + 5)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        F.when(F.col("d_flag") < 0.05, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
    )
    return lhs, rhs

def _diffy(spark: SparkSession, sf_dir: str):
    from ratatool_spark.operators.diffy import diff

    lhs, rhs = _perturbed_pair(spark, sf_dir)
    return diff(lhs, rhs, ["o_orderkey"])

def _q_diffy_deltas(spark, sf_dir):
    """D1/D2/D8: field-level deltas of a keyed full-outer diff."""
    return _diffy(spark, sf_dir).deltas

def _q_diffy_key_stats(spark, sf_dir):
    """D1: per-key diff classification (SAME/DIFFERENT/MISSING_*)."""
    return _diffy(spark, sf_dir).key_stats

def _q_diffy_global_stats(spark, sf_dir):
    """A1/A6: global diff counters."""
    return _diffy(spark, sf_dir).global_stats

def _q_diffy_field_stats(spark, sf_dir):
    """A1: per-field delta statistics with population moments."""
    from pyspark.sql import functions as F

    fs = _diffy(spark, sf_dir).field_stats
    r6 = lambda c: F.round(F.col(c), 6).alias(c)  # noqa: E731
    return fs.select(
        "field",
        "delta_type",
        "count",
        r6("fraction"),
        r6("min"),
        r6("max"),
        r6("mean"),
        r6("variance"),
        r6("stddev"),
        r6("skewness"),
        r6("kurtosis"),
    )

_SQL_DIFFY_SRC = f"""
src AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus,
         {_dice_sql(['o_orderkey'], 101)} AS d_drop_r,
         {_dice_sql(['o_orderkey'], 102)} AS d_qty,
         {_dice_sql(['o_orderkey'], 103)} AS d_flag,
         {_dice_sql(['o_orderkey'], 104)} AS d_drop_l
  FROM orders
),
lhs AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus
  FROM src WHERE d_drop_l < 0.98
),
rhs AS (
  SELECT o_orderkey,
         CASE WHEN d_qty < 0.1 THEN o_totalprice + 10
              WHEN d_qty < 0.2 THEN o_totalprice + 5
              ELSE o_totalprice END AS o_totalprice,
         CASE WHEN d_flag < 0.05 THEN 'X' ELSE o_orderstatus END AS o_orderstatus
  FROM src WHERE d_drop_r < 0.97
),
j AS (
  SELECT COALESCE(l.o_orderkey, r.o_orderkey) AS k1,
         l.o_orderkey IS NOT NULL AS has_l,
         r.o_orderkey IS NOT NULL AS has_r,
         l.o_totalprice AS lq, r.o_totalprice AS rq,
         l.o_orderstatus AS lf, r.o_orderstatus AS rf
  FROM lhs l FULL OUTER JOIN rhs r ON l.o_orderkey = r.o_orderkey
),
classified AS (
  SELECT CAST(k1 AS VARCHAR) AS key,
         CASE WHEN NOT has_l THEN 'MISSING_LHS'
              WHEN NOT has_r THEN 'MISSING_RHS'
              WHEN (lq IS DISTINCT FROM rq) OR (lf IS DISTINCT FROM rf)
                THEN 'DIFFERENT'
              ELSE 'SAME' END AS diff_type,
         lq, rq, lf, rf, has_l, has_r
  FROM j
),
deltas AS (
  SELECT key, 'o_totalprice' AS field, CAST(lq AS VARCHAR) AS "left",
         CAST(rq AS VARCHAR) AS "right", 'NUMERIC' AS delta_type,
         rq - lq AS delta
  FROM classified
  WHERE has_l AND has_r AND lq IS DISTINCT FROM rq
  UNION ALL
  SELECT key, 'o_orderstatus', lf, rf, 'STRING',
         CAST(levenshtein(lf, rf) AS DOUBLE)
  FROM classified
  WHERE has_l AND has_r AND lf IS DISTINCT FROM rf
)
"""

_SQL_DIFFY_DELTAS = f"""
WITH {_SQL_DIFFY_SRC}
SELECT key, field, "left", "right", delta_type, delta FROM deltas
"""

_SQL_DIFFY_KEY_STATS = f"""
WITH {_SQL_DIFFY_SRC}
SELECT key, diff_type FROM classified
"""

_SQL_DIFFY_GLOBAL = f"""
WITH {_SQL_DIFFY_SRC}
SELECT COUNT(*) AS num_total,
       CAST(SUM(CASE WHEN diff_type = 'SAME' THEN 1 ELSE 0 END) AS BIGINT)
         AS num_same,
       CAST(SUM(CASE WHEN diff_type = 'DIFFERENT' THEN 1 ELSE 0 END) AS BIGINT)
         AS num_diff,
       CAST(SUM(CASE WHEN diff_type = 'MISSING_LHS' THEN 1 ELSE 0 END) AS BIGINT)
         AS num_missing_lhs,
       CAST(SUM(CASE WHEN diff_type = 'MISSING_RHS' THEN 1 ELSE 0 END) AS BIGINT)
         AS num_missing_rhs
FROM classified
"""

_SQL_DIFFY_FIELD_STATS = f"""
WITH {_SQL_DIFFY_SRC},
num_diff AS (
  SELECT COUNT(*) AS nd FROM classified WHERE diff_type = 'DIFFERENT'
),
agg AS (
  SELECT field, delta_type,
         COUNT(*) AS count, COUNT(delta) AS _n,
         MIN(delta) AS min, MAX(delta) AS max,
         SUM(delta) AS s1, SUM(delta*delta) AS s2,
         SUM(delta*delta*delta) AS s3, SUM(delta*delta*delta*delta) AS s4
  FROM deltas GROUP BY field, delta_type
),
mom AS (
  SELECT field, delta_type, count, _n, min, max,
         s1/_n AS mean,
         s2/_n - (s1/_n)*(s1/_n) AS m2,
         s3/_n - 3*(s1/_n)*s2/_n + 2*(s1/_n)*(s1/_n)*(s1/_n) AS m3,
         s4/_n - 4*(s1/_n)*s3/_n + 6*(s1/_n)*(s1/_n)*s2/_n
              - 3*(s1/_n)*(s1/_n)*(s1/_n)*(s1/_n) AS m4
  FROM agg
)
SELECT field, delta_type, count,
       ROUND(count / (SELECT CAST(nd AS DOUBLE) FROM num_diff), 6) AS fraction,
       ROUND(min, 6) AS min, ROUND(max, 6) AS max, ROUND(mean, 6) AS mean,
       ROUND(m2, 6) AS variance,
       ROUND(SQRT(CASE WHEN m2 > 0 THEN m2 ELSE 0 END), 6) AS stddev,
       ROUND(CASE WHEN m2 > 1e-300 THEN m3 / POW(m2, 1.5) ELSE 0.0 END, 6) AS skewness,
       ROUND(CASE WHEN m2 > 1e-300 THEN m4 / (m2*m2) - 3.0 ELSE 0.0 END, 6) AS kurtosis
FROM mom
"""
