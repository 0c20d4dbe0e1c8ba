"""Schema-driven data generator gates.

Split out of __spark_entry__.py (r6 verdict #6); oracle strings are
byte-pinned by tests/test_oracle_golden.py."""


from __future__ import annotations


# ----------------------------------------------------------- generators


_GEN_N, _GEN_SEED = 2000, 42

def _q_generator(spark, sf_dir):
    """G1: schema-driven deterministic random records — distributed
    generation via spark.range + portable-hash expressions (no UDF)."""
    from ratatool_spark.generators import random_dataframe

    return random_dataframe(
        spark,
        "c_long bigint, c_bool boolean, c_double double, c_str string",
        _GEN_N,
        seed=_GEN_SEED,
    )

def _sql_generator() -> str:
    n, seed = _GEN_N, _GEN_SEED

    def h(path, salt):
        feed = f"concat_ws(chr(1), '{seed}', '{path}', '{salt}', CAST(__gen_id AS VARCHAR))"
        return f"(('0x' || substr(md5({feed}), 1, 15))::BIGINT)"

    def u(path, salt):
        return f"({h(path, salt)}::DOUBLE / 1152921504606846976.0)"

    words = "['foo', 'bar', 'baz', 'qux', 'lorem', 'ipsum', 'data', 'spark']"
    word = f"list_extract({words}, CAST(({h('c_str','')} % 8) + 1 AS INT))"
    tok = f"substr(md5(CAST({h('c_str','')} AS VARCHAR)), 1, 8)"
    sel = f"({h('c_str','sel')} % 10)"
    return f"""
WITH ids AS (SELECT UNNEST(range(0, {n})) AS __gen_id)
SELECT
  CASE WHEN {u('c_long','null')} < 0.1 THEN NULL
       ELSE {h('c_long','')} END AS c_long,
  CASE WHEN {u('c_bool','null')} < 0.1 THEN NULL
       ELSE ({h('c_bool','')} % 2 = 0) END AS c_bool,
  CASE WHEN {u('c_double','null')} < 0.1 THEN NULL
       ELSE ({u('c_double','v')} - 0.5) * 2000.0 END AS c_double,
  CASE WHEN {u('c_str','null')} < 0.1 THEN NULL
       WHEN {sel} = 0 THEN ''
       WHEN {sel} = 1 THEN ' '
       WHEN {sel} <= 5 THEN {word}
       ELSE {tok} END AS c_str
FROM ids
"""

def _q_generator_corr(spark, sf_dir):
    """G4/G5 (amend2): two generated datasets correlated on a shared key
    column — the key is an override expression over the row index, so
    both sides agree with no generation-time join
    (scalacheck/package.scala:136-158). The query joins them back on the
    key: n rows out iff the correlation held row-for-row."""
    from pyspark.sql import functions as F

    from ratatool_spark.generators import correlated_pair

    a, b = correlated_pair(
        spark, "k bigint, va double", "k bigint, vb bigint", "k", _GEN_N,
        seed=_GEN_SEED,
    )
    return a.join(b, "k").select("k", "va", "vb")

def _sql_generator_corr() -> str:
    n, seed = _GEN_N, _GEN_SEED

    def h(seed_, path, salt):
        feed = (
            f"concat_ws(chr(1), '{seed_}', '{path}', '{salt}', "
            "CAST(__gen_id AS VARCHAR))"
        )
        return f"(('0x' || substr(md5({feed}), 1, 15))::BIGINT)"

    def u(seed_, path, salt):
        return f"({h(seed_, path, salt)}::DOUBLE / 1152921504606846976.0)"

    key = (
        f"(('0x' || substr(md5(concat_ws(chr(1), '{seed}', 'corrkey', "
        "CAST(__gen_id AS VARCHAR))), 1, 15))::BIGINT)"
    )
    return f"""
WITH ids AS (SELECT UNNEST(range(0, {n})) AS __gen_id),
a AS (
  SELECT {key} AS k,
         CASE WHEN {u(seed, 'va', 'null')} < 0.1 THEN NULL
              ELSE ({u(seed, 'va', 'v')} - 0.5) * 2000.0 END AS va
  FROM ids
),
b AS (
  SELECT {key} AS k,
         CASE WHEN {u(seed + 1, 'vb', 'null')} < 0.1 THEN NULL
              ELSE {h(seed + 1, 'vb', '')} END AS vb
  FROM ids
)
SELECT k, va, vb FROM a JOIN b USING (k)
"""
