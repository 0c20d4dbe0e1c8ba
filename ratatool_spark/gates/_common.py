"""Shared gate helpers: scale-dir constants and the portable md5 dice twin.

Split out of __spark_entry__.py (r6 verdict #6); oracle strings are
byte-pinned by tests/test_oracle_golden.py."""


from __future__ import annotations


SF0001 = "/root/testdata/sf0.001"

# DuckDB twin of ratatool_spark.functions.hashing.dice for 2 int fields
_DICE_SQL = (
    "((('0x' || substr(md5(concat_ws(chr(1), '{seed}', "
    "{fields})), 1, 15))::BIGINT)::DOUBLE / 1152921504606846976.0)"
)

def _dice_sql(fields: list[str], seed: int = 42) -> str:
    rendered = ", ".join(f"CAST({f} AS VARCHAR)" for f in fields)
    return _DICE_SQL.format(seed=seed, fields=rendered)
