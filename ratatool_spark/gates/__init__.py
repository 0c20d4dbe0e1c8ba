"""Driver-contract gate registry, split by family.

Each module holds the Spark gate callables (``_q_*``) and their DuckDB
oracle twins (``_sql_*`` / ``_SQL_*``) for one operator family; the
registry itself (``queries()`` / ``oracle_sql()``) lives in
``/root/repo/__spark_entry__.py``. Every oracle string is pinned
byte-identical by tests/test_oracle_golden.py.
"""
