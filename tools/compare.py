"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then compares
row count, column names, and order-insensitive values. Use while iterating:

    python tools/compare.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")


def norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round to 9 significant-ish decimals to absorb engine fp noise
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def df_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in order))
    out.sort()
    return [cols[i] for i in order], out


def main():
    import duckdb

    import __spark_entry__ as entry_mod
    from ratatool_spark.session import get_spark
    from ratatool_spark.sources.io import load_tables

    sf_dir = sys.argv[1] if len(sys.argv) > 1 and "/" in sys.argv[1] else "/root/testdata/sf0.01"
    only = [a for a in sys.argv[1:] if "/" not in a]

    spark = get_spark("compare")
    load_tables(spark, sf_dir)
    con = duckdb.connect()
    from ratatool_spark import TABLES

    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({len(srows)} rows) [rows-only check]")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {e}")
            continue
        sc, sm = df_to_multiset(scols, srows)
        dc, dm = df_to_multiset(dcols, drows)
        if sc != dc:
            failures.append(name)
            print(f"FAIL {name}: columns spark={sc} duckdb={dc}")
            continue
        if len(sm) != len(dm):
            failures.append(name)
            print(f"FAIL {name}: rowcount spark={len(sm)} duckdb={len(dm)}")
            continue
        bad = [(a, b) for a, b in zip(sm, dm) if a != b]
        if bad:
            failures.append(name)
            print(f"FAIL {name}: {len(bad)} mismatched rows; first: {bad[0]}")
            continue
        print(f"OK   {name}: {len(sm)} rows, cols={sc}")

    print(f"\n{'ALL OK' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
