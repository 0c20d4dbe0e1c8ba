"""IO layer tests: format sniffing, memoization, row restriction, round-trip."""

import os

import pytest
from pyspark.sql import functions as F

from ratatool_spark.sources.io import (
    is_done,
    read_table,
    row_restriction,
    sniff_format,
    strip_quote_wrap,
    write_table,
)


def test_sniff_format():
    assert sniff_format("/a/b.parquet") == "parquet"
    assert sniff_format("/a/b.avro") == "avro"
    assert sniff_format("/a/b.json") == "json"
    assert sniff_format("/a/dir") == "parquet"
    assert sniff_format("/a/glob/*") == "parquet"


def test_strip_quote_wrap():
    assert strip_quote_wrap("'x > 1'") == "x > 1"
    assert strip_quote_wrap('"x"') == "x"
    assert strip_quote_wrap("`q`") == "q"
    assert strip_quote_wrap("plain") == "plain"
    assert strip_quote_wrap("'") == "'"


def test_row_restriction_pushdown(spark, orders):
    out = row_restriction(orders, "'o_totalprice > 100000'")
    assert out.count() == orders.where(F.col("o_totalprice") > 100000).count()
    # predicate must reach the scan (PushedFilters)
    df = row_restriction(
        read_table(spark, "/root/testdata/sf0.001/orders.parquet"),
        "o_totalprice > 100000",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "o_totalprice" in plan.split("PushedFilters")[1][:200]


def test_write_reuse_memoization(spark, orders, tmp_path):
    """SA12/S14: completed output short-circuits recompute
    (FileStorage.isDone:44-74, BigSamplerAvro.scala:240-242)."""
    out = str(tmp_path / "memo")
    assert write_table(orders.limit(10), out, mode="overwrite") is True
    assert is_done(out)
    assert write_table(orders.limit(10), out, mode="overwrite", reuse=True) is False


def test_json_roundtrip(spark, orders, tmp_path):
    """S6: TableRow-JSON-lines equivalent."""
    p = str(tmp_path / "o.json")
    write_table(orders.limit(50).select("o_orderkey", "o_orderstatus"), p, fmt="json")
    back = read_table(spark, p, fmt="json")
    assert back.count() == 50
    assert set(back.columns) == {"o_orderkey", "o_orderstatus"}


def test_tsv_header_write(spark, orders, tmp_path):
    """S12: text sink with header (saveAsTextFileWithHeader)."""
    import glob

    p = str(tmp_path / "tsv")
    write_table(orders.limit(5).select("o_orderkey"), p, header="x")
    f = glob.glob(p + "/*.csv")[0]
    assert open(f).readline().strip() == "o_orderkey"


def test_avro_routes_through_io_chokepoint(spark, lineitem, tmp_path):
    """read_table/write_table serve .avro end-to-end even without the
    spark-avro connector jar (jar-free codec fallback)."""
    from pyspark.testing import assertDataFrameEqual

    from ratatool_spark.sources.io import is_done, read_table, write_table

    sub = lineitem.select("l_orderkey", "l_linenumber", "l_returnflag").limit(200)
    out = str(tmp_path / "t.avro")
    assert write_table(sub, out)
    assert is_done(out)
    assert not write_table(sub, out, reuse=True)  # memoized skip
    back = read_table(spark, out)
    assertDataFrameEqual(back, sub)


def test_compact_files_layout_and_parity(spark, lineitem, tmp_path):
    """compact_files: fragmented table → fewer, sort-clustered files with
    disjoint sort-key ranges (parquet min/max prune whole files), rows
    identical."""
    import glob

    import pyarrow.parquet as pq

    from ratatool_spark.sources.io import compact_files, read_table

    frag = str(tmp_path / "fragmented")
    lineitem.repartition(16).write.parquet(frag)
    assert len(glob.glob(frag + "/*.parquet")) == 16

    out = str(tmp_path / "compacted")
    # tiny target forces >1 output file so the range-disjointness of the
    # sort clustering is actually exercised
    n = compact_files(spark, frag, out, sort_cols=["l_orderkey"],
                      target_file_mb=0.05)
    files = sorted(glob.glob(out + "/*.parquet"))
    assert 1 < len(files) <= max(n, 1) + 1
    # row parity
    assert read_table(spark, out).count() == lineitem.count()
    # disjoint l_orderkey ranges across files (order files by their min)
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        col = [md.schema.column(i).name for i in range(md.num_columns)].index("l_orderkey")
        mins = min(md.row_group(g).column(col).statistics.min for g in range(md.num_row_groups))
        maxs = max(md.row_group(g).column(col).statistics.max for g in range(md.num_row_groups))
        ranges.append((mins, maxs))
    ranges.sort()
    for (a_min, a_max), (b_min, b_max) in zip(ranges, ranges[1:]):
        assert a_max <= b_min  # clustered: no overlap beyond the boundary


def test_cli_compact(spark, lineitem, tmp_path):
    from ratatool_spark.cli import main

    frag = str(tmp_path / "frag")
    lineitem.repartition(8).write.parquet(frag)
    out = str(tmp_path / "opt")
    rc = main(["compact", "--input", frag, "--output", out,
               "--sortBy", "l_orderkey"])
    assert rc == 0
    import glob
    assert len(glob.glob(out + "/*.parquet")) == 1  # tiny table → one file
    assert spark.read.parquet(out).count() == lineitem.count()


def test_zorder_prunes_on_both_dims(spark, lineitem, tmp_path):
    """Z-order clustering: after compaction by the interleaved key, file
    min/max statistics can skip files for predicates on EITHER clustered
    column; a plain leading-column sort prunes only its own column."""
    import glob

    import pyarrow.parquet as pq

    from ratatool_spark.sources.io import compact_files

    frag = str(tmp_path / "frag")
    lineitem.repartition(4).write.parquet(frag)

    def file_ranges(path, col_name):
        rng = []
        for f in glob.glob(path + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            ci = [md.schema.column(i).name for i in range(md.num_columns)].index(col_name)
            st = [md.row_group(g).column(ci).statistics for g in range(md.num_row_groups)]
            rng.append((min(s.min for s in st), max(s.max for s in st)))
        return rng

    def skip_frac(ranges, v):
        return sum(1 for lo, hi in ranges if not (lo <= v <= hi)) / len(ranges)

    # ~12 files over the 8-bit z-space: enough for the curve to localize
    # (with ~3 files each spans several z-quadrants and nothing prunes)
    zdir = str(tmp_path / "zorder")
    compact_files(spark, frag, zdir, zorder_cols=["l_partkey", "l_suppkey"],
                  target_file_mb=0.012)
    sdir = str(tmp_path / "sorted")
    compact_files(spark, frag, sdir, sort_cols=["l_partkey"],
                  target_file_mb=0.012)

    # probe at the 25th percentile — clearly inside the lower quadrant
    pk = lineitem.approxQuantile("l_partkey", [0.25], 0.01)[0]
    sk = lineitem.approxQuantile("l_suppkey", [0.25], 0.01)[0]

    z_pk = skip_frac(file_ranges(zdir, "l_partkey"), pk)
    z_sk = skip_frac(file_ranges(zdir, "l_suppkey"), sk)
    s_pk = skip_frac(file_ranges(sdir, "l_partkey"), pk)
    s_sk = skip_frac(file_ranges(sdir, "l_suppkey"), sk)

    assert s_pk > 0.5          # plain sort prunes its own column well
    assert s_sk == 0.0         # ...and nothing on the other column
    assert z_pk > 0.25 and z_sk > 0.25   # z-order prunes on BOTH
    # row parity
    assert spark.read.parquet(zdir).count() == lineitem.count()


def test_upsert_table_insert_update_delete(spark, tmp_path):
    from pyspark.sql import functions as F

    from ratatool_spark.sources.io import upsert_table

    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string"
    ).write.parquet(path)

    updates = spark.createDataFrame(
        [(2, "B", False), (4, "d", False), (3, None, True)],
        "k int, v string, __del boolean",
    )
    stats = upsert_table(spark, path, updates, ["k"], delete_col="__del")
    assert stats == {"inserted": 1, "updated": 1, "deleted": 1, "total": 3}
    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "B", 4: "d"}
    # no stray staging dirs left behind
    leftovers = [p for p in tmp_path.iterdir() if "__upsert" in p.name]
    assert not leftovers

    # plain upsert without deletes; deleting a missing key is a no-op
    more = spark.createDataFrame([(5, "e")], "k int, v string")
    stats2 = upsert_table(spark, path, more, ["k"])
    assert stats2 == {"inserted": 1, "updated": 0, "deleted": 0, "total": 4}
    assert spark.read.parquet(path).count() == 4

    dup = spark.createDataFrame([(7, "x"), (7, "y")], "k int, v string")
    import pytest as _pt

    with _pt.raises(ValueError, match="duplicate keys"):
        upsert_table(spark, path, dup, ["k"])
    # failed upsert must leave the table untouched
    assert spark.read.parquet(path).count() == 4


def test_upsert_table_crash_recovery_and_base_pk_guard(spark, tmp_path):
    """A crash between the two swap renames strands the table at
    __upsert_old__; the next call must RESTORE it (never delete the only
    copy). A base table with duplicate keys is rejected up front."""
    import pytest as _pt

    from ratatool_spark.sources.io import upsert_table

    path = str(tmp_path / "tbl")
    spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string").write.parquet(path)

    # simulate the crash window: final renamed away, new never swapped in
    jvm = spark.sparkContext._jvm
    fs = jvm.org.apache.hadoop.fs.Path(path).getFileSystem(
        spark._jsc.hadoopConfiguration()
    )
    assert fs.rename(
        jvm.org.apache.hadoop.fs.Path(path),
        jvm.org.apache.hadoop.fs.Path(path + ".__upsert_old__"),
    )
    upd = spark.createDataFrame([(3, "c")], "k int, v string")
    stats = upsert_table(spark, path, upd, ["k"])
    assert stats["total"] == 3  # recovered the stranded snapshot, then merged
    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "b", 3: "c"}

    # duplicate keys in the BASE are rejected (counters would lie)
    dup_path = str(tmp_path / "dup")
    spark.createDataFrame([(1, "a"), (1, "b")], "k int, v string").write.parquet(
        dup_path
    )
    with _pt.raises(ValueError, match="base table .* duplicate keys"):
        upsert_table(spark, dup_path, upd, ["k"])
    # and the reject left the base untouched
    assert spark.read.parquet(dup_path).count() == 2


def test_upsert_table_random_op_sequence_matches_model(spark, tmp_path):
    """Model-based check: a seeded random sequence of upsert batches
    (mixed inserts/updates/deletes) applied through upsert_table must
    track a driver-side dict model exactly, including every returned
    counter, at every step."""
    import random

    from ratatool_spark.sources.io import upsert_table

    rng = random.Random(7)
    path = str(tmp_path / "tbl")
    model = {k: f"v{k}" for k in range(10)}
    spark.createDataFrame(
        sorted(model.items()), "k int, v string"
    ).write.parquet(path)

    for step in range(5):
        keys = rng.sample(range(25), rng.randint(1, 8))
        batch, expect = [], {"inserted": 0, "updated": 0, "deleted": 0}
        for k in keys:
            if rng.random() < 0.3:
                batch.append((k, None, True))
                if k in model:
                    expect["deleted"] += 1
                    del model[k]
            else:
                v = f"s{step}k{k}"
                batch.append((k, v, False))
                expect["updated" if k in model else "inserted"] += 1
                model[k] = v
        updates = spark.createDataFrame(batch, "k int, v string, __del boolean")
        stats = upsert_table(spark, path, updates, ["k"], delete_col="__del")
        expect["total"] = len(model)
        assert stats == expect, f"step {step}"
        got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
        assert got == model, f"step {step}"


def test_upsert_table_rejects_null_keys(spark, tmp_path):
    """NULL never equals NULL under join semantics — a null-keyed update
    could never replace anything and would append forever, so it is
    rejected up front."""
    import pytest as _pt

    from ratatool_spark.sources.io import upsert_table

    path = str(tmp_path / "tbl")
    spark.createDataFrame([(1, "a")], "k int, v string").write.parquet(path)
    upd = spark.createDataFrame([(None, "x")], "k int, v string")
    with _pt.raises(ValueError, match="NULL key"):
        upsert_table(spark, path, upd, ["k"])
    assert spark.read.parquet(path).count() == 1


def test_sniff_format_orc(spark, tmp_path):
    from ratatool_spark.sources.io import read_table, sniff_format, write_table

    assert sniff_format("/x/y/part.orc") == "orc"
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    out = str(tmp_path / "t.orc")
    write_table(df, out, mode="overwrite")
    back = read_table(spark, out)
    assert back.schema == df.schema
    assert sorted((r["k"], r["v"]) for r in back.collect()) == [(1, "a"), (2, "b")]
