"""Z-order layout operators (operators/layout.py)."""

from pyspark.sql import functions as F


def _py_morton(cells: list[int], bits: int) -> int:
    z = 0
    for i in range(bits):
        for j, c in enumerate(cells):
            z |= ((c >> i) & 1) << (i * len(cells) + j)
    return z


def test_zorder_key_matches_python_reference(spark):
    from ratatool_spark.operators.layout import zorder_key

    rows = [(i, float(x), float(y)) for i, (x, y) in enumerate(
        [(0, 0), (15, 15), (7, 8), (3, 12), (15, 0), (0, 15)]
    )]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    bits = 4
    z = zorder_key(
        [F.col("x"), F.col("y")],
        [F.lit(0.0), F.lit(0.0)],
        [F.lit(16.0), F.lit(16.0)],
        bits=bits,
    )
    got = {r["id"]: r["z"] for r in df.select("id", z.alias("z")).collect()}
    for i, (x, y) in enumerate([(0, 0), (15, 15), (7, 8), (3, 12), (15, 0), (0, 15)]):
        # width = 16/2^4 = 1.0 -> cell == int value
        assert got[i] == _py_morton([x, y], bits), (i, x, y)


def test_zorder_key_clamps_and_degenerate_range(spark):
    from ratatool_spark.operators.layout import zorder_key

    df = spark.createDataFrame([(1, -5.0, 3.0), (2, 99.0, 3.0)],
                               "id long, x double, y double")
    z = zorder_key(
        [F.col("x"), F.col("y")],
        [F.lit(0.0), F.lit(3.0)],
        [F.lit(16.0), F.lit(3.0)],  # y range degenerate -> cell 0
        bits=4,
    )
    got = {r["id"]: r["z"] for r in df.select("id", z.alias("z")).collect()}
    assert got[1] == _py_morton([0, 0], 4)    # below lo clamps to 0
    assert got[2] == _py_morton([15, 0], 4)   # above hi clamps to max


def test_zorder_key_validation(spark):
    import pytest as _pt

    from ratatool_spark.operators.layout import zorder_key

    with _pt.raises(ValueError, match="at least one"):
        zorder_key([], [], [], 8)
    with _pt.raises(ValueError, match="signed long"):
        zorder_key([F.lit(1)] * 4, [F.lit(0)] * 4, [F.lit(1)] * 4, bits=16)


def test_zorder_repartition_clusters_files(spark, tmp_path):
    """Rows in the same output partition are z-contiguous: per-partition
    z ranges don't interleave (the property that makes footer min/max
    stats selective)."""
    import numpy as np

    from ratatool_spark.operators.layout import zorder_repartition

    rng = np.random.default_rng(3)
    rows = [(int(i), float(x), float(y)) for i, (x, y) in enumerate(
        rng.integers(0, 1000, (2000, 2))
    )]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    out = zorder_repartition(df, ["x", "y"], bits=10, num_partitions=8,
                             z_col="z")
    parts = (
        out.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.min("z").alias("lo"), F.max("z").alias("hi"),
             F.count(F.lit(1)).alias("n"))
        .orderBy("lo")
        .collect()
    )
    assert sum(p["n"] for p in parts) == 2000
    for a, b in zip(parts, parts[1:]):
        assert a["hi"] <= b["lo"], (a, b)  # disjoint z ranges


# ------------------------------------------------ rendezvous sharding


def test_rendezvous_minimal_movement(spark):
    """Adding a shard only moves keys TO the new shard; removing a shard
    only moves its own keys — the HRW property."""
    from ratatool_spark.operators.layout import rendezvous_shard

    df = spark.createDataFrame([(i,) for i in range(2000)], "k long")
    s5 = [f"s{i}" for i in range(5)]
    s6 = s5 + ["s5"]
    a = {r["k"]: r["s"] for r in df.select(
        "k", rendezvous_shard(F.col("k"), s5).alias("s")).collect()}
    b = {r["k"]: r["s"] for r in df.select(
        "k", rendezvous_shard(F.col("k"), s6).alias("s")).collect()}
    moved = {k for k in a if a[k] != b[k]}
    assert all(b[k] == "s5" for k in moved)          # only to the new shard
    assert 0 < len(moved) < 2000 * 0.35              # ~1/6 expected
    # removal: dropping s0 only moves s0's keys
    s4 = [f"s{i}" for i in range(1, 5)]
    c = {r["k"]: r["s"] for r in df.select(
        "k", rendezvous_shard(F.col("k"), s4).alias("s")).collect()}
    moved2 = {k for k in a if a[k] != c[k]}
    assert all(a[k] == "s0" for k in moved2)


def test_rendezvous_balance_and_validation(spark):
    import pytest as _pt

    from ratatool_spark.operators.layout import rendezvous_shard

    df = spark.createDataFrame([(i,) for i in range(3000)], "k long")
    counts = (
        df.select(rendezvous_shard(F.col("k"), ["a", "b", "c"]).alias("s"))
        .groupBy("s").count().collect()
    )
    by = {r["s"]: r["count"] for r in counts}
    assert set(by) == {"a", "b", "c"}
    assert all(700 < v < 1300 for v in by.values()), by
    with _pt.raises(ValueError, match="at least one"):
        rendezvous_shard(F.col("k"), [])
    with _pt.raises(ValueError, match="duplicate"):
        rendezvous_shard(F.col("k"), ["a", "a"])


def test_zorder_row_group_skipping_beats_linear_sort(spark):
    """The payoff proof behind zorder_skip_manifest: at a row-group
    granularity fine enough for the fixture (128 rows), the z-ordered
    layout must scan FEWER row groups than the single-column sort for a
    2-D range box — both measured from real parquet footer stats."""
    from ratatool_spark.gates.analytics import _zorder_skip_rows

    rows = {
        r["layout"]: r
        for r in _zorder_skip_rows(
            spark, "/root/testdata/sf0.01", rgs=128
        ).collect()
    }
    z, l = rows["zorder"], rows["linear"]
    assert z["n_groups"] == l["n_groups"] > 50
    assert z["n_scanned"] < l["n_scanned"], (z, l)
    assert z["n_pruned"] > 0 and l["n_pruned"] > 0


def test_row_group_stats_and_audit_roundtrip(tmp_path):
    """Footer stats must reproduce the written batches' min/max and the
    audit must apply the intersect-on-every-column rule."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ratatool_spark.operators.layout import (
        row_group_skip_audit,
        row_group_stats,
    )

    t = pa.table(
        {"a": list(range(100)), "b": [float(99 - i) for i in range(100)]}
    )
    p = str(tmp_path / "t.parquet")
    pq.write_table(t, p, row_group_size=25)
    stats = row_group_stats(p, ["a", "b"])
    assert [e["a"] for e in stats] == [
        (0, 24), (25, 49), (50, 74), (75, 99)
    ]
    assert stats[0]["b"] == (75.0, 99.0)
    # box hits groups 1 and 2 on a, but only group 1 on b
    n, scanned = row_group_skip_audit(
        stats, {"a": (30, 60), "b": (50.0, 70.0)}
    )
    assert (n, scanned) == (4, 1)


def test_cli_zorder_audit(tmp_path, capsys):
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ratatool_spark.cli import main

    t = pa.table({"a": list(range(100)), "b": [float(i) for i in range(100)]})
    p = str(tmp_path / "t.parquet")
    pq.write_table(t, p, row_group_size=25)
    assert main(["zorderAudit", "--input", p, "--box", "a:30:60,b:10:40"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # a hits groups 2,3; b hits groups 1,2 -> conjunction scans group 2
    assert rep == {"n_row_groups": 4, "n_scanned": 1, "n_pruned": 3}


def test_compaction_plan_bins_by_cumsum(spark):
    from pyspark.sql import Row

    from ratatool_spark.operators.layout import compaction_plan

    manifest = spark.createDataFrame(
        [Row(f="a", sz=700), Row(f="b", sz=300), Row(f="c", sz=300),
         Row(f="d", sz=200), Row(f="e", sz=100)]
    )
    out = {r["f"]: r["bin"] for r in
           compaction_plan(manifest, "sz", ["f"], 1000).collect()}
    # size-desc order a(700) b(300) c(300) d(200) e(100); exclusive
    # cumsums 0,700,1000,1300,1500 -> bins 0,0,1,1,1
    assert out == {"a": 0, "b": 0, "c": 1, "d": 1, "e": 1}


def test_compaction_plan_rejects_bad_target(spark):
    import pytest as _pytest

    from ratatool_spark.operators.layout import compaction_plan

    df = spark.range(3).selectExpr("id", "id * 10 AS sz")
    with _pytest.raises(ValueError):
        compaction_plan(df, "sz", ["id"], 0)


def _skilling_axes_to_index(coords, bits):
    """Direct transcription of Skilling 2004 AxesToTranspose + bit
    collection — the independent reference the expression generator
    must match."""
    X = list(coords)
    d = len(X)
    Q = 1 << (bits - 1)
    while Q > 1:
        P = Q - 1
        for i in range(d):
            if X[i] & Q:
                X[0] ^= P
            else:
                t = (X[0] ^ X[i]) & P
                X[0] ^= t
                X[i] ^= t
        Q >>= 1
    for i in range(1, d):
        X[i] ^= X[i - 1]
    t = 0
    Q = 1 << (bits - 1)
    while Q > 1:
        if X[d - 1] & Q:
            t ^= Q - 1
        Q >>= 1
    for i in range(d):
        X[i] ^= t
    H = 0
    for j in range(bits - 1, -1, -1):
        for i in range(d):
            H = (H << 1) | ((X[i] >> j) & 1)
    return H


def test_hilbert_key_bijection_adjacency_and_reference(spark):
    """Exhaustive 2-D bits=4 grid: the Spark Hilbert key (expression
    chain) equals the Skilling reference on every cell, is a bijection
    onto [0, 256), and CONSECUTIVE keys are always unit-step-adjacent
    cells — the defining Hilbert property Morton order lacks (and the
    reason its file boxes are tighter)."""
    import itertools

    from pyspark.sql import functions as F

    from ratatool_spark.operators.layout import hilbert_attach

    bits, n = 4, 16
    pts = list(itertools.product(range(n), repeat=2))
    df = spark.createDataFrame(pts, "a int, b int")
    # min=0 / max=15 makes the quantizer the identity on 0..15
    out = {
        (r["a"], r["b"]): r["h"]
        for r in hilbert_attach(df, ["a", "b"], bits=bits, h_col="h")
        .collect()
    }
    assert len(out) == n * n
    for p, h in out.items():
        assert h == _skilling_axes_to_index(p, bits), p
    by_h = sorted((h, p) for p, h in out.items())
    assert [h for h, _ in by_h] == list(range(n * n))  # bijection
    for (_, p1), (_, p2) in zip(by_h, by_h[1:]):
        assert abs(p1[0] - p2[0]) + abs(p1[1] - p2[1]) == 1  # adjacency


def test_hilbert_key_3d_matches_reference(spark):
    """d=3, bits=3: the generator's rotation/Gray/fixup steps hold in
    higher dimensions too (512 cells, exhaustive)."""
    import itertools

    from ratatool_spark.operators.layout import hilbert_attach

    bits, n = 3, 8
    pts = list(itertools.product(range(n), repeat=3))
    df = spark.createDataFrame(pts, "a int, b int, c int")
    out = hilbert_attach(df, ["a", "b", "c"], bits=bits, h_col="h").collect()
    assert len(out) == n ** 3
    for r in out:
        assert r["h"] == _skilling_axes_to_index(
            (r["a"], r["b"], r["c"]), bits)


def test_cluster_snapshot_hilbert_preserves_content(spark, tmp_path):
    """curve='hilbert' clustering is a pure layout rewrite: logical
    content identical, one replace commit, and the clustered files'
    per-file stat boxes cover both cluster columns."""
    import ratatool_spark.operators.snapshots as snap

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    path = str(tmp_path / "hil")
    snap.commit_append(li, path)
    sid = snap.cluster_snapshot(
        spark, path, ["l_partkey", "l_suppkey"], bits=8,
        num_partitions=4, curve="hilbert")
    assert sid == 2
    before = li.orderBy("l_orderkey", "l_partkey", "l_suppkey").collect()
    after = (
        snap.read_snapshot(spark, path)
        .orderBy("l_orderkey", "l_partkey", "l_suppkey")
        .collect()
    )
    assert before == after
    m = snap.read_manifest(path)
    assert m["operation"] == "replace"
    for e in m["files"]:
        st = e.get("stats") or {}
        assert "l_partkey" in st and "l_suppkey" in st


def test_hilbert_skip_beats_linear_and_matches_zorder_class(spark):
    """Empirical skip audit (the zorder_skip methodology, Hilbert
    edition): orders written with fixed 512-row row groups under three
    layouts — Hilbert order, Morton order, single-column sort — then
    row-group min/max stats audited against a 2-D range box. Hilbert
    must skip strictly more groups than the single-column layout (the
    whole point of a space-filling curve) and be within the same class
    as Morton (>= 80% of its skips; on this fixture it is typically
    equal or better — contiguity means no diagonal jumps inflating
    boxes)."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from ratatool_spark.operators.layout import (
        hilbert_attach,
        row_group_skip_audit,
        row_group_stats,
        zorder_key,
    )

    o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    rng = o.agg(
        F.min("o_custkey").alias("lo_c"), F.max("o_custkey").alias("hi_c"),
        F.min("o_totalprice").alias("lo_p"),
        F.max("o_totalprice").alias("hi_p"),
    ).first()
    lo_c, hi_c = float(rng["lo_c"]), float(rng["hi_c"])
    lo_p, hi_p = float(rng["lo_p"]), float(rng["hi_p"])
    z = zorder_key(
        [F.col("o_custkey"), F.col("o_totalprice")],
        [F.lit(lo_c), F.lit(lo_p)], [F.lit(hi_c), F.lit(hi_p)], bits=8,
    )
    hdf = hilbert_attach(
        o, ["o_custkey", "o_totalprice"], bits=8, h_col="hval"
    ).withColumn("zval", z)
    box = {
        "o_custkey": (lo_c + 0.1 * (hi_c - lo_c), lo_c + 0.3 * (hi_c - lo_c)),
        "o_totalprice": (
            lo_p + 0.1 * (hi_p - lo_p), lo_p + 0.3 * (hi_p - lo_p)),
    }
    tmp = tempfile.mkdtemp(prefix="hskip_")
    skipped = {}
    for layout, order in (
        ("hilbert", ["hval", "o_orderkey"]),
        ("zorder", ["zval", "o_orderkey"]),
        ("linear", ["o_custkey", "o_orderkey"]),
    ):
        pdf = (
            hdf.orderBy(*[F.col(c) for c in order])
            .select("o_orderkey", "o_custkey", "o_totalprice")
            .toPandas()
        )
        path = os.path.join(tmp, f"{layout}.parquet")
        pq.write_table(
            pa.Table.from_pandas(pdf, preserve_index=False), path,
            row_group_size=512,
        )
        stats = row_group_stats(path, ["o_custkey", "o_totalprice"])
        n_groups, n_scanned = row_group_skip_audit(stats, box)
        skipped[layout] = n_groups - n_scanned
    assert skipped["hilbert"] > skipped["linear"]
    assert skipped["hilbert"] >= 0.8 * skipped["zorder"]
