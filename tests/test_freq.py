"""Heavy hitters, skew report, and count-min frequency sketch tables."""

import collections
import hashlib
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from ratatool_spark.operators.freq import (
    CMS_MIX,
    CMS_P,
    build_freq_sketches,
    estimate_freqs,
    heavy_hitters,
    merge_freq_sketches,
    skew_report,
)


def _phash(v, seed=0):
    return int(hashlib.md5(f"{seed}\x01{v}".encode()).hexdigest()[:15], 16)


def _slot(h, j, width):
    return ((h % CMS_P) * (j * 2 + 3) + ((j + 1) * CMS_MIX) % CMS_P) % CMS_P % width


def _toy(spark):
    rows = []
    for g, key, n in [
        ("a", "x", 5), ("a", "y", 3), ("a", "z", 3), ("a", "w", 1),
        ("b", "x", 7), ("b", "q", 2),
    ]:
        rows += [(g, key)] * n
    return spark.createDataFrame(rows, "g string, k string")


def test_heavy_hitters_exact_and_tiebreak(spark):
    df = _toy(spark)
    out = {
        (r["g"], r["rank"]): (r["k"], r["cnt"])
        for r in heavy_hitters(df, ["g"], "k", k=2).collect()
    }
    # ties (y=3, z=3) break on the smaller key
    assert out == {
        ("a", 1): ("x", 5), ("a", 2): ("y", 3),
        ("b", 1): ("x", 7), ("b", 2): ("q", 2),
    }


def test_skew_report_values_and_nulls(spark):
    df = spark.createDataFrame(
        [("hot", 1), ("hot", 2), ("hot", 3), ("cold", 4), (None, 5)],
        "k string, v long",
    )
    out = {r["value"]: r for r in skew_report(df, ["k"], top_k=10).collect()}
    assert set(out) == {"hot", "cold", None}
    hot = out["hot"]
    assert (hot["cnt"], hot["rank"], hot["n_distinct"]) == (3, 1, 3)
    assert hot["share"] == pytest.approx(3 / 5)
    # 3x hotter than uniform (5 rows / 3 distinct)
    assert hot["skew_ratio"] == pytest.approx(3 * 3 / 5)
    # NULL values survive as a grouped row, not dropped
    assert out[None]["cnt"] == 1
    # Shannon entropy over the FULL histogram {3/5, 1/5, 1/5}, in nats
    import math

    want_h = -sum(p * math.log(p) for p in (3 / 5, 1 / 5, 1 / 5))
    assert hot["entropy"] == pytest.approx(want_h)


def test_skew_report_multi_column_one_value_space(spark):
    df = spark.createDataFrame([(1, "1")], "a long, b string")
    out = skew_report(df, ["a", "b"], top_k=1).collect()
    # both columns report, compared in string space
    assert {(r["column"], r["value"]) for r in out} == {("a", "1"), ("b", "1")}


def test_cms_build_matches_python_replay(spark):
    df = _toy(spark)
    sk = {r["g"]: r for r in
          build_freq_sketches(df, ["g"], "k", depth=3, width=16).collect()}
    pdf = df.collect()
    for g in ("a", "b"):
        cnt = collections.Counter()
        for row in pdf:
            if row["g"] != g:
                continue
            h = _phash(row["k"])
            for j in range(3):
                cnt[j * 16 + _slot(h, j, 16)] += 1
        cms = sk[g]["cms"]
        assert len(cms) == 48
        assert {i: c for i, c in enumerate(cms) if c} == dict(cnt)
        assert sk[g]["n_rows"] == sum(1 for r in pdf if r["g"] == g)


def test_cms_merge_equals_direct_build(spark):
    df = _toy(spark).withColumn("i", F.monotonically_increasing_id())
    parts = [df.where(F.col("i") % 3 == m).drop("i") for m in range(3)]
    direct = build_freq_sketches(df.drop("i"), ["g"], "k", depth=4, width=32)
    merged = merge_freq_sketches(
        *[build_freq_sketches(p, ["g"], "k", depth=4, width=32) for p in parts]
    )
    d = {r["g"]: (r["cms"], r["depth"], r["width"], r["n_rows"])
         for r in direct.collect()}
    m = {r["g"]: (r["cms"], r["depth"], r["width"], r["n_rows"])
         for r in merged.collect()}
    assert d == m


def test_cms_estimate_upper_bounds_truth(spark):
    df = _toy(spark)
    sk = build_freq_sketches(df, ["g"], "k", depth=4, width=64)
    keys = spark.createDataFrame(
        [("x",), ("y",), ("absent",)], "k string"
    )
    est = {(r["g"], r["k"]): r["est_count"]
           for r in estimate_freqs(sk, keys, "k").collect()}
    true = collections.Counter((r["g"], r["k"]) for r in df.collect())
    assert len(est) == 6  # 2 groups x 3 probes
    for gk, e in est.items():
        assert e >= true.get(gk, 0)
    # wide sketch over 5 keys: the known-hot probes are exact
    assert est[("a", "x")] == 5 and est[("b", "x")] == 7


def test_cms_geometry_guard_raises(spark):
    df = _toy(spark)
    a = build_freq_sketches(df, ["g"], "k", depth=4, width=32)
    b = build_freq_sketches(df, ["g"], "k", depth=4, width=16)
    with pytest.raises(Exception, match="mismatched geometry"):
        merge_freq_sketches(a, b).collect()
    # the guard rides the PAYLOAD column: selecting only cms (pruning
    # depth/width away) must still raise, never return summed garbage
    with pytest.raises(Exception, match="mismatched geometry"):
        merge_freq_sketches(a, b).select("g", "cms").collect()


def test_cms_rejects_bad_geometry_args(spark):
    df = _toy(spark)
    with pytest.raises(ValueError, match="depth"):
        build_freq_sketches(df, ["g"], "k", depth=0, width=8)


def test_stream_freq_sketches_equals_batch(spark):
    from ratatool_spark.streaming.sketches import (
        read_stream_freq_sketches,
        stream_freq_sketches,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_type", "user_id"
    )
    root = tempfile.mkdtemp(prefix="rt_fsk_")
    src = os.path.join(root, "in")
    ev.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_freq_sketches(
        stream,
        os.path.join(root, "sk"),
        os.path.join(root, "ckpt"),
        group_cols=["event_type"],
        key_col="user_id",
        depth=4,
        width=128,
    )
    q.awaitTermination()
    merged = read_stream_freq_sketches(spark, os.path.join(root, "sk"))
    direct = build_freq_sketches(ev, ["event_type"], "user_id", depth=4, width=128)
    m = {r["event_type"]: (r["cms"], r["n_rows"]) for r in merged.collect()}
    d = {r["event_type"]: (r["cms"], r["n_rows"]) for r in direct.collect()}
    assert m == d


def test_cli_freq_sketch_pipeline(spark, tmp_path):
    """build x2 -> merge -> estimate through the CLI equals a direct
    build+estimate (string-probe form: build keys hash via their string
    rendering, so string probes match a bigint-keyed build)."""
    from ratatool_spark.cli import main

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "event_type", "user_id"
    )
    a_src, b_src = str(tmp_path / "a"), str(tmp_path / "b")
    ev.where(F.col("event_id") % 2 == 0).write.parquet(a_src)
    ev.where(F.col("event_id") % 2 == 1).write.parquet(b_src)
    sa, sb = str(tmp_path / "sa"), str(tmp_path / "sb")
    for src, dst in [(a_src, sa), (b_src, sb)]:
        assert main([
            "freqSketch", "--mode", "build", "--input", src,
            "--output", dst, "--groupBy", "event_type",
            "--keyField", "user_id", "--depth", "4", "--width", "64",
        ]) == 0
    merged = str(tmp_path / "merged")
    assert main(["freqSketch", "--mode", "merge",
                 "--inputs", f"{sa},{sb}", "--output", merged]) == 0
    est = str(tmp_path / "est")
    assert main(["freqSketch", "--mode", "estimate", "--input", merged,
                 "--output", est, "--keyField", "user_id",
                 "--keys", "1,2,999999"]) == 0
    got = {(r["event_type"], r["user_id"]): r["est_count"]
           for r in spark.read.parquet(est).collect()}
    direct = build_freq_sketches(ev, ["event_type"], "user_id", depth=4, width=64)
    keys = spark.createDataFrame([("1",), ("2",), ("999999",)], "user_id string")
    want = {(r["event_type"], r["user_id"]): r["est_count"]
            for r in estimate_freqs(direct, keys, "user_id").collect()}
    assert got == want and len(got) == 15


def test_cli_heavy_hitters_and_skew_report(spark, tmp_path):
    from ratatool_spark.cli import main

    src = str(tmp_path / "src")
    _toy(spark).write.parquet(src)
    hh_out = str(tmp_path / "hh")
    assert main(["heavyHitters", "--input", src, "--output", hh_out,
                 "--groupBy", "g", "--keyField", "k", "--k", "1"]) == 0
    top = {(r["g"], r["k"]) for r in spark.read.parquet(hh_out).collect()}
    assert top == {("a", "x"), ("b", "x")}

    sk_out = str(tmp_path / "sk")
    assert main(["skewReport", "--input", src, "--output", sk_out,
                 "--columns", "g,k", "--topK", "1"]) == 0
    rows = {r["column"]: r["value"] for r in spark.read.parquet(sk_out).collect()}
    assert rows == {"g": "a", "k": "x"}


def test_sketch_heavy_hitters_matches_exact_on_wide_sketch(spark):
    """With a sketch wide enough to be collision-free over the toy key
    space, sketch-based heavy hitters == exact heavy hitters."""
    from ratatool_spark.operators.freq import sketch_heavy_hitters

    df = _toy(spark)
    parts = [df.where(F.col("k") != "q"), df.where(F.col("k") == "q")]
    merged = merge_freq_sketches(
        *[build_freq_sketches(p, ["g"], "k", depth=4, width=512) for p in parts]
    )
    cands = df.select("k")  # duplicates on purpose: distinct is internal
    got = {(r["g"], r["rank"]): (r["k"], r["est_count"])
           for r in sketch_heavy_hitters(merged, cands, "k", k=2).collect()}
    want = {(r["g"], r["rank"]): (r["k"], r["cnt"])
            for r in heavy_hitters(df, ["g"], "k", k=2).collect()}
    assert got == want


def test_estimate_rejects_group_column_collision(spark):
    df = _toy(spark)
    sk = build_freq_sketches(df, ["g"], "k", depth=2, width=8)
    probes = spark.createDataFrame([("a",)], "g string")
    with pytest.raises(ValueError, match="collides"):
        estimate_freqs(sk, probes, "g")
    # the four reserved sketch columns are rejected too (r5 ADVICE): a
    # probe list named cms/depth/width/n_rows would duplicate-name after
    # the crossJoin
    for reserved in ("cms", "depth", "width", "n_rows"):
        bad = spark.createDataFrame([("a",)], f"{reserved} string")
        with pytest.raises(ValueError, match="collides"):
            estimate_freqs(sk, bad, reserved)


def test_heavy_hitters_by_measure(spark):
    df = spark.createDataFrame(
        [("a", "x", 1.0), ("a", "x", 2.0), ("a", "y", 10.0), ("a", "z", 4.0)],
        "g string, k string, v double",
    )
    out = [
        (r["k"], float(r["total"]), r["rank"])
        for r in heavy_hitters(
            df, ["g"], "k", k=2, measure=F.col("v").cast("decimal(18,2)")
        ).collect()
    ]
    # ranked by sum(v), not by row count (x has 2 rows but less weight)
    assert out == [("y", 10.0, 1), ("z", 4.0, 2)]


def test_sketch_join_size_exact_on_wide_sketch(spark):
    """With width >> distinct keys (collision-free over the toy space),
    the CMS inner-product estimate equals the TRUE per-group equi-join
    cardinality Σ_key f_A(key)·f_B(key)."""
    from ratatool_spark.operators.freq import sketch_join_size

    a = _toy(spark)
    b = _toy(spark).union(spark.createDataFrame([("a", "x")], "g string, k string"))
    sa = build_freq_sketches(a, ["g"], "k", depth=4, width=512)
    sb = build_freq_sketches(b, ["g"], "k", depth=4, width=512)
    got = {r["g"]: (r["est_join_rows"], r["n_rows_a"], r["n_rows_b"])
           for r in sketch_join_size(sa, sb).collect()}
    want = {
        r["g"]: r["n"]
        for r in a.join(b, ["g", "k"]).groupBy("g").agg(F.count("*").alias("n")).collect()
    }
    assert {g: v[0] for g, v in got.items()} == want
    assert got["a"][1] == 12 and got["a"][2] == 13  # n_rows ride along


def test_sketch_join_size_overestimates_under_collisions(spark):
    """A deliberately narrow sketch can only OVERestimate (counters are
    sums over colliding keys; products are monotone in the counters)."""
    from ratatool_spark.operators.freq import sketch_join_size

    df = _toy(spark)
    sa = build_freq_sketches(df, ["g"], "k", depth=2, width=2)
    est = {r["g"]: r["est_join_rows"]
           for r in sketch_join_size(sa, sa).collect()}
    exact = {
        r["g"]: r["n"]
        for r in df.alias("x").join(df.alias("y"), ["g", "k"])
        .groupBy("g").agg(F.count("*").alias("n")).collect()
    }
    for g in exact:
        assert est[g] >= exact[g]


def test_sketch_join_size_global_cross_join_path(spark):
    from ratatool_spark.operators.freq import sketch_join_size

    df = _toy(spark)
    s = build_freq_sketches(df, [], "k", depth=4, width=512)
    [row] = sketch_join_size(s, s).collect()
    # Σ f(k)^2 over the toy counts: x:12, y:3, z:3, w:1, q:2
    assert row["est_join_rows"] == 12 * 12 + 3 * 3 + 3 * 3 + 1 * 1 + 2 * 2
    assert row["n_rows_a"] == row["n_rows_b"] == 21


def test_sketch_join_size_guards(spark):
    from ratatool_spark.operators.freq import sketch_join_size

    df = _toy(spark)
    s1 = build_freq_sketches(df, ["g"], "k", depth=4, width=512)
    s2 = build_freq_sketches(df, ["g"], "k", depth=4, width=256)
    with pytest.raises(Exception, match="mismatched geometry"):
        sketch_join_size(s1, s2).collect()
    s3 = build_freq_sketches(df.withColumnRenamed("g", "h"), ["h"], "k",
                             depth=4, width=512)
    with pytest.raises(ValueError, match="group columns differ"):
        sketch_join_size(s1, s3)
