"""Single-pass table profiler (operators/profile.py)."""

import pytest
from pyspark.sql import Row

from ratatool_spark.operators.profile import profile_table


def test_profile_exact_values_with_nulls(spark):
    df = spark.createDataFrame(
        [
            Row(a=1, b="x"),
            Row(a=1, b=None),
            Row(a=3, b="y"),
            Row(a=None, b="y"),
        ]
    )
    got = {r["col_name"]: r for r in
           profile_table(df, exact_distinct=True).collect()}
    assert set(got) == {"a", "b"}
    ra = got["a"]
    assert (ra["n_rows"], ra["n_nulls"], ra["n_distinct"]) == (4, 1, 2)
    assert ra["null_frac"] == pytest.approx(0.25)
    assert (ra["min_value"], ra["max_value"]) == ("1", "3")
    rb = got["b"]
    assert (rb["n_rows"], rb["n_nulls"], rb["n_distinct"]) == (4, 1, 2)
    assert (rb["min_value"], rb["max_value"]) == ("x", "y")


def test_profile_single_scan_plan(spark, orders):
    """The whole profile is ONE scan + ONE aggregation: the executed plan
    must contain exactly one FileScan regardless of column count."""
    out = profile_table(
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet"),
        ["o_orderkey", "o_custkey", "o_orderstatus"],
    )
    p = out._jdf.queryExecution().executedPlan().toString()
    assert p.count("FileScan") == 1


def test_profile_approx_mode_close(spark, orders):
    approx = {r["col_name"]: r["n_distinct"]
              for r in profile_table(orders, ["o_custkey"]).collect()}
    exact = {r["col_name"]: r["n_distinct"]
             for r in profile_table(orders, ["o_custkey"],
                                    exact_distinct=True).collect()}
    assert approx["o_custkey"] == pytest.approx(exact["o_custkey"], rel=0.1)


def test_profile_empty_cols_raises(spark, orders):
    with pytest.raises(ValueError):
        profile_table(orders, [])


def test_histogram_exact_and_clamping(spark):
    from ratatool_spark.operators.profile import histogram

    df = spark.createDataFrame(
        [Row(v=float(x)) for x in [0.5, 1.0, 4.9, 5.0, 9.9, 100.0]]
        + [Row(v=None)]
    )
    got = {r["bucket"]: r for r in
           histogram(df, "v", lo=0.0, hi=10.0, n_buckets=2).collect()}
    assert len(got) == 2
    # [0,5): 0.5(clamped in), 1.0, 4.9 ; [5,10): 5.0, 9.9, 100.0(clamped)
    assert got[0]["cnt"] == 3 and got[1]["cnt"] == 3
    assert (got[0]["lo"], got[0]["hi"]) == (0.0, 5.0)
    assert (got[1]["lo"], got[1]["hi"]) == (5.0, 10.0)


def test_histogram_empty_buckets_present(spark):
    from ratatool_spark.operators.profile import histogram

    df = spark.createDataFrame([Row(v=1.0)])
    rows = histogram(df, "v", lo=0.0, hi=100.0, n_buckets=10).collect()
    assert len(rows) == 10
    assert sum(r["cnt"] for r in rows) == 1


def test_histogram_bad_args_raise(spark):
    from ratatool_spark.operators.profile import histogram

    df = spark.createDataFrame([Row(v=1.0)])
    import pytest as _pt
    with _pt.raises(ValueError):
        histogram(df, "v", lo=5.0, hi=5.0)


def test_profile_empty_table_returns_rows(spark):
    """ANSI mode: profiling an empty table must not throw DIVIDE_BY_ZERO."""
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("a", T.LongType())])
    rows = profile_table(spark.createDataFrame([], schema),
                         exact_distinct=True).collect()
    assert len(rows) == 1
    assert rows[0]["n_rows"] == 0 and rows[0]["null_frac"] is None


def test_profile_pii_single_pass_and_sampling(spark):
    """profile_pii: per-column pattern counts from ONE scan/aggregation
    (plan-pinned), Luhn-verified subset <= shaped count, deterministic
    hash-dice sampling scans a stable strict subset."""
    from pyspark.sql import Row

    from ratatool_spark.operators.profile import profile_pii

    rows = [
        Row(i=i, a=f"user{i}@mail.com" if i % 2 == 0 else "plain",
            b="4539-1488-0343-6467" if i % 3 == 0 else f"id {i}")
        for i in range(60)
    ]
    df = spark.createDataFrame(rows)
    out = {r["column"]: r for r in profile_pii(df, columns=["a", "b"]).collect()}
    assert out["a"]["n_email"] == 30 and out["a"]["n_card_shaped"] == 0
    assert out["b"]["n_card_shaped"] == 20 == out["b"]["n_card_luhn"]
    assert all(r["n_scanned"] == 60 for r in out.values())
    # single scan, single aggregate
    plan = (
        profile_pii(df, columns=["a", "b"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan ExistingRDD") + plan.count("FileScan") <= 1
    # deterministic sample: same cohort twice, smaller than full
    s1 = profile_pii(df, columns=["a", "b"], sample_fraction=0.5).collect()
    s2 = profile_pii(df, columns=["a", "b"], sample_fraction=0.5).collect()
    assert s1 == s2
    assert 0 < s1[0]["n_scanned"] < 60
    import pytest as _pt

    with _pt.raises(ValueError, match="no string columns"):
        profile_pii(df.select("i"))


def test_k_anonymity_classes_and_summary(spark):
    from pyspark.sql import Row

    from ratatool_spark.operators.profile import (
        k_anonymity,
        k_anonymity_summary,
    )

    rows = (
        [Row(age=30, zip="111") for _ in range(5)]
        + [Row(age=30, zip="222") for _ in range(2)]
        + [Row(age=40, zip="111")]
    )
    df = spark.createDataFrame(rows)
    classes = {
        (r["age"], r["zip"]): (r["class_size"], r["at_risk"])
        for r in k_anonymity(df, ["age", "zip"], k=3).collect()
    }
    assert classes == {
        (30, "111"): (5, False),
        (30, "222"): (2, True),
        (40, "111"): (1, True),
    }
    [s] = k_anonymity_summary(df, ["age", "zip"], k=3).collect()
    assert s["k_min"] == 1
    assert s["n_classes"] == 3
    assert s["n_classes_at_risk"] == 2
    assert s["n_rows_at_risk"] == 3
    assert s["at_risk_rate"] == 0.375


def test_k_anonymity_requires_columns(spark):
    from ratatool_spark.operators.profile import k_anonymity

    df = spark.range(3)
    import pytest as _pt

    with _pt.raises(ValueError):
        k_anonymity(df, [])


def test_calibration_report_hand_computed(spark):
    from ratatool_spark.operators.profile import calibration_report

    rows = [
        (0.05, False), (0.08, True),        # bin 0: n=2, pos=1
        (0.95, True), (0.97, True), (0.93, False),  # bin 9: n=3, pos=2
        (1.0, True),                         # prob==1.0 -> top bin
        (0.55, True),                        # bin 5
    ]
    df = spark.createDataFrame(rows, "prob double, label boolean")
    got = {r.bin: r for r in calibration_report(df).collect()}
    assert set(got) == {0, 5, 9}
    assert (got[0].n, got[0].n_pos) == (2, 1) and got[0].frac_pos == 0.5
    assert got[0].mean_prob == pytest.approx((0.05 + 0.08) / 2, abs=1e-9)
    assert (got[9].n, got[9].n_pos) == (4, 3)
    assert got[9].mean_prob == pytest.approx((0.95 + 0.97 + 0.93 + 1.0) / 4, abs=1e-9)
    assert got[5].frac_pos == 1.0

    import pytest as _pt
    with _pt.raises(ValueError, match="n_bins"):
        calibration_report(df, n_bins=0)


def test_mutual_information_replay_and_bounds(spark):
    import math

    from ratatool_spark.operators.profile import mutual_information

    rows = [("a", 1, "x"), ("a", 1, "y"), ("b", 2, "x"),
            ("b", 2, "y"), ("c", 1, "x"), ("c", 2, None)]
    df = spark.createDataFrame(rows, "u string, v int, w string")
    got = {(r["x_col"], r["y_col"]): r
           for r in mutual_information(df, [("u", "v"), ("v", "w"), ("v", "v")]).collect()}

    def ref(xs, ys):
        n = len(xs)
        from collections import Counter
        cj, cx, cy = Counter(zip(xs, ys)), Counter(xs), Counter(ys)
        j = sum(c * math.log(c) for c in cj.values())
        mx = sum(c * math.log(c) for c in cx.values())
        my = sum(c * math.log(c) for c in cy.values())
        mi = math.log(n) + (j - mx - my) / n
        hx = math.log(n) - mx / n
        hy = math.log(n) - my / n
        return round(hx, 6), round(hy, 6), round(mi, 6)

    us = [r[0] for r in rows]; vs = [str(r[1]) for r in rows]
    ws = [str(r[2]) for r in rows]  # NULL renders as its own category
    assert (got[("u", "v")]["h_x"], got[("u", "v")]["h_y"], got[("u", "v")]["mi"]) == ref(us, vs)
    assert (got[("v", "w")]["h_x"], got[("v", "w")]["h_y"], got[("v", "w")]["mi"]) == ref(vs, ws)
    # self-MI == entropy, nmi == 1 (the determinism bound)
    assert got[("v", "v")]["mi"] == got[("v", "v")]["h_x"]
    assert got[("v", "v")]["nmi"] == 1.0
    # MI never exceeds min entropy
    for r in got.values():
        assert r["mi"] <= min(r["h_x"], r["h_y"]) + 1e-9


def test_mutual_information_independent_and_constant(spark):
    from ratatool_spark.operators.profile import mutual_information

    # perfectly independent 2x2 grid, and a constant column (H=0)
    rows = [(x, y, "k") for x in ("a", "b") for y in ("p", "q")] * 3
    df = spark.createDataFrame(rows, "x string, y string, z string")
    got = {(r["x_col"], r["y_col"]): r
           for r in mutual_information(df, [("x", "y"), ("x", "z")]).collect()}
    assert got[("x", "y")]["mi"] == 0.0
    # constant column: zero entropy, nmi guarded to 0 (not NaN)
    assert got[("x", "z")]["h_y"] == 0.0 and got[("x", "z")]["nmi"] == 0.0
    import pytest as _pt
    with _pt.raises(ValueError, match="at least one"):
        mutual_information(df, [])


def test_mad_outliers_replay_and_degenerate_group(spark):
    import statistics

    from ratatool_spark.operators.profile import mad_outliers

    vals = [1.0, 2.0, 2.0, 3.0, 2.0, 2.0, 1.0, 3.0, 2.0, 100.0]
    rows = [("g", v) for v in vals] + [("h", 5.0)] * 5 + [("h", 6.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {(r["g"], r["v"], r["robust_z"], r["is_outlier"])
           for r in mad_outliers(df, "v", ["g"]).collect()}

    fx = [round(v * 10**6) for v in vals]
    med = statistics.median(fx)
    mad = statistics.median(abs(x - med) for x in fx)
    for v in set(vals):
        z = round(0.6745 * (round(v * 10**6) - med) / mad, 6)
        assert ("g", v, z, abs(z) > 3.5) in got
    # MAD = 0 group: z is NULL, off-median rows flagged
    assert ("h", 5.0, None, False) in got and ("h", 6.0, None, True) in got


def test_mad_outliers_global_and_approx_modes(spark):
    from ratatool_spark.operators.profile import mad_outliers

    df = spark.createDataFrame(
        [(float(v),) for v in list(range(100)) + [10**6]], "v double"
    )
    exact = mad_outliers(df, "v")          # no grouping: global median
    assert [r["is_outlier"] for r in exact.orderBy("v").collect()][-1] is True
    approx = mad_outliers(df, "v", approx=True)
    # sketch mode flags the same gross outlier
    assert [r["is_outlier"] for r in approx.orderBy("v").collect()][-1] is True


def test_drift_report_python_replay(spark):
    import math
    from collections import Counter

    from ratatool_spark.operators.profile import drift_report

    a_rows = [("x", 1.0)] * 50 + [("y", 2.0)] * 50
    b_rows = [("x", 1.0)] * 80 + [("y", 5.0)] * 20
    a = spark.createDataFrame(a_rows, "c string, v double")
    b = spark.createDataFrame(b_rows, "c string, v double")
    got = {r["column"]: r
           for r in drift_report(a, b, categorical=["c"], numeric=["v"],
                                 n_buckets=4).collect()}

    def psi(ca, cb, bins):
        na, nb, s, B = sum(ca.values()), sum(cb.values()), 0.5, len(bins)
        tot = 0.0
        for bin_ in bins:
            pa = (ca.get(bin_, 0) + s) / (na + s * B)
            pb = (cb.get(bin_, 0) + s) / (nb + s * B)
            tot += (pa - pb) * math.log(pa / pb)
        return round(tot, 6)

    ca, cb = Counter(r[0] for r in a_rows), Counter(r[0] for r in b_rows)
    assert got["c"]["psi"] == psi(ca, cb, {"x", "y"})
    # numeric: combined range [1,5], 4 equi-width buckets -> 1.0->0, 2.0->1, 5.0->3
    na = Counter({"0": 50, "1": 50})
    nb = Counter({"0": 80, "3": 20})
    assert got["v"]["psi"] == psi(na, nb, {"0", "1", "3"})
    assert got["v"]["n_bins"] == 3 and got["c"]["n_a"] == 100

    # identical snapshots -> exactly zero drift everywhere
    same = drift_report(a, a, categorical=["c"], numeric=["v"])
    assert {r["psi"] for r in same.collect()} == {0.0}


def test_drift_report_pinned_bounds(spark):
    """numeric_bounds pins the bin spec: clamping at the edges, no
    combined-min/max pass in the plan, and validation of bad input."""
    import pytest as _pt

    from ratatool_spark.operators.profile import drift_report

    a = spark.createDataFrame([(v,) for v in (0.0, 1.0, 2.0, 3.0)], "v double")
    b = spark.createDataFrame([(v,) for v in (2.0, 3.0, 99.0)], "v double")
    # bounds (1, 3), 2 buckets: 0.0 clamps into bucket 0, 99.0 into 1
    [row] = drift_report(
        a, b, numeric=["v"], n_buckets=2, numeric_bounds={"v": (1.0, 3.0)}
    ).collect()
    assert row["n_bins"] == 2 and row["n_a"] == 4 and row["n_b"] == 3
    # fully-pinned plan has NO broadcast range row: the only exchanges
    # are the bucket aggregates
    plan = drift_report(
        a, b, numeric=["v"], numeric_bounds={"v": (1.0, 3.0)}
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    # unpinned still carries the combined-range broadcast
    plan2 = drift_report(
        a, b, numeric=["v"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan2
    with _pt.raises(ValueError, match="hi > lo"):
        drift_report(a, b, numeric=["v"], numeric_bounds={"v": (3.0, 3.0)})
    with _pt.raises(ValueError, match="non-numeric"):
        drift_report(a, b, numeric=["v"], numeric_bounds={"w": (0.0, 1.0)})


def test_drift_report_top_k_pooling_and_validation(spark):
    import pytest as _pt

    from ratatool_spark.operators.profile import drift_report

    # 30 distinct tail values pool into __other__, keeping bins stable
    a = spark.createDataFrame(
        [("hot",)] * 50 + [(f"t{i}",) for i in range(30)], "c string"
    )
    b = spark.createDataFrame(
        [("hot",)] * 50 + [(f"u{i}",) for i in range(30)], "c string"
    )
    [row] = drift_report(a, b, categorical=["c"], top_k=5).collect()
    assert row["n_bins"] <= 11  # 5 kept per... combined top-5 + __other__ + ties
    # same tail MASS both sides: pooled drift stays small
    assert row["psi"] < 0.2
    with _pt.raises(ValueError, match="at least one"):
        drift_report(a, b)
