"""Sampling matrix tests — tolerances mirror the reference's CI envelopes
(BigSamplerTest.scala:481-832 / BASELINE.md): approx count ±2%-ish, strata
proportions ±0.05 approx / ±0.02 exact; exact mode audited at 1%."""

import pytest
from pyspark.sql import functions as F

from ratatool_spark.operators.sampler import (
    head_sample,
    reservoir_sample,
    sample,
)


def test_fraction_validation(lineitem):
    with pytest.raises(ValueError):
        sample(lineitem, 0.0)
    with pytest.raises(ValueError):
        sample(lineitem, 1.5)


def test_approx_random(lineitem):
    n = lineitem.count()
    out = sample(lineitem, 0.5, seed=42)
    assert abs(out.count() - n * 0.5) < n * 0.05


def test_approx_deterministic_repeatable(lineitem):
    a = sample(lineitem, 0.3, fields=["l_orderkey", "l_linenumber"], seed=42)
    b = sample(lineitem, 0.3, fields=["l_orderkey", "l_linenumber"], seed=42)
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    assert ra == rb
    n = lineitem.count()
    assert abs(len(ra) - n * 0.3) < n * 0.08  # det-field mode is wider (BigSamplerTest:516-542)


def test_full_fraction_keeps_everything(lineitem):
    assert sample(lineitem, 1.0, fields=["l_orderkey"], seed=1).count() == lineitem.count()


def test_stratified_approx_proportions(lineitem):
    out, audit = sample(
        lineitem, 0.5, strata=["l_returnflag"], seed=42, audit=True
    )
    tot = audit.total_out
    for _key, n_in, n_out, _t in audit.per_stratum:
        true_ratio = n_in / audit.total_in
        got_ratio = n_out / tot
        assert abs(got_ratio - true_ratio) < 0.05


def test_uniform_approx_equalizes(lineitem):
    out, audit = sample(
        lineitem, 0.2, strata=["l_returnflag"], uniform=True, seed=42, audit=True
    )
    counts = [n_out for _k, _n, n_out, _t in audit.per_stratum]
    # uniform: every stratum targets the same share (small strata capped)
    assert max(counts) - min(counts) < 0.15 * max(counts)


def test_exact_stratified_counts(lineitem):
    out, audit = sample(
        lineitem,
        0.1,
        fields=["l_orderkey", "l_linenumber"],
        strata=["l_returnflag"],
        exact=True,
        seed=42,
        audit=True,  # raises if off by >1% (SamplerSCollectionFunctions:79-92)
    )
    for _k, n_in, n_out, _t in audit.per_stratum:
        import math

        assert n_out == math.ceil(n_in * 0.1)


def test_exact_global_count(lineitem):
    import math

    n = lineitem.count()
    out = sample(lineitem, 0.25, exact=True, seed=42)
    assert out.count() == math.ceil(n * 0.25)


def test_exact_random_stratified(lineitem):
    out, audit = sample(
        lineitem, 0.2, strata=["l_linestatus"], exact=True, seed=7, audit=True
    )
    assert audit.total_error < 0.01 + 1e-9


def test_head(lineitem):
    assert head_sample(lineitem, 17).count() == 17


def test_reservoir_exact_n_and_deterministic(lineitem):
    a = reservoir_sample(lineitem, 100, seed=5)
    assert a.count() == 100
    b = reservoir_sample(lineitem, 100, seed=5)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_sample_preserves_schema(lineitem):
    out = sample(lineitem, 0.1, strata=["l_returnflag"], uniform=True, seed=42)
    assert out.columns == lineitem.columns
    out2 = sample(
        lineitem, 0.1, strata=["l_returnflag"], uniform=True, exact=True, seed=42
    )
    assert out2.columns == lineitem.columns


def test_weighted_sample_matches_driver_side_recompute(documents):
    """Deterministic weighted sample (u^(1/w), u = portable dice on
    doc_id) equals an exact driver-side recompute of the same formula."""
    import hashlib

    from pyspark.sql import functions as F

    from ratatool_spark.functions.text import token_count
    from ratatool_spark.operators.sampler import weighted_sample

    docs = documents.select(
        "doc_id", "text", (token_count(F.col("text")) + 1).alias("w")
    )
    got = [
        r["doc_id"]
        for r in weighted_sample(docs, 50, "w", fields=["doc_id"], seed=42)
        .select("doc_id")
        .collect()
    ]

    rows = docs.select("doc_id", "w").collect()
    space = float(1 << 60)

    def key(r):
        feed = "\x01".join(["42", str(r["doc_id"])])
        u = int(hashlib.md5(feed.encode()).hexdigest()[:15], 16) / space
        return u ** (1.0 / r["w"])

    want = [r["doc_id"] for r in sorted(rows, key=lambda r: (-key(r), r["doc_id"]))[:50]]
    assert set(got) == set(want)


def test_weighted_sample_excludes_nonpositive_and_favors_heavy(spark):
    from ratatool_spark.operators.sampler import weighted_sample

    rows = [(i, 100.0 if i < 10 else 0.01) for i in range(1000)] + [(9999, 0.0)]
    df = spark.createDataFrame(rows, "id long, w double")
    # statistical check over the rand path: heavy rows (10 of 1000) should
    # dominate a size-20 sample at 10000:1 weight ratio
    got = {r["id"] for r in weighted_sample(df, 20, "w", seed=7).collect()}
    assert 9999 not in got
    assert len(got & set(range(10))) == 10, "all heavy rows selected"


def test_exact_small_stratum_not_overfiltered(spark):
    """The Chernoff prefilter bound is per-stratum: a 50-row stratum next
    to a 100k-row one must still yield its exact ceil(n*f) target (a single
    bound derived from the max stratum count is the tightest of all bounds
    and starves small strata ~40% of the time)."""
    big = spark.range(100_000).select(
        F.lit("big").alias("g"), F.col("id").alias("v")
    )
    small = spark.range(50).select(
        F.lit("small").alias("g"), (F.col("id") + 200_000).alias("v")
    )
    out = sample(
        big.union(small), 0.1, fields=["v"], strata=["g"], exact=True, seed=7
    )
    counts = {r["g"]: r["n"] for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert counts["small"] == 5  # ceil(50 * 0.1)
    assert counts["big"] == 10_000


def test_exact_global_matches_single_reducer_topt(lineitem):
    """Distributed bucket-selection top-t returns exactly the t smallest
    rolls — identical rows to the single-reducer orderBy().limit() it
    replaced."""
    from ratatool_spark.functions.hashing import dice

    f = 0.07
    out = sample(lineitem, f, fields=["l_orderkey", "l_linenumber"], exact=True, seed=11)
    got = {
        (r["l_orderkey"], r["l_linenumber"])
        for r in out.select("l_orderkey", "l_linenumber").collect()
    }
    rolls = lineitem.select(
        "l_orderkey",
        "l_linenumber",
        dice([F.col("l_orderkey"), F.col("l_linenumber")], seed=11).alias("r"),
    ).collect()
    import math as m

    t = m.ceil(len(rolls) * f)
    exp = {
        (r["l_orderkey"], r["l_linenumber"])
        for r in sorted(rolls, key=lambda r: r["r"])[:t]
    }
    assert got == exp


def test_bootstrap_sample_deterministic_poisson(spark):
    """Deterministic field-hash bootstrap: stable across runs, replicate
    copies are 1..k, k respects the max_k cap, and the replicate total is
    within a loose Poisson envelope of rate * n."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.sampler import bootstrap_sample, poisson_thresholds

    from tests.conftest import SF_SMOKE

    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    n = orders.count()
    a = bootstrap_sample(orders, rate=1.0, fields=["o_orderkey"], seed=3)
    b = bootstrap_sample(orders, rate=1.0, fields=["o_orderkey"], seed=3)
    ca, cb = a.count(), b.count()
    assert ca == cb  # deterministic
    assert abs(ca - n) < 4 * (n ** 0.5) + 10  # E[total] = rate*n
    per = a.groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("k"), F.max("copy").alias("mx"), F.min("copy").alias("mn")
    )
    bad = per.where((F.col("mx") != F.col("k")) | (F.col("mn") != 1)).count()
    assert bad == 0  # copies are exactly 1..k per key
    assert per.agg(F.max("k")).collect()[0][0] <= 8  # max_k cap

    cum = poisson_thresholds(1.0, 8)
    assert len(cum) == 8 and all(cum[i] < cum[i + 1] for i in range(7))
    import math

    assert abs(cum[0] - math.exp(-1)) < 1e-15

    import pytest as _pt

    with _pt.raises(ValueError):
        poisson_thresholds(0.0)


def test_distributed_top_k_matches_orderby_limit(lineitem, spark):
    """Bucket/offset top-k is row-for-row identical to
    orderBy(desc_nulls_last(key), ties).limit(k) — including NULL keys
    (ordered last), value ties (share a bucket, id tie-break), k = 0,
    and k > n (returns everything)."""
    from ratatool_spark.operators.sampler import distributed_top_k

    # key with ties (l_quantity repeats heavily) and injected NULLs
    df = lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_orderkey") % 7 != 0, F.col("l_quantity"))
        .cast("double")
        .alias("key"),
    )
    n = df.count()
    for k in (0, 25, 500, n + 10):
        got = distributed_top_k(
            df, "key", ["l_orderkey", "l_linenumber"], k
        ).collect()
        exp = (
            df.orderBy(
                F.desc_nulls_last("key"), "l_orderkey", "l_linenumber"
            )
            .limit(k)
            .collect()
        )
        key_of = lambda r: (  # noqa: E731
            r["key"] is None,
            -(r["key"] or 0.0),
            r["l_orderkey"],
            r["l_linenumber"],
        )
        assert sorted(got, key=key_of) == sorted(exp, key=key_of), k
        assert len(got) == min(k, n)


def test_dsir_select_large_path_no_single_point_merge(documents, spark):
    """dsir_select past small_k_threshold routes through
    distributed_top_k: same selected set as the orderBy+limit path, and
    the selecting plan carries no TakeOrderedAndProject over it."""
    from ratatool_spark.operators.corpus import build_token_freqs, dsir_select

    tf = build_token_freqs(documents.where(F.col("lang") == "en"))
    rf = build_token_freqs(documents)
    small = dsir_select(documents, tf, rf, 60, seed=0)
    large = dsir_select(documents, tf, rf, 60, seed=0, small_k_threshold=0)
    assert "TakeOrderedAndProject" not in (
        large._jdf.queryExecution().executedPlan().toString()
    )
    ids = lambda df: sorted(r["doc_id"] for r in df.collect())  # noqa: E731
    assert ids(large) == ids(small)


# ------------------------------------------------ Neyman allocation


def test_sample_neyman_budget_and_variance_weighting(spark):
    """Total budget exact; the high-variance stratum gets more than its
    proportional share; determinism across runs."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.sampler import sample_neyman

    rows = [("lo", i, float(100)) for i in range(500)] + [
        ("hi", i, float(i % 100) * 50.0) for i in range(500)
    ]
    df = spark.createDataFrame(rows, "g string, k long, v double")
    out = sample_neyman(
        df, total_n=100, value_col="v", strata=["g"], fields=["g", "k"]
    )
    counts = {
        r["g"]: r["c"]
        for r in out.groupBy("g").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    # 'lo' is constant (S=0): everything goes to 'hi'
    assert counts.get("hi", 0) == 100 and counts.get("lo", 0) == 0
    again = sample_neyman(
        df, total_n=100, value_col="v", strata=["g"], fields=["g", "k"]
    )
    assert sorted((r["g"], r["k"]) for r in out.collect()) == sorted(
        (r["g"], r["k"]) for r in again.collect()
    )


def test_sample_neyman_zero_variance_falls_back_proportional(spark):
    from pyspark.sql import functions as F

    from ratatool_spark.operators.sampler import sample_neyman

    rows = [("a", i, 1.0) for i in range(300)] + [
        ("b", i, 2.0) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "g string, k long, v double")
    out = sample_neyman(
        df, total_n=40, value_col="v", strata=["g"], fields=["g", "k"]
    )
    counts = {
        r["g"]: r["c"]
        for r in out.groupBy("g").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert counts == {"a": 30, "b": 10}  # proportional 3:1


def test_sample_neyman_caps_at_stratum_size(spark):
    from ratatool_spark.operators.sampler import sample_neyman

    rows = [("tiny", i, float(i)) for i in range(3)] + [
        ("big", i, float(i * i % 37)) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "g string, k long, v double")
    out = sample_neyman(
        df, total_n=50, value_col="v", strata=["g"], fields=["g", "k"]
    ).collect()
    from collections import Counter

    c = Counter(r["g"] for r in out)
    assert c["tiny"] <= 3 and sum(c.values()) <= 50


def test_sample_neyman_validates(spark):
    import pytest as _pt

    from ratatool_spark.operators.sampler import sample_neyman

    df = spark.createDataFrame([("a", 1, 1.0)], "g string, k long, v double")
    with _pt.raises(ValueError, match="total_n"):
        sample_neyman(df, -1, "v", ["g"], ["k"])
    with _pt.raises(ValueError, match="strata and dice"):
        sample_neyman(df, 1, "v", [], ["k"])


def test_partition_offsets_null_sums_treated_as_zero(spark):
    """partition_offsets is fed SUMs by compaction_plan; a partition
    whose size values are all NULL aggregates to NULL and must
    contribute 0, not TypeError (r10 ADVICE)."""
    from ratatool_spark.functions.ranks import partition_offsets

    per_pid = spark.createDataFrame(
        [(0, 5), (1, None), (2, 3)], "pid int, n long"
    )
    offs, total = partition_offsets(
        per_pid, pid_col="pid", n_col="n", with_total=True
    )
    got = {r["pid"]: r["__off"] for r in offs.collect()}
    assert got == {0: 0, 1: 5, 2: 5} and total == 8


def test_uniform_totals_include_null_strata_single_scan(spark):
    """The uniform popPerKey scalar (total*f/nKeys) is fused into the plan
    as an unpartitioned window over the counts table (r11 optimization).
    Two invariants of the replaced collect-then-literal form must hold:
    (1) NULL strata still count toward total AND nKeys (the inferred
    join-key IsNotNull must not push below the window); (2) the input is
    scanned at most twice per query (counts + main), not three times."""
    rows = [(i, None if i % 5 == 0 else f"s{i % 3}") for i in range(1000)]
    df = spark.createDataFrame(rows, "id int, grp string")
    out = sample(df, 0.5, fields=["id"], strata=["grp"], uniform=True,
                 exact=True, seed=42)
    got = {r["grp"]: r["count"] for r in out.groupBy("grp").count().collect()}
    # pop = total*f/nk = 1000*0.5/4 (NULL stratum counts as a key) = 125;
    # with nk=3 (NULL dropped) it would be ceil(500/3)=167 per stratum.
    assert got == {"s0": 125, "s1": 125, "s2": 125}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") <= 2
