"""Streaming tests: batch/stream plan parity + a real Structured Streaming
run through the file source and parquet sink (availableNow trigger)."""

import pytest
from pyspark.sql import functions as F

from ratatool_spark.sources.io import load_tables
from ratatool_spark.streaming.events import (
    parse_props,
    read_event_stream,
    sessionize,
    windowed_event_stats,
    write_stream_to_parquet,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return load_tables(spark, SF, names=("events",))["events"].cache()


def test_windowed_counts_sum_to_total(events):
    out = windowed_event_stats(events, window="1 hour")
    assert out.agg(F.sum("n_events")).collect()[0][0] == events.count()


def test_sliding_window(events):
    tumbling = windowed_event_stats(events, window="2 hours")
    sliding = windowed_event_stats(events, window="2 hours", slide="1 hour")
    # each event lands in exactly 2 sliding windows
    assert (
        sliding.agg(F.sum("n_events")).collect()[0][0]
        == 2 * tumbling.agg(F.sum("n_events")).collect()[0][0]
    )


def test_sessionize_conservation(events):
    s = sessionize(events, gap="30 minutes")
    assert s.agg(F.sum("n_events")).collect()[0][0] == events.count()
    r = s.limit(10).collect()
    for row in r:
        assert row["first_ts"] <= row["last_ts"]


def test_sessionize_gap_merges(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 1.0),
        (1, base + dt.timedelta(minutes=10), 1.0),  # same session
        (1, base + dt.timedelta(minutes=50), 1.0),  # 40min gap -> new session
        (2, base, 1.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    s = sessionize(df, gap="30 minutes").collect()
    per_user = {}
    for r in s:
        per_user.setdefault(r["user_id"], []).append(r["n_events"])
    assert sorted(per_user[1]) == [1, 2]
    assert per_user[2] == [1]


def test_parse_props(events):
    out = parse_props(events).select("props_k").where(F.col("props_k").isNotNull())
    assert out.count() > 0


def test_real_stream_run(spark, tmp_path):
    """End-to-end Structured Streaming: file source → windowed agg →
    parquet sink, availableNow trigger, results equal the batch run."""
    stream = read_event_stream(spark, f"{SF}/events.parquet")
    assert stream.isStreaming
    agg = windowed_event_stats(stream, window="6 hours", watermark="1 hour")
    q = write_stream_to_parquet(
        agg,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "out"))
    batch = windowed_event_stats(
        load_tables(spark, SF, names=("events",))["events"], window="6 hours"
    )
    g = {tuple(r) for r in got.select("window_start", "event_type", "n_events").collect()}
    b = {tuple(r) for r in batch.select("window_start", "event_type", "n_events").collect()}
    # append mode only emits *finalized* windows (watermark passed); windows
    # still open at end-of-stream are withheld — correct streaming semantics
    assert g <= b
    assert len(g) >= 0.9 * len(b)
    # every finalized window agrees exactly with the batch ground truth
    open_windows = b - g
    assert all(w[0] >= max(x[0] for x in g) for w in open_windows)

def test_ewma_batch_matches_pandas(events):
    """Batch EWMA equals the plain-pandas recurrence per user."""
    from ratatool_spark.streaming.stateful import ewma_by_key

    sub = events.where(F.col("user_id") < 20).select("user_id", "ts", "value")
    got = ewma_by_key(sub, alpha=0.4).toPandas()
    pdf = sub.toPandas()
    for uid, g in pdf.groupby("user_id"):
        g = g.sort_values("ts")
        prev, exp = None, []
        for v in g["value"]:
            prev = float(v) if prev is None else 0.4 * float(v) + 0.6 * prev
            exp.append(prev)
        mine = got[got["user_id"] == uid].sort_values("ts")["ewma"].tolist()
        assert mine == pytest.approx(exp), uid


def test_ewma_stateful_stream_matches_batch(spark, tmp_path):
    """Real applyInPandasWithState run (availableNow over the file source)
    produces the same final EWMA per user as the batch oracle when each
    user's rows arrive in one ordered partition stream."""
    from ratatool_spark.streaming.stateful import ewma_by_key

    batch = load_tables(spark, SF, names=("events",))["events"].where(
        F.col("user_id") < 50
    )
    # single ordered file => in-order per-key delivery, the streaming contract
    src = str(tmp_path / "src")
    batch.orderBy("ts").coalesce(1).write.parquet(src)

    stream = read_event_stream(spark, src, max_files_per_trigger=1)
    out = ewma_by_key(stream, alpha=0.3)
    q = (
        out.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "out"))
    want = ewma_by_key(spark.read.parquet(src), alpha=0.3)
    # compare the LAST ewma per user (the carried state)
    last = lambda df: {  # noqa: E731
        r["user_id"]: round(r["ewma"], 9)
        for r in df.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("user_id")
                .orderBy(F.desc("ts"))
            ),
        )
        .where(F.col("rn") == 1)
        .collect()
    }
    assert last(got) == last(want)


def test_stream_exact_dedup_matches_batch(spark, tmp_path):
    """Streaming first-occurrence dedup (dropDuplicatesWithinWatermark)
    admits exactly the batch-distinct set when input fits one horizon."""
    from ratatool_spark.streaming.dedup import stream_exact_dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(200)
    ev = load_tables(spark, SF, names=("events",))["events"].limit(400)
    # duplicated corpus with event times attached (each text twice)
    base = (
        docs.join(ev.select("ts"), how="cross")
        .limit(400)
        .select("ts", "text")
    )
    src = str(tmp_path / "src")
    base.unionByName(base).coalesce(1).write.parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .parquet(src)
    )
    out = stream_exact_dedup(stream, watermark="10 seconds")
    q = (
        out.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "out"))
    want = stream_exact_dedup(spark.read.parquet(src))
    assert got.count() == want.count()
    assert {r["text"] for r in got.collect()} == {
        r["text"] for r in want.collect()
    }


def test_sampler_is_stream_batch_agnostic(spark, tmp_path):
    """SA2 (deterministic hash dice) is stateless, so the same sample()
    call runs on a readStream and selects the identical cohort as batch —
    membership is a pure function of the record."""
    from ratatool_spark.operators.sampler import sample

    src = f"{SF}/events.parquet"
    batch_schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(batch_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(SF)
    )
    sampled = sample(stream, 0.2, fields=["event_id"], seed=7)
    assert sampled.isStreaming
    q = (
        sampled.select("event_id")
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r[0] for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    want = {
        r[0]
        for r in sample(
            spark.read.parquet(src), 0.2, fields=["event_id"], seed=7
        )
        .select("event_id")
        .collect()
    }
    assert got == want


# ---- hierarchical time rollup (operators/timeagg.py) ----


def test_time_rollup_reaggregation_matches_direct(spark, events):
    """The day grain computed from hour partials equals a direct day
    aggregate over the fact table (decimal sums are associative)."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.timeagg import time_rollup

    rolled = time_rollup(events, grains=("hour", "day"))
    day_rolled = {
        r["bucket"]: (r["n_events"], r["sum_value"], r["min_value"], r["max_value"])
        for r in rolled.where(F.col("grain") == "day").collect()
    }
    direct = {
        r["bucket"]: (r["n_events"], r["sum_value"], r["min_value"], r["max_value"])
        for r in events.groupBy(F.date_trunc("day", "ts").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,6)")).cast("decimal(38,6)").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .collect()
    }
    assert day_rolled == direct


def test_time_rollup_reuses_fine_grain_exchange(spark):
    """Over a file scan (the 100 TB case), the fine-grain aggregate
    exchange appears once; coarser grains consume it via ReusedExchange
    instead of rescanning. (A cached input splits the adaptive plan at
    the cache stage and skips the reuse — but then the rescan is the
    in-memory cache, which is the already-amortized case.)"""
    from ratatool_spark.operators.timeagg import time_rollup

    # A projection distinct from the cached fixture's plan — the
    # CacheManager substitutes InMemoryTableScan for any matching subtree,
    # which would split the adaptive plan and mask the reuse under test.
    from pyspark.sql import types as T

    raw = spark.read.parquet(f"{SF}/events.parquet")
    ts = (
        F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        if isinstance(raw.schema["ts"].dataType, T.LongType)
        else F.col("ts").cast("timestamp")
    )
    ev = raw.select(ts.alias("ts"), "value")
    df = time_rollup(ev, grains=("hour", "day"))
    df.collect()  # AQE only materializes ReusedExchange in the final plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    final_section = plan.split("== Initial Plan ==")[0]
    assert "ReusedExchange" in final_section
    assert final_section.count("FileScan parquet") == 1


def test_time_rollup_validates_grain_order(spark, events):
    import pytest

    from ratatool_spark.operators.timeagg import time_rollup

    with pytest.raises(ValueError):
        time_rollup(events, grains=("day", "hour"))
    with pytest.raises(ValueError):
        time_rollup(events, grains=("fortnight",))


def test_distinct_rollup_union_matches_direct_sketch(spark, events):
    """Day-grain estimate from unioned hour sketches equals sketching the
    day directly (HLL register union is exact), and tracks the true
    distinct count within HLL error (~2% at lg_k=12)."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.timeagg import distinct_rollup

    rolled = {
        r["bucket"]: r["n_distinct"]
        for r in distinct_rollup(events, grains=("hour", "day"))
        .where(F.col("grain") == "day")
        .collect()
    }
    direct = {
        r["bucket"]: r["n_distinct"]
        for r in events.groupBy(F.date_trunc("day", "ts").alias("bucket"))
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col("user_id"), F.lit(12))
            ).alias("n_distinct")
        )
        .collect()
    }
    assert rolled == direct
    exact = {
        r["bucket"]: r["n"]
        for r in events.groupBy(F.date_trunc("day", "ts").alias("bucket"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for b, est in rolled.items():
        assert abs(est - exact[b]) <= max(2, 0.05 * exact[b])


def test_ewma_custom_column_names(events):
    """Output schema follows the caller's column names (a hardcoded
    user_id/ts/value StructType silently renamed them before)."""
    from ratatool_spark.streaming.stateful import ewma_by_key

    sub = (
        events.where(F.col("user_id") < 5)
        .select(
            F.col("user_id").alias("k"),
            F.col("ts").alias("t"),
            F.col("value").alias("x"),
        )
    )
    out = ewma_by_key(sub, alpha=0.4, key_col="k", ts_col="t", value_col="x")
    assert out.columns == ["k", "t", "x", "ewma"]
    assert out.count() == sub.count()


def test_corpus_filters_are_stream_batch_agnostic(spark, tmp_path):
    """assign_splits + redact_pii are stateless column expressions, so the
    identical call runs on a readStream and assigns the same splits /
    redactions as batch — corpus curation composes onto live ingest."""
    from pyspark.sql import functions as F

    from ratatool_spark.functions.text import redact_pii
    from ratatool_spark.operators.corpus import assign_splits

    src_dir = "/root/testdata/sf0.001"
    batch = spark.read.parquet(f"{src_dir}/documents.parquet")
    stream = (
        spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(src_dir)
    )
    w = {"train": 0.9, "val": 0.1}

    def curate(df):
        return assign_splits(df, w, seed=4).select(
            "doc_id", "split", redact_pii(F.col("text")).alias("clean")
        )

    out = curate(stream)
    assert out.isStreaming
    q = (
        out.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "out"))
    expected = curate(batch)
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_funnel_stage_stream_matches_batch(spark, tmp_path):
    """Live funnel state machine (applyInPandasWithState) reaches the same
    per-user depth as the batch sequential-min funnel, across multiple
    micro-batches carrying state."""
    from ratatool_spark.operators.funnels import funnel
    from ratatool_spark.streaming.funnel_stream import funnel_stage_stream

    steps = ["view", "click", "purchase"]
    batch = load_tables(spark, SF, names=("events",))["events"].where(
        F.col("user_id") < 40
    )
    src = str(tmp_path / "src")
    batch.orderBy("ts").coalesce(1).write.parquet(src)

    stream = read_event_stream(spark, src, max_files_per_trigger=1)
    out = funnel_stage_stream(stream, steps)
    q = (
        out.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "out"))
    stream_depth = {
        r["user_id"]: r["d"]
        for r in got.groupBy("user_id").agg(F.max("stage").alias("d")).collect()
    }

    per_user = funnel(spark.read.parquet(src), steps)
    batch_depth = {}
    for r in per_user.collect():
        d = 0
        for i in range(len(steps)):
            if r[f"ts_{i}"] is not None:
                d = i + 1
        batch_depth[r["user_id"]] = d
    # batch emits rows only for users who reached step 0 — same keys
    assert stream_depth == {u: d for u, d in batch_depth.items() if d > 0}

    # batch mode of the same operator agrees too (applyInPandas path)
    bmode = funnel_stage_stream(spark.read.parquet(src), steps)
    bdepth = {
        r["user_id"]: r["d"]
        for r in bmode.groupBy("user_id").agg(F.max("stage").alias("d")).collect()
    }
    assert bdepth == stream_depth


def test_funnel_stream_multi_chunk_groups_stay_ordered(spark, tmp_path):
    """One key's micro-batch can arrive as SEVERAL Arrow chunks that are
    not mutually time-ordered; the state machine must sort the whole
    group, not each chunk (r3 advice finding). Forced here by a 3-row
    maxRecordsPerBatch over a deliberately reverse-ordered file."""
    from ratatool_spark.streaming.funnel_stream import funnel_stage_stream

    steps = ["a", "b", "c"]
    rows = [(1, float(t), e) for t, e in enumerate(["a", "b", "c", "x", "x", "x", "x", "x"])]
    df = spark.createDataFrame(rows, "user_id int, ts double, event_type string")
    src = str(tmp_path / "src")
    # write the file in REVERSE time order so the first Arrow chunk holds
    # the latest events
    df.orderBy(F.desc("ts")).coalesce(1).write.parquet(src)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        stream = (
            spark.readStream.schema(df.schema).parquet(src)
        )
        out = funnel_stage_stream(stream, steps)
        q = (
            out.writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.read.parquet(str(tmp_path / "out")).collect()
        # all three stages must advance despite the chunk split
        assert sorted((r["stage"], r["ts"]) for r in got) == [
            (1, 0.0),
            (2, 1.0),
            (3, 2.0),
        ]
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_observe_checks_duplicate_label_raises(spark):
    """Two same-kind checks on one column would collide in the Observation
    metrics map — must raise instead of silently dropping one (r3 advice)."""
    import pytest as _pytest

    from ratatool_spark.operators.checks import observe_checks

    df = spark.range(5).select(F.col("id").cast("double").alias("v"))
    checks = [
        {"kind": "in_range", "col": "v", "lo": 0, "hi": 10},
        {"kind": "in_range", "col": "v", "lo": 2, "hi": 3},
    ]
    with _pytest.raises(ValueError, match="duplicate check label"):
        observe_checks(df, checks)
    # distinct explicit names are fine
    checks[1]["name"] = "v_band2"
    _df, obs = observe_checks(df, checks)
    _df.collect()
    assert obs.get["v_band2"] == 3  # ids 0,1,4 outside [2,3]


def test_rollup_rejects_non_nesting_week_chain(spark):
    import pytest as _pt

    from ratatool_spark.operators.timeagg import (
        distinct_rollup_exact,
        time_rollup,
    )
    from ratatool_spark.sources.io import load_tables

    ev = load_tables(spark, SF, names=("events",))["events"]
    with _pt.raises(ValueError, match="week"):
        time_rollup(ev, grains=("day", "week", "month"))
    with _pt.raises(ValueError, match="week"):
        distinct_rollup_exact(ev, grains=("week", "month"))
    with _pt.raises(ValueError, match="unknown grain"):
        distinct_rollup_exact(ev, grains=("hour", "decade"))
    # week as the coarsest grain stays legal
    assert time_rollup(ev, grains=("day", "week")).count() > 0


def test_distinct_sketch_artifact_roundtrip(spark, tmp_path):
    """Persisted HLL sketch tables: save two batches, merge, estimate —
    the merged estimate must EQUAL sketching the concatenated batches
    directly (register union is lossless at a common lg_k), and land
    within the HLL error envelope of the exact count."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.timeagg import (
        build_distinct_sketches,
        estimate_distinct,
        load_distinct_sketches,
        merge_distinct_sketches,
        save_distinct_sketches,
    )
    from ratatool_spark.sources.io import load_tables

    ev = load_tables(spark, SF, names=("events",))["events"]
    batch_a = ev.where(F.col("event_id") % 2 == 0)
    batch_b = ev.where(F.col("event_id") % 2 == 1)
    pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
    save_distinct_sketches(batch_a, pa, ["event_type"], "user_id")
    save_distinct_sketches(batch_b, pb, ["event_type"], "user_id")

    merged = merge_distinct_sketches(
        load_distinct_sketches(spark, pa), load_distinct_sketches(spark, pb)
    )
    est = {
        r["event_type"]: r["n_distinct"]
        for r in estimate_distinct(merged).collect()
    }
    direct = {
        r["event_type"]: r["n_distinct"]
        for r in estimate_distinct(
            build_distinct_sketches(ev, ["event_type"], "user_id")
        ).collect()
    }
    assert est == direct  # lossless merge
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(est[k] - n) <= max(3, 0.05 * n), (k, est[k], n)


def test_distinct_sketch_merge_rejects_mixed_lg_k(spark, tmp_path):
    import pytest as _pt
    from pyspark.sql import functions as F  # noqa: F401

    from ratatool_spark.operators.timeagg import (
        build_distinct_sketches,
        estimate_distinct,
        merge_distinct_sketches,
    )
    from ratatool_spark.sources.io import load_tables

    ev = load_tables(spark, SF, names=("events",))["events"]
    a = build_distinct_sketches(ev, ["event_type"], "user_id", lg_k=12)
    b = build_distinct_sketches(ev, ["event_type"], "user_id", lg_k=13)
    with _pt.raises(Exception, match="(?i)lgconfigk|union"):
        estimate_distinct(merge_distinct_sketches(a, b)).collect()


def test_quantile_sketch_merge_lossless_and_plan(spark):
    """KMV quantile sketch tables: merge-then-estimate must EQUAL the
    direct single-build estimate bit-for-bit (bottom-k of a union ==
    bottom-k of concatenated bottom-ks), sit within the k-sample error
    envelope of exact quantiles, and the build's row_number filter must
    compile to WindowGroupLimit (per-map-task top-k heap — the shape that
    keeps the exchange at O(k·partitions) instead of the fact table)."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.timeagg import (
        build_quantile_sketches,
        estimate_quantiles,
        merge_quantile_sketches,
    )
    from ratatool_spark.sources.io import load_tables

    ev = load_tables(spark, SF, names=("events",))["events"].select(
        "event_id", "event_type", "value"
    )
    a = ev.where(F.col("event_id") % 2 == 0)
    b = ev.where(F.col("event_id") % 2 == 1)
    build = lambda d: build_quantile_sketches(  # noqa: E731
        d, ["event_type"], "value", ["event_id"], k=256
    )
    qs = [0.25, 0.5, 0.9]
    merged_est = {
        r["event_type"]: (r["q_25"], r["q_50"], r["q_90"])
        for r in estimate_quantiles(
            merge_quantile_sketches(build(a), build(b)), qs
        ).collect()
    }
    direct_est = {
        r["event_type"]: (r["q_25"], r["q_50"], r["q_90"])
        for r in estimate_quantiles(build(ev), qs).collect()
    }
    assert merged_est == direct_est  # lossless merge, exact equality
    # accuracy envelope vs exact quantiles: se ~ sqrt(q(1-q)/k) of the
    # value RANGE is loose; compare on rank error instead via percentile
    exact = {
        r["event_type"]: r["qs"]
        for r in ev.groupBy("event_type")
        .agg(F.percentile("value", qs).alias("qs"))
        .collect()
    }
    for et, (e25, e50, e90) in merged_est.items():
        x25, x50, x90 = exact[et]
        spread = max(x90 - x25, 1e-9)
        for got, want in [(e25, x25), (e50, x50), (e90, x90)]:
            assert abs(got - want) <= 0.15 * spread, (et, got, want)
    # plan shape: the top-k filter compiles to WindowGroupLimit
    plan = build(ev)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_quantile_sketch_merge_rejects_mixed_k(spark):
    import pytest as _pt
    from pyspark.sql import functions as F  # noqa: F401

    from ratatool_spark.operators.timeagg import (
        build_quantile_sketches,
        merge_quantile_sketches,
    )
    from ratatool_spark.sources.io import load_tables

    ev = load_tables(spark, SF, names=("events",))["events"]
    a = build_quantile_sketches(ev, ["event_type"], "value", ["event_id"], k=64)
    b = build_quantile_sketches(ev, ["event_type"], "value", ["event_id"], k=128)
    with _pt.raises(Exception, match="mismatched k"):
        merge_quantile_sketches(a, b).collect()


def test_stream_filter_against_matches_batch(spark, tmp_path):
    """Streaming ingest gate == batch filter_against on the same input,
    including with a precomputed corpus signature table."""
    from ratatool_spark.operators.dedup import filter_against, save_signatures
    from ratatool_spark.streaming.dedup import stream_filter_against

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    corpus = docs.where(docs.doc_id % 2 == 0)
    # new batch: half fresh docs, half exact copies of corpus docs
    fresh = docs.where(docs.doc_id % 2 == 1).limit(40)
    copies = corpus.limit(20).select(
        (docs.doc_id + 500000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    new = fresh.unionByName(copies)
    src = str(tmp_path / "src")
    new.coalesce(2).write.parquet(src)

    sig_path = str(tmp_path / "sigs")
    save_signatures(corpus, sig_path)
    from ratatool_spark.operators.dedup import load_signatures

    sigs, meta = load_signatures(spark, sig_path)

    stream = spark.readStream.schema(new.schema).parquet(src)
    q = stream_filter_against(
        stream,
        corpus,
        output_path=str(tmp_path / "out"),
        checkpoint=str(tmp_path / "ckpt"),
        corpus_sigs=sigs,
        threshold=0.7,
    )
    assert q.awaitTermination(180), "stream did not finish within timeout"

    out_df = spark.read.parquet(str(tmp_path / "out"))
    assert "batch_id" in out_df.columns  # idempotent per-batch sink layout
    got = {r["doc_id"] for r in out_df.collect()}
    want = {
        r["doc_id"]
        for r in filter_against(
            spark.read.parquet(src), corpus, threshold=0.7, corpus_sigs=sigs
        ).collect()
    }
    assert got == want
    # every exact corpus copy rejected; some genuinely-fresh docs admitted
    # (a few odd docs legitimately near-match even corpus docs in the
    # synthetic table, so admitted ⊊ fresh)
    assert not any(d >= 500000 for d in got)
    assert got and got < {r["doc_id"] for r in new.collect()}


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """The watermarked stream-stream interval join produces exactly the
    batch join's row multiset on the same files — and the streaming plan
    really is a stream-stream join (state bounded by the time-range
    condition), not a static shortcut."""
    from pyspark.sql import functions as F

    from ratatool_spark.streaming.events import interval_join

    ev = load_tables(spark, SF, names=("events",))["events"].limit(600)
    left = ev.where(F.col("event_type") == "view").select("user_id", "ts", "value")
    right = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    left.coalesce(1).write.parquet(lsrc)
    right.coalesce(1).write.parquet(rsrc)

    want = interval_join(
        spark.read.parquet(lsrc), spark.read.parquet(rsrc), lag="30 minutes"
    )
    w = sorted(map(tuple, want.collect()))
    assert w, "fixture must produce at least one joined pair"

    ls = spark.readStream.schema(left.schema).parquet(lsrc)
    rs = spark.readStream.schema(right.schema).parquet(rsrc)
    q = (
        interval_join(ls, rs, lag="30 minutes")
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = sorted(
        map(tuple, spark.read.parquet(str(tmp_path / "out")).select(*want.columns).collect())
    )
    assert got == w


def test_interval_join_outer_keys_never_null(spark):
    """fullOuter surfaces unmatched rows from both sides with their own
    key (coalesced), never NULL for a known row."""
    import datetime as dt

    from ratatool_spark.streaming.events import interval_join

    base = dt.datetime(2024, 1, 1, 12, 0)
    left = spark.createDataFrame(
        [(1, base, 1.0)], "user_id long, ts timestamp, value double"
    )
    right = spark.createDataFrame(
        [
            (1, base - dt.timedelta(minutes=2), 100),  # matches
            (2, base, 200),  # unmatched right: own key must survive
        ],
        "user_id long, ts timestamp, event_id long",
    )
    rows = interval_join(left, right, lag="5 minutes", how="fullOuter").collect()
    keys = sorted(r["user_id"] for r in rows)
    assert keys == [1, 2]
    assert all(r["user_id"] is not None for r in rows)


def test_rollup_from_partials_equals_direct(spark):
    """Incremental continuous aggregate: per-batch hour partials merged +
    laddered == time_rollup over the concatenated batches, bit-exact
    (decimal sums, idempotent min/max). Also the ValueError guards."""
    import pytest as _pt
    from pyspark.sql import functions as F

    from ratatool_spark.operators.timeagg import (
        build_rollup_partial,
        rollup_from_partials,
        time_rollup,
    )
    from ratatool_spark.sources.io import load_tables

    ev = load_tables(spark, SF, names=("events",))["events"]
    a = build_rollup_partial(ev.where(F.col("event_id") % 3 == 0), grain="hour")
    b = build_rollup_partial(ev.where(F.col("event_id") % 3 == 1), grain="hour")
    c = build_rollup_partial(ev.where(F.col("event_id") % 3 == 2), grain="hour")
    inc = {
        (r["grain"], r["bucket"]): (
            r["n_events"],
            r["sum_value"],
            r["min_value"],
            r["max_value"],
        )
        for r in rollup_from_partials([a, b, c], grains=("hour", "day")).collect()
    }
    direct = {
        (r["grain"], r["bucket"]): (
            r["n_events"],
            r["sum_value"],
            r["min_value"],
            r["max_value"],
        )
        for r in time_rollup(ev, grains=("hour", "day")).collect()
    }
    assert inc == direct and len(direct) > 10
    with _pt.raises(ValueError, match="at least one"):
        rollup_from_partials([], grains=("hour",))
    with _pt.raises(ValueError, match="unknown grain"):
        build_rollup_partial(ev, grain="fortnight")


def test_grouped_split_no_leakage(spark):
    """assign_splits diced on a GROUP column sends every row of a group
    to one split (the contamination guard shape)."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.corpus import assign_splits

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = assign_splits(
        docs, {"train": 0.8, "val": 0.1, "test": 0.1}, dice_cols=("source",), seed=5
    )
    spans = (
        out.groupBy("source")
        .agg(F.countDistinct("split").alias("k"))
        .where(F.col("k") > 1)
        .count()
    )
    assert spans == 0
    # and with multiple sources, more than one split is actually used
    assert out.select("split").distinct().count() >= 2


def test_stream_quantile_sketches_match_batch(spark, tmp_path):
    """Per-micro-batch KMV sketch partials merged at read equal the batch
    build over the whole input — the streaming sketch-maintenance loop,
    run for real (multi-batch file stream, availableNow)."""
    from ratatool_spark.operators.timeagg import (
        build_quantile_sketches,
        estimate_quantiles,
    )
    from ratatool_spark.streaming.events import read_event_stream
    from ratatool_spark.streaming.sketches import (
        read_stream_quantile_sketches,
        stream_quantile_sketches,
    )

    ev = load_tables(spark, SF, names=("events",))["events"].select(
        "event_id", "ts", "event_type", "value"
    )
    src = str(tmp_path / "src")
    ev.repartition(4).write.parquet(src)  # several files -> several batches
    stream = read_event_stream(spark, src, max_files_per_trigger=1)

    q = stream_quantile_sketches(
        stream.select("event_id", "event_type", "value"),
        str(tmp_path / "sk"),
        str(tmp_path / "ckpt"),
        group_cols=["event_type"],
        value_col="value",
        key_cols=["event_id"],
        k=128,
    )
    q.awaitTermination(120)

    merged = read_stream_quantile_sketches(spark, str(tmp_path / "sk"))
    got = {
        r["event_type"]: (r["q_50"], r["q_90"])
        for r in estimate_quantiles(merged, [0.5, 0.9]).collect()
    }
    want = {
        r["event_type"]: (r["q_50"], r["q_90"])
        for r in estimate_quantiles(
            build_quantile_sketches(
                ev, ["event_type"], "value", ["event_id"], k=128
            ),
            [0.5, 0.9],
        ).collect()
    }
    assert got == want and len(got) > 1


def test_set_overlap_sketch_lossless_exact_smallset_and_estimates(spark):
    """KMV set sketches: merge-then-estimate == direct-build estimate
    (lossless bottom-k union); with k >= true cardinality the 'estimate'
    IS the exact jaccard/intersection; with k below it, estimates land
    within the KMV error envelope."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.timeagg import (
        build_set_sketches,
        merge_set_sketches,
        set_overlap_estimates,
    )
    from ratatool_spark.sources.io import load_tables

    ev = load_tables(spark, SF, names=("events",))["events"].select(
        "event_id", "event_type", "user_id"
    )
    a = ev.where(F.col("event_id") % 2 == 0)
    b = ev.where(F.col("event_id") % 2 == 1)

    def est_map(sketch):
        return {
            (r["ga"]["event_type"], r["gb"]["event_type"]): (
                round(r["est_jaccard"], 9),
                round(r["est_intersection"], 6),
            )
            for r in set_overlap_estimates(sketch).collect()
        }

    for k in (64, 4096):
        merged = merge_set_sketches(
            build_set_sketches(a, ["event_type"], "user_id", k=k),
            build_set_sketches(b, ["event_type"], "user_id", k=k),
        )
        direct = build_set_sketches(ev, ["event_type"], "user_id", k=k)
        assert est_map(merged) == est_map(direct)  # lossless merge

    # exact ground truth per pair
    users = {
        r["event_type"]: set()
        for r in ev.select("event_type").distinct().collect()
    }
    for r in ev.select("event_type", "user_id").distinct().collect():
        users[r["event_type"]].add(r["user_id"])
    exact = {}
    for ta in users:
        for tb in users:
            if ta < tb:
                i = len(users[ta] & users[tb])
                u = len(users[ta] | users[tb])
                exact[(ta, tb)] = (i / u, i)

    # k above every cardinality: estimates are EXACT
    big = est_map(build_set_sketches(ev, ["event_type"], "user_id", k=4096))
    for pair, (ej, ei) in big.items():
        assert ej == pytest.approx(exact[pair][0], abs=1e-9), pair
        assert ei == pytest.approx(exact[pair][1], rel=1e-9), pair

    # k=64 < cardinalities: within the KMV envelope (se ~ J/sqrt(k))
    small = est_map(build_set_sketches(ev, ["event_type"], "user_id", k=64))
    for pair, (ej, ei) in small.items():
        assert abs(ej - exact[pair][0]) <= 0.25, (pair, ej, exact[pair][0])
        assert abs(ei - exact[pair][1]) <= 0.4 * max(exact[pair][1], 25), pair

    # mismatched k raises via the fused guard
    import pytest as _pt

    with _pt.raises(Exception, match="mismatched k"):
        merge_set_sketches(
            build_set_sketches(ev, ["event_type"], "user_id", k=32),
            build_set_sketches(ev, ["event_type"], "user_id", k=64),
        ).collect()


def test_rollup_anomalies_flags_injected_spike(spark):
    """A synthetic spike 10x the baseline is flagged; steady buckets are
    not; warm-up buckets (insufficient trailing history) get NULL."""
    import datetime as dt

    from ratatool_spark.operators.timeagg import rollup_anomalies

    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(40):
        v = 100.0 + (i % 3)  # steady baseline with tiny wiggle
        if i == 30:
            v = 1000.0  # spike
        rows.append((base + dt.timedelta(hours=i), 1, v))
    roll = spark.createDataFrame(
        rows, "bucket timestamp, n_events long, sum_value double"
    )
    out = {
        r["bucket"]: r["is_anomaly"]
        for r in rollup_anomalies(
            roll, trailing=24, min_periods=8, z=3.0, grain_col=None
        ).collect()
    }
    spike = base + dt.timedelta(hours=30)
    assert out[spike] is True
    # warm-up rows are NULL, not False
    assert out[base] is None and out[base + dt.timedelta(hours=3)] is None
    # steady rows well past warm-up and before the spike are not flagged
    assert out[base + dt.timedelta(hours=20)] is False
    # the bucket right after the spike is judged against a baseline that
    # now CONTAINS the spike — it must not be flagged (std inflated)
    assert out[base + dt.timedelta(hours=31)] is False


def test_rollup_anomalies_constant_baseline_flags_spike(spark):
    """Against a CONSTANT warm baseline (trailing std == 0), a deviation
    must flag TRUE (not NULL) — the r5-review finding: a monitoring
    consumer filtering is_anomaly = TRUE must see this spike."""
    import datetime as dt

    from ratatool_spark.operators.timeagg import rollup_anomalies

    base = dt.datetime(2024, 3, 1)
    rows = [
        (base + dt.timedelta(hours=i), 1, 100.0 if i != 20 else 500.0)
        for i in range(30)
    ]
    roll = spark.createDataFrame(
        rows, "bucket timestamp, n_events long, sum_value double"
    )
    out = {
        r["bucket"]: r["is_anomaly"]
        for r in rollup_anomalies(
            roll, trailing=10, min_periods=5, z=3.0, grain_col=None
        ).collect()
    }
    assert out[base + dt.timedelta(hours=20)] is True
    assert out[base + dt.timedelta(hours=15)] is False  # constant, warm


def test_estimate_quantiles_rejects_colliding_labels(spark):
    from pyspark.sql import functions as F

    import pytest as _pt

    from ratatool_spark.operators.timeagg import (
        build_quantile_sketches,
        estimate_quantiles,
    )
    from ratatool_spark.sources.io import load_tables

    ev = load_tables(spark, SF, names=("events",))["events"]
    sk = build_quantile_sketches(ev, ["event_type"], "value", ["event_id"], k=32)
    with _pt.raises(ValueError, match="collide"):
        estimate_quantiles(sk, [0.995, 0.999])


def test_merge_sketches_mixed_k_disjoint_groups_still_raises(spark):
    """The k guard is GLOBAL: tables with different k whose groups are
    DISJOINT must still raise (the per-group check would pass silently)."""
    from pyspark.sql import functions as F

    import pytest as _pt

    from ratatool_spark.operators.timeagg import (
        build_quantile_sketches,
        build_set_sketches,
        merge_quantile_sketches,
        merge_set_sketches,
    )
    from ratatool_spark.sources.io import load_tables

    ev = load_tables(spark, SF, names=("events",))["events"]
    a = ev.where(F.col("event_type") == "click")
    b = ev.where(F.col("event_type") == "view")
    qa = build_quantile_sketches(a, ["event_type"], "value", ["event_id"], k=32)
    qb = build_quantile_sketches(b, ["event_type"], "value", ["event_id"], k=64)
    with _pt.raises(Exception, match="mismatched k"):
        merge_quantile_sketches(qa, qb).collect()
    sa = build_set_sketches(a, ["event_type"], "user_id", k=32)
    sb = build_set_sketches(b, ["event_type"], "user_id", k=64)
    with _pt.raises(Exception, match="mismatched k"):
        merge_set_sketches(sa, sb).collect()


def test_stream_quality_scores_equals_batch(spark, tmp_path):
    """Streaming classifier inference == the batch operator on the same
    docs (train-offline / apply-online parity), with the idempotent
    batch_id partition exposed on read-back."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.corpus import (
        build_hashed_ngram_freqs,
        quality_classifier_score,
        train_quality_weights,
    )
    from ratatool_spark.streaming.classify import stream_quality_scores

    docs = spark.createDataFrame(
        [
            (1, "good clean prose flows here", "pos"),
            (2, "spam junk garbage spam junk", "neg"),
            (3, "good clean text reads well", "pos"),
            (4, "junk spam noise garbage junk", "neg"),
            (5, "good clean prose reads well", "?"),
        ],
        "doc_id long, text string, label string",
    )
    B = 64
    pos = build_hashed_ngram_freqs(docs.where(F.col("label") == "pos"), n=2, n_buckets=B)
    neg = build_hashed_ngram_freqs(docs.where(F.col("label") == "neg"), n=2, n_buckets=B)
    w = train_quality_weights(pos, neg, n_buckets=B)
    in_dir = str(tmp_path / "incoming")
    docs.write.parquet(in_dir)
    stream = spark.readStream.schema(docs.schema).parquet(in_dir)
    out = str(tmp_path / "scored")
    q = stream_quality_scores(
        stream, w, out, checkpoint=str(tmp_path / "ckpt"), n_buckets=B, n=2
    )
    q.awaitTermination()
    back = spark.read.parquet(out)
    assert "batch_id" in back.columns
    streamed = {r["doc_id"]: (r["n_features"], r["logit"]) for r in back.collect()}
    batch = {
        r["doc_id"]: (r["n_features"], r["logit"])
        for r in quality_classifier_score(docs, w, n_buckets=B, n=2).collect()
    }
    assert streamed == batch


def test_stream_drift_equals_batch(spark, tmp_path):
    """Streaming bin partials merged across micro-batches == one batch
    binning of everything delivered; PSI vs the reference matches the
    direct psi_from_bins computation."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.profile import fixed_bins, psi_from_bins
    from ratatool_spark.streaming.drift import (
        read_stream_drift,
        stream_drift_bins,
    )

    ref_df = spark.createDataFrame(
        [("a", float(v % 10)) for v in range(100)], "k string, v double"
    )
    live_df = spark.createDataFrame(
        [("a", 9.0)] * 60 + [("b", 1.0)] * 40, "k string, v double"
    )
    spec = dict(categorical=["k"], numeric_bounds={"v": (0.0, 10.0)},
                n_buckets=5)
    src = str(tmp_path / "in")
    live_df.repartition(3).write.parquet(src)  # 3 real micro-batches
    stream = (
        spark.readStream.schema(live_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_drift_bins(stream, str(tmp_path / "bins"),
                          str(tmp_path / "ckpt"), **spec)
    q.awaitTermination()
    ref = fixed_bins(ref_df, **spec)
    got = {r["column"]: r
           for r in read_stream_drift(spark, str(tmp_path / "bins"), ref).collect()}
    want = {r["column"]: r
            for r in psi_from_bins(ref, fixed_bins(live_df, **spec)).collect()}
    assert got.keys() == want.keys()
    for c in want:
        assert got[c]["psi"] == want[c]["psi"]
        assert got[c]["n_live"] == want[c]["n_live"] == 100
    assert got["k"]["psi"] > 0.1  # the engineered category shift registers


def test_fixed_bins_validation(spark):
    import pytest as _pt

    from ratatool_spark.operators.profile import fixed_bins

    df = spark.createDataFrame([(1.0,)], "v double")
    with _pt.raises(ValueError, match="at least one"):
        fixed_bins(df)
    with _pt.raises(ValueError, match="hi > lo"):
        fixed_bins(df, numeric_bounds={"v": (5.0, 5.0)})


def test_stream_decontaminate_drop_mode(spark, tmp_path):
    """drop=True anti-joins flagged docs away per micro-batch; exact
    copies of indexed docs never reach the sink."""
    import os

    from pyspark.sql import functions as F

    from ratatool_spark.operators.dedup import build_minhash_index
    from ratatool_spark.streaming.decontaminate import stream_decontaminate

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 90000).alias("doc_id"), "text"
    )
    idx = str(tmp_path / "idx")
    build_minhash_index(bench, idx)
    in_dir = str(tmp_path / "in")
    docs.write.parquet(in_dir)
    stream = spark.readStream.schema(docs.schema).parquet(in_dir)
    out = str(tmp_path / "out")
    q = stream_decontaminate(
        stream, idx, out, checkpoint=str(tmp_path / "ckpt"),
        min_est_jaccard=0.9, drop=True,
    )
    q.awaitTermination()
    survivors = spark.read.parquet(out)
    assert survivors.where(F.col("doc_id") % 10 == 0).count() == 0
    assert 0 < survivors.count() < docs.count()


def test_stream_snapshot_source_mirror_exactly_once(spark, tmp_path):
    """table -> stream -> table loop: every append commit of A replays
    as one commit of B; a re-run under a FRESH checkpoint replays
    nothing (ledger); an append to A after the first run arrives as
    exactly the delta."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.snapshots import (
        commit_append,
        current_snapshot_id,
        read_snapshot,
    )
    from ratatool_spark.streaming.snapshots import (
        mirrored_source_snapshots,
        stream_snapshot_mirror,
    )

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for i in range(3):
        commit_append(
            spark.range(i * 10, (i + 1) * 10).select(
                F.col("id").cast("long"),
                (F.col("id") % 5).cast("long").alias("grp"),
            ),
            a,
        )
    q = stream_snapshot_mirror(spark, a, b, str(tmp_path / "ck1"))
    q.awaitTermination()
    assert current_snapshot_id(b) == 3
    assert mirrored_source_snapshots(b) == {1, 2, 3}
    assert sorted(read_snapshot(spark, b).collect()) == sorted(
        read_snapshot(spark, a).collect()
    )
    # replay under a fresh checkpoint: ledger makes it a no-op
    q = stream_snapshot_mirror(spark, a, b, str(tmp_path / "ck2"))
    q.awaitTermination()
    assert current_snapshot_id(b) == 3
    # incremental: one more append to A, resume the ORIGINAL checkpoint
    commit_append(
        spark.range(100, 105).select(
            F.col("id").cast("long"), (F.col("id") % 5).cast("long").alias("grp")
        ),
        a,
    )
    q = stream_snapshot_mirror(spark, a, b, str(tmp_path / "ck1"))
    q.awaitTermination()
    assert current_snapshot_id(b) == 4
    assert read_snapshot(spark, b).count() == 35
    assert sorted(read_snapshot(spark, b).collect()) == sorted(
        read_snapshot(spark, a).collect()
    )


def test_stream_snapshot_source_skips_maintenance_commits(spark, tmp_path):
    """Compaction/clustering replaces and MoR merges must NOT re-deliver
    rows to a subscribed consumer; a later append still arrives."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.snapshots import (
        commit_append,
        compact_snapshot,
        merge_snapshot_mor,
    )
    from ratatool_spark.streaming.snapshots import stream_snapshot_source

    a = str(tmp_path / "a")
    for i in range(2):
        commit_append(
            spark.range(i * 10, (i + 1) * 10).coalesce(1).select(
                F.col("id").cast("long"),
                (F.col("id") * 2).cast("long").alias("val"),
            ),
            a,
        )
    seen: dict[int, int] = {}

    def _collect(df, sid):
        seen[sid] = df.count()

    q = stream_snapshot_source(spark, a, _collect, str(tmp_path / "ck"))
    q.awaitTermination()
    assert seen == {1: 10, 2: 10}
    compact_snapshot(spark, a, target_bytes=1 << 30)  # v3: maintenance
    merge_snapshot_mor(  # v4: MoR, not an append
        spark, a,
        spark.createDataFrame([(1, -1)], "id long, val long"), ["id"],
    )
    commit_append(  # v5: a real append
        spark.createDataFrame([(50, 100)], "id long, val long"), a
    )
    seen.clear()
    q = stream_snapshot_source(spark, a, _collect, str(tmp_path / "ck"))
    q.awaitTermination()
    assert seen == {5: 1}


def test_stream_snapshot_source_rate_limit(spark, tmp_path):
    """max_commits_per_trigger bounds each micro-batch (one manifest
    file per commit, so the file source's maxFilesPerTrigger maps 1:1
    onto commits): a 4-commit backlog under a limit of 2 drains in >= 2
    non-empty micro-batches, delivering every commit exactly once and
    in order."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.snapshots import commit_append
    from ratatool_spark.streaming.snapshots import stream_snapshot_source

    a = str(tmp_path / "a")
    for i in range(4):
        commit_append(
            spark.range(i * 5, (i + 1) * 5).select(F.col("id")), a)
    got = []

    def _collect(df, sid):
        got.append((sid, sorted(r["id"] for r in df.collect())))

    q = stream_snapshot_source(
        spark, a, _collect, str(tmp_path / "ck"),
        max_commits_per_trigger=2,
    )
    q.awaitTermination()
    assert [s for s, _ in got] == [1, 2, 3, 4]  # all commits, in order
    assert got[0][1] == [0, 1, 2, 3, 4]
    batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(batches) >= 2  # the backlog drained in bounded steps
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_commits_per_trigger"):
        stream_snapshot_source(
            spark, a, _collect, str(tmp_path / "ck2"),
            max_commits_per_trigger=0,
        )


def test_stream_snapshot_source_across_rename(spark, tmp_path):
    """A consumer observes a rename at exactly the commit where it
    published: frames before it carry the old shape, frames after the
    new one — each internally consistent (files at commit N carry N's
    schema by the write-path invariant)."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.snapshots import (
        commit_append,
        rename_column,
    )
    from ratatool_spark.streaming.snapshots import stream_snapshot_source

    a = str(tmp_path / "a")
    commit_append(
        spark.range(5).select(F.col("id").alias("k"),
                              (F.col("id") * 2).alias("x")), a)
    rename_column(a, "x", "payload")
    commit_append(
        spark.range(5, 8).select(F.col("id").alias("k"),
                                 (F.col("id") * 2).alias("payload")), a)
    shapes = []

    def _collect(df, sid):
        shapes.append((sid, tuple(df.columns), df.count()))

    q = stream_snapshot_source(spark, a, _collect, str(tmp_path / "ck"))
    q.awaitTermination()
    assert shapes == [(1, ("k", "x"), 5), (3, ("k", "payload"), 3)]
