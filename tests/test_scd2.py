"""SCD Type-2 history + incremental apply (operators/scd2)."""

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from ratatool_spark.operators.scd2 import scd2_apply, scd2_history


def _ts(day, hour=0):
    return datetime.datetime(2024, 1, day, hour)


@pytest.fixture()
def changes(spark):
    rows = [
        # key 1: a -> a (no-op, collapsed) -> b -> a
        Row(k=1, ts=_ts(1), v="a", cid=10),
        Row(k=1, ts=_ts(2), v="a", cid=11),
        Row(k=1, ts=_ts(3), v="b", cid=12),
        Row(k=1, ts=_ts(4), v="a", cid=13),
        # key 2: single version
        Row(k=2, ts=_ts(1), v="x", cid=20),
        # key 3: tie on ts broken by cid
        Row(k=3, ts=_ts(5), v="late", cid=31),
        Row(k=3, ts=_ts(5), v="early", cid=30),
    ]
    return spark.createDataFrame(rows)


def test_history_collapses_and_closes_intervals(changes):
    out = scd2_history(changes, "k", "ts", "v", change_id="cid").collect()
    by_key = {}
    for r in sorted(out, key=lambda r: (r["k"], r["valid_from"])):
        by_key.setdefault(r["k"], []).append(r)

    k1 = by_key[1]
    assert [r["v"] for r in k1] == ["a", "b", "a"]  # no-op at day 2 collapsed
    assert [r["valid_from"] for r in k1] == [_ts(1), _ts(3), _ts(4)]
    assert [r["valid_to"] for r in k1] == [_ts(3), _ts(4), None]
    assert [r["is_current"] for r in k1] == [False, False, True]

    assert len(by_key[2]) == 1 and by_key[2][0]["is_current"]

    k3 = by_key[3]  # cid orders the ts tie: early then late
    assert [r["v"] for r in k3] == ["early", "late"]
    assert k3[0]["valid_to"] == _ts(5) and k3[1]["is_current"]


def test_history_no_collapse_keeps_noop_versions(changes):
    out = scd2_history(
        changes.where("k = 1"), "k", "ts", "v", change_id="cid", collapse=False
    ).collect()
    assert len(out) == 4


def test_apply_equals_rebuild_including_late_changes(spark, changes):
    """Split at day 3; the batch also carries a LATE change (day 2.5 for
    key 1) and a brand-new key — apply must equal the full rebuild."""
    late = spark.createDataFrame(
        [
            Row(k=1, ts=_ts(3), v="b", cid=12),
            Row(k=1, ts=_ts(4), v="a", cid=13),
            Row(k=1, ts=_ts(2, 12), v="mid", cid=14),  # out-of-order arrival
            Row(k=3, ts=_ts(5), v="late", cid=31),
            Row(k=3, ts=_ts(5), v="early", cid=30),
            Row(k=4, ts=_ts(6), v="new", cid=40),
        ]
    )
    early = changes.where(F.col("cid").isin(10, 11, 20))
    base = scd2_history(
        early, "k", "ts", "v", change_id="cid", keep_change_id=True
    )
    applied = scd2_apply(base, late, "k", "ts", "v", change_id="cid")
    rebuilt = scd2_history(
        early.unionByName(late), "k", "ts", "v", change_id="cid"
    )
    a = {tuple(r) for r in applied.collect()}
    b = {tuple(r) for r in rebuilt.collect()}
    assert a == b
    # untouched key 2 passed through; late change opened a version
    assert any(r[1] == "mid" for r in a)  # (k, v, from, to, current)


def test_apply_untouched_keys_not_rewindowed(spark, changes):
    base = scd2_history(changes, "k", "ts", "v", change_id="cid")
    batch = spark.createDataFrame([Row(k=9, ts=_ts(9), v="z", cid=90)])
    applied = scd2_apply(base, batch, "k", "ts", "v", change_id="cid")
    got = {tuple(r) for r in applied.collect()}
    assert {tuple(r) for r in base.collect()} <= got
    assert any(r[0] == 9 for r in got)


def test_history_single_exchange(spark, changes):
    import re

    plan = scd2_history(
        changes, "k", "ts", "v", change_id="cid"
    )._jdf.queryExecution().executedPlan().toString()
    # one hash exchange on the key feeds the collapse lag, the filter,
    # and the interval-closing lead — no re-shuffle between windows
    assert len(re.findall(r"\bExchange hashpartitioning", plan)) == 1
    assert "SinglePartition" not in plan


def test_stream_scd2_batches_equal_rebuild(spark, tmp_path):
    """Micro-batches delivered in REVERSE chronological order through
    stream_scd2 == one-shot rebuild (the lossless-storage guarantee:
    every late batch interleaves already-stored runs), and re-delivering
    every batch (at-least-once) changes nothing."""
    import datetime as dt
    import os
    import time

    from pyspark.sql import Row

    from ratatool_spark.streaming.scd2 import read_scd2_table, stream_scd2

    rows = [
        Row(k=i % 5, ts=dt.datetime(2024, 1, 1 + i), v=f"s{i % 3}", cid=i)
        for i in range(30)
    ]
    df = spark.createDataFrame(rows)
    in_dir = str(tmp_path / "in")
    # append the NEWEST time slice first: the file source orders files
    # by modification time, so batches arrive fully out-of-order
    os.makedirs(in_dir, exist_ok=True)
    for lo, hi in [(20, 30), (10, 20), (0, 10)]:
        df.where(f"cid >= {lo} AND cid < {hi}").coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
        time.sleep(1.1)  # distinct mtimes -> deterministic batch order
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    table = str(tmp_path / "hist")
    q = stream_scd2(
        stream, table, checkpoint=str(tmp_path / "ckpt"),
        key_cols="k", ts_col="ts", attr_cols="v", change_id="cid",
    )
    q.awaitTermination()

    got = {
        tuple(r)
        for r in read_scd2_table(spark, table)
        .select("k", "v", "valid_from", "valid_to", "is_current")
        .collect()
    }
    want = {
        tuple(r)
        for r in scd2_history(df, "k", "ts", "v", change_id="cid").collect()
    }
    assert got == want

    # at-least-once replay: re-deliver EVERY batch (fresh checkpoint,
    # same source) — re-applied change rows collapse against their
    # stored copies, so the table must be unchanged
    q2 = stream_scd2(
        (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        ),
        table,
        checkpoint=str(tmp_path / "ckpt2"),
        key_cols="k", ts_col="ts", attr_cols="v", change_id="cid",
    )
    q2.awaitTermination()
    again = {
        tuple(r)
        for r in read_scd2_table(spark, table)
        .select("k", "v", "valid_from", "valid_to", "is_current")
        .collect()
    }
    assert again == want


@pytest.mark.parametrize("seed", [7, 23, 91])
def test_randomized_batching_equals_rebuild(spark, seed):
    """The exact-replay contract, fuzzed: a random change stream cut
    into random out-of-order batches and applied sequentially (lossless
    storage, like streaming/scd2) must equal scd2_history over the full
    stream — for ANY batching, ANY delivery order."""
    import random

    rng = random.Random(seed)
    rows = [
        Row(
            k=rng.randint(1, 8),
            ts=_ts(rng.randint(1, 20), rng.randint(0, 23)),
            v=rng.choice(["a", "b", "c"]),
            cid=i,
        )
        for i in range(40)
    ]
    full = spark.createDataFrame(rows)
    want = sorted(
        scd2_history(full, "k", "ts", "v", change_id="cid").collect()
    )
    shuffled = rows[:]
    rng.shuffle(shuffled)
    cuts = sorted(rng.sample(range(1, 40), rng.randint(1, 3)))
    batches = [
        shuffled[a:b] for a, b in zip([0] + cuts, cuts + [40])
    ]
    hist = None
    for batch in batches:
        bdf = spark.createDataFrame(batch)
        if hist is None:
            hist = scd2_history(
                bdf, "k", "ts", "v", change_id="cid",
                collapse=False, keep_change_id=True,
            )
        else:
            hist = scd2_apply(
                hist, bdf, "k", "ts", "v", change_id="cid",
                collapse=False, keep_change_id=True,
            )
        hist = hist.localCheckpoint(eager=True)
    # collapse the lossless store at read, exactly like read_scd2_table
    replay = hist.select("k", F.col("valid_from").alias("ts"), "v", "cid")
    got = sorted(
        scd2_history(replay, "k", "ts", "v", change_id="cid").collect()
    )
    assert got == want


def test_cli_scd2_history_then_apply(spark, tmp_path):
    import datetime as dt

    from pyspark.sql import Row

    from ratatool_spark.cli import main

    early = spark.createDataFrame(
        [Row(k=1, ts=dt.datetime(2024, 1, d), v=f"s{d % 2}", cid=d)
         for d in range(1, 6)]
    )
    late = spark.createDataFrame(
        [Row(k=1, ts=dt.datetime(2024, 1, d), v="end", cid=d)
         for d in (7, 8)]
    )
    ep, lp = str(tmp_path / "e"), str(tmp_path / "l")
    early.write.parquet(ep)
    late.write.parquet(lp)
    hist = str(tmp_path / "hist")
    assert main([
        "scd2", "--mode", "history", "--input", ep, "--output", hist,
        "--key", "k", "--ts", "ts", "--attrs", "v",
        "--changeId", "cid", "--keepChangeId",
    ]) == 0
    out = str(tmp_path / "out")
    assert main([
        "scd2", "--mode", "apply", "--input", lp, "--history", hist,
        "--output", out, "--key", "k", "--ts", "ts", "--attrs", "v",
        "--changeId", "cid",
    ]) == 0
    rows = spark.read.parquet(out).collect()
    cur = [r for r in rows if r["is_current"]]
    assert len(cur) == 1 and cur[0]["v"] == "end"
    assert len(rows) == 6  # 5 alternating versions + collapsed end pair


def test_cli_compaction_plan(spark, tmp_path):
    from pyspark.sql import Row

    from ratatool_spark.cli import main

    spark.createDataFrame(
        [Row(f="a", sz=700), Row(f="b", sz=300), Row(f="c", sz=300)]
    ).write.parquet(str(tmp_path / "m"))
    out = str(tmp_path / "plan")
    assert main([
        "compactionPlan", "--input", str(tmp_path / "m"), "--output", out,
        "--sizeField", "sz", "--orderField", "f", "--targetBytes", "1000",
    ]) == 0
    got = {r["f"]: r["bin"] for r in spark.read.parquet(out).collect()}
    assert got == {"a": 0, "b": 0, "c": 1}


def test_lossless_storage_resurrects_interleaved_version(spark):
    """The case collapsed storage cannot replay: changes a@t1, a@t2
    (no-op run), then a LATE b@t1.5 arrives between them. Lossless
    (uncollapsed) storage + collapse-at-read shows a@t1, b@t1.5, a@t2
    — identical to the full rebuild."""
    import datetime as dt

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    t1, t15, t2 = (dt.datetime(2024, 1, d, h) for d, h in
                   [(1, 0), (1, 12), (2, 0)])
    early = spark.createDataFrame(
        [Row(k=1, ts=t1, v="a", cid=1), Row(k=1, ts=t2, v="a", cid=2)]
    )
    late = spark.createDataFrame([Row(k=1, ts=t15, v="b", cid=3)])

    base = scd2_history(
        early, "k", "ts", "v", change_id="cid",
        collapse=False, keep_change_id=True,
    )
    stored = scd2_apply(
        base, late, "k", "ts", "v", change_id="cid",
        collapse=False, keep_change_id=True, drop_duplicate_changes=True,
    )
    view = scd2_history(
        stored.select("k", F.col("valid_from").alias("ts"), "v", "cid"),
        "k", "ts", "v", change_id="cid",
    )
    want = scd2_history(
        early.unionByName(late), "k", "ts", "v", change_id="cid"
    )
    got = {tuple(r) for r in view.collect()}
    assert got == {tuple(r) for r in want.collect()}
    # (k, v, valid_from, valid_to, is_current) sorted chronologically
    assert [t[1] for t in sorted(got, key=lambda t: t[2])] == ["a", "b", "a"]
