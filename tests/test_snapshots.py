"""Snapshot-manifest table layer (operators/snapshots): atomic commits,
time travel, isolation from unreferenced files, compaction under one
replace commit, expiry set arithmetic, conflict detection."""

import json
import os

import pytest
from pyspark.sql import functions as F

from ratatool_spark.operators.snapshots import (
    CommitConflict,
    commit_append,
    commit_replace,
    compact_snapshot,
    current_snapshot_id,
    expire_snapshots,
    read_manifest,
    read_snapshot,
    snapshot_log,
    snapshot_manifest,
    _publish,
)


def _tbl(spark, tmp_path, n=3, rows=10):
    """n append commits of `rows` rows each; returns the table path."""
    path = str(tmp_path / "tbl")
    for i in range(n):
        df = spark.range(i * rows, (i + 1) * rows).select(
            F.col("id").cast("long"),
            (F.col("id") % 7).cast("long").alias("grp"),
        )
        commit_append(df, path)
    return path


def test_append_and_current(spark, tmp_path):
    path = _tbl(spark, tmp_path, n=3)
    assert current_snapshot_id(path) == 3
    assert read_snapshot(spark, path).count() == 30


def test_time_travel_reads_exact_snapshot(spark, tmp_path):
    path = _tbl(spark, tmp_path, n=3)
    for sid, expect in [(1, 10), (2, 20), (3, 30)]:
        got = read_snapshot(spark, path, sid)
        assert got.count() == expect
        assert got.agg(F.max("id")).first()[0] == expect - 1


def test_reader_isolated_from_unreferenced_files(spark, tmp_path):
    """Files on disk but absent from the manifest (a failed commit's
    orphans) are invisible to every reader."""
    path = _tbl(spark, tmp_path, n=1)
    orphan_dir = os.path.join(path, "data", "deadbeef")
    spark.range(100, 105).select(
        F.col("id").cast("long"), F.lit(0).cast("long").alias("grp")
    ).write.parquet(orphan_dir)
    assert read_snapshot(spark, path).count() == 10  # orphans unseen


def test_schema_mismatch_rejected(spark, tmp_path):
    path = _tbl(spark, tmp_path, n=1)
    bad = spark.range(5).select(F.col("id").alias("renamed"))
    with pytest.raises(ValueError, match="schema mismatch"):
        commit_append(bad, path)


def test_replace_preserves_other_files(spark, tmp_path):
    path = _tbl(spark, tmp_path, n=2)
    m = read_manifest(path)
    victim = next(e["path"] for e in m["files"] if e["rows"] > 0)
    kept_rows = read_snapshot(spark, path).count()
    victim_rows = [e["rows"] for e in m["files"] if e["path"] == victim][0]
    rewritten = spark.read.parquet(os.path.join(path, victim))
    sid = commit_replace(spark, path, [victim], rewritten)
    assert sid == 3
    assert read_snapshot(spark, path).count() == kept_rows
    # and the old snapshot still reads the OLD file set (time travel)
    assert read_snapshot(spark, path, 2).count() == kept_rows
    assert victim_rows > 0


def test_replace_unknown_path_rejected(spark, tmp_path):
    path = _tbl(spark, tmp_path, n=1)
    with pytest.raises(ValueError, match="not in snapshot"):
        commit_replace(spark, path, ["data/nope.parquet"], None)


def test_commit_conflict_on_same_id(spark, tmp_path):
    """Two committers racing to publish the same snapshot id: exactly one
    wins (exclusive manifest create is the atomicity point)."""
    path = _tbl(spark, tmp_path, n=1)
    m = read_manifest(path)
    _publish(path, 1, m["files"], m["schema"], "append")  # v2 published
    with pytest.raises(CommitConflict):
        _publish(path, 1, m["files"], m["schema"], "append")


def test_replace_stale_parent_conflict(spark, tmp_path):
    path = _tbl(spark, tmp_path, n=2)
    m = read_manifest(path)
    df = spark.range(1).select(
        F.col("id").cast("long"), F.lit(0).cast("long").alias("grp")
    )
    commit_append(df, path)  # someone else commits (now v3)
    with pytest.raises(CommitConflict, match="replan"):
        commit_replace(
            spark, path, [m["files"][0]["path"]], None, expected_parent=2
        )


def test_compact_single_replace_commit_preserves_data(spark, tmp_path):
    path = _tbl(spark, tmp_path, n=4, rows=50)
    before = read_snapshot(spark, path)
    before_agg = sorted(
        before.groupBy("grp").agg(F.count("*"), F.sum("id")).collect()
    )
    n_before = len(read_manifest(path)["files"])
    sid = compact_snapshot(spark, path, target_bytes=1 << 30)  # one bin
    assert sid == 5  # exactly ONE replace commit
    m = read_manifest(path)
    assert m["operation"] == "replace"
    assert len(m["files"]) < n_before
    after = read_snapshot(spark, path)
    after_agg = sorted(
        after.groupBy("grp").agg(F.count("*"), F.sum("id")).collect()
    )
    assert before_agg == after_agg
    # pre-compaction snapshot still readable (old files still live)
    assert read_snapshot(spark, path, 4).count() == 200


def test_compact_noop_when_all_bins_single(spark, tmp_path):
    path = _tbl(spark, tmp_path, n=1)
    # tiny target: every file its own bin -> nothing to do
    assert compact_snapshot(spark, path, target_bytes=1) is None
    assert current_snapshot_id(path) == 1


def test_expire_deletes_only_dead_files(spark, tmp_path):
    path = _tbl(spark, tmp_path, n=3, rows=20)
    compact_snapshot(spark, path, target_bytes=1 << 30)  # v4 rewrite
    dead = expire_snapshots(path, keep_last=1)
    assert dead  # the pre-compaction files are now unreferenced
    # current snapshot unaffected
    assert read_snapshot(spark, path).count() == 60
    # expired manifests gone
    with pytest.raises(FileNotFoundError):
        read_manifest(path, 1)
    # every surviving manifest's files still exist
    for e in read_manifest(path)["files"]:
        assert os.path.exists(os.path.join(path, e["path"]))


def test_expire_pure_appends_orphan_nothing(spark, tmp_path):
    """Append-only history: every old file is still referenced by the
    newest snapshot, so expiry finds no dead files (manifests drop, data
    stays)."""
    path = _tbl(spark, tmp_path, n=2)
    assert expire_snapshots(path, keep_last=1, delete=False) == []


def test_expire_dry_run_deletes_nothing(spark, tmp_path):
    path = _tbl(spark, tmp_path, n=2)
    compact_snapshot(spark, path, target_bytes=1 << 30)  # v3 rewrite
    dead = expire_snapshots(path, keep_last=1, delete=False)
    assert dead
    assert current_snapshot_id(path) == 3
    assert read_snapshot(spark, path, 1).count() == 10  # still readable


def test_snapshot_log_and_manifest(spark, tmp_path):
    path = _tbl(spark, tmp_path, n=2, rows=5)
    log = snapshot_log(spark, path).orderBy("snapshot_id").collect()
    assert [r["snapshot_id"] for r in log] == [1, 2]
    assert [r["rows"] for r in log] == [5, 10]
    assert log[0]["parent"] is None and log[1]["parent"] == 1
    man = snapshot_manifest(spark, path)
    assert man.agg(F.sum("rows")).first()[0] == 10
    # manifest bytes match the files on disk
    for r in man.collect():
        assert os.path.getsize(os.path.join(path, r["path"])) == r["bytes"]


def test_cli_snapshot_lifecycle(spark, tmp_path, capsys):
    """CLI verbs drive the full lifecycle: append x2 -> time-travel read
    -> compact -> expire -> log."""
    from ratatool_spark.cli import main

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    spark.range(10).select(
        F.col("id").cast("long"), (F.col("id") % 3).cast("long").alias("grp")
    ).write.parquet(a)
    spark.range(10, 30).select(
        F.col("id").cast("long"), (F.col("id") % 3).cast("long").alias("grp")
    ).write.parquet(b)
    tbl = str(tmp_path / "tbl")
    assert main(["snapshot", "--mode", "append", "--table", tbl, "--input", a]) == 0
    assert main(["snapshot", "--mode", "append", "--table", tbl, "--input", b]) == 0
    asof1 = str(tmp_path / "asof1")
    assert main([
        "snapshot", "--mode", "read", "--table", tbl,
        "--snapshotId", "1", "--output", asof1,
    ]) == 0
    assert spark.read.parquet(asof1).count() == 10
    assert main([
        "snapshot", "--mode", "compact", "--table", tbl,
        "--targetBytes", str(1 << 30),
    ]) == 0
    assert main(["snapshot", "--mode", "expire", "--table", tbl]) == 0
    capsys.readouterr()
    assert main(["snapshot", "--mode", "log", "--table", tbl]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1  # only the compacted snapshot survives expiry
    assert json.loads(out[0])["rows"] == 30


def test_manifest_carries_file_stats(spark, tmp_path):
    path = _tbl(spark, tmp_path, n=1, rows=50)
    entries = [e for e in read_manifest(path)["files"] if e["rows"] > 0]
    assert entries
    for e in entries:
        assert 0 <= e["stats"]["id"][0] <= e["stats"]["id"][1] <= 49
        assert 0 <= e["stats"]["grp"][0] <= e["stats"]["grp"][1] <= 6
    # the union of per-file ranges covers the data
    assert min(e["stats"]["id"][0] for e in entries) == 0
    assert max(e["stats"]["id"][1] for e in entries) == 49


def test_read_snapshot_where_prunes_and_matches_filter(spark, tmp_path):
    """Stats-pruned read == unpruned read + filter, and the pruning
    actually skips files (ids are range-disjoint across commits)."""
    from ratatool_spark.operators.snapshots import files_intersecting

    path = str(tmp_path / "tbl")
    for i in range(4):  # commit i holds ids [100i, 100i+100) in 1 file
        df = spark.range(i * 100, (i + 1) * 100).coalesce(1).select(
            F.col("id").cast("long"),
            (F.col("id") % 7).cast("long").alias("grp"),
        )
        commit_append(df, path)
    m = read_manifest(path)
    kept = files_intersecting(m, {"id": (150, 249)})
    assert len(kept) == 2  # only commits 1 and 2 can intersect
    pruned = read_snapshot(spark, path, where={"id": (150, 249)})
    full = read_snapshot(spark, path).where(F.col("id").between(150, 249))
    assert sorted(pruned.collect()) == sorted(full.collect())
    # stats-absent column: never prunes (safe), still filters rows
    m["files"][0]["stats"].pop("id", None)
    assert len(files_intersecting(m, {"id": (150, 249)})) == 3


def test_cluster_snapshot_zorder_rewrite(spark, tmp_path):
    """Clustering rewrite: one replace commit, logical content identical,
    files physically reordered by the Morton key (footer stats become
    selective — the audit half is covered in test_layout)."""
    from ratatool_spark.operators.snapshots import cluster_snapshot

    path = _tbl(spark, tmp_path, n=3, rows=100)
    before = sorted(read_snapshot(spark, path).collect())
    sid = cluster_snapshot(spark, path, ["id", "grp"], num_partitions=4)
    assert sid == 4
    m = read_manifest(path)
    assert m["operation"] == "replace"
    after = sorted(read_snapshot(spark, path).collect())
    assert before == after
    # old snapshot still readable (time travel across the rewrite)
    assert read_snapshot(spark, path, 3).count() == 300


def _range_local_table(spark, tmp_path):
    """4 commits, ids range-disjoint per file (commit i = [100i, 100i+100)
    in one file) — the layout CoW merge/delete prune against."""
    path = str(tmp_path / "cow")
    for i in range(4):
        df = spark.range(i * 100, (i + 1) * 100).coalesce(1).select(
            F.col("id").cast("long"),
            (F.col("id") * 2).cast("long").alias("val"),
        )
        commit_append(df, path)
    return path


def test_merge_snapshot_upsert_rewrites_only_touched_files(spark, tmp_path):
    from ratatool_spark.operators.snapshots import merge_snapshot

    path = _range_local_table(spark, tmp_path)
    before = {e["path"] for e in read_manifest(path)["files"]}
    # updates for ids 120..129 plus brand-new ids 1000..1004 — the box
    # [120, 1004] touches files 1,2,3 but NOT file 0
    changes = spark.range(10).select(
        (F.col("id") + 120).cast("long").alias("id"),
        F.lit(-1).cast("long").alias("val"),
    ).unionByName(
        spark.range(5).select(
            (F.col("id") + 1000).cast("long").alias("id"),
            F.lit(-2).cast("long").alias("val"),
        )
    )
    sid = merge_snapshot(spark, path, changes, ["id"])
    assert sid == 5
    after = {e["path"] for e in read_manifest(path)["files"]}
    assert before & after  # untouched files carried over (file 0)
    got = read_snapshot(spark, path)
    assert got.count() == 405  # 400 + 5 inserts
    assert got.where(F.col("val") == -1).count() == 10  # updates applied
    assert got.where(F.col("val") == -2).count() == 5
    # non-matching rows untouched
    assert got.where((F.col("id") == 50) & (F.col("val") == 100)).count() == 1
    # exactly-one-row-per-key invariant
    assert got.select("id").distinct().count() == 405


def test_merge_rejects_duplicate_keys_allows_null_keys(spark, tmp_path):
    from ratatool_spark.operators.snapshots import merge_snapshot

    path = _range_local_table(spark, tmp_path)
    dup = spark.createDataFrame(
        [(5, -1), (5, -2)], "id long, val long"
    )
    with pytest.raises(ValueError, match="duplicate-key"):
        merge_snapshot(spark, path, dup, ["id"])
    # NULL-key rows are plain inserts, not duplicates of each other
    nulls = spark.createDataFrame(
        [(None, -1), (None, -2), (7, -3)], "id long, val long"
    )
    merge_snapshot(spark, path, nulls, ["id"])
    got = read_snapshot(spark, path)
    assert got.where(F.col("id").isNull()).count() == 2
    assert got.where((F.col("id") == 7) & (F.col("val") == -3)).count() == 1
    assert got.count() == 402  # 400 - 1 replaced + 3 inserts


@pytest.mark.parametrize("seed", [3, 41])
def test_merge_randomized_sequence_equals_dict_fold(spark, tmp_path, seed):
    """Fuzzed upsert contract: any sequence of unique-key change batches
    merged one by one equals the driver-side dict fold (last write per
    key wins, new keys accumulate)."""
    import random

    from ratatool_spark.operators.snapshots import merge_snapshot

    rng = random.Random(seed)
    path = str(tmp_path / f"fz{seed}")
    state = {i: i * 2 for i in range(60)}
    commit_append(
        spark.createDataFrame(
            sorted(state.items()), "id long, val long"
        ),
        path,
    )
    for b in range(4):
        ks = rng.sample(range(120), rng.randint(1, 25))
        batch = {k: rng.randint(-999, 999) for k in ks}
        state.update(batch)
        merge_snapshot(
            spark,
            path,
            spark.createDataFrame(sorted(batch.items()), "id long, val long"),
            ["id"],
        )
    got = {
        r["id"]: r["val"] for r in read_snapshot(spark, path).collect()
    }
    assert got == state


def test_merge_all_null_key_batch_is_pure_insert(spark, tmp_path):
    from ratatool_spark.operators.snapshots import merge_snapshot

    path = _range_local_table(spark, tmp_path)
    before = {e["path"] for e in read_manifest(path)["files"]}
    nulls = spark.createDataFrame(
        [(None, -1), (None, -2)], "id long, val long"
    )
    merge_snapshot(spark, path, nulls, ["id"])
    after = {e["path"] for e in read_manifest(path)["files"]}
    assert before <= after  # no existing file rewritten
    got = read_snapshot(spark, path)
    assert got.count() == 402
    assert got.where(F.col("id").isNull()).count() == 2


def test_merge_snapshot_empty_batch_noop(spark, tmp_path):
    from ratatool_spark.operators.snapshots import merge_snapshot

    path = _range_local_table(spark, tmp_path)
    empty = read_snapshot(spark, path).where(F.lit(False))
    assert merge_snapshot(spark, path, empty, ["id"]) == 4


def test_delete_snapshot_where_complement_kept(spark, tmp_path):
    from ratatool_spark.operators.snapshots import delete_snapshot_where

    path = _range_local_table(spark, tmp_path)
    before = {e["path"] for e in read_manifest(path)["files"]}
    sid = delete_snapshot_where(spark, path, {"id": (150, 249)})
    assert sid == 5
    after = {e["path"] for e in read_manifest(path)["files"]}
    assert before & after  # files 0 and 3 carried over untouched
    got = read_snapshot(spark, path)
    assert got.count() == 300
    assert got.where(F.col("id").between(150, 249)).count() == 0
    assert got.where(F.col("id") == 149).count() == 1
    assert got.where(F.col("id") == 250).count() == 1
    # old snapshot still holds the data until expiry (erasure note)
    assert read_snapshot(spark, path, 4).count() == 400


def test_delete_where_keeps_null_rows(spark, tmp_path):
    """NULL-valued rows never match a range predicate — they must
    survive a CoW delete that rewrites their file."""
    from ratatool_spark.operators.snapshots import delete_snapshot_where

    path = str(tmp_path / "tb")
    df = spark.range(10).coalesce(1).select(
        F.when(F.col("id") == 3, F.lit(None)).otherwise(F.col("id"))
        .cast("long").alias("id"),
        F.lit(1).cast("long").alias("val"),
    )
    commit_append(df, path)
    delete_snapshot_where(spark, path, {"id": (0, 9)})
    got = read_snapshot(spark, path).collect()
    assert len(got) == 1 and got[0]["id"] is None


def test_stream_append_batches_and_replay_idempotent(spark, tmp_path):
    """Streaming sink: one atomic commit per micro-batch; re-delivering
    the same batch ids (fresh checkpoint -> ids restart at 0) changes
    NOTHING — the manifest ledger makes at-least-once delivery
    exactly-once table contents."""
    from ratatool_spark.operators.snapshots import (
        current_snapshot_id,
        read_snapshot,
    )
    from ratatool_spark.streaming.snapshots import (
        committed_stream_batches,
        stream_snapshot_append,
    )

    src = spark.range(90).select(
        F.col("id").cast("long"), (F.col("id") % 5).cast("long").alias("grp")
    )
    in_dir = str(tmp_path / "in")
    src.repartitionByRange(3, F.col("id")).write.parquet(in_dir)
    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    tbl = str(tmp_path / "tbl")
    q = stream_snapshot_append(stream, tbl, checkpoint=str(tmp_path / "ck1"))
    q.awaitTermination()
    assert current_snapshot_id(tbl) == 3
    assert committed_stream_batches(tbl) == {0, 1, 2}
    assert read_snapshot(spark, tbl).count() == 90
    # redeliver everything under a FRESH checkpoint: same batch ids,
    # ledger hits, zero new commits
    stream2 = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q2 = stream_snapshot_append(stream2, tbl, checkpoint=str(tmp_path / "ck2"))
    q2.awaitTermination()
    assert current_snapshot_id(tbl) == 3
    assert read_snapshot(spark, tbl).count() == 90


def test_snapshot_changes_incremental_scan(spark, tmp_path):
    from ratatool_spark.operators.snapshots import (
        compact_snapshot,
        snapshot_changes,
    )

    path = _tbl(spark, tmp_path, n=3, rows=10)  # ids 0-9, 10-19, 20-29
    # everything since snapshot 1 = commits 2 and 3
    got = snapshot_changes(spark, path, 1)
    assert sorted(r["id"] for r in got.collect()) == list(range(10, 30))
    # from 0 = the whole table
    assert snapshot_changes(spark, path, 0).count() == 30
    # a replace commit (compaction) is maintenance, not data change
    compact_snapshot(spark, path, target_bytes=1 << 30)  # snapshot 4
    assert snapshot_changes(spark, path, 3).count() == 0
    # an append AFTER the compaction surfaces exactly its own rows,
    # even though the compacted file is also "new" since snapshot 3
    commit_append(
        spark.range(100, 105).select(
            F.col("id").cast("long"),
            (F.col("id") % 7).cast("long").alias("grp"),
        ),
        path,
    )
    got2 = snapshot_changes(spark, path, 3)
    assert sorted(r["id"] for r in got2.collect()) == [100, 101, 102, 103, 104]
    with pytest.raises(ValueError, match="bad snapshot range"):
        snapshot_changes(spark, path, 9, 2)


def test_evolve_add_columns_metadata_only(spark, tmp_path):
    from ratatool_spark.operators.snapshots import evolve_add_columns

    path = _tbl(spark, tmp_path, n=2, rows=10)
    files_before = {e["path"] for e in read_manifest(path)["files"]}
    sid = evolve_add_columns(spark, path, {"tag": "string"})
    assert sid == 3
    m = read_manifest(path)
    assert m["operation"] == "evolve"
    assert {e["path"] for e in m["files"]} == files_before  # no rewrite
    got = read_snapshot(spark, path)
    assert got.columns == ["id", "grp", "tag"]
    assert got.where(F.col("tag").isNull()).count() == 20  # old files: NULL
    # appends must now carry the new column
    with pytest.raises(ValueError, match="schema mismatch"):
        commit_append(
            spark.range(3).select(
                F.col("id").cast("long"),
                F.lit(0).cast("long").alias("grp"),
            ),
            path,
        )
    commit_append(
        spark.range(3).select(
            F.col("id").cast("long"),
            F.lit(0).cast("long").alias("grp"),
            F.lit("x").alias("tag"),
        ),
        path,
    )
    cur = read_snapshot(spark, path)
    assert cur.where(F.col("tag") == "x").count() == 3
    # time travel BEFORE the evolution serves the old shape
    assert read_snapshot(spark, path, 2).columns == ["id", "grp"]
    with pytest.raises(ValueError, match="already exists"):
        evolve_add_columns(spark, path, {"tag": "string"})


def _age(path_or_dir, seconds=24 * 3600):
    """Backdate mtimes (recursively for a dir) — simulates an orphan old
    enough to be outside the vacuum retention window."""
    import time

    old = time.time() - seconds
    if os.path.isdir(path_or_dir):
        for root, dirs, files in os.walk(path_or_dir, topdown=False):
            for f in files + dirs:
                os.utime(os.path.join(root, f), (old, old))
        os.utime(path_or_dir, (old, old))
    else:
        os.utime(path_or_dir, (old, old))


def test_vacuum_orphans_removes_only_aged_unreferenced(spark, tmp_path):
    from ratatool_spark.operators.snapshots import vacuum_orphans

    path = _tbl(spark, tmp_path, n=2, rows=10)
    orphan_dir = os.path.join(path, "data", "feedface")
    spark.range(7).coalesce(1).select(
        F.col("id").cast("long"), F.lit(0).cast("long").alias("grp")
    ).write.parquet(orphan_dir)
    # fresh orphan: inside the retention window, default vacuum spares it
    assert vacuum_orphans(path, delete=False) == []
    _age(orphan_dir)  # now outside the window
    dry = vacuum_orphans(path, delete=False)
    assert len(dry) == 1 and dry[0].startswith("data/feedface")
    assert os.path.exists(os.path.join(path, dry[0]))  # dry run
    dead = vacuum_orphans(path)
    assert dead == dry
    assert not os.path.exists(orphan_dir)
    # table intact
    assert read_snapshot(spark, path).count() == 20
    assert vacuum_orphans(path) == []


def test_vacuum_spares_in_flight_commit(spark, tmp_path):
    """The data-loss race the retention guard exists for: a committer has
    written its data files but not yet published its manifest. A vacuum
    running in that window must NOT delete them; the commit must then
    publish and read back intact."""
    from ratatool_spark.operators.snapshots import (
        _publish,
        _write_data_files,
        vacuum_orphans,
    )

    path = _tbl(spark, tmp_path, n=1, rows=10)
    in_flight = spark.range(100, 105).select(
        F.col("id").cast("long"), F.lit(0).cast("long").alias("grp")
    )
    files = _write_data_files(in_flight, path)  # manifest NOT yet published
    assert vacuum_orphans(path) == []  # default retention spares them
    for e in files:
        assert os.path.exists(os.path.join(path, e["path"]))
    m = read_manifest(path)
    _publish(path, 1, m["files"] + files, m["schema"], "append")
    got = read_snapshot(spark, path)
    assert got.count() == 15
    assert got.where(F.col("id") >= 100).count() == 5
    # but older_than=0 (offline/single-writer maintenance) WOULD have
    # taken them — the guard is the only thing standing in between
    files2 = _write_data_files(in_flight, path)
    dead = vacuum_orphans(path, older_than=0.0)
    assert sorted(e["path"] for e in files2) == dead


def test_merge_nan_float_key_touches_all_files(spark, tmp_path):
    """A NaN in a float key column degenerates the stats bounding box
    (nothing compares >= / <= NaN) — merge must fall back to touching
    every file, or matching keys in the same batch would silently
    duplicate."""
    from ratatool_spark.operators.snapshots import merge_snapshot

    path = str(tmp_path / "nan")
    base = spark.createDataFrame(
        [(1.0, 10), (2.0, 20), (float("nan"), 30)], "k double, val long"
    ).coalesce(1)
    commit_append(base, path)
    changes = spark.createDataFrame(
        [(2.0, -2), (float("nan"), -3), (9.0, -9)], "k double, val long"
    )
    merge_snapshot(spark, path, changes, ["k"])
    got = read_snapshot(spark, path)
    assert got.count() == 4  # 3 - 2 replaced + 3 = 4 (NaN matched NaN)
    vals = {r["val"] for r in got.collect()}
    assert vals == {10, -2, -3, -9}


def test_snapshot_changes_expired_cursor_dedicated_error(spark, tmp_path):
    from ratatool_spark.operators.snapshots import (
        SnapshotExpired,
        compact_snapshot,
        snapshot_changes,
    )

    path = _tbl(spark, tmp_path, n=3, rows=10)
    compact_snapshot(spark, path, target_bytes=1 << 30)  # v4
    expire_snapshots(path, keep_last=2)  # drops v1, v2
    with pytest.raises(SnapshotExpired, match="rebase"):
        snapshot_changes(spark, path, 1)
    with pytest.raises(SnapshotExpired, match="rebase"):
        snapshot_changes(spark, path, 0)  # baseline replay also gone
    # a retained cursor still works
    assert snapshot_changes(spark, path, 3).count() == 0


def test_cli_snapshot_merge_delete_cluster(spark, tmp_path, capsys):
    from ratatool_spark.cli import main

    base = str(tmp_path / "base")
    spark.range(100).coalesce(1).select(
        F.col("id").cast("long"), (F.col("id") * 2).cast("long").alias("val")
    ).write.parquet(base)
    tbl = str(tmp_path / "tbl")
    assert main(["snapshot", "--mode", "append", "--table", tbl,
                 "--input", base]) == 0
    ch = str(tmp_path / "ch")
    spark.range(5).coalesce(1).select(
        F.col("id").cast("long"), F.lit(-1).cast("long").alias("val")
    ).write.parquet(ch)
    assert main(["snapshot", "--mode", "merge", "--table", tbl,
                 "--input", ch, "--keys", "id"]) == 0
    assert main(["snapshot", "--mode", "cluster", "--table", tbl,
                 "--zorderBy", "id,val"]) == 0
    assert main(["snapshot", "--mode", "delete", "--table", tbl,
                 "--where", "id:90:99"]) == 0
    out = str(tmp_path / "out")
    assert main(["snapshot", "--mode", "read", "--table", tbl,
                 "--where", "id:0:9", "--output", out]) == 0
    got = spark.read.parquet(out)
    assert got.count() == 10
    assert got.where(F.col("val") == -1).count() == 5
    from ratatool_spark.operators.snapshots import read_snapshot
    assert read_snapshot(spark, tbl).count() == 90


def test_manifest_schema_roundtrip_empty_read(spark, tmp_path):
    """A replace that removes everything leaves an empty but readable
    table with the pinned schema."""
    path = _tbl(spark, tmp_path, n=1)
    paths = [e["path"] for e in read_manifest(path)["files"]]
    commit_replace(spark, path, paths, None)
    empty = read_snapshot(spark, path)
    assert empty.count() == 0
    assert empty.columns == ["id", "grp"]
    assert json.loads(read_manifest(path)["schema"])  # schema retained
