"""Partition spec evolution (operators/snapshots.evolve_partition_spec
— Iceberg's model): the table's CURRENT spec can change over its
lifetime; files already written keep their old spec's layout and
tuples, future writes (appends AND maintenance rewrites) route through
the new spec, and pruning/drop stay sound on the mixed-spec table via
globally unique partition item names."""

import pytest
from pyspark.sql import functions as F

import ratatool_spark.operators.snapshots as snap


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") % 4).cast("int").alias("b"),
        F.concat(F.lit("m-"), (F.col("id") % 3)).alias("g"),
    )


def _mk(spark, tmp_path):
    path = str(tmp_path / "t")
    snap.commit_append(
        _df(spark, 0, 40), path,
        partition_spec=[{"col": "b", "transform": "identity"}],
    )
    return path


def test_evolve_appends_spec_with_global_names(spark, tmp_path):
    path = _mk(spark, tmp_path)
    snap.evolve_partition_spec(path, [{"col": "g", "transform": "identity"}])
    specs = snap.table_partition_specs(path)
    assert [[it["name"] for it in s] for s in specs] == [["p0"], ["p1"]]
    assert snap.table_partition_spec(path)[0]["col"] == "g"  # current
    # the evolve is a commit in table history
    m = snap.read_manifest(path)
    assert m["operation"] == "evolve-spec" and m["partition_spec_id"] == 1


def test_mixed_spec_reads_and_pruning(spark, tmp_path):
    path = _mk(spark, tmp_path)
    snap.evolve_partition_spec(path, [{"col": "g", "transform": "identity"}])
    snap.commit_append(_df(spark, 40, 60), path)
    m = snap.read_manifest(path)
    keysets = {frozenset(e["partition"]) for e in m["files"]}
    assert keysets == {frozenset({"p0"}), frozenset({"p1"})}
    assert snap.read_snapshot(spark, path).count() == 60
    # predicate on the OLD spec's column prunes old files by tuple
    items = snap._all_spec_items(path)
    kept = snap.partition_prune(spark, items, m["schema"], m["files"],
                                {"b": (2, 2)})
    old_kept = [e for e in kept if "p0" in e["partition"]]
    assert len(old_kept) == 1  # exactly the b=2 partition of spec 0
    assert all("p1" in e["partition"] or e in old_kept for e in kept)
    assert snap.read_snapshot(spark, path, where={"b": (2, 2)}).count() == 15
    # predicate on the NEW spec's column: new files prune by tuple
    kept_g = snap.partition_prune(spark, items, m["schema"], m["files"],
                                  {"g": ("m-1", "m-1")})
    new_kept = [e for e in kept_g if "p1" in e["partition"]]
    assert len(new_kept) == 1
    got = snap.read_snapshot(spark, path, where={"g": ("m-1", "m-1")})
    assert got.count() == len([i for i in range(60) if i % 3 == 1])


def test_drop_partition_refuses_until_realigned(spark, tmp_path):
    path = _mk(spark, tmp_path)
    snap.evolve_partition_spec(path, [{"col": "g", "transform": "identity"}])
    snap.commit_append(_df(spark, 40, 60), path)
    # mixed specs: rows of g='m-1' hide in spec-0 files — refuse
    with pytest.raises(ValueError, match="partition alignment"):
        snap.drop_partition(spark, path, {"p1": "m-1"})
    with pytest.raises(ValueError, match="partition alignment"):
        snap.drop_partition(spark, path, {"p0": 2})
    # maintenance rewrites route through the CURRENT spec: the table
    # converges, then metadata-only drops work again
    snap.compact_snapshot(spark, path, target_bytes=1 << 30)
    m = snap.read_manifest(path)
    assert {frozenset(e["partition"]) for e in m["files"]} == {
        frozenset({"p1"})}
    n_m1 = snap.read_snapshot(
        spark, path, where={"g": ("m-1", "m-1")}).count()
    files_before = {e["path"] for e in m["files"]}
    snap.drop_partition(spark, path, {"p1": "m-1"})
    m2 = snap.read_manifest(path)
    assert {e["path"] for e in m2["files"]} < files_before  # pure removal
    assert snap.read_snapshot(spark, path).count() == 60 - n_m1


def test_evolve_refusals(spark, tmp_path):
    path = str(tmp_path / "u")
    snap.commit_append(_df(spark, 0, 10), path)  # unpartitioned
    with pytest.raises(ValueError, match="unpartitioned"):
        snap.evolve_partition_spec(path, [{"col": "b"}])
    path2 = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="not in the table schema"):
        snap.evolve_partition_spec(path2, [{"col": "nope"}])
    # "year" became a real transform in r11 — use a genuinely unknown one
    with pytest.raises(ValueError, match="unknown partition transform"):
        snap.evolve_partition_spec(
            path2, [{"col": "g", "transform": "fortnight"}])


def test_rename_refused_on_any_spec_version(spark, tmp_path):
    path = _mk(spark, tmp_path)
    snap.evolve_partition_spec(path, [{"col": "g", "transform": "identity"}])
    # b is only in the RETIRED spec — still refused: old files' tuples
    # prune through it
    with pytest.raises(ValueError, match="partition-spec source"):
        snap.rename_column(path, "b", "bucketed")
    with pytest.raises(ValueError, match="partition-spec source"):
        snap.rename_column(path, "g", "grp")
    # k is in no spec: evolution proceeds
    assert snap.widen_column_type(path, "k", "bigint") > 0


def test_spark_side_pruning_matches_driver_on_mixed_specs(spark, tmp_path):
    path = _mk(spark, tmp_path)
    snap.evolve_partition_spec(
        path, [{"col": "g", "transform": "identity"},
               {"col": "b", "transform": "identity"}])
    snap.commit_append(_df(spark, 40, 60), path)
    m = snap.read_manifest(path)
    items = snap._all_spec_items(path)
    for where in [{"b": (2, 2)}, {"g": ("m-0", "m-1")},
                  {"b": (1, 3), "g": ("m-2", "m-2")}]:
        py = {
            e["path"]
            for e in snap.files_intersecting(
                {**m, "files": snap.partition_prune(
                    spark, items, m["schema"], m["files"], where)},
                where,
            )
        }
        mdf = snap.manifest_files_df(spark, path)
        sp = {
            r["path"]
            for r in snap.files_intersecting_spark(
                mdf, where, spec=items, schema_json=m["schema"], m=m
            ).collect()
        }
        assert sp == py, where


def test_incremental_scan_unaffected_by_spec_evolution(spark, tmp_path):
    path = _mk(spark, tmp_path)
    s1 = snap.current_snapshot_id(path)
    snap.evolve_partition_spec(path, [{"col": "g", "transform": "identity"}])
    snap.commit_append(_df(spark, 40, 50), path)
    inc = snap.snapshot_changes(spark, path, s1)
    assert inc.count() == 10  # the evolve-spec commit contributes nothing


def test_evolve_spec_conflict_rolls_back_file(spark, tmp_path, monkeypatch):
    """A lost publish race must un-activate the just-written spec:
    otherwise writes between the conflict and the caller's retry would
    route through a spec no commit records."""
    path = _mk(spark, tmp_path)

    def boom(*a, **k):
        raise snap.CommitConflict("simulated race")

    monkeypatch.setattr(snap, "_publish", boom)
    with pytest.raises(snap.CommitConflict):
        snap.evolve_partition_spec(
            path, [{"col": "g", "transform": "identity"}])
    monkeypatch.undo()
    assert len(snap.table_partition_specs(path)) == 1  # rolled back
    # the retry then applies cleanly, exactly once
    snap.evolve_partition_spec(path, [{"col": "g", "transform": "identity"}])
    assert len(snap.table_partition_specs(path)) == 2


def test_evolve_spec_crash_retry_is_idempotent(spark, tmp_path, monkeypatch):
    """Crash AFTER the spec file was written but BEFORE the commit
    published: the retry must not append the spec a second time, and a
    retry after FULL success is a pure no-op."""
    path = _mk(spark, tmp_path)

    def boom(*a, **k):
        raise RuntimeError("simulated crash at publish")

    monkeypatch.setattr(snap, "_publish", boom)
    with pytest.raises(RuntimeError):
        snap.evolve_partition_spec(
            path, [{"col": "g", "transform": "identity"}])
    monkeypatch.undo()
    assert len(snap.table_partition_specs(path)) == 2  # file written
    # retry: publishes the ordering commit WITHOUT re-appending
    sid = snap.evolve_partition_spec(
        path, [{"col": "g", "transform": "identity"}])
    specs = snap.table_partition_specs(path)
    assert len(specs) == 2 and specs[-1][0]["name"] == "p1"
    assert snap.read_manifest(path, sid)["partition_spec_id"] == 1
    # fully applied: another identical call is a no-op commit-wise
    assert snap.evolve_partition_spec(
        path, [{"col": "g", "transform": "identity"}]) == sid
    assert snap.current_snapshot_id(path) == sid


def test_concurrent_distinct_tags_do_not_clobber(spark, tmp_path):
    """Per-tag files: creating N distinct tags (serially here, but the
    exclusive-create-per-file design is what makes the concurrent case
    safe) leaves all N readable."""
    path = _mk(spark, tmp_path)
    for i in range(5):
        snap.create_tag(path, f"t{i}", snapshot_id=1)
    assert sorted(snap.table_tags(path)) == [f"t{i}" for i in range(5)]
    with pytest.raises(ValueError, match="invalid tag name"):
        snap.create_tag(path, "../escape")
    with pytest.raises(ValueError, match="invalid tag name"):
        snap.create_tag(path, "")
