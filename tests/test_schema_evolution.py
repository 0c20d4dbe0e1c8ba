"""Field-id schema evolution (operators/snapshots.rename_column /
widen_column_type — the Iceberg column-id model): renames and exact
type promotions are metadata-only commits; files written under any
historical schema version resolve by STABLE field id at read time, so
old bytes serve under new names/types, stats pruning stays sound, and
merge-on-read sidecars keep shadowing across renames.

Reference parity note: ratatool has no table layer; this mirrors the
public Iceberg spec (field ids, schema-id per data file, allowed
primitive promotions int→long / float→double)."""

import glob
import json

import pytest
from pyspark.sql import functions as F

import ratatool_spark.operators.snapshots as snap


def _mk(spark, tmp_path, name="t", n=12):
    path = str(tmp_path / name)
    df = spark.range(n).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") * 2).cast("int").alias("x"),
        F.concat(F.lit("s"), F.col("id")).alias("s"),
    )
    snap.commit_append(df.coalesce(2), path)
    return path


def test_rename_is_metadata_only_and_serves_old_bytes(spark, tmp_path):
    path = _mk(spark, tmp_path)
    files0 = set(glob.glob(f"{path}/data/**/*.parquet", recursive=True))
    snap.rename_column(path, "x", "payload")
    assert set(glob.glob(f"{path}/data/**/*.parquet", recursive=True)) == files0
    cur = snap.read_snapshot(spark, path)
    assert cur.columns == ["k", "payload", "s"]
    assert cur.agg(F.sum("payload")).first()[0] == sum(2 * i for i in range(12))
    # time travel to the pre-rename snapshot serves the old name
    assert snap.read_snapshot(spark, path, snapshot_id=1).columns == [
        "k", "x", "s"]


def test_widen_is_metadata_only_and_casts_old_files(spark, tmp_path):
    path = _mk(spark, tmp_path)
    snap.widen_column_type(path, "k", "bigint")
    cur = snap.read_snapshot(spark, path)
    assert dict(cur.dtypes)["k"] == "bigint"
    assert cur.agg(F.sum("k")).first()[0] == sum(range(12))
    # appends must now carry the widened type; the narrow shape is stale
    narrow = spark.createDataFrame([(99, 1, "z")], "k int, x int, s string")
    with pytest.raises(ValueError, match="schema mismatch"):
        snap.commit_append(narrow, path)
    wide = spark.createDataFrame([(99, 1, "z")], "k bigint, x int, s string")
    snap.commit_append(wide, path)
    assert snap.read_snapshot(spark, path).count() == 13


def test_widen_refuses_non_promotions(spark, tmp_path):
    path = _mk(spark, tmp_path)
    for bad in [("k", "string"), ("s", "bigint"), ("k", "int")]:
        with pytest.raises(ValueError, match="not an exact promotion"):
            snap.widen_column_type(path, *bad)
    snap.widen_column_type(path, "k", "bigint")
    with pytest.raises(ValueError, match="not an exact promotion"):
        snap.widen_column_type(path, "k", "int")  # never narrow back


def test_rename_refuses_collision_and_missing(spark, tmp_path):
    path = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="already exists"):
        snap.rename_column(path, "x", "s")
    with pytest.raises(ValueError, match="no column"):
        snap.rename_column(path, "nope", "y")


def test_evolution_refused_on_spec_and_constraint_columns(spark, tmp_path):
    path = str(tmp_path / "tp")
    df = spark.range(8).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") % 3).cast("int").alias("b"),
    )
    snap.commit_append(
        df, path, partition_spec=[{"col": "b", "transform": "identity"}]
    )
    with pytest.raises(ValueError, match="partition-spec source"):
        snap.rename_column(path, "b", "bucketed")
    snap.add_constraint(spark, path, "k_pos", "k >= 0")
    with pytest.raises(ValueError, match="CHECK constraint"):
        snap.widen_column_type(path, "k", "bigint")
    snap.drop_constraint(path, "k_pos")
    assert snap.widen_column_type(path, "k", "bigint") > 0


def test_mixed_version_append_and_aggregate(spark, tmp_path):
    path = _mk(spark, tmp_path)
    snap.rename_column(path, "x", "payload")
    snap.commit_append(
        spark.range(12, 20).select(
            F.col("id").cast("int").alias("k"),
            (F.col("id") * 2).cast("int").alias("payload"),
            F.lit("new").alias("s"),
        ),
        path,
    )
    cur = snap.read_snapshot(spark, path)
    assert cur.count() == 20
    assert cur.agg(F.sum("payload")).first()[0] == sum(2 * i for i in range(20))
    # manifest entries carry their write-time version
    m = snap.read_manifest(path)
    assert {e.get("schema_v", 0) for e in m["files"]} == {0, 1}
    # version 0 genuinely existed pre-rename: the log pins both bindings
    log = m["schema_log"]
    assert [c["name"] for c in log["0"]] == ["k", "x", "s"]
    assert [c["name"] for c in log["1"]] == ["k", "payload", "s"]
    ids = lambda v: [c["id"] for c in log[v]]  # noqa: E731
    assert ids("0") == ids("1")  # renames re-bind, never re-id


def test_stats_pruning_translates_across_rename(spark, tmp_path):
    """Predicates on the NEW name must still prune files via their OLD-
    name stats; after a rename that REUSES a retired name, the reused
    name must NOT match the old field's stats (the unsound case a
    name-keyed lookup would hit)."""
    path = str(tmp_path / "tt")
    df = spark.range(100).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") + 1000).cast("int").alias("x"),
    )
    snap.commit_append(df.repartitionByRange(4, "x"), path)
    snap.rename_column(path, "x", "y")
    m = snap.read_manifest(path)
    kept = snap.files_intersecting(m, {"y": (1000, 1010)})
    assert 0 < len(kept) < len(m["files"])  # old-name stats still prune
    got = snap.read_snapshot(spark, path, where={"y": (1000, 1010)})
    assert sorted(r["y"] for r in got.collect()) == list(range(1000, 1011))
    # reuse the retired name for a DIFFERENT field: k -> x. A predicate
    # on the reused name must consult old-k stats, NOT old-x stats
    # (which would unsoundly prune everything: old x is all >= 1000)
    snap.rename_column(path, "k", "x")
    got2 = snap.read_snapshot(spark, path, where={"x": (90, 99)})
    assert got2.count() == 10


def test_pruning_drops_files_predating_a_column(spark, tmp_path):
    path = _mk(spark, tmp_path)
    snap.rename_column(path, "x", "payload")  # ids assigned
    snap.evolve_add_columns(spark, path, {"extra": "int"})
    snap.commit_append(
        spark.createDataFrame([(50, 1, "n", 7)],
                              "k int, payload int, s string, extra int")
        .coalesce(1),
        path,
    )
    m = snap.read_manifest(path)
    kept = snap.files_intersecting(m, {"extra": (0, 100)})
    assert len(kept) == 1  # pre-add files are all-NULL there: dropped
    got = snap.read_snapshot(spark, path, where={"extra": (0, 100)})
    assert [r["k"] for r in got.collect()] == [50]


def test_spark_and_python_pruning_agree_on_evolved_table(spark, tmp_path):
    path = str(tmp_path / "eq")
    df = spark.range(200).select(
        F.col("id").cast("int").alias("k"),
        F.col("id").cast("int").alias("x"),
    )
    snap.commit_append(df.repartitionByRange(5, "x"), path)
    snap.rename_column(path, "x", "y")
    snap.commit_append(
        spark.range(200, 300).select(
            F.col("id").cast("int").alias("k"),
            F.col("id").cast("int").alias("y"),
        ).repartitionByRange(3, "y"),
        path,
    )
    m = snap.read_manifest(path)
    where = {"y": (150, 220)}
    py = {e["path"] for e in snap.files_intersecting(m, where)}
    mdf = snap.manifest_files_df(spark, path)
    sp = {
        r["path"]
        for r in snap.files_intersecting_spark(mdf, where, m=m).collect()
    }
    assert sp == py and 0 < len(py) < len(m["files"])


def test_externalized_sidecar_roundtrips_schema_v(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(snap, "FILES_INLINE_MAX", 0)
    path = _mk(spark, tmp_path)
    snap.rename_column(path, "x", "payload")
    snap.commit_append(
        spark.createDataFrame([(99, 1, "z")], "k int, payload int, s string"),
        path,
    )
    m = snap.read_manifest(path)
    assert "files_ref" in m
    assert {e.get("schema_v", 0) for e in m["files"]} == {0, 1}
    cur = snap.read_snapshot(spark, path)
    assert cur.count() == 13
    assert cur.agg(F.sum("payload")).first()[0] == sum(
        2 * i for i in range(12)) + 1
    # pruned externalized read plans via the Spark job with translation
    got = snap.read_snapshot(spark, path, where={"payload": (0, 4)})
    assert sorted(r["k"] for r in got.collect()) == [0, 1, 2, 99]


def test_cow_merge_on_renamed_and_widened_key(spark, tmp_path):
    path = _mk(spark, tmp_path)
    snap.rename_column(path, "k", "key")
    snap.widen_column_type(path, "key", "bigint")
    ch = spark.createDataFrame(
        [(3, 999, "upd"), (100, 1, "ins")], "key bigint, x int, s string"
    )
    snap.merge_snapshot(spark, path, ch, ["key"])
    t = snap.read_snapshot(spark, path)
    assert t.count() == 13
    assert t.where("key = 3").first()["x"] == 999


def test_mor_delete_shadows_across_rename(spark, tmp_path):
    """An equality-delete sidecar written BEFORE a rename must keep
    shadowing rows read AFTER it (keys translate by field id), and
    fold_deletes must materialize it correctly."""
    path = _mk(spark, tmp_path)
    ch = spark.createDataFrame([(5, 555, "mor")], "k int, x int, s string")
    snap.merge_snapshot_mor(spark, path, ch, ["k"])
    snap.rename_column(path, "k", "key")
    t = snap.read_snapshot(spark, path)
    assert t.where("key = 5").collect() == [
        r for r in t.collect() if r["key"] == 5]
    assert t.where("key = 5").first()["x"] == 555 and t.count() == 12
    snap.fold_deletes(spark, path)
    t2 = snap.read_snapshot(spark, path)
    assert t2.count() == 12 and t2.where("key = 5").first()["x"] == 555


def test_mor_range_delete_box_translates(spark, tmp_path):
    path = _mk(spark, tmp_path)
    snap.delete_snapshot_where_mor(spark, path, {"x": (0, 9)})  # k 0..4
    snap.rename_column(path, "x", "payload")
    t = snap.read_snapshot(spark, path)
    assert sorted(r["k"] for r in t.collect()) == list(range(5, 12))
    snap.fold_deletes(spark, path)
    assert snap.read_snapshot(spark, path).count() == 7


def test_change_feed_normalizes_across_rename(spark, tmp_path):
    path = _mk(spark, tmp_path)  # snapshot 1: insert 12
    snap.rename_column(path, "x", "payload")  # snapshot 2
    ch = spark.createDataFrame([(0, 777, "u")], "k int, payload int, s string")
    snap.merge_snapshot(spark, path, ch, ["k"])  # snapshot 3
    feed = snap.snapshot_change_feed(spark, path, 0)
    assert feed.columns == [
        "k", "payload", "s", "_change_type", "_commit_snapshot_id"]
    by = {r["_change_type"]: r["n"] for r in
          feed.groupBy("_change_type").agg(F.count("*").alias("n")).collect()}
    assert by == {"insert": 12, "update_preimage": 1, "update_postimage": 1}
    # pre-rename inserts surface under the NEW name with their values
    ins = feed.where("_change_type = 'insert'")
    assert ins.agg(F.sum("payload")).first()[0] == sum(2 * i for i in range(12))
    # file-level incremental scan normalizes the same way
    inc = snap.snapshot_changes(spark, path, 0)
    assert inc.columns == ["k", "payload", "s"] and inc.count() == 12


def test_compaction_folds_old_versions_to_current(spark, tmp_path):
    path = _mk(spark, tmp_path)
    snap.rename_column(path, "x", "payload")
    snap.commit_append(
        spark.createDataFrame([(99, 1, "z")], "k int, payload int, s string"),
        path,
    )
    snap.compact_snapshot(spark, path, target_bytes=1 << 30)
    m = snap.read_manifest(path)
    assert {e.get("schema_v", 0) for e in m["files"]} == {m["schema_v"]}
    assert snap.read_snapshot(spark, path).count() == 13


def test_rollback_restores_pre_rename_binding(spark, tmp_path):
    path = _mk(spark, tmp_path)
    snap.rename_column(path, "x", "payload")
    snap.rollback_snapshot(path, 1)
    t = snap.read_snapshot(spark, path)
    assert t.columns == ["k", "x", "s"] and t.count() == 12
    m = snap.read_manifest(path)
    assert "columns" not in m  # pre-evolution state restored verbatim
    # evolution after the rollback starts a fresh id assignment
    snap.rename_column(path, "x", "x2")
    assert snap.read_snapshot(spark, path).columns == ["k", "x2", "s"]


def test_add_columns_after_ids_get_fresh_ids(spark, tmp_path):
    path = _mk(spark, tmp_path)
    snap.rename_column(path, "x", "payload")
    snap.evolve_add_columns(spark, path, {"extra": "double"})
    m = snap.read_manifest(path)
    ids = [c["id"] for c in m["columns"]]
    assert len(ids) == len(set(ids)) and max(ids) == 4
    snap.rename_column(path, "extra", "bonus")
    cur = snap.read_snapshot(spark, path)
    assert cur.columns == ["k", "payload", "s", "bonus"]
    assert cur.where("bonus IS NOT NULL").count() == 0


def test_time_travel_between_evolutions(spark, tmp_path):
    path = _mk(spark, tmp_path)  # v1
    snap.rename_column(path, "x", "a")  # v2
    snap.rename_column(path, "a", "b")  # v3
    assert snap.read_snapshot(spark, path, snapshot_id=2).columns == [
        "k", "a", "s"]
    assert snap.read_snapshot(spark, path, snapshot_id=3).columns == [
        "k", "b", "s"]


def test_wap_stage_survives_evolution_check(spark, tmp_path):
    """A stage created before an evolution commit is STALE (main
    advanced) — publish refuses it, exactly like any other concurrent
    commit, so a staged batch can never publish under a mis-bound
    schema."""
    path = _mk(spark, tmp_path)
    snap.stage_append(
        spark.createDataFrame([(77, 1, "w")], "k int, x int, s string"),
        path, "audit",
    )
    snap.rename_column(path, "x", "payload")
    with pytest.raises(snap.CommitConflict):
        snap.publish_branch(spark, path, "audit")


def test_position_delete_survives_rename(spark, tmp_path):
    path = _mk(spark, tmp_path)
    snap.delete_snapshot_rows_mor(spark, path, "x = 6 OR s = 's9'")
    snap.rename_column(path, "x", "payload")
    t = snap.read_snapshot(spark, path)
    assert sorted(r["k"] for r in t.collect()) == [
        i for i in range(12) if i not in (3, 9)]


def test_manifest_json_shape_is_self_contained(spark, tmp_path):
    path = _mk(spark, tmp_path)
    snap.rename_column(path, "x", "payload")
    snap.commit_append(
        spark.createDataFrame([(99, 1, "z")], "k int, payload int, s string"),
        path,
    )
    with open(snap._snap_path(path, 3)) as f:
        m = json.load(f)
    assert m["schema_v"] == 1 and "0" in m["schema_log"]
    assert json.loads(m["schema"])["fields"][1]["name"] == "payload"


def test_initial_default_values(spark, tmp_path):
    """Iceberg-v3/Delta initial defaults: rows that existed BEFORE the
    add surface the default; rows written after carry the writer's
    value (including NULL) — distinguishable because nothing was
    rewritten."""
    path = _mk(spark, tmp_path)  # 12 pre-add rows
    snap.evolve_add_columns(
        spark, path, {"lang": "string", "qscore": "double"},
        defaults={"lang": "en", "qscore": 0.5},
    )
    snap.commit_append(
        spark.createDataFrame(
            [(99, 1, "z", "fr", None)],
            "k int, x int, s string, lang string, qscore double",
        ).coalesce(1),
        path,
    )
    t = snap.read_snapshot(spark, path)
    by_lang = {r["lang"]: r["n"] for r in
               t.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_lang == {"en": 12, "fr": 1}
    assert t.where("qscore IS NULL").count() == 1  # the writer's NULL
    assert t.where("qscore = 0.5").count() == 12
    # time travel to the pre-add snapshot has no such column at all
    assert "lang" not in snap.read_snapshot(spark, path, snapshot_id=1).columns


def test_default_aware_pruning(spark, tmp_path):
    """A pruning predicate on a defaulted column keeps pre-add files
    iff the default is inside the range — and drops them when not."""
    path = _mk(spark, tmp_path)
    snap.evolve_add_columns(spark, path, {"qscore": "double"},
                            defaults={"qscore": 0.5})
    snap.commit_append(
        spark.createDataFrame(
            [(99, 1, "z", 0.9)], "k int, x int, s string, qscore double"
        ).coalesce(1),
        path,
    )
    m = snap.read_manifest(path)
    n_total = len(m["files"])
    in_range = snap.files_intersecting(m, {"qscore": (0.4, 0.6)})
    assert len(in_range) == n_total - 1  # every pre-add file, not 0.9
    assert all(e.get("schema_v", 0) == 0 for e in in_range)  # old only
    out_range = snap.files_intersecting(m, {"qscore": (0.8, 1.0)})
    assert all(e.get("schema_v", 0) != 0 for e in out_range)  # new only
    got = snap.read_snapshot(spark, path, where={"qscore": (0.4, 0.6)})
    assert got.count() == 12
    got2 = snap.read_snapshot(spark, path, where={"qscore": (0.8, 1.0)})
    assert [r["k"] for r in got2.collect()] == [99]
    # Spark planning path agrees
    mdf = snap.manifest_files_df(spark, path)
    sp = {r["path"] for r in snap.files_intersecting_spark(
        mdf, {"qscore": (0.4, 0.6)}, m=m).collect()}
    assert sp == {e["path"] for e in in_range}


def test_default_survives_rename_and_feed(spark, tmp_path):
    path = _mk(spark, tmp_path)
    snap.evolve_add_columns(spark, path, {"lang": "string"},
                            defaults={"lang": "en"})
    snap.rename_column(path, "lang", "language")
    t = snap.read_snapshot(spark, path)
    assert t.where("language = 'en'").count() == 12
    feed = snap.snapshot_change_feed(spark, path, 0)
    ins = feed.where("_change_type = 'insert'")
    assert ins.where("language = 'en'").count() == 12


def test_default_refusals(spark, tmp_path):
    path = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="not being added"):
        snap.evolve_add_columns(spark, path, {"a": "int"},
                                defaults={"b": 1})
    with pytest.raises(ValueError, match="JSON scalar"):
        snap.evolve_add_columns(spark, path, {"a": "array<int>"},
                                defaults={"a": [1]})


@pytest.mark.parametrize("seed", [11, 271])
def test_randomized_ops_with_evolution_equal_model(spark, tmp_path, seed):
    """Whole-layer fuzz, EVOLUTION edition: a random interleaving of
    append / CoW merge / MoR merge / range delete / fold / compact /
    RENAME / WIDEN / rollback — on a bloom-filtered table — must equal
    the driver-side dict model after every op (values read under the
    current binding), and every retained snapshot must time-travel to
    the model state AND column names recorded when it was current."""
    import os
    import random

    rng = random.Random(seed)
    path = str(tmp_path / f"ev{seed}")
    os.makedirs(path)
    snap.set_bloom_filter(path, ["id"], bits_per_key=10)

    id_t, vname = "int", "val"
    widened = False

    def df_of(d):
        return spark.createDataFrame(
            sorted(d.items()), f"id {id_t}, {vname} long")

    state = {i: i * 10 for i in range(40)}
    snap.commit_append(df_of(state), path)
    history = {1: (dict(state), "val")}

    for _step in range(10):
        op = rng.choice(
            ["append", "merge", "merge_mor", "delete", "fold",
             "compact", "rename", "widen", "rollback"]
        )
        if op == "append":
            base = max(state, default=0) + 1
            batch = {base + j: rng.randint(-99, 99)
                     for j in range(rng.randint(1, 6))}
            state.update(batch)
            snap.commit_append(df_of(batch), path)
        elif op in ("merge", "merge_mor"):
            ks = rng.sample(range(120), rng.randint(1, 9))
            batch = {k: rng.randint(-999, 999) for k in ks}
            state.update(batch)
            fn = (snap.merge_snapshot if op == "merge"
                  else snap.merge_snapshot_mor)
            fn(spark, path, df_of(batch), ["id"])
        elif op == "delete":
            lo = rng.randint(0, 100)
            hi = lo + rng.randint(0, 25)
            state = {k: v for k, v in state.items() if not lo <= k <= hi}
            snap.delete_snapshot_where(spark, path, {"id": (lo, hi)})
        elif op == "fold":
            snap.fold_deletes(spark, path)
        elif op == "compact":
            snap.compact_snapshot(spark, path, target_bytes=1 << 30)
        elif op == "rename":
            new = f"v{_step}"
            snap.rename_column(path, vname, new)
            vname = new
        elif op == "widen":
            if not widened:
                snap.widen_column_type(path, "id", "bigint")
                id_t, widened = "bigint", True
            else:
                continue  # no-op this step
        else:  # rollback to a random retained snapshot
            target = rng.choice(sorted(history))
            snap.rollback_snapshot(path, target)
            st, vn = history[target]
            state, vname = dict(st), vn
            # id type follows the restored binding
            m = snap.read_manifest(path)
            import json as _json

            idt = _json.loads(m["schema"])["fields"][0]["type"]
            id_t = {"integer": "int", "long": "bigint"}[idt]
            widened = id_t == "bigint"
        history[snap.current_snapshot_id(path)] = (dict(state), vname)
        got = {
            r["id"]: r[vname]
            for r in snap.read_snapshot(spark, path).collect()
        }
        assert got == state, f"divergence after {op} (step {_step})"
        # a bloom point-read through whatever evolution happened so far
        if state:
            probe = rng.choice(sorted(state))
            pr = snap.read_snapshot(
                spark, path, where={"id": (probe, probe)}).collect()
            assert [(r["id"], r[vname]) for r in pr] == [
                (probe, state[probe])], f"bloom point read after {op}"

    for sid, (model, vn) in history.items():
        rows = snap.read_snapshot(spark, path, snapshot_id=sid).collect()
        got = {r["id"]: r[vn] for r in rows}
        assert got == model, f"time travel to {sid} diverged"
