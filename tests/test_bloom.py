"""Per-file bloom-filter skipping (operators/snapshots.set_bloom_filter
— the Iceberg puffin / Delta bloom-index design): point-lookup and
scattered-merge file pruning beyond min/max stats. The invariant under
test everywhere: NO FALSE NEGATIVES — a file that holds a probed key is
never skipped; false positives only cost an extra file."""

import os

import pytest
from pyspark.sql import functions as F

import ratatool_spark.operators.snapshots as snap


def _mk(spark, tmp_path, n=4000, parts=6, bloom_cols=("k",)):
    path = str(tmp_path / "t")
    os.makedirs(path)
    snap.set_bloom_filter(path, list(bloom_cols), bits_per_key=10)
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") * 3).alias("v"),
        F.concat(F.lit("w"), F.col("id") % 17).alias("s"),
    )
    snap.commit_append(df.repartition(parts), path)
    return path


def test_blooms_built_and_no_false_negatives(spark, tmp_path):
    path = _mk(spark, tmp_path)
    m = snap.read_manifest(path)
    assert all("k" in e.get("bloom", {}) for e in m["files"])
    total = len(m["files"])
    pruned_any = False
    for key in [0, 1, 777, 1234, 3999]:
        kept = snap.bloom_prune_point(
            spark, m, m["files"], {"k": (key, key)})
        pruned_any = pruned_any or len(kept) < total
        got = snap.read_snapshot(spark, path, where={"k": (key, key)})
        assert [r["v"] for r in got.collect()] == [key * 3]  # never lost
    assert pruned_any  # and it actually skips files
    # an absent key usually prunes everything (no file can hold it)
    got = snap.read_snapshot(spark, path, where={"k": (10**9, 10**9)})
    assert got.count() == 0
    # range predicates are untouched by blooms
    assert snap.read_snapshot(spark, path, where={"k": (10, 20)}).count() == 11


def test_scattered_merge_refinement_matches_plain_cow(spark, tmp_path):
    path = _mk(spark, tmp_path)
    m0 = snap.read_manifest(path)
    keys = [0, 1999, 3999, 7, 2048]
    ch = spark.createDataFrame(
        [(k, -1, "upd") for k in keys] + [(10**6, -2, "ins")],
        "k bigint, v bigint, s string",
    )
    box_touch = len(snap.files_intersecting(m0, {"k": (0, 10**6)}))
    assert box_touch == len(m0["files"])  # the box is useless here
    snap.merge_snapshot(spark, path, ch, ["k"], record_changes=False)
    m1 = snap.read_manifest(path)
    carried = {e["path"] for e in m0["files"]} & {
        e["path"] for e in m1["files"]}
    assert len(carried) >= 1  # bloom shrank the rewrite set
    t = snap.read_snapshot(spark, path)
    assert t.count() == 4001
    assert sorted(r["k"] for r in t.where("v = -1").collect()) == sorted(keys)
    assert t.where("v = -2").first()["k"] == 10**6
    # every non-key row is untouched
    assert t.where("v = k * 3").count() == 4000 - len(keys)


def test_probe_uses_write_time_type_after_widen(spark, tmp_path):
    """Spark hashes int and bigint differently: after a widen the probe
    must hash with each file's WRITE-TIME type or every lookup goes
    false-negative."""
    path = str(tmp_path / "tw")
    os.makedirs(path)
    snap.set_bloom_filter(path, ["k"], bits_per_key=10)
    df = spark.range(2000).select(
        F.col("id").cast("int").alias("k"), (F.col("id") * 3).alias("v"))
    snap.commit_append(df.repartition(4), path)
    snap.widen_column_type(path, "k", "bigint")
    got = snap.read_snapshot(spark, path, where={"k": (1500, 1500)})
    assert [r["v"] for r in got.collect()] == [4500]
    # and the bloom still PRUNES under the widened probe
    m = snap.read_manifest(path)
    kept = snap.bloom_prune_point(spark, m, m["files"], {"k": (1500, 1500)})
    assert 0 < len(kept) < len(m["files"])


def test_probe_translates_renamed_column(spark, tmp_path):
    path = _mk(spark, tmp_path)
    snap.rename_column(path, "k", "key")
    m = snap.read_manifest(path)
    kept = snap.bloom_prune_point(spark, m, m["files"],
                                  {"key": (777, 777)})
    assert 0 < len(kept) < len(m["files"])
    got = snap.read_snapshot(spark, path, where={"key": (777, 777)})
    assert [r["v"] for r in got.collect()] == [2331]


def test_blooms_survive_externalized_manifest(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(snap, "FILES_INLINE_MAX", 0)
    path = _mk(spark, tmp_path)
    m = snap.read_manifest(path)
    assert "files_ref" in m
    assert all("k" in e.get("bloom", {}) for e in m["files"])  # round-trip
    got = snap.read_snapshot(spark, path, where={"k": (777, 777)})
    assert [r["v"] for r in got.collect()] == [2331]


def test_unbloomable_types_skipped(spark, tmp_path):
    path = str(tmp_path / "tu")
    os.makedirs(path)
    snap.set_bloom_filter(path, ["k", "ts"], bits_per_key=10)
    df = spark.range(100).select(
        F.col("id").alias("k"),
        F.current_timestamp().alias("ts"),
    )
    snap.commit_append(df.coalesce(2), path)
    m = snap.read_manifest(path)
    for e in m["files"]:
        assert "k" in e["bloom"] and "ts" not in e["bloom"]


def test_null_keys_stay_pure_insert(spark, tmp_path):
    path = _mk(spark, tmp_path, n=100, parts=2)
    ch = spark.createDataFrame(
        [(None, -5, "nul")], "k bigint, v bigint, s string")
    m0 = snap.read_manifest(path)
    snap.merge_snapshot(spark, path, ch, ["k"], record_changes=False)
    m1 = snap.read_manifest(path)
    # nothing to shadow: every old file carried
    assert {e["path"] for e in m0["files"]} <= {
        e["path"] for e in m1["files"]}
    assert snap.read_snapshot(spark, path).count() == 101


def test_set_bloom_validates(spark, tmp_path):
    with pytest.raises(ValueError, match="bits_per_key"):
        snap.set_bloom_filter(str(tmp_path / "x"), ["k"], bits_per_key=1)


def test_spark_bloom_keep_matches_driver(spark, tmp_path):
    """The externalized planning path's in-job bloom filter
    (_bloom_keep_expr) must keep exactly the files the driver-side
    bloom_prune_point keeps — including through a rename (version
    branches + write-time-typed probe hashing)."""
    path = _mk(spark, tmp_path)
    snap.rename_column(path, "k", "key")
    snap.commit_append(
        spark.range(4000, 4100).select(
            F.col("id").alias("key"),
            (F.col("id") * 3).alias("v"),
            F.lit("w0").alias("s"),
        ).coalesce(1),
        path,
    )
    m = snap.read_manifest(path)
    mdf = snap.manifest_files_df(spark, path)
    for probe in [777, 4050, 10**9]:
        where = {"key": (probe, probe)}
        py = {e["path"]
              for e in snap.bloom_prune_point(spark, m, m["files"], where)}
        bk = snap._bloom_keep_expr(m, where)
        sp = {r["path"] for r in mdf.where(bk).select("path").collect()}
        assert sp == py, probe


def test_bloom_bitmap_bytes_pinned(spark, tmp_path):
    """The executor-side bitmap fold (mapInPandas partials + grouped
    OR) must produce byte-identical bitmaps to a driver-side pack of
    the same JVM-computed positions — the r10 implementation this
    replaced. Pins the hash contract AND the packing layout."""
    import base64

    path = _mk(spark, tmp_path, n=3000, parts=5)
    m = snap.read_manifest(path)
    commit_dir = os.path.join(path, os.path.dirname(m["files"][0]["path"]))
    marker = os.path.basename(commit_dir) + "/"

    from ratatool_spark.functions.localrel import local_df

    m_of = {
        e["path"].split(marker, 1)[1]: e["bloom"]["k"]["m"]
        for e in m["files"]
    }
    m_df = local_df(
        spark, list(m_of.items()), "__f string, __m bigint"
    )
    pos = (
        spark.read.parquet(commit_dir)
        .select(
            F.substring_index(
                F.col("_metadata.file_path"), marker, -1
            ).alias("__f"),
            F.col("k"),
        )
        .where(F.col("k").isNotNull())
        .join(F.broadcast(m_df), "__f")
        .select(
            "__f",
            F.explode(
                snap._bloom_position_exprs(
                    F.col("k"), F.col("__m"), snap._BLOOM_K
                )
            ).alias("__p"),
        )
        .groupBy("__f")
        .agg(F.collect_set("__p").alias("__ps"))
        .collect()
    )
    driver_pack = {}
    for r in pos:
        bits = bytearray(m_of[r["__f"]] // 8)
        for p in r["__ps"]:
            bits[p >> 3] |= 1 << (p & 7)
        driver_pack[r["__f"]] = bytes(bits)
    assert driver_pack, "fixture produced no files"
    for e in m["files"]:
        rel = e["path"].split(marker, 1)[1]
        got = base64.b64decode(e["bloom"]["k"]["b64"])
        assert got == driver_pack[rel], rel


def test_bloom_build_one_row_per_file_to_driver(spark, tmp_path, monkeypatch):
    """The executor-side fold returns EXACTLY one (file, bitmap) row per
    file to the driver — the r10 'last data-row-proportional driver
    transfer' is structurally gone. Asserted by intercepting the
    toLocalIterator feed of _build_blooms."""
    import ratatool_spark.operators.snapshots as snap

    # patch the CONCRETE DataFrame class (pyspark 4 routes the public
    # pyspark.sql.DataFrame name through a dispatch shim)
    cls = type(spark.range(1))
    seen = []
    real = cls.toLocalIterator

    def counting(self, *a, **kw):
        rows = list(real(self, *a, **kw))
        if rows and set(rows[0].asDict()) == {"__f", "__bits"}:
            seen.append(rows)
        return iter(rows)

    monkeypatch.setattr(cls, "toLocalIterator", counting)
    path = _mk(spark, tmp_path, n=2000, parts=7)
    m = snap.read_manifest(path)
    n_files = len(m["files"])
    assert seen, "bloom build did not stream through toLocalIterator"
    for rows in seen:
        fs = [r["__f"] for r in rows]
        assert len(fs) == len(set(fs)) == n_files
