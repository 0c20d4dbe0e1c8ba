"""Snapshot-isolated table layout: manifest-listed parquet data files
with atomic commits, time travel, compaction under isolation, and
snapshot expiry — the minimal lakehouse-table primitive the maintenance
operators here (``layout.compaction_plan``, ``streaming/scd2``) plug
into.

Why a manifest layer at 100 TB: directory listing is NOT a transaction
boundary. A plain ``spark.read.parquet(dir)`` sees half-written files
from a concurrent job, cannot express "replace these 1 000 small files
with these 10 compacted ones" atomically, and loses history the moment
a file is rewritten. The fix — the design shared by the public table
formats (Iceberg's snapshot manifests, Delta's transaction log) — is to
make a tiny METADATA file the source of truth:

* ``data/`` holds immutable parquet files; files are only ever ADDED,
  never mutated. A failed job leaves orphans that no manifest
  references — invisible to every reader, swept later by
  :func:`vacuum_orphans`.
* ``snapshots/v{N}.json`` lists exactly the data files (path, rows,
  bytes) of table version N plus the parent id and the schema. Readers
  resolve ONE manifest (metadata-scale: one row per file, ~10^5 rows
  for a 100 TB table at healthy file sizes) and read exactly those
  files — a reader holding snapshot N is isolated from every later
  commit by construction.
* Commit = write data files, then publish ``v{N+1}.json`` with an
  EXCLUSIVE create (``open(..., "x")`` locally; the documented seam for
  object stores is a conditional PUT / metastore compare-and-swap, the
  same primitive the public formats require). Two racing committers:
  one wins, the other gets :class:`CommitConflict` and retries against
  the new current snapshot — optimistic concurrency, no locks held
  during the (long) data write.

Compaction composes: :func:`snapshot_manifest` IS the file manifest
``layout.compaction_plan`` bin-packs, and :func:`compact_snapshot`
rewrites each multi-file bin and publishes one REPLACE commit — readers
never observe a state where rows are missing or doubled. The same
single-replace-commit discipline carries the whole maintenance surface:
:func:`cluster_snapshot` (z-order rewrite), :func:`merge_snapshot`
(copy-on-write upsert touching only stats-intersecting files),
:func:`delete_snapshot_where` (range erasure), and
:func:`evolve_add_columns` (additive schema change, metadata-only).
Manifests carry per-file min/max column stats, so
:func:`read_snapshot` with a range box skips whole files before any IO.

Caveat shared with the real formats: parquet writers may truncate long
string statistics; :func:`_file_stats` stores what the footer reports,
and a column with unusable stats is simply absent from the manifest —
absent stats never prune, so correctness is preserved either way.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_SNAP_DIR = "snapshots"
_DATA_DIR = "data"


class CommitConflict(Exception):
    """Another commit published the same snapshot id first. Re-read the
    table state (your parent snapshot is stale) and retry."""


class SnapshotExpired(Exception):
    """An incremental consumer's cursor (``from_id``) fell out of the
    retention window: ``expire_snapshots`` dropped that manifest, so the
    baseline file set can no longer be reconstructed. Rebase: do ONE
    full ``read_snapshot`` of the current snapshot and resume
    ``snapshot_changes`` from its id."""


def _snap_path(table_path: str, snapshot_id: int) -> str:
    return os.path.join(table_path, _SNAP_DIR, f"v{snapshot_id:012d}.json")


def _snap_ids(table_path: str) -> list[int]:
    pat = os.path.join(table_path, _SNAP_DIR, "v*.json")
    return sorted(int(os.path.basename(p)[1:-5]) for p in glob.glob(pat))


def current_snapshot_id(table_path: str) -> int | None:
    """Highest published snapshot id, or None for an empty/absent table.
    The max over the snapshot directory is the current pointer — ids are
    dense and zero-padded so name order is id order."""
    ids = _snap_ids(table_path)
    return ids[-1] if ids else None


def read_manifest(table_path: str, snapshot_id: int | None = None) -> dict:
    """The raw manifest dict of ``snapshot_id`` (default: current)."""
    if snapshot_id is None:
        snapshot_id = current_snapshot_id(table_path)
        if snapshot_id is None:
            raise FileNotFoundError(f"no snapshots under {table_path}")
    p = _snap_path(table_path, snapshot_id)
    if not os.path.exists(p):
        raise FileNotFoundError(
            f"snapshot {snapshot_id} does not exist under {table_path} "
            f"(have {_snap_ids(table_path)})"
        )
    with open(p) as f:
        return json.load(f)


def _file_stats(md) -> dict:
    """Per-column [min, max] merged across a file's row groups, from the
    parquet footer (JSON-representable types only) — the file-level
    pruning stats the manifest carries, exactly what Iceberg/Delta store
    per data file. Columns without usable stats are simply absent (a
    reader must then keep the file — always safe)."""
    out: dict = {}
    for ci in range(md.num_columns):
        name = md.schema.column(ci).name
        lo = hi = None
        ok = True
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(ci).statistics
            if st is None or not st.has_min_max:
                ok = False
                break
            mn, mx = st.min, st.max
            if isinstance(mn, bytes):
                try:
                    mn, mx = mn.decode(), mx.decode()
                except UnicodeDecodeError:
                    ok = False
                    break
            if not isinstance(mn, (int, float, str)):
                ok = False
                break
            lo = mn if lo is None else min(lo, mn)
            hi = mx if hi is None else max(hi, mx)
        if ok and lo is not None:
            out[name] = [lo, hi]
    return out


def _write_data_files(df: DataFrame, table_path: str) -> list[dict]:
    """Write ``df`` as immutable parquet files under ``data/`` and
    return their manifest entries (path, rows, bytes, per-column min/max
    pruning stats). Files land under a per-commit uuid prefix, so
    concurrent writers never collide and a failed commit's files are
    identifiable orphans."""
    import pyarrow.parquet as pq

    commit_uuid = uuid.uuid4().hex
    out_dir = os.path.join(table_path, _DATA_DIR, commit_uuid)
    df.write.parquet(out_dir)
    entries = []
    for p in sorted(glob.glob(os.path.join(out_dir, "*.parquet"))):
        rel = os.path.relpath(p, table_path)
        md = pq.ParquetFile(p).metadata
        entries.append(
            {
                "path": rel,
                "rows": md.num_rows,
                "bytes": os.path.getsize(p),
                "stats": _file_stats(md),
            }
        )
    return entries


def _publish(
    table_path: str,
    parent: int | None,
    files: list[dict],
    schema_json: str,
    operation: str,
    extra: dict | None = None,
) -> int:
    new_id = (parent or 0) + 1
    os.makedirs(os.path.join(table_path, _SNAP_DIR), exist_ok=True)
    manifest = {
        "snapshot_id": new_id,
        "parent": parent,
        "operation": operation,
        "schema": schema_json,
        "files": files,
        **(extra or {}),
    }
    tmp = _snap_path(table_path, new_id) + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        # hard-link = the commit's atomicity point: the fully-written tmp
        # content appears under v{new_id} in ONE metadata operation, and
        # exactly one writer can win (link fails with FileExistsError if
        # the name is taken). A crash can never leave a truncated
        # manifest published — the alternative create-then-copy could.
        # (Object-store deployments swap this single call for a
        # conditional PUT / catalog CAS.)
        os.link(tmp, _snap_path(table_path, new_id))
    except FileExistsError as e:
        raise CommitConflict(
            f"snapshot {new_id} already published under {table_path}; "
            "re-read the current snapshot and retry"
        ) from e
    finally:
        os.remove(tmp)
    return new_id


def _norm_fields(schema_json: str) -> list[tuple[str, object]]:
    # nullability is advisory in Spark (a parquet read widens non-null
    # to nullable); (name, type) is the contract the manifest pins
    return [
        (f["name"], f["type"])
        for f in json.loads(schema_json)["fields"]
    ]


def _check_schema(df: DataFrame, manifest: dict) -> None:
    if _norm_fields(manifest["schema"]) != _norm_fields(df.schema.json()):
        raise ValueError(
            "schema mismatch with table schema — add columns with "
            "evolve_add_columns (additive, metadata-only); other shape "
            "changes are a rewrite, not an append; "
            f"table={manifest['schema']} df={df.schema.json()}"
        )


def commit_append(
    df: DataFrame, table_path: str, extra: dict | None = None
) -> int:
    """Append ``df`` as a new snapshot: parent's files + the new files.
    Returns the published snapshot id. Data is written BEFORE the
    manifest is published, so a crash mid-commit leaves only orphans.
    ``extra`` lands in the manifest (e.g. the streaming sink's
    ``stream_batch_id`` idempotency ledger)."""
    parent = current_snapshot_id(table_path)
    base: list[dict] = []
    if parent is not None:
        m = read_manifest(table_path, parent)
        _check_schema(df, m)
        base = m["files"]
        schema_json = m["schema"]
    else:
        os.makedirs(table_path, exist_ok=True)
        schema_json = df.schema.json()
    new_files = _write_data_files(df, table_path)
    return _publish(
        table_path, parent, base + new_files, schema_json, "append",
        extra=extra,
    )


def commit_replace(
    spark: SparkSession,
    table_path: str,
    remove_paths: list[str],
    add_df: DataFrame | None,
    expected_parent: int | None = None,
) -> int:
    """Atomically replace ``remove_paths`` (manifest-relative) with the
    files of ``add_df`` — the commit type compaction, clustering rewrites
    (``layout.zorder_repartition``), and retention deletes publish.
    ``expected_parent`` asserts the optimistic-concurrency precondition:
    if another commit landed since the caller planned this rewrite, the
    plan's inputs are stale and the publish fails with
    :class:`CommitConflict` instead of silently dropping that commit's
    files."""
    parent = current_snapshot_id(table_path)
    if parent is None:
        raise FileNotFoundError(f"no snapshots under {table_path}")
    if expected_parent is not None and parent != expected_parent:
        raise CommitConflict(
            f"planned against snapshot {expected_parent} but current is "
            f"{parent} — replan against the current manifest"
        )
    m = read_manifest(table_path, parent)
    have = {e["path"] for e in m["files"]}
    missing = set(remove_paths) - have
    if missing:
        raise ValueError(
            f"remove_paths not in snapshot {parent}: {sorted(missing)[:5]}"
        )
    kept = [e for e in m["files"] if e["path"] not in set(remove_paths)]
    new_files = []
    if add_df is not None:
        _check_schema(add_df, m)
        new_files = _write_data_files(add_df, table_path)
    return _publish(
        table_path, parent, kept + new_files, m["schema"], "replace"
    )


def files_intersecting(
    manifest: dict, where: dict[str, tuple]
) -> list[dict]:
    """The manifest entries a conjunctive range predicate ``where``
    ({col: (lo, hi)}) cannot rule out: a file is kept iff its stored
    [min, max] intersects the range on EVERY predicated column (files
    without stats for a column are kept — pruning must be safe). The
    file-level twin of ``layout.row_group_skip_audit``, evaluated on
    manifest METADATA — no footer reads, no data reads."""
    kept = []
    for e in manifest["files"]:
        stats = e.get("stats", {})
        hit = True
        for c, (lo, hi) in where.items():
            if c in stats and not (stats[c][1] >= lo and stats[c][0] <= hi):
                hit = False
                break
        if hit:
            kept.append(e)
    return kept


def read_snapshot(
    spark: SparkSession,
    table_path: str,
    snapshot_id: int | None = None,
    where: dict[str, tuple] | None = None,
) -> DataFrame:
    """The table AS OF ``snapshot_id`` (default: current) — time travel.
    Reads exactly the manifest's files with the manifest's schema;
    files added by later commits (or half-written by a failed one) are
    invisible because they are not listed.

    ``where`` ({col: (lo, hi)} conjunctive ranges) additionally SKIPS
    whole files whose manifest min/max stats cannot intersect the
    predicate — planning-time pruning from metadata alone, before any
    footer or data IO (pair with ``cluster_snapshot``: z-ordered files
    have tight per-column ranges, so a 2-D box prunes most of the
    table). The predicate is ALSO applied to the surviving rows, so the
    result equals an unpruned read + filter."""
    m = read_manifest(table_path, snapshot_id)
    schema = StructType.fromJson(json.loads(m["schema"]))
    entries = m["files"] if not where else files_intersecting(m, where)
    paths = [os.path.join(table_path, e["path"]) for e in entries]
    if not paths:
        return spark.createDataFrame([], schema)
    df = spark.read.schema(schema).parquet(*paths)
    if where:
        for c, (lo, hi) in where.items():
            df = df.where(F.col(c).between(lo, hi))
    return df


def snapshot_manifest(
    spark: SparkSession, table_path: str, snapshot_id: int | None = None
) -> DataFrame:
    """(path, rows, bytes) of a snapshot's files as a DataFrame — the
    input ``layout.compaction_plan`` bin-packs. Metadata-scale."""
    m = read_manifest(table_path, snapshot_id)
    rows = [(e["path"], e["rows"], e["bytes"]) for e in m["files"]]
    schema = "path string, rows bigint, bytes bigint"
    return spark.createDataFrame(rows, schema)


def compact_snapshot(
    spark: SparkSession, table_path: str, target_bytes: int
) -> int | None:
    """Bin-pack the current snapshot's files with
    ``layout.compaction_plan`` and rewrite every multi-file bin into one
    file, publishing a single REPLACE commit (readers see either the old
    file set or the new one, never a mix). Single-file bins are left in
    place — rewriting them would churn bytes for nothing. Returns the
    new snapshot id, or None when nothing needed compaction.

    Scale: each bin is ~``target_bytes`` regardless of table size, so a
    task rewrites one bin independently; the planner input is the
    metadata-scale manifest."""
    from ratatool_spark.operators.layout import compaction_plan

    parent = current_snapshot_id(table_path)
    manifest = snapshot_manifest(spark, table_path, parent)
    plan = compaction_plan(manifest, "bytes", ["path"], target_bytes)
    bins: dict[int, list[str]] = {}
    for r in plan.collect():  # metadata-scale: one row per file
        bins.setdefault(r["bin"], []).append(r["path"])
    multi = {b: ps for b, ps in bins.items() if len(ps) > 1}
    if not multi:
        return None
    m = read_manifest(table_path, parent)
    schema = StructType.fromJson(json.loads(m["schema"]))
    # write every bin's merged file first (orphans if we lose the race),
    # then publish ONE replace commit covering all bins
    new_files: list[dict] = []
    removed: list[str] = []
    for b in sorted(multi):
        paths = multi[b]
        merged = spark.read.schema(schema).parquet(
            *[os.path.join(table_path, p) for p in paths]
        ).coalesce(1)
        new_files.extend(_write_data_files(merged, table_path))
        removed.extend(paths)
    kept = [e for e in m["files"] if e["path"] not in set(removed)]
    if current_snapshot_id(table_path) != parent:
        raise CommitConflict(
            f"snapshot advanced past {parent} while compacting — replan"
        )
    return _publish(
        table_path, parent, kept + new_files, m["schema"], "replace"
    )


def evolve_add_columns(
    spark: SparkSession, table_path: str, new_cols: dict[str, str]
) -> int:
    """Additive schema evolution as a metadata-only commit: the new
    snapshot carries the widened schema over the SAME data files — no
    data is rewritten. Old files simply lack the new columns, and the
    parquet reader fills them with NULL (reads always apply the
    manifest's schema). Appends after the evolution must carry the new
    columns; time-travel reads before it still serve the old shape.
    Only ADD-nullable is supported — drops/renames would change the
    meaning of bytes already written, which is a rewrite, not an
    evolution."""
    from pyspark.sql.types import _parse_datatype_string

    parent = current_snapshot_id(table_path)
    if parent is None:
        raise FileNotFoundError(f"no snapshots under {table_path}")
    m = read_manifest(table_path, parent)
    schema = StructType.fromJson(json.loads(m["schema"]))
    have = {f.name for f in schema.fields}
    for name, typ in new_cols.items():
        if name in have:
            raise ValueError(f"column {name!r} already exists")
        schema = schema.add(name, _parse_datatype_string(typ), True)
    return _publish(
        table_path, parent, m["files"], schema.json(), "evolve"
    )


def vacuum_orphans(
    table_path: str,
    delete: bool = True,
    older_than: float = 6 * 3600.0,
) -> list[str]:
    """Delete data files referenced by NO manifest AND older than
    ``older_than`` seconds — the debris of commits that wrote data but
    crashed (or lost the publish race) before publishing.

    The age guard is load-bearing, not cosmetic: the commit protocol
    writes data files FIRST and publishes the manifest LAST, so an
    IN-FLIGHT commit's freshly-written files are indistinguishable from
    orphans until its manifest lands. An unguarded vacuum racing that
    commit would delete its files and the subsequently published
    snapshot would reference missing data — silent corruption. Every
    public format gates vacuum on age for exactly this reason (Delta's
    ``RETAIN``, Iceberg's ``older_than``); keep the default comfortably
    above your longest data-write. ``older_than=0`` is for tests and
    single-writer offline maintenance ONLY. Aged orphans were never
    visible to any reader (reads are manifest-driven), so their removal
    is invisible; it just reclaims bytes.

    Metadata-scale: one directory walk + the union of manifest file
    lists. ``delete=False`` is the dry-run audit (age guard applies to
    the dry run too — it reports what a real vacuum would remove)."""
    import time

    cutoff = time.time() - older_than
    live: set[str] = set()
    for sid in _snap_ids(table_path):
        live.update(
            e["path"] for e in read_manifest(table_path, sid)["files"]
        )
    dead: list[str] = []
    emptied: set[str] = set()
    data_root = os.path.join(table_path, _DATA_DIR)
    for root, _dirs, files in os.walk(data_root):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            p = os.path.join(root, f)
            rel = os.path.relpath(p, table_path)
            if rel not in live and os.path.getmtime(p) <= cutoff:
                dead.append(rel)
                if delete:
                    os.remove(p)
                    emptied.add(root)
    if delete:
        # sweep commit dirs left holding only write markers (_SUCCESS,
        # .crc): the dirs whose data THIS vacuum just removed, plus
        # marker-only debris whose markers are themselves outside the
        # retention window (an in-flight writer's dir may hold only
        # markers for a moment before its part files land — the age
        # guard protects it; the dir mtime itself is useless here, the
        # deletes above just bumped it).
        for d in sorted(glob.glob(os.path.join(data_root, "*")), reverse=True):
            if not os.path.isdir(d):
                continue
            names = os.listdir(d)
            if not all(f.startswith(("_", ".")) for f in names):
                continue
            aged = all(
                os.path.getmtime(os.path.join(d, f)) <= cutoff for f in names
            )
            if d in emptied or (names and aged):
                shutil.rmtree(d)
    return sorted(dead)


def _split_by_box(
    m: dict, box: dict[str, tuple]
) -> tuple[list[dict], list[dict]]:
    """(touched, untouched) manifest entries for a conjunctive range
    box — touched = could contain matching rows (stats intersect on
    every box column, or stats absent: must assume a match)."""
    touched = files_intersecting(m, box)
    tset = {e["path"] for e in touched}
    return touched, [e for e in m["files"] if e["path"] not in tset]


def merge_snapshot(
    spark: SparkSession,
    table_path: str,
    changes: DataFrame,
    keys: list[str],
) -> int:
    """Copy-on-write MERGE (upsert): rows of ``changes`` replace
    same-key rows and new keys append, in ONE replace commit. The
    metadata does the heavy lifting: only files whose manifest min/max
    stats intersect the changes' per-key-column bounding box are
    rewritten (anti-join on ``keys`` + union with the changes); every
    other file is carried into the new snapshot untouched — the
    Delta/Iceberg copy-on-write shape. Soundness: every change key lies
    inside the box on every key column, so a file that could hold a
    matching key MUST intersect the box (stats-absent files count as
    intersecting). Cost is the box's data, not the table: cluster the
    table by its merge keys (``cluster_snapshot``) and range-local
    change batches rewrite a sliver. A keyspace-spanning batch rewrites
    everything — correct, just the full price; bucket-partition the
    table (``streaming/scd2``'s layout) when batches are always
    scattered."""
    parent = current_snapshot_id(table_path)
    if parent is None:
        raise FileNotFoundError(f"no snapshots under {table_path}")
    m = read_manifest(table_path, parent)
    _check_schema(changes, m)
    # one pass: the change batch's per-key-column bounding box PLUS the
    # duplicate-key guard — two change rows sharing a key would BOTH
    # land in the new snapshot (the anti-join only removes OLD rows),
    # silently breaking the one-row-per-key contract
    nn = None
    for k in keys:
        c = F.col(k).isNotNull()
        nn = c if nn is None else (nn & c)
    aggs = [
        F.count(F.lit(1)).alias("__n"),
        F.count(F.when(nn, 1)).alias("__nk"),
        F.count_distinct(*[F.col(k) for k in keys]).alias("__nd"),
    ]
    for k in keys:
        aggs += [F.min(F.col(k)).alias(f"lo_{k}"), F.max(F.col(k)).alias(f"hi_{k}")]
    row = changes.agg(*aggs).first()
    if row["__n"] == 0:  # empty change batch: no-op commit
        return parent
    # duplicate keys among fully-keyed rows (count_distinct skips rows
    # with any NULL key — those never match existing rows and insert
    # as-is, so they are exempt from the uniqueness contract)
    if row["__nd"] < row["__nk"]:
        raise ValueError(
            f"merge_snapshot: changes contain {row['__nk'] - row['__nd']} "
            f"duplicate-key row(s) on {keys} — both copies would be "
            "inserted; dedup the batch first"
        )
    def _nan(v):
        return isinstance(v, float) and v != v

    if any(row[f"lo_{k}"] is None for k in keys):
        # some key column is NULL on EVERY change row — no change row is
        # fully keyed on it, so nothing can match an existing row:
        # pure insert, no file touched
        touched, untouched = [], m["files"]
    elif any(_nan(row[f"lo_{k}"]) or _nan(row[f"hi_{k}"]) for k in keys):
        # a float key column contains NaN: the bounding box degenerates
        # (every `stat <= NaN` comparison is False, so NO file would
        # intersect) while Spark's join DOES match NaN keys to existing
        # NaN rows — pruning on that box would silently append
        # duplicates. NaN stats are unusable stats: touch every file,
        # same as stats-absent.
        touched, untouched = m["files"], []
    else:
        box = {k: (row[f"lo_{k}"], row[f"hi_{k}"]) for k in keys}
        touched, untouched = _split_by_box(m, box)
    schema = StructType.fromJson(json.loads(m["schema"]))
    if touched:
        old = spark.read.schema(schema).parquet(
            *[os.path.join(table_path, e["path"]) for e in touched]
        )
        kept = old.join(F.broadcast(changes.select(*keys).distinct()),
                        keys, "left_anti")
        new_data = kept.unionByName(changes.select(*old.columns))
    else:
        new_data = changes.select(*[f.name for f in schema.fields])
    new_files = _write_data_files(new_data, table_path)
    if current_snapshot_id(table_path) != parent:
        raise CommitConflict(
            f"snapshot advanced past {parent} while merging — replan"
        )
    return _publish(
        table_path, parent, untouched + new_files, m["schema"], "replace"
    )


def delete_snapshot_where(
    spark: SparkSession, table_path: str, where: dict[str, tuple]
) -> int:
    """Copy-on-write range DELETE (retention, GDPR erasure): drop every
    row inside the conjunctive range ``where`` ({col: (lo, hi)}) in ONE
    replace commit. Files whose stats cannot intersect the box are
    carried over untouched; intersecting files are rewritten with the
    complement rows only. Note the deleted data remains physically
    present in OLD snapshots until ``expire_snapshots`` drops them —
    run expiry to complete an erasure."""
    parent = current_snapshot_id(table_path)
    if parent is None:
        raise FileNotFoundError(f"no snapshots under {table_path}")
    m = read_manifest(table_path, parent)
    touched, untouched = _split_by_box(m, where)
    if not touched:
        return parent
    schema = StructType.fromJson(json.loads(m["schema"]))
    old = spark.read.schema(schema).parquet(
        *[os.path.join(table_path, e["path"]) for e in touched]
    )
    inside = None
    for c, (lo, hi) in where.items():
        cond = F.col(c).between(lo, hi)
        inside = cond if inside is None else (inside & cond)
    # NULL-valued rows never match a range predicate — KEEP them (a bare
    # where(~inside) would drop them: NOT(NULL) is NULL, which filters)
    new_files = _write_data_files(
        old.where(F.coalesce(~inside, F.lit(True))), table_path
    )
    if current_snapshot_id(table_path) != parent:
        raise CommitConflict(
            f"snapshot advanced past {parent} while deleting — replan"
        )
    return _publish(
        table_path, parent, untouched + new_files, m["schema"], "replace"
    )


def cluster_snapshot(
    spark: SparkSession,
    table_path: str,
    zorder_cols: list[str],
    bits: int = 16,
    num_partitions: int | None = None,
) -> int:
    """Rewrite the whole table z-ordered by ``zorder_cols``
    (``layout.zorder_repartition``: range exchange on the Morton key +
    intra-partition sort, so every file's footer min/max stats become
    selective on all z columns) and publish it as ONE replace commit —
    the clustering-rewrite commit type. Readers on older snapshots keep
    the unclustered files until expiry; new scans prune with the
    z-layout (`row_group_skip_audit` measures the payoff). Logical
    content is untouched — the `snapshot_cluster_zorder` gate pins the
    rewrite against the source table."""
    from ratatool_spark.operators.layout import zorder_repartition

    parent = current_snapshot_id(table_path)
    if parent is None:
        raise FileNotFoundError(f"no snapshots under {table_path}")
    m = read_manifest(table_path, parent)
    clustered = zorder_repartition(
        read_snapshot(spark, table_path, parent),
        zorder_cols,
        bits=bits,
        num_partitions=num_partitions,
    )
    new_files = _write_data_files(clustered, table_path)
    if current_snapshot_id(table_path) != parent:
        raise CommitConflict(
            f"snapshot advanced past {parent} while clustering — replan"
        )
    return _publish(table_path, parent, new_files, m["schema"], "replace")


def expire_snapshots(
    table_path: str, keep_last: int = 1, delete: bool = True
) -> list[str]:
    """Drop all but the newest ``keep_last`` snapshots and delete the
    data files ONLY they referenced (pure set arithmetic over the
    manifests — retained snapshots keep every file they list, so time
    travel within the retention window still works). Returns the
    manifest-relative paths of the files removed. ``delete=False`` is
    the dry-run audit."""
    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    ids = _snap_ids(table_path)
    if len(ids) <= keep_last:
        return []
    expired, retained = ids[:-keep_last], ids[-keep_last:]
    live: set[str] = set()
    for sid in retained:
        live.update(e["path"] for e in read_manifest(table_path, sid)["files"])
    dead: set[str] = set()
    for sid in expired:
        dead.update(
            e["path"]
            for e in read_manifest(table_path, sid)["files"]
            if e["path"] not in live
        )
    if delete:
        for rel in dead:
            p = os.path.join(table_path, rel)
            if os.path.exists(p):
                os.remove(p)
            d = os.path.dirname(p)
            if os.path.isdir(d) and not os.listdir(d):
                shutil.rmtree(d)
        for sid in expired:
            os.remove(_snap_path(table_path, sid))
    return sorted(dead)


def snapshot_changes(
    spark: SparkSession,
    table_path: str,
    from_id: int,
    to_id: int | None = None,
) -> DataFrame:
    """Rows ADDED between ``from_id`` (exclusive) and ``to_id``
    (inclusive, default current) — the incremental-scan primitive a
    downstream consumer (view maintenance, feature refresh, export)
    polls instead of re-reading the table: it reads exactly the data
    files that appeared in that snapshot range, metadata-planned.

    Exact change semantics for APPEND commits (the streaming-ingestion
    case): the result is precisely the appended rows. REPLACE commits
    (compaction, clustering) rewrite surviving rows into new files, so
    a file-level diff would re-surface them; those are maintenance
    commits, not data changes, and their files are EXCLUDED here (an
    `operation != append` commit contributes nothing). MERGE/DELETE
    rewrites also publish as replace — consumers needing row-level CDC
    across those run the SCD2 path (``streaming/scd2``), which models
    changes as first-class rows."""
    to_id = current_snapshot_id(table_path) if to_id is None else to_id
    if to_id is None or from_id > to_id:
        raise ValueError(f"bad snapshot range ({from_id}, {to_id}]")
    ids = set(_snap_ids(table_path))
    if (from_id > 0 and from_id not in ids) or (
        from_id == 0 and ids and min(ids) > 1
    ):
        # the cursor's manifest was dropped by expire_snapshots — the
        # baseline file set is gone, so a correct delta is impossible
        raise SnapshotExpired(
            f"snapshot {from_id} fell out of retention under "
            f"{table_path} (oldest retained: {min(ids) if ids else None})"
            " — rebase the consumer: full read_snapshot() of the current"
            " snapshot, then resume snapshot_changes from its id"
        )
    base = read_manifest(table_path, from_id) if from_id > 0 else {"files": []}
    schema = StructType.fromJson(
        json.loads(read_manifest(table_path, to_id)["schema"])
    )
    seen = {e["path"] for e in base["files"]}
    added: list[str] = []
    for sid in range(from_id + 1, to_id + 1):
        m = read_manifest(table_path, sid)
        if m["operation"] == "append":
            for e in m["files"]:
                if e["path"] not in seen:
                    added.append(e["path"])
                    seen.add(e["path"])
        else:
            seen.update(e["path"] for e in m["files"])
    if not added:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(
        *[os.path.join(table_path, p) for p in added]
    )


def snapshot_log(spark: SparkSession, table_path: str) -> DataFrame:
    """(snapshot_id, parent, operation, n_files, rows, bytes) — the
    table's commit history as a DataFrame (metadata-scale)."""
    rows = []
    for sid in _snap_ids(table_path):
        m = read_manifest(table_path, sid)
        rows.append(
            (
                sid,
                m["parent"],
                m["operation"],
                len(m["files"]),
                sum(e["rows"] for e in m["files"]),
                sum(e["bytes"] for e in m["files"]),
            )
        )
    return spark.createDataFrame(
        rows,
        "snapshot_id bigint, parent bigint, operation string, "
        "n_files bigint, rows bigint, bytes bigint",
    )
