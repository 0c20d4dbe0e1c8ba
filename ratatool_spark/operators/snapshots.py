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

Beyond the core commit/read/maintain loop, the layer carries the three
surfaces a long-lived 100 TB table needs (each mirroring a public
design):

* **Row-level CDC** (Delta's change data feed): CoW merge/delete
  persist their change sets as change files at commit time;
  :func:`snapshot_change_feed` replays any commit range as typed
  (row, _change_type, _commit_snapshot_id) rows without file diffing.
* **Merge-on-read** (Iceberg's delete files — all three forms):
  :func:`merge_snapshot_mor` publishes the batch + an EQUALITY key
  sidecar instead of rewriting files; :func:`delete_snapshot_where_mor`
  records a RANGE predicate; :func:`delete_snapshot_rows_mor` records
  POSITION (file, row-ordinal) identities from the parquet scan's
  ``_metadata`` columns for arbitrary-predicate row removal. Readers
  anti-join sidecars against data files with smaller sequence numbers;
  :func:`fold_deletes` and the rewriting maintenance ops materialize
  and clear them (position deletes fold surgically: only named files
  rewrite).
* **Hidden partitioning** (Iceberg's partition specs): an immutable
  per-table transform spec (identity/truncate/bucket and the
  year/month/day/hour time family, declared
  at creation — :func:`table_partition_spec`) routes EVERY data write
  (appends and maintenance rewrites alike) into hive-layout partition
  dirs whose values land in each manifest entry; queries predicate on
  SOURCE columns and :func:`partition_prune` maps the bounds through
  the transforms to drop whole partitions from metadata alone, and
  :func:`drop_partition` retires a partition as a metadata-only
  commit.
* **Manifest scalability** (Iceberg's manifest lists): past
  ``FILES_INLINE_MAX`` files the list externalizes to a typed parquet
  sidecar; the commit json stays tiny, metadata readers pass
  ``load_files=False``, and stats pruning runs as a Spark job
  (:func:`files_intersecting_spark`) — the driver never materializes
  the entry list on the read path.

The streaming halves live in ``streaming/snapshots.py``: an
exactly-once ingestion sink and a manifest-directory-driven source
(``stream_snapshot_source`` / ``stream_snapshot_mirror``) that closes
the table→stream→table loop.

Round-9 wave 3 completes the evolution/indexing surface of the public
formats:

* **Field-id schema evolution** (:func:`rename_column`,
  :func:`widen_column_type`, initial defaults on
  :func:`evolve_add_columns`) — metadata-only; files resolve columns
  by stable id, pruning translates per file version.
* **Partition spec evolution** (:func:`evolve_partition_spec`) — the
  current spec changes over the table's lifetime; mixed-spec metadata
  stays unambiguous via globally unique item names.
* **Per-file bloom filters** (:func:`set_bloom_filter`) — point-lookup
  and scattered-merge file skipping beyond min/max stats.
* **Named tags** (:func:`create_tag`) — immutable refs that anchor
  retention.
* **Metadata-only COUNT** (:func:`snapshot_rowcount`) — exact row
  counts from manifest sums, refused while MoR sidecars are pending.
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

from ratatool_spark.functions.localrel import local_df
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_SNAP_DIR = "snapshots"
_DATA_DIR = "data"
_CHANGES_DIR = "changes"  # row-level CDC files (the Delta CDF design)
_DELETES_DIR = "deletes"  # merge-on-read equality-delete sidecars

# Above this file count the manifest's files list is externalized to a
# parquet sidecar (snapshots/f{N}-*.parquet) instead of living inline in
# v{N}.json: a 100 TB table accrues 10^5-10^6 files, and one JSON blob
# parsed row-by-row on the driver per read becomes the planning
# bottleneck. Parquet keeps the commit file itself tiny and lets
# planning (stats pruning) run as a Spark job over the sidecar.
FILES_INLINE_MAX = 10_000


class CommitConflict(Exception):
    """Another commit published the same snapshot id first. Re-read the
    table state (your parent snapshot is stale) and retry."""


class ChangeFeedDiscontinuity(Exception):
    """The requested feed range crosses a commit whose logical change
    set is not recorded as rows (a rollback) — replaying past it would
    reconstruct the wrong state. Rebase: full ``read_snapshot`` at or
    after the discontinuity, then resume the feed from that id."""


class SnapshotExpired(Exception):
    """An incremental consumer's cursor (``from_id``) fell out of the
    retention window: ``expire_snapshots`` dropped that manifest, so the
    baseline file set can no longer be reconstructed. Rebase: do ONE
    full ``read_snapshot`` of the current snapshot and resume
    ``snapshot_changes`` from its id."""


def _write_exclusive_json(path: str, payload: dict) -> None:
    """Crash-safe exclusive-create of a metadata JSON file: write a tmp
    sibling, fsync, then hard-link to the final name — the link is the
    atomicity point (exactly one writer wins; a crash mid-write can
    never leave a truncated file under the published name, which a
    plain open('x') + dump could). Raises FileExistsError if the name
    is taken. Same protocol as the manifest publish in
    :func:`_publish`; object-store deployments swap the link for a
    conditional PUT."""
    tmp = path + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(payload, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        try:
            os.link(tmp, path)
        except OSError as e:
            if isinstance(e, FileExistsError):
                raise
            # no hard-link support: win exclusivity on a CLAIM file,
            # then publish content via atomic rename — a concurrent
            # reader of `path` sees absent-or-complete, never the
            # truncated/empty intermediate a plain open('x')+write
            # could expose (r10 ADVICE). The claim stays behind as a
            # tombstone marking the name taken even if we crash before
            # the rename (the loser must not win a half-published name).
            with open(path + ".claim", "x"):
                pass
            os.replace(tmp, path)
            return
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def _remove_published(path: str) -> None:
    """Remove a file published via :func:`_write_exclusive_json` AND
    its no-hardlink-FS claim tombstone, so the name is re-creatable."""
    os.remove(path)
    if os.path.exists(path + ".claim"):
        os.remove(path + ".claim")


def _remove_branch_manifest(table_path: str, name: str, i: int) -> None:
    """Remove one branch manifest plus its externalized files sidecar
    (the sidecar is referenced by THIS manifest only — the data files
    it lists belong to the table and are untouched)."""
    p = _branch_manifest_path(table_path, name, i)
    ref = None
    try:
        with open(p) as f:
            ref = json.load(f).get("files_ref")
    except (OSError, ValueError):
        pass
    _remove_published(p)
    if ref:
        rp = os.path.join(table_path, ref)
        if os.path.exists(rp):
            os.remove(rp)


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


def read_manifest(
    table_path: str,
    snapshot_id: int | None = None,
    load_files: bool = True,
) -> dict:
    """The raw manifest dict of ``snapshot_id`` (default: current).
    ``load_files=False`` skips materializing an EXTERNALIZED files list
    (``files_ref`` tables) — metadata-only callers (ledger scans,
    operation checks) stay O(1) no matter how many files the table has;
    ``m["files"]`` is then absent and ``m["files_ref"]`` points at the
    parquet sidecar."""
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
        m = json.load(f)
    if "files_ref" in m and load_files:
        # large table: the files list lives in a parquet sidecar; the
        # commit json stays tiny. Reconstruct the in-memory view.
        m["files"] = _load_files_sidecar(table_path, m["files_ref"])
    return m


_PART_NULL = "__HIVE_DEFAULT_PARTITION__"
_SPEC_FILE = "partition_spec.json"


def table_partition_specs(table_path: str) -> list[list[dict]] | None:
    """ALL of the table's partition specs, oldest first (spec evolution
    appends; specs are never edited in place), or None when the table
    is unpartitioned. Item names are GLOBALLY unique across specs
    (p0, p1 from spec 0; p2, ... from spec 1), which is what keeps
    mixed-spec metadata unambiguous: a partition tuple's keys identify
    the spec that produced it, so pruning and drop-partition never
    cross-read another spec's values."""
    p = os.path.join(table_path, _SNAP_DIR, _SPEC_FILE)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        raw = json.load(f)
    return raw["specs"] if isinstance(raw, dict) else [raw]


def table_partition_spec(table_path: str) -> list[dict] | None:
    """The table's CURRENT partition spec (the newest, which every data
    write routes through), or None for an unpartitioned table. Spec
    items: {"name": "p0", "col": <source column>, "transform":
    "identity"|"truncate"|"bucket"|"year"|"month"|"day"|"hour",
    "param": <width/bucket
    count, transform-dependent>} — Iceberg's hidden-partitioning model:
    the PHYSICAL layout is derived from data columns through declared
    transforms, queries keep predicating on the source columns, and the
    planner maps predicates through the transforms to prune whole
    partitions from metadata alone."""
    specs = table_partition_specs(table_path)
    return specs[-1] if specs else None


def _all_spec_items(table_path: str) -> list[dict] | None:
    """The union of every spec's items — the version-safe input for
    partition pruning on a spec-evolved table: each file's tuple only
    carries ITS spec's (globally unique) item names, so an item absent
    from the tuple simply cannot prune that file."""
    specs = table_partition_specs(table_path)
    if not specs:
        return None
    return [it for spec in specs for it in spec]


# Iceberg's time-granularity transform family: the partition value is
# the timestamp's ISO prefix at that granularity, so ISO string order
# equals time order and range predicates map through as pure prefix
# comparisons (the same monotonicity argument for all four). The hour
# value keeps ISO's space separator ("1995-01-01 12") — hive dir values
# are URL-encoded on write and decoded on parse, so the space is safe.
_TIME_TRANSFORMS = {
    "year": ("yyyy", 4),
    "month": ("yyyy-MM", 7),
    "day": ("yyyy-MM-dd", 10),
    "hour": ("yyyy-MM-dd HH", 13),
}


def _store_partition_spec(table_path: str, spec: list[dict]) -> list[dict]:
    norm = []
    for i, item in enumerate(spec):
        t = item.get("transform", "identity")
        if t not in ("identity", "truncate", "bucket", *_TIME_TRANSFORMS):
            raise ValueError(f"unknown partition transform {t!r}")
        if t in ("truncate", "bucket") and not item.get("param"):
            raise ValueError(f"transform {t!r} needs a positive 'param'")
        norm.append(
            {"name": f"p{i}", "col": item["col"], "transform": t,
             "param": item.get("param")}
        )
    os.makedirs(os.path.join(table_path, _SNAP_DIR), exist_ok=True)
    p = os.path.join(table_path, _SNAP_DIR, _SPEC_FILE)
    try:
        with open(p, "x") as f:  # spec is immutable once the table exists
            json.dump(norm, f)
    except FileExistsError:
        # a crashed first commit may have written the spec but no
        # manifest — an identical retry proceeds, a DIFFERENT spec is
        # still refused (immutability)
        with open(p) as f:
            if json.load(f) != norm:
                raise ValueError(
                    f"table at {table_path} already has a different "
                    "partition spec — the spec is immutable"
                ) from None
    return norm


def evolve_partition_spec(table_path: str, spec: list[dict]) -> int:
    """PARTITION SPEC EVOLUTION (Iceberg's model): append a NEW current
    spec — all FUTURE data writes (appends and maintenance rewrites
    alike) route through it, while files already written keep their old
    spec's layout and partition tuples; nothing is rewritten. Published
    as a metadata-only ``evolve-spec`` commit so the change is ordered
    in table history. The new spec's item names continue the global
    counter (spec 0: p0..; spec 1 starts where 0 ended), which is the
    invariant that keeps mixed-spec pruning and :func:`drop_partition`
    sound without per-file spec ids.

    Practical migration note: pruning on the new spec's columns only
    skips NEW files until maintenance (compaction / clustering /
    merges) rewrites the old ones — rewrites route through the current
    spec, so the table converges without a dedicated backfill."""
    specs = table_partition_specs(table_path)
    if specs is None:
        raise ValueError(
            f"table at {table_path} is unpartitioned — declare the "
            "first spec at creation (commit_append(partition_spec=...))"
        )
    parent = current_snapshot_id(table_path)
    if parent is None:
        raise FileNotFoundError(f"no snapshots under {table_path}")
    offset = sum(len(s) for s in specs)
    norm = []
    for i, item in enumerate(spec):
        t = item.get("transform", "identity")
        if t not in ("identity", "truncate", "bucket", *_TIME_TRANSFORMS):
            raise ValueError(f"unknown partition transform {t!r}")
        if t in ("truncate", "bucket") and not item.get("param"):
            raise ValueError(f"transform {t!r} needs a positive 'param'")
        norm.append(
            {"name": f"p{offset + i}", "col": item["col"], "transform": t,
             "param": item.get("param")}
        )
    mf = read_manifest(table_path, parent)
    have = {f["name"] for f in json.loads(mf["schema"])["fields"]}
    missing = {it["col"] for it in norm} - have
    if missing:
        raise ValueError(
            f"partition source columns {sorted(missing)} not in the "
            "table schema"
        )

    def _shape(s: list[dict]) -> list[tuple]:
        return [(it["col"], it["transform"], it.get("param")) for it in s]

    p = os.path.join(table_path, _SNAP_DIR, _SPEC_FILE)
    if _shape(specs[-1]) == _shape(norm):
        # idempotent retry: the spec is already active (a prior attempt
        # wrote the file but crashed / lost the publish race) — don't
        # append it AGAIN. If some retained manifest already records
        # the ordering commit, the evolution fully applied: pure no-op.
        spec_id = len(specs) - 1
        for sid in reversed(_snap_ids(table_path)):
            mm = read_manifest(table_path, sid, load_files=False)
            if mm.get("partition_spec_id") == spec_id:
                return parent
        wrote_file = False
    else:
        spec_id = len(specs)
        tmp = p + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"specs": specs + [norm]}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, p)
        wrote_file = True
    try:
        return _publish(
            table_path, parent, mf["files"], mf["schema"], "evolve-spec",
            deletes=mf.get("deletes", []),
            extra={"partition_spec_id": spec_id},
        )
    except CommitConflict:
        if wrote_file:
            # a racing commit won this snapshot id: un-activate the new
            # spec so writes between now and the caller's retry don't
            # route through a spec no commit records. RECOVERY NOTE
            # (r9 ADVICE): a data writer that raced the window between
            # activation and this revert may have routed an append
            # through the reverted spec — its files carry partition
            # tuples whose item names no recorded spec owns. Reads stay
            # correct (unknown tuple items never prune), and RETRYING
            # this evolve regenerates the SAME globally-unique item
            # names (the offset counter is derived from the recorded
            # specs, which the revert restored), re-adopting those
            # orphaned tuples for pruning/drop_partition.
            tmp = p + f".tmp-{uuid.uuid4().hex}"
            with open(tmp, "w") as f:
                json.dump({"specs": specs}, f)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, p)
        raise


_INT_TYPES = ("tinyint", "smallint", "int", "bigint")


def _partition_cols(spec: list[dict], df: DataFrame) -> list:
    """The derived partition-value expressions, one per spec item,
    aliased to the spec's synthetic names (p0, p1, ...) so the physical
    dirs never collide with data columns. Transform semantics are
    resolved from the COLUMN TYPE (Iceberg's rule): truncate = w-prefix
    for strings, floor-to-multiple-of-w for ints — both
    order-preserving, so range predicates map through."""
    types = dict(df.dtypes)
    out = []
    for item in spec:
        c, t, prm = F.col(item["col"]), item["transform"], item["param"]
        if t == "identity":
            e = c
        elif t == "truncate":
            if types.get(item["col"]) in _INT_TYPES:
                e = c - F.pmod(c, F.lit(prm))
            else:
                e = F.substring(c, 1, prm)
        elif t == "bucket":
            e = F.pmod(F.hash(c), F.lit(prm))
        else:  # year/month/day/hour: ISO prefix at the granularity
            e = F.date_format(c.cast("timestamp"), _TIME_TRANSFORMS[t][0])
        out.append(e.alias(item["name"]))
    return out


def _parse_partition(rel_under_commit: str) -> dict:
    """Partition values from a hive-layout relative path
    (p0=v/p1=w/part-...parquet) → {name: str | None}; Spark URL-encodes
    special characters in dir values and writes NULL as
    __HIVE_DEFAULT_PARTITION__."""
    from urllib.parse import unquote

    out: dict = {}
    for seg in rel_under_commit.split(os.sep)[:-1]:
        if "=" not in seg:
            continue
        name, val = seg.split("=", 1)
        val = unquote(val)
        out[name] = None if val == _PART_NULL else val
    return out


# ---------------------------------------------------------------------------
# Per-file bloom filters (the Iceberg puffin / Delta bloom-index
# design): min/max stats cannot prune a SCATTERED point lookup — a
# handful of keys spread across the keyspace intersects every file's
# range box, so a CoW merge of such a batch rewrites the whole table.
# A per-file bloom over the lookup column answers "can this file
# contain THIS value" probabilistically-no/definitely-maybe, shrinking
# the rewrite set to the files that actually hold the keys (plus a
# vanishing false-positive tail — never a correctness risk: a false
# positive only rewrites an extra file).
#
# Declared per table (snapshots/properties.json, set_bloom_filter);
# every subsequent DATA write builds the bitmaps in ONE distributed
# pass over the freshly written files (k seeded xxhash64 positions per
# value, collect_set per file; the bitset packs on the driver —
# per-COMMIT files, not per-table). Bitmap size scales with the file
# (bits_per_key × rows, next power of two), so fill stays ~constant.
# Probes hash with each file's WRITE-TIME column type (Spark's hash
# functions are width-sensitive: int 1 and bigint 1 hash differently),
# which the schema log already records — bloom skipping composes with
# rename/widen evolution.
# ---------------------------------------------------------------------------

_PROPS_FILE = "properties.json"
_BLOOM_K = 4


_PROPS_DIR = "props"


def table_properties(table_path: str) -> dict:
    """Table-level properties as {key: value}. ONE FILE PER KEY
    (``snapshots/props/<key>.json``) — the same isolation discipline as
    tags: concurrent writers of DIFFERENT keys can never clobber each
    other, which a read-modify-write of one shared JSON silently did
    (the r9 verdict's lost-update race). A same-key race is last-writer-
    wins on that key alone. Legacy single-file ``properties.json``
    tables are still read (per-key files win on conflict)."""
    out: dict = {}
    legacy = os.path.join(table_path, _SNAP_DIR, _PROPS_FILE)
    if os.path.exists(legacy):
        with open(legacy) as f:
            out.update(json.load(f))
    d = os.path.join(table_path, _SNAP_DIR, _PROPS_DIR)
    for p in glob.glob(os.path.join(d, "*.json")):
        with open(p) as f:
            out[os.path.basename(p)[:-5]] = json.load(f)
    return out


def set_table_property(table_path: str, key: str, value) -> None:
    """Atomically set ONE property key (tmp + fsync + rename on its own
    per-key file). Independent keys never interfere."""
    if not key or "/" in key or key.startswith((".", "_")):
        raise ValueError(f"bad property key {key!r}")
    d = os.path.join(table_path, _SNAP_DIR, _PROPS_DIR)
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, f"{key}.json")
    tmp = p + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(value, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, p)


def set_bloom_filter(
    table_path: str, cols: list[str], bits_per_key: int = 10
) -> None:
    """Declare per-file bloom filters on ``cols`` for every FUTURE data
    write (existing files stay bloom-less until maintenance rewrites
    them — absent blooms never prune, so the table converges without a
    backfill, same migration story as partition-spec evolution)."""
    if bits_per_key < 2:
        raise ValueError("bits_per_key must be >= 2")
    set_table_property(
        table_path,
        "bloom",
        {"cols": list(cols), "bits_per_key": bits_per_key, "k": _BLOOM_K},
    )


def set_write_order(table_path: str, cols: list[str]) -> None:
    """Declare a table WRITE ORDER (Iceberg's ``write.sort-order``):
    every future plain data write sorts within tasks on ``cols`` before
    landing, so each new file's footer min/max stats are tight on the
    ordered columns from the first append — predicate skipping without
    waiting for a clustering rewrite. Existing files are untouched
    (same converge-by-maintenance story as blooms); clustering rewrites
    (``cluster_snapshot``) override it with their own curve layout.
    Column names are resolved by field id at write time, so the order
    survives renames."""
    if not cols:
        raise ValueError("write order needs at least one column")
    set_table_property(table_path, "write.sort-order", {"cols": list(cols)})


def _bloom_m(rows: int, bits_per_key: int) -> int:
    m = 1024
    while m < rows * bits_per_key:
        m <<= 1
    return m


def _bloom_position_exprs(col, m_col, k: int):
    """The k seeded xxhash64 bit positions of a value — THE hash
    contract: identical exprs at build and probe time."""
    return F.array(*[
        F.pmod(F.xxhash64(F.lit(i), col), m_col) for i in range(k)
    ])


def _build_blooms(
    spark: SparkSession,
    out_dir: str,
    entries: list[dict],
    cols: list[str],
    bits_per_key: int,
    k: int,
) -> None:
    """Attach ``e["bloom"] = {col: {"m": bits, "b64": bitmap}}`` to each
    entry, computed in one distributed pass per column over the
    just-written files (positions via the scan's ``_metadata`` file
    identity; only the bloom column's pages are read).

    The bitmaps are PACKED IN EXECUTORS: a ``mapInPandas`` stage folds
    each scan partition's positions into per-file partial bitmaps
    (numpy, Arrow-batched, bounded by the partition's own row count),
    then a grouped OR-fold merges the few partials per file, so exactly
    one (file, bitmap) row per file reaches the driver — O(#files ·
    m/8) transfer, never O(k · rows). Positions stay JVM-computed
    (``_bloom_position_exprs`` — Spark's xxhash64 is type-width
    sensitive), so bytes are identical to a driver-side pack of the
    same positions (pinned by ``test_bloom_bitmap_bytes_pinned``)."""
    import base64

    # key files by their path RELATIVE TO THE COMMIT DIR, not basename:
    # on a partitioned table one task writes identically named part
    # files into several partition dirs, and basename keying would
    # silently fuse them into one shared bitmap (r9 ADVICE) — safe
    # direction only, but it weakens skipping. The commit-uuid dir name
    # is the split marker on both sides (unique hex, never repeats).
    marker = os.path.basename(out_dir) + "/"

    def _rel(path: str) -> str:
        return path.split(marker, 1)[1]

    m_of = {
        _rel(e["path"]): _bloom_m(e["rows"], bits_per_key)
        for e in entries
    }
    m_df = local_df(
        spark, [(f, m) for f, m in m_of.items()], "__f string, __m bigint"
    )

    def _fold_partials(batches):
        """Per-partition fold: positions → one partial bitmap per file
        seen in this partition (memory ≈ Σ m/8 of those files)."""
        import numpy as np
        import pandas as pd

        partials: dict = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            for f_name, grp in pdf.groupby("__f", sort=False):
                bm = partials.get(f_name)
                if bm is None:
                    bm = np.zeros(
                        int(grp["__m"].iloc[0]) // 8, dtype=np.uint8
                    )
                    partials[f_name] = bm
                pos = grp["__p"].to_numpy(dtype=np.int64)
                np.bitwise_or.at(
                    bm, pos >> 3, (1 << (pos & 7)).astype(np.uint8)
                )
        if partials:
            yield pd.DataFrame(
                {
                    "__f": list(partials),
                    "__bits": [bm.tobytes() for bm in partials.values()],
                }
            )

    def _or_fold(key, pdf):
        """Merge the ≤ #partitions partial bitmaps of one file."""
        import numpy as np
        import pandas as pd

        acc = np.frombuffer(pdf["__bits"].iloc[0], dtype=np.uint8).copy()
        for raw in pdf["__bits"].iloc[1:]:
            acc |= np.frombuffer(raw, dtype=np.uint8)
        return pd.DataFrame({"__f": [key[0]], "__bits": [acc.tobytes()]})

    for c in cols:
        scan = (
            spark.read.parquet(out_dir)
            .select(
                F.substring_index(
                    F.col("_metadata.file_path"), marker, -1
                ).alias("__f"),
                F.col(c),
            )
            .where(F.col(c).isNotNull())
        )
        folded = (
            scan.join(F.broadcast(m_df), "__f")
            .select(
                "__f",
                "__m",
                F.explode(
                    _bloom_position_exprs(F.col(c), F.col("__m"), k)
                ).alias("__p"),
            )
            .mapInPandas(
                _fold_partials, "__f string, __bits binary"
            )
            .groupBy("__f")
            .applyInPandas(_or_fold, "__f string, __bits binary")
        )
        by_f = {}
        for row in folded.toLocalIterator():
            by_f[row["__f"]] = row["__bits"]
        for e in entries:
            base = _rel(e["path"])
            m = m_of[base]
            bits = by_f.get(base)
            if bits is None:  # file had no non-null values
                bits = bytes(m // 8)
            e.setdefault("bloom", {})[c] = {
                "m": m,
                "b64": base64.b64encode(bytes(bits)).decode(),
            }


def _bloom_value_positions(
    spark: SparkSession, value, ddl: str, m: int, k: int,
    _cache: dict = {},
) -> list[int]:
    """The probe positions of one literal under one (type, m) — a
    zero-row-scan Spark job (hashing MUST be computed by Spark: its
    hash functions are type-width-sensitive), memoized."""
    key = (repr(value), ddl, m, k)
    if key not in _cache:
        if len(_cache) >= 4096:  # bounded memo: point probes in a
            _cache.clear()  # long-lived driver must not grow forever
        _cache[key] = spark.range(1).select(
            _bloom_position_exprs(
                F.lit(value).cast(ddl), F.lit(m), k
            ).alias("p")
        ).first()["p"]
    return _cache[key]


def _bloom_maybe_contains(bloom: dict, positions: list[int]) -> bool:
    import base64

    bits = base64.b64decode(bloom["b64"])
    return all(bits[p >> 3] & (1 << (p & 7)) for p in positions)


def _write_time_col(m: dict, v: int, cur_name: str) -> tuple[str, str]:
    """(write-time name, write-time DDL type) of ``cur_name`` under
    schema version ``v`` — identity on tables without a schema log;
    ('', '') when the column did not exist in that version."""
    log = m.get("schema_log")
    if not log or v == m.get("schema_v", 0):
        t = _schema_types(m["schema"]).get(cur_name, "string")
        return cur_name, _DDL_OF_JSON.get(t, "string")
    cur_id = next(
        (c["id"] for c in m["columns"] if c["name"] == cur_name), None)
    for c in log[str(v)]:
        if c["id"] == cur_id:
            t = c["type"] if isinstance(c["type"], str) else "string"
            return c["name"], _DDL_OF_JSON.get(t, "string")
    return "", ""


def _bloom_keep_expr(m: dict, where: dict[str, tuple]):
    """Spark-side twin of :func:`bloom_prune_point` over the manifest
    DataFrame's ``bloom``/``schema_v`` columns: can the file's bloom
    rule a point predicate's value out? Runs INSIDE the externalized
    planning job, so bitmaps are never collected to the driver (they
    are the one metadata field proportional to data, ~bits_per_key/8
    bytes per row). Bit test = the driver packer's little-endian rule:
    byte[p>>3] & (1 << (p&7)). Absent blooms/columns keep; versions
    branch like :func:`_stats_keep_expr`. Returns None when no point
    predicate can use a bloom."""
    points = {
        c: lo for c, (lo, hi) in where.items()
        if lo == hi and lo == lo  # NaN is never a point probe
    }
    if not points:
        return None
    log = m.get("schema_log")
    versions = sorted(int(v) for v in log) if log else [0]
    sv = F.coalesce(F.col("schema_v"), F.lit(0))
    overall = None
    for v in versions:
        cond_v = None
        for c, val in points.items():
            wname, ddl = _write_time_col(m, v, c)
            if not wname:
                continue  # column absent in v: the stats/default rule
                # already decided; blooms have nothing to add
            bl = F.col("bloom")[F.lit(wname)]
            mbits = F.get_json_object(bl, "$.m").cast("bigint")
            raw = F.unbase64(F.get_json_object(bl, "$.b64"))
            hit = None
            for i in range(_BLOOM_K):
                p = F.pmod(
                    F.xxhash64(F.lit(i), F.lit(val).cast(ddl)), mbits)
                byte = F.conv(
                    F.hex(F.substring(raw, (p / 8).cast("int") + 1, 1)),
                    16, 10,
                ).cast("int")
                # bit n of a 0..255 byte via exact small-int arithmetic
                # (shiftleft/getbit need a LITERAL shift count)
                t = F.pmod(
                    F.floor(byte / F.pow(
                        F.lit(2.0), F.pmod(p, F.lit(8)).cast("double"))),
                    F.lit(2),
                ) == 1
                hit = t if hit is None else (hit & t)
            keep_c = F.coalesce(
                F.when(bl.isNull(), F.lit(True)).otherwise(hit),
                F.lit(True),
            )
            cond_v = keep_c if cond_v is None else (cond_v & keep_c)
        branch = (sv == v) & (
            cond_v if cond_v is not None else F.lit(True))
        overall = branch if overall is None else (overall | branch)
    return overall | ~sv.isin(versions)


def bloom_prune_point(
    spark: SparkSession,
    m: dict,
    entries: list[dict],
    where: dict[str, tuple],
) -> list[dict]:
    """Drop entries whose bloom filters EXCLUDE a point predicate's
    value (lo == hi). Files without a bloom on the (write-time) column
    are kept; range predicates are ignored (blooms answer point
    membership only). Purely additive to stats pruning — run after it."""
    points = {c: lo for c, (lo, hi) in where.items() if lo == hi}
    if not points:
        return entries
    kept = []
    for e in entries:
        blooms = e.get("bloom")
        drop = False
        if blooms:
            for c, v in points.items():
                wname, ddl = _write_time_col(m, e.get("schema_v", 0), c)
                bl = blooms.get(wname)
                if bl is None:
                    continue
                pos = _bloom_value_positions(
                    spark, v, ddl, bl["m"], _BLOOM_K)
                if not _bloom_maybe_contains(bl, pos):
                    drop = True
                    break
        if not drop:
            kept.append(e)
    return kept


def _bloom_refine_touched(
    spark: SparkSession,
    m: dict,
    touched: list[dict],
    changes: DataFrame,
    keys: list[str],
) -> tuple[list[dict], list[dict]]:
    """Merge-time refinement: among box-intersecting files, keep as
    TOUCHED only those whose blooms may contain at least one change-
    batch key tuple (a key matches a file iff EVERY bloom'd key column
    hits). One Spark job per write-time-type group: the change batch
    probes each file's broadcast bitmap words — batch × candidate-file
    METADATA work, never table data. Files without blooms stay
    touched."""
    import base64

    have = [e for e in touched if e.get("bloom")]
    if not have:
        return touched, []
    keep_always = [e for e in touched if not e.get("bloom")]
    # group bloom'd files by the (write-time name, type) tuple of every
    # key column so one probe expression serves the whole group
    groups: dict[tuple, list[dict]] = {}
    for e in have:
        sig = tuple(
            _write_time_col(m, e.get("schema_v", 0), c) for c in keys)
        groups.setdefault(sig, []).append(e)
    hit_paths: set[str] = set()
    for sig, es in groups.items():
        rows = []
        for e in es:
            words: list = []
            ms: list = []
            usable = True
            for (wname, _ddl) in sig:
                bl = e["bloom"].get(wname)
                if bl is None:
                    usable = False
                    break
                raw = base64.b64decode(bl["b64"])
                words.append([
                    # two's-complement into Spark's signed long; the
                    # probe's (w >> n) & 1 is sign-agnostic per bit
                    w - (1 << 64) if w >= (1 << 63) else w
                    for w in (
                        int.from_bytes(raw[i:i + 8], "little")
                        for i in range(0, len(raw), 8)
                    )
                ])
                ms.append(bl["m"])
            if not usable:
                keep_always.append(e)
                continue
            rows.append((e["path"], ms, words))
        if not rows:
            continue
        files_df = local_df(
            spark, rows,
            "path string, ms array<bigint>, ws array<array<bigint>>",
        )
        nn = None
        for k_ in keys:
            c_ = F.col(k_).isNotNull()
            nn = c_ if nn is None else (nn & c_)
        probe = changes.select(*keys).where(nn).distinct()
        joined = probe.crossJoin(F.broadcast(files_df))
        cond = None
        for ci, (_wname, ddl) in enumerate(sig):
            pos = _bloom_position_exprs(
                F.col(keys[ci]).cast(ddl),
                F.element_at("ms", ci + 1), _BLOOM_K,
            )
            w = F.element_at("ws", ci + 1)
            def _bit_test(w_):
                # closure factory: pyspark reads the lambda's arity, so
                # the words column must not ride as a default argument
                return lambda p: F.getbit(
                    F.element_at(w_, (p / 64).cast("int") + 1),
                    F.pmod(p, F.lit(64)),
                ) == 1

            hit_c = F.forall(pos, _bit_test(w))
            cond = hit_c if cond is None else (cond & hit_c)
        hits = joined.where(cond).select("path").distinct().collect()
        hit_paths.update(r["path"] for r in hits)
    refined = keep_always + [e for e in have if e["path"] in hit_paths]
    skipped = [e for e in have
               if e["path"] not in hit_paths
               and e["path"] not in {x["path"] for x in keep_always}]
    return refined, skipped


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
            try:
                st = md.row_group(g).column(ci).statistics
                if st is None or not st.has_min_max:
                    ok = False
                    break
                mn, mx = st.min, st.max
            except Exception:
                # pyarrow cannot extract stats for some types (e.g.
                # DECIMAL raises ArrowNotImplementedError) — absent
                # stats never prune, so skipping the column is safe
                ok = False
                break
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


def _resolve_prop_col(col: str, m: dict | None) -> str:
    """A property's column name, resolved to the CURRENT binding by
    field id: if the name is retired (the column was renamed after the
    property was written), look it up in the schema log — newest
    version first — and translate its id to the live name. Unknown
    names pass through (they simply match nothing downstream)."""
    if not m or "columns" not in m:
        return col
    if col in {c["name"] for c in m["columns"]}:
        return col
    for v in sorted(m.get("schema_log", {}), key=int, reverse=True):
        for c in m["schema_log"][v]:
            if c["name"] == col:
                cur = next(
                    (cc["name"] for cc in m["columns"]
                     if cc["id"] == c["id"]),
                    None,
                )
                return cur if cur is not None else col
    return col


def _write_data_files(
    df: DataFrame,
    table_path: str,
    subdir: str = _DATA_DIR,
    layout_sort: list[str] | None = None,
    layout_partitions: int | None = None,
    current_manifest: dict | None = None,
) -> list[dict]:
    """Write ``df`` as immutable parquet files under ``subdir`` and
    return their manifest entries (path, rows, bytes, per-column min/max
    pruning stats, and — on a partitioned table — the file's partition
    tuple). Files land under a per-commit uuid prefix, so concurrent
    writers never collide and a failed commit's files are identifiable
    orphans. The same machinery writes the data files (``data/``), the
    CDC change files (``changes/``), and the merge-on-read delete
    sidecars (``deletes/``).

    Partitioned tables: every DATA write — appends AND maintenance
    rewrites (merge, fold, compaction) — goes through the table's
    partition spec, so files stay partition-aligned across their whole
    lifecycle: the derived partition columns (never stored; they are
    recomputed from the row values) route rows into hive-layout dirs,
    and the dir names are parsed back into each entry's ``partition``
    tuple. Sidecars (changes/deletes) are change-batch-sized and stay
    unpartitioned.

    ``layout_sort`` (columns already on ``df``, consumed and dropped
    before write) switches the partitioned arrangement from a plain
    hash repartition to range-partition + sort on (partition cols,
    layout cols) — how z-order clustering stays effective INSIDE each
    partition: without it the partition-routing shuffle would silently
    destroy the z-locality the caller just built."""
    import pyarrow.parquet as pq

    spec = table_partition_spec(table_path) if subdir == _DATA_DIR else None
    commit_uuid = uuid.uuid4().hex
    out_dir = os.path.join(table_path, subdir, commit_uuid)
    sort_cols: list[str] = []
    if subdir == _DATA_DIR and not layout_sort:
        # table write order (Iceberg's write.sort-order): every plain
        # data write sorts within tasks on the declared columns, so
        # each file's footer min/max stays tight on them from day one —
        # clustering locality without waiting for a maintenance
        # rewrite. Explicit layout_sort (a clustering rewrite) wins.
        so = table_properties(table_path).get("write.sort-order")
        if so:
            mcur = None
            try:
                mcur = read_manifest(table_path, load_files=False)
            except FileNotFoundError:
                pass
            sort_cols = [
                c for c in (
                    _resolve_prop_col(c0, mcur) for c0 in so["cols"])
                if c in df.columns
            ]
    if spec:
        pnames = [item["name"] for item in spec]
        clash = set(pnames) & set(df.columns)
        if clash:
            raise ValueError(
                f"data columns {sorted(clash)} collide with partition "
                "dir names — rename them"
            )
        d = df.select("*", *_partition_cols(spec, df))
        if layout_sort:
            arr = [F.col(n) for n in pnames + layout_sort]
            if layout_partitions:
                d = d.repartitionByRange(layout_partitions, *arr)
            else:
                d = d.repartitionByRange(*arr)
            d = d.sortWithinPartitions(*arr).drop(*layout_sort)
        else:
            d = d.repartition(*[F.col(n) for n in pnames])
            if sort_cols:
                # rows keep task order through partitionBy's per-dir
                # split, so every written file is sorted on the order
                d = d.sortWithinPartitions(
                    *[F.col(n) for n in pnames], *sort_cols)
        d.write.partitionBy(*pnames).parquet(out_dir)
    else:
        (df.sortWithinPartitions(*sort_cols) if sort_cols else df)\
            .write.parquet(out_dir)
    entries = []
    for p in sorted(
        glob.glob(os.path.join(out_dir, "**", "*.parquet"), recursive=True)
    ):
        rel = os.path.relpath(p, table_path)
        md = pq.ParquetFile(p).metadata
        e = {
            "path": rel,
            "rows": md.num_rows,
            "bytes": os.path.getsize(p),
            "stats": _file_stats(md),
        }
        if spec:
            e["partition"] = _parse_partition(os.path.relpath(p, out_dir))
        entries.append(e)
    cur = current_manifest
    if cur is None:
        # callers holding the manifest pass it in (saves an O(files)
        # json parse per commit on inline-manifest tables)
        try:
            cur = read_manifest(table_path, load_files=False)
        except FileNotFoundError:
            cur = None
    bl = table_properties(table_path).get("bloom")
    if bl and subdir == _DATA_DIR and entries:
        # only types whose probe-side literal cast reproduces the
        # build-side hash exactly (Spark hashing is type-sensitive);
        # other columns simply carry no bloom — absent never prunes.
        # Property names may predate a rename — resolve each through
        # the schema log BY FIELD ID to the column's current name, so
        # blooms keep building even if the property holds retired names
        types = dict(df.dtypes)
        cols = []
        for c0 in bl["cols"]:
            c = _resolve_prop_col(c0, cur)
            if (
                _TYPE_ALIASES.get(types.get(c), types.get(c))
                in ("byte", "short", "integer", "long", "float", "double",
                    "string")
                and c not in cols
            ):
                cols.append(c)
        if cols:
            _build_blooms(
                df.sparkSession, out_dir, entries, cols,
                bl["bits_per_key"], bl.get("k", _BLOOM_K),
            )
    if cur is not None and "schema_v" in cur:
        # the table has field-id evolution state: stamp the write-time
        # schema version on every entry so readers resolve these files'
        # columns by id. (A racing evolve commit between this stamp and
        # our publish takes our snapshot id — the publish then fails
        # with CommitConflict and the retry re-stamps.)
        for e in entries:
            e["schema_v"] = cur["schema_v"]
    return entries


_MANIFEST_DF_SCHEMA = (
    "path string, rows bigint, bytes bigint, seq bigint, "
    "schema_v bigint, "
    "lo_int map<string,bigint>, hi_int map<string,bigint>, "
    "lo_flt map<string,double>, hi_flt map<string,double>, "
    "lo_str map<string,string>, hi_str map<string,string>, "
    "part map<string,string>, bloom map<string,string>"
)


def _entry_to_flat(e: dict) -> dict:
    """One manifest entry → the typed-map row shape the parquet sidecar
    stores (and Spark-side planning filters on). Stats are segregated by
    value type so nothing is stringly- or lossily-typed: int64 bounds
    stay exact (a float map would round them, and a rounded-INWARD range
    is an unsound prune)."""
    row = {
        "path": e["path"],
        "rows": e["rows"],
        "bytes": e["bytes"],
        "seq": e.get("seq", 0),
        "schema_v": e.get("schema_v", 0),
        "lo_int": {}, "hi_int": {},
        "lo_flt": {}, "hi_flt": {},
        "lo_str": {}, "hi_str": {},
        # NULL partition values ride as the hive sentinel so the map
        # stays string-typed; an entry with NO partition info is a null
        # map (keep-always), distinct from an empty tuple
        "part": (
            {k: (_PART_NULL if v is None else str(v))
             for k, v in e["partition"].items()}
            if "partition" in e else None
        ),
        # per-column bloom filters, JSON-encoded per value ({"m","b64"})
        "bloom": (
            {c: json.dumps(bl) for c, bl in e["bloom"].items()}
            if "bloom" in e else None
        ),
    }
    for c, (lo, hi) in e.get("stats", {}).items():
        if isinstance(lo, bool) or isinstance(hi, bool):
            lo, hi = int(lo), int(hi)
        if isinstance(lo, int) and isinstance(hi, int):
            row["lo_int"][c], row["hi_int"][c] = lo, hi
        elif isinstance(lo, str):
            row["lo_str"][c], row["hi_str"][c] = lo, hi
        else:
            row["lo_flt"][c], row["hi_flt"][c] = float(lo), float(hi)
    return row


def _files_ref_path(table_path: str, snapshot_id: int) -> str:
    return os.path.join(
        table_path, _SNAP_DIR,
        f"f{snapshot_id:012d}-{uuid.uuid4().hex}.parquet",
    )


def _write_files_sidecar(table_path: str, new_id: int, files: list[dict]) -> str:
    """Externalize a large files list to a parquet sidecar; returns the
    manifest-relative path. Columnar, so a 10^5-entry manifest loads in
    one vectorized read instead of 10^5 dict parses."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    flat = [_entry_to_flat(e) for e in files]
    cols = ["path", "rows", "bytes", "seq", "schema_v",
            "lo_int", "hi_int", "lo_flt", "hi_flt", "lo_str", "hi_str",
            "part", "bloom"]
    typ = {
        "path": pa.string(), "rows": pa.int64(), "bytes": pa.int64(),
        "seq": pa.int64(), "schema_v": pa.int64(),
        "bloom": pa.map_(pa.string(), pa.string()),
        "lo_int": pa.map_(pa.string(), pa.int64()),
        "hi_int": pa.map_(pa.string(), pa.int64()),
        "lo_flt": pa.map_(pa.string(), pa.float64()),
        "hi_flt": pa.map_(pa.string(), pa.float64()),
        "lo_str": pa.map_(pa.string(), pa.string()),
        "hi_str": pa.map_(pa.string(), pa.string()),
        "part": pa.map_(pa.string(), pa.string()),
    }
    arrays = []
    for c in cols:
        vals = [r[c] for r in flat]
        if c.startswith(("lo_", "hi_")):
            vals = [sorted(v.items()) for v in vals]
        elif c in ("part", "bloom"):
            vals = [sorted(v.items()) if v is not None else None
                    for v in vals]
        arrays.append(pa.array(vals, type=typ[c]))
    p = _files_ref_path(table_path, new_id)
    pq.write_table(pa.table(dict(zip(cols, arrays))), p)
    return os.path.relpath(p, table_path)


def _map_col_rows(t, name: str) -> list[list[tuple]]:
    """A parquet map column as per-row [(key, value), ...] lists via the
    flat offsets/keys/items arrays — MapArray.to_pylist() walks a python
    object per cell and is ~6x slower at 10^5 rows."""
    m = t[name].combine_chunks()
    offs = m.offsets.to_pylist()
    keys = m.keys.to_pylist()
    vals = m.items.to_pylist()
    return [
        list(zip(keys[offs[i]:offs[i + 1]], vals[offs[i]:offs[i + 1]]))
        for i in range(len(offs) - 1)
    ]


def _load_files_sidecar(table_path: str, rel: str) -> list[dict]:
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(table_path, rel))
    col = {
        c: (_map_col_rows(t, c) if c.startswith(("lo_", "hi_"))
            else t[c].to_pylist())
        for c in t.column_names
    }
    # part maps are tiny (one entry per spec item) and may be NULL
    # (unpartitioned entry) — to_pylist keeps the null/empty distinction
    parts = t["part"].to_pylist() if "part" in t.column_names else None
    blooms = t["bloom"].to_pylist() if "bloom" in t.column_names else None
    out = []
    for i in range(t.num_rows):
        stats: dict = {}
        for lo_k, hi_k in (("lo_int", "hi_int"), ("lo_flt", "hi_flt"),
                           ("lo_str", "hi_str")):
            lo_m = col[lo_k][i]
            if lo_m:
                hi_m = dict(col[hi_k][i])
                for c, lo in lo_m:
                    stats[c] = [lo, hi_m[c]]
        entry = {
            "path": col["path"][i],
            "rows": col["rows"][i],
            "bytes": col["bytes"][i],
            "seq": col["seq"][i] or 0,
            "stats": stats,
        }
        # pre-evolution sidecars lack the column; 0 = the oldest version
        sv = col["schema_v"][i] if "schema_v" in col else 0
        if sv:
            entry["schema_v"] = sv
        if parts is not None and parts[i] is not None:
            entry["partition"] = {
                k: (None if v == _PART_NULL else v)
                for k, v in dict(parts[i]).items()
            }
        if blooms is not None and blooms[i] is not None:
            entry["bloom"] = {
                c: json.loads(v) for c, v in dict(blooms[i]).items()
            }
        out.append(entry)
    return out


def _publish(
    table_path: str,
    parent: int | None,
    files: list[dict],
    schema_json: str,
    operation: str,
    extra: dict | None = None,
    deletes: list[dict] | None = None,
    changes: list[dict] | None = None,
    inherit_evolution: bool = True,
    parent_manifest: dict | None = None,
) -> int:
    new_id = (parent or 0) + 1
    os.makedirs(os.path.join(table_path, _SNAP_DIR), exist_ok=True)
    import time

    manifest = {
        "snapshot_id": new_id,
        "parent": parent,
        "operation": operation,
        # commit wall-clock, for timestamp time travel (the publish
        # instant — set before the atomicity point, so a reader can
        # only ever observe a manifest whose ts is already final)
        "committed_at": time.time(),
        "schema": schema_json,
        "deletes": deletes or [],
        "changes": changes or [],
        **(extra or {}),
    }
    if inherit_evolution and "columns" not in manifest and parent:
        # field-id evolution state rides in EVERY manifest once it
        # exists (a manifest must be self-contained: time travel and
        # expiry would otherwise lose the id bindings old files need).
        # Evolution commits set it via ``extra``; everything else
        # inherits the parent's; rollback restores the TARGET's
        # (inherit_evolution=False).
        pm = parent_manifest
        if pm is None:
            try:
                pm = read_manifest(table_path, parent, load_files=False)
            except FileNotFoundError:
                pm = {}  # fabricated/expired parent: the publish below
                # will conflict or the caller validated the real parent
        for k in ("columns", "schema_v", "schema_log"):
            if k in pm:
                manifest[k] = pm[k]
    # commit-time totals: the `.snapshots`/`.history` inspection tables
    # must stay O(#commits) even over externalized manifests — without
    # these, summarizing a long history would parse every files sidecar
    # ever written (r10 verdict). Recorded on every commit; readers fall
    # back to summing the files list for pre-totals manifests.
    manifest["n_files"] = len(files)
    manifest["rows_total"] = sum(int(e.get("rows") or 0) for e in files)
    manifest["bytes_total"] = sum(int(e.get("bytes") or 0) for e in files)
    files_ref = None
    # externalize past the file-count threshold OR as soon as any entry
    # carries a bloom bitmap: bitmaps are the one metadata field
    # proportional to data rows (~bits_per_key/8 bytes per row), and
    # inlining them would break the "manifest JSON is metadata-scale"
    # invariant — the parquet sidecar is the puffin/bloom-index analog
    if len(files) > FILES_INLINE_MAX or any("bloom" in e for e in files):
        files_ref = _write_files_sidecar(table_path, new_id, files)
        manifest["files_ref"] = files_ref
    else:
        manifest["files"] = files
    tmp = _snap_path(table_path, new_id) + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    published = False
    try:
        try:
            # hard-link = the commit's atomicity point: the fully-written
            # tmp content appears under v{new_id} in ONE metadata
            # operation, and exactly one writer can win (link fails with
            # FileExistsError if the name is taken). A crash can never
            # leave a truncated manifest published — the alternative
            # create-then-copy could. (Object-store deployments swap this
            # single call for a conditional PUT / catalog CAS.)
            os.link(tmp, _snap_path(table_path, new_id))
        except FileExistsError as e:
            raise CommitConflict(
                f"snapshot {new_id} already published under {table_path}; "
                "re-read the current snapshot and retry"
            ) from e
        except OSError:
            # filesystem without hard-link support (some NFS/SMB/FUSE
            # mounts): fall back to exclusive-create + copy + fsync —
            # still exactly-one-winner, with the (FS-specific) caveat
            # that a crash mid-copy can leave a truncated manifest,
            # which the link path exists to rule out where available
            try:
                with open(_snap_path(table_path, new_id), "x") as dst, \
                        open(tmp) as src:
                    dst.write(src.read())
                    dst.flush()
                    os.fsync(dst.fileno())
            except FileExistsError as e:
                raise CommitConflict(
                    f"snapshot {new_id} already published under "
                    f"{table_path}; re-read the current snapshot and retry"
                ) from e
        published = True
    finally:
        os.remove(tmp)
        if not published and files_ref is not None:
            # a failed publish must not strand its externalized sidecar
            # (vacuum also sweeps aged metadata debris, but clean up the
            # known case immediately)
            p = os.path.join(table_path, files_ref)
            if os.path.exists(p):
                os.remove(p)
    return new_id


# ---------------------------------------------------------------------------
# Column-id schema evolution (Iceberg's field-id model): every top-level
# column gets a STABLE integer id the first time the table evolves a
# name or type; renames and type widenings are then metadata-only
# commits that change the id→name / id→type binding, never the bytes on
# disk. Each data file records the schema VERSION it was written under
# (``schema_v`` on its manifest entry); readers resolve a file's
# columns by id — read with the write-time names/types, then
# rename/cast to the current binding — so a file written before a
# rename still serves its rows under the new name, and stats pruning
# translates predicate columns per file version (a name-keyed lookup
# would be unsound the moment a retired name is reused).
# ---------------------------------------------------------------------------

# upward-only integer promotions (plus float→double below) — exactly
# Iceberg's allowed primitive promotions: every narrower value is
# exactly representable in the wider type, so old bytes keep their
# meaning under the new binding
_WIDEN_RANK = {"byte": 0, "short": 1, "integer": 2, "long": 3}
_TYPE_ALIASES = {
    "tinyint": "byte", "smallint": "short", "int": "integer",
    "bigint": "long", "byte": "byte", "short": "short",
    "integer": "integer", "long": "long", "float": "float",
    "double": "double",
}


def _columns_of_schema(schema_json: str) -> list[dict]:
    """Assign field ids 1..n to the schema's top-level fields — the
    initial (version 0) id binding, created lazily by the first
    rename/widen so pre-evolution tables carry zero extra metadata."""
    return [
        {"id": i + 1, "name": f["name"], "type": f["type"]}
        for i, f in enumerate(json.loads(schema_json)["fields"])
    ]


def _evolution_state(m: dict) -> tuple[list[dict], int, dict]:
    """(columns, schema_v, schema_log) of a manifest, initializing
    version 0 from the current schema when the table never evolved."""
    if "columns" in m:
        return m["columns"], m["schema_v"], dict(m["schema_log"])
    cols = _columns_of_schema(m["schema"])
    return cols, 0, {"0": cols}


def _name_maps(m: dict) -> dict[int, dict[str, str]] | None:
    """Per historical schema version v: {current column name → that
    version's name for the same field id}. A current column whose id
    version v lacks is ABSENT from v's map (files of that version hold
    no bytes for it — their rows are NULL there). None when the table
    never evolved names/types (no translation needed, and none would
    be sound to skip otherwise: a reused name must never match another
    field's stats)."""
    log = m.get("schema_log")
    if not log:
        return None
    cur = {c["id"]: c["name"] for c in m["columns"]}
    out: dict[int, dict[str, str]] = {}
    for v, cols in log.items():
        by_id = {c["id"]: c["name"] for c in cols}
        out[int(v)] = {cur[i]: by_id[i] for i in cur if i in by_id}
    return out


def _version_schema_json(cols: list[dict]) -> str:
    return json.dumps({
        "type": "struct",
        "fields": [
            {"name": c["name"], "type": c["type"], "nullable": True,
             "metadata": {}}
            for c in cols
        ],
    })


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
            "schema mismatch with table schema — evolve first: "
            "evolve_add_columns (additive, optionally with initial "
            "defaults), rename_column, or widen_column_type (exact "
            "promotions), all metadata-only; writes always carry the "
            "CURRENT binding; "
            f"table={manifest['schema']} df={df.schema.json()}"
        )


def _stamp_seq(entries: list[dict], parent: int | None) -> list[dict]:
    """Mark freshly-written entries with the sequence number of the
    commit about to publish them ((parent or 0) + 1). Merge-on-read
    deletes apply only to data files with a STRICTLY SMALLER seq — the
    Iceberg sequence-number rule — so a merge batch's own rows are never
    shadowed by the delete sidecar published alongside them. Legacy
    entries without the key read as seq 0 (older than every delete)."""
    new_id = (parent or 0) + 1
    for e in entries:
        e["seq"] = new_id
    return entries


def commit_append(
    df: DataFrame,
    table_path: str,
    extra: dict | None = None,
    partition_spec: list[dict] | None = None,
) -> int:
    """Append ``df`` as a new snapshot: parent's files + the new files.
    Returns the published snapshot id. Data is written BEFORE the
    manifest is published, so a crash mid-commit leaves only orphans.
    ``extra`` lands in the manifest (e.g. the streaming sink's
    ``stream_batch_id`` idempotency ledger).

    ``partition_spec`` (first commit only — the spec is immutable for
    the table's lifetime) declares hidden partitioning: a list of
    {"col", "transform", "param"} items (see
    :func:`table_partition_spec`). Every subsequent data write routes
    through it automatically; readers prune partitions by predicating
    on the SOURCE columns — they never see or name the physical
    layout."""
    if partition_spec is not None:
        if current_snapshot_id(table_path) is not None:
            raise ValueError(
                "partition_spec can only be set when the table is "
                "created (first commit) — it is immutable afterwards"
            )
        os.makedirs(table_path, exist_ok=True)
        _store_partition_spec(table_path, partition_spec)
    parent = current_snapshot_id(table_path)
    base: list[dict] = []
    deletes: list[dict] = []
    if parent is not None:
        m = read_manifest(table_path, parent)
        _check_schema(df, m)
        base = m["files"]
        deletes = m.get("deletes", [])
        schema_json = m["schema"]
    else:
        os.makedirs(table_path, exist_ok=True)
        schema_json = df.schema.json()
    _enforce_constraints(df, table_path)
    pm = m if parent is not None else None
    new_files = _stamp_seq(
        _write_data_files(df, table_path, current_manifest=pm), parent)
    return _publish(
        table_path, parent, base + new_files, schema_json, "append",
        extra=extra, deletes=deletes, parent_manifest=pm,
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
        new_files = _stamp_seq(
            _write_data_files(add_df, table_path, current_manifest=m),
            parent,
        )
    return _publish(
        table_path, parent, kept + new_files, m["schema"], "replace",
        deletes=m.get("deletes", []), parent_manifest=m,
    )


def _absent_keep(m: dict, name: str, lo, hi) -> bool:
    """May a file whose schema version PREDATES column ``name`` still
    hold rows matching ``lo <= name <= hi``? Only via the column's
    initial default (every pre-add row carries it): no default ⇒ all
    NULL ⇒ a range never matches; a default inside the range ⇒ every
    row matches; incomparable types ⇒ keep (pruning must fail safe)."""
    for c in m.get("columns", []):
        if c["name"] == name:
            d = c.get("default")
            if d is None:
                return False
            if isinstance(d, bool):
                d = int(d)
            try:
                return bool(lo <= d <= hi)
            except TypeError:
                return True
    return False


def files_intersecting(
    manifest: dict, where: dict[str, tuple]
) -> list[dict]:
    """The manifest entries a conjunctive range predicate ``where``
    ({col: (lo, hi)}) cannot rule out: a file is kept iff its stored
    [min, max] intersects the range on EVERY predicated column (files
    without stats for a column are kept — pruning must be safe). The
    file-level twin of ``layout.row_group_skip_audit``, evaluated on
    manifest METADATA — no footer reads, no data reads.

    Field-id evolution: a file's stats are keyed by its WRITE-TIME
    column names, so predicate columns translate per file version
    before the lookup — both for pruning power (a renamed column's old
    stats still prune) and for soundness (a predicate on a column whose
    name an older version used for a DIFFERENT field must not match
    that field's stats). A file whose version predates a predicated
    column is dropped outright: its rows are all-NULL there, and NULL
    never satisfies a range."""
    maps = _name_maps(manifest)
    cur_v = manifest.get("schema_v", 0)
    kept = []
    for e in manifest["files"]:
        v = e.get("schema_v", 0)
        if maps is None or v == cur_v:
            w = where
        else:
            mp = maps[v]
            w, dead = {}, False
            for c, b in where.items():
                if c in mp:
                    w[mp[c]] = b
                elif not _absent_keep(manifest, c, b[0], b[1]):
                    dead = True  # absent in v, default can't match
                    break
                # else: every pre-add row carries an in-range default —
                # this column cannot rule the file out
            if dead:
                continue
        stats = e.get("stats", {})
        hit = True
        for c, (lo, hi) in w.items():
            if c in stats and not (stats[c][1] >= lo and stats[c][0] <= hi):
                hit = False
                break
        if hit:
            kept.append(e)
    return kept


_INT_JSON = {"byte", "short", "integer", "long"}
_FLT_JSON = {"float", "double"}
_DDL_OF_JSON = {
    "byte": "tinyint", "short": "smallint", "integer": "int",
    "long": "bigint", "float": "float", "double": "double",
    "string": "string", "date": "date", "timestamp": "timestamp",
    "boolean": "boolean",
}


def _schema_types(schema_json: str) -> dict[str, str]:
    return {
        f["name"]: (f["type"] if isinstance(f["type"], str) else "complex")
        for f in json.loads(schema_json)["fields"]
    }


def _bound_str(v) -> str:
    import datetime

    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def _bucket_of(spark: SparkSession, value, ctype_json: str, n: int) -> int:
    """The bucket Spark's partitioned writer assigned to ``value`` —
    computed BY Spark (one zero-row-scan literal job) because
    F.hash is type-sensitive and must match the write-side exactly."""
    ddl = _DDL_OF_JSON.get(ctype_json, "string")
    return spark.range(1).select(
        F.pmod(F.hash(F.lit(value).cast(ddl)), F.lit(n)).alias("b")
    ).first()["b"]


def partition_prune(
    spark: SparkSession,
    spec: list[dict],
    schema_json: str,
    entries: list[dict],
    where: dict[str, tuple],
) -> list[dict]:
    """The manifest entries a conjunctive range predicate on SOURCE
    columns cannot rule out via the partition tuple — predicate bounds
    are mapped THROUGH each transform (identity: direct; truncate:
    floor/prefix monotonicity; year/month/day/hour: ISO-prefix
    monotonicity at the granularity; bucket:
    point predicates only), the hidden-partitioning contract. Entries
    without partition info (pre-spec files; never produced by this
    layer, but safe-by-default) are kept; a NULL partition value is
    DROPPED under any range predicate on that column — every row in the
    file has NULL there, and a range never matches NULL. Metadata-only:
    no file IO."""
    types = _schema_types(schema_json)
    items = [it for it in spec if it["col"] in where]
    if not items:
        return entries
    bcache: dict[tuple, int] = {}
    kept = []
    for e in entries:
        part = e.get("partition")
        if part is None:
            kept.append(e)
            continue
        drop = False
        for it in items:
            name, t, prm = it["name"], it["transform"], it["param"]
            if name not in part:
                continue
            pv = part[name]
            lo, hi = where[it["col"]]
            if pv is None:
                drop = True
                break
            ctype = types.get(it["col"], "string")
            try:
                if t == "identity":
                    if ctype in _INT_JSON:
                        ok = lo <= int(pv) <= hi
                    elif ctype in _FLT_JSON:
                        ok = lo <= float(pv) <= hi
                    else:
                        ok = _bound_str(lo) <= pv <= _bound_str(hi)
                elif t == "truncate":
                    if ctype in _INT_JSON:
                        v = int(pv)
                        ok = v <= hi and v + prm - 1 >= lo
                    else:
                        ok = (_bound_str(lo)[:prm] <= pv
                              <= _bound_str(hi)[:prm])
                elif t in _TIME_TRANSFORMS:
                    n = _TIME_TRANSFORMS[t][1]
                    ok = _bound_str(lo)[:n] <= pv <= _bound_str(hi)[:n]
                else:  # bucket: only a point predicate can prune
                    if lo != hi:
                        continue
                    key = (it["col"], lo)
                    if key not in bcache:
                        bcache[key] = _bucket_of(spark, lo, ctype, prm)
                    ok = int(pv) == bcache[key]
            except (TypeError, ValueError):
                continue  # un-mappable bound: cannot rule the file out
            if not ok:
                drop = True
                break
        if not drop:
            kept.append(e)
    return kept


def drop_partition(
    spark: SparkSession,
    table_path: str,
    values: dict[str, object],
    record_changes: bool = True,
) -> int:
    """Drop every file whose partition tuple matches ``values`` (keyed
    by spec item name, e.g. {"p0": "1995-03"}; None matches the NULL
    partition) — a METADATA-ONLY commit, the partition-layout payoff:
    retiring a month of a 100 TB time-partitioned table removes
    thousands of files without reading or writing one byte of data.

    Sound only because partition alignment is a lifecycle invariant
    here (every data write routes through the spec): if any manifest
    entry lacks the named partition values, the drop REFUSES — rows of
    the target partition could hide in unaligned files; use
    ``delete_snapshot_where`` instead. ``record_changes`` keeps the CDC
    feed complete (one read of the dropped files, still zero rewrite)."""
    spec = _all_spec_items(table_path) or []
    names = {it["name"] for it in spec}
    unknown = set(values) - names
    if unknown:
        raise ValueError(
            f"unknown partition names {sorted(unknown)}; spec has "
            f"{sorted(names)}"
        )
    parent = current_snapshot_id(table_path)
    if parent is None:
        raise FileNotFoundError(f"no snapshots under {table_path}")
    m = read_manifest(table_path, parent)
    unaligned = [
        e["path"] for e in m["files"]
        if any(n not in e.get("partition", {}) for n in values)
    ]
    if unaligned:
        raise ValueError(
            "drop_partition requires full partition alignment but "
            f"{len(unaligned)} file(s) lack partition values (e.g. "
            f"{unaligned[:3]}) — use delete_snapshot_where"
        )

    def _match(e):
        return all(
            e["partition"][n] == (None if v is None else str(v))
            for n, v in values.items()
        )

    dropped = [e for e in m["files"] if _match(e)]
    if not dropped:
        return parent
    kept = [e for e in m["files"] if not _match(e)]
    change_files: list[dict] = []
    if record_changes:
        old = _read_entries(spark, table_path, m, dropped)
        change_files = _write_data_files(
            old.withColumn("_change_type", F.lit("delete")),
            table_path, subdir=_CHANGES_DIR, current_manifest=m,
        )
    if current_snapshot_id(table_path) != parent:
        raise CommitConflict(
            f"snapshot advanced past {parent} while dropping — replan"
        )
    return _publish(
        table_path, parent, kept, m["schema"], "drop-partition",
        deletes=m.get("deletes", []),
        changes=change_files,
        extra={"change_op": "delete", "dropped_partition": {
            k: (None if v is None else str(v)) for k, v in values.items()
        }},
    )


def manifest_files_df(
    spark: SparkSession,
    table_path: str,
    snapshot_id: int | None = None,
    m: dict | None = None,
) -> DataFrame:
    """A snapshot's file manifest as a DataFrame with typed stats maps
    (path, rows, bytes, seq, lo_int/hi_int, lo_flt/hi_flt, lo_str/
    hi_str) — the planning-as-a-Spark-job surface. Externalized
    manifests (``files_ref``) are read straight from their parquet
    sidecar (zero driver parsing); inline manifests are lifted into the
    same shape, so downstream planning code is layout-agnostic."""
    if m is None:
        m = read_manifest(table_path, snapshot_id)
    if "files_ref" in m:
        return spark.read.schema(_MANIFEST_DF_SCHEMA).parquet(
            os.path.join(table_path, m["files_ref"])
        )
    rows = [_entry_to_flat(e) for e in m["files"]]
    return local_df(
        spark,
        [tuple(r[c] for c in (
            "path", "rows", "bytes", "seq", "schema_v",
            "lo_int", "hi_int", "lo_flt", "hi_flt", "lo_str", "hi_str",
            "part", "bloom",
        )) for r in rows],
        _MANIFEST_DF_SCHEMA,
    )


def _partition_keep_expr(
    spec: list[dict],
    where: dict[str, tuple],
    types: dict[str, str],
):
    """Spark expression: can the predicate rule this manifest row's
    partition tuple out? Mirrors :func:`partition_prune` (same transform
    monotonicity arguments); NULL/absent handling: no part map or no
    entry for the item -> keep; hive NULL sentinel -> drop (a range
    predicate never matches NULL rows). try_cast failures coalesce to
    keep."""
    cond = None
    for it in spec:
        if it["col"] not in where:
            continue
        lo, hi = where[it["col"]]
        name, t, prm = it["name"], it["transform"], it["param"]
        ctype = types.get(it["col"], "string")
        pv = F.col("part")[F.lit(name)]
        if t == "identity":
            if ctype in _INT_JSON:
                typed = pv.try_cast("bigint").between(
                    F.lit(lo).try_cast("bigint"),
                    F.lit(hi).try_cast("bigint"))
            elif ctype in _FLT_JSON:
                typed = pv.try_cast("double").between(
                    F.lit(lo).try_cast("double"),
                    F.lit(hi).try_cast("double"))
            else:
                typed = pv.between(F.lit(_bound_str(lo)),
                                   F.lit(_bound_str(hi)))
        elif t == "truncate":
            if ctype in _INT_JSON:
                v = pv.try_cast("bigint")
                typed = (v <= F.lit(hi).try_cast("bigint")) & (
                    v + F.lit(prm - 1) >= F.lit(lo).try_cast("bigint"))
            else:
                typed = pv.between(F.lit(_bound_str(lo)[:prm]),
                                   F.lit(_bound_str(hi)[:prm]))
        elif t in _TIME_TRANSFORMS:
            n = _TIME_TRANSFORMS[t][1]
            typed = pv.between(F.lit(_bound_str(lo)[:n]),
                               F.lit(_bound_str(hi)[:n]))
        else:  # bucket: point predicates only
            if lo != hi:
                continue
            ddl = _DDL_OF_JSON.get(ctype, "string")
            typed = pv.try_cast("int") == F.pmod(
                F.hash(F.lit(lo).cast(ddl)), F.lit(prm))
        e = (
            F.when(F.col("part").isNull(), F.lit(True))
            .when(~F.map_contains_key(F.col("part"), F.lit(name)),
                  F.lit(True))
            .when(pv == _PART_NULL, F.lit(False))
            .otherwise(typed)
        )
        e = F.coalesce(e, F.lit(True))
        cond = e if cond is None else (cond & e)
    return cond


def files_intersecting_spark(
    manifest_df: DataFrame,
    where: dict[str, tuple],
    spec: list[dict] | None = None,
    schema_json: str | None = None,
    m: dict | None = None,
) -> DataFrame:
    """Spark-side twin of :func:`files_intersecting`: filter the typed
    manifest DataFrame down to the entries a conjunctive range predicate
    cannot rule out. Same keep-when-stats-absent safety (a column in no
    stats map ⇒ the file is kept). Distributed: on a 10^5-10^6-file
    table this is a parquet scan + filter, not a driver loop — the
    ``manifest_pruning_equivalence`` gate pins both paths to the same
    surviving set. With ``spec``/``schema_json`` the partition tuple
    prunes too (same transform mapping as :func:`partition_prune`),
    composing with the stats filter.

    ``m`` (the manifest dict) enables field-id translation on evolved
    tables: the keep-expression branches on each row's ``schema_v``,
    looking stats up under that version's column names — the same
    translation (and the same drop-when-column-absent rule) as the
    driver-side twin, so the equivalence gate keeps holding."""
    if spec and schema_json:
        pk = _partition_keep_expr(spec, where, _schema_types(schema_json))
        if pk is not None:
            manifest_df = manifest_df.where(pk)
    maps = _name_maps(m) if m else None
    if maps is not None and len(maps) > 1:
        sv = F.coalesce(F.col("schema_v"), F.lit(0))
        cond = None
        for v, mp in sorted(maps.items()):
            miss = [c for c in where if c not in mp]
            if any(not _absent_keep(m, c, *where[c]) for c in miss):
                # predicated column absent in v with no (in-range)
                # default: those files' rows cannot match — prunable
                keep_v = F.lit(False)
            else:
                keep_v = _stats_keep_expr(
                    {mp[c]: b for c, b in where.items() if c in mp})
            branch = (sv == v) & keep_v
            cond = branch if cond is None else (cond | branch)
        # versions outside the log cannot exist on a well-formed table;
        # keep them anyway (pruning must fail safe, never silent-drop)
        cond = cond | ~sv.isin(list(maps))
        return manifest_df.where(cond)
    return manifest_df.where(_stats_keep_expr(where))


def _stats_keep_expr(where: dict[str, tuple]):
    """The conjunctive can't-rule-this-file-out expression over the
    typed stats maps, for one set of (already version-resolved) column
    names."""
    cond = None
    for c, (lo, hi) in where.items():
        k = F.lit(c)
        # bounds go through try_cast to each stats map's value type: a
        # bound that doesn't convert (a string box on an int-stat
        # column) becomes NULL instead of an ANSI cast error, and the
        # coalesce below turns NULL into KEEP — "can't rule the file
        # out" must never drop it. Numeric truncation is directionally
        # safe against integer stats: lo truncates toward zero (widens
        # or exactly preserves the integer-point range), hi likewise.
        def _num_lit(v, t):
            # date/datetime bounds have no numeric form: a NULL literal
            # keeps the coalesce-to-KEEP contract (and dodges the
            # ANALYSIS-time cast error a typed literal would raise);
            # such columns never carry int/float stats anyway
            import datetime as _dt

            if isinstance(v, (_dt.date, _dt.datetime)):
                return F.lit(None).cast(t)
            return F.lit(v).try_cast(t)

        lo_i, hi_i = _num_lit(lo, "bigint"), _num_lit(hi, "bigint")
        lo_f, hi_f = _num_lit(lo, "double"), _num_lit(hi, "double")
        lo_s, hi_s = F.lit(_bound_str(lo)), F.lit(_bound_str(hi))
        c_hit = (
            F.when(
                F.map_contains_key(F.col("lo_int"), k),
                (F.col("hi_int")[k] >= lo_i) & (F.col("lo_int")[k] <= hi_i),
            )
            .when(
                F.map_contains_key(F.col("lo_flt"), k),
                (F.col("hi_flt")[k] >= lo_f) & (F.col("lo_flt")[k] <= hi_f),
            )
            .when(
                F.map_contains_key(F.col("lo_str"), k),
                (F.col("hi_str")[k] >= lo_s) & (F.col("lo_str")[k] <= hi_s),
            )
            .otherwise(F.lit(True))
        )
        cond_c = F.coalesce(c_hit, F.lit(True))
        cond = cond_c if cond is None else (cond & cond_c)
    return cond if cond is not None else F.lit(True)


def _table_prefix(table_path: str) -> str:
    """The absolute-path prefix Spark's ``_metadata.file_path`` carries
    for this table's files, normalized through realpath so the SAME
    string is computed at position-delete time and at read time."""
    return os.path.realpath(os.path.abspath(table_path)) + "/"


def _attach_positions(df: DataFrame, table_path: str) -> DataFrame:
    """Add (__file, __pos) row-identity columns from the parquet scan's
    hidden ``_metadata`` struct: __file is the table-relative data-file
    path, __pos the stable row ordinal within it — the per-row identity
    the position-delete sidecars are keyed on. Zero extra IO: both come
    from the reader, not the data pages."""
    return (
        df.select(
            "*",
            F.col("_metadata.file_path").alias("__fp"),
            F.col("_metadata.row_index").alias("__pos"),
        )
        .withColumn(
            "__file",
            F.substring_index(F.col("__fp"), _table_prefix(table_path), -1),
        )
        .drop("__fp")
    )


_POS_SIDECAR_SCHEMA = "file string, pos bigint"


def _version_select(
    m: dict, vcols: list[dict], have: set[str] | None = None
) -> list:
    """The select list normalizing a frame read under the schema
    version described by ``vcols`` to ``m``'s current binding, by field
    id: renamed columns re-alias, widened columns cast up, columns the
    version lacks surface their initial default (NULL when none).
    ``have`` (the frame's actual columns) additionally NULL-fills names
    the frame misses — the change-feed case, where pre-id additive
    evolution means a version-v frame may lack some of v's columns.
    ONE definition shared by the table scan and the change feed, so the
    two surfaces can never normalize evolved files differently."""
    cur = StructType.fromJson(json.loads(m["schema"]))
    by_id = {c["id"]: (c["name"], c["type"]) for c in vcols}
    sel = []
    for c, f in zip(m["columns"], cur.fields):
        old = by_id.get(c["id"])
        if old is None:
            sel.append(
                F.lit(c.get("default")).cast(f.dataType).alias(f.name))
        elif have is not None and old[0] not in have:
            sel.append(F.lit(None).cast(f.dataType).alias(f.name))
        elif old[0] != f.name or old[1] != c["type"]:
            sel.append(F.col(old[0]).cast(f.dataType).alias(f.name))
        else:
            sel.append(F.col(f.name))
    return sel


def _scan_entries(
    spark: SparkSession,
    table_path: str,
    m: dict,
    entries: list[dict],
    with_positions: bool = False,
) -> DataFrame:
    """Scan manifest entries normalized to the manifest's CURRENT
    schema. On a table with field-id evolution, entries are grouped by
    their write-time ``schema_v``; each group is read with ITS version's
    column names/types (so parquet's name-based resolution finds the
    bytes) and then renamed/cast to the current id→name binding —
    columns whose id the write-time version lacks surface as NULL. One
    scan per live version (versions are few: one per evolution commit),
    unioned; the common single-version case is one plain scan."""
    cur = StructType.fromJson(json.loads(m["schema"]))
    log = m.get("schema_log")
    cur_v = m.get("schema_v", 0)
    groups: dict[int, list[str]] = {}
    for e in entries:
        groups.setdefault(e.get("schema_v", 0), []).append(e["path"])

    def _read(paths: list[str], schema: StructType) -> DataFrame:
        df = spark.read.schema(schema).parquet(
            *[os.path.join(table_path, p) for p in paths]
        )
        # row identity must come off the raw scan (the ``_metadata``
        # struct resolves on the relation, before any projection)
        return _attach_positions(df, table_path) if with_positions else df

    if not log or set(groups) <= {cur_v}:
        return _read([e["path"] for e in entries], cur)
    out = None
    for v, paths in sorted(groups.items()):
        vcols = log[str(v)]
        df = _read(
            paths,
            StructType.fromJson(json.loads(_version_schema_json(vcols))),
        )
        sel = _version_select(m, vcols)
        if with_positions:
            sel += [F.col("__pos"), F.col("__file")]
        df = df.select(*sel)
        out = df if out is None else out.unionByName(df)
    return out


def _delete_to_current(d: dict, m: dict) -> dict:
    """A merge-on-read delete dict with its column names translated from
    the delete's write-time schema version to the manifest's current
    binding (deletes apply to the NORMALIZED row stream). Position
    deletes carry no column names; values need no conversion — widening
    is exact."""
    log = m.get("schema_log")
    dv = d.get("schema_v", 0)
    if not log or dv == m.get("schema_v", 0):
        return d
    cur_by_id = {c["id"]: c["name"] for c in m["columns"]}
    v_to_cur = {
        c["name"]: cur_by_id[c["id"]]
        for c in log[str(dv)]
        if c["id"] in cur_by_id
    }
    out = dict(d)
    if "keys" in d:
        out["keys"] = [v_to_cur[k] for k in d["keys"]]
        out["_rename"] = {k: v_to_cur[k] for k in d["keys"]
                          if v_to_cur[k] != k}
    if "box" in d:
        out["box"] = {v_to_cur[c]: b for c, b in d["box"].items()}
    return out


def _read_entries(
    spark: SparkSession,
    table_path: str,
    m: dict,
    entries: list[dict],
    with_positions: bool = False,
) -> DataFrame:
    """Read a subset of a snapshot's data files with the snapshot's
    schema, applying the manifest's merge-on-read deletes: a delete
    sidecar shadows rows in every data file with seq < the delete's seq
    — the anti-join-at-read half of the MoR contract. Files are grouped
    by how many deletes apply (applicable sets nest, newest-last), so
    the scan stays one union of a handful of strata, each anti-joined
    against the BROADCAST sidecars — delete files are change-batch-
    sized, metadata-tier, never table-tier. Three delete kinds:
    equality (key rows, ``merge_snapshot_mor``), range (a predicate
    box, ``delete_snapshot_where_mor``), and position ((file, pos)
    rows, ``delete_snapshot_rows_mor``) — position deletes only touch
    strata containing a file they NAME, and the (__file, __pos)
    identity columns they join on are scan metadata, not data IO.

    ``with_positions=True`` keeps (__file, __pos) in the result — the
    surface :func:`delete_snapshot_rows_mor` selects row identities
    from."""
    from pyspark.sql.types import LongType, StringType, StructField

    schema = StructType.fromJson(json.loads(m["schema"]))
    if not entries:
        if with_positions:
            schema = StructType(
                schema.fields
                + [StructField("__pos", LongType()),
                   StructField("__file", StringType())]
            )
        return spark.createDataFrame([], schema)
    deletes = sorted(m.get("deletes", []), key=lambda d: d["seq"])
    if not deletes and not with_positions:
        return _scan_entries(spark, table_path, m, entries)
    # stratum i = files that the suffix deletes[i:] applies to
    strata: dict[int, list[dict]] = {}
    seqs = [d["seq"] for d in deletes]
    for e in entries:
        eseq = e.get("seq", 0)
        i = 0
        while i < len(seqs) and seqs[i] <= eseq:
            i += 1
        strata.setdefault(i, []).append(e)
    out = None
    for i, stratum in sorted(strata.items()):
        paths = [e["path"] for e in stratum]
        # delete column names translate (by field id) to the manifest's
        # current binding — the scan below is NORMALIZED, so a sidecar
        # keyed on a since-renamed column must shadow under the new name
        applicable = [_delete_to_current(d, m) for d in deletes[i:]]
        # position deletes name their files: a stratum containing none
        # of a delete's named files skips its anti-join entirely
        pos_live = {
            id(d)
            for d in applicable
            if d.get("kind") == "position"
            and set(paths) & set(d.get("files", []))
        }
        has_pos = with_positions or bool(pos_live)
        df = _scan_entries(
            spark, table_path, m, stratum, with_positions=has_pos
        )
        for d in applicable:
            if d.get("kind") == "range":
                # predicate delete: drop rows inside the box; NULL-valued
                # rows never match a range (same rule as the CoW delete)
                inside = None
                for c, (lo, hi) in d["box"].items():
                    cond = F.col(c).between(lo, hi)
                    inside = cond if inside is None else (inside & cond)
                df = df.where(F.coalesce(~inside, F.lit(True)))
            elif d.get("kind") == "position":
                if id(d) in pos_live:
                    side = spark.read.schema(_POS_SIDECAR_SCHEMA).parquet(
                        *[os.path.join(table_path, p) for p in d["paths"]]
                    ).select(
                        F.col("file").alias("__file"),
                        F.col("pos").alias("__pos"),
                    )
                    df = df.join(
                        F.broadcast(side), ["__file", "__pos"], "left_anti"
                    )
            else:  # equality delete: anti-join the broadcast key sidecar
                # the sidecar parquet holds its WRITE-TIME column names;
                # _delete_to_current recorded the old→current renames
                ren = d.get("_rename", {})
                cur_of = {v: k for k, v in ren.items()}
                dk = spark.read.parquet(
                    *[os.path.join(table_path, p) for p in d["paths"]]
                ).select(
                    *[F.col(cur_of.get(k, k)).alias(k) for k in d["keys"]]
                )
                # no .distinct(): writers publish the sidecar pre-distincted
                # (merge_*_mor rejects duplicate-key batches), and a
                # left_anti build side is duplicate-insensitive anyway — a
                # distinct here only added an exchange per read stratum
                # widened key columns: cast the sidecar side up so the
                # join compares like types (exact promotions only)
                for k in d["keys"]:
                    dk = dk.withColumn(k, F.col(k).cast(dict(df.dtypes)[k]))
                df = df.join(F.broadcast(dk), d["keys"], "left_anti")
        if has_pos and not with_positions:
            df = df.drop("__file", "__pos")
        out = df if out is None else out.unionByName(df)
    return out


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
    result equals an unpruned read + filter. On tables past
    ``FILES_INLINE_MAX`` files the pruning runs as a Spark job over the
    parquet manifest sidecar (``files_intersecting_spark``) instead of a
    driver loop — same surviving set, pinned by the equivalence gate.

    Merge-on-read deletes (``merge_snapshot_mor``) are applied: rows a
    delete sidecar shadows never surface."""
    m = read_manifest(table_path, snapshot_id, load_files=False)
    # prune against the UNION of all partition specs: each file's tuple
    # carries only its own spec's (globally unique) item names, so
    # cross-spec items skip rather than mis-prune
    spec = _all_spec_items(table_path) if where else None
    if "files_ref" in m:
        # externalized manifest: plan WITHOUT materializing the entry
        # list on the driver — prune (optionally) as a Spark job over
        # the parquet sidecar (partition tuple AND stats), collect only
        # surviving (path, seq)
        mdf = manifest_files_df(spark, table_path, m=m)
        if where:
            mdf = files_intersecting_spark(
                mdf, where, spec=spec, schema_json=m["schema"], m=m)
        if where:
            # bloom point-skipping runs INSIDE the planning job too —
            # bitmaps (the one metadata field proportional to data)
            # never ride to the driver on the externalized path
            bk = _bloom_keep_expr(m, where)
            if bk is not None:
                mdf = mdf.where(bk)
        entries = [
            {"path": r["path"], "seq": r["seq"],
             "schema_v": r["schema_v"] or 0}
            for r in mdf.select(
                "path", "seq",
                F.coalesce(F.col("schema_v"), F.lit(0)).alias("schema_v"),
            ).collect()
        ]
    elif not where:
        entries = m["files"]
    else:
        entries = m["files"]
        if spec:
            entries = partition_prune(
                spark, spec, m["schema"], entries, where)
        entries = files_intersecting({**m, "files": entries}, where)
        entries = bloom_prune_point(spark, m, entries, where)
    df = _read_entries(spark, table_path, m, entries)
    if where:
        for c, (lo, hi) in where.items():
            df = df.where(F.col(c).between(lo, hi))
    return df


def snapshot_rowcount(
    table_path: str, snapshot_id: int | None = None
) -> int:
    """COUNT(*) of a snapshot answered from METADATA alone (the
    Iceberg/Delta count-pushdown trick): the manifest already carries
    every file's exact row count, so the answer is one sum over
    manifest entries — zero data IO, no Spark job. Refuses when
    merge-on-read delete sidecars are pending (physical stored rows
    exceed the logical count then; run ``fold_deletes`` or count via
    ``read_snapshot`` instead) — a silently wrong fast count would be
    worse than a slow exact one."""
    m = read_manifest(table_path, snapshot_id)
    if m.get("deletes"):
        raise ValueError(
            "snapshot has pending merge-on-read deletes — the metadata "
            "row count would overcount shadowed rows; fold_deletes "
            "first or count through read_snapshot"
        )
    return sum(e["rows"] for e in m["files"])


def scan_aggregate(
    spark: SparkSession,
    table_path: str,
    minmax_cols: tuple = (),
    snapshot_id: int | None = None,
    where: dict | None = None,
) -> tuple[DataFrame, bool]:
    """COUNT(*) plus per-column MIN/MAX answered from manifest METADATA
    alone when that is provably exact — the aggregate-pushdown design
    the Iceberg/Delta planners apply to stats-only queries, generalized
    from :func:`snapshot_rowcount`. Returns ``(one-row DataFrame,
    from_metadata)``; when any soundness gate fails the SAME aggregate
    runs as a real scan (identical values, identical schema), so the
    caller never gets a wrong fast answer:

      * pending merge-on-read delete sidecars → scan (metadata counts
        include shadowed rows);
      * ``where`` (``{col: value}`` equality conjunction) must bind to
        partition columns under an identity transform (value = the
        column value) or a time transform (value = the GRANULE string,
        e.g. ``"1995-01-10"`` on a day-partitioned column — Iceberg's
        partition-value query; the scan fallback applies the same
        granule semantics via ``date_format``), and every file must
        carry those partition items (spec-evolved stragglers → scan) —
        files are then all-in or all-out, so summing kept entries is
        exact;
      * every kept non-empty file must carry numeric min/max stats for
        each requested column. String bounds are excluded by design:
        parquet writers may truncate long string stats, and a truncated
        max is not the max (the numeric bounds the footer stores are
        exact).

    Metadata path cost is O(#files) driver work over the entry list —
    the same metadata scale as any manifest planner, never a data
    scan."""
    sid = snapshot_id if snapshot_id is not None \
        else current_snapshot_id(table_path)
    m = read_manifest(table_path, sid)
    types = _schema_types(m["schema"])
    ddl_parts = ["n_rows bigint"]
    for c in minmax_cols:
        t = _DDL_OF_JSON.get(types.get(c, "string"), "string")
        ddl_parts += [f"min_{c} {t}", f"max_{c} {t}"]
    schema = ", ".join(ddl_parts)

    # a where column binds when the CURRENT spec derives a partition
    # value that equality on the caller's value maps through exactly:
    # identity (value = column value) or a time transform (value = the
    # granule string, which IS the stored partition value)
    spec = table_partition_spec(table_path) or []
    binds = {
        it["col"]: (it["name"], it["transform"])
        for it in spec
        if it["transform"] == "identity"
        or it["transform"] in _TIME_TRANSFORMS
    }
    entries = None if m.get("deletes") else m["files"]
    if entries is not None and where:
        if set(where) <= set(binds):
            kept = []
            for e in entries:
                part = e.get("partition")
                ok: bool | None = True
                for col, val in where.items():
                    if part is None or binds[col][0] not in part:
                        ok = None  # file not provably aligned
                        break
                    if part[binds[col][0]] != (
                            None if val is None else str(val)):
                        ok = False
                        break
                if ok is None:
                    entries = None
                    break
                if ok:
                    kept.append(e)
            else:
                entries = kept
        else:
            entries = None
    if entries is not None and minmax_cols:
        for e in entries:
            if not e["rows"]:
                continue
            st = e.get("stats") or {}
            if any(
                (b := st.get(c)) is None
                or isinstance(b[0], bool)
                or not isinstance(b[0], (int, float))
                for c in minmax_cols
            ):
                entries = None
                break

    if entries is not None:
        row: list = [sum(e["rows"] for e in entries)]
        for c in minmax_cols:
            los = [e["stats"][c][0] for e in entries if e["rows"]]
            row += [min(los) if los else None,
                    max(e["stats"][c][1] for e in entries if e["rows"])
                    if los else None]
        return local_df(spark, [tuple(row)], schema), True

    df = read_snapshot(spark, table_path, snapshot_id=sid)
    for c, v in (where or {}).items():
        b = binds.get(c)
        if b and b[1] != "identity":
            # time-transform binding: the same granule-equality
            # semantics the metadata path answers
            e = F.date_format(
                F.col(c).cast("timestamp"), _TIME_TRANSFORMS[b[1]][0])
        else:
            e = F.col(c)
        df = df.where(e.isNull() if v is None else (e == v))
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in minmax_cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    out = df.agg(*aggs)
    casts = [F.col(p.split()[0]).cast(" ".join(p.split()[1:])).alias(
        p.split()[0]) for p in ddl_parts]
    return out.select(*casts), False


def snapshot_manifest(
    spark: SparkSession, table_path: str, snapshot_id: int | None = None
) -> DataFrame:
    """(path, rows, bytes) of a snapshot's files as a DataFrame — the
    input ``layout.compaction_plan`` bin-packs. Metadata-scale."""
    m = read_manifest(table_path, snapshot_id)
    rows = [(e["path"], e["rows"], e["bytes"]) for e in m["files"]]
    schema = "path string, rows bigint, bytes bigint"
    return local_df(spark, rows, schema)


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
    by_path = {e["path"]: e for e in m["files"]}
    # write every bin's merged file first (orphans if we lose the race),
    # then publish ONE replace commit covering all bins. Reads go
    # through _read_entries, so pending merge-on-read deletes are FOLDED
    # into the rewritten bins (the new files carry the commit's seq, so
    # old deletes no longer apply to them); untouched files keep their
    # seq and stay shadowed — correctness is layout-independent.
    new_files: list[dict] = []
    removed: list[str] = []
    for b in sorted(multi):
        paths = multi[b]
        merged = _read_entries(
            spark, table_path, m, [by_path[p] for p in paths]
        ).coalesce(1)
        new_files.extend(
            _write_data_files(merged, table_path, current_manifest=m))
        removed.extend(paths)
    kept = [e for e in m["files"] if e["path"] not in set(removed)]
    _stamp_seq(new_files, parent)
    if current_snapshot_id(table_path) != parent:
        raise CommitConflict(
            f"snapshot advanced past {parent} while compacting — replan"
        )
    return _publish(
        table_path, parent, kept + new_files, m["schema"], "replace",
        deletes=m.get("deletes", []), parent_manifest=m,
    )


def evolve_add_columns(
    spark: SparkSession, table_path: str, new_cols: dict[str, str],
    defaults: dict[str, object] | None = None,
) -> int:
    """Additive schema evolution as a metadata-only commit: the new
    snapshot carries the widened schema over the SAME data files — no
    data is rewritten. Old files simply lack the new columns, and reads
    fill them with NULL — or, for columns named in ``defaults``, with
    the column's INITIAL DEFAULT (the Iceberg v3 / Delta model: the
    default applies to rows that existed BEFORE the add; rows written
    after carry whatever value the writer supplied, including NULL —
    the two are distinguishable, exactly because no byte was
    rewritten). Appends after the evolution must carry the new columns;
    time-travel reads before it still serve the old shape. Only
    ADD-nullable is supported — drops/renames re-bind existing bytes
    and live in :func:`rename_column` / :func:`widen_column_type`.

    Stats interplay (pinned by tests): a pruning predicate on a
    defaulted column keeps a pre-add file iff the default lies inside
    the range — every row in it has the default."""
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
    defaults = defaults or {}
    bad = set(defaults) - set(new_cols)
    if bad:
        raise ValueError(
            f"defaults for columns not being added: {sorted(bad)}")
    for name, v in defaults.items():
        if not isinstance(v, (int, float, str, bool)):
            raise ValueError(
                f"default for {name!r} must be a JSON scalar, got "
                f"{type(v).__name__}"
            )
    extra = None
    if "columns" in m or defaults:
        # field-id state: added columns get FRESH ids (never reused) and
        # a new schema version, so version maps know pre-add files hold
        # no bytes for them. Initial defaults REQUIRE the id machinery
        # (the reader must know which files predate the column), so
        # requesting one initializes it.
        columns, sv, log = _evolution_state(m)
        next_id = 1 + max(
            c["id"] for cols in log.values() for c in cols
        )
        added_fields = json.loads(schema.json())["fields"][len(columns):]
        new_columns = columns + [
            {"id": next_id + i, "name": f["name"], "type": f["type"],
             **({"default": defaults[f["name"]]}
                if f["name"] in defaults else {})}
            for i, f in enumerate(added_fields)
        ]
        log[str(sv + 1)] = new_columns
        extra = {"columns": new_columns, "schema_v": sv + 1,
                 "schema_log": log}
    return _publish(
        table_path, parent, m["files"], schema.json(), "evolve",
        deletes=m.get("deletes", []), extra=extra,
    )


def _refuse_evolution_refs(table_path: str, col: str) -> None:
    """Renaming/widening a column the partition spec or a CHECK
    constraint references is refused: the spec's transform bindings and
    the constraint expressions are stored BY NAME (as in the public
    formats' SQL surfaces) — drop the constraint / the dependency
    first. Constraint matching is a conservative word-boundary scan of
    the expression text."""
    import re

    spec = _all_spec_items(table_path)  # ANY spec, past or current —
    # old files' tuples still prune through their spec's column binding
    if spec and any(it["col"] == col for it in spec):
        raise ValueError(
            f"column {col!r} is a partition-spec source — the physical "
            "layout is derived from it; evolution is refused"
        )
    pat = re.compile(rf"\b{re.escape(col)}\b")
    for name, expr in table_constraints(table_path).items():
        if pat.search(expr):
            raise ValueError(
                f"column {col!r} appears in CHECK constraint {name!r} "
                f"({expr!r}) — drop the constraint first"
            )


def rename_column(table_path: str, old: str, new: str) -> int:
    """Rename a top-level column as a METADATA-ONLY commit (Iceberg's
    field-id rename): no data file is touched — the commit re-binds the
    column's stable field id to the new name and bumps the schema
    version. Files written before the rename are resolved BY ID at
    read time (read with their write-time name, served under the new
    one), stats pruning translates predicates per file version, and
    time travel to a pre-rename snapshot still serves the old name.
    Appends after the rename must use the new name
    (:func:`_check_schema` pins the current binding)."""
    parent = current_snapshot_id(table_path)
    if parent is None:
        raise FileNotFoundError(f"no snapshots under {table_path}")
    m = read_manifest(table_path, parent)
    _refuse_evolution_refs(table_path, old)
    columns, sv, log = _evolution_state(m)
    names = [c["name"] for c in columns]
    if old not in names:
        raise ValueError(f"no column {old!r} (have {names})")
    if new in names:
        raise ValueError(f"column {new!r} already exists — renames "
                         "never merge fields")
    new_columns = [
        ({**c, "name": new} if c["name"] == old else c) for c in columns
    ]
    sj = json.loads(m["schema"])
    for f in sj["fields"]:
        if f["name"] == old:
            f["name"] = new
    log[str(sv + 1)] = new_columns
    new_id = _publish(
        table_path, parent, m["files"], json.dumps(sj), "evolve",
        deletes=m.get("deletes", []),
        extra={"columns": new_columns, "schema_v": sv + 1,
               "schema_log": log},
    )
    # no bloom-property fixup needed: the write path resolves a
    # since-renamed bloom column to its CURRENT name by field id
    # (_resolve_prop_col), so the property may keep the retired name
    # with no loss — and there is no post-publish window in which a
    # crash could strand it (the r9 verdict's ordering hazard)
    return new_id


def widen_column_type(table_path: str, col: str, to_type: str) -> int:
    """Widen a column's primitive type as a METADATA-ONLY commit —
    Iceberg's allowed promotions only: tinyint→smallint→int→bigint
    (upward along the chain) and float→double, where every stored
    value is exactly representable in the wider type. Old files keep
    their narrower physical encoding and are cast at read (by field
    id); new appends must carry the widened type. Anything else
    (narrowing, int→string, …) changes the meaning of bytes already
    written — that is a rewrite, not an evolution, and is refused."""
    parent = current_snapshot_id(table_path)
    if parent is None:
        raise FileNotFoundError(f"no snapshots under {table_path}")
    m = read_manifest(table_path, parent)
    _refuse_evolution_refs(table_path, col)
    columns, sv, log = _evolution_state(m)
    cur = next((c for c in columns if c["name"] == col), None)
    if cur is None:
        raise ValueError(
            f"no column {col!r} (have {[c['name'] for c in columns]})")
    tgt = _TYPE_ALIASES.get(to_type)
    src = cur["type"] if isinstance(cur["type"], str) else None
    ok = tgt is not None and src is not None and (
        (src in _WIDEN_RANK and tgt in _WIDEN_RANK
         and _WIDEN_RANK[tgt] > _WIDEN_RANK[src])
        or (src == "float" and tgt == "double")
    )
    if not ok:
        raise ValueError(
            f"cannot widen {col!r}: {cur['type']!r} → {to_type!r} is not "
            "an exact promotion (allowed: tinyint→smallint→int→bigint "
            "upward, float→double)"
        )
    new_columns = [
        ({**c, "type": tgt} if c["name"] == col else c) for c in columns
    ]
    sj = json.loads(m["schema"])
    for f in sj["fields"]:
        if f["name"] == col:
            f["type"] = tgt
    log[str(sv + 1)] = new_columns
    return _publish(
        table_path, parent, m["files"], json.dumps(sj), "evolve",
        deletes=m.get("deletes", []),
        extra={"columns": new_columns, "schema_v": sv + 1,
               "schema_log": log},
    )


def _referenced_paths(m: dict) -> set[str]:
    """Every table-relative file path a manifest keeps alive: data
    files, CDC change files, and merge-on-read delete sidecars."""
    out = {e["path"] for e in m["files"]}
    out.update(e["path"] for e in m.get("changes", []))
    for d in m.get("deletes", []):
        out.update(d.get("paths", []))  # range deletes carry no sidecar
    return out


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
        m = read_manifest(table_path, sid, load_files=True)
        live.update(_referenced_paths(m))
        if "files_ref" in m:
            live.add(m["files_ref"])
    # a staged (write-audit-publish) commit's files are pending, not
    # orphaned — they become sweepable only when the stage is discarded;
    # same for branch manifests (branch-*.v*.json — the branch-* glob
    # also matches refs, which carry no files and are skipped)
    for sp_ in glob.glob(
        os.path.join(table_path, _SNAP_DIR, "stage-*.json")
    ) + glob.glob(os.path.join(table_path, _SNAP_DIR, "branch-*.json")):
        with open(sp_) as f:
            doc = json.load(f)
        if "files_ref" in doc:  # externalized branch manifest
            live.add(doc["files_ref"])
            doc["files"] = _load_files_sidecar(table_path, doc["files_ref"])
        if "files" in doc:
            live.update(_referenced_paths(doc))
    dead: list[str] = []
    # metadata debris: externalized manifest sidecars whose publish lost
    # the race/crashed (f*.parquet referenced by no manifest) and tmp
    # manifests a writer died holding — both age-gated like data orphans
    # sorted-set union: '*.json.tmp-*' also matches the manifest tmps —
    # a duplicate entry would re-getmtime a just-removed path and crash
    for p in sorted(
        set(glob.glob(os.path.join(table_path, _SNAP_DIR, "f*.parquet")))
        | set(glob.glob(os.path.join(table_path, _SNAP_DIR,
                                     "*.json.tmp-*")))
    ):
        rel = os.path.relpath(p, table_path)
        if rel not in live and os.path.getmtime(p) <= cutoff:
            dead.append(rel)
            if delete:
                os.remove(p)
    emptied: set[str] = set()
    for sub in (_DATA_DIR, _CHANGES_DIR, _DELETES_DIR):
        sub_root = os.path.join(table_path, sub)
        for root, _dirs, files in os.walk(sub_root):
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
        roots = [
            d
            for sub in (_DATA_DIR, _CHANGES_DIR, _DELETES_DIR)
            for d in glob.glob(os.path.join(table_path, sub, "*"))
        ]
        for d in sorted(roots, reverse=True):
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
    record_changes: bool = True,
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
    scattered — or use :func:`merge_snapshot_mor`, which defers the
    rewrite entirely.

    ``record_changes`` (default on) persists the row-level change set
    (insert / update_preimage / update_postimage) as change files
    referenced from the manifest, so :func:`snapshot_change_feed` can
    replay exactly what this commit did without diffing file sets —
    the Delta change-data-feed design. Cost: one extra pass over the
    touched files."""
    parent = current_snapshot_id(table_path)
    if parent is None:
        raise FileNotFoundError(f"no snapshots under {table_path}")
    m = read_manifest(table_path, parent)
    _check_schema(changes, m)
    _enforce_constraints(changes, table_path)
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
        if any(e.get("bloom") for e in touched):
            # bloom refinement: a SCATTERED key batch intersects every
            # range box, but each file's bloom still answers "could
            # this file hold one of the batch keys" — the rewrite set
            # shrinks to actual (plus false-positive) holders
            touched, skipped = _bloom_refine_touched(
                spark, m, touched, changes, keys)
            untouched = untouched + skipped
    schema = StructType.fromJson(json.loads(m["schema"]))
    cols = [f.name for f in schema.fields]
    change_files: list[dict] = []
    if touched:
        old = _read_entries(spark, table_path, m, touched)
        ckeys = changes.select(*keys).where(nn).distinct()
        kept = old.join(F.broadcast(changes.select(*keys).distinct()),
                        keys, "left_anti")
        new_data = kept.unionByName(changes.select(*cols))
        if record_changes:
            # row-level CDC at commit time (the Delta CDF design): the
            # merge already knows its change set — persist it as change
            # files instead of making consumers diff file sets later.
            # matched = change keys that hit an existing row; bounded by
            # the change batch, so the semi-join probe side broadcasts.
            mk = old.join(F.broadcast(ckeys), keys, "left_semi").select(
                *keys
            ).distinct()
            pre = old.join(F.broadcast(ckeys), keys, "left_semi").select(
                *cols
            ).withColumn("_change_type", F.lit("update_preimage"))
            post = changes.join(F.broadcast(mk), keys, "left_semi").select(
                *cols
            ).withColumn("_change_type", F.lit("update_postimage"))
            ins = changes.join(F.broadcast(mk), keys, "left_anti").select(
                *cols
            ).withColumn("_change_type", F.lit("insert"))
            change_files = _write_data_files(
                pre.unionByName(post).unionByName(ins),
                table_path, subdir=_CHANGES_DIR, current_manifest=m,
            )
    else:
        new_data = changes.select(*cols)
        if record_changes:
            change_files = _write_data_files(
                changes.select(*cols).withColumn(
                    "_change_type", F.lit("insert")
                ),
                table_path, subdir=_CHANGES_DIR, current_manifest=m,
            )
    new_files = _stamp_seq(
        _write_data_files(new_data, table_path, current_manifest=m), parent)
    if current_snapshot_id(table_path) != parent:
        raise CommitConflict(
            f"snapshot advanced past {parent} while merging — replan"
        )
    return _publish(
        table_path, parent, untouched + new_files, m["schema"], "replace",
        deletes=m.get("deletes", []), changes=change_files,
        extra={"change_op": "merge"} if change_files else None,
        parent_manifest=m,
    )


def merge_snapshot_mor(
    spark: SparkSession,
    table_path: str,
    changes: DataFrame,
    keys: list[str],
) -> int:
    """MERGE-ON-READ upsert: publish the change batch as new data files
    plus an EQUALITY-DELETE sidecar on ``keys`` — no existing file is
    rewritten. Readers anti-join the (broadcast, change-batch-sized)
    sidecar against every data file with a smaller sequence number, so
    the read result equals the copy-on-write merge; ``fold_deletes`` /
    ``compact_snapshot`` / ``cluster_snapshot`` later materialize the
    shadowing and clear the sidecars.

    Why this exists at 100 TB: CoW's write amplification is the size of
    every file the change box TOUCHES — a daily trickle of point updates
    against a wide keyspace rewrites most of the table to change a few
    thousand rows. MoR's write is exactly ``|changes|`` rows + a key
    sidecar; the cost moves to reads (one broadcast anti-join per
    pending sidecar), which is why maintenance folds them back in. This
    is Iceberg's delete-file design in its equality form — the natural
    fit for a keyed merge batch (duplicate-key batches are rejected,
    same guard as CoW); the position form, for arbitrary-predicate row
    removal, is :func:`delete_snapshot_rows_mor`.

    Change feed: the commit records no separate change files — its own
    data files ARE the postimages, surfaced by
    :func:`snapshot_change_feed` as ``_change_type='upsert'`` (insert
    vs update is unknowable without reading the old files, which is the
    exact cost MoR defers)."""
    parent = current_snapshot_id(table_path)
    if parent is None:
        raise FileNotFoundError(f"no snapshots under {table_path}")
    m = read_manifest(table_path, parent)
    _check_schema(changes, m)
    _enforce_constraints(changes, table_path)
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
        aggs += [F.min(F.col(k)).alias(f"lo_{k}"),
                 F.max(F.col(k)).alias(f"hi_{k}")]
    row = changes.agg(*aggs).first()
    if row["__n"] == 0:
        return parent
    if row["__nd"] < row["__nk"]:
        raise ValueError(
            f"merge_snapshot_mor: changes contain "
            f"{row['__nk'] - row['__nd']} duplicate-key row(s) on {keys} "
            "— both copies would survive the read; dedup the batch first"
        )

    def _nan(v):
        return isinstance(v, float) and v != v

    # the change keys' bounding box lets fold_deletes rewrite only
    # stats-intersecting files later; NaN degenerates it (same rule as
    # the CoW merge) — box=None means "may shadow anything"
    box = None
    if all(row[f"lo_{k}"] is not None for k in keys) and not any(
        _nan(row[f"lo_{k}"]) or _nan(row[f"hi_{k}"]) for k in keys
    ):
        box = {k: [row[f"lo_{k}"], row[f"hi_{k}"]] for k in keys}
        if not all(
            isinstance(v, (int, float, str))
            for pair in box.values() for v in pair
        ):
            box = None  # non-JSON key types (timestamp, binary): no box
    schema = StructType.fromJson(json.loads(m["schema"]))
    new_id = parent + 1
    new_files = _stamp_seq(
        _write_data_files(
            changes.select(*[f.name for f in schema.fields]), table_path,
            current_manifest=m,
        ),
        parent,
    )
    delete_entry = None
    if row["__nk"] > 0:  # NULL-key rows are pure inserts: nothing to shadow
        sidecar = _write_data_files(
            changes.select(*keys).where(nn).distinct().coalesce(1),
            table_path, subdir=_DELETES_DIR, current_manifest=m,
        )
        delete_entry = {
            "paths": [e["path"] for e in sidecar],
            "rows": sum(e["rows"] for e in sidecar),
            "keys": keys,
            "seq": new_id,
            "box": box,
        }
        if "schema_v" in m:
            # keys/box are the write-time names — readers translate
            # them by field id after later renames
            delete_entry["schema_v"] = m["schema_v"]
    if current_snapshot_id(table_path) != parent:
        raise CommitConflict(
            f"snapshot advanced past {parent} while merging — replan"
        )
    deletes = m.get("deletes", []) + ([delete_entry] if delete_entry else [])
    return _publish(
        table_path, parent, m["files"] + new_files, m["schema"],
        "merge-mor", deletes=deletes, parent_manifest=m,
    )


def delete_snapshot_where_mor(
    spark: SparkSession,
    table_path: str,
    where: dict[str, tuple],
    record_changes: bool = True,
) -> int:
    """MERGE-ON-READ range DELETE: record the conjunctive range
    predicate itself as a manifest delete entry — NO file is read or
    rewritten at commit time; readers filter shadowed rows out of every
    data file with a smaller sequence number, and ``fold_deletes`` /
    compaction later materialize the erasure (run fold + expiry to
    complete a physical erasure, same note as the CoW delete). The
    metadata-only commit makes bulk retention deletes O(1) regardless
    of how many files the range spans — the write-amplification answer
    for "drop everything older than X" on a 100 TB table.

    ``record_changes`` (default on) additionally persists the deleted
    rows as ``_change_type='delete'`` change files so the CDC feed stays
    COMPLETE across this commit kind: that costs one READ pass over the
    stats-intersecting files (still zero data rewrite — the deferred
    cost is the rewrite, not the scan). Pass False for a pure-metadata
    commit when no feed consumer exists."""
    import datetime

    parent = current_snapshot_id(table_path)
    if parent is None:
        raise FileNotFoundError(f"no snapshots under {table_path}")
    m = read_manifest(table_path, parent)
    new_id = parent + 1

    def _bound(v):
        # the box must live in the JSON manifest: date/datetime bounds
        # (the typical retention predicate) serialize as ISO strings —
        # Spark coerces string literals back for the read-side filter,
        # and date columns never carry manifest stats (absent = keep),
        # so the fold stays sound. Anything else non-JSON fails UP
        # FRONT, before any change files are written.
        if isinstance(v, (datetime.date, datetime.datetime)):
            return v.isoformat(sep=" ") if isinstance(
                v, datetime.datetime
            ) else v.isoformat()
        if isinstance(v, (int, float, str)):
            return v
        raise ValueError(
            f"delete_snapshot_where_mor: box bound {v!r} "
            f"({type(v).__name__}) is not manifest-serializable — use "
            "int/float/str/date/datetime bounds, or the copy-on-write "
            "delete_snapshot_where"
        )

    box = {c: [_bound(lo), _bound(hi)] for c, (lo, hi) in where.items()}
    change_files: list[dict] = []
    if record_changes:
        touched, _ = _split_by_box(m, where)
        if touched:
            old = _read_entries(spark, table_path, m, touched)
            inside = None
            for c, (lo, hi) in where.items():
                cond = F.col(c).between(lo, hi)
                inside = cond if inside is None else (inside & cond)
            change_files = _write_data_files(
                old.where(F.coalesce(inside, F.lit(False))).withColumn(
                    "_change_type", F.lit("delete")
                ),
                table_path, subdir=_CHANGES_DIR, current_manifest=m,
            )
    delete_entry = {"kind": "range", "box": box, "seq": new_id}
    if "schema_v" in m:
        delete_entry["schema_v"] = m["schema_v"]
    if current_snapshot_id(table_path) != parent:
        raise CommitConflict(
            f"snapshot advanced past {parent} while deleting — replan"
        )
    return _publish(
        table_path, parent, m["files"], m["schema"], "delete-mor",
        deletes=m.get("deletes", []) + [delete_entry],
        changes=change_files,
        extra={"change_op": "delete"} if change_files else None,
        parent_manifest=m,
    )


def delete_snapshot_rows_mor(
    spark: SparkSession,
    table_path: str,
    condition,
    record_changes: bool = True,
) -> int:
    """MERGE-ON-READ position DELETE: remove the rows matching an
    ARBITRARY predicate by recording their (file, row-ordinal)
    identities as a delete sidecar — no data file is rewritten. This is
    Iceberg's position-delete file: where the range form
    (:func:`delete_snapshot_where_mor`) needs a conjunctive box and the
    equality form (:func:`merge_snapshot_mor`) needs a key column, the
    position form handles any row selection — "drop these specific
    contaminated documents", "drop the losers of a dedup vote" — at a
    commit cost of |matched rows| sidecar entries, not a table rewrite.

    Row identity is the parquet scan's hidden ``_metadata.file_path`` /
    ``row_index`` pair (stable per immutable file — files here are
    never mutated, only replaced, and a position entry NAMES its files
    so it can never apply to a rewritten successor). Readers anti-join
    the broadcast sidecar on (__file, __pos) against exactly the named
    files; ``fold_deletes`` rewrites ONLY the named files.

    ``condition`` is a pyspark Column or SQL string evaluated against
    the CURRENT logical content (pending deletes applied first — a row
    an earlier sidecar already shadows is not re-recorded, keeping the
    CDC feed exact). ``record_changes`` persists the deleted rows as
    ``_change_type='delete'`` change files (one scan, zero rewrite),
    same contract as the range form."""
    parent = current_snapshot_id(table_path)
    if parent is None:
        raise FileNotFoundError(f"no snapshots under {table_path}")
    if isinstance(condition, str):
        condition = F.expr(condition)
    m = read_manifest(table_path, parent)
    new_id = parent + 1
    cur = _read_entries(
        spark, table_path, m, m["files"], with_positions=True
    )
    hits = cur.where(condition).persist()
    try:
        n = hits.count()
        if n == 0:
            return parent
        files_named = sorted(
            r["__file"] for r in hits.select("__file").distinct().collect()
        )  # metadata-scale: one row per touched file
        manifest_paths = {e["path"] for e in m["files"]}
        stray = [p for p in files_named if p not in manifest_paths]
        if stray:
            # the relative-path computation disagrees with the manifest
            # (exotic mount/symlink layout): refuse loudly — publishing
            # would record a delete that silently never applies
            raise ValueError(
                "delete_snapshot_rows_mor: scan file paths do not "
                f"resolve to manifest paths (e.g. {stray[:3]}) — "
                "table_path normalization failed; use the copy-on-write "
                "delete instead"
            )
        sidecar = _write_data_files(
            hits.select(
                F.col("__file").alias("file"), F.col("__pos").alias("pos")
            ).coalesce(1),
            table_path, subdir=_DELETES_DIR, current_manifest=m,
        )
        change_files: list[dict] = []
        if record_changes:
            change_files = _write_data_files(
                hits.drop("__file", "__pos").withColumn(
                    "_change_type", F.lit("delete")
                ),
                table_path, subdir=_CHANGES_DIR, current_manifest=m,
            )
        delete_entry = {
            "kind": "position",
            "paths": [e["path"] for e in sidecar],
            "rows": n,
            "files": files_named,
            "seq": new_id,
        }
        if current_snapshot_id(table_path) != parent:
            raise CommitConflict(
                f"snapshot advanced past {parent} while deleting — replan"
            )
        return _publish(
            table_path, parent, m["files"], m["schema"], "delete-mor",
            deletes=m.get("deletes", []) + [delete_entry],
            changes=change_files,
            extra={"change_op": "delete", "delete_kind": "position"},
            parent_manifest=m,
        )
    finally:
        hits.unpersist()


class BranchExists(Exception):
    """A staged commit already exists for this branch name — publish or
    discard it before staging again."""


class ConstraintViolation(Exception):
    """The incoming batch (or, at add time, the existing table) breaks
    a CHECK constraint; the commit was NOT published."""


def _stage_path(table_path: str, branch: str) -> str:
    if not branch or "/" in branch or branch.startswith((".", "_")):
        raise ValueError(f"bad branch name {branch!r}")
    return os.path.join(table_path, _SNAP_DIR, f"stage-{branch}.json")


def stage_append(
    df: DataFrame, table_path: str, branch: str
) -> int | None:
    """WRITE step of write-audit-publish: append ``df`` to a STAGED
    manifest under ``branch`` — data files land in the table (orphans
    until published, invisible to every reader), the staged manifest
    lives outside the v{N} namespace, and main does not move. The
    Iceberg WAP pattern: a pipeline writes, an audit job reads the
    branch (:func:`read_branch`) and runs its checks, and only then is
    the snapshot made visible (:func:`publish_branch`) — a bad batch is
    discarded (:func:`discard_branch`) without ever existing for
    consumers. Returns the parent snapshot id the stage is pinned to
    (None for a stage that creates the table).

    One staged commit per branch: the audit applies to an exact
    candidate state, not a moving target. CHECK constraints are
    enforced at stage time (fail fast — the cheap audit before the
    caller's own)."""
    parent = current_snapshot_id(table_path)
    base: list[dict] = []
    deletes: list[dict] = []
    pm = None
    if parent is not None:
        pm = m = read_manifest(table_path, parent)
        _check_schema(df, m)
        base = m["files"]
        deletes = m.get("deletes", [])
        schema_json = m["schema"]
    else:
        os.makedirs(table_path, exist_ok=True)
        schema_json = df.schema.json()
    sp = _stage_path(table_path, branch)
    if os.path.exists(sp):
        # cheap precheck before any Spark job; the exclusive create
        # below is the real guard
        raise BranchExists(
            f"branch {branch!r} already has a staged commit under "
            f"{table_path} — publish_branch or discard_branch first"
        )
    _enforce_constraints(df, table_path)
    new_files = _stamp_seq(
        _write_data_files(df, table_path, current_manifest=pm), parent)
    staged = {
        "branch": branch,
        "parent": parent,
        "operation": "append",
        "schema": schema_json,
        "files": base + new_files,
        "deletes": deletes,
    }
    tmp = sp + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(staged, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        try:
            os.link(tmp, sp)
        except FileExistsError as e:
            raise BranchExists(
                f"branch {branch!r} already has a staged commit under "
                f"{table_path}"
            ) from e
        except OSError:
            with open(sp, "x") as dst, open(tmp) as src:
                dst.write(src.read())
    finally:
        os.remove(tmp)
    return parent


def read_branch(
    spark: SparkSession, table_path: str, branch: str
) -> DataFrame:
    """The AUDIT surface of write-audit-publish: the table as it WOULD
    look if the branch's staged commit were published — parent files +
    staged files, pending MoR deletes applied. Reads the staged
    manifest only; main is untouched."""
    sp = _stage_path(table_path, branch)
    if not os.path.exists(sp):
        raise FileNotFoundError(
            f"no staged commit for branch {branch!r} under {table_path}"
        )
    with open(sp) as f:
        st = json.load(f)
    return _read_entries(spark, table_path, st, st["files"])


def publish_branch(
    spark: SparkSession, table_path: str, branch: str
) -> int:
    """PUBLISH step of write-audit-publish: fast-forward main to the
    audited staged commit — METADATA-ONLY (the data files have been in
    place since the stage; one manifest publish makes them visible
    atomically). Fails with :class:`CommitConflict` if main advanced
    past the stage's parent: the audit blessed a state that no longer
    exists, so re-stage against the new current and re-audit."""
    sp = _stage_path(table_path, branch)
    if not os.path.exists(sp):
        raise FileNotFoundError(
            f"no staged commit for branch {branch!r} under {table_path}"
        )
    with open(sp) as f:
        st = json.load(f)
    if current_snapshot_id(table_path) != st["parent"]:
        raise CommitConflict(
            f"main advanced past snapshot {st['parent']} while branch "
            f"{branch!r} was staged — the audit is stale; discard, "
            "re-stage, re-audit"
        )
    new_id = _publish(
        table_path, st["parent"], st["files"], st["schema"],
        st["operation"],
        extra={"published_branch": branch},
        deletes=st.get("deletes", []),
    )
    os.remove(sp)
    return new_id


def discard_branch(table_path: str, branch: str) -> bool:
    """Drop a staged commit without publishing (the audit failed). The
    staged data files become unreferenced and age out via
    :func:`vacuum_orphans` — they were never visible. Returns whether a
    stage existed."""
    sp = _stage_path(table_path, branch)
    if os.path.exists(sp):
        os.remove(sp)
        return True
    return False


# ---------------------------------------------------------------------------
# Named branches (the Iceberg branch-ref model): a branch is a named
# ref with its OWN commit lineage, forked from a main snapshot. Unlike
# the single-shot WAP stage above, a branch takes ANY NUMBER of commits
# (each a full snapshot with its own manifest, readable and
# time-travelable under the branch namespace) before main sees
# anything; fast-forward publishes the branch head onto main as ONE
# metadata-only commit, with the same staleness rule as publish_branch
# (main must still be at the fork point). Branch data files live in the
# table like any other commit's — vacuum and expiry treat branch
# manifests as live roots, and a branch's fork-point main snapshot is a
# retention anchor exactly like a tag.


def _branch_ref_path(table_path: str, name: str) -> str:
    # strict charset, not a denylist: the branch namespace is
    # branch-<name>.v{K}.json AND names are interpolated into glob
    # patterns, so a dotted name could masquerade as another branch's
    # manifest and a glob metacharacter ('*', '?', '[') would match
    # OTHER branches' files (wrong head, cross-branch deletes)
    if not re.fullmatch(r"[A-Za-z0-9][A-Za-z0-9_-]*", name or ""):
        raise ValueError(
            f"bad branch name {name!r} — use [A-Za-z0-9][A-Za-z0-9_-]*"
        )
    return os.path.join(table_path, _SNAP_DIR, f"branch-{name}.json")


def _branch_manifest_path(table_path: str, name: str, k: int) -> str:
    return os.path.join(
        table_path, _SNAP_DIR, f"branch-{name}.v{k:012d}.json"
    )


def branch_snapshot_ids(table_path: str, name: str) -> list[int]:
    """Branch-local snapshot ids (1-based, dense), oldest first."""
    _branch_ref_path(table_path, name)  # validates the name
    pat = os.path.join(table_path, _SNAP_DIR, f"branch-{name}.v*.json")
    return sorted(
        int(os.path.basename(p).rsplit(".v", 1)[1][:-5])
        for p in glob.glob(pat)
    )


def table_branches(table_path: str) -> dict[str, dict]:
    """{branch name: {"base": fork-point main snapshot id, "head":
    branch-local head id (0 = no branch commits yet), "created_at"}}."""
    out: dict[str, dict] = {}
    for p in glob.glob(os.path.join(table_path, _SNAP_DIR, "branch-*.json")):
        base = os.path.basename(p)[len("branch-"):-5]
        if ".v" in base and base.rsplit(".v", 1)[1].isdigit():
            continue  # a branch manifest, not a ref
        with open(p) as f:
            ref = json.load(f)
        ref["head"] = (branch_snapshot_ids(table_path, base) or [0])[-1]
        out[base] = ref
    return out


def create_branch(
    table_path: str, name: str, snapshot_id: int | None = None
) -> int:
    """Create branch ``name`` forked at ``snapshot_id`` (default:
    current main). The fork point becomes a retention anchor
    (:func:`expire_snapshots` keeps it, like a tag) until the branch is
    deleted or fast-forwarded. Exclusive-create — two racing creators
    of the same name get exactly one winner. Returns the fork-point
    snapshot id."""
    import time

    sid = snapshot_id if snapshot_id is not None \
        else current_snapshot_id(table_path)
    if sid is None:
        raise FileNotFoundError(
            f"no snapshots under {table_path} — a branch forks from an "
            "existing snapshot; commit to main first"
        )
    read_manifest(table_path, sid, load_files=False)  # must exist
    p = _branch_ref_path(table_path, name)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    try:
        _write_exclusive_json(
            p, {"name": name, "base": sid, "created_at": time.time()}
        )
    except FileExistsError:
        raise BranchExists(
            f"branch {name!r} already exists under {table_path}"
        ) from None
    return sid


def _load_branch_manifest(
    table_path: str, p: str, load_files: bool = True
) -> dict:
    """Open a branch manifest, materializing an externalized files
    list (same ``files_ref`` sidecar discipline as main manifests —
    the ref is KEPT so planning surfaces can read the parquet
    directly)."""
    with open(p) as f:
        m = json.load(f)
    if "files_ref" in m and load_files:
        m["files"] = _load_files_sidecar(table_path, m["files_ref"])
    return m


def _branch_head_manifest(table_path: str, name: str) -> tuple[int, dict]:
    """(branch-local head id, its manifest) — head 0 returns the fork
    point's MAIN manifest (a fresh branch reads as its fork point)."""
    p = _branch_ref_path(table_path, name)
    if not os.path.exists(p):
        raise FileNotFoundError(
            f"no branch {name!r} under {table_path} "
            f"(have {sorted(table_branches(table_path))})"
        )
    with open(p) as f:
        ref = json.load(f)
    ids = branch_snapshot_ids(table_path, name)
    if not ids:
        return 0, read_manifest(table_path, ref["base"])
    return ids[-1], _load_branch_manifest(
        table_path, _branch_manifest_path(table_path, name, ids[-1])
    )


def _heal_interrupted_ff(table_path: str, name: str) -> bool:
    """Detect and complete an interrupted :func:`fast_forward_branch`
    reset: the FF's main publish succeeded but the process died before
    the branch ref moved to the new base / the absorbed branch
    manifests were removed. Left alone, every later fast-forward (and
    branch commit) would build on a head main already absorbed and
    raise :class:`CommitConflict` forever (r10 ADVICE). Idempotent —
    called on entry to the branch WRITE paths; returns whether a heal
    ran. A branch commit that raced the crashed FF (branch-local id >
    the absorbed count) cannot be silently replayed — it raises with
    explicit guidance instead."""
    p = _branch_ref_path(table_path, name)
    if not os.path.exists(p):
        return False
    with open(p) as f:
        ref = json.load(f)
    if current_snapshot_id(table_path) == ref["base"]:
        return False  # main never moved: nothing interrupted
    # an FF commit publishes with parent == the fork base, and ids are
    # dense (new_id = parent+1) — so the only possible interrupted-FF
    # commit is base+1: one manifest read, not a history walk
    sid = ref["base"] + 1
    try:
        m = read_manifest(table_path, sid, load_files=False)
    except FileNotFoundError:
        return False  # base+1 expired or never existed: nothing to heal
    if (
        m.get("fast_forward_branch") != name
        or m.get("parent") != ref["base"]
        # an interrupted FF's commit always postdates its ref — an OLDER
        # FF commit of the same name means the branch was deliberately
        # re-created at the old fork point; healing would delete its
        # fresh commits as "absorbed"
        or m.get("committed_at", 0.0) < ref.get("created_at", 0.0)
    ):
        return False
    k = int(m.get("branch_commits", 0))
    stale = [i for i in branch_snapshot_ids(table_path, name) if i > k]
    if stale:
        raise CommitConflict(
            f"branch {name!r} has local snapshot(s) {stale} that "
            f"raced an interrupted fast-forward (main already "
            f"absorbed commits 1..{k} at snapshot {sid}) — their "
            "base predates the reset ref; read them with "
            "read_branch_snapshot, delete_branch, re-branch from "
            "current, and replay"
        )
    import time

    tmp = p + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(
            {"name": name, "base": sid, "created_at": time.time()}, f
        )
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, p)
    for i in branch_snapshot_ids(table_path, name):
        if i <= k:
            _remove_branch_manifest(table_path, name, i)
    return True


def commit_append_branch(
    df: DataFrame, table_path: str, name: str
) -> int:
    """Append ``df`` as a new BRANCH snapshot: the branch head's files
    plus the new files, published under the branch namespace — main
    never moves, and readers of main cannot observe a byte of it. Data
    is written before the branch manifest publishes (same orphan
    discipline as main commits); the publish is an exclusive-create on
    the next branch-local id, so two racing branch writers get exactly
    one winner (the loser retries against the new head). CHECK
    constraints are table-level and enforced here too. Returns the
    branch-local snapshot id."""
    import time

    _heal_interrupted_ff(table_path, name)
    k, m = _branch_head_manifest(table_path, name)
    _check_schema(df, m)
    _enforce_constraints(df, table_path)
    with open(_branch_ref_path(table_path, name)) as f:
        ref = json.load(f)
    # seq continues from the fork point's main id + branch depth: MoR
    # deletes carried from the fork still apply only to older files
    new_files = _stamp_seq(
        _write_data_files(df, table_path, current_manifest=m),
        ref["base"] + k,
    )
    return _publish_branch_commit(
        table_path, name, k, m, ref,
        m["files"] + new_files, m.get("deletes", []), "append",
    )


def _publish_branch_commit(
    table_path: str,
    name: str,
    k: int,
    m: dict,
    ref: dict,
    files: list[dict],
    deletes: list[dict],
    operation: str,
) -> int:
    """Publish branch-local snapshot ``k+1``: exclusive-create on the
    next id, so two racing branch writers get exactly one winner (the
    loser retries against the new head). Shared by every branch write
    (append / merge / delete / fold)."""
    import time

    manifest = {
        "branch": name,
        "branch_id": k + 1,
        "base": ref["base"],
        "parent": ref["base"] + k,
        "operation": operation,
        "committed_at": time.time(),
        "schema": m["schema"],
        # same commit-time totals discipline as main manifests: the
        # branch `.snapshots` view stays O(#commits)
        "n_files": len(files),
        "rows_total": sum(int(e.get("rows") or 0) for e in files),
        "bytes_total": sum(int(e.get("bytes") or 0) for e in files),
        "deletes": deletes,
    }
    for key in ("columns", "schema_v", "schema_log"):
        if key in m:
            manifest[key] = m[key]
    # same externalization rule as main (_publish): a big file list or
    # ANY bloom bitmap moves to the parquet sidecar — branch manifest
    # JSON stays metadata-scale even on bloom tables
    files_ref = None
    if len(files) > FILES_INLINE_MAX or any("bloom" in e for e in files):
        files_ref = _write_files_sidecar(table_path, k + 1, files)
        manifest["files_ref"] = files_ref
    else:
        manifest["files"] = files
    published = False
    try:
        _write_exclusive_json(
            _branch_manifest_path(table_path, name, k + 1), manifest
        )
        published = True
    except FileExistsError:
        raise CommitConflict(
            f"branch {name!r} advanced past local snapshot {k} while "
            "this commit was writing — re-read the branch head and retry"
        ) from None
    finally:
        if not published and files_ref is not None:
            fp = os.path.join(table_path, files_ref)
            if os.path.exists(fp):
                os.remove(fp)
    return k + 1


def _branch_write_ctx(table_path: str, name: str) -> tuple[int, dict, dict]:
    """(head id, head manifest, ref) after the interrupted-FF heal —
    the common entry of every branch write path."""
    _heal_interrupted_ff(table_path, name)
    k, m = _branch_head_manifest(table_path, name)
    with open(_branch_ref_path(table_path, name)) as f:
        ref = json.load(f)
    return k, m, ref


def _batch_key_stats(changes: DataFrame, keys: list[str], op: str):
    """One aggregate pass over a merge batch: (row, nn_expr) where row
    carries count / fully-keyed count / per-key min-max bounds. Raises
    on duplicate keys among fully-keyed rows — both copies would
    survive the merge (NULL-keyed rows are pure inserts, exempt)."""
    nn = None
    for c in keys:
        e = F.col(c).isNotNull()
        nn = e if nn is None else (nn & e)
    aggs = [
        F.count(F.lit(1)).alias("__n"),
        F.count(F.when(nn, 1)).alias("__nk"),
        F.count_distinct(*[F.col(c) for c in keys]).alias("__nd"),
    ]
    for c in keys:
        aggs += [F.min(F.col(c)).alias(f"lo_{c}"),
                 F.max(F.col(c)).alias(f"hi_{c}")]
    row = changes.agg(*aggs).first()
    if row["__nd"] < row["__nk"]:
        raise ValueError(
            f"{op}: changes contain {row['__nk'] - row['__nd']} "
            f"duplicate-key row(s) on {keys} — both copies would "
            "survive; dedup the batch first"
        )
    return row, nn


def _batch_split(m: dict, row, keys: list[str], spark, changes):
    """(touched, untouched) head files for a merge batch, using the
    batch's bounding box + per-file bloom refinement — the same pruning
    the main-table CoW merge applies (NULL-lo ⇒ pure insert; NaN bounds
    ⇒ stats unusable, touch everything)."""
    def _nan(v):
        return isinstance(v, float) and v != v

    if any(row[f"lo_{c}"] is None for c in keys):
        return [], m["files"]
    if any(_nan(row[f"lo_{c}"]) or _nan(row[f"hi_{c}"]) for c in keys):
        return m["files"], []
    box = {c: (row[f"lo_{c}"], row[f"hi_{c}"]) for c in keys}
    touched, untouched = _split_by_box(m, box)
    if any(e.get("bloom") for e in touched):
        touched, skipped = _bloom_refine_touched(
            spark, m, touched, changes, keys)
        untouched = untouched + skipped
    return touched, untouched


def merge_branch(
    spark: SparkSession,
    table_path: str,
    name: str,
    changes: DataFrame,
    keys: list[str],
) -> int:
    """Copy-on-write MERGE (upsert) against a branch head: same-key
    rows replace, new keys append, in one branch-local replace commit —
    main never observes a byte. File pruning is identical to the
    main-table :func:`merge_snapshot` (stats box + bloom refinement);
    rewritten files read through the head's pending MoR deletes, so a
    CoW merge after a branch MoR commit composes correctly. No CDC
    change files: branch manifests don't feed the change feed — the
    fast-forward commit is main's single observable change. Returns the
    branch-local snapshot id."""
    k, m, ref = _branch_write_ctx(table_path, name)
    _check_schema(changes, m)
    _enforce_constraints(changes, table_path)
    row, nn = _batch_key_stats(changes, keys, "merge_branch")
    if row["__n"] == 0:
        return k
    touched, untouched = _batch_split(m, row, keys, spark, changes)
    schema = StructType.fromJson(json.loads(m["schema"]))
    cols = [f.name for f in schema.fields]
    if touched:
        old = _read_entries(spark, table_path, m, touched)
        kept = old.join(
            F.broadcast(changes.select(*keys).distinct()), keys,
            "left_anti",
        )
        new_data = kept.unionByName(changes.select(*cols))
    else:
        new_data = changes.select(*cols)
    new_files = _stamp_seq(
        _write_data_files(new_data, table_path, current_manifest=m),
        ref["base"] + k,
    )
    # carried deletes (seq <= base+k) never shadow the rewrites
    # (seq base+k+1); they still apply to untouched older files
    return _publish_branch_commit(
        table_path, name, k, m, ref,
        untouched + new_files, m.get("deletes", []), "replace",
    )


def merge_branch_mor(
    spark: SparkSession,
    table_path: str,
    name: str,
    changes: DataFrame,
    keys: list[str],
) -> int:
    """MERGE-ON-READ upsert against a branch head: the change batch
    lands as new data files plus an equality-delete sidecar on ``keys``
    — no branch or fork file is rewritten, write cost is exactly
    |changes|. Branch reads anti-join the broadcast sidecar against
    older-seq files, same contract as main's
    :func:`merge_snapshot_mor`. Fast-forward materializes pending
    branch-local sidecars first (they cannot ride the FF restamping),
    so publishing stays correct. Returns the branch-local id."""
    k, m, ref = _branch_write_ctx(table_path, name)
    _check_schema(changes, m)
    _enforce_constraints(changes, table_path)
    row, nn = _batch_key_stats(changes, keys, "merge_branch_mor")
    if row["__n"] == 0:
        return k

    def _nan(v):
        return isinstance(v, float) and v != v

    box = None
    if all(row[f"lo_{c}"] is not None for c in keys) and not any(
        _nan(row[f"lo_{c}"]) or _nan(row[f"hi_{c}"]) for c in keys
    ):
        box = {c: [row[f"lo_{c}"], row[f"hi_{c}"]] for c in keys}
        if not all(
            isinstance(v, (int, float, str))
            for pair in box.values() for v in pair
        ):
            box = None  # non-JSON key types: no box, shadow everything
    schema = StructType.fromJson(json.loads(m["schema"]))
    new_seq_parent = ref["base"] + k
    new_files = _stamp_seq(
        _write_data_files(
            changes.select(*[f.name for f in schema.fields]), table_path,
            current_manifest=m,
        ),
        new_seq_parent,
    )
    deletes = list(m.get("deletes", []))
    if row["__nk"] > 0:  # NULL-key rows are pure inserts
        sidecar = _write_data_files(
            changes.select(*keys).where(nn).distinct().coalesce(1),
            table_path, subdir=_DELETES_DIR, current_manifest=m,
        )
        entry = {
            "paths": [e["path"] for e in sidecar],
            "rows": sum(e["rows"] for e in sidecar),
            "keys": keys,
            "seq": new_seq_parent + 1,
            "box": box,
        }
        if "schema_v" in m:
            entry["schema_v"] = m["schema_v"]
        deletes.append(entry)
    return _publish_branch_commit(
        table_path, name, k, m, ref,
        m["files"] + new_files, deletes, "merge-mor",
    )


def delete_branch_where(
    spark: SparkSession,
    table_path: str,
    name: str,
    where: dict[str, tuple],
) -> int:
    """Copy-on-write range DELETE on a branch: files whose stats cannot
    intersect the conjunctive box carry over; intersecting files
    rewrite with the complement rows only — one branch-local replace
    commit, main untouched. Returns the branch-local id."""
    k, m, ref = _branch_write_ctx(table_path, name)
    touched, untouched = _split_by_box(m, where)
    new_files: list[dict] = []
    if touched:
        old = _read_entries(spark, table_path, m, touched)
        inside = None
        for c, (lo, hi) in where.items():
            cond = F.col(c).between(lo, hi)
            inside = cond if inside is None else (inside & cond)
        new_files = _stamp_seq(
            _write_data_files(
                old.where(~F.coalesce(inside, F.lit(False))), table_path,
                current_manifest=m,
            ),
            ref["base"] + k,
        )
    return _publish_branch_commit(
        table_path, name, k, m, ref,
        untouched + new_files, m.get("deletes", []), "replace",
    )


def delete_branch_where_mor(
    spark: SparkSession,
    table_path: str,
    name: str,
    where: dict[str, tuple],
) -> int:
    """MERGE-ON-READ range DELETE on a branch: the predicate box itself
    becomes a branch-manifest delete entry — metadata-only, no file
    read or rewritten; branch reads filter shadowed rows out, and
    fast-forward folds the sidecar before publishing. Returns the
    branch-local id."""
    import datetime

    k, m, ref = _branch_write_ctx(table_path, name)

    def _bound(v):
        if isinstance(v, (datetime.date, datetime.datetime)):
            return v.isoformat(sep=" ") if isinstance(
                v, datetime.datetime
            ) else v.isoformat()
        if isinstance(v, (int, float, str)):
            return v
        raise ValueError(
            f"delete_branch_where_mor: box bound {v!r} "
            f"({type(v).__name__}) is not manifest-serializable — use "
            "int/float/str/date/datetime, or delete_branch_where"
        )

    entry = {
        "kind": "range",
        "box": {c: [_bound(lo), _bound(hi)] for c, (lo, hi) in
                where.items()},
        "seq": ref["base"] + k + 1,
    }
    if "schema_v" in m:
        entry["schema_v"] = m["schema_v"]
    return _publish_branch_commit(
        table_path, name, k, m, ref,
        m["files"], m.get("deletes", []) + [entry], "delete-mor",
    )


def delete_branch_rows_mor(
    spark: SparkSession,
    table_path: str,
    name: str,
    condition,
) -> int:
    """MERGE-ON-READ position DELETE on a branch: record the (file,
    row-ordinal) identities of rows matching an ARBITRARY predicate as
    a branch-manifest sidecar — no file rewritten, main untouched; the
    position entry NAMES its files so it can never apply to a rewritten
    successor. Completes the branch delete-kind matrix (equality /
    range / position — same as main). Returns the branch-local id."""
    if isinstance(condition, str):
        condition = F.expr(condition)
    k, m, ref = _branch_write_ctx(table_path, name)
    cur = _read_entries(
        spark, table_path, m, m["files"], with_positions=True
    )
    hits = cur.where(condition).persist()
    try:
        n = hits.count()
        if n == 0:
            return k
        files_named = sorted(
            r["__file"] for r in hits.select("__file").distinct().collect()
        )  # metadata-scale: one row per touched file
        manifest_paths = {e["path"] for e in m["files"]}
        stray = [p for p in files_named if p not in manifest_paths]
        if stray:
            raise ValueError(
                "delete_branch_rows_mor: scan file paths do not resolve "
                f"to manifest paths (e.g. {stray[:3]}) — table_path "
                "normalization failed; use delete_branch_where instead"
            )
        sidecar = _write_data_files(
            hits.select(
                F.col("__file").alias("file"), F.col("__pos").alias("pos")
            ).coalesce(1),
            table_path, subdir=_DELETES_DIR, current_manifest=m,
        )
        entry = {
            "kind": "position",
            "paths": [e["path"] for e in sidecar],
            "rows": n,
            "files": files_named,
            "seq": ref["base"] + k + 1,
        }
        return _publish_branch_commit(
            table_path, name, k, m, ref,
            m["files"], m.get("deletes", []) + [entry], "delete-mor",
        )
    finally:
        hits.unpersist()


def cluster_branch(
    spark: SparkSession,
    table_path: str,
    name: str,
    zorder_cols: list[str],
    bits: int = 16,
    num_partitions: int | None = None,
    curve: str = "zorder",
) -> int:
    """Cluster the branch head (full rewrite through the deletes-aware
    read, so every pending sidecar folds) and publish one branch
    replace commit — expensive clustering runs on the branch, gets
    audited, and fast-forwards metadata-only, same loop as
    :func:`compact_branch`. ``curve`` picks Morton or Hilbert order.
    Returns the branch-local id."""
    zorder_repartition = _curve_repartition(curve)

    k, m, ref = _branch_write_ctx(table_path, name)
    spec = table_partition_spec(table_path)
    src = _read_entries(spark, table_path, m, m["files"])
    if spec:
        clustered = zorder_repartition(
            src, zorder_cols, bits=bits, z_col="__z", arrange=False,
        )
        new_files = _write_data_files(
            clustered, table_path, layout_sort=["__z"],
            layout_partitions=num_partitions, current_manifest=m,
        )
    else:
        clustered = zorder_repartition(
            src, zorder_cols, bits=bits, num_partitions=num_partitions,
        )
        new_files = _write_data_files(
            clustered, table_path, current_manifest=m,
        )
    new_files = _stamp_seq(new_files, ref["base"] + k)
    return _publish_branch_commit(
        table_path, name, k, m, ref, new_files, [], "replace",
    )


def compact_branch(
    spark: SparkSession, table_path: str, name: str, target_bytes: int
) -> int | None:
    """Bin-pack a branch head's files into ~``target_bytes`` files and
    publish ONE branch replace commit — the compact-validate-publish
    maintenance loop (run expensive layout work on a branch, audit it,
    fast-forward metadata-only) without ever disturbing main readers.
    Pending MoR deletes fold into the rewritten bins exactly as in
    :func:`compact_snapshot` (new files carry the commit's seq);
    single-file bins stay in place. Returns the branch-local id, or
    None when nothing needed compaction."""
    from ratatool_spark.operators.layout import compaction_plan

    k, m, ref = _branch_write_ctx(table_path, name)
    plan = compaction_plan(
        manifest_files_df(spark, table_path, m=m), "bytes", ["path"],
        target_bytes,
    )
    bins: dict[int, list[str]] = {}
    for r in plan.collect():  # metadata-scale: one row per file
        bins.setdefault(r["bin"], []).append(r["path"])
    multi = {b: ps for b, ps in bins.items() if len(ps) > 1}
    if not multi:
        return None
    by_path = {e["path"]: e for e in m["files"]}
    new_files: list[dict] = []
    removed: list[str] = []
    for b in sorted(multi):
        paths = multi[b]
        merged = _read_entries(
            spark, table_path, m, [by_path[p] for p in paths]
        ).coalesce(1)
        new_files.extend(
            _write_data_files(merged, table_path, current_manifest=m))
        removed.extend(paths)
    kept = [e for e in m["files"] if e["path"] not in set(removed)]
    _stamp_seq(new_files, ref["base"] + k)
    return _publish_branch_commit(
        table_path, name, k, m, ref,
        kept + new_files, m.get("deletes", []), "replace",
    )


def fold_branch_deletes(
    spark: SparkSession, table_path: str, name: str
) -> int | None:
    """Materialize every pending MoR delete on a branch: rewrite
    exactly the files some sidecar can shadow, publish one branch
    replace commit with an empty delete list. Returns the branch-local
    id, or None when nothing was pending. Fast-forward calls this for
    BRANCH-LOCAL sidecars (seq past the fork point): the FF restamping
    collapses branch file seqs onto one main commit, which would break
    the strictly-newer shadow ordering a sidecar relies on — folding
    first keeps FF a pure metadata publish of already-correct files."""
    k, m, ref = _branch_write_ctx(table_path, name)
    deletes = m.get("deletes", [])
    if not deletes:
        return None

    def _may_shadow(e: dict) -> bool:
        eseq = e.get("seq", 0)
        for d in deletes:
            if d["seq"] <= eseq:
                continue
            if d.get("kind") == "position":
                if e["path"] in d.get("files", []):
                    return True
                continue
            b = _delete_to_current(d, m).get("box")
            if b is None:
                return True
            if files_intersecting({**m, "files": [e]},
                                  {c: tuple(v) for c, v in b.items()}):
                return True
        return False

    shadowed, clear = [], []
    for e in m["files"]:
        (shadowed if _may_shadow(e) else clear).append(e)
    new_files = _stamp_seq(
        _write_data_files(
            _read_entries(spark, table_path, m, shadowed), table_path,
            current_manifest=m,
        ),
        ref["base"] + k,
    ) if shadowed else []
    return _publish_branch_commit(
        table_path, name, k, m, ref, clear + new_files, [], "replace",
    )


def read_branch_snapshot(
    spark: SparkSession,
    table_path: str,
    name: str,
    snapshot_id: int | None = None,
) -> DataFrame:
    """Read a branch AS OF a branch-local snapshot id (default: head).
    Time travel within the branch lineage works exactly like main's —
    id 0 (or a fresh branch) reads the fork point."""
    if snapshot_id is None or snapshot_id == (
        branch_snapshot_ids(table_path, name) or [0]
    )[-1]:
        _, m = _branch_head_manifest(table_path, name)
    elif snapshot_id == 0:
        with open(_branch_ref_path(table_path, name)) as f:
            ref = json.load(f)
        m = read_manifest(table_path, ref["base"])
    else:
        p = _branch_manifest_path(table_path, name, snapshot_id)
        if not os.path.exists(p):
            raise FileNotFoundError(
                f"branch {name!r} has no local snapshot {snapshot_id} "
                f"(have {branch_snapshot_ids(table_path, name)})"
            )
        m = _load_branch_manifest(table_path, p)
    return _read_entries(spark, table_path, m, m["files"])


def fast_forward_branch(
    table_path: str, name: str, spark: SparkSession | None = None
) -> int:
    """Publish the branch head onto MAIN as one metadata-only commit —
    the data files have been in place since their branch commits; one
    manifest publish makes the whole branch lineage visible atomically.
    Fails with :class:`CommitConflict` if main advanced past the fork
    point (the branch no longer fast-forwards; re-branch from the new
    current and replay, or merge by hand). The branch is then RESET to
    an empty branch forked at the new main snapshot (its old manifests
    are removed; their files now belong to main), so the name stays
    usable — the Iceberg fastForward shape. Returns the new MAIN
    snapshot id."""
    _heal_interrupted_ff(table_path, name)
    k, m = _branch_head_manifest(table_path, name)
    with open(_branch_ref_path(table_path, name)) as f:
        ref = json.load(f)
    if any(d["seq"] > ref["base"] for d in m.get("deletes", [])):
        # branch-local MoR sidecars cannot ride the FF restamping (all
        # branch file seqs collapse to one main commit, breaking the
        # strictly-newer shadow ordering) — materialize them first,
        # then publish the folded head metadata-only as usual
        if spark is None:
            raise ValueError(
                f"branch {name!r} has pending branch-local MoR deletes "
                "— pass spark= to fast_forward_branch (it folds them "
                "first) or run fold_branch_deletes yourself"
            )
        k = fold_branch_deletes(spark, table_path, name)
        _, m = _branch_head_manifest(table_path, name)
    if k == 0:
        raise ValueError(
            f"branch {name!r} has no commits — nothing to fast-forward"
        )
    if current_snapshot_id(table_path) != ref["base"]:
        raise CommitConflict(
            f"main advanced past snapshot {ref['base']} while branch "
            f"{name!r} accumulated commits — it no longer fast-forwards; "
            "create a fresh branch from the current snapshot and replay"
        )
    extra = {"fast_forward_branch": name, "branch_commits": k}
    for key in ("columns", "schema_v", "schema_log"):
        if key in m:
            extra[key] = m[key]
    # Restamp the BRANCH-ADDED files (seq > fork point) to the FF
    # commit's own sequence number: on main they became visible at
    # base+1, and their branch-local seqs (base+2, base+3, …) could
    # otherwise EXCEED later main commits' seqs — a later MoR delete
    # (seq base+2) would wrongly skip shadowing them. Files inherited
    # from the fork keep their seqs so deletes carried from the fork
    # still apply to exactly them.
    ff_seq = ref["base"] + 1
    files = [
        e if e.get("seq", 0) <= ref["base"] else {**e, "seq": ff_seq}
        for e in m["files"]
    ]
    new_id = _publish(
        table_path, ref["base"], files, m["schema"], "append",
        extra=extra, deletes=m.get("deletes", []),
    )
    # reset the branch at the new main head: old branch manifests are
    # superseded (their files are now main's); the ref moves via atomic
    # replace so a concurrent reader sees old-complete or new-complete
    import time

    tmp = _branch_ref_path(table_path, name) + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(
            {"name": name, "base": new_id, "created_at": time.time()}, f
        )
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _branch_ref_path(table_path, name))
    for i in branch_snapshot_ids(table_path, name):
        if i <= k:
            _remove_branch_manifest(table_path, name, i)
    return new_id


def delete_branch(table_path: str, name: str) -> bool:
    """Drop a branch ref and its manifests. Branch-only data files
    become unreferenced and age out via :func:`vacuum_orphans` — they
    were never visible on main. Returns whether the branch existed."""
    p = _branch_ref_path(table_path, name)
    if not os.path.exists(p):
        return False
    for i in branch_snapshot_ids(table_path, name):
        _remove_branch_manifest(table_path, name, i)
    _remove_published(p)
    return True


_CONSTRAINTS_FILE = "constraints.json"


def table_constraints(table_path: str) -> dict[str, str]:
    """The table's CHECK constraints ({name: sql_expr}) — a table-level
    property (the Delta model: constraints ride the table, not a
    snapshot; a rollback does not silently un-protect the table)."""
    p = os.path.join(table_path, _SNAP_DIR, _CONSTRAINTS_FILE)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return json.load(f)


def _write_constraints(table_path: str, cons: dict[str, str]) -> None:
    p = os.path.join(table_path, _SNAP_DIR, _CONSTRAINTS_FILE)
    tmp = p + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(cons, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, p)


def _violation_counts(df: DataFrame, cons: dict[str, str]) -> dict[str, int]:
    """One aggregate pass over ``df``: per-constraint count of rows
    whose CHECK expression is FALSE (SQL semantics: NULL passes)."""
    aggs = [
        F.count(
            F.when(~F.coalesce(F.expr(expr), F.lit(True)), 1)
        ).alias(name)
        for name, expr in cons.items()
    ]
    row = df.agg(*aggs).first()
    return {name: row[name] for name in cons}


def _enforce_constraints(df: DataFrame, table_path: str) -> None:
    """Reject a batch that breaks any table CHECK constraint — ONE
    aggregate job over the incoming batch (never the table), run by
    every row-adding commit (append, merge, MoR merge, stage)."""
    cons = table_constraints(table_path)
    if not cons:
        return
    bad = {k: v for k, v in _violation_counts(df, cons).items() if v}
    if bad:
        raise ConstraintViolation(
            f"batch violates CHECK constraint(s) {bad} "
            f"(rows in violation per constraint) under {table_path}"
        )


def add_constraint(
    spark: SparkSession,
    table_path: str,
    name: str,
    expr: str,
    validate_existing: bool = True,
) -> None:
    """Add a CHECK constraint (SQL expression over the table's columns;
    NULL passes, FALSE violates). ``validate_existing`` (default, the
    Delta behaviour) first proves the CURRENT content satisfies it —
    one scan — so a constraint can never be born already broken; every
    subsequent row-adding commit then enforces it against the incoming
    batch only (O(|batch|), never a table scan)."""
    cons = table_constraints(table_path)
    if name in cons:
        raise ValueError(f"constraint {name!r} already exists")
    F.expr(expr)  # syntax-check before anything persists
    if validate_existing and current_snapshot_id(table_path) is not None:
        n = _violation_counts(
            read_snapshot(spark, table_path), {name: expr}
        )[name]
        if n:
            raise ConstraintViolation(
                f"existing table content violates {name!r} ({expr}): "
                f"{n} row(s)"
            )
    cons[name] = expr
    _write_constraints(table_path, cons)


def drop_constraint(table_path: str, name: str) -> bool:
    """Remove a CHECK constraint; returns whether it existed."""
    cons = table_constraints(table_path)
    if name not in cons:
        return False
    del cons[name]
    _write_constraints(table_path, cons)
    return True


def fold_deletes(spark: SparkSession, table_path: str) -> int | None:
    """Materialize every pending merge-on-read delete: rewrite exactly
    the data files at least one sidecar applies to (seq < some delete's
    seq), publish ONE replace commit with an EMPTY delete list. Returns
    the new snapshot id, or None when no deletes were pending. The
    sidecar parquet files become unreferenced once the manifests that
    listed them expire; vacuum reclaims them. Run this (or compaction /
    clustering, which fold as a side effect of rewriting) before read
    amplification from stacked sidecars matters — each pending sidecar
    is one broadcast anti-join on every read."""
    parent = current_snapshot_id(table_path)
    if parent is None:
        raise FileNotFoundError(f"no snapshots under {table_path}")
    m = read_manifest(table_path, parent)
    deletes = m.get("deletes", [])
    if not deletes:
        return None

    def _may_shadow(e: dict) -> bool:
        # a delete can shadow rows of e iff it is newer AND its change
        # keys' bounding box intersects e's stats (box/stats absent ⇒
        # must assume yes) — so a point-update sidecar leaves files
        # outside its key range completely untouched even at fold time
        eseq = e.get("seq", 0)
        for d in deletes:
            if d["seq"] <= eseq:
                continue
            if d.get("kind") == "position":
                # position deletes NAME their files — only those rewrite
                if e["path"] in d.get("files", []):
                    return True
                continue
            # the box is keyed by the DELETE's write-time names; route
            # through current names so files_intersecting can re-
            # translate to the FILE's write-time stats keys (field-id
            # sound on evolved tables, identity otherwise)
            b = _delete_to_current(d, m).get("box")
            if b is None:
                return True
            if files_intersecting({**m, "files": [e]},
                                  {c: tuple(v) for c, v in b.items()}):
                return True
        return False

    shadowed, clear = [], []
    for e in m["files"]:
        (shadowed if _may_shadow(e) else clear).append(e)
    new_files = _stamp_seq(
        _write_data_files(
            _read_entries(spark, table_path, m, shadowed), table_path,
            current_manifest=m,
        ),
        parent,
    ) if shadowed else []
    if current_snapshot_id(table_path) != parent:
        raise CommitConflict(
            f"snapshot advanced past {parent} while folding — replan"
        )
    return _publish(
        table_path, parent, clear + new_files, m["schema"], "replace",
        deletes=[], parent_manifest=m,
    )


def delete_snapshot_where(
    spark: SparkSession,
    table_path: str,
    where: dict[str, tuple],
    record_changes: bool = True,
) -> int:
    """Copy-on-write range DELETE (retention, GDPR erasure): drop every
    row inside the conjunctive range ``where`` ({col: (lo, hi)}) in ONE
    replace commit. Files whose stats cannot intersect the box are
    carried over untouched; intersecting files are rewritten with the
    complement rows only. Note the deleted data remains physically
    present in OLD snapshots until ``expire_snapshots`` drops them —
    run expiry to complete an erasure. ``record_changes`` persists the
    deleted rows as ``_change_type='delete'`` change files for
    :func:`snapshot_change_feed` (same one-extra-pass cost as merge)."""
    parent = current_snapshot_id(table_path)
    if parent is None:
        raise FileNotFoundError(f"no snapshots under {table_path}")
    m = read_manifest(table_path, parent)
    touched, untouched = _split_by_box(m, where)
    if not touched:
        return parent
    old = _read_entries(spark, table_path, m, touched)
    inside = None
    for c, (lo, hi) in where.items():
        cond = F.col(c).between(lo, hi)
        inside = cond if inside is None else (inside & cond)
    # NULL-valued rows never match a range predicate — KEEP them (a bare
    # where(~inside) would drop them: NOT(NULL) is NULL, which filters)
    new_files = _stamp_seq(
        _write_data_files(
            old.where(F.coalesce(~inside, F.lit(True))), table_path,
            current_manifest=m,
        ),
        parent,
    )
    change_files: list[dict] = []
    if record_changes:
        change_files = _write_data_files(
            old.where(F.coalesce(inside, F.lit(False))).withColumn(
                "_change_type", F.lit("delete")
            ),
            table_path, subdir=_CHANGES_DIR, current_manifest=m,
        )
    if current_snapshot_id(table_path) != parent:
        raise CommitConflict(
            f"snapshot advanced past {parent} while deleting — replan"
        )
    return _publish(
        table_path, parent, untouched + new_files, m["schema"], "replace",
        deletes=m.get("deletes", []), changes=change_files,
        extra={"change_op": "delete"} if change_files else None,
        parent_manifest=m,
    )


def _curve_repartition(curve: str):
    """The clustering-key arranger for a named space-filling curve:
    ``zorder`` (Morton) or ``hilbert`` (Skilling) — both from
    ``operators.layout``, call-compatible."""
    from ratatool_spark.operators import layout

    if curve == "zorder":
        return layout.zorder_repartition
    if curve == "hilbert":
        def _h(df, cols, bits=16, num_partitions=None, z_col=None,
               arrange=True):
            return layout.hilbert_repartition(
                df, cols, bits=bits, num_partitions=num_partitions,
                h_col=z_col, arrange=arrange)
        return _h
    raise ValueError(f"unknown clustering curve {curve!r}")


def cluster_snapshot(
    spark: SparkSession,
    table_path: str,
    zorder_cols: list[str],
    bits: int = 16,
    num_partitions: int | None = None,
    curve: str = "zorder",
) -> int:
    """Rewrite the whole table clustered by ``zorder_cols``
    (``layout.zorder_repartition``: range exchange on the Morton key +
    intra-partition sort, so every file's footer min/max stats become
    selective on all z columns) and publish it as ONE replace commit —
    the clustering-rewrite commit type. ``curve="hilbert"`` swaps the
    Morton key for the Hilbert key (``layout.hilbert_repartition``) —
    same commit shape, tighter boxes. Readers on older snapshots keep
    the unclustered files until expiry; new scans prune with the
    clustered layout (`row_group_skip_audit` measures the payoff).
    Logical content is untouched — the `snapshot_cluster_zorder` gate
    pins the rewrite against the source table."""
    zorder_repartition = _curve_repartition(curve)

    parent = current_snapshot_id(table_path)
    if parent is None:
        raise FileNotFoundError(f"no snapshots under {table_path}")
    m = read_manifest(table_path, parent)
    spec = table_partition_spec(table_path)
    if spec:
        # partitioned table: attach the curve key only and let the
        # writer range-arrange on (partition cols, key) — locality
        # WITHIN each partition, partition alignment preserved, one
        # exchange instead of two
        clustered = zorder_repartition(
            read_snapshot(spark, table_path, parent),
            zorder_cols, bits=bits, z_col="__z", arrange=False,
        )
        new_files = _stamp_seq(
            _write_data_files(
                clustered, table_path, layout_sort=["__z"],
                layout_partitions=num_partitions, current_manifest=m,
            ),
            parent,
        )
    else:
        clustered = zorder_repartition(
            read_snapshot(spark, table_path, parent),
            zorder_cols,
            bits=bits,
            num_partitions=num_partitions,
        )
        # full rewrite through the deletes-aware read: every pending
        # merge-on-read delete is folded, so the new manifest carries
        # none
        new_files = _stamp_seq(
            _write_data_files(clustered, table_path, current_manifest=m),
            parent,
        )
    if current_snapshot_id(table_path) != parent:
        raise CommitConflict(
            f"snapshot advanced past {parent} while clustering — replan"
        )
    return _publish(table_path, parent, new_files, m["schema"],
                    "replace", parent_manifest=m)


def commit_with_retry(fn, max_retries: int = 3):
    """Run a commit closure under optimistic-concurrency retry: on
    :class:`CommitConflict` the closure is invoked again (it must
    RE-READ the current snapshot each attempt — every committer here
    does, since they all start from ``current_snapshot_id``). Appends
    and MoR merges are always safely retryable (their inputs don't
    depend on the parent's file list); CoW merge/delete/compact replan
    against the new parent on each call, which is exactly the public
    formats' retry semantics. The loser's already-written data files
    are orphans the aged vacuum reclaims.

    >>> commit_with_retry(lambda: commit_append(df, path))
    """
    last: CommitConflict | None = None
    for _ in range(max_retries + 1):
        try:
            return fn()
        except CommitConflict as e:
            last = e
    raise CommitConflict(
        f"gave up after {max_retries} retries — a committer is racing "
        f"faster than this job can replan: {last}"
    ) from last


def snapshot_id_as_of(table_path: str, ts: float) -> int:
    """The snapshot id current AS OF wall-clock ``ts`` (epoch seconds)
    — Delta's ``TIMESTAMP AS OF``: the highest retained snapshot whose
    commit timestamp is <= ts. Raises :class:`SnapshotExpired` when the
    timestamp predates every retained snapshot (expiry dropped the
    manifest that was current then — an older read cannot be
    reconstructed honestly), and ValueError when ts predates the table
    on an unexpired table. Manifests missing ``committed_at`` (pre-
    upgrade tables) fall back to the manifest file's mtime.

    Metadata-scale: one pass over the manifest headers
    (``load_files=False`` — file lists stay unmaterialized)."""
    ids = _snap_ids(table_path)
    if not ids:
        raise FileNotFoundError(f"no snapshots under {table_path}")
    best = None
    for sid in ids:
        m = read_manifest(table_path, sid, load_files=False)
        cat = m.get("committed_at")
        if cat is None:
            cat = os.path.getmtime(_snap_path(table_path, sid))
        if cat <= ts:
            best = sid
    if best is None:
        if min(ids) > 1:
            raise SnapshotExpired(
                f"timestamp {ts} predates the oldest retained snapshot "
                f"of {table_path} (retention dropped older manifests) — "
                "no honest as-of read exists"
            )
        raise ValueError(
            f"timestamp {ts} predates the table at {table_path}"
        )
    return best


def read_snapshot_as_of(
    spark: SparkSession,
    table_path: str,
    ts: float,
    where: dict[str, tuple] | None = None,
) -> DataFrame:
    """Timestamp time travel: the table as it stood at wall-clock
    ``ts`` — resolves the snapshot id via :func:`snapshot_id_as_of`,
    then a normal (pruned, MoR-aware) :func:`read_snapshot`."""
    return read_snapshot(
        spark, table_path, snapshot_id_as_of(table_path, ts), where=where
    )


def rollback_snapshot(table_path: str, to_id: int) -> int:
    """RESTORE the table to the state of snapshot ``to_id`` — published
    as a NEW commit carrying that snapshot's exact file list (and
    deletes), so nothing is mutated or lost: the bad commits stay in
    history for forensics until expiry, readers flip atomically, and a
    second rollback can undo the rollback. The Delta RESTORE / Iceberg
    rollback semantics; requires ``to_id`` to still be retained.

    Change-feed note: unlike compaction (content-preserving), a
    rollback CHANGES logical content without recording change rows —
    ``snapshot_change_feed`` therefore raises
    :class:`ChangeFeedDiscontinuity` on any range crossing it (the
    consumer rebases on a full read), and the file-level
    ``snapshot_changes`` append scan is unaffected (the restore adds no
    files)."""
    parent = current_snapshot_id(table_path)
    if parent is None:
        raise FileNotFoundError(f"no snapshots under {table_path}")
    if to_id == parent:
        return parent
    target = read_manifest(table_path, to_id)  # raises if expired/absent
    return _publish(
        table_path, parent, target["files"], target["schema"], "rollback",
        deletes=target.get("deletes", []),
        # the TARGET's field-id state comes back too (a restore past a
        # rename serves the old names again); inheriting the parent's
        # would mis-bind the restored files
        extra={"rolled_back_to": to_id,
               **{k: target[k]
                  for k in ("columns", "schema_v", "schema_log")
                  if k in target}},
        inherit_evolution=False,
    )


# ---------------------------------------------------------------------------
# Named tags (Iceberg's tag refs): a tag is an immutable name for a
# snapshot id — "the audited monthly export", "the training-data
# freeze" — and a RETENTION ANCHOR: expire_snapshots never drops a
# tagged snapshot, so `read_snapshot(snapshot_id=read_tag(...))` keeps
# working no matter how far the table advances. Tags never move (drop
# and re-create to retarget); branches (the WAP staging surface) are
# the mutable sibling.
# ---------------------------------------------------------------------------

_TAGS_DIR = "tags"


def _tag_path(table_path: str, name: str) -> str:
    import re

    if not re.fullmatch(r"[A-Za-z0-9][A-Za-z0-9._-]{0,127}", name):
        raise ValueError(
            f"invalid tag name {name!r} (allowed: letters, digits, "
            "'.', '_', '-'; must start alphanumeric; max 128 chars)"
        )
    return os.path.join(table_path, _SNAP_DIR, _TAGS_DIR, f"{name}.json")


def table_tags(table_path: str) -> dict[str, dict]:
    """{tag name: {"snapshot_id": int, "created_at": float}}. One file
    per tag, so concurrent taggers never clobber each other (a
    read-modify-write on one shared file would let the last writer
    silently erase another job's retention anchor)."""
    d = os.path.join(table_path, _SNAP_DIR, _TAGS_DIR)
    out: dict[str, dict] = {}
    for p in glob.glob(os.path.join(d, "*.json")):
        with open(p) as f:
            out[os.path.basename(p)[:-5]] = json.load(f)
    return out


def create_tag(
    table_path: str, name: str, snapshot_id: int | None = None
) -> int:
    """Tag ``snapshot_id`` (default: current) as ``name``. Immutable:
    re-tagging an existing name is refused (delete first) — a tag that
    silently moved would invalidate every consumer that pinned it.
    Exclusive-create per tag file, so two racing creators of the same
    name get exactly one winner and distinct names never interfere."""
    import time

    sid = snapshot_id if snapshot_id is not None \
        else current_snapshot_id(table_path)
    if sid is None:
        raise FileNotFoundError(f"no snapshots under {table_path}")
    read_manifest(table_path, sid, load_files=False)  # must exist
    p = _tag_path(table_path, name)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    try:
        _write_exclusive_json(
            p, {"snapshot_id": sid, "created_at": time.time()}
        )
    except FileExistsError:
        with open(p) as f:
            have = json.load(f)
        raise ValueError(
            f"tag {name!r} already exists (snapshot "
            f"{have['snapshot_id']}) — tags are immutable; delete_tag "
            "first"
        ) from None
    return sid


def read_tag(table_path: str, name: str) -> int:
    """The snapshot id a tag names (pass to ``read_snapshot``)."""
    p = _tag_path(table_path, name)
    if not os.path.exists(p):
        raise KeyError(
            f"no tag {name!r} under {table_path} "
            f"(have {sorted(table_tags(table_path))})"
        )
    with open(p) as f:
        return json.load(f)["snapshot_id"]


def delete_tag(table_path: str, name: str) -> bool:
    """Remove a tag (its snapshot becomes expirable again). Returns
    whether it existed."""
    p = _tag_path(table_path, name)
    if not os.path.exists(p):
        return False
    _remove_published(p)
    return True


def expire_snapshots(
    table_path: str,
    keep_last: int = 1,
    delete: bool = True,
    older_than: float | None = None,
) -> list[str]:
    """Drop all but the newest ``keep_last`` snapshots and delete the
    data files ONLY they referenced (pure set arithmetic over the
    manifests — retained snapshots keep every file they list, so time
    travel within the retention window still works). Returns the
    manifest-relative paths of the files removed. ``delete=False`` is
    the dry-run audit.

    ``older_than`` (seconds) switches to the timestamp retention the
    public formats expose (Delta's log retention, Iceberg's
    ``expire_snapshots(older_than)``): only snapshots whose manifest
    mtime is older than the window expire, and the newest ``keep_last``
    are kept no matter how old — so a quiet table never loses its
    current state.

    TAGGED snapshots (:func:`create_tag`) never expire: a tag is a
    retention anchor, so the pinned snapshot and every file it lists
    survive until the tag is deleted."""
    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    ids = _snap_ids(table_path)
    if len(ids) <= keep_last:
        return []
    expired, retained = ids[:-keep_last], ids[-keep_last:]
    # tags AND branch fork points are retention anchors: a branch's
    # lineage builds on its base snapshot's files, so the base must
    # survive until the branch is deleted or fast-forwarded
    tagged = {t["snapshot_id"] for t in table_tags(table_path).values()}
    tagged |= {b["base"] for b in table_branches(table_path).values()}
    if tagged:
        retained = [s for s in expired if s in tagged] + retained
        expired = [s for s in expired if s not in tagged]
        if not expired:
            return []
    if older_than is not None:
        import time

        cutoff = time.time() - older_than
        young = [
            sid for sid in expired
            if os.path.getmtime(_snap_path(table_path, sid)) > cutoff
        ]
        retained = young + retained
        expired = [sid for sid in expired if sid not in set(young)]
        if not expired:
            return []
    live: set[str] = set()
    for sid in retained:
        live.update(_referenced_paths(read_manifest(table_path, sid)))
    dead: set[str] = set()
    for sid in expired:
        m = read_manifest(table_path, sid)
        dead.update(p for p in _referenced_paths(m) if p not in live)
        if "files_ref" in m:  # the expired manifest's own parquet sidecar
            dead.add(m["files_ref"])
    if delete:
        for rel in sorted(dead):
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
    `operation != append` commit contributes nothing). For row-level
    CDC across MERGE/DELETE/merge-on-read commits use
    :func:`snapshot_change_feed`, which replays the change files those
    commits record; the SCD2 path (``streaming/scd2``) additionally
    models change history as first-class rows."""
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
    # tag/branch retention keeps ANCHORS, not intermediates — a gapped
    # history cannot yield a correct delta, so fail with the rebase
    # guidance up front instead of a raw FileNotFoundError mid-range
    gap = [s_ for s_ in range(from_id + 1, to_id + 1) if s_ not in ids]
    if gap:
        raise SnapshotExpired(
            f"snapshot(s) {gap[0]}..{gap[-1]} inside the range "
            f"({from_id}, {to_id}] were expired under {table_path} — "
            "rebase the consumer: full read_snapshot() of the current "
            "snapshot, then resume from its id"
        )
    base = read_manifest(table_path, from_id) if from_id > 0 else {"files": []}
    m_to = read_manifest(table_path, to_id, load_files=False)
    schema = StructType.fromJson(json.loads(m_to["schema"]))
    seen = {e["path"] for e in base["files"]}
    added: list[dict] = []
    for sid in range(from_id + 1, to_id + 1):
        m = read_manifest(table_path, sid)
        if m["operation"] == "append":
            for e in m["files"]:
                if e["path"] not in seen:
                    added.append(e)
                    seen.add(e["path"])
        else:
            seen.update(e["path"] for e in m["files"])
    if not added:
        return spark.createDataFrame([], schema)
    # _scan_entries resolves columns by field id, so files appended
    # before a rename/widen inside the range surface in to_id's shape
    return _scan_entries(spark, table_path, m_to, added)


def snapshot_change_feed(
    spark: SparkSession,
    table_path: str,
    from_id: int,
    to_id: int | None = None,
) -> DataFrame:
    """Row-level CDC between ``from_id`` (exclusive) and ``to_id``
    (inclusive, default current): every row the table gained, lost, or
    replaced, tagged ``_change_type`` ∈ {insert, update_preimage,
    update_postimage, delete, upsert} + ``_commit_snapshot_id`` — the
    Delta change-data-feed surface. Sources per commit kind:

    * ``append``  — the commit's added data files, tagged ``insert``
      (no extra storage: the data files ARE the change set);
    * ``replace`` with recorded change files (CoW merge/delete) — the
      change files persisted AT COMMIT TIME, replayed verbatim;
    * ``merge-mor`` — the commit's added data files tagged ``upsert``
      (postimages; insert-vs-update split would need the old-file read
      MoR exists to avoid);
    * maintenance ``replace``/``evolve`` (compaction, clustering,
      folding, schema) — contribute NOTHING, by construction.

    Metadata-planned: reads exactly the change/data files of the range;
    schema evolution inside the range is handled by name-based union
    (pre-evolution commits surface NULL for later columns). Raises
    :class:`SnapshotExpired` when ``from_id`` fell out of retention."""
    from pyspark.sql.types import StringType, StructField

    to_id = current_snapshot_id(table_path) if to_id is None else to_id
    if to_id is None or from_id > to_id:
        raise ValueError(f"bad snapshot range ({from_id}, {to_id}]")
    ids = set(_snap_ids(table_path))
    if (from_id > 0 and from_id not in ids) or (
        from_id == 0 and ids and min(ids) > 1
    ):
        raise SnapshotExpired(
            f"snapshot {from_id} fell out of retention under "
            f"{table_path} — rebase the consumer: full read_snapshot()"
            " of the current snapshot, then resume the feed from its id"
        )
    # tag/branch retention keeps ANCHORS, not intermediates — a gapped
    # history cannot yield a correct delta, so fail with the rebase
    # guidance up front instead of a raw FileNotFoundError mid-range
    gap = [s_ for s_ in range(from_id + 1, to_id + 1) if s_ not in ids]
    if gap:
        raise SnapshotExpired(
            f"snapshot(s) {gap[0]}..{gap[-1]} inside the range "
            f"({from_id}, {to_id}] were expired under {table_path} — "
            "rebase the consumer: full read_snapshot() of the current "
            "snapshot, then resume from its id"
        )
    prev = read_manifest(table_path, from_id) if from_id > 0 else {"files": []}
    m_to = read_manifest(table_path, to_id, load_files=False)

    def _to_current(df: DataFrame, v: int, extras: list[str]) -> DataFrame:
        """Normalize a frame read in schema-version v's shape to
        ``to_id``'s current id→name binding (+ the feed's meta columns)
        so frames union column-for-column across renames/widenings.
        Identity when the table never evolved names/types."""
        if "schema_log" not in m_to:
            return df
        sel = _version_select(
            m_to, m_to["schema_log"][str(v)], have=set(df.columns))
        return df.select(*sel, *extras)

    prev_paths = {e["path"] for e in prev["files"]}
    frames: list[DataFrame] = []
    for sid in range(from_id + 1, to_id + 1):
        m = read_manifest(table_path, sid)
        if m["operation"] == "rollback":
            # a rollback CHANGES logical content but records no change
            # rows (the restore is an operator intervention, not a data
            # mutation the commit computed) — a feed silently skipping
            # it would replay to the WRONG state. Fail loudly: the
            # consumer must rebase on a full read past the restore.
            raise ChangeFeedDiscontinuity(
                f"snapshot {sid} is a rollback (restored to "
                f"{m.get('rolled_back_to')}) — the feed cannot replay "
                "across it; rebase the consumer: full read_snapshot() "
                "at or after the rollback, then resume the feed from "
                "that snapshot id"
            )
        schema = StructType.fromJson(json.loads(m["schema"]))
        tag = {"append": "insert", "merge-mor": "upsert"}.get(m["operation"])
        if tag is not None:
            added = [
                e["path"] for e in m["files"] if e["path"] not in prev_paths
            ]
            if added:
                frames.append(_to_current(
                    spark.read.schema(schema).parquet(
                        *[os.path.join(table_path, p) for p in added]
                    )
                    .withColumn("_change_type", F.lit(tag))
                    .withColumn(
                        "_commit_snapshot_id", F.lit(sid).cast("long")),
                    m.get("schema_v", 0),
                    ["_change_type", "_commit_snapshot_id"],
                ))
        elif m.get("changes"):
            cschema = StructType(
                schema.fields + [StructField("_change_type", StringType())]
            )
            frames.append(_to_current(
                spark.read.schema(cschema).parquet(
                    *[os.path.join(table_path, e["path"])
                      for e in m["changes"]]
                ).withColumn("_commit_snapshot_id", F.lit(sid).cast("long")),
                m.get("schema_v", 0),
                ["_change_type", "_commit_snapshot_id"],
            ))
        prev_paths = {e["path"] for e in m["files"]}
    if not frames:
        schema = StructType.fromJson(
            json.loads(read_manifest(table_path, to_id)["schema"])
        )
        empty = spark.createDataFrame([], schema)
        return empty.withColumn(
            "_change_type", F.lit(None).cast("string")
        ).withColumn("_commit_snapshot_id", F.lit(None).cast("long"))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out


def snapshot_log(spark: SparkSession, table_path: str) -> DataFrame:
    """(snapshot_id, parent, operation, n_files, rows, bytes,
    n_pending_deletes, n_change_files) — the table's commit history as
    a DataFrame (metadata-scale). ``rows`` counts physical stored rows;
    on a snapshot with pending merge-on-read sidecars the LOGICAL row
    count is lower (shadowed rows subtract at read) —
    ``n_pending_deletes`` > 0 flags exactly when that caveat applies
    and maintenance (``fold_deletes``/compaction) is due."""
    rows = []
    for sid in _snap_ids(table_path):
        m = read_manifest(table_path, sid, load_files=False)
        if "rows_total" not in m:  # pre-totals manifest: sum the list
            m = read_manifest(table_path, sid)
            m["n_files"] = len(m["files"])
            m["rows_total"] = sum(e["rows"] for e in m["files"])
            m["bytes_total"] = sum(e["bytes"] for e in m["files"])
        rows.append(
            (
                sid,
                m["parent"],
                m["operation"],
                m["n_files"],
                m["rows_total"],
                m["bytes_total"],
                len(m.get("deletes", [])),
                len(m.get("changes", [])),
            )
        )
    return local_df(
        spark,
        rows,
        "snapshot_id bigint, parent bigint, operation string, "
        "n_files bigint, rows bigint, bytes bigint, "
        "n_pending_deletes bigint, n_change_files bigint",
    )


def _branch_manifest_at(table_path: str, name: str, k: int | None) -> dict:
    """A branch-local manifest by id (None = head; 0 = fork point)."""
    if k is None:
        return _branch_head_manifest(table_path, name)[1]
    if k == 0:
        with open(_branch_ref_path(table_path, name)) as f:
            return read_manifest(table_path, json.load(f)["base"])
    p = _branch_manifest_path(table_path, name, k)
    if not os.path.exists(p):
        raise FileNotFoundError(
            f"branch {name!r} has no local snapshot {k} "
            f"(have {branch_snapshot_ids(table_path, name)})"
        )
    return _load_branch_manifest(table_path, p)


def _branch_metadata_table(
    spark: SparkSession,
    table_path: str,
    kind: str,
    snapshot_id: int | None,
    branch: str,
) -> DataFrame:
    """The inspection surface scoped to one branch's lineage — same
    schemas as the main views so consumers union them freely;
    snapshot ids are BRANCH-LOCAL (1-based; parent 0 = fork point)."""
    if kind == "files":
        m = _branch_manifest_at(table_path, branch, snapshot_id)
        sid = snapshot_id if snapshot_id is not None \
            else m.get("branch_id", 0)
        return manifest_files_df(spark, table_path, m=m).select(
            F.lit(sid).cast("bigint").alias("snapshot_id"), "*"
        )
    if kind == "snapshots":
        rows = []
        for k in branch_snapshot_ids(table_path, branch):
            m = _branch_manifest_at(table_path, branch, k)
            if "rows_total" in m:
                n_f, n_rows, n_bytes = (
                    m["n_files"], m["rows_total"], m["bytes_total"])
            else:  # pre-totals branch manifest
                n_f = len(m["files"])
                n_rows = sum(e["rows"] for e in m["files"])
                n_bytes = sum(e["bytes"] for e in m["files"])
            rows.append((
                k, k - 1, float(m.get("committed_at", 0.0)),
                m["operation"], n_f, n_rows, n_bytes,
                len(m.get("deletes", [])), len(m.get("changes", [])),
            ))
        return local_df(
            spark,
            rows,
            "snapshot_id bigint, parent bigint, committed_at double, "
            "operation string, n_files bigint, rows bigint, bytes bigint, "
            "n_pending_deletes bigint, n_change_files bigint",
        )
    if kind == "history":
        # branch lineage is linear (no rollback surface): every local
        # commit is an ancestor of the head
        rows = [
            (float(_branch_manifest_at(table_path, branch, k)
                   .get("committed_at", 0.0)), k, k - 1, True)
            for k in branch_snapshot_ids(table_path, branch)
        ]
        return local_df(
            spark,
            rows,
            "made_current_at double, snapshot_id bigint, parent bigint, "
            "is_current_ancestor boolean",
        )
    if kind == "partitions":
        m = _branch_manifest_at(table_path, branch, snapshot_id)
        agg: dict[tuple, list] = {}
        for e in m["files"]:
            key = tuple(sorted((e.get("partition") or {}).items()))
            a = agg.setdefault(key, [0, 0, 0])
            a[0] += 1
            a[1] += e["rows"]
            a[2] += e["bytes"]
        rows = [
            ({kk: (None if v is None else str(v)) for kk, v in key},
             a[0], a[1], a[2])
            for key, a in agg.items()
        ]
        return local_df(
            spark,
            rows,
            "partition map<string,string>, n_files bigint, "
            "rows bigint, bytes bigint",
        )
    if kind == "manifests":
        rows = []
        for k in branch_snapshot_ids(table_path, branch):
            mpath = _branch_manifest_path(table_path, branch, k)
            m = _load_branch_manifest(table_path, mpath, load_files=False)
            ext = "files_ref" in m
            ref = m.get("files_ref")
            ref_bytes = None
            if ext:
                sp = os.path.join(table_path, ref)
                ref_bytes = (
                    os.path.getsize(sp) if os.path.exists(sp) else None)
            rows.append((
                k, os.path.relpath(mpath, table_path),
                os.path.getsize(mpath), ext, ref, ref_bytes,
                m["n_files"] if ext else len(m.get("files", [])),
                len(m.get("deletes", [])), len(m.get("changes", [])),
            ))
        return local_df(
            spark,
            rows,
            "snapshot_id bigint, path string, bytes bigint, "
            "externalized boolean, files_ref string, "
            "files_ref_bytes bigint, n_files bigint, "
            "n_pending_deletes bigint, n_change_files bigint",
        )
    raise ValueError(
        f"metadata table {kind!r} has no branch scope — branch= applies "
        "to files, snapshots, history, partitions, manifests"
    )


def metadata_table(
    spark: SparkSession,
    table_path: str,
    kind: str,
    snapshot_id: int | None = None,
    branch: str | None = None,
) -> DataFrame:
    """The Iceberg inspection surface (``table.files`` /
    ``.snapshots`` / ``.history`` / ``.partitions`` / ``.refs``) as
    DataFrames over the manifest ledger — metadata-scale by
    construction (one row per file / commit / partition / ref; never a
    data scan):

      - ``files``: the (current or asked) snapshot's data files with
        typed min/max stats maps, partition tuple, seq, schema version
        (:func:`manifest_files_df` plus the snapshot id).
      - ``snapshots``: one row per live commit — id, parent,
        committed_at, operation, n_files, physical rows/bytes, pending
        MoR sidecars, CDC change files.
      - ``history``: (made_current_at, snapshot_id, parent,
        is_current_ancestor) — Iceberg's history table;
        ``is_current_ancestor`` walks the parent chain from the
        current snapshot (a rollback target's abandoned successors
        read FALSE).
      - ``partitions``: per-partition rollup of the (current or asked)
        snapshot: partition tuple, n_files, rows, bytes.
      - ``refs``: named refs — main, tags, branches — with type,
        pinned/base snapshot id and branch head depth.
      - ``manifests``: one row per commit's manifest FILE — ledger
        path, json size, whether the file list is externalized to a
        parquet sidecar (and its path/size), entry/delete/change
        counts. The physical-metadata view (Iceberg's ``.manifests``);
        never opens a sidecar (counts come from the commit json).

    ``branch=`` scopes files/snapshots/history/partitions to a named
    branch's lineage (branch-local 1-based ids; parent 0 = fork point)
    — same schemas, so main and branch views union freely.
    """
    if branch is not None:
        return _branch_metadata_table(
            spark, table_path, kind, snapshot_id, branch)
    if kind == "files":
        sid = snapshot_id if snapshot_id is not None \
            else current_snapshot_id(table_path)
        return manifest_files_df(spark, table_path, sid).select(
            F.lit(sid).cast("bigint").alias("snapshot_id"), "*"
        )
    if kind == "snapshots":
        rows = []
        for sid in _snap_ids(table_path):
            # O(#commits): commit-time totals make the view independent
            # of file-list size — no sidecar is ever opened for a
            # manifest that records them (every manifest since they
            # were introduced does; the fallback load covers older
            # inline manifests only)
            m = read_manifest(table_path, sid, load_files=False)
            if "rows_total" in m:
                n_f = m["n_files"]
                n_rows = m["rows_total"]
                n_bytes = m["bytes_total"]
            else:
                m = read_manifest(table_path, sid)
                n_f = len(m["files"])
                n_rows = sum(e["rows"] for e in m["files"])
                n_bytes = sum(e["bytes"] for e in m["files"])
            rows.append((
                sid, m["parent"], float(m.get("committed_at", 0.0)),
                m["operation"], n_f, n_rows, n_bytes,
                len(m.get("deletes", [])), len(m.get("changes", [])),
            ))
        return local_df(
            spark,
            rows,
            "snapshot_id bigint, parent bigint, committed_at double, "
            "operation string, n_files bigint, rows bigint, bytes bigint, "
            "n_pending_deletes bigint, n_change_files bigint",
        )
    if kind == "history":
        ids = _snap_ids(table_path)
        ancestors: set[int] = set()
        cur = ids[-1] if ids else None
        metas = {s: read_manifest(table_path, s, load_files=False)
                 for s in ids}
        while cur is not None and cur in metas:
            ancestors.add(cur)
            # a rollback commit restores an older state: its logical
            # ancestor is the restore TARGET, not the abandoned tip
            cur = metas[cur].get("rolled_back_to", metas[cur]["parent"])
        rows = [
            (float(metas[s].get("committed_at", 0.0)), s,
             metas[s]["parent"], s in ancestors)
            for s in ids
        ]
        return local_df(
            spark,
            rows,
            "made_current_at double, snapshot_id bigint, parent bigint, "
            "is_current_ancestor boolean",
        )
    if kind == "partitions":
        sid = snapshot_id if snapshot_id is not None \
            else current_snapshot_id(table_path)
        m = read_manifest(table_path, sid)
        agg: dict[tuple, list] = {}
        for e in m["files"]:
            key = tuple(sorted((e.get("partition") or {}).items()))
            a = agg.setdefault(key, [0, 0, 0])
            a[0] += 1
            a[1] += e["rows"]
            a[2] += e["bytes"]
        rows = [
            ({k: (None if v is None else str(v)) for k, v in key},
             a[0], a[1], a[2])
            for key, a in agg.items()
        ]
        return local_df(
            spark,
            rows,
            "partition map<string,string>, n_files bigint, "
            "rows bigint, bytes bigint",
        )
    if kind == "manifests":
        rows = []
        for sid in _snap_ids(table_path):
            m = read_manifest(table_path, sid, load_files=False)
            mpath = _snap_path(table_path, sid)
            ext = "files_ref" in m
            ref = m.get("files_ref")
            ref_bytes = None
            if ext:
                sp = os.path.join(table_path, ref)
                ref_bytes = (
                    os.path.getsize(sp) if os.path.exists(sp) else None)
            rows.append((
                sid, os.path.relpath(mpath, table_path),
                os.path.getsize(mpath), ext, ref, ref_bytes,
                m["n_files"] if ext else len(m.get("files", [])),
                len(m.get("deletes", [])), len(m.get("changes", [])),
            ))
        return local_df(
            spark,
            rows,
            "snapshot_id bigint, path string, bytes bigint, "
            "externalized boolean, files_ref string, "
            "files_ref_bytes bigint, n_files bigint, "
            "n_pending_deletes bigint, n_change_files bigint",
        )
    if kind == "refs":
        rows = [("main", "branch",
                 current_snapshot_id(table_path) or 0, 0)]
        for name, t in sorted(table_tags(table_path).items()):
            rows.append((name, "tag", t["snapshot_id"], 0))
        for name, b in sorted(table_branches(table_path).items()):
            rows.append((name, "branch", b["base"], b["head"]))
        return local_df(
            spark,
            rows,
            "name string, type string, snapshot_id bigint, "
            "branch_head bigint",
        )
    raise ValueError(
        f"unknown metadata table {kind!r} — one of files, snapshots, "
        "history, partitions, refs, manifests"
    )


def maintain_agg_view(
    view: DataFrame | None,
    feed: DataFrame,
    keys: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """Incremental materialized-view maintenance from the CDC feed: keep
    a (keys, __n, sum_<c>...) aggregate view consistent with the table
    WITHOUT rescanning it — the change-data-feed payoff. Count and SUM
    are self-inverting under the feed's signed algebra: insert /
    update_postimage contribute +1/+value, delete / update_preimage
    contribute -1/-value, so one aggregate over the (change-sized) feed
    plus one outer merge against the (group-sized) view refreshes it;
    groups whose count reaches zero drop out. At 100 TB: the table is
    never touched — maintenance cost is O(|changes| + |groups|).

    Requires a COMPLETE feed: ``_change_type='upsert'`` rows (MoR
    merges record postimages only — the preimage read is exactly the
    cost MoR defers) make subtraction impossible, so the call REFUSES
    and the caller must either fold+recompute or use CoW merges on
    maintained tables. Sum columns should be exact types (DECIMAL/
    integer): float sums would drift between the incremental and
    recomputed views.

    ``view=None`` bootstraps from an all-insert feed (equivalently:
    aggregate one full read and maintain from its snapshot id on)."""
    sign = (
        F.when(
            F.col("_change_type").isin("insert", "update_postimage"),
            F.lit(1),
        )
        .when(
            F.col("_change_type").isin("delete", "update_preimage"),
            F.lit(-1),
        )
        .otherwise(F.lit(None))
    )
    bad = feed.where(
        ~F.col("_change_type").isin(
            "insert", "update_postimage", "delete", "update_preimage"
        )
    ).limit(1).count()
    if bad:
        raise ValueError(
            "maintain_agg_view needs a complete feed (insert/update_*/"
            "delete); it contains 'upsert' or unknown change rows — "
            "MoR merges defer the preimage read, so algebraic "
            "maintenance is impossible; fold and recompute instead"
        )
    delta = (
        feed.select(*keys, sign.alias("__s"), *sum_cols)
        .groupBy(*keys)
        .agg(
            F.sum("__s").alias("__dn"),
            *[
                F.sum(F.col(c) * F.col("__s")).alias(f"__d_{c}")
                for c in sum_cols
            ],
        )
    )
    if view is None:
        out = delta.select(
            *keys,
            F.col("__dn").alias("__n"),
            *[F.col(f"__d_{c}").alias(f"sum_{c}") for c in sum_cols],
        )
        return out.where(F.col("__n") > 0)
    merged = view.join(delta, keys, "full_outer").select(
        *[
            F.coalesce(view[k], delta[k]).alias(k) for k in keys
        ],
        (
            F.coalesce(F.col("__n"), F.lit(0))
            + F.coalesce(F.col("__dn"), F.lit(0))
        ).alias("__n"),
        *[
            (
                F.coalesce(F.col(f"sum_{c}"), F.lit(0))
                + F.coalesce(F.col(f"__d_{c}"), F.lit(0))
            ).alias(f"sum_{c}")
            for c in sum_cols
        ],
    )
    return merged.where(F.col("__n") > 0)
