"""Gate + oracle twins for the snapshot-manifest table layer
(operators/snapshots): time travel and compaction-under-isolation +
expiry. The oracles are the logical-content truths — a snapshot read
must equal the corresponding slice of the source table no matter how
many physical files, commits, or rewrites produced it."""

from __future__ import annotations

from ratatool_spark.gates._common import scratch_dir

import json

from pyspark.sql import functions as F


def _build_orders_table(spark, sf_dir, n_commits=3, where=None):
    """orders split by o_orderkey % n_commits, appended commit-by-commit
    (snapshot i holds residues 0..i-1). ``where`` optionally trims the
    FIXTURE (a gate cost knob, not operator semantics — the oracle twin
    applies the same predicate to its source CTE)."""
    from ratatool_spark.operators.snapshots import commit_append

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    if where is not None:
        orders = orders.where(where)
    path = scratch_dir(prefix="rt_snap_") + "/tbl"
    for i in range(n_commits):
        commit_append(orders.where(F.col("o_orderkey") % n_commits == i), path)
    return path


def _q_snapshot_time_travel(spark, sf_dir):
    """Time travel (operators/snapshots.read_snapshot): orders lands in
    three append commits; reading AS OF snapshot 2 must see exactly the
    first two commits' rows — later files exist on disk but are not in
    snapshot 2's manifest, so the reader is isolated from them by
    construction. The oracle recomputes that slice straight from the
    source table."""
    from ratatool_spark.operators.snapshots import read_snapshot

    path = _build_orders_table(spark, sf_dir, n_commits=3)
    asof2 = read_snapshot(spark, path, snapshot_id=2)
    return asof2.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_total"),
    )


_SQL_SNAPSHOT_TIME_TRAVEL = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
FROM orders
WHERE o_orderkey % 3 IN (0, 1)
GROUP BY o_orderstatus
"""


def _q_snapshot_compact_expire(spark, sf_dir):
    """Compaction under snapshot isolation + expiry
    (operators/snapshots.compact_snapshot / expire_snapshots): three
    append commits, one REPLACE commit that bin-packs every data file
    into one compacted file per ~bin (layout.compaction_plan drives the
    plan), then expiry of all but the newest snapshot deletes exactly
    the files only dead snapshots referenced. The surviving table must
    still equal the full source table bit-for-bit (the oracle), and the
    snapshot id must be 4 = 3 appends + 1 replace — physical layout
    changed, logical content identical."""
    from ratatool_spark.operators.snapshots import (
        compact_snapshot,
        current_snapshot_id,
        expire_snapshots,
        read_snapshot,
    )

    path = _build_orders_table(spark, sf_dir, n_commits=3)
    compact_snapshot(spark, path, target_bytes=1 << 30)
    expire_snapshots(path, keep_last=1)
    cur = read_snapshot(spark, path)
    return cur.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_total"),
        F.lit(int(current_snapshot_id(path))).alias("snapshot_id"),
    )


def _q_snapshot_cluster_zorder(spark, sf_dir):
    """Clustering-rewrite commit (operators/snapshots.cluster_snapshot):
    the table is rewritten z-ordered by (o_custkey, o_orderkey) as one
    replace commit — physical layout changes (range exchange on the
    Morton key, selective footer stats), logical content must not (the
    oracle is the full source table), and the commit history must read
    3 appends + 1 replace."""
    from ratatool_spark.operators.snapshots import (
        cluster_snapshot,
        current_snapshot_id,
        read_snapshot,
    )

    path = _build_orders_table(spark, sf_dir, n_commits=3)
    cluster_snapshot(spark, path, ["o_custkey", "o_orderkey"],
                     num_partitions=4)
    cur = read_snapshot(spark, path)
    return cur.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_total"),
        F.lit(int(current_snapshot_id(path))).alias("snapshot_id"),
    )


_SQL_SNAPSHOT_CLUSTER_ZORDER = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
       4 AS snapshot_id
FROM orders
GROUP BY o_orderstatus
"""


def _q_snapshot_stats_pruned_read(spark, sf_dir):
    """File-level skipping from manifest min/max stats
    (operators/snapshots.read_snapshot(where=...), the Iceberg/Delta
    pruning primitive): the table is z-order-clustered into 4 files
    (tight per-column ranges in the manifest), then read under a
    1/8th-of-custkey box — whole files are ruled out from METADATA
    alone (files_pruned must be true: the upper z-range files cannot
    contain the low-custkey box), and the surviving rows must equal the
    plain SQL filter."""
    from ratatool_spark.operators.snapshots import (
        cluster_snapshot,
        files_intersecting,
        read_manifest,
        read_snapshot,
    )

    path = _build_orders_table(spark, sf_dir, n_commits=3)
    cluster_snapshot(spark, path, ["o_custkey", "o_orderkey"],
                     num_partitions=4)
    m = read_manifest(path)
    agg = spark.read.parquet(f"{sf_dir}/orders.parquet").agg(
        F.min("o_custkey"), F.max("o_custkey")
    ).first()
    lo = int(agg[0])
    hi = lo + (int(agg[1]) - lo) // 8
    box = {"o_custkey": (lo, hi)}
    pruned = len(m["files"]) - len(files_intersecting(m, box))
    cur = read_snapshot(spark, path, where=box)
    return cur.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_total"),
        F.lit(pruned > 0).alias("files_pruned"),
    )


_SQL_SNAPSHOT_STATS_PRUNED = """
WITH box AS (
  SELECT MIN(o_custkey) AS lo,
         MIN(o_custkey) + (MAX(o_custkey) - MIN(o_custkey)) // 8 AS hi
  FROM orders
)
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
       TRUE AS files_pruned
FROM orders, box
WHERE o_custkey BETWEEN box.lo AND box.hi
GROUP BY o_orderstatus
"""


def _key_box(spark, sf_dir):
    """(lo, hi) = the lowest eighth of o_orderkey — the range-local
    slice the CoW gates touch (replayed by the oracles as scalar
    subqueries)."""
    agg = spark.read.parquet(f"{sf_dir}/orders.parquet").agg(
        F.min("o_orderkey"), F.max("o_orderkey")
    ).first()
    lo = int(agg[0])
    return lo, lo + (int(agg[1]) - lo) // 8


def _q_snapshot_merge_upsert(spark, sf_dir):
    """Copy-on-write MERGE (operators/snapshots.merge_snapshot): the
    z-clustered table takes an upsert batch doubling o_totalprice on the
    lowest eighth of o_orderkey; only files whose manifest stats
    intersect the batch's key box are rewritten (files_carried pins that
    at least one file rode through untouched), in one replace commit.
    The oracle computes the post-merge table directly from the source."""
    from ratatool_spark.operators.snapshots import (
        cluster_snapshot,
        merge_snapshot,
        read_manifest,
        read_snapshot,
    )

    path = _build_orders_table(spark, sf_dir, n_commits=3)
    cluster_snapshot(spark, path, ["o_orderkey"], num_partitions=4)
    lo, hi = _key_box(spark, sf_dir)
    cur = read_snapshot(spark, path)
    changes = cur.where(F.col("o_orderkey").between(lo, hi)).withColumn(
        "o_totalprice", F.col("o_totalprice") * F.lit(2.0)
    )
    before = {e["path"] for e in read_manifest(path)["files"]}
    merge_snapshot(spark, path, changes, ["o_orderkey"])
    after = {e["path"] for e in read_manifest(path)["files"]}
    merged = read_snapshot(spark, path)
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_total"),
        F.lit(bool(before & after)).alias("files_carried"),
    )


_SQL_SNAPSHOT_MERGE_UPSERT = """
WITH box AS (
  SELECT MIN(o_orderkey) AS lo,
         MIN(o_orderkey) + (MAX(o_orderkey) - MIN(o_orderkey)) // 8 AS hi
  FROM orders
)
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(CASE WHEN o_orderkey BETWEEN box.lo AND box.hi
                          THEN o_totalprice * 2.0 ELSE o_totalprice END
                     AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
       TRUE AS files_carried
FROM orders, box
GROUP BY o_orderstatus
"""


def _q_snapshot_delete_retention(spark, sf_dir):
    """Copy-on-write range DELETE (operators/snapshots.
    delete_snapshot_where): erase the lowest eighth of o_orderkey from
    the z-clustered table in one replace commit — files outside the box
    carried untouched, intersecting files rewritten with the complement.
    Oracle = the source table minus the range."""
    from ratatool_spark.operators.snapshots import (
        cluster_snapshot,
        delete_snapshot_where,
        read_manifest,
        read_snapshot,
    )

    path = _build_orders_table(spark, sf_dir, n_commits=3)
    cluster_snapshot(spark, path, ["o_orderkey"], num_partitions=4)
    lo, hi = _key_box(spark, sf_dir)
    before = {e["path"] for e in read_manifest(path)["files"]}
    delete_snapshot_where(spark, path, {"o_orderkey": (lo, hi)})
    after = {e["path"] for e in read_manifest(path)["files"]}
    cur = read_snapshot(spark, path)
    return cur.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_total"),
        F.lit(bool(before & after)).alias("files_carried"),
    )


_SQL_SNAPSHOT_DELETE_RETENTION = """
WITH box AS (
  SELECT MIN(o_orderkey) AS lo,
         MIN(o_orderkey) + (MAX(o_orderkey) - MIN(o_orderkey)) // 8 AS hi
  FROM orders
)
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
       TRUE AS files_carried
FROM orders, box
WHERE o_orderkey NOT BETWEEN box.lo AND box.hi
GROUP BY o_orderstatus
"""


def _q_snapshot_schema_evolution(spark, sf_dir):
    """Additive schema evolution as a metadata-only commit
    (operators/snapshots.evolve_add_columns): the orders table gains a
    nullable `tag` column WITHOUT rewriting any data file, then a tagged
    batch (every 97th order) is appended under the widened schema. Old
    files must read the new column as NULL; new rows carry it — the
    oracle derives both populations from the source table."""
    from ratatool_spark.operators.snapshots import (
        commit_append,
        evolve_add_columns,
        read_snapshot,
    )

    path = _build_orders_table(spark, sf_dir, n_commits=3)
    evolve_add_columns(spark, path, {"tag": "string"})
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    commit_append(
        orders.where(F.col("o_orderkey") % 97 == 0).withColumn(
            "tag", F.lit("r8")
        ),
        path,
    )
    cur = read_snapshot(spark, path)
    return cur.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("tag").isNotNull().cast("int")).cast("long")
        .alias("n_tagged"),
        F.sum(F.col("tag").isNull().cast("int")).cast("long")
        .alias("n_legacy"),
    )


_SQL_SNAPSHOT_SCHEMA_EVOLUTION = """
SELECT o_orderstatus,
       CAST(COUNT(*) + SUM(CASE WHEN o_orderkey % 97 = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN o_orderkey % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_tagged,
       COUNT(*) AS n_legacy
FROM orders
GROUP BY o_orderstatus
"""


def _q_snapshot_incremental_scan(spark, sf_dir):
    """Incremental change scan (operators/snapshots.snapshot_changes):
    consumers poll rows ADDED since a snapshot instead of re-reading the
    table. After 3 appends, a compaction REPLACE (maintenance — must
    contribute nothing), and one more tagged append, the scan from
    snapshot 1 must return exactly commits 2+3+5's rows: the %3∈{1,2}
    residues plus the every-97th batch — even though compaction
    rewrote every earlier row into a brand-new file in between."""
    from ratatool_spark.operators.snapshots import (
        commit_append,
        compact_snapshot,
        snapshot_changes,
    )

    path = _build_orders_table(spark, sf_dir, n_commits=3)
    compact_snapshot(spark, path, target_bytes=1 << 30)  # snapshot 4
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    commit_append(orders.where(F.col("o_orderkey") % 97 == 0), path)
    delta = snapshot_changes(spark, path, 1)
    return delta.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_total"),
    )


_SQL_SNAPSHOT_INCREMENTAL_SCAN = """
WITH delta AS (
  SELECT o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 3 IN (1, 2)
  UNION ALL
  SELECT o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 97 = 0
)
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
FROM delta
GROUP BY o_orderstatus
"""


def _q_stream_snapshot_appends(spark, sf_dir):
    """Streaming ingestion into a snapshot table
    (streaming/snapshots.stream_snapshot_append) run for real: orders
    arrives as three files processed one per micro-batch, each published
    as ONE atomic append commit with the stream batch id recorded as the
    idempotency ledger. The final table must equal the whole source
    (oracle), commit count must equal batch count, and the ledger must
    hold exactly the delivered batch ids — at-least-once delivery,
    exactly-once table contents."""
    import os

    from ratatool_spark.operators.snapshots import (
        current_snapshot_id,
        read_snapshot,
    )
    from ratatool_spark.streaming.snapshots import (
        committed_stream_batches,
        stream_snapshot_append,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    root = scratch_dir(prefix="rt_snapstream_")
    in_dir = os.path.join(root, "incoming")
    orders.repartitionByRange(3, F.col("o_orderkey")).write.parquet(in_dir)
    stream = (
        spark.readStream.schema(orders.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    tbl = os.path.join(root, "tbl")
    from ratatool_spark.gates._common import stream_partitions

    with stream_partitions(spark):
        q = stream_snapshot_append(
            stream, tbl, checkpoint=os.path.join(root, "ckpt")
        )
        q.awaitTermination()
    n_commits = int(current_snapshot_id(tbl))
    n_batches = len(committed_stream_batches(tbl))
    return read_snapshot(spark, tbl).groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_total"),
        F.lit(n_commits).alias("n_commits"),
        F.lit(n_batches).alias("n_batches"),
    )


_SQL_STREAM_SNAPSHOT_APPENDS = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
       3 AS n_commits,
       3 AS n_batches
FROM orders
GROUP BY o_orderstatus
"""


_SQL_SNAPSHOT_COMPACT_EXPIRE = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
       4 AS snapshot_id
FROM orders
GROUP BY o_orderstatus
"""


def _q_snapshot_cdc_merge(spark, sf_dir):
    """Row-level CDC across MERGE and DELETE commits
    (operators/snapshots.snapshot_change_feed — the Delta CDF design):
    the orders table takes a CoW merge (price-doubling updates on the
    lowest eighth of o_orderkey + key-shifted inserts at 3x price) and a
    CoW range delete (the second eighth), both of which record their
    change sets as change files AT COMMIT TIME. The feed from the
    pre-merge snapshot must replay exactly those rows with typed
    _change_type — update_preimage/update_postimage/insert from the
    merge commit, delete from the delete commit — each attributed to its
    commit id. The oracle recomputes all four change populations
    directly from the source table."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.snapshots import (
        delete_snapshot_where,
        merge_snapshot,
        snapshot_change_feed,
    )

    path = _build_orders_table(spark, sf_dir, n_commits=1)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    agg = orders.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    lo, mx = int(agg[0]), int(agg[1])
    s8 = (mx - lo) // 8
    ulo, uhi = lo, lo + s8                    # update box
    dlo, dhi = lo + 2 * s8, lo + 3 * s8       # delete box (disjoint)
    shift = mx - lo + 1                       # inserts land past max
    in_box = orders.where(F.col("o_orderkey").between(ulo, uhi))
    updates = in_box.withColumn(
        "o_totalprice", F.col("o_totalprice") * F.lit(2.0)
    )
    inserts = in_box.select(
        (F.col("o_orderkey") + F.lit(shift)).alias("o_orderkey"),
        "o_custkey", "o_orderstatus",
        (F.col("o_totalprice") * F.lit(3.0)).alias("o_totalprice"),
    )
    merge_snapshot(spark, path, updates.unionByName(inserts),
                   ["o_orderkey"])                       # v2
    delete_snapshot_where(spark, path, {"o_orderkey": (dlo, dhi)})  # v3
    feed = snapshot_change_feed(spark, path, 1)
    return feed.groupBy("_change_type", "_commit_snapshot_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_total"),
    )


_SQL_SNAPSHOT_CDC_MERGE = """
WITH box AS (
  SELECT MIN(o_orderkey) AS lo,
         (MAX(o_orderkey) - MIN(o_orderkey)) // 8 AS s8,
         MAX(o_orderkey) - MIN(o_orderkey) + 1 AS shift
  FROM orders
),
upd AS (
  SELECT o.* FROM orders o, box
  WHERE o_orderkey BETWEEN box.lo AND box.lo + box.s8
),
del AS (
  SELECT o.* FROM orders o, box
  WHERE o_orderkey BETWEEN box.lo + 2 * box.s8 AND box.lo + 3 * box.s8
),
feed AS (
  SELECT 'update_preimage' AS _change_type, 2 AS _commit_snapshot_id,
         o_totalprice AS p FROM upd
  UNION ALL
  SELECT 'update_postimage', 2, o_totalprice * 2.0 FROM upd
  UNION ALL
  SELECT 'insert', 2, o_totalprice * 3.0 FROM upd
  UNION ALL
  SELECT 'delete', 3, o_totalprice FROM del
)
SELECT _change_type, _commit_snapshot_id,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
FROM feed
GROUP BY _change_type, _commit_snapshot_id
"""


def _q_snapshot_mor_merge(spark, sf_dir):
    """Merge-on-read upsert (operators/snapshots.merge_snapshot_mor +
    fold_deletes): the same price-doubling batch the CoW gate merges is
    published as new data files + an equality-delete key sidecar — ZERO
    existing files rewritten (no_rewrite pins the manifest file set grew
    monotonically, with no clustering rewrite to hide behind), yet the
    read equals the CoW result (the oracle IS the CoW truth).
    fold_deletes then materializes the sidecar into stats-intersecting
    files only and the re-read must be identical (fold_same, asserted
    cross-engine via the same aggregate)."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.snapshots import (
        fold_deletes,
        merge_snapshot_mor,
        read_manifest,
        read_snapshot,
    )

    path = _build_orders_table(spark, sf_dir, n_commits=3)
    lo, hi = _key_box(spark, sf_dir)
    cur = read_snapshot(spark, path)
    changes = cur.where(F.col("o_orderkey").between(lo, hi)).withColumn(
        "o_totalprice", F.col("o_totalprice") * F.lit(2.0)
    )
    before = {e["path"] for e in read_manifest(path)["files"]}
    merge_snapshot_mor(spark, path, changes, ["o_orderkey"])
    after = {e["path"] for e in read_manifest(path)["files"]}
    no_rewrite = before <= after

    def _agg(df):
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_total"),
        )

    mor = sorted(_agg(read_snapshot(spark, path)).collect())
    fold_deletes(spark, path)
    if read_manifest(path)["deletes"]:
        raise ValueError("fold_deletes left pending sidecars behind")
    folded = sorted(_agg(read_snapshot(spark, path)).collect())
    return _agg(read_snapshot(spark, path)).select(
        "*",
        F.lit(bool(no_rewrite)).alias("no_rewrite"),
        F.lit(mor == folded).alias("fold_same"),
    )


_SQL_SNAPSHOT_MOR_MERGE = """
WITH box AS (
  SELECT MIN(o_orderkey) AS lo,
         MIN(o_orderkey) + (MAX(o_orderkey) - MIN(o_orderkey)) // 8 AS hi
  FROM orders
)
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(CASE WHEN o_orderkey BETWEEN box.lo AND box.hi
                          THEN o_totalprice * 2.0 ELSE o_totalprice END
                     AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
       TRUE AS no_rewrite,
       TRUE AS fold_same
FROM orders, box
GROUP BY o_orderstatus
"""


def _q_manifest_pruning_equivalence(spark, sf_dir):
    """Manifest scalability (operators/snapshots.files_intersecting_spark
    over the parquet manifest sidecar): past FILES_INLINE_MAX the files
    list externalizes to a typed parquet sidecar and planning-time stats
    pruning runs as a SPARK JOB instead of a driver loop — this gate
    forces the externalized layout (threshold dropped to 0 for the
    table's commits), prunes a custkey box BOTH ways, and pins (a) the
    two paths keep the identical file set (paths_equal), (b) the sidecar
    layout was actually in play (sidecar_used), (c) whole files were
    really skipped (files_pruned), and (d) the surviving rows equal the
    plain SQL filter (the oracle)."""
    from pyspark.sql import functions as F

    import ratatool_spark.operators.snapshots as snap

    old_max = snap.FILES_INLINE_MAX
    snap.FILES_INLINE_MAX = 0
    try:
        path = _build_orders_table(spark, sf_dir, n_commits=3)
        snap.cluster_snapshot(spark, path, ["o_custkey"], num_partitions=4)
    finally:
        snap.FILES_INLINE_MAX = old_max
    m = snap.read_manifest(path)
    sidecar_used = "files_ref" in m
    agg = spark.read.parquet(f"{sf_dir}/orders.parquet").agg(
        F.min("o_custkey"), F.max("o_custkey")
    ).first()
    lo = int(agg[0])
    hi = lo + (int(agg[1]) - lo) // 8
    box = {"o_custkey": (lo, hi)}
    py_kept = {e["path"] for e in snap.files_intersecting(m, box)}
    sp_kept = {
        r["path"]
        for r in snap.files_intersecting_spark(
            snap.manifest_files_df(spark, path), box
        ).collect()
    }
    cur = snap.read_snapshot(spark, path, where=box)
    return cur.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_total"),
        F.lit(py_kept == sp_kept).alias("paths_equal"),
        F.lit(bool(sidecar_used)).alias("sidecar_used"),
        F.lit(len(py_kept) < len(m["files"])).alias("files_pruned"),
    )


_SQL_MANIFEST_PRUNING = """
WITH box AS (
  SELECT MIN(o_custkey) AS lo,
         MIN(o_custkey) + (MAX(o_custkey) - MIN(o_custkey)) // 8 AS hi
  FROM orders
)
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
       TRUE AS paths_equal,
       TRUE AS sidecar_used,
       TRUE AS files_pruned
FROM orders, box
WHERE o_custkey BETWEEN box.lo AND box.hi
GROUP BY o_orderstatus
"""


def _q_stream_snapshot_source(spark, sf_dir):
    """Streaming SOURCE over a snapshot table
    (streaming/snapshots.stream_snapshot_source / stream_snapshot_mirror)
    run for real: orders lands in table A as three append commits; a
    Structured Streaming mirror (file-source stream over A's manifest
    directory, availableNow) replays each append as ONE atomic commit of
    table B. Then the WHOLE stream is re-delivered under a FRESH
    checkpoint — the destination's source-snapshot ledger must make that
    a no-op (n_commits_after_replay == 3). B's content must equal the
    full source table (the oracle), closing the table→stream→table loop
    with exactly-once semantics on both hops."""
    import os

    from pyspark.sql import functions as F

    from ratatool_spark.operators.snapshots import (
        current_snapshot_id,
        read_snapshot,
    )
    from ratatool_spark.streaming.snapshots import stream_snapshot_mirror

    src = _build_orders_table(spark, sf_dir, n_commits=3)
    root = scratch_dir(prefix="rt_snapsrc_")
    dst = os.path.join(root, "dst")
    from ratatool_spark.gates._common import stream_partitions

    with stream_partitions(spark):
        q = stream_snapshot_mirror(
            spark, src, dst, checkpoint=os.path.join(root, "ck1")
        )
        q.awaitTermination()
        n_commits = int(current_snapshot_id(dst))
        q = stream_snapshot_mirror(  # full re-delivery: ledger no-ops it
            spark, src, dst, checkpoint=os.path.join(root, "ck2")
        )
        q.awaitTermination()
    n_after_replay = int(current_snapshot_id(dst))
    return read_snapshot(spark, dst).groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_total"),
        F.lit(n_commits).alias("n_commits"),
        F.lit(n_after_replay).alias("n_commits_after_replay"),
    )


_SQL_STREAM_SNAPSHOT_SOURCE = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
       3 AS n_commits,
       3 AS n_commits_after_replay
FROM orders
GROUP BY o_orderstatus
"""


def _q_pipeline_cdc_scd2(spark, sf_dir):
    """Composition: the snapshot table's CDC feed IS a changelog a
    downstream dimension consumes (operators/snapshots.
    snapshot_change_feed → operators/scd2.scd2_history). Two CoW merges
    reprice overlapping o_orderkey ranges (2x then 3x the source price);
    the feed's insert/update_postimage rows, ordered by commit id,
    build the SCD2 history — versions per key must be 1 + (#merges
    touching it), and the history's CURRENT rows must equal the live
    table (asserted in-gate AND via the oracle, which recomputes both
    the version counts and the current prices straight from the source
    table). Pins that the feed is a complete, ordered, replayable
    changelog — not just a row bag."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.scd2 import scd2_history
    from ratatool_spark.operators.snapshots import (
        merge_snapshot,
        read_snapshot,
        snapshot_change_feed,
    )

    path = _build_orders_table(spark, sf_dir, n_commits=1)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    agg = orders.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    lo, mx = int(agg[0]), int(agg[1])
    s8 = (mx - lo) // 8
    b1 = (lo, lo + 2 * s8)          # first reprice: lowest quarter
    b2 = (lo + s8, lo + 3 * s8)     # second: overlaps b1's upper half
    for mult, (blo, bhi) in ((2.0, b1), (3.0, b2)):
        changes = orders.where(
            F.col("o_orderkey").between(blo, bhi)
        ).withColumn("o_totalprice", F.col("o_totalprice") * F.lit(mult))
        merge_snapshot(spark, path, changes, ["o_orderkey"])
    feed = snapshot_change_feed(spark, path, 0).where(
        F.col("_change_type").isin("insert", "update_postimage")
    )
    hist = scd2_history(
        feed,
        key_cols="o_orderkey",
        ts_col="_commit_snapshot_id",
        attr_cols=["o_custkey", "o_orderstatus", "o_totalprice"],
    )
    cur = hist.where(F.col("is_current")).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    live = read_snapshot(spark, path)
    probe = cur.unionByName(live).groupBy(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    ).count().where(F.col("count") != 2)
    if probe.limit(1).count():
        raise ValueError("SCD2 current rows diverged from the live table")
    return hist.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_versions"),
        F.sum(F.col("is_current").cast("int")).cast("long").alias("n_current"),
        F.sum(
            F.when(F.col("is_current"),
                   F.col("o_totalprice").cast("decimal(18,2)"))
        ).cast("double").alias("sum_current"),
    )


_SQL_PIPELINE_CDC_SCD2 = """
WITH box AS (
  SELECT MIN(o_orderkey) AS lo,
         (MAX(o_orderkey) - MIN(o_orderkey)) // 8 AS s8
  FROM orders
)
SELECT o_orderstatus,
       CAST(COUNT(*)
            + SUM(CASE WHEN o_orderkey BETWEEN box.lo AND box.lo + 2 * box.s8
                       THEN 1 ELSE 0 END)
            + SUM(CASE WHEN o_orderkey BETWEEN box.lo + box.s8
                                           AND box.lo + 3 * box.s8
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_versions,
       COUNT(*) AS n_current,
       CAST(SUM(CAST(
         CASE WHEN o_orderkey BETWEEN box.lo + box.s8 AND box.lo + 3 * box.s8
              THEN o_totalprice * 3.0
              WHEN o_orderkey BETWEEN box.lo AND box.lo + 2 * box.s8
              THEN o_totalprice * 2.0
              ELSE o_totalprice END AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_current
FROM orders, box
GROUP BY o_orderstatus
"""


def _q_snapshot_mor_delete(spark, sf_dir):
    """Merge-on-read range DELETE (operators/snapshots.
    delete_snapshot_where_mor): erasing the lowest eighth of o_orderkey
    is a METADATA-ONLY commit — the predicate lands as a manifest delete
    entry, zero files rewritten (no_rewrite), readers filter it at scan;
    fold_deletes then materializes the erasure into stats-intersecting
    files only and the re-read must be identical (fold_same). The oracle
    is the CoW-delete truth: the source table minus the range."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.snapshots import (
        delete_snapshot_where_mor,
        fold_deletes,
        read_manifest,
        read_snapshot,
    )

    path = _build_orders_table(spark, sf_dir, n_commits=3)
    lo, hi = _key_box(spark, sf_dir)
    before = {e["path"] for e in read_manifest(path)["files"]}
    delete_snapshot_where_mor(spark, path, {"o_orderkey": (lo, hi)})
    after = {e["path"] for e in read_manifest(path)["files"]}
    no_rewrite = before == after

    def _agg(df):
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_total"),
        )

    mor = sorted(_agg(read_snapshot(spark, path)).collect())
    fold_deletes(spark, path)
    if read_manifest(path)["deletes"]:
        raise ValueError("fold_deletes left pending sidecars behind")
    folded = sorted(_agg(read_snapshot(spark, path)).collect())
    return _agg(read_snapshot(spark, path)).select(
        "*",
        F.lit(bool(no_rewrite)).alias("no_rewrite"),
        F.lit(mor == folded).alias("fold_same"),
    )


_SQL_SNAPSHOT_MOR_DELETE = """
WITH box AS (
  SELECT MIN(o_orderkey) AS lo,
         MIN(o_orderkey) + (MAX(o_orderkey) - MIN(o_orderkey)) // 8 AS hi
  FROM orders
)
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
       TRUE AS no_rewrite,
       TRUE AS fold_same
FROM orders, box
WHERE o_orderkey NOT BETWEEN box.lo AND box.hi
GROUP BY o_orderstatus
"""


def _q_snapshot_pos_delete(spark, sf_dir):
    """Merge-on-read position DELETE (operators/snapshots.
    delete_snapshot_rows_mor): rows matching an ARBITRARY disjunctive
    predicate — one no range box or single key column can express — are
    removed by recording their (file, row-ordinal) identities from the
    parquet scan's _metadata columns as a sidecar: a metadata-tier
    commit, zero files rewritten (no_rewrite). Readers anti-join the
    broadcast sidecar against exactly the files the entry NAMES;
    fold_deletes then rewrites ONLY those named files (fold_surgical
    pins removed-by-fold == named) and the re-read is identical
    (fold_same); the CDC feed carries every deleted row (cdc_exact).
    The oracle is the CoW truth: the source table minus the predicate."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.snapshots import (
        delete_snapshot_rows_mor,
        fold_deletes,
        read_manifest,
        read_snapshot,
        snapshot_change_feed,
    )

    path = _build_orders_table(spark, sf_dir, n_commits=3)
    pred = ("(o_orderkey % 17 = 3) OR "
            "(o_orderstatus = 'F' AND o_orderkey % 31 = 7)")
    parent = read_manifest(path)["snapshot_id"]
    before = {e["path"] for e in read_manifest(path)["files"]}
    delete_snapshot_rows_mor(spark, path, pred)
    m = read_manifest(path)
    after = {e["path"] for e in m["files"]}
    no_rewrite = before == after
    entry = m["deletes"][-1]
    named = set(entry["files"])
    feed_dels = (
        snapshot_change_feed(spark, path, parent)
        .where(F.col("_change_type") == "delete")
        .count()
    )
    cdc_exact = feed_dels == entry["rows"]

    def _agg(df):
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_total"),
        )

    mor = sorted(_agg(read_snapshot(spark, path)).collect())
    fold_deletes(spark, path)
    m2 = read_manifest(path)
    if m2["deletes"]:
        raise ValueError("fold_deletes left pending sidecars behind")
    removed = before - {e["path"] for e in m2["files"]}
    fold_surgical = removed == named and len(named) > 0
    folded = sorted(_agg(read_snapshot(spark, path)).collect())
    return _agg(read_snapshot(spark, path)).select(
        "*",
        F.lit(bool(no_rewrite)).alias("no_rewrite"),
        F.lit(mor == folded).alias("fold_same"),
        F.lit(bool(fold_surgical)).alias("fold_surgical"),
        F.lit(bool(cdc_exact)).alias("cdc_exact"),
    )


_SQL_SNAPSHOT_POS_DELETE = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
       TRUE AS no_rewrite,
       TRUE AS fold_same,
       TRUE AS fold_surgical,
       TRUE AS cdc_exact
FROM orders
WHERE NOT ((o_orderkey % 17 = 3) OR
           (o_orderstatus = 'F' AND o_orderkey % 31 = 7))
GROUP BY o_orderstatus
"""


def _q_snapshot_partitioned_prune(spark, sf_dir):
    """Hidden partitioning (operators/snapshots.table_partition_spec +
    partition_prune): orders lands in two append commits under a
    month(o_orderdate) x identity(o_orderstatus) spec — queries keep
    predicating on the SOURCE columns and the planner maps the bounds
    through the transforms to drop whole partitions from metadata
    alone (one commit — the cross-commit partition story is pinned by
    the drop gate, and a second partitioned append would only repeat
    the 80-dir write). partitions_scanned is the cross-engine pin: the distinct
    partition tuples surviving the prune must equal DuckDB's count of
    distinct (month, status) combinations actually present in the
    predicate's range — the planner scanned exactly the partitions the
    data demands, no more. spark_parity pins the driver-side and
    Spark-job (externalized-manifest) prune paths to the same file
    set; the row content equals the plain SQL filter (the oracle)."""
    import datetime

    from pyspark.sql import functions as F

    import ratatool_spark.operators.snapshots as snap

    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
        # fixture trim (r10): a 12-month band keeps the prune window
        # (Feb–Apr 1996) strictly inside a multi-partition layout while
        # cutting the partitioned write from ~80 month dirs to 12
        .where(
            F.col("o_orderdate").between("1995-07-01", "1996-06-30")
        )
    )
    path = scratch_dir(prefix="rt_part_") + "/tbl"
    spec = [
        {"col": "o_orderdate", "transform": "month"},
        {"col": "o_orderstatus", "transform": "identity"},
    ]
    snap.commit_append(orders, path, partition_spec=spec)
    w = {
        "o_orderdate": (
            datetime.date(1996, 2, 1), datetime.date(1996, 4, 30)
        ),
        "o_orderstatus": ("F", "O"),
    }
    m = snap.read_manifest(path)
    tspec = snap.table_partition_spec(path)
    pr = snap.partition_prune(spark, tspec, m["schema"], m["files"], w)
    kept_drv = {
        e["path"]
        for e in snap.files_intersecting({"files": pr}, w)
    }
    kept_spark = {
        r["path"]
        for r in snap.files_intersecting_spark(
            snap.manifest_files_df(spark, path), w,
            spec=tspec, schema_json=m["schema"],
        ).collect()
    }
    by_path = {e["path"]: e for e in m["files"]}
    tuples = {
        (by_path[p]["partition"]["p0"], by_path[p]["partition"]["p1"])
        for p in kept_drv
    }
    return (
        snap.read_snapshot(spark, path, where=w)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_total"),
        )
        .select(
            "*",
            F.lit(len(tuples)).cast("long").alias("partitions_scanned"),
            F.lit(kept_drv == kept_spark).alias("spark_parity"),
            F.lit(len(kept_drv) < len(m["files"])).alias("files_pruned"),
        )
    )


_SQL_SNAPSHOT_PARTITIONED_PRUNE = """
WITH hit AS (
  SELECT * FROM orders
  WHERE o_orderdate BETWEEN TIMESTAMP '1995-07-01'
                        AND TIMESTAMP '1996-06-30'
    AND o_orderdate BETWEEN TIMESTAMP '1996-02-01'
                        AND TIMESTAMP '1996-04-30'
    AND o_orderstatus BETWEEN 'F' AND 'O'
)
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
       (SELECT COUNT(DISTINCT strftime(o_orderdate, '%Y-%m') || o_orderstatus)
        FROM hit) AS partitions_scanned,
       TRUE AS spark_parity,
       TRUE AS files_pruned
FROM hit
GROUP BY o_orderstatus
"""


def _q_snapshot_drop_partition(spark, sf_dir):
    """Partition retirement (operators/snapshots.drop_partition):
    dropping the 1995-03 month of a month-partitioned orders table is a
    METADATA-ONLY commit — the manifest loses the partition's files, no
    data byte is read or written for the drop itself (metadata_only
    pins the file set strictly shrank with nothing added). The CDC feed
    stays complete: cdc_deleted must equal DuckDB's independent count
    of the dropped month's rows, and the surviving content equals the
    source minus that month (the oracle). The partition-alignment
    invariant that makes this sound (every write routes through the
    spec) is enforced by drop_partition itself — it refuses unaligned
    tables."""

    from pyspark.sql import functions as F

    import ratatool_spark.operators.snapshots as snap

    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
        # fixture trim (r10): one calendar year = 12 month partitions is
        # enough to pin metadata-only drop + complete CDC; the full
        # table's ~80 dirs only repeat the write
        .where(F.col("o_orderdate").between("1995-01-01", "1995-12-31"))
    )
    path = scratch_dir(prefix="rt_drop_") + "/tbl"
    spec = [{"col": "o_orderdate", "transform": "month"}]
    snap.commit_append(
        orders.where(F.col("o_orderkey") % 2 == 0), path,
        partition_spec=spec,
    )
    snap.commit_append(orders.where(F.col("o_orderkey") % 2 == 1), path)
    before = {e["path"] for e in snap.read_manifest(path)["files"]}
    sid = snap.current_snapshot_id(path)
    snap.drop_partition(spark, path, {"p0": "1995-03"})
    after = {e["path"] for e in snap.read_manifest(path)["files"]}
    metadata_only = after < before and not (after - before)
    cdc_deleted = (
        snap.snapshot_change_feed(spark, path, sid)
        .where(F.col("_change_type") == "delete")
        .count()
    )
    return (
        snap.read_snapshot(spark, path)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_total"),
        )
        .select(
            "*",
            F.lit(cdc_deleted).cast("long").alias("cdc_deleted"),
            F.lit(bool(metadata_only)).alias("metadata_only"),
        )
    )


_SQL_SNAPSHOT_DROP_PARTITION = """
WITH src AS (
  SELECT * FROM orders
  WHERE o_orderdate BETWEEN TIMESTAMP '1995-01-01'
                        AND TIMESTAMP '1995-12-31'
)
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
       (SELECT COUNT(*) FROM src
        WHERE strftime(o_orderdate, '%Y-%m') = '1995-03') AS cdc_deleted,
       TRUE AS metadata_only
FROM src
WHERE strftime(o_orderdate, '%Y-%m') <> '1995-03'
GROUP BY o_orderstatus
"""


def _q_snapshot_wap_publish(spark, sf_dir):
    """Write-audit-publish (operators/snapshots.stage_append /
    read_branch / publish_branch / discard_branch — Iceberg's WAP
    pattern): a corrupt candidate batch (negated totals) is staged,
    audited on the BRANCH view, rejected and discarded — main never
    sees a row of it (staged_invisible). The clean batch is then
    staged, audited (zero violations on the branch), and published as a
    METADATA-ONLY fast-forward (publish_metadata_only pins the file set
    at publish == files already on disk at stage time). Final content
    is the whole source table (the oracle)."""
    from pyspark.sql import functions as F

    import ratatool_spark.operators.snapshots as snap

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    path = scratch_dir(prefix="rt_wap_") + "/tbl"
    snap.commit_append(orders.where(F.col("o_orderkey") % 3 != 2), path)
    base_n = snap.read_snapshot(spark, path).count()

    batch = orders.where(F.col("o_orderkey") % 3 == 2)
    corrupt = batch.withColumn(
        "o_totalprice", -F.abs(F.col("o_totalprice"))
    )
    snap.stage_append(corrupt, path, "etl")
    bad = (
        snap.read_branch(spark, path, "etl")
        .where(F.col("o_totalprice") < 0)
        .count()
    )
    staged_invisible = snap.read_snapshot(spark, path).count() == base_n
    audit_rejected = bad > 0
    snap.discard_branch(path, "etl")

    snap.stage_append(batch, path, "etl")
    clean = (
        snap.read_branch(spark, path, "etl")
        .where(F.col("o_totalprice") < 0)
        .count()
    ) == 0
    files_before = {
        e["path"] for e in json.load(
            open(snap._stage_path(path, "etl"))
        )["files"]
    }
    snap.publish_branch(spark, path, "etl")
    files_after = {e["path"] for e in snap.read_manifest(path)["files"]}
    publish_metadata_only = files_after == files_before
    return (
        snap.read_snapshot(spark, path)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_total"),
        )
        .select(
            "*",
            F.lit(bool(staged_invisible)).alias("staged_invisible"),
            F.lit(bool(audit_rejected)).alias("audit_rejected"),
            F.lit(bool(clean)).alias("audit_clean"),
            F.lit(bool(publish_metadata_only)).alias("publish_metadata_only"),
        )
    )


_SQL_SNAPSHOT_WAP_PUBLISH = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
       TRUE AS staged_invisible,
       TRUE AS audit_rejected,
       TRUE AS audit_clean,
       TRUE AS publish_metadata_only
FROM orders
GROUP BY o_orderstatus
"""


def _q_snapshot_branch_ff(spark, sf_dir):
    """Named branches (operators/snapshots.create_branch /
    commit_append_branch / fast_forward_branch — the Iceberg branch-ref
    model, the multi-commit generalization of the WAP stage): main takes
    the o_orderkey%3==0 third of a trimmed orders slice, a 'dev' branch
    forks, the %3==1 and %3==2 thirds land as TWO branch commits (their
    own lineage, branch-local time travel), then fast-forward publishes
    the whole lineage as ONE metadata-only main commit. Pinned in-gate:
    main never saw a branch byte before the FF (main_isolated: row count
    AND snapshot id unmoved), branch-local snapshot 1 holds exactly
    main+first batch (branch_travel), the FF manifest records the
    2-commit lineage (ff_commits), and the branch resets empty at the
    new head (branch_reset). The oracle recomputes the final content and
    the isolation/travel counts straight from the source slice."""

    from pyspark.sql import functions as F

    import ratatool_spark.operators.snapshots as snap

    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .where(F.col("o_orderkey") % 4 == 0)  # fixture trim
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    path = scratch_dir(prefix="rt_branch_") + "/tbl"
    snap.commit_append(orders.where(F.col("o_orderkey") % 3 == 0), path)
    n_main0 = snap.read_snapshot(spark, path).count()
    snap.create_branch(path, "dev")
    snap.commit_append_branch(
        orders.where(F.col("o_orderkey") % 3 == 1), path, "dev")
    snap.commit_append_branch(
        orders.where(F.col("o_orderkey") % 3 == 2), path, "dev")
    main_isolated = (
        snap.read_snapshot(spark, path).count() == n_main0
        and snap.current_snapshot_id(path) == 1
    )
    n_b1 = snap.read_branch_snapshot(spark, path, "dev", 1).count()
    snap.fast_forward_branch(path, "dev")
    m = snap.read_manifest(path, load_files=False)
    ref = snap.table_branches(path)["dev"]
    branch_reset = ref["base"] == 2 and ref["head"] == 0
    return (
        snap.read_snapshot(spark, path)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_total"),
        )
        .select(
            "*",
            F.lit(n_b1).cast("long").alias("branch_travel"),
            F.lit(bool(main_isolated)).alias("main_isolated"),
            F.lit(int(m.get("branch_commits", 0)))
            .cast("long")
            .alias("ff_commits"),
            F.lit(bool(branch_reset)).alias("branch_reset"),
        )
    )


_SQL_SNAPSHOT_BRANCH_FF = """
WITH src AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 4 = 0
)
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
       (SELECT COUNT(*) FROM src WHERE o_orderkey % 3 IN (0, 1))
         AS branch_travel,
       TRUE AS main_isolated,
       CAST(2 AS BIGINT) AS ff_commits,
       TRUE AS branch_reset
FROM src
GROUP BY o_orderstatus
"""


def _q_snapshot_metadata_tables(spark, sf_dir):
    """Metadata inspection tables (operators/snapshots.metadata_table —
    the Iceberg .files/.snapshots/.history/.partitions/.refs surface):
    a month-partitioned orders table takes two commits and a tag; every
    inspection table is then read METADATA-ONLY (no data scan) and
    reduced to (kind, key, value) rows the oracle recomputes straight
    from the source slice — per-snapshot row counts, per-partition row
    counts, the files table's row total, ancestry flags, and ref
    pins. bytes>0 and n_files>=1 are asserted in-gate (physical facts
    DuckDB cannot see)."""

    from pyspark.sql import functions as F

    import ratatool_spark.operators.snapshots as snap
    from ratatool_spark.operators.snapshots import metadata_table

    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
        # fixture trim: 3 month partitions, quarter of the keys
        .where(
            (F.col("o_orderdate").between("1995-01-01", "1995-03-31"))
            & (F.col("o_orderkey") % 4 == 0)
        )
    )
    path = scratch_dir(prefix="rt_meta_") + "/tbl"
    spec = [{"col": "o_orderdate", "transform": "month"}]
    snap.commit_append(
        orders.where(F.col("o_orderkey") % 8 == 0), path, partition_spec=spec
    )
    snap.commit_append(orders.where(F.col("o_orderkey") % 8 == 4), path)
    snap.create_tag(path, "pin", snapshot_id=1)

    out = []
    for r in metadata_table(spark, path, "snapshots").collect():
        assert r["n_files"] >= 1 and r["bytes"] > 0
        out.append(("snapshots", str(r["snapshot_id"]), r["rows"]))
    for r in metadata_table(spark, path, "history").collect():
        out.append(
            ("history", str(r["snapshot_id"]),
             1 if r["is_current_ancestor"] else 0)
        )
    for r in metadata_table(spark, path, "partitions").collect():
        out.append(("partitions", r["partition"]["p0"], r["rows"]))
    files = metadata_table(spark, path, "files").collect()
    assert all(f["snapshot_id"] == 2 for f in files)
    out.append(("files", "total_rows", sum(f["rows"] for f in files)))
    for r in metadata_table(spark, path, "refs").collect():
        out.append(("refs", r["name"], r["snapshot_id"]))
    from ratatool_spark.functions.localrel import local_df

    return local_df(spark, out, "kind string, key string, value bigint")


_SQL_SNAPSHOT_METADATA_TABLES = """
WITH src AS (
  SELECT * FROM orders
  WHERE o_orderdate BETWEEN TIMESTAMP '1995-01-01'
                        AND TIMESTAMP '1995-03-31'
    AND o_orderkey % 4 = 0
)
SELECT 'snapshots' AS kind, '1' AS key,
       (SELECT COUNT(*) FROM src WHERE o_orderkey % 8 = 0) AS value
UNION ALL
SELECT 'snapshots', '2', (SELECT COUNT(*) FROM src
                          WHERE o_orderkey % 8 IN (0, 4))
UNION ALL SELECT 'history', '1', 1
UNION ALL SELECT 'history', '2', 1
UNION ALL
SELECT 'partitions', strftime(o_orderdate, '%Y-%m'), COUNT(*)
FROM src WHERE o_orderkey % 8 IN (0, 4)
GROUP BY strftime(o_orderdate, '%Y-%m')
UNION ALL
SELECT 'files', 'total_rows', (SELECT COUNT(*) FROM src
                               WHERE o_orderkey % 8 IN (0, 4))
UNION ALL SELECT 'refs', 'main', 2
UNION ALL SELECT 'refs', 'pin', 1
"""


def _q_snapshot_check_constraints(spark, sf_dir):
    """Commit-time CHECK constraints (operators/snapshots.
    add_constraint / ConstraintViolation — the Delta constraint model):
    adding a constraint first PROVES the existing content satisfies it
    (a too-strict one is refused: add_validates), then every row-adding
    commit validates the INCOMING batch in one aggregate — a violating
    append/merge never publishes (append_rejected, merge_rejected pin
    the snapshot id did not move), while the valid batch lands. Final
    content = the source table (the oracle): the bad batches left no
    trace."""
    from pyspark.sql import functions as F

    import ratatool_spark.operators.snapshots as snap

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    path = scratch_dir(prefix="rt_chk_") + "/tbl"
    snap.commit_append(orders.where(F.col("o_orderkey") % 2 == 0), path)
    snap.add_constraint(spark, path, "price_pos", "o_totalprice > 0")
    snap.add_constraint(
        spark, path, "status_known", "o_orderstatus IN ('F', 'O', 'P')"
    )
    add_validates = False
    try:
        snap.add_constraint(spark, path, "too_strict", "o_totalprice > 1e9")
    except snap.ConstraintViolation:
        add_validates = True
    sid0 = snap.current_snapshot_id(path)
    append_rejected = False
    try:
        snap.commit_append(
            orders.where(F.col("o_orderkey") % 2 == 1).withColumn(
                "o_totalprice", -F.col("o_totalprice")
            ),
            path,
        )
    except snap.ConstraintViolation:
        append_rejected = snap.current_snapshot_id(path) == sid0
    merge_rejected = False
    try:
        snap.merge_snapshot_mor(
            spark, path,
            orders.limit(10).withColumn("o_orderstatus", F.lit("X")),
            ["o_orderkey"],
        )
    except snap.ConstraintViolation:
        merge_rejected = snap.current_snapshot_id(path) == sid0
    snap.commit_append(orders.where(F.col("o_orderkey") % 2 == 1), path)
    return (
        snap.read_snapshot(spark, path)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_total"),
        )
        .select(
            "*",
            F.lit(bool(add_validates)).alias("add_validates"),
            F.lit(bool(append_rejected)).alias("append_rejected"),
            F.lit(bool(merge_rejected)).alias("merge_rejected"),
        )
    )


_SQL_SNAPSHOT_CHECK_CONSTRAINTS = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
       TRUE AS add_validates,
       TRUE AS append_rejected,
       TRUE AS merge_rejected
FROM orders
GROUP BY o_orderstatus
"""


def _q_pipeline_cdc_agg_view(spark, sf_dir):
    """Incremental materialized-view maintenance from the change feed
    (operators/snapshots.maintain_agg_view): a per-status (count, sum)
    view is bootstrapped at snapshot 1, then the table takes the CDC
    gate's CoW merge (doubled prices + 3x inserts) and range delete —
    and the view is refreshed from the FEED ALONE (signed algebra:
    +insert/+postimage, -preimage/-delete), never rescanning the table.
    matches_direct pins the incremental view row-for-row equal to a
    fresh aggregate of the final table (decimal sums — exact algebra,
    no float tolerance); the oracle recomputes that final aggregate
    from the source table. Fixture trimmed to the o_orderkey%4==0
    quarter (r10 bench-cost item) — the gate builds, CoW-merges,
    range-deletes, AND maintains the view in-gate, so its cost is
    fixture IO, not the operator; the oracle applies the same slice
    (o_orderkey%8==0 since r10's second trim)."""
    from pyspark.sql import functions as F

    from ratatool_spark.operators.snapshots import (
        delete_snapshot_where,
        maintain_agg_view,
        merge_snapshot,
        read_snapshot,
        snapshot_change_feed,
    )

    trim = F.col("o_orderkey") % 8 == 0
    path = _build_orders_table(spark, sf_dir, n_commits=1, where=trim)
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .where(trim)
    )
    agg = orders.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    lo, mx = int(agg[0]), int(agg[1])
    s8 = (mx - lo) // 8
    shift = mx - lo + 1
    in_box = orders.where(F.col("o_orderkey").between(lo, lo + s8))
    updates = in_box.withColumn(
        "o_totalprice", F.col("o_totalprice") * F.lit(2.0)
    )
    inserts = in_box.select(
        (F.col("o_orderkey") + F.lit(shift)).alias("o_orderkey"),
        "o_custkey", "o_orderstatus",
        (F.col("o_totalprice") * F.lit(3.0)).alias("o_totalprice"),
    )

    def _tp(df):
        return df.withColumn(
            "tp", F.col("o_totalprice").cast("decimal(18,2)")
        )

    view0 = maintain_agg_view(
        None,
        _tp(read_snapshot(spark, path, 1)).withColumn(
            "_change_type", F.lit("insert")
        ),
        ["o_orderstatus"], ["tp"],
    ).localCheckpoint(eager=False)
    merge_snapshot(spark, path, updates.unionByName(inserts),
                   ["o_orderkey"])
    delete_snapshot_where(spark, path, {"o_orderkey": (lo + 2 * s8,
                                                       lo + 3 * s8)})
    feed = _tp(snapshot_change_feed(spark, path, 1))
    view1 = maintain_agg_view(view0, feed, ["o_orderstatus"], ["tp"])
    direct = (
        _tp(read_snapshot(spark, path))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("__n"), F.sum("tp").alias("sum_tp"))
    )
    inc = sorted(
        (r["o_orderstatus"], r["__n"], r["sum_tp"])
        for r in view1.collect()
    )
    dr = sorted(
        (r["o_orderstatus"], r["__n"], r["sum_tp"])
        for r in direct.collect()
    )
    return view1.select(
        "o_orderstatus",
        F.col("__n").cast("long").alias("n_orders"),
        F.col("sum_tp").cast("double").alias("sum_total"),
        F.lit(inc == dr).alias("matches_direct"),
    )


_SQL_PIPELINE_CDC_AGG_VIEW = """
WITH src AS (
  SELECT * FROM orders WHERE o_orderkey % 8 = 0
),
box AS (
  SELECT MIN(o_orderkey) AS lo,
         (MAX(o_orderkey) - MIN(o_orderkey)) // 8 AS s8
  FROM src
),
final AS (
  SELECT o_orderstatus,
         CASE WHEN o_orderkey BETWEEN box.lo AND box.lo + box.s8
              THEN o_totalprice * 2.0 ELSE o_totalprice END AS p
  FROM src, box
  WHERE o_orderkey NOT BETWEEN box.lo + 2 * box.s8 AND box.lo + 3 * box.s8
  UNION ALL
  SELECT o_orderstatus, o_totalprice * 3.0 AS p
  FROM src, box
  WHERE o_orderkey BETWEEN box.lo AND box.lo + box.s8
)
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
       TRUE AS matches_direct
FROM final
GROUP BY o_orderstatus
"""


def _q_snapshot_evolve_ids(spark, sf_dir):
    """Field-id schema evolution (operators/snapshots.rename_column /
    widen_column_type — Iceberg's column-id model): orders lands under
    (ok int, status, total); a RENAME (total→price) and a WIDEN
    (ok int→bigint) publish as metadata-only commits (pinned in-gate:
    the data-file set is unchanged); a second append writes the NEW
    shape, so the table mixes schema versions file-by-file; a CoW merge
    on the WIDENED key then updates a key range spanning files of both
    versions. The final read must serve every row under the current
    binding — old bytes resolved BY FIELD ID (read with write-time
    names/types, renamed/cast up) — and the oracle recomputes the whole
    truth from the source table, blind to the evolution history."""
    from ratatool_spark.operators.snapshots import (
        commit_append,
        merge_snapshot,
        read_manifest,
        read_snapshot,
        rename_column,
        widen_column_type,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").cast("int").alias("ok"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("total"),
    )
    path = scratch_dir(prefix="rt_evo_") + "/tbl"
    commit_append(orders.where(F.col("ok") % 2 == 0), path)
    files0 = {e["path"] for e in read_manifest(path)["files"]}
    rename_column(path, "total", "price")
    widen_column_type(path, "ok", "bigint")
    m = read_manifest(path)
    assert {e["path"] for e in m["files"]} == files0, (
        "rename/widen must be metadata-only"
    )
    commit_append(
        orders.where(F.col("ok") % 2 == 1).select(
            F.col("ok").cast("bigint"),
            F.col("status"),
            F.col("total").alias("price"),
        ),
        path,
    )
    assert {e.get("schema_v", 0)
            for e in read_manifest(path)["files"]} == {0, 2}, (
        "expected files under both schema versions"
    )
    # CoW merge on the widened key: a bounded key range, so only
    # stats-intersecting files (of EITHER version) rewrite
    upd = orders.where((F.col("ok") % 7 == 0) & (F.col("ok") <= 400)).select(
        F.col("ok").cast("bigint"),
        F.lit("X").alias("status"),
        F.col("total").alias("price"),
    )
    merge_snapshot(spark, path, upd, ["ok"], record_changes=False)
    # a pruned read through the rename: predicate on the NEW name must
    # translate to old-name stats per file version
    pruned_n = read_snapshot(spark, path, where={"ok": (1, 400)}).count()
    # INITIAL DEFAULT (Iceberg v3): every pre-add row surfaces
    # src='base' without a rewrite; the late append carries its own
    # value — and a pruned read on the defaulted column keeps pre-add
    # files through the default, not their (absent) stats
    from ratatool_spark.operators.snapshots import evolve_add_columns

    evolve_add_columns(spark, path, {"src": "string"},
                       defaults={"src": "base"})
    commit_append(
        orders.where(F.col("ok") % 11 == 0).select(
            F.col("ok").cast("bigint"),
            F.col("status"),
            F.col("total").alias("price"),
            F.lit("late").alias("src"),
        ),
        path,
    )
    n_default = read_snapshot(
        spark, path, where={"src": ("base", "base")}).count()
    final = read_snapshot(spark, path)
    return (
        final.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("price").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .withColumn("n_low_keys", F.lit(pruned_n).cast("long"))
        .withColumn("n_default", F.lit(n_default).cast("long"))
    )


_SQL_SNAPSHOT_EVOLVE_IDS = """
WITH merged AS (
  SELECT CAST(o_orderkey AS BIGINT) AS ok,
         CASE WHEN o_orderkey % 7 = 0 AND o_orderkey <= 400
              THEN 'X' ELSE o_orderstatus END AS status,
         o_totalprice AS price
  FROM orders
),
final AS (
  SELECT ok, status, price, 'base' AS src FROM merged
  UNION ALL
  SELECT CAST(o_orderkey AS BIGINT), o_orderstatus, o_totalprice, 'late'
  FROM orders WHERE o_orderkey % 11 = 0
)
SELECT status,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       (SELECT COUNT(*) FROM merged WHERE ok BETWEEN 1 AND 400)
         AS n_low_keys,
       (SELECT COUNT(*) FROM final WHERE src = 'base') AS n_default
FROM final
GROUP BY status
"""


def _q_snapshot_spec_evolution(spark, sf_dir):
    """Partition spec evolution (operators/snapshots.
    evolve_partition_spec — Iceberg's model): orders lands under spec 0
    = identity(status); the spec then evolves to truncate(ok, 1024) and
    a second append writes under it, so the table mixes partition
    layouts file-by-file. Reads stay correct throughout (pruning uses
    the union of specs; each file's tuple only answers for ITS spec);
    drop_partition on the new spec is REFUSED while old-layout files
    could hide matching rows (pinned in-gate), compaction migrates
    every file to the current spec, and then retiring the first key
    band is a metadata-only drop. The oracle recomputes the final
    content and the pruned band count from the source table."""
    from ratatool_spark.operators.snapshots import (
        commit_append,
        compact_snapshot,
        drop_partition,
        evolve_partition_spec,
        read_manifest,
        read_snapshot,
    )

    # fixed keyspace slice: partition count under truncate(ok, 1024)
    # stays ~32 at every SF (unsliced, sf0.1 would write ~600 physical
    # partitions per commit — gate cost, not operator cost)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
        F.col("o_orderkey") < 32768
    ).select(
        F.col("o_orderkey").alias("ok"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("total"),
    )
    path = scratch_dir(prefix="rt_spec_") + "/tbl"
    commit_append(
        orders.where(F.col("ok") % 2 == 0), path,
        partition_spec=[{"col": "status", "transform": "identity"}],
    )
    files0 = {e["path"] for e in read_manifest(path)["files"]}
    evolve_partition_spec(
        path, [{"col": "ok", "transform": "truncate", "param": 1024}])
    assert {e["path"] for e in read_manifest(path)["files"]} == files0, (
        "spec evolution must be metadata-only"
    )
    commit_append(orders.where(F.col("ok") % 2 == 1), path)
    m = read_manifest(path)
    assert {frozenset(e["partition"]) for e in m["files"]} == {
        frozenset({"p0"}), frozenset({"p1"})
    }, "expected files under both specs"
    try:
        drop_partition(spark, path, {"p1": 0})
        raise AssertionError("drop must refuse while specs are mixed")
    except ValueError:
        pass
    n_band = read_snapshot(spark, path, where={"ok": (1024, 2047)}).count()
    compact_snapshot(spark, path, target_bytes=1 << 30)
    drop_partition(spark, path, {"p1": 0}, record_changes=False)
    final = read_snapshot(spark, path)
    return (
        final.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("total").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_total"),
        )
        .withColumn("n_band", F.lit(n_band).cast("long"))
    )


_SQL_SNAPSHOT_SPEC_EVOLUTION = """
SELECT o_orderstatus AS status,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_total,
       (SELECT COUNT(*) FROM orders
        WHERE o_orderkey BETWEEN 1024 AND 2047) AS n_band
FROM orders
WHERE o_orderkey >= 1024 AND o_orderkey < 32768
GROUP BY o_orderstatus
"""


def _q_snapshot_bloom_skip(spark, sf_dir):
    """Per-file BLOOM skipping (operators/snapshots.set_bloom_filter —
    the Iceberg puffin / Delta bloom-index design): orders lands with a
    bloom on the order key; a SCATTERED 5-point-update batch (the
    smallest existing key at each quarter of the keyspace plus the
    top — spread across the whole range, so its min/max box intersects
    EVERY file and range stats alone would rewrite the full table, yet
    only ≤5 of the 8 files can actually hold a key) merges
    copy-on-write, and the bloom
    refinement shrinks the rewrite set to the files that actually hold
    batch keys (pinned in-gate: the box touches all files, yet at
    least one file is carried untouched; bloom false positives only
    ever ADD a rewrite, never lose one). A bloom-pruned point read of
    the smallest batch key rides back as a column. The oracle
    recomputes the merged content and the point count from the source
    table, blind to the physical skipping."""
    from ratatool_spark.operators.snapshots import (
        commit_append,
        files_intersecting,
        merge_snapshot,
        read_manifest,
        read_snapshot,
        set_bloom_filter,
    )

    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .where(F.col("o_orderkey") % 8 == 0)  # fixture trim (r10): the
        # gate's cost is its commit+merge fixture, not the bloom probes
        .select(
            F.col("o_orderkey").alias("ok"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("total"),
        )
    )
    path = scratch_dir(prefix="rt_bloom_") + "/tbl"
    import os as _os

    _os.makedirs(path)
    set_bloom_filter(path, ["ok"], bits_per_key=10)
    commit_append(orders.repartition(8), path)
    m0 = read_manifest(path)
    # 5 existing keys spread across the whole keyspace: the smallest
    # key at (0, 1/4, 1/2, 3/4, 0.99) of max — deterministic and
    # SQL-replayable, and 5 keys can live in at most 5 of the 8 files.
    # One max job + ONE fused conditional-min aggregate (was 6 jobs).
    mx = orders.agg(F.max("ok")).first()[0]
    fr = orders.agg(
        *[
            F.min(F.when(F.col("ok") >= int(f * mx), F.col("ok"))).alias(
                f"k{i}"
            )
            for i, f in enumerate((0.0, 0.25, 0.5, 0.75, 0.99))
        ]
    ).first()
    keys = sorted({int(fr[i]) for i in range(5)})
    upd = orders.where(F.col("ok").isin(keys)).select(
        "ok", F.lit("X").alias("status"), "total")
    probe = keys[0]
    box_touch = files_intersecting(m0, {"ok": (keys[0], keys[-1])})
    assert len(box_touch) == len(m0["files"]), (
        "fixture drift: the scattered batch should box-touch every file"
    )
    merge_snapshot(spark, path, upd, ["ok"], record_changes=False)
    m1 = read_manifest(path)
    carried = {e["path"] for e in m0["files"]} & {
        e["path"] for e in m1["files"]}
    assert carried, (
        "bloom refinement must carry at least one box-intersecting "
        "file untouched"
    )
    n_point = read_snapshot(
        spark, path, where={"ok": (probe, probe)}).count()
    final = read_snapshot(spark, path)
    return (
        final.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("total").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_total"),
        )
        .withColumn("n_point", F.lit(n_point).cast("long"))
    )


_SQL_SNAPSHOT_BLOOM_SKIP = """
WITH src AS (SELECT * FROM orders WHERE o_orderkey % 8 = 0),
mx AS (SELECT MAX(o_orderkey) AS m FROM src),
keys AS (
  SELECT DISTINCT k FROM (
    SELECT MIN(o_orderkey) AS k FROM src
    UNION ALL
    SELECT MIN(o_orderkey) FROM src, mx
      WHERE o_orderkey >= FLOOR(0.25 * m)
    UNION ALL
    SELECT MIN(o_orderkey) FROM src, mx
      WHERE o_orderkey >= FLOOR(0.5 * m)
    UNION ALL
    SELECT MIN(o_orderkey) FROM src, mx
      WHERE o_orderkey >= FLOOR(0.75 * m)
    UNION ALL
    SELECT MIN(o_orderkey) FROM src, mx
      WHERE o_orderkey >= FLOOR(0.99 * m)
  )
),
merged AS (
  SELECT o_orderkey AS ok,
         CASE WHEN o_orderkey IN (SELECT k FROM keys) THEN 'X'
              ELSE o_orderstatus END AS status,
         o_totalprice AS total
  FROM src
)
SELECT status,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(total AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
       (SELECT COUNT(*) FROM merged
        WHERE ok = (SELECT MIN(k) FROM keys)) AS n_point
FROM merged
GROUP BY status
"""


def _q_snapshot_branch_merge(spark, sf_dir):
    """Branch WRITE surface beyond append (operators/snapshots.
    merge_branch_mor / delete_branch_where / fold_branch_deletes +
    fast-forward — the full Iceberg-branch engineering loop: fork,
    transform on the branch, publish): main takes the o_orderkey%3==0
    third of a trimmed orders slice, a 'etl' branch forks, the %3==1
    third lands as a branch append, a MoR MERGE upserts the %5==0 keys
    (doubled totals; %3∈{0,1} are updates, %3==2 inserts) with ZERO
    file rewrites, a CoW range DELETE drops o_orderkey<=3000, then
    fast_forward_branch(spark=) folds the pending branch-local sidecar
    and publishes the lineage as one main commit. Pinned in-gate: the
    MoR commit carried every pre-merge file (no_rewrite), the FF'd main
    manifest holds no pending deletes (folded), the FF records the
    4-commit lineage, the branch resets empty, and main never moved
    before the FF. The oracle replays upsert+delete algebra straight
    from the source slice."""

    from pyspark.sql import functions as F

    import ratatool_spark.operators.snapshots as snap

    src = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .where(F.col("o_orderkey") % 4 == 1)  # fixture trim
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    path = scratch_dir(prefix="rt_brmerge_") + "/tbl"
    snap.commit_append(src.where(F.col("o_orderkey") % 3 == 0), path)
    snap.create_branch(path, "etl")
    snap.commit_append_branch(
        src.where(F.col("o_orderkey") % 3 == 1), path, "etl")
    pre_files = {
        e["path"] for e in snap._branch_head_manifest(path, "etl")[1]["files"]
    }
    changes = src.where(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey", "o_orderstatus",
        (F.col("o_totalprice") * 2).alias("o_totalprice"),
    )
    snap.merge_branch_mor(spark, path, "etl", changes, ["o_orderkey"])
    _, head = snap._branch_head_manifest(path, "etl")
    no_rewrite = pre_files <= {e["path"] for e in head["files"]}
    snap.delete_branch_where(spark, path, "etl", {"o_orderkey": (0, 3000)})
    main_isolated = snap.current_snapshot_id(path) == 1
    snap.fast_forward_branch(path, "etl", spark=spark)
    m = snap.read_manifest(path, load_files=False)
    ref = snap.table_branches(path)["etl"]
    return (
        snap.read_snapshot(spark, path)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_total"),
        )
        .select(
            "*",
            F.lit(bool(no_rewrite)).alias("no_rewrite"),
            F.lit(len(m.get("deletes", [])) == 0).alias("folded"),
            F.lit(int(m.get("branch_commits", 0)))
            .cast("long")
            .alias("ff_commits"),
            F.lit(ref["base"] == 2 and ref["head"] == 0)
            .alias("branch_reset"),
            F.lit(bool(main_isolated)).alias("main_isolated"),
        )
    )


_SQL_SNAPSHOT_BRANCH_MERGE = """
WITH src AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 4 = 1
),
base AS (SELECT * FROM src WHERE o_orderkey % 3 IN (0, 1)),
chg AS (SELECT o_orderkey, o_orderstatus, o_totalprice * 2 AS o_totalprice
        FROM src WHERE o_orderkey % 5 = 0),
merged AS (
  SELECT * FROM base WHERE o_orderkey % 5 <> 0
  UNION ALL SELECT * FROM chg
),
final AS (SELECT * FROM merged WHERE o_orderkey NOT BETWEEN 0 AND 3000)
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
       TRUE AS no_rewrite,
       TRUE AS folded,
       CAST(4 AS BIGINT) AS ff_commits,
       TRUE AS branch_reset,
       TRUE AS main_isolated
FROM final
GROUP BY o_orderstatus
"""


def _q_snapshot_branch_maintenance(spark, sf_dir):
    """Branch maintenance loop (operators/snapshots.
    delete_branch_rows_mor / cluster_branch / compact_branch + FF —
    expensive layout work runs on a branch, gets audited, publishes
    metadata-only): main takes a trimmed orders slice, a 'maint' branch
    forks, a POSITION delete drops the o_orderkey%9==0 rows (arbitrary
    predicate, zero rewrite — pinned), z-order clustering folds the
    sidecar into a full rewrite, compaction bin-packs the result, and
    fast-forward publishes without spark (no pending sidecars left —
    pinned: the FF is metadata-only). The oracle replays the surviving
    rows straight from the source slice."""

    from pyspark.sql import functions as F

    import ratatool_spark.operators.snapshots as snap

    src = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .where(F.col("o_orderkey") % 4 == 2)  # fixture trim
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    path = scratch_dir(prefix="rt_brmaint_") + "/tbl"
    snap.commit_append(src.repartition(6), path)
    snap.create_branch(path, "maint")
    snap.delete_branch_rows_mor(spark, path, "maint",
                                "o_orderkey % 9 = 0")
    _, head = snap._branch_head_manifest(path, "maint")
    pos_kind = any(d.get("kind") == "position"
                   for d in head.get("deletes", []))
    snap.cluster_branch(spark, path, "maint", ["o_orderkey"],
                        num_partitions=4)
    _, head = snap._branch_head_manifest(path, "maint")
    folded_on_branch = head["deletes"] == []
    n_before = len(head["files"])
    k3 = snap.compact_branch(spark, path, "maint", target_bytes=1 << 30)
    _, head = snap._branch_head_manifest(path, "maint")
    compacted = (k3 == 3 and len(head["files"]) <= n_before)
    # no pending sidecars -> FF needs no spark: metadata-only publish
    snap.fast_forward_branch(path, "maint")
    m = snap.read_manifest(path, load_files=False)
    return (
        snap.read_snapshot(spark, path)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_total"),
        )
        .select(
            "*",
            F.lit(bool(pos_kind)).alias("pos_kind"),
            F.lit(bool(folded_on_branch)).alias("folded_on_branch"),
            F.lit(bool(compacted)).alias("compacted"),
            F.lit(int(m.get("branch_commits", 0)))
            .cast("long")
            .alias("ff_commits"),
        )
    )


_SQL_SNAPSHOT_BRANCH_MAINTENANCE = """
WITH src AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 4 = 2
),
final AS (SELECT * FROM src WHERE o_orderkey % 9 <> 0)
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
       TRUE AS pos_kind,
       TRUE AS folded_on_branch,
       TRUE AS compacted,
       CAST(3 AS BIGINT) AS ff_commits
FROM final
GROUP BY o_orderstatus
"""


def _q_snapshot_agg_pushdown(spark, sf_dir):
    """Metadata-only aggregates (operators/snapshots.scan_aggregate —
    the Iceberg/Delta aggregate-pushdown design) over ONE table with a
    two-item hidden-partition spec [day(o_orderdate),
    identity(o_orderstatus)]: COUNT/MIN/MAX for the whole table and for
    two status slices are answered straight from manifest stats
    (from_metadata is asserted in-gate — zero data IO), and a pruned
    day-window read (the prune is asserted to drop files) aggregates
    the February-window slice. Every value is recomputed by the oracle
    from the source slice, so a stale or unsound stats shortcut cannot
    hide."""

    from pyspark.sql import functions as F

    import ratatool_spark.operators.snapshots as snap
    from ratatool_spark.functions.localrel import local_df

    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey", "o_orderstatus", "o_totalprice",
                "o_orderdate")
        .where(
            (F.col("o_orderdate").between("1995-01-01", "1995-01-21"))
            & (F.col("o_orderkey") % 4 == 0)
        )
        .coalesce(1)  # fixture trim: tiny slice, one writer task
    )
    p1 = scratch_dir(prefix="rt_aggmd_") + "/tbl"
    snap.commit_append(
        orders, p1,
        partition_spec=[
            {"col": "o_orderdate", "transform": "day"},
            {"col": "o_orderstatus", "transform": "identity"},
        ],
    )
    rows = []
    for key, where in (
        ("all", None),
        ("F", {"o_orderstatus": "F"}),
        ("O", {"o_orderstatus": "O"}),
        # granule equality on the day transform — Iceberg's
        # partition-value query, still metadata-only
        ("day_eq", {"o_orderdate": "1995-01-10"}),
    ):
        df, md = snap.scan_aggregate(
            spark, p1, minmax_cols=("o_totalprice", "o_orderkey"),
            where=where)
        assert md is True  # the whole point: answered without data IO
        r = df.collect()[0]
        rows.append((key, r["n_rows"], r["min_o_totalprice"],
                     r["max_o_totalprice"], r["min_o_orderkey"],
                     r["max_o_orderkey"]))

    win = ("1995-01-05", "1995-01-15")
    m = snap.read_manifest(p1)
    kept = snap.partition_prune(
        spark, snap.table_partition_spec(p1), m["schema"], m["files"],
        {"o_orderdate": win})
    assert 0 < len(kept) < len(m["files"])  # day dirs really pruned
    r = (
        snap.read_snapshot(spark, p1, where={"o_orderdate": win})
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("mn"),
            F.max("o_totalprice").alias("mx"),
            F.min("o_orderkey").alias("mnk"),
            F.max("o_orderkey").alias("mxk"),
        )
        .collect()[0]
    )
    rows.append(("day_window", r["n"], r["mn"], r["mx"], r["mnk"],
                 r["mxk"]))
    return local_df(
        spark, rows,
        "key string, n_rows bigint, min_price double, max_price double, "
        "min_key bigint, max_key bigint",
    )


_SQL_SNAPSHOT_AGG_PUSHDOWN = """
WITH src AS (
  SELECT * FROM orders
  WHERE o_orderdate BETWEEN TIMESTAMP '1995-01-01'
                        AND TIMESTAMP '1995-01-21'
    AND o_orderkey % 4 = 0
)
SELECT 'all' AS key, COUNT(*) AS n_rows,
       MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
       MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
FROM src
UNION ALL
SELECT 'F', COUNT(*), MIN(o_totalprice), MAX(o_totalprice),
       MIN(o_orderkey), MAX(o_orderkey)
FROM src WHERE o_orderstatus = 'F'
UNION ALL
SELECT 'O', COUNT(*), MIN(o_totalprice), MAX(o_totalprice),
       MIN(o_orderkey), MAX(o_orderkey)
FROM src WHERE o_orderstatus = 'O'
UNION ALL
SELECT 'day_eq', COUNT(*), MIN(o_totalprice), MAX(o_totalprice),
       MIN(o_orderkey), MAX(o_orderkey)
FROM src WHERE strftime(o_orderdate, '%Y-%m-%d') = '1995-01-10'
UNION ALL
SELECT 'day_window', COUNT(*), MIN(o_totalprice), MAX(o_totalprice),
       MIN(o_orderkey), MAX(o_orderkey)
FROM src WHERE o_orderdate BETWEEN TIMESTAMP '1995-01-05'
                               AND TIMESTAMP '1995-01-15'
"""
