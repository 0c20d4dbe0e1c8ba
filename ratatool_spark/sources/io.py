"""Sources & sinks (SURVEY.md §2.1, S1-S15).

The reference wires per-format IO modules (Avro / Parquet-Avro / BigQuery /
protobuf / TableRow-JSON) with driver-side schema extraction and output
memoization (FileStorage.scala:38-74, AvroIO.scala:102-109,
ParquetIO.scala:38-55). In Spark all of that collapses into
``spark.read.format(fmt)`` — the DataFrameReader extracts schemas from file
metadata, handles globs, and parallelizes per split. What remains worth
owning is:

  - format sniffing by extension (BigSampler.scala:236-309 routes on
    ``.avro`` / ``.parquet``),
  - output memoization — skip recompute when a sink already completed
    (FileStorage.isDone:44-74, BigSamplerAvro.scala:240-242),
  - one `read/write` chokepoint so every operator gets pushdown-friendly
    scans and consistent write options.

Avro support: ``spark.read.format("avro")`` is used when the spark-avro
connector jar is present; when it is absent (as in this container — no
network to fetch it), read/write route through the dependency-free codec
in ``avro_py.py`` (distributed binaryFile+mapInPandas scan, per-partition
container sink, JVM byte-parity pinned in tests/test_avro.py).
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession

PARQUET, AVRO, JSON, CSV, ORC = "parquet", "avro", "json", "csv", "orc"
TFRECORD = "tfrecord"
_EXT = {
    ".parquet": PARQUET,
    ".avro": AVRO,
    ".json": JSON,
    ".ndjson": JSON,
    ".csv": CSV,
    ".orc": ORC,
    ".tfrecord": TFRECORD,
}


def sniff_format(path: str) -> str:
    """Route by file extension the way the reference's CLI does
    (BigSampler.scala:262-273). Directories default to parquet."""
    base = path.rstrip("/*")
    _, ext = os.path.splitext(base)
    return _EXT.get(ext.lower(), PARQUET)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    **options: Any,
) -> DataFrame:
    """Read a table from files. Schema comes from file metadata (parquet
    footer / avro header), mirroring AvroIO.getAvroSchemaFromFile — but done
    natively by the DataFrameReader, on the executors, in parallel.

    Catalyst will push filters/projections from downstream operators into
    this scan; keep this the single entry point so that property holds
    everywhere.
    """
    fmt = fmt or sniff_format(path)
    if fmt == AVRO and not _has_spark_avro(spark):
        from ratatool_spark.sources.avro_py import read_avro

        return read_avro(spark, path)
    if fmt == TFRECORD:
        from ratatool_spark.sources.tfrecord_py import read_tfrecord

        schema = options.pop("schema", None)
        if schema is None:
            raise ValueError(
                "tfrecord reads need an explicit schema= (tf.train.Example "
                "carries no file-level schema — same contract as "
                "parse_example)"
            )
        return read_tfrecord(spark, path, schema)
    reader = spark.read
    schema = options.pop("schema", None)
    if schema is not None:
        # explicit schema: no inference job (a full extra data pass at
        # scale) and exact types on text formats (csv/json)
        reader = reader.schema(schema)
    if fmt == JSON:
        reader = reader.option("multiLine", "false")
    if fmt == CSV and schema is None:
        reader = reader.option("header", "true").option("inferSchema", "true")
    elif fmt == CSV:
        reader = reader.option("header", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.format(fmt).load(path)


_SPARK_AVRO: bool | None = None


def _has_spark_avro(spark: SparkSession) -> bool:
    """True when the 'avro' data source is actually registered (the
    connector jar on the classpath AND service-registered — a bare
    Class.forName succeeds on some distributions whose jars carry the
    classes without the DataSourceRegister entry)."""
    global _SPARK_AVRO
    if _SPARK_AVRO is None:
        try:
            jvm = spark._jvm
            jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
                "avro", jvm.org.apache.spark.sql.internal.SQLConf.get()
            )
            _SPARK_AVRO = True
        except Exception:
            _SPARK_AVRO = False
    return _SPARK_AVRO


def write_table(
    df: DataFrame,
    path: str,
    fmt: str | None = None,
    mode: str = "error",
    partition_by: list[str] | None = None,
    header: str | None = None,
    reuse: bool = False,
    **options: Any,
) -> bool:
    """Write a DataFrame. Returns False if skipped via memoization.

    ``reuse=True`` reproduces the reference's output-reuse semantics
    (BigSamplerAvro.scala:240-242): if the output directory already has a
    completed marker, skip the job. Spark's `_SUCCESS` file is the native
    equivalent of the reference's `-of-` shard-completeness check
    (FileStorage.isDone:44-74).

    ``header`` (TSV stats files) reproduces saveAsTextFileWithHeader
    (BigDiffy.scala:676-687) via the csv writer's header option.

    ``partition_by`` is the file-layout analog of the reference's BigQuery
    time-partitioned sink (BigSamplerBigQuery.scala:187-199): downstream
    reads prune partitions by directory.
    """
    if reuse and is_done(path):
        return False
    fmt = fmt or sniff_format(path)
    if fmt == AVRO and not _has_spark_avro(df.sparkSession):
        from ratatool_spark.sources.avro_py import write_avro

        if partition_by:
            raise NotImplementedError(
                "partition_by with the jar-free avro sink: add spark-avro"
            )
        if mode == "error" and os.path.exists(path) and os.listdir(path):
            raise FileExistsError(path)
        write_avro(df, path)
        return True
    if fmt == TFRECORD:
        from ratatool_spark.sources.tfrecord_py import write_tfrecord

        if partition_by:
            raise NotImplementedError(
                "partition_by with the tfrecord sink: shard by key "
                "upstream (sources/shards.py) instead"
            )
        if mode == "error" and os.path.exists(path) and os.listdir(path):
            raise FileExistsError(path)
        write_tfrecord(df, path)
        return True
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if header is not None:
        writer = writer.option("header", "true").option("sep", "\t")
        fmt = CSV
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.format(fmt).save(path)
    return True


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "error",
    fmt: str = "parquet",
) -> None:
    """Persist a table bucketed (hash-clustered) by join/group keys.

    Bucketing is the at-rest co-location strategy for 100 TB fact tables:
    two tables bucketed the same way join with NO shuffle exchange on
    either side (Catalyst recognizes the matching output partitioning),
    and aggregations on the bucket keys skip their shuffle too. Use for
    every large table that is repeatedly joined on the same key — the
    shuffle is paid once at write time, not per query. ``sort_cols``
    additionally sorts within buckets (sort-merge join without a sort
    step). Requires the session's warehouse catalog (saveAsTable — the
    bucket metadata lives in the catalog, not the files)."""
    writer = df.write.mode(mode).format(fmt).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def _input_bytes(spark: SparkSession, path: str) -> int:
    """Total data bytes under ``path`` from FILESYSTEM METADATA (no data
    scan). Local paths walk the OS tree; any URI scheme (s3a://, hdfs://,
    …) goes through the Hadoop FileSystem so remote tables size correctly
    instead of silently reporting 0 (which would collapse a compaction to
    one partition)."""
    if "://" in path and not path.startswith("file://"):
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
        return int(fs.getContentSummary(p).getLength())
    local = path[len("file://"):] if path.startswith("file://") else path
    total = 0
    for root, _dirs, files in os.walk(local):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def zorder_value(
    df: DataFrame, cols: list[str], bits_per_col: int = 4
) -> "Column":
    """Z-order (Morton) key as a pure column expression: each column is
    quantile-bucketed into ``2^bits_per_col`` ranks (boundaries from
    ``approxQuantile`` — a bounded driver-side list, baked into the plan
    as literals), and the rank bits are interleaved. Rows close in
    z-value are close in EVERY clustered dimension, so sorting files by
    z-value gives usable min/max pruning on all of them — the multi-column
    generalization of single-key sort clustering.

    All integer expressions (when-chain bucketing + shifts/ORs) — fully
    codegen'd; the only non-expression step is the one-time quantile
    sample per column."""
    from pyspark.sql import functions as F

    n_buckets = 1 << bits_per_col
    probs = [i / n_buckets for i in range(1, n_buckets)]
    # ONE approxQuantile call for all columns — a single sampling pass,
    # not one scan per clustered column
    all_bounds = df.approxQuantile(list(cols), probs, 0.001)
    # long arithmetic throughout: with enough cols×bits the interleaved
    # position reaches >= 31 and int shiftleft would wrap the sign bit
    z = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        bounds = all_bounds[ci]
        bucket = F.lit(0).cast("long")
        for b in bounds:  # rank = #boundaries below the value
            bucket = bucket + (F.col(c) > F.lit(b)).cast("long")
        # interleave: bit i of column ci lands at position i*len(cols)+ci
        for bit in range(bits_per_col):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(bucket, bit).bitwiseAND(F.lit(1).cast("long")),
                    bit * len(cols) + ci,
                )
            )
    return z


def compact_files(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    sort_cols: list[str] | None = None,
    zorder_cols: list[str] | None = None,
    target_file_mb: float = 128,
    fmt: str | None = None,
    mode: str = "error",
) -> int:
    """Small-files compaction with optional sort or Z-order clustering
    (the OPTIMIZE/rewrite maintenance pass every long-lived lakehouse
    table needs). Returns the number of output files targeted.

    File count = ceil(input bytes / ``target_file_mb``) from filesystem
    metadata — no data scan to size the job. ``sort_cols``:
    ``repartitionByRange`` + ``sortWithinPartitions`` produce files with
    disjoint sort-key ranges — parquet min/max statistics prune whole
    files for predicates on the leading column. ``zorder_cols``: cluster
    by the interleaved :func:`zorder_value` instead, trading perfect
    pruning on one column for good pruning on all of them. Without
    either, a plain ``repartition`` balances bytes. Each is one
    range/round-robin exchange — at 100 TB this is the table rewrite's
    unavoidable cost, paid once, amortized over every later pruned scan."""
    import math

    if sort_cols and zorder_cols:
        raise ValueError("pass sort_cols or zorder_cols, not both")
    total = _input_bytes(spark, input_path)
    n_files = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df = read_table(spark, input_path, fmt=fmt)
    if zorder_cols:
        z = zorder_value(df, zorder_cols)
        out = (
            df.withColumn("__z", z)
            .repartitionByRange(n_files, "__z")
            .sortWithinPartitions("__z")
            .drop("__z")
        )
    elif sort_cols:
        out = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        out = df.repartition(n_files)
    write_table(out, output_path, fmt=fmt or sniff_format(input_path), mode=mode)
    return n_files


def strip_quote_wrap(s: str) -> str:
    """`'x'` / `"x"` / `` `x` `` → x — the reference's rowRestriction
    argument cleanup (BigDiffy.stripQuoteWrap:364-374)."""
    if len(s) >= 2 and s[0] == s[-1] and s[0] in ("'", '"', "`"):
        return s[1:-1]
    return s


def row_restriction(df: DataFrame, predicate: str) -> DataFrame:
    """SQL-text WHERE pushdown (P5 — the BigQuery Storage-API
    rowRestriction, BigDiffy.scala:377-396). On file sources Catalyst
    pushes the parsed predicate into the scan, which is the same
    server-side-filter effect."""
    from pyspark.sql import functions as F

    return df.where(F.expr(strip_quote_wrap(predicate)))


def is_done(path: str) -> bool:
    """Completed-output check: Spark writes `_SUCCESS` on commit."""
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None
) -> dict[str, DataFrame]:
    """Load the driver's synthetic star schema from a scale-factor dir and
    register each table as a temp view (so spark.sql queries work too)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from ratatool_spark import TABLES

    # events.parquet carries INT64 TIMESTAMP(NANOS), which vanilla Spark
    # rejects (PARQUET_TYPE_ILLEGAL). The conf is runtime-settable, so set
    # it here rather than at session build time — callers (e.g. an external
    # harness) may hand us a session we didn't construct.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Pin the session to UTC for the same reason: events.ts is converted
    # from epoch-nanos (instant semantics), and a non-UTC session would
    # render/bucket it shifted by the local offset — DuckDB reads the same
    # column as naive UTC wall clock. The other tables store naive
    # timestamps, whose literal comparisons and rendering are
    # session-tz-invariant, so this pin is a no-op for them.
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    out = {}
    for name in names or TABLES:
        p = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(p):
            df = spark.read.parquet(p)
            # events.ts encoding varies by generator version: INT64
            # TIMESTAMP(NANOS) → read as long under nanosAsLong; naive
            # TIMESTAMP(MICROS) → TimestampNTZ under inferTimestampNTZ.
            # Both mean "instant, UTC wall clock" (DuckDB reads the same
            # column as naive UTC) — normalize to TimestampType so
            # watermarks / window() / unix_* behave identically either way.
            if name == "events":
                if isinstance(df.schema["ts"].dataType, T.LongType):
                    # integer div — double division of epoch-nanos loses micros
                    df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
                elif isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
                    # session TZ is pinned UTC above, so this cast attaches
                    # UTC to the naive value — instant-identical to the
                    # nanos path
                    df = df.withColumn("ts", F.col("ts").cast("timestamp"))
            df.createOrReplaceTempView(name)
            out[name] = df
    return out


def upsert_table(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
    fmt: str = "parquet",
    delete_col: str | None = None,
    create_if_missing: bool = False,
) -> dict:
    """Keyed upsert into a stored table — the corpus-maintenance merge for
    plain columnar storage (no transaction log): rows of ``updates``
    replace base rows with the same key, new keys append, and rows where
    ``delete_col`` is true delete their key. Returns
    ``{"inserted", "updated", "deleted", "total"}`` counts (key-based).

    Shape: ALL guards and counters come from ONE action — a full-outer
    join of per-key base counts vs per-key update counts feeding a single
    aggregation (duplicate-key checks for BOTH sides, NULL-key check,
    inserted/updated/deleted/total — the r4-verdict counter fusion), so
    the base is scanned exactly once before the rewrite. The rewrite
    itself is ONE left-anti join of base against the update keys (shuffle
    on the key; the update side is usually small enough for Catalyst to
    broadcast it) + a union — never a row-at-a-time path. ``updates`` is
    persisted for the duration of the call so the counter pass and the
    write share one evaluation.

    Swap protocol: the rewrite lands in ``<path>.__upsert_tmp__``, then
    two renames swap it in (the pre-Delta pattern). Between the renames
    there is a brief window where ``path`` does not exist — on
    HDFS-semantics filesystems (atomic directory rename) readers see old,
    new, or not-found, never a mix; on object stores (S3A and friends)
    rename is copy+delete and a concurrent reader can observe a partial
    listing — use a real table format (Delta/Iceberg) for concurrent
    readers there. Concurrent WRITERS need a real table format
    everywhere. A crash inside the window leaves the data staged at
    ``<path>.__upsert_old__``; the next call (or any call) detects the
    orphaned snapshot and restores it before proceeding, so no state is
    ever deleted while it is the only copy.

    A missing base table raises a clear error unless
    ``create_if_missing=True``, which bootstraps the table from the
    non-delete update rows (delete rows targeting a nonexistent table are
    counted as 0 deleted).

    Duplicate keys WITHIN ``updates`` are rejected (same contract as
    BigDiffy's PK guard) — last-writer-wins across duplicate update rows
    would be nondeterministic under shuffles. A base table that itself
    carries duplicate keys (nothing enforces a PK on plain files) also
    raises: silently collapsing its copies would misreport every counter.
    """
    from pyspark.sql import functions as F

    jvm = spark.sparkContext._jvm
    conf = spark._jsc.hadoopConfiguration()
    p_final = jvm.org.apache.hadoop.fs.Path(path)
    fs = p_final.getFileSystem(conf)
    p_tmp = jvm.org.apache.hadoop.fs.Path(path + ".__upsert_tmp__")
    p_old = jvm.org.apache.hadoop.fs.Path(path + ".__upsert_old__")

    # crash recovery: a previous call that died between its two renames
    # left the ONLY snapshot at p_old — restore it rather than delete it
    if fs.exists(p_old):
        if not fs.exists(p_final):
            if not fs.rename(p_old, p_final):
                raise IOError(f"could not restore orphaned snapshot of {path}")
        else:
            fs.delete(p_old, True)  # post-swap leftover: final is current
    fs.delete(p_tmp, True)

    base_exists = fs.exists(p_final)
    if not base_exists and not create_if_missing:
        raise FileNotFoundError(
            f"upsert_table: base table {path} does not exist; pass "
            "create_if_missing=True to bootstrap it from the updates"
        )

    updates = updates.persist()
    try:
        if delete_col is not None:
            del_flag = F.coalesce(F.col(delete_col), F.lit(False))
            writes = updates.where(~del_flag).drop(delete_col)
        else:
            del_flag = F.lit(False)
            writes = updates
        base = (
            read_table(spark, path, fmt=fmt)
            if base_exists
            else writes.limit(0)
        )

        # ONE action answers every guard and counter (r4-verdict fusion —
        # the previous shape ran 5 separate scans): per-key counts on each
        # side, full-outer joined, feed a single aggregation.
        #   __max_un > 1  -> duplicate update keys (nondeterministic
        #                    last-writer-wins under shuffles)
        #   __null_upd    -> NULL-keyed updates (NULL never equals NULL in
        #                    a join — they could never replace anything and
        #                    would silently append forever; the reference's
        #                    keyFn warns on null keys, we make it an error)
        #   __max_bn > 1  -> duplicate base keys (plain files enforce no
        #                    PK; silently collapsing copies would misreport
        #                    every counter)
        null_pred = None
        for k in keys:
            c = F.col(k).isNull()
            null_pred = c if null_pred is None else (null_pred | c)
        bk = base.groupBy(*keys).agg(F.count(F.lit(1)).alias("__bn"))
        uk = updates.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("__un"), F.max(del_flag).alias("__udel")
        )
        in_base = F.col("__bn").isNotNull()
        in_upd = F.col("__un").isNotNull()
        g = (
            bk.join(uk, keys, "full_outer")
            .agg(
                F.coalesce(F.sum("__bn"), F.lit(0)).alias("__n_base"),
                F.coalesce(F.max("__bn"), F.lit(0)).alias("__max_bn"),
                F.coalesce(F.max("__un"), F.lit(0)).alias("__max_un"),
                F.coalesce(
                    F.sum(F.when(null_pred & in_upd, F.col("__un"))), F.lit(0)
                ).alias("__null_upd"),
                F.count(
                    F.when(in_base & in_upd & F.col("__udel"), F.lit(1))
                ).alias("__n_deleted"),
                F.count(
                    F.when(in_base & in_upd & ~F.col("__udel"), F.lit(1))
                ).alias("__n_updated"),
                F.count(
                    F.when(in_upd & ~F.col("__udel"), F.lit(1))
                ).alias("__n_writes"),
            )
            .collect()[0]
        )
        if g["__null_upd"]:
            raise ValueError("updates carry NULL key values; keys must be non-null")
        if g["__max_un"] > 1:
            raise ValueError("updates carry duplicate keys; dedupe before upsert")
        if g["__max_bn"] > 1:
            raise ValueError(
                f"base table {path} carries duplicate keys; upsert counters "
                "would be wrong — repair with exact_dedup/groupBy first"
            )
        n_base = g["__n_base"]
        n_deleted = g["__n_deleted"]
        n_updated = g["__n_updated"]
        n_writes = g["__n_writes"]

        survivors = base.join(updates.select(*keys), keys, "left_anti")
        merged = survivors.unionByName(writes)
        write_table(merged, path + ".__upsert_tmp__", fmt=fmt, mode="overwrite")
    except BaseException:
        updates.unpersist(blocking=False)
        fs.delete(p_tmp, True)
        raise
    updates.unpersist(blocking=False)

    if base_exists:
        if not fs.rename(p_final, p_old):
            fs.delete(p_tmp, True)
            raise IOError(f"could not stage old snapshot of {path}")
    if not fs.rename(p_tmp, p_final):
        if base_exists:
            fs.rename(p_old, p_final)  # roll back
        raise IOError(f"could not swap new snapshot into {path}")
    if base_exists:
        fs.delete(p_old, True)

    return {
        "inserted": n_writes - n_updated,
        "updated": n_updated,
        "deleted": n_deleted,
        "total": n_base - n_updated - n_deleted + n_writes,
    }
