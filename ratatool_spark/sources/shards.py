"""Training-shard writer/verifier: the hand-off from the data engine to a
trainer's data loader.

``write_training_shards`` assigns every row to a deterministic shard
(portable hash of the key columns mod ``n_shards`` — stable across runs,
engines, and partitionings, like every dice in this package), writes a
``shard=N/`` partitioned layout (downstream loaders read shards
independently — the partitioned-sink pruning path, S11), and records a
``_manifest.json`` with per-shard row counts and an ORDER-INDEPENDENT
content checksum (sum of per-row portable hashes over all columns, exact
integer arithmetic via DECIMAL aggregation).

``verify_shards`` recomputes both from the files and compares — the
integrity gate a trainer runs before touching a multi-TB shard set.
One scan writes; the manifest is then aggregated from the WRITTEN files
(one cheap columnar read-back — certifying the bytes on disk, which is
the only thing a manifest can honestly certify), and verification is one
more scan whenever the trainer wants the gate."""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ratatool_spark.functions.hashing import hash_cols

MANIFEST = "_manifest.json"


def _hadoop_write(spark: SparkSession, uri: str, text: str) -> None:
    """Write a small text file through the Hadoop FileSystem (any scheme
    the cluster can reach: s3a://, hdfs://, file://, …)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(uri)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def _hadoop_read(spark: SparkSession, uri: str) -> str:
    """Read a small text file through the Hadoop FileSystem. The text
    datasource can't be used here — its file index silently drops
    underscore-prefixed files like ours. Bytes come back via
    IOUtils.toByteArray: a RETURNED byte[] converts to Python bytes
    correctly, whereas passing a Python bytearray into readFully would
    mutate only the Java-side copy (py4j is by-value)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(uri)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.open(p)
    try:
        data = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        return bytes(data).decode("utf-8")
    finally:
        stream.close()


def _write_text(spark: SparkSession, path: str, text: str) -> None:
    """Write a small text file at any URI the cluster can reach: local
    paths via open(); any scheme (s3a://, hdfs://, …) through the Hadoop
    FileSystem — same routing as sources.io._input_bytes, so the manifest
    works wherever the shards themselves land."""
    if "://" in path and not path.startswith("file://"):
        _hadoop_write(spark, path, text)
        return
    local = path[len("file://"):] if path.startswith("file://") else path
    with open(local, "w") as f:
        f.write(text)


def _read_text(spark: SparkSession, path: str) -> str:
    if "://" in path and not path.startswith("file://"):
        return _hadoop_read(spark, path)
    local = path[len("file://"):] if path.startswith("file://") else path
    with open(local) as f:
        return f.read()


def _join(path: str, name: str) -> str:
    return path.rstrip("/") + "/" + name


def _shard_stats(df: DataFrame, data_cols: list[str]) -> dict[str, dict]:
    """Per-shard (rows, checksum) in one aggregation. The checksum sums
    60-bit row hashes into a DECIMAL(38,0) — exact, order-independent,
    mergeable (it's just an integer sum)."""
    row_hash = hash_cols([F.col(c) for c in data_cols], seed=7)
    stats = (
        df.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(row_hash.cast("decimal(38,0)")).alias("checksum"),
        )
        .collect()
    )
    return {
        str(r["shard"]): {"rows": r["rows"], "checksum": str(r["checksum"])}
        for r in stats
    }


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_cols: list[str],
    fmt: str = "parquet",
    mode: str = "error",
) -> dict:
    """Write ``df`` as ``n_shards`` deterministic shards + manifest.
    Returns the manifest dict. Key columns must identify a row's shard
    stably — any stable id works; rows with equal keys land together."""
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    data_cols = df.columns
    shard = F.pmod(hash_cols([F.col(c) for c in key_cols], seed=13), F.lit(n_shards))
    sharded = df.withColumn("shard", shard.cast("int"))
    (
        sharded.repartition(n_shards, "shard")
        .write.mode(mode)
        .partitionBy("shard")
        .format(fmt)
        .save(path)
    )
    # manifest stats come from the WRITTEN files, not the input plan: a
    # nondeterministic input (rand columns, changing source) evaluated in
    # a second job could certify rows that were never written. One cheap
    # columnar scan of the output, identical to what verify_shards does.
    shards = _shard_stats(
        df.sparkSession.read.format(fmt).load(path), data_cols
    )
    manifest = {
        "n_shards": n_shards,
        "key_cols": key_cols,
        "data_cols": data_cols,
        "format": fmt,
        "total_rows": sum(s["rows"] for s in shards.values()),
        "shards": shards,
    }
    _write_text(
        df.sparkSession,
        _join(path, MANIFEST),
        json.dumps(manifest, indent=1, sort_keys=True),
    )
    return manifest


def verify_shards(spark: SparkSession, path: str) -> dict:
    """Recompute counts + checksums from the written files and compare to
    the manifest. Returns {"ok": bool, "mismatches": [shard, ...],
    "manifest": dict}. One scan."""
    manifest = json.loads(_read_text(spark, _join(path, MANIFEST)))
    df = spark.read.format(manifest["format"]).load(path)
    got = _shard_stats(df, manifest["data_cols"])
    want = manifest["shards"]
    mismatches = sorted(
        set(got) ^ set(want)
        | {s for s in set(got) & set(want) if got[s] != want[s]}
    )
    return {"ok": not mismatches, "mismatches": mismatches, "manifest": manifest}
