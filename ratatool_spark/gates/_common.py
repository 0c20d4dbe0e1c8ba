"""Shared gate helpers: scale-dir constants and the portable md5 dice twin.

Split out of __spark_entry__.py (r6 verdict #6); oracle strings are
byte-pinned by tests/test_oracle_golden.py."""


from __future__ import annotations


SF0001 = "/root/testdata/sf0.001"

# DuckDB twin of ratatool_spark.functions.hashing.dice for 2 int fields
_DICE_SQL = (
    "((('0x' || substr(md5(concat_ws(chr(1), '{seed}', "
    "{fields})), 1, 15))::BIGINT)::DOUBLE / 1152921504606846976.0)"
)

def _dice_sql(fields: list[str], seed: int = 42) -> str:
    rendered = ", ".join(f"CAST({f} AS VARCHAR)" for f in fields)
    return _DICE_SQL.format(seed=seed, fields=rendered)


from contextlib import contextmanager


@contextmanager
def stream_partitions(spark, n: int = 8):
    """Pin ``spark.sql.shuffle.partitions`` to the gate fixture's
    key-scale for the duration of a streaming run, restoring the session
    default afterwards. State-store partition count is fixed at
    checkpoint creation from this setting; the session default (sized to
    host cores for batch shuffles) just multiplies per-micro-batch
    state-store setup and commit fsyncs for fixtures whose key
    cardinality is tiny. Measured on stream_dedup_admitted: 5.1-11.7 s at
    32 partitions vs 3.0-3.7 s at 8, identical admitted rows. The same
    rationale (pin to key cardinality, not host cores) applies at
    cluster scale — this is a fixture-cardinality setting, not a local
    tuning knob."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def scratch_dir(prefix: str = "rt_") -> str:
    """RAM-backed scratch for ephemeral gate fixtures — the snapshot
    tables, stream checkpoints, and artifact round-trips a gate builds
    and discards within one query. A storage-medium choice, not caching:
    every invocation still creates and computes everything from the
    parquet inputs. The fixture-write path fsyncs aggressively (the
    exclusive-create manifest protocol, streaming state-store commits:
    measured ~0.6 ms per fsync'd file on the sandbox's ext4 vs ~0 on
    tmpfs, hundreds of files per multi-commit gate), and durability of a
    throwaway fixture buys nothing. Override with SPARK_GRAFT_SCRATCH
    (point it at a disk path to restore the old placement); falls back
    to the system tempdir where /dev/shm does not exist."""
    import os
    import tempfile

    base = os.environ.get("SPARK_GRAFT_SCRATCH")
    if base is None and os.path.isdir("/dev/shm"):
        base = "/dev/shm/rt_scratch"
    if base:
        os.makedirs(base, exist_ok=True)
        d = tempfile.mkdtemp(prefix=prefix, dir=base)
    else:
        d = tempfile.mkdtemp(prefix=prefix)
    _SCRATCH_DIRS.append(d)
    return d


_SCRATCH_DIRS: list[str] = []


def _cleanup_scratch() -> None:
    # tmpfs persists until reboot; each process removes its own fixture
    # dirs at exit so repeated bench/compare runs don't accumulate in RAM
    import shutil

    for d in _SCRATCH_DIRS:
        shutil.rmtree(d, ignore_errors=True)


import atexit

atexit.register(_cleanup_scratch)
